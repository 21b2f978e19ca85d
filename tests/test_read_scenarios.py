"""Ports of the reference's data-plane read scenarios that were not yet
mirrored elsewhere (lite/tests/backend/data_plane/read.rs — scenario
function names preserved for traceability).

The reference drives every case through an opened read session
(``try_open_read_session`` / ``read_records``); here the unary bounds
cases go through ``StreamStore.read`` (the relational surface) and the
open/Unwritten cases through ``StreamStore.read_session``, whose open
validation mirrors lite/src/backend/read.rs:246-284.
"""

from __future__ import annotations

import pytest

from s2_spark.catalog import Catalog, StreamConfig
from s2_spark.model import BasinNotFound, RangeNotSatisfiable, Record
from s2_spark.store import ReadLimit, ReadStart, StreamStore

BASIN = "test-basin"
STREAM = "s1"


class FakeClock:
    def __init__(self, ms: int = 1_000_000):
        self.ms = ms

    def __call__(self) -> int:
        return self.ms


@pytest.fixture()
def store(spark, tmp_path):
    clock = FakeClock()
    cat = Catalog(spark, clock=clock)
    cat.create_basin(BASIN)
    cat.create_stream(BASIN, STREAM)
    s = StreamStore(spark, str(tmp_path / "records"), catalog=cat, clock=clock)
    s.clock = clock
    return s


def client_ts_config(store):
    """client_timestamp_stream_config (read.rs:75-84): client-require
    timestamping so seeded timestamps ride through verbatim."""
    store.catalog.reconfigure_stream(
        BASIN, STREAM, StreamConfig(timestamping_mode="client-require")
    )


def seed_timestamped_stream(store, records):
    """seed_timestamped_stream (read.rs:85-101)."""
    client_ts_config(store)
    store.append(
        BASIN, STREAM, [Record(body=b, timestamp=ts) for b, ts in records]
    )


def bodies(df):
    return [r.body for r in df.collect()]


# one Record(body=b"x"*n) meters 8 + len(body) (no headers) — the
# metered-size contract of common/src/record (model.metered_size_col)
def metered(body: bytes) -> int:
    return 8 + len(body)


def test_check_tail_scenarios(store, spark):
    """read.rs::test_check_tail_scenarios — empty-stream tail is the MIN
    position, an append moves it to the ack end, and a missing basin is
    BasinNotFound."""
    assert store.check_tail(BASIN, STREAM) == (0, 0)
    ack = store.append(BASIN, STREAM, [Record(body=b"test data", timestamp=500)])
    assert store.check_tail(BASIN, STREAM) == (ack.end_seq, ack.end_ts)
    with pytest.raises(BasinNotFound):
        store.check_tail("check-tail-missing", "missing")


def test_read_from_beginning(store):
    """read.rs::test_read_from_beginning."""
    store.append(BASIN, STREAM, [Record(body=b"test data") for _ in range(5)])
    assert bodies(store.read(BASIN, STREAM)) == [b"test data"] * 5


def test_read_with_limit(store):
    """read.rs::test_read_with_limit — count 5 of 10."""
    expected = [f"record-{i}".encode() for i in range(10)]
    for body in expected:
        store.append(BASIN, STREAM, [Record(body=body)])
    got = bodies(
        store.read(BASIN, STREAM, ReadStart(seq_num=0), ReadLimit(count=5))
    )
    assert got == expected[:5]


def test_read_unwritten_clamp_behavior(store):
    """read.rs::test_read_unwritten_clamp_behavior — beyond-tail without
    clamp opens as Unwritten; with clamp (and a followable end) it opens
    and yields nothing."""
    store.append(BASIN, STREAM, [Record(body=b"record")])
    with pytest.raises(RangeNotSatisfiable) as ei:
        store.read_session(BASIN, STREAM, start=ReadStart(seq_num=100))
    assert ei.value.tail == 1
    events = list(
        store.read_session(
            BASIN, STREAM, start=ReadStart(seq_num=100, clamp=True), wait_s=0.0
        )
    )
    assert [e for e in events if e.kind == "batch"] == []


@pytest.mark.parametrize(
    "start_case,end_case,clamp",
    [
        ("tail_offset", "count_no_wait", False),
        ("seq_at_end", "count_zero_wait", False),
        ("ts_after_end", "timestamp_max", False),
        ("ts_after_end", "count_no_wait", True),
    ],
    ids=[
        "tail_offset_no_wait",
        "tail_seq_num_zero_wait",
        "tail_timestamp_max",
        "timestamp_after_end_with_clamp",
    ],
)
def test_read_at_tail_without_follow_returns_unwritten(
    store, start_case, end_case, clamp
):
    """read.rs::test_read_at_tail_without_follow_returns_unwritten — all
    spellings of "start at the tail" with a non-followable end open as
    Unwritten carrying the tail (read.rs:270-275; may_follow is
    common/src/stream.rs:336-339)."""
    ack = store.append(
        BASIN,
        STREAM,
        [Record(body=b"record 1", timestamp=1000),
         Record(body=b"record 2", timestamp=2000)],
    )
    start = {
        "tail_offset": ReadStart(tail_offset=0, clamp=clamp),
        "seq_at_end": ReadStart(seq_num=ack.end_seq, clamp=clamp),
        "ts_after_end": ReadStart(timestamp=ack.end_ts + 1, clamp=clamp),
    }[start_case]
    limit, wait_s = {
        "count_no_wait": (ReadLimit(count=10), None),
        "count_zero_wait": (ReadLimit(count=10), 0.0),
        "timestamp_max": (ReadLimit(until=2**62), None),
    }[end_case]
    with pytest.raises(RangeNotSatisfiable) as ei:
        store.read_session(BASIN, STREAM, start=start, limit=limit, wait_s=wait_s)
    assert ei.value.tail == ack.end_seq


def test_read_with_bytes_limit_exact_fit(store):
    """read.rs::test_read_with_bytes_limit_exact_fit."""
    recs = [b"record-1", b"record-2", b"record-3"]
    store.append(BASIN, STREAM, [Record(body=b) for b in recs])
    exact = metered(recs[0]) + metered(recs[1])
    got = bodies(store.read(BASIN, STREAM, limit=ReadLimit(bytes=exact)))
    assert got == recs[:2]


def test_read_with_bytes_limit_smaller_than_first_record_returns_empty(store):
    """read.rs::test_read_with_bytes_limit_smaller_than_first_record_returns_empty."""
    store.append(BASIN, STREAM, [Record(body=b"oversized")])
    got = bodies(
        store.read(BASIN, STREAM, limit=ReadLimit(bytes=metered(b"oversized") - 1))
    )
    assert got == []


def test_read_with_count_or_bytes_limit_count_wins(store):
    """read.rs::test_read_with_count_or_bytes_limit_count_wins."""
    expected = [f"count-{i}".encode() for i in range(20)]
    for body in expected:
        store.append(BASIN, STREAM, [Record(body=body)])
    got = bodies(
        store.read(BASIN, STREAM, limit=ReadLimit(count=5, bytes=1_000_000))
    )
    assert got == expected[:5]


def test_read_with_count_or_bytes_limit_bytes_wins(store):
    """read.rs::test_read_with_count_or_bytes_limit_bytes_wins."""
    recs = [f"slot-{i}".encode() for i in range(5)]
    store.append(BASIN, STREAM, [Record(body=b) for b in recs])
    got = bodies(
        store.read(
            BASIN, STREAM, limit=ReadLimit(count=100, bytes=metered(recs[0]) * 3)
        )
    )
    assert got == recs[:3]


@pytest.mark.parametrize(
    "cutoff,expected",
    [
        (500, []),
        (2000, [b"ts-1000"]),
        (5000, [b"ts-1000", b"ts-2000-a", b"ts-2000-b", b"ts-3000"]),
    ],
    ids=["before", "exact_duplicate_boundary", "after"],
)
def test_read_until_timestamp_boundaries(store, cutoff, expected):
    """read.rs::test_read_until_timestamp_boundaries — until is
    exclusive, including at a duplicated boundary timestamp."""
    seed_timestamped_stream(
        store,
        [(b"ts-1000", 1000), (b"ts-2000-a", 2000),
         (b"ts-2000-b", 2000), (b"ts-3000", 3000)],
    )
    df = store.read(BASIN, STREAM, limit=ReadLimit(until=cutoff))
    rows = df.collect()
    assert [r.body for r in rows] == expected
    assert all(r.timestamp < cutoff for r in rows)


def test_read_until_with_additional_limits(store):
    """read.rs::test_read_until_with_additional_limits — count/bytes and
    the until cutoff compose; whichever is tighter wins."""
    seed_timestamped_stream(
        store,
        [(f"ts-{t}".encode(), t) for t in (1000, 2000, 3000, 4000, 5000)],
    )
    per = metered(b"ts-1000")
    cases = [
        ("count wins", ReadLimit(count=2, until=5000), [b"ts-1000", b"ts-2000"]),
        ("timestamp beats count", ReadLimit(count=10, until=3500),
         [b"ts-1000", b"ts-2000", b"ts-3000"]),
        ("bytes win", ReadLimit(bytes=per * 2, until=5000),
         [b"ts-1000", b"ts-2000"]),
        ("timestamp beats bytes", ReadLimit(bytes=per * 100, until=3500),
         [b"ts-1000", b"ts-2000", b"ts-3000"]),
    ]
    for label, limit, expected in cases:
        assert bodies(store.read(BASIN, STREAM, limit=limit)) == expected, label


def test_read_timestamp_range_with_from_and_until(store):
    """read.rs::test_read_timestamp_range_with_from_and_until — from is
    inclusive (first record with ts >= from, duplicates included), until
    exclusive."""
    seed_timestamped_stream(
        store,
        [(b"ts-500", 500), (b"ts-2000-a", 2000), (b"ts-2000-b", 2000),
         (b"ts-2500", 2500), (b"ts-3500", 3500), (b"ts-4500", 4500),
         (b"ts-5500", 5500)],
    )
    rows = store.read(
        BASIN, STREAM, ReadStart(timestamp=2000), ReadLimit(until=4500)
    ).collect()
    assert [r.body for r in rows] == [
        b"ts-2000-a", b"ts-2000-b", b"ts-2500", b"ts-3500"
    ]
    assert all(2000 <= r.timestamp < 4500 for r in rows)


def test_read_from_tail_times_out_without_new_data(store):
    """read.rs::test_read_from_tail_times_out_without_new_data — a
    follow session over an idle stream emits only heartbeats and closes
    exactly at the wait deadline (paused clock, no real sleeps)."""

    class FakeMono:
        t = 0.0

        def __call__(self):
            return self.t

        def sleep(self, dt):
            self.t += dt

    store.append(BASIN, STREAM, [Record(body=b"seed data")])
    mono = FakeMono()
    events = list(
        store.read_session(
            BASIN, STREAM, start=ReadStart(tail_offset=0),
            wait_s=0.1, poll_s=0.001, heartbeat_s=1.0,
            clock=mono, sleep=mono.sleep,
        )
    )
    assert events and all(e.kind == "heartbeat" for e in events)
    assert mono.t == pytest.approx(0.1, abs=0.001)
