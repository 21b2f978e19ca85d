"""Crash consistency of the append commit sequence.

The reference's durability boundary is one atomic SlateDB WriteBatch
followed by a durability watermark before acks
(lite/src/backend/streamer.rs:1010-1070, ordered-ack bookkeeping
lite/src/backend/append.rs:96-220). The engine's equivalent is:

    (1) records-parquet write  — the durable commit
    (2) driver hot-state advance (tail / last_ts / token / trim)

Invariant under a crash BETWEEN (1) and (2): the parquet write alone
defines the log. Driver state is a cache, rebuilt from storage on
recovery (store.recover_state / lazy per-stream recovery), so

- every record the write landed is visible to readers after recovery
  and counted in the recovered tail — no phantom or lost seq_nums;
- a fresh append after recovery continues at the recovered tail —
  seq_nums stay contiguous and unique, never reassigned;
- a client retry guarded by match_seq_num (the CAS the reference
  offers for exactly this ack-lost case) is rejected instead of
  double-appending.

The crash is injected by monkeypatching ``_invalidate_records``, which
both append paths call immediately after the parquet write and before
any state mutation reaches a committed ack. Spark's parquet commit
protocol (task temp files + rename) makes step (1) itself all-or-
nothing per batch, which is why the injection point between the steps
is the only window that needs evidence.
"""

from __future__ import annotations

import pytest

from s2_spark.catalog import BasinConfig
from s2_spark.model import Record, SeqNumMismatch
from s2_spark.store import StreamStore

BASIN = "crash-basin"


def _fresh(spark, base):
    """A store over ``base`` whose basin auto-creates streams on append
    (the catalog persists to ``base/_meta``, so a recovery store reads
    the same basin config back)."""
    s = StreamStore(spark, base)
    s.catalog.create_basin(
        BASIN, BasinConfig(create_stream_on_append=True, create_stream_on_read=True)
    )
    return s


class _Boom(RuntimeError):
    pass


def _crashing(store):
    """Make the store 'crash' right after the durable parquet write,
    before hot state advances."""

    def boom():
        raise _Boom("simulated crash between parquet write and state advance")

    store._invalidate_records = boom
    return store


def _all_seqs(store, stream):
    return [
        r["seq_num"]
        for r in store.read(BASIN, stream).select("seq_num").collect()
    ]


def test_unary_crash_between_write_and_state_then_recover(spark, tmp_path):
    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=b"a"), Record(body=b"b"), Record(body=b"c")])

    _crashing(s1)
    with pytest.raises(_Boom):
        s1.append(BASIN, "s", [Record(body=b"d"), Record(body=b"e")])
    # the crashed process's memory is gone; a new store recovers from
    # storage alone
    s2 = StreamStore(spark, base)
    s2.recover_state()
    tail, _ = s2.check_tail(BASIN, "s")
    # the batch was durably written before the crash: it IS in the log
    assert tail == 5
    assert _all_seqs(s2, "s") == [0, 1, 2, 3, 4]

    # a retry guarded by match_seq_num=3 (the tail the client saw
    # before the crashed call) is rejected — the CAS surfaces that the
    # earlier write committed, so nothing is double-appended
    with pytest.raises(SeqNumMismatch):
        s2.append(BASIN, "s", [Record(body=b"d"), Record(body=b"e")], match_seq_num=3)
    assert s2.check_tail(BASIN, "s")[0] == 5

    # an unconditional append continues at the recovered tail: seq_nums
    # stay contiguous and unique (no reassignment over the orphan batch)
    ack = s2.append(BASIN, "s", [Record(body=b"f")])
    assert ack.start_seq == 5
    assert _all_seqs(s2, "s") == [0, 1, 2, 3, 4, 5]


def test_unary_recovery_is_lazy_without_explicit_recover(spark, tmp_path):
    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=b"a")])
    _crashing(s1)
    with pytest.raises(_Boom):
        s1.append(BASIN, "s", [Record(body=b"b")])
    # no recover_state() call: the first touch of the stream on a fresh
    # store probes storage (store._st lazy recovery) and still lands on
    # the post-write tail
    s2 = StreamStore(spark, base)
    assert s2.check_tail(BASIN, "s")[0] == 2
    ack = s2.append(BASIN, "s", [Record(body=b"c")])
    assert ack.start_seq == 2
    assert _all_seqs(s2, "s") == [0, 1, 2]


def test_bulk_append_crash_between_write_and_state_then_recover(spark, tmp_path):
    from pyspark.sql import functions as F

    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)

    def batch(tag, n):
        return spark.range(n).select(
            F.lit(BASIN).alias("basin"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("stream"),
            F.lit(None).cast("long").alias("timestamp"),
            F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
            F.encode(F.concat(F.lit(tag), F.col("id").cast("string")), "utf-8").alias(
                "body"
            ),
            F.col("id").alias("ingest_order"),
        )

    s1.bulk_append(batch("x", 90))  # 30 records per stream
    _crashing(s1)
    with pytest.raises(_Boom):
        s1.bulk_append(batch("y", 30))

    s2 = StreamStore(spark, base)
    s2.recover_state()
    # the crashed bulk batch was durably written: every stream's
    # recovered tail covers it, readers see contiguous seq_nums
    for i in range(3):
        assert s2.check_tail(BASIN, f"s{i}")[0] == 40
        assert _all_seqs(s2, f"s{i}") == list(range(40))

    # a follow-up bulk append sequences strictly after the recovered
    # tails — contiguous, no duplicate assignment anywhere
    s2.bulk_append(batch("z", 30))
    for i in range(3):
        assert _all_seqs(s2, f"s{i}") == list(range(50))


def test_bulk_append_admission_failure_writes_nothing(spark, tmp_path):
    """The other half of validate-then-commit: a batch rejected at
    admission (invalid record) must leave storage untouched — the
    failure is BEFORE the durability boundary, so recovery sees the old
    tail, not a half-committed batch."""
    from pyspark.sql import functions as F

    from s2_spark.model import InvalidRecord

    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    good = spark.range(5).select(
        F.lit(BASIN).alias("basin"),
        F.lit("s").alias("stream"),
        F.lit(None).cast("long").alias("timestamp"),
        F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("body"),
        F.col("id").alias("ingest_order"),
    )
    s1.bulk_append(good)
    bad = good.withColumn(
        "headers",
        F.array(
            F.struct(
                F.lit(b"").alias("name"), F.lit(b"not-a-command").alias("value")
            )
        ),
    )
    with pytest.raises(InvalidRecord):
        s1.bulk_append(bad)
    s2 = StreamStore(spark, base)
    s2.recover_state()
    assert s2.check_tail(BASIN, "s")[0] == 5
    assert _all_seqs(s2, "s") == list(range(5))
