"""Tests for access-token scopes (A24), JSON record encodings
(api/src/data.rs), and the long-poll wait read."""

from __future__ import annotations

import threading
import time

import pytest

from pyspark.sql import functions as F

from s2_spark.catalog import Catalog
from s2_spark.formats import decode_json, encode_json
from s2_spark.model import Record
from s2_spark.operators.access import AccessToken, ResourceMatcher
from s2_spark.store import ReadStart, StreamStore

BASIN = "test-basin"


@pytest.fixture()
def store(spark, tmp_path):
    cat = Catalog(spark)
    cat.create_basin(BASIN)
    cat.create_stream(BASIN, "s1")
    return StreamStore(spark, str(tmp_path / "records"), catalog=cat)


# --- access tokens (A24) ---------------------------------------------------


def test_token_scope_checks():
    tok = AccessToken(
        "tok-1",
        basins=(ResourceMatcher(BASIN),),
        streams=(ResourceMatcher("logs-", prefix=True),),
        can_read=True,
        can_write=False,
    )
    assert tok.allows("read", BASIN, "logs-a")
    assert not tok.allows("read", BASIN, "metrics-a")  # stream out of scope
    assert not tok.allows("read", "other-basin1", "logs-a")
    assert not tok.allows("append", BASIN, "logs-a")  # read-only
    assert not tok.allows("unknown-op", BASIN, "logs-a")


def test_token_expiry():
    tok = AccessToken("t", expires_at_ms=1000)
    assert tok.allows("read", "b", now_ms=999)
    assert not tok.allows("read", "b", now_ms=1000)


def test_token_id_cap():
    with pytest.raises(ValueError):
        AccessToken("x" * 97)


def test_scope_filter_prunes_records(store):
    store.catalog.create_stream(BASIN, "logs-a")
    store.catalog.create_stream(BASIN, "metrics-a")
    store.append(BASIN, "logs-a", [Record(body=b"l")])
    store.append(BASIN, "metrics-a", [Record(body=b"m")])
    tok = AccessToken(
        "t", basins=(ResourceMatcher(BASIN),), streams=(ResourceMatcher("logs-", prefix=True),)
    )
    visible = store.records_df().filter(tok.scope_filter())
    assert [r.stream for r in visible.collect()] == ["logs-a"]


# --- JSON encodings -----------------------------------------------------------


def _sample(store):
    store.append(
        BASIN,
        "s1",
        [
            Record(body=b"\x00\xffbinary", headers=[(b"k", b"\x01\x02"), (b"k", b"v2")]),
            Record(body=b"plain text", headers=[]),
        ],
    )
    return store.records_df()


def test_json_base64_roundtrip(store):
    recs = _sample(store)
    encoded = encode_json(recs, base64_encoding=True)
    j = encoded.orderBy("seq_num").first()["json"]
    assert '"seq_num":0' in j and '"body":"' in j
    back = decode_json(encoded, base64_encoding=True).orderBy("seq_num").collect()
    orig = recs.orderBy("seq_num").collect()
    for b, o in zip(back, orig):
        assert bytes(b.body) == bytes(o.body)
        assert [(bytes(h.name), bytes(h.value)) for h in b.headers] == [
            (bytes(h.name), bytes(h.value)) for h in o.headers
        ]
        assert (b.seq_num, b.timestamp) == (o.seq_num, o.timestamp)


def test_json_raw_roundtrip_utf8(store):
    store.append(BASIN, "s1", [Record(body="utf-8 text ok".encode(), headers=[(b"h", b"v")])])
    recs = store.records_df()
    back = decode_json(encode_json(recs, base64_encoding=False), base64_encoding=False)
    row = back.orderBy("seq_num").first()
    assert bytes(row.body) == b"utf-8 text ok"
    assert [(bytes(h.name), bytes(h.value)) for h in row.headers] == [(b"h", b"v")]


# --- long-poll wait (A7) --------------------------------------------------------


def test_read_wait_returns_immediately_when_data_exists(store):
    store.append(BASIN, "s1", [Record(body=b"x")])
    t0 = time.monotonic()
    rows = store.read_wait(BASIN, "s1", ReadStart(seq_num=0), wait_s=5).collect()
    assert len(rows) == 1
    assert time.monotonic() - t0 < 4  # no full wait burned


def test_read_wait_times_out_empty(store):
    t0 = time.monotonic()
    rows = store.read_wait(BASIN, "s1", ReadStart(seq_num=0), wait_s=0.3).collect()
    assert rows == []
    assert 0.25 <= time.monotonic() - t0 < 5


def test_read_wait_wakes_on_append(store):
    def later_append():
        time.sleep(0.4)
        store.append(BASIN, "s1", [Record(body=b"late")])

    th = threading.Thread(target=later_append)
    th.start()
    rows = store.read_wait(BASIN, "s1", ReadStart(seq_num=0), wait_s=10).collect()
    th.join()
    assert [bytes(r.body) for r in rows] == [b"late"]
