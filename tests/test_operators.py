"""Tests for metrics (A26), reconcile (A30), crypto (A19), maintenance
jobs (A17/A18/A20), and unary read caps."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from s2_spark.catalog import BasinConfig, Catalog, StreamConfig
from s2_spark.model import Record
from s2_spark.operators import crypto, maintenance, metrics, reconcile
from s2_spark.store import ReadLimit, StreamStore

BASIN = "test-basin"


class FakeClock:
    def __init__(self, ms=1_000_000_000):
        self.ms = ms

    def __call__(self):
        return self.ms


@pytest.fixture()
def store(spark, tmp_path):
    clock = FakeClock()
    cat = Catalog(spark, clock=clock)
    cat.create_basin(BASIN)
    cat.create_stream(BASIN, "s1")
    s = StreamStore(spark, str(tmp_path / "records"), catalog=cat, clock=clock)
    s.clock = clock
    return s


# --- metrics (A26) ---------------------------------------------------------


def _hour_ms(h):
    return h * 3600 * 1000


def _fill(store, n=30):
    for i in range(n):
        store.append(
            BASIN, "s1", [Record(body=b"x" * 100, timestamp=_hour_ms(i // 10))]
        )


def test_metrics_append_ops_buckets(store):
    _fill(store)
    rows = metrics.append_ops(store.records_df(), "hour").collect()
    assert [(r.bucket, r.ops) for r in rows] == [
        (_hour_ms(0), 10),
        (_hour_ms(1), 10),
        (_hour_ms(2), 10),
    ]


def test_metrics_throughput_and_gauge(store):
    _fill(store)
    thr = metrics.append_throughput(store.records_df(), "hour").collect()
    per_rec = 8 + 100
    assert all(r.bytes == 10 * per_rec for r in thr)
    gauge = metrics.storage_gauge(store.records_df(), "hour").collect()
    assert [r.level for r in gauge] == [
        10 * per_rec,
        20 * per_rec,
        30 * per_rec,
    ]


def test_metrics_label_and_active(store):
    store.catalog.create_stream(BASIN, "s2")
    _fill(store, 10)
    store.append(BASIN, "s2", [Record(body=b"y", timestamp=0)])
    lbl = metrics.ops_by_label(store.records_df(), "hour").collect()
    assert {(r.stream, r.ops) for r in lbl} == {("s1", 10), ("s2", 1)}
    act = metrics.active_streams(store.records_df(), "day").collect()
    assert act[0].active == 2


# --- reconcile (A30) ----------------------------------------------------------


def test_diff_plan_actions(spark, store):
    store.catalog.create_stream(BASIN, "keep-me")
    store.catalog.create_stream(BASIN, "extra")
    plan = {
        r.stream: r.action
        for r in reconcile.plan_df(
            spark, store.catalog, BASIN, ["keep-me", "new-one"]
        ).collect()
    }
    assert plan == {"keep-me": "=", "new-one": "+", "extra": "-", "s1": "-"}


def test_apply_creates_and_prunes(spark, store):
    store.catalog.create_stream(BASIN, "extra")
    res = reconcile.apply_plan(
        spark, store.catalog, BASIN, ["s1", "new-a", "new-b"], prune=True
    )
    assert res.created == ["new-a", "new-b"]
    assert res.unchanged == ["s1"]
    assert res.pruned == ["extra"]
    names, _ = store.catalog.list_streams(BASIN)
    assert names == ["new-a", "new-b", "s1"]
    # idempotent second apply: everything unchanged
    res2 = reconcile.apply_plan(spark, store.catalog, BASIN, ["s1", "new-a", "new-b"])
    assert res2.created == [] and len(res2.unchanged) == 3


# --- crypto (A19) ----------------------------------------------------------------


def test_encrypt_roundtrip_and_aad_binding(spark, store):
    store.append(BASIN, "s1", [Record(body=b"secret-payload")])
    key = b"0" * 32
    enc = crypto.encrypt_bodies(store.records_df(), key)
    enc_body = bytes(enc.first()["body"])
    assert enc_body != b"secret-payload"
    dec = crypto.decrypt_bodies(enc, key)
    assert bytes(dec.first()["body"]) == b"secret-payload"
    # AAD binds to the stream: moving ciphertext to another stream fails
    moved = enc.withColumn("stream", F.lit("other-stream"))
    with pytest.raises(Exception):
        crypto.decrypt_bodies(moved, key).collect()


def test_aes_gcm_spec_vectors_pin_reference_impl():
    """The pure-Python GCM reference (tests/_gcm_ref.py — shares no
    code with the JVM path) reproduces the GCM spec's published AES-256
    test vectors (McGrew & Viega, 'The Galois/Counter Mode of
    Operation', appendix B, cases 13-16)."""
    from _gcm_ref import gcm_decrypt, gcm_encrypt

    K0, IV0 = bytes(32), bytes(12)
    assert gcm_encrypt(K0, IV0, b"", b"")[1].hex() == (
        "530f8afbc74536b9a963b4f1c4cb738b"
    )
    ct, tag = gcm_encrypt(K0, IV0, bytes(16), b"")
    assert ct.hex() == "cea7403d4d606b6e074ec5d3baf39d18"
    assert tag.hex() == "d0d1c8a799996bf0265b98b5d48ab919"

    K = bytes.fromhex(
        "feffe9928665731c6d6a8f9467308308feffe9928665731c6d6a8f9467308308"
    )
    IV = bytes.fromhex("cafebabefacedbaddecaf888")
    P = bytes.fromhex(
        "d9313225f88406e5a55909c5aff5269a86a7a9531534f7da2e4c303d8a318a72"
        "1c3c0c95956809532fcf0e2449a6b525b16aedf5aa0de657ba637b391aafd255"
    )
    ct, tag = gcm_encrypt(K, IV, P, b"")
    assert ct.hex().endswith("bcc9f662898015ad")
    assert tag.hex() == "b094dac5d93471bdec1a502270e3cc6c"
    A = bytes.fromhex("feedfacedeadbeeffeedfacedeadbeefabaddad2")
    ct16, tag16 = gcm_encrypt(K, IV, P[:60], A)
    assert tag16.hex() == "76fc6ece0f4e1768cddf8853bb2d551b"
    assert gcm_decrypt(K, IV, ct16, tag16, A) == P[:60]


def test_aes_gcm_known_answer_through_encrypt_bodies(spark):
    """The engine's AES-256-GCM path is externally anchored (the AEGIS
    analogue of the RFC-vector pinning): encrypt_bodies with a pinned
    IV must produce EXACTLY iv ‖ ct ‖ tag as computed by the spec-
    vector-pinned independent reference, with the stream-identity AAD
    (basin\\0stream) bound in — a known-answer chain equivalent to a
    CAVP KAT but covering the engine's actual AAD derivation."""
    from _gcm_ref import gcm_encrypt

    key = bytes(range(32))
    iv = bytes.fromhex("cafebabefacedbaddecaf888")
    bodies = [b"", b"x", b"hello s2 records!" * 3]
    df = spark.createDataFrame(
        [("basin-one", "stream-a", b) for b in bodies],
        "basin string, stream string, body binary",
    )
    got = {
        bytes(r["plain"] or b""): bytes(r["body"])
        for r in crypto.encrypt_bodies(
            df.withColumn("plain", F.col("body")), key, iv=iv
        ).collect()
    }
    aad = b"basin-one\x00stream-a"
    for body in bodies:
        ct, tag = gcm_encrypt(key, iv, body, aad)
        assert got[body] == iv + ct + tag
    # and the engine decrypts its own deterministic output
    dec = crypto.decrypt_bodies(crypto.encrypt_bodies(df, key, iv=iv), key)
    assert sorted(bytes(r["body"]) for r in dec.collect()) == sorted(bodies)


def test_metering_unchanged_by_encryption(spark, store):
    from s2_spark.model import metered_size_col

    store.append(BASIN, "s1", [Record(body=b"12345678")])
    plain = store.records_df().select(metered_size_col().alias("m")).first()["m"]
    assert plain == 8 + 8  # metering is over plaintext, pre-encryption


# --- maintenance (A17/A18/A20) ------------------------------------------------------


def test_retention_sweep_advances_trim(store):
    store.catalog.reconfigure_stream(BASIN, "s1", StreamConfig(retention_age_secs=3600))
    store.clock.ms = _hour_ms(10)
    store.append(BASIN, "s1", [Record(body=b"old", timestamp=_hour_ms(1))])
    store.append(BASIN, "s1", [Record(body=b"new", timestamp=_hour_ms(10))])
    n = maintenance.retention_sweep(store)
    assert n == 1
    rows = store.read(BASIN, "s1").collect()
    # the sweep's trim is a durable in-band command record riding the
    # log (like any trim); envelope records are what retention governs
    env = [
        bytes(r.body)
        for r in rows
        if not (len(r.headers) == 1 and bytes(r.headers[0]["name"]) == b"")
    ]
    assert env == [b"new"]
    # durability: a cold store over the same directory re-derives the
    # trim from the command — the expired record stays hidden
    from s2_spark.store import StreamStore as _SS

    cold = _SS(store.spark, store.base_dir, catalog=store.catalog)
    assert cold._st(BASIN, "s1").trim_point == store._st(BASIN, "s1").trim_point


def test_delete_on_empty_sweep(store):
    store.catalog.reconfigure_stream(
        BASIN, "s1", StreamConfig(delete_on_empty_min_age_secs=60)
    )
    store.append(BASIN, "s1", [Record(body=b"a"), Record(body=b"b")])
    store.trim(BASIN, "s1", 1 << 62)  # trim everything (clamped to own seq)
    # too young: not deleted
    assert maintenance.delete_on_empty_sweep(store) == []
    store.clock.ms += 61_000
    deleted = maintenance.delete_on_empty_sweep(store)
    assert deleted == [f"{BASIN}/s1"]
    with pytest.raises(Exception):
        store.catalog.get_stream(BASIN, "s1")


def test_basin_deletion_sweep(store):
    store.append(BASIN, "s1", [Record(body=b"a")])
    store.catalog.delete_basin(BASIN)
    finished = maintenance.basin_deletion_sweep(store)
    assert finished == [f"{BASIN}/s1"]
    assert store._st(BASIN, "s1").trim_point == store._st(BASIN, "s1").tail_seq


# --- generalized as-of join (operators/asof.py) -----------------------------------


def test_asof_backward_and_forward(spark):
    from s2_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 10, 4)],
        "k string, t long, lid int",
    )
    right = spark.createDataFrame(
        [("a", 8, "r1"), ("a", 15, "r2"), ("a", 20, "r3"), ("b", 99, "r4")],
        "k string, t long, tag string",
    )
    back = {
        r.lid: r.r_tag
        for r in asof_join(left, right, on="t", by=["k"], direction="backward").collect()
    }
    # lid1 t=10 → r1(8); lid2 t=20 → r3(ties match); lid3 t=5 → None; lid4 b@10 → None
    assert back == {1: "r1", 2: "r3", 3: None, 4: None}
    fwd = {
        r.lid: r.r_tag
        for r in asof_join(left, right, on="t", by=["k"], direction="forward").collect()
    }
    # forward: lid1 t=10 → r2(15); lid2 t=20 → r3(20, tie); lid3 t=5 → r1(8); lid4 → r4(99)
    assert fwd == {1: "r2", 2: "r3", 3: "r1", 4: "r4"}


def test_asof_keyless_uses_chunked_prefix_and_matches_brute(spark):
    """Keyless as-of (by=[]) must not collapse onto a global window —
    it routes through the chunked prefix — and must agree with a brute
    Python reference in both directions, ties and misses included. Key
    range spans multiple 65536-wide chunks so the boundary fill is
    actually exercised."""
    import random

    from s2_spark.operators.asof import asof_join

    rng = random.Random(5)
    lrows = [(rng.randrange(0, 200_000), i) for i in range(120)]
    rrows = [(rng.randrange(0, 200_000), f"r{i}") for i in range(60)]
    left = spark.createDataFrame(lrows, "t long, lid long")
    right = spark.createDataFrame(rrows, "t long, tag string")

    def brute(direction):
        out = {}
        for t, lid in lrows:
            if direction == "backward":
                cands = [(rt, tag) for rt, tag in rrows if rt <= t]
                best = max(cands) if cands else None
            else:
                cands = [(-rt, tag) for rt, tag in rrows if rt >= t]
                best = max(cands) if cands else None
            out[lid] = best[1] if best else None
        return out

    for direction in ("backward", "forward"):
        got_df = asof_join(left, right, on="t", direction=direction)
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        # no unpartitioned window anywhere in the keyless plan
        import re

        for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
            first = m.group(1).split(",", 1)[0]
            assert " ASC" not in first and " DESC" not in first, plan[:500]
        got = {r.lid: r.r_tag for r in got_df.collect()}
        assert got == brute(direction), direction


def test_asof_keyless_map_payload_falls_back_to_window(spark):
    """A map-typed right payload is non-orderable, so the keyless path
    keeps the window form instead of erroring in the struct max."""
    from s2_spark.operators.asof import asof_join

    left = spark.createDataFrame([(10, 1), (20, 2)], "t long, lid long")
    right = spark.createDataFrame(
        [(8, {"a": "1"}), (15, {"b": "2"})], "t long, attrs map<string,string>"
    )
    got = {
        r.lid: dict(r.r_attrs) if r.r_attrs is not None else None
        for r in asof_join(left, right, on="t", direction="backward").collect()
    }
    assert got == {1: {"a": "1"}, 2: {"b": "2"}}


# --- unary read caps -------------------------------------------------------------------


def test_read_unary_caps(store):
    for i in range(0, 1200, 100):
        store.append(BASIN, "s1", [Record(body=b"z") for _ in range(100)])
    out = store.read_unary(BASIN, "s1", limit=ReadLimit(count=5000))
    assert out.count() == 1000  # capped at 1000 records
    big = StreamStore  # noqa: F841
    # bytes cap: records of ~9 metered bytes → 1 MiB cap not binding here,
    # but an explicit larger request is clamped to the cap
    out2 = store.read_unary(BASIN, "s1", limit=ReadLimit(bytes=100 * 1024 * 1024))
    assert out2.count() == 1000


def test_storage_gauge_is_partition_scoped(store):
    """The gauge's running total must never plan a global unpartitioned
    window (the 100 TB serialization hazard): in every
    windowspecdefinition of the optimized plan, the first argument is a
    partition expression, not an ordering (an unpartitioned spec starts
    directly with 'col ASC/DESC ...')."""
    _fill(store)
    df = metrics.storage_gauge(store.records_df(), "hour")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = plan.split("windowspecdefinition(")[1:]
    assert specs, "expected at least one window in the gauge plan"
    for spec in specs:
        first_arg = spec.split(",", 1)[0]
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            "unpartitioned window found:\n" + plan
        )


def test_storage_gauge_two_phase_matches_single_window(store):
    """Two-phase prefix sum must equal the naive running total."""
    _fill(store)
    from pyspark.sql import Window as W

    from s2_spark.model import metered_size_col

    per_bucket = (
        metrics._bucketed(store.records_df(), "minute")
        .groupBy("bucket")
        .agg(F.sum(metered_size_col()).alias("delta"))
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = {
        r["bucket"]: r["level"]
        for r in per_bucket.select(
            "bucket", F.sum("delta").over(w).alias("level")
        ).collect()
    }
    got = {
        r["bucket"]: r["level"]
        for r in metrics.storage_gauge(store.records_df(), "minute").collect()
    }
    assert got == naive


def test_cipher_config_validation(spark):
    """A19: both reference ciphers (docs/adr/csek.md) are accepted —
    AES-256-GCM and AEGIS-256 — while unknown names fail with a typed
    error, never silently downgraded."""
    from s2_spark.catalog import BasinConfig, Catalog
    from s2_spark.model import UnsupportedCipher

    cat = Catalog(spark)
    meta = cat.create_basin("cipher-basin", BasinConfig(stream_cipher="aegis-256"))
    assert meta.config.stream_cipher == "aegis-256"
    meta = cat.create_basin("cipher-basin-2", BasinConfig(stream_cipher="aes-256-gcm"))
    assert meta.config.stream_cipher == "aes-256-gcm"
    with pytest.raises(UnsupportedCipher, match="csek"):
        cat.reconfigure_basin("cipher-basin", BasinConfig(stream_cipher="chacha20"))


# --- locations (A25, api/src/v1/location.rs) --------------------------------


def test_locations_list_get_set_default(spark):
    from s2_spark.model import S2Error
    from s2_spark.operators.locations import LocationRegistry

    reg = LocationRegistry(spark)
    names = [loc.name for loc in reg.list_locations()]
    assert names == sorted(names) and "local" in names
    assert reg.get_default().name == "local"
    got = reg.set_default("aws:us-east-1")
    assert got.name == "aws:us-east-1" and reg.get_default().name == "aws:us-east-1"
    with pytest.raises(S2Error):
        reg.set_default("nowhere:at-all")  # valid name, unknown location
    df = reg.locations_df()
    assert df.columns == ["name", "is_private"]
    assert df.count() == len(names)


def test_location_name_validation(spark):
    from s2_spark.model import S2Error
    from s2_spark.operators.locations import validate_location_name

    validate_location_name("aws:us-east-1")
    validate_location_name("a" * 64)
    for bad in ["", "a" * 65, "space here", "unders_core", "ünïcode"]:
        with pytest.raises(S2Error):
            validate_location_name(bad)


# --- chunked two-phase prefix (operators/prefix.py) ------------------------


def test_chunked_running_sum_matches_global(spark):
    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_running

    df = spark.range(500).select(
        (F.col("id") * 7).alias("k"),  # sparse order key
        (F.col("id") % 13).cast("long").alias("v"),
    )
    got = chunked_running(df, ["k"], "v", "run", kind="sum", chunk_width=64)
    ref = df.withColumn(
        "run",
        F.sum("v").over(
            W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    assert sorted(got.select("k", "run").collect()) == sorted(
        ref.select("k", "run").collect()
    )


def test_chunked_running_max_with_nulls(spark):
    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_running

    # nulls in the value column (j7's probe rows): max must skip them,
    # leading rows before any non-null value stay null
    df = spark.range(300).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.col("id")).cast("long").alias("v"),
    )
    got = chunked_running(df, ["k"], "v", "rm", kind="max", chunk_width=32)
    ref = df.withColumn(
        "rm",
        F.max("v").over(
            W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    assert sorted(got.select("k", "rm").collect()) == sorted(
        ref.select("k", "rm").collect()
    )


def test_chunked_running_all_null_leading_chunk(spark):
    from s2_spark.operators.prefix import chunked_running

    # an entire leading chunk of nulls: its chunk total is null; later
    # chunks' offsets must still fold correctly
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") >= 40, F.lit(1)).cast("long").alias("v"),
    )
    got = (
        chunked_running(df, ["k"], "v", "run", kind="sum", chunk_width=20)
        .orderBy("k")
        .collect()
    )
    assert got[39]["run"] is None  # before any value arrives
    assert got[40]["run"] == 1
    assert got[99]["run"] == 60


def test_chunked_running_null_prefix_after_valued_chunk(spark):
    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_running

    # the ADVICE case: a chunk whose leading rows are all-NULL following
    # chunks that DO carry values — SQL running sum skips nulls, so those
    # rows must surface the earlier chunks' sum, not NULL
    df = spark.range(60).select(
        F.col("id").alias("k"),
        F.when((F.col("id") < 20) | (F.col("id") >= 50), F.lit(1))
        .cast("long")
        .alias("v"),
    )
    got = chunked_running(df, ["k"], "v", "run", kind="sum", chunk_width=20)
    ref = df.withColumn(
        "run",
        F.sum("v").over(
            W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    rows = {r["k"]: r["run"] for r in got.collect()}
    assert rows[25] == 20  # mid-null-chunk row sees the earlier sum
    assert sorted(got.select("k", "run").collect()) == sorted(
        ref.select("k", "run").collect()
    )


def test_chunked_lag_rejects_null_values(spark):
    import pytest as _pytest

    from s2_spark.operators.prefix import chunked_lag

    # the non-null contract is enforced: a null anywhere in the value
    # column raises at execution instead of silently skipping the null
    # at a chunk boundary (prefix.py chunked_lag docstring)
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") != 37, F.col("id")).cast("long").alias("v"),
    )
    with _pytest.raises(Exception, match="non-null"):
        chunked_lag(df, ["k"], "v", "pv", chunk_width=25).collect()


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_chunked_running_multi_randomized_vs_global(spark, seed):
    """Seeded randomized differential: fused sum+max chunked prefixes
    over gappy order keys, ~30% nulls in both value columns, random
    chunk width, and two interleaved partition keys must equal the
    global per-key window exactly — the whole input space of the
    round-6 null-combine fix, not just the directed cases."""
    import random

    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_running_multi

    rng = random.Random(seed)
    rows, k = [], 0
    for _ in range(rng.randint(80, 300)):
        k += rng.randint(1, 9)
        v = None if rng.random() < 0.3 else rng.randint(-50, 50)
        m = None if rng.random() < 0.3 else rng.randint(-50, 50)
        rows.append((rng.choice(["a", "b"]), k, v, m))
    width = rng.choice([7, 32, 101])
    df = spark.createDataFrame(rows, "g string, k long, v long, m long")
    got = chunked_running_multi(
        df,
        ["k"],
        [("v", "rs", "sum"), ("m", "rm", "max")],
        chunk_width=width,
        partition_by=["g"],
    )
    w = (
        W.partitionBy("g")
        .orderBy("k")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ref = df.withColumn("rs", F.sum("v").over(w)).withColumn(
        "rm", F.max("m").over(w)
    )
    assert sorted(got.select("g", "k", "rs", "rm").collect()) == sorted(
        ref.select("g", "k", "rs", "rm").collect()
    )


def test_chunked_running_keeps_null_partition_and_order_keys(spark):
    """NULL partition keys and NULL order keys are legitimate groups/
    positions to a plain window (nulls sort first; NULL is one group);
    the chunked form must keep those rows and fold them identically —
    the equi-joins are null-safe and NULL order keys map to the
    earliest chunk."""
    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_running

    rows = (
        [(None, i, 1) for i in range(5)]  # NULL partition key group
        + [("g", None, 10)]  # NULL order key: sorts first in its group
        + [("g", k, 1) for k in range(100)]
    )
    df = spark.createDataFrame(rows, "g string, k long, v long")
    got = chunked_running(
        df, ["k"], "v", "run", kind="sum", chunk_width=16, partition_by=["g"]
    )
    w = (
        W.partitionBy("g")
        .orderBy("k")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ref = df.withColumn("run", F.sum("v").over(w))
    key = lambda r: (r["g"] or "", r["k"] if r["k"] is not None else -1)  # noqa: E731
    assert got.count() == len(rows)  # nothing dropped
    assert sorted(got.collect(), key=key) == sorted(ref.collect(), key=key)


def test_chunked_running_rejects_bad_kind(spark):
    import pytest as _pytest

    from s2_spark.operators.prefix import chunked_running

    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with _pytest.raises(ValueError):
        chunked_running(df, ["k"], "v", "o", kind="avg")


def test_chunked_row_number_matches_global(spark):
    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_row_number

    df = spark.range(400).select(
        (F.col("id") * 3 + 17).alias("k"), (F.col("id") % 7).alias("grp")
    )
    got = chunked_row_number(df, ["k"], "rn", chunk_width=50)
    ref = df.withColumn("rn", F.row_number().over(W.orderBy("k")).cast("long"))
    assert sorted(got.select("k", "rn").collect()) == sorted(
        ref.select("k", "rn").collect()
    )


def test_chunked_lag_matches_global(spark):
    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_lag

    # sparse keys => some chunks are empty; the boundary fill must reach
    # back to the nearest NON-empty earlier chunk
    df = spark.range(200).select(
        (F.col("id") * F.col("id")).alias("k"), (F.col("id") * 2).alias("v")
    )
    got = chunked_lag(df, ["k"], "v", "pv", chunk_width=100)
    ref = df.withColumn("pv", F.lag("v").over(W.orderBy("k")))
    assert sorted(got.select("k", "pv").collect()) == sorted(
        ref.select("k", "pv").collect()
    )


def test_chunked_running_partitioned_restarts_per_key(spark):
    from pyspark.sql import Window as W

    from s2_spark.operators.prefix import chunked_running

    # two keys interleaved on the same order domain: the fold must
    # restart per key, and one key's totals must never leak into the
    # other's offsets even across chunk boundaries
    df = spark.range(600).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("s"),
        F.lit(1).cast("long").alias("v"),
    )
    got = chunked_running(
        df, ["k"], "v", "run", kind="sum", chunk_width=64, partition_by=["s"]
    )
    ref = df.withColumn(
        "run",
        F.sum("v").over(
            W.partitionBy("s")
            .orderBy("k")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    assert sorted(got.select("s", "k", "run").collect()) == sorted(
        ref.select("s", "k", "run").collect()
    )


def test_chunked_running_multi_matches_single_calls(spark):
    import random

    from s2_spark.operators.prefix import chunked_running, chunked_running_multi

    rng = random.Random(7)
    rows = [
        (k, rng.choice(["s1", "s2"]), rng.randint(-50, 50),
         rng.choice([None, rng.randint(0, 99)]))
        for k in range(500)
    ]
    df = spark.createDataFrame(rows, ["k", "g", "v", "m"])
    multi = chunked_running_multi(
        df, ["k"], [("v", "rsum", "sum"), ("m", "rmax", "max")],
        chunk_width=64, partition_by=["g"],
    )
    single = chunked_running(
        chunked_running(df, ["k"], "v", "rsum", kind="sum",
                        chunk_width=64, partition_by=["g"]),
        ["k"], "m", "rmax", kind="max", chunk_width=64, partition_by=["g"],
    )
    key = lambda r: (r["g"], r["k"])  # noqa: E731
    got = sorted(multi.collect(), key=key)
    want = sorted(single.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
