"""Mergeability proofs for the sketch operators.

The 100-TB claims in x57 (HLL), x58 (count-min), and x61 (KMV) rest on
the sketches being MERGEABLE: per-partition sketch states combined with
the sketch's merge operator must equal the sketch of the whole corpus
— that is what lets 1000 executors each sketch their shard and ship 64
registers / 1024 counters / k values instead of distinct sets. These
tests prove the merge law on the fixture corpus by splitting it in
half, sketching each half, merging in plain Python (max / + / bottom-k)
and comparing against the one-shot sketch — exact integer equality,
no tolerance.
"""

from __future__ import annotations

import hashlib

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def texts(spark):
    from s2_spark.tables import t

    rows = t(spark, SF, "documents").select("doc_id", "text").collect()
    return [(r.doc_id, r.text) for r in rows]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _hll_registers(texts) -> dict[int, int]:
    """Pure-Python replay of x57's register construction: 6-bit bucket
    from the first two hex nibbles, rho = leading-zeros rank of the
    next 48 bits."""
    regs: dict[int, int] = {}
    for s in texts:
        mh = _md5(s)
        b = (int(mh[0], 16) * 16 + int(mh[1], 16)) % 64
        w = int(mh[2:14], 16)
        rho = next((r for r in range(1, 49) if w >= 1 << (48 - r)), 49)
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_register_merge_is_max(texts):
    bodies = [txt for _, txt in texts]
    half = len(bodies) // 2
    a, b = _hll_registers(bodies[:half]), _hll_registers(bodies[half:])
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == _hll_registers(bodies)


def test_kmv_merge_is_bottom_k_of_union(texts):
    k = 32
    bodies = [txt for _, txt in texts]

    def kmv(ts):
        hs = sorted({int(_md5(s)[:8], 16) for s in ts})
        return hs[:k]

    half = len(bodies) // 2
    a, b = kmv(bodies[:half]), kmv(bodies[half:])
    merged = sorted(set(a) | set(b))[:k]
    assert merged == kmv(bodies)
    # and the merged kth value drives the same estimator the query
    # registers (x61): sources below k answer exactly
    whole = kmv(bodies)
    if len(whole) == k:
        assert merged[-1] == whole[-1]


def test_cms_counter_merge_is_addition(texts):
    depth, width = 4, 256
    bodies = [txt for _, txt in texts]

    def cms(ts):
        cnt: dict[tuple[int, int], int] = {}
        for s in ts:
            for tok in [x for x in s.lower().split(" ") if x]:
                mh = _md5(tok)
                for j in range(depth):
                    b = int(mh[2 * j], 16) * 16 + int(mh[2 * j + 1], 16)
                    cnt[(j, b % width)] = cnt.get((j, b % width), 0) + 1
        return cnt

    half = len(bodies) // 2
    a, b = cms(bodies[:half]), cms(bodies[half:])
    merged = dict(a)
    for kk, v in b.items():
        merged[kk] = merged.get(kk, 0) + v
    assert merged == cms(bodies)


def test_kmv_below_k_sources_answer_exactly(spark, tmp_path):
    """x61's estimator branch for sources holding FEWER than k distinct
    hashes must answer exactly (the fixture corpora never exercise it —
    every source exceeds k=32 distinct texts), and the oracle must
    agree on the same synthetic corpus."""
    import pandas as pd

    from s2_spark.registry import all_queries
    from tests.oracle import compare, duck_connect

    rows = [("tiny", f"t {i % 5}") for i in range(20)] + [
        ("big", f"b {i}") for i in range(200)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": [r[0] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    q = all_queries()["x61_kmv_distinct_sketch"]
    con = duck_connect(str(tmp_path))
    compare(q.spark(spark, str(tmp_path)), con, q.oracle)
    got = {r["source"]: r for r in q.spark(spark, str(tmp_path)).collect()}
    assert got["tiny"]["exact_distinct"] == 5
    assert got["tiny"]["kmv_estimate"] == 5.0  # exact, not estimated
    assert got["tiny"]["rel_err"] == 0.0
    # the big source ran the (k-1)*2^32/kth division branch: its kth
    # value is a real 32-bit hash, and the estimate is never the
    # integer-exact path (200 distinct > k=32)
    assert got["big"]["exact_distinct"] == 200
    assert 0 < got["big"]["kth"] < 1 << 32
    assert got["big"]["kmv_estimate"] > 0.0


def test_spark_partitioned_hll_matches_single_shot(spark):
    """The merge law exercised THROUGH Spark: the x57 register
    aggregation computed over a 16-partition shuffle-scrambled copy of
    the corpus equals the registers from the .coalesce(1) single-task
    run — groupBy max is the HLL merge, so partitioning cannot change
    the sketch."""
    from pyspark.sql import functions as F

    from s2_spark.tables import t

    d = t(spark, SF, "documents").select("source", "text")

    def regs(df):
        h = df.select("source", F.md5("text").alias("mh"))
        hexes = "0123456789abcdef"
        nib1 = F.expr(f"locate(substr(mh, 1, 1), '{hexes}') - 1")
        nib2 = F.expr(f"locate(substr(mh, 2, 1), '{hexes}') - 1")
        b = (nib1 * 16 + nib2) % 64
        w = F.conv(F.substring("mh", 3, 12), 16, 10).cast("long")
        expr = None
        for r in range(1, 49):
            cond = F.col("w") >= F.lit(1 << (48 - r))
            expr = F.when(cond, r) if expr is None else expr.when(cond, r)
        rho = expr.otherwise(F.lit(49))
        out = (
            df.select("source", F.md5("text").alias("mh"))
            .select("source", b.alias("b"), w.alias("w"))
            .groupBy("source", "b")
            .agg(F.max(rho).alias("rho"))
            .collect()
        )
        return sorted((r.source, r.b, r.rho) for r in out)

    scrambled = d.repartition(16, F.md5(F.col("text")))
    assert regs(scrambled) == regs(d.coalesce(1))
