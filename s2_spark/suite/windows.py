"""Window functions (SURVEY.md §2.B Q-W*) — the primitives behind S2's
sequencing and read-limit machinery:

- row_number  = seq_num assignment at append (A1, streamer.rs:964-1008)
- running max = monotone timestamp adjustment (A16, streamer.rs:996-1000)
- cumulative byte sum = metered-bytes read limit (A12, read_extent.rs)
- max_by      = latest fencing token per stream (A5)

Scale notes: the single-series oracle queries model ONE stream's log
(the reference's per-stream total order). The prefix-decomposable ones
(running max w4, cumulative sum w5) run through the chunked two-phase
prefix in ``s2_spark.operators.prefix`` — no global single-partition
window. w3 (lag) and w6 (ntile) keep the global ORDER BY: lag needs
only the one prior row and ntile needs the global count, and both are
oracle shapes, not engine paths. The engine-level operators in
``s2_spark.store`` partition every window by ``(basin, stream)`` so N
streams parallelize across executors.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.tables import t


@query(
    "w1_row_number",
    oracle=(
        "SELECT event_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM events ORDER BY event_id"
    ),
    doc="seq assignment shape (A1)",
)
def w1(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("event_id", F.row_number().over(w).cast("long").alias("rn"))
        .orderBy("event_id")
    )


@query(
    "w2_rank",
    oracle=(
        "SELECT o_custkey, o_orderkey, rank() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk "
        "FROM orders ORDER BY o_custkey, o_orderkey"
    ),
    doc="rank per group",
)
def w2(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", F.rank().over(w).cast("long").alias("rk"))
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "w3_lag_regress",
    oracle=(
        "SELECT event_id, CASE WHEN ts < lag(ts) OVER (ORDER BY event_id) "
        "THEN 1 ELSE 0 END AS regress FROM events ORDER BY event_id"
    ),
    doc="lag — monotone-timestamp regression check (A16)",
)
def w3(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_lag

    e = t(spark, sf_dir, "events")
    # lag via chunked decomposition: in-chunk lag + previous chunk's
    # last value at the boundary — no global single-partition window
    d = chunked_lag(
        e.select("event_id", "ts"), ["event_id"], "ts", "prev_ts",
        chunk_width=8192,
    )
    return (
        d.select(
            "event_id",
            F.when(F.col("ts") < F.col("prev_ts"), 1).otherwise(0).alias("regress"),
        )
        .orderBy("event_id")
    )


@query(
    "w4_running_max",
    oracle=(
        "SELECT event_id, greatest(CAST(value*1000 AS BIGINT), "
        "max(CAST(value*1000 AS BIGINT)) OVER "
        "(ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS adj "
        "FROM events WHERE user_id=2 ORDER BY event_id"
    ),
    doc="running max — timestamp monotonic adjust (A16, streamer.rs:996-1000)",
)
def w4(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_running

    e = t(spark, sf_dir, "events").filter(F.col("user_id") == 2)
    v = (F.col("value") * 1000).cast("long")
    # running max via the chunked two-phase prefix (no global window)
    d = chunked_running(
        e.select("event_id", v.alias("v")),
        ["event_id"], "v", "rm", kind="max", chunk_width=8192,
    )
    return (
        d.select("event_id", F.greatest(F.col("v"), F.col("rm")).alias("adj"))
        .orderBy("event_id")
    )


@query(
    "w5_cumulative_bytes",
    oracle=(
        "SELECT event_id, CAST(sum(length(props)) OVER "
        "(ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
        "FROM events WHERE user_id = 3 ORDER BY event_id"
    ),
    doc="cumulative metered-bytes — read bytes-limit cutoff (A12, read_extent.rs:18-137)",
)
def w5(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_running

    e = t(spark, sf_dir, "events").filter(F.col("user_id") == 3)
    # cumulative metered bytes via the chunked two-phase prefix — the
    # scale-safe form of the read bytes-limit cutoff (A12)
    d = chunked_running(
        e.select("event_id", F.length("props").cast("long").alias("b")),
        ["event_id"], "b", "cum", kind="sum", chunk_width=8192,
    )
    return d.select("event_id", "cum").orderBy("event_id")


@query(
    "w6_ntile",
    oracle=(
        "SELECT ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS q, c_custkey "
        "FROM customer ORDER BY c_custkey"
    ),
    doc="ntile quartiles",
)
def w6(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_row_number

    # ntile from the distributed global row number: with q = N div n and
    # r = N mod n, SQL ntile gives the first r buckets q+1 rows and the
    # rest q (front-loaded). No global window; N is a 1-row broadcast.
    c = t(spark, sf_dir, "customer")
    rn = chunked_row_number(
        c.select("c_custkey", "c_acctbal"),
        ["c_acctbal", "c_custkey"], "rn",
        chunk=F.floor(F.col("c_acctbal") / F.lit(500)).cast("long"),
    )
    n_buckets = F.lit(4)
    total = c.agg(F.count("*").alias("_n"))
    d = rn.crossJoin(F.broadcast(total))
    q, r = F.floor(F.col("_n") / n_buckets), F.col("_n") % n_buckets
    tile = F.when(
        F.col("rn") <= r * (q + 1),
        F.floor((F.col("rn") - 1) / (q + 1)) + 1,
    ).otherwise(r + F.floor((F.col("rn") - 1 - r * (q + 1)) / q) + 1)
    return (
        d.select(tile.cast("long").alias("q"), "c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "w7_max_by",
    oracle=(
        "SELECT user_id, max_by(event_type, event_id) AS last_et FROM events "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="latest value per group — latest fencing token shape (A5)",
)
def w7(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.max_by("event_type", "event_id").alias("last_et"))
        .orderBy("user_id")
    )
