"""TPC-H-style analytical queries adapted to the fixture star schema —
the composite workloads a user of the engine's relational layer runs
(multi-join + filter + agg + top-k in one plan). Catalyst handles join
ordering/broadcast; these validate whole-plan correctness end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.suite._util import epoch_ms, r4
from s2_spark.tables import t

REV = lambda: F.col("l_extendedprice") * (1 - F.col("l_discount"))  # noqa: E731


@query(
    "tpch3_shipping_priority",
    oracle=(
        "SELECT l.l_orderkey, round(sum(l.l_extendedprice*(1-l.l_discount)),4) AS rev, "
        "epoch_ms(o.o_orderdate) AS odate_ms "
        "FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey=o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1996-01-01' "
        "AND l.l_shipdate > TIMESTAMP '1996-01-01' "
        "GROUP BY 1, 3 ORDER BY rev DESC, l_orderkey LIMIT 10"
    ),
    doc="TPC-H Q3 shape: segment filter, date window, revenue top-10",
)
def q3(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", epoch_ms("o_orderdate").alias("odate_ms"))
        .agg(r4(F.sum(REV())).alias("rev"))
        .select("l_orderkey", "rev", "odate_ms")
        .orderBy(F.desc("rev"), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch5_local_volume",
    oracle=(
        "SELECT n.n_name, round(sum(l.l_extendedprice*(1-l.l_discount)),4) AS rev "
        "FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey=o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey=s.s_suppkey AND c.c_nationkey=s.s_nationkey "
        "JOIN nation n ON s.s_nationkey=n.n_nationkey "
        "JOIN region r ON n.n_regionkey=r.r_regionkey "
        "WHERE r.r_name IN ('ASIA','EUROPE') GROUP BY 1 ORDER BY rev DESC, n_name"
    ),
    doc="TPC-H Q5 shape: 6-way join incl. same-nation residual, region filter",
)
def q5(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(r4(F.sum(REV())).alias("rev"))
        .orderBy(F.desc("rev"), "n_name")
    )


@query(
    "tpch6_revenue_delta",
    oracle=(
        "SELECT round(sum(l_extendedprice * l_discount),4) AS rev FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' "
        "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"
    ),
    doc="TPC-H Q6: pure scan-filter-agg, fully pushed down, no shuffle beyond final",
)
def q6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("rev"))
    )


@query(
    "tpch10_returned_items",
    oracle=(
        "SELECT c.c_custkey, c.c_name, round(sum(l.l_extendedprice*(1-l.l_discount)),4) AS rev, "
        "n.n_name FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey=o.o_orderkey "
        "JOIN nation n ON c.c_nationkey=n.n_nationkey "
        "WHERE l.l_returnflag = 'R' GROUP BY 1,2,4 ORDER BY rev DESC, c_custkey LIMIT 20"
    ),
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20",
)
def q10(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(r4(F.sum(REV())).alias("rev"))
        .select("c_custkey", "c_name", "rev", "n_name")
        .orderBy(F.desc("rev"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch4_order_priority",
    oracle=(
        "SELECT o_orderpriority, count(*) AS n FROM orders o WHERE EXISTS ("
        "SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate) GROUP BY 1 ORDER BY 1"
    ),
    doc="TPC-H Q4 shape: EXISTS-correlated priority counts (semi join)",
)
def q4(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select(F.col("l_orderkey").alias("ok")).distinct()
    return (
        o.join(late, o.o_orderkey == late.ok, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch12_shipmode_classes",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_n, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_n "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="TPC-H Q12 shape: conditional-sum priority classes per flag",
)
def q12(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_n"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch14_promo_ratio",
    oracle=(
        "SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' "
        "THEN l_extendedprice*(1-l_discount) ELSE 0 END) / "
        "sum(l_extendedprice*(1-l_discount)), 4) AS promo_pct "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
    ),
    doc="TPC-H Q14 shape: conditional-revenue ratio (promo share)",
)
def q14(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(r4(F.lit(100.0) * F.sum(promo) / F.sum(rev)).alias("promo_pct"))
    )


@query(
    "tpch18_large_orders",
    oracle=(
        "SELECT o.o_orderkey, round(sum(l.l_quantity),4) AS qty FROM orders o "
        "JOIN lineitem l ON l.l_orderkey=o.o_orderkey GROUP BY 1 "
        "HAVING sum(l.l_quantity) > 150 ORDER BY qty DESC, o_orderkey LIMIT 50"
    ),
    doc="TPC-H Q18 shape: large-volume orders via agg + HAVING",
)
def q18(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("o_orderkey", r4(F.col("_q")).alias("qty"))
        .orderBy(F.desc("qty"), "o_orderkey")
        .limit(50)
    )
