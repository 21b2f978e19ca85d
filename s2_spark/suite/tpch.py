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


@query(
    "tpch7_volume_shipping",
    oracle=(
        "SELECT supp_nation, cust_nation, CAST(l_year AS INTEGER) AS l_year, "
        "round(sum(volume),4) AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "year(l.l_shipdate) AS l_year, l.l_extendedprice*(1-l.l_discount) AS volume "
        "FROM supplier s JOIN lineitem l ON s.s_suppkey=l.l_suppkey "
        "JOIN orders o ON o.o_orderkey=l.l_orderkey "
        "JOIN customer c ON c.c_custkey=o.o_custkey "
        "JOIN nation n1 ON s.s_nationkey=n1.n_nationkey "
        "JOIN nation n2 ON c.c_nationkey=n2.n_nationkey "
        "WHERE (n1.n_name='NATION_1' AND n2.n_name='NATION_2') "
        "OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1')) "
        "GROUP BY 1,2,3 ORDER BY 1,2,3"
    ),
    doc="TPC-H Q7 shape: bidirectional two-nation trade volume by ship year",
)
def q7(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(r4(F.sum(REV())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch8_market_share",
    oracle=(
        "SELECT CAST(o_year AS INTEGER) AS o_year, "
        "round(CAST(sum(CASE WHEN nation='NATION_3' THEN volume ELSE 0 END) "
        "/ sum(volume) AS DOUBLE), 4) AS mkt_share FROM ("
        "SELECT year(o.o_orderdate) AS o_year, "
        "l.l_extendedprice*(1-l.l_discount) AS volume, n1.n_name AS nation "
        "FROM part p JOIN lineitem l ON p.p_partkey=l.l_partkey "
        "JOIN supplier s ON s.s_suppkey=l.l_suppkey "
        "JOIN orders o ON o.o_orderkey=l.l_orderkey "
        "JOIN customer c ON c.c_custkey=o.o_custkey "
        "JOIN nation n1 ON s.s_nationkey=n1.n_nationkey "
        "JOIN nation n2 ON c.c_nationkey=n2.n_nationkey "
        "JOIN region r ON n2.n_regionkey=r.r_regionkey "
        "WHERE r.r_name='ASIA' AND p.p_type='PROMO') "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "TPC-H Q8 shape: national market share within a region for a part "
        "type, by order year (conditional-sum ratio)"
    ),
)
def q8(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = REV()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            r4(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch13_customer_distribution",
    oracle=(
        "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
        "SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count "
        "FROM customer c LEFT JOIN orders o ON c.c_custkey=o.o_custkey "
        "GROUP BY 1) GROUP BY 1 ORDER BY custdist DESC, c_count DESC"
    ),
    doc="TPC-H Q13 shape: orders-per-customer histogram (left join double agg)",
)
def q13(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch15_top_supplier",
    oracle=(
        "WITH revenue0 AS (SELECT l_suppkey AS supplier_no, "
        "sum(l_extendedprice*(1-l_discount)) AS total_revenue FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
        "SELECT s.s_suppkey, s.s_name, round(r.total_revenue,4) AS total_revenue "
        "FROM supplier s JOIN revenue0 r ON s.s_suppkey=r.supplier_no "
        "WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0) "
        "ORDER BY s_suppkey"
    ),
    doc="TPC-H Q15 shape: top supplier by windowed revenue (CTE + scalar-max filter)",
)
def q15(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(REV()).alias("total_revenue")
    )
    mx = revenue0.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue0.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", r4(F.col("total_revenue")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "tpch17_small_quantity",
    oracle=(
        "SELECT round(CAST(sum(l.l_extendedprice) / 7.0 AS DOUBLE), 4) AS avg_yearly "
        "FROM lineitem l JOIN part p ON p.p_partkey=l.l_partkey "
        "WHERE p.p_brand='Brand#1' AND l.l_quantity < ("
        "SELECT 0.2*avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey=p.p_partkey)"
    ),
    doc=(
        "TPC-H Q17 shape: small-quantity revenue via correlated per-part "
        "average (decorrelated to a groupBy + join in Spark)"
    ),
)
def q17(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_bar")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_bar"))
        .agg(r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch19_discounted_revenue",
    oracle=(
        "SELECT round(sum(l.l_extendedprice*(1-l.l_discount)),4) AS revenue "
        "FROM lineitem l JOIN part p ON p.p_partkey=l.l_partkey "
        "WHERE (p.p_brand='Brand#1' AND p.p_size BETWEEN 1 AND 15 "
        "AND l.l_quantity BETWEEN 1 AND 11) "
        "OR (p.p_brand='Brand#2' AND p.p_size BETWEEN 1 AND 25 "
        "AND l.l_quantity BETWEEN 10 AND 20)"
    ),
    doc="TPC-H Q19 shape: OR-of-conjuncts join residual (brand/size/qty bands)",
)
def q19(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(c1 | c2)
        .agg(r4(F.sum(REV())).alias("revenue"))
    )


@query(
    "tpch22_global_sales_opportunity",
    oracle=(
        "SELECT CAST(c_nationkey AS INTEGER) AS cntry, CAST(count(*) AS BIGINT) AS numcust, "
        "round(sum(c_acctbal),4) AS totacctbal FROM customer "
        "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey "
        "AND o_orderdate >= TIMESTAMP '2000-01-01') "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "TPC-H Q22 shape: above-average-balance customers with no recent "
        "orders, by nation (scalar subquery + anti join; 'recent' window "
        "adapts Q22's no-orders predicate to a fixture where every "
        "customer has ordered at least once)"
    ),
)
def q22(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(F.count("*").alias("numcust"), r4(F.sum("c_acctbal")).alias("totacctbal"))
        .orderBy("cntry")
    )


@query(
    "tpch2_min_cost_supplier",
    oracle=(
        "WITH j AS (SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, s.s_acctbal "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size <= 10 "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY p_partkey "
        "ORDER BY s_acctbal, s_name) AS rn FROM j) "
        "SELECT p_partkey, p_name, s_name, round(s_acctbal, 4) AS acctbal "
        "FROM r WHERE rn = 1 ORDER BY acctbal DESC, p_partkey LIMIT 20"
    ),
    doc=(
        "TPC-H Q2 shape (no partsupp fixture: lineitem is the "
        "part-supplier bridge): per small part, the lowest-acctbal "
        "supplier that shipped it — the correlated-min subquery as a "
        "dedup + partitioned window, top-20"
    ),
)
def q2(spark, sf_dir):
    from pyspark.sql import Window as W

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = t(spark, sf_dir, "supplier")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .distinct()
    )
    rn = F.row_number().over(
        W.partitionBy("p_partkey").orderBy("s_acctbal", "s_name")
    )
    return (
        j.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_name", r4(F.col("s_acctbal")).alias("acctbal"))
        .orderBy(F.desc("acctbal"), "p_partkey")
        .limit(20)
    )


@query(
    "tpch9_product_profit",
    oracle=(
        "SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
        "round(sum(l.l_extendedprice*(1-l.l_discount) - 0.1*l.l_quantity*p.p_retailprice), 4) "
        "AS profit "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE p.p_name LIKE '%rod%' GROUP BY 1, 2 ORDER BY nation, o_year DESC"
    ),
    doc=(
        "TPC-H Q9 shape: product profit by supplier nation and order "
        "year over a 5-way join (supply cost synthesized as "
        "0.1*qty*retailprice — no partsupp fixture)"
    ),
)
def q9(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%rod%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    profit = REV() - 0.1 * F.col("l_quantity") * F.col("p_retailprice")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(r4(F.sum(profit)).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch11_important_stock",
    oracle=(
        "WITH v AS (SELECT l.l_partkey, sum(l.l_quantity * p.p_retailprice) AS val "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey WHERE s.s_nationkey < 5 "
        "GROUP BY 1) "
        "SELECT l_partkey, round(val, 4) AS val FROM v "
        "WHERE val > (SELECT 2.0 * avg(val) FROM v) ORDER BY val DESC, l_partkey"
    ),
    doc=(
        "TPC-H Q11 shape: per-part inventory value for one nation "
        "group, kept only above twice the average part value (scale-invariant threshold) — the "
        "correlated scalar subquery as a broadcast 1-row cross join"
    ),
)
def q11(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    v = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity") * F.col("p_retailprice")).alias("val"))
    )
    total = v.agg((2.0 * F.avg("val")).alias("thresh"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("thresh"))
        .select("l_partkey", r4(F.col("val")).alias("val"))
        .orderBy(F.desc("val"), "l_partkey")
    )


@query(
    "tpch16_supplier_cnt",
    oracle=(
        "SELECT p.p_brand, p.p_type, p.p_size, "
        "CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE p.p_size IN (1, 4, 9, 16, 25, 36, 49) "
        "AND l.l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000) "
        "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    ),
    doc=(
        "TPC-H Q16 shape: distinct-supplier count per (brand, type, "
        "size) with a NOT-IN exclusion set (low-balance suppliers "
        "standing in for the complaints filter) — the anti-join path"
    ),
)
def q16(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("x_suppkey"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(excluded),
            li.l_suppkey == F.col("x_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch20_potential_promo",
    oracle=(
        "SELECT s.s_name FROM supplier s WHERE s.s_suppkey IN ("
        "SELECT l.l_suppkey FROM lineitem l "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE p.p_name LIKE 'blue%' AND year(l.l_shipdate) = 1996 "
        "GROUP BY 1 HAVING sum(l.l_quantity) > 50) ORDER BY s_name"
    ),
    doc=(
        "TPC-H Q20 shape: suppliers who moved enough of a named part "
        "family in one year — nested IN subqueries as a HAVING-filtered "
        "aggregate semi-joined back to supplier"
    ),
)
def q20(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1996)
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    s = t(spark, sf_dir, "supplier")
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


@query(
    "tpch21_waiting_orders",
    oracle=(
        "WITH sl AS (SELECT l.l_orderkey, l.l_suppkey, "
        "max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY "
        "THEN 1 ELSE 0 END) AS late "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderstatus = 'F' GROUP BY 1, 2), "
        "os AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp, "
        "CAST(sum(late) AS BIGINT) AS n_late FROM sl GROUP BY 1) "
        "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
        "FROM sl JOIN os USING (l_orderkey) "
        "JOIN supplier s ON sl.l_suppkey = s.s_suppkey "
        "WHERE sl.late = 1 AND os.n_supp > 1 AND os.n_late = 1 "
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20"
    ),
    doc=(
        "TPC-H Q21 shape: suppliers who were the SOLE late supplier on "
        "a multi-supplier finished order (lateness = shipped >90 days "
        "after order date; fixture has no commit/receipt dates). The "
        "exists/not-exists pair becomes two bounded per-order "
        "aggregations — the scale-correct plan"
    ),
)
def q21(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    late = F.max(
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        ).cast("int")
    )
    sl = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late.alias("late"))
    )
    os_ = sl.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_supp"),
        F.sum("late").cast("long").alias("n_late"),
    )
    return (
        sl.join(os_, "l_orderkey")
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), sl.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
