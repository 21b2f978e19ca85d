"""Set operations (SURVEY.md §2.B Q-SET*) — catch-up ∪ live union (A13)
and the `s2 apply`/`diff` reconciliation primitives (A30,
``cli/src/apply.rs``, ``cli/src/diff.rs``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.tables import t


@query(
    "set1_union_all",
    oracle=(
        "SELECT event_id FROM events WHERE event_id < 50 "
        "UNION ALL SELECT event_id FROM events WHERE event_id >= 50 AND event_id < 100 "
        "ORDER BY 1"
    ),
    doc="UNION ALL — catch-up scan ∪ live batches (A13, read.rs:183-240)",
)
def set1(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    lo = e.filter(F.col("event_id") < 50).select("event_id")
    hi = e.filter((F.col("event_id") >= 50) & (F.col("event_id") < 100)).select("event_id")
    return lo.unionByName(hi).orderBy("event_id")


@query(
    "set2_intersect",
    oracle=(
        "SELECT o_custkey FROM orders INTERSECT "
        "SELECT c_custkey FROM customer WHERE c_acctbal > 0 ORDER BY 1"
    ),
    doc="INTERSECT — `s2 diff` unchanged set (A30)",
)
def set2(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_custkey")
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return o.intersect(c).orderBy("o_custkey")


@query(
    "set3_except",
    oracle=(
        "SELECT c_custkey FROM customer EXCEPT "
        "SELECT o_custkey FROM orders WHERE o_totalprice > 300000 ORDER BY 1"
    ),
    doc="EXCEPT — `s2 apply` to-create set (A30)",
)
def set3(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o).orderBy("c_custkey")  # subtract = EXCEPT DISTINCT
