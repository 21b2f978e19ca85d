"""Sorts / limits / top-k (SURVEY.md §2.B Q-SL*) — the `s2 tail -n`
family (A29, ``cli/src/cli.rs:652-700``).

Scale note: ORDER BY + LIMIT compiles to TakeOrderedAndProject — each
partition keeps only its local top-k, the driver merges k·P rows. No
global sort materializes.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.tables import t


@query(
    "sl1_tail_n",
    oracle=(
        "SELECT event_id, event_type FROM "
        "(SELECT event_id, event_type FROM events ORDER BY event_id DESC LIMIT 10) "
        "ORDER BY event_id"
    ),
    doc="tail -n: global sort + limit → TakeOrderedAndProject (A29)",
)
def sl1(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.select("event_id", "event_type")
        .orderBy(F.desc("event_id"))
        .limit(10)
        .orderBy("event_id")
    )


@query(
    "sl2_topk_per_group",
    oracle=(
        "SELECT user_id, event_id FROM (SELECT user_id, event_id, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn "
        "FROM events) WHERE rn <= 3 ORDER BY user_id, event_id"
    ),
    doc="top-k per group: window + filter (rank pushdown-able)",
)
def sl2(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id")
        .orderBy("user_id", "event_id")
    )


@query(
    "sl3_multi_col_sort",
    oracle=(
        "SELECT o_orderkey FROM orders "
        "ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    doc="multi-column sort + limit",
)
def sl3(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey")
        .limit(100)
    )
