"""Scans / sources (SURVEY.md §2.B Q-SC*).

These exercise the read path of the S2 API (read by seq_num /
timestamp: reference ``lite/src/backend/read.rs:94-317``) as parquet
scans with pushed-down predicates. ``events.event_id`` plays seq_num,
``events.ts`` plays the record timestamp.

Scale notes: every query here is a single scan with filter + projection
— Catalyst pushes both into the parquet reader (check ``PushedFilters``
/ ``ReadSchema`` in ``.explain``), so at 100 TB only matching row
groups and referenced columns are read. No shuffle except the final
contract ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.suite._util import epoch_ms
from s2_spark.tables import t


@query(
    "sc1_scan_project",
    oracle="SELECT event_id, event_type FROM events ORDER BY event_id",
    doc="full scan + projection (column pruning)",
)
def sc1(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "sc2_count_scan",
    oracle="SELECT count(*) AS n FROM lineitem",
    doc="count scan (metadata-only at best, no column read)",
)
def sc2(spark, sf_dir):
    return t(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@query(
    "sc3_range_scan_seq",
    oracle=(
        "SELECT event_id, user_id, value FROM events "
        "WHERE event_id >= 100 AND event_id < 200 ORDER BY event_id"
    ),
    doc="read-by-seq_num (A7: lite/src/backend/read.rs:94-244) — key-range pruning",
)
def sc3(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


@query(
    "sc4_range_scan_ts",
    oracle=(
        "SELECT event_id, epoch_ms(ts) AS ts_ms FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20' "
        "ORDER BY event_id"
    ),
    doc="read-by-timestamp + until (A8+A11: lite/src/backend/read.rs:287-317) — min/max pruning replaces the ts index",
)
def sc4(spark, sf_dir):
    from datetime import datetime, timezone

    from s2_spark.tables import t_raw

    e = t_raw(spark, sf_dir, "events")
    if dict(e.dtypes).get("ts") == "bigint":
        # raw i64-nanos column: constant bounds push down to the parquet
        # scan (row-group min/max pruning — the Spark analogue of the
        # reference's timestamp index, lite/src/backend/kv/mod.rs:88-91)
        ns = lambda s: int(  # noqa: E731
            datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp() * 1_000_000_000
        )
        e = e.filter((F.col("ts") >= ns("2024-01-10")) & (F.col("ts") < ns("2024-01-20")))
        ts_ms = F.expr("ts div 1000000")
    else:
        lo = F.lit("2024-01-10").cast("timestamp")
        hi = F.lit("2024-01-20").cast("timestamp")
        e = e.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        ts_ms = epoch_ms("ts")
    return e.select("event_id", ts_ms.alias("ts_ms")).orderBy("event_id")


@query(
    "pf1_conjunctive_predicates",
    oracle=(
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_quantity > 30 AND l_discount BETWEEN 0.05 AND 0.07 "
        "AND l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber"
    ),
    doc="conjunctive predicates, all pushed to parquet",
)
def pf1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 30)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_returnflag") == "R")
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "pf2_metered_size",
    oracle=(
        "SELECT event_id, 8 + length(props) + length(event_type) AS metered "
        "FROM events ORDER BY event_id"
    ),
    doc="derived column — metered-size shape (common/src/record/metering.rs:1-25)",
)
def pf2(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            (F.lit(8) + F.length("props") + F.length("event_type"))
            .cast("long")
            .alias("metered"),
        )
        .orderBy("event_id")
    )


@query(
    "pf3_in_case",
    oracle=(
        "SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS sz "
        "FROM orders WHERE o_orderstatus IN ('O','F') ORDER BY o_orderkey"
    ),
    doc="IN-list + CASE WHEN",
)
def pf3(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("sz"),
        )
        .orderBy("o_orderkey")
    )
