"""Aggregations (SURVEY.md §2.B Q-AG*), including the metrics-API family
(A26, ``api/src/v1/metrics.rs`` — declared but NotImplemented in the
reference; implemented for real here as window aggregations).

Scale notes: all groupBys get automatic partial (map-side) aggregation
from Catalyst; grouping keys are low-cardinality so the final shuffle
is tiny. ROLLUP/CUBE expand grouping sets before the shuffle — still a
single pass over the fact table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.suite._util import epoch_ms, r4
from s2_spark.tables import load_views, t


@query(
    "ag1_hash_agg_multi",
    oracle=(
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),4) AS sum_qty, "
        "round(avg(l_extendedprice),4) AS avg_price, count(*) AS n "
        "FROM lineitem GROUP BY 1,2 ORDER BY 1,2"
    ),
    doc="TPC-H Q1 core: hash agg, multiple functions",
)
def ag1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "ag2_distinct_agg",
    oracle=(
        "SELECT event_type, count(DISTINCT user_id) AS u FROM events "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="count distinct per group (expand + two-phase agg)",
)
def ag2(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .orderBy("event_type")
    )


@query(
    "ag3_approx_distinct",
    oracle="SELECT count(DISTINCT user_id) AS exact_u FROM events",
    doc=(
        "exact distinct for the oracle; the engine-side approx variant "
        "(approx_count_distinct, rel-err < 5%) is asserted in tests"
    ),
)
def ag3(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.agg(F.countDistinct("user_id").alias("exact_u"))


@query(
    "ag5_rollup",
    oracle=(
        "SELECT coalesce(r_name,'ALL') AS region, coalesce(n_name,'ALL') AS nation, "
        "count(*) AS c FROM nation n JOIN region r ON n.n_regionkey=r.r_regionkey "
        "GROUP BY ROLLUP (r_name, n_name) ORDER BY 1,2"
    ),
    doc="ROLLUP grouping sets",
)
def ag5(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("c"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "c",
        )
        .orderBy("region", "nation")
    )


@query(
    "ag6_cube",
    oracle=(
        "SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls, "
        "count(*) AS c FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) "
        "ORDER BY 1,2"
    ),
    doc="CUBE grouping sets",
)
def ag6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("c"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "c",
        )
        .orderBy("rf", "ls")
    )


@query(
    "ag7_grouping_sets",
    oracle=(
        "SELECT coalesce(event_type,'ALL') AS et, "
        "coalesce(CAST(user_id AS VARCHAR),'ALL') AS uid, count(*) AS c "
        "FROM events GROUP BY GROUPING SETS ((event_type),(user_id)) ORDER BY 1,2"
    ),
    doc="GROUPING SETS via SQL",
)
def ag7(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(
        "SELECT coalesce(event_type,'ALL') AS et, "
        "coalesce(CAST(user_id AS STRING),'ALL') AS uid, count(*) AS c "
        "FROM events GROUP BY GROUPING SETS ((event_type),(user_id)) ORDER BY 1,2"
    )


@query(
    "ag8_having",
    oracle=(
        "SELECT user_id, count(*) AS n FROM events GROUP BY 1 "
        "HAVING count(*) > 20 ORDER BY 1"
    ),
    doc="HAVING → post-agg filter",
)
def ag8(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 20)
        .orderBy("user_id")
    )


@query(
    "ag9_metrics_rollup",
    oracle=(
        "SELECT epoch_ms(date_trunc('hour', ts)) AS h, event_type, "
        "count(*) AS ops, round(sum(value),4) AS vol "
        "FROM events GROUP BY 1,2 ORDER BY 1,2"
    ),
    doc=(
        "metrics-API ops-per-interval (A26: api/src/v1/metrics.rs:38-130; "
        "lite stubs it NotImplemented — implemented for real here)"
    ),
)
def ag9(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            epoch_ms(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias("h"),
            "event_type",
        )
        .agg(F.count("*").alias("ops"), r4(F.sum("value")).alias("vol"))
        .orderBy("h", "event_type")
    )


@query(
    "ag11_metrics_minute_ops",
    oracle=(
        "SELECT epoch_ms(date_trunc('minute', ts)) AS bucket, count(*) AS ops "
        "FROM events WHERE ts < TIMESTAMP '2024-01-02' GROUP BY 1 ORDER BY 1"
    ),
    doc="metrics API (A26) minute-interval scalar set via operators.metrics.append_ops",
)
def ag11(spark, sf_dir):
    from s2_spark.operators.metrics import append_ops

    e = t(spark, sf_dir, "events")
    records = e.filter(
        F.col("ts").cast("timestamp") < F.lit("2024-01-02").cast("timestamp")
    ).select(
        F.lit("b").alias("basin"),
        F.lit("s").alias("stream"),
        F.col("event_id").alias("seq_num"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
        F.col("props").cast("binary").alias("body"),
    )
    return append_ops(records, "minute").select("bucket", "ops")


@query(
    "ag12_metrics_day_throughput",
    oracle=(
        "SELECT epoch_ms(date_trunc('day', ts)) AS bucket, "
        "CAST(sum(8 + length(props)) AS BIGINT) AS bytes "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc="metrics API (A26) day-interval throughput (metered bytes) via append_throughput",
)
def ag12(spark, sf_dir):
    from s2_spark.operators.metrics import append_throughput

    e = t(spark, sf_dir, "events")
    records = e.select(
        F.lit("b").alias("basin"),
        F.lit("s").alias("stream"),
        F.col("event_id").alias("seq_num"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
        F.col("props").cast("binary").alias("body"),
    )
    return append_throughput(records, "day").select("bucket", "bytes")


@query(
    "ag13_metrics_storage_gauge",
    oracle=(
        "SELECT bucket, CAST(sum(delta) OVER (ORDER BY bucket ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS level FROM ("
        "SELECT epoch_ms(date_trunc('day', ts)) AS bucket, "
        "sum(8 + length(props)) AS delta FROM events GROUP BY 1) ORDER BY bucket"
    ),
    doc="metrics API (A26) gauge set: cumulative storage level per day bucket",
)
def ag13(spark, sf_dir):
    from s2_spark.operators.metrics import storage_gauge

    e = t(spark, sf_dir, "events")
    records = e.select(
        F.lit("b").alias("basin"),
        F.lit("s").alias("stream"),
        F.col("event_id").alias("seq_num"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
        F.col("props").cast("binary").alias("body"),
    )
    return storage_gauge(records, "day").select("bucket", "level")


def _synthetic_audit(spark, sf_dir):
    """Deterministic ops-audit frame derived from the events table so
    the read-side metric sets (operators/metrics.py read_ops /
    read_throughput / basin_ops over the OpsAudit relation) are
    DuckDB-provable: event_type maps onto op kinds, props length onto
    served bytes."""
    e = t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "click", F.lit("read"))
        .when(F.col("event_type") == "view", F.lit("read_session"))
        .when(F.col("event_type") == "purchase", F.lit("read_batch"))
        .when(F.col("event_type") == "signup", F.lit("create_stream"))
        .otherwise(F.lit("list_streams"))
    )
    return e.select(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        op.alias("op"),
        F.concat(F.lit("b"), (F.col("user_id") % 7).cast("string")).alias("basin"),
        F.lit("s").alias("stream"),
        F.lit(1).cast("long").alias("records"),
        (F.lit(8) + F.length("props")).cast("long").alias("bytes"),
    )


@query(
    "ag15_read_ops",
    oracle=(
        "SELECT epoch_ms(date_trunc('hour', ts)) AS bucket, count(*) AS ops "
        "FROM events WHERE event_type IN ('click','view') GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "metrics API (A26) ReadOps set (api/src/v1/metrics.rs:110-130): "
        "read RPCs per hour over the ops-audit meta-stream"
    ),
)
def ag15(spark, sf_dir):
    from s2_spark.operators.metrics import read_ops

    return read_ops(_synthetic_audit(spark, sf_dir), "hour").select("bucket", "ops")


@query(
    "ag16_read_throughput",
    oracle=(
        "SELECT epoch_ms(date_trunc('hour', ts)) AS bucket, "
        "CAST(sum(8 + length(props)) AS BIGINT) AS bytes "
        "FROM events WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "metrics API (A26) ReadThroughput set: served bytes per hour from "
        "the session loop's per-delivered-batch accounting"
    ),
)
def ag16(spark, sf_dir):
    from s2_spark.operators.metrics import read_throughput

    return read_throughput(_synthetic_audit(spark, sf_dir), "hour").select(
        "bucket", "bytes"
    )


@query(
    "ag17_basin_ops",
    oracle=(
        "SELECT epoch_ms(date_trunc('day', ts)) AS bucket, count(*) AS ops "
        "FROM events WHERE event_type IN ('signup','error') "
        "AND (user_id % 7) = 3 GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "metrics API (A26) BasinOps set: control-plane RPCs per day for "
        "one basin, from the catalog's audit hook"
    ),
)
def ag17(spark, sf_dir):
    from s2_spark.operators.metrics import basin_ops

    return basin_ops(_synthetic_audit(spark, sf_dir), "day", basin="b3").select(
        "bucket", "ops"
    )


@query(
    "ag18_active_basins",
    oracle=(
        "SELECT epoch_ms(date_trunc('day', ts)) AS bucket, "
        "count(DISTINCT user_id % 7) AS active "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "metrics API (A26) AccountMetricSet::ActiveBasins "
        "(api/src/v1/metrics.rs:70-76): distinct active basins per day"
    ),
)
def ag18(spark, sf_dir):
    from s2_spark.operators.metrics import active_basins

    e = t(spark, sf_dir, "events")
    records = e.select(
        F.concat(F.lit("b"), (F.col("user_id") % 7).cast("string")).alias("basin"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
    )
    return active_basins(records, "day").select("bucket", "active")


@query(
    "ag10_metrics_gauge",
    oracle=(
        "SELECT event_id, round(sum(value) OVER "
        "(ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS level "
        "FROM events WHERE user_id = 1 ORDER BY event_id"
    ),
    doc="metrics gauge: running level (A26 storage metric shape)",
)
def ag10(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_running

    e = t(spark, sf_dir, "events").filter(F.col("user_id") == 1)
    # running level via the chunked two-phase prefix (no global window)
    d = chunked_running(
        e.select("event_id", "value"),
        ["event_id"], "value", "lvl", kind="sum", chunk_width=8192,
    )
    return d.select("event_id", r4(F.col("lvl")).alias("level")).orderBy("event_id")


@query(
    "ag19_account_ops",
    oracle=(
        "SELECT epoch_ms(date_trunc('hour', ts)) AS bucket, "
        "CASE event_type WHEN 'click' THEN 'read' WHEN 'view' THEN 'read_session' "
        "WHEN 'purchase' THEN 'read_batch' WHEN 'signup' THEN 'create_stream' "
        "ELSE 'list_streams' END AS op, "
        "CAST(count(*) AS BIGINT) AS ops "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    doc=(
        "metrics API (A26) AccountMetricSet::AccountOps "
        "(api/src/v1/metrics.rs:69-78): account-scope RPC counts per "
        "hour labeled by operation, over the ops-audit relation — "
        "completes the reference's metric-set matrix (account/basin/"
        "stream x scalar/accumulation/gauge/label)"
    ),
)
def ag19(spark, sf_dir):
    from s2_spark.operators.metrics import account_ops

    return account_ops(_synthetic_audit(spark, sf_dir), "hour").select(
        "bucket", "op", "ops"
    )


def _synthetic_records(spark, sf_dir):
    """Deterministic multi-basin/multi-stream records frame from the
    events table — input for the label/active metric sets (ag20/ag21),
    DuckDB-provable like _synthetic_audit."""
    e = t(spark, sf_dir, "events")
    return e.select(
        F.concat(F.lit("b"), (F.col("user_id") % 7).cast("string")).alias("basin"),
        F.concat(F.lit("s"), (F.col("user_id") % 3).cast("string")).alias("stream"),
        F.col("event_id").alias("seq_num"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
        F.col("props").cast("binary").alias("body"),
    )


@query(
    "ag20_ops_by_label",
    oracle=(
        "SELECT epoch_ms(date_trunc('hour', ts)) AS bucket, "
        "'s' || CAST(user_id % 3 AS VARCHAR) AS stream, "
        "CAST(count(*) AS BIGINT) AS ops "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    doc=(
        "metrics API (A26) Label set (api/src/v1/metrics.rs:164-167): "
        "per-stream ops breakdown per hour bucket — the labeled "
        "timeseries shape, one scan + map-side-combined (bucket, "
        "stream) aggregation"
    ),
)
def ag20(spark, sf_dir):
    from s2_spark.operators.metrics import ops_by_label

    return ops_by_label(_synthetic_records(spark, sf_dir), "hour").select(
        "bucket", "stream", "ops"
    )


@query(
    "ag21_active_streams",
    oracle=(
        "SELECT epoch_ms(date_trunc('day', ts)) AS bucket, "
        "CAST(count(DISTINCT ('b' || CAST(user_id % 7 AS VARCHAR)) || chr(0) "
        "|| ('s' || CAST(user_id % 3 AS VARCHAR))) AS BIGINT) AS active "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "metrics API (A26) account/basin-level scalar: distinct active "
        "(basin, stream) pairs per day bucket — the ActiveStreams "
        "companion of ag18's ActiveBasins"
    ),
)
def ag21(spark, sf_dir):
    from s2_spark.operators.metrics import active_streams

    return active_streams(_synthetic_records(spark, sf_dir), "day").select(
        "bucket", "active"
    )
