"""Timeseries metrics API (A26) — ``api/src/v1/metrics.rs:38-296``
declares account/basin/stream metric sets at minute/hour/day intervals;
``lite`` returns NotImplemented for all of them
(``lite/src/handlers/v1/metrics.rs:39,68,97``). This module implements
the declared surface for real over the records table.

Metric set shapes (api/src/v1/metrics.rs):
- **Scalar**    — one value per interval bucket (ops counts)
- **Accumulation** — cumulative running total (gauge-from-deltas)
- **Gauge**     — level at each bucket (storage bytes)
- **Label**     — per-label breakdown (ops by operation type)

Everything is ``groupBy(window(...))`` + window functions — one scan,
partial aggregation map-side, bucket count bounded by the time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2_spark.model import metered_size_col

INTERVALS = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}
INTERVAL_MS = {"minute": 60_000, "hour": 3_600_000, "day": 86_400_000}

# buckets per prefix-sum chunk in storage_gauge's distributed
# accumulation (phase 1 window size / phase 2 fan-in)
_CHUNK_BUCKETS = 1024


def _bucketed(records: DataFrame, interval: str) -> DataFrame:
    width = INTERVALS[interval]
    ts = F.timestamp_millis(F.col("timestamp"))
    return records.withColumn(
        "bucket", F.unix_millis(F.window(ts, width)["start"])
    )


def _scoped(records: DataFrame, basin: str | None, stream: str | None) -> DataFrame:
    if basin is not None:
        records = records.filter(F.col("basin") == basin)
    if stream is not None:
        records = records.filter(F.col("stream") == stream)
    return records


def append_ops(
    records: DataFrame,
    interval: str = "hour",
    basin: str | None = None,
    stream: str | None = None,
) -> DataFrame:
    """Scalar set: appended-record counts per bucket."""
    return (
        _bucketed(_scoped(records, basin, stream), interval)
        .groupBy("bucket")
        .agg(F.count("*").alias("ops"))
        .orderBy("bucket")
    )


def append_throughput(
    records: DataFrame,
    interval: str = "hour",
    basin: str | None = None,
    stream: str | None = None,
) -> DataFrame:
    """Scalar set: metered bytes appended per bucket."""
    return (
        _bucketed(_scoped(records, basin, stream), interval)
        .groupBy("bucket")
        .agg(F.sum(metered_size_col()).alias("bytes"))
        .orderBy("bucket")
    )


def storage_gauge(
    records: DataFrame,
    interval: str = "hour",
    basin: str | None = None,
    stream: str | None = None,
) -> DataFrame:
    """Gauge set: cumulative stored bytes level at each bucket
    (accumulation of per-bucket deltas).

    The running total is a two-phase distributed prefix sum, never a
    global unpartitioned window: phase 1 runs the prefix inside chunks
    of 1024 consecutive buckets (window partitioned by chunk), phase 2
    derives each chunk's starting offset from the chunk totals with a
    broadcast inequality join. A years-long minute-granularity range
    therefore spreads across tasks instead of serializing on one."""
    from s2_spark.operators.prefix import chunked_running

    per_bucket = (
        _bucketed(_scoped(records, basin, stream), interval)
        .groupBy("bucket")
        .agg(F.sum(metered_size_col()).alias("delta"))
    )
    chunk_ms = INTERVAL_MS[interval] * _CHUNK_BUCKETS
    return (
        chunked_running(
            per_bucket,
            ["bucket"], "delta", "level",
            kind="sum",
            chunk=F.floor(F.col("bucket") / F.lit(chunk_ms)).cast("long"),
        )
        .select("bucket", "level")
        .orderBy("bucket")
    )


def read_ops(
    audit: DataFrame,
    interval: str = "hour",
    basin: str | None = None,
    stream: str | None = None,
) -> DataFrame:
    """Scalar set over the ops-audit meta-stream: read RPCs per bucket
    (BasinMetricSet::ReadOps, api/src/v1/metrics.rs:110-130). Counts
    client-shaped read / read_session ops; session batch deliveries and
    internal polls are excluded by op type."""
    from s2_spark.operators.audit import READ_OPS

    return (
        _bucketed(
            _scoped(audit.filter(F.col("op").isin(*READ_OPS)), basin, stream),
            interval,
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("ops"))
        .orderBy("bucket")
    )


def read_throughput(
    audit: DataFrame,
    interval: str = "hour",
    basin: str | None = None,
    stream: str | None = None,
) -> DataFrame:
    """Scalar set: metered bytes served to readers per bucket
    (BasinMetricSet::ReadThroughput). Sums the per-delivered-batch
    byte accounting the session loop records — the point where served
    bytes are exactly known."""
    return (
        _bucketed(
            _scoped(audit.filter(F.col("op") == "read_batch"), basin, stream),
            interval,
        )
        .groupBy("bucket")
        .agg(F.sum("bytes").alias("bytes"))
        .orderBy("bucket")
    )


def basin_ops(
    audit: DataFrame,
    interval: str = "hour",
    basin: str | None = None,
) -> DataFrame:
    """Scalar set: control-plane basin RPCs per bucket
    (BasinMetricSet::BasinOps) — stream create/delete/reconfigure/list
    as recorded by the catalog's audit hook."""
    from s2_spark.operators.audit import BASIN_OPS

    return (
        _bucketed(
            _scoped(audit.filter(F.col("op").isin(*BASIN_OPS)), basin, None),
            interval,
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("ops"))
        .orderBy("bucket")
    )


def account_ops(
    audit: DataFrame,
    interval: str = "hour",
) -> DataFrame:
    """Account-level accumulation set: client-shaped RPCs per bucket,
    labeled by operation (AccountMetricSet::AccountOps,
    api/src/v1/metrics.rs:69-78) — the whole audit relation at account
    scope, no basin/stream filter."""
    return (
        _bucketed(audit, interval)
        .groupBy("bucket", "op")
        .agg(F.count("*").alias("ops"))
        .orderBy("bucket", "op")
    )


def active_basins(
    records: DataFrame, interval: str = "day"
) -> DataFrame:
    """Account-level set: basins with at least one record in the bucket
    (AccountMetricSet::ActiveBasins, api/src/v1/metrics.rs:70-76)."""
    return (
        _bucketed(records, interval)
        .groupBy("bucket")
        .agg(F.countDistinct("basin").alias("active"))
        .orderBy("bucket")
    )


def ops_by_label(
    records: DataFrame,
    interval: str = "hour",
    basin: str | None = None,
) -> DataFrame:
    """Label set: per-stream ops breakdown per bucket (the 'by
    operation/stream' labeled timeseries)."""
    return (
        _bucketed(_scoped(records, basin, None), interval)
        .groupBy("bucket", "stream")
        .agg(F.count("*").alias("ops"))
        .orderBy("bucket", "stream")
    )


def active_streams(
    records: DataFrame, interval: str = "day", basin: str | None = None
) -> DataFrame:
    """Account/basin-level scalar: distinct active streams per bucket."""
    return (
        _bucketed(_scoped(records, basin, None), interval)
        .groupBy("bucket")
        .agg(F.countDistinct("basin", "stream").alias("active"))
        .orderBy("bucket")
    )
