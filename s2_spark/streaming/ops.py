"""Streaming operator builders (Q-STR1-7) — each takes a streaming (or
batch) DataFrame of events/records and declares the windowed plan; the
same builder runs in both modes, which is how the batch-equivalence
contract is asserted (SURVEY.md §2.B streaming family).

These implement the metrics-API rollups (A26) for real: ops/throughput
per minute/hour/day are tumbling-window counts/sums over the record
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(df: DataFrame, ts_col: str = "ts", width: str = "1 hour") -> DataFrame:
    """Q-STR1 / metrics 'ops per interval' (A26)."""
    return (
        df.groupBy(F.window(ts_col, width).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_millis(F.col("win.start").cast("timestamp")).alias("w"), "n")
    )


def sliding_counts(
    df: DataFrame, ts_col: str = "ts", width: str = "60 minutes", slide: str = "30 minutes"
) -> DataFrame:
    """Q-STR2."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_millis(F.col("win.start").cast("timestamp")).alias("w_start_ms"), "n")
    )


def session_counts(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts", gap: str = "30 minutes"
) -> DataFrame:
    """Q-STR3 — per-key session windows."""
    return (
        df.groupBy(key, F.session_window(ts_col, gap).alias("win"))
        .agg(F.count("*").alias("n"), F.max(ts_col).alias("mx"), F.min(ts_col).alias("mn"))
        .select(
            key,
            F.unix_millis(F.col("mn").cast("timestamp")).alias("s_ms"),
            F.unix_millis(F.col("mx").cast("timestamp")).alias("e_ms"),
            "n",
        )
    )


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Q-STR4 — late-data bound; rows later than the watermark are
    dropped from stateful aggregations."""
    return df.withWatermark(ts_col, delay)


def dedup(df: DataFrame, keys: list[str], within_watermark: bool = False) -> DataFrame:
    """Q-STR5 — stateful dedup; the watermarked variant bounds state
    (the 100 TB path — unbounded dedup state is a leak)."""
    if within_watermark:
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def enrich(stream_df: DataFrame, dim_df: DataFrame, on, how: str = "inner") -> DataFrame:
    """Q-STR7 — stream-static join; the static dim is broadcast so each
    micro-batch joins without a shuffle."""
    return stream_df.join(F.broadcast(dim_df), on, how)


def interval_join(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    left_type: str = "view",
    right_type: str = "purchase",
    within: str = "30 minutes",
    delay: str = "60 minutes",
) -> DataFrame:
    """Q-STR8 — stream-stream inner join with an event-time interval
    bound (the attribution shape: each ``left_type`` event joined to
    the same key's ``right_type`` events in the following ``within``).

    Both sides carry watermarks and the join condition bounds the
    right event time relative to the left in BOTH directions — exactly
    what Structured Streaming requires to size and expire join state
    (state held ≤ watermark + interval per side, so a year-long stream
    never accumulates unbounded buffers). The same builder runs in
    batch mode, where withWatermark is a no-op and Catalyst plans a
    plain range-condition join — the equivalence contract.
    """
    left = (
        df.filter(F.col("event_type") == left_type)
        .select(
            F.col(key).alias("_lk"),
            F.col("event_id").alias("l_id"),
            F.col(ts_col).alias("l_ts"),
        )
        .withWatermark("l_ts", delay)
    )
    right = (
        df.filter(F.col("event_type") == right_type)
        .select(
            F.col(key).alias("_rk"),
            F.col("event_id").alias("r_id"),
            F.col(ts_col).alias("r_ts"),
        )
        .withWatermark("r_ts", delay)
    )
    return left.join(
        right,
        (F.col("_lk") == F.col("_rk"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        # output names follow the event types, so a non-default pairing
        # (e.g. click→signup) is labeled truthfully
        F.col("l_id").alias(f"{left_type}_id"),
        F.col("r_id").alias(f"{right_type}_id"),
    )
