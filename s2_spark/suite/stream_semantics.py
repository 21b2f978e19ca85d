"""Direct S2 operator contracts over `events` (SURVEY.md §2.B Q-ST*).

`events.event_id` ≈ seq_num, `events.ts` ≈ record timestamp; each query
is the relational core of one API operator from §2.A.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.suite._util import epoch_ms
from s2_spark.tables import t


@query(
    "st1_check_tail",
    oracle=(
        "SELECT coalesce(max(event_id)+1, 0) AS next_seq, "
        "coalesce(epoch_ms(max(ts)), 0) AS last_ts_ms FROM events"
    ),
    doc="check_tail (A15: lite/src/backend/read.rs:31-43) — next seq + last ts",
)
def st1(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.agg(
        F.coalesce(F.max("event_id") + 1, F.lit(0)).alias("next_seq"),
        F.coalesce(epoch_ms(F.max(F.col("ts").cast("timestamp"))), F.lit(0)).alias(
            "last_ts_ms"
        ),
    )


@query(
    "st2_list_paginated",
    oracle=(
        "SELECT c_name FROM customer WHERE c_name LIKE 'Customer#00000%' "
        "AND c_name > 'Customer#000000050' ORDER BY c_name LIMIT 20"
    ),
    doc="list w/ prefix + start_after + limit (A21: lite/src/backend/streams.rs:35-77)",
)
def st2(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_name").startswith("Customer#00000")
            & (F.col("c_name") > "Customer#000000050")
        )
        .select("c_name")
        .orderBy("c_name")
        .limit(20)
    )


@query(
    "st3_tail_offset",
    oracle=(
        "SELECT event_id FROM events WHERE event_id >= "
        "(SELECT max(event_id)+1 FROM events) - 25 ORDER BY event_id"
    ),
    doc="tail_offset read start (A9: lite/src/backend/read.rs:256-258)",
)
def st3(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    # Scalar 'tail' via a cross-joined 1-row aggregate — broadcast, no
    # driver round-trip, stays one Spark job at any scale.
    tail = e.agg((F.max("event_id") + 1).alias("tail"))
    return (
        e.crossJoin(F.broadcast(tail))
        .filter(F.col("event_id") >= F.col("tail") - 25)
        .select("event_id")
        .orderBy("event_id")
    )


@query(
    "st4_clamp",
    oracle=(
        "SELECT least(CAST(10000000 AS BIGINT), (SELECT max(event_id)+1 FROM events)) "
        "AS start_pos"
    ),
    doc="clamp start to tail (A10: lite/src/backend/read.rs:260-269)",
)
def st4(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.agg(
        F.least(F.lit(10_000_000).cast("long"), F.max("event_id") + 1).alias("start_pos")
    )


@query(
    "st5_trim_visibility",
    oracle=(
        "SELECT count(*) AS visible, min(event_id) AS first_seq "
        "FROM events WHERE event_id >= 100"
    ),
    doc="trim visibility filter (A6: records below trim point hidden, streamer.rs:377-389)",
)
def st5(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.filter(F.col("event_id") >= 100).agg(
        F.count("*").alias("visible"), F.min("event_id").alias("first_seq")
    )


@query(
    "st6_retention_cutoff",
    oracle=(
        "SELECT count(*) AS retained FROM events "
        "WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY"
    ),
    doc="age-based retention cutoff (A17: common/src/config.rs:55-85, 7-day default)",
)
def st6(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    mx = e.agg(F.max(F.col("ts").cast("timestamp")).alias("mx"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts").cast("timestamp") >= F.col("mx") - F.expr("INTERVAL 7 DAY"))
        .agg(F.count("*").alias("retained"))
    )


@query(
    "st7_append_ack",
    oracle=(
        "SELECT min(event_id) AS start_seq, max(event_id)+1 AS end_seq, "
        "(SELECT max(event_id)+1 FROM events) AS tail_seq "
        "FROM events WHERE event_id BETWEEN 200 AND 209"
    ),
    doc="append ack positions (A1: start/end/tail, streamer.rs:1010-1070)",
)
def st7(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    tail = e.agg((F.max("event_id") + 1).alias("tail_seq"))
    batch = e.filter(F.col("event_id").between(200, 209)).agg(
        F.min("event_id").alias("start_seq"),
        (F.max("event_id") + 1).alias("end_seq"),
    )
    return batch.crossJoin(F.broadcast(tail))
