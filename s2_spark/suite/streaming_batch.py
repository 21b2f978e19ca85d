"""Batch-equivalent forms of the streaming operators (SURVEY.md §2.B
Q-STR*). The Structured Streaming pipelines in ``s2_spark.streaming``
must produce the same final results as these batch plans; the DuckDB
oracle checks the batch side, streaming-vs-batch equality is asserted
in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_spark.registry import query
from s2_spark.suite._util import epoch_ms
from s2_spark.tables import t


@query(
    "str1_tumbling_window",
    oracle=(
        "SELECT epoch_ms(date_trunc('hour', ts)) AS w, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc="tumbling 1h window counts — groupBy(window(ts,'1 hour')) in streaming",
)
def str1(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    win = F.window(F.col("ts").cast("timestamp"), "1 hour")
    return (
        e.groupBy(win.alias("win"))
        .agg(F.count("*").alias("n"))
        .select(epoch_ms(F.col("win.start")).alias("w"), "n")
        .orderBy("w")
    )


@query(
    "str2_sliding_window",
    oracle=(
        "SELECT CAST((floor(extract(epoch FROM ts)/1800) - s.k) * 1800000 AS BIGINT) "
        "AS w_start_ms, count(*) AS n FROM events, (VALUES (0),(1)) s(k) "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc="sliding window 60m/30m — every event in exactly 2 windows; sum(n) = 2·count(*)",
)
def str2(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    win = F.window(F.col("ts").cast("timestamp"), "60 minutes", "30 minutes")
    return (
        e.groupBy(win.alias("win"))
        .agg(F.count("*").alias("n"))
        .select(epoch_ms(F.col("win.start")).alias("w_start_ms"), "n")
        .orderBy("w_start_ms")
    )


@query(
    "str3_session_window",
    oracle=(
        "SELECT user_id, epoch_ms(min(ts)) AS s_ms, epoch_ms(max(ts)) AS e_ms, "
        "count(*) AS n FROM ("
        "  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid "
        "  FROM ("
        "    SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "      > INTERVAL 30 MINUTE "
        "      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
        "      THEN 1 ELSE 0 END AS new_s FROM events)"
        ") GROUP BY user_id, sid ORDER BY user_id, s_ms"
    ),
    doc=(
        "session window, 30 min gap per user — session_window() in Spark "
        "(boundary: Spark splits at gap == 30m exactly, lag-form merges; "
        "microsecond timestamps make exact-30m gaps measure-zero)"
    ),
)
def str3(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        e.groupBy("user_id", sw.alias("win"))
        .agg(
            F.count("*").alias("n"),
            F.min(F.col("ts").cast("timestamp")).alias("mn"),
            F.max(F.col("ts").cast("timestamp")).alias("mx"),
        )
        .select(
            "user_id",
            epoch_ms(F.col("mn")).alias("s_ms"),
            epoch_ms(F.col("mx")).alias("e_ms"),
            "n",
        )
        .orderBy("user_id", "s_ms")
    )


@query(
    "str4_watermark_survivors",
    oracle=(
        "SELECT count(*) AS n FROM (SELECT ts, max(ts) OVER (ORDER BY event_id) AS wm "
        "FROM events) WHERE ts >= wm - INTERVAL 10 MINUTE"
    ),
    doc=(
        "watermark / late-data model: rows within 10 min of the running max "
        "event time survive — withWatermark('ts','10 minutes') in streaming"
    ),
)
def str4(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_running

    e = t(spark, sf_dir, "events")
    # running watermark (max event-time so far in arrival order) via the
    # chunked two-phase prefix — no global single-partition window
    d = chunked_running(
        e.withColumn("_ts", F.col("ts").cast("timestamp")),
        ["event_id"], "_ts", "wm", kind="max", chunk_width=8192,
    )
    return (
        d.filter(F.col("_ts") >= F.col("wm") - F.expr("INTERVAL 10 MINUTE"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "str5_stateful_dedup",
    oracle=(
        "SELECT count(*) AS n FROM "
        "(SELECT DISTINCT user_id, event_type FROM events)"
    ),
    doc="stateful dedup — dropDuplicates / dropDuplicatesWithinWatermark in streaming",
)
def str5(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
        .agg(F.count("*").alias("n"))
    )


@query(
    "str6_command_fold",
    oracle=(
        "SELECT seq_num, fencing_token, trim_point, seq_num >= trim_point AS visible "
        "FROM (SELECT event_id AS seq_num, "
        "coalesce('tok-' || CAST(max(CASE WHEN event_id % 100 = 0 THEN event_id END) "
        "OVER w AS VARCHAR), '') AS fencing_token, "
        "coalesce(max(CASE WHEN event_id % 100 = 50 "
        "THEN least(greatest(event_id - 30, 0), event_id + 1) END) OVER w, 0) AS trim_point "
        "FROM events WINDOW w AS (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW)) ORDER BY seq_num"
    ),
    doc=(
        "stateful fence/trim fold (A5/A6, streamer.rs:368-390): commands "
        "synthesized from events (fence at event_id%100==0 with token "
        "'tok-<id>', trim at %100==50 to id-30); Spark side runs the real "
        "apply_commands_batch operator over a records-shaped frame; the "
        "streaming applyInPandasWithState fold is asserted equal in tests"
    ),
)
def str6(spark, sf_dir):
    from s2_spark.streaming.state import apply_commands_batch

    e = t(spark, sf_dir, "events")
    is_fence = F.col("event_id") % 100 == 0
    is_trim = F.col("event_id") % 100 == 50
    trim_payload = F.greatest(F.col("event_id") - 30, F.lit(0))
    # u64 BE payload for trim, UTF-8 token for fence — the real wire shapes
    records = e.select(
        F.lit("b").alias("basin"),
        F.lit("s").alias("stream"),
        F.col("event_id").alias("seq_num"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.when(
            is_fence | is_trim,
            F.array(
                F.struct(
                    F.lit(b"").alias("name"),
                    F.when(is_fence, F.lit(b"fence")).otherwise(F.lit(b"trim")).alias("value"),
                )
            ),
        )
        .otherwise(F.array().cast("array<struct<name binary, value binary>>"))
        .alias("headers"),
        F.when(is_fence, F.concat(F.lit("tok-"), F.col("event_id").cast("string")).cast("binary"))
        .when(is_trim, F.unhex(F.lpad(F.hex(trim_payload), 16, "0")))
        .otherwise(F.lit(None).cast("binary"))
        .alias("body"),
    )
    return (
        apply_commands_batch(records)
        .select("seq_num", "fencing_token", "trim_point", "visible")
        .orderBy("seq_num")
    )


@query(
    "str8_interval_join",
    oracle=(
        "SELECT a.event_id AS view_id, b.event_id AS purchase_id "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND a.event_type = 'view' AND b.event_type = 'purchase' "
        "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE "
        "ORDER BY view_id, purchase_id"
    ),
    doc=(
        "stream-stream interval join (the attribution shape: each view "
        "joined to the same user's purchases within the next 30 min). "
        "The builder (streaming/ops.interval_join) watermarks BOTH "
        "sides and bounds the right event time in both directions, so "
        "Structured Streaming can expire join state instead of "
        "buffering the stream forever; batch mode plans the identical "
        "range-condition join — equivalence asserted in "
        "tests/test_streaming.py"
    ),
)
def str8(spark, sf_dir):
    from s2_spark.streaming.ops import interval_join

    e = t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    return interval_join(e).orderBy("view_id", "purchase_id")


@query(
    "str7_stream_static_join",
    oracle=(
        "SELECT e.event_id, c.c_mktsegment FROM events e "
        "JOIN customer c ON e.user_id = c.c_custkey ORDER BY e.event_id"
    ),
    doc="stream-static enrichment join — streaming df ⨝ broadcast static dim",
)
def str7(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .select("event_id", "c_mktsegment")
        .orderBy("event_id")
    )
