"""SparkSession construction tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); on a real cluster the same
configs hold — AQE handles runtime partition coalescing and skew joins,
so the static ``shuffle.partitions`` value is a ceiling, not a schedule.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "s2_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned session.

    Scale notes: every config here is chosen to survive a 1000-executor
    cluster — AQE on (runtime coalesce + skew-join splitting), Arrow on
    (pandas-UDF fast path), UTC session TZ (oracle comparability),
    and broadcast threshold left at default so Catalyst auto-broadcasts
    the small dimension tables (region/nation/…).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # fixtures write TIMESTAMP(NANOS) which Spark's vectorized reader
        # rejects; read as i64 nanos and normalize in tables.t()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
