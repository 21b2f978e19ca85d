"""Fixture table loading and temp-view registration.

The driver fixtures (TESTDATA.md) are one parquet file per table under
``/root/testdata/sf*/``. Queries in the suite address tables either via
the DataFrame handle (``t(spark, sf_dir, "events")``) or via temp views
(``load_views`` registers all of them so ``spark.sql`` text matches the
DuckDB oracle closely).

Scale note: these are plain ``spark.read.parquet`` scans — column
pruning and predicate pushdown reach the parquet reader untouched. At
100 TB the same code reads a directory of many files; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Remember which sf_dir's views are registered on a given session so
# repeated suite calls don't re-register (view registration is cheap but
# this also guards against accidentally mixing scale factors).
_registered: dict[int, str] = {}

# Sessions already switched to nanos-as-long parquet reads (keyed by
# id(spark) to avoid one py4j round-trip per table load).
_nanos_ready: set[int] = set()


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make ``spark`` able to read TIMESTAMP(NANOS) parquet.

    ``events.parquet`` stores its ``ts`` column as INT64
    TIMESTAMP(NANOS), which Spark rejects at read time unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set. The suite must run
    on *any* session — in particular the driver's, which does not come
    from :func:`s2_spark.session.get_spark` — so set the conf here; it
    is a runtime-settable SQL conf.
    """
    key = id(spark)
    if key in _nanos_ready:
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _nanos_ready.add(key)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events.ts`` has shipped in two parquet encodings across fixture
    generations: INT64 TIMESTAMP(NANOS) (read as i64 nanoseconds under
    ``legacy.parquet.nanosAsLong`` — normalized here to TimestampType
    at microsecond floor, matching DuckDB's ns→ms flooring in
    ``epoch_ms``) and plain TIMESTAMP(MICROS) (read natively as
    TIMESTAMP_NTZ — passed through). Callers branch on the actual
    dtype, never on an assumed encoding.
    """
    ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def t_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table without the ts normalization — for queries
    that range-filter on time and want the predicate pushed down to the
    parquet scan (a filter on the raw i64 ns column prunes row groups;
    one on ``timestamp_micros(...)`` cannot)."""
    ensure_nanos_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself."""
    key = id(spark)
    if _registered.get(key) == sf_dir:
        return
    ensure_nanos_conf(spark)
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
    _registered[key] = sf_dir
