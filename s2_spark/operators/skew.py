"""Skew mitigation — salting for hot keys, the manual complement to
AQE's runtime skew-join splitting (enabled in session.py).

At 100 TB a handful of hot streams (or hot join keys) can dominate a
shuffle: one partition gets most of the rows and the stage runs at the
speed of that straggler. Salting splits each hot key into ``salt_n``
sub-keys so the work spreads, then merges the partials.

Two shapes:
- :func:`salted_agg` — two-phase aggregation: partial agg on
  (key, salt), final agg on key. Correct for decomposable aggregates
  (count/sum/min/max).
- :func:`salted_join` — replicate the small side ``salt_n`` times so a
  salted big side still matches every row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_n: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt (no rand() — reruns must reproduce):
    spread by a hash of the whole row's physical order surrogate; we
    use monotonically_increasing_id, stable within one materialization.

    WARNING: stability holds only WITHIN one materialization — the id
    depends on partition layout, so a re-read or repartition can assign
    a row a different salt. Safe for the transient agg/join spreading
    this module does (the salt never outlives the plan); MUST NOT key
    anything persisted — never write the salt column to storage, use it
    as a bucketing/partition key for saved tables, or join on it across
    independently-materialized plans."""
    return df.withColumn(
        col_name, (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt_n).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` maps column → one of
    count/sum/min/max. Phase 1 shuffles on (keys, salt) — ≤ salt_n
    partitions per hot key — phase 2 shuffles only the tiny partials."""
    fn = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    salted = with_salt(df, salt_n)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[fn[a](c).alias(f"_p_{c}_{a}") for c, a in aggs.items()]
    )
    refold = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[
            refold[a](f"_p_{c}_{a}").alias(f"{c}_{a}")
            for c, a in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    across all salts, join on (key, salt). The small side grows salt_n×
    (it's small by assumption); the big side's hot key spreads over
    salt_n shuffle partitions."""
    big_s = with_salt(big, salt_n)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt_n)]))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")
