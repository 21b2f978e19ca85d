"""Catalog reconciliation — `s2 diff` / `s2 apply` (A30:
``cli/src/diff.rs``, ``cli/src/apply.rs``, ``resource-spec/src/lib.rs``).

A *spec* declares the desired set of streams (per basin); reconciliation
joins spec against actual and emits a plan of actions:
``+`` create, ``=`` unchanged, ``-`` extra (present but not declared —
reported, and deleted only under ``prune=True``, mirroring the CLI's
ensure semantics).

The plan is a full-outer join on the resource name — the Q-SET family
(intersect/except) as one DataFrame pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s2_spark.catalog import Catalog


@dataclass
class ApplyResult:
    created: list[str]
    unchanged: list[str]
    pruned: list[str]


def plan_df(spark: SparkSession, catalog: Catalog, basin: str, spec_streams: list[str]) -> DataFrame:
    """Diff plan as a DataFrame: (stream, action) with action ∈ {+,=,-}."""
    spec = spark.createDataFrame([(s,) for s in spec_streams] or [(None,)], "stream string").filter(
        "stream is not null"
    )
    actual_names, _ = catalog.list_streams(basin, limit=1000)
    actual = spark.createDataFrame(
        [(s,) for s in actual_names] or [(None,)], "stream string"
    ).filter("stream is not null")
    joined = spec.withColumn("in_spec", F.lit(True)).join(
        actual.withColumn("in_actual", F.lit(True)), "stream", "full_outer"
    )
    return joined.select(
        "stream",
        F.when(F.col("in_spec").isNotNull() & F.col("in_actual").isNull(), "+")
        .when(F.col("in_spec").isNotNull() & F.col("in_actual").isNotNull(), "=")
        .otherwise("-")
        .alias("action"),
    ).orderBy("stream")


def apply_plan(
    spark: SparkSession,
    catalog: Catalog,
    basin: str,
    spec_streams: list[str],
    prune: bool = False,
) -> ApplyResult:
    """Execute the plan: create missing streams, optionally prune extras."""
    plan = {r["stream"]: r["action"] for r in plan_df(spark, catalog, basin, spec_streams).collect()}
    created, unchanged, pruned = [], [], []
    for stream, action in sorted(plan.items()):
        if action == "+":
            catalog.create_stream(basin, stream)
            created.append(stream)
        elif action == "=":
            unchanged.append(stream)
        elif action == "-" and prune:
            catalog.delete_stream(basin, stream)
            pruned.append(stream)
    return ApplyResult(created, unchanged, pruned)
