"""Plan-hygiene regression guard over the WHOLE query registry.

The scale audit that previous rounds did by hand (grep the bench tail
for `WindowExec: No Partition Defined`, eyeball `.explain` output) is
automated here: every registry query's physical plan is walked and the
build FAILS if a scale-killer re-appears —

- **unpartitioned window**: a `windowspecdefinition` whose first
  argument is an order column (` ASC`/` DESC`) has an empty partition
  spec, i.e. the whole input collapses onto one task. The chunked
  two-phase prefix (`operators/prefix.py`) exists precisely so no
  query needs one.
- **row-at-a-time Python UDF**: `BatchEvalPython` in a plan means a
  per-row Python round-trip in the hot path. The only sanctioned
  Python execution is Arrow-batched (`MapInPandas` /
  `FlatMapGroupsInPandas` — multimodal decode, AEGIS kernel).
- **cartesian product**: `CartesianProduct` means a non-broadcast
  cross join; 1-row broadcast query vectors plan as
  `BroadcastNestedLoopJoin`, which is fine. Only the explicit
  cross-join query (j8) may produce one, and even it broadcasts.

Plans are built at sf0.001 (analysis + optimization only — the checks
read the initial physical plan, no job runs for the plan itself; a few
queries execute bounded control-plane jobs while CONSTRUCTING their
DataFrame, which is their documented behavior).
"""

from __future__ import annotations

import re

import pytest

from s2_spark.registry import all_queries

SF = "/root/testdata/sf0.001"

# queries allowed to contain a CartesianProduct node (explicit
# cross-join semantics). Currently none — even j8 broadcasts its tiny
# side — but the allowlist documents where an exemption would go.
CARTESIAN_OK: frozenset = frozenset()

_QUERIES = sorted(all_queries())


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _unpartitioned_window_specs(plan: str) -> list[str]:
    """windowspecdefinition(...) occurrences whose first argument is an
    ORDER column (` ASC`/` DESC` marker) — meaning no partition columns
    precede it, so the window would run on a single task."""
    bad = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        first_arg = m.group(1).split(",", 1)[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            bad.append(m.group(1)[:120])
    return bad


def test_detectors_fire_on_known_bad_plans(spark):
    """Negative control: the guard must actually catch the patterns it
    claims to (a vacuously-green detector is worse than none)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    bad = spark.range(10).withColumn("rn", F.row_number().over(W.orderBy("id")))
    assert _unpartitioned_window_specs(_physical_plan(bad))
    good = spark.range(10).withColumn(
        "rn", F.row_number().over(W.partitionBy(F.col("id") % 2).orderBy("id"))
    )
    assert not _unpartitioned_window_specs(_physical_plan(good))
    rowudf = udf(lambda x: x + 1, "long")
    assert "BatchEvalPython" in _physical_plan(spark.range(10).select(rowudf("id")))


@pytest.mark.parametrize("name", _QUERIES)
def test_plan_hygiene(name, spark):
    df = all_queries()[name].spark(spark, SF)
    plan = _physical_plan(df)

    bad_windows = _unpartitioned_window_specs(plan)
    assert not bad_windows, (
        f"{name}: unpartitioned window(s) — whole input on one task: "
        f"{bad_windows}"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, (
            f"{name}: non-broadcast cartesian product"
        )
