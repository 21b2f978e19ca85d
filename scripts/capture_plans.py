"""Capture .explain("formatted") for a set of queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
With no query names, captures every headline + scale-probe query.
Writes plans/<tag>/<label>_<suffix>.txt  (suffix from $PLAN_SUFFIX,
default "before").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s2_spark.registry import all_queries
from s2_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    if not names:
        from bench import HEADLINE, SCALE_PROBE, X100_PROBE
        seen = {}
        for label, name in HEADLINE + SCALE_PROBE + X100_PROBE:
            seen[name] = label
        names = list(seen)
    spark = get_spark("s2_plan_capture")
    for name in names:
        df = qs[name].spark(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
