"""Generalized as-of join — the resolve-position-at-timestamp operation
(A8, ``lite/src/backend/read.rs:287-317``) lifted to a full relational
operator Spark lacks natively.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` (direction="backward"; "forward" gives the
earliest ``right.ts >= left.ts``), optionally within per-key groups.

Implementation is a union + running-window fold, NOT a range theta
join: tag both sides, sort by (key, ts, side), carry the latest right
payload forward with ``last(..., ignorenulls)``. Cost is one shuffle on
(key) + a per-key sort — O(n log n), partitioned by the by-key, no
quadratic blowup. This is the standard distributed merge_asof shape.

KEYLESS mode (``by=[]`` with a numeric ``on``) does NOT fall back to a
global window: the carry-forward becomes a running max of
struct(on, payload) over payload-bearing rows, computed with the
chunked two-phase prefix (``operators/prefix.py``) — task-parallel
across ``on`` ranges. A keyless as-of with a non-numeric ``on`` (no
monotone chunk key available) or a non-orderable payload column (a
map — struct max needs ordering) keeps the window form; cast
timestamps to epoch numbers to get the distributed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every left row + the nearest right row at or
    before (backward) / at or after (forward) its ``on`` value.
    ``on`` must be mutually comparable across both frames; ``by`` keys
    must exist on both sides. Right columns come back prefixed."""
    by = by or []
    rcols = [c for c in right.columns if c != on and c not in by]
    payload = F.struct(*[F.col(c).alias(c) for c in rcols])

    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    rhs = right.select(
        *by, F.col(on), F.lit(0).alias("_side"), payload.alias("_payload")
    )
    # align columns for the union: left keeps its own columns, right
    # contributes only (by, on, side, payload)
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.select(*lhs.columns)

    merged = lhs.unionByName(rhs)
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    from pyspark.sql import types as T

    def _orderable(dt) -> bool:
        # running-max over struct(on, payload) needs an orderable
        # payload; MapType is the one non-orderable container
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        return True

    on_numeric = isinstance(merged.schema[on].dataType, T.NumericType)
    payload_orderable = _orderable(merged.schema["_payload"].dataType)
    if not by and on_numeric and payload_orderable:
        # KEYLESS as-of: Window.partitionBy() would collapse the whole
        # union onto one task. The last-non-null carry is equivalently
        # a running MAX restricted to payload-bearing (right) rows —
        # F.max skips nulls, and struct order (on, payload) picks the
        # nearest right row — which the chunked two-phase prefix
        # computes task-parallel across `on` ranges. Forward direction
        # negates the key so "nearest at-or-after" is again a max under
        # an ascending-prefix traversal.
        from s2_spark.operators.prefix import chunked_running

        sign = 1 if direction == "backward" else -1
        key = (F.col(on) * sign).alias("_okey")
        cand = F.when(
            F.col("_side") == 0,
            F.struct(key, F.col("_payload").alias("p")),
        )
        ordered = merged.withColumn("_okey", F.col(on) * sign)
        out = (
            chunked_running(
                ordered,
                # right (side 0) sorts before left at equal `on` in
                # BOTH directions → ties count as matches
                [F.col("_okey"), F.col("_side")],
                cand,
                "_cm",
                kind="max",
            )
            .filter(F.col("_side") == 1)
            .withColumn("_match", F.col("_cm")["p"])
            .drop("_side", "_payload", "_okey", "_cm")
        )
    else:
        if direction == "backward":
            # right rows sort before left at equal ts → ties count as match
            w = (
                W.partitionBy(*by)
                .orderBy(F.col(on).asc(), F.col("_side").asc())
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
        else:
            w = (
                W.partitionBy(*by)
                .orderBy(F.col(on).desc(), F.col("_side").asc())
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
        out = (
            merged.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
            .filter(F.col("_side") == 1)
            .drop("_side", "_payload")
        )
    for c in rcols:
        out = out.withColumn(f"{right_prefix}{c}", F.col("_match")[c])
    return out.drop("_match")
