"""Distributed running aggregates (chunked two-phase prefix).

A ``Window.orderBy(...)`` with no partition key collapses the whole
input onto one task (Spark warns ``WindowExec: No Partition Defined``).
Running sums and running maxes don't need that: both are
prefix-decomposable, so the global running value at a row is

    combine(running-value within the row's chunk,
            fold of the totals of all earlier chunks)

for any chunking that respects the global order. Phase 1 runs the
window partitioned by chunk (parallel across tasks); phase 2 folds the
per-chunk totals into per-chunk starting offsets with a broadcast
inequality join over the tiny chunk-totals relation (``rows /
chunk_width`` rows). This is the same plan proven for the metrics gauge
set in ``s2_spark/operators/metrics.py`` (storage_gauge), generalized
to any monotone chunk key and to max as well as sum.

Scale: with the default width of 65 536 order-units per chunk, a
10-billion-row series produces ~150k chunk rows — broadcastable. For a
series long enough that even the chunk relation is large, the same
decomposition nests (chunk the chunks); no query in this repo needs
the third level.

Reference tie-in: these are the scale-safe forms of the per-stream log
folds (running timestamp max = monotone adjust, streamer.rs:996-1000;
running metered-byte sum = read bytes-limit cutoff, read_extent.rs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from s2_spark.checkpoint import barrier

DEFAULT_CHUNK_WIDTH = 65_536


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


#: chunk id for rows whose first order column is NULL — window
#: orderBy sorts nulls FIRST, so they belong to the earliest chunk
_NULL_CHUNK = -(1 << 62)


def _default_chunk(order_col: Column, chunk_width: int) -> Column:
    """floor(order/width), with NULL order keys mapped to the earliest
    chunk: a plain Window.orderBy puts nulls first, and a NULL chunk id
    would otherwise fall out of the equi-joins (NULL == NULL is NULL) —
    silently dropping rows the window form would keep."""
    return F.coalesce(
        F.floor(order_col / F.lit(chunk_width)).cast("long"),
        F.lit(_NULL_CHUNK).cast("long"),
    )


def _null_safe_on(left, right, cols: list[str]):
    """Join condition equivalent to USING(cols) but NULL-safe: a NULL
    partition key is a legitimate group (groupBy and Window.partitionBy
    both treat it as one), so the join-back must not drop its rows."""
    cond = None
    for c in cols:
        piece = left[c].eqNullSafe(right[c])
        cond = piece if cond is None else cond & piece
    return cond


def chunked_running(
    df: DataFrame,
    order_by: list[Column | str],
    value: Column | str,
    out_col: str,
    kind: str = "sum",
    chunk: Column | None = None,
    chunk_width: int = DEFAULT_CHUNK_WIDTH,
    partition_by: list[str] | None = None,
    materialize_totals: bool = False,
) -> DataFrame:
    """Add ``out_col`` = running ``kind`` of ``value`` over the global
    order ``order_by`` (ROWS UNBOUNDED PRECEDING .. CURRENT ROW),
    computed without a global single-partition window.

    Multiple running aggregates over the same order should go through
    :func:`chunked_running_multi` in ONE pass — chaining two
    ``chunked_running`` calls recomputes the first fold's whole plan
    inside the second one's three scans.

    ``chunk`` must be monotone non-decreasing in the global order (ties
    in the order key must land in the same chunk); defaults to
    ``floor(first-order-column / chunk_width)``, which is valid whenever
    the first order column alone is unique-enough that equal values
    sharing a chunk is acceptable (always true: equal primary keys sort
    adjacent and stay together under floor()).

    ``partition_by`` scopes the running aggregate to each key group
    (e.g. one S2 stream): the fold restarts per key, and — unlike
    ``Window.partitionBy(keys)`` alone — a single hot key still spreads
    across tasks, because the real partition key is (key, chunk). This
    is the skew-proof form of the per-stream log folds.

    All input columns are preserved.
    """
    return chunked_running_multi(
        df,
        order_by,
        [(value, out_col, kind)],
        chunk=chunk,
        chunk_width=chunk_width,
        partition_by=partition_by,
        materialize_totals=materialize_totals,
    )


def chunked_running_multi(
    df: DataFrame,
    order_by: list[Column | str],
    specs: list[tuple[Column | str, str, str]],
    chunk: Column | None = None,
    chunk_width: int = DEFAULT_CHUNK_WIDTH,
    partition_by: list[str] | None = None,
    materialize_totals: bool = False,
) -> DataFrame:
    """N running aggregates over the same global order in ONE chunked
    two-phase pass. ``specs`` is ``[(value, out_col, kind), ...]`` with
    kind 'sum' or 'max'. All N share the per-chunk window, the
    chunk-totals aggregation, and the two broadcast joins — the plan
    cost is that of a single :func:`chunked_running` regardless of N.

    ``materialize_totals`` eagerly localCheckpoints the tiny
    chunk-totals relation at plan-build time so the offsets self-join
    reads it from executor-cached blocks instead of re-evaluating the
    caller's whole input per join side — the self-join otherwise costs
    a third evaluation of the input projection. Default off (fully
    lazy, plan identical to the classic shape): measured at sf0.1 the
    eager job only pays for itself when the input projection is
    expensive (str6's command parsing: 1.23 s → 1.11 s); cheap-input
    callers (w1/w5/x31/j7) break even or lose ~5%.
    """
    for _, _, kind in specs:
        if kind not in ("sum", "max"):
            raise ValueError(f"kind must be 'sum' or 'max', got {kind!r}")
    order_cols = [_col(c) for c in order_by]
    pcols = list(partition_by or [])
    if chunk is None:
        chunk = _default_chunk(order_cols[0], chunk_width)

    def agg(i: int, col: Column | str) -> Column:
        return (F.sum if specs[i][2] == "sum" else F.max)(col)

    d = df.withColumn("_pchunk", chunk)
    for i, (value, _, _) in enumerate(specs):
        d = d.withColumn(f"_pval{i}", _col(value))
    win = (
        W.partitionBy(*pcols, "_pchunk")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = d.select(
        "*", *[agg(i, f"_pval{i}").over(win).alias(f"_prun{i}") for i in range(len(specs))]
    )

    # chunk totals are aggregated from the WINDOWED side, not the raw
    # input: run's required distribution (pcols, _pchunk) equals the
    # aggregation's, so the shuffle (and the scan feeding it) is reused
    # instead of recomputed — measured 0.69 -> 0.38 s p50 on a 100k-row
    # running sum at sf0.1. Same rows, same agg, identical results.
    tot = run.groupBy(*pcols, "_pchunk").agg(
        *[agg(i, f"_pval{i}").alias(f"_pct{i}") for i in range(len(specs))]
    )
    # opt-in single evaluation of `tot` (r15): the inequality
    # self-join below consumes it twice, and Spark re-evaluates the
    # whole subtree — including the caller's full input projection —
    # per side (str6's plan showed THREE scans of the command-parsing
    # projection). The eager localCheckpoint trades one build-time job
    # for that third evaluation — a win only when the input projection
    # is expensive (see docstring), hence not the default.
    if materialize_totals:
        tot = barrier(tot)
    # eqNullSafe throughout: a NULL partition key is one group to
    # groupBy/Window, and plain equality would drop its rows here
    same_key = [F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in pcols]
    cond = same_key + [F.col("b._pchunk") < F.col("a._pchunk")]
    offsets = (
        tot.alias("a")
        .join(F.broadcast(tot.alias("b")), cond, "left")
        .groupBy(
            *[F.col(f"a.{c}").alias(c) for c in pcols],
            F.col("a._pchunk").alias("_pchunk"),
        )
        .agg(*[agg(i, F.col(f"b._pct{i}")).alias(f"_poff{i}") for i in range(len(specs))])
    )
    off = F.broadcast(offsets)
    joined = run.join(
        off, _null_safe_on(run, off, [*pcols, "_pchunk"])
    ).drop(*[off[c] for c in [*pcols, "_pchunk"]])
    drop = ["_pchunk"]
    for i, (_, out_col, kind) in enumerate(specs):
        if kind == "sum":
            # three-way null handling matches sum() OVER (ROWS UNBOUNDED
            # PRECEDING): a null offset means "no earlier chunk" (keep
            # the in-chunk prefix, possibly null), a null in-chunk
            # prefix (all-null values so far in this chunk) must NOT
            # poison the earlier chunks' sum — SQL running sum skips
            # nulls, so the combine falls back to the offset alone
            combined = (
                F.when(F.col(f"_poff{i}").isNull(), F.col(f"_prun{i}"))
                .when(F.col(f"_prun{i}").isNull(), F.col(f"_poff{i}"))
                .otherwise(F.col(f"_prun{i}") + F.col(f"_poff{i}"))
            )
        else:
            # greatest() skips nulls: null offset (first chunk) -> _prun
            combined = F.greatest(F.col(f"_prun{i}"), F.col(f"_poff{i}"))
        joined = joined.withColumn(out_col, combined)
        drop += [f"_pval{i}", f"_prun{i}", f"_poff{i}"]
    return joined.drop(*drop)


def chunked_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    out_col: str,
    chunk: Column | None = None,
    chunk_width: int = DEFAULT_CHUNK_WIDTH,
) -> DataFrame:
    """Add ``out_col`` = global 1-based row number over ``order_by``,
    without a global window: row_number within each chunk + the count of
    all rows in earlier chunks (phase-2 broadcast inequality join over
    per-chunk counts).

    With a unique order key this is also the global rank, which makes
    the rank family distributable: ntile(n) = floor((rn-1)*n/N)+1,
    percent_rank = (rn-1)/(N-1), cume_dist = rn/N — N via a 1-row
    broadcast count. The engine uses the same decomposition for
    seq_num assignment across partitioned appends.
    """
    order_cols = [_col(c) for c in order_by]
    if chunk is None:
        chunk = _default_chunk(order_cols[0], chunk_width)
    d = df.withColumn("_pchunk", chunk)
    win = W.partitionBy("_pchunk").orderBy(*order_cols)
    run = d.withColumn("_prn", F.row_number().over(win).cast("long"))
    # per-chunk counts from the windowed side (shuffle/scan reuse, see
    # chunked_running_multi)
    tot = run.groupBy("_pchunk").agg(F.count("*").alias("_pct"))
    offsets = (
        tot.alias("a")
        .join(
            F.broadcast(tot.alias("b")),
            F.col("b._pchunk") < F.col("a._pchunk"),
            "left",
        )
        .groupBy(F.col("a._pchunk").alias("_pchunk"))
        .agg(F.coalesce(F.sum("b._pct"), F.lit(0)).alias("_poff"))
    )
    return (
        run.join(F.broadcast(offsets), "_pchunk")
        .withColumn(out_col, F.col("_prn") + F.col("_poff"))
        .drop("_pchunk", "_prn", "_poff")
    )


def chunked_lag(
    df: DataFrame,
    order_by: list[Column | str],
    value: Column | str,
    out_col: str,
    chunk: Column | None = None,
    chunk_width: int = DEFAULT_CHUNK_WIDTH,
) -> DataFrame:
    """Add ``out_col`` = ``lag(value, 1)`` over the global order without
    a global window: lag within each chunk, and for each chunk's first
    row, the last value of the nearest earlier non-empty chunk (max_by
    over the tiny chunk-summary relation).

    REQUIRES ``value`` non-null: the boundary fill uses coalesce, so a
    null at a chunk's end would be skipped rather than propagated. The
    contract is ENFORCED — each chunk's summary row (the tiny phase-2
    relation, not the hot path) counts nulls and raises at execution
    time if any appear, so a future caller gets a loud error instead of
    silently-wrong skip-not-propagate lag semantics.
    """
    order_cols = [_col(c) for c in order_by]
    if chunk is None:
        chunk = _default_chunk(order_cols[0], chunk_width)
    d = df.withColumn("_pchunk", chunk).withColumn("_pval", _col(value))
    win = W.partitionBy("_pchunk").orderBy(*order_cols)
    run = d.withColumn("_plag", F.lag("_pval").over(win))
    # chunk summaries from the windowed side (shuffle/scan reuse, see
    # chunked_running_multi)
    last = run.groupBy("_pchunk").agg(
        F.max_by("_pval", F.struct(*order_cols)).alias("_plast"),
        F.sum(F.col("_pval").isNull().cast("int")).alias("_pnulls"),
    ).select(
        "_pchunk",
        F.when(
            F.col("_pnulls") > 0,
            F.raise_error(
                F.concat(
                    F.lit("chunked_lag requires a non-null value column ("),
                    F.col("_pnulls").cast("string"),
                    F.lit(" null(s) in chunk "),
                    F.col("_pchunk").cast("string"),
                    F.lit(")"),
                )
            ).cast(d.schema["_pval"].dataType),
        )
        .otherwise(F.col("_plast"))
        .alias("_plast"),
    )
    prev = (
        last.alias("a")
        .join(
            F.broadcast(last.alias("b")),
            F.col("b._pchunk") < F.col("a._pchunk"),
            "left",
        )
        .groupBy(F.col("a._pchunk").alias("_pchunk"))
        .agg(F.max_by(F.col("b._plast"), F.col("b._pchunk")).alias("_pprev"))
    )
    return (
        run.join(F.broadcast(prev), "_pchunk")
        .withColumn(out_col, F.coalesce(F.col("_plag"), F.col("_pprev")))
        .drop("_pchunk", "_pval", "_plag", "_pprev")
    )
