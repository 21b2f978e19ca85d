"""Similarity search over embedding columns (``array<float>``).

Three tiers, all DataFrame-native:
- :func:`cosine_topk` — exact brute force; one broadcast of the query
  vector, one TakeOrdered. The correctness baseline.
- :func:`lsh_topk` — random-hyperplane LSH: m sign bits → bucket key;
  candidates = same-bucket (plus optional multiprobe flips), verified
  with exact cosine. At 100 TB the bucket join touches ~n/2^m of the
  corpus per probe instead of all of it.
- :func:`ivf_topk` — inverted-file ANN: KMeans centroids (trained once,
  tiny model), probe the nprobe nearest cells; the scan is a partition-
  pruned equi-join on cell id.

Deterministic hyperplanes/centroid seeds so results are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dbl(c) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def _lit_dvec(values) -> Column:
    """Literal double-array column via ONE ``F.expr`` parse instead of
    one py4j round trip per element. A 64-dim plane built as
    ``F.array(*[F.lit(float(x)) ...])`` costs 65 py4j calls; a query
    that folds 11 planes (x51) or 16 centroids (x36/x37) spends
    SECONDS of driver time just constructing the plan (measured 2.9 s
    for the planted-corpus count at sf0.1 — pure plan build). Python's
    ``repr`` round-trips IEEE doubles exactly and Spark's D-suffixed
    literal parses with ``Double.parseDouble``, so the parsed doubles
    are bit-identical to ``F.lit(float(x))`` — oracle hashes are
    unaffected (verified x36/x37/x49/x51/x52 at sf0.01+sf0.1)."""
    return F.expr(
        "array(" + ",".join(f"{float(v)!r}D" for v in values) + ")"
    )


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda s, x: s + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _vec_lit_df(spark, query: list[float]) -> DataFrame:
    """1-row query-vector DataFrame as a pure literal plan (broadcast
    build needs no Python workers, unlike createDataFrame)."""
    return spark.range(1).select(
        _lit_dvec(query).cast("array<float>").alias("qe")
    )


def _query_df(df: DataFrame, vec_col: str, query: list[float] | None, query_id=None,
              id_col: str = "vec_id") -> DataFrame:
    if query is not None:
        return _vec_lit_df(df.sparkSession, query)
    return df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qe"))


def cosine_topk(
    df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query: list[float] | None = None,
    query_id=None,
) -> DataFrame:
    """Exact top-k by cosine — broadcast 1-row query, TakeOrdered k."""
    q = _query_df(df, vec_col, query, query_id, id_col)
    base = df if query is not None else df.filter(F.col(id_col) != query_id)
    return (
        base.crossJoin(F.broadcast(q))
        .select(id_col, cosine(vec_col, "qe").alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def _hyperplanes(dim: int, m: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG — no numpy
    dependency in the plan; tiny driver-side constant)."""
    state = seed
    planes = []
    for _ in range(m):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key: bit i = 1 if dot(v, plane_i) >= 0."""
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(vec_col, _lit_dvec(p))
        key = key + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(0)
    return key


def lsh_topk(
    df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query: list[float] | None = None,
    query_id=None,
    m: int = 8,
    multiprobe: int = 1,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: probe the query's bucket (and hamming-`multiprobe`
    neighbors), exact cosine within. Recall/efficiency dial = (m,
    multiprobe)."""
    from itertools import combinations

    planes = _hyperplanes(dim, m, seed)
    bucketed = df.withColumn("_bkt", lsh_bucket(vec_col, planes))
    q = _query_df(df, vec_col, query, query_id, id_col).withColumn(
        "_qbkt", lsh_bucket("qe", planes)
    )
    # probe set: every bucket within hamming <= multiprobe of the
    # query's (sum over r of C(m, r) masks — all literal, folded into
    # the plan). multiprobe=1 is the single-bit-flip set; higher values
    # genuinely widen the probe ring rather than being a no-op.
    masks = [0] + [
        sum(1 << i for i in bits)
        for r in range(1, min(multiprobe, m) + 1)
        for bits in combinations(range(m), r)
    ]
    probes = F.array(
        *[F.col("_qbkt").bitwiseXOR(F.lit(mask).cast("long")) for mask in masks]
    )
    # query norm folded ONCE on the (1-row) query side below the probe
    # explode, not per candidate row after the join — value-identical
    # (same fold, same IEEE doubles), so oracles are unaffected. The
    # withColumn keeps the fold in its own projection BELOW the
    # Generate (a select alongside explode would split with the
    # non-generator outputs placed above it).
    qx = q.withColumn("_qn", norm("qe")).select(
        "qe", "_qn", F.explode(probes).alias("_bkt")
    )
    base = bucketed if query is not None else bucketed.filter(F.col(id_col) != query_id)
    # null-safe key: a plain equi-join makes Catalyst infer
    # isnotnull(_bkt) and push it to the scan with the whole m-plane
    # bucket expression inlined — recomputing every sign fold per row
    # just for the null check. The key is never null; values identical.
    qx = qx.withColumnRenamed("_bkt", "_qprobe")
    return (
        base.join(
            F.broadcast(qx), F.col("_bkt").eqNullSafe(F.col("_qprobe"))
        )
        .select(
            id_col,
            (dot(vec_col, "qe") / (norm(vec_col) * F.col("_qn"))).alias("sim"),
        )
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def ivf_fixed_centroids(n_cells: int = 16, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-vector centroids (same LCG as the LSH
    hyperplanes). A fixed coarse quantizer: worse cell balance than
    KMeans (:func:`ivf_train_assign`) but fully replayable — an
    independent SQL engine can recompute every assignment and probe,
    which makes the whole IVF pipeline verifiable end-to-end."""
    return _hyperplanes(dim, n_cells, seed)


def ivf_assign_fixed(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared euclidean,
    first-min tie-break) — one fold per centroid (zip_with + aggregate,
    element-order summation so an external engine reproduces the exact
    IEEE doubles), no shuffle, no UDF. Adds ``_cell``.

    The folds read the RAW column and let zip_with's float->double
    coercion widen per element (exact, same doubles as casting first):
    a _dbl() transform here would be textually repeated once per
    centroid inside the single _cell expression, and Catalyst inlines
    that expression into pushed-down probe filters."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def sqdist(c: list[float]) -> Column:
        lit = _lit_dvec(c)
        diffs = F.zip_with(v, lit, lambda x, y: (x - y) * (x - y))
        return F.aggregate(diffs, F.lit(0.0), lambda s, x: s + x)

    # single-reference argmin: array_min over (dist, index) structs
    # (lexicographic struct order = least distance, first index on
    # ties — exactly array_position-of-min semantics). The former
    # array_position(dists, array_min(dists)) referenced the fold
    # array TWICE, and Catalyst's inferred isnotnull(_cell) filters
    # inline the whole doubled expression below every join/probe —
    # past whole-stage codegen size, where interpreted evaluation has
    # no subexpression elimination (the x52/round-10 defect class,
    # caught by the plan-hygiene oversized-duplication detector).
    cells = F.array(
        *[
            F.struct(sqdist(c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn("_cell", F.array_min(cells)["i"].cast("int"))


def ivf_train_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, "object"]:
    """Train IVF centroids (MLlib KMeans — distributed Lloyd) and assign
    every vector to its cell. Returns (assigned_df, model)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn("_features", array_to_vector(_dbl(vec_col)))
    km = KMeans(k=n_cells, seed=seed, featuresCol="_features", predictionCol="_cell")
    model = km.fit(with_vec)
    return model.transform(with_vec).drop("_features"), model


def ivf_topk(
    assigned: DataFrame,
    model,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query: list[float] | None = None,
    query_id=None,
    nprobe: int = 3,
) -> DataFrame:
    """Probe the nprobe nearest cells only — the scan becomes an
    IN-filter on the cell id (partition-prunable when the table is
    written partitioned by cell). ``model`` is either a fitted MLlib
    KMeans model or a plain centroid list (:func:`ivf_fixed_centroids`)."""
    if query is None:
        row = assigned.filter(F.col(id_col) == query_id).select(vec_col).first()
        if row is None:
            raise ValueError(f"ivf_topk: no vector with {id_col} == {query_id!r}")
        query = [float(x) for x in row[0]]
    raw_centers = model if isinstance(model, list) else model.clusterCenters()
    centers = [(i, list(map(float, c))) for i, c in enumerate(raw_centers)]

    def _sqdist(a, b):
        # probe ranking uses the SAME metric that carved the cells
        # (squared euclidean — ivf_assign_fixed / KMeans). Ranking by
        # cosine instead can exclude the query's own assigned cell for
        # unnormalized vectors, missing near-identical stored vectors.
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe_cells = [
        i for i, _ in sorted(centers, key=lambda ic: (_sqdist(ic[1], query), ic[0]))[:nprobe]
    ]
    qdf = _vec_lit_df(assigned.sparkSession, query)
    # probe-cell selection as a NULL-SAFE broadcast semi-join instead
    # of isin(): a pushed-down isin predicate (and the isnotnull
    # Catalyst infers from a plain equi-join) would inline the whole
    # _cell assignment expression below the projection that
    # materializes it — once per branch filter, with every centroid
    # fold re-evaluated. eqNullSafe blocks the isnotnull inference and
    # join keys evaluate the materialized column exactly once.
    spark = assigned.sparkSession
    cells_df = spark.createDataFrame(
        [(int(c),) for c in probe_cells], "probe_cell int"
    )
    base = assigned.join(
        F.broadcast(cells_df),
        F.col("_cell").eqNullSafe(F.col("probe_cell")),
        "leftsemi",
    )
    if query_id is not None:
        base = base.filter(F.col(id_col) != query_id)
    return (
        base.crossJoin(F.broadcast(qdf))
        .select(id_col, cosine(vec_col, "qe").alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 6,
    dim: int = 64,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. ``exact=True`` does the full
    pairwise join (baseline / oracle); default buckets by hyperplane
    signs first so only same-bucket pairs get the exact cosine —
    high-cosine pairs land in the same bucket with prob (1 - θ/π)^m."""
    # pin parallelism (r15, guide §2.5): both modes join a SMALL input
    # into a quadratic(-ish) pair set. exact mode plans a
    # BroadcastNestedLoopJoin whose stream side inherits the scan's
    # partitioning (a tiny scan = 1 task computing every pairwise
    # cosine); bucketed mode's equi-join exchange gets AQE-coalesced
    # to 1-2 partitions the same way the LSH band joins did. An
    # explicit-N repartition is exempt from AQE coalescing.
    dp = df.sparkSession.sparkContext.defaultParallelism
    if not exact:
        planes = _hyperplanes(dim, m, seed)
        df2 = df.withColumn("_bkt", lsh_bucket(vec_col, planes)).repartition(
            dp, "_bkt"
        )
        a, b = df2.alias("a"), df2.alias("b")
        cond = (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        ) & (F.col("a._bkt") == F.col("b._bkt"))
    else:
        df2 = df.repartition(dp)
        a, b = df2.alias("a"), df2.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
