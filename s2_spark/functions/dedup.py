"""Deduplication operators — exact and near-dup at 100 TB shape.

Scale design notes:
- **exact**: groupBy on a 128-bit digest of the normalized text — the
  shuffle carries 16-byte keys, never documents.
- **MinHash**: tokens explode once; k signature components are k
  ``min(xxhash64(token, seed_i))`` aggregates over that single explode
  — one shuffle on doc_id, map-side partial min. LSH banding then
  buckets signature slices so candidate generation is an equi-join on
  (band_idx, band_hash): only same-bucket docs ever meet (no O(n²)).
- **SimHash**: same single explode; 64 signed bit-sums per doc, then
  bucket by hamming-band for candidates.
- **verification**: exact Jaccard on token sets, computed only for the
  candidate pairs (array_intersect/array_union on the already-small
  candidate join).

Two output shapes, and the distinction is the 100 TB design decision:
the PAIR-emitting pipelines (``*_neardup_pairs``) are verification /
oracle shapes whose answer is inherently quadratic on dup-dense
corpora; the production shapes are the per-document KEEP/DROP action
(:func:`minhash_dedup_keep`) and cluster assignment
(:func:`neardup_clusters`), both O(n * bands) rows end to end.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from s2_spark.checkpoint import barrier


def normalize_text(col: Column) -> Column:
    """Trim + whitespace-collapse + lowercase — the canonical form
    hashed by exact dedup and fingerprints."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct normalized text. Which row survives a
    group is arbitrary (dropDuplicates); use min_by over the digest if a
    deterministic survivor is required."""
    return (
        df.withColumn("_h", F.md5(normalize_text(F.col(text_col)).cast("binary")))
        .dropDuplicates(["_h"])
        .drop("_h")
    )


def duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """All exact-duplicate groups: (hash, ids, count) with count > 1."""
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("h"))
        .agg(F.collect_list(id_col).alias("ids"), F.count("*").alias("c"))
        .filter(F.col("c") > 1)
    )


def tokens_col(text_col: str = "text") -> Column:
    """Distinct word tokens of the NORMALIZED text (trim + whitespace
    collapse + lowercase — the same canonical form :func:`normalize_text`
    hashes for exact dedup). Splitting the raw text instead would keep
    phantom empty tokens for leading/trailing whitespace, giving two
    texts that collapse as exact duplicates different token sets — which
    would break the _expand_pairs invariant that members of an exact
    cluster have exactly their representative's similarity."""
    return F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    tokens: Column | None = None,
) -> DataFrame:
    """(id, sig: array<long>[k]) — k independent min-hashes, one explode,
    one partial-aggregated shuffle. ``tokens`` swaps the unit (default
    word tokens; pass :func:`ngram_shingles` for character shingles) —
    one definition serves both pipelines."""
    toks = df.select(
        id_col,
        F.explode(tokens if tokens is not None else tokens_col(text_col)).alias("tok"),
    )
    aggs = [
        F.min(F.xxhash64("tok", F.lit(i))).alias(f"h{i}") for i in range(k)
    ]
    sig = toks.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", bands: int = 8
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band hash
    become a candidate pair. Returns distinct (d1, d2), d1 < d2."""
    # band width = floor(k / bands); the LAST band absorbs the
    # remainder so no trailing signature component is silently ignored
    # when bands does not divide the signature length
    width = (F.size("sig") / bands).cast("int")
    banded = sig_df.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        b * width + 1,
                        F.when(
                            b == bands - 1, F.size("sig") - b * width
                        ).otherwise(width),
                    ).cast("string"),
                    b,
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    # pin the join's parallelism (r15, guide §2.5 "input skew" /
    # AQE-explosion trap): the banded relation is only a few MB, so
    # AQE's byte-based coalescing collapses its exchange to 1-2
    # partitions — but this join EXPLODES (output ∝ Σ_bucket C(m,2):
    # 12.4M distinct pairs from 160k banded rows at sf0.1), so the
    # generation then runs near-serially (measured: two tasks grinding
    # for minutes where the same join at 32 tasks takes ~90 s). An
    # explicit-N repartition is exempt from AQE coalescing; N =
    # defaultParallelism tracks the session's core count (cluster-wide
    # on a real cluster), not a local[32] constant.
    dp = sig_df.sparkSession.sparkContext.defaultParallelism
    # r15 (guide §2.4 single evaluation): both self-join sides consume
    # the banded relation; the barrier keeps the signature chain from
    # evaluating twice (Spark reuses exchanges, not scans). ORDER
    # MATTERS: the checkpoint must sit BELOW the repartition pin — a
    # checkpointed RDD reports UnknownPartitioning, so a repartition
    # above it survives as the join's REPARTITION_BY_NUM exchange
    # (AQE-coalesce-exempt), while the reverse order discards the pin
    # and AQE collapses the exploding join back to 1-2 partitions
    # (measured: the x9 join ran ~8-wide instead of 32-wide).
    banded = barrier(banded).repartition(
        dp, "band_idx", "band_hash"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    # NOTE (r15, measured): a similar pair matches in MANY bands (r=1
    # banding: a pair at similarity s agrees on ~s·bands of them) —
    # 247.7M raw join rows crunch to 12.46M distinct pairs (20×) at
    # sf0.1. A first-matching-band join predicate (keep a row only if
    # no band j < band_idx has equal hashes, like the simhash tier
    # uses) would emit each pair exactly once and delete the distinct,
    # but for bands=32 the predicate is a 31-clause array-indexing
    # conjunction whose generated code degenerates to interpreted
    # evaluation per raw row — measured MINUTES of single-core grind in
    # the skewed bucket tasks vs ~10 s for the hash-aggregate distinct
    # (two-long keys, map-side partial dedup). The distinct stays.
    # r16 (guide §5 spill / §2.3): a bare .distinct() here planned a
    # MAP-side partial aggregate inside the join stage — but a pair's
    # duplicate emissions live in DIFFERENT band partitions, so the
    # partial map deduped only 20% (247.7M → 198M rows at sf0.1) while
    # building a ~7.7M-entry hash map per task: measured 14.2 GiB of
    # spill and 20 min of aggregation-build time across the stage.
    # Repartitioning by the PAIR first moves the dedup entirely past
    # the exchange: the join stage only streams rows into the shuffle
    # writer (no map, no spill), and each post-shuffle task dedupes
    # its own ~12.4M/N distinct pairs with a small in-memory map.
    # Same rows out — distinct == dropDuplicates over (d1, d2).
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .repartition(dp, "d1", "d2")
        .dropDuplicates(["d1", "d2"])
    )


def exact_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: Column | None = None,
) -> DataFrame:
    """Verify candidates with exact token-set Jaccard — joins the (small)
    candidate set back to the corpus twice; documents only move for
    candidates. ``tokens`` swaps the unit like in
    :func:`minhash_signatures`.

    r15 (guide §1.2 per-task work, §2.4 single evaluation): the token
    sets are mapped to xxhash64 longs before the pair join.
    array_intersect on STRING arrays takes the non-atomic O(|A|·|B|)
    pairwise-comparison path (measured 107 µs/pair on 206-shingle
    docs — it dominated the whole pipeline); on primitive longs it
    uses the hash-set fast path. The union size is then derived as
    |A|+|B|−|A∩B| (both token units end in array_distinct, so the
    arrays are sets), halving the set work. The Jaccard VALUE is
    unchanged unless two distinct tokens of one candidate pair collide
    in 64 bits (p ≈ m²·2⁻⁶⁴ per pair — negligible; oracle-verified
    value-identical at sf0.01 and sf0.1). The hashed relation is
    localCheckpointed: both join sides consume it and Spark reuses
    exchanges, not scans — without the barrier the tokenization
    subtree (and the exact-collapse chain under it) evaluates once per
    side."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            tokens if tokens is not None else tokens_col(text_col),
            lambda tok: F.xxhash64(tok),
        ).alias("_toks"),
    )
    toks = barrier(toks)
    j = (
        pairs.join(toks.withColumnRenamed("_id", "d1").withColumnRenamed("_toks", "t1"), "d1")
        .join(toks.withColumnRenamed("_id", "d2").withColumnRenamed("_toks", "t2"), "d2")
    )
    inter = F.size(F.array_intersect("t1", "t2")).cast("double")
    union = (F.size("t1") + F.size("t2")).cast("double") - inter
    return j.select("d1", "d2", (inter / union).alias("jaccard"))


def _collapse_exact(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(representatives, membership) for exact-duplicate clusters:
    one representative (min id) per distinct normalized text, and
    (_rep, id) for every input row.

    This is the scale guard in front of every near-dup pipeline:
    dup-heavy corpora (web crawls routinely carry clusters of thousands
    of identical documents) would otherwise send m identical signatures
    into every LSH band bucket and pay m² candidate verifications per
    cluster. Collapsing first bounds the expensive stages by the number
    of DISTINCT texts; cluster membership re-expands the verified pairs
    afterward, which is output-size-bound, not verification-bound."""
    keyed = df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("_h"),
    )
    reps = keyed.groupBy("_h").agg(F.min(id_col).alias("_rep"))
    members = keyed.join(reps, "_h").select("_rep", id_col)
    # r15 (guide §2.4 single evaluation): members is consumed by
    # rep_docs here plus FOUR more references in _expand_pairs (m1, m2
    # and both sides of the intra self-join), and Spark reuses
    # exchanges, not scans — uncheckpointed, the md5 digest + groupBy
    # + join chain re-ran once per reference (the x16 verify plan held
    # 24 parquet scans for a 200-doc input). Two longs per row, so the
    # barrier is cheap at any corpus size. Only the pair-emitting
    # pipelines call this helper; the production shapes (_band_buckets
    # tier) are unaffected.
    members = barrier(members)
    rep_docs = df.join(
        members.filter(F.col("_rep") == F.col(id_col)).select(id_col), id_col
    )
    return rep_docs, members


def _expand_pairs(
    rep_pairs: DataFrame, members: DataFrame, id_col: str, value_col: str,
    intra_value,
) -> DataFrame:
    """Re-expand verified representative pairs to all member pairs, and
    add intra-cluster pairs (identical texts) at ``intra_value``. The
    expansion reproduces EXACTLY what the uncollapsed pipeline would
    emit: identical texts have identical token/shingle sets, so every
    member pair's similarity equals its representative pair's."""
    # Evaluation barrier: without it Catalyst inlines the similarity
    # expression (array_intersect/union over full token arrays) through
    # the expansion joins and recomputes it once per EXPANDED row —
    # turning an output-bound fan-out into verification × fan-out
    # (measured 25× slower at 10x dup density). The aggregate forces
    # the value to materialize once per representative pair; pairs are
    # already distinct, so first() is an identity.
    rep_pairs = rep_pairs.groupBy("d1", "d2").agg(
        F.first(value_col).alias(value_col)
    )
    m1 = members.select(F.col("_rep").alias("d1"), F.col(id_col).alias("_m1"))
    m2 = members.select(F.col("_rep").alias("d2"), F.col(id_col).alias("_m2"))
    cross = (
        rep_pairs.join(m1, "d1")
        .join(m2, "d2")
        .select(
            F.least("_m1", "_m2").alias("d1"),
            F.greatest("_m1", "_m2").alias("d2"),
            value_col,
        )
    )
    x, y = members.alias("x"), members.alias("y")
    intra = (
        x.join(
            y,
            (F.col("x._rep") == F.col("y._rep"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("d1"),
            F.col(f"y.{id_col}").alias("d2"),
            F.lit(intra_value).alias(value_col),
        )
    )
    return cross.unionByName(intra)


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: exact-dup collapse → minhash → LSH
    candidates → exact-Jaccard verify (on distinct texts only) →
    membership re-expansion → pairs with jaccard >= threshold."""
    rep_docs, members = _collapse_exact(df, id_col, text_col)
    sig = minhash_signatures(rep_docs, id_col, text_col, k)
    cands = lsh_candidate_pairs(sig, id_col, bands)
    rep_pairs = exact_jaccard(rep_docs, cands, id_col, text_col).filter(
        F.col("jaccard") >= threshold
    )
    return _expand_pairs(rep_pairs, members, id_col, "jaccard", 1.0)


def _pack_bits64(col_prefix: str) -> Column:
    """Pack 64 signed bit-sum columns (``{prefix}0``..``{prefix}63``)
    into one BIGINT fingerprint: bit b set iff the sum is positive."""
    return reduce(
        lambda acc, b: acc
        + F.when(
            F.col(f"{col_prefix}{b}") > 0,
            F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
        range(64),
        F.lit(0).cast("long"),
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: per-token 64-bit hash, signed
    bit-majority per position. One explode + 64 conditional sums, all
    JVM-side."""
    toks = df.select(id_col, F.explode(tokens_col(text_col)).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    return agg.select(id_col, _pack_bits64("b").alias("simhash"))


def md5_bit(mh: Column, j: int) -> Column:
    """Bit ``j`` (0..63, MSB-first) of the 64-bit value spelled by the
    first 16 hex chars of an md5 digest string. Pure hex-digit
    arithmetic, so any ANSI engine reproduces it — the portable
    token-hash used when results must be verifiable outside Spark."""
    v = F.conv(F.substring(mh, 1 + j // 4, 1), 16, 10).cast("int")
    return F.shiftright(v, 3 - (j % 4)).bitwiseAND(F.lit(1))


def simhash_md5(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash with an md5-derived token hash instead of xxhash64.

    Same algorithm and plan shape as :func:`simhash` (one explode, 64
    conditional sums, JVM-side), but the per-token 64-bit hash comes
    from the md5 hex digest so an independent SQL engine can compute
    the identical fingerprint for verification. ~4 extra substring ops
    per (token, bit); use :func:`simhash` when cross-engine parity
    isn't needed."""
    toks = (
        df.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
        .withColumn("mh", F.md5(F.col("tok").cast("binary")))
    )
    bit_sums = [
        F.sum(F.when(md5_bit(F.col("mh"), j) == 1, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    return agg.select(id_col, _pack_bits64("b").alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dups by SimHash: band the 64-bit fingerprint into
    ``64/bands``-bit chunks (pigeonhole: any pair within hamming ≤
    bands-1 shares an exact chunk — pick ``bands > max_hamming`` for
    guaranteed recall), then verify with full hamming distance.
    ``hash_fn='md5'`` selects the portable token hash
    (:func:`simhash_md5`) so results are replayable by any SQL engine."""
    if max_hamming >= bands:
        # the pigeonhole guarantee (any pair within hamming <= bands-1
        # shares an exact chunk) is the function's recall contract; a
        # wider hamming bound than bands-1 would silently miss
        # qualifying pairs whose differing bits spread across bands
        raise ValueError(
            f"recall guarantee requires bands > max_hamming "
            f"(got bands={bands}, max_hamming={max_hamming}); "
            f"raise bands or lower max_hamming"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    rep_docs, members = _collapse_exact(df, id_col, text_col)
    fps = (simhash_md5 if hash_fn == "md5" else simhash)(rep_docs, id_col, text_col)
    chunk = lambda b: F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask))  # noqa: E731
    banded = fps.select(
        id_col,
        "simhash",
        F.posexplode(F.array(*[chunk(b) for b in range(bands)])).alias("band", "key"),
    )
    # same AQE-explosion trap as lsh_candidate_pairs (r15, guide §2.5):
    # the banded fingerprints are tiny, so AQE coalesces the join's
    # exchange to 1-2 partitions while the bucket join's OUTPUT is the
    # quadratic pair set; explicit-N repartition is exempt from
    # coalescing and tracks the session's core count
    dp = df.sparkSession.sparkContext.defaultParallelism
    # r15 (guide §2.4 single evaluation): the self-join consumes the
    # banded relation on both sides, and without a barrier the whole
    # simhash-signature chain (explode + 64 bit-sums + band explode)
    # evaluated once per side — the plan held the full chain twice with
    # no ReusedExchange. Four longs per row, so the barrier is cheap.
    # Checkpoint BELOW the repartition pin (see lsh_candidate_pairs):
    # checkpointed RDDs report UnknownPartitioning, so the pin must sit
    # above to survive as the join's AQE-exempt exchange.
    banded = barrier(banded).repartition(dp, "band", "key")
    a, b = banded.alias("a"), banded.alias("b")
    # r15 (guide §2.3/§2.4): a pair within hamming <= max shares one
    # chunk per *unmatching-free* band — it met in EVERY band whose
    # chunks agree (up to `bands` join rows per pair, crunched by a
    # 16M-row distinct at sf0.1). Keeping only the FIRST matching band
    # (no earlier band b' < band has equal chunks — both fingerprints
    # are in scope, so the predicate is a cheap codegen conjunction)
    # emits each pair exactly once and the distinct disappears.
    chunk_of = lambda col, b: F.shiftright(col, b * width).bitwiseAND(F.lit(mask))  # noqa: E731
    first_match = reduce(
        lambda acc, j: acc
        & (
            (F.col("a.band") <= j)
            | (chunk_of(F.col("a.simhash"), j) != chunk_of(F.col("b.simhash"), j))
        ),
        range(bands - 1),
        F.lit(True),
    )
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & first_match,
        )
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
    )
    rep_pairs = cands.filter(F.col("hamming") <= max_hamming)
    # identical texts → identical fingerprints → hamming 0
    return _expand_pairs(rep_pairs, members, id_col, "hamming", 0)


def ngram_shingles(text_col: str, n: int = 5) -> Column:
    """Character n-gram shingle set (for Jaccard on short/noisy text).

    Built as a zip_with chain over slices of the char array rather than
    substr-per-index: a lambda referencing the normalized-text
    EXPRESSION re-runs the whole normalize chain once per shingle
    (O(chars^2) per doc); the chain evaluates it a constant ~n+3 times
    per row. Strings shorter than ``n`` yield their whole self (the
    trailing zip_with pads are null → coalesced empty), matching the
    substr semantics, and the empty string yields [""] explicitly
    (split of "" is [] while substr gave [""])."""
    s = normalize_text(F.col(text_col))
    chars = F.split(s, "")
    width = F.greatest(F.length(s) - n + 1, F.lit(1))
    acc = F.slice(chars, F.lit(1), width)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(chars, F.lit(j + 1), width),
            lambda a, b: F.concat(a, F.coalesce(b, F.lit(""))),
        )
    return F.array_distinct(
        F.when(F.length(s) == 0, F.array(F.lit(""))).otherwise(acc)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup on character n-grams: same minhash/LSH machinery with
    shingles instead of word tokens (and the same exact-dup collapse in
    front — identical normalized texts have identical shingle sets)."""
    rep_docs, members = _collapse_exact(df, id_col, text_col)
    sig = minhash_signatures(
        rep_docs, id_col, text_col, k, tokens=ngram_shingles(text_col, n)
    )
    cands = lsh_candidate_pairs(sig, id_col, bands)
    rep_pairs = exact_jaccard(
        rep_docs, cands, id_col, text_col, tokens=ngram_shingles(text_col, n)
    ).filter(F.col("jaccard") >= threshold)
    return _expand_pairs(rep_pairs, members, id_col, "jaccard", 1.0)


def _band_buckets(
    df: DataFrame, id_col: str, text_col: str, k: int, bands: int
) -> tuple[DataFrame, DataFrame]:
    """Shared md5-rotation minhash → LSH band-bucket construction for
    the production dedup shapes (:func:`minhash_dedup_keep`,
    :func:`neardup_clusters`): one digest per token, component i =
    lexicographic min over the 2i-hex-char cyclic rotation of
    md5(token) (k ≤ 16 — the rotation family yields at most 16
    components), band hash = md5 of the '|'-joined component slice.

    Returns ``(banded, bucket_min)``: ``banded`` = one (id, band, bh)
    row per document per band (O(n·bands) rows); ``bucket_min`` = the
    minimum member id per (band, bh) bucket. A single definition keeps
    the Spark side and the SQL-fragment oracles
    (``suite/_ann_oracles._minhash_band_sql``) from drifting apart.
    """
    r = k // bands
    assert bands * r == k, "bands must divide k"
    assert k <= 16, "rotation family yields at most 16 components"
    toks = df.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    mh = F.md5(F.col("tok").cast("binary"))
    comps = [
        F.min(
            F.concat(F.substring(mh, 2 * i + 1, 32 - 2 * i), F.substring(mh, 1, 2 * i))
        ).alias(f"c{i}")
        for i in range(k)
    ]
    sig = toks.groupBy(id_col).agg(*comps)
    band_hashes = [
        F.md5(
            F.concat_ws("|", *[F.col(f"c{b * r + j}") for j in range(r)]).cast("binary")
        )
        for b in range(bands)
    ]
    banded = sig.select(
        id_col, F.posexplode(F.array(*band_hashes)).alias("band", "bh")
    )
    # r15 (guide §2.4): banded feeds both the bucket join and
    # bucket_min, and self-join attribute dedup rewrites one side's
    # expression ids, so ReuseExchange never fires — without the
    # checkpoint every caller (minhash_dedup_keep, neardup_clusters)
    # ran the signature aggregation — the pipeline's dominant stage —
    # TWICE. One evaluation; O(n·bands) rows of (id, band, 32-hex bh)
    # on executors. Values are identical: the md5-rotation chain is
    # deterministic.
    banded = barrier(banded)
    bucket_min = banded.groupBy("band", "bh").agg(F.min(id_col).alias("_bmin"))
    return banded, bucket_min


def minhash_dedup_keep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Near-dup dedup as a KEEP/DROP action — the production shape at
    100 TB.

    The pair-emitting pipelines above (:func:`minhash_neardup_pairs`
    et al.) are verification/oracle shapes: on a dup-dense corpus the
    *answer itself* is quadratic (the sf0.1 fixture has 8.9M pairs at
    J >= 0.5 from 5000 docs), so no candidate pruning can make them
    scale. Production dedup instead emits one decision per document
    (cf. "Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022 — their suffix/minhash dedup keeps one member per
    duplicate cluster): a document is DROPPED iff any LSH band bucket
    contains a lower-id document. Cost is O(n * bands) rows end to
    end — signature agg, bucket-min agg, bucket join, per-doc min —
    never materializing pairs.

    Hashes are md5 hex digests compared lexicographically (a valid
    uniform order), so any SQL engine replays the exact decision —
    same portability trick as :func:`simhash_md5`. The k components
    come from ONE digest per token via cyclic 2-hex-char rotations
    (component i orders tokens by digest chars 2i, 2i+1, ... — leading
    characters of distinct rotations are independent digits of a
    uniform digest), not k independent md5 evaluations: measured 1.6x
    cheaper in the signature aggregation, the pipeline's dominant
    stage, trading perfect inter-component independence for per-token
    cost the way one-permutation hashing does (Li et al., NIPS 2012).
    Requires k <= 16.

    Note the keep-set is a deterministic greedy independent-set style
    rule, not transitive-closure clustering: of three chained near-dups
    1-2-3 with 1,3 not sharing a bucket, doc 3 survives only if no
    bucket links it to 1 or 2. Connected-components clustering is a
    different (iterative) operator; this one is the single-pass rule
    large pipelines actually run.
    """
    banded, bucket_min = _band_buckets(df, id_col, text_col, k, bands)
    doc_min = (
        banded.join(bucket_min, ["band", "bh"])
        .groupBy(id_col)
        .agg(F.min("_bmin").alias("_dmin"))
    )
    return doc_min.filter(F.col(id_col) == F.col("_dmin")).select(id_col)


def neardup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Duplicate-cluster formation: connected components over the LSH
    band-bucket graph, as ``(id, cluster)`` with cluster = the minimum
    member id.

    Where :func:`minhash_dedup_keep` makes a greedy single-pass
    decision, this computes the transitive closure: documents A-B and
    B-C sharing buckets put A, B, C in ONE cluster even if A and C
    never collide. The edge set is bucket-local stars (every member ->
    its bucket's min id), so edges are O(n * bands) — never a within-
    bucket quadratic expansion — and component diameter stays small,
    which bounds the iteration count.

    Iteration is driver-paced min-label propagation (the standard
    distributed CC loop; cf. Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): each round makes ONE join of
    current labels against the symmetrized edge list (both directions
    in one pass — r15; the former per-direction joins shuffled the
    label set twice per round) and keeps the per-node min; the old
    label rides the same aggregation, so convergence is a filter+count
    over the just-materialized round, not an extra join. Only
    non-isolated vertices travel through the loop — isolated ones are
    their own cluster by construction and are attached with one final
    left join. Each round is a shuffle-bounded join+agg, so the loop
    is cluster-safe; the driver holds only the changed-row count.

    Same md5-rotation minhash family as :func:`minhash_dedup_keep`
    (shared :func:`_band_buckets` construction), so an external SQL
    engine (recursive CTE) replays the exact clusters.

    Lineage truncation each round is ``localCheckpoint`` by default:
    fast (executor block store, no extra I/O), but the truncated
    lineage is UNRECOVERABLE if an executor holding the blocks dies —
    on a large cluster a mid-loop executor loss fails the whole job.
    Pass ``checkpoint_dir`` (an HDFS/S3/shared path all executors can
    reach) to opt into RELIABLE checkpoints instead: each round's
    labels land in fault-tolerant storage, so the loop survives
    executor loss at the cost of one write+read of the label set
    (2 longs/row) per round. Checkpoint files under the dir are owned
    by the caller (Spark only auto-cleans them with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``); the
    returned DataFrame reads from the LAST checkpoint, so delete the
    dir only after materializing the result.

    ``checkpoint_dir`` is applied via ``SparkContext.setCheckpointDir``,
    which is SESSION-GLOBAL state: while the loop runs, any concurrent
    ``.checkpoint()`` elsewhere in the session writes under this dir.
    The previous checkpoint dir is captured before the loop and
    restored afterwards (even on failure) — but if no dir was set
    before, Spark has no unset API, so this call's dir remains the
    session default. Concurrent ``neardup_clusters`` calls in one
    session must therefore share a single ``checkpoint_dir`` (the
    last setter wins for BOTH loops otherwise).

    Raises ``RuntimeError`` if min-label propagation has not converged
    after ``max_iters`` rounds — partial labels would silently diverge
    from true connected components (and from the recursive-CTE
    oracle), so non-convergence is loud, never returned. Bucket-star
    edges keep component diameter ≈ 2·(chain length in bucket-min
    hops); 25 rounds covers any realistic corpus, and a pathological
    chain is a reason to raise ``max_iters``, not to trust a prefix of
    the fixpoint.
    """
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    banded, bucket_min = _band_buckets(df, id_col, text_col, k, bands)
    edges = (
        banded.join(bucket_min, ["band", "bh"])
        .filter(F.col(id_col) != F.col("_bmin"))
        .select(F.col(id_col).alias("_a"), F.col("_bmin").alias("_b"))
        .distinct()
    )
    # Checkpoint (not persist) on every round: persist caches the
    # DATA but the logical plan still nests one level per iteration, and
    # Catalyst re-analysis of the growing tree dominates within a few
    # rounds (measured 1.3s -> 43.6s per round by iteration 4).
    # Checkpointing truncates the lineage so every round re-plans a
    # two-join query, not the whole history. localCheckpoint keeps the
    # blocks on executors (fast, fragile); checkpoint_dir opts into
    # reliable storage (survives executor loss — see docstring).
    sc = df.sparkSession.sparkContext
    prev_checkpoint_dir = (
        sc.getCheckpointDir() if checkpoint_dir is not None else None
    )
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)

    def _truncate(d: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            # honors the session durability knob (s2spark.checkpoint.mode)
            return barrier(d)
        return d.checkpoint(eager=True)

    try:
        # r15 loop re-plan (guide §2.4: remove shuffles outright; §1.2:
        # fix the distributed algorithm first). Three changes, same
        # fixpoint:
        #
        # 1. SYMMETRIC edge list, built once: the old loop ran TWO
        #    joins per round (labels against _a, labels against _b),
        #    shuffling the label set twice per round with no exchange
        #    reuse (different keys). Candidates in both directions are
        #    one join of labels against edges ∪ swap(edges).
        # 2. The loop runs only over NON-ISOLATED vertices (those
        #    appearing in some edge). An isolated vertex receives no
        #    candidate ever, so its label is its own id by
        #    construction — attach those back with one final
        #    left join + coalesce instead of dragging every corpus row
        #    through every round's union+groupBy+checkpoint.
        # 3. The convergence check rides the label aggregation: each
        #    round's groupBy carries the vertex's OLD label alongside
        #    the new min (min ignores the candidates' null _old; each
        #    vertex has exactly one base row), so `changed` is a
        #    filter+count over the just-materialized checkpoint blocks
        #    — the old per-round labels⋈new_labels join is gone.
        edges = _truncate(edges)
        edges_sym = _truncate(
            edges.unionByName(
                edges.select(
                    F.col("_b").alias("_a"), F.col("_a").alias("_b")
                )
            )
        )
        labels = _truncate(
            edges_sym.select(F.col("_a").alias("_v"))
            .distinct()
            .select("_v", F.col("_v").alias("_lbl"))
        )
        changed = 0
        for _ in range(max_iters):
            cand = edges_sym.join(labels, edges_sym["_a"] == labels["_v"]).select(
                F.col("_b").alias("_v"), "_lbl",
                F.lit(None).cast("long").alias("_old"),
            )
            new_labels = (
                labels.select("_v", "_lbl", F.col("_lbl").alias("_old"))
                .unionByName(cand)
                .groupBy("_v")
                .agg(F.min("_lbl").alias("_lbl"), F.min("_old").alias("_old"))
            )
            new_labels = _truncate(new_labels)
            changed = new_labels.filter(F.col("_lbl") != F.col("_old")).count()
            labels = new_labels.select("_v", "_lbl")
            if changed == 0:
                break
    finally:
        # restore session-global checkpoint-dir state (no unset API,
        # so a previously-unset dir stays set — see docstring)
        if checkpoint_dir is not None and prev_checkpoint_dir is not None:
            sc.setCheckpointDir(prev_checkpoint_dir)
    if changed != 0:
        raise RuntimeError(
            f"neardup_clusters: min-label propagation did not converge in "
            f"{max_iters} rounds ({changed} labels still changing) — raise "
            f"max_iters; partial labels are not connected components"
        )
    # isolated vertices (no band-bucket edge) are their own cluster
    labels = (
        df.select(F.col(id_col).alias("_v"))
        .join(labels, "_v", "left")
        .select("_v", F.coalesce("_lbl", F.col("_v")).alias("_lbl"))
    )
    return labels.select(
        F.col("_v").alias(id_col), F.col("_lbl").alias("cluster")
    )
