"""North-star extension operators (SURVEY.md §2.B Q-X*) — the
LLM-training-data-pipeline surface over ``documents`` / ``embeddings``:
exact dedup, near-dup candidates, text analysis (tokens, top terms,
language-ID, quality score, fingerprint), and cosine similarity top-k.

Everything here is built-in-function Spark (JVM-side, codegen). The
heavier variants (MinHash LSH banding, SimHash, IVF ANN, multimodal
binary columns) live in ``s2_spark.functions.*`` with engine-side tests
and rows-only driver checks.

Scale notes: exact dedup groups on a hash of the text, not the text
itself — at 100 TB the shuffle moves 16-byte digests, not documents.
Near-dup candidate generation is token-bucket join (the LSH band-join
shape), never an O(n²) cross join. The cosine top-k broadcast-joins a
1-row query vector and TakeOrdered's the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from s2_spark.checkpoint import barrier
from s2_spark.registry import query
from s2_spark.suite._util import r4
from s2_spark.tables import t

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def _tokens(col):
    return F.split(F.lower(col), " ")


@query(
    "x1_exact_dup_groups",
    oracle=(
        "SELECT count(*) AS dups FROM "
        "(SELECT md5(text) AS h, count(*) c FROM documents GROUP BY 1 HAVING count(*) > 1)"
    ),
    doc="exact dedup: duplicate-group count via hash-groupBy (digests shuffle, not documents)",
)
def x1(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("dups"))
    )


@query(
    "x1b_distinct_docs",
    oracle="SELECT count(DISTINCT md5(text)) AS n FROM documents",
    doc="exact dedup: surviving-document count",
)
def x1b(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.agg(
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n")
    )


@query(
    "x2_token_counts",
    oracle=(
        "SELECT doc_id, CAST(length(string_split(lower(text), ' ')) AS BIGINT) AS ntok "
        "FROM documents ORDER BY doc_id"
    ),
    doc="text analysis: whitespace token counting",
)
def x2(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("ntok"))
        .orderBy("doc_id")
    )


@query(
    "x3_top_terms",
    oracle=(
        "SELECT tok, count(*) AS c FROM "
        "(SELECT unnest(string_split(lower(text),' ')) AS tok FROM documents) "
        "WHERE length(tok) >= 4 GROUP BY 1 ORDER BY c DESC, tok LIMIT 20"
    ),
    doc="text analysis: corpus top terms (explode + agg + top-k)",
)
def x3(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .filter(F.length("tok") >= 4)
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(20)
    )


@query(
    "x4_cosine_topk",
    oracle=(
        "SELECT vec_id, round(list_cosine_similarity("
        "CAST(embedding AS DOUBLE[]), "
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id=0)),4) AS sim "
        "FROM embeddings WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 10"
    ),
    doc=(
        "similarity search: brute-force cosine top-k vs query vector (vec_id=0). "
        "Query vector is a broadcast 1-row join; top-k = TakeOrderedAndProject. "
        "Scale path: IVF/LSH bucketing in s2_spark.functions.similarity."
    ),
)
def x4(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    dot = F.aggregate(
        F.zip_with(dbl(F.col("embedding")), dbl(F.col("qe")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(dbl(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            r4(dot / (norm(F.col("embedding")) * norm(F.col("qe")))).alias("sim"),
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


@query(
    "x5_neardup_candidates",
    oracle=(
        "SELECT count(*) AS pairs FROM (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 "
        "FROM (SELECT doc_id, unnest(list_sort(list_distinct(string_split(lower(text),' ')))[1:3]) AS tok FROM documents) a "
        "JOIN (SELECT doc_id, unnest(list_sort(list_distinct(string_split(lower(text),' ')))[1:3]) AS tok FROM documents) b "
        "ON a.tok = b.tok AND a.doc_id < b.doc_id)"
    ),
    doc=(
        "near-dup candidate pairs via smallest-token buckets — the LSH band-join "
        "shape (bucket-join, no cross join); full MinHashLSH in functions.dedup"
    ),
)
def x5(spark, sf_dir):
    # r15 re-plan (guide §1.2 "the distributed algorithm", §2.3
    # "shuffle keys instead of payloads"): the former bucket self-join
    # materialized the DISTINCT pair set before counting — 11.54M pairs
    # at sf0.1, concentrated in three hot-token buckets of ~3,800 docs
    # each (C(3.8k,2) ≈ 7.3M pairs PER bucket, unsplittable key skew —
    # AQE skew-join can't split a single key, guide §2.5), measured
    # 9.6 s warm. The count never needs the pairs: each doc carries at
    # most 3 bucket tokens, so by inclusion-exclusion over the shared
    # token SUBSETS,
    #
    #   |{(d1<d2) sharing >= 1 token}|
    #     = Σ_S (-1)^(|S|+1) · C(n_S, 2),   S a nonempty token subset,
    #
    # where n_S = #docs whose smallest-3 set contains S: a pair whose
    # shared-token set is exactly T (|T| in 1..3) is counted
    # Σ_{∅≠S⊆T} (-1)^(|S|+1) = 1 time; disjoint pairs 0 times. Each
    # doc emits its ≤7 subsets (tokens are array_distinct'ed and
    # array_sort'ed, so subset keys are canonical; ' ' joins them —
    # tokens are split ON ' ' and cannot contain it), and the whole
    # query is one O(n·7) explode + one groupBy on subset digests —
    # no pair materialization, no skew-bound bucket. Same answer,
    # proven vs the oracle at sf0.01 and sf0.1 (11,539,502 pairs).
    d = t(spark, sf_dir, "documents")
    arr = F.slice(F.array_sort(F.array_distinct(_tokens(F.col("text")))), 1, 3)
    e1, e2, e3 = (F.element_at(arr, i) for i in (1, 2, 3))
    # null-propagating concat: a subset key exists only when every
    # member token exists (docs with <3 distinct tokens emit fewer)
    subsets = F.array(
        F.struct(e1.alias("key"), F.lit(1).alias("sign")),
        F.struct(e2.alias("key"), F.lit(1).alias("sign")),
        F.struct(e3.alias("key"), F.lit(1).alias("sign")),
        F.struct(F.concat(e1, F.lit(" "), e2).alias("key"), F.lit(-1).alias("sign")),
        F.struct(F.concat(e1, F.lit(" "), e3).alias("key"), F.lit(-1).alias("sign")),
        F.struct(F.concat(e2, F.lit(" "), e3).alias("key"), F.lit(-1).alias("sign")),
        F.struct(
            F.concat(e1, F.lit(" "), e2, F.lit(" "), e3).alias("key"),
            F.lit(1).alias("sign"),
        ),
    )
    sub = d.select(
        F.explode(F.filter(subsets, lambda s: s["key"].isNotNull())).alias("s")
    ).select(F.col("s.key").alias("key"), F.col("s.sign").alias("sign"))
    per_subset = sub.groupBy("key").agg(
        F.count("*").alias("n"), F.first("sign").alias("sign")
    )
    # integer-exact C(n,2): n*(n-1) is always even, DIV keeps it long
    pairs = F.sum(F.col("sign").cast("long") * F.expr("(n * (n - 1)) DIV 2"))
    return per_subset.agg(F.coalesce(pairs, F.lit(0).cast("long")).alias("pairs"))


@query(
    "x6_lang_id",
    oracle=(
        "SELECT doc_id, CASE WHEN stop_ratio >= 0.1 THEN 'en' ELSE 'unk' END AS pred_lang, "
        "round(stop_ratio, 4) AS stop_ratio FROM ("
        "SELECT doc_id, CAST(length(list_filter(string_split(lower(text),' '), "
        "x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) "
        "/ length(string_split(lower(text),' ')) AS stop_ratio FROM documents) "
        "ORDER BY doc_id"
    ),
    doc="text analysis: stopword-ratio language-ID heuristic (n-gram heuristic family)",
)
def x6(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    ratio = stop.cast("double") / F.size(toks)
    return (
        d.select(
            "doc_id",
            F.when(ratio >= 0.1, "en").otherwise("unk").alias("pred_lang"),
            r4(ratio).alias("stop_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "x7_quality_score",
    oracle=(
        "SELECT doc_id, round("
        "least(1.0, length(string_split(lower(text),' ')) / 100.0) * 0.5 + "
        "(CAST(length(list_filter(string_split(lower(text),' '), "
        "x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) "
        "/ length(string_split(lower(text),' '))) * 0.5, 4) AS quality "
        "FROM documents ORDER BY doc_id"
    ),
    doc="text analysis: quality score = 0.5·min(1, ntok/100) + 0.5·stopword-ratio",
)
def x7(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    ntok = F.size(toks).cast("double")
    stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
    score = F.least(F.lit(1.0), ntok / 100.0) * 0.5 + (stop / ntok) * 0.5
    return d.select("doc_id", r4(score).alias("quality")).orderBy("doc_id")


from s2_spark.suite._ann_oracles import (  # noqa: E402
    ann_recall_oracle,
    pipeline_summary_oracle,
    fingerprint_oracle,
    ivf_topk_oracle,
    lsh_topk_oracle,
    minhash_keep_oracle,
    neardup_clusters_oracle,
    minhash_oracle,
    ivf_planted_recall_oracle,
    planted_deltas,
    planted_recall_oracle,
    simhash_oracle,
)


@query(
    "x9_minhash_neardup",
    oracle=minhash_oracle(threshold=0.5),
    doc=(
        "MinHash(32) → LSH band-join candidates → exact-Jaccard verify ≥ 0.5. "
        "Registered with r=1 banding (32 bands of one signature row) so the "
        "per-pair miss probability at s ≥ 0.5 is ≤ 2^-32 and the output "
        "provably equals the oracle's brute-force Jaccard pair set; at scale "
        "users dial (k, bands) — e.g. 8 bands of 4 — for fewer candidates."
    ),
)
def x9(spark, sf_dir):
    from s2_spark.functions.dedup import minhash_neardup_pairs

    d = t(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(d, k=32, bands=32, threshold=0.5)
    return pairs.select("d1", "d2", r4(F.col("jaccard")).alias("jaccard")).orderBy("d1", "d2")


@query(
    "x10_simhash_neardup",
    oracle=simhash_oracle(max_hamming=7),
    doc=(
        "SimHash64 near-dup pairs, md5-derived token hash (portable — the "
        "oracle recomputes identical fingerprints), 8 bands of 8 bits, "
        "hamming ≤ 7 verify. Pigeonhole: 8 bands guarantee recall 1 at "
        "radius 7, so banded == brute force by construction."
    ),
)
def x10(spark, sf_dir):
    from s2_spark.functions.dedup import simhash_neardup_pairs

    d = t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(d, max_hamming=7, bands=8, hash_fn="md5").orderBy("d1", "d2")


@query(
    "x11_embedding_neardup",
    oracle=(
        "SELECT a.vec_id AS d1, b.vec_id AS d2, "
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), 4) AS sim "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "AND a.vec_id < 500 AND b.vec_id < 500 "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) >= 0.45 ORDER BY d1, d2"
    ),
    doc=(
        "embedding-cosine near-dup pairs (exact mode for the oracle; the "
        "hyperplane-bucketed scale path is tested engine-side)"
    ),
)
def x11(spark, sf_dir):
    from s2_spark.functions.similarity import embedding_neardup_pairs
    from s2_spark.suite._util import r4

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    pairs = embedding_neardup_pairs(emb, threshold=0.45, exact=True)
    return pairs.select("d1", "d2", r4(F.col("sim")).alias("sim")).orderBy("d1", "d2")


@query(
    "x12_bpe_token_count",
    oracle=(
        "SELECT doc_id, CAST(length(regexp_extract_all(lower(text), "
        "'[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS ntok "
        "FROM documents ORDER BY doc_id"
    ),
    doc="BPE-ish regex pre-tokenization count (word pieces / numbers / punct)",
)
def x12(spark, sf_dir):
    from s2_spark.functions.text import token_count

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text", "bpe").alias("ntok")).orderBy("doc_id")


@query(
    "x13_lsh_ann_topk",
    oracle=lsh_topk_oracle(k=10, query_id=0, m=8, dim=64, seed=42),
    doc=(
        "ANN top-10 via random-hyperplane LSH (m=8, multiprobe 1) for query "
        "vec_id=0. The oracle replays the whole pipeline — hyperplane "
        "literals → sign buckets → probe set → exact cosine rerank — so the "
        "driver verifies the approximate algorithm itself, not a recall bound."
    ),
)
def x13(spark, sf_dir):
    from s2_spark.functions.similarity import lsh_topk
    from s2_spark.suite._util import r4

    emb = t(spark, sf_dir, "embeddings")
    out = lsh_topk(emb, k=10, query_id=0, m=8, multiprobe=1)
    return out.select("vec_id", r4(F.col("sim")).alias("sim"))


@query(
    "x14_ivf_ann_topk",
    oracle=ivf_topk_oracle(k=10, query_id=0, n_cells=16, dim=64, seed=7, nprobe=4),
    doc=(
        "ANN top-10 via IVF (16 fixed deterministic centroids, nprobe 4) for "
        "query vec_id=0; the oracle replays assignment, probe ranking, and "
        "rerank from the same centroid literals. The KMeans-trained variant "
        "(ivf_train_assign) is the quality path, tested engine-side."
    ),
)
def x14(spark, sf_dir):
    from s2_spark.functions.similarity import ivf_assign_fixed, ivf_fixed_centroids, ivf_topk
    from s2_spark.suite._util import r4

    emb = t(spark, sf_dir, "embeddings")
    cents = ivf_fixed_centroids(n_cells=16, dim=64, seed=7)
    assigned = ivf_assign_fixed(emb, cents)
    out = ivf_topk(assigned, cents, k=10, query_id=0, nprobe=4)
    return out.select("vec_id", r4(F.col("sim")).alias("sim"))


@query(
    "x15_doc_rolling_fingerprint",
    oracle=fingerprint_oracle(),
    doc=(
        "order-sensitive rolling-hash fingerprint per document: "
        "acc = (acc·31 + md5_56(token)) mod 1e9+7 — portable hash chain the "
        "oracle reproduces bit-for-bit; the xxhash64 chain (text.fingerprint) "
        "is the fast engine-side variant"
    ),
)
def x15(spark, sf_dir):
    from s2_spark.functions.text import fingerprint_portable

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_portable("text").alias("fp")).orderBy("doc_id")


@query(
    "x16_ngram_jaccard_neardup",
    oracle=(
        "WITH sh AS (SELECT doc_id, list_distinct(list_transform("
        "range(1, greatest(length(s)-4,1)+1), i -> substr(s, i::INTEGER, 5))) AS tk "
        "FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s "
        "FROM documents WHERE doc_id < 200)) "
        "SELECT a.doc_id AS d1, b.doc_id AS d2, "
        "round(len(list_intersect(a.tk, b.tk))::DOUBLE / "
        "len(list_distinct(list_concat(a.tk, b.tk))), 4) AS jaccard "
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
        "WHERE len(list_intersect(a.tk, b.tk))::DOUBLE / "
        "len(list_distinct(list_concat(a.tk, b.tk))) >= 0.4 ORDER BY d1, d2"
    ),
    doc=(
        "near-dup on character 5-gram shingles: minhash(32) → r=1 LSH banding "
        "(miss probability ≤ 0.6^32 at s ≥ 0.4) → exact shingle-Jaccard "
        "verify; oracle is the brute-force shingle-Jaccard pair set"
    ),
)
def x16(spark, sf_dir):
    from s2_spark.functions.dedup import ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(d, n=5, k=32, bands=32, threshold=0.4)
    return pairs.select("d1", "d2", r4(F.col("jaccard")).alias("jaccard")).orderBy("d1", "d2")


def _media_from_documents(spark, sf_dir):
    """Deterministic media table derived from documents: payload =
    utf-8 text bytes, kind by doc_id mod 3, duration from text length —
    both engines can re-derive it, so the multimodal plumbing becomes
    driver-checkable."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        ((F.length("text") % 5 + 1) * 1000).cast("long").alias("duration_ms"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


@query(
    "x17_media_features",
    oracle=(
        "WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents), "
        "f AS (SELECT media_id, i, "
        "CAST(((strpos('0123456789abcdef', substr(hx, (2*i+1)::INTEGER, 1)) - 1) * 16 + "
        "strpos('0123456789abcdef', substr(hx, (2*i+2)::INTEGER, 1)) - 1) / 255.0 "
        "AS REAL) AS v "  # float32 like Spark's array<float>, then widened
        "FROM h, (SELECT unnest(range(8)) AS i)) "
        "SELECT media_id, CAST(i AS INTEGER) AS dim, round(v::DOUBLE, 4) AS val "
        "FROM f ORDER BY media_id, dim"
    ),
    doc=(
        "multimodal feature extraction end-to-end: opaque binary payload → "
        "mapInPandas (Arrow batches, executor-side decode) → array<float> "
        "features, exploded for hashing. The decode is the documented "
        "deterministic fake (sha256 bytes; codecs absent in-container) — "
        "which makes the whole distributed pipeline independently "
        "verifiable: the oracle recomputes identical features from hex"
    ),
)
def x17(spark, sf_dir):
    from s2_spark.functions.multimodal import extract_features

    media = _media_from_documents(spark, sf_dir)
    feats = extract_features(media, fake=True, dim=8)
    return (
        feats.select("media_id", F.posexplode("features").alias("dim", "v"))
        .select("media_id", "dim", r4(F.col("v").cast("double")).alias("val"))
        .orderBy("media_id", "dim")
    )


@query(
    "x18_video_frame_sample",
    oracle=(
        "WITH v AS (SELECT doc_id AS media_id, text, "
        "(length(text) % 5 + 1) * 1000 AS duration_ms "
        "FROM documents WHERE doc_id % 3 = 2), "
        "g AS (SELECT media_id, text, unnest(range(duration_ms // 1000)) AS frame_idx FROM v) "
        "SELECT media_id, frame_idx, frame_idx * 1000 AS frame_ts_ms, "
        "sha256(text || CAST(frame_idx AS VARCHAR)) AS frame_hex "
        "FROM g ORDER BY media_id, frame_idx"
    ),
    doc=(
        "video frame sampling plumbing: the frame grid fans out inside the "
        "executor-side decode loop (one payload copy per video in flight, "
        "never per frame); deterministic fake per-frame decode = "
        "sha256(payload ‖ ascii(idx)), recomputed by the oracle"
    ),
)
def x18(spark, sf_dir):
    import hashlib

    from s2_spark.functions.multimodal import frame_sample

    media = _media_from_documents(spark, sf_dir)
    dec = lambda payload, idx: hashlib.sha256(  # noqa: E731
        bytes(payload or b"") + str(idx).encode()
    ).hexdigest().encode()
    frames = frame_sample(media, every_ms=1000, decoder=dec)
    return (
        frames.select(
            "media_id",
            "frame_idx",
            "frame_ts_ms",
            F.col("frame").cast("string").alias("frame_hex"),
        )
        .orderBy("media_id", "frame_idx")
    )


@query(
    "x8_fingerprint",
    oracle=(
        "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp "
        "FROM documents ORDER BY doc_id"
    ),
    doc="document fingerprint: whitespace-normalized content hash",
)
def x8(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return (
        d.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
        .orderBy("doc_id")
    )


@query(
    "x19_pii_detect",
    oracle=(
        "SELECT doc_id, "
        "CAST(len(regexp_extract_all(pii_text, "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, "
        "CAST(len(regexp_extract_all(pii_text, '\\d{3}-\\d{4}')) AS BIGINT) AS n_phone "
        "FROM (SELECT doc_id, text "
        "|| CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) "
        "|| '@example.com now' ELSE '' END "
        "|| CASE WHEN doc_id % 5 = 0 THEN ' tel 555-0' "
        "|| lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0') ELSE '' END AS pii_text "
        "FROM documents) ORDER BY doc_id"
    ),
    doc=(
        "PII detection: regex counts of emails/phone patterns per doc — a "
        "pre-training scrub pass. The corpus is synthetic word soup, so "
        "deterministic contact strings are injected (doc_id mod rules) on "
        "BOTH engines, the suite's established synthesis pattern (f6, x17). "
        "JVM-side regexp_count: codegen, no shuffle, embarrassingly parallel "
        "at 100 TB."
    ),
)
def x19(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pii = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" tel 555-0"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 3, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return (
        d.select(
            "doc_id",
            F.regexp_count(
                pii, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
            ).cast("long").alias("n_email"),
            F.regexp_count(pii, F.lit(r"\d{3}-\d{4}")).cast("long").alias("n_phone"),
        )
        .orderBy("doc_id")
    )


@query(
    "x20_benchmark_contamination",
    oracle=(
        "WITH grams AS (SELECT doc_id, "
        "unnest([md5(array_to_string(w[i:i+2], ' ')) "
        "FOR i IN generate_series(1, greatest(len(w)-2, 0))]) AS g "
        "FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)), "
        "bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0) "
        "SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_overlap "
        "FROM grams c JOIN bench b USING (g) WHERE c.doc_id % 97 <> 0 "
        "GROUP BY c.doc_id ORDER BY c.doc_id"
    ),
    doc=(
        "benchmark contamination check: word-3-gram overlap between each "
        "candidate document and a held-out benchmark set (docs with "
        "doc_id %% 97 == 0) — the eval-leakage scan a training pipeline "
        "runs before release. Shingles hash to md5 digests; the benchmark "
        "side is tiny by construction, so the overlap join broadcasts it "
        "— no all-pairs comparison, scales to arbitrary corpus size."
    ),
)
def x20(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    # zip_with chain, one expression per doc — the slice-per-index
    # lambda re-splits the document per emitted gram (O(tokens^2))
    n3 = F.greatest(F.size(w) - 2, F.lit(0))
    g12 = F.zip_with(
        F.slice(w, F.lit(1), n3),
        F.slice(w, F.lit(2), n3),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    gram_arr = F.zip_with(
        g12,
        F.slice(w, F.lit(3), n3),
        lambda ab, c: F.md5(F.concat(ab, F.lit(" "), c).cast("binary")),
    )
    grams = d.select("doc_id", F.explode(gram_arr).alias("g"))
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_overlap"))
        .orderBy("doc_id")
    )


@query(
    "x21_normalize_fingerprint",
    oracle=(
        "SELECT doc_id, md5(trim(regexp_replace(regexp_replace("
        "lower(text || ' ' || upper(source) || '!!'), '[^a-z0-9 ]', '', 'g'), "
        "' +', ' ', 'g'))) AS fp FROM documents ORDER BY doc_id"
    ),
    doc=(
        "text normalization + canonical fingerprint: lowercase, strip "
        "non-alphanumerics, collapse runs of spaces, hash — the dedup "
        "canonicalization step. Mixed-case/punctuation noise is injected "
        "deterministically (both engines) since the corpus is already "
        "clean. Pure column expressions, codegen end-to-end."
    ),
)
def x21(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    noisy = F.concat(F.col("text"), F.lit(" "), F.upper(F.col("source")), F.lit("!!"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(noisy), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select("doc_id", F.md5(norm.cast("binary")).alias("fp")).orderBy("doc_id")


@query(
    "x22_dedup_prune",
    oracle=(
        "WITH b AS (SELECT doc_id, substr(md5(text), 1, 2) AS bucket FROM documents), "
        "k AS (SELECT bucket, min(doc_id) AS keep FROM b GROUP BY bucket) "
        "SELECT b.doc_id, b.bucket FROM b JOIN k USING (bucket) "
        "WHERE b.doc_id <> k.keep ORDER BY b.doc_id"
    ),
    doc=(
        "dedup pruning action: within each duplicate cluster keep the "
        "lowest doc_id and emit the dropped rows — the step that turns "
        "candidate groups into an actual filtered corpus. Cluster key here "
        "is a coarsened content hash (2 hex chars) so the tiny fixture "
        "actually forms clusters; in production the key is the full digest "
        "or an LSH band. One window over the bucket-partitioned shuffle; "
        "no join, no collect."
    ),
)
def x22(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        F.substring(F.md5(F.col("text").cast("binary")), 1, 2).alias("bucket"),
    )
    keep = F.min("doc_id").over(W.partitionBy("bucket"))
    return (
        b.withColumn("keep", keep)
        .filter(F.col("doc_id") != F.col("keep"))
        .select("doc_id", "bucket")
        .orderBy("doc_id")
    )


@query(
    "x23_stratified_sample",
    oracle=(
        "WITH b AS (SELECT doc_id, source, "
        "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 "
        "+ (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket, "
        "20 + (CAST(substr(source, 4) AS INTEGER) * 7) % 60 AS rate "
        "FROM documents) "
        "SELECT doc_id, source FROM b WHERE bucket % 100 < rate ORDER BY doc_id"
    ),
    doc=(
        "stratified sampling for training mixes: each source gets a "
        "deterministic keep-rate (here derived from the source id; in "
        "production a config table) and docs are admitted by md5-bucket "
        "— reproducible sampling with no RNG state, the standard "
        "hash-mod-rate mix-building step. Pure column expressions, no "
        "shuffle; the md5 bucket derivation is the suite's cross-engine "
        "hash convention (_ann_oracles.py)."
    ),
)
def x23(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
        "int"
    ) % 100
    rate = 20 + (F.substring(F.col("source"), 4, 10).cast("int") * 7) % 60
    return (
        d.select("doc_id", "source")
        .filter(bucket < rate)
        .orderBy("doc_id")
    )


@query(
    "x24_embedding_quantize",
    oracle=(
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), "
        "s AS (SELECT vec_id, e, CASE WHEN m = 0 THEN 1.0 ELSE m / 127 END AS sc "
        "FROM (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS m FROM v)), "
        "q AS (SELECT vec_id, e, sc, "
        "list_transform(e, x -> sign(x) * floor(abs(x) / sc + 0.5)) AS qv FROM s) "
        "SELECT vec_id, CAST(list_sum(qv) AS BIGINT) AS qsum, "
        "round(list_max([abs(e[i] - qv[i] * sc) FOR i IN generate_series(1, len(e))]), 4) "
        "AS qerr FROM q ORDER BY vec_id"
    ),
    doc=(
        "embedding int8 quantization: symmetric per-vector scale "
        "(absmax/127), explicit sign*floor(+0.5) rounding so both engines "
        "agree bit-for-bit, reporting the quantized checksum and max "
        "reconstruction error — the storage-compression step before ANN "
        "indexing at 100 TB. Elementwise array ops, embarrassingly "
        "parallel, no Python."
    ),
)
def x24(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(absmax == 0, F.lit(1.0)).otherwise(absmax / F.lit(127.0))
    # r15 (guide §1.2 per-task work): never reference `scale` INSIDE a
    # per-element lambda — higher-order functions are CodegenFallback,
    # so a row-level subtree captured by the lambda body re-evaluates
    # per element, turning this O(d) projection into O(d²) interpreted
    # work (measured 4.8 s warm; 0.6 s after). array_repeat evaluates
    # scale ONCE per row (argument position) and the lambdas see it as
    # a plain element — identical arithmetic, identical IEEE results.
    sc_arr = F.array_repeat(scale, F.size(v))
    q = F.zip_with(
        v, sc_arr, lambda x, s: F.signum(x) * F.floor(F.abs(x) / s + F.lit(0.5))
    )
    qsum = F.aggregate(q, F.lit(0.0), lambda a, x: a + x).cast("long")
    recon = F.zip_with(q, sc_arr, lambda b, s: b * s)
    qerr = r4(F.array_max(F.zip_with(v, recon, lambda a, r: F.abs(a - r))))
    return (
        e.select("vec_id", qsum.alias("qsum"), qerr.alias("qerr"))
        .orderBy("vec_id")
    )


@query(
    "x25_repetition_signals",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), "
        "g AS (SELECT doc_id, list_transform(generate_series(1, len(ws) - 1), "
        "i -> ws[i] || ' ' || ws[i + 1]) AS gs FROM w) "
        "SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_bigrams, "
        "round(CASE WHEN len(gs) = 0 THEN 0.0 "
        "ELSE 1.0 - len(list_distinct(gs)) * 1.0 / len(gs) END, 4) AS dup_bigram_frac "
        "FROM g ORDER BY doc_id"
    ),
    doc=(
        "repetition quality signal (the Gopher-style duplicate-n-gram "
        "fraction): per document, 1 - distinct/total over word bigrams — "
        "high values flag boilerplate and degenerate generations before "
        "training. Pure JVM higher-order functions (split → sequence → "
        "transform → array_distinct); no shuffle, no Python, linear in "
        "corpus size."
    ),
)
def x25(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    n = F.size(ws)
    # zip_with over slices, not element_at over a sequence: the lambda
    # form re-evaluates split(lower(text)) once per bigram (O(tokens^2)
    # per doc — this was the registry's slowest query at 21.7 s warm,
    # sf0.1). One expression per doc; gs materialized as a column so
    # the distinct/total pair reads it twice without recomputing.
    nb = F.greatest(n - 1, F.lit(0))
    gs = F.zip_with(
        F.slice(ws, F.lit(1), nb),
        F.slice(ws, F.lit(2), nb),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = d.select("doc_id", n.alias("n"), gs.alias("gs"))
    n_bigrams = F.when(F.col("n") < 2, F.lit(0)).otherwise(
        F.col("n") - 1
    ).cast("long")
    dup_frac = F.when(F.col("n") < 2, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct("gs")).cast("double") / F.size("gs")
    )
    return base.select(
        "doc_id",
        n_bigrams.alias("n_bigrams"),
        r4(dup_frac).alias("dup_bigram_frac"),
    ).orderBy("doc_id")


@query(
    "x26_corpus_composition",
    oracle=(
        "SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS n_chars, "
        "CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens, "
        "round(avg(len(string_split(lower(text), ' '))), 4) AS avg_tokens "
        "FROM documents GROUP BY source, lang ORDER BY source, lang"
    ),
    doc=(
        "corpus composition report: docs / chars / tokens per (source, "
        "lang) stratum — the mix-table a training run is planned against "
        "(and the denominator for x23's sampling rates). One map-side-"
        "combined aggregation; at 100 TB this is the cheapest full-corpus "
        "statement there is."
    ),
)
def x26(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.lower("text"), " "))
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.sum(ntok).cast("long").alias("n_tokens"),
            r4(F.avg(ntok)).alias("avg_tokens"),
        )
        .orderBy("source", "lang")
    )


@query(
    "x27_passage_dedup",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), "
        "p AS (SELECT doc_id, md5(list_aggregate(ws[(i - 1) * 8 + 1 : i * 8], 'string_agg', ' ')) AS ph "
        "FROM w, unnest(generate_series(1, len(ws) // 8)) AS u(i)), "
        "d AS (SELECT ph, count(DISTINCT doc_id) AS nd, count(*) AS np FROM p GROUP BY ph) "
        "SELECT CAST(count(*) AS BIGINT) AS shared_passages, "
        "CAST(CAST(sum(np) AS BIGINT) AS BIGINT) AS passage_occurrences, "
        "CAST(max(nd) AS BIGINT) AS max_docs_sharing "
        "FROM d WHERE nd > 1"
    ),
    doc=(
        "passage-level exact dedup (the sub-document granularity of "
        "'Deduplicating Training Data Makes Language Models Better'): "
        "split each document into consecutive non-overlapping 8-word "
        "passages, hash each, and count passages shared across distinct "
        "documents. Spark plan: split -> sequence -> transform(slice) -> "
        "explode -> groupBy(md5) — the shuffle carries 16-byte digests, "
        "never text, so at 100 TB this is a digest-count aggregation."
    ),
)
def x27(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # token array materialized BELOW the transform (multiply-referenced
    # alias survives CollapseProject) — a lambda slicing the raw split
    # expression re-splits the document once per passage
    base = d.select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    ws = F.col("ws")
    npass = F.size(ws) / F.lit(8)
    passages = F.transform(
        F.sequence(F.lit(1), F.floor(npass).cast("int")),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(ws, (i - 1) * 8 + 1, 8)).cast("binary")
        ),
    )
    p = base.select("doc_id", F.explode(passages).alias("ph"))
    shared = (
        p.groupBy("ph")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.count("*").alias("np"),
        )
        .filter(F.col("nd") > 1)
    )
    return shared.agg(
        F.count("*").alias("shared_passages"),
        F.sum("np").cast("long").alias("passage_occurrences"),
        F.max("nd").cast("long").alias("max_docs_sharing"),
    )


@query(
    "x38_substring_dup_windows",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), "
        "e AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 15), "
        "i -> md5(array_to_string(ws[i:i+15], ' ')))) AS h FROM w), "
        "sh AS (SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM e GROUP BY h), "
        "per AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS nw, "
        "CAST(sum(CASE WHEN sh.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared "
        "FROM e JOIN sh USING (h) GROUP BY e.doc_id) "
        "SELECT d.doc_id, coalesce(per.nw, 0) AS n_windows, "
        "coalesce(per.shared, 0) AS shared_windows "
        "FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id"
    ),
    doc=(
        "exact SUBSTRING-level dup detection (Lee et al. 2022's exact-"
        "substring semantic): every stride-1 sliding 16-token window is "
        "hashed, and a doc's windows that appear verbatim in ANY other "
        "doc are counted — catching unaligned copied spans that x27's "
        "stride-8 aligned passages miss. Per doc: total windows and "
        "shared windows (docs shorter than the window report 0/0). "
        "Shuffles carry 16-byte digests only — one explode, two "
        "digest-keyed aggregations, digest equi-join; the 100 TB cost "
        "is O(total tokens) rows of hashes, never text or pairs."
    ),
)
def x38(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # materialize the token array as a COLUMN below the transform: a
    # lambda referencing the raw split(lower(text)) expression re-splits
    # the document once per window element (O(tokens^2) per doc; the
    # aliased column keeps it one split per doc — Catalyst preserves
    # the projection because the alias is referenced multiple times)
    base = d.select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    ws = F.col("ws")
    nw = F.size(ws) - 15
    wins = F.when(
        nw >= 1,
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i, 16)).cast("binary")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # r15 (guide §2.4 single evaluation): e is a diamond — consumed by
    # the shared-count aggregation AND the per-doc join below — and
    # Spark reuses exchanges, not scans, so the O(total windows)
    # explode + md5-per-window transform evaluated twice. The barrier
    # holds (doc_id, 16-byte digest) rows only. md5 itself stays: at
    # the 100 TB shape the window count makes 64-bit digests collide
    # with certainty, so the 128-bit digest is the algorithm, not
    # per-task fat.
    e = barrier(base.select("doc_id", F.explode(wins).alias("h")))
    sh = e.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    per = (
        e.join(sh, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("nw"),
            F.sum((F.col("nd") > 1).cast("long")).alias("shared"),
        )
    )
    return (
        d.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("nw", F.lit(0)).alias("n_windows"),
            F.coalesce("shared", F.lit(0)).alias("shared_windows"),
        )
        .orderBy("doc_id")
    )


@query(
    "x28_incremental_ingest_dedup",
    oracle=(
        "WITH mid AS (SELECT max(doc_id) / 2 AS m FROM documents), "
        "corpus AS (SELECT DISTINCT md5(text) AS h FROM documents, mid WHERE doc_id <= m), "
        "batch AS (SELECT doc_id, md5(text) AS h FROM documents, mid WHERE doc_id > m), "
        "fresh AS (SELECT b.doc_id, b.h FROM batch b ANTI JOIN corpus c ON b.h = c.h) "
        "SELECT CAST(count(*) AS BIGINT) AS batch_docs, "
        "CAST(count(DISTINCT h) AS BIGINT) AS admitted, "
        "CAST(count(*) - count(DISTINCT h) AS BIGINT) AS intra_batch_dups "
        "FROM fresh"
    ),
    doc=(
        "incremental corpus ingestion dedup: at 100 TB you never re-dedup "
        "the whole corpus per ingest — the existing corpus is reduced to "
        "a digest set once, and each new batch LEFT ANTI joins against it "
        "(digests only, broadcast when the batch is small), then dedups "
        "within itself. Here the fixture's lower doc_id half plays the "
        "corpus and the upper half the incoming batch; reports batch "
        "survivors vs docs already seen and intra-batch duplicates."
    ),
)
def x28(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    mid = d.agg((F.max("doc_id") / F.lit(2)).alias("m"))
    h = F.md5(F.col("text").cast("binary")).alias("h")
    corpus = (
        d.join(F.broadcast(mid))
        .filter(F.col("doc_id") <= F.col("m"))
        .select(h)
        .distinct()
    )
    batch = (
        d.join(F.broadcast(mid))
        .filter(F.col("doc_id") > F.col("m"))
        .select("doc_id", h)
    )
    fresh = batch.join(corpus, "h", "left_anti")
    return fresh.agg(
        F.count("*").alias("batch_docs"),
        F.countDistinct("h").alias("admitted"),
        (F.count("*") - F.countDistinct("h")).cast("long").alias("intra_batch_dups"),
    )


@query(
    "x29_minhash_dedup_keep",
    oracle=minhash_keep_oracle(k=16, bands=4),
    doc=(
        "near-dup dedup as a KEEP/DROP action — the O(n)-output "
        "production shape (pair emission is inherently quadratic on "
        "dup-dense corpora: this fixture has 8.9M true pairs at "
        "J >= 0.5 from 5000 sf0.1 docs). md5-portable minhash(16), "
        "4 bands of 4; a doc is dropped iff any band bucket contains "
        "a lower doc_id (Lee et al. 2022's keep-one-per-cluster rule, "
        "greedy single-pass form). The oracle replays every stage — "
        "signature, band hash, bucket-min, keep rule — in DuckDB."
    ),
)
def x29(spark, sf_dir):
    from s2_spark.functions.dedup import minhash_dedup_keep

    d = t(spark, sf_dir, "documents")
    return minhash_dedup_keep(d, k=16, bands=4).orderBy("doc_id")


@query(
    "x30_neardup_clusters",
    oracle=neardup_clusters_oracle(k=16, bands=4),
    doc=(
        "duplicate-cluster formation: connected components over the "
        "LSH band-bucket star graph (edges member -> bucket-min, "
        "O(n*bands), never within-bucket quadratic), via driver-paced "
        "min-label propagation — the iterative distributed-CC loop "
        "(Kiveris et al., SoCC'14) with a one-scalar convergence check "
        "per round. The oracle replays the same graph and computes the "
        "min-label fixpoint with a recursive CTE."
    ),
)
def x30(spark, sf_dir):
    from s2_spark.functions.dedup import neardup_clusters

    d = t(spark, sf_dir, "documents")
    return neardup_clusters(d, k=16, bands=4).orderBy("doc_id")


@query(
    "x31_sequence_packing",
    oracle=(
        "WITH n AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens "
        "FROM documents), "
        "c AS (SELECT doc_id, n_tokens, "
        "CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM n) "
        "SELECT doc_id, n_tokens, cum - n_tokens AS start_off, "
        "(cum - n_tokens) // 512 AS seq_first, "
        "(cum - 1) // 512 AS seq_last "
        "FROM c ORDER BY doc_id"
    ),
    doc=(
        "pretraining sequence packing: concatenate the corpus in doc_id "
        "order and slice fixed 512-token training sequences (the GPT-style "
        "pack-then-chunk step); each doc reports its global token offset "
        "and the first/last sequence it lands in. The global running token "
        "count is the chunked two-phase prefix sum (operators/prefix.py) — "
        "task-parallel across seq ranges, no single-partition WindowExec — "
        "so the packing assignment scales to a 100 TB corpus."
    ),
)
def x31(spark, sf_dir):
    from s2_spark.operators.prefix import chunked_running

    d = t(spark, sf_dir, "documents")
    n = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    c = chunked_running(n, ["doc_id"], "n_tokens", "cum", kind="sum")
    # integer `div`, not floor(double /): the oracle uses exact //, and
    # double division loses exactness past 2^53 total tokens — this
    # query is pitched as the 100 TB shape, so keep the arithmetic
    # exact at any scale
    return c.select(
        "doc_id",
        "n_tokens",
        (F.col("cum") - F.col("n_tokens")).alias("start_off"),
        F.expr("(cum - n_tokens) div 512").alias("seq_first"),
        F.expr("(cum - 1) div 512").alias("seq_last"),
    ).orderBy("doc_id")


@query(
    "x32_tfidf_top_terms",
    oracle=(
        "WITH tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term "
        "FROM documents), "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2), "
        "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), "
        "n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents), "
        "s AS (SELECT tf.doc_id, tf.term, CAST(tf.tf AS DOUBLE) * n.nd / dfq.df AS score "
        "FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n), "
        "r AS (SELECT doc_id, term, score, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM s) "
        "SELECT doc_id, term, CAST(rk AS BIGINT) AS rank, round(score, 4) AS score "
        "FROM r WHERE rk <= 3 ORDER BY doc_id, rank"
    ),
    doc=(
        "per-document top-3 characteristic terms by tf x N/df — the "
        "log-free TF-IDF variant (ln() is not bit-specified across "
        "engines; tf*N is an exact integer and one IEEE division gives "
        "both engines the identical double, so ranking decisions agree "
        "exactly). Plan: one explode, two map-side-combined aggs, "
        "document-frequency side broadcast, window partitioned by "
        "doc_id (scales with the corpus, no global sort)."
    ),
)
def x32(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
    tf = tk.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("nd"))
    s = tf.join(F.broadcast(dfq), "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        (F.col("tf").cast("double") * F.col("nd") / F.col("df")).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "rank", r4(F.col("score")).alias("score"))
        .orderBy("doc_id", "rank")
    )


def _funnel_verdict():
    """First-failing-rule verdict column for the C4/Gopher-style quality
    cascade — shared by x33 (per-stage report) and x35 (e2e pipeline).
    Bigrams via zip_with over slices (one expression per doc) — the
    element_at-over-sequence form re-tokenizes the document per bigram
    (O(tokens^2); x35 measured 16.5 s warm at sf0.1 before the fix)."""
    ws = F.split(F.lower("text"), " ")
    ntok = F.size(ws)
    stop = F.size(F.filter(ws, lambda x: x.isin(*_STOPWORDS))).cast("long")
    nb = F.greatest(ntok - 1, F.lit(0))
    gs = F.zip_with(
        F.slice(ws, F.lit(1), nb),
        F.slice(ws, F.lit(2), nb),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n_bi = F.size(gs)
    dup = n_bi - F.size(F.array_distinct(gs))
    return (
        F.when(~F.col("lang").isin("en", "es", "de", "fr"), F.lit("lang_filtered"))
        .when(ntok < 15, F.lit("too_short"))
        .when(stop * 25 < ntok, F.lit("low_stopword"))
        .when(dup * 5 > n_bi, F.lit("repetitive"))
        .otherwise(F.lit("keep"))
    )


@query(
    "x33_quality_funnel",
    oracle=(
        "WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws "
        "FROM documents), "
        "g AS (SELECT doc_id, lang, len(ws) AS ntok, "
        "CAST(length(list_filter(ws, x -> x IN "
        "('the','a','of','and','to','in','is'))) AS BIGINT) AS stop, "
        "list_transform(generate_series(1, len(ws) - 1), "
        "i -> ws[i] || ' ' || ws[i + 1]) AS gs FROM w), "
        "v AS (SELECT doc_id, CASE "
        "WHEN lang NOT IN ('en', 'es', 'de', 'fr') THEN 'lang_filtered' "
        "WHEN ntok < 15 THEN 'too_short' "
        "WHEN stop * 25 < ntok THEN 'low_stopword' "
        "WHEN (len(gs) - len(list_distinct(gs))) * 5 > len(gs) THEN 'repetitive' "
        "ELSE 'keep' END AS verdict FROM g) "
        "SELECT CAST(CASE verdict WHEN 'lang_filtered' THEN 0 WHEN 'too_short' THEN 1 "
        "WHEN 'low_stopword' THEN 2 WHEN 'repetitive' THEN 3 ELSE 4 END AS BIGINT) AS stage, "
        "verdict, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM v GROUP BY verdict ORDER BY stage"
    ),
    doc=(
        "quality filter funnel (the C4/Gopher-style cascade): language "
        "allowlist -> min length -> stopword-ratio floor -> duplicate-"
        "bigram ceiling, each document attributed to its FIRST failing "
        "rule; reports docs per funnel stage. All thresholds are integer "
        "comparisons (stop*25 < ntok, dup*5 > n_bigrams) so both engines "
        "take bit-identical branches. One projection plus one map-side-"
        "combined aggregation — at 100 TB the funnel costs one corpus "
        "scan, no shuffle beyond the 5-row verdict rollup."
    ),
)
def x33(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    verdict = _funnel_verdict()
    stage = (
        F.when(F.col("verdict") == "lang_filtered", 0)
        .when(F.col("verdict") == "too_short", 1)
        .when(F.col("verdict") == "low_stopword", 2)
        .when(F.col("verdict") == "repetitive", 3)
        .otherwise(4)
        .cast("long")
    )
    return (
        d.select(verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(F.count("*").alias("n_docs"))
        .select(stage.alias("stage"), "verdict", "n_docs")
        .orderBy("stage")
    )


@query(
    "x34_ann_recall_report",
    oracle=ann_recall_oracle(query_ids=(0, 1, 2, 3, 4), k=10, m=8, dim=64, seed=42),
    doc=(
        "recall@10 of the multiprobe-LSH ANN against exact brute force, "
        "per query vector - the measurement harness for the ANN tier, "
        "shipped as a first-class query so recall regressions hash-"
        "mismatch instead of drifting silently. Both pipelines run with "
        "identical hyperplane literals and left-associated cosine "
        "chains, so Spark and the oracle agree on every ranking decision "
        "and the recall number itself is verified. (On this fixture's "
        "uniform random vectors recall is legitimately low - neighbors "
        "are weak and m=8 buckets are fine-grained; the dial is (m, "
        "multiprobe, nprobe), cf. functions/similarity.py.)"
    ),
)
def x34(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    return _recall_report(spark, emb, (0, 1, 2, 3, 4), k=10)


def _recall_report(spark, corpus, qids, k=10, ann_fn=None, ann_df=None):
    """Recall@k report shared by the ANN measurement queries (x34 raw
    fixture, x36 planted/LSH, x37 planted/IVF): per query, exact
    brute-force top-k vs the tier's approximate top-k over ``corpus``,
    joined to count hits. ``ann_fn(qid)`` builds the approximate side;
    default is multiprobe-LSH at (m=8, multiprobe=1)."""
    from functools import reduce

    from s2_spark.functions.similarity import (
        _hyperplanes,
        cosine,
        dot,
        lsh_bucket,
        norm as vnorm,
    )
    from pyspark.sql import Window as W

    # r15 re-plan: ONE joint plan per side instead of a per-query-id
    # union of 2×|qids| branches. The old shape re-evaluated the corpus
    # (for planted synthetics: the delta join + zip_with synthesis) and
    # re-BUILT the fold expressions per branch — plan construction
    # alone measured ~5 s warm at sf0.1 for x34/x36. The joint plan
    # computes every query's exact top-k with one broadcast of the
    # |qids|-row query frame and a row_number window partitioned by
    # query_id — selection identical to the per-branch
    # orderBy(sim DESC, vec_id).limit(k): same fold expressions, same
    # IEEE doubles, same tie-break, just ranked per partition instead
    # of per branch. The corpus is materialized once; all sides scan
    # the cached blocks.
    corpus = barrier(corpus)
    qdf = corpus.filter(F.col("vec_id").isin(*[int(q) for q in qids])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )

    def _topk(scored):
        rw = W.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
        return (
            scored.withColumn("_rk", F.row_number().over(rw))
            .filter(F.col("_rk") <= k)
            .select("query_id", "vec_id")
        )

    brute = _topk(
        corpus.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", cosine("embedding", "qe").alias("sim")
        )
    ).withColumn("_m", F.lit(1))
    if ann_df is not None:
        # pre-built joint approximate side: (query_id, vec_id, sim)
        # for ALL query ids in one plan — the caller guarantees each
        # (query_id, vec_id) candidate appears exactly once with the
        # tier's own similarity expression; ranked per query_id by the
        # same window as the brute side (selection identical to the
        # per-branch orderBy(sim DESC, vec_id).limit(k))
        ann = _topk(ann_df)
    elif ann_fn is None:
        # joint multiprobe-LSH at (m=8, multiprobe=1) — the same
        # bucketing, probe ring, candidate filter, and similarity
        # expression as similarity.lsh_topk, across all queries at once
        planes = _hyperplanes(64, 8, 42)
        bucketed = corpus.withColumn("_bkt", lsh_bucket("embedding", planes))
        masks = [0] + [1 << i for i in range(8)]
        q = qdf.withColumn("_qbkt", lsh_bucket("qe", planes)).withColumn(
            "_qn", vnorm("qe")
        )
        probes = F.array(
            *[F.col("_qbkt").bitwiseXOR(F.lit(mask).cast("long")) for mask in masks]
        )
        qx = q.select(
            "query_id", "qe", "_qn", F.explode(probes).alias("_qprobe")
        )
        ann = _topk(
            bucketed.join(
                F.broadcast(qx), F.col("_bkt").eqNullSafe(F.col("_qprobe"))
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "vec_id",
                (
                    dot("embedding", "qe")
                    / (vnorm("embedding") * F.col("_qn"))
                ).alias("sim"),
            )
        )
    else:
        anns = [
            ann_fn(qid).select(F.lit(qid).alias("query_id"), "vec_id")
            for qid in qids
        ]
        ann = reduce(lambda a, b: a.unionByName(b), anns)
    hits = (
        ann.join(F.broadcast(brute), ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("_m"), F.lit(0))).cast("long").alias("hits"))
    )
    # anchor on a literal query-id frame: a query whose probe buckets
    # come back empty contributes zero ANN rows, and grouping only the
    # ANN side would silently drop its row (the oracle still emits
    # hits=0) — every query must always report, recall 0 included
    qframe = spark.range(1).select(
        F.explode(F.array(*[F.lit(q).cast("long") for q in qids])).alias("query_id")
    )
    return (
        qframe.join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            r4(F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k))).alias("recall"),
        )
        .orderBy("query_id")
    )


@query(
    "x36_ann_recall_planted",
    oracle=planted_recall_oracle(
        query_ids=(0, 1, 2, 3, 4), copies=12, eps=0.02, k=10, m=8, dim=64, seed=42
    ),
    doc=(
        "recall@10 on a clusterable synthetic: each query vector gets 12 "
        "planted near-neighbors (base + 0.02-length perturbations from "
        "the same deterministic LCG unit-vector generator the LSH "
        "hyperplanes use), so the true top-10 is genuine near-duplicates "
        "— the regime ANN serves in a dedup/retrieval pipeline. Proves "
        "the (m, multiprobe) dial delivers: where x34's uniform-random "
        "fixture legitimately yields recall ~0.1 at m=8/multiprobe=1, "
        "this corpus yields recall 1.0 at the SAME setting, and the "
        "number is hash-verified (the oracle replays corpus synthesis, "
        "bucketing, and both rankings). Planted vectors come from ONE "
        "broadcast join of a 60-row literal delta frame — no per-copy "
        "corpus rescan."
    ),
)
def x36(spark, sf_dir):
    synth = _planted_corpus(spark, sf_dir)
    return _recall_report(spark, synth, (0, 1, 2, 3, 4), k=10)


def _planted_corpus(spark, sf_dir):
    """Fixture embeddings ∪ planted near-neighbors (x36/x37 input):
    one broadcast join of a 60-row literal delta frame, zip_with
    elementwise add — bit-identical to the oracle's SQL synthesis."""
    from s2_spark.functions.similarity import _dbl

    emb = t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", _dbl("embedding").alias("embedding"))
    # ONE F.expr parse for the whole 60×64-double delta table (r15):
    # the per-element F.lit form cost ~3,900 py4j round trips — ~2.9 s
    # of pure driver-side plan construction per query build (measured
    # at sf0.1). D-suffixed repr literals parse via Double.parseDouble,
    # bit-identical to F.lit(float(x)); pid/bid use L-suffixed BIGINTs.
    rows = ",".join(
        f"named_struct('pid',{pid}L,'bid',{bid}L,'d',array("
        + ",".join(f"{float(x)!r}D" for x in d)
        + "))"
        for pid, bid, d in planted_deltas(
            query_ids=(0, 1, 2, 3, 4), copies=12, eps=0.02, dim=64
        )
    )
    deltas = spark.range(1).select(F.inline(F.expr(f"array({rows})")))
    planted = base.join(
        F.broadcast(deltas), base["vec_id"] == deltas["bid"]
    ).select(
        F.col("pid").alias("vec_id"),
        F.zip_with("embedding", "d", lambda x, y: x + y).alias("embedding"),
    )
    return base.unionByName(planted)


@query(
    "x37_ivf_recall_planted",
    oracle=ivf_planted_recall_oracle(
        query_ids=(0, 1, 2, 3, 4), copies=12, eps=0.02, k=10,
        n_cells=16, dim=64, seed=7, nprobe=2,
    ),
    doc=(
        "IVF companion of x36: recall@10 of the fixed-centroid IVF tier "
        "on the planted-near-neighbor corpus at nprobe=2 — the scan "
        "touches 2 of 16 cells (the partition-pruned IN-filter shape) "
        "yet recall is 1.0, because for unit vectors nearest-by-"
        "euclidean assignment equals max-cosine, so the query's top "
        "probe cell is exactly the cell holding its planted copies. "
        "Hash-verified end to end: the oracle replays corpus synthesis, "
        "centroid assignment, probe-cell ranking, and both rerankings. "
        "Together with x36 both ANN tiers carry a recall proof on the "
        "clusterable regime they serve."
    ),
)
def x37(spark, sf_dir):
    from s2_spark.functions.similarity import (
        cosine,
        ivf_assign_fixed,
        ivf_fixed_centroids,
    )

    synth = _planted_corpus(spark, sf_dir)
    cents = ivf_fixed_centroids(n_cells=16, dim=64, seed=7)
    # one evaluation of the 16-centroid assignment folds (r15): the
    # five per-query ANN branches below each scan `assigned`; without
    # the checkpoint every branch re-runs the synthesis + all 16
    # sqdist folds per row
    assigned = barrier(ivf_assign_fixed(synth, cents))
    # r15 §14: joint IVF side — ONE plan for all five query ids
    # instead of five ivf_topk branches (each paid a driver-side
    # .first() job plus its own probe-semi-join subtree). The probe
    # cells replicate ivf_topk exactly: same floats (the stored
    # vector collected from `assigned`), same squared-euclidean
    # ranking with the same (dist, idx) tie-break, same nprobe=2.
    # Each vector has ONE _cell, so it matches a query iff _cell is
    # in that query's probe set — each (query_id, vec_id) candidate
    # appears exactly once, and the cosine runs on the same
    # array<double> values, so the ranked result is the branch
    # result verbatim.
    qids = (0, 1, 2, 3, 4)
    qrows = (
        assigned.filter(F.col("vec_id").isin(*qids))
        .select("vec_id", "embedding")
        .collect()
    )
    qvecs = {int(r[0]): [float(x) for x in r[1]] for r in qrows}
    centers = [(i, list(map(float, c))) for i, c in enumerate(cents)]

    def _sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe_rows = []
    for qid in qids:
        pcells = [
            i
            for i, _ in sorted(
                centers, key=lambda ic: (_sqd(ic[1], qvecs[qid]), ic[0])
            )[:2]
        ]
        for c in pcells:
            probe_rows.append((qid, int(c), qvecs[qid]))
    qframe = spark.createDataFrame(
        probe_rows, "query_id long, probe_cell int, qe array<double>"
    )
    scored = (
        assigned.join(
            F.broadcast(qframe),
            F.col("_cell").eqNullSafe(F.col("probe_cell")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine("embedding", "qe").alias("sim"))
    )
    return _recall_report(spark, synth, qids, k=10, ann_df=scored)


@query(
    "x35_pipeline_summary",
    oracle=pipeline_summary_oracle(k=16, bands=4, budget=512),
    doc=(
        "the whole training-data preparation pipeline as ONE declarative "
        "plan: quality funnel (x33 rules) -> exact dedup (min id per "
        "md5(text)) -> minhash keep/drop near-dup (x29 rule, over exact "
        "survivors) -> 512-token sequence budget; reports the funnel "
        "counts, surviving token total, and training-sequence count in "
        "a single row. Every stage is the library operator, composed "
        "lazily - Catalyst sees one DAG, so the corpus is scanned once "
        "per stage chain, digests and signatures shuffle instead of "
        "text, and the oracle replays all four stages end to end."
    ),
)
def x35(spark, sf_dir):
    from s2_spark.functions.dedup import minhash_dedup_keep

    d = t(spark, sf_dir, "documents")
    q = d.filter(_funnel_verdict() == "keep")
    eh = q.withColumn("_h", F.md5(F.col("text").cast("binary")))
    er = eh.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
    # r15 (guide §2.4 single evaluation): the exact-survivor relation
    # is consumed by the s3 count, the near-dup keep pipeline, AND the
    # token rollup — each re-ran the quality-funnel + md5-collapse
    # chain. Checkpoint only the surviving IDS (one long per row) and
    # re-attach text from the scan: the ids all passed the quality
    # filter, so joining the raw table yields the identical relation
    # while each downstream reference pays one cheap pruned scan
    # instead of the whole funnel chain.
    ed_ids = barrier(er.select("doc_id"))
    ed = d.select("doc_id", "text").join(ed_ids, "doc_id")
    keep = minhash_dedup_keep(ed)
    kd = ed.join(keep, "doc_id").select(
        F.size(F.split("text", " ")).cast("long").alias("ntok")
    )
    s1 = d.agg(F.count("*").alias("n_input"))
    s2 = q.agg(F.count("*").alias("after_quality"))
    s3 = ed.agg(F.count("*").alias("after_exact"))
    s4 = kd.agg(
        F.count("*").alias("after_neardup"),
        F.sum("ntok").alias("total_tokens"),
    ).select(
        "after_neardup",
        "total_tokens",
        # exact integer div (matches the oracle's //) — floor(double /)
        # diverges past 2^53 total tokens
        F.expr("(total_tokens + 511) div 512").alias("n_sequences"),
    )
    return s1.crossJoin(s2).crossJoin(s3).crossJoin(s4)


@query(
    "x39_unigram_surprisal",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tk "
        "FROM documents), tok2 AS (SELECT doc_id, tk FROM tok WHERE tk <> ''), "
        "freq AS (SELECT tk, count(*) AS c FROM tok2 GROUP BY tk), "
        "tot AS (SELECT sum(c) AS t FROM freq) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "round(avg(-ln(c * 1.0 / t)), 4) AS avg_surprisal "
        "FROM tok2 JOIN freq USING (tk) CROSS JOIN tot "
        "GROUP BY doc_id ORDER BY doc_id"
    ),
    doc=(
        "unigram log-prob quality score (the CCNet/Gopher perplexity "
        "proxy): fit the corpus unigram distribution, then score each "
        "document by its tokens' mean surprisal -ln p(tok) — low = "
        "boilerplate/common, high = noise/rare-gibberish; both tails get "
        "filtered before training. Two hash aggregations plus one "
        "equi-join on the token (AQE picks broadcast when the vocab is "
        "small, shuffle when it's web-scale); the join carries "
        "(token, count) pairs, never documents. No Python, no window."
    ),
)
def x39(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tk")
    ).filter(F.col("tk") != "")
    freq = tok.groupBy("tk").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    scored = tok.join(freq, "tk").crossJoin(F.broadcast(total))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            r4(F.avg(-F.log(F.col("c") / F.col("t")))).alias("avg_surprisal"),
        )
        .orderBy("doc_id")
    )


@query(
    "x40_doc_chunking",
    oracle=(
        "WITH g AS (SELECT doc_id, text, n_chars, "
        "unnest(generate_series(0, CAST(greatest(n_chars - 1, 0) // 400 AS BIGINT))) AS chunk_idx "
        "FROM documents) "
        "SELECT doc_id, chunk_idx, chunk_idx * 400 AS chunk_start, "
        "substr(text, chunk_idx * 400 + 1, 500) AS chunk_text "
        "FROM g WHERE chunk_idx * 400 < n_chars OR n_chars = 0 AND chunk_idx = 0 "
        "ORDER BY doc_id, chunk_idx"
    ),
    doc=(
        "sliding-window document chunking for embedding/indexing: "
        "500-char windows at stride 400 (100-char overlap so no boundary "
        "sentence is lost), emitted as (doc_id, chunk_idx, chunk_start, "
        "chunk_text). The window grid is computed JVM-side with "
        "sequence+posexplode INSIDE the row — each document is read "
        "once and fans out executor-side, the exact shape frame_sample "
        "uses for video. At 100 TB chunking is a map-only pass: no "
        "shuffle at all until someone aggregates the chunks."
    ),
)
def x40(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n_windows = (F.greatest(F.col("n_chars") - 1, F.lit(0)) / 400).cast("long")
    grid = F.sequence(F.lit(0).cast("long"), n_windows)
    return (
        d.select(
            "doc_id",
            "text",
            "n_chars",
            F.explode(grid).alias("chunk_idx"),
        )
        .filter(
            ((F.col("chunk_idx") * 400) < F.col("n_chars"))
            | ((F.col("n_chars") == 0) & (F.col("chunk_idx") == 0))
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * 400).cast("long").alias("chunk_start"),
            F.substring(F.col("text"), (F.col("chunk_idx") * 400 + 1).cast("int"), 500).alias(
                "chunk_text"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "x41_span_dedup_c4",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "s AS (SELECT doc_id, i AS span_idx, "
        "array_to_string(ws[(i*8+1):((i+1)*8)], ' ') AS span "
        "FROM w, unnest(generate_series(0, CAST(greatest(len(ws) - 1, 0) // 8 AS BIGINT))) AS t(i) "
        "WHERE i * 8 < len(ws)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn FROM s) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, "
        "CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept, "
        "coalesce(string_agg(span, ' ' ORDER BY span_idx) FILTER (rn = 1), '') AS cleaned_text "
        "FROM r GROUP BY doc_id ORDER BY doc_id"
    ),
    doc=(
        "C4-style cross-document span dedup ('we removed all but one of "
        "any three-sentence span occurring more than once' — adapted to "
        "8-word spans since the fixture has no sentence breaks): spans "
        "fan out in-executor, a window keyed on the SPAN TEXT keeps the "
        "first occurrence corpus-wide, and each document reassembles "
        "from its surviving spans. The shuffle key is the span (high "
        "cardinality, skew-free); documents never ride the shuffle "
        "twice — the reassembly groups by doc_id carrying only kept "
        "spans. The canonical boilerplate-removal pass for web corpora."
    ),
)
def x41(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    # token array materialized BELOW the explode: the same-select form
    # put the ws projection ABOVE the Generate, re-splitting the
    # document once per emitted span
    base = d.select("doc_id", F.split("text", " ").alias("ws"))
    grid = F.sequence(
        F.lit(0).cast("long"),
        (F.greatest(F.size("ws") - 1, F.lit(0)) / 8).cast("long"),
    )
    spans = (
        base.select("doc_id", "ws", F.explode(grid).alias("span_idx"))
        .filter((F.col("span_idx") * 8) < F.size("ws"))
        .select(
            "doc_id",
            "span_idx",
            F.array_join(
                F.slice(F.col("ws"), (F.col("span_idx") * 8 + 1).cast("int"), 8),
                " ",
            ).alias("span"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("span").orderBy("doc_id", "span_idx")
    )
    r = spans.withColumn("rn", rn)
    kept_struct = F.when(
        F.col("rn") == 1, F.struct("span_idx", "span")
    )
    return (
        r.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(kept_struct)
                        ),
                        lambda s: s["span"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


def _clean_tokens(col):
    """Non-empty lowercase whitespace tokens as an in-row array."""
    return F.filter(_tokens(col), lambda x: x != "")


@query(
    "x42_bigram_surprisal",
    oracle=(
        "WITH w AS (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws "
        "FROM documents), "
        "bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 "
        "FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)), "
        "big AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2), "
        "ctx AS (SELECT w1, count(*) AS n FROM bg GROUP BY w1) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "round(avg(-ln(c * 1.0 / n)), 4) AS avg_surprisal "
        "FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1) "
        "GROUP BY doc_id ORDER BY doc_id"
    ),
    doc=(
        "bigram-LM quality score — the next step up from x39's unigram "
        "surprisal and the cheap stand-in for KenLM perplexity filtering "
        "(CCNet): fit corpus bigram conditionals p(w2|w1) = "
        "c(w1 w2)/c(w1 ·), score each document by its bigrams' mean "
        "surprisal. Bigrams fan out IN-ROW (sequence+element_at — no "
        "self-join to pair adjacent tokens, no window), then two hash "
        "aggregations build the LM and two equi-joins score; the joins "
        "carry (bigram, count) pairs whose cardinality scales with the "
        "LM vocabulary, never with corpus bytes. Docs under 2 tokens "
        "drop out structurally on both sides."
    ),
)
def x42(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = _clean_tokens(F.col("text"))
    # build the bigram array in ONE zip_with evaluated once per doc,
    # then explode the materialized array: an element_at-per-exploded-
    # row formulation re-tokenizes the document for every bigram
    # (O(tokens^2) per doc — measured 8x slower at sf0.1)
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, F.lit(1), n1),
        F.slice(ws, F.lit(2), n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("p")).select(
        "doc_id",
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    # r15: measured and left alone — deriving ctx from big and/or
    # checkpointing bg/big were all break-even to worse at sf0.1
    # (1.49-1.95 s vs 1.52 s as-is): map-side partial aggregation
    # already crunches every exchange to type-cardinality rows, and
    # the three cheap chains cost less than eager checkpoint jobs.
    # x55 (five chains, one with a distinct-agg) is where the same
    # treatment pays; see its comment.
    ctx = bg.groupBy("w1").agg(F.count("*").alias("n"))
    return (
        bg.join(big, ["w1", "w2"])
        .join(ctx, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            r4(F.avg(-F.log(F.col("c") / F.col("n")))).alias("avg_surprisal"),
        )
        .orderBy("doc_id")
    )


@query(
    "x43_source_rollup",
    oracle=(
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts, "
        "CAST(sum(len(list_filter(string_split(lower(text), ' '), "
        "x -> x <> ''))) AS BIGINT) AS total_tokens, "
        "round(avg(n_chars), 4) AS avg_chars "
        "FROM documents GROUP BY source ORDER BY source"
    ),
    doc=(
        "per-source (domain) corpus accounting — the rollup behind "
        "domain-level curation decisions (block, cap, or upsample a "
        "crawl source): doc count, exact-unique count via text digest, "
        "token volume, mean length. Token counts are computed IN-ROW "
        "(size of the filtered split — the document never explodes), so "
        "the single shuffle carries one pre-aggregated row per "
        "(partition, source); distinct-count groups on a 16-byte digest, "
        "never the text. At 100 TB this is one partial-agg pass over "
        "the scan."
    ),
)
def x43(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            "n_chars",
            F.md5("text").alias("h"),
            F.size(_clean_tokens(F.col("text"))).alias("ntok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_unique_texts"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            r4(F.avg("n_chars")).alias("avg_chars"),
        )
        .orderBy("source")
    )


@query(
    "x44_repetition_filter",
    oracle=(
        "WITH w AS (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws "
        "FROM documents), "
        "g AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram "
        "FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)), "
        "pc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram), "
        "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams, "
        "count(*) AS n_distinct, max(c) AS top_c FROM pc GROUP BY doc_id) "
        "SELECT doc_id, n_grams, "
        "round((n_grams - n_distinct) * 1.0 / n_grams, 4) AS dup_frac, "
        "round(top_c * 1.0 / n_grams, 4) AS top_frac, "
        "round((n_grams - n_distinct) * 1.0 / n_grams, 4) > 0.05 AS repetitive "
        "FROM agg ORDER BY doc_id"
    ),
    doc=(
        "Gopher-style repetition filter: per document, the fraction of "
        "3-gram occurrences that are repeats and the most-frequent "
        "3-gram's share — the two rules that catch boilerplate loops and "
        "keyword-stuffed spam. Grams fan out in-row; the only shuffle is "
        "keyed (doc_id, gram) — high-cardinality, skew-free, and carries "
        "3-gram strings bounded by document length, never whole "
        "documents. The flag compares the ROUNDED fraction so the "
        "threshold decision is reproducible across engines. Docs under "
        "3 tokens drop out structurally on both sides."
    ),
)
def x44(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = _clean_tokens(F.col("text"))
    # gram array built by chained zip_with, ONE expression per doc —
    # see x42 for why element_at-per-exploded-row is quadratic
    n3 = F.greatest(F.size(ws) - 2, F.lit(0))
    g12 = F.zip_with(
        F.slice(ws, F.lit(1), n3),
        F.slice(ws, F.lit(2), n3),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    gram_arr = F.zip_with(
        g12,
        F.slice(ws, F.lit(3), n3),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )
    grams = d.select("doc_id", F.explode(gram_arr).alias("gram"))
    pc = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    dup_frac = r4(
        (F.col("n_grams") - F.col("n_distinct")) / F.col("n_grams")
    )
    return (
        pc.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
        .select(
            "doc_id",
            "n_grams",
            dup_frac.alias("dup_frac"),
            r4(F.col("top_c") / F.col("n_grams")).alias("top_frac"),
            (dup_frac > 0.05).alias("repetitive"),
        )
        .orderBy("doc_id")
    )


@query(
    "x45_source_frequency_cap",
    oracle=(
        "SELECT doc_id, source, cap_rank FROM "
        "(SELECT doc_id, source, CAST(row_number() OVER "
        "(PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cap_rank "
        "FROM documents) WHERE cap_rank <= 15 ORDER BY doc_id"
    ),
    doc=(
        "per-source frequency capping (the CommonCrawl-pipeline 'at most "
        "N pages per host' quota): keep the first 15 documents of every "
        "source in deterministic doc_id order. One partitioned window "
        "(PARTITION BY source — the unit of parallelism; no global "
        "sort), and the cap predicate cuts the tail before anything "
        "downstream reads it. At 100 TB a hot host skews the window "
        "partition, but the window carries only (doc_id, source) pairs —"
        " the cap runs BEFORE documents are fetched into the kept set."
    ),
)
def x45(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    rn = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    return (
        d.select("doc_id", "source", rn.cast("long").alias("cap_rank"))
        .filter(F.col("cap_rank") <= 15)
        .orderBy("doc_id")
    )


@query(
    "x46_mixture_weights",
    oracle=(
        "WITH s AS (SELECT source, "
        "CAST(sum(len(list_filter(string_split(lower(text), ' '), "
        "x -> x <> ''))) AS BIGINT) AS total_tokens FROM documents "
        "GROUP BY source), "
        "tot AS (SELECT sum(total_tokens) AS t, "
        "sum(sqrt(total_tokens)) AS ta FROM s) "
        "SELECT source, total_tokens, "
        "round(total_tokens * 1.0 / t, 4) AS raw_share, "
        "round(sqrt(total_tokens) / ta, 4) AS alpha_share "
        "FROM s CROSS JOIN tot ORDER BY source"
    ),
    doc=(
        "temperature-scaled sampling weights for data mixing (the "
        "multilingual-LM alpha-sampling rule, alpha = 0.5): per-source "
        "token share, raw and after sqrt temperature scaling — the "
        "knob that keeps a dominant crawl source from drowning the "
        "mixture. Token counting is in-row, the per-source rollup is "
        "one partial-agg pass, and the normalizer is a broadcast "
        "1-row cross join — the same shape as x39's corpus total. "
        "Output cardinality = number of sources, independent of corpus "
        "size."
    ),
)
def x46(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    s = (
        d.select(
            "source", F.size(_clean_tokens(F.col("text"))).alias("ntok")
        )
        .groupBy("source")
        .agg(F.sum("ntok").cast("long").alias("total_tokens"))
    )
    tot = s.agg(
        F.sum("total_tokens").alias("t"),
        F.sum(F.sqrt("total_tokens")).alias("ta"),
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "total_tokens",
            r4(F.col("total_tokens") / F.col("t")).alias("raw_share"),
            r4(F.sqrt("total_tokens") / F.col("ta")).alias("alpha_share"),
        )
        .orderBy("source")
    )


@query(
    "x47_bpe_merge_pairs",
    oracle=(
        "WITH w AS (SELECT unnest(list_filter(string_split(lower(text), ' '), "
        "x -> x <> '')) AS w FROM documents), "
        "v AS (SELECT w, count(*) AS f FROM w GROUP BY w), "
        "p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, f "
        "FROM v, unnest(generate_series(1, len(w) - 1)) AS t(i)) "
        "SELECT pair, CAST(sum(f) AS BIGINT) AS merge_count FROM p "
        "GROUP BY pair ORDER BY merge_count DESC, pair LIMIT 20"
    ),
    doc=(
        "tokenizer induction, step one of BPE training: the top adjacent "
        "symbol-pair counts over the corpus (the next merge is the "
        "argmax). Counted the way real BPE trainers do it — aggregate "
        "the WORD-FREQUENCY table first, then fan pairs out over the "
        "distinct vocabulary weighted by frequency: pair counting costs "
        "O(vocabulary), not O(corpus), and every pass after the word "
        "count is corpus-size-independent. The top-20 boundary "
        "tie-breaks on the pair string so the cut reproduces across "
        "engines."
    ),
)
def x47(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    words = d.select(F.explode(_clean_tokens(F.col("text"))).alias("w"))
    vocab = words.groupBy("w").agg(F.count("*").alias("f"))
    grid = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = vocab.select("w", "f", F.explode(grid).alias("i")).select(
        F.substring(F.col("w"), F.col("i").cast("int"), 2).alias("pair"), "f"
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").cast("long").alias("merge_count"))
        .orderBy(F.desc("merge_count"), "pair")
        .limit(20)
    )


@query(
    "x48_winnowing_fingerprints",
    oracle=(
        "WITH w AS (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws "
        "FROM documents), "
        "g AS (SELECT doc_id, i, md5(ws[i] || ' ' || ws[i + 1] || ' ' || "
        "ws[i + 2] || ' ' || ws[i + 3]) AS h "
        "FROM w, unnest(generate_series(1, len(ws) - 3)) AS t(i)), "
        "m AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY i "
        "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM g), "
        "d AS (SELECT DISTINCT doc_id, fp FROM m) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints, "
        "min(fp) AS min_fp FROM d GROUP BY doc_id ORDER BY doc_id"
    ),
    doc=(
        "winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the "
        "MOSS algorithm): hash word 4-grams, slide a window of 4 hashes, "
        "keep each window's minimum — guaranteeing any shared run of ~7 "
        "words between two documents shares a fingerprint, at a fixed "
        "~2/(w+1) sampling density. Grams and hashes are computed "
        "in-row; so is the min-in-window — winnowing never leaves the "
        "document, so the WHOLE pass is one shuffle-free projection "
        "(round 10: replaced a doc_id window + distinct + groupBy, "
        "three shuffles carrying every gram hash, with per-row "
        "array_min/array_distinct — the distinct fingerprint set per "
        "doc is what an index or a cross-doc overlap join would "
        "consume). Docs under 4 tokens drop out structurally on both "
        "sides."
    ),
)
def x48(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = _clean_tokens(F.col("text"))
    # gram array via chained zip_with (one expression per doc — see
    # x42); each derived array is ALIASED below its consumer so
    # CollapseProject keeps it one evaluation per document (the
    # round-9 gram-quadratic rule)
    n4 = F.greatest(F.size(ws) - 3, F.lit(0))
    g12 = F.zip_with(
        F.slice(ws, F.lit(1), n4),
        F.slice(ws, F.lit(2), n4),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g123 = F.zip_with(
        g12,
        F.slice(ws, F.lit(3), n4),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )
    gram_arr = F.zip_with(
        g123,
        F.slice(ws, F.lit(4), n4),
        lambda abc, e: F.concat(abc, F.lit(" "), e),
    )
    # the under-4-tokens guard sits on the SCAN (one extra tokenize
    # for the predicate), never above the md5 alias — a filter above
    # `hs` would be pushed down with the whole hash chain substituted
    # into the predicate and evaluated twice per document
    hs = d.filter(F.size(ws) >= 4).select(
        "doc_id", F.transform(gram_arr, F.md5).alias("hs")
    )
    # fp_i = min(h[i .. i+3]) (slice clamps at the end — the same
    # trailing-partial-window semantics as ROWS BETWEEN CURRENT ROW
    # AND 3 FOLLOWING); `hs` is a bound column here, so the slice per
    # position reads the attribute, never re-hashing
    # position list 1..size(hs), empty-safe (sequence(1, 0) would be
    # the DESCENDING [1, 0]): sequence to at least 1, then slice to
    # the true size
    pos = F.slice(
        F.sequence(F.lit(1), F.greatest(F.size("hs"), F.lit(1))),
        F.lit(1),
        F.size("hs"),
    )
    fps = hs.select(
        "doc_id",
        F.transform(
            pos, lambda i: F.array_min(F.slice("hs", i, F.lit(4)))
        ).alias("fps"),
    )
    return fps.select(
        "doc_id",
        F.size(F.array_distinct("fps")).cast("long").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
    ).orderBy("doc_id")


from s2_spark.suite._ann_oracles import semdedup_oracle  # noqa: E402


@query(
    "x49_semdedup",
    oracle=semdedup_oracle(
        query_ids=(0, 1, 2, 3, 4), copies=12, eps=0.02,
        n_cells=16, dim=64, seed=7, tau=0.99,
    ),
    doc=(
        "SemDeDup (semantic dedup over embeddings, Abbas et al. 2023): "
        "cluster the corpus, then inside each cluster drop every vector "
        "whose cosine to a LOWER-id clustermate exceeds tau, reporting "
        "the anchor it duplicates and the similarity. Run on the "
        "planted-near-neighbor corpus (x36/x37's synthesis) so the "
        "dropped set is a known ground truth: every planted copy falls "
        "to its base vector. The quadratic is confined WITHIN cells — "
        "the join key is the cell id and nothing compares across cells. "
        "Scaling the cell COUNT with the corpus keeps per-cell pairs "
        "bounded but makes the flat centroid assignment O(n x cells); "
        "at 100 TB swap the coarse step for the LSH sign-bucket tier "
        "(x11/x13 machinery, O(n log buckets) assignment — measured "
        "2.26x/decade at constant bucket size vs 4.8x for flat "
        "centroids, SCALE.md round 9) or hierarchical KMeans — x51 "
        "registers exactly that bucketed tier as the production shape; "
        "this entry is the literal-paper-shape demo. The "
        "within-cell pruning shape is identical either way. Oracle "
        "replays corpus synthesis, assignment, pairing, and the "
        "threshold decision on identical IEEE doubles."
    ),
)
def x49(spark, sf_dir):
    from s2_spark.functions.similarity import (
        cosine,
        ivf_assign_fixed,
        ivf_fixed_centroids,
    )

    synth = _planted_corpus(spark, sf_dir)
    cents = ivf_fixed_centroids(n_cells=16, dim=64, seed=7)
    # one evaluation of synthesis + centroid folds for BOTH join sides
    # (r15 — same double-scan hazard as x51, measured 4.1 s → 2.0 s)
    a = barrier(ivf_assign_fixed(synth, cents))
    left = a.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"),
        F.col("_cell").alias("_ca"),
    )
    right = a.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"),
        F.col("_cell").alias("_cb"),
    )
    # null-safe join: a plain equi-join makes Catalyst infer
    # isnotnull(_cell) and push it below the projection that
    # materializes the assignment, re-inlining every centroid fold
    # into the planted-synthesis branch (plan-hygiene oversized-dup
    # detector). _cell is never null; eqNullSafe is value-identical.
    # r15 (guide §2.5 AQE-explosion trap): the checkpointed assignment
    # is tiny, so AQE coalesced the within-cell pair join to 1-2
    # partitions while its OUTPUT × interpreted cosine fold is the
    # cost; the explicit-N pin keeps the join as wide as the 16 cells
    # hash (measured exec 2.4 s → 0.9 s).
    dp = spark.sparkContext.defaultParallelism
    left = left.repartition(dp, "_ca")
    pairs = (
        left.join(right, F.col("_ca").eqNullSafe(F.col("_cb")))
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine("va", "vb").alias("s"))
    )
    return (
        pairs.filter(F.col("s") >= 0.99)
        .groupBy("b_id")
        .agg(
            F.min("a_id").alias("anchor"),
            F.min_by("s", "a_id").alias("sa"),
        )
        .select(
            F.col("b_id").alias("vec_id"),
            "anchor",
            r4(F.col("sa")).alias("anchor_sim"),
        )
        .orderBy("vec_id")
    )


from s2_spark.suite._ann_oracles import planted_dedup_recall_oracle  # noqa: E402


@query(
    "x50_planted_dedup_recall",
    oracle=planted_dedup_recall_oracle(k=16, bands=4, n_base=40),
    doc=(
        "planted-duplicate recall proof for the production dedup tier "
        "(the dedup-family analogue of x36/x37's ANN recall proofs): "
        "the corpus gains one planted copy per base doc — byte-exact "
        "for even ids (must be caught: identical signature, identical "
        "buckets) and one-appended-token near-dups for odd ids (the "
        "honest minhash test: token-set Jaccard n/(n+1)). Planted ids "
        "sit 20M above the fixture's so existing keep decisions cannot "
        "change — bucket minima only ever see larger new ids. Each "
        "planted copy reports whether the keep rule deduped it; the "
        "oracle replays synthesis, signatures, banding, and the keep "
        "decision. Same O(n x bands) pipeline shape as x29 — recall "
        "measurement costs one extra union, not a second algorithm."
    ),
)
def x50(spark, sf_dir):
    from s2_spark.functions.dedup import minhash_dedup_keep

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") < 40)
    exact = base.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        "text",
        F.lit("exact").alias("kind"),
    )
    near = base.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zqzduplicatemarker")).alias("text"),
        F.lit("near").alias("kind"),
    )
    planted = exact.unionByName(near)
    corpus = d.unionByName(planted.select("doc_id", "text"))
    kept = minhash_dedup_keep(corpus, k=16, bands=4).withColumn(
        "_k", F.lit(1)
    )
    return (
        planted.select("doc_id", "kind")
        .join(kept, "doc_id", "left")
        .select(
            F.col("doc_id").alias("planted_id"),
            "kind",
            F.col("_k").isNull().alias("deduped"),
        )
        .orderBy("planted_id")
    )


from s2_spark.suite._ann_oracles import (  # noqa: E402
    semdedup_adaptive_m,
    semdedup_bucketed_oracle,
)


@query(
    "x51_semdedup_bucketed",
    oracle=semdedup_bucketed_oracle(
        query_ids=(0, 1, 2, 3, 4), copies=12, eps=0.02,
        dim=64, seed=42, tau=0.99,
    ),
    doc=(
        "SemDeDup, production coarse tier (the 100 TB shape x49's demo "
        "points at): the coarse quantizer is the x11/x13 LSH "
        "sign-bucket machinery — m hyperplane sign bits make the "
        "bucket key, so assignment is O(n*m*dim) with no per-centroid "
        "scan, and m ADAPTS to the corpus (semdedup_adaptive_m: "
        "2^m tracks n/2 via exact integer thresholds, the one "
        "driver-side count this query pays) so per-bucket occupancy — "
        "and with it within-bucket pair count — stays bounded as the "
        "corpus grows (measured 2.26x/decade vs 4.8x for flat "
        "centroids, SCALE.md round 9). Each vector probes its own "
        "bucket plus every 1-bit flip against exact buckets, so "
        "near-identical vectors that straddle one hyperplane still "
        "meet; a pair is compared iff sign keys differ in <= 1 bit, "
        "exactly once (the m+1 probe keys per vector are distinct and "
        "only the a<b orientation survives the join filter). Run on "
        "the planted-near-neighbor corpus (x36/x37's synthesis) so the "
        "dropped set is a known ground truth. Oracle replays corpus "
        "synthesis, the m decision, hyperplane literals, sign buckets, "
        "the probe ring, and the threshold decision on identical "
        "left-associated IEEE doubles — valid at every scale factor."
    ),
)
def x51(spark, sf_dir):
    from s2_spark.functions.similarity import (
        _hyperplanes,
        cosine,
        lsh_bucket,
    )

    synth = _planted_corpus(spark, sf_dir)
    # one cheap count-star picks the bucket-count dial; _hyperplanes is
    # prefix-stable (sequential LCG), so slicing the max-m table yields
    # exactly the planes the oracle gates on i < m
    m = semdedup_adaptive_m(synth.count())
    planes = _hyperplanes(dim=64, m=16, seed=42)[:m]
    # materialize the bucket assignment ONCE (r15, guide §2.4/§1.2):
    # `a` feeds both join sides, and Spark reuses exchanges, not
    # scans — without the checkpoint the m×64-dim sign-fold projection
    # (the dominant per-row cost) and the planted-corpus union run
    # TWICE, once per side (measured 6.8 s warm at sf0.1; 2.8 s with
    # the single evaluation). localCheckpoint keeps the assignment on
    # executors; the loop-free plan downstream is two scans of those
    # blocks. Values are identical — the projection is deterministic.
    a = synth.withColumn(
        "_bkt", lsh_bucket("embedding", planes)
    )
    a = barrier(a)
    probes = F.array(
        F.col("_bkt"),
        *[
            F.col("_bkt").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(m)
        ],
    )
    left = a.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("va"),
        F.explode(probes).alias("_bkt"),
    )
    right = a.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("vb"),
        F.col("_bkt").alias("_bktr"),
    )
    # null-safe key: blocks the inferred isnotnull(_bkt) that would
    # re-inline the m-plane sign folds into pushed scan filters (the
    # key is never null; values identical)
    # r15 (guide §2.5 AQE-explosion trap): both join inputs are a few
    # hundred KB, so AQE coalesced the bucket join to 1-2 partitions
    # while the within-bucket pair output × interpreted cosine fold is
    # the cost; explicit-N pin on the bucket key keeps it wide.
    dp = spark.sparkContext.defaultParallelism
    left = left.repartition(dp, "_bkt")
    pairs = (
        left.join(right, F.col("_bkt").eqNullSafe(F.col("_bktr")))
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine("va", "vb").alias("s"))
    )
    return (
        pairs.filter(F.col("s") >= 0.99)
        .groupBy("b_id")
        .agg(
            F.min("a_id").alias("anchor"),
            F.min_by("s", "a_id").alias("sa"),
        )
        .select(
            F.col("b_id").alias("vec_id"),
            "anchor",
            r4(F.col("sa")).alias("anchor_sim"),
        )
        .orderBy("vec_id")
    )


def _jl_projection_oracle(m: int = 8, dim: int = 64, seed: int = 11) -> str:
    """Replay of x52: identical projection-plane literals, identical
    left-associated dot/norm chains on both the raw and the projected
    vectors, so the distortion report is bit-identical."""
    from s2_spark.suite._ann_oracles import _chain, _dot_lit

    from s2_spark.functions.similarity import _hyperplanes

    planes = _hyperplanes(dim, m, seed)

    def proj_terms(vec: str) -> list[str]:
        return [f"({_dot_lit(vec, p)})" for p in planes]

    pe = proj_terms("e.v")
    pq = proj_terms("q.qe")
    pnum = " + ".join(f"{a} * {b}" for a, b in zip(pe, pq))
    pna = " + ".join(f"{a} * {a}" for a in pe)
    pnq = " + ".join(f"{b} * {b}" for b in pq)
    proj_sim = f"({pnum}) / (sqrt({pna}) * sqrt({pnq}))"
    exact = (
        f"({_chain('e.v', 'q.qe', dim)}) /"
        f" (sqrt({_chain('e.v', 'e.v', dim)}) * sqrt({_chain('q.qe', 'q.qe', dim)}))"
    )
    return (
        "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        "q AS (SELECT v AS qe FROM base WHERE vec_id = 0), "
        "e AS (SELECT vec_id, v FROM base WHERE vec_id <> 0), "
        f"s AS (SELECT e.vec_id, ({proj_sim}) AS ps, ({exact}) AS xs "
        "FROM e, q) "
        "SELECT vec_id, round(ps, 4) AS proj_sim, round(xs, 4) AS exact_sim, "
        "round(abs(ps - xs), 4) AS abs_err FROM s ORDER BY vec_id"
    )


@query(
    "x52_random_projection",
    oracle=_jl_projection_oracle(m=8, dim=64, seed=11),
    doc=(
        "Johnson-Lindenstrauss random projection as a dimensionality-"
        "reduction quality report: project every embedding onto 8 "
        "deterministic unit hyperplanes (the dim-reduce step a 100 TB "
        "ANN pipeline runs before indexing — O(n*m*dim) map-only work, "
        "ZERO shuffle: the projection matrix is plan-folded literals "
        "and the single query row is a broadcast), then report, per "
        "vector, the cosine to the query in projected space, the exact "
        "cosine in the original space, and the absolute distortion — "
        "the number that calibrates how aggressively the index tier "
        "can shrink vectors. Oracle replays the plane literals and the "
        "left-associated fold chains for bit-identical IEEE doubles."
    ),
)
def x52(spark, sf_dir):
    from functools import reduce

    from s2_spark.functions.similarity import (
        _hyperplanes,
        _query_df,
        cosine,
        dot,
    )

    emb = t(spark, sf_dir, "embeddings")
    planes = _hyperplanes(dim=64, m=8, seed=11)

    def proj(col: str):
        from s2_spark.functions.similarity import _lit_dvec

        return F.array(
            *[dot(F.col(col), _lit_dvec(p)) for p in planes]
        )

    # materialize the 8 projection folds as a COLUMN on each side
    # before any of them is referenced twice: the similarity arithmetic
    # reads pv/qv ELEMENTS, so every 64-element fold runs exactly once
    # per row (inlining them into pnum+pna made the single projection
    # expression big enough to fall out of whole-stage codegen —
    # measured 50 s warm at sf0.1 for 2k vectors; this shape is 0.5 s)
    q = _query_df(emb, "embedding", None, query_id=0).select(
        "qe", proj("qe").alias("qv")
    )
    base = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", proj("embedding").alias("pv"))
        .crossJoin(F.broadcast(q))
    )
    el = lambda c, i: F.element_at(F.col(c), i + 1)  # noqa: E731
    pnum = reduce(
        lambda a, b: a + b, [el("pv", i) * el("qv", i) for i in range(8)]
    )
    pna = reduce(
        lambda a, b: a + b, [el("pv", i) * el("pv", i) for i in range(8)]
    )
    pnq = reduce(
        lambda a, b: a + b, [el("qv", i) * el("qv", i) for i in range(8)]
    )
    ps = pnum / (F.sqrt(pna) * F.sqrt(pnq))
    xs = cosine("embedding", "qe")
    return (
        base.select("vec_id", ps.alias("_ps"), xs.alias("_xs"))
        .select(
            "vec_id",
            r4(F.col("_ps")).alias("proj_sim"),
            r4(F.col("_xs")).alias("exact_sim"),
            r4(F.abs(F.col("_ps") - F.col("_xs"))).alias("abs_err"),
        )
        .orderBy("vec_id")
    )


from s2_spark.suite._ann_oracles import neardup_clusters_oracle  # noqa: E402


@query(
    "x53_dedup_cluster_report",
    oracle=(
        "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters, "
        "CAST(cluster_size * count(*) AS BIGINT) AS n_docs "
        "FROM (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size "
        f"FROM ({neardup_clusters_oracle(k=16, bands=4)}) GROUP BY cluster) "
        "GROUP BY cluster_size ORDER BY cluster_size"
    ),
    doc=(
        "dedup audit report over the near-duplicate clusters (x30's "
        "connected components): the cluster-size histogram — how many "
        "clusters of each size, how many documents they hold — the "
        "number a curation run reads to decide keep-one-per-cluster "
        "impact before committing a 100 TB rewrite. Adds two "
        "label-keyed aggregations (both tiny: cardinality is clusters, "
        "then distinct sizes) on top of the O(n*bands) bucket-star CC; "
        "the oracle replays signatures, banding, edges, and the "
        "min-label fixpoint, then the same rollup."
    ),
)
def x53(spark, sf_dir):
    from s2_spark.functions.dedup import neardup_clusters

    d = t(spark, sf_dir, "documents")
    labels = neardup_clusters(d, k=16, bands=4)
    sizes = labels.groupBy("cluster").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").alias("n_clusters"),
            (F.col("cluster_size") * F.count("*")).alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@query(
    "x54_source_token_quantiles",
    oracle=(
        "WITH n AS (SELECT source, len(string_split(text, ' ')) AS nt "
        "FROM documents), "
        "h AS (SELECT source, nt, CAST(count(*) AS BIGINT) AS c "
        "FROM n GROUP BY source, nt), "
        "w AS (SELECT source, nt, "
        "CAST(sum(c) OVER (PARTITION BY source ORDER BY nt ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, "
        "CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS total "
        "FROM h) "
        "SELECT source, max(total) AS n_docs, "
        "min(CASE WHEN cum >= (total + 1) // 2 THEN nt END) AS p50_tokens, "
        "min(CASE WHEN cum >= (total * 9 + 9) // 10 THEN nt END) AS p90_tokens, "
        "min(CASE WHEN cum >= (total * 99 + 99) // 100 THEN nt END) AS p99_tokens "
        "FROM w GROUP BY source ORDER BY source"
    ),
    doc=(
        "EXACT per-source token-length quantiles (P50/P90/P99) via the "
        "bounded-domain histogram — the 100 TB quantile shape: one "
        "(source, n_tokens)-keyed aggregation with map-side combine "
        "(cardinality = sources x distinct lengths, NOT rows), then a "
        "source-partitioned cumulative window over the tiny histogram "
        "and the smallest length whose cumulative count reaches "
        "ceil(q*n) (type-1 quantile, pure integer thresholds). No "
        "full-data sort, no per-group value collection (Spark's exact "
        "percentile aggregate buffers every value), no approx sketch — "
        "exactness here is free because token counts are small "
        "integers. The oracle replays the identical histogram, window, "
        "and integer thresholds."
    ),
)
def x54(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    nt = F.size(F.split(F.col("text"), " ")).cast("long")
    h = (
        d.select("source", nt.alias("nt"))
        .groupBy("source", "nt")
        .agg(F.count("*").alias("c"))
    )
    win = (
        Window.partitionBy("source")
        .orderBy("nt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("source")
    w = h.select(
        "source",
        "nt",
        F.sum("c").over(win).alias("cum"),
        F.sum("c").over(tot).alias("total"),
    )

    def q_at(num: int, den: int):
        # integer `div`, NOT double `/` + floor: the double path can
        # floor to a different threshold once total*num exceeds 2^53
        # (ADVICE r10) — the doc's "pure integer thresholds" claim
        # must hold on the Spark side exactly as in the oracle
        thresh = F.expr(f"(total * {num} + {den - 1}) div {den}")
        return F.min(F.when(F.col("cum") >= thresh, F.col("nt")))

    return (
        w.groupBy("source")
        .agg(
            F.max("total").alias("n_docs"),
            q_at(1, 2).alias("p50_tokens"),
            q_at(9, 10).alias("p90_tokens"),
            q_at(99, 100).alias("p99_tokens"),
        )
        .orderBy("source")
    )


@query(
    "x55_kneser_ney_bigram",
    oracle=(
        "WITH w AS (SELECT doc_id, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws "
        "FROM documents), "
        "bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 "
        "FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)), "
        "big AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2), "
        "ctx AS (SELECT w1, count(*) AS n, count(DISTINCT w2) AS n1f "
        "FROM bg GROUP BY w1), "
        "cont AS (SELECT w2, count(*) AS n1p FROM big GROUP BY w2), "
        "tt AS (SELECT count(*) AS bt FROM big) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "round(avg(-ln(greatest(c - 0.75, 0) / n "
        "+ (0.75 * n1f / n) * (n1p / bt))), 4) AS avg_kn_surprisal "
        "FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1) "
        "JOIN cont USING (w2), tt "
        "GROUP BY doc_id ORDER BY doc_id"
    ),
    doc=(
        "Kneser-Ney smoothed bigram LM scoring — the real perplexity-"
        "filter shape (KenLM/CCNet) that x42's unsmoothed conditional "
        "approximates: P(w2|w1) = max(c(w1,w2)-d, 0)/c(w1) + "
        "(d*N1+(w1,.)/c(w1)) * N1+(.,w2)/|bigram types|, absolute "
        "discount d=0.75 with continuation-count backoff, so unseen-in-"
        "context words are scored by how many contexts they follow "
        "rather than raw frequency. Same 100 TB shape as x42: bigrams "
        "fan out in-row (one zip_with per doc), the LM tables "
        "(c, contexts+following-diversity, continuation counts) are "
        "vocabulary-cardinality hash aggregations, the type total is a "
        "broadcast scalar, and scoring is equi-joins on the bigram key "
        "— nothing scales with corpus bytes except the one scan. "
        "Oracle replays the identical counts, discount arithmetic "
        "(same association order), and per-doc mean."
    ),
)
def x55(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ws = _clean_tokens(F.col("text"))
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, F.lit(1), n1),
        F.slice(ws, F.lit(2), n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # r15 (guide §2.3/§2.4): the plan held FIVE scan+Generate chains —
    # bg for the scoring join, bg for big, bg for ctx, and big
    # re-evaluated from scratch for cont and tt (exchange reuse does
    # not fire across the branches). Checkpoint bg and big once each,
    # and build ctx FROM big: n(w1) = sum_w2 c(w1,w2) and N1+(w1,.) =
    # rows of the bigram-type table per w1 — exact identities (w1/w2
    # never null), so the per-context count-distinct no longer
    # shuffles every token occurrence, only vocabulary-sized (w1,w2,c)
    # rows. 5 chains → 1; measured 1.9 s → 1.3 s warm at sf0.1.
    bg = barrier(bg)
    big = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    big = barrier(big)
    ctx = big.groupBy("w1").agg(
        F.sum("c").alias("n"), F.count("*").alias("n1f")
    )
    # continuation count N1+(., w2) = #distinct predecessors = rows of
    # the bigram-type table per w2; type total = one broadcast scalar
    cont = big.groupBy("w2").agg(F.count("*").alias("n1p"))
    tt = big.agg(F.count("*").alias("bt"))
    p_kn = (
        F.greatest(F.col("c") - F.lit(0.75), F.lit(0.0)) / F.col("n")
        + (F.lit(0.75) * F.col("n1f") / F.col("n"))
        * (F.col("n1p") / F.col("bt"))
    )
    return (
        bg.join(big, ["w1", "w2"])
        .join(ctx, ["w1"])
        .join(cont, ["w2"])
        .crossJoin(F.broadcast(tt))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            r4(F.avg(-F.log(p_kn))).alias("avg_kn_surprisal"),
        )
        .orderBy("doc_id")
    )


@query(
    "x56_split_assignment",
    oracle=(
        "WITH h AS (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS mh "
        "FROM documents), "
        "b AS (SELECT source, "
        "(strpos('0123456789abcdef', substr(mh, 1, 1)) - 1) * 16 "
        "+ (strpos('0123456789abcdef', substr(mh, 2, 1)) - 1) AS v FROM h) "
        "SELECT source, "
        "CASE WHEN v < 204 THEN 'train' WHEN v < 230 THEN 'val' "
        "ELSE 'test' END AS split, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM b GROUP BY source, split ORDER BY source, split"
    ),
    doc=(
        "deterministic train/val/test split assignment with a per-"
        "source stratification report: the split is a pure function of "
        "md5(doc_id) (first byte: <204 train ~80%, <230 val ~10%, rest "
        "test), so it is stable across runs, machines, and re-shards — "
        "the property that keeps eval sets uncontaminated when a 100 TB "
        "corpus is re-processed. One map-only hash + one partial-agg "
        "rollup; no shuffle carries document text. The report is what a "
        "curation run checks for per-source split skew before training. "
        "Oracle replays the hex-digit decode and thresholds exactly."
    ),
)
def x56(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    h = d.select(
        "source", F.md5(F.col("doc_id").cast("string")).alias("mh")
    )

    def nib(pos: int):
        # hex digit -> 0..15 via position in the alphabet (the same
        # portable decode the simhash oracle uses — no conv/from_hex
        # dependence on either engine)
        return F.expr(
            f"locate(substr(mh, {pos}, 1), '0123456789abcdef') - 1"
        )

    v = nib(1) * 16 + nib(2)
    split = (
        F.when(v < 204, F.lit("train"))
        .when(v < 230, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        h.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "split")
    )


def _hll_oracle() -> str:
    """Replay of x57's deterministic HyperLogLog: identical md5-derived
    bucket/rank splits, integer-exact register sums (2^(55-rho) in
    BIGINT — no float reassociation anywhere in the sketch), identical
    small-range linear-counting switch."""
    hexes = "0123456789abcdef"
    w = " + ".join(
        f"(strpos('{hexes}', substr(mh, {3 + i}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    )
    rho = (
        "CASE "
        + " ".join(
            f"WHEN w >= {1 << (48 - r)} THEN {r}" for r in range(1, 49)
        )
        + " ELSE 49 END"
    )
    return (
        "WITH h AS (SELECT source, md5(text) AS mh FROM documents), "
        "d AS (SELECT source, mh, "
        "((strpos('0123456789abcdef', substr(mh, 1, 1)) - 1) * 16 "
        "+ (strpos('0123456789abcdef', substr(mh, 2, 1)) - 1)) % 64 AS b, "
        f"({w}) AS w FROM h), "
        f"r AS (SELECT source, b, max({rho}) AS rho, count(*) AS nd "
        "FROM d GROUP BY source, b), "
        "s AS (SELECT source, CAST(sum(nd) AS BIGINT) AS n_docs, "
        "CAST(sum((1::BIGINT << (55 - rho))) "
        "+ (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS int_sum, "
        "64 - count(*) AS zeros "
        "FROM r GROUP BY source), "
        "sx AS (SELECT source, CAST(count(DISTINCT mh) AS BIGINT) AS xd "
        "FROM h GROUP BY source), "
        "e AS (SELECT s.source, n_docs, xd AS exact_distinct, zeros, "
        "(0.709 * 4096 * 36028797018963968) / int_sum AS raw "
        "FROM s JOIN sx ON s.source = sx.source) "
        "SELECT source, n_docs, exact_distinct, "
        "round(CASE WHEN raw <= 160.0 AND zeros > 0 "
        "THEN 64.0 * ln(64.0 / zeros) ELSE raw END, 4) AS hll_estimate, "
        "round(abs(CASE WHEN raw <= 160.0 AND zeros > 0 "
        "THEN 64.0 * ln(64.0 / zeros) ELSE raw END - exact_distinct) "
        "/ exact_distinct, 4) AS rel_err "
        "FROM e ORDER BY source"
    )


@query(
    "x57_hll_cardinality",
    oracle=_hll_oracle(),
    doc=(
        "deterministic HyperLogLog distinct-count sketch per source "
        "(Flajolet et al. 2007), verified END TO END against the exact "
        "answer: md5(text) splits into a 6-bit bucket and a 48-bit "
        "rank word, registers are max leading-zero ranks per bucket, "
        "and the harmonic sum is computed as an EXACT BIGINT (each "
        "term 2^(55-rho), empty buckets 2^55) so no float "
        "reassociation can make the sketch engine-dependent — the only "
        "floats are the final alpha*m^2*2^55/int_sum division and the "
        "small-range linear-counting branch, both deterministic on "
        "exact integer inputs. At 100 TB this is THE cardinality "
        "shape: the shuffle carries at most 64 register rows per "
        "source (not the distinct set), merging is a max — here the "
        "exact count rides alongside only to hash-verify the sketch "
        "and report its relative error."
    ),
)
def x57(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("mh"))
    hexes = "0123456789abcdef"
    nib1 = F.expr(f"locate(substr(mh, 1, 1), '{hexes}') - 1")
    nib2 = F.expr(f"locate(substr(mh, 2, 1), '{hexes}') - 1")
    b = (nib1 * 16 + nib2) % 64
    w = F.conv(F.substring("mh", 3, 12), 16, 10).cast("long")
    dd = h.select("source", "mh", b.alias("b"), w.alias("w"))
    rho = F.lit(None)
    expr = None
    for r in range(1, 49):
        cond = F.col("w") >= F.lit(1 << (48 - r))
        expr = F.when(cond, r) if expr is None else expr.when(cond, r)
    rho = expr.otherwise(F.lit(49))
    regs = dd.groupBy("source", "b").agg(
        F.max(rho).alias("rho"), F.count("*").alias("nd")
    )
    per_src = regs.groupBy("source").agg(
        F.sum("nd").alias("n_docs"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - rho AS INT))"))
            + (F.lit(64) - F.count("*")) * F.lit(1 << 55)
        ).cast("long").alias("int_sum"),
        (F.lit(64) - F.count("*")).alias("zeros"),
    )
    exact = h.groupBy("source").agg(
        F.countDistinct("mh").alias("exact_distinct")
    )
    raw = (F.lit(0.709) * F.lit(4096) * F.lit(1 << 55)) / F.col("int_sum")
    est = F.when(
        (raw <= F.lit(160.0)) & (F.col("zeros") > 0),
        F.lit(64.0) * F.log(F.lit(64.0) / F.col("zeros")),
    ).otherwise(raw)
    return (
        per_src.join(exact, "source")
        .select(
            "source",
            "n_docs",
            "exact_distinct",
            r4(est).alias("hll_estimate"),
            r4(F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct")).alias(
                "rel_err"
            ),
        )
        .orderBy("source")
    )


def _cms_oracle(depth: int = 4, width: int = 256, k: int = 10) -> str:
    """Replay of x58's count-min sketch: identical md5-byte hash rows,
    identical counter table, identical min-over-rows estimates — all
    integer, so the sketch is bit-identical across engines."""
    hexes = "0123456789abcdef"

    def bucket(j: int) -> str:
        return (
            f"(strpos('{hexes}', substr(mh, {2 * j + 1}, 1)) - 1) * 16 "
            f"+ (strpos('{hexes}', substr(mh, {2 * j + 2}, 1)) - 1)"
        )

    rows = " UNION ALL ".join(
        f"SELECT tok, {j} AS j, {bucket(j)} AS b FROM th"
        for j in range(depth)
    )
    return (
        "WITH toks AS (SELECT unnest(list_filter(string_split(lower(text), "
        "' '), x -> x <> '')) AS tok FROM documents), "
        "th AS (SELECT tok, md5(tok) AS mh FROM toks), "
        f"tb AS ({rows}), "
        "cnt AS (SELECT j, b, CAST(count(*) AS BIGINT) AS c "
        "FROM tb GROUP BY j, b), "
        "est AS (SELECT tok, min(c) AS cms_est FROM (SELECT DISTINCT tok, j, b "
        "FROM tb) d JOIN cnt USING (j, b) GROUP BY tok), "
        "ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count "
        "FROM toks GROUP BY tok) "
        "SELECT tok, exact_count, cms_est, "
        "cms_est - exact_count AS overestimate "
        "FROM est JOIN ex USING (tok) "
        f"ORDER BY cms_est DESC, tok LIMIT {k}"
    )


@query(
    "x58_cms_heavy_hitters",
    oracle=_cms_oracle(depth=4, width=256, k=10),
    doc=(
        "count-min sketch heavy hitters (Cormode & Muthukrishnan 2005), "
        "verified end to end: 4 hash rows x 256 buckets (row j's bucket "
        "= byte j of md5(token)), token frequency estimated as the MIN "
        "of its 4 counters — never an underestimate, so the top-k by "
        "estimate is a superset-biased heavy-hitter report. The whole "
        "sketch is integer arithmetic on md5 bytes: bit-identical "
        "across engines, no float anywhere. At 100 TB the counter "
        "table is the point — 1024 cells regardless of vocabulary, "
        "mergeable by addition, one map-side-combined aggregation over "
        "the token stream; the exact per-token counts ride alongside "
        "only to verify the sketch and expose each hitter's "
        "overestimate (collision mass)."
    ),
)
def x58(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(_clean_tokens(F.col("text"))).alias("tok")
    )
    th = toks.select("tok", F.md5("tok").alias("mh"))
    hexes = "0123456789abcdef"

    def bucket(j: int):
        return F.expr(
            f"(locate(substr(mh, {2 * j + 1}, 1), '{hexes}') - 1) * 16 "
            f"+ (locate(substr(mh, {2 * j + 2}, 1), '{hexes}') - 1)"
        )

    tb = th.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bucket(j).alias("b")
                    )
                    for j in range(4)
                ]
            )
        ).alias("p"),
    ).select("tok", F.col("p.j").alias("j"), F.col("p.b").alias("b"))
    cnt = tb.groupBy("j", "b").agg(F.count("*").alias("c"))
    est = (
        tb.distinct()
        .join(F.broadcast(cnt), ["j", "b"])
        .groupBy("tok")
        .agg(F.min("c").alias("cms_est"))
    )
    ex = toks.groupBy("tok").agg(F.count("*").alias("exact_count"))
    return (
        est.join(ex, "tok")
        .select(
            "tok",
            "exact_count",
            "cms_est",
            (F.col("cms_est") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("cms_est"), "tok")
        .limit(10)
    )


def _bloom_oracle(m_bits: int = 2048, k_hashes: int = 4, mod: int = 97) -> str:
    """Replay of x59's Bloom filter: identical md5-derived bit
    positions (3 hex digits per hash, mod m), identical bit set,
    identical all-k-positions-present membership rule — all integer,
    bit-identical across engines."""
    hexes = "0123456789abcdef"

    def pos(j: int) -> str:
        digits = " + ".join(
            f"(strpos('{hexes}', substr(mh, {3 * j + 1 + i}, 1)) - 1) "
            f"* {16 ** (2 - i)}"
            for i in range(3)
        )
        return f"(({digits}) % {m_bits})"

    probes = " UNION ALL ".join(
        f"SELECT doc_id, source, {pos(j)} AS p FROM h" for j in range(k_hashes)
    )
    blockbits = " UNION ".join(
        f"SELECT {pos(j)} AS p FROM h WHERE doc_id % {mod} = 0"
        for j in range(k_hashes)
    )
    return (
        "WITH h AS (SELECT doc_id, source, md5(text) AS mh FROM documents), "
        f"bits AS ({blockbits}), "
        f"pr AS ({probes}), "
        "hits AS (SELECT doc_id, source, "
        f"CAST(sum(CASE WHEN bits.p IS NOT NULL THEN 1 ELSE 0 END) = {k_hashes} "
        "AS INTEGER) AS in_bloom "
        "FROM pr LEFT JOIN bits ON pr.p = bits.p GROUP BY doc_id, source), "
        "tr AS (SELECT d.doc_id, "
        "CAST(max(CASE WHEN b.mh IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) "
        "AS is_true FROM (SELECT doc_id, md5(text) AS mh FROM documents) d "
        f"LEFT JOIN (SELECT DISTINCT md5(text) AS mh FROM documents "
        f"WHERE doc_id % {mod} = 0) b ON d.mh = b.mh GROUP BY d.doc_id) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(in_bloom) AS BIGINT) AS bloom_hits, "
        "CAST(sum(is_true) AS BIGINT) AS true_hits, "
        "CAST(sum(in_bloom) - sum(is_true) AS BIGINT) AS false_positives "
        "FROM hits JOIN tr USING (doc_id) "
        "GROUP BY source ORDER BY source"
    )


@query(
    "x59_bloom_blocklist",
    oracle=_bloom_oracle(m_bits=2048, k_hashes=4, mod=97),
    doc=(
        "Bloom-filter blocklist probe, verified end to end — the third "
        "sketch of the trilogy (x57 cardinality, x58 frequency, x59 "
        "membership): a deterministic blocklist (every 97th document) "
        "hashes into a 2048-bit filter via 4 md5-derived positions; "
        "every document probes the filter (member iff ALL 4 positions "
        "are set) and the per-source report compares bloom hits with "
        "exact digest membership, surfacing the false-positive mass. "
        "The 100 TB point: the BIT SET (<= 2048 rows, broadcastable) "
        "replaces shipping the blocklist itself to every probe — "
        "membership never touches the blocklist texts — and the whole "
        "sketch is integer md5 arithmetic, bit-identical across "
        "engines; the exact anti-join side rides along only as the "
        "verification companion."
    ),
)
def x59(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    h = d.select("source", "doc_id", F.md5("text").alias("mh"))
    hexes = "0123456789abcdef"

    def pos(j: int):
        return F.expr(
            " + ".join(
                f"(locate(substr(mh, {3 * j + 1 + i}, 1), '{hexes}') - 1) "
                f"* {16 ** (2 - i)}"
                for i in range(3)
            )
        ) % 2048

    karr = F.array(*[pos(j) for j in range(4)])
    bits = (
        h.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(karr).alias("p"))
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    pr = h.select("doc_id", "source", F.explode(karr).alias("p"))
    hits = (
        pr.join(F.broadcast(bits), "p", "left")
        .groupBy("doc_id", "source")
        .agg((F.sum(F.coalesce(F.col("_set"), F.lit(0))) == 4).cast("int").alias("in_bloom"))
    )
    block = (
        h.filter(F.col("doc_id") % 97 == 0).select("mh").distinct()
        .withColumn("_blk", F.lit(1))
    )
    tr = (
        h.join(F.broadcast(block), "mh", "left")
        .groupBy("doc_id")
        .agg(F.max(F.coalesce(F.col("_blk"), F.lit(0))).cast("int").alias("is_true"))
    )
    return (
        hits.join(tr, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("in_bloom").alias("bloom_hits"),
            F.sum("is_true").alias("true_hits"),
            (F.sum("in_bloom") - F.sum("is_true")).alias("false_positives"),
        )
        .orderBy("source")
    )


@query(
    "x60_gapfill_locf",
    oracle=(
        "WITH e AS (SELECT event_type, "
        # true FLOOR of the epoch-hour quotient, matching the Spark
        # side's F.floor(unix_timestamp/3600) — DuckDB's integer `//`
        # truncates toward zero, which diverges by one bucket on
        # pre-1970 (negative-epoch) timestamps (ADVICE r11)
        "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, value FROM events), "
        "agg AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n_events, "
        "sum(value) AS sv FROM e GROUP BY event_type, h), "
        "b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e), "
        "ty AS (SELECT DISTINCT event_type FROM e), "
        "grid AS (SELECT event_type, gs.h FROM ty, b, "
        "unnest(generate_series(b.h0, b.h1)) AS gs(h)), "
        "f AS (SELECT grid.event_type, grid.h, "
        "coalesce(agg.n_events, 0) AS n_events, agg.sv "
        "FROM grid LEFT JOIN agg USING (event_type, h)), "
        "w AS (SELECT event_type, h, n_events, sv, "
        "last_value(sv IGNORE NULLS) OVER (PARTITION BY event_type "
        "ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS locf FROM f) "
        "SELECT event_type, h AS hour_epoch, n_events, "
        "round(sv, 4) AS bucket_sum, round(locf, 4) AS locf_sum, "
        "CAST(CASE WHEN n_events = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_gap "
        "FROM w ORDER BY event_type, hour_epoch"
    ),
    doc=(
        "time-series gap filling with last-observation-carried-forward "
        "interpolation: hourly buckets per event type over the global "
        "time range, empty buckets materialized from a generated grid "
        "(types x sequence(min_hour, max_hour) — the dense axis a "
        "dashboard or a training-curriculum sampler needs; a naive "
        "groupBy silently omits gaps) and their value carried forward "
        "by the last non-null window. The grid bounds are one broadcast "
        "1-row aggregate; the fill windows are event_type-PARTITIONED "
        "(never a global sort); grid cardinality = types x hours, "
        "independent of event count — at 100 TB the dense grid is "
        "MUCH smaller than the raw events it summarizes. Oracle "
        "replays bucketing (identical integer epoch-hour floor), the "
        "grid, and the LOCF window."
    ),
)
def x60(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select(
        "event_type",
        # FLOOR division, not `div` (which truncates toward zero):
        # pre-1970 timestamps have negative epochs, where truncation
        # and the oracle's floor semantics differ by one bucket
        # (ADVICE r10)
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        "value",
    )
    agg = e.groupBy("event_type", "h").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("sv")
    )
    bounds = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
        )
    )
    full = grid.join(agg, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sv",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return full.select(
        "event_type",
        F.col("h").alias("hour_epoch"),
        "n_events",
        r4(F.col("sv")).alias("bucket_sum"),
        r4(F.last("sv", ignorenulls=True).over(w)).alias("locf_sum"),
        (F.col("n_events") == 0).cast("int").alias("is_gap"),
    ).orderBy("event_type", "hour_epoch")


_HEAPS_PCTS = (1, 5, 25, 50, 100)


@query(
    "x62_heaps_vocab_growth",
    oracle=(
        "WITH toks AS (SELECT doc_id, unnest(list_filter("
        "string_split(lower(text), ' '), x -> x <> '')) AS tok "
        "FROM documents), "
        "first AS (SELECT tok, min(doc_id) AS first_doc FROM toks "
        "GROUP BY tok), "
        "perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok "
        "FROM toks GROUP BY doc_id), "
        "bound AS (SELECT max(doc_id) + 1 AS n FROM documents), "
        "grid AS (SELECT p, (n * p) // 100 AS thr FROM bound, "
        f"(VALUES {', '.join(f'({p})' for p in _HEAPS_PCTS)}) AS v(p)) "
        "SELECT p AS pct, "
        "(SELECT CAST(count(*) AS BIGINT) FROM documents "
        " WHERE doc_id < thr) AS prefix_docs, "
        "(SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM perdoc "
        " WHERE doc_id < thr) AS prefix_tokens, "
        "(SELECT CAST(count(*) AS BIGINT) FROM first "
        " WHERE first_doc < thr) AS vocab "
        "FROM grid ORDER BY pct"
    ),
    doc=(
        "Heaps'-law vocabulary growth curve: distinct-token count over "
        "growing doc_id prefixes (1/5/25/50/100% of the id domain, "
        "integer-div thresholds). The scale trick: vocabulary-in-"
        "prefix is NOT a count-distinct per prefix — each token "
        "reduces to its FIRST document (one groupBy over tokens), and "
        "every prefix answer is then a count over that tiny relation, "
        "so five prefixes cost one token shuffle, not five. At 100 TB "
        "the shuffle carries (token, min(doc_id)) pairs and the grid "
        "fan-out is a broadcast of five rows. All integers end to end."
    ),
)
def x62(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    # r16 (guide §2.4): `toks` feeds two aggregations with different
    # keys (first-doc per token, token count per doc), and Spark
    # reuses exchanges, not scans — the tokenize+explode chain ran
    # once per branch (plan: 2 scans + 2 Generates). One barrier, one
    # evaluation; the checkpointed relation is (long, short token).
    toks = barrier(
        d.select(
            "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
        ).filter(F.col("tok") != "")
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    perdoc = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    grid = (
        d.agg((F.max("doc_id") + 1).alias("n"))
        .select(
            F.explode(
                F.array(*[F.lit(p) for p in _HEAPS_PCTS])
            ).alias("p"),
            "n",
        )
        .select("p", F.expr("(n * p) div 100").alias("thr"))
    )
    vocab = (
        first.crossJoin(F.broadcast(grid))
        .groupBy("p")
        .agg(
            F.sum(
                F.when(F.col("first_doc") < F.col("thr"), 1).otherwise(0)
            ).alias("vocab")
        )
    )
    docs = (
        d.select("doc_id")
        .crossJoin(F.broadcast(grid))
        .groupBy("p")
        .agg(
            F.sum(
                F.when(F.col("doc_id") < F.col("thr"), 1).otherwise(0)
            ).alias("prefix_docs")
        )
    )
    ntok = (
        perdoc.crossJoin(F.broadcast(grid))
        .groupBy("p")
        .agg(
            F.sum(
                F.when(F.col("doc_id") < F.col("thr"), F.col("n_tok")).otherwise(
                    F.lit(0)
                )
            ).alias("prefix_tokens")
        )
    )
    return (
        docs.join(ntok, "p")
        .join(vocab, "p")
        .select(
            F.col("p").alias("pct"),
            "prefix_docs",
            "prefix_tokens",
            "vocab",
        )
        .orderBy("pct")
    )


@query(
    "x63_source_lift_keywords",
    oracle=(
        "WITH toks AS (SELECT source, unnest(list_filter("
        "string_split(lower(text), ' '), x -> x <> '')) AS tok "
        "FROM documents), "
        "st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_st "
        "FROM toks GROUP BY source, tok), "
        "s AS (SELECT source, CAST(count(*) AS BIGINT) AS c_s "
        "FROM toks GROUP BY source), "
        "tk AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_t "
        "FROM toks GROUP BY tok), "
        "tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks), "
        "lifts AS (SELECT source, tok, c_st, "
        "(c_st * n) / (c_s * c_t) AS lift_raw "
        "FROM st JOIN tk USING (tok) JOIN s USING (source), tot "
        "WHERE c_st >= 5), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY source "
        "ORDER BY lift_raw DESC, tok) AS rn FROM lifts) "
        "SELECT source, tok, c_st, round(lift_raw, 4) AS lift "
        "FROM ranked WHERE rn <= 5 ORDER BY source, lift DESC, tok"
    ),
    doc=(
        "per-source characteristic keywords by lift: lift(tok|src) = "
        "p(tok|src)/p(tok) computed as (c_st*N)/(c_s*c_t) — a single "
        "double division of exact BIGINT products (products stay under "
        "2^53 on the fixture domain, so the engines' long->double "
        "conversions are bit-identical and the top-5 per source "
        "agrees without tolerance; tie-break on token). Shuffle shape "
        "at 100 TB: one token-level groupBy + one token-keyed join; "
        "per-source totals and the global count are broadcast "
        "one-row/one-per-source aggregates, never a re-scan."
    ),
)
def x63(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(_tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("c_st"))
    s = toks.groupBy("source").agg(F.count("*").alias("c_s"))
    tk = toks.groupBy("tok").agg(F.count("*").alias("c_t"))
    tot = toks.agg(F.count("*").alias("n"))
    lifts = (
        st.join(tk, "tok")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c_st") >= 5)
        .withColumn(
            "lift_raw",
            (F.col("c_st") * F.col("n")) / (F.col("c_s") * F.col("c_t")),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("lift_raw"), "tok")
    )
    return (
        lifts.withColumn("rn", rn)
        .filter(F.col("rn") <= 5)
        .select("source", "tok", "c_st", r4(F.col("lift_raw")).alias("lift"))
        .orderBy("source", F.desc("lift"), "tok")
    )


def _matryoshka_oracle(prefix_dim: int = 16, dim: int = 64, nq: int = 8) -> str:
    """Replay of x64: identical left-associated dot-product chains for
    the full-dim and prefix-dim cosines (the Spark side's F.aggregate
    fold order), identical (sim DESC, vec_id) argmax."""
    from s2_spark.suite._ann_oracles import _chain

    full = (
        f"({_chain('v', 'qv', dim)}) / "
        f"(sqrt({_chain('v', 'v', dim)}) * sqrt({_chain('qv', 'qv', dim)}))"
    )
    pref = (
        f"({_chain('v', 'qv', prefix_dim)}) / "
        f"(sqrt({_chain('v', 'v', prefix_dim)})"
        f" * sqrt({_chain('qv', 'qv', prefix_dim)}))"
    )
    return (
        f"WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv "
        f"FROM embeddings WHERE vec_id < {nq}), "
        f"c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE vec_id >= {nq}), "
        f"sims AS (SELECT qid, vec_id, {full} AS sf, {pref} AS sp "
        "FROM c, q), "
        "tf AS (SELECT qid, vec_id AS full_top1, sf AS full_sim, "
        "row_number() OVER (PARTITION BY qid ORDER BY sf DESC, vec_id) "
        "AS rn FROM sims), "
        "tp AS (SELECT qid, vec_id AS prefix_top1, sp AS prefix_sim, "
        "row_number() OVER (PARTITION BY qid ORDER BY sp DESC, vec_id) "
        "AS rn FROM sims) "
        "SELECT tf.qid AS query_id, full_top1, prefix_top1, "
        "CAST(full_top1 = prefix_top1 AS INTEGER) AS agree, "
        "round(full_sim, 4) AS full_sim, round(prefix_sim, 4) AS prefix_sim "
        "FROM tf JOIN tp ON tf.qid = tp.qid AND tf.rn = 1 AND tp.rn = 1 "
        "ORDER BY query_id"
    )


@query(
    "x64_matryoshka_agreement",
    oracle=_matryoshka_oracle(),
    doc=(
        "Matryoshka-style truncation quality report: for 8 query "
        "vectors, the exact cosine top-1 neighbor at full dim (64) vs "
        "the top-1 using only the 16-dim PREFIX of the same vectors — "
        "the agreement rate is the measured cost of searching truncated "
        "embeddings (the memory/recall dial real ANN deployments turn). "
        "Both argmaxes are driver-free groupBy max(struct(sim, -id)) "
        "aggregations over a broadcast 8-row query join; dot products "
        "are left-associated F.aggregate folds replayed term-for-term "
        "in the oracle, so both engines pick identical winners. At "
        "100 TB this is one broadcast-fan-out scan: no pairwise "
        "corpus x corpus join, prefix cosine reuses the same row."
    ),
)
def x64(spark, sf_dir):
    nq, prefix_dim = 8, 16
    emb = t(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    q = (
        emb.filter(F.col("vec_id") < nq)
        .select(F.col("vec_id").alias("qid"), dbl(F.col("embedding")).alias("qv"))
    )
    c = emb.filter(F.col("vec_id") >= nq).select(
        "vec_id", dbl(F.col("embedding")).alias("v")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # r15 (guide §1.2 per-task work): norms do not depend on the PAIR,
    # but the inlined cos() recomputed dot(v,v) once per query (8x per
    # corpus row) and dot(qv,qv) once per corpus row — 240 interpreted
    # fold steps per pair. Hoist each side's prefix slice and both
    # norms below the cross join (one evaluation per row); the pair
    # then pays only the two cross dots (80 steps). The arithmetic is
    # unchanged — same folds, same sqrt, same corpus-norm*query-norm
    # multiplication order — so every IEEE double is bit-identical.
    c2 = c.select(
        "vec_id",
        "v",
        F.slice(F.col("v"), 1, prefix_dim).alias("pv"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv_f"),
        F.sqrt(
            dot(
                F.slice(F.col("v"), 1, prefix_dim),
                F.slice(F.col("v"), 1, prefix_dim),
            )
        ).alias("nv_p"),
    )
    q2 = q.select(
        "qid",
        "qv",
        F.slice(F.col("qv"), 1, prefix_dim).alias("pq"),
        F.sqrt(dot(F.col("qv"), F.col("qv"))).alias("nq_f"),
        F.sqrt(
            dot(
                F.slice(F.col("qv"), 1, prefix_dim),
                F.slice(F.col("qv"), 1, prefix_dim),
            )
        ).alias("nq_p"),
    )
    sims = c2.crossJoin(F.broadcast(q2)).select(
        "qid",
        "vec_id",
        (dot(F.col("v"), F.col("qv")) / (F.col("nv_f") * F.col("nq_f"))).alias("sf"),
        (dot(F.col("pv"), F.col("pq")) / (F.col("nv_p") * F.col("nq_p"))).alias("sp"),
    )
    top = sims.groupBy("qid").agg(
        F.max(F.struct(F.col("sf").alias("s"), (-F.col("vec_id")).alias("nv"))).alias(
            "mf"
        ),
        F.max(F.struct(F.col("sp").alias("s"), (-F.col("vec_id")).alias("nv"))).alias(
            "mp"
        ),
    )
    return top.select(
        F.col("qid").alias("query_id"),
        (-F.col("mf.nv")).alias("full_top1"),
        (-F.col("mp.nv")).alias("prefix_top1"),
        (F.col("mf.nv") == F.col("mp.nv")).cast("int").alias("agree"),
        r4(F.col("mf.s")).alias("full_sim"),
        r4(F.col("mp.s")).alias("prefix_sim"),
    ).orderBy("query_id")


@query(
    "x65_stratified_sample",
    oracle=(
        "WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s "
        "FROM documents GROUP BY source), "
        "r AS (SELECT doc_id, source, row_number() OVER "
        "(PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) "
        "AS rn FROM documents) "
        "SELECT r.doc_id, r.source, CAST(rn AS BIGINT) AS rank_in_stratum "
        "FROM r JOIN n USING (source) "
        "WHERE rn <= (n_s + 9) // 10 "
        "ORDER BY source, rank_in_stratum"
    ),
    doc=(
        "deterministic stratified 10% sample with EXACT per-stratum "
        "quotas: quota = ceil(n_s/10) by integer arithmetic, membership "
        "= the quota smallest docs by md5(doc_id) (a uniform, seedless, "
        "engine-portable order — rerunning or re-sharding the corpus "
        "reproduces the identical sample, the property training-data "
        "pipelines need for auditable subsets). One count aggregate + "
        "one per-stratum rank window; at 100 TB the window partitions "
        "by stratum and never globally sorts."
    ),
)
def x65(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    n = d.groupBy("source").agg(F.count("*").alias("n_s"))
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", rn)
        .join(F.broadcast(n), "source")
        .filter(F.col("rn") <= F.expr("(n_s + 9) div 10"))
        .select(
            "doc_id",
            "source",
            F.col("rn").cast("long").alias("rank_in_stratum"),
        )
        .orderBy("source", "rank_in_stratum")
    )


@query(
    "x66_pmi_collocations",
    oracle=(
        "WITH toks AS (SELECT doc_id, list_filter("
        "string_split(lower(text), ' '), x -> x <> '') AS tk "
        "FROM documents), "
        "uni AS (SELECT unnest(tk) AS w FROM toks), "
        "ucnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni "
        "GROUP BY w), "
        "nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni), "
        "bi AS (SELECT tk[i] AS w1, tk[i+1] AS w2 FROM toks, "
        "unnest(range(1, len(tk))) AS r(i) WHERE len(tk) >= 2), "
        "bcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy "
        "FROM bi GROUP BY w1, w2), "
        "nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM bi), "
        "pmi AS (SELECT w1, w2, c_xy, "
        "ln((c_xy * n * n) / (n_b * a.c * b.c)) AS pmi_raw "
        "FROM bcnt JOIN ucnt a ON w1 = a.w JOIN ucnt b ON w2 = b.w, "
        "nu, nb WHERE c_xy >= 5) "
        "SELECT w1, w2, c_xy, round(pmi_raw, 4) AS pmi FROM pmi "
        "ORDER BY pmi_raw DESC, w1, w2 LIMIT 15"
    ),
    doc=(
        "PMI collocation mining: top-15 adjacent bigrams by pointwise "
        "mutual information ln(p(xy)/(p(x)p(y))) with p(xy)=c_xy/N_bi, "
        "p(w)=c_w/N_uni — evaluated as ONE ln of ONE division of exact "
        "BIGINT products, so both engines see identical doubles and "
        "the ranking needs no tolerance. Bigrams are built IN-ROW "
        "(zip_with over the token array against its own shift) — the "
        "shuffle carries (w1, w2) pairs, and the unigram join is "
        "vocabulary-sized, the same 100 TB shape as the x55 "
        "Kneser-Ney table."
    ),
)
def x66(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = F.filter(_tokens(F.col("text")), lambda x: x != F.lit(""))
    # r16 (guide §2.4): the tokenize projection fed FOUR branches
    # (unigram counts, unigram total, bigram counts, bigram total) —
    # 5 scans in the before-plan. The totals are exact identities of
    # the count tables (count(*) over occurrences == sum of group
    # counts — both BIGINT), so they no longer re-evaluate anything;
    # the one barrier makes the remaining two explodes share a single
    # tokenize pass.
    docs = barrier(d.select(tk.alias("tk")))
    uni = docs.select(F.explode("tk").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    nu = ucnt.agg(F.sum("c").alias("n"))
    pairs = F.when(
        F.size("tk") >= 2,
        F.zip_with(
            F.slice(F.col("tk"), 1, F.size("tk") - 1),
            F.slice(F.col("tk"), 2, F.size("tk") - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1 string, w2 string>>"))
    bi = docs.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    bcnt = bi.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    nb = bcnt.agg(F.sum("c_xy").alias("n_b"))
    a = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    b = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    pmi_raw = F.log(
        (F.col("c_xy") * F.col("n") * F.col("n"))
        / (F.col("n_b") * F.col("c_x") * F.col("c_y"))
    )
    return (
        bcnt.join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .filter(F.col("c_xy") >= 5)
        .withColumn("pmi_raw", pmi_raw)
        .orderBy(F.desc("pmi_raw"), "w1", "w2")
        .limit(15)
        .select("w1", "w2", "c_xy", r4(F.col("pmi_raw")).alias("pmi"))
    )


@query(
    "x67_sessionization",
    oracle=(
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us "
        "FROM events), "
        "g AS (SELECT user_id, event_id, us, us - lag(us) OVER "
        "(PARTITION BY user_id ORDER BY us, event_id) AS gap FROM e), "
        "s AS (SELECT user_id, CAST(sum(CASE WHEN gap IS NULL OR "
        "gap > 1800000000 THEN 1 ELSE 0 END) OVER "
        "(PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid "
        "FROM g), "
        "per AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n "
        "FROM s GROUP BY user_id, sid) "
        "SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions, "
        "CAST(sum(n) AS BIGINT) AS n_events, "
        "CAST(max(n) AS BIGINT) AS max_session_events "
        "FROM per GROUP BY user_id ORDER BY user_id"
    ),
    doc=(
        "user sessionization with a 30-minute inactivity gap: session "
        "boundaries from integer-microsecond deltas (exact on both "
        "engines — no float time math), session ids as a running sum "
        "of boundary flags, then per-user session stats. The window "
        "partitions by user_id — the unit of parallelism — and never "
        "globally sorts; at 100 TB this is the canonical event-stream "
        "shape: one shuffle on the user key serves the lag, the "
        "running sum, and the rollup."
    ),
)
def x67(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # ts may arrive as TIMESTAMP_NTZ (micros fixture) or TIMESTAMP
        # (normalized nanos fixture); the session TZ is UTC, so the
        # cast is value-preserving and unix_micros == DuckDB epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sid = F.sum(new_s).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    per = (
        e.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n"))
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.max("sid").alias("n_sessions"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@query(
    "x68_decontamination_overlap",
    oracle=(
        "WITH d AS (SELECT doc_id, "
        "CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(doc_id "
        "AS VARCHAR)), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', "
        "substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 204 "
        "THEN 'train' WHEN (strpos('0123456789abcdef', substr(md5("
        "CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + (strpos("
        "'0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, "
        "1)) - 1) < 230 THEN 'val' ELSE 'test' END AS split, "
        "list_filter(string_split(lower(text), ' '), x -> x <> '') "
        "AS tk FROM documents), "
        "grams AS (SELECT doc_id, split, "
        "md5(array_to_string(tk[i:i+7], ' ')) AS g "
        "FROM d, unnest(range(1, len(tk) - 6)) AS r(i) "
        "WHERE len(tk) >= 8), "
        "tg AS (SELECT DISTINCT g FROM grams WHERE split = 'train'), "
        "ev AS (SELECT DISTINCT doc_id, split, g FROM grams "
        "WHERE split <> 'train'), "
        "hit AS (SELECT ev.doc_id, ev.split, ev.g FROM ev "
        "JOIN tg USING (g)) "
        "SELECT split, "
        "(SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM ev e2 "
        " WHERE e2.split = s.split) AS n_docs, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_contaminated, "
        "CAST(count(DISTINCT g) AS BIGINT) AS n_shared_grams "
        "FROM hit s GROUP BY split ORDER BY split"
    ),
    doc=(
        "train/eval decontamination report over the x56 deterministic "
        "split: an eval (val/test) document is contaminated when any "
        "of its 8-gram shingles appears in ANY train document — the "
        "n-gram-overlap rule eval suites apply before trusting a "
        "benchmark number. Grams are built IN-ROW and immediately "
        "reduced to md5 digests, so the shuffle and the semi-join "
        "carry 16-byte hashes, never text; the train side dedupes to "
        "distinct grams before the join. At 100 TB: one gram-digest "
        "shuffle each side + one digest-keyed join."
    ),
)
def x68(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    b = F.expr(
        "(locate(substr(md5(CAST(doc_id AS STRING)), 1, 1), "
        "'0123456789abcdef') - 1) * 16 + "
        "(locate(substr(md5(CAST(doc_id AS STRING)), 2, 1), "
        "'0123456789abcdef') - 1)"
    )
    split = (
        F.when(b < 204, "train").when(b < 230, "val").otherwise("test")
    )
    tk = F.filter(_tokens(F.col("text")), lambda x: x != F.lit(""))
    docs = d.select("doc_id", split.alias("split"), tk.alias("tk")).filter(
        F.size("tk") >= 8
    )
    grams = docs.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 7), "
                "i -> md5(concat_ws(' ', slice(tk, i, 8))))"
            )
        ).alias("g"),
    )
    # single-projection rollup (r13): the old tg/ev/hit diamond
    # re-evaluated the tokenize+md5-gram projection per branch
    return (
        _contamination_report(grams, docs)
        .select(
            "split", "n_docs", "n_contaminated",
            F.col("n_shared").alias("n_shared_grams"),
        )
        .orderBy("split")
    )


@query(
    "x69_cross_source_leakage",
    oracle=(
        "SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(count(DISTINCT source) AS BIGINT) AS n_sources "
        f"FROM ({neardup_clusters_oracle(k=16, bands=4)}) c "
        "JOIN documents USING (doc_id) "
        "GROUP BY cluster HAVING count(DISTINCT source) > 1 "
        "ORDER BY cluster"
    ),
    doc=(
        "cross-source duplicate leakage report: near-duplicate "
        "clusters (x30's connected components) whose members span "
        "MORE THAN ONE source — the clusters that make per-source "
        "dedup insufficient and leak one provider's text through "
        "another's slice (the audit a licensing/provenance review "
        "runs). One label-keyed join of the CC output back to the "
        "(doc_id, source) projection + one count-distinct rollup; the "
        "oracle replays signatures, banding, edges, the min-label "
        "fixpoint, then the same spanning test."
    ),
)
def x69(spark, sf_dir):
    from s2_spark.functions.dedup import neardup_clusters

    d = t(spark, sf_dir, "documents")
    labels = neardup_clusters(d, k=16, bands=4)
    return (
        labels.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .filter(F.col("n_sources") > 1)
        .orderBy("cluster")
    )


@query(
    "x70_ngram_novelty_by_decile",
    oracle=(
        "WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), "
        "' '), x -> x <> '') AS tk FROM documents), "
        "bound AS (SELECT max(doc_id) + 1 AS n FROM documents), "
        "grams AS (SELECT (doc_id * 10) // n AS dec, "
        "md5(array_to_string(tk[i:i+7], ' ')) AS g "
        "FROM d, bound, unnest(range(1, len(tk) - 6)) AS r(i) "
        "WHERE len(tk) >= 8), "
        "gd AS (SELECT DISTINCT dec, g FROM grams), "
        "first AS (SELECT g, min(dec) AS first_dec FROM gd GROUP BY g) "
        "SELECT dec AS decile, "
        "CAST(count(*) AS BIGINT) AS n_distinct_grams, "
        "CAST(sum(CASE WHEN first_dec = dec THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_novel_grams, "
        "round(CAST(sum(CASE WHEN first_dec = dec THEN 1 ELSE 0 END) AS "
        "DOUBLE) / count(*), 4) AS novelty_rate "
        "FROM gd JOIN first USING (g) GROUP BY dec ORDER BY dec"
    ),
    doc=(
        "corpus novelty decay: per doc_id decile (ingestion-order "
        "proxy), the fraction of this decile's distinct 8-gram "
        "shingles never seen in an earlier decile — the freshness "
        "curve a continuous-crawl pipeline watches to decide when "
        "additional data stops adding information. Same scale trick "
        "as x62: every gram reduces to its FIRST decile (one digest "
        "shuffle), so ten deciles cost one pass; the rate is the only "
        "division, on exact integers. Grams never leave the row as "
        "text — 16-byte md5 digests shuffle."
    ),
)
def x70(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = F.filter(_tokens(F.col("text")), lambda x: x != F.lit(""))
    bound = d.agg((F.max("doc_id") + 1).alias("n"))
    grams = (
        d.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= 8)
        .crossJoin(F.broadcast(bound))
        .select(
            F.expr("(doc_id * 10) div n").alias("dec"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 7), "
                    "i -> md5(concat_ws(' ', slice(tk, i, 8))))"
                )
            ).alias("g"),
        )
    )
    # ONE gram-keyed exchange (r15 re-plan): the old
    # distinct → groupBy(g) → join(gd, first) diamond re-evaluated the
    # tokenize+md5-gram Generate per branch (Spark reuses exchanges,
    # not scans — the same r12 hazard x68 hit) and shuffled the gram
    # digests three times. collect_set("dec") is SAFE here where the
    # r13 x68 collect_set was not: the set is hard-bounded at 10
    # decile ints per gram (vs unbounded doc_id structs), so no hot-key
    # aggregation buffer can grow past 10 elements. Per gram the set IS
    # the distinct decile list; its min is the first decile; exploding
    # it back out feeds the tiny 10-group rollup — map-side combined,
    # second shuffle carries ≤ 10×n_partitions rows.
    per_gram = grams.groupBy("g").agg(F.collect_set("dec").alias("_decs"))
    ex = per_gram.select(
        F.array_min("_decs").alias("first_dec"),
        F.explode("_decs").alias("dec"),
    )
    novel = F.sum(
        F.when(F.col("first_dec") == F.col("dec"), 1).otherwise(0)
    )
    return (
        ex.groupBy(F.col("dec").alias("decile"))
        .agg(
            F.count("*").alias("n_distinct_grams"),
            novel.alias("n_novel_grams"),
            r4(novel.cast("double") / F.count("*")).alias("novelty_rate"),
        )
        .orderBy("decile")
    )


@query(
    "x71_source_drift_matrix",
    oracle=(
        "WITH toks AS (SELECT source, unnest(list_filter("
        "string_split(lower(text), ' '), x -> x <> '')) AS w "
        "FROM documents), "
        "c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c "
        "FROM toks GROUP BY source, w), "
        "n AS (SELECT source, CAST(count(*) AS BIGINT) AS n "
        "FROM toks GROUP BY source), "
        "co AS (SELECT a.source AS s1, b.source AS s2, "
        "CAST(sum(abs(a.c * n2.n - b.c * n1.n)) AS BIGINT) AS num_co, "
        "CAST(sum(a.c) AS BIGINT) AS c1_co, "
        "CAST(sum(b.c) AS BIGINT) AS c2_co, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        "FROM c a JOIN c b ON a.w = b.w AND a.source < b.source "
        "JOIN n n1 ON n1.source = a.source "
        "JOIN n n2 ON n2.source = b.source "
        "GROUP BY a.source, b.source) "
        "SELECT s1, s2, n_shared, "
        "round(CAST(num_co + (n1.n - c1_co) * n2.n "
        "+ (n2.n - c2_co) * n1.n AS DOUBLE) / (n1.n * n2.n), 4) "
        "AS l1_distance "
        "FROM co JOIN n n1 ON n1.source = s1 JOIN n n2 ON n2.source = s2 "
        "ORDER BY s1, s2"
    ),
    doc=(
        "pairwise source drift matrix: L1 distance between unigram "
        "distributions, sum_w |p1(w) - p2(w)| in [0, 2], computed "
        "WITHOUT a full-outer word join via the sparse identity "
        "sum_co |c1*N2 - c2*N1| + (N1 - sum_co c1)*N2 + "
        "(N2 - sum_co c2)*N1 over the co-occurring words only, all "
        "exact BIGINT until one final division — the one-sided tails "
        "fold into totals, so the join carries only shared vocabulary. "
        "The number a mixture-rebalancing run reads to see which "
        "sources converged. At 100 TB: one vocabulary-keyed count "
        "table, one self-join on the word key, broadcast totals."
    ),
)
def x71(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(_tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    # r16 (guide §2.4): `c` is consumed by both self-join sides (a, b)
    # and self-join attribute dedup defeats ReuseExchange, so the
    # tokenize+explode+count chain ran once per side (6 scans in the
    # before-plan); `n` re-ran it a third time. One barrier on the
    # vocabulary-sized count table; the per-source total is the exact
    # identity sum-of-group-counts (both BIGINT).
    c = barrier(toks.groupBy("source", "w").agg(F.count("*").alias("c")))
    n = c.groupBy("source").agg(F.sum("c").alias("n"))
    a = c.select(F.col("source").alias("s1"), "w", F.col("c").alias("c1"))
    b = c.select(F.col("source").alias("s2"), "w", F.col("c").alias("c2"))
    n1 = F.broadcast(n.select(F.col("source").alias("s1"), F.col("n").alias("n1")))
    n2 = F.broadcast(n.select(F.col("source").alias("s2"), F.col("n").alias("n2")))
    co = (
        a.join(b, "w")
        .filter(F.col("s1") < F.col("s2"))
        .join(n1, "s1")
        .join(n2, "s2")
        .groupBy("s1", "s2")
        .agg(
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).alias("num_co"),
            F.sum("c1").alias("c1_co"),
            F.sum("c2").alias("c2_co"),
            F.count("*").alias("n_shared"),
        )
    )
    num = (
        F.col("num_co")
        + (F.col("n1") - F.col("c1_co")) * F.col("n2")
        + (F.col("n2") - F.col("c2_co")) * F.col("n1")
    )
    return (
        co.join(n1, "s1")
        .join(n2, "s2")
        .select(
            "s1",
            "s2",
            "n_shared",
            r4(num.cast("double") / (F.col("n1") * F.col("n2"))).alias(
                "l1_distance"
            ),
        )
        .orderBy("s1", "s2")
    )


@query(
    "x72_sampled_quantiles",
    oracle=(
        "WITH n AS (SELECT source, len(string_split(text, ' ')) AS nt, "
        "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN "
        "('0', '1') THEN 1 ELSE 0 END AS in_s FROM documents), "
        "h AS (SELECT source, nt, CAST(count(*) AS BIGINT) AS c, "
        "CAST(sum(in_s) AS BIGINT) AS cs FROM n GROUP BY source, nt), "
        "w AS (SELECT source, nt, "
        "CAST(sum(c) OVER (PARTITION BY source ORDER BY nt ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, "
        "CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS total, "
        "CAST(sum(cs) OVER (PARTITION BY source ORDER BY nt ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s, "
        "CAST(sum(cs) OVER (PARTITION BY source) AS BIGINT) AS total_s "
        "FROM h) "
        "SELECT source, max(total) AS n_docs, max(total_s) AS n_sample, "
        "min(CASE WHEN cum >= (total + 1) // 2 THEN nt END) AS p50_exact, "
        "CASE WHEN max(total_s) > 0 THEN "
        "min(CASE WHEN cum_s >= (total_s + 1) // 2 THEN nt END) END "
        "AS p50_sampled, "
        "min(CASE WHEN cum >= (total * 9 + 9) // 10 THEN nt END) "
        "AS p90_exact, "
        "CASE WHEN max(total_s) > 0 THEN "
        "min(CASE WHEN cum_s >= (total_s * 9 + 9) // 10 THEN nt END) END "
        "AS p90_sampled "
        "FROM w GROUP BY source ORDER BY source"
    ),
    doc=(
        "MERGEABLE quantile estimation via deterministic hash-threshold "
        "sampling, reported against the exact answer: membership = "
        "first md5(doc_id) hex digit in {0,1} (rate 1/8) — a pure "
        "per-row predicate, so per-partition samples union into the "
        "global sample with no coordination (the mergeability x57/x61 "
        "give cardinality, here for quantiles), and re-sharding "
        "reproduces the identical sample. Both the exact and the "
        "sampled quantiles ride ONE bounded-domain histogram (x54's "
        "shape) with pure integer ceil thresholds — this query is "
        "float-free end to end. Sources whose sample is empty report "
        "NULL rather than a fabricated estimate."
    ),
)
def x72(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    nt = F.size(F.split(F.col("text"), " ")).cast("long")
    in_s = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin("0", "1")
        .cast("long")
    )
    h = (
        d.select("source", nt.alias("nt"), in_s.alias("in_s"))
        .groupBy("source", "nt")
        .agg(F.count("*").alias("c"), F.sum("in_s").alias("cs"))
    )
    win = (
        Window.partitionBy("source")
        .orderBy("nt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("source")
    w = h.select(
        "source",
        "nt",
        F.sum("c").over(win).alias("cum"),
        F.sum("c").over(tot).alias("total"),
        F.sum("cs").over(win).alias("cum_s"),
        F.sum("cs").over(tot).alias("total_s"),
    )

    def q_at(num: int, den: int, cum: str, total: str):
        thresh = F.expr(f"({total} * {num} + {den - 1}) div {den}")
        return F.min(F.when(F.col(cum) >= thresh, F.col("nt")))

    def q_sampled(num: int, den: int):
        return F.when(
            F.max("total_s") > 0, q_at(num, den, "cum_s", "total_s")
        )

    return (
        w.groupBy("source")
        .agg(
            F.max("total").alias("n_docs"),
            F.max("total_s").alias("n_sample"),
            q_at(1, 2, "cum", "total").alias("p50_exact"),
            q_sampled(1, 2).alias("p50_sampled"),
            q_at(9, 10, "cum", "total").alias("p90_exact"),
            q_sampled(9, 10).alias("p90_sampled"),
        )
        .orderBy("source")
    )


@query(
    "x73_langid_eval_report",
    oracle=(
        "WITH s AS (SELECT lang, "
        "CAST(length(list_filter(string_split(lower(text), ' '), "
        "x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) "
        "AS n_stop, "
        "CAST(length(string_split(lower(text), ' ')) AS BIGINT) AS n_tok "
        "FROM documents) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(CASE WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.1 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en, "
        "round(CAST(sum(CASE WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.1 "
        "THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS en_rate, "
        "round(CAST(sum(n_stop) AS DOUBLE) / sum(n_tok), 4) "
        "AS pooled_stop_ratio "
        "FROM s GROUP BY lang ORDER BY lang"
    ),
    doc=(
        "language-filter evaluation report: x6's stopword-ratio "
        "English detector scored against the labeled lang column — "
        "per label, how many docs the heuristic would route to the "
        "'en' pipeline (its recall on en, its leak rate on the rest) "
        "and the POOLED stopword ratio as sum(stops)/sum(tokens), the "
        "ratio-of-sums form that stays one exact-integer division "
        "instead of a float mean of per-doc ratios (means of doubles "
        "are reassociation-ordered; sums of BIGINTs are not). The "
        "number a curation run reads before trusting a cheap lang "
        "filter at 100 TB, where a 2% leak is 2 TB."
    ),
)
def x73(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    s = d.select(
        "lang",
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        F.size(toks).cast("long").alias("n_tok"),
    )
    pred_en = F.when(
        F.col("n_stop").cast("double") / F.col("n_tok") >= 0.1, 1
    ).otherwise(0)
    return (
        s.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(pred_en).alias("n_pred_en"),
            r4(F.sum(pred_en).cast("double") / F.count("*")).alias("en_rate"),
            r4(
                F.sum("n_stop").cast("double") / F.sum("n_tok")
            ).alias("pooled_stop_ratio"),
        )
        .orderBy("lang")
    )


@query(
    "x74_conversion_funnel",
    oracle=(
        "WITH su AS (SELECT user_id, min(epoch_us(ts)) AS t0 "
        "FROM events WHERE event_type = 'signup' GROUP BY user_id), "
        "pu AS (SELECT e.user_id, min(epoch_us(ts)) AS t1 "
        "FROM events e JOIN su ON e.user_id = su.user_id "
        "WHERE e.event_type = 'purchase' AND epoch_us(ts) >= su.t0 "
        "GROUP BY e.user_id), "
        "j AS (SELECT su.user_id, t0, t1 FROM su LEFT JOIN pu "
        "ON su.user_id = pu.user_id) "
        "SELECT CAST(count(*) AS BIGINT) AS n_signed_up, "
        "CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_converted, "
        "CAST(sum(CASE WHEN t1 IS NOT NULL AND t1 - t0 <= 604800000000 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_7d, "
        "round(CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS "
        "DOUBLE) / count(*), 4) AS conversion_rate, "
        "CAST(min(CASE WHEN t1 IS NOT NULL THEN t1 - t0 END) AS BIGINT) "
        "AS min_lag_us, "
        "CAST(max(CASE WHEN t1 IS NOT NULL THEN t1 - t0 END) AS BIGINT) "
        "AS max_lag_us FROM j"
    ),
    doc=(
        "ordered two-step conversion funnel over the event stream: "
        "first signup per user, first purchase AT OR AFTER it, "
        "conversion counts overall and within a 7-day window, plus "
        "exact min/max signup->purchase lag — all on integer "
        "microseconds (one double division for the rate). The ordered "
        "constraint (purchase >= signup) is what separates a funnel "
        "from two count-distincts. Shape at 100 TB: two filtered "
        "user-keyed min-aggregations and one user-keyed join — the "
        "shuffle carries one row per user, never the event stream "
        "twice."
    ),
)
def x74(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # r16 (guide §2.4): `su` feeds pu's inner join AND the left join
    # below, and Spark reuses exchanges, not scans — the signup
    # filter+agg chain (a full events scan) evaluated twice (3 event
    # scans in the before-plan). One barrier; O(signed-up users) rows.
    su = barrier(
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t0"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    j = su.join(pu, "user_id", "left")
    conv = F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0))
    lag = F.when(F.col("t1").isNotNull(), F.col("t1") - F.col("t0"))
    return j.agg(
        F.count("*").alias("n_signed_up"),
        conv.alias("n_converted"),
        F.sum(
            F.when(
                F.col("t1").isNotNull()
                & (F.col("t1") - F.col("t0") <= 604_800_000_000),
                1,
            ).otherwise(0)
        ).alias("n_converted_7d"),
        r4(conv.cast("double") / F.count("*")).alias("conversion_rate"),
        F.min(lag).alias("min_lag_us"),
        F.max(lag).alias("max_lag_us"),
    )


@query(
    "x75_retention_cohorts",
    oracle=(
        "WITH e AS (SELECT user_id, "
        "epoch_us(ts) // 604800000000 AS wk FROM events), "
        "c AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id), "
        "sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size "
        "FROM c GROUP BY cohort), "
        "act AS (SELECT DISTINCT e.user_id, c.cohort, "
        "e.wk - c.cohort AS k FROM e JOIN c ON e.user_id = c.user_id), "
        "cells AS (SELECT cohort, CAST(k AS BIGINT) AS week_offset, "
        "CAST(count(*) AS BIGINT) AS n_active FROM act GROUP BY cohort, k) "
        "SELECT cohort, week_offset, n_active, cohort_size, "
        "round(CAST(n_active AS DOUBLE) / cohort_size, 4) AS retention "
        "FROM cells JOIN sizes USING (cohort) "
        "ORDER BY cohort, week_offset"
    ),
    doc=(
        "weekly retention cohort matrix: users grouped by first-active "
        "week (epoch-week integer floor), activity as DISTINCT "
        "(user, week-offset) pairs, retention = active/cohort-size per "
        "(cohort, offset) cell — the triangle every growth dashboard "
        "renders. Integer week arithmetic end to end (one division per "
        "cell for the rate). At 100 TB: one user-keyed min, one "
        "user-keyed join, one (cohort, offset) rollup — distinct-pairs "
        "dedup happens map-side before the final shuffle."
    ),
)
def x75(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 604800000000"
        ).alias("wk"),
    )
    # r16 (guide §2.4): `c` feeds act's join AND the cohort-size
    # rollup — the user-keyed min (a full events scan) evaluated twice
    # (3 event scans in the before-plan). One barrier; O(users) rows.
    c = barrier(e.groupBy("user_id").agg(F.min("wk").alias("cohort")))
    act = (
        e.join(c, "user_id")
        .select("user_id", "cohort", (F.col("wk") - F.col("cohort")).alias("k"))
        .distinct()
    )
    sizes = c.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    return (
        act.groupBy("cohort", F.col("k").alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            "n_active",
            "cohort_size",
            r4(
                F.col("n_active").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
        .orderBy("cohort", "week_offset")
    )


def _bucket_degree_oracle(k: int = 16, bands: int = 4, topn: int = 10) -> str:
    """Replay of x76: identical md5-rotation banding (the shared
    ``_minhash_band_sql`` family), bucket sizes, per-doc co-member
    degree, top-N."""
    from s2_spark.suite._ann_oracles import _TOKS, _minhash_band_sql

    comps, cases, band_list = _minhash_band_sql(k, bands)
    return f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
sig AS (SELECT doc_id, {comps} FROM toks GROUP BY doc_id),
banded AS (
  SELECT doc_id, band, CASE band {cases} END AS bh
  FROM sig, (VALUES {', '.join(f'({b})' for b in range(bands))}) AS v(band)
),
sz AS (SELECT band, bh, CAST(count(*) AS BIGINT) AS n
       FROM banded GROUP BY band, bh)
SELECT doc_id, CAST(sum(n - 1) AS BIGINT) AS degree,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       AS n_hot_bands
FROM banded JOIN sz USING (band, bh)
GROUP BY doc_id
ORDER BY degree DESC, doc_id LIMIT {topn}
"""


@query(
    "x76_boilerplate_hubs",
    oracle=_bucket_degree_oracle(),
    doc=(
        "boilerplate/template detection by LSH bucket degree: a "
        "document's degree = total co-members across its minhash band "
        "buckets — templates, navigation chrome, and license "
        "boilerplate collide with MANY near-copies and surface as "
        "hubs, the docs a curation run inspects before cluster-level "
        "dedup (one hub can glue unrelated clusters). Top-10 by "
        "degree, plus how many of the doc's bands are hot. Pure "
        "integer aggregation over the O(n*bands) band rows — the same "
        "shared banding construction (and oracle fragment family) as "
        "the keep rule and CC clustering, so the three views of the "
        "duplicate graph can never drift apart."
    ),
)
def x76(spark, sf_dir):
    from s2_spark.functions.dedup import _band_buckets

    d = t(spark, sf_dir, "documents")
    banded, _ = _band_buckets(d, "doc_id", "text", k=16, bands=4)
    sz = banded.groupBy("band", "bh").agg(F.count("*").alias("n"))
    return (
        banded.join(sz, ["band", "bh"])
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") - 1).alias("degree"),
            F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias(
                "n_hot_bands"
            ),
        )
        .orderBy(F.desc("degree"), "doc_id")
        .limit(10)
    )


def _hard_negative_oracle(nq: int = 8, topk: int = 5, dim: int = 64) -> str:
    """Replay of x77: identical left-associated cosine chains, label
    exclusion, per-query (sim DESC, vec_id) rank."""
    from s2_spark.suite._ann_oracles import _chain

    sim = (
        f"({_chain('v', 'qv', dim)}) / "
        f"(sqrt({_chain('v', 'v', dim)}) * sqrt({_chain('qv', 'qv', dim)}))"
    )
    return (
        f"WITH q AS (SELECT vec_id AS qid, label AS qlabel, "
        f"CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
        f"WHERE vec_id < {nq}), "
        f"c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE vec_id >= {nq}), "
        f"s AS (SELECT qid, qlabel, vec_id, label, {sim} AS sim_raw "
        "FROM c, q WHERE c.label <> q.qlabel), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY qid "
        "ORDER BY sim_raw DESC, vec_id) AS rn FROM s) "
        "SELECT qid AS query_id, vec_id AS negative_id, label, "
        "CAST(rn AS BIGINT) AS rank, round(sim_raw, 4) AS sim "
        f"FROM r WHERE rn <= {topk} ORDER BY query_id, rank"
    )


@query(
    "x77_hard_negative_mining",
    oracle=_hard_negative_oracle(),
    doc=(
        "contrastive-training hard-negative mining: for each of 8 "
        "query vectors, the top-5 most-similar vectors with a "
        "DIFFERENT label — the near-misses a contrastive or reranker "
        "training run wants as negatives (random negatives are too "
        "easy; same-label neighbors are positives). Broadcast query "
        "join + label-exclusion filter + per-query rank window; dot "
        "products are left-associated folds replayed term-for-term in "
        "the oracle so ranks agree bit-for-bit. At 100 TB the "
        "broadcast fan-out scan is the baseline and the IVF/LSH "
        "bucketed variants (x13/x14) are the scale path — negatives "
        "only need candidates, not exactness."
    ),
)
def x77(spark, sf_dir):
    from pyspark.sql import Window as W

    nq, topk = 8, 5
    emb = t(spark, sf_dir, "embeddings")
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    q = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        dbl(F.col("embedding")).alias("qv"),
    )
    c = emb.filter(F.col("vec_id") >= nq).select(
        "vec_id", "label", dbl(F.col("embedding")).alias("v")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sim = dot(F.col("v"), F.col("qv")) / (
        F.sqrt(dot(F.col("v"), F.col("v")))
        * F.sqrt(dot(F.col("qv"), F.col("qv")))
    )
    s = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select("qid", "vec_id", "label", sim.alias("sim_raw"))
    )
    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.desc("sim_raw"), "vec_id")
    )
    return (
        s.withColumn("rn", rn)
        .filter(F.col("rn") <= topk)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("negative_id"),
            "label",
            F.col("rn").cast("long").alias("rank"),
            r4(F.col("sim_raw")).alias("sim"),
        )
        .orderBy("query_id", "rank")
    )


def _kmv_oracle(k: int = 32) -> str:
    """Replay of x61's KMV sketch: identical 32-bit hash values
    (first 8 hex chars of md5(text) — '0x'-cast, Spark's conv), the
    k smallest DISTINCT values per source, and the same single
    double division for the estimator — everything else integer."""
    return (
        "WITH h AS (SELECT DISTINCT source, "
        "CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS hv "
        "FROM documents), "
        "r AS (SELECT source, hv, row_number() OVER "
        "(PARTITION BY source ORDER BY hv) AS rn FROM h), "
        f"mins AS (SELECT source, CAST(max(hv) AS BIGINT) AS kth, "
        f"CAST(count(*) AS BIGINT) AS n_min FROM r WHERE rn <= {k} "
        "GROUP BY source), "
        "ex AS (SELECT source, CAST(count(DISTINCT hv) AS BIGINT) "
        "AS exact_distinct FROM h GROUP BY source) "
        "SELECT source, exact_distinct, kth, "
        f"round(CASE WHEN n_min < {k} THEN CAST(n_min AS DOUBLE) "
        f"ELSE {(k - 1)} * 4294967296.0 / kth END, 4) AS kmv_estimate, "
        f"round(abs(CASE WHEN n_min < {k} THEN CAST(n_min AS DOUBLE) "
        f"ELSE {(k - 1)} * 4294967296.0 / kth END - exact_distinct) "
        "/ exact_distinct, 4) AS rel_err "
        "FROM mins JOIN ex USING (source) ORDER BY source"
    )


@query(
    "x61_kmv_distinct_sketch",
    oracle=_kmv_oracle(),
    doc=(
        "KMV (k-minimum-values) distinct-count sketch per source "
        "(Bar-Yossef et al. 2002), the mergeable bottom-k cousin of "
        "x57's HLL, verified END TO END: hash = first 32 bits of "
        "md5(text) as an exact BIGINT, sketch state = the k=32 "
        "smallest distinct hashes per source (the kth value is "
        "emitted and integer-compared, so the oracle checks the "
        "sketch itself, not just the estimate), estimator = "
        "(k-1)*2^32/kth — one double division on exact integers; "
        "sources holding fewer than k distinct values answer exactly. "
        "At 100 TB the shuffle carries distinct 8-byte hashes and the "
        "per-source sort is the bottom-k window (map-side partial "
        "dedup first); two KMV sketches merge as the k smallest of "
        "the union, so per-partition sketches combine without "
        "re-scanning — the property HLL buys with max(), KMV buys "
        "with bottom-k."
    ),
)
def x61(spark, sf_dir):
    from pyspark.sql import Window as W

    k = 32
    d = t(spark, sf_dir, "documents")
    h = d.select(
        "source",
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    rn = F.row_number().over(W.partitionBy("source").orderBy("hv"))
    mins = (
        h.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.max("hv").alias("kth"), F.count("*").alias("n_min"))
    )
    ex = h.groupBy("source").agg(
        F.countDistinct("hv").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_min") < k, F.col("n_min").cast("double")
    ).otherwise(F.lit(float(k - 1) * 4294967296.0) / F.col("kth"))
    return (
        mins.join(ex, "source")
        .select(
            "source",
            "exact_distinct",
            "kth",
            r4(est).alias("kmv_estimate"),
            r4(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


@query(
    "x78_tokenizer_fertility",
    oracle=(
        "WITH d AS (SELECT source, strlen(text) AS nb, "
        "CAST(length(list_filter(string_split(lower(text), ' '), "
        "x -> x <> '')) AS BIGINT) AS nw, "
        "CAST(length(regexp_extract_all(lower(text), "
        "'[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS nt FROM documents) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(nb) AS BIGINT) AS total_bytes, "
        "CAST(sum(nw) AS BIGINT) AS total_words, "
        "CAST(sum(nt) AS BIGINT) AS total_tokens, "
        "round(sum(nt) * 1.0 / sum(nw), 4) AS tokens_per_word, "
        "round(sum(nt) * 1000.0 / sum(nb), 4) AS tokens_per_kb "
        "FROM d GROUP BY source ORDER BY source"
    ),
    doc=(
        "tokenizer-fertility report per source: UTF-8 bytes, whitespace "
        "words, and BPE-ish pre-tokens (x12's regex: word pieces / "
        "numbers / punctuation) rolled up to tokens-per-word and "
        "tokens-per-KB — the mixture-cost table a training-data team "
        "computes before weighting sources (token budgets are paid in "
        "tokenizer tokens, storage and licensing in bytes; a source "
        "with high fertility costs more compute per byte). One scan, "
        "three per-row column expressions (regexp_count never "
        "materializes the token array), then a map-side-combined "
        "groupBy on the low-cardinality source key — the whole report "
        "is one small shuffle at any scale. Ratios from the SUMS (not "
        "averaged per-doc ratios), so short docs don't dominate."
    ),
)
def x78(spark, sf_dir):
    from s2_spark.functions.text import token_count

    d = t(spark, sf_dir, "documents")
    per = d.select(
        "source",
        F.octet_length("text").cast("long").alias("nb"),
        F.size(
            F.filter(_tokens(F.col("text")), lambda x: x != F.lit(""))
        ).cast("long").alias("nw"),
        token_count("text", "bpe").alias("nt"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nb").alias("total_bytes"),
            F.sum("nw").alias("total_words"),
            F.sum("nt").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_bytes",
            "total_words",
            "total_tokens",
            r4(F.col("total_tokens") / F.col("total_words")).alias(
                "tokens_per_word"
            ),
            r4(F.col("total_tokens") * 1000.0 / F.col("total_bytes")).alias(
                "tokens_per_kb"
            ),
        )
        .orderBy("source")
    )


# x56's deterministic doc_id -> split assignment, spelled once for the
# contamination oracles (x68 verbatim, x79 normalized)
_SPLIT_SQL = (
    "CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(doc_id "
    "AS VARCHAR)), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 204 "
    "THEN 'train' WHEN (strpos('0123456789abcdef', substr(md5("
    "CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + (strpos("
    "'0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, "
    "1)) - 1) < 230 THEN 'val' ELSE 'test' END"
)


@query(
    "x79_normalized_contamination",
    oracle=(
        "WITH d AS (SELECT doc_id, "
        f"{_SPLIT_SQL} AS split, "
        "list_filter(string_split(trim(regexp_replace(regexp_replace("
        "lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '), "
        "x -> x <> '') AS tk FROM documents), "
        "grams AS (SELECT doc_id, split, "
        "md5(array_to_string(tk[i:i+7], ' ')) AS g "
        "FROM d, unnest(range(1, len(tk) - 6)) AS r(i) "
        "WHERE len(tk) >= 8), "
        "tg AS (SELECT DISTINCT g FROM grams WHERE split = 'train'), "
        "ev AS (SELECT DISTINCT doc_id, split, g FROM grams "
        "WHERE split <> 'train'), "
        "hit AS (SELECT ev.doc_id, ev.split, ev.g FROM ev "
        "JOIN tg USING (g)) "
        "SELECT split, "
        "(SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM ev e2 "
        " WHERE e2.split = s.split) AS n_docs, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_contaminated, "
        "CAST(count(DISTINCT g) AS BIGINT) AS n_shared_grams "
        "FROM hit s GROUP BY split ORDER BY split"
    ),
    doc=(
        "case/punctuation-normalized decontamination over the x56 "
        "split: x68 digests VERBATIM 8-grams, so benchmark leakage "
        "that survives trivial reformatting (re-casing, punctuation "
        "stripped or added, double spacing) slips through. Here every "
        "document first passes x21's canonicalizer (lowercase, strip "
        "non-alphanumerics, collapse space runs) and THEN shingles — "
        "grams hash the canonical form, so 'Hello, World' and "
        "'hello world!!' produce the SAME digest. Scale shape (re-planned "
        "r13): the tokenize+md5-gram projection is by far the dominant "
        "cost (~35 s of the 67 s x100 pass), and the r12 plan's "
        "tg/ev/hit diamond re-evaluated it FOUR times (Spark reuses "
        "exchanges, not scans — each branch re-projected the corpus). "
        "Now ONE projection feeds ONE gram-keyed aggregation that "
        "carries both sides of the semi-join per gram (a train flag + "
        "the distinct eval (split, doc_id) set), so the corpus is "
        "scanned once and shuffled once; only the doc-census aggregate "
        "re-tokenizes (no gram hashing). Measured x100: 66.9 s -> "
        "~35 s, same results."
    ),
)
def x79(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    b = F.expr(
        "(locate(substr(md5(CAST(doc_id AS STRING)), 1, 1), "
        "'0123456789abcdef') - 1) * 16 + "
        "(locate(substr(md5(CAST(doc_id AS STRING)), 2, 1), "
        "'0123456789abcdef') - 1)"
    )
    split = (
        F.when(b < 204, "train").when(b < 230, "val").otherwise("test")
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    tk = F.filter(F.split(norm, " "), lambda x: x != F.lit(""))
    docs = d.select("doc_id", split.alias("split"), tk.alias("tk")).filter(
        F.size("tk") >= 8
    )
    grams = docs.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 7), "
                "i -> md5(concat_ws(' ', slice(tk, i, 8))))"
            )
        ).alias("g"),
    )
    return (
        _contamination_report(grams, docs)
        .select(
            "split", "n_docs", "n_contaminated",
            F.col("n_shared").alias("n_shared_grams"),
        )
        .orderBy("split")
    )


def _contamination_report(grams, docs):
    """Single-projection contamination rollup shared by x68/x79/x82:
    ``grams`` is the exploded (doc_id, split, g) relation — evaluated
    exactly ONCE into one gram-keyed exchange, on which a PARTITIONED
    WINDOW computes each gram's train-membership flag; eval rows whose
    gram carries the flag are the hits. ``docs`` (doc_id, split, ...)
    supplies the eval-doc census — tokenize-only, no gram hashing.

    Plan shape (verified via explain: ONE Generate, ONE gram-keyed
    Exchange): scan → project+explode → exchange(g) → sort(g) →
    window max → filter → countDistinct rollup. Two hazards this
    shape avoids, both found the hard way:

    - the r12 tg/ev/hit diamond re-ran the tokenize+hash projection
      per branch (Spark reuses exchanges, not scans — 4x the dominant
      cost); a semi-join rewrite stays a diamond because AQE's
      broadcast conversion re-plans the small side from the scan,
      dropping the shared exchange (measured r14);
    - the r13 collect_set rollup concentrated an UNBOUNDED struct set
      in one aggregation buffer for a gram shared by many eval docs —
      exactly the boilerplate-gram hot key a dup-dense corpus feeds it
      (ADVICE r13). The window's per-partition sort spills to disk, so
      a hot gram streams instead of resident-accumulating."""
    w = Window.partitionBy("g")
    flagged = grams.withColumn(
        "in_train",
        F.max(
            F.when(F.col("split") == "train", F.lit(1)).otherwise(F.lit(0))
        ).over(w),
    )
    hits = flagged.filter(
        (F.col("split") != "train") & (F.col("in_train") == 1)
    )
    rep = hits.groupBy("split").agg(
        F.countDistinct("doc_id").alias("n_contaminated"),
        F.countDistinct("g").alias("n_shared"),
    )
    n_docs = (
        docs.filter(F.col("split") != "train")
        .groupBy("split")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    return n_docs.join(rep, "split")


from s2_spark.suite._ann_oracles import minhash_keep_ctes  # noqa: E402

_X80_NT = (
    "CAST(length(regexp_extract_all(lower(text), "
    "'[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT)"
)


@query(
    "x80_token_yield_funnel",
    oracle=(
        "WITH ex AS (SELECT doc_id, text, source, md5(text) AS h, "
        f"{_X80_NT} AS nt FROM documents), "
        "kmin AS (SELECT h, min(doc_id) AS keep FROM ex GROUP BY h), "
        "ex_kept AS (SELECT ex.doc_id, ex.text, ex.source, ex.nt "
        "FROM ex JOIN kmin ON ex.h = kmin.h AND ex.doc_id = kmin.keep), "
        f"{minhash_keep_ctes(k=16, bands=4, corpus='ex_kept')}, "
        "nd AS (SELECT doc_id FROM dmin WHERE doc_id = dm), "
        "raw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_raw_docs, "
        "CAST(sum(nt) AS BIGINT) AS raw_tokens FROM ex GROUP BY source), "
        "exk AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact_docs, "
        "CAST(sum(nt) AS BIGINT) AS exact_tokens FROM ex_kept "
        "GROUP BY source), "
        "ndk AS (SELECT source, CAST(count(*) AS BIGINT) AS "
        "n_neardup_docs, CAST(sum(nt) AS BIGINT) AS neardup_tokens "
        "FROM ex_kept JOIN nd USING (doc_id) GROUP BY source) "
        "SELECT source, n_raw_docs, raw_tokens, "
        "CAST(coalesce(n_exact_docs, 0) AS BIGINT) AS n_exact_docs, "
        "CAST(coalesce(exact_tokens, 0) AS BIGINT) AS exact_tokens, "
        "CAST(coalesce(n_neardup_docs, 0) AS BIGINT) AS n_neardup_docs, "
        "CAST(coalesce(neardup_tokens, 0) AS BIGINT) AS neardup_tokens, "
        "round(coalesce(neardup_tokens, 0) * 1.0 / raw_tokens, 4) "
        "AS token_yield "
        "FROM raw LEFT JOIN exk USING (source) "
        "LEFT JOIN ndk USING (source) ORDER BY source"
    ),
    doc=(
        "effective-token-yield funnel per source: raw -> exact-dedup "
        "survivors (global min-doc_id per md5(text), cross-source) -> "
        "near-dup survivors (x29's greedy minhash keep rule applied ON "
        "the exact survivors — the real cascade order), with BPE-ish "
        "token sums at each stage and the final tokens/raw-tokens "
        "yield. This is the number mixture planning actually consumes: "
        "a source's raw token count overstates its contribution by its "
        "duplication factor, and the funnel shows WHERE each source "
        "loses mass. Scale shape: one md5 groupBy (digests shuffle, "
        "not text), the x29 band pipeline on the surviving subset, "
        "three small per-source rollups broadcast-joined on the "
        "low-cardinality source key. The oracle replays every stage "
        "including the keep rule on the composed survivor relation."
    ),
)
def x80(spark, sf_dir):
    from pyspark.sql import Window as W

    from s2_spark.functions.dedup import minhash_dedup_keep
    from s2_spark.functions.text import token_count

    d0 = t(spark, sf_dir, "documents")
    # r15 (guide §2.4/§1.2, the §12 x35 pattern): the per-row BPE
    # regexp_count + md5 projection and the per-digest keep window fed
    # FOUR consumers (raw, exk, ndk, and both sides of the minhash
    # band build) — 5 parquet scans, the expensive chain evaluated
    # once per branch. Checkpoint the SLIM relations (no text: 4
    # small columns, then 3) so the chain and the window run once;
    # the minhash leg re-attaches text from the scan by joining the
    # kept ids — the ids are exactly the exact-dedup survivors, so the
    # joined relation is identical to the old ex_kept's (doc_id, text).
    d = d0.select(
        "doc_id",
        "source",
        token_count("text", "bpe").alias("nt"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    d = barrier(d)
    keep = F.min("doc_id").over(W.partitionBy("h"))
    kept = (
        d.withColumn("_k", keep)
        .filter(F.col("doc_id") == F.col("_k"))
        .select("doc_id", "source", "nt")
    )
    kept = barrier(kept)
    nd = minhash_dedup_keep(
        d0.select("doc_id", "text").join(kept.select("doc_id"), "doc_id"),
        k=16,
        bands=4,
    )
    raw = d.groupBy("source").agg(
        F.count("*").alias("n_raw_docs"), F.sum("nt").alias("raw_tokens")
    )
    exk = kept.groupBy("source").agg(
        F.count("*").alias("n_exact_docs"),
        F.sum("nt").alias("exact_tokens"),
    )
    ndk = (
        kept.join(nd, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_neardup_docs"),
            F.sum("nt").alias("neardup_tokens"),
        )
    )
    # LEFT joins + zero-fill: a source whose every doc lost the cascade
    # must report yield 0, not vanish from the funnel
    return (
        raw.join(exk, "source", "left")
        .join(ndk, "source", "left")
        .select(
            "source",
            "n_raw_docs",
            "raw_tokens",
            F.coalesce("n_exact_docs", F.lit(0)).alias("n_exact_docs"),
            F.coalesce("exact_tokens", F.lit(0)).alias("exact_tokens"),
            F.coalesce("n_neardup_docs", F.lit(0)).alias("n_neardup_docs"),
            F.coalesce("neardup_tokens", F.lit(0)).alias("neardup_tokens"),
            r4(
                F.coalesce("neardup_tokens", F.lit(0))
                / F.col("raw_tokens")
            ).alias("token_yield"),
        )
        .orderBy("source")
    )


@query(
    "x81_mixture_weights",
    oracle=(
        "WITH s AS (SELECT source, "
        f"CAST(sum({_X80_NT}) AS BIGINT) AS tokens "
        "FROM documents GROUP BY source), "
        "tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total, "
        "CAST(count(*) AS BIGINT) AS n_sources FROM s) "
        "SELECT source, tokens, "
        "round(tokens * 1.0 / total, 4) AS token_share, "
        "round(least((total * 1.0 / n_sources) / tokens, 4.0), 4) "
        "AS weight, "
        "CAST(CASE WHEN (total * 1.0 / n_sources) / tokens > 4.0 "
        "THEN 1 ELSE 0 END AS INTEGER) AS capped, "
        "round(tokens * least((total * 1.0 / n_sources) / tokens, 4.0), "
        "4) AS effective_tokens "
        "FROM s CROSS JOIN tot ORDER BY source"
    ),
    doc=(
        "mixture rebalancing weights: per-source sampling weight that "
        "moves the corpus toward a UNIFORM token share (target 1/n of "
        "total tokens per source), with upsampling capped at 4x — the "
        "epoch-multiplier table a curriculum/mixture sampler consumes "
        "(uncapped upsampling of a tiny source means repeating it "
        "dozens of times per epoch; the cap and the `capped` flag make "
        "the shortfall explicit instead of silent). Token counts are "
        "x78's BPE-ish regex (the unit training budgets are paid in). "
        "One per-source aggregate, then totals via a single-partition "
        "window over the AGGREGATED relation — |sources| rows, never "
        "the corpus (a totals branch built by re-aggregating the raw "
        "table would scan + retokenize documents twice: Spark shares "
        "no subplan across DataFrame branches without materialization, "
        "and .explain showed exactly that double scan before this "
        "shape). The whole result is |sources| rows regardless of "
        "corpus size."
    ),
)
def x81(spark, sf_dir):
    from pyspark.sql import Window as W

    from s2_spark.functions.text import token_count

    d = t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(token_count("text", "bpe")).alias("tokens")
    )
    wall = W.partitionBy()  # one partition of |sources| rows — safe
    s = s.select(
        "source",
        "tokens",
        F.sum("tokens").over(wall).alias("total"),
        F.count("*").over(wall).alias("n_sources"),
    )
    target = F.col("total") / F.col("n_sources")
    w = F.least(target / F.col("tokens"), F.lit(4.0))
    return (
        s
        .select(
            "source",
            "tokens",
            r4(F.col("tokens") / F.col("total")).alias("token_share"),
            r4(w).alias("weight"),
            (target / F.col("tokens") > 4.0).cast("int").alias("capped"),
            r4(F.col("tokens") * w).alias("effective_tokens"),
        )
        .orderBy("source")
    )


@query(
    "x82_winnowed_contamination",
    oracle=(
        "WITH d AS (SELECT doc_id, "
        f"{_SPLIT_SQL} AS split, "
        "list_filter(string_split(trim(regexp_replace(regexp_replace("
        "lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '), "
        "x -> x <> '') AS tk FROM documents), "
        "grams AS (SELECT doc_id, split, i, "
        "md5(array_to_string(tk[i:i+7], ' ')) AS g "
        "FROM d, unnest(range(1, len(tk) - 6)) AS r(i) "
        "WHERE len(tk) >= 8), "
        "fps AS (SELECT doc_id, split, min(g) OVER (PARTITION BY doc_id "
        "ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp "
        "FROM grams), "
        "dfp AS (SELECT DISTINCT doc_id, split, fp FROM fps), "
        "tg AS (SELECT DISTINCT fp FROM dfp WHERE split = 'train'), "
        "ev AS (SELECT doc_id, split, fp FROM dfp "
        "WHERE split <> 'train'), "
        "hit AS (SELECT ev.doc_id, ev.split, ev.fp FROM ev "
        "JOIN tg USING (fp)) "
        "SELECT split, "
        "(SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM ev e2 "
        " WHERE e2.split = s.split) AS n_docs, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_contaminated, "
        "CAST(count(DISTINCT fp) AS BIGINT) AS n_shared_fps "
        "FROM hit s GROUP BY split ORDER BY split"
    ),
    doc=(
        "winnowing-SAMPLED normalized decontamination — the tunable-"
        "cost production variant of x79 (VERDICT r12 task 5). x79 "
        "semi-joins EVERY canonical 8-gram digest; on a dup-dense "
        "corpus its gram-occurrence volume made the steepest second "
        "decade of the cohort (8.5x/decade). Here each document's "
        "canonical gram-hash stream passes x48's winnowing selection "
        "first (window w=4, keep each window's min), cutting the "
        "joined volume to a deterministic ~2/(w+1) sample WITH the "
        "window guarantee as a recall floor: any shared canonical run "
        "of >= w+8-1 = 11 tokens between a train and an eval document "
        "shares a selected fingerprint on BOTH sides (Schleimer/"
        "Wilkerson/Aiken), so long verbatim leakage cannot escape — "
        "only sub-11-token overlaps may, which is the knob production "
        "decontamination actually turns at 100 TB. Plan shape: "
        "normalization + gram hashing + min-in-window all in-row (one "
        "shuffle-free projection, the x48 device), array_distinct "
        "BEFORE the explode so the exploded row count is the sampled "
        "fingerprint count, then the shared single-projection rollup "
        "(_contamination_report — one gram-keyed shuffle, no diamond "
        "re-scan). Honest scale framing: the exchange carries 0.41x "
        "of x79's rows (pinned by tests/test_scale_paths.py::"
        "test_winnowed_contamination_volume_reduction); local[32]'s "
        "co-located in-memory shuffle times the two alike because the "
        "in-row projection dominates there — the row-volume cut is "
        "what pays at network-shuffle scale."
    ),
)
def x82(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    b = F.expr(
        "(locate(substr(md5(CAST(doc_id AS STRING)), 1, 1), "
        "'0123456789abcdef') - 1) * 16 + "
        "(locate(substr(md5(CAST(doc_id AS STRING)), 2, 1), "
        "'0123456789abcdef') - 1)"
    )
    split = (
        F.when(b < 204, "train").when(b < 230, "val").otherwise("test")
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    tk = F.filter(F.split(norm, " "), lambda x: x != F.lit(""))
    docs = d.select("doc_id", split.alias("split"), tk.alias("tk")).filter(
        F.size("tk") >= 8
    )
    # canonical 8-gram md5 stream, in document order (x79's gram law)
    hs = docs.select(
        "doc_id",
        "split",
        F.expr(
            "transform(sequence(1, size(tk) - 7), "
            "i -> md5(concat_ws(' ', slice(tk, i, 8))))"
        ).alias("hs"),
    )
    # winnow: fp_i = min(hs[i .. i+3]), trailing windows clamped by
    # slice — matching ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING (the
    # x48 device; `hs` is a bound column, so no re-hash per position)
    pos = F.slice(
        F.sequence(F.lit(1), F.greatest(F.size("hs"), F.lit(1))),
        F.lit(1),
        F.size("hs"),
    )
    fps = hs.select(
        "doc_id",
        "split",
        F.explode(
            F.array_distinct(
                F.transform(
                    pos, lambda i: F.array_min(F.slice("hs", i, F.lit(4)))
                )
            )
        ).alias("g"),
    )
    return (
        _contamination_report(fps, docs)
        .select(
            "split", "n_docs", "n_contaminated",
            F.col("n_shared").alias("n_shared_fps"),
        )
        .orderBy("split")
    )
