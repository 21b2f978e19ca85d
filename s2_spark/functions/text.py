"""Text analysis operators — language-ID, quality scoring, token
counting (whitespace + BPE-ish regex), rolling-hash fingerprints.

Everything is built-in column expressions; the per-language stopword
tables are tiny literals folded into the plan (broadcast-free)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal per-language stopword profiles for the n-gram/stopword
# heuristic language ID (public common-word lists)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de": ("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des"),
}


def ws_tokens(col) -> Column:
    """Whitespace tokens of the TRIMMED lowered text. Trimming first
    matters: Spark's split keeps empty strings for leading/trailing
    whitespace, which would inflate token_count, dilute
    stopword_ratio/quality_score, and chain a phantom token into the
    fingerprints — making 'a b' and 'a b ' fingerprint differently."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def bpe_ish_tokens(col) -> Column:
    """Regex sub-word-ish tokenizer: word pieces, numbers, punctuation
    as separate tokens (the pre-tokenization most BPE vocabularies use)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)


def token_count(col, tokenizer: str = "ws") -> Column:
    if tokenizer == "ws":
        return F.size(ws_tokens(col)).cast("long")
    # count matches directly — same regex as bpe_ish_tokens but without
    # materializing the token array per document just to take its size
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).cast("long")


def stopword_ratio(col, lang: str = "en") -> Column:
    toks = ws_tokens(col)
    stops = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda x: x.isin(*stops))).cast("double") / F.size(toks)


def lang_scores(col) -> Column:
    """Map of language → stopword-hit ratio."""
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_STOPWORDS]),
        F.array(*[stopword_ratio(col, lang) for lang in LANG_STOPWORDS]),
    )


def lang_id(df: DataFrame, text_col: str = "text", min_score: float = 0.05) -> DataFrame:
    """Predict language = argmax stopword ratio (or 'unk' under the
    floor). Adds pred_lang + per-language score map."""
    scored = df.withColumn("_scores", lang_scores(text_col))
    entries = F.map_entries("_scores")
    best = F.aggregate(
        entries,
        F.struct(F.lit("unk").alias("key"), F.lit(0.0).alias("value")),
        lambda acc, e: F.when(e["value"] > acc["value"], e).otherwise(acc),
    )
    return (
        scored.withColumn(
            "pred_lang",
            F.when(best["value"] >= min_score, best["key"]).otherwise(F.lit("unk")),
        )
        .withColumnRenamed("_scores", "lang_scores")
    )


def quality_score(col) -> Column:
    """Composite document quality in [0,1]:
    0.4·length saturation + 0.4·stopword ratio + 0.2·(1 − punct ratio)."""
    c = F.col(col) if isinstance(col, str) else col
    ntok = F.size(ws_tokens(c)).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^\.,;:!?]", "")).cast("double")
    punct_ratio = punct / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    return (
        F.least(F.lit(1.0), ntok / 100.0) * 0.4
        + stopword_ratio(c) * 0.4
        + (1.0 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )


def fingerprint(col) -> Column:
    """Content fingerprint: 64-bit rolling chain hash over tokens —
    ``acc = xxhash64(acc, token)`` — order-sensitive (unlike a token-set
    hash) and computed entirely JVM-side. Same chaining shape as the
    reference's bench verification hash (cli/src/bench.rs:389-394)."""
    toks = ws_tokens(col)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, tk: F.xxhash64(acc, tk)
    )


FP_MOD = 1_000_000_007


def fingerprint_portable(col) -> Column:
    """Order-sensitive rolling fingerprint with a portable hash chain:
    ``acc = (acc·31 + md5_56(token)) mod 1e9+7`` where ``md5_56`` folds
    the first 14 hex chars of the token's md5. Same rolling-hash
    contract as :func:`fingerprint` but every step is hex-digit
    arithmetic any ANSI SQL engine reproduces bit-for-bit — use it when
    results must be verifiable outside Spark. All JVM-side (nested
    higher-order functions, no UDF)."""

    def tok_hash(tk: Column) -> Column:
        # r15 (guide §1.2 per-task work): one conv() parses the whole
        # 14-hex-digit prefix in native code — the previous
        # split + transform + 14-step aggregate fold computed the same
        # 56-bit value (a*16+b per digit ≡ base-16 positional parse)
        # through the interpreted higher-order path, once per TOKEN.
        # 56 bits fit a long exactly on both routes, so the value —
        # and the mod — are bit-identical.
        mh14 = F.substring(F.md5(tk.cast("binary")), 1, 14)
        return F.conv(mh14, 16, 10).cast("long") % FP_MOD

    return F.aggregate(
        ws_tokens(col),
        F.lit(0).cast("long"),
        lambda acc, tk: (acc * 31 + tok_hash(tk)) % FP_MOD,
    )
