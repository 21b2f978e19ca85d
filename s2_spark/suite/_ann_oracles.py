"""Generated DuckDB oracle SQL for the ANN / near-dup extension queries.

These oracles replicate the *entire* approximate pipeline — hyperplane
sign-buckets, multiprobe sets, IVF cell assignment, md5-derived simhash
bits — in portable SQL, not just an end-result recall bound. Every
constant the Spark plan folds in (hyperplanes, centroids, band layout)
is emitted as a literal here, so DuckDB independently recomputes the
same buckets, candidate sets, and ranks, and the driver's value-hash
comparison verifies each stage of the approximate algorithm.

Float parity: all dot products / norms are emitted as left-associated
``a[1]*b[1] + a[2]*b[2] + …`` chains — the same evaluation order as the
Spark side's ``F.aggregate`` fold — so both engines produce
bit-identical IEEE doubles and sign/argmin/top-k decisions agree
exactly (no tolerance needed).
"""

from __future__ import annotations

from s2_spark.functions.similarity import _hyperplanes, ivf_fixed_centroids

# token set shared by the dedup oracles (mirrors dedup.tokens_col:
# distinct tokens of the NORMALIZED text — trim + whitespace collapse +
# lowercase — so texts that collapse as exact duplicates share one
# token set, never differing by phantom empty tokens)
_TOKS = (
    "list_distinct(string_split("
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))"
)


def minhash_oracle(threshold: float = 0.5) -> str:
    """Exact token-set Jaccard over all pairs. Valid oracle for the
    MinHash-LSH pipeline when banding is r=1 (one signature row per
    band): a pair with similarity s is missed with probability
    (1-s)^k ≤ 2^-32 at s ≥ 0.5, k = 32 — verified exhaustively equal on
    the fixture corpora."""
    jac = (
        "len(list_intersect(a.tk, b.tk))::DOUBLE"
        " / len(list_distinct(list_concat(a.tk, b.tk)))"
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents)
SELECT a.doc_id AS d1, b.doc_id AS d2, round({jac}, 4) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE {jac} >= {threshold}
ORDER BY d1, d2
"""


def simhash_oracle(max_hamming: int = 7) -> str:
    """Brute-force 64-bit md5-simhash hamming pairs. Valid oracle for
    the banded Spark pipeline because 8 bands of 8 bits guarantee (by
    pigeonhole) that any pair with hamming ≤ 7 shares one exact band —
    recall is 1 by construction, so banded == brute force."""
    bit_sums = []
    for j in range(64):
        pos, sh = 1 + j // 4, 3 - (j % 4)
        bit = f"(((strpos('0123456789abcdef', substr(mh, {pos}, 1)) - 1) >> {sh}) & 1)"
        bit_sums.append(
            f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{j}"
        )
    pack = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {-(1 << 63) if j == 63 else (1 << j)} ELSE 0 END"
        for j in range(64)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
h AS (SELECT doc_id, md5(tok) AS mh FROM toks),
bits AS (SELECT doc_id, {", ".join(bit_sums)} FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({pack} AS BIGINT) AS fp FROM bits)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
ORDER BY d1, d2
"""


def _chain(a: str, b: str, dim: int) -> str:
    return " + ".join(f"{a}[{i + 1}] * {b}[{i + 1}]" for i in range(dim))


def _dot_lit(vec: str, plane: list[float]) -> str:
    return " + ".join(f"{vec}[{i + 1}] * {plane[i]!r}" for i in range(len(plane)))


def lsh_topk_oracle(
    k: int = 10, query_id: int = 0, m: int = 8, dim: int = 64, seed: int = 42
) -> str:
    """Full replay of lsh_topk (multiprobe=1): identical hyperplane
    literals → identical sign buckets → identical probe set → exact
    cosine rerank within candidates."""
    planes = _hyperplanes(dim, m, seed)

    def bkt(vec: str) -> str:
        return " + ".join(
            f"CASE WHEN ({_dot_lit(vec, p)}) >= 0 THEN {1 << i} ELSE 0 END"
            for i, p in enumerate(planes)
        )

    flips = ", ".join(f"({1 << i})" for i in range(m))
    sim = (
        f"({_chain('v', 'qe', dim)}) /"
        f" (sqrt({_chain('v', 'v', dim)}) * sqrt({_chain('qe', 'qe', dim)}))"
    )
    return f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = {query_id}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {query_id}),
b AS (SELECT vec_id, v, ({bkt('v')}) AS bkt FROM e),
qb AS (SELECT qe, ({bkt('qe')}) AS qbkt FROM q),
probes AS (SELECT qbkt AS p FROM qb
           UNION ALL SELECT xor(qbkt, f) FROM qb, (VALUES {flips}) AS fl(f)),
cand AS (SELECT vec_id, {sim} AS sim_raw
         FROM b, qb WHERE b.bkt IN (SELECT p FROM probes))
SELECT vec_id, round(sim_raw, 4) AS sim
FROM cand ORDER BY sim_raw DESC, vec_id LIMIT {k}
"""


def ivf_topk_oracle(
    k: int = 10,
    query_id: int = 0,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = 7,
    nprobe: int = 4,
) -> str:
    """Full replay of the fixed-centroid IVF pipeline: identical
    centroid literals → identical nearest-cell assignment (squared
    euclidean, first-min tie-break) → identical probe-cell ranking
    (SAME squared-euclidean metric — the one that carved the cells) →
    exact cosine rerank within probed cells."""
    cents = ivf_fixed_centroids(n_cells, dim, seed)
    cent_values = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    sqd = " + ".join(
        f"(v[{i + 1}] - cv[{i + 1}]) * (v[{i + 1}] - cv[{i + 1}])" for i in range(dim)
    )
    qsqd = " + ".join(
        f"(cv[{i + 1}] - qe[{i + 1}]) * (cv[{i + 1}] - qe[{i + 1}])"
        for i in range(dim)
    )
    sim = (
        f"({_chain('v', 'qe', dim)}) /"
        f" (sqrt({_chain('v', 'v', dim)}) * sqrt({_chain('qe', 'qe', dim)}))"
    )
    return f"""
WITH cents(cell, cv) AS (VALUES {cent_values}),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = {query_id}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> {query_id}),
assign AS (SELECT vec_id, v,
           (SELECT cell FROM cents ORDER BY ({sqd}) ASC, cell LIMIT 1) AS cell FROM e),
qcells AS (SELECT cell FROM cents, q ORDER BY ({qsqd}) ASC, cell LIMIT {nprobe}),
cand AS (SELECT vec_id, {sim} AS sim_raw
         FROM assign, q WHERE cell IN (SELECT cell FROM qcells))
SELECT vec_id, round(sim_raw, 4) AS sim
FROM cand ORDER BY sim_raw DESC, vec_id LIMIT {k}
"""


def fingerprint_oracle() -> str:
    """Mirror of text.fingerprint_portable: rolling (acc·31 + md5_56(tok))
    mod 1e9+7 over in-order whitespace tokens."""
    return """
SELECT doc_id, CAST(list_reduce(list_transform(string_split_regex(trim(lower(text)), '\\s+'),
  tok -> list_reduce(list_transform(range(1, 15),
           i -> strpos('0123456789abcdef', substr(md5(tok), i::INTEGER, 1)) - 1),
           (a, b) -> a * 16 + b) % 1000000007),
  (h, t) -> (h * 31 + t) % 1000000007) AS BIGINT) AS fp
FROM documents ORDER BY doc_id
"""


def _minhash_band_sql(k: int, bands: int) -> tuple[str, str, str]:
    """(comps, cases, band_list) SQL fragments for the md5-rotation
    minhash band-bucket family — the single definition behind every
    oracle that replays ``dedup._band_buckets`` (keep rule, cluster CC,
    pipeline summary), so the k ≤ 16 rotation family can't drift
    between copies."""
    r = k // bands
    assert bands * r == k and k <= 16
    comps = ", ".join(
        f"min(substr(md5(tok), {2 * i + 1}, {32 - 2 * i}) || "
        f"substr(md5(tok), 1, {2 * i})) AS c{i}"
        for i in range(k)
    )
    cases = " ".join(
        "WHEN {b} THEN md5({expr})".format(
            b=b,
            expr=" || '|' || ".join(f"c{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    band_list = ", ".join(str(b) for b in range(bands))
    return comps, cases, band_list


def minhash_keep_ctes(
    k: int = 16, bands: int = 4, corpus: str = "documents"
) -> str:
    """The CTE chain of the minhash keep replay, parameterized on the
    corpus relation so composite oracles (e.g. the x80 yield funnel,
    which runs the keep rule on exact-dedup survivors) can embed it
    after their own CTEs. Survivors are ``SELECT doc_id FROM dmin
    WHERE doc_id = dm``."""
    comps, cases, band_list = _minhash_band_sql(k, bands)
    return f"""toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM {corpus}),
sig AS (SELECT doc_id, {comps} FROM toks GROUP BY doc_id),
banded AS (
  SELECT doc_id, band, CASE band {cases} END AS bh
  FROM sig CROSS JOIN (SELECT unnest([{band_list}]) AS band)
),
bmin AS (SELECT band, bh, min(doc_id) AS bm FROM banded GROUP BY band, bh),
dmin AS (SELECT banded.doc_id AS doc_id, min(bm) AS dm
         FROM banded JOIN bmin USING (band, bh) GROUP BY banded.doc_id)"""


def minhash_keep_oracle(k: int = 16, bands: int = 4) -> str:
    """Full replay of dedup.minhash_dedup_keep: md5-string minhash
    signature (component i = lexicographic min over the 2i-hex-char
    cyclic rotation of md5(tok) — one digest per token, a valid
    uniform order both engines share), md5 band hashes over
    '|'-joined component slices, bucket-min, and the keep rule
    (doc survives iff no band bucket holds a lower doc_id)."""
    return f"""
WITH {minhash_keep_ctes(k, bands)}
SELECT doc_id FROM dmin WHERE doc_id = dm ORDER BY doc_id
"""


def neardup_clusters_oracle(k: int = 16, bands: int = 4) -> str:
    """Full replay of dedup.neardup_clusters: identical md5-rotation
    signature/banding as :func:`minhash_keep_oracle`, bucket-star
    edges, then the connected-components min-label closure as a
    recursive CTE (DuckDB computes the reachability closure; min label
    per node = minimum member id of its component — exactly the
    fixpoint of the Spark side's iterative propagation)."""
    comps, cases, band_list = _minhash_band_sql(k, bands)
    return f"""
WITH RECURSIVE
toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
sig AS (SELECT doc_id, {comps} FROM toks GROUP BY doc_id),
banded AS (
  SELECT doc_id, band, CASE band {cases} END AS bh
  FROM sig CROSS JOIN (SELECT unnest([{band_list}]) AS band)
),
bmin AS (SELECT band, bh, min(doc_id) AS bm FROM banded GROUP BY band, bh),
edges AS (SELECT DISTINCT banded.doc_id AS a, bm AS b
          FROM banded JOIN bmin USING (band, bh) WHERE banded.doc_id <> bm),
und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
cc(v, lbl) AS (
  SELECT doc_id, doc_id FROM sig
  UNION
  SELECT und.b, cc.lbl FROM cc JOIN und ON und.a = cc.v
)
SELECT v AS doc_id, min(lbl) AS cluster FROM cc GROUP BY v ORDER BY doc_id
"""


def _recall_sql(
    corpus_ctes: list[str],
    corpus: str,
    query_ids,
    k: int,
    m: int,
    dim: int,
    seed: int,
) -> str:
    """Shared recall@k replay over a ``corpus`` CTE exposing
    ``(vec_id, v DOUBLE[])`` — both the brute-force and multiprobe-LSH
    (multiprobe=1) pipelines per query, with identical hyperplane
    literals and left-associated cosine chains, so the recall number
    itself is hash-verified. Backs :func:`ann_recall_oracle` (raw
    fixture corpus) and :func:`planted_recall_oracle` (fixture ∪
    planted near-neighbors)."""
    planes = _hyperplanes(dim, m, seed)

    def bkt(vec: str) -> str:
        return " + ".join(
            f"CASE WHEN ({_dot_lit(vec, p)}) >= 0 THEN {1 << i} ELSE 0 END"
            for i, p in enumerate(planes)
        )

    flips = ", ".join(f"({1 << i})" for i in range(m))
    ctes, rows = list(corpus_ctes), []
    for qi, qid in enumerate(query_ids):
        ctes.append(
            f"q{qi} AS (SELECT v AS qe FROM {corpus} WHERE vec_id = {qid})"
        )
        ctes.append(
            f"e{qi} AS (SELECT vec_id, v FROM {corpus} WHERE vec_id <> {qid})"
        )
        # cosine = dot / (|v||qe|): |qe| constant per query and |v| > 0,
        # but rank by the FULL cosine (same as the Spark side) so ties
        # and signs behave identically
        cos = (
            f"({_chain('v', 'qe', dim)}) /"
            f" (sqrt({_chain('v', 'v', dim)}) * sqrt({_chain('qe', 'qe', dim)}))"
        )
        ctes.append(
            f"br{qi} AS (SELECT vec_id FROM e{qi}, q{qi} "
            f"ORDER BY {cos} DESC, vec_id LIMIT {k})"
        )
        ctes.append(f"b{qi} AS (SELECT vec_id, v, ({bkt('v')}) AS bkt FROM e{qi})")
        ctes.append(f"qb{qi} AS (SELECT qe, ({bkt('qe')}) AS qbkt FROM q{qi})")
        ctes.append(
            f"pr{qi} AS (SELECT qbkt AS p FROM qb{qi} "
            f"UNION ALL SELECT xor(qbkt, f) FROM qb{qi}, (VALUES {flips}) AS fl(f))"
        )
        ctes.append(
            f"an{qi} AS (SELECT vec_id FROM b{qi}, qb{qi} "
            f"WHERE b{qi}.bkt IN (SELECT p FROM pr{qi}) "
            f"ORDER BY {cos} DESC, vec_id LIMIT {k})"
        )
        rows.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM an{qi} "
            f"WHERE vec_id IN (SELECT vec_id FROM br{qi})) AS hits"
        )
    union = " UNION ALL ".join(rows)
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT query_id, hits, round(hits / {k}.0, 4) AS recall "
        f"FROM ({union}) ORDER BY query_id"
    )


def ann_recall_oracle(
    query_ids=(0, 1, 2, 3, 4),
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> str:
    """Recall@k of the multiprobe-LSH ANN vs exact brute force on the
    raw fixture corpus, per query vector — full replay via
    :func:`_recall_sql`."""
    corpus = [
        "corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)"
    ]
    return _recall_sql(corpus, "corpus", query_ids, k, m, dim, seed)


def planted_deltas(
    query_ids=(0, 1, 2, 3, 4),
    copies: int = 12,
    eps: float = 0.02,
    dim: int = 64,
) -> list[tuple[int, int, list[float]]]:
    """Deterministic planted-near-neighbor deltas: for each query id,
    ``copies`` perturbation vectors of length ``eps`` from the same LCG
    unit-vector generator the LSH hyperplanes use
    (``similarity._hyperplanes``, seed 1000+qid). Returns
    ``(planted_id, base_id, delta[dim])`` rows; planted ids start at
    10_000_000 (above any fixture vec_id at any SF). Both the Spark
    query and the oracle consume these exact Python floats, so the
    synthetic corpus is bit-identical across engines."""
    rows = []
    for qid in query_ids:
        units = _hyperplanes(dim, copies, 1000 + qid)
        for j, u in enumerate(units):
            rows.append(
                (10_000_000 + qid * 100 + j + 1, qid, [eps * x for x in u])
            )
    return rows


def _planted_corpus_ctes(query_ids, copies: int, eps: float, dim: int) -> list[str]:
    """CTEs defining the planted-near-neighbor corpus ``corpus(vec_id,
    v DOUBLE[])``: fixture embeddings ∪ (base + literal delta) copies,
    one addition per element — the same association as the Spark
    side's zip_with, so the synthetic corpus is bit-identical."""
    deltas = planted_deltas(query_ids, copies, eps, dim)
    vals = ", ".join(
        f"({pid}, {qid}, [{', '.join(repr(x) for x in d)}]::DOUBLE[])"
        for pid, qid, d in deltas
    )
    return [
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"pl(pid, bid, d) AS (VALUES {vals})",
        "corpus AS (SELECT vec_id, v FROM base UNION ALL "
        f"SELECT pid, list_transform(range(1, {dim + 1}), i -> v[i] + d[i]) "
        "FROM pl JOIN base ON base.vec_id = pl.bid)",
    ]


def planted_recall_oracle(
    query_ids=(0, 1, 2, 3, 4),
    copies: int = 12,
    eps: float = 0.02,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> str:
    """Recall@k on the fixture corpus ∪ planted near-neighbors: each
    query vector gets ``copies`` planted copies (base + eps·unit), so
    its true top-k is dominated by genuine near-duplicates — the
    clusterable regime ANN is built for, where the (m, multiprobe) dial
    must deliver high recall."""
    corpus = _planted_corpus_ctes(query_ids, copies, eps, dim)
    return _recall_sql(corpus, "corpus", query_ids, k, m, dim, seed)


def ivf_planted_recall_oracle(
    query_ids=(0, 1, 2, 3, 4),
    copies: int = 12,
    eps: float = 0.02,
    k: int = 10,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = 7,
    nprobe: int = 2,
) -> str:
    """IVF companion of :func:`planted_recall_oracle`: recall@k of the
    fixed-centroid IVF tier (nearest-cell assignment by squared
    euclidean, nprobe top-cosine cells probed, exact rerank within) vs
    brute force, on the same planted corpus — the full pipeline
    replayed with identical centroid literals, so the recall number is
    hash-verified for BOTH ANN tiers."""
    cents = ivf_fixed_centroids(n_cells, dim, seed)
    cent_values = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    sqd = " + ".join(
        f"(v[{i + 1}] - cv[{i + 1}]) * (v[{i + 1}] - cv[{i + 1}])" for i in range(dim)
    )
    qsqd = " + ".join(
        f"(cv[{i + 1}] - qe[{i + 1}]) * (cv[{i + 1}] - qe[{i + 1}])"
        for i in range(dim)
    )
    cos = (
        f"({_chain('v', 'qe', dim)}) /"
        f" (sqrt({_chain('v', 'v', dim)}) * sqrt({_chain('qe', 'qe', dim)}))"
    )
    ctes = _planted_corpus_ctes(query_ids, copies, eps, dim)
    ctes.append(f"cents(cell, cv) AS (VALUES {cent_values})")
    ctes.append(
        "assign AS (SELECT vec_id, v, (SELECT cell FROM cents "
        f"ORDER BY ({sqd}) ASC, cell LIMIT 1) AS cell FROM corpus)"
    )
    rows = []
    for qi, qid in enumerate(query_ids):
        ctes.append(f"q{qi} AS (SELECT v AS qe FROM corpus WHERE vec_id = {qid})")
        ctes.append(
            f"br{qi} AS (SELECT vec_id FROM corpus e, q{qi} "
            f"WHERE e.vec_id <> {qid} ORDER BY {cos} DESC, vec_id LIMIT {k})"
        )
        ctes.append(
            f"qc{qi} AS (SELECT cell FROM cents, q{qi} "
            f"ORDER BY ({qsqd}) ASC, cell LIMIT {nprobe})"
        )
        ctes.append(
            f"an{qi} AS (SELECT vec_id FROM assign, q{qi} "
            f"WHERE cell IN (SELECT cell FROM qc{qi}) AND vec_id <> {qid} "
            f"ORDER BY {cos} DESC, vec_id LIMIT {k})"
        )
        rows.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM an{qi} "
            f"WHERE vec_id IN (SELECT vec_id FROM br{qi})) AS hits"
        )
    union = " UNION ALL ".join(rows)
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT query_id, hits, round(hits / {k}.0, 4) AS recall "
        f"FROM ({union}) ORDER BY query_id"
    )


def planted_dedup_recall_oracle(
    k: int = 16, bands: int = 4, n_base: int = 40
) -> str:
    """Full replay of the planted-duplicate recall report (x50): the
    fixture corpus gains one planted copy per base doc (doc_id <
    ``n_base``) — byte-exact for even ids, one-appended-token near-dups
    for odd ids, planted ids offset by 20M so fixture keep decisions
    cannot change (bucket minima only ever see LARGER new ids). The
    md5-rotation keep pipeline then runs over the synthesized corpus
    and each planted copy reports whether it was deduped away."""
    comps, cases, band_list = _minhash_band_sql(k, bands)
    return f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < {n_base}),
pl AS (
  SELECT doc_id + 20000000 AS doc_id, text, 'exact' AS kind
  FROM base WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + 20000000, text || ' zqzduplicatemarker', 'near'
  FROM base WHERE doc_id % 2 = 1
),
corpus AS (SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id, text FROM pl),
toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM corpus),
sig AS (SELECT doc_id, {comps} FROM toks GROUP BY doc_id),
banded AS (
  SELECT doc_id, band, CASE band {cases} END AS bh
  FROM sig CROSS JOIN (SELECT unnest([{band_list}]) AS band)
),
bmin AS (SELECT band, bh, min(doc_id) AS bm FROM banded GROUP BY band, bh),
dmin AS (SELECT banded.doc_id AS doc_id, min(bm) AS dm
         FROM banded JOIN bmin USING (band, bh) GROUP BY banded.doc_id),
kept AS (SELECT doc_id FROM dmin WHERE doc_id = dm)
SELECT pl.doc_id AS planted_id, kind,
       pl.doc_id NOT IN (SELECT doc_id FROM kept) AS deduped
FROM pl ORDER BY planted_id
"""


def semdedup_oracle(
    query_ids=(0, 1, 2, 3, 4),
    copies: int = 12,
    eps: float = 0.02,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = 7,
    tau: float = 0.99,
) -> str:
    """Full replay of the SemDeDup pass (x49): identical planted-corpus
    synthesis → identical fixed-centroid cell assignment → within-cell
    pairs only → exact cosine against ``tau`` on the RAW double (both
    engines compute the identical left-associated fold, so the
    threshold set matches bit-for-bit) → per dropped vector the lowest
    surviving anchor and the similarity to it."""
    cents = ivf_fixed_centroids(n_cells, dim, seed)
    cent_values = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    sqd = " + ".join(
        f"(v[{i + 1}] - cv[{i + 1}]) * (v[{i + 1}] - cv[{i + 1}])" for i in range(dim)
    )
    cos = (
        f"({_chain('a.v', 'b.v', dim)}) /"
        f" (sqrt({_chain('a.v', 'a.v', dim)}) * sqrt({_chain('b.v', 'b.v', dim)}))"
    )
    ctes = _planted_corpus_ctes(query_ids, copies, eps, dim)
    ctes.append(f"cents(cell, cv) AS (VALUES {cent_values})")
    ctes.append(
        "assign AS (SELECT vec_id, v, (SELECT cell FROM cents "
        f"ORDER BY ({sqd}) ASC, cell LIMIT 1) AS cell FROM corpus)"
    )
    ctes.append(
        f"pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos} AS s "
        "FROM assign a JOIN assign b "
        "ON a.cell = b.cell AND a.vec_id < b.vec_id)"
    )
    ctes.append(
        "hit AS (SELECT b_id, min(a_id) AS anchor, arg_min(s, a_id) AS sa "
        f"FROM pairs WHERE s >= {tau!r} GROUP BY b_id)"
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT b_id AS vec_id, anchor, round(sa, 4) AS anchor_sim "
        "FROM hit ORDER BY vec_id"
    )


#: adaptive bucket-count dial shared by x51's Spark plan and its
#: oracle: m = 8 + #{j in [9..16] : n > 2^j}, i.e. 2^m tracks n/2 so
#: expected per-bucket occupancy stays ~constant as the corpus grows —
#: the "2^m ∝ n" regime SCALE.md measured at 2.26×/decade (flat
#: centroids: 4.8×). Pure integer threshold comparisons so both
#: engines agree exactly (no ceil(log2(·)) libm edge).
SEMDEDUP_MIN_M = 8
SEMDEDUP_MAX_M = 16


def semdedup_adaptive_m(n: int) -> int:
    return SEMDEDUP_MIN_M + sum(
        1 for j in range(SEMDEDUP_MIN_M + 1, SEMDEDUP_MAX_M + 1) if n > (1 << j)
    )


def semdedup_bucketed_oracle(
    query_ids=(0, 1, 2, 3, 4),
    copies: int = 12,
    eps: float = 0.02,
    dim: int = 64,
    seed: int = 42,
    tau: float = 0.99,
) -> str:
    """Full replay of the bucketed SemDeDup pass (x51): identical
    planted-corpus synthesis → identical hyperplane sign buckets
    (the x11/x13 LSH machinery — assignment is O(n·m·dim), never a
    per-centroid scan) → each vector probes its own bucket plus every
    1-bit flip, joined against exact buckets, so a pair is compared
    iff their sign keys differ in ≤ 1 bit (each such pair exactly
    once: the probe set per vector is m+1 DISTINCT keys and only the
    ``a_id < b_id`` orientation survives) → exact cosine against
    ``tau`` on the RAW double → per dropped vector the lowest
    surviving anchor and the similarity to it.

    The bucket count is ADAPTIVE (``semdedup_adaptive_m``): plane i
    contributes its sign bit, and flip i probes, only when i < m, with
    m derived from COUNT(*) over the corpus by the same integer
    thresholds the Spark side uses — so the oracle stays valid at every
    scale factor, not just the one it was generated for."""
    planes = _hyperplanes(dim, SEMDEDUP_MAX_M, seed)
    m_expr = f"{SEMDEDUP_MIN_M} + " + " + ".join(
        f"(CASE WHEN cnt > {1 << j} THEN 1 ELSE 0 END)"
        for j in range(SEMDEDUP_MIN_M + 1, SEMDEDUP_MAX_M + 1)
    )

    def bkt(vec: str) -> str:
        terms = []
        for i, p in enumerate(planes):
            gate = "" if i < SEMDEDUP_MIN_M else f"{i} < mm.m AND "
            terms.append(
                f"CASE WHEN {gate}({_dot_lit(vec, p)}) >= 0 "
                f"THEN {1 << i} ELSE 0 END"
            )
        return " + ".join(terms)

    flips = ", ".join(f"({i}, {1 << i})" for i in range(SEMDEDUP_MAX_M))
    cos = (
        f"({_chain('pr.va', 'b.v', dim)}) /"
        f" (sqrt({_chain('pr.va', 'pr.va', dim)}) * sqrt({_chain('b.v', 'b.v', dim)}))"
    )
    ctes = _planted_corpus_ctes(query_ids, copies, eps, dim)
    ctes.append(
        f"mm AS (SELECT ({m_expr}) AS m "
        "FROM (SELECT count(*) AS cnt FROM corpus))"
    )
    ctes.append(
        f"b AS (SELECT vec_id, v, ({bkt('v')}) AS bkt FROM corpus, mm)"
    )
    ctes.append(
        "pr AS (SELECT vec_id AS a_id, v AS va, bkt AS p FROM b "
        "UNION ALL SELECT vec_id, v, xor(bkt, f) "
        f"FROM b, (VALUES {flips}) AS fl(i, f), mm WHERE fl.i < mm.m)"
    )
    ctes.append(
        f"pairs AS (SELECT pr.a_id, b.vec_id AS b_id, {cos} AS s "
        "FROM pr JOIN b ON pr.p = b.bkt AND pr.a_id < b.vec_id)"
    )
    ctes.append(
        "hit AS (SELECT b_id, min(a_id) AS anchor, arg_min(s, a_id) AS sa "
        f"FROM pairs WHERE s >= {tau!r} GROUP BY b_id)"
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT b_id AS vec_id, anchor, round(sa, 4) AS anchor_sim "
        "FROM hit ORDER BY vec_id"
    )


# the funnel CASE shared by the x33 and x35 oracles (mirrors
# extensions._funnel_verdict; integer-only thresholds)
_FUNNEL_CASE = (
    "CASE "
    "WHEN lang NOT IN ('en', 'es', 'de', 'fr') THEN 'lang_filtered' "
    "WHEN ntok < 15 THEN 'too_short' "
    "WHEN stop * 25 < ntok THEN 'low_stopword' "
    "WHEN (len(gs) - len(list_distinct(gs))) * 5 > len(gs) THEN 'repetitive' "
    "ELSE 'keep' END"
)


def pipeline_summary_oracle(k: int = 16, bands: int = 4, budget: int = 512) -> str:
    """End-to-end replay of the x35 training-data pipeline: quality
    funnel -> exact dedup (min id per md5) -> minhash keep rule (same
    md5-rotation family as :func:`minhash_keep_oracle`, but over the
    exact-dedup survivors) -> token total and 512-budget sequence
    count. Single summary row."""
    comps, cases, band_list = _minhash_band_sql(k, bands)
    toks_of_text = _TOKS
    return f"""
WITH w AS (SELECT doc_id, text, lang, string_split(lower(text), ' ') AS ws FROM documents),
g AS (SELECT doc_id, text, lang, len(ws) AS ntok,
      CAST(length(list_filter(ws, x -> x IN
        ('the','a','of','and','to','in','is'))) AS BIGINT) AS stop,
      list_transform(generate_series(1, len(ws) - 1),
        i -> ws[i] || ' ' || ws[i + 1]) AS gs FROM w),
q AS (SELECT doc_id, text FROM g WHERE {_FUNNEL_CASE} = 'keep'),
eh AS (SELECT doc_id, text, md5(text) AS h FROM q),
er AS (SELECT min(doc_id) AS doc_id FROM eh GROUP BY h),
ed AS (SELECT eh.doc_id, eh.text FROM eh JOIN er USING (doc_id)),
toks AS (SELECT doc_id, unnest({toks_of_text}) AS tok FROM ed),
sig AS (SELECT doc_id, {comps} FROM toks GROUP BY doc_id),
banded AS (
  SELECT doc_id, band, CASE band {cases} END AS bh
  FROM sig CROSS JOIN (SELECT unnest([{band_list}]) AS band)
),
bmin AS (SELECT band, bh, min(doc_id) AS bm FROM banded GROUP BY band, bh),
dmin AS (SELECT banded.doc_id AS doc_id, min(bm) AS dm
         FROM banded JOIN bmin USING (band, bh) GROUP BY banded.doc_id),
keep AS (SELECT doc_id FROM dmin WHERE doc_id = dm),
kd AS (SELECT ed.doc_id, len(string_split(ed.text, ' ')) AS ntok
       FROM ed JOIN keep USING (doc_id))
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_input,
  (SELECT CAST(count(*) AS BIGINT) FROM q) AS after_quality,
  (SELECT CAST(count(*) AS BIGINT) FROM ed) AS after_exact,
  (SELECT CAST(count(*) AS BIGINT) FROM kd) AS after_neardup,
  (SELECT CAST(sum(ntok) AS BIGINT) FROM kd) AS total_tokens,
  (SELECT CAST((sum(ntok) + {budget - 1}) // {budget} AS BIGINT) FROM kd) AS n_sequences
"""
