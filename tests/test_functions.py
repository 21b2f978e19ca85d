"""Engine tests for the extension operators: dedup (exact/minhash/
simhash/ngram), similarity (brute/LSH/IVF with planted duplicates),
text analysis, and multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from s2_spark.functions import dedup as D
from s2_spark.functions import multimodal as M
from s2_spark.functions import similarity as S
from s2_spark.functions import text as X
from s2_spark.tables import t


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return t(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").cache()


# --- exact dedup -----------------------------------------------------------


def test_exact_dedup_with_planted_dups(spark, docs):
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    with_dups = docs.unionByName(dup)
    survivors = D.exact_dedup(with_dups)
    assert survivors.count() == docs.count()  # 5 planted dups removed
    groups = D.duplicate_groups(with_dups)
    assert groups.count() == 5
    assert all(r.c == 2 for r in groups.collect())


def test_exact_dedup_normalizes_whitespace(spark, docs):
    variant = docs.limit(3).withColumn(
        "text", F.concat(F.lit("  "), F.regexp_replace("text", " ", "   "))
    ).withColumn("doc_id", F.col("doc_id") + 200000)
    merged = docs.unionByName(variant)
    assert D.exact_dedup(merged).count() == docs.count()


# --- minhash / LSH near-dup ---------------------------------------------------


def test_minhash_finds_planted_neardups(spark, docs):
    # plant: copy 3 docs, drop their last 2 tokens (high jaccard)
    base = docs.limit(3)
    mutated = base.select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.array_join(
            F.slice(F.split("text", " "), 1, F.size(F.split("text", " ")) - 2), " "
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = D.minhash_neardup_pairs(corpus, threshold=0.5).collect()
    found = {(r.d1, r.d2) for r in pairs}
    for i in range(3):
        doc_id = base.collect()[i].doc_id
        assert (doc_id, doc_id + 300000) in found, f"planted pair {doc_id} missed"
    for r in pairs:
        assert r.jaccard >= 0.5


def test_minhash_signature_shape(spark, docs):
    sig = D.minhash_signatures(docs.limit(10), k=16).collect()
    assert all(len(r.sig) == 16 for r in sig)


def test_lsh_candidates_subset_verified(spark, docs):
    corpus = docs.limit(50).select("doc_id", "text")
    sig = D.minhash_signatures(corpus, k=16)
    cands = D.lsh_candidate_pairs(sig, bands=4)
    verified = D.exact_jaccard(corpus, cands)
    rows = verified.collect()
    assert all(r.d1 < r.d2 for r in rows)
    assert all(0.0 <= r.jaccard <= 1.0 for r in rows)


# --- simhash -------------------------------------------------------------------


def test_simhash_identical_texts_equal_fingerprints(spark, docs):
    two = docs.limit(1).select("doc_id", "text")
    copy = two.withColumn("doc_id", F.col("doc_id") + 1000)
    fps = D.simhash(two.unionByName(copy)).collect()
    assert fps[0].simhash == fps[1].simhash


def test_lsh_multiprobe_widens_to_brute_force(spark, emb):
    """multiprobe is a real dial: at multiprobe=m the probe ring covers
    every bucket, so LSH top-k must equal exact brute force — and the
    candidate set must grow monotonically with multiprobe (it was
    previously a silent no-op beyond 1)."""
    brute = [r.vec_id for r in S.cosine_topk(emb, k=5, query_id=0).collect()]
    full = [
        r.vec_id
        for r in S.lsh_topk(emb, k=5, query_id=0, m=8, multiprobe=8).collect()
    ]
    assert full == brute
    n1 = S.lsh_topk(emb, k=10**9, query_id=0, m=8, multiprobe=1).count()
    n2 = S.lsh_topk(emb, k=10**9, query_id=0, m=8, multiprobe=2).count()
    assert n2 >= n1  # the ring genuinely widens


def test_ivf_topk_missing_query_raises(spark, emb):
    import pytest as _pytest

    cents = S.ivf_fixed_centroids(4, 64, 7)
    assigned = S.ivf_assign_fixed(emb, cents)
    with _pytest.raises(ValueError, match="no vector"):
        S.ivf_topk(assigned, cents, query_id=10**9)


def test_ivf_probe_ranking_matches_assignment_metric(spark):
    """Probe cells are ranked by the SAME metric that carved the cells
    (squared euclidean): with unnormalized centroids, cosine ranking
    could exclude the query's own assigned cell and miss an exact
    duplicate of the query."""
    rows = [(0, [2.0, 0.0] + [0.0] * 62), (1, [2.0, 0.0] + [0.0] * 62)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[100.0, 0.0] + [0.0] * 62, [1.0, 0.05] + [0.0] * 62]
    assigned = S.ivf_assign_fixed(df, cents)
    got = S.ivf_topk(assigned, cents, k=1, query_id=0, nprobe=1).collect()
    assert [r.vec_id for r in got] == [1]  # the exact duplicate is found


def test_simhash_guard_rejects_recall_violating_params(spark, docs):
    """bands must exceed max_hamming or the pigeonhole recall guarantee
    is silently void — the function refuses instead."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands > max_hamming"):
        D.simhash_neardup_pairs(docs, max_hamming=8, bands=4)


def test_neardup_clusters_rejects_nonpositive_iters(spark, docs):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_iters"):
        D.neardup_clusters(docs, max_iters=0)


def test_tokens_consistent_with_exact_collapse(spark):
    """Texts that collapse as exact duplicates (same normalized form)
    must have the SAME token set — trailing whitespace cannot create a
    phantom empty token that skews every downstream similarity."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello  world "), (3, "hello there")],
        "doc_id long, text string",
    )
    toks = {r["doc_id"]: sorted(r["t"]) for r in df.select("doc_id", D.tokens_col().alias("t")).collect()}
    assert toks[1] == toks[2] == ["hello", "world"]
    # and the expanded pair similarity equals the uncollapsed pipeline's
    pairs = {
        (r.d1, r.d2): round(r.jaccard, 4)
        for r in D.minhash_neardup_pairs(df, k=32, bands=32, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs.get((1, 3)) == pairs.get((2, 3))  # member == representative


def test_lsh_candidate_pairs_covers_remainder_components(spark, docs):
    """bands that do not divide the signature length must not silently
    ignore trailing components — the last band absorbs the remainder.
    Smoke: k=10 with bands=4 still finds planted exact copies."""
    base = docs.limit(3).select("doc_id", "text")
    copies = base.withColumn("doc_id", F.col("doc_id") + 500000)
    sig = D.minhash_signatures(base.unionByName(copies), k=10)
    got = {(r.d1, r.d2) for r in D.lsh_candidate_pairs(sig, bands=4).collect()}
    for r in base.collect():
        assert (r.doc_id, r.doc_id + 500000) in got


def test_simhash_neardup_detects_copies(spark, docs):
    base = docs.limit(2).select("doc_id", "text")
    copies = base.withColumn("doc_id", F.col("doc_id") + 400000)
    pairs = D.simhash_neardup_pairs(
        base.unionByName(copies), max_hamming=0
    ).collect()
    got = {(r.d1, r.d2) for r in pairs}
    for r in base.collect():
        assert (r.doc_id, r.doc_id + 400000) in got


def test_ngram_jaccard_pairs(spark, docs):
    base = docs.limit(2).select("doc_id", "text")
    copies = base.withColumn("doc_id", F.col("doc_id") + 500000)
    pairs = D.ngram_jaccard_pairs(
        base.unionByName(copies), n=5, threshold=0.9
    ).collect()
    got = {(r.d1, r.d2) for r in pairs}
    for r in base.collect():
        assert (r.doc_id, r.doc_id + 500000) in got


# --- similarity -------------------------------------------------------------------


def _plant_copy(emb, src_id=0, new_id=999_999):
    copy = emb.filter(F.col("vec_id") == src_id).select(
        F.lit(new_id).cast("long").alias("vec_id"), "embedding", "label"
    )
    return emb.unionByName(copy)


def test_cosine_topk_exact(spark, emb):
    planted = _plant_copy(emb)
    top = S.cosine_topk(planted, k=5, query_id=0).collect()
    assert top[0].vec_id == 999_999 and abs(top[0].sim - 1.0) < 1e-9
    sims = [r.sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_finds_planted_copy(spark, emb):
    planted = _plant_copy(emb)
    top = S.lsh_topk(planted, k=5, query_id=0, m=8, multiprobe=1).collect()
    assert top[0].vec_id == 999_999  # identical vector: same bucket, sim 1.0


def test_ivf_topk_finds_planted_copy(spark, emb):
    planted = _plant_copy(emb).cache()
    assigned, model = S.ivf_train_assign(planted, n_cells=8)
    top = S.ivf_topk(assigned, model, k=5, query_id=0, nprobe=2).collect()
    assert top[0].vec_id == 999_999


def test_lsh_recall_vs_brute_force(spark, emb):
    brute = {r.vec_id for r in S.cosine_topk(emb, k=10, query_id=0).collect()}
    ann = {r.vec_id for r in S.lsh_topk(emb, k=10, query_id=0, m=6, multiprobe=1).collect()}
    # random vectors: multiprobe LSH with m=6 must still recover some of
    # the true neighborhood; exactness is the planted-copy test's job
    assert len(brute & ann) >= 2


def test_embedding_neardup_bucketed_subset_of_exact(spark, emb):
    small = emb.filter(F.col("vec_id") < 200)
    exact = {
        (r.d1, r.d2)
        for r in S.embedding_neardup_pairs(small, threshold=0.4, exact=True).collect()
    }
    bucketed = {
        (r.d1, r.d2)
        for r in S.embedding_neardup_pairs(small, threshold=0.4, m=4).collect()
    }
    assert bucketed <= exact


# --- text ---------------------------------------------------------------------------


def test_token_counters(spark, docs):
    row = docs.select(
        X.token_count("text", "ws").alias("ws"),
        X.token_count("text", "bpe").alias("bpe"),
    ).first()
    assert row.ws > 0 and row.bpe >= row.ws  # punct splits add tokens


def test_lang_id_english_corpus(spark):
    rows = [
        (1, "the cat sat on the mat and it is a good day for the cat"),
        (2, "el gato y la casa de los que se fueron por un camino"),
        (3, "zzz qqq xxx yyy www"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in X.lang_id(df).collect()}
    assert got[1] == "en" and got[2] == "es" and got[3] == "unk"


def test_quality_score_bounds(spark, docs):
    rows = docs.select(X.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")], "doc_id long, text string"
    )
    fps = [r.fp for r in df.select(X.fingerprint("text").alias("fp")).collect()]
    assert fps[0] != fps[1]


# --- multimodal plumbing ---------------------------------------------------------------


def test_multimodal_default_decoder_raises(spark):
    media = M.synthetic_media(spark, n=6)
    with pytest.raises(Exception) as ei:
        M.extract_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or "media decoding" in str(ei.value)


def test_multimodal_fake_features_deterministic(spark):
    media = M.synthetic_media(spark, n=12)
    f1 = {r.media_id: r.features for r in M.extract_features(media, fake=True).collect()}
    f2 = {r.media_id: r.features for r in M.extract_features(media, fake=True).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    # features feed straight into the similarity operators
    feat_df = M.extract_features(media, fake=True).withColumnRenamed(
        "media_id", "vec_id"
    ).withColumnRenamed("features", "embedding")
    top = S.cosine_topk(feat_df, k=3, query_id=0, vec_col="embedding").collect()
    assert len(top) == 3


def test_frame_sampling_grid(spark):
    media = M.synthetic_media(spark, n=9)
    frames = M.frame_sample(media, every_ms=1000, fake=True).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    for rows in by_media.values():
        assert len(rows) == 5  # 5000ms / 1000ms
        assert sorted(r.frame_ts_ms for r in rows) == [0, 1000, 2000, 3000, 4000]
        assert all(r.frame is not None for r in rows)


def test_resize_updates_metadata(spark):
    media = M.synthetic_media(spark, n=9)
    out = M.resize_images(media, 32, 32, fake=True).collect()
    assert all(r.width == 32 and r.height == 32 for r in out)
    assert all(r.kind == "image" for r in out)


def test_png_codec_roundtrip():
    """Built-in PNG encode→decode is pixel-exact (filter-0 write; the
    decoder also handles sub/up/average/paeth rows)."""
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (M.decode_png(M.encode_png(px)) == px).all()


def test_png_decoder_handles_all_filter_types():
    """Hand-build a PNG whose rows use filters 0-4 and check against a
    straightforwardly computed expectation."""
    import struct
    import zlib

    import numpy as np

    w, h, ch = 4, 5, 3
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).astype(np.int32)
    flat = px.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        f = y % 5
        raw.append(f)
        cur = flat[y]
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                enc = cur[x]
            elif f == 1:
                enc = cur[x] - a
            elif f == 2:
                enc = cur[x] - b
            elif f == 3:
                enc = cur[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = cur[x] - pr
            raw.append(int(enc) & 0xFF)
        prev = cur

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (M.decode_png(png) == px.astype(np.uint8)).all()


def test_extract_features_real_png_through_media_pipeline(spark):
    """x17 honest end-to-end: real PNG payloads through extract_features
    with NO fake decoder — features come from decoded pixels."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(4):
        px = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
        rows.append((i, "image", "image/png", 6, 6, None, M.encode_png(px)))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r.media_id: r.features for r in M.extract_features(media).collect()}
    assert len(got) == 4
    for i in range(4):
        assert len(got[i]) == 16
        assert all(0.0 <= v <= 1.0 for v in got[i])
    # matches a driver-side decode of the same payload
    want = M.image_feature_decoder(rows[2][6], dim=16)
    assert got[2] == pytest.approx(want, abs=1e-6)


def test_resize_images_real_png(spark):
    """Real resize path: PNG in, resized PNG out, pixels from the
    nearest-neighbor grid of the source."""
    import numpy as np

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    rows = [(1, "image", "image/png", 8, 8, None, M.encode_png(px))]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.resize_images(media, 4, 4).collect()
    assert len(out) == 1 and out[0].width == 4 and out[0].height == 4
    small = M.decode_png(bytes(out[0].payload))
    assert small.shape == (4, 4, 3)
    assert (small == px[::2, ::2]).all()


def test_wav_codec_roundtrip_and_features():
    """Stdlib WAV decode is sample-exact for 16-bit PCM, and the real
    audio features separate a pure tone from silence."""
    import numpy as np

    sr = 8000
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    x, got_sr = M.decode_wav(M.encode_wav(tone, sr))
    assert got_sr == sr and len(x) == sr
    assert np.abs(x - tone).max() < 1e-3  # 16-bit quantization bound
    f_tone = M.audio_feature_decoder(M.encode_wav(tone, sr))
    f_silence = M.audio_feature_decoder(M.encode_wav(np.zeros(sr, np.float32), sr))
    assert len(f_tone) == 16
    assert f_tone[1] > 0.3 > f_silence[1]  # rms
    assert all(0.0 <= v <= 1.0 for v in f_tone)
    # tone energy concentrates in few bands; silence has none
    assert max(f_tone[6:14]) > 0.9
    assert sum(f_silence[6:14]) == 0.0


def test_extract_features_real_audio_through_media_pipeline(spark):
    """x17 honest end-to-end for audio: WAV payloads through
    extract_features with no fake decoder, mixed with PNG images in the
    same table (the default decoder sniffs per payload)."""
    import numpy as np

    sr = 4000
    t = np.arange(sr) / sr
    rows = []
    for i in range(3):
        tone = (0.3 + 0.2 * i) * np.sin(2 * np.pi * (220 * (i + 1)) * t)
        rows.append(
            (i, "audio", "audio/wav", None, None, 1000, M.encode_wav(tone.astype(np.float32), sr))
        )
    png = M.encode_png(np.full((4, 4, 3), 128, np.uint8))
    rows.append((9, "image", "image/png", 4, 4, None, png))
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r.media_id: r.features for r in M.extract_features(media).collect()}
    assert len(got) == 4
    want0 = M.audio_feature_decoder(rows[0][6], dim=16)
    assert got[0] == pytest.approx(want0, abs=1e-6)
    assert got[9] == pytest.approx(M.image_feature_decoder(png, dim=16), abs=1e-6)
    # louder tones have higher RMS feature
    assert got[0][1] < got[1][1] < got[2][1]


def test_mp4_metadata_probe():
    """probe_mp4 reads duration/timescale/track-count from a hand-built
    minimal ISO-BMFF tree (ftyp + moov{mvhd, 2×trak}) — real container
    parsing, no codecs."""
    import struct

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">II", 1000, 7500),  # timescale, duration
    )
    moov = box(b"moov", mvhd + box(b"trak", b"") + box(b"trak", b""))
    mp4 = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov
    got = M.probe_mp4(mp4)
    assert got == {"duration_ms": 7500, "timescale": 1000, "n_tracks": 2}
    # 64-bit mvhd (version 1)
    mvhd1 = box(
        b"mvhd",
        b"\x01" + bytes(3) + struct.pack(">QQ", 0, 0) + struct.pack(">IQ", 90000, 90000 * 3),
    )
    got1 = M.probe_mp4(box(b"moov", mvhd1))
    assert got1["duration_ms"] == 3000 and got1["timescale"] == 90000
    with pytest.raises(ValueError):
        M.probe_mp4(b"\x00" * 32)


def test_raw_mp4_roundtrip_and_probe():
    """build_raw_mp4 emits a spec-shaped uncompressed-track container:
    probe_mp4 reads its metadata and decode_raw_mp4_frame returns the
    exact source pixels for any timestamp."""
    import numpy as np

    w, h, fps = 8, 6, 10
    frames = [
        np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3) + i
        for i in range(4)
    ]
    mp4 = M.build_raw_mp4(frames, w, h, fps=fps)
    meta = M.probe_mp4(mp4)
    assert meta["n_tracks"] == 1 and meta["timescale"] == 1000
    assert meta["duration_ms"] == 400  # 4 frames @ 10 fps
    for i in range(4):
        got = M.decode_raw_mp4_frame(mp4, ts_ms=i * 100)
        assert np.array_equal(got, frames[i])
    # timestamps between/past samples clamp to the covering/last frame
    assert np.array_equal(M.decode_raw_mp4_frame(mp4, ts_ms=150), frames[1])
    assert np.array_equal(M.decode_raw_mp4_frame(mp4, ts_ms=9999), frames[3])


def test_frame_sample_real_raw_mp4_end_to_end(spark):
    """The real (non-fake) frame_sample path: raw-RGB MP4 payloads ride
    a media table through mapInPandas and come back as byte-exact
    pixels per sampled frame."""
    import numpy as np

    w, h = 4, 4
    vids = []
    for mid in range(2):
        frames = [
            np.full((h, w, 3), 16 * mid + i, dtype=np.uint8) for i in range(3)
        ]
        vids.append((mid, M.build_raw_mp4(frames, w, h, fps=1), 3000))
    media = spark.createDataFrame(
        [
            (mid, "video", "video/mp4", None, None, dur, payload)
            for mid, payload, dur in vids
        ],
        M.MEDIA_SCHEMA,
    )
    rows = M.frame_sample(media, every_ms=1000).collect()
    assert len(rows) == 6  # 2 videos × 3 sampled frames
    for r in rows:
        expect = np.full((h, w, 3), 16 * r.media_id + r.frame_idx, dtype=np.uint8)
        assert bytes(r.frame) == expect.tobytes()


def test_frame_sample_compressed_codec_still_raises(spark):
    """A non-raw sample entry (e.g. avc1) keeps the honest codec
    boundary: the real path raises instead of fabricating pixels."""
    mp4 = M.build_raw_mp4(
        [bytes(4 * 4 * 3)], 4, 4, fps=1
    ).replace(b"raw ", b"avc1", 1)
    media = spark.createDataFrame(
        [(0, "video", "video/mp4", None, None, 1000, mp4)], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception) as ei:
        M.frame_sample(media, every_ms=1000).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sample_decoder_plugin_seam(spark):
    """The bring-your-own-decoder seam for inter-frame codecs: a
    registered plugin for an 'avc1' track decodes end-to-end through
    the real mapInPandas path — proving the schema, partitioning, and
    Arrow batch plumbing work through an injected decoder (the test
    runs in real executor Python workers, so the registry snapshot
    riding in the task closure is load-bearing, not incidental). The
    snapshot semantics are pinned too: unregistering after the plan is
    built does not affect it, and a fresh plan without the plugin is
    back at the honest NotImplementedError boundary."""
    import numpy as np

    w, h = 4, 4
    frames = [np.full((h, w, 3), 7 * (i + 1), dtype=np.uint8) for i in range(3)]
    mp4 = M.build_raw_mp4(frames, w, h, fps=1).replace(b"raw ", b"avc1", 1)
    media = spark.createDataFrame(
        [(0, "video", "video/mp4", None, None, 3000, mp4)], M.MEDIA_SCHEMA
    )

    # fake-H.264 plugin: 'decodes' by XOR-ing the demuxed access unit.
    # Defined INSIDE the test so cloudpickle ships it by value — the
    # standard Spark rule applies to plugins: be importable on the
    # workers, or picklable by value.
    def xor_decoder(payload, sample, ts_ms, width, height):
        arr = np.frombuffer(sample, dtype=np.uint8) ^ 0x5A
        return arr.reshape(height, width, 3)

    M.register_decoder("avc1", xor_decoder)
    try:
        plan = M.frame_sample(media, every_ms=1000)
    finally:
        M.unregister_decoder("avc1")
    rows = sorted(plan.collect(), key=lambda r: r.frame_idx)
    assert len(rows) == 3
    for r in rows:
        expect = np.full((h, w, 3), 7 * (r.frame_idx + 1), dtype=np.uint8) ^ 0x5A
        assert bytes(r.frame) == expect.tobytes()
    # without the plugin, a fresh plan is back at the honest boundary
    with pytest.raises(Exception) as ei:
        M.frame_sample(media, every_ms=1000).collect()
    assert "register_decoder" in str(ei.value) or "codec" in str(ei.value)
    # a plugin returning the wrong shape is rejected loudly
    M.register_decoder(b"avc1", lambda **kw: __import__("numpy").zeros((1, 1, 3)))
    try:
        with pytest.raises(Exception, match="shape"):
            M.frame_sample(media, every_ms=1000).collect()
    finally:
        M.unregister_decoder(b"avc1")


def test_pyav_example_plugin_missing_library_guided_error():
    """The shipped example plugin (decoder_plugins.py) keeps the
    honest boundary when PyAV is absent: a guided ImportError naming
    the public package and the worker-image requirement — never a
    silent no-op registration."""
    import importlib.util

    from s2_spark.functions import decoder_plugins as P

    if importlib.util.find_spec("av") is not None:
        pytest.skip("real PyAV present; the guided-error path is moot")
    with pytest.raises(ImportError, match="pip install av"):
        P.pyav_frame_decoder()
    with pytest.raises(ImportError, match="executor"):
        P.install_pyav()


def test_pyav_example_plugin_adapter_end_to_end():
    """The PyAV adapter wired through the REAL seam: install_pyav with
    an injected fake library registers the H.264/H.265 fourccs, and
    decode_raw_mp4_frame routes an avc1 track through the adapter —
    which must run the library's own demux over the WHOLE container
    (inter-frame correctness) and pick the frame covering ts_ms, not
    the nearest-after or the first."""
    import io
    from types import SimpleNamespace

    import numpy as np

    from s2_spark.functions import decoder_plugins as P

    w, h = 4, 4
    arrs = [np.full((h, w, 3), 11 * (i + 1), dtype=np.uint8) for i in range(3)]

    class _FakeFrame:
        def __init__(self, t, arr):
            self.time = t
            self._arr = arr

        def to_ndarray(self, format):
            assert format == "rgb24"
            return self._arr

    from fractions import Fraction

    seeks = []

    class _FakeContainer:
        def __init__(self, frames):
            self._frames = frames
            self._from = 0
            self.streams = [
                SimpleNamespace(type="audio", time_base=None),
                SimpleNamespace(type="video", time_base=Fraction(1, 1000)),
            ]

        def seek(self, offset, stream=None, backward=True):
            # keyframe model: every frame is a keyframe (intra fake),
            # so a backward seek lands exactly at/below the offset
            assert backward and stream.type == "video"
            seeks.append(offset)
            t = offset * float(stream.time_base)
            self._from = max(
                (i for i, f in enumerate(self._frames) if f.time <= t),
                default=0,
            )

        def decode(self, stream):
            assert stream.type == "video"
            yield from self._frames[self._from :]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    opened = []

    class _FakeAv:
        def open(self, fh):
            opened.append(fh.read() if isinstance(fh, io.BytesIO) else fh)
            return _FakeContainer(
                [_FakeFrame(float(i), a) for i, a in enumerate(arrs)]
            )

    mp4 = M.build_raw_mp4(
        [a.tobytes() for a in arrs], w, h, fps=1
    ).replace(b"raw ", b"avc1", 1)
    claimed = P.install_pyav(av_module=_FakeAv())
    try:
        assert claimed == list(P.DEFAULT_FOURCCS)
        # ts 1500 ms covers the frame AT 1.0 s (LOCF, not nearest-after)
        got = M.decode_raw_mp4_frame(mp4, ts_ms=1500)
        assert bytes(got.tobytes()) == arrs[1].tobytes()
        # ts 0 is the first frame; a late ts clamps to the last
        assert M.decode_raw_mp4_frame(mp4, ts_ms=0).tobytes() == arrs[0].tobytes()
        assert M.decode_raw_mp4_frame(mp4, ts_ms=9000).tobytes() == arrs[2].tobytes()
        # the adapter handed the library the WHOLE container, not the
        # demuxed access unit — inter-frame decoders need the prefix
        assert opened and all(buf == mp4 for buf in opened)
        assert seeks == []  # default mode never seeks
    finally:
        for fc in claimed:
            M.unregister_decoder(fc)
    # seek mode: backward keyframe seek in stream time-base units,
    # then forward decode to the SAME covering frame
    claimed = P.install_pyav(av_module=_FakeAv(), seek=True)
    try:
        assert M.decode_raw_mp4_frame(mp4, ts_ms=1500).tobytes() == arrs[1].tobytes()
        assert M.decode_raw_mp4_frame(mp4, ts_ms=9000).tobytes() == arrs[2].tobytes()
        assert seeks == [1500, 9000]  # target/time_base with tb=1/1000
    finally:
        for fc in claimed:
            M.unregister_decoder(fc)


def test_frame_sampling_null_duration_yields_one_frame(spark):
    """MEDIA_SCHEMA declares duration_ms nullable; pandas surfaces NULL
    as NaN (truthy) — a null-duration video must emit exactly one frame,
    matching the JVM-side greatest(null, 0) grid."""
    rows = [
        (1, "video", "video/mp4", None, None, None, b"payload-a"),
        (2, "video", "video/mp4", None, None, 3000, b"payload-b"),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    frames = M.frame_sample(media, every_ms=1000, fake=True).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert len(by_media[1]) == 1 and by_media[1][0].frame_idx == 0
    assert len(by_media[2]) == 3


# --- minhash keep/drop dedup action ------------------------------------------


def _keep_replay(rows, k=16, bands=4):
    """Independent Python replay of the minhash keep rule (md5-string
    minhash, '|'-joined md5 band hashes, drop-if-bucket-has-lower-id)."""
    import hashlib
    import re

    r = k // bands

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    def rot(h: str, i: int) -> str:
        return h[2 * i :] + h[: 2 * i]

    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, text in rows:
        toks = sorted(set(re.split(r"\s+", text.lower())))
        sig = [min(rot(md5hex(t), i) for t in toks) for i in range(k)]
        for b in range(bands):
            bh = md5hex("|".join(sig[b * r : (b + 1) * r]))
            buckets.setdefault((b, bh), []).append(doc_id)
    dropped = set()
    for members in buckets.values():
        lo = min(members)
        dropped.update(m for m in members if m != lo)
    return sorted({d for d, _ in rows} - dropped)


def test_minhash_dedup_keep_matches_replay(spark, docs):
    corpus = docs.limit(40)
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    kept = [r["doc_id"] for r in D.minhash_dedup_keep(corpus).orderBy("doc_id").collect()]
    assert kept == _keep_replay(rows)


def test_minhash_dedup_keep_drops_exact_and_keeps_disjoint(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),   # exact dup of 1
            (5, "alpha beta gamma delta epsilon"),   # exact dup of 1
            (9, "zeta eta theta iota kappa"),        # token-disjoint
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"] for r in D.minhash_dedup_keep(corpus).collect()
    )
    # exact dups share every bucket -> only the min id of the cluster
    # survives; the disjoint doc shares no token, so (w.h.p. over the
    # fixed md5 hashes — deterministic here) it keeps its own buckets
    assert kept == [1, 9]


def _cluster_replay(rows, k=16, bands=4):
    """Union-find over the same bucket-star graph (min-label fixpoint
    == connected components, so plain union-find replays it)."""
    import hashlib
    import re

    r = k // bands

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    def rot(h: str, i: int) -> str:
        return h[2 * i :] + h[: 2 * i]

    parent = {d: d for d, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, text in rows:
        toks = sorted(set(re.split(r"\s+", text.lower())))
        sig = [min(rot(md5hex(t), i) for t in toks) for i in range(k)]
        for b in range(bands):
            bh = md5hex("|".join(sig[b * r : (b + 1) * r]))
            buckets.setdefault((b, bh), []).append(doc_id)
    for members in buckets.values():
        for m in members[1:]:
            union(members[0], m)
    return sorted((d, find(d)) for d, _ in rows)


def test_neardup_clusters_matches_union_find_replay(spark, docs):
    corpus = docs.limit(60)
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    got = sorted(
        (r["doc_id"], r["cluster"])
        for r in D.neardup_clusters(corpus).collect()
    )
    assert got == _cluster_replay(rows)


def test_neardup_clusters_reliable_checkpoint_identical(spark, docs, tmp_path):
    """checkpoint_dir opts the CC loop into RELIABLE checkpoints
    (fault-tolerant storage an executor loss can't take down, vs
    localCheckpoint's executor block store). Same clusters, and the
    rounds actually land RDD checkpoint files under the dir."""
    import os

    corpus = docs.limit(60)
    ckpt = str(tmp_path / "cc_ckpt")
    base = [
        (r["doc_id"], r["cluster"])
        for r in D.neardup_clusters(corpus).collect()
    ]
    reliable = [
        (r["doc_id"], r["cluster"])
        for r in D.neardup_clusters(corpus, checkpoint_dir=ckpt).collect()
    ]
    assert sorted(reliable) == sorted(base)
    landed = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckpt)
        for f in fs
        if not f.startswith(".")
    ]
    assert landed, "reliable mode must write checkpoint files"


def test_neardup_cluster_ids_survive_keep_rule(spark, docs):
    """The min member of a connected component is by construction a
    bucket-min of every bucket it appears in, so every cluster id must
    be in minhash_dedup_keep's survivor set."""
    corpus = docs.limit(60)
    kept = {r["doc_id"] for r in D.minhash_dedup_keep(corpus).collect()}
    cluster_ids = {r["cluster"] for r in D.neardup_clusters(corpus).collect()}
    assert cluster_ids <= kept


def test_jpeg_codec_bit_exact_against_entropy_free_oracle():
    """Baseline JPEG decode (numpy Huffman + IDCT) must reproduce
    exactly the pixels predicted by the quant/dequant round-trip
    computed WITHOUT the entropy layer — color, grayscale, noise,
    non-multiple-of-8 dims, and restart markers."""
    import numpy as np

    from s2_spark.functions.jpeg import decode_jpeg, encode_jpeg, expected_decode

    rng = np.random.default_rng(42)
    grad = np.fromfunction(
        lambda y, x, c: (x * 3 + y * 5 + c * 40) % 256, (23, 37, 3)
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (32, 24, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(grad)), expected_decode(grad))
    assert np.array_equal(decode_jpeg(encode_jpeg(noise)), expected_decode(noise))
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gray, gray=True)), expected_decode(gray, gray=True)
    )
    # restart markers: DRI + RSTn resync and DC-predictor reset
    assert np.array_equal(
        decode_jpeg(encode_jpeg(noise, restart_interval=4)), expected_decode(noise)
    )


def test_jpeg_progressive_still_raises():
    """The codec boundary stays honest: progressive (SOF2) streams
    raise instead of mis-decoding."""
    import numpy as np

    from s2_spark.functions.jpeg import decode_jpeg, encode_jpeg

    enc = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8))
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)


def test_decode_image_rgb_routes_jpeg():
    import numpy as np

    from s2_spark.functions.jpeg import encode_jpeg, expected_decode

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: decode_image_rgb routes through libjpeg, "
                    "whose integer IDCT differs ±1 from the numpy oracle")
    except ImportError:
        pass
    img = np.fromfunction(lambda y, x, c: (x + y + c) % 256, (10, 12, 3)).astype(
        np.uint8
    )
    assert np.array_equal(
        M.decode_image_rgb(encode_jpeg(img)), expected_decode(img)
    )


def test_frame_sample_real_mjpeg_mp4_end_to_end(spark):
    """MJPEG tracks decode for REAL through the distributed pipeline:
    per-sample-size stsz, 'jpeg' sample entries, baseline JPEG frames —
    pixels come back bit-exact to the entropy-free oracle."""
    import numpy as np

    from s2_spark.functions.jpeg import expected_decode

    rng = np.random.default_rng(9)
    w, h = 16, 8
    vids = []
    for mid in range(2):
        frames = [
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(3)
        ]
        vids.append((mid, frames, M.build_mjpeg_mp4(frames, fps=1), 3000))
    media = spark.createDataFrame(
        [
            (mid, "video", "video/mp4", None, None, dur, payload)
            for mid, _, payload, dur in vids
        ],
        M.MEDIA_SCHEMA,
    )
    rows = M.frame_sample(media, every_ms=1000).collect()
    assert len(rows) == 6
    by_vid = {mid: frames for mid, frames, _, _ in vids}
    for r in rows:
        expect = expected_decode(by_vid[r.media_id][r.frame_idx])
        assert bytes(r.frame) == expect.tobytes()


def test_mjpeg_interframe_codec_still_raises(spark):
    """H.264 & co stay a disclosed boundary even now that MJPEG is
    real."""
    import numpy as np

    mp4 = M.build_mjpeg_mp4(
        [np.zeros((8, 8, 3), dtype=np.uint8)], fps=1
    ).replace(b"jpeg", b"avc1", 1)
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode_raw_mp4_frame(mp4, ts_ms=0)


def test_frame_sample_multi_chunk_mjpeg(spark):
    """Real-world muxers spread samples across chunks (stsc runs): the
    sample→chunk walk must hand decode_jpeg the right byte ranges."""
    import numpy as np

    from s2_spark.functions.jpeg import expected_decode

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (8, 8, 3)).astype(np.uint8) for _ in range(5)]
    mp4 = M.build_mjpeg_mp4(frames, fps=1, samples_per_chunk=2)  # chunks 2,2,1
    media = spark.createDataFrame(
        [(0, "video", "video/mp4", None, None, 5000, mp4)], M.MEDIA_SCHEMA
    )
    rows = {r.frame_idx: bytes(r.frame) for r in M.frame_sample(media, every_ms=1000).collect()}
    assert len(rows) == 5
    for i, f in enumerate(frames):
        assert rows[i] == expected_decode(f).tobytes()


def test_pyav_real_h264_end_to_end():
    """The last x18 inch: when the OPTIONAL PyAV wheel is present,
    encode a real H.264 clip with the library itself, then decode it
    back through install_pyav(seek=True) → register_decoder →
    decode_raw_mp4_frame — proving the adapter against real FFmpeg,
    not the injected fake. Skips cleanly where 'av' is not installed
    (this container ships without codec libraries)."""
    pytest.importorskip("av")
    import io

    import numpy as np

    import av

    from s2_spark.functions import decoder_plugins as P

    w, h, fps = 16, 16, 2
    grays = [40, 100, 160, 220]  # frames at 0, 0.5, 1.0, 1.5 s
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        try:
            stream = container.add_stream("h264", rate=fps)
        except Exception as e:  # wheel built without libx264
            pytest.skip(f"PyAV present but no h264 encoder: {e}")
        stream.width, stream.height = w, h
        stream.pix_fmt = "yuv420p"
        # no B-frames: keeps presentation order == decode order and the
        # stts table uniform (decode_raw_mp4_frame requires n_tts == 1)
        stream.options = {"bf": "0"}
        for g in grays:
            arr = np.full((h, w, 3), g, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    mp4 = buf.getvalue()

    claimed = P.install_pyav(seek=True)
    try:
        for ts_ms, want in [(0, 40), (1200, 160), (9000, 220)]:
            got = M.decode_raw_mp4_frame(mp4, ts_ms=ts_ms)
            assert got.shape == (h, w, 3) and got.dtype == np.uint8
            # lossy codec + yuv420p roundtrip: assert the covering
            # frame by mean gray level, not bit-exactness
            assert abs(float(got.mean()) - want) < 12, (ts_ms, got.mean())
    finally:
        for fc in claimed:
            M.unregister_decoder(fc)
