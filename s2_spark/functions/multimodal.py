"""Multimodal columns — image/audio/video as opaque ``binary`` with
typed metadata, plus the Spark-side plumbing (schema, partitioning,
Arrow batch shape) for decode / feature-extract / resize / frame-sample.

The decode step itself is STUBBED: the image/audio codec libraries are
not in this container. Each operator takes a ``decoder`` callable; the
default raises ``NotImplementedError`` unless ``fake=True``, which
installs a deterministic fake (byte-hash features) so the distributed
plumbing — mapInPandas over Arrow batches, schema contracts, metadata
propagation — is real and tested end-to-end.

Scale notes: media bytes never hit the driver; operators are
``mapInPandas`` over the binary column with spill-friendly batch sizes.
Feature vectors come back as ``array<float>`` ready for the
``similarity`` operators (dedup of images = embedding near-dup).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _not_implemented_decoder(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "container; pass decoder=... or fake=True"
    )


def _fake_feature_decoder(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic fake: features from the sha256 of the payload —
    stable across runs/executors, zero codec dependencies."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    fake: bool = False,
    dim: int = 16,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media rows → (media_id, kind, features array<float>).

    Runs as mapInPandas: each Arrow batch's payload column is decoded
    executor-side; only (id, features) survive, so downstream shuffles
    never carry media bytes."""
    dec = decoder or (
        (lambda p: _fake_feature_decoder(p, dim)) if fake else _not_implemented_decoder
    )
    out_schema = "media_id long, kind string, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [dec(p) for p in pdf["payload"]],
                }
            )

    cols = df.select("media_id", "kind", "payload")
    return cols.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    decoder: Callable[[bytes, int], bytes] | None = None,
    fake: bool = False,
) -> DataFrame:
    """video rows → one row per sampled frame (media_id, frame_idx,
    frame_ts_ms, frame binary). The frame grid (duration_ms / every_ms
    frames, minimum 1) fans out *inside* the executor-side decode loop,
    so each in-flight Arrow batch holds exactly one payload copy per
    video — never one per sampled frame."""
    dec = decoder or (
        (lambda payload, idx: hashlib.sha256((payload or b"") + idx.to_bytes(4, "big")).digest())
        if fake
        else (lambda payload, idx: _not_implemented_decoder(payload))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            tss: list = []
            frames: list = []
            for mid, dur, p in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                # nullable duration_ms arrives as NaN (truthy — `dur or
                # 0` won't catch it); a null-duration video yields one
                # frame, matching the JVM-side greatest(null,0) grid
                n = max((0 if pd.isna(dur) else int(dur)) // every_ms, 1)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(dec(p, i))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "frame": frames,
                }
            )

    vids = df.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms", "payload"
    )
    return vids.mapInPandas(
        run, "media_id long, frame_idx long, frame_ts_ms long, frame binary"
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decoder: Callable[[bytes, int, int], bytes] | None = None,
    fake: bool = False,
) -> DataFrame:
    """image rows → payload replaced by the resized rendition; metadata
    columns updated JVM-side."""
    dec = decoder or (
        (lambda p, w, h: (p or b"")[: max(1, w * h)])  # deterministic fake crop
        if fake
        else (lambda p, w, h: _not_implemented_decoder(p))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [dec(p, width, height) for p in pdf["payload"]]
            yield pdf

    imgs = df.filter(F.col("kind") == "image")
    resized = imgs.mapInPandas(run, df.schema)
    return resized.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for plumbing tests/bench."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"{seed}-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                5000 if kind == "video" else (2000 if kind == "audio" else None),
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
