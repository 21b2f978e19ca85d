"""CSEK-style record-body encryption (A19 — ``docs/adr/csek.md``,
``storage/src/record/encryption.rs``).

The reference supports AEGIS-256 and AES-256-GCM AEAD envelopes with
the stream identity bound into the encryption context. Spark ships
``aes_encrypt``/``aes_decrypt`` (3.3+) with GCM mode and an AAD
parameter, so AES-256-GCM is implemented JVM-side here; AEGIS-256 has
no Spark builtin and is a **documented deviation** (a Python UDF could
back it, but a row-at-a-time cipher UDF in the hot path contradicts the
engine's no-Python-hot-path rule).

Metering is computed over plaintext sizes *before* encryption, matching
the reference's "metering unchanged by encryption".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GCM_TAG_AND_IV_OVERHEAD = 12 + 16  # IV + tag bytes added by GCM envelope


def stream_aad(basin: Column | str = "basin", stream: Column | str = "stream") -> Column:
    """AAD binds ciphertext to its stream, like the reference's
    stream_id AAD (lite/src/backend/append.rs:38-43): basin \\0 stream."""
    b = F.col(basin) if isinstance(basin, str) else basin
    s = F.col(stream) if isinstance(stream, str) else stream
    return F.concat_ws("\x00", b, s)


def encrypt_bodies(records: DataFrame, key: bytes, body_col: str = "body") -> DataFrame:
    """AES-256-GCM encrypt the body column, AAD = basin\\0stream."""
    assert len(key) in (16, 24, 32), "AES key must be 128/192/256-bit"
    return records.withColumn(
        body_col,
        F.aes_encrypt(
            F.col(body_col),
            F.lit(key),
            F.lit("GCM"),
            F.lit("DEFAULT"),
            F.lit(b""),
            stream_aad().cast("string"),
        ),
    )


def decrypt_bodies(records: DataFrame, key: bytes, body_col: str = "body") -> DataFrame:
    return records.withColumn(
        body_col,
        F.aes_decrypt(
            F.col(body_col),
            F.lit(key),
            F.lit("GCM"),
            F.lit("DEFAULT"),
            stream_aad().cast("string"),
        ),
    )
