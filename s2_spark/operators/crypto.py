"""CSEK-style record-body encryption (A19 — ``docs/adr/csek.md``,
``storage/src/record/encryption.rs``).

The reference supports two AEAD envelopes with the stream identity
bound in as associated data (format framing at
``storage/src/record/encryption.rs:3-10``):

- **AES-256-GCM** (format 0x02, 12 B nonce + 16 B tag): Spark ships
  ``aes_encrypt``/``aes_decrypt`` (3.3+) with GCM mode and an AAD
  parameter, so this cipher runs fully JVM-side inside codegen — the
  fast default.
- **AEGIS-256** (format 0x01, 32 B nonce + 16 B tag): no JVM builtin
  exists, so it runs as a lane-parallel numpy kernel over
  ``mapInPandas`` Arrow batches (``s2_spark/functions/aegis.py``,
  spec-test-vector pinned). Slower per-core than AES-NI, parallel
  across executors; pick it only for parity with reference streams
  configured that way.

The reference also caps AES-GCM streams at seq_num < 2^32
(``encryption.rs:111-115`` max_assignable_seq_num — nonce-reuse
hygiene); AEGIS-256 streams have no cap. :func:`max_assignable_seq_num`
mirrors that.

Metering is computed over plaintext sizes *before* encryption, matching
the reference's "metering unchanged by encryption".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GCM_TAG_AND_IV_OVERHEAD = 12 + 16  # IV + tag bytes added by GCM envelope
AEGIS_OVERHEAD = 1 + 32 + 16  # format byte + nonce + tag

AES_256_GCM = "aes-256-gcm"
AEGIS_256 = "aegis-256"

_GCM_MAX_SEQ = (1 << 32) - 1


def max_assignable_seq_num(cipher: str | None) -> int:
    """Reference parity (encryption.rs:111-115): AES-GCM streams cap
    assignable seq nums below 2^32; AEGIS-256 / plaintext do not."""
    if cipher is not None and cipher.lower() == AES_256_GCM:
        return _GCM_MAX_SEQ
    return (1 << 63) - 1


def stream_aad(basin: Column | str = "basin", stream: Column | str = "stream") -> Column:
    """AAD binds ciphertext to its stream, like the reference's
    stream_id AAD (lite/src/backend/append.rs:38-43): basin \\0 stream."""
    b = F.col(basin) if isinstance(basin, str) else basin
    s = F.col(stream) if isinstance(stream, str) else stream
    return F.concat_ws("\x00", b, s)


def encrypt_bodies(
    records: DataFrame,
    key: bytes,
    body_col: str = "body",
    cipher: str = AES_256_GCM,
    iv: bytes | None = None,
) -> DataFrame:
    """AEAD-encrypt the body column, AAD = basin\\0stream.

    ``iv`` pins the GCM nonce (12 bytes) for known-answer tests — the
    output becomes deterministic (iv ‖ ct ‖ tag), verifiable against an
    independent GCM implementation. Production use MUST leave it None
    (per-record random IV): a fixed nonce across two different
    plaintexts under one key breaks GCM entirely.
    """
    c = cipher.lower()
    if c == AES_256_GCM:
        assert len(key) in (16, 24, 32), "AES key must be 128/192/256-bit"
        assert iv is None or len(iv) == 12, "GCM IV must be 12 bytes"
        return records.withColumn(
            body_col,
            F.aes_encrypt(
                F.col(body_col),
                F.lit(key),
                F.lit("GCM"),
                F.lit("DEFAULT"),
                F.lit(iv if iv is not None else b""),
                stream_aad().cast("string"),
            ),
        )
    if c == AEGIS_256:
        return _aegis_map(records, key, body_col, decrypt=False)
    raise ValueError(f"unknown cipher {cipher!r}")


def decrypt_bodies(
    records: DataFrame, key: bytes, body_col: str = "body", cipher: str = AES_256_GCM
) -> DataFrame:
    c = cipher.lower()
    if c == AES_256_GCM:
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
    if c == AEGIS_256:
        return _aegis_map(records, key, body_col, decrypt=True)
    raise ValueError(f"unknown cipher {cipher!r}")


def _aegis_map(
    records: DataFrame, key: bytes, body_col: str, decrypt: bool
) -> DataFrame:
    """AEGIS-256 over mapInPandas: each Arrow batch is one lane-parallel
    cipher call (vectorized across records, not per-row Python)."""
    schema = records.schema

    def run(batches):
        from s2_spark.functions.aegis import decrypt_batch, encrypt_batch

        for pdf in batches:
            bodies = [
                bytes(b) if b is not None else None for b in pdf[body_col]
            ]
            aads = [
                (f"{b}\x00{s}").encode("utf-8")
                for b, s in zip(pdf["basin"], pdf["stream"])
            ]
            fn = decrypt_batch if decrypt else encrypt_batch
            pdf = pdf.copy()
            pdf[body_col] = fn(key, bodies, aads)
            yield pdf

    return records.mapInPandas(run, schema=schema)
