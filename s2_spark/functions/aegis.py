"""AEGIS-256 AEAD, batch-vectorized across records with numpy.

Closes the A19 gap: the reference supports AES-256-GCM *and* AEGIS-256
(``storage/src/record/encryption.rs:31,54-55`` — format id 0x01, 32-byte
nonce, 16-byte tag). Spark has a JVM-side builtin only for AES-GCM, and
a row-at-a-time Python cipher UDF would violate the engine's
no-Python-hot-path rule — so this module implements AEGIS-256 from the
public IRTF CFRG specification (draft-irtf-cfrg-aegis-aead / RFC 9780)
as a **lane-parallel numpy kernel**: the sequential per-message chain is
unavoidable (AEGIS state chains block to block), but every numpy op
operates on *all records in the Arrow batch at once* (state shape
``(lanes, 6, 16)``), so the per-block Python overhead is amortized
across the batch exactly like the multimodal decoders. Lanes whose
message (or AD) is exhausted drop out of the per-block index gather, so
mixed record sizes cost no wasted cipher work.

Wire format matches the reference framing
(``storage/src/record/encryption.rs:3-10``)::

    [0x01] [nonce: 32 B] [ciphertext] [tag: 16 B]

Correctness is pinned by the spec's published test vectors (see
``tests/test_aegis.py``: TV1 ct+tag and TV2 tag match RFC Appendix A.3)
plus roundtrip / tamper / AAD-binding / cross-lane batch-vs-single
properties, and the AES round primitive is separately validated against
the FIPS-197 AES-128 known-answer vector.
"""

from __future__ import annotations

import os
import struct

import numpy as np

FORMAT_ID_AEGIS256_V1 = 0x01
NONCE_LEN = 32
TAG_LEN = 16

# ---------------------------------------------------------------------------
# AES tables, generated (not typed) from the public definition: S-box is
# the GF(2^8) multiplicative inverse (modulus x^8+x^4+x^3+x+1) followed
# by the affine transform b ^ rot1 ^ rot2 ^ rot3 ^ rot4 ^ 0x63.
# ---------------------------------------------------------------------------


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> np.ndarray:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        b = inv[x]
        s = b
        for r in (1, 2, 3, 4):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[x] = s ^ 0x63
    return sbox


_SBOX = _build_sbox()
_MUL2 = np.array([_gf_mul(x, 2) for x in range(256)], dtype=np.uint8)
_MUL3 = np.array([_gf_mul(x, 3) for x in range(256)], dtype=np.uint8)

# AES state is column-major: byte i sits at (row i % 4, col i // 4).
# ShiftRows rotates row r left by r columns: new[r+4c] = old[r+4((c+r)%4)]
_SHIFT_ROWS = np.array(
    [(r + 4 * ((c + r) % 4)) for c in range(4) for r in range(4)], dtype=np.intp
)

# Fibonacci-mod-256 constants from the spec (C0 = fib[0..15], C1 = fib[16..31])
_C0 = bytes.fromhex("000101020305080d1522375990e97962")
_C1 = bytes.fromhex("db3d18556dc22ff12011314273b528dd")


def _aes_round(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """One AES encryption round (SubBytes, ShiftRows, MixColumns) of
    ``a``, XOR ``b``. Shapes: (lanes, 16) uint8. Validated against the
    FIPS-197 AES-128 known-answer test in tests/test_aegis.py."""
    s = _SBOX[a][:, _SHIFT_ROWS]
    c = s.reshape(-1, 4, 4)  # (lanes, col, row)
    a0, a1, a2, a3 = c[:, :, 0], c[:, :, 1], c[:, :, 2], c[:, :, 3]
    out = np.empty_like(c)
    out[:, :, 0] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3]
    out[:, :, 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3]
    return out.reshape(-1, 16) ^ b


def _update(state: np.ndarray, m: np.ndarray) -> np.ndarray:
    """AEGIS state update: S'_0 = AESRound(S5, S0^M), S'_i =
    AESRound(S_{i-1}, S_i). state: (lanes, 6, 16), m: (lanes, 16)."""
    new = np.empty_like(state)
    new[:, 0] = _aes_round(state[:, 5], state[:, 0] ^ m)
    new[:, 1] = _aes_round(state[:, 0], state[:, 1])
    new[:, 2] = _aes_round(state[:, 1], state[:, 2])
    new[:, 3] = _aes_round(state[:, 2], state[:, 3])
    new[:, 4] = _aes_round(state[:, 3], state[:, 4])
    new[:, 5] = _aes_round(state[:, 4], state[:, 5])
    return new


def _init_state(key: bytes, nonces: np.ndarray) -> np.ndarray:
    """Spec Init: paper layout S = [k0^n0, k1^n1, C1, C0, k0^C0, k1^C1],
    then Update(k0), Update(k1), Update(k0^n0), Update(k1^n1) x4."""
    n = nonces.shape[0]
    k0 = np.frombuffer(key[:16], dtype=np.uint8)
    k1 = np.frombuffer(key[16:], dtype=np.uint8)
    n0, n1 = nonces[:, :16], nonces[:, 16:]
    c0 = np.frombuffer(_C0, dtype=np.uint8)
    c1 = np.frombuffer(_C1, dtype=np.uint8)
    st = np.empty((n, 6, 16), dtype=np.uint8)
    st[:, 0] = k0 ^ n0
    st[:, 1] = k1 ^ n1
    st[:, 2] = c1
    st[:, 3] = c0
    st[:, 4] = k0 ^ c0
    st[:, 5] = k1 ^ c1
    k0b = np.broadcast_to(k0, (n, 16))
    k1b = np.broadcast_to(k1, (n, 16))
    for _ in range(4):
        st = _update(st, k0b)
        st = _update(st, k1b)
        st = _update(st, k0 ^ n0)
        st = _update(st, k1 ^ n1)
    return st


def _keystream(state: np.ndarray) -> np.ndarray:
    """z = S1 ^ S4 ^ S5 ^ (S2 & S3)."""
    return state[:, 1] ^ state[:, 4] ^ state[:, 5] ^ (state[:, 2] & state[:, 3])


def _finalize(state: np.ndarray, ad_bits: np.ndarray, msg_bits: np.ndarray) -> np.ndarray:
    """t = S3 ^ (LE64(ad_bits) || LE64(msg_bits)); Update(t) x7;
    tag128 = XOR(S0..S5)."""
    n = state.shape[0]
    t = np.empty((n, 16), dtype=np.uint8)
    t[:, :8] = ad_bits.astype("<u8").view(np.uint8).reshape(n, 8)
    t[:, 8:] = msg_bits.astype("<u8").view(np.uint8).reshape(n, 8)
    t ^= state[:, 3]
    for _ in range(7):
        state = _update(state, t)
    return (
        state[:, 0] ^ state[:, 1] ^ state[:, 2]
        ^ state[:, 3] ^ state[:, 4] ^ state[:, 5]
    )


def _padded_blocks(data: list[bytes], nblocks: int) -> np.ndarray:
    out = np.zeros((len(data), max(nblocks, 1) * 16), dtype=np.uint8)
    for i, d in enumerate(data):
        if d:
            out[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
    return out


def _absorb_then_crypt(
    key: bytes,
    nonces: np.ndarray,
    ads: list[bytes],
    payloads: list[bytes],
    decrypt: bool,
) -> tuple[list[bytes], np.ndarray]:
    """Shared AD-absorb + en/decrypt lockstep loop over a batch of
    independent messages. Per 16-byte block step, only lanes that still
    have data participate (index gather/scatter), so lane order does not
    matter and mixed sizes do no wasted cipher work."""
    n = len(payloads)
    ad_blocks = np.array([(len(a) + 15) // 16 for a in ads], dtype=np.int64)
    pl_blocks = np.array([(len(p) + 15) // 16 for p in payloads], dtype=np.int64)
    pl_lens = np.array([len(p) for p in payloads], dtype=np.int64)
    max_ad = int(ad_blocks.max(initial=0))
    max_pl = int(pl_blocks.max(initial=0))

    state = _init_state(key, nonces)

    if max_ad:
        admat = _padded_blocks(ads, max_ad)
        for t in range(max_ad):
            lanes = np.flatnonzero(ad_blocks > t)
            state[lanes] = _update(state[lanes], admat[lanes, t * 16 : (t + 1) * 16])

    out = np.zeros((n, max(max_pl, 1) * 16), dtype=np.uint8)
    inmat = _padded_blocks(payloads, max_pl)
    for t in range(max_pl):
        lanes = np.flatnonzero(pl_blocks > t)
        sub = state[lanes]
        z = _keystream(sub)
        block = inmat[lanes, t * 16 : (t + 1) * 16]
        o = block ^ z
        if decrypt:
            # partial final block (spec Dec): absorb ZeroPad(Truncate(out))
            rem = pl_lens[lanes] - t * 16
            short = rem < 16
            if short.any():
                mask = np.arange(16) < rem[:, None]
                o = np.where(mask, o, 0).astype(np.uint8)
            out[lanes, t * 16 : (t + 1) * 16] = o
            state[lanes] = _update(sub, o)
        else:
            out[lanes, t * 16 : (t + 1) * 16] = o
            state[lanes] = _update(sub, block)

    ad_bits = np.array([len(a) * 8 for a in ads], dtype=np.uint64)
    msg_bits = (pl_lens * 8).astype(np.uint64)
    tags = _finalize(state, ad_bits, msg_bits)
    outputs = [out[i, : pl_lens[i]].tobytes() for i in range(n)]
    return outputs, tags


def encrypt_batch(
    key: bytes, plaintexts: list[bytes | None], aads: list[bytes]
) -> list[bytes | None]:
    """AEGIS-256-encrypt a batch into the reference wire framing
    ``[0x01][nonce:32][ct][tag:16]``. None passes through (null body)."""
    if len(key) != 32:
        raise ValueError("AEGIS-256 key must be 256-bit")
    idx = [i for i, p in enumerate(plaintexts) if p is not None]
    if not idx:
        return list(plaintexts)
    msgs = [plaintexts[i] for i in idx]
    ads = [aads[i] for i in idx]
    nonces = np.frombuffer(os.urandom(32 * len(idx)), dtype=np.uint8).reshape(-1, 32)
    cts, tags = _absorb_then_crypt(key, nonces, ads, msgs, decrypt=False)
    framed: list[bytes | None] = list(plaintexts)
    head = bytes([FORMAT_ID_AEGIS256_V1])
    for pos, i in enumerate(idx):
        framed[i] = head + nonces[pos].tobytes() + cts[pos] + tags[pos].tobytes()
    return framed


class AegisDecryptError(ValueError):
    """Tag mismatch or malformed framing (maps to the reference's
    RecordDecryptionError, storage/src/record/encryption.rs:118-130)."""


def decrypt_batch(
    key: bytes, records: list[bytes | None], aads: list[bytes]
) -> list[bytes | None]:
    """Decrypt reference-framed AEGIS-256 records; raises
    :class:`AegisDecryptError` on bad framing or tag mismatch."""
    if len(key) != 32:
        raise ValueError("AEGIS-256 key must be 256-bit")
    idx = [i for i, r in enumerate(records) if r is not None]
    if not idx:
        return list(records)
    overhead = 1 + NONCE_LEN + TAG_LEN
    for i in idx:
        r = records[i]
        if len(r) < overhead or r[0] != FORMAT_ID_AEGIS256_V1:
            raise AegisDecryptError("invalid encrypted record format id")
    cts = [records[i][1 + NONCE_LEN : -TAG_LEN] for i in idx]
    ads = [aads[i] for i in idx]
    nonces = np.stack(
        [np.frombuffer(records[i][1 : 1 + NONCE_LEN], dtype=np.uint8) for i in idx]
    )
    pts, tags = _absorb_then_crypt(key, nonces, ads, cts, decrypt=True)
    out: list[bytes | None] = list(records)
    for pos, i in enumerate(idx):
        if tags[pos].tobytes() != records[i][-TAG_LEN:]:
            raise AegisDecryptError("record decryption failed: tag mismatch")
        out[i] = pts[pos]
    return out


def encrypt_one(key: bytes, nonce: bytes, ad: bytes, msg: bytes) -> tuple[bytes, bytes]:
    """Single-message spec-shaped API (caller-fixed nonce) for the RFC
    test vectors. Returns (ciphertext, tag128)."""
    nonces = np.frombuffer(nonce, dtype=np.uint8).reshape(1, 32).copy()
    cts, tags = _absorb_then_crypt(key, nonces, [ad], [msg], decrypt=False)
    return cts[0], tags[0].tobytes()


def decrypt_one(key: bytes, nonce: bytes, ad: bytes, ct: bytes, tag: bytes) -> bytes:
    nonces = np.frombuffer(nonce, dtype=np.uint8).reshape(1, 32).copy()
    pts, tags = _absorb_then_crypt(key, nonces, [ad], [ct], decrypt=True)
    if tags[0].tobytes() != tag:
        raise AegisDecryptError("record decryption failed: tag mismatch")
    return pts[0]
