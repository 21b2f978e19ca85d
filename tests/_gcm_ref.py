"""Independent pure-Python AES-GCM reference — test-only.

Implements AES (FIPS-197: S-box computed from GF(2^8) inverses, not a
pasted table) and GCM (NIST SP 800-38D / McGrew-Viega: GHASH over
GF(2^128) with the x^128+x^7+x^2+x+1 polynomial, 32-bit CTR). Used to
anchor the engine's JVM-side AES-256-GCM path (`operators/crypto.py`
→ `F.aes_encrypt`) to an implementation that shares no code with it:
the reference itself is pinned to the GCM spec's published test
vectors in `test_operators.py`, then the Spark output (deterministic
IV) is compared byte-for-byte against it — a known-answer chain
equivalent to a NIST CAVP KAT but valid for arbitrary AAD, which the
engine derives from the stream identity (basin\\0stream).

Slow (pure Python) — for test vectors only, never data-path use.
"""

from __future__ import annotations

# --- AES (FIPS-197) --------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _build_sbox() -> list[int]:
    # multiplicative inverse in GF(2^8) + affine transform (FIPS-197 §5.1.1)
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gmul(x, y) == 1:
                inv[x] = y
                break
    sbox = []
    for x in range(256):
        b = inv[x]
        s = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            s |= bit << i
        sbox.append(s)
    return sbox


_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8]


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum((w[4 * r + c] for c in range(4)), []) for r in range(nr + 1)]


def _aes_encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    nr = len(rk) - 1
    # state is column-major (FIPS-197 §3.4)
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_round_key(round_idx):
        k = rk[round_idx]
        for c in range(4):
            for r in range(4):
                s[r][c] ^= k[4 * c + r]

    add_round_key(0)
    for rnd in range(1, nr + 1):
        for r in range(4):
            for c in range(4):
                s[r][c] = _SBOX[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd != nr:
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                s[3][c] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
        add_round_key(rnd)
    return bytes(s[r][c] for c in range(4) for r in range(4))


# --- GCM (SP 800-38D) ------------------------------------------------------

_R = 0xE1 << 120  # x^128 + x^7 + x^2 + x + 1 (bit-reversed constant)


def _ghash_mul(x: int, y: int) -> int:
    z = 0
    v = y
    for i in range(127, -1, -1):
        if (x >> i) & 1:
            z ^= v
        v = (v >> 1) ^ _R if v & 1 else v >> 1
    return z


def _ghash(h: int, data: bytes) -> int:
    y = 0
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        y = _ghash_mul(y ^ int.from_bytes(blk, "big"), h)
    return y


def _pad16(b: bytes) -> bytes:
    return b + b"\x00" * ((16 - len(b) % 16) % 16)


def _inc32(block: bytes) -> bytes:
    ctr = (int.from_bytes(block[12:], "big") + 1) & 0xFFFFFFFF
    return block[:12] + ctr.to_bytes(4, "big")


def gcm_encrypt(
    key: bytes, iv: bytes, plaintext: bytes, aad: bytes = b""
) -> tuple[bytes, bytes]:
    """Returns (ciphertext, 16-byte tag)."""
    rk = _expand_key(key)
    h = int.from_bytes(_aes_encrypt_block(rk, b"\x00" * 16), "big")
    if len(iv) == 12:
        j0 = iv + b"\x00\x00\x00\x01"
    else:
        pad = _pad16(iv) + b"\x00" * 8 + (8 * len(iv)).to_bytes(8, "big")
        j0 = _ghash(h, pad).to_bytes(16, "big")
    ct = b""
    ctr = j0
    for i in range(0, len(plaintext), 16):
        ctr = _inc32(ctr)
        ks = _aes_encrypt_block(rk, ctr)
        blk = plaintext[i : i + 16]
        ct += bytes(a ^ b for a, b in zip(blk, ks))
    lens = (8 * len(aad)).to_bytes(8, "big") + (8 * len(ct)).to_bytes(8, "big")
    s = _ghash(h, _pad16(aad) + _pad16(ct) + lens)
    tag = bytes(
        a ^ b
        for a, b in zip(s.to_bytes(16, "big"), _aes_encrypt_block(rk, j0))
    )
    return ct, tag


def gcm_decrypt(
    key: bytes, iv: bytes, ciphertext: bytes, tag: bytes, aad: bytes = b""
) -> bytes:
    ct2, tag2 = gcm_encrypt(key, iv, ciphertext, aad)  # CTR is symmetric
    # recompute the tag over the CIPHERTEXT (gcm_encrypt tagged ct2=pt)
    rk = _expand_key(key)
    h = int.from_bytes(_aes_encrypt_block(rk, b"\x00" * 16), "big")
    j0 = iv + b"\x00\x00\x00\x01" if len(iv) == 12 else None
    lens = (8 * len(aad)).to_bytes(8, "big") + (8 * len(ciphertext)).to_bytes(
        8, "big"
    )
    s = _ghash(h, _pad16(aad) + _pad16(ciphertext) + lens)
    want = bytes(
        a ^ b
        for a, b in zip(s.to_bytes(16, "big"), _aes_encrypt_block(rk, j0))
    )
    if want != tag:
        raise ValueError("GCM tag mismatch")
    return ct2
