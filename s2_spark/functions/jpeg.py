"""Baseline JPEG (ITU-T T.81) codec in pure numpy — the MJPEG frame
decode path for the multimodal operators.

Public-spec implementation: baseline sequential DCT, 8-bit samples,
Huffman entropy coding, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
chroma subsampling, restart markers. The encoder exists so tests can
synthesize frames whose decode is exactly predictable (JPEG is lossy
but deterministic: the expected pixels are IDCT(dequant(quant(DCT)))
computed independently of the entropy layer).

Scale note: this is the correctness fallback where no codec library
exists in the container (mirrors the PNG path in multimodal.py). A
production cluster ships libjpeg-turbo/PIL on executors and installs
it as the ``decoder`` callable; either way frames decode executor-side
inside mapInPandas — media bytes never hit the driver.

Reference parity: the reference stores media as opaque bytes and leaves
decode to clients; this module exists for the training-data pipeline
extensions (frame feature extraction), not for an S2 API.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT-II basis (orthonormal) ----------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0] *= np.sqrt(0.5)


def _fdct(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT-II of a level-shifted block."""
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_fdct`."""
    return _C.T @ coef @ _C


# zig-zag scan order (T.81 Figure A.6)
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.1 luminance / chrominance quantization tables (quality 50)
K_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
K_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction
    (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for decoding."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, huffval).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bit = 0
        self.marker: int | None = None

    def read_bit(self) -> int:
        b = self.buf[self.pos]
        if b == 0xFF and self.buf[self.pos + 1] != 0x00:
            self.marker = self.buf[self.pos + 1]
            raise EOFError("marker inside entropy data")
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffed 0x00
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RST handling); returns it."""
        if self.bit:
            self.bit = 0
            self.pos += 1 + (1 if self.buf[self.pos] == 0xFF else 0)
        while self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.buf[self.pos + 1]
        self.pos += 2
        return m


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB (grayscale replicated).

    Supports: SOF0 8-bit, 1 or 3 components, chroma subsampling up to
    2x2, DRI/RSTn restart intervals, multiple DQT/DHT segments.
    Raises NotImplementedError for progressive (SOF2) / arithmetic /
    12-bit streams — the same honest-boundary convention as the rest of
    multimodal.py."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (h, w, comps)
    restart = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = np.frombuffer(seg[p + 1 : p + 65], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _decode_table(bits, huffval)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential JPEG")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tdta >> 4, tdta & 0xF)
            return _decode_scan(
                payload, pos + seglen, frame, qt, huff, scan, restart
            )
        pos += seglen
    raise ValueError("no SOS marker")


def _decode_scan(buf, pos, frame, qt, huff, scan, restart):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(buf, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, got {m:#x}")
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(br, huff[(0, td)])
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, huff[(1, ta)])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
                        # dequantize in natural order: coef is in zigzag
                        natural = np.zeros(64, dtype=np.float64)
                        natural[_ZZ] = coef
                        natural = natural.reshape(8, 8) * q
                        px = _idct(natural) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder (tests + synthetic MJPEG) --------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coef = np.round(_fdct(block - 128.0) / q).astype(np.int32)
    zz = coef.reshape(-1)[_ZZ]
    diff = int(zz[0]) - pred
    t = int(diff != 0 and int(np.floor(np.log2(abs(diff)))) + 1)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(v, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s = int(np.floor(np.log2(abs(v)))) + 1
        c, l = ac_codes[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.write(c, l)
    return int(zz[0])


def expected_decode(img: np.ndarray, gray: bool = False) -> np.ndarray:
    """The pixels :func:`decode_jpeg` must produce for
    ``encode_jpeg(img)`` — quant/dequant round-trip through the same
    DCT math, computed WITHOUT the entropy layer. This is the bit-exact
    oracle for the Huffman/bitstream code."""
    img = img.astype(np.float64)
    if gray:
        chans = [(img[..., 0] if img.ndim == 3 else img, K_LUMA_Q)]
    else:
        y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        cb = -0.168736 * img[..., 0] - 0.331264 * img[..., 1] + 0.5 * img[..., 2] + 128
        cr = 0.5 * img[..., 0] - 0.418688 * img[..., 1] - 0.081312 * img[..., 2] + 128
        chans = [(y, K_LUMA_Q), (cb, K_CHROMA_Q), (cr, K_CHROMA_Q)]
    h, w = chans[0][0].shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    outs = []
    for plane, q in chans:
        padded = np.empty((ph, pw))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[h - 1 : h, :]
        padded[:, w:] = padded[:, w - 1 : w]
        rec = np.empty_like(padded)
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                blk = padded[by : by + 8, bx : bx + 8]
                coef = np.round(_fdct(blk - 128.0) / q)
                rec[by : by + 8, bx : bx + 8] = _idct(coef * q) + 128.0
        outs.append(rec[:h, :w])
    if gray:
        yk = np.clip(np.round(outs[0]), 0, 255).astype(np.uint8)
        return np.stack([yk, yk, yk], axis=-1)
    y, cb, cr = outs
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg(
    img: np.ndarray, gray: bool = False, restart_interval: int = 0
) -> bytes:
    """Baseline JPEG encoder (4:4:4, Annex K tables, no subsampling) —
    produces streams :func:`decode_jpeg` decodes exactly as
    :func:`expected_decode` predicts. ``restart_interval`` emits DRI +
    RSTn markers every N MCUs (exercises the decoder's resync path)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img, img, img], axis=-1)
    h, w = img.shape[:2]
    imgf = img.astype(np.float64)
    if gray:
        chans = [(imgf[..., 0], K_LUMA_Q, 0)]
    else:
        y = 0.299 * imgf[..., 0] + 0.587 * imgf[..., 1] + 0.114 * imgf[..., 2]
        cb = (
            -0.168736 * imgf[..., 0] - 0.331264 * imgf[..., 1] + 0.5 * imgf[..., 2] + 128
        )
        cr = (
            0.5 * imgf[..., 0] - 0.418688 * imgf[..., 1] - 0.081312 * imgf[..., 2] + 128
        )
        chans = [(y, K_LUMA_Q, 0), (cb, K_CHROMA_Q, 1), (cr, K_CHROMA_Q, 1)]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body)

    for tq, q in ((0, K_LUMA_Q), (1, K_CHROMA_Q))[: 1 if gray else 2]:
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = q.reshape(-1)[_ZZ]
        seg(0xDB, bytes([tq]) + zz.tobytes())
    nc = len(chans)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    seg(0xC0, sof)
    tables = [(0, 0, K_DC_LUMA), (1, 0, K_AC_LUMA)]
    if nc == 3:
        tables += [(0, 1, K_DC_CHROMA), (1, 1, K_AC_CHROMA)]
    for tc, th, (bits, huffval) in tables:
        seg(0xC4, bytes([(tc << 4) | th] + bits + huffval))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_l, ac_l = _canonical_codes(*K_DC_LUMA), _canonical_codes(*K_AC_LUMA)
    dc_c, ac_c = _canonical_codes(*K_DC_CHROMA), _canonical_codes(*K_AC_CHROMA)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for plane, q, tq in chans:
        p = np.empty((ph, pw))
        p[:h, :w] = plane
        p[h:, :w] = plane[h - 1 : h, :]
        p[:, w:] = p[:, w - 1 : w]
        padded.append((p, q, tq))
    bw = _BitWriter()
    pred = [0] * nc
    mcu_count, rst = 0, 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out.extend(b"\xff" + bytes([0xD0 + rst]))
                rst = (rst + 1) % 8
                pred = [0] * nc
            for ci, (p, q, tq) in enumerate(padded):
                dc = dc_l if tq == 0 else dc_c
                ac = ac_l if tq == 0 else ac_c
                pred[ci] = _encode_block(
                    bw, p[by : by + 8, bx : bx + 8], q, dc, ac, pred[ci]
                )
            mcu_count += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
