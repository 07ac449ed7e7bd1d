"""Baseline JPEG codec, pure Python + numpy, from the public ITU T.81
spec (and the JFIF container convention). No external codec library —
this makes the multimodal image operators (decode_image_features,
resize_image, frame sampling) work on real JPEG corpora instead of only
raw8/PNG fixtures.

Scope — baseline sequential AND progressive DCT, the two profiles that
cover effectively all training-corpus JPEGs:

- decode: 8-bit precision, 1-4 components, Huffman entropy coding,
  chroma subsampling with any sampling factors in 1..2 (4:4:4, 4:2:2,
  4:2:0, ...), restart markers (DRI/RSTn); baseline interleaved AND
  multi-scan non-interleaved streams (SOF0/1, one SOS per component
  subset) and progressive multi-scan streams (SOF2: spectral
  selection + successive approximation, DC/AC first + refinement,
  EOBn end-of-band runs, interleaved-DC and non-interleaved scans).
  Arithmetic coding, lossless/hierarchical SOFs and 12-bit inputs
  raise ``NotImplementedError`` with the marker that triggered it.
- encode: grayscale and 4:2:0 color, baseline (Annex-K example
  tables) and progressive (standard scan scripts with per-scan
  two-pass optimal Huffman tables per Annex K.2) — deterministic test
  payloads and the sink twin (the decoder is the production
  direction).

Everything is deterministic integer/float math in a fixed order: the
same payload decodes to the same pixels on every worker, partition
layout and architecture (the IDCT is float64 matrix algebra with one
final rounding — numpy's rounding is IEEE-defined), which is what lets
the driver hash-verify queries built on top of this codec.

Reference parity note: the reference engine (kemerelab/jagular) has no
media operators — this module serves the builder-brief multimodal
requirement, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables from ITU T.81 Annex K (public example tables)
# ---------------------------------------------------------------------------

# K.1 — luminance quantization table, natural (row-major) order
QUANT_LUM_K1 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# K.2 — chrominance quantization table, natural (row-major) order
QUANT_CHROM_K2 = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Zig-zag scan order: ZIGZAG[k] = natural index of the k-th scanned coef
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# K.3 / K.5 — Huffman table specs as (BITS counts per length 1..16, HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))

# K.4 / K.6 — chrominance Huffman table specs
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2: canonical code assignment. Returns
    ``{symbol: (code, length)}``."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffLut(dict):
    """``{(length, code): symbol}`` decode dict that additionally
    carries a 10-bit lookahead table (``peek[prefix] -> (symbol, len)``
    or None), so :func:`_decode_huff` resolves short codes — the
    overwhelming majority of real streams' symbols — with one peek
    instead of a bit-by-bit dict walk (r18: the walk was the hottest
    path of the baseline/progressive decoders). 10 bits keeps the
    build at ~1k slots, cheap enough to pay per DHT segment even for
    per-image optimized tables (a 16-bit table amortizes only for
    reused Annex-K tables and made progressive decode SLOWER —
    measured); codes longer than 10 bits take the per-bit walk."""

    __slots__ = ("peek",)


_HUFF_PEEK_WIDTH = 10


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Decoder-direction table: ``{(length, code): symbol}`` (a
    :class:`_HuffLut` with the lookahead table attached)."""
    lut = _HuffLut(
        ((ln, code), sym) for sym, (code, ln) in _huff_codes(bits, vals).items()
    )
    w = _HUFF_PEEK_WIDTH
    peek: list = [None] * (1 << w)
    for (ln, code), sym in lut.items():
        if ln > w:
            continue
        ent = (sym, ln)
        base = code << (w - ln)
        n = 1 << (w - ln)
        peek[base : base + n] = [ent] * n
    lut.peek = peek
    return lut


def _scaled_table(base: np.ndarray, quality: int) -> np.ndarray:
    """Annex-K base table scaled by the (public) libjpeg quality
    convention: scale = 5000/Q below 50 else 200 - 2Q, each entry
    ``clip((base*scale + 50) // 100, 1, 255)``."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


def quant_table(quality: int) -> np.ndarray:
    """Quality-scaled K.1 luminance table."""
    return _scaled_table(QUANT_LUM_K1, quality)


def quant_table_chroma(quality: int) -> np.ndarray:
    """Quality-scaled K.2 chrominance table (same scaling law)."""
    return _scaled_table(QUANT_CHROM_K2, quality)


# Orthonormal 8x8 DCT-II basis: F = A @ block @ A.T ; block = A.T @ F @ A
_A = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


# ---------------------------------------------------------------------------
# Encoder (grayscale baseline)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    """Magnitude category: smallest t with |v| < 2^t."""
    return int(abs(v)).bit_length()


def _emit_block(bw: _BitWriter, blk: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    """Entropy-code one 64-coef zig-zag block (F.1.2: differential DC,
    run/size AC with ZRL and EOB). Returns the new DC predictor."""
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    t = _category(diff)
    code, ln = dc_codes[t]
    # accumulate the whole block's codes into one (value, nbits) pair
    # and flush with a single bw.write — identical bit stream (byte
    # stuffing happens per flushed byte, independent of call
    # granularity), one writer call per block instead of per code
    acc, nb = code, ln
    if t:
        acc = (acc << t) | (
            (diff if diff >= 0 else diff + (1 << t) - 1) & ((1 << t) - 1)
        )
        nb += t
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            acc = (acc << ln) | code
            nb += ln
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        acc = (acc << (ln + s)) | (code << s) | (
            (v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)
        )
        nb += ln + s
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        acc = (acc << ln) | code
        nb += ln
    bw.write(acc, nb)
    return pred


def _pad_replicate(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate ``plane`` up to (ph, pw) as float64."""
    h, w = plane.shape
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    if ph > h:
        padded[h:, :w] = plane[h - 1 : h, :]
    if pw > w:
        padded[:, w:] = padded[:, w - 1 : w]
    return padded


def _dct_quant(padded: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize every 8x8 block of a level-shifted plane;
    returns zig-zag coefs indexed ``(by, bx, 64)``."""
    ph, pw = padded.shape
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coefs = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    q = np.rint(coefs / qt).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG].reshape(ph // 8, pw // 8, 64)


def encode_jpeg_gray8(img: np.ndarray, quality: int = 85) -> bytes:
    """Baseline JFIF encode of an (h, w) uint8 grayscale image with the
    Annex-K example tables. Deterministic: fixed tables, fixed float64
    DCT, banker's-free rounding via ``np.rint``."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg_gray8 expects an (h, w) grayscale array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt = quant_table(quality)
    dc_codes = _huff_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _huff_codes(AC_LUM_BITS, AC_LUM_VALS)

    # pad to multiples of 8 by edge replication (standard practice)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    zz = _dct_quant(_pad_replicate(img, ph, pw), qt).reshape(-1, 64)

    bw = _BitWriter()
    pred = 0
    for blk in zz:
        pred = _emit_block(bw, blk, pred, dc_codes, ac_codes)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_qt = qt.reshape(64)[ZIGZAG]
    out += seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in zz_qt))
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )  # SOF0: 1 component, 1x1 sampling, qtable 0
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range RGB -> (Y, Cb, Cr) uint8 planes (the public
    JFIF 1.02 matrix; one np.rint per plane)."""
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    to8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(cb), to8(cr)


def encode_jpeg_color420(rgb: np.ndarray, quality: int = 85) -> bytes:
    """Baseline JFIF encode of an (h, w, 3) uint8 RGB image with 4:2:0
    chroma subsampling — the layout that dominates real corpora (the
    decoder already handles it; this closes the encode direction).

    Pipeline per T.81/JFIF: RGB -> YCbCr (JFIF matrix), chroma planes
    2x2 box-averaged (np.rint, deterministic), every plane
    edge-replicated to the 16x16 MCU grid, K.1/K.2 quality-scaled
    quant tables, K.3-K.6 Huffman tables, interleaved scan with the
    MCU block schedule Y00 Y01 Y10 Y11 Cb Cr and per-component DC
    predictors."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg_color420 expects an (h, w, 3) RGB array")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    y, cb, cr = rgb_to_ycbcr(rgb)

    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    ph, pw = mcuy * 16, mcux * 16
    ypad = _pad_replicate(y, ph, pw)
    # 2x2 box-average chroma downsample on the padded planes (so every
    # chroma sample averages real or edge-replicated pixels)
    down = lambda p: np.rint(  # noqa: E731
        _pad_replicate(p, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    )
    cbd, crd = down(cb), down(cr)

    qy, qc = quant_table(quality), quant_table_chroma(quality)
    zzy = _dct_quant(ypad, qy)            # (2*mcuy, 2*mcux, 64)
    zzcb = _dct_quant(cbd, qc)            # (mcuy, mcux, 64)
    zzcr = _dct_quant(crd, qc)

    dc_l = _huff_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _huff_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _huff_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _huff_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    bw = _BitWriter()
    py = pcb = pcr = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for v in range(2):
                for u in range(2):
                    py = _emit_block(bw, zzy[2 * my + v, 2 * mx + u], py, dc_l, ac_l)
            pcb = _emit_block(bw, zzcb[my, mx], pcb, dc_c, ac_c)
            pcr = _emit_block(bw, zzcr[my, mx], pcr, dc_c, ac_c)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in qy.reshape(64)[ZIGZAG]))
    out += seg(0xFFDB, bytes([0x01]) + bytes(int(v) for v in qc.reshape(64)[ZIGZAG]))
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])   # Y: 2x2 sampling, qtable 0
        + bytes([2, 0x11, 1])   # Cb: 1x1, qtable 1
        + bytes([3, 0x11, 1]),  # Cr
    )
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += seg(0xFFC4, bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS))
    out += seg(0xFFC4, bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2) — spectral selection + successive approximation
# with per-scan two-pass optimal Huffman tables (T.81 K.2 code-length
# assignment + K.3 16-bit limit adjustment). The Annex-K example AC tables
# have no EOBn (n >= 1) symbols — they are sequential-profile tables — so
# progressive scans build their own tables from actual symbol frequencies,
# exactly the strategy mandated for progressive encoders in practice.
# ---------------------------------------------------------------------------

# Standard progressive scan scripts (the public libjpeg jcparam.c shape):
# (component indices, Ss, Se, Ah, Al)
_GRAY_PROG_SCRIPT = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_COLOR_PROG_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _optimal_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """T.81 K.2 optimal code-length assignment + K.3 adjustment to the
    16-bit limit. Returns (BITS[1..16], HUFFVAL). A reserved 257th
    symbol guarantees no real symbol is assigned the all-ones code."""
    f = [0] * 257
    for s, c in freq.items():
        f[s] = c
    f[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        live = [i for i in range(257) if f[i] > 0]
        if len(live) < 2:
            break
        v1 = min(live, key=lambda i: (f[i], -i))
        v2 = min((i for i in live if i != v1), key=lambda i: (f[i], -i))
        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # K.3: fold code lengths > 16 down
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # retire the reserved symbol's code point
    vals = sorted((s for s in range(256) if codesize[s] > 0),
                  key=lambda s: (codesize[s], s))
    return bits[1:17], vals


class _SymCounter:
    """Pass-1 emitter: counts Huffman symbols, ignores raw bits."""

    def __init__(self) -> None:
        self.freq: dict[int, int] = {}

    def sym(self, s: int) -> None:
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass


class _SymWriter:
    """Pass-2 emitter: writes codes + raw bits to a shared _BitWriter."""

    def __init__(self, bw: _BitWriter, codes: dict[int, tuple[int, int]]) -> None:
        self.bw = bw
        self.codes = codes

    def sym(self, s: int) -> None:
        code, ln = self.codes[s]
        self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v, n)


def _k_dc_first(blocks, zz_list, al, outs) -> None:
    """DC first scan kernel: differential coding of DC >> Al (arithmetic
    shift — the T.81 DC point transform) over the interleaved block
    schedule. ``outs[ci]`` is that component's table emitter."""
    preds: dict[int, int] = {}
    for ci, by, bx in blocks:
        v = int(zz_list[ci][by, bx, 0]) >> al
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        t = _category(diff)
        outs[ci].sym(t)
        outs[ci].bits(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _k_dc_refine(blocks, zz_list, al, sink) -> None:
    """DC refinement: one raw bit per block — bit Al of the (arithmetic-
    shifted) DC value. No Huffman symbols at all."""
    for ci, by, bx in blocks:
        sink.bits((int(zz_list[ci][by, bx, 0]) >> al) & 1, 1)


def _k_ac_first(blocks, zz, ss, se, al, out) -> None:
    """AC first scan over band [Ss, Se] at precision Al: run/size coding
    with EOBn end-of-band runs (G.1.2.2). Point transform for AC is
    sign-magnitude: v = sign(c) * (|c| >> Al)."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            out.sym(r << 4)
            out.bits(eobrun - (1 << r), r)
            eobrun = 0

    for by, bx in blocks:
        # one C-level conversion instead of (se-ss+1) numpy scalar reads
        band = zz[by, bx, ss : se + 1].tolist()
        vals = {}
        last = -1
        for k, c in enumerate(band, ss):
            v = abs(c) >> al
            if v:
                vals[k] = v if c > 0 else -v
                last = k
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for k in range(ss, last + 1):
            v = vals.get(k, 0)
            if v == 0:
                run += 1
                continue
            while run > 15:
                out.sym(0xF0)
                run -= 16
            s = _category(v)
            out.sym((run << 4) | s)
            out.bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _k_ac_refine(blocks, zz, ss, se, al, out) -> None:
    """AC refinement scan (G.1.2.3): newly-significant coefficients are
    run/1-coded with a sign bit; already-nonzero ("history")
    coefficients contribute correction bits that ride, in walk order,
    behind the next emitted symbol (or behind the EOBn covering their
    block) — the exact ordering the decoder's correction-bit walk
    consumes."""
    eobrun = 0
    pending: list[int] = []

    def flush() -> None:
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            out.sym(r << 4)
            out.bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            out.bits(b, 1)
        pending = []

    for by, bx in blocks:
        # one C-level conversion instead of 2x(se-ss+1) numpy scalar reads
        band = zz[by, bx, ss : se + 1].tolist()
        absv = [abs(c) >> al for c in band]
        eob = -1
        for k, t in enumerate(absv, ss):
            if t == 1:
                eob = k
        r = 0
        br_bits: list[int] = []
        for k, t in enumerate(absv, ss):
            if t == 0:
                r += 1
                continue
            # ZRLs are needed only while another newly-significant
            # coefficient remains (k <= eob); trailing zeros fold into
            # the EOB run instead
            while r > 15 and k <= eob:
                flush()
                out.sym(0xF0)
                r -= 16
                for b in br_bits:
                    out.bits(b, 1)
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            flush()
            out.sym((r << 4) | 1)
            out.bits(1 if band[k - ss] > 0 else 0, 1)
            for b in br_bits:
                out.bits(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            pending.extend(br_bits)
            if eobrun == 0x7FFF or len(pending) > 937:
                flush()
    flush()


def _encode_progressive(zz_list, comps_meta, h, w, qts, script) -> bytes:
    """Assemble a progressive JFIF stream from per-component zig-zag
    coefficient arrays (MCU-padded grids) and a scan script.
    ``comps_meta`` = [(cid, hs, vs, tq)]; ``qts`` = {tq: natural-order
    table}. Component index 0 uses Huffman slot 0 (luma), others slot 1
    (chroma); every scan carries its own optimized DHT."""
    hmax = max(c[1] for c in comps_meta)
    vmax = max(c[2] for c in comps_meta)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    true_grid = []
    for cid, hs, vs, tq in comps_meta:
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        true_grid.append(((cw + 7) // 8, (ch + 7) // 8))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in sorted(qts):
        zz_qt = qts[tq].reshape(64)[ZIGZAG]
        out += seg(0xFFDB, bytes([tq]) + bytes(int(v) for v in zz_qt))
    sof = struct.pack(">BHHB", 8, h, w, len(comps_meta))
    for cid, hs, vs, tq in comps_meta:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xFFC2, sof)

    for cis, ss, se, ah, al in script:
        if ss == 0 and len(cis) > 1:  # interleaved DC scan
            order = []
            for ci in cis:
                _, hs, vs, _ = comps_meta[ci]
                for v in range(vs):
                    for u in range(hs):
                        order.append((ci, u, v))
            blocks = []
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci, u, v in order:
                    _, hs, vs, _ = comps_meta[ci]
                    blocks.append((ci, my * vs + v, mx * hs + u))
        else:
            ci = cis[0]
            nbx, nby = true_grid[ci]
            blocks = [(ci, by, bx) for by in range(nby) for bx in range(nbx)]

        tbl_of = {ci: (0 if ci == 0 else 1) for ci in cis}
        dht = b""
        if ss == 0 and ah > 0:  # DC refinement: raw bits, no tables
            bw = _BitWriter()
            sink = _SymWriter(bw, {})
            _k_dc_refine(blocks, zz_list, al, sink)
            entropy = bw.flush()
        else:
            # pass 1: count symbols per table slot
            counters = {t: _SymCounter() for t in set(tbl_of.values())}
            if ss == 0:
                _k_dc_first(blocks, zz_list, al,
                            {ci: counters[tbl_of[ci]] for ci in cis})
            else:
                band = [(by, bx) for _, by, bx in blocks]
                kern = _k_ac_first if ah == 0 else _k_ac_refine
                kern(band, zz_list[cis[0]], ss, se, al, counters[tbl_of[cis[0]]])
            # pass 2: build tables, emit DHT + entropy
            bw = _BitWriter()
            writers = {}
            tc = 0 if ss == 0 else 1
            for t, cnt in sorted(counters.items()):
                freq = cnt.freq or {0: 1}
                bits, vals = _optimal_huffman(freq)
                dht += seg(0xFFC4, bytes([(tc << 4) | t]) + bytes(bits) + bytes(vals))
                writers[t] = _SymWriter(bw, _huff_codes(bits, vals))
            if ss == 0:
                _k_dc_first(blocks, zz_list, al,
                            {ci: writers[tbl_of[ci]] for ci in cis})
            else:
                band = [(by, bx) for _, by, bx in blocks]
                kern = _k_ac_first if ah == 0 else _k_ac_refine
                kern(band, zz_list[cis[0]], ss, se, al, writers[tbl_of[cis[0]]])
            entropy = bw.flush()

        sos = bytes([len(cis)])
        for ci in cis:
            td = tbl_of[ci] if ss == 0 and ah == 0 else 0
            ta = tbl_of[ci] if ss != 0 else 0
            sos += bytes([comps_meta[ci][0], (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += dht + seg(0xFFDA, sos) + entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray8_progressive(img: np.ndarray, quality: int = 85) -> bytes:
    """Progressive (SOF2) JFIF encode of an (h, w) uint8 grayscale
    image: same DCT/quantization as :func:`encode_jpeg_gray8`, coded
    with the standard 6-scan successive-approximation script. The
    quantized coefficients are bit-identical to the baseline encoder's,
    so decoding both yields identical pixels."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg_gray8_progressive expects (h, w) grayscale")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt = quant_table(quality)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    zz = _dct_quant(_pad_replicate(img, ph, pw), qt)
    return _encode_progressive([zz], [(1, 1, 1, 0)], h, w, {0: qt},
                               _GRAY_PROG_SCRIPT)


def encode_jpeg_color420_progressive(rgb: np.ndarray, quality: int = 85) -> bytes:
    """Progressive (SOF2) 4:2:0 color encode: same subsampling,
    DCT and quantization as :func:`encode_jpeg_color420`, coded with
    the standard 10-scan color script (interleaved DC scans exercise
    the multi-component progressive path; per-component AC scans the
    non-interleaved one)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg_color420_progressive expects (h, w, 3) RGB")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    y, cb, cr = rgb_to_ycbcr(rgb)
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    ph, pw = mcuy * 16, mcux * 16
    ypad = _pad_replicate(y, ph, pw)
    down = lambda p: np.rint(  # noqa: E731
        _pad_replicate(p, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    )
    qy, qc = quant_table(quality), quant_table_chroma(quality)
    zzy = _dct_quant(ypad, qy)
    zzcb = _dct_quant(down(cb), qc)
    zzcr = _dct_quant(down(cr), qc)
    return _encode_progressive(
        [zzy, zzcb, zzcr],
        [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)],
        h, w, {0: qy, 1: qc}, _COLOR_PROG_SCRIPT,
    )


# ---------------------------------------------------------------------------
# Decoder (baseline sequential, multi-component)
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with byte unstuffing; stops at any
    marker and records it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                # past the segment: feed 0 bits (spec allows — a correct
                # stream never reads them into decoded values)
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                else:  # a real marker terminates the segment
                    self.marker = 0xFF00 | nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_restart(self) -> None:
        """Consume an RSTn marker between restart intervals."""
        self.nbits = 0
        self.acc = 0
        if self.marker is not None and 0xFFD0 <= self.marker <= 0xFFD7:
            self.pos += 2
            self.marker = None


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t received bits to a signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(br: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    peek = getattr(lut, "peek", None)
    if peek is not None:
        if br.nbits < _HUFF_PEEK_WIDTH:
            br._fill()
        ent = peek[(br.acc >> (br.nbits - _HUFF_PEEK_WIDTH)) & 0x3FF]
        if ent is not None:
            br.nbits -= ent[1]
            return ent[0]
    # per-bit walk: plain-dict callers and invalid-prefix error path
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = lut.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def decode_jpeg(payload: bytes):
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2)
    JPEG. Returns ``(planes, h, w)`` where ``planes`` is a list of
    (h, w) uint8 arrays, one per component, each upsampled to full
    resolution (nearest neighbor for subsampled chroma) and cropped to
    the frame size. Components are in frame order (Y, Cb, Cr for
    3-component JFIF)."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    frame = None  # (h, w, comps) ; comps = list of (cid, hs, vs, tq)
    restart_interval = 0
    progressive = False
    prog_state: _ProgState | None = None

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = struct.unpack(">H", d[pos : pos + 2])[0]
        if marker in (0xFFD8, 0xFF01) or 0xFFD0 <= marker <= 0xFFD7:
            pos += 2
            continue
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        body = d[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq == 0:  # 8-bit entries
                    tbl = np.frombuffer(
                        body[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
                else:  # Pq=1: 16-bit big-endian entries (B.2.4.1)
                    tbl = np.frombuffer(
                        body[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.int64)
                    i += 129
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xFFC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                lut = _huff_lookup(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
                i += 17 + n
        elif marker == 0xFFC0 or marker == 0xFFC1:  # SOF0/1 baseline+ext seq
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker == 0xFFC2:  # SOF2: progressive DCT, Huffman
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            progressive = True
        elif marker in (0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7, 0xFFC9,
                        0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:04X}: "
                "lossless/arithmetic/hierarchical not supported)"
            )
        elif marker == 0xFFDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_sel.append((cs, tdta >> 4, tdta & 0xF))
            data_pos = pos + 2 + length
            if not progressive:
                if ns == len(frame[2]) and prog_state is None:
                    # the overwhelmingly common case: ONE interleaved
                    # scan covering every component — decode and return
                    return _decode_scan(
                        d, data_pos, frame, scan_sel, qtables, dc_luts,
                        ac_luts, restart_interval,
                    )
                # multi-scan baseline (one SOS per component subset):
                # accumulate coefficients across scans, reconstruct at EOI
                if prog_state is None:
                    prog_state = _ProgState(frame)
                pos = _decode_baseline_scan_into(
                    d, data_pos, prog_state, scan_sel, dc_luts, ac_luts,
                    restart_interval,
                )
                continue
            if prog_state is None:
                prog_state = _ProgState(frame)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pos = _decode_progressive_scan(
                d, data_pos, prog_state, scan_sel, dc_luts, ac_luts,
                ss, se, ahal >> 4, ahal & 0xF, restart_interval,
            )
            continue
        pos += 2 + length
    if prog_state is not None:
        h, w, comps = frame
        coefs = [prog_state.coef[ci] for ci in range(len(comps))]
        return _reconstruct(coefs, comps, qtables, h, w)
    raise ValueError("no SOS scan found")


def _decode_block_baseline(br, blk, pred, dc_lut, ac_lut) -> int:
    """Full-spectrum baseline block decode (F.2.2): differential DC +
    run/size AC with ZRL and EOB into ``blk`` (64 zig-zag coefs).
    Returns the updated DC predictor."""
    t = _decode_huff(br, dc_lut)
    diff = _extend(br.bits(t), t) if t else 0
    pred += diff
    blk[0] = pred
    k = 1
    while k <= 63:
        rs = _decode_huff(br, ac_lut)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(br.bits(s), s)
        k += 1
    return pred


def _decode_scan(d, pos, frame, scan_sel, qtables, dc_luts, ac_luts, dri):
    h, w, comps = frame
    if len(scan_sel) != len(comps):
        raise ValueError("interleaved baseline scan must cover all components")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    order = []  # per-MCU block schedule: (comp_idx, bx_off, by_off)
    sel_by_cid = {s[0]: s for s in scan_sel}
    per_comp = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if cid not in sel_by_cid:
            raise ValueError("scan component not in frame")
        _, td, ta = sel_by_cid[cid]
        cw, ch = mcux * hs * 8, mcuy * vs * 8
        per_comp.append(
            {
                "hs": hs, "vs": vs,
                "qt": qtables[tq],
                "dc": dc_luts[td], "ac": ac_luts[ta],
                "coef": np.zeros((ch // 8, cw // 8, 64), dtype=np.int64),
                "pred": 0,
            }
        )
        for v in range(vs):
            for u in range(hs):
                order.append((ci, u, v))

    br = _BitReader(d, pos)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            br.align_restart()
            for pc in per_comp:
                pc["pred"] = 0
        my, mx = divmod(m, mcux)
        for ci, u, v in order:
            pc = per_comp[ci]
            by, bx = my * pc["vs"] + v, mx * pc["hs"] + u
            pc["pred"] = _decode_block_baseline(
                br, pc["coef"][by, bx], pc["pred"], pc["dc"], pc["ac"]
            )

    coefs = [pc["coef"] for pc in per_comp]
    return _reconstruct(coefs, comps, qtables, h, w)


def _decode_baseline_scan_into(d, pos, st, scan_sel, dc_luts, ac_luts, dri):
    """One baseline scan of a MULTI-SCAN stream (T.81 A.2: each SOS
    covers a component subset; ns=1 scans walk the component's true
    block grid non-interleaved) accumulated into ``st.coef``. Returns
    the position of the next marker."""
    cid_to_ci = {c[0]: i for i, c in enumerate(st.comps)}
    sel = [(cid_to_ci[cs], td, ta) for cs, td, ta in scan_sel]
    br = _BitReader(d, pos)
    if len(sel) > 1:  # interleaved over the subset: frame MCU geometry
        order = []
        for ci, td, ta in sel:
            _, hs, vs, _ = st.comps[ci]
            for v in range(vs):
                for u in range(hs):
                    order.append((ci, td, ta, u, v))
        preds = {ci: 0 for ci, _, _ in sel}
        for m in range(st.mcux * st.mcuy):
            if dri and m and m % dri == 0:
                br.align_restart()
                preds = {ci: 0 for ci, _, _ in sel}
            my, mx = divmod(m, st.mcux)
            for ci, td, ta, u, v in order:
                _, hs, vs, _ = st.comps[ci]
                by, bx = my * vs + v, mx * hs + u
                preds[ci] = _decode_block_baseline(
                    br, st.coef[ci][by, bx], preds[ci],
                    dc_luts[td], ac_luts[ta],
                )
    else:
        ci, td, ta = sel[0]
        nbx, nby = st.true_grid[ci]
        pred = 0
        for m in range(nbx * nby):
            if dri and m and m % dri == 0:
                br.align_restart()
                pred = 0
            by, bx = divmod(m, nbx)
            pred = _decode_block_baseline(
                br, st.coef[ci][by, bx], pred, dc_luts[td], ac_luts[ta]
            )
    return _next_marker_pos(d, br.pos)


def _reconstruct(coefs, comps, qtables, h, w):
    """Dequantize + IDCT + upsample + crop: the shared tail of the
    baseline and progressive decoders. ``coefs[ci]`` is the (nby, nbx,
    64) zig-zag coefficient array of component ``ci``."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, hs, vs, tq), coef in zip(comps, coefs):
        nby, nbx, _ = coef.shape
        zz = coef.reshape(-1, 64)
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        deq = (nat * qtables[tq].reshape(64)).reshape(-1, 8, 8).astype(np.float64)
        # IDCT: block = A.T @ F @ A
        pix = np.einsum("xu,nuv,vy->nxy", _A.T, deq, _A)
        pix = np.clip(np.rint(pix) + 128, 0, 255).astype(np.uint8)
        full = (
            pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        )
        # upsample to frame resolution (nearest) then crop
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            full = np.repeat(np.repeat(full, ry, axis=0), rx, axis=1)
        planes.append(full[:h, :w])
    return planes, h, w


# ---------------------------------------------------------------------------
# Progressive decoder (SOF2, spectral selection + successive approximation,
# T.81 G.2)
# ---------------------------------------------------------------------------


class _ProgState:
    """Cross-scan coefficient accumulators for one progressive frame.

    Coefficients live on the MCU-padded block grid of each component
    (so interleaved DC scans index it directly); non-interleaved scans
    touch only the component's true ceil(comp_dim/8) sub-grid, per
    T.81 A.2.2. ``eobrun`` persists only within one scan (reset at scan
    start and at restart markers)."""

    def __init__(self, frame) -> None:
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        self.mcux = (w + 8 * hmax - 1) // (8 * hmax)
        self.mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        self.hmax, self.vmax = hmax, vmax
        self.coef: list[np.ndarray] = []
        self.true_grid: list[tuple[int, int]] = []  # (nbx, nby) per comp
        for cid, hs, vs, tq in comps:
            self.coef.append(
                np.zeros((self.mcuy * vs, self.mcux * hs, 64), dtype=np.int64)
            )
            cw = (w * hs + hmax - 1) // hmax
            ch = (h * vs + vmax - 1) // vmax
            self.true_grid.append(((cw + 7) // 8, (ch + 7) // 8))
        self.comps = comps


def _next_marker_pos(d: bytes, pos: int) -> int:
    """Skip the remainder of an entropy segment: first position of a
    real (non-stuffed, non-restart) marker at or after ``pos``."""
    n = len(d)
    while pos + 1 < n:
        if d[pos] == 0xFF and d[pos + 1] != 0x00:
            if 0xD0 <= d[pos + 1] <= 0xD7:  # stray RST: part of the segment
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _decode_progressive_scan(
    d, pos, st: _ProgState, scan_sel, dc_luts, ac_luts, ss, se, ah, al, dri
):
    """Decode one progressive scan into ``st.coef`` and return the
    stream position of the next marker.

    Four T.81 G.2 paths: DC first (Ss=0, Ah=0 — differential, value
    << Al), DC refinement (one bit per block, OR 1<<Al), AC first
    (spectral band with EOBn end-of-band runs), AC refinement (the
    G.1.2.3 correction-bit walk). DC scans may interleave any component
    subset; AC scans are single-component over the true block grid."""
    cid_to_ci = {c[0]: i for i, c in enumerate(st.comps)}
    sel = [(cid_to_ci[cs], td, ta) for cs, td, ta in scan_sel]
    br = _BitReader(d, pos)

    if ss == 0:  # DC scan (Se must be 0 per spec)
        if se != 0:
            raise ValueError("DC progressive scan with Se != 0")
        if len(sel) > 1:
            # interleaved: frame MCU geometry, each component contributes
            # hs*vs blocks per MCU in raster order
            order = []
            for ci, td, ta in sel:
                _, hs, vs, _ = st.comps[ci]
                for v in range(vs):
                    for u in range(hs):
                        order.append((ci, td, u, v))
            n_mcu = st.mcux * st.mcuy
            preds = {ci: 0 for ci, _, _ in sel}
            for m in range(n_mcu):
                if dri and m and m % dri == 0:
                    br.align_restart()
                    preds = {ci: 0 for ci, _, _ in sel}
                my, mx = divmod(m, st.mcux)
                for ci, td, u, v in order:
                    _, hs, vs, _ = st.comps[ci]
                    by, bx = my * vs + v, mx * hs + u
                    if ah == 0:
                        t = _decode_huff(br, dc_luts[td])
                        diff = _extend(br.bits(t), t) if t else 0
                        preds[ci] += diff
                        st.coef[ci][by, bx, 0] = preds[ci] << al
                    else:
                        if br.bit():
                            st.coef[ci][by, bx, 0] |= 1 << al
        else:
            ci, td, ta = sel[0]
            nbx, nby = st.true_grid[ci]
            pred = 0
            for m in range(nbx * nby):
                if dri and m and m % dri == 0:
                    br.align_restart()
                    pred = 0
                by, bx = divmod(m, nbx)
                if ah == 0:
                    t = _decode_huff(br, dc_luts[td])
                    diff = _extend(br.bits(t), t) if t else 0
                    pred += diff
                    st.coef[ci][by, bx, 0] = pred << al
                else:
                    if br.bit():
                        st.coef[ci][by, bx, 0] |= 1 << al
        return _next_marker_pos(d, br.pos)

    # AC scan: single component, band [Ss, Se]
    if len(sel) != 1:
        raise ValueError("interleaved AC progressive scan is not legal (T.81)")
    ci, td, ta = sel[0]
    lut = ac_luts[ta]
    nbx, nby = st.true_grid[ci]
    coef = st.coef[ci]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    for m in range(nbx * nby):
        if dri and m and m % dri == 0:
            br.align_restart()
            eobrun = 0
        by, bx = divmod(m, nbx)
        blk = coef[by, bx]
        if ah == 0:  # first pass over this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_huff(br, lut)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run past end of band")
                blk[k] = _extend(br.bits(s), s) << al
                k += 1
        else:  # refinement pass (G.1.2.3 correction-bit walk)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(br, lut)
                    r, s = rs >> 4, rs & 0xF
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # ZRL: skip 16 zero-history slots with corrections
                    else:
                        if s != 1:
                            raise ValueError("AC refinement size must be 1")
                        newval = p1 if br.bit() else m1
                    while k <= se:
                        if blk[k] != 0:
                            if br.bit() and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError("AC refinement run past band end")
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB run covers this block's tail: correction bits only
                while k <= se:
                    if blk[k] != 0:
                        if br.bit() and not (blk[k] & p1):
                            blk[k] += p1 if blk[k] > 0 else m1
                    k += 1
                eobrun -= 1
    return _next_marker_pos(d, br.pos)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode to a single (h, w) uint8 grayscale plane: the Y component
    for YCbCr JPEGs (JFIF Y IS the luma), the sole component for
    grayscale ones."""
    planes, h, w = decode_jpeg(bytes(payload))
    return planes[0]
