"""MPEG-1 Video (ISO/IEC 11172-2) codec, pure numpy: I pictures plus
forward-predicted P pictures, from the public spec. Intra side: real
sequence / GOP / picture / slice / macroblock syntax, intra DC size
VLCs with per-component DPCM predictors, the 2-D run-level AC table
(B.5c subset + the always-legal ESCAPE form), default or custom intra
quantizer matrices, the §2.4.4.1 reconstruction arithmetic
(truncating integer dequant + odd-ification mismatch control), and
the float IDCT shared with the JPEG stack. Inter side
(:func:`encode_mpeg1_video`): P pictures with full-pel forward motion
compensation (exhaustive even-offset search against the encoder's own
reconstruction, so there is no encoder/decoder drift), macroblock
modes pred-mc / pred-c / pred-m / intra / skipped (tables B.2b, B.1
address-increment VLCs incl. escape), coded_block_pattern (table
B.3), motion vector VLCs with ±32 differential folding (table B.4,
forward_f_code = 1), and the §2.4.4.2/§2.4.4.3 non-intra
reconstruction (((2·L + sgn L)·q·W) DIV 16, odd-ification, flat-16
default non-intra matrix). B pictures (bidirectional) remain out of
scope — they need a reordering buffer and backward references; the
decoder rejects them explicitly.

Grayscale input: Y carries the frame, Cb/Cr are coded as flat 128
planes (zero-diff DC, empty AC — a few bits per block).

Reference parity note: the reference engine (kemerelab/jagular) has no
media operators — this module serves the builder-brief multimodal
requirement (a genuine inter-format video path beyond the MJPEG
container), not reference parity.

Determinism: encoder output is a pure function of (frames, qscale,
matrix); decoder walks the syntax exactly (no resync heuristics).
"""

from __future__ import annotations

import numpy as np

from jagular_spark.operators.jpeg import _A, ZIGZAG

# Default intra quantizer matrix (ISO 11172-2 §2.4.2.3), natural
# row-major order. Entry [0] (the DC step) is part of the syntax but
# the DC coefficient always reconstructs as 8 * dct_zz[0].
DEFAULT_INTRA_QUANT = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int64,
)

SEQ_START = 0x000001B3
GOP_START = 0x000001B8
PIC_START = 0x00000100
SEQ_END = 0x000001B7

# Intra DC size VLCs (§2.4.3.7 tables B.5a / B.5b): size -> (code, len)
DC_LUM_CODES = {
    0: (0b100, 3), 1: (0b00, 2), 2: (0b01, 2), 3: (0b101, 3),
    4: (0b110, 3), 5: (0b1110, 4), 6: (0b11110, 5), 7: (0b111110, 6),
    8: (0b1111110, 7),
}
DC_CHROM_CODES = {
    0: (0b00, 2), 1: (0b01, 2), 2: (0b10, 2), 3: (0b110, 3),
    4: (0b1110, 4), 5: (0b11110, 5), 6: (0b111110, 6), 7: (0b1111110, 7),
    8: (0b11111110, 8),
}

# dct_coeff_next run/level VLCs (table B.5c, codes through 13 bits;
# the encoder falls back to the always-legal ESCAPE form for pairs
# beyond this subset, which every conformant decoder accepts). Codes
# EXCLUDE the trailing sign bit.
AC_CODES: dict[tuple[int, int], tuple[int, int]] = {
    (0, 1): (0b11, 2),
    (1, 1): (0b011, 3),
    (0, 2): (0b0100, 4),
    (2, 1): (0b0101, 4),
    (0, 3): (0b00101, 5),
    (3, 1): (0b00111, 5),
    (4, 1): (0b00110, 5),
    (1, 2): (0b000110, 6),
    (5, 1): (0b000111, 6),
    (6, 1): (0b000101, 6),
    (7, 1): (0b000100, 6),
    (0, 4): (0b0000110, 7),
    (2, 2): (0b0000100, 7),
    (8, 1): (0b0000111, 7),
    (9, 1): (0b0000101, 7),
    (0, 5): (0b00100110, 8),
    (0, 6): (0b00100001, 8),
    (1, 3): (0b00100101, 8),
    (3, 2): (0b00100100, 8),
    (10, 1): (0b00100111, 8),
    (11, 1): (0b00100011, 8),
    (12, 1): (0b00100010, 8),
    (13, 1): (0b00100000, 8),
    (0, 7): (0b0000001010, 10),
    (1, 4): (0b0000001100, 10),
    (2, 3): (0b0000001011, 10),
    (4, 2): (0b0000001111, 10),
    (5, 2): (0b0000001001, 10),
    (14, 1): (0b0000001110, 10),
    (15, 1): (0b0000001101, 10),
    (16, 1): (0b0000001000, 10),
    (0, 8): (0b000000011101, 12),
    (0, 9): (0b000000011000, 12),
    (0, 10): (0b000000010011, 12),
    (0, 11): (0b000000010000, 12),
    (1, 5): (0b000000011011, 12),
    (2, 4): (0b000000010100, 12),
    (3, 3): (0b000000011100, 12),
    (4, 3): (0b000000010010, 12),
    (6, 2): (0b000000011110, 12),
    (7, 2): (0b000000010101, 12),
    (8, 2): (0b000000010001, 12),
    (17, 1): (0b000000011111, 12),
    (18, 1): (0b000000011010, 12),
    (19, 1): (0b000000011001, 12),
    (20, 1): (0b000000010111, 12),
    (21, 1): (0b000000010110, 12),
    (0, 12): (0b0000000011010, 13),
    (0, 13): (0b0000000011001, 13),
    (0, 14): (0b0000000011000, 13),
    (0, 15): (0b0000000010111, 13),
    (1, 6): (0b0000000010110, 13),
    (1, 7): (0b0000000010101, 13),
    (2, 5): (0b0000000010100, 13),
    (3, 4): (0b0000000010011, 13),
    (5, 3): (0b0000000010010, 13),
    (9, 2): (0b0000000010001, 13),
    (10, 2): (0b0000000010000, 13),
    (22, 1): (0b0000000011111, 13),
    (23, 1): (0b0000000011110, 13),
    (24, 1): (0b0000000011101, 13),
    (25, 1): (0b0000000011100, 13),
    (26, 1): (0b0000000011011, 13),
}
EOB_CODE, EOB_LEN = 0b10, 2
ESC_CODE, ESC_LEN = 0b000001, 6

# decoder lookup: (length, code-with-sign-slot-excluded) -> (run, level)
_AC_DECODE = {(ln, code): rl for rl, (code, ln) in AC_CODES.items()}
_DC_LUM_DECODE = {(ln, code): s for s, (code, ln) in DC_LUM_CODES.items()}
_DC_CHROM_DECODE = {(ln, code): s for s, (code, ln) in DC_CHROM_CODES.items()}


def _peek_table(decode: dict, width: int) -> list:
    """Expand a prefix-free ``{(len, code): value}`` decode dict into a
    ``width``-bit lookahead table: ``tbl[prefix] = (value, len)`` for
    every prefix whose leading bits are a code, ``None`` for prefixes
    no code owns. One ``_peek(width)`` + one list index replaces the
    bit-by-bit dict walk on the decoder's hottest loops; misses fall
    back to the exact per-bit walk so error behavior on malformed
    streams is unchanged (profiled r18: the walk was ~55% of the
    mpeg1 roundtrip kernels' decode half)."""
    tbl: list = [None] * (1 << width)
    for (ln, code), val in decode.items():
        ent = (val, ln)
        base = code << (width - ln)
        for i in range(base, base + (1 << (width - ln))):
            tbl[i] = ent
    return tbl


# dct coefficient lookahead (13 bits = the longest B.5c code): run/level
# entries are (run, level, len); EOB and ESCAPE ride the same table as
# tagged sentinels. The dct_coeff_first '1 s' special form is handled
# by the callers before consulting the table (its '1' prefix would
# collide with EOB '10' and (0,1) '11').
_AC_WIDTH = 13
_AC_PEEK: list = [None] * (1 << _AC_WIDTH)
for _rl, (_code, _ln) in AC_CODES.items():
    _ent = (_rl[0], _rl[1], _ln)
    _base = _code << (_AC_WIDTH - _ln)
    for _i in range(_base, _base + (1 << (_AC_WIDTH - _ln))):
        _AC_PEEK[_i] = _ent
for _code, _ln, _tag in (
    (EOB_CODE, EOB_LEN, ("eob", EOB_LEN)),
    (ESC_CODE, ESC_LEN, ("esc", ESC_LEN)),
):
    _base = _code << (_AC_WIDTH - _ln)
    for _i in range(_base, _base + (1 << (_AC_WIDTH - _ln))):
        _AC_PEEK[_i] = _tag
del _rl, _code, _ln, _ent, _base, _i, _tag

_DC_LUM_PEEK = _peek_table(_DC_LUM_DECODE, 8)
_DC_CHROM_PEEK = _peek_table(_DC_CHROM_DECODE, 8)


class _BitWriter:
    """MSB-first bit writer, no byte stuffing (MPEG-1 start codes live
    outside the entropy layer)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Zero-pad to a byte boundary (next_start_code())."""
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def start_code(self, code: int) -> None:
        self.align()
        self.buf += code.to_bytes(4, "big")

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over the whole stream (no unstuffing).

    ``bits`` reads the whole n-bit window with one ``int.from_bytes``
    slice instead of a per-bit loop, and ``_peek``/``_skip`` expose the
    non-consuming lookahead the table-driven VLC decoders below use
    (lookahead past the end reads zero bits; a consuming read past the
    end still raises IndexError exactly where the per-bit reader did)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self._pad = data + b"\x00" * 8
        self._nbits = len(data) * 8
        # cached 64-bit window starting at bit _wpos (byte-aligned):
        # bits/_peek answer from it and refill every ~57 consumed bits
        # instead of one fresh from_bytes slice per call (measured: the
        # per-call slices were the decoder's single largest cost after
        # the r18 VLC lookahead tables)
        self._wval = int.from_bytes(self._pad[:8], "big")
        self._wpos = 0

    def bits(self, n: int) -> int:
        p = self.pos
        if p + n > self._nbits:
            raise IndexError("mpeg1: bit read past end of stream")
        o = p - self._wpos
        if o < 0 or o + n > 64:
            b0 = p >> 3
            self._wval = int.from_bytes(self._pad[b0 : b0 + 8], "big")
            self._wpos = b0 << 3
            o = p & 7
        self.pos = p + n
        return (self._wval >> (64 - o - n)) & ((1 << n) - 1)

    def _peek(self, n: int) -> int:
        """n leading bits without consuming; zero-padded past the end
        (n <= 57 — the padded buffer covers 8 bytes beyond the data)."""
        p = self.pos
        o = p - self._wpos
        if o < 0 or o + n > 64:
            b0 = p >> 3
            self._wval = int.from_bytes(self._pad[b0 : b0 + 8], "big")
            self._wpos = b0 << 3
            o = p & 7
        return (self._wval >> (64 - o - n)) & ((1 << n) - 1)

    def _skip(self, n: int) -> None:
        p = self.pos + n
        if p > self._nbits:
            raise IndexError("mpeg1: bit read past end of stream")
        self.pos = p

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def at_start_code(self) -> bool:
        p = self.pos >> 3
        d = self.data
        return (
            self.pos % 8 == 0
            and p + 3 < len(d)
            and d[p] == 0
            and d[p + 1] == 0
            and d[p + 2] == 1
        )

    def next_start_code(self) -> int:
        """Align and scan forward to the next 0x000001xx; return the
        full 32-bit code, positioned after it."""
        self.align()
        d = self.data
        p = self.pos >> 3
        while p + 3 < len(d) + 1:
            if p + 4 <= len(d) and d[p] == 0 and d[p + 1] == 0 and d[p + 2] == 1:
                self.pos = (p + 4) * 8
                return int.from_bytes(d[p : p + 4], "big")
            p += 1
        raise ValueError("mpeg1: no further start code")


def _dc_size(v: int) -> int:
    s = 0
    a = abs(v)
    while a:
        a >>= 1
        s += 1
    return s


def _write_dc(bw: _BitWriter, diff: int, codes: dict) -> None:
    s = _dc_size(diff)
    if s > 8:
        raise ValueError("mpeg1: DC differential out of range")
    code, ln = codes[s]
    bw.write(code, ln)
    if s:
        # §2.4.3.7: negative differentials code as diff + (2^size - 1)
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _read_dc(br: _BitReader, decode: dict, peek: list | None = None) -> int:
    if peek is not None:
        ent = peek[br._peek(8)]
        if ent is not None:
            s, ln = ent
            br._skip(ln)
            if s == 0:
                return 0
            v = br.bits(s)
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1
    code, ln = 0, 0
    while ln < 9:
        code = (code << 1) | br.bits(1)
        ln += 1
        s = decode.get((ln, code))
        if s is not None:
            if s == 0:
                return 0
            v = br.bits(s)
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1
    raise ValueError("mpeg1: bad DC size code")


def _write_ac(bw: _BitWriter, zz: np.ndarray) -> None:
    """Run-level code zz[1:] (zig-zag order) + EOB. The codes are
    accumulated into one (value, nbits) pair and flushed with a single
    ``bw.write`` — identical bit stream, one writer call per block
    instead of one per coefficient (profiled r18: the per-element
    writes were ~12% of the roundtrip kernels)."""
    acc, nb = 0, 0
    run = 0
    # one C-level conversion instead of 63 numpy scalar reads
    for lv in zz[1:].tolist():
        if lv == 0:
            run += 1
            continue
        ent = AC_CODES.get((run, abs(lv)))
        if ent is not None:
            code, ln = ent
            acc = (acc << (ln + 1)) | (code << 1) | (1 if lv < 0 else 0)
            nb += ln + 1
        else:
            acc = (acc << 12) | (ESC_CODE << 6) | run
            nb += 12
            if -127 <= lv <= 127:
                acc = (acc << 8) | (lv & 0xFF)
                nb += 8
            elif 128 <= lv <= 255:
                acc = (acc << 16) | lv
                nb += 16
            elif -255 <= lv <= -128:
                acc = (acc << 16) | (0x80 << 8) | (lv + 256)
                nb += 16
            else:
                raise ValueError("mpeg1: |level| > 255 not representable")
        run = 0
    bw.write((acc << EOB_LEN) | EOB_CODE, nb + EOB_LEN)


def _ac_walk_slow(br: _BitReader, first: bool):
    """Exact per-bit dct_coeff walk — the fallback for 13-bit prefixes
    the lookahead table does not own, so error behavior on malformed
    streams (ValueError after 18 bits vs IndexError at stream end) is
    bit-for-bit the pre-table decoder's. Returns (run, level), or None
    for EOB."""
    code, ln = 0, 0
    while True:
        code = (code << 1) | br.bits(1)
        ln += 1
        if first and ln == 1 and code == 1:
            return (0, -1 if br.bits(1) else 1)
        if not first and ln == EOB_LEN and code == EOB_CODE:
            return None
        if ln == ESC_LEN and code == ESC_CODE:
            run = br.bits(6)
            v = br.bits(8)
            if v == 0x00:
                lv = br.bits(8)
            elif v == 0x80:
                lv = br.bits(8) - 256
            else:
                lv = v if v < 128 else v - 256
            return (run, lv)
        rl = _AC_DECODE.get((ln, code))
        if rl is not None:
            run, lv = rl
            if br.bits(1):
                lv = -lv
            return (run, lv)
        if ln > 17:
            raise ValueError("mpeg1: bad AC code")


def _read_ac(br: _BitReader, zz: np.ndarray) -> None:
    """Decode dct_coeff_next codes into zz[1:] until EOB (table-driven:
    one 13-bit peek per coefficient instead of a per-bit dict walk)."""
    i = 0
    tbl = _AC_PEEK
    peek = br._peek
    while True:
        ent = tbl[peek(13)]
        if ent is None:
            r = _ac_walk_slow(br, False)
            if r is None:
                return
            run, lv = r
        elif ent[0] == "eob":
            br._skip(2)
            return
        elif ent[0] == "esc":
            br._skip(6)
            run = br.bits(6)
            v = br.bits(8)
            if v == 0x00:
                lv = br.bits(8)
            elif v == 0x80:
                lv = br.bits(8) - 256
            else:
                lv = v if v < 128 else v - 256
        else:
            run, lv, ln = ent
            br._skip(ln)
            if br.bits(1):
                lv = -lv
        i += run + 1
        if i > 63:
            raise ValueError("mpeg1: AC coefficient index overflow")
        zz[i] = lv


def _fdct(block: np.ndarray) -> np.ndarray:
    return _A @ block.astype(np.float64) @ _A.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


def _qzz(q: np.ndarray, dtype) -> np.ndarray:
    """``q`` permuted into zig-zag order as ``dtype`` — memoized on the
    matrix CONTENT (tobytes), so the per-block reshape/fancy-index/cast
    runs once per distinct matrix instead of once per 8×8 block
    (profiled r18: ~10% of the roundtrip kernels). Content-keyed, not
    id-keyed: header-loaded matrices are per-stream temporaries whose
    ids recycle."""
    key = (q.tobytes(), np.dtype(dtype).char)
    v = _QZZ_CACHE.get(key)
    if v is None:
        if len(_QZZ_CACHE) >= 64:  # bound the per-worker memo
            _QZZ_CACHE.clear()
        v = q.reshape(64)[ZIGZAG].astype(dtype)
        _QZZ_CACHE[key] = v
    return v


_QZZ_CACHE: dict = {}

# inverse zig-zag permutation: raster position i holds zz index
# _ZZ_INV[i], so the de-zigzag scatter (zeros + out[ZIGZAG] = rec)
# becomes a single gather rec[_ZZ_INV] — same values, one allocation
_ZZ_INV = np.argsort(ZIGZAG)


def _qzz_prod(q: np.ndarray, qscale: int) -> tuple:
    """``(qscale * qzz_float, qscale * qzz_int, 2 * qscale * qzz_int)``
    memoized per (matrix content, qscale) — the quant/dequant helpers
    previously rebuilt these products per 8×8 BLOCK (two array
    multiplies each); qscale is constant per picture, so the products
    are as cacheable as the zig-zag permutation itself. Exact: integer
    products are associativity-free and the float divisor
    ``qscale * qzz`` is the identical value whether formed per block
    or once."""
    key = (q.tobytes(), int(qscale))
    v = _QZZ_PROD_CACHE.get(key)
    if v is None:
        if len(_QZZ_PROD_CACHE) >= 64:  # bound the per-worker memo
            _QZZ_PROD_CACHE.clear()
        qzz_f = _qzz(q, np.float64)
        qzz_i = _qzz(q, np.int64)
        v = (qscale * qzz_f, qscale * qzz_i, 2 * qscale * qzz_i)
        _QZZ_PROD_CACHE[key] = v
    return v


_QZZ_PROD_CACHE: dict = {}


def _quant_intra(coef: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """Encoder-side intra quantization matched to the §2.4.4.1 recon
    dct_recon = (2 * level * qscale * Q) // 16: level = round(8 * c /
    (qscale * Q)), saturated to the ±255 syntax limit."""
    zz = coef.reshape(64)[ZIGZAG]
    sqf, _, _ = _qzz_prod(q, qscale)
    lv = np.rint(8.0 * zz / sqf).astype(np.int64)
    lv[0] = int(np.rint(zz[0] / 8.0))  # DC: recon = 8 * level
    np.minimum(lv[1:], 255, out=lv[1:])
    np.maximum(lv[1:], -255, out=lv[1:])
    lv[0] = min(max(lv[0], 0), 255)
    return lv


def _dequant_intra(zz: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """§2.4.4.1 reconstruction: truncating integer division, odd-
    ification mismatch control, [-2048, 2047] saturation; DC is
    8 * dct_zz[0] with no mismatch control."""
    _, _, m2 = _qzz_prod(q, qscale)
    num = zz.astype(np.int64) * m2
    rec = np.sign(num) * (np.abs(num) // 16)  # truncate toward zero
    even = (rec != 0) & ((rec & 1) == 0)
    rec[even] -= np.sign(rec[even])
    rec[0] = zz[0] * 8
    np.minimum(rec, 2047, out=rec)
    np.maximum(rec, -2048, out=rec)
    return rec[_ZZ_INV].astype(np.float64).reshape(8, 8)


def _blocks_8x8(planes: np.ndarray) -> np.ndarray:
    """``(..., H, W)`` → ``(..., H//8, W//8, 8, 8)``: the raster 8×8
    block grid as one stacked view (no copy) — block ``[r, c]`` is
    ``plane[r*8:(r+1)*8, c*8:(c+1)*8]``."""
    *lead, hh, ww = planes.shape
    return planes.reshape(*lead, hh // 8, 8, ww // 8, 8).swapaxes(-3, -2)


def _fdct_batch(blocks: np.ndarray) -> np.ndarray:
    """``_fdct`` over a ``(..., 8, 8)`` stack in ONE broadcast matmul
    pair. numpy's stacked matmul runs the same dgemm per 8×8 slice as
    the scalar helper, so coefficients are bit-identical (pinned by the
    stream-equality tests)."""
    return _A @ blocks @ _A.T


def _idct_batch(coefs: np.ndarray) -> np.ndarray:
    return _A.T @ coefs @ _A


def _quant_intra_batch(coefs: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """``_quant_intra`` over a ``(n, 8, 8)`` coefficient stack →
    ``(n, 64)`` levels: the identical elementwise ops, dispatched once
    per picture instead of once per block."""
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    sqf, _, _ = _qzz_prod(q, qscale)
    lv = np.rint(8.0 * zz / sqf).astype(np.int64)
    dc = np.rint(zz[:, 0] / 8.0).astype(np.int64)
    np.minimum(lv, 255, out=lv)
    np.maximum(lv, -255, out=lv)
    np.minimum(dc, 255, out=dc)
    np.maximum(dc, 0, out=dc)
    lv[:, 0] = dc
    return lv


def _dequant_intra_batch(zzs: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """``_dequant_intra`` over ``(n, 64)`` levels → ``(n, 8, 8)``."""
    _, _, m2 = _qzz_prod(q, qscale)
    num = zzs.astype(np.int64) * m2
    rec = np.sign(num) * (np.abs(num) // 16)
    even = (rec != 0) & ((rec & 1) == 0)
    rec[even] -= np.sign(rec[even])
    rec[:, 0] = zzs[:, 0] * 8
    np.minimum(rec, 2047, out=rec)
    np.maximum(rec, -2048, out=rec)
    return rec[:, _ZZ_INV].astype(np.float64).reshape(-1, 8, 8)


def _quant_non_intra_batch(
    coefs: np.ndarray, q: np.ndarray, qscale: int
) -> np.ndarray:
    """``_quant_non_intra`` over ``(n, 8, 8)`` → ``(n, 64)``."""
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    sqf, _, _ = _qzz_prod(q, qscale)
    lv = np.fix(8.0 * zz / sqf).astype(np.int64)
    np.minimum(lv, 255, out=lv)
    np.maximum(lv, -255, out=lv)
    return lv


def _dequant_non_intra_batch(
    zzs: np.ndarray, q: np.ndarray, qscale: int
) -> np.ndarray:
    """``_dequant_non_intra`` over ``(n, 64)`` → ``(n, 8, 8)``."""
    _, m1, _ = _qzz_prod(q, qscale)
    z = zzs.astype(np.int64)
    num = (2 * z + np.sign(z)) * m1
    rec = np.sign(num) * (np.abs(num) // 16)
    even = (rec != 0) & ((rec & 1) == 0)
    rec[even] -= np.sign(rec[even])
    np.minimum(rec, 2047, out=rec)
    np.maximum(rec, -2048, out=rec)
    return rec[:, _ZZ_INV].astype(np.float64).reshape(-1, 8, 8)


def _mb_from_blocks(blocks: np.ndarray) -> np.ndarray:
    """``(n, 4, 8, 8)`` per-macroblock luma blocks (by-major: (0,0),
    (0,1), (1,0), (1,1)) → ``(n, 16, 16)`` assembled macroblocks."""
    n = blocks.shape[0]
    return (
        blocks.reshape(n, 2, 2, 8, 8).swapaxes(2, 3).reshape(n, 16, 16)
    )


_PIC_RATE_CODE = 0b0101  # 30 fps (table 2-D.1); informational here


def encode_mpeg1_intra(
    frames: list[np.ndarray],
    qscale: int = 1,
    intra_quant: np.ndarray | None = None,
) -> bytes:
    """Encode grayscale uint8 frames as an I-frame-only MPEG-1 video
    elementary stream (sequence header [+ custom intra matrix] + GOP +
    one I picture per frame + sequence_end_code). One slice per
    macroblock row; frames pad edge-replicated to 16-pixel multiples;
    Cb/Cr are flat 128 (see :func:`encode_mpeg1_intra_color` for real
    4:2:0 chroma)."""
    if not frames:
        raise ValueError("encode_mpeg1_intra needs at least one frame")
    h, w = frames[0].shape
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    flat = np.full((mb_h * 8, mb_w * 8), 128.0)
    planes = []
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        ypad = np.pad(
            f.astype(np.float64),
            ((0, mb_h * 16 - h), (0, mb_w * 16 - w)),
            mode="edge",
        )
        planes.append((ypad, flat, flat))
    return _encode_intra_planes(planes, w, h, qscale, intra_quant)


def encode_mpeg1_intra_color(
    frames_rgb: list[np.ndarray],
    qscale: int = 1,
    intra_quant: np.ndarray | None = None,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an I-frame-only MPEG-1
    stream with REAL 4:2:0 chroma: JFIF-matrix RGB→YCbCr (shared with
    the JPEG stack), 2x2 box-averaged chroma downsample on the padded
    planes, and genuinely-coded Cb/Cr blocks (DC DPCM chains + AC
    run-level codes carry real coefficients, not the gray path's flat
    stubs)."""
    from jagular_spark.operators.jpeg import rgb_to_ycbcr

    if not frames_rgb:
        raise ValueError("encode_mpeg1_intra_color needs at least one frame")
    h, w = frames_rgb[0].shape[:2]
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    ph, pw = mb_h * 16, mb_w * 16
    planes = []
    for f in frames_rgb:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one (h, w, 3) shape")
        y, cb, cr = rgb_to_ycbcr(np.asarray(f, dtype=np.uint8))
        pad = lambda p: np.pad(  # noqa: E731
            p.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"
        )
        down = lambda p: np.rint(  # noqa: E731
            pad(p).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        )
        planes.append((pad(y), down(cb), down(cr)))
    return _encode_intra_planes(planes, w, h, qscale, intra_quant)


def _encode_intra_planes(
    planes: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    w: int,
    h: int,
    qscale: int,
    intra_quant: np.ndarray | None,
) -> bytes:
    """Shared syntax writer: each frame is (ypad, cbpad, crpad) with Y
    padded to the 16-grid and chroma to the 8-grid."""
    if not 1 <= qscale <= 31:
        raise ValueError("qscale must be in 1..31")
    q = DEFAULT_INTRA_QUANT if intra_quant is None else np.asarray(
        intra_quant, dtype=np.int64
    ).reshape(64)
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    bw = _BitWriter()
    # sequence header
    bw.start_code(SEQ_START)
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(0b0001, 4)  # pel aspect 1:1
    bw.write(_PIC_RATE_CODE, 4)
    bw.write(0x3FFFF, 18)  # bit_rate: variable
    bw.write(1, 1)  # marker
    bw.write(0, 10)  # vbv_buffer_size
    bw.write(0, 1)  # constrained_parameters_flag
    if intra_quant is None:
        bw.write(0, 1)  # load_intra_quantizer_matrix
    else:
        bw.write(1, 1)
        for v in q.reshape(64)[ZIGZAG]:  # matrix ships in zig-zag order
            bw.write(int(v), 8)
    bw.write(0, 1)  # load_non_intra_quantizer_matrix
    # one GOP
    bw.start_code(GOP_START)
    bw.write(0, 25)  # time_code
    bw.write(1, 1)  # closed_gop
    bw.write(0, 1)  # broken_link
    # Batch the WHOLE SEQUENCE's transforms up front: every intra
    # block's fdct+quant is independent (the DC DPCM chain is
    # wire-format only), so the per-block numpy dispatch collapses to
    # three stacked matmul/quant passes. Levels are bit-identical to
    # the per-block path (same dgemm per 8×8 slice, same elementwise
    # quant ops); only the entropy writes below stay sequential.
    nf = len(planes)
    zz_y = _quant_intra_batch(
        _fdct_batch(_blocks_8x8(np.stack([p[0] for p in planes]))),
        q,
        qscale,
    ).reshape(nf, mb_h * 2, mb_w * 2, 64)
    zz_cb = _quant_intra_batch(
        _fdct_batch(_blocks_8x8(np.stack([p[1] for p in planes]))),
        q,
        qscale,
    ).reshape(nf, mb_h, mb_w, 64)
    zz_cr = _quant_intra_batch(
        _fdct_batch(_blocks_8x8(np.stack([p[2] for p in planes]))),
        q,
        qscale,
    ).reshape(nf, mb_h, mb_w, 64)
    for t in range(nf):
        bw.start_code(PIC_START)
        bw.write(t, 10)  # temporal_reference
        bw.write(1, 3)  # picture_coding_type: I
        bw.write(0xFFFF, 16)  # vbv_delay
        bw.write(0, 1)  # extra_bit_picture
        for row in range(mb_h):
            bw.start_code(0x00000100 + row + 1)  # slice start (1-based)
            bw.write(qscale, 5)
            bw.write(0, 1)  # extra_bit_slice
            dc_y = dc_cb = dc_cr = 128  # predictors reset: 1024 / 8
            for col in range(mb_w):
                bw.write(1, 1)  # macroblock_address_increment = 1
                bw.write(1, 1)  # macroblock_type: intra
                for by in range(2):
                    for bx in range(2):
                        zz = zz_y[t, row * 2 + by, col * 2 + bx]
                        _write_dc(bw, int(zz[0]) - dc_y, DC_LUM_CODES)
                        dc_y = int(zz[0])
                        _write_ac(bw, zz)
                for zz, pred in (
                    (zz_cb[t, row, col], "cb"),
                    (zz_cr[t, row, col], "cr"),
                ):
                    prev = dc_cb if pred == "cb" else dc_cr
                    _write_dc(bw, int(zz[0]) - prev, DC_CHROM_CODES)
                    if pred == "cb":
                        dc_cb = int(zz[0])
                    else:
                        dc_cr = int(zz[0])
                    _write_ac(bw, zz)
    bw.start_code(SEQ_END)
    return bw.bytes()


def intra_expected_reconstruction(
    frames: list[np.ndarray],
    qscale: int = 1,
    intra_quant: np.ndarray | None = None,
) -> list[np.ndarray]:
    """Encoder-internal reconstruction: the exact uint8 Y frames a
    conformant decoder must produce for
    ``decode_mpeg1_intra(encode_mpeg1_intra(frames, qscale, matrix))``.

    Runs the identical per-block pipeline the codec uses — edge-pad to
    the 16 grid, float DCT, §2.4.4.1 quant/dequant (truncating
    division + odd-ification), float IDCT, crop, round, clip — through
    the SAME functions, so equality is bit-exact, not approximate.
    Block levels are per-block independent (the DC DPCM is wire-format
    only and the VLCs are lossless), which is what makes this a
    provable invariant rather than an empirical error bound; the test
    suite pins decode == this, mirroring the audio-codec discipline
    (``audio_codecs.py`` pins decode == encoder-internal
    reconstruction bit-exactly)."""
    q = DEFAULT_INTRA_QUANT if intra_quant is None else np.asarray(
        intra_quant, dtype=np.int64
    ).reshape(64)
    if not frames:
        raise ValueError("intra_expected_reconstruction needs at least one frame")
    h, w = frames[0].shape
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    out = []
    ph, pw = mb_h * 16, mb_w * 16
    for f in frames:
        ypad = np.pad(
            f.astype(np.float64),
            ((0, ph - h), (0, pw - w)),
            mode="edge",
        )
        # whole-frame batch: same per-block arithmetic, one dispatch
        zz = _quant_intra_batch(_fdct_batch(_blocks_8x8(ypad)), q, qscale)
        rec = (
            _idct_batch(_dequant_intra_batch(zz, q, qscale))
            .reshape(mb_h * 2, mb_w * 2, 8, 8)
            .swapaxes(1, 2)
            .reshape(ph, pw)
        )
        out.append(np.clip(np.rint(rec[:h, :w]), 0, 255).astype(np.uint8))
    return out


def decode_mpeg1_intra(data: bytes):
    """Decode an I-frame-only MPEG-1 video elementary stream produced
    by any conformant intra encoder (this module's, in tests). Returns
    ``(frames, width, height)`` — frames are uint8 (height, width) Y
    planes (chroma is decoded but not returned; use
    :func:`decode_mpeg1_intra_color` for the full 4:2:0 planes)."""
    planes, w, h = decode_mpeg1_intra_color(data)
    return [y for y, _cb, _cr in planes], w, h


def decode_mpeg1_intra_color(data: bytes):
    """Full-plane decode: returns ``(frames, width, height)`` where
    each frame is ``(y, cb, cr)`` — y uint8 (h, w); cb/cr uint8 at the
    4:2:0 half resolution, cropped to (ceil(h/2), ceil(w/2)) from the
    macroblock grid the same way Y crops to (h, w). Despite the
    historical name this is the GENERAL decoder — it decodes I, P AND
    (since r13) B pictures: bidirectionally-predicted macroblocks
    resolve against both anchors per §2.4.4.3, the stream is consumed
    in decoding (transmission) order, and frames are returned in
    DISPLAY order via the temporal_reference reorder."""
    br = _BitReader(data)
    code = br.next_start_code()
    if code != SEQ_START:
        raise ValueError("mpeg1: missing sequence header")
    w = br.bits(12)
    h = br.bits(12)
    br.bits(4)  # pel aspect
    br.bits(4)  # picture rate
    br.bits(18)  # bit rate
    if br.bits(1) != 1:
        raise ValueError("mpeg1: sequence header marker bit")
    br.bits(10)  # vbv
    br.bits(1)  # constrained
    q = DEFAULT_INTRA_QUANT
    if br.bits(1):  # load_intra_quantizer_matrix
        vals = np.array([br.bits(8) for _ in range(64)], dtype=np.int64)
        nat = np.zeros(64, dtype=np.int64)
        nat[ZIGZAG] = vals
        q = nat
    qn = DEFAULT_NON_INTRA_QUANT
    if br.bits(1):  # load_non_intra_quantizer_matrix
        vals = np.array([br.bits(8) for _ in range(64)], dtype=np.int64)
        nat = np.zeros(64, dtype=np.int64)
        nat[ZIGZAG] = vals
        qn = nat
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    ph, pw = mb_h * 16, mb_w * 16
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    # Anchor reference planes (int64): ref_* = the NEWEST decoded
    # anchor (a P picture's forward reference, a B picture's BACKWARD
    # reference); old_* = the anchor before it (a B's forward
    # reference). pending_out holds the newest anchor's output frame
    # until the next anchor (or sequence end) supersedes it — the
    # standard display reorder: B pictures are emitted immediately
    # (they sit between the two anchors already decoded), anchors are
    # emitted when the next anchor arrives.
    ref_y = ref_cb = ref_cr = None
    old_y = old_cb = old_cr = None
    pending_out = None
    code = br.next_start_code()
    while code != SEQ_END:
        if code == GOP_START:
            br.bits(27)  # time_code + closed + broken
            code = br.next_start_code()
            continue
        if code != PIC_START:
            raise ValueError(f"mpeg1: unexpected start code {code:#010x}")
        br.bits(10)  # temporal_reference
        ptype = br.bits(3)
        if ptype not in (1, 2, 3):
            raise ValueError("mpeg1: only I/P/B picture types supported")
        br.bits(16)  # vbv_delay
        full_pel, f = 1, 1
        full_pel_b, fb = 1, 1
        if ptype in (2, 3) and ref_y is None:
            raise ValueError("mpeg1: predicted picture with no reference")
        if ptype == 3 and old_y is None:
            raise ValueError("mpeg1: B picture needs two decoded anchors")
        if ptype in (2, 3):
            full_pel = br.bits(1)
            f = br.bits(3)
            if f == 0:
                raise ValueError("mpeg1: forward_f_code 0 is forbidden")
        if ptype == 3:
            full_pel_b = br.bits(1)
            fb = br.bits(3)
            if fb == 0:
                raise ValueError("mpeg1: backward_f_code 0 is forbidden")
        if br.bits(1):
            raise ValueError("mpeg1: extra_bit_picture payload unsupported")
        plane = np.zeros((ph, pw), dtype=np.float64)
        cbp_pl = np.zeros((ph // 2, pw // 2), dtype=np.float64)
        crp = np.zeros((ph // 2, pw // 2), dtype=np.float64)
        tgts = (plane, cbp_pl, crp)
        # Deferred per-picture transform batches: the slice loop below
        # only parses coefficients; dequant+idct run ONCE per picture
        # over the stacked blocks instead of per block (nothing inside
        # a picture reads its own reconstruction — MPEG-1 predicts only
        # from previous anchors — so deferral is value-identical).
        # Entries: (qscale, tgt index, y0, x0, zz).
        intra_jobs: list = []
        resid_jobs: list = []
        clip_regions: list = []  # (tgt, y0, x0, size) — coded inter MBs

        def copy_mb(row, col):
            plane[row * 16 : row * 16 + 16, col * 16 : col * 16 + 16] = ref_y[
                row * 16 : row * 16 + 16, col * 16 : col * 16 + 16
            ]
            cbp_pl[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = ref_cb[
                row * 8 : row * 8 + 8, col * 8 : col * 8 + 8
            ]
            crp[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = ref_cr[
                row * 8 : row * 8 + 8, col * 8 : col * 8 + 8
            ]

        def mc_planes(mvy, mvx, fp, y_ref, cb_ref, cr_ref, row, col):
            """One direction's (pred_y, pred_cb, pred_cr): full_pel
            doubling to half-pel units, chroma vector = luma / 2
            truncating toward zero (§2.4.4.2)."""
            hvy = mvy << 1 if fp else mvy
            hvx = mvx << 1 if fp else mvx
            cvy = int(hvy / 2)
            cvx = int(hvx / 2)
            return (
                _mc_block(y_ref, row * 16, col * 16, hvy, hvx, 16),
                _mc_block(cb_ref, row * 8, col * 8, cvy, cvx, 8),
                _mc_block(cr_ref, row * 8, col * 8, cvy, cvx, 8),
            )

        def b_predict(row, col, use_f, use_b, fmv, bmv):
            """B-picture prediction at (row, col) from the given
            vectors — forward from the old anchor, backward from the
            new one, both averaged with the §2.4.4.4 rounding
            ((f + b + 1) >> 1) when interpolated. Also reconstructs
            skipped B macroblocks, which reuse the previous
            macroblock's direction flags and vectors (§2.4.4.3)."""
            pf = (
                mc_planes(fmv[0], fmv[1], full_pel, old_y, old_cb, old_cr, row, col)
                if use_f
                else None
            )
            pb = (
                mc_planes(bmv[0], bmv[1], full_pel_b, ref_y, ref_cb, ref_cr, row, col)
                if use_b
                else None
            )
            if pf is not None and pb is not None:
                return tuple((a + b + 1) >> 1 for a, b in zip(pf, pb))
            return pf if pf is not None else pb

        def read_addr_inc():
            inc = 0
            while True:
                ent = _MB_ADDR_PEEK[br._peek(11)]
                if ent is None:
                    # exact per-bit fallback: invalid 11-bit prefix —
                    # reproduce the pre-table walk's error behavior
                    code, ln = 0, 0
                    while ln < 11:
                        code = (code << 1) | br.bits(1)
                        ln += 1
                        if (ln, code) == (MB_STUFFING[1], MB_STUFFING[0]):
                            code, ln = 0, 0
                            continue
                        if (ln, code) == (MB_ADDR_ESC[1], MB_ADDR_ESC[0]):
                            inc += 33
                            code, ln = 0, 0
                            continue
                        v = _MB_ADDR_DECODE.get((ln, code))
                        if v is not None:
                            return inc + v
                    raise ValueError(
                        "mpeg1: bad macroblock_address_increment"
                    )
                v, ln = ent
                br._skip(ln)
                if v == "stuff":
                    continue
                if v == "esc":
                    inc += 33
                    continue
                return inc + v

        code = br.next_start_code()
        while 0x00000101 <= code <= 0x000001AF:
            row = (code & 0xFF) - 1
            qscale = br.bits(5)
            while br.bits(1):  # extra_information_slice
                br.bits(8)
            dc_y = dc_cb = dc_cr = 128
            pmv = (0, 0)
            fpmv = (0, 0)
            bpmv = (0, 0)
            prev_flags = None  # previous B MB's (use_f, use_b) for skips
            col = -1
            while col < mb_w - 1:
                inc = read_addr_inc()
                for _ in range(inc - 1):  # skipped MBs (P/B only)
                    if ptype == 1:
                        raise ValueError("mpeg1: skipped MB in I picture")
                    col += 1
                    if ptype == 2:
                        copy_mb(row, col)
                        pmv = (0, 0)
                    else:
                        # §2.4.4.3: a skipped B MB repeats the previous
                        # MB's prediction (flags + vectors); predictors
                        # are left UNCHANGED (unlike P's reset)
                        if prev_flags in (None, "intra"):
                            raise ValueError(
                                "mpeg1: skipped B macroblock without a "
                                "non-intra predecessor"
                            )
                        py, pcb, pcr = b_predict(
                            row, col, prev_flags[0], prev_flags[1], fpmv, bpmv
                        )
                        plane[
                            row * 16 : row * 16 + 16, col * 16 : col * 16 + 16
                        ] = py
                        cbp_pl[
                            row * 8 : row * 8 + 8, col * 8 : col * 8 + 8
                        ] = pcb
                        crp[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = pcr
                    dc_y = dc_cb = dc_cr = 128
                col += 1
                # macroblock_type
                if ptype == 1:
                    if br.bits(1) == 1:
                        mtype = "intra"
                    elif br.bits(1) == 1:
                        mtype = "intra_q"
                    else:
                        raise ValueError("mpeg1: bad I-picture MB type")
                elif ptype == 2:
                    mtype = _read_vlc(br, _MB_P_DECODE, "P macroblock_type", 6, _MB_P_PEEK)
                else:
                    mtype = _read_vlc(br, _MB_B_DECODE, "B macroblock_type", 6, _MB_B_PEEK)
                if mtype.endswith("_q"):
                    qscale = br.bits(5)
                    mtype = mtype[:-2]
                intra = mtype == "intra"
                has_mv = mtype in ("mc", "mc_coded")
                coded = mtype in ("coded", "mc_coded") or mtype.endswith("_coded")
                if intra:
                    pmv = (0, 0)
                    fpmv = (0, 0)  # §2.4.4.3: intra resets both B predictors
                    bpmv = (0, 0)
                    prev_flags = "intra"
                    for by in range(2):
                        for bx in range(2):
                            zz = np.zeros(64, dtype=np.int64)
                            dc_y += _read_dc(br, _DC_LUM_DECODE, _DC_LUM_PEEK)
                            zz[0] = dc_y
                            _read_ac(br, zz)
                            intra_jobs.append(
                                (
                                    qscale,
                                    0,
                                    row * 16 + by * 8,
                                    col * 16 + bx * 8,
                                    zz,
                                )
                            )
                    for pred in ("cb", "cr"):
                        zz = np.zeros(64, dtype=np.int64)
                        d = _read_dc(br, _DC_CHROM_DECODE, _DC_CHROM_PEEK)
                        if pred == "cb":
                            dc_cb += d
                            zz[0] = dc_cb
                            ti = 1
                        else:
                            dc_cr += d
                            zz[0] = dc_cr
                            ti = 2
                        _read_ac(br, zz)
                        intra_jobs.append(
                            (qscale, ti, row * 8, col * 8, zz)
                        )
                    continue
                # non-intra (P/B): prediction + optional residual
                dc_y = dc_cb = dc_cr = 128
                if ptype == 2:
                    if has_mv:
                        mvx = _fold_mv(pmv[1] + _read_mv(br, f), f)
                        mvy = _fold_mv(pmv[0] + _read_mv(br, f), f)
                        pmv = (mvy, mvx)
                    else:
                        mvy = mvx = 0
                        pmv = (0, 0)  # no-vector P MB resets the predictor
                    pred_y, pred_cb, pred_cr = mc_planes(
                        mvy, mvx, full_pel, ref_y, ref_cb, ref_cr, row, col
                    )
                else:  # B: per-direction vectors against separate predictors
                    bmode = mtype[:-6] if mtype.endswith("_coded") else mtype
                    use_f = bmode in ("fwd", "interp")
                    use_b = bmode in ("bwd", "interp")
                    if use_f:
                        fmvx = _fold_mv(fpmv[1] + _read_mv(br, f), f)
                        fmvy = _fold_mv(fpmv[0] + _read_mv(br, f), f)
                        fpmv = (fmvy, fmvx)
                    if use_b:
                        bmvx = _fold_mv(bpmv[1] + _read_mv(br, fb), fb)
                        bmvy = _fold_mv(bpmv[0] + _read_mv(br, fb), fb)
                        bpmv = (bmvy, bmvx)
                    prev_flags = (use_f, use_b)
                    pred_y, pred_cb, pred_cr = b_predict(
                        row, col, use_f, use_b, fpmv, bpmv
                    )
                cbp = (
                    _read_vlc(br, _CBP_DECODE, "coded_block_pattern", 9, _CBP_PEEK)
                    if coded
                    else 0
                )
                plane[
                    row * 16 : row * 16 + 16, col * 16 : col * 16 + 16
                ] = pred_y
                for b in range(4):
                    if cbp & (32 >> b):
                        zz = np.zeros(64, dtype=np.int64)
                        _read_ac_nonintra(br, zz)
                        by, bx = divmod(b, 2)
                        resid_jobs.append(
                            (
                                qscale,
                                0,
                                row * 16 + by * 8,
                                col * 16 + bx * 8,
                                zz,
                            )
                        )
                if cbp & 60:
                    clip_regions.append((0, row * 16, col * 16, 16))
                for bit, pred_c, ti in ((2, pred_cb, 1), (1, pred_cr, 2)):
                    tgts[ti][
                        row * 8 : row * 8 + 8, col * 8 : col * 8 + 8
                    ] = pred_c
                    if cbp & bit:
                        zz = np.zeros(64, dtype=np.int64)
                        _read_ac_nonintra(br, zz)
                        resid_jobs.append((qscale, ti, row * 8, col * 8, zz))
                        clip_regions.append((ti, row * 8, col * 8, 8))
            code = br.next_start_code()
        # flush the deferred transforms: one batched dequant+idct per
        # (kind, qscale) group, then the per-MB clips the scalar path
        # applied (uncoded inter MBs skip the clip — their prediction
        # is already in [0, 255], so the scalar clip was a no-op)
        for jobs, mat, deq in (
            (intra_jobs, q, _dequant_intra_batch),
            (resid_jobs, qn, _dequant_non_intra_batch),
        ):
            if not jobs:
                continue
            add = deq is _dequant_non_intra_batch
            by_qs: dict = {}
            for job in jobs:
                by_qs.setdefault(job[0], []).append(job)
            for qs, grp in by_qs.items():
                recs = _idct_batch(
                    deq(np.stack([g[4] for g in grp]), mat, qs)
                )
                if add:
                    for (_qs, ti, y0, x0, _zz), r in zip(grp, recs):
                        tgts[ti][y0 : y0 + 8, x0 : x0 + 8] += r
                else:
                    for (_qs, ti, y0, x0, _zz), r in zip(grp, recs):
                        tgts[ti][y0 : y0 + 8, x0 : x0 + 8] = r
        for ti, y0, x0, sz in clip_regions:
            reg = tgts[ti][y0 : y0 + sz, x0 : x0 + sz]
            np.clip(reg, 0, 255, out=reg)
        to8 = lambda p, hh, ww: np.clip(  # noqa: E731
            np.rint(p[:hh, :ww]), 0, 255
        ).astype(np.uint8)
        ch, cw = (h + 1) // 2, (w + 1) // 2
        out = (to8(plane, h, w), to8(cbp_pl, ch, cw), to8(crp, ch, cw))
        if ptype == 3:
            # B pictures sit between the two anchors already decoded —
            # output immediately; they are never references
            frames.append(out)
        else:
            # display reorder: the previous anchor becomes displayable
            # when the next anchor arrives
            if pending_out is not None:
                frames.append(pending_out)
            old_y, old_cb, old_cr = ref_y, ref_cb, ref_cr
            ref_y = np.clip(np.rint(plane), 0, 255).astype(np.int64)
            ref_cb = np.clip(np.rint(cbp_pl), 0, 255).astype(np.int64)
            ref_cr = np.clip(np.rint(crp), 0, 255).astype(np.int64)
            pending_out = out
    if pending_out is not None:
        frames.append(pending_out)
    return frames, w, h


def decode_mpeg1_video(data: bytes):
    """Grayscale view of the general decoder: ``(frames, width,
    height)`` with uint8 Y planes, for streams of I and P pictures."""
    planes, w, h = decode_mpeg1_intra_color(data)
    return [y for y, _cb, _cr in planes], w, h



# ---------------------------------------------------------------------------
# P pictures (forward prediction) — ISO 11172-2 §2.4.3.4/§2.4.4.2-3
# ---------------------------------------------------------------------------

# Default non-intra quantizer matrix (§2.4.2.3): flat 16.
DEFAULT_NON_INTRA_QUANT = np.full(64, 16, dtype=np.int64)

# macroblock_address_increment VLCs (table B.1); ESCAPE adds 33 and
# may repeat. Values 1..33.
MB_ADDR_INC_CODES: dict[int, tuple[int, int]] = {
    1: (0b1, 1), 2: (0b011, 3), 3: (0b010, 3), 4: (0b0011, 4),
    5: (0b0010, 4), 6: (0b00011, 5), 7: (0b00010, 5),
    8: (0b0000111, 7), 9: (0b0000110, 7), 10: (0b00001011, 8),
    11: (0b00001010, 8), 12: (0b00001001, 8), 13: (0b00001000, 8),
    14: (0b00000111, 8), 15: (0b00000110, 8), 16: (0b0000010111, 10),
    17: (0b0000010110, 10), 18: (0b0000010101, 10),
    19: (0b0000010100, 10), 20: (0b0000010011, 10),
    21: (0b0000010010, 10), 22: (0b00000100011, 11),
    23: (0b00000100010, 11), 24: (0b00000100001, 11),
    25: (0b00000100000, 11), 26: (0b00000011111, 11),
    27: (0b00000011110, 11), 28: (0b00000011101, 11),
    29: (0b00000011100, 11), 30: (0b00000011011, 11),
    31: (0b00000011010, 11), 32: (0b00000011001, 11),
    33: (0b00000011000, 11),
}
MB_ADDR_ESC = (0b00000001000, 11)  # macroblock_escape
MB_STUFFING = (0b00000001111, 11)

# P-picture macroblock_type VLCs (table B.2b). Flags per entry:
# (quant, motion_forward, coded).
MB_P_CODES: dict[str, tuple[int, int]] = {
    "mc_coded": (0b1, 1),          # MF + CBP
    "coded": (0b01, 2),            # CBP only (vector = 0)
    "mc": (0b001, 3),              # MF only (no coefficients)
    "intra": (0b00011, 5),
    "mc_coded_q": (0b00010, 5),    # + quantizer_scale
    "coded_q": (0b00001, 5),
    "intra_q": (0b000001, 6),
}

# B-picture macroblock_type VLCs (table B.2c). Mode name encodes the
# flag triple (motion_forward, motion_backward, coded); "_q" variants
# additionally carry a new quantizer_scale. B pictures have no
# "coded, no vector" type — every non-intra B macroblock carries at
# least one direction flag (skipped MBs REUSE the previous
# macroblock's direction and vectors, unlike P's reset-to-zero skip).
MB_B_CODES: dict[str, tuple[int, int]] = {
    "interp": (0b10, 2),           # MF + MB, no coefficients
    "interp_coded": (0b11, 2),     # MF + MB + CBP
    "bwd": (0b010, 3),             # MB only
    "bwd_coded": (0b011, 3),       # MB + CBP
    "fwd": (0b0010, 4),            # MF only
    "fwd_coded": (0b0011, 4),      # MF + CBP
    "intra": (0b00011, 5),
    "interp_coded_q": (0b00010, 5),
    "fwd_coded_q": (0b000011, 6),
    "bwd_coded_q": (0b000010, 6),
    "intra_q": (0b000001, 6),
}

# coded_block_pattern VLCs (table B.3), cbp value 1..63; bit 32 = Y0,
# 16 = Y1, 8 = Y2, 4 = Y3, 2 = Cb, 1 = Cr.
CBP_CODES: dict[int, tuple[int, int]] = {
    60: (0b111, 3), 4: (0b1101, 4), 8: (0b1100, 4), 16: (0b1011, 4),
    32: (0b1010, 4), 12: (0b10011, 5), 48: (0b10010, 5),
    20: (0b10001, 5), 40: (0b10000, 5), 28: (0b01111, 5),
    44: (0b01110, 5), 52: (0b01101, 5), 56: (0b01100, 5),
    1: (0b01011, 5), 61: (0b01010, 5), 2: (0b01001, 5),
    62: (0b01000, 5), 24: (0b001111, 6), 36: (0b001110, 6),
    3: (0b001101, 6), 63: (0b001100, 6), 5: (0b0010111, 7),
    9: (0b0010110, 7), 17: (0b0010101, 7), 33: (0b0010100, 7),
    6: (0b0010011, 7), 10: (0b0010010, 7), 18: (0b0010001, 7),
    34: (0b0010000, 7), 7: (0b00011111, 8), 11: (0b00011110, 8),
    19: (0b00011101, 8), 35: (0b00011100, 8), 13: (0b00011011, 8),
    49: (0b00011010, 8), 21: (0b00011001, 8), 41: (0b00011000, 8),
    14: (0b00010111, 8), 50: (0b00010110, 8), 22: (0b00010101, 8),
    42: (0b00010100, 8), 15: (0b00010011, 8), 51: (0b00010010, 8),
    23: (0b00010001, 8), 43: (0b00010000, 8), 25: (0b00001111, 8),
    37: (0b00001110, 8), 26: (0b00001101, 8), 38: (0b00001100, 8),
    29: (0b00001011, 8), 45: (0b00001010, 8), 53: (0b00001001, 8),
    57: (0b00001000, 8), 30: (0b00000111, 8), 46: (0b00000110, 8),
    54: (0b00000101, 8), 58: (0b00000100, 8), 31: (0b000000111, 9),
    47: (0b000000110, 9), 55: (0b000000101, 9), 59: (0b000000100, 9),
    27: (0b000000011, 9), 39: (0b000000010, 9),
}

# motion_code VLCs (table B.4) for |code| 0..16; a sign bit follows
# nonzero codes.
MV_CODES: dict[int, tuple[int, int]] = {
    0: (0b1, 1), 1: (0b01, 2), 2: (0b001, 3), 3: (0b0001, 4),
    4: (0b000011, 6), 5: (0b0000101, 7), 6: (0b0000100, 7),
    7: (0b0000011, 7), 8: (0b000001011, 9), 9: (0b000001010, 9),
    10: (0b000001001, 9), 11: (0b0000010001, 10),
    12: (0b0000010000, 10), 13: (0b0000001111, 10),
    14: (0b0000001110, 10), 15: (0b0000001101, 10),
    16: (0b0000001100, 10),
}

_MB_ADDR_DECODE = {(ln, c): v for v, (c, ln) in MB_ADDR_INC_CODES.items()}
_MB_P_DECODE = {(ln, c): k for k, (c, ln) in MB_P_CODES.items()}
_MB_B_DECODE = {(ln, c): k for k, (c, ln) in MB_B_CODES.items()}
_CBP_DECODE = {(ln, c): v for v, (c, ln) in CBP_CODES.items()}
_MV_DECODE = {(ln, c): v for v, (c, ln) in MV_CODES.items()}

# lookahead tables (see _peek_table): (table, width) pairs sized to
# each family's longest code; macroblock_address_increment additionally
# carries the stuffing/escape markers as tagged sentinels so the hot
# loop stays a single peek per symbol.
_MB_P_PEEK = (_peek_table(_MB_P_DECODE, 6), 6)
_MB_B_PEEK = (_peek_table(_MB_B_DECODE, 6), 6)
_CBP_PEEK = (_peek_table(_CBP_DECODE, 9), 9)
_MV_PEEK = (_peek_table(_MV_DECODE, 10), 10)
_MB_ADDR_PEEK = _peek_table(_MB_ADDR_DECODE, 11)
for _code, _ln, _tag in (
    (MB_STUFFING[0], MB_STUFFING[1], ("stuff", MB_STUFFING[1])),
    (MB_ADDR_ESC[0], MB_ADDR_ESC[1], ("esc", MB_ADDR_ESC[1])),
):
    for _i in range(_code, _code + 1):  # 11-bit codes fill one slot
        _MB_ADDR_PEEK[_i] = _tag
del _code, _ln, _tag, _i


def _read_vlc(
    br: _BitReader,
    table: dict,
    what: str,
    max_len: int = 12,
    peek: tuple[list, int] | None = None,
) -> int:
    if peek is not None:
        ent = peek[0][br._peek(peek[1])]
        if ent is not None:
            br._skip(ent[1])
            return ent[0]
    code, ln = 0, 0
    while ln < max_len:
        code = (code << 1) | br.bits(1)
        ln += 1
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError(f"mpeg1: bad {what} code")


def _quant_non_intra(coef: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """Encoder-side non-intra quantization matched to the §2.4.4.2
    recon ((2L + sgn L)·qscale·W) DIV 16: L = trunc(8·c / (qscale·W)),
    truncation toward zero (the +sgn in the recon supplies the half
    step back), saturated to the ±255 escape-code limit. Applies to
    ALL 64 coefficients — non-intra DC has no special path."""
    zz = coef.reshape(64)[ZIGZAG]
    sqf, _, _ = _qzz_prod(q, qscale)
    lv = np.fix(8.0 * zz / sqf).astype(np.int64)
    np.minimum(lv, 255, out=lv)
    np.maximum(lv, -255, out=lv)
    return lv


def _dequant_non_intra(zz: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """§2.4.4.2/3 non-intra reconstruction: ((2L + sgn L)·qscale·W)
    DIV 16 truncating toward zero, odd-ification mismatch control,
    zero stays zero, [-2048, 2047] saturation."""
    _, m1, _ = _qzz_prod(q, qscale)
    z = zz.astype(np.int64)
    num = (2 * z + np.sign(z)) * m1
    rec = np.sign(num) * (np.abs(num) // 16)
    even = (rec != 0) & ((rec & 1) == 0)
    rec[even] -= np.sign(rec[even])
    np.minimum(rec, 2047, out=rec)
    np.maximum(rec, -2048, out=rec)
    return rec[_ZZ_INV].astype(np.float64).reshape(8, 8)


def _write_ac_nonintra(bw: _BitWriter, zz: np.ndarray) -> None:
    """Run-level code ALL 64 coefficients of a non-intra block + EOB.
    First-coefficient special case (table B.5c note): the pair
    (run 0, |level| 1) codes as '1 s' — EOB cannot occur first, so the
    '1' prefix is unambiguous there."""
    acc, nb = 0, 0
    first, run = True, 0
    # one C-level conversion instead of 64 numpy scalar reads
    for lv in zz.tolist():
        if lv == 0:
            run += 1
            continue
        if first and run == 0 and abs(lv) == 1:
            acc = (acc << 2) | 0b10 | (1 if lv < 0 else 0)
            nb += 2
        else:
            ent = AC_CODES.get((run, abs(lv)))
            if ent is not None:
                code, ln = ent
                acc = (acc << (ln + 1)) | (code << 1) | (1 if lv < 0 else 0)
                nb += ln + 1
            else:
                acc = (acc << 12) | (ESC_CODE << 6) | run
                nb += 12
                if -127 <= lv <= 127:
                    acc = (acc << 8) | (lv & 0xFF)
                    nb += 8
                elif 128 <= lv <= 255:
                    acc = (acc << 16) | lv
                    nb += 16
                elif -255 <= lv <= -128:
                    acc = (acc << 16) | (0x80 << 8) | (lv + 256)
                    nb += 16
                else:
                    raise ValueError("mpeg1: |level| > 255 not representable")
        first = False
        run = 0
    bw.write((acc << EOB_LEN) | EOB_CODE, nb + EOB_LEN)


def _read_ac_nonintra(br: _BitReader, zz: np.ndarray) -> None:
    """Decode a non-intra block: dct_coeff_first (special '1 s' form
    for (0, ±1); EOB impossible) then dct_coeff_next until EOB.
    Table-driven like :func:`_read_ac`; the first-coefficient '1 s'
    form is branched on one peeked bit before the table (its '1'
    prefix is EOB/(0,1) in the _AC_PEEK encoding)."""
    i = -1
    first = True
    tbl = _AC_PEEK
    peek = br._peek
    while True:
        if first and peek(1) == 1:
            br._skip(1)
            run, lv = 0, (-1 if br.bits(1) else 1)
        else:
            ent = tbl[peek(13)]
            if ent is None:
                r = _ac_walk_slow(br, first)
                if r is None:
                    return
                run, lv = r
            elif ent[0] == "eob":
                # unreachable while first: the '10' prefix is caught by
                # the peeked-bit branch above
                br._skip(2)
                return
            elif ent[0] == "esc":
                br._skip(6)
                run = br.bits(6)
                v = br.bits(8)
                if v == 0x00:
                    lv = br.bits(8)
                elif v == 0x80:
                    lv = br.bits(8) - 256
                else:
                    lv = v if v < 128 else v - 256
            else:
                run, lv, ln = ent
                br._skip(ln)
                if br.bits(1):
                    lv = -lv
        first = False
        i += run + 1
        if i > 63:
            raise ValueError("mpeg1: AC coefficient index overflow")
        zz[i] = lv


def _write_mv(bw: _BitWriter, diff: int) -> None:
    """motion_horizontal/vertical_code for forward_f_code = 1 (no
    residual bits): the folded differential IS the motion_code."""
    code, ln = MV_CODES[abs(diff)]
    bw.write(code, ln)
    if diff:
        bw.write(1 if diff < 0 else 0, 1)


def _read_mv(br: _BitReader, f: int) -> int:
    """Read motion_code (+ residual for f > 1) and return the signed
    delta in vector units: delta = (|code|-1)·f + residual + 1."""
    mag = _read_vlc(br, _MV_DECODE, "motion", peek=_MV_PEEK)
    if mag == 0:
        return 0
    sign = -1 if br.bits(1) else 1
    residual = br.bits(_F_RSIZE[f]) if f > 1 else 0
    return sign * ((mag - 1) * f + residual + 1)


_F_RSIZE = {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6}


def _fold_mv(diff: int, f: int = 1) -> int:
    """Fold a vector differential into [-16f, 16f-1] (mod 32f)."""
    lo, hi = -16 * f, 16 * f - 1
    if diff > hi:
        diff -= 32 * f
    elif diff < lo:
        diff += 32 * f
    return diff


def _mc_block(ref: np.ndarray, y0: int, x0: int, mvy_h: int, mvx_h: int,
              size: int) -> np.ndarray:
    """size×size forward prediction from ``ref`` (int64 plane) at
    half-pel vector (mvy_h, mvx_h) relative to (y0, x0). Half-pel
    samples are the §2.4.4.2 rounded integer averages
    ((a+b+1)>>1 / (a+b+c+d+2)>>2)."""
    iy, hy = mvy_h >> 1, mvy_h & 1
    ix, hx = mvx_h >> 1, mvx_h & 1
    r, c = y0 + iy, x0 + ix
    # a malformed/untrusted stream can carry a vector whose window
    # leaves the reference plane: negative starts silently wrap to the
    # far side under numpy slicing (garbage decode), and far-positive
    # starts raise an opaque broadcast ValueError — reject both with a
    # clear error (the half-pel taps need one extra sample on each axis)
    ph, pw = ref.shape
    if not (0 <= r and r + size + hy <= ph and 0 <= c and c + size + hx <= pw):
        raise ValueError(
            f"mpeg1: motion vector outside picture (block at ({y0},{x0}), "
            f"half-pel mv ({mvy_h},{mvx_h}), plane {ph}x{pw})"
        )
    a = ref[r : r + size, c : c + size]
    if not hy and not hx:
        return a.copy()
    if hy and hx:
        b = ref[r : r + size, c + 1 : c + size + 1]
        d = ref[r + 1 : r + size + 1, c : c + size]
        e = ref[r + 1 : r + size + 1, c + 1 : c + size + 1]
        return (a + b + d + e + 2) >> 2
    if hx:
        b = ref[r : r + size, c + 1 : c + size + 1]
    else:
        b = ref[r + 1 : r + size + 1, c : c + size]
    return (a + b + 1) >> 1


def _motion_search(ref: np.ndarray, cur: np.ndarray, y0: int, x0: int,
                   search: int) -> tuple[int, int, int]:
    """Exhaustive EVEN full-pel search (deterministic first-best,
    (0,0) evaluated first): even luma vectors keep the derived chroma
    vector (luma/2) at full-pel too, so no half-pel interpolation path
    is exercised by this encoder (the decoder still implements it).
    Returns (mvy, mvx, sad)."""
    ph, pw = ref.shape
    sad0 = int(np.abs(cur - ref[y0 : y0 + 16, x0 : x0 + 16]).sum())
    if search == 0:
        return (0, 0, sad0)
    # vectorized SAD grid over the clipped even-offset window (one
    # sliding-window view instead of ~81 small-array passes); tie
    # semantics match the scalar loop: (0, 0) wins unless some
    # candidate is STRICTLY better, then first occurrence in
    # row-major (dy, dx) order — np.argmin's first-min rule
    r0 = max(y0 - search, 0) + (y0 - max(y0 - search, 0)) % 2
    c0 = max(x0 - search, 0) + (x0 - max(x0 - search, 0)) % 2
    r1 = min(y0 + search, ph - 16)
    c1 = min(x0 + search, pw - 16)
    win = np.lib.stride_tricks.sliding_window_view(ref, (16, 16))
    cand = win[r0 : r1 + 1 : 2, c0 : c1 + 1 : 2]
    sads = np.abs(cand - cur).sum(axis=(2, 3))
    flat = int(np.argmin(sads))
    i, j = divmod(flat, sads.shape[1])
    best = int(sads[i, j])
    if best >= sad0:
        return (0, 0, sad0)
    return (r0 + 2 * i - y0, c0 + 2 * j - x0, best)


def _motion_search_half(ref: np.ndarray, cur: np.ndarray, y0: int, x0: int,
                        search: int) -> tuple[int, int, int]:
    """Two-stage HALF-PEL search (r13): exhaustive integer-pel coarse
    pass (any parity — with full_pel=0 the derived chroma vector may
    be half-pel, which the decoder interpolates), then the eight
    half-pel refinements around the winner, each scored with the
    §2.4.4.2 rounded interpolation via :func:`_mc_block` — the exact
    arithmetic the decoder will run, so the closed loop stays
    drift-free. Deterministic: (0,0) first, coarse ties first-best in
    row-major order, refinements in fixed (dy, dx) order and only on a
    STRICT improvement. Returns (hy, hx, sad) in half-pel units;
    |search| ≤ 7 keeps every refined vector inside the f_code=1 coded
    range [-16, 15]."""
    ph, pw = ref.shape
    sad0 = int(np.abs(cur - ref[y0 : y0 + 16, x0 : x0 + 16]).sum())
    by, bx, best = 0, 0, sad0
    if search:
        r0, c0 = max(y0 - search, 0), max(x0 - search, 0)
        r1, c1 = min(y0 + search, ph - 16), min(x0 + search, pw - 16)
        win = np.lib.stride_tricks.sliding_window_view(ref, (16, 16))
        sads = np.abs(win[r0 : r1 + 1, c0 : c1 + 1] - cur).sum(axis=(2, 3))
        flat = int(np.argmin(sads))
        i, j = divmod(flat, sads.shape[1])
        if int(sads[i, j]) < best:
            by, bx, best = r0 + i - y0, c0 + j - x0, int(sads[i, j])
    hy, hx = 2 * by, 2 * bx
    out_y, out_x = hy, hx
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ty, tx = hy + dy, hx + dx
            iy, fy = ty >> 1, ty & 1
            ix, fx = tx >> 1, tx & 1
            r, c = y0 + iy, x0 + ix
            if not (0 <= r and r + 16 + fy <= ph and 0 <= c and c + 16 + fx <= pw):
                continue
            s = int(np.abs(cur - _mc_block(ref, y0, x0, ty, tx, 16)).sum())
            if s < best:
                out_y, out_x, best = ty, tx, s
    return (out_y, out_x, best)




def _write_addr_inc(bw, inc: int) -> None:
    while inc > 33:
        bw.write(*MB_ADDR_ESC)
        inc -= 33
    bw.write(*MB_ADDR_INC_CODES[inc])


def _encode_video_planes(
    planes,
    w: int,
    h: int,
    qscale: int,
    intra_period: int,
    search: int,
    intra_quant,
    b_frames: int = 0,
    half_pel: bool = False,
):
    """Shared I+P(+B) encoder over prepared planes: ``planes`` is one
    (ypad, cbpad, crpad) float tuple per frame — Y padded to the
    16-grid, chroma to the 8-grid (exactly _encode_intra_planes'
    contract). Returns (bytes, recon (y, cb, cr) uint8 frame tuples
    cropped like the decoder crops) — the recon chain is the decoder-
    must-produce output AND the prediction reference, so parity is
    drift-free by construction. Motion is estimated on Y (even
    full-pel, window ±``search``); chroma follows the spec's
    vector/2, which stays full-pel because the search is even."""
    if not planes:
        raise ValueError("encode_mpeg1_video needs at least one frame")
    if not 1 <= qscale <= 31:
        raise ValueError("qscale must be in 1..31")
    if intra_period < 1:
        raise ValueError("intra_period must be >= 1")
    if half_pel:
        # any-parity integer coarse pass + half-pel refinement: ±7 px
        # keeps every refined vector inside the f_code=1 half-pel
        # coded range [-16, 15]
        if not 0 <= search <= 7:
            raise ValueError("half_pel search must be within ±7 (f_code 1)")
    elif not 0 <= search <= 8 or search % 2:
        raise ValueError("search must be even and within ±8 (f_code 1)")
    if not 0 <= b_frames <= 4:
        raise ValueError("b_frames must be in 0..4")
    q_i = DEFAULT_INTRA_QUANT if intra_quant is None else np.asarray(
        intra_quant, dtype=np.int64
    ).reshape(64)
    q_n = DEFAULT_NON_INTRA_QUANT
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    ph, pw = mb_h * 16, mb_w * 16
    bw = _BitWriter()
    bw.start_code(SEQ_START)
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(0b0001, 4)
    bw.write(_PIC_RATE_CODE, 4)
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    if intra_quant is None:
        bw.write(0, 1)
    else:
        bw.write(1, 1)
        for v in q_i.reshape(64)[ZIGZAG]:
            bw.write(int(v), 8)
    bw.write(0, 1)
    bw.start_code(GOP_START)
    bw.write(0, 25)
    bw.write(1, 1)  # closed_gop
    bw.write(0, 1)
    n = len(planes)
    if b_frames == 0:
        ref = None
        recons = []
        for t, (ypad, cbpad, crpad) in enumerate(planes):
            is_i = ref is None or t % intra_period == 0
            rp = _encode_anchor_picture(
                bw, ypad, cbpad, crpad, t, is_i, ref, qscale, q_i, q_n,
                search, mb_w, mb_h, ph, pw, half_pel,
            )
            ref = _round_planes(rp)
            recons.append(_crop_planes(ref, w, h))
        bw.start_code(SEQ_END)
        return bw.bytes(), recons
    # B-picture GOP structure (r13): anchors every b_frames+1 display
    # positions (the LAST frame is forced to be an anchor so every B
    # has a future reference); anchor k is I every intra_period
    # anchors. Transmission order: each anchor goes first, then the B
    # pictures that sit between it and the previous anchor — exactly
    # the reorder a conformant decoder undoes.
    s = b_frames + 1
    anchors = list(range(0, n, s))
    if anchors[-1] != n - 1:
        anchors.append(n - 1)
    recons: list = [None] * n
    fwd = bwd = None
    for k, t in enumerate(anchors):
        is_i = k % intra_period == 0
        rp = _encode_anchor_picture(
            bw, *planes[t], t, is_i, bwd, qscale, q_i, q_n,
            search, mb_w, mb_h, ph, pw, half_pel,
        )
        fwd, bwd = bwd, _round_planes(rp)
        recons[t] = _crop_planes(bwd, w, h)
        if k > 0:
            for tb in range(anchors[k - 1] + 1, t):
                rpb = _encode_b_picture(
                    bw, *planes[tb], tb, fwd, bwd, qscale, q_i, q_n,
                    search, mb_w, mb_h, ph, pw, half_pel,
                )
                recons[tb] = _crop_planes(_round_planes(rpb), w, h)
    bw.start_code(SEQ_END)
    return bw.bytes(), recons


def _round_planes(rp):
    """Float recon planes -> the int64 uint8-range planes a decoder
    holds (and predicts from)."""
    return tuple(np.clip(np.rint(p), 0, 255).astype(np.int64) for p in rp)


def _crop_planes(ref, w: int, h: int):
    """(y, cb, cr) int64 planes -> the cropped uint8 output frame."""
    ref_y, ref_cb, ref_cr = ref
    ch, cw = (h + 1) // 2, (w + 1) // 2
    return (
        ref_y[:h, :w].astype(np.uint8),
        ref_cb[:ch, :cw].astype(np.uint8),
        ref_cr[:ch, :cw].astype(np.uint8),
    )




def _intra_mb_batch(ypad, cbpad, crpad, mbs, q, qscale):
    """Batched intra transforms for the macroblocks at ``mbs`` (list of
    (row, col)): ``(zz_y (k,4,64) by-major block order, zz_cb (k,64),
    zz_cr (k,64), rec_y (k,16,16), rec_cb (k,8,8), rec_cr (k,8,8))`` —
    fdct/quant plus the closed-loop dequant/idct reconstruction, one
    numpy dispatch per picture instead of six per macroblock. Levels
    and reconstructions are bit-identical to the per-block helpers
    (same dgemm per 8×8 slice, same elementwise quant arithmetic)."""
    k = len(mbs)
    rows = np.fromiter((r for r, _ in mbs), dtype=np.int64, count=k)
    cols = np.fromiter((c for _, c in mbs), dtype=np.int64, count=k)
    r_idx = rows[:, None] * 2 + np.array([0, 0, 1, 1])
    c_idx = cols[:, None] * 2 + np.array([0, 1, 0, 1])
    zz_y = _quant_intra_batch(
        _fdct_batch(_blocks_8x8(ypad)[r_idx, c_idx]), q, qscale
    ).reshape(k, 4, 64)
    rec_y = _mb_from_blocks(
        _idct_batch(
            _dequant_intra_batch(zz_y.reshape(-1, 64), q, qscale)
        ).reshape(k, 4, 8, 8)
    )
    zz_cb = _quant_intra_batch(
        _fdct_batch(_blocks_8x8(cbpad)[rows, cols]), q, qscale
    )
    zz_cr = _quant_intra_batch(
        _fdct_batch(_blocks_8x8(crpad)[rows, cols]), q, qscale
    )
    rec_cb = _idct_batch(_dequant_intra_batch(zz_cb, q, qscale))
    rec_cr = _idct_batch(_dequant_intra_batch(zz_cr, q, qscale))
    return zz_y, zz_cb, zz_cr, rec_y, rec_cb, rec_cr


def _inter_mb_batch(resid_y, resid_cb, resid_cr, q_n, qscale):
    """Batched non-intra transforms over stacked residual macroblocks
    (``resid_y`` (k,16,16), ``resid_cb``/``resid_cr`` (k,8,8)):
    ``(zz_y (k,4,64) by-major, zz_cb (k,64), zz_cr (k,64), cbp (k,),
    rec_add_y (k,16,16), rec_add_cb (k,8,8), rec_add_cr (k,8,8))``.

    ``rec_add_*`` is the dequant+idct residual reconstruction for ALL
    blocks — an uncoded block's levels are all zero, its dequant is
    exactly 0 and its idct exactly ±0.0, so ``pred + rec_add`` equals
    the scalar add-coded-blocks-only arithmetic bit for bit (the
    predictions are non-negative, so +0.0 adds are identity)."""
    k = resid_y.shape[0]
    yblk = _blocks_8x8(resid_y).reshape(k, 4, 8, 8)
    zz_y = _quant_non_intra_batch(
        _fdct_batch(yblk.reshape(-1, 8, 8)), q_n, qscale
    ).reshape(k, 4, 64)
    zz_cb = _quant_non_intra_batch(_fdct_batch(resid_cb), q_n, qscale)
    zz_cr = _quant_non_intra_batch(_fdct_batch(resid_cr), q_n, qscale)
    cbp = (
        ((zz_y != 0).any(axis=2) * np.array([32, 16, 8, 4])).sum(axis=1)
        + (zz_cb != 0).any(axis=1) * 2
        + (zz_cr != 0).any(axis=1) * 1
    )
    rec_add_y = _mb_from_blocks(
        _idct_batch(
            _dequant_non_intra_batch(zz_y.reshape(-1, 64), q_n, qscale)
        ).reshape(k, 4, 8, 8)
    )
    rec_add_cb = _idct_batch(_dequant_non_intra_batch(zz_cb, q_n, qscale))
    rec_add_cr = _idct_batch(_dequant_non_intra_batch(zz_cr, q_n, qscale))
    return zz_y, zz_cb, zz_cr, cbp, rec_add_y, rec_add_cb, rec_add_cr


def _write_intra_mb(bw, i, batch, dc_y, dc_cb, dc_cr):
    """Emit one intra macroblock's DC DPCM + AC codes from the batched
    transform arrays; returns the updated DC predictors. The write
    order (4 luma by-major, cb, cr) matches the per-block path."""
    zz_y, zz_cb, zz_cr = batch[0], batch[1], batch[2]
    for b in range(4):
        zz = zz_y[i, b]
        _write_dc(bw, int(zz[0]) - dc_y, DC_LUM_CODES)
        dc_y = int(zz[0])
        _write_ac(bw, zz)
    zz = zz_cb[i]
    _write_dc(bw, int(zz[0]) - dc_cb, DC_CHROM_CODES)
    dc_cb = int(zz[0])
    _write_ac(bw, zz)
    zz = zz_cr[i]
    _write_dc(bw, int(zz[0]) - dc_cr, DC_CHROM_CODES)
    dc_cr = int(zz[0])
    _write_ac(bw, zz)
    return dc_y, dc_cb, dc_cr


def _write_inter_residuals(bw, k, cbp, inter_batch):
    """Emit the CBP-selected residual blocks of inter macroblock ``k``
    from the batched arrays (same order as the scalar path: luma b=0..3,
    cb, cr)."""
    zz_y, zz_cb, zz_cr = inter_batch[0], inter_batch[1], inter_batch[2]
    for b in range(4):
        if cbp & (32 >> b):
            _write_ac_nonintra(bw, zz_y[k, b])
    if cbp & 2:
        _write_ac_nonintra(bw, zz_cb[k])
    if cbp & 1:
        _write_ac_nonintra(bw, zz_cr[k])


def _encode_anchor_picture(
    bw,
    ypad,
    cbpad,
    crpad,
    t: int,
    is_i: bool,
    ref,
    qscale: int,
    q_i,
    q_n,
    search: int,
    mb_w: int,
    mb_h: int,
    ph: int,
    pw: int,
    half_pel: bool = False,
):
    """Write one I or P picture (header + slices + macroblocks) and
    return the float reconstruction planes (rp_y, rp_cb, rp_cr).
    ``ref`` is the (y, cb, cr) int64 prediction reference (the previous
    ANCHOR — with B pictures in the stream the previous picture in
    transmission order is not necessarily the reference) or None for
    the first I. Extracted verbatim from the r12 I+P loop body so the
    B-picture path (r13) shares one anchor implementation.

    ``half_pel`` (r13): vectors are estimated by the two-stage
    :func:`_motion_search_half` and coded in HALF-PEL units
    (full_pel_forward_vector = 0); prediction — luma and the derived
    truncating-division chroma vector — goes through :func:`_mc_block`,
    the decoder's own interpolation. With half_pel=False the even
    full-pel vectors make every _mc_block call a plain slice copy, so
    r12 streams stay byte-identical (pinned by test)."""
    ref_y = ref_cb = ref_cr = None
    if ref is not None:
        ref_y, ref_cb, ref_cr = ref
    bw.start_code(PIC_START)
    bw.write(t & 0x3FF, 10)  # temporal_reference (display order)
    bw.write(1 if is_i else 2, 3)
    bw.write(0xFFFF, 16)
    if not is_i:
        bw.write(0 if half_pel else 1, 1)  # full_pel_forward_vector
        bw.write(1, 3)  # forward_f_code
    bw.write(0, 1)  # extra_bit_picture
    rp_y = np.zeros((ph, pw), dtype=np.float64)
    rp_cb = np.zeros((ph // 2, pw // 2), dtype=np.float64)
    rp_cr = np.zeros((ph // 2, pw // 2), dtype=np.float64)
    # --- pass 1: per-MB mode decisions + predictions (no transforms).
    # Motion search and the variance test depend only on (ref, cur), so
    # every macroblock's decision is picture-batchable; the transforms
    # move to ONE batched dispatch below instead of six numpy calls per
    # macroblock (guide §1.2 step 2 — per-task work).
    intra_mbs: list[tuple[int, int]] = []
    inter_mvs: list[tuple[int, int]] = []
    inter_preds: list = []
    if is_i:
        intra_mbs = [(r, c) for r in range(mb_h) for c in range(mb_w)]
    else:
        for row in range(mb_h):
            for col in range(mb_w):
                cur = ypad[
                    row * 16 : row * 16 + 16, col * 16 : col * 16 + 16
                ]
                if half_pel:
                    mvy, mvx, sad = _motion_search_half(
                        ref_y, cur.astype(np.int64), row * 16, col * 16, search
                    )  # HALF-PEL units (coded directly: full_pel bit is 0)
                else:
                    mvy, mvx, sad = _motion_search(
                        ref_y, cur.astype(np.int64), row * 16, col * 16, search
                    )
                # classic variance test: predict only when the residual
                # beats the mean-removed energy of the block itself
                intra_cost = int(np.abs(cur - np.rint(cur.mean())).sum())
                if sad > intra_cost:
                    intra_mbs.append((row, col))
                    continue
                # half-pel luma vector (mvy is already half-pel when
                # half_pel, else doubled exactly like the decoder does
                # for full_pel=1); chroma = luma/2 truncating toward
                # zero (§2.4.4.2). _mc_block is the decoder's own
                # arithmetic — for even vectors it degenerates to the
                # plain slice copy (byte-identical streams).
                hvy, hvx = (mvy, mvx) if half_pel else (mvy << 1, mvx << 1)
                cvy, cvx = int(hvy / 2), int(hvx / 2)
                pred = _mc_block(ref_y, row * 16, col * 16, hvy, hvx, 16)
                pred_cb = _mc_block(ref_cb, row * 8, col * 8, cvy, cvx, 8)
                pred_cr = _mc_block(ref_cr, row * 8, col * 8, cvy, cvx, 8)
                inter_mvs.append((mvy, mvx))
                inter_preds.append((row, col, pred, pred_cb, pred_cr))
    # --- pass 2: batched transforms (intra group + inter group)
    intra_batch = (
        _intra_mb_batch(ypad, cbpad, crpad, intra_mbs, q_i, qscale)
        if intra_mbs
        else None
    )
    inter_batch = None
    if inter_preds:
        resid_y = np.stack(
            [
                ypad[r * 16 : r * 16 + 16, c * 16 : c * 16 + 16] - p
                for r, c, p, _pcb, _pcr in inter_preds
            ]
        )
        resid_cb = np.stack(
            [
                cbpad[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] - pcb
                for r, c, _p, pcb, _pcr in inter_preds
            ]
        )
        resid_cr = np.stack(
            [
                crpad[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] - pcr
                for r, c, _p, _pcb, pcr in inter_preds
            ]
        )
        inter_batch = _inter_mb_batch(resid_y, resid_cb, resid_cr, q_n, qscale)
    intra_pos = {mb: i for i, mb in enumerate(intra_mbs)}
    inter_pos = {
        (r, c): k for k, (r, c, _p, _pcb, _pcr) in enumerate(inter_preds)
    }
    # --- pass 3: sequential syntax writer (bit-identical order/logic)
    for row in range(mb_h):
        bw.start_code(0x00000100 + row + 1)
        bw.write(qscale, 5)
        bw.write(0, 1)
        dc_y = dc_cb = dc_cr = 128
        pmv = (0, 0)
        pending = 0  # address-increment run over skipped MBs
        for col in range(mb_w):
            ys, xs = slice(row * 16, row * 16 + 16), slice(
                col * 16, col * 16 + 16
            )
            cs_y, cs_x = slice(row * 8, row * 8 + 8), slice(
                col * 8, col * 8 + 8
            )
            i = intra_pos.get((row, col))
            if i is not None:
                if is_i:
                    _write_addr_inc(bw, 1)
                    bw.write(1, 1)  # intra
                else:
                    _write_addr_inc(bw, pending + 1)
                    pending = 0
                    bw.write(*MB_P_CODES["intra"])
                    pmv = (0, 0)  # predictors reset after intra
                dc_y, dc_cb, dc_cr = _write_intra_mb(
                    bw, i, intra_batch, dc_y, dc_cb, dc_cr
                )
                rp_y[ys, xs] = intra_batch[3][i]
                rp_cb[cs_y, cs_x] = intra_batch[4][i]
                rp_cr[cs_y, cs_x] = intra_batch[5][i]
                continue
            k = inter_pos[(row, col)]
            mvy, mvx = inter_mvs[k]
            _r, _c, pred, pred_cb, pred_cr = inter_preds[k]
            cbp = int(inter_batch[3][k])
            zero_mv = mvy == 0 and mvx == 0
            last = col == mb_w - 1
            if cbp == 0 and zero_mv and 0 < col and not last:
                # skipped: decoder copies co-located, resets PMV + DC
                pending += 1
                rp_y[ys, xs] = pred
                rp_cb[cs_y, cs_x] = pred_cb
                rp_cr[cs_y, cs_x] = pred_cr
                pmv = (0, 0)
                dc_y = dc_cb = dc_cr = 128
                continue
            _write_addr_inc(bw, pending + 1)
            pending = 0
            if cbp == 0:
                bw.write(*MB_P_CODES["mc"])
                _write_mv(bw, _fold_mv(mvx - pmv[1]))  # horizontal first
                _write_mv(bw, _fold_mv(mvy - pmv[0]))
                pmv = (mvy, mvx)
            elif zero_mv:
                bw.write(*MB_P_CODES["coded"])  # no vector -> PMV reset
                bw.write(*CBP_CODES[cbp])
                pmv = (0, 0)
            else:
                bw.write(*MB_P_CODES["mc_coded"])
                _write_mv(bw, _fold_mv(mvx - pmv[1]))  # horizontal first
                _write_mv(bw, _fold_mv(mvy - pmv[0]))
                bw.write(*CBP_CODES[cbp])
                pmv = (mvy, mvx)
            _write_inter_residuals(bw, k, cbp, inter_batch)
            rp_y[ys, xs] = np.clip(pred + inter_batch[4][k], 0, 255)
            rp_cb[cs_y, cs_x] = np.clip(pred_cb + inter_batch[5][k], 0, 255)
            rp_cr[cs_y, cs_x] = np.clip(pred_cr + inter_batch[6][k], 0, 255)
            dc_y = dc_cb = dc_cr = 128  # non-intra MB resets DC preds
    return rp_y, rp_cb, rp_cr


def _encode_b_picture(
    bw,
    ypad,
    cbpad,
    crpad,
    t: int,
    fwd,
    bwd,
    qscale: int,
    q_i,
    q_n,
    search: int,
    mb_w: int,
    mb_h: int,
    ph: int,
    pw: int,
    half_pel: bool = False,
):
    """Write one B picture (ISO 11172-2 §2.4.4.3 bidirectional
    prediction) and return its float reconstruction planes. ``fwd`` /
    ``bwd`` are the (y, cb, cr) int64 reconstructions of the PAST and
    FUTURE anchors (both already transmitted — the stream carries
    pictures in decoding order). B pictures are never references, so
    the recon is only the decoder-must-produce output.

    Per-macroblock mode decision by SAD over the even full-pel
    exhaustive search against EACH anchor: forward, backward, or
    interpolated — the §2.4.4.4 rounded average (f + b + 1) >> 1 of
    the two predictions — with the same variance-test intra fallback
    as P pictures. Vectors code differentially against per-direction
    predictors (reset at slice start and after intra, UNCHANGED by
    skips); a skipped B macroblock reuses the previous macroblock's
    direction flags and vectors verbatim (§2.4.4.3 — unlike P, where
    skip means zero vector), so the encoder may only emit a skip when
    the chosen mode and vectors equal the previous macroblock's, the
    residual quantizes to nothing, and the MB is interior to the
    slice with a non-intra predecessor."""
    fy, fcb, fcr = fwd
    by_, bcb, bcr = bwd
    bw.start_code(PIC_START)
    bw.write(t & 0x3FF, 10)  # temporal_reference (display order)
    bw.write(3, 3)
    bw.write(0xFFFF, 16)
    bw.write(0 if half_pel else 1, 1)  # full_pel_forward_vector
    bw.write(1, 3)  # forward_f_code
    bw.write(0 if half_pel else 1, 1)  # full_pel_backward_vector
    bw.write(1, 3)  # backward_f_code
    bw.write(0, 1)  # extra_bit_picture
    rp_y = np.zeros((ph, pw), dtype=np.float64)
    rp_cb = np.zeros((ph // 2, pw // 2), dtype=np.float64)
    rp_cr = np.zeros((ph // 2, pw // 2), dtype=np.float64)
    # --- pass 1: per-MB mode decisions + predictions (same batching
    # rationale as _encode_anchor_picture: decisions depend only on the
    # anchors and the current frame, transforms batch per picture)
    intra_mbs: list[tuple[int, int]] = []
    inter_info: list = []  # (row, col, mode, fmv, bmv, pred, pred_cb, pred_cr)
    for row in range(mb_h):
        for col in range(mb_w):
            cur = ypad[row * 16 : row * 16 + 16, col * 16 : col * 16 + 16]
            cur_i = cur.astype(np.int64)
            ms = _motion_search_half if half_pel else _motion_search
            fmvy, fmvx, fsad = ms(fy, cur_i, row * 16, col * 16, search)
            bmvy, bmvx, bsad = ms(by_, cur_i, row * 16, col * 16, search)
            # half-pel units for prediction (coded units stay fmv/bmv:
            # half-pel when half_pel, full-pel otherwise — exactly what
            # the full_pel picture-header bits tell the decoder)
            fhy, fhx = (fmvy, fmvx) if half_pel else (fmvy << 1, fmvx << 1)
            bhy, bhx = (bmvy, bmvx) if half_pel else (bmvy << 1, bmvx << 1)
            fpred = _mc_block(fy, row * 16, col * 16, fhy, fhx, 16)
            bpred = _mc_block(by_, row * 16, col * 16, bhy, bhx, 16)
            ipred = (fpred + bpred + 1) >> 1  # §2.4.4.4 rounded average
            isad = int(np.abs(cur_i - ipred).sum())
            mode, sad = min(
                (("fwd", fsad), ("bwd", bsad), ("interp", isad)),
                key=lambda ms: ms[1],
            )
            intra_cost = int(np.abs(cur - np.rint(cur.mean())).sum())
            if sad > intra_cost:
                intra_mbs.append((row, col))
                continue

            # prediction planes for the chosen direction(s); chroma
            # vector = luma/2, exact because the search is even
            def _chroma(ref_c, hy, hx):
                # chroma vector = luma/2 truncating toward zero
                # (§2.4.4.2), in half-pel units — _mc_block is the
                # decoder's interpolation (slice copy when even)
                return _mc_block(ref_c, row * 8, col * 8,
                                 int(hy / 2), int(hx / 2), 8)

            if mode == "fwd":
                pred = fpred
                pred_cb = _chroma(fcb, fhy, fhx)
                pred_cr = _chroma(fcr, fhy, fhx)
            elif mode == "bwd":
                pred = bpred
                pred_cb = _chroma(bcb, bhy, bhx)
                pred_cr = _chroma(bcr, bhy, bhx)
            else:
                pred = ipred
                pred_cb = (_chroma(fcb, fhy, fhx) + _chroma(bcb, bhy, bhx) + 1) >> 1
                pred_cr = (_chroma(fcr, fhy, fhx) + _chroma(bcr, bhy, bhx) + 1) >> 1
            uses_f = mode in ("fwd", "interp")
            uses_b = mode in ("bwd", "interp")
            fmv = (fmvy, fmvx) if uses_f else None
            bmv = (bmvy, bmvx) if uses_b else None
            inter_info.append(
                (row, col, mode, fmv, bmv, pred, pred_cb, pred_cr)
            )
    # --- pass 2: batched transforms
    intra_batch = (
        _intra_mb_batch(ypad, cbpad, crpad, intra_mbs, q_i, qscale)
        if intra_mbs
        else None
    )
    inter_batch = None
    if inter_info:
        resid_y = np.stack(
            [
                ypad[r * 16 : r * 16 + 16, c * 16 : c * 16 + 16] - p
                for r, c, _m, _f, _b, p, _pcb, _pcr in inter_info
            ]
        )
        resid_cb = np.stack(
            [
                cbpad[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] - pcb
                for r, c, _m, _f, _b, _p, pcb, _pcr in inter_info
            ]
        )
        resid_cr = np.stack(
            [
                crpad[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] - pcr
                for r, c, _m, _f, _b, _p, _pcb, pcr in inter_info
            ]
        )
        inter_batch = _inter_mb_batch(resid_y, resid_cb, resid_cr, q_n, qscale)
    intra_pos = {mb: i for i, mb in enumerate(intra_mbs)}
    inter_pos = {(rc[0], rc[1]): k for k, rc in enumerate(inter_info)}
    # --- pass 3: sequential syntax writer (bit-identical order/logic)
    for row in range(mb_h):
        bw.start_code(0x00000100 + row + 1)
        bw.write(qscale, 5)
        bw.write(0, 1)
        dc_y = dc_cb = dc_cr = 128
        fpmv = (0, 0)
        bpmv = (0, 0)
        prev = None  # (mode, fmv, bmv) of the previous macroblock
        pending = 0
        for col in range(mb_w):
            ys = slice(row * 16, row * 16 + 16)
            xs = slice(col * 16, col * 16 + 16)
            cs_y = slice(row * 8, row * 8 + 8)
            cs_x = slice(col * 8, col * 8 + 8)
            i = intra_pos.get((row, col))
            if i is not None:
                _write_addr_inc(bw, pending + 1)
                pending = 0
                bw.write(*MB_B_CODES["intra"])
                dc_y, dc_cb, dc_cr = _write_intra_mb(
                    bw, i, intra_batch, dc_y, dc_cb, dc_cr
                )
                rp_y[ys, xs] = intra_batch[3][i]
                rp_cb[cs_y, cs_x] = intra_batch[4][i]
                rp_cr[cs_y, cs_x] = intra_batch[5][i]
                fpmv = (0, 0)  # §2.4.4.3: intra resets BOTH predictors
                bpmv = (0, 0)
                prev = ("intra", None, None)
                continue
            k = inter_pos[(row, col)]
            _r, _c, mode, fmv, bmv, pred, pred_cb, pred_cr = inter_info[k]
            cbp = int(inter_batch[3][k])
            uses_f = mode in ("fwd", "interp")
            uses_b = mode in ("bwd", "interp")
            last = col == mb_w - 1
            # skip: residual-free AND the previous macroblock already
            # established this exact prediction (mode + vectors) — the
            # decoder will reproduce it verbatim from its state
            if (
                cbp == 0
                and 0 < col
                and not last
                and prev is not None
                and prev[0] == mode
                and prev[1] == fmv
                and prev[2] == bmv
            ):
                pending += 1
                rp_y[ys, xs] = pred
                rp_cb[cs_y, cs_x] = pred_cb
                rp_cr[cs_y, cs_x] = pred_cr
                dc_y = dc_cb = dc_cr = 128
                continue
            _write_addr_inc(bw, pending + 1)
            pending = 0
            bw.write(*MB_B_CODES[mode + ("_coded" if cbp else "")])
            if uses_f:
                _write_mv(bw, _fold_mv(fmv[1] - fpmv[1]))  # horizontal first
                _write_mv(bw, _fold_mv(fmv[0] - fpmv[0]))
                fpmv = fmv
            if uses_b:
                _write_mv(bw, _fold_mv(bmv[1] - bpmv[1]))
                _write_mv(bw, _fold_mv(bmv[0] - bpmv[0]))
                bpmv = bmv
            if cbp:
                bw.write(*CBP_CODES[cbp])
            _write_inter_residuals(bw, k, cbp, inter_batch)
            rp_y[ys, xs] = np.clip(pred + inter_batch[4][k], 0, 255)
            rp_cb[cs_y, cs_x] = np.clip(pred_cb + inter_batch[5][k], 0, 255)
            rp_cr[cs_y, cs_x] = np.clip(pred_cr + inter_batch[6][k], 0, 255)
            dc_y = dc_cb = dc_cr = 128  # non-intra MB resets DC preds
            prev = (mode, fmv, bmv)
    return rp_y, rp_cb, rp_cr





def _gray_planes(frames):
    """Pad gray frames to encoder plane tuples (flat-128 chroma)."""
    h, w = frames[0].shape
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    flat = np.full((mb_h * 8, mb_w * 8), 128.0)
    planes = []
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        ypad = np.pad(
            f.astype(np.float64),
            ((0, mb_h * 16 - h), (0, mb_w * 16 - w)),
            mode="edge",
        )
        planes.append((ypad, flat, flat))
    return planes, w, h


def _color_planes(frames_rgb):
    """Pad RGB frames to encoder plane tuples (JFIF RGB→YCbCr + 2x2
    box chroma downsample — the same prep encode_mpeg1_intra_color
    uses)."""
    from jagular_spark.operators.jpeg import rgb_to_ycbcr

    h, w = frames_rgb[0].shape[:2]
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    ph, pw = mb_h * 16, mb_w * 16
    planes = []
    for f in frames_rgb:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one (h, w, 3) shape")
        y, cb, cr = rgb_to_ycbcr(np.asarray(f, dtype=np.uint8))
        pad = lambda p: np.pad(  # noqa: E731
            p.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"
        )
        down = lambda p: np.rint(  # noqa: E731
            pad(p).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        )
        planes.append((pad(y), down(cb), down(cr)))
    return planes, w, h


def _encode_video(frames, qscale, intra_period, search, intra_quant,
                  b_frames=0, half_pel=False):
    """Grayscale I+P(+B) encode; returns (bytes, uint8 Y recon frames
    in DISPLAY order)."""
    planes, w, h = _gray_planes(frames)
    data, recons = _encode_video_planes(
        planes, w, h, qscale, intra_period, search, intra_quant,
        b_frames, half_pel,
    )
    return data, [y for y, _cb, _cr in recons]


def encode_mpeg1_video(
    frames: list[np.ndarray],
    qscale: int = 1,
    intra_period: int = 4,
    search: int = 8,
    intra_quant: np.ndarray | None = None,
    b_frames: int = 0,
    half_pel: bool = False,
) -> bytes:
    """Encode grayscale uint8 frames as an MPEG-1 elementary stream of
    I and forward-predicted P pictures: every ``intra_period``-th
    picture is intra, the rest predict from the previous decoded
    picture via exhaustive even full-pel motion search (window
    ±``search``), per-macroblock mode decision (pred-mc / pred-c /
    pred-m / intra fallback / skip runs), and §2.4.4.2 non-intra
    residual coding. ``intra_period=1`` degenerates to the I-only
    stream :func:`encode_mpeg1_intra` produces (different encoder, same
    syntax family). ``b_frames`` > 0 inserts that many BIDIRECTIONAL
    pictures between consecutive anchors (ISO 11172-2 §2.4.4.3):
    anchors land every b_frames+1 display positions (the final frame is
    forced to be an anchor so every B has a future reference), every
    ``intra_period``-th ANCHOR is intra, and the stream carries
    pictures in decoding order (each anchor before the B pictures that
    precede it in display order) with temporal_reference recording the
    display position. ``half_pel`` (r13) switches motion estimation to
    the two-stage half-pel search and codes vectors in half-pel units
    (full_pel bits 0) — the decoder's §2.4.4.2 interpolation path,
    exercised by the ENCODER's own closed loop."""
    data, _ = _encode_video(frames, qscale, intra_period, search,
                            intra_quant, b_frames, half_pel)
    return data


def mpeg1_video_expected_reconstruction(
    frames: list[np.ndarray],
    qscale: int = 1,
    intra_period: int = 4,
    search: int = 8,
    intra_quant: np.ndarray | None = None,
    b_frames: int = 0,
    half_pel: bool = False,
) -> list[np.ndarray]:
    """Encoder-internal reconstruction for :func:`encode_mpeg1_video` —
    the exact uint8 frames a conformant decoder must produce. Unlike
    the intra-only invariant this is not merely per-block algebra: the
    recon chain IS the encoder's own prediction reference (P pictures
    predict from reconstructed, not source, frames — the standard
    closed-loop design that prevents drift), so decode == this list
    bit-exactly, and any mismatch would compound frame over frame and
    be caught at the first P picture. With ``b_frames`` the list is in
    DISPLAY order — exactly the order the decoder emits."""
    _, recons = _encode_video(frames, qscale, intra_period, search,
                              intra_quant, b_frames, half_pel)
    return recons


def encode_mpeg1_video_color(
    frames_rgb: list[np.ndarray],
    qscale: int = 1,
    intra_period: int = 4,
    search: int = 8,
    intra_quant: np.ndarray | None = None,
    b_frames: int = 0,
    half_pel: bool = False,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an MPEG-1 I+P elementary
    stream with REAL 4:2:0 chroma: motion estimated on Y, the spec's
    halved vector applied to Cb/Cr (exactly full-pel because the
    search is even), per-component non-intra residual coding through
    the shared CBP bits 2/1, intra fallback through the chroma DC DPCM
    chains. Decode with :func:`decode_mpeg1_intra_color` (the general
    decoder). ``b_frames`` inserts bidirectional pictures between
    anchors exactly as in :func:`encode_mpeg1_video` — chroma follows
    each direction's halved vector and interpolation averages Cb/Cr
    with the same §2.4.4.4 rounding as Y."""
    planes, w, h = _color_planes(frames_rgb)
    data, _ = _encode_video_planes(
        planes, w, h, qscale, intra_period, search, intra_quant,
        b_frames, half_pel,
    )
    return data


def mpeg1_video_color_expected_reconstruction(
    frames_rgb: list[np.ndarray],
    qscale: int = 1,
    intra_period: int = 4,
    search: int = 8,
    intra_quant: np.ndarray | None = None,
    b_frames: int = 0,
    half_pel: bool = False,
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Encoder-internal (y, cb, cr) reconstruction for
    :func:`encode_mpeg1_video_color` — the closed-loop reference
    chain; decode must equal it bit-exactly on all three planes (in
    display order when ``b_frames`` > 0)."""
    planes, w, h = _color_planes(frames_rgb)
    _, recons = _encode_video_planes(
        planes, w, h, qscale, intra_period, search, intra_quant,
        b_frames, half_pel,
    )
    return recons
