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
    """MSB-first bit reader over the whole stream (no unstuffing)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        d = self.data
        p = self.pos
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

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


def _read_dc(br: _BitReader, decode: dict) -> int:
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
    """Run-level code zz[1:] (zig-zag order) + EOB."""
    run = 0
    for i in range(1, 64):
        lv = int(zz[i])
        if lv == 0:
            run += 1
            continue
        ent = AC_CODES.get((run, abs(lv)))
        if ent is not None:
            code, ln = ent
            bw.write(code, ln)
            bw.write(1 if lv < 0 else 0, 1)
        else:
            bw.write(ESC_CODE, ESC_LEN)
            bw.write(run, 6)
            if -127 <= lv <= 127:
                bw.write(lv & 0xFF, 8)
            elif 128 <= lv <= 255:
                bw.write(0x00, 8)
                bw.write(lv, 8)
            elif -255 <= lv <= -128:
                bw.write(0x80, 8)
                bw.write(lv + 256, 8)
            else:
                raise ValueError("mpeg1: |level| > 255 not representable")
        run = 0
    bw.write(EOB_CODE, EOB_LEN)


def _read_ac(br: _BitReader, zz: np.ndarray) -> None:
    """Decode dct_coeff_next codes into zz[1:] until EOB."""
    i = 0
    while True:
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.bits(1)
            ln += 1
            if ln == EOB_LEN and code == EOB_CODE:
                return
            if ln == ESC_LEN and code == ESC_CODE:
                run = br.bits(6)
                v = br.bits(8)
                if v == 0x00:
                    lv = br.bits(8)
                elif v == 0x80:
                    lv = br.bits(8) - 256
                else:
                    lv = v if v < 128 else v - 256
                break
            rl = _AC_DECODE.get((ln, code))
            if rl is not None:
                run, lv = rl
                if br.bits(1):
                    lv = -lv
                break
            if ln > 17:
                raise ValueError("mpeg1: bad AC code")
        i += run + 1
        if i > 63:
            raise ValueError("mpeg1: AC coefficient index overflow")
        zz[i] = lv


def _fdct(block: np.ndarray) -> np.ndarray:
    return _A @ block.astype(np.float64) @ _A.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


def _quant_intra(coef: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """Encoder-side intra quantization matched to the §2.4.4.1 recon
    dct_recon = (2 * level * qscale * Q) // 16: level = round(8 * c /
    (qscale * Q)), saturated to the ±255 syntax limit."""
    zz = coef.reshape(64)[ZIGZAG]
    qzz = q.reshape(64)[ZIGZAG].astype(np.float64)
    lv = np.rint(8.0 * zz / (qscale * qzz)).astype(np.int64)
    lv[0] = int(np.rint(zz[0] / 8.0))  # DC: recon = 8 * level
    np.clip(lv[1:], -255, 255, out=lv[1:])
    lv[0] = min(max(lv[0], 0), 255)
    return lv


def _dequant_intra(zz: np.ndarray, q: np.ndarray, qscale: int) -> np.ndarray:
    """§2.4.4.1 reconstruction: truncating integer division, odd-
    ification mismatch control, [-2048, 2047] saturation; DC is
    8 * dct_zz[0] with no mismatch control."""
    qzz = q.reshape(64)[ZIGZAG].astype(np.int64)
    num = 2 * zz.astype(np.int64) * qscale * qzz
    rec = np.sign(num) * (np.abs(num) // 16)  # truncate toward zero
    even = (rec != 0) & (rec % 2 == 0)
    rec[even] -= np.sign(rec[even])
    rec[0] = zz[0] * 8
    np.clip(rec, -2048, 2047, out=rec)
    out = np.zeros(64, dtype=np.float64)
    out[ZIGZAG] = rec
    return out.reshape(8, 8)


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
    for t, (ypad, cbpad, crpad) in enumerate(planes):
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
                        blk = ypad[
                            row * 16 + by * 8 : row * 16 + by * 8 + 8,
                            col * 16 + bx * 8 : col * 16 + bx * 8 + 8,
                        ]
                        zz = _quant_intra(_fdct(blk), q, qscale)
                        _write_dc(bw, int(zz[0]) - dc_y, DC_LUM_CODES)
                        dc_y = int(zz[0])
                        _write_ac(bw, zz)
                for plane, pred in ((cbpad, "cb"), (crpad, "cr")):
                    blk = plane[
                        row * 8 : row * 8 + 8, col * 8 : col * 8 + 8
                    ]
                    zz = _quant_intra(_fdct(blk), q, qscale)
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
    for f in frames:
        ypad = np.pad(
            f.astype(np.float64),
            ((0, mb_h * 16 - h), (0, mb_w * 16 - w)),
            mode="edge",
        )
        rec = np.zeros_like(ypad)
        for r in range(mb_h * 2):
            for c in range(mb_w * 2):
                blk = ypad[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
                zz = _quant_intra(_fdct(blk), q, qscale)
                rec[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = _idct(
                    _dequant_intra(zz, q, qscale)
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
    macroblock grid the same way Y crops to (h, w)."""
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
    if br.bits(1):  # load_non_intra_quantizer_matrix (unused for intra)
        for _ in range(64):
            br.bits(8)
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    code = br.next_start_code()
    while code != SEQ_END:
        if code == GOP_START:
            br.bits(27)  # time_code + closed + broken
            code = br.next_start_code()
            continue
        if code != PIC_START:
            raise ValueError(f"mpeg1: unexpected start code {code:#010x}")
        br.bits(10)  # temporal_reference
        if br.bits(3) != 1:
            raise ValueError("mpeg1: only I pictures supported (intra codec)")
        br.bits(16)  # vbv_delay
        if br.bits(1):
            raise ValueError("mpeg1: extra_bit_picture payload unsupported")
        plane = np.zeros((mb_h * 16, mb_w * 16), dtype=np.float64)
        cbp = np.zeros((mb_h * 8, mb_w * 8), dtype=np.float64)
        crp = np.zeros((mb_h * 8, mb_w * 8), dtype=np.float64)
        code = br.next_start_code()
        while 0x00000101 <= code <= 0x000001AF:
            row = (code & 0xFF) - 1
            qscale = br.bits(5)
            while br.bits(1):  # extra_information_slice
                br.bits(8)
            dc_y = dc_cb = dc_cr = 128
            col = 0
            while col < mb_w:
                # macroblock_address_increment (always 1 from the intra
                # encoder; stuffing '00000001111' tolerated)
                while True:
                    probe = br.bits(1)
                    if probe == 1:
                        break
                    rest = br.bits(10)
                    if rest == 0b0001111:  # macroblock_stuffing
                        continue
                    raise ValueError("mpeg1: non-unit MB address increment")
                if br.bits(1) != 1:  # macroblock_type
                    if br.bits(1) != 1:
                        raise ValueError("mpeg1: bad I-picture MB type")
                    qscale = br.bits(5)  # intra + quant
                for by in range(2):
                    for bx in range(2):
                        zz = np.zeros(64, dtype=np.int64)
                        dc_y += _read_dc(br, _DC_LUM_DECODE)
                        zz[0] = dc_y
                        _read_ac(br, zz)
                        blk = _idct(_dequant_intra(zz, q, qscale))
                        plane[
                            row * 16 + by * 8 : row * 16 + by * 8 + 8,
                            col * 16 + bx * 8 : col * 16 + bx * 8 + 8,
                        ] = blk
                for pred in ("cb", "cr"):
                    zz = np.zeros(64, dtype=np.int64)
                    d = _read_dc(br, _DC_CHROM_DECODE)
                    if pred == "cb":
                        dc_cb += d
                        zz[0] = dc_cb
                    else:
                        dc_cr += d
                        zz[0] = dc_cr
                    _read_ac(br, zz)
                    blk = _idct(_dequant_intra(zz, q, qscale))
                    tgt = cbp if pred == "cb" else crp
                    tgt[
                        row * 8 : row * 8 + 8, col * 8 : col * 8 + 8
                    ] = blk
                col += 1
            code = br.next_start_code()
        to8 = lambda p, hh, ww: np.clip(  # noqa: E731
            np.rint(p[:hh, :ww]), 0, 255
        ).astype(np.uint8)
        ch, cw = (h + 1) // 2, (w + 1) // 2
        frames.append((to8(plane, h, w), to8(cbp, ch, cw), to8(crp, ch, cw)))
    return frames, w, h
