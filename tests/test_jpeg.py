"""Baseline JPEG codec: spec-derived decoder vectors (streams built BY
HAND from ITU T.81, independent of the encoder), round-trip bounds,
chroma subsampling, restart markers, and the Spark plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from jagular_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg_gray8,
    quant_table,
)

# ---------------------------------------------------------------------------
# Hand-built stream helpers (test-local on purpose: they must not share
# code with the encoder under test)
# ---------------------------------------------------------------------------

# One custom DC Huffman table reused across vectors: five 3-bit codes
#   000 -> category 0, 001 -> 7, 010 -> 8, 011 -> 9, 100 -> 10
DC_BITS = [0, 0, 5] + [0] * 13
DC_VALS = [0, 7, 8, 9, 10]
DC_CODE = {0: ("000", 3), 7: ("001", 3), 8: ("010", 3), 9: ("011", 3), 10: ("100", 3)}
# AC table: single 1-bit code 0 -> EOB
AC_BITS = [1] + [0] * 15
AC_VALS = [0x00]


class Bits:
    def __init__(self):
        self.s = ""

    def put(self, pattern: str):
        self.s += pattern

    def put_val(self, v: int, t: int):
        """T.81 F.1.2.1: negative values send v + 2^t - 1 in t bits."""
        if t == 0:
            return
        enc = v if v >= 0 else v + (1 << t) - 1
        self.s += format(enc, f"0{t}b")

    def tobytes(self) -> bytes:
        s = self.s + "1" * (-len(self.s) % 8)
        raw = bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing


def seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def dqt_all_ones() -> bytes:
    return seg(0xFFDB, bytes([0x00]) + b"\x01" * 64)


def dht() -> bytes:
    return seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)) + seg(
        0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )


def sof0(h: int, w: int, comps: list[tuple[int, int, int]]) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        body += bytes([cid, (hs << 4) | vs, 0])
    return seg(0xFFC0, body)


def sos(cids: list[int]) -> bytes:
    body = bytes([len(cids)])
    for cid in cids:
        body += bytes([cid, 0x00])
    return body[:0] + seg(0xFFDA, body + bytes([0, 63, 0]))


def dc_block(bits: Bits, diff: int):
    """One DC-only block: category code, diff bits, then EOB."""
    t = abs(diff).bit_length()
    code, _ = DC_CODE[t]
    bits.put(code)
    bits.put_val(diff, t)
    bits.put("0")  # EOB


# ---------------------------------------------------------------------------
# Spec vectors
# ---------------------------------------------------------------------------


def test_hand_built_dc_only_grayscale():
    """8x8, all-ones quant table, single DC coefficient 400: with the
    orthonormal DCT the reconstruction is the constant 400/8 + 128 =
    178. The stream is written by hand from T.81 — any decoder bug in
    marker parsing, Huffman assignment, EXTEND, dequant or IDCT breaks
    this, independent of our encoder."""
    bits = Bits()
    dc_block(bits, 400)
    stream = (
        b"\xff\xd8" + dqt_all_ones() + sof0(8, 8, [(1, 1, 1)]) + dht()
        + sos([1]) + bits.tobytes() + b"\xff\xd9"
    )
    out = decode_jpeg_gray(stream)
    assert out.shape == (8, 8)
    assert (out == 178).all()


def test_hand_built_negative_dc_and_extend():
    """DC diff -224 (category 8, sent as -224 + 255 = 31 per EXTEND):
    constant plane -224/8 + 128 = 100."""
    bits = Bits()
    dc_block(bits, -224)
    stream = (
        b"\xff\xd8" + dqt_all_ones() + sof0(8, 8, [(1, 1, 1)]) + dht()
        + sos([1]) + bits.tobytes() + b"\xff\xd9"
    )
    assert (decode_jpeg_gray(stream) == 100).all()


def test_hand_built_420_color_constant():
    """16x16 4:2:0 three-component stream: one MCU = 4 Y blocks + Cb +
    Cr. Constant planes Y=100, Cb=30, Cr=200 via DC-only blocks (later
    Y blocks have diff 0 — DC is differential per component). Exercises
    the MCU block schedule, per-component predictors and the 2x2
    nearest-neighbor chroma upsample."""
    bits = Bits()
    dc_block(bits, -224)  # Y block 0: (100-128)*8
    for _ in range(3):
        dc_block(bits, 0)  # Y blocks 1-3: same DC
    dc_block(bits, -784)  # Cb: (30-128)*8
    dc_block(bits, 576)  # Cr: (200-128)*8
    stream = (
        b"\xff\xd8" + dqt_all_ones()
        + sof0(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)]) + dht()
        + sos([1, 2, 3]) + bits.tobytes() + b"\xff\xd9"
    )
    planes, h, w = decode_jpeg(stream)
    assert (h, w) == (16, 16) and len(planes) == 3
    assert (planes[0] == 100).all()
    assert planes[1].shape == (16, 16) and (planes[1] == 30).all()
    assert (planes[2] == 200).all()


def test_hand_built_restart_markers():
    """16x8 grayscale, DRI=1: an RST0 between the two MCUs resets the
    DC predictor, so the second block's diff is absolute again."""
    b1, b2 = Bits(), Bits()
    dc_block(b1, 400)  # MCU 0 -> 178
    dc_block(b2, -80)  # MCU 1 after reset -> round(-80/8)+128 = 118
    stream = (
        b"\xff\xd8" + dqt_all_ones() + sof0(8, 16, [(1, 1, 1)]) + dht()
        + seg(0xFFDD, struct.pack(">H", 1))
        + sos([1]) + b1.tobytes() + b"\xff\xd0" + b2.tobytes() + b"\xff\xd9"
    )
    out = decode_jpeg_gray(stream)
    assert out.shape == (8, 16)
    assert (out[:, :8] == 178).all() and (out[:, 8:] == 118).all()


def test_lossless_sof_raises_not_implemented():
    stream = (
        b"\xff\xd8" + dqt_all_ones()
        + seg(0xFFC3, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    )
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(stream + b"\xff\xd9")


def test_progressive_sof2_without_scan_is_invalid():
    stream = (
        b"\xff\xd8" + dqt_all_ones()
        + seg(0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    )
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(stream + b"\xff\xd9")


# ---------------------------------------------------------------------------
# Encoder/decoder round-trip properties
# ---------------------------------------------------------------------------


def test_roundtrip_q100_error_bounded_by_idct_rounding():
    """Quality 100 scales the Annex-K table to all ones, so the only
    loss is forward/inverse DCT rounding: |err| <= 1 per pixel."""
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (13, 21), (24, 24), (1, 100)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray8(img, 100))
        assert out.shape == shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_roundtrip_q85_smooth_content():
    """Lossy quality on smooth content stays visually exact-ish: small
    max error, tiny mean error, and a smaller payload than quality 100."""
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    p85, p100 = encode_jpeg_gray8(img, 85), encode_jpeg_gray8(img, 100)
    out = decode_jpeg_gray(p85)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 3 and err.mean() < 0.5
    assert len(p85) < len(p100)


def test_encode_deterministic_and_byte_stuffed_streams_decode():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    p1, p2 = encode_jpeg_gray8(img, 100), encode_jpeg_gray8(img, 100)
    assert p1 == p2
    # a corpus of random payloads will contain stuffed 0xFF bytes
    assert b"\xff\x00" in p1
    assert decode_jpeg_gray(p1).shape == (40, 40)


def test_quality_scaling_matches_public_formula():
    assert (quant_table(100) == 1).all()
    assert (quant_table(50) >= quant_table(75)).all()
    assert quant_table(1).max() == 255


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def test_decode_image_features_on_jpeg_codec(spark):
    """The production decode seam accepts codec='jpeg' natively: image
    features computed from a JPEG payload match the raw8 features of
    the same pixels to within the q100 rounding bound."""
    from jagular_spark.operators.multimodal import decode_image_features

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    rows = [
        (1, "image", "jpeg", bytearray(encode_jpeg_gray8(img, 100)), 24, 16, 1, 0),
        (2, "image", "raw8", bytearray(img.tobytes()), 24, 16, 1, 0),
    ]
    from jagular_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_image_features(df).collect()}
    assert got[1].height == 16 and got[1].width == 24
    assert abs(got[1].mean - got[2].mean) <= 1.5 / 255


# ---------------------------------------------------------------------------
# 4:2:0 color encoder
# ---------------------------------------------------------------------------


def test_color420_constant_image_exact():
    """A constant RGB image has DC-only blocks in all three components;
    at quality 100 every plane must decode to exactly the JFIF YCbCr of
    the input (IDCT of a constant is exact up to the one final rint)."""
    from jagular_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_color420,
        rgb_to_ycbcr,
    )

    rgb = np.empty((32, 48, 3), dtype=np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 200, 30, 90
    planes, h, w = decode_jpeg(encode_jpeg_color420(rgb, quality=100))
    assert (h, w) == (32, 48) and len(planes) == 3
    y, cb, cr = rgb_to_ycbcr(rgb)
    for got, want in zip(planes, (y, cb, cr)):
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_color420_roundtrip_bound_across_shapes():
    """Random and gradient images at several non-multiple-of-16 shapes:
    q100 roundtrip error <= 2 on the luma plane and on the chroma
    subsample grid (vs the encoder's box-averaged chroma)."""
    from jagular_spark.operators.jpeg import (
        _pad_replicate,
        decode_jpeg,
        encode_jpeg_color420,
        rgb_to_ycbcr,
    )

    rng = np.random.default_rng(5)
    for h, w in [(16, 16), (17, 23), (5, 100), (64, 8)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        planes, dh, dw = decode_jpeg(encode_jpeg_color420(img, quality=100))
        assert (dh, dw) == (h, w)
        y, cb, cr = rgb_to_ycbcr(img)
        assert np.abs(planes[0].astype(int) - y.astype(int)).max() <= 2
        ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        ch, cw = (h + 1) // 2, (w + 1) // 2
        for plane, full in ((planes[1], cb), (planes[2], cr)):
            down = np.rint(
                _pad_replicate(full, ph, pw)
                .reshape(ph // 2, 2, pw // 2, 2)
                .mean(axis=(1, 3))
            )
            err = np.abs(plane[0::2, 0::2].astype(float)[:ch, :cw] - down[:ch, :cw])
            assert err.max() <= 2


def test_color420_stream_structure():
    """The emitted container declares exactly the 4:2:0 layout: SOF0
    with 3 components sampled 2x2/1x1/1x1, two quant tables, four
    Huffman tables, one interleaved SOS."""
    from jagular_spark.operators.jpeg import encode_jpeg_color420

    p = encode_jpeg_color420(np.zeros((16, 16, 3), dtype=np.uint8), quality=85)
    i = p.index(b"\xff\xc0")
    # marker(2) len(2) prec(1) h(2) w(2) nc(1) then 3x(id, hv, tq)
    assert p[i + 9] == 3
    comps = [(p[i + 10 + 3 * c], p[i + 11 + 3 * c], p[i + 12 + 3 * c]) for c in range(3)]
    assert comps == [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    assert p.count(b"\xff\xdb") >= 2 and p.count(b"\xff\xc4") >= 4


def test_chroma_quality_scaling():
    from jagular_spark.operators.jpeg import quant_table_chroma

    assert (quant_table_chroma(100) == 1).all()
    assert quant_table_chroma(50)[0, 0] == 17  # K.2 base at scale 100
    assert quant_table_chroma(1).max() == 255


# ---------------------------------------------------------------------------
# Progressive (SOF2) codec
# ---------------------------------------------------------------------------


def test_progressive_gray_decodes_identical_to_baseline():
    """The progressive encoder writes the SAME quantized coefficients
    as the baseline encoder under a 6-scan successive-approximation
    script, so full decode of both streams must be pixel-identical —
    this exercises DC first/refine, AC first (both bands) and AC
    refinement end to end."""
    from jagular_spark.operators.jpeg import (
        encode_jpeg_gray8,
        encode_jpeg_gray8_progressive,
    )

    rng = np.random.default_rng(3)
    for shape in [(8, 8), (13, 21), (24, 24), (1, 100), (64, 64)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for q in (100, 85):
            base = decode_jpeg_gray(encode_jpeg_gray8(img, q))
            prog = decode_jpeg_gray(encode_jpeg_gray8_progressive(img, q))
            assert prog.shape == shape
            assert (prog == base).all(), (shape, q)


def test_progressive_gray_sparse_exercises_eob_runs():
    """A mostly-flat image makes whole blocks land in EOBn runs
    (n >= 1) across blocks, plus ZRL paths inside the lone busy block."""
    from jagular_spark.operators.jpeg import (
        encode_jpeg_gray8,
        encode_jpeg_gray8_progressive,
    )

    img = np.full((48, 48), 130, dtype=np.uint8)
    img[20, 5] = 255  # one busy block in a sea of EOB blocks
    img[40:, 40:] = 131
    p = encode_jpeg_gray8_progressive(img, 100)
    base = decode_jpeg_gray(encode_jpeg_gray8(img, 100))
    assert (decode_jpeg_gray(p) == base).all()


def test_progressive_gray_gradient_smooth():
    from jagular_spark.operators.jpeg import (
        encode_jpeg_gray8,
        encode_jpeg_gray8_progressive,
    )

    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    for q in (100, 85, 40):
        base = decode_jpeg_gray(encode_jpeg_gray8(img, q))
        prog = decode_jpeg_gray(encode_jpeg_gray8_progressive(img, q))
        assert (prog == base).all()


def test_progressive_color_decodes_identical_to_baseline():
    """10-scan color script: interleaved DC scans (3 components, two
    Huffman slots), per-component non-interleaved AC scans over the
    true block grids. Decoded planes must match the baseline color
    stream exactly on every visible pixel."""
    from jagular_spark.operators.jpeg import (
        encode_jpeg_color420,
        encode_jpeg_color420_progressive,
    )

    rng = np.random.default_rng(5)
    for shape in [(16, 16), (17, 23), (32, 48), (9, 40)]:
        rgb = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for q in (100, 85):
            bp, hb, wb = decode_jpeg(encode_jpeg_color420(rgb, q))
            pp, hp, wp = decode_jpeg(encode_jpeg_color420_progressive(rgb, q))
            assert (hb, wb) == (hp, wp) == shape
            assert len(bp) == len(pp) == 3
            for pb, ppl in zip(bp, pp):
                assert (pb == ppl).all(), (shape, q)


def test_progressive_stream_structure():
    """Container shape: SOF2 marker, one SOS per scan in the script,
    per-scan DHTs, Ss/Se/Ah/Al bytes of the first scan."""
    from jagular_spark.operators.jpeg import encode_jpeg_gray8_progressive

    p = encode_jpeg_gray8_progressive(np.zeros((16, 16), dtype=np.uint8), 85)
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p
    assert p.count(b"\xff\xda") == 6  # 6-scan grayscale script
    i = p.index(b"\xff\xda")
    ln = struct.unpack(">H", p[i + 2 : i + 4])[0]
    ns = p[i + 4]
    assert ns == 1
    ss, se, ahal = p[i + 4 + 1 + 2 * ns : i + 4 + 4 + 2 * ns]
    assert (ss, se, ahal) == (0, 0, 0x01)  # DC first, Al=1
    assert ln == 2 + 1 + 2 * ns + 3


def test_optimal_huffman_tables_are_canonical():
    """K.2/K.3 table builder: lengths <= 16, Kraft sum <= 1, no
    all-ones code assigned, single-symbol table gets a 1-bit code."""
    from jagular_spark.operators.jpeg import _huff_codes, _optimal_huffman

    bits, vals = _optimal_huffman({0: 5})
    assert sum(bits) == 1 and vals == [0]
    codes = _huff_codes(bits, vals)
    assert codes[0] == (0, 1)

    freq = {s: (s % 7) + 1 for s in range(180)}
    bits, vals = _optimal_huffman(freq)
    assert sum(bits) == 180 and sorted(vals) == sorted(freq)
    codes = _huff_codes(bits, vals)
    assert max(ln for _, ln in codes.values()) <= 16
    kraft = sum(2.0 ** -ln for _, ln in codes.values())
    assert kraft <= 1.0
    for code, ln in codes.values():
        assert code != (1 << ln) - 1  # reserved symbol keeps all-ones free
    # canonical: codes are unique and prefix-free by construction
    assert len({(ln, c) for c, ln in codes.values()}) == len(codes)


def test_progressive_through_production_decode_path(spark):
    """decode_image_features (the production mapInPandas kernel) must
    accept a progressive payload through _decode_payload."""
    from jagular_spark.operators.jpeg import encode_jpeg_gray8_progressive
    from jagular_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    payload = encode_jpeg_gray8_progressive(img, 100)
    rows = [(1, "image", "jpeg", bytearray(payload), 24, 24, 1, 0)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_image_features(df).collect()
    assert len(got) == 1
    r = got[0]
    exp = img.astype(np.float64) / 255.0
    assert abs(r.mean - float(exp.mean())) < 2e-2  # q100 IDCT rounding only


def _multi_scan_baseline_color(rgb: np.ndarray, quality: int, groups) -> bytes:
    """Test-side writer for a MULTI-SCAN baseline 4:2:0 stream: same
    coefficients as encode_jpeg_color420, but one SOS per component
    group (non-interleaved when the group is a single component, T.81
    A.2). Lets the decoder's multi-scan baseline path be checked
    against the interleaved stream's pixels."""
    from jagular_spark.operators.jpeg import (
        AC_CHROM_BITS, AC_CHROM_VALS, AC_LUM_BITS, AC_LUM_VALS,
        DC_CHROM_BITS, DC_CHROM_VALS, DC_LUM_BITS, DC_LUM_VALS, ZIGZAG,
        _BitWriter, _dct_quant, _emit_block, _huff_codes, _pad_replicate,
        quant_table, quant_table_chroma, rgb_to_ycbcr,
    )

    h, w = rgb.shape[:2]
    y, cb, cr = rgb_to_ycbcr(rgb)
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    ph, pw = mcuy * 16, mcux * 16
    down = lambda p: np.rint(  # noqa: E731
        _pad_replicate(p, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    )
    qy, qc = quant_table(quality), quant_table_chroma(quality)
    zz = [
        _dct_quant(_pad_replicate(y, ph, pw), qy),
        _dct_quant(down(cb), qc),
        _dct_quant(down(cr), qc),
    ]
    sampling = [(2, 2), (1, 1), (1, 1)]
    dc_codes = [_huff_codes(DC_LUM_BITS, DC_LUM_VALS),
                _huff_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_codes = [_huff_codes(AC_LUM_BITS, AC_LUM_VALS),
                _huff_codes(AC_CHROM_BITS, AC_CHROM_VALS)]

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in qy.reshape(64)[ZIGZAG]))
    out += seg(0xFFDB, bytes([0x01]) + bytes(int(v) for v in qc.reshape(64)[ZIGZAG]))
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += seg(0xFFC4, bytes([0x01]) + bytes(DC_CHROM_BITS) + bytes(DC_CHROM_VALS))
    out += seg(0xFFC4, bytes([0x11]) + bytes(AC_CHROM_BITS) + bytes(AC_CHROM_VALS))

    for group in groups:
        bw = _BitWriter()
        if len(group) == 1:
            ci = group[0]
            hs, vs = sampling[ci]
            cw = (w * hs + 1) // 2
            ch = (h * vs + 1) // 2
            nbx, nby = (cw + 7) // 8, (ch + 7) // 8
            tbl = 0 if ci == 0 else 1
            pred = 0
            for by in range(nby):
                for bx in range(nbx):
                    pred = _emit_block(bw, zz[ci][by, bx], pred,
                                       dc_codes[tbl], ac_codes[tbl])
        else:
            preds = {ci: 0 for ci in group}
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for ci in group:
                    hs, vs = sampling[ci]
                    tbl = 0 if ci == 0 else 1
                    for v in range(vs):
                        for u in range(hs):
                            preds[ci] = _emit_block(
                                bw, zz[ci][my * vs + v, mx * hs + u],
                                preds[ci], dc_codes[tbl], ac_codes[tbl],
                            )
        body = bytes([len(group)])
        for ci in group:
            tbl = 0 if ci == 0 else 1
            body += bytes([ci + 1, (tbl << 4) | tbl])
        out += seg(0xFFDA, body + bytes([0, 63, 0])) + bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_multi_scan_baseline_matches_interleaved():
    """A baseline stream split into one scan per component (and a
    2-scan [Y], [Cb+Cr] variant) must decode to exactly the pixels of
    the standard interleaved stream — Y padding blocks differ only
    outside the crop."""
    from jagular_spark.operators.jpeg import encode_jpeg_color420

    rng = np.random.default_rng(17)
    for shape in [(16, 16), (17, 23), (32, 48)]:
        rgb = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        base_planes, h, w = decode_jpeg(encode_jpeg_color420(rgb, 85))
        for groups in ([(0,), (1,), (2,)], [(0,), (1, 2)]):
            ms = _multi_scan_baseline_color(rgb, 85, groups)
            planes, hm, wm = decode_jpeg(ms)
            assert (hm, wm) == (h, w)
            for a, b in zip(base_planes, planes):
                assert (a == b).all(), (shape, groups)


def test_16bit_quant_table_pq1():
    """DQT with Pq=1 (16-bit big-endian entries, B.2.4.1): a DC-only
    block scaled by a 300-entry table — representable only in 16 bits —
    decodes to the expected constant. Uses a test-local DC table with
    the small categories (000..111 -> cat 0..7)."""
    dc16 = seg(
        0xFFC4, bytes([0x00]) + bytes([0, 0, 8] + [0] * 13) + bytes(range(8))
    ) + seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    qt16 = seg(0xFFDB, bytes([0x10]) + struct.pack(">64H", *([300] * 64)))

    def stream(diff: int) -> bytes:
        bits = Bits()
        t = abs(diff).bit_length()
        bits.put(format(t, "03b"))
        bits.put_val(diff, t)
        bits.put("0")  # EOB
        return (
            b"\xff\xd8" + qt16 + sof0(8, 8, [(1, 1, 1)]) + dc16
            + sos([1]) + bits.tobytes() + b"\xff\xd9"
        )

    # 2 * 300 / 8 + 128 = 203 exactly ; -2 * 300 / 8 + 128 = 53 exactly
    assert (decode_jpeg_gray(stream(2)) == 203).all()
    assert (decode_jpeg_gray(stream(-2)) == 53).all()
