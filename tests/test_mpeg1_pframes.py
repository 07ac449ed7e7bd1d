"""MPEG-1 P pictures (forward prediction): decode == encoder-internal
reconstruction bit-exactly (the closed-loop recon IS the prediction
reference, so any drift compounds and fails at the first P picture),
plus syntax-level pins — P pictures really appear, skip runs compress
static scenes, the intra fallback engages on scene changes, and the
decoder's half-pel interpolation path matches the §2.4.4.2 rounded
averages on a hand-built stream."""

from __future__ import annotations

import numpy as np
import pytest

from jagular_spark.operators.mpeg1 import (
    decode_mpeg1_video,
    encode_mpeg1_intra,
    encode_mpeg1_video,
    mpeg1_video_expected_reconstruction,
)


def _moving_scene(n=6, h=48, w=64, dx=2, dy=4, seed=5):
    """Textured sprite translating over a gradient — every P
    macroblock has a real nonzero motion vector to find."""
    rng = np.random.default_rng(seed)
    sprite = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    grad = (
        np.add.outer(np.arange(h), np.arange(w)) * 255 // (h + w - 2)
    ).astype(np.uint8)
    frames = []
    for t in range(n):
        f = grad.copy()
        y, x = 4 + t * dy, 2 + t * dx
        f[y : y + 16, x : x + 16] = sprite
        frames.append(f)
    return frames


def _picture_types(data: bytes) -> list[int]:
    """Walk start codes; collect picture_coding_type of each picture."""
    types = []
    i = 0
    while i < len(data) - 4:
        if data[i : i + 3] == b"\x00\x00\x01" and data[i + 3] == 0x00:
            # picture header: 10 bits temporal_ref then 3 bits type
            b = (data[i + 4] << 8) | data[i + 5]
            types.append((b >> 3) & 0b111)
            i += 4
        else:
            i += 1
    return types


def test_pframe_roundtrip_matches_internal_reconstruction():
    frames = _moving_scene()
    for qscale in (1, 2, 6):
        data = encode_mpeg1_video(frames, qscale=qscale, intra_period=4)
        want = mpeg1_video_expected_reconstruction(
            frames, qscale=qscale, intra_period=4
        )
        got, w, h = decode_mpeg1_video(data)
        assert (w, h) == (64, 48)
        assert len(got) == len(want) == len(frames)
        for g, x in zip(got, want):
            assert g.dtype == np.uint8 and g.shape == (48, 64)
            assert np.array_equal(g, x)
    types = _picture_types(data)
    assert types == [1, 2, 2, 2, 1, 2]  # intra_period=4 -> I P P P I P


def test_pframe_reconstruction_tracks_source():
    frames = _moving_scene()
    got, _, _ = decode_mpeg1_video(encode_mpeg1_video(frames, qscale=1))
    for g, src in zip(got, frames):
        assert np.abs(g.astype(int) - src.astype(int)).mean() < 4.0


def test_static_scene_p_pictures_compress_via_skips():
    frames = [_moving_scene(1)[0]] * 5  # identical frames
    inter = encode_mpeg1_video(frames, qscale=2, intra_period=5)
    intra = encode_mpeg1_intra(frames, qscale=2)
    # 4 P pictures of pure skip runs vs 4 extra full I pictures
    assert len(inter) < len(intra) / 3
    got, _, _ = decode_mpeg1_video(inter)
    want = mpeg1_video_expected_reconstruction(frames, qscale=2, intra_period=5)
    for g, x in zip(got, want):
        assert np.array_equal(g, x)


def test_scene_change_intra_fallback_stays_bit_exact():
    rng = np.random.default_rng(9)
    a = _moving_scene(3)
    b = [rng.integers(0, 256, (48, 64), dtype=np.uint8) for _ in range(2)]
    frames = a + b  # hard cut at frame 3, inside the GOP
    data = encode_mpeg1_video(frames, qscale=2, intra_period=8)
    got, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(frames, qscale=2, intra_period=8)
    for g, x in zip(got, want):
        assert np.array_equal(g, x)
    assert _picture_types(data) == [1, 2, 2, 2, 2]  # cut coded WITHIN a P


def test_non_multiple_of_16_dimensions():
    frames = [f[:41, :53] for f in _moving_scene(4)]
    data = encode_mpeg1_video(frames, qscale=1, intra_period=2)
    got, w, h = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(frames, qscale=1, intra_period=2)
    assert (w, h) == (53, 41)
    for g, x in zip(got, want):
        assert g.shape == (41, 53)
        assert np.array_equal(g, x)


def test_intra_period_one_is_all_intra():
    frames = _moving_scene(3)
    data = encode_mpeg1_video(frames, intra_period=1)
    assert _picture_types(data) == [1, 1, 1]
    got, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(frames, intra_period=1)
    for g, x in zip(got, want):
        assert np.array_equal(g, x)


# test_decoder_rejects_b_pictures (r12) retired: B pictures are decoded
# since r13 — its conformance-guard role moved to
# tests/test_mpeg1_bframes.py::test_b_without_two_anchors_rejected.


def test_halfpel_interpolation_matches_spec_rounding():
    """Hand-build a one-P-picture stream whose single coded macroblock
    carries an ODD half-pel forward vector (full_pel_forward_vector=0,
    recon = +1 half-pel in both axes) and no residual: the decoded P
    frame must equal the §2.4.4.2 rounded four-point average
    (a+b+c+d+2)>>2 of the reference — pinning the interpolation path
    the even-search encoder never exercises."""
    from jagular_spark.operators.mpeg1 import (
        GOP_START,
        MB_P_CODES,
        PIC_START,
        SEQ_END,
        SEQ_START,
        _BitWriter,
        _encode_video,
        _write_addr_inc,
        _write_mv,
    )

    rng = np.random.default_rng(3)
    ref_frame = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    # 32x32 (2x2 macroblocks): MB(0,0) takes the odd vector, so its
    # 17x17 interpolation window stays inside the picture (a half-pel
    # vector whose window leaves the frame is non-conformant)
    bw = _BitWriter()
    bw.start_code(SEQ_START)
    bw.write(32, 12)
    bw.write(32, 12)
    bw.write(0b0001, 4)
    bw.write(0b0101, 4)
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(0, 1)  # no custom intra matrix
    bw.write(0, 1)
    bw.start_code(GOP_START)
    bw.write(0, 27)
    # splice: take the I picture from the real encoder's stream
    i_stream, recons = _encode_video([ref_frame], 1, 1, 0, None)
    i_pic_start = i_stream.index(b"\x00\x00\x01\x00")
    i_pic_end = i_stream.index(SEQ_END.to_bytes(4, "big"))
    prefix = bw.bytes()  # aligned
    bw2 = _BitWriter()
    bw2.start_code(PIC_START)
    bw2.write(1, 10)  # temporal_reference
    bw2.write(2, 3)  # P picture
    bw2.write(0xFFFF, 16)
    bw2.write(0, 1)  # full_pel_forward_vector = 0 -> half-pel units
    bw2.write(1, 3)  # forward_f_code = 1
    bw2.write(0, 1)
    for srow in range(2):
        bw2.start_code(0x00000101 + srow)
        bw2.write(1, 5)  # qscale
        bw2.write(0, 1)
        for col in range(2):
            _write_addr_inc(bw2, 1)
            bw2.write(*MB_P_CODES["mc"])  # MC, not coded
            if srow == 0 and col == 0:
                _write_mv(bw2, 1)  # horizontal +1 half-pel
                _write_mv(bw2, 1)  # vertical +1 half-pel
            elif srow == 0 and col == 1:
                _write_mv(bw2, -1)  # back to vector 0 (differential)
                _write_mv(bw2, -1)
            else:
                _write_mv(bw2, 0)
                _write_mv(bw2, 0)
    bw2.start_code(SEQ_END)
    stream = prefix + i_stream[i_pic_start:i_pic_end] + bw2.bytes()

    got, w, h = decode_mpeg1_video(stream)
    assert (w, h) == (32, 32) and len(got) == 2
    rec0 = recons[0].astype(np.int64)
    a = rec0[0:16, 0:16]
    b = rec0[0:16, 1:17]
    c = rec0[1:17, 0:16]
    d = rec0[1:17, 1:17]
    want = rec0.copy()
    want[0:16, 0:16] = (a + b + c + d + 2) >> 2  # §2.4.4.2 rounding
    assert np.array_equal(got[1].astype(np.int64), want)


def _moving_rgb(n=5, h=32, w=48, seed=11):
    rng = np.random.default_rng(seed)
    sprite = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    base = np.zeros((h, w, 3), dtype=np.uint8)
    base[..., 0] = (np.add.outer(np.arange(h), np.arange(w)) * 3) % 256
    base[..., 2] = 64
    frames = []
    for t in range(n):
        f = base.copy()
        f[8 : 8 + 16, 2 + t * 4 : 18 + t * 4] = sprite
        frames.append(f)
    return frames


def test_color_pframe_roundtrip_matches_internal_reconstruction():
    from jagular_spark.operators.mpeg1 import (
        decode_mpeg1_intra_color,
        encode_mpeg1_video_color,
        mpeg1_video_color_expected_reconstruction,
    )

    frames = _moving_rgb()
    data = encode_mpeg1_video_color(frames, qscale=2, intra_period=3)
    assert _picture_types(data) == [1, 2, 2, 1, 2]
    want = mpeg1_video_color_expected_reconstruction(
        frames, qscale=2, intra_period=3
    )
    got, w, h = decode_mpeg1_intra_color(data)
    assert (w, h) == (48, 32) and len(got) == 5
    for (gy, gcb, gcr), (wy, wcb, wcr) in zip(got, want):
        assert np.array_equal(gy, wy)
        assert np.array_equal(gcb, wcb)
        assert np.array_equal(gcr, wcr)


def test_color_pframe_chroma_residuals_really_coded():
    """A chroma-only scene change (constant luma, moving chroma) must
    still reconstruct bit-exactly — the CBP bits 2/1 carry real
    non-intra chroma residuals, not the gray path's empty blocks."""
    from jagular_spark.operators.mpeg1 import (
        decode_mpeg1_intra_color,
        encode_mpeg1_video_color,
        mpeg1_video_color_expected_reconstruction,
    )

    frames = []
    for t in range(4):
        f = np.zeros((32, 32, 3), dtype=np.uint8)
        f[..., 0] = 120  # near-constant luma
        f[..., 1] = 120
        f[:, 8 + t * 2 : 16 + t * 2, 2] = 240  # chroma stripe marches
        frames.append(f)
    data = encode_mpeg1_video_color(frames, qscale=1, intra_period=4)
    want = mpeg1_video_color_expected_reconstruction(
        frames, qscale=1, intra_period=4
    )
    got, _, _ = decode_mpeg1_intra_color(data)
    n_diff_cb = 0
    for (gy, gcb, gcr), (wy, wcb, wcr) in zip(got, want):
        assert np.array_equal(gy, wy)
        assert np.array_equal(gcb, wcb)
        assert np.array_equal(gcr, wcr)
    # the marching stripe really lives in chroma: consecutive decoded
    # cb planes must differ (else the test proves nothing)
    assert any(
        not np.array_equal(a[1], b[1]) for a, b in zip(got, got[1:])
    )


def test_fcode2_residual_vectors_decode_per_spec():
    """Hand-build a P picture with forward_f_code = 2: motion deltas
    carry a residual bit and reconstruct as sign·((|code|−1)·f +
    residual + 1) — a conformant-stream path the f_code=1 encoder
    never emits. The middle macroblock takes a −4 half-pel horizontal
    vector (motion_code −2, residual 1); its decode must equal the
    reference shifted left 2 full pels, neighbors co-located."""
    from jagular_spark.operators.mpeg1 import (
        GOP_START,
        MB_P_CODES,
        MV_CODES,
        PIC_START,
        SEQ_END,
        SEQ_START,
        _BitWriter,
        _encode_video,
        _write_addr_inc,
        decode_mpeg1_video,
    )

    rng = np.random.default_rng(4)
    ref_frame = rng.integers(0, 256, (16, 48), dtype=np.uint8)
    bw = _BitWriter()
    bw.start_code(SEQ_START)
    bw.write(48, 12)
    bw.write(16, 12)
    bw.write(0b0001, 4)
    bw.write(0b0101, 4)
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.start_code(GOP_START)
    bw.write(0, 27)
    i_stream, recons = _encode_video([ref_frame], 1, 1, 0, None)
    i_pic = i_stream[
        i_stream.index(b"\x00\x00\x01\x00") : i_stream.index(
            SEQ_END.to_bytes(4, "big")
        )
    ]
    bw2 = _BitWriter()
    bw2.start_code(PIC_START)
    bw2.write(1, 10)
    bw2.write(2, 3)  # P
    bw2.write(0xFFFF, 16)
    bw2.write(0, 1)  # full_pel = 0 (half-pel units)
    bw2.write(2, 3)  # forward_f_code = 2
    bw2.write(0, 1)
    bw2.start_code(0x00000101)
    bw2.write(1, 5)
    bw2.write(0, 1)

    def mv(code_mag, sign, residual):
        c, ln = MV_CODES[code_mag]
        bw2.write(c, ln)
        if code_mag:
            bw2.write(sign, 1)
            bw2.write(residual, 1)  # r_size = f_code - 1 = 1 bit

    for col in range(3):
        _write_addr_inc(bw2, 1)
        bw2.write(*MB_P_CODES["mc"])
        if col == 1:
            mv(2, 1, 1)  # horizontal: -((2-1)*2 + 1 + 1) = -4 half-pel
            mv(0, 0, 0)  # vertical 0 (no sign/residual after code 0)
        elif col == 2:
            mv(2, 0, 1)  # +4 differential -> back to vector 0
            mv(0, 0, 0)
        else:
            mv(0, 0, 0)
            mv(0, 0, 0)
    bw2.start_code(SEQ_END)
    stream = bw.bytes() + i_pic + bw2.bytes()

    got, w, h = decode_mpeg1_video(stream)
    assert (w, h) == (48, 16) and len(got) == 2
    rec0 = recons[0].astype(np.int64)
    want = rec0.copy()
    want[:, 16:32] = rec0[:, 14:30]  # -4 half-pel = -2 full-pel shift
    assert np.array_equal(got[1].astype(np.int64), want)


def test_addr_increment_escape_roundtrip():
    """macroblock_address_increment values above 33 use the escape
    code (each adds 33); the writer/reader pair must agree for every
    value a wide frame's skip run could produce. Driven directly (the
    scene tests never skip >33 MBs)."""
    from jagular_spark.operators.mpeg1 import (
        MB_ADDR_ESC,
        MB_STUFFING,
        _BitReader,
        _BitWriter,
        _MB_ADDR_DECODE,
        _write_addr_inc,
    )

    def read_inc(br):
        inc = 0
        while True:
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
            raise AssertionError("bad increment")

    values = list(range(1, 34)) + [34, 40, 66, 67, 99, 100, 133]
    bw = _BitWriter()
    for v in values:
        _write_addr_inc(bw, v)
    bw.write(1, 1)  # trailing guard bit so the last read can't overrun
    br = _BitReader(bw.bytes())
    got = [read_inc(br) for _ in values]
    assert got == values


def test_skip_run_over_33_uses_escape_end_to_end():
    """A 576-px-wide static P picture skips 34 interior macroblocks in
    one run — the final coded MB's address increment is 35, which the
    writer must emit as ESCAPE(+33) + code(2) and the real decoder
    must consume; parity stays bit-exact."""
    rng = np.random.default_rng(21)
    frame = rng.integers(0, 256, (16, 576), dtype=np.uint8)
    frames = [frame, frame]  # static -> pure skip run in the P picture
    data = encode_mpeg1_video(frames, qscale=2, intra_period=2)
    got, w, h = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(frames, qscale=2, intra_period=2)
    assert (w, h) == (576, 16) and _picture_types(data) == [1, 2]
    for g, x in zip(got, want):
        assert np.array_equal(g, x)
