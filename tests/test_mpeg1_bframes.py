"""MPEG-1 B pictures (ISO 11172-2 §2.4.4.3 bidirectional prediction).

Same discipline as the P-frame suite: decode must equal the encoder's
closed-loop internal reconstruction BIT-EXACTLY (display order), every
macroblock mode must be PROVABLY exercised (the r12 vacuity lesson —
a green roundtrip over modes that never fire certifies nothing), and
the un-P-like decoder semantics (skip reuses the previous macroblock's
vectors instead of resetting, per-direction vector predictors, the
§2.4.4.4 rounded interpolation) get a hand-built stream pin that does
not trust the encoder.

Reference for WHAT to compute: the reference repo has no video I/O at
all — this is beyond-reference surface; the spec is the public
ISO 11172-2 text.
"""

from __future__ import annotations

import numpy as np
import pytest

from jagular_spark.operators import mpeg1
from jagular_spark.operators.mpeg1 import (
    decode_mpeg1_intra_color,
    decode_mpeg1_video,
    encode_mpeg1_video,
    encode_mpeg1_video_color,
    mpeg1_video_color_expected_reconstruction,
    mpeg1_video_expected_reconstruction,
)

from tests.test_mpeg1_pframes import _moving_scene, _picture_types


class _Recorder(dict):
    """MB_B_CODES stand-in that logs every macroblock type the encoder
    emits — mode-coverage proof without a bitstream parser."""

    def __init__(self, base, log):
        super().__init__(base)
        self.log = log

    def __getitem__(self, k):
        self.log.append(k)
        return super().__getitem__(k)


def _record_b_modes(monkeypatch):
    log: list[str] = []
    monkeypatch.setattr(mpeg1, "MB_B_CODES", _Recorder(mpeg1.MB_B_CODES, log))
    return log


def test_bframe_roundtrip_matches_internal_reconstruction():
    frames = _moving_scene(7)
    data = encode_mpeg1_video(frames, qscale=2, intra_period=3, b_frames=2)
    dec, w, h = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        frames, qscale=2, intra_period=3, b_frames=2
    )
    assert (w, h) == (64, 48) and len(dec) == 7
    for g, x in zip(dec, want):
        assert (g == x).all()
    # transmission order: anchors at display 0,3,6 (I at anchor 0,
    # then P,P — intra_period counts ANCHORS), each non-first anchor
    # followed by its 2 Bs
    assert _picture_types(data) == [1, 2, 3, 3, 2, 3, 3]


def test_bframe_display_order_tracks_source():
    """The decoder's reorder (B emitted immediately, anchors when
    superseded) must yield DISPLAY order: decoded frame i matches
    source frame i far better than any neighbor — a swapped pair would
    show the sprite 2·dx/2·dy away."""
    frames = _moving_scene(6, dx=6, dy=0)
    data = encode_mpeg1_video(frames, qscale=1, intra_period=2, b_frames=1)
    dec, _, _ = decode_mpeg1_video(data)
    assert len(dec) == 6
    for i, d in enumerate(dec):
        own = np.abs(d.astype(int) - frames[i].astype(int)).mean()
        for j in (i - 1, i + 1):
            if 0 <= j < 6:
                other = np.abs(d.astype(int) - frames[j].astype(int)).mean()
                assert own < other, (i, j, own, other)


def test_forward_mode_fires_when_b_equals_past_anchor(monkeypatch):
    log = _record_b_modes(monkeypatch)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    y = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    # display [X, X, Y]: the B (t=1) IS the past anchor -> forward
    # prediction is (near-)perfect, backward is noise
    data = encode_mpeg1_video([x, x, y], qscale=2, intra_period=1, b_frames=1)
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        [x, x, y], qscale=2, intra_period=1, b_frames=1
    )
    assert all((g == e).all() for g, e in zip(dec, want))
    used = {m.removesuffix("_coded") for m in log}
    assert "fwd" in used and "bwd" not in used and "interp" not in used


def test_backward_mode_fires_on_scene_cut(monkeypatch):
    """B identical to the FUTURE anchor (a scene cut lands on the B):
    backward prediction wins — the capability P pictures cannot
    express at all."""
    log = _record_b_modes(monkeypatch)
    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    y = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    data = encode_mpeg1_video([x, y, y], qscale=2, intra_period=1, b_frames=1)
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        [x, y, y], qscale=2, intra_period=1, b_frames=1
    )
    assert all((g == e).all() for g, e in zip(dec, want))
    used = {m.removesuffix("_coded") for m in log}
    assert "bwd" in used and "fwd" not in used


def test_interpolated_mode_fires_on_crossfade(monkeypatch):
    """B = the rounded average of the two anchors: neither single
    direction predicts it, the §2.4.4.4 interpolation nails it."""
    log = _record_b_modes(monkeypatch)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (32, 32), dtype=np.int64)
    y = rng.integers(0, 256, (32, 32), dtype=np.int64)
    mid = ((x + y + 1) >> 1).astype(np.uint8)
    seq = [x.astype(np.uint8), mid, y.astype(np.uint8)]
    data = encode_mpeg1_video(seq, qscale=2, intra_period=1, b_frames=1)
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        seq, qscale=2, intra_period=1, b_frames=1
    )
    assert all((g == e).all() for g, e in zip(dec, want))
    used = {m.removesuffix("_coded") for m in log}
    assert "interp" in used and "fwd" not in used and "bwd" not in used


def test_intra_fallback_fires_in_b_picture(monkeypatch):
    """A B unrelated to EITHER anchor (cut in and out) falls back to
    intra macroblocks — and stays bit-exact."""
    log = _record_b_modes(monkeypatch)
    rng = np.random.default_rng(6)
    x = np.full((32, 32), 128, dtype=np.uint8)
    alien = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    data = encode_mpeg1_video([x, alien, x], qscale=2, intra_period=1, b_frames=1)
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        [x, alien, x], qscale=2, intra_period=1, b_frames=1
    )
    assert all((g == e).all() for g, e in zip(dec, want))
    assert "intra" in log


def test_static_scene_b_pictures_compress_via_skips(monkeypatch):
    """Identical frames: every interior B macroblock repeats the
    previous one's (zero-vector) prediction — skips make each B
    picture tiny, and the type log shows only the per-row first/last
    macroblocks were transmitted."""
    log = _record_b_modes(monkeypatch)
    f = (np.add.outer(np.arange(48), np.arange(64)) % 251).astype(np.uint8)
    frames = [f.copy() for _ in range(5)]
    data = encode_mpeg1_video(frames, qscale=1, intra_period=1, b_frames=3)
    # 3 B pictures x 3 slice rows x (first + last MB transmitted, the
    # 2 interior MBs of each 4-MB row skipped)
    assert len(log) == 3 * 3 * 2
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        frames, qscale=1, intra_period=1, b_frames=3
    )
    assert all((g == e).all() for g, e in zip(dec, want))
    assert set(log) <= {"fwd", "fwd_coded"}
    # the skip runs must actually be in the stream: each B picture is
    # far smaller than the I anchors
    types = _picture_types(data)
    assert types == [1, 1, 3, 3, 3]


def test_b_without_two_anchors_rejected():
    """A conformance guard the old 'rejects B' test becomes: a B
    picture arriving before TWO anchors exist must fail loudly."""
    frames = _moving_scene(2)

    def flip_to_b(data: bytes, which: int) -> bytes:
        data = bytearray(data)
        idx = 7
        for _ in range(which + 1):
            idx = data.index(b"\x00\x00\x01\x00", idx + 1)
        b = (data[idx + 4] << 8) | data[idx + 5]
        b = (b & ~(0b111 << 3)) | (3 << 3)
        data[idx + 4], data[idx + 5] = b >> 8, b & 0xFF
        return bytes(data)

    base = encode_mpeg1_video(frames, intra_period=1)
    # FIRST picture flipped: no reference at all
    with pytest.raises(ValueError, match="no reference"):
        decode_mpeg1_video(flip_to_b(base, 0))
    # SECOND picture flipped: one anchor decoded, B needs two
    with pytest.raises(ValueError, match="two decoded anchors"):
        decode_mpeg1_video(flip_to_b(base, 1))


def test_handbuilt_b_stream_pins_skip_reuse_and_interp_rounding():
    """Decoder-only pin (does not trust the encoder): two I anchors
    from the encoder, then a HAND-BUILT B picture whose 3 macroblocks
    exercise exactly the semantics that differ from P —

    MB0  'fwd', forward vector (0,+2) coded as a differential;
    MB1  SKIPPED: §2.4.4.3 says it reuses MB0's direction AND vector
         (0,+2) — P semantics (reset to zero) would decode the
         co-located block instead;
    MB2  'interp' with forward differential −2 (back to vector (0,0))
         and backward vector (0,0): §2.4.4.4 average
         (fwd + bwd + 1) >> 1 of the two anchor blocks.

    Expected pixels are computed here with numpy from the DECODED
    anchors; any deviation in vector predictor handling, skip reuse,
    or interpolation rounding fails."""
    from jagular_spark.operators.mpeg1 import (
        PIC_START,
        SEQ_END,
        _BitWriter,
        _fold_mv,
        _write_mv,
        MB_B_CODES,
    )

    rng = np.random.default_rng(9)
    x = rng.integers(0, 256, (16, 48), dtype=np.uint8)
    y = rng.integers(0, 256, (16, 48), dtype=np.uint8)
    base = encode_mpeg1_video([x, y], qscale=1, intra_period=1)
    assert base.endswith(b"\x00\x00\x01\xb7")
    bw = _BitWriter()
    bw.start_code(PIC_START)
    bw.write(1, 10)  # temporal_reference (display position 1)
    bw.write(3, 3)  # B picture
    bw.write(0xFFFF, 16)
    bw.write(1, 1)  # full_pel_forward_vector
    bw.write(1, 3)  # forward_f_code
    bw.write(1, 1)  # full_pel_backward_vector
    bw.write(1, 3)  # backward_f_code
    bw.write(0, 1)
    bw.start_code(0x00000101)  # slice 1
    bw.write(1, 5)  # quantizer_scale
    bw.write(0, 1)
    # MB0: fwd, vector (y=0, x=+2) — horizontal differential first
    bw.write(0b1, 1)  # addr inc 1
    bw.write(*MB_B_CODES["fwd"])
    _write_mv(bw, _fold_mv(2))
    _write_mv(bw, _fold_mv(0))
    # MB1: skipped (addr inc 2 before MB2)
    bw.write(0b011, 3)  # addr inc 2
    bw.write(*MB_B_CODES["interp"])
    _write_mv(bw, _fold_mv(-2))  # fwd back to (0, 0)
    _write_mv(bw, _fold_mv(0))
    _write_mv(bw, _fold_mv(0))  # bwd (0, 0)
    _write_mv(bw, _fold_mv(0))
    bw.start_code(SEQ_END)
    stream = base[:-4] + bw.bytes()

    frames, w, h = decode_mpeg1_video(stream)
    assert (w, h) == (48, 16) and len(frames) == 3
    xa = frames[0].astype(np.int64)  # decoded anchors, display order
    ya = frames[2].astype(np.int64)
    bframe = frames[1].astype(np.int64)
    # MB0: forward (0,+2)
    assert (bframe[:, 0:16] == xa[:, 2:18]).all()
    # MB1 skipped: REUSES (0,+2) — the P-style zero-vector copy would
    # be xa[:, 16:32]
    assert (bframe[:, 16:32] == xa[:, 18:34]).all()
    assert not (xa[:, 18:34] == xa[:, 16:32]).all()  # the pin has teeth
    # MB2: interpolated average of the two anchors at (0,0)
    assert (bframe[:, 32:48] == ((xa[:, 32:48] + ya[:, 32:48] + 1) >> 1)).all()


def test_color_bframe_roundtrip_bit_exact():
    frames = _moving_scene(5)
    rgb = [
        np.stack([f, 255 - f, np.roll(f, 3, axis=1)], axis=-1).astype(np.uint8)
        for f in frames
    ]
    data = encode_mpeg1_video_color(rgb, qscale=2, intra_period=2, b_frames=1)
    dec, w, h = decode_mpeg1_intra_color(data)
    want = mpeg1_video_color_expected_reconstruction(
        rgb, qscale=2, intra_period=2, b_frames=1
    )
    assert len(dec) == 5
    for (gy, gcb, gcr), (ey, ecb, ecr) in zip(dec, want):
        assert (gy == ey).all() and (gcb == ecb).all() and (gcr == ecr).all()
    # anchors 0,2,4 -> I,P,I (every 2nd ANCHOR intra), Bs after each
    assert _picture_types(data) == [1, 2, 3, 1, 3]


def test_ip_streams_unchanged_by_b_support():
    """b_frames=0 must produce byte-identical streams to the r12
    encoder path (the anchor extraction is a pure refactor)."""
    frames = _moving_scene(5)
    a = encode_mpeg1_video(frames, qscale=2, intra_period=3)
    b = encode_mpeg1_video(frames, qscale=2, intra_period=3, b_frames=0)
    assert a == b
    assert _picture_types(a) == [1, 2, 2, 1, 2]


def test_corpus_geometry_forces_both_directions(monkeypatch):
    """The driver query's geometry (32x8 frames cut at an 8-row
    overlap stride) must make every B picture use BOTH directions:
    the top macroblock's match exists only in the PAST anchor (dy=+8;
    the future anchor's match would be above the plane) and the bottom
    macroblock's only in the FUTURE anchor (dy=-8) — so a green
    hash-verified row certifies genuine bidirectional prediction, not
    a mode that never fires (r12 vacuity discipline)."""
    log = _record_b_modes(monkeypatch)
    rng = np.random.default_rng(12)
    buf = rng.integers(32, 127, 256 + 6 * 64, dtype=np.uint8)  # ASCII-ish
    frames = [buf[i * 64 : i * 64 + 256].reshape(32, 8) for i in range(7)]
    data = encode_mpeg1_video(
        frames, qscale=1, intra_period=3,
        intra_quant=np.full(64, 16, dtype=np.int64), b_frames=1,
    )
    used = {m.removesuffix("_coded").removesuffix("_q") for m in log}
    assert "fwd" in used, used
    assert "bwd" in used, used
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        frames, qscale=1, intra_period=3,
        intra_quant=np.full(64, 16, dtype=np.int64), b_frames=1,
    )
    assert all((g == e).all() for g, e in zip(dec, want))
