"""MPEG-1 half-pel motion ESTIMATION (r13).

Through r12 the decoder implemented §2.4.4.2 half-pel interpolation
but the encoder never produced it (even full-pel search; only a
hand-built stream exercised the decode path). With ``half_pel=True``
the encoder runs a two-stage search (integer-pel coarse + 8 half-pel
refinements scored with the decoder's own _mc_block arithmetic), codes
vectors in half-pel units (full_pel picture bits 0), and derives
chroma vectors with the spec's truncating division — so the closed
loop now exercises the interpolation path end-to-end. Discipline as
ever: decode == encoder reconstruction BIT-EXACTLY, and the feature is
PROVEN to fire (odd vectors observed) on the exact geometry the driver
query uses.
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


def _halfpel_scene(n=6, h=32, w=32, seed=8):
    """Frames stepping by exactly HALF a row: even t = plain rows at
    offset t/2, odd t = the §2.4.4.2-rounded average of adjacent rows —
    motion no full-pel vector can express."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + n, w), dtype=np.uint8).astype(np.int64)
    frames = []
    for t in range(n):
        off = t // 2
        f = (
            base[off : off + h]
            if t % 2 == 0
            else (base[off : off + h] + base[off + 1 : off + h + 1] + 1) >> 1
        )
        frames.append(f.astype(np.uint8))
    return frames


def _record_searches(monkeypatch):
    log: list[tuple[int, int]] = []
    orig = mpeg1._motion_search_half

    def wrapper(ref, cur, y0, x0, search):
        r = orig(ref, cur, y0, x0, search)
        log.append((r[0], r[1]))
        return r

    monkeypatch.setattr(mpeg1, "_motion_search_half", wrapper)
    return log


@pytest.mark.parametrize("b_frames", [0, 1])
def test_halfpel_roundtrip_bit_exact(b_frames):
    frames = _halfpel_scene()
    data = encode_mpeg1_video(
        frames, qscale=2, intra_period=3, search=7, b_frames=b_frames,
        half_pel=True,
    )
    dec, w, h = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        frames, qscale=2, intra_period=3, search=7, b_frames=b_frames,
        half_pel=True,
    )
    assert (w, h) == (32, 32) and len(dec) == len(frames)
    for g, x in zip(dec, want):
        assert (g == x).all()


def test_halfpel_selects_odd_vectors_and_beats_fullpel(monkeypatch):
    """On true half-pel motion the search must CHOOSE odd vertical
    vectors (the interpolation path really runs), and the half-pel
    stream must be smaller than the best full-pel encoding of the same
    scene — the compression the feature exists for."""
    log = _record_searches(monkeypatch)
    frames = _halfpel_scene()
    data = encode_mpeg1_video(
        frames, qscale=2, intra_period=3, search=7, half_pel=True
    )
    assert any(hy % 2 == 1 for hy, _ in log), sorted(set(log))
    full = encode_mpeg1_video(frames, qscale=2, intra_period=3, search=6)
    assert len(data) < len(full), (len(data), len(full))


def test_corpus_geometry_selects_odd_vectors(monkeypatch):
    """The docs_media_mpeg1_halfpel construction — 32x8 ASCII-byte
    frames stepping half a row — must make the encoder pick odd
    vertical vectors on corpus-like content (r12 vacuity discipline:
    the driver's green hash has to certify interpolation that RAN)."""
    log = _record_searches(monkeypatch)
    rng = np.random.default_rng(12)
    buf = rng.integers(32, 127, 8 * 40, dtype=np.uint8)
    grid = buf.reshape(40, 8).astype(np.int64)
    nf = 2 * 40 - 63
    origs = []
    for t in range(nf):
        off = t // 2
        f = (
            grid[off : off + 32]
            if t % 2 == 0
            else (grid[off : off + 32] + grid[off + 1 : off + 33] + 1) >> 1
        )
        origs.append(f.astype(np.uint8))
    flat = np.full(64, 16, dtype=np.int64)
    data = encode_mpeg1_video(
        origs, qscale=1, intra_period=4, search=7, intra_quant=flat,
        half_pel=True,
    )
    assert any(hy % 2 == 1 for hy, _ in log), sorted(set(log))
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        origs, qscale=1, intra_period=4, search=7, intra_quant=flat,
        half_pel=True,
    )
    assert all((g == e).all() for g, e in zip(dec, want))
    # tolerance vs ORIGINALS too — the query's frame_ok conjunct
    assert all(
        np.abs(g.astype(int) - o.astype(int)).max() <= 8
        for g, o in zip(dec, origs)
    )


def test_halfpel_color_roundtrip_bit_exact():
    frames = _halfpel_scene(5)
    rgb = [
        np.stack([f, 255 - f, np.roll(f, 1, axis=1)], axis=-1).astype(np.uint8)
        for f in frames
    ]
    data = encode_mpeg1_video_color(
        rgb, qscale=2, intra_period=2, search=7, b_frames=1, half_pel=True
    )
    dec, _, _ = decode_mpeg1_intra_color(data)
    want = mpeg1_video_color_expected_reconstruction(
        rgb, qscale=2, intra_period=2, search=7, b_frames=1, half_pel=True
    )
    assert len(dec) == 5
    for (gy, gcb, gcr), (ey, ecb, ecr) in zip(dec, want):
        assert (gy == ey).all() and (gcb == ecb).all() and (gcr == ecr).all()


def test_halfpel_search_validation():
    frames = _halfpel_scene(2)
    with pytest.raises(ValueError, match="half_pel search"):
        encode_mpeg1_video(frames, search=8, half_pel=True)
    # full-pel rules unchanged
    with pytest.raises(ValueError, match="even"):
        encode_mpeg1_video(frames, search=7)


def test_fullpel_streams_unchanged_by_halfpel_support():
    """half_pel=False must stay byte-identical to the r12/r13-B
    encoder (the _mc_block unification of the P/B prediction paths is
    a pure refactor for even vectors)."""
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (64, 48), dtype=np.uint8)
    frames = [base[i * 4 : i * 4 + 32, :32].copy() for i in range(6)]
    a = encode_mpeg1_video(frames, qscale=2, intra_period=3, b_frames=1)
    b = encode_mpeg1_video(
        frames, qscale=2, intra_period=3, b_frames=1, half_pel=False
    )
    assert a == b


def test_negative_halfpel_vectors_roundtrip():
    """Upward/leftward half-pel motion: negative odd vectors exercise
    the truncating-toward-zero chroma division on the negative side."""
    frames = list(reversed(_halfpel_scene(6)))
    data = encode_mpeg1_video(
        frames, qscale=2, intra_period=3, search=7, half_pel=True
    )
    dec, _, _ = decode_mpeg1_video(data)
    want = mpeg1_video_expected_reconstruction(
        frames, qscale=2, intra_period=3, search=7, half_pel=True
    )
    assert all((g == e).all() for g, e in zip(dec, want))
