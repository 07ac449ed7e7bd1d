"""MPEG-1 intra codec (operators/mpeg1.py, ISO 11172-2 I-frame
subset): roundtrip accuracy, syntax features (custom quant matrix, DC
DPCM chains, multi-frame GOP), and bitstream structure."""

import numpy as np
import pytest

from jagular_spark.operators.mpeg1 import (
    DEFAULT_INTRA_QUANT,
    GOP_START,
    PIC_START,
    SEQ_END,
    SEQ_START,
    decode_mpeg1_intra,
    encode_mpeg1_intra,
)


def _gradient(h, w):
    return (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(np.uint8)


def test_roundtrip_smooth_gradient_tight():
    f = _gradient(32, 48)
    frames, w, h = decode_mpeg1_intra(encode_mpeg1_intra([f], qscale=1))
    assert (w, h) == (48, 32) and len(frames) == 1
    assert np.abs(frames[0].astype(int) - f.astype(int)).max() <= 2


def test_roundtrip_noise_flat_matrix_bounded():
    rng = np.random.default_rng(11)
    f = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    flat = np.full(64, 16, dtype=np.int64)
    frames, _, _ = decode_mpeg1_intra(
        encode_mpeg1_intra([f], qscale=1, intra_quant=flat)
    )
    # flat-16 matrix at qscale 1: recon step 2 + oddification + IDCT
    # rounding -> small bounded error even on full-range noise
    assert np.abs(frames[0].astype(int) - f.astype(int)).max() <= 8


def test_multiframe_stream_and_padding():
    """Three frames, non-multiple-of-16 dims (edge-replicated pad must
    crop away), per-picture temporal references."""
    rng = np.random.default_rng(3)
    frames_in = [
        rng.integers(20, 200, size=(20, 30)).astype(np.uint8) for _ in range(3)
    ]
    enc = encode_mpeg1_intra(frames_in, qscale=1, intra_quant=np.full(64, 16))
    frames, w, h = decode_mpeg1_intra(enc)
    assert (w, h) == (30, 20) and len(frames) == 3
    for d, o in zip(frames, frames_in):
        assert d.shape == (20, 30)
        assert np.abs(d.astype(int) - o.astype(int)).max() <= 8


def test_stream_structure_and_compression():
    """Sequence header / GOP / picture start codes present, stream ends
    with sequence_end_code, and smooth content genuinely compresses."""
    f = _gradient(64, 64)
    enc = encode_mpeg1_intra([f, f, f, f], qscale=2)
    assert enc[:4] == SEQ_START.to_bytes(4, "big")
    assert GOP_START.to_bytes(4, "big") in enc
    assert enc.count(PIC_START.to_bytes(4, "big")) == 4
    assert enc[-4:] == SEQ_END.to_bytes(4, "big")
    assert len(enc) < 4 * 64 * 64  # smaller than raw

    # default matrix is the spec's §2.4.2.3 table
    assert DEFAULT_INTRA_QUANT[0] == 8 and DEFAULT_INTRA_QUANT[63] == 83


def test_custom_matrix_rides_the_stream():
    """The load_intra_quantizer_matrix path: a coarse custom matrix
    must change the decode (proving the decoder reads the shipped
    matrix, not the default)."""
    rng = np.random.default_rng(5)
    f = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    fine = decode_mpeg1_intra(
        encode_mpeg1_intra([f], intra_quant=np.full(64, 16))
    )[0][0]
    coarse = decode_mpeg1_intra(
        encode_mpeg1_intra([f], intra_quant=np.full(64, 128))
    )[0][0]
    err_fine = np.abs(fine.astype(int) - f.astype(int)).max()
    err_coarse = np.abs(coarse.astype(int) - f.astype(int)).max()
    assert err_fine < err_coarse


def test_qscale_validation_and_empty():
    with pytest.raises(ValueError):
        encode_mpeg1_intra([], qscale=1)
    with pytest.raises(ValueError):
        encode_mpeg1_intra([_gradient(16, 16)], qscale=0)
    with pytest.raises(ValueError):
        encode_mpeg1_intra([_gradient(16, 16)], qscale=32)


def test_determinism():
    rng = np.random.default_rng(9)
    f = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    assert encode_mpeg1_intra([f]) == encode_mpeg1_intra([f])


def test_color_roundtrip_real_chroma():
    """4:2:0 color path: decoded Y matches the JFIF luma and decoded
    half-res Cb/Cr match the encoder-side box-averaged references
    within the flat-16 quantizer bound; a saturated-color frame proves
    the chroma blocks carry real data (flat-128 stubs would miss by
    ~100)."""
    from jagular_spark.operators.jpeg import rgb_to_ycbcr
    from jagular_spark.operators.mpeg1 import (
        decode_mpeg1_intra_color,
        encode_mpeg1_intra_color,
    )

    rng = np.random.default_rng(13)
    noise = rng.integers(0, 256, size=(20, 30, 3)).astype(np.uint8)
    red = np.zeros((20, 30, 3), dtype=np.uint8)
    red[:, :, 0] = 220  # strongly chromatic: Cr ≈ 222, Cb ≈ 91
    flat = np.full(64, 16, dtype=np.int64)
    frames, w, h = decode_mpeg1_intra_color(
        encode_mpeg1_intra_color([noise, red], qscale=1, intra_quant=flat)
    )
    assert (w, h) == (30, 20) and len(frames) == 2
    ph, pw, ch, cw = 32, 32, 10, 15
    for planes, rgb in zip(frames, [noise, red]):
        y, cb, cr = rgb_to_ycbcr(rgb)
        pad = lambda p: np.pad(
            p.astype(np.float64), ((0, ph - 20), (0, pw - 30)), mode="edge"
        )
        down = lambda p: np.rint(
            pad(p).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        )
        assert np.abs(planes[0].astype(int) - y.astype(int)).max() <= 8
        assert np.abs(planes[1].astype(float) - down(cb)[:ch, :cw]).max() <= 8
        assert np.abs(planes[2].astype(float) - down(cr)[:ch, :cw]).max() <= 8
    # the red frame's chroma is far from 128 -> real chroma coding
    assert abs(int(frames[1][2].mean()) - 128) > 50
