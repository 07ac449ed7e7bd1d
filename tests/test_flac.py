"""FLAC codec: lossless roundtrips across signal shapes and stereo
decorrelation modes, CRC enforcement, spec details (UTF-8 frame
numbers, Rice escape partitions), and the Spark operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from jagular_spark.operators.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac_pcm16,
)


def test_lossless_roundtrip_mono_shapes():
    rng = np.random.default_rng(7)
    for x in (
        rng.integers(-32768, 32768, 1000).astype(np.int16),  # white noise
        (np.sin(np.linspace(0, 50, 9000)) * 12000).astype(np.int16),  # smooth
        np.full(5000, -123, dtype=np.int16),  # constant (multi-block)
        rng.integers(-200, 200, 10000).astype(np.int16),  # low amplitude
        np.array([5], dtype=np.int16),  # single sample
        np.tile(np.array([32767, -32768], dtype=np.int16), 3000),  # extremes
    ):
        y, sr = decode_flac(encode_flac_pcm16(x, 16000))
        assert sr == 16000
        assert y.shape == x.shape and (y == x.astype(np.int64)).all()


def test_lossless_roundtrip_stereo_and_mid_side():
    rng = np.random.default_rng(8)
    st = np.stack(
        [
            (np.sin(np.linspace(0, 30, 6000)) * 9000).astype(np.int16),
            rng.integers(-5000, 5000, 6000).astype(np.int16),
        ],
        axis=1,
    )
    for ms in (False, True):
        y, sr = decode_flac(encode_flac_pcm16(st, 44100, mid_side=ms))
        assert sr == 44100
        assert y.shape == st.shape and (y == st.astype(np.int64)).all(), ms


def test_actually_compresses_smooth_audio():
    """Fixed predictors + Rice must beat raw PCM by a wide margin on
    smooth signals — a do-nothing 'verbatim' encoder fails this."""
    smooth = (np.sin(np.linspace(0, 50, 9000)) * 12000).astype(np.int16)
    p = encode_flac_pcm16(smooth)
    assert len(p) < 0.4 * 2 * len(smooth)


def test_streaminfo_and_magic():
    x = np.arange(100, dtype=np.int16)
    p = encode_flac_pcm16(x, 22050)
    assert p[:4] == b"fLaC"
    assert p[4] & 0x80  # STREAMINFO marked last metadata block
    # total samples (36 bits at the end of the fixed fields)
    y, sr = decode_flac(p)
    assert sr == 22050 and len(y) == 100


def test_crc_enforced():
    x = np.arange(2000, dtype=np.int16)
    p = bytearray(encode_flac_pcm16(x))
    p[-1] ^= 0xFF  # corrupt the final frame's CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(p))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFnotflac")


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 known vectors ("123456789")
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_many_frames_utf8_numbers():
    """>128 frames forces multi-byte UTF-8 frame numbers."""
    rng = np.random.default_rng(9)
    x = rng.integers(-300, 300, 200 * 256).astype(np.int16)
    y, _ = decode_flac(encode_flac_pcm16(x, block_size=256))
    assert (y == x.astype(np.int64)).all()


def test_flac_operator_and_audio_features(spark):
    """flac_roundtrip_byte_stats matches the raw-byte math exactly, and
    audio_window_features decodes codec='flac' payloads."""
    from jagular_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_window_features,
        flac_roundtrip_byte_stats,
    )

    rng = np.random.default_rng(10)
    raw = rng.integers(0, 256, 256, dtype=np.uint8)
    rows = [(1, "audio", "raw8", bytearray(raw.tobytes()), 0, 0, 0, 8000)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.window_idx: r for r in flac_roundtrip_byte_stats(df, window=64).collect()}
    dev = raw.astype(np.int64) - 128
    for i in range(4):
        seg = dev[i * 64 : (i + 1) * 64]
        assert got[i].sum_dev2 == int((seg * seg).sum())
        assert got[i].peak_dev == int(np.abs(seg).max())

    pcm = (rng.integers(-90, 90, 256) * 256).astype(np.int16)
    payload = encode_flac_pcm16(pcm, 8000)
    rows = [(2, "audio", "flac", bytearray(payload), 0, 0, len(pcm), 8000)]
    df2 = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.window_idx: r for r in audio_window_features(df2, window=128).collect()}
    c = pcm.astype(np.float64) / 32768.0
    for i in (0, 1):
        seg = c[i * 128 : (i + 1) * 128]
        assert abs(feats[i].rms - float(np.sqrt((seg**2).mean()))) < 1e-12
