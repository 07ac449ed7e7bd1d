"""Spec-level tests for the G.711 mu-law and IMA ADPCM codecs
(operators/audio_codecs.py): known vectors, exhaustive agreement with
an independent scalar implementation, the codecs' own invariants, and
the Arrow-kernel operators' end-to-end behavior."""

from __future__ import annotations

import numpy as np

from jagular_spark.operators.audio_codecs import (
    IMA_STEP_TABLE,
    adpcm_ima_decode,
    adpcm_ima_encode,
    mulaw_decode,
    mulaw_encode,
)


# Independent scalar G.711 implementation, written directly from the
# spec description — the cross-check for the vectorized codec.
def _enc_scalar(x: int) -> int:
    s = 0x80 if x < 0 else 0
    m = min(abs(x), 32635) + 132
    e = (m >> 7).bit_length() - 1
    mant = (m >> (e + 3)) & 0xF
    return ~(s | (e << 4) | mant) & 0xFF


def _dec_scalar(c: int) -> int:
    c = ~c & 0xFF
    e = (c >> 4) & 7
    m = c & 0xF
    t = (((m << 3) + 132) << e) - 132
    return -t if c & 0x80 else t


def test_mulaw_known_vectors():
    # the three corner codes every G.711 table lists
    assert int(mulaw_encode(np.array([0]))[0]) == 0xFF
    assert int(mulaw_encode(np.array([32767]))[0]) == 0x80
    assert int(mulaw_encode(np.array([-32768]))[0]) == 0x00
    # sign symmetry: encode(-x) = encode(x) ^ 0x80 for x > 0
    xs = np.array([1, 100, 1000, 30000], dtype=np.int32)
    assert np.array_equal(
        mulaw_encode(-xs), mulaw_encode(xs) ^ np.uint8(0x80)
    )


def test_mulaw_exhaustive_vs_scalar():
    """Every int16 input encodes — and every code decodes — exactly as
    the independent scalar spec implementation says."""
    xs = np.arange(-32768, 32768, dtype=np.int16)
    ref = np.array([_enc_scalar(int(v)) for v in xs], dtype=np.uint8)
    assert np.array_equal(mulaw_encode(xs), ref)
    cs = np.arange(256, dtype=np.uint8)
    refd = np.array([_dec_scalar(int(c)) for c in cs], dtype=np.int16)
    assert np.array_equal(mulaw_decode(cs), refd)


def test_mulaw_canonical_and_error_bound():
    """encode(decode(c)) == c for every code except the inherent
    negative-zero alias (0x7F decodes to 0, which re-encodes as the
    positive zero 0xFF); roundtrip error is bounded by the top-chord
    half step (4 << 7 = 512) on the non-clipped range."""
    cs = np.arange(256, dtype=np.uint8)
    re = mulaw_encode(mulaw_decode(cs).astype(np.int32))
    bad = np.nonzero(re != cs)[0]
    assert list(cs[bad]) == [0x7F] and int(re[bad[0]]) == 0xFF
    xs = np.arange(-32635, 32636, dtype=np.int32)
    err = np.abs(mulaw_decode(mulaw_encode(xs)).astype(np.int64) - xs)
    assert int(err.max()) <= 512


def test_adpcm_hand_vector():
    """First sample 100 from (predictor=0, index=0, step=7): spec
    arithmetic gives nibble 7 (100>=7 -> |4; 93>=3 -> |2; 90>=1 -> |1),
    diffq = 0+7+3+1 = 11, predictor 11, index 0+8=8, step 16."""
    data, recon = adpcm_ima_encode(np.array([100], dtype=np.int16))
    assert data == b"\x07"
    assert list(recon) == [11]
    assert IMA_STEP_TABLE[8] == 16


def test_adpcm_decode_matches_encoder_reconstruction():
    """The codec's defining invariant: the decoder, re-running the
    predictor recursion from the nibble stream, reproduces the
    encoder's internal reconstruction BIT-EXACTLY — for random input,
    clamp-stressing extremes, and odd lengths (pad nibble trimmed)."""
    rng = np.random.default_rng(7)
    for n in (1, 2, 33, 1000):
        x = rng.integers(-32768, 32768, n).astype(np.int16)
        data, recon = adpcm_ima_encode(x)
        assert len(data) == (n + 1) // 2
        assert np.array_equal(adpcm_ima_decode(data, n), recon)
    x = np.tile(np.array([32767, -32768], dtype=np.int16), 500)
    data, recon = adpcm_ima_encode(x)
    assert np.array_equal(adpcm_ima_decode(data, len(x)), recon)


def test_adpcm_tracks_smooth_signal():
    """On a slowly varying signal the adaptive step keeps the
    reconstruction close — sanity that the codec compresses rather
    than just passing the invariant."""
    t = np.arange(2000)
    x = (3000 * np.sin(t / 50.0)).astype(np.int16)
    data, recon = adpcm_ima_encode(x)
    assert len(data) == 1000  # 4 bits/sample
    err = np.abs(recon.astype(np.int64) - x.astype(np.int64))
    # after the initial attack the tracker stays within a few steps
    assert float(err[200:].mean()) < 200.0


def test_audio_window_features_decodes_compressed_codecs(spark):
    """The production audio feature kernel decodes real ulaw and
    adpcm_ima payloads: features computed from the compressed stream
    match the features of the decoded samples computed directly."""
    from jagular_spark.operators.audio_codecs import (
        adpcm_ima_encode,
        mulaw_encode,
    )
    from jagular_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_window_features,
    )

    rng = np.random.default_rng(11)
    pcm = (rng.integers(-90, 90, 256) * 256).astype(np.int16)
    ulaw = mulaw_encode(pcm).tobytes()
    adpcm, recon = adpcm_ima_encode(pcm)
    rows = [
        (1, "audio", "ulaw", bytearray(ulaw), 0, 0, len(pcm), 8000),
        (2, "audio", "adpcm_ima", bytearray(adpcm), 0, 0, len(pcm), 8000),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r.media_id, r.window_idx): r
        for r in audio_window_features(df, window=128).collect()
    }
    assert set(got) == {(1, 0), (1, 1), (2, 0), (2, 1)}
    from jagular_spark.operators.audio_codecs import mulaw_decode

    for mid, samples in ((1, mulaw_decode(np.frombuffer(ulaw, np.uint8))), (2, recon)):
        c = samples.astype(np.float64) / 32768.0
        for wi in (0, 1):
            seg = c[wi * 128 : (wi + 1) * 128]
            r = got[(mid, wi)]
            assert abs(r.rms - float(np.sqrt((seg**2).mean()))) < 1e-12
            assert abs(r.peak - float(np.abs(seg).max())) < 1e-12


def test_roundtrip_operators_end_to_end(spark):
    """Both Arrow-kernel operators over a tiny media frame: schema,
    window math, rate law and the decode_exact invariant."""
    from pyspark.sql import functions as F

    from jagular_spark.operators.audio_codecs import (
        adpcm_roundtrip_stats,
        mulaw_roundtrip_stats,
    )

    rows = [(1, "abcdefgh" * 8), (2, "z" * 33), (3, "xy")]
    docs = spark.createDataFrame(rows, "media_id long, text string")
    media = docs.select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    mu = mulaw_roundtrip_stats(media, window=32).collect()
    # media 1: 64 bytes -> 2 windows; media 2: 33 -> 1; media 3: none
    assert sorted((r.media_id, r.window_idx) for r in mu) == [(1, 0), (1, 1), (2, 0)]
    for r in mu:
        assert r.sum_dec2 > 0 and r.peak_dec > 0 and 0.0 < r.rms < 1.0
        assert r.sum_err2 >= 0
    ad = {r.media_id: r for r in adpcm_roundtrip_stats(media).collect()}
    assert set(ad) == {1, 2, 3}
    for mid, text in rows:
        r = ad[mid]
        assert r.n_samples == len(text)
        assert r.n_adpcm_bytes == (len(text) + 1) // 2
        assert r.decode_exact is True
        o = (np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64) - 128) * 256
        assert r.orig_sum == int(o.sum()) and r.orig_peak == int(np.abs(o).max())
