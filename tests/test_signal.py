"""Signal chain vs in-core scipy/numpy oracles (SURVEY §5 plan #1/#2/#5).

Key invariants:
- chunked (halo) filtering == unchunked sosfiltfilt (filtering.py:148-161)
- censor doctest vector [110,111,112,120,270,271,280] w=30 → [110,270]
- detect_spikes recovers injected ground-truth spikes
- parabola frac peak matches the closed-form oracle
"""

from __future__ import annotations

import numpy as np
import pytest

from jagular_spark.operators.alignment import align_waveforms, argmin_index, with_frac_peak
from jagular_spark.operators.filtering import (
    butter_bandpass_sos,
    common_reference_packets,
    filtfilt_chunked,
    filtfilt_segments,
)
from jagular_spark.operators.spikes import censor, crossings, detect_spikes, mad_threshold
from jagular_spark.operators.timestamps import contiguous_segments

FS = 3000.0


def _signal_df(spark, values, channel=0, segment=0, ts0=0):
    rows = [(channel, segment, ts0 + i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "channel_id int, segment_id long, ts long, value double")


@pytest.fixture(scope="module")
def noisy_signal():
    rng = np.random.default_rng(42)
    n = 12000
    x = rng.normal(0, 10.0, n)
    x += 40.0 * np.sin(2 * np.pi * 8.0 * np.arange(n) / FS)  # 8 Hz interference
    return x


def test_filtfilt_segments_matches_incore(spark, noisy_signal):
    from jagular_spark.dsp import sosfiltfilt

    sos = butter_bandpass_sos(FS, 300.0, 1400.0)
    df = _signal_df(spark, noisy_signal)
    got = (
        filtfilt_segments(df, sos)
        .orderBy("ts")
        .select("filtered")
        .toPandas()["filtered"]
        .to_numpy()
    )
    want = sosfiltfilt(sos, noisy_signal)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("buffer_len,overlap_len", [(4000, 1200), (2048, 1024)])
def test_filtfilt_chunked_equals_unchunked(spark, noisy_signal, buffer_len, overlap_len):
    """The halo invariant: chunked output == whole-epoch sosfiltfilt
    away from epoch edges (interior seams must be exact to tolerance)."""
    from jagular_spark.dsp import sosfiltfilt

    sos = butter_bandpass_sos(FS, 300.0, 1400.0)
    df = _signal_df(spark, noisy_signal)
    segments = contiguous_segments(df, step=1, partition_cols=["channel_id"]).withColumnRenamed(
        "segment_id", "segment_id"
    )
    got = (
        filtfilt_chunked(
            df, sos, segments, buffer_len=buffer_len, overlap_len=overlap_len
        )
        .orderBy("ts")
        .select("filtered")
        .toPandas()["filtered"]
        .to_numpy()
    )
    want = sosfiltfilt(sos, noisy_signal)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_filtfilt_chunked_derives_segments_via_window(spark, noisy_signal):
    """segments=None: seg starts come from a min-over-window on the same
    clustering — results identical to the explicit-segments path."""
    from jagular_spark.dsp import sosfiltfilt

    sos = butter_bandpass_sos(FS, 300.0, 1400.0)
    # non-zero ts origin + a second shifted segment exercise rn derivation
    df = _signal_df(spark, noisy_signal[:6000], segment=0, ts0=500).unionByName(
        _signal_df(spark, noisy_signal[6000:], segment=1, ts0=9000)
    )
    got = (
        filtfilt_chunked(df, sos, buffer_len=2048, overlap_len=1024)
        .orderBy("segment_id", "ts")
        .select("filtered")
        .toPandas()["filtered"]
        .to_numpy()
    )
    want = np.concatenate(
        [sosfiltfilt(sos, noisy_signal[:6000]), sosfiltfilt(sos, noisy_signal[6000:])]
    )
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_censor_doctest_vector(spark):
    ts = [110, 111, 112, 120, 270, 271, 280]
    df = spark.createDataFrame(
        [(0, 0, t) for t in ts], "channel_id int, segment_id long, ts long"
    )
    out = censor(df, width=30).orderBy("ts").collect()
    assert [r.ts for r in out] == [110, 270]


def test_censor_boundary_is_exclusive(spark):
    # reference keeps only sample > last_kept + width (jagular/spikes.py:335):
    # an edge exactly `width` after the last kept edge is censored
    df = spark.createDataFrame(
        [(0, 0, 100), (0, 0, 130), (0, 0, 131)],
        "channel_id int, segment_id long, ts long",
    )
    out = censor(df, width=30).orderBy("ts").collect()
    assert [r.ts for r in out] == [100, 131]


def test_mad_threshold_matches_numpy(spark, noisy_signal):
    df = _signal_df(spark, noisy_signal)
    got = mad_threshold(df, multiplier=4.0).collect()[0].threshold
    want = 4.0 * np.median(np.abs(noisy_signal)) / 0.6745
    assert abs(got - want) < 1e-9


def test_crossings_debounce(spark):
    # values crossing -50: single-sample blip at ts=3 (debounced away),
    # 2-sample crossing at ts=6,7 (kept at 6; 7 kept too: its next is not crossing)
    vals = [0, 0, 0, -60, 0, 0, -70, -80, 0, 0]
    df = _signal_df(spark, vals)
    thr = spark.createDataFrame([(0, 0, 50.0)], "channel_id int, segment_id long, threshold double")
    out = crossings(df, thr, partition_cols=["channel_id", "segment_id"], polarity="neg")
    assert [r.ts for r in out.orderBy("ts").collect()] == [6]


def _inject_spikes(rng, n, peak_times, amp=-120.0):
    x = rng.normal(0, 10.0, n)
    shape = amp * np.array([0.2, 0.5, 1.0, 0.6, 0.25, -0.1, -0.2, -0.1])
    for p in peak_times:
        x[p - 2 : p + 6] += shape
    return x


def test_detect_spikes_recovers_ground_truth(spark):
    rng = np.random.default_rng(3)
    truth = [500, 900, 1300, 2200, 3100]
    x = _inject_spikes(rng, 4000, truth)
    df = _signal_df(spark, x)
    out = detect_spikes(df, multiplier=4.0, censor_width=30, patch_size=30).collect()
    got = sorted(r.peak_ts for r in out)
    assert len(got) == len(truth)
    for g, t in zip(got, truth):
        assert abs(g - t) <= 1  # re-centered on the true extremum
    for r in out:
        assert len(r.waveform) == 30


def test_waveform_recenter_and_pad(spark):
    rng = np.random.default_rng(5)
    # spike near the stream start → zero-padded patch
    x = _inject_spikes(rng, 600, [10, 300])
    df = _signal_df(spark, x)
    out = {r.peak_ts: r for r in detect_spikes(df, patch_size=30).collect()}
    assert any(abs(p - 10) <= 1 for p in out)
    early = out[min(out)]
    assert len(early.waveform) == 30
    assert early.waveform[0] == 0.0  # left pad


def test_frac_peak_parabola_oracle(spark):
    # y = -(x-4.3)^2 sampled at integers: integer argmin... use argmax form:
    xs = np.arange(10, dtype=float)
    y = -((xs - 4.3) ** 2)
    wf = (-y).tolist()  # make it a minimum at 4.3
    df = spark.createDataFrame([(0, wf)], "id int, waveform array<double>")
    out = (
        with_frac_peak(df.withColumn("peak_idx", argmin_index()), "waveform", "peak_idx")
        .collect()[0]
    )
    assert abs(out.frac_peak - 4.3) < 1e-9


def test_align_waveforms_shapes_and_peak(spark):
    # 4-channel waveform, dominant negative peak on channel 2 at idx 14.4
    xs = np.arange(30, dtype=float)
    base = -100.0 * np.exp(-0.5 * ((xs - 14.4) / 2.0) ** 2)
    wf = [(0.25 * base).tolist(), (1.0 * base).tolist(), (0.5 * base).tolist(), (0.1 * base).tolist()]
    df = spark.createDataFrame([(0, [[float(v) for v in ch] for ch in wf])],
                               "id int, waveform array<array<float>>")
    out = align_waveforms(df, samples_before=15, samples_after=15).collect()[0]
    aligned = np.array(out.aligned)
    assert aligned.shape == (4, 30)
    # after alignment the dominant channel's minimum sits at the center
    assert abs(int(np.argmin(aligned[1])) - 15) <= 1
    # sub-sample alignment: center sample ≈ true peak amplitude
    assert aligned[1].min() <= -99.0


def test_common_reference_packets(spark):
    df = spark.createDataFrame(
        [(0, [10, 20, 30]), (1, [0, 0, 30])],
        "ts long, channels array<smallint>",
    )
    out = {r.ts: r.channels_ref for r in common_reference_packets(df).collect()}
    assert out[0] == [-10.0, 0.0, 10.0]
    assert out[1] == [-10.0, -10.0, 20.0]


def test_form_tetrode(spark):
    from jagular_spark.operators.spikes import form_tetrode

    rng = np.random.default_rng(11)
    n = 2000
    truth = [400, 1200]
    chans = []
    for ch in (4, 5, 6, 7):
        x = _inject_spikes(rng, n, truth, amp=-90.0 - 10 * ch)
        chans.append(
            spark.createDataFrame(
                [(ch, i, float(v)) for i, v in enumerate(x)],
                "channel_id int, ts long, value double",
            )
        )
    samples = chans[0].unionByName(chans[1]).unionByName(chans[2]).unionByName(chans[3])
    peaks = spark.createDataFrame([(t,) for t in truth], "ts long")
    out = form_tetrode(samples, peaks, tetrode_channels=[4, 5, 6, 7], patch_size=30).collect()
    assert len(out) == 2
    for r in out:
        assert len(r.waveform) == 4
        assert all(len(ch) == 30 for ch in r.waveform)

    # P4 artifact filter: amplitude beyond ±300 drops the spike
    from pyspark.sql import functions as F

    big = samples.withColumn("value", F.col("value") * 10.0)
    out2 = form_tetrode(big, peaks, tetrode_channels=[4, 5, 6, 7], patch_size=30).collect()
    assert len(out2) == 0


def test_lag_correlation_identities(spark):
    """Crafted invariants: an identical channel pair has r == 1 at lag 0;
    a pair where b is a shifted copy of a peaks at the shift lag; an
    anti-correlated pair gives r == -1."""
    from jagular_spark.operators.filtering import lag_correlation

    base = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]
    rows = []
    for t, v in enumerate(base):
        rows.append((0, t, v))          # ch 0: base
        rows.append((1, t, v))          # ch 1: identical
        rows.append((2, t, -v))         # ch 2: negated
    # ch 3: base shifted by +1 sample (b[t] = a[t-1])
    for t, v in enumerate(base[:-1]):
        rows.append((3, t + 1, v))
    df = spark.createDataFrame(rows, "ch long, t long, iv long")
    out = {
        (r.ch_a, r.ch_b, r.lag_k): r.corr
        for r in lag_correlation(df, max_lag=2).collect()
    }
    assert abs(out[(0, 1, 0)] - 1.0) < 1e-12
    assert abs(out[(0, 2, 0)] + 1.0) < 1e-12
    # b (ch 3) is a delayed copy: alignment b.t = a.t + 1 → lag_k == +1
    peak = max((k for k in out if k[0] == 0 and k[1] == 3), key=lambda k: out[k])
    assert peak[2] == 1 and abs(out[peak] - 1.0) < 1e-12
