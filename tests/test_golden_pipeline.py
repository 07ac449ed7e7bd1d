"""Golden end-to-end pipeline test (SURVEY §5 item 5): the full
extract → zero-phase filter → detect → align composition on the real
`.rec` fixture bytes, compared against a straight-line in-core numpy
oracle that replays the reference chain (``jagular/spikes.py:142-186``,
``jagular/alignment.py:58-108``) with the SAME dsp kernels.

The numeric kernels are unit-tested elsewhere (tests/test_dsp.py); what
this test pins is the *distributed composition* — scan splits, segment
boundaries, the bucketed range join, group boundaries in the filter,
and the censor's sequential state — against a single-machine replay.
"""

from __future__ import annotations

import glob

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from jagular_spark import dsp
from jagular_spark.operators.alignment import align_waveforms
from jagular_spark.operators.filtering import filtfilt_segments
from jagular_spark.operators.spikes import detect_spikes
from jagular_spark.sources import read_config, read_samples

SAMPLES = sorted(glob.glob("/root/reference/sample_data/*.rec"))
HEADER, N_CH, PACKET, CONFIG = 42, 128, 302, 21793
DT = np.dtype([("header", np.uint8, (HEADER,)), ("ts", np.uint32), ("channels", np.int16, (N_CH,))])

CHANNELS = [0, 1, 2, 3]
NUMTAPS, FL, FH, FS = 7, 600.0, 6000.0, 30000.0
MULT, CENSOR_W, PATCH = 1.0, 5, 8


def _oracle_channel_streams(cfg):
    """Decode all fixtures, concat in catalog (ts) order, return
    {logical_channel: (ts, value)} sorted by ts."""
    blocks = []
    for p in SAMPLES:
        with open(p, "rb") as f:
            f.seek(CONFIG)
            blocks.append(np.fromfile(f, dtype=DT))
    data = np.concatenate(blocks)
    order = np.argsort(data["ts"], kind="stable")
    ts = data["ts"][order].astype(np.int64)
    out = {}
    for c in CHANNELS:
        pos = cfg.spike_channel_positions[c]
        out[c] = (ts, data["channels"][order, pos].astype(np.float64))
    return out


def _oracle_pipeline(cfg, taps):
    """Reference-chain replay: segment at gap>=2 → FIR zero-phase per
    epoch → MAD threshold per (channel, epoch) → debounced crossings →
    censor (> width, jagular/spikes.py:335) → extract with re-center +
    zero-pad (spikes.py:377-425) → parabola + linear align
    (alignment.py:58-108)."""
    spikes = []
    for c, (ts, x) in _oracle_channel_streams(cfg).items():
        brks = np.flatnonzero(np.diff(ts) >= 2) + 1
        seg_bounds = np.concatenate(([0], brks, [len(ts)]))
        filt = np.zeros_like(x)
        seg_of = np.zeros(len(ts), dtype=np.int64)
        for si, (s, e) in enumerate(zip(seg_bounds[:-1], seg_bounds[1:])):
            seg_of[s:e] = si
            filt[s:e] = (
                dsp.fir_zero_phase(taps, x[s:e]) if e - s >= len(taps) else 0.0
            )
        for si in range(len(seg_bounds) - 1):
            s, e = seg_bounds[si], seg_bounds[si + 1]
            f_seg, t_seg = filt[s:e], ts[s:e]
            thr = MULT * np.median(np.abs(f_seg)) / 0.6745
            cross = [
                t_seg[i]
                for i in range(len(f_seg) - 1)
                if f_seg[i] < -thr and f_seg[i + 1] < -thr and t_seg[i + 1] == t_seg[i] + 1
            ]
            kept, last = [], None
            for t in cross:
                if last is None or t - last > CENSOR_W:
                    kept.append(t)
                    last = t
            size = PATCH // 2
            for ct in kept:
                win = (ts >= ct - 2 * size) & (ts < ct + 2 * size)
                w_ts, w_v = ts[win], filt[win]
                center = (w_ts >= ct - size) & (w_ts < ct + size)
                c_v, c_ts = w_v[center], w_ts[center]
                pk = int(np.flatnonzero(c_v == c_v.min())[0])
                peak_ts = int(c_ts[pk])
                lo, hi = peak_ts - size, peak_ts + size
                pm = (w_ts >= lo) & (w_ts < hi)
                patch = w_v[pm]
                n_before = int(np.sum((w_ts >= lo) & (w_ts < peak_ts)))
                pad_l = max(0, size - n_before)
                pad_r = max(0, PATCH - pad_l - len(patch))
                wf = np.concatenate([np.zeros(pad_l), patch, np.zeros(pad_r)])
                spikes.append((c, int(ct), peak_ts, wf))
    # align: single-channel wrap, linear mode, neg polarity
    aligned = {}
    for c, ct, peak_ts, wf in spikes:
        w = wf.astype(np.float32).astype(np.float64)
        n_s = len(w)
        p = int(np.argmin(w))
        if 1 <= p <= n_s - 2:
            y = w[p - 1 : p + 2]
            denom = y[0] - 2.0 * y[1] + y[2]
            frac = p + ((y[0] - y[2]) / (2.0 * denom) if denom != 0 else 0.0)
        else:
            frac = float(p)
        grid = np.clip(frac + np.arange(-(n_s // 2), n_s - n_s // 2, dtype=np.float64), 0, n_s - 1)
        aligned[(c, ct)] = np.interp(grid, np.arange(n_s, dtype=np.float64), w).astype(np.float32)
    return spikes, aligned


@pytest.mark.skipif(not SAMPLES, reason="reference fixtures not present")
def test_golden_pipeline_rec_to_aligned(spark):
    cfg = read_config(SAMPLES[0])
    taps = dsp.firwin_bandpass(NUMTAPS, FL, FH, FS)

    samples = read_samples(spark, SAMPLES, channels=CHANNELS)
    w = Window.partitionBy("channel_id").orderBy("ts")
    seg = F.sum(
        ((F.col("ts") - F.lag("ts").over(w)) >= 2).cast("long")
    ).over(w)
    seged = samples.withColumn("segment_id", F.coalesce(seg, F.lit(0)))

    filtered = filtfilt_segments(
        seged, taps, partition_cols=("channel_id", "segment_id")
    )
    spikes = detect_spikes(
        filtered,
        value_col="filtered",
        multiplier=MULT,
        censor_width=CENSOR_W,
        patch_size=PATCH,
        polarity="neg",
    )
    wrapped = spikes.withColumn("wf2d", F.array(F.col("waveform").cast("array<float>")))
    aligned = align_waveforms(wrapped, waveform_col="wf2d", mode="linear", polarity="neg")
    rows = aligned.collect()

    o_spikes, o_aligned = _oracle_pipeline(cfg, taps)
    assert len(o_spikes) > 0, "fixture must produce at least one spike"

    got = {(r.channel_id, r.crossing_ts): r for r in rows}
    exp = {(c, ct): (peak_ts, wf) for c, ct, peak_ts, wf in o_spikes}
    assert set(got) == set(exp)
    for k, r in got.items():
        peak_ts, wf = exp[k]
        assert r.peak_ts == peak_ts, k
        assert np.allclose(np.asarray(r.waveform), wf, rtol=0, atol=1e-9), k
        assert np.allclose(
            np.asarray(r.aligned[0], dtype=np.float32), o_aligned[k], rtol=0, atol=1e-5
        ), k
