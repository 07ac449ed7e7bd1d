"""S9 spike sink/scan round-trips (reference jagular/spikes.py:119-140)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jagular_spark.sources.spikes_io import (
    load_spikes,
    load_spikes_flat,
    save_spikes,
    save_spikes_flat,
)


@pytest.fixture()
def spikes_df(spark):
    rows = [
        (g, int(ts), float(ts) / 7.0, [[float(g * 100 + ts + i) for i in range(4)] for _ in range(2)])
        for g in range(3)
        for ts in range(0, 50, 5)
    ]
    return spark.createDataFrame(
        rows,
        "channel_group int, peak_ts long, frac_peak double, "
        "waveform array<array<float>>",
    )


def test_parquet_roundtrip(spark, spikes_df, tmp_path):
    path = str(tmp_path / "spikes_pq")
    save_spikes(spikes_df, path)
    back = load_spikes(spark, path)
    a = sorted(spikes_df.collect(), key=lambda r: (r.channel_group, r.peak_ts))
    b = sorted(back.collect(), key=lambda r: (r.channel_group, r.peak_ts))
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert (ra.channel_group, ra.peak_ts) == (rb.channel_group, rb.peak_ts)
        assert ra.waveform == rb.waveform


def test_parquet_pruned_read(spark, spikes_df, tmp_path):
    path = str(tmp_path / "spikes_pq2")
    save_spikes(spikes_df, path)
    got = load_spikes(spark, path, channel_groups=[1], ts_start=10, ts_stop=30)
    rows = got.collect()
    assert {r.channel_group for r in rows} == {1}
    assert all(10 <= r.peak_ts < 30 for r in rows)
    assert len(rows) == 4  # ts 10,15,20,25
    # the ts predicate must reach the parquet scan as a pushed filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "peak_ts" in plan.split("PushedFilters")[1][:200]


def test_flat_roundtrip_matches_reference_layout(spark, spikes_df, tmp_path):
    """save_spikes_flat writes exactly the reference's (ncols f8, time f8)
    records: verify against a raw numpy re-read (the reference's own
    load_spikes decode, jagular/spikes.py:131-140)."""
    fn = str(tmp_path / "spikes.flat")
    n = save_spikes_flat(spikes_df, fn)
    assert n == spikes_df.count()
    ncols = 8  # 2 chans x 4 samples flattened
    raw = np.fromfile(fn, dtype=np.float64).reshape(n, ncols + 1)
    back = load_spikes_flat(spark, fn, ncols=ncols).orderBy("spike_idx").collect()
    assert len(back) == n
    for i, r in enumerate(back):
        assert r.peak_time == raw[i, -1]
        assert list(r.waveform) == list(raw[i, :ncols])
    # round-trip values match the source rows (driver-order = toLocalIterator order)
    src = spikes_df.collect()
    times_src = sorted(float(r.peak_ts) for r in src)
    times_back = sorted(r.peak_time for r in back)
    assert times_src == times_back


def test_flat_scan_is_splittable(spark, tmp_path):
    """Many small splits decode to the same table as one split."""
    fn = str(tmp_path / "big.flat")
    rng = np.random.default_rng(7)
    ncols = 5
    data = rng.normal(size=(1000, ncols + 1))
    data[:, -1] = np.arange(1000, dtype=np.float64)
    data.astype(np.float64).tofile(fn)
    one = load_spikes_flat(spark, fn, ncols=ncols).orderBy("spike_idx").collect()
    many = (
        load_spikes_flat(spark, fn, ncols=ncols, split_bytes=(ncols + 1) * 8 * 37)
        .orderBy("spike_idx")
        .collect()
    )
    assert len(one) == len(many) == 1000
    for ra, rb in zip(one, many):
        assert ra.peak_time == rb.peak_time
        assert list(ra.waveform) == list(rb.waveform)
