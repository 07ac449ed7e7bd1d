"""E2E tests for the .rec source (SURVEY §2.1) against an in-test numpy
oracle that decodes the reference sample fixtures directly.

Fixture facts (sample_data_*.rec, asserted below): 128 channels, 80
spike channels, 42-byte header, 302-byte packets, 21793-byte XML
config, 11 packets per file, fs=30000.
"""

from __future__ import annotations

import glob

import numpy as np
import pytest

from jagular_spark.sources import (
    extract_channels,
    file_catalog,
    read_config,
    read_packets,
    read_samples,
    timestamp_bounds,
)

SAMPLES = sorted(glob.glob("/root/reference/sample_data/*.rec"))

HEADER, N_CH, PACKET, CONFIG = 42, 128, 302, 21793
DT = np.dtype([("header", np.uint8, (HEADER,)), ("ts", np.uint32), ("channels", np.int16, (N_CH,))])


def oracle_decode(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        f.seek(CONFIG)
        return np.fromfile(f, dtype=DT)


def oracle_all() -> np.ndarray:
    return np.concatenate([oracle_decode(p) for p in SAMPLES])


def test_read_config_matches_fixture_header():
    cfg = read_config(SAMPLES[0])
    assert cfg.n_channels == N_CH
    assert cfg.header_size == HEADER
    assert cfg.packet_size == PACKET
    assert cfg.config_size == CONFIG
    assert cfg.sampling_rate == 30000
    assert cfg.n_spike_channels == 80
    # permutation stays within packet bounds and is injective
    assert len(set(cfg.spike_channel_positions)) == 80
    assert all(0 <= p < N_CH for p in cfg.spike_channel_positions)


def test_timestamp_bounds_match_oracle():
    cfg = read_config(SAMPLES[0])
    for p in SAMPLES:
        data = oracle_decode(p)
        assert timestamp_bounds(p, cfg) == (int(data["ts"][0]), int(data["ts"][-1]))


def test_file_catalog_sorted_with_stats(spark):
    # pass paths deliberately out of order (the reference example does too)
    shuffled = [SAMPLES[3], SAMPLES[0], SAMPLES[4], SAMPLES[1], SAMPLES[2]]
    cat = file_catalog(spark, shuffled).collect()
    starts = [r.ts_start for r in cat]
    assert starts == sorted(starts)
    assert [r.file_idx for r in cat] == list(range(5))
    assert all(r.n_packets == 11 for r in cat)


def test_read_packets_full_decode_matches_oracle(spark):
    cfg = read_config(SAMPLES[0])
    df = read_packets(spark, SAMPLES, cfg).orderBy("file_idx", "packet_idx")
    rows = df.collect()
    ref = oracle_all()
    assert len(rows) == len(ref) == 55
    perm = np.asarray(cfg.spike_channel_positions)
    np.testing.assert_array_equal(
        np.array([r.ts for r in rows]), ref["ts"].astype(np.int64)
    )
    np.testing.assert_array_equal(
        np.array([r.channels for r in rows], dtype=np.int16), ref["channels"][:, perm]
    )


def test_channel_projection_pushdown(spark):
    cfg = read_config(SAMPLES[0])
    sel = [9, 3, 0]
    df = read_packets(spark, SAMPLES[:1], cfg, channels=sel).orderBy("packet_idx")
    got = np.array([r.channels for r in df.collect()], dtype=np.int16)
    ref = oracle_decode(SAMPLES[0])
    pos = [cfg.spike_channel_positions[c] for c in sel]
    np.testing.assert_array_equal(got, ref["channels"][:, pos])


def test_ts_range_prunes_files_and_rows(spark):
    cfg = read_config(SAMPLES[0])
    ref = oracle_all()
    lo, hi = 216003235, 430419684  # exactly file 2's bounds (overlaps file 3)
    df = read_packets(spark, SAMPLES, cfg, ts_start=lo, ts_stop=hi)
    got = sorted(r.ts for r in df.collect())
    want = sorted(int(t) for t in ref["ts"] if lo <= t <= hi)
    assert got == want
    # pruning: only files whose bounds intersect participate (2 of 5)
    touched = {r.file_idx for r in df.select("file_idx").distinct().collect()}
    assert touched == {1, 2}


def test_read_samples_long_form(spark):
    cfg = read_config(SAMPLES[0])
    sel = [5, 2]
    df = read_samples(spark, SAMPLES[:2], cfg, channels=sel)
    rows = df.orderBy("channel_id", "file_idx", "packet_idx").collect()
    assert {r.channel_id for r in rows} == {2, 5}
    ref = np.concatenate([oracle_decode(p) for p in SAMPLES[:2]])
    for ch in sel:
        vals = [r.value for r in rows if r.channel_id == ch]
        np.testing.assert_array_equal(
            np.array(vals, dtype=np.int16),
            ref["channels"][:, cfg.spike_channel_positions[ch]],
        )


def test_extract_channels_e2e(spark, tmp_path):
    cfg = read_config(SAMPLES[0])
    out = extract_channels(
        spark, SAMPLES, str(tmp_path / "cols"), channels=[0, 1], max_gap_size=0, cfg=cfg
    )
    ref = oracle_all()
    order = np.argsort(ref["ts"], kind="stable")
    ref_sorted = ref[order]
    # fixture has no duplicate timestamps → row count = 55 per channel
    got = out.where(out.channel_id == 1).orderBy("ts").collect()
    assert len(got) == 55
    np.testing.assert_array_equal(
        np.array([r.value for r in got], dtype=np.int16),
        ref_sorted["channels"][:, cfg.spike_channel_positions[1]],
    )
    # columnar layout on disk: one directory per channel
    dirs = {p.name for p in (tmp_path / "cols").iterdir() if p.is_dir()}
    assert dirs == {"channel_id=0", "channel_id=1"}


def test_small_split_bytes_many_splits_same_result(spark):
    """Splittability: one packet per split must give byte-identical output."""
    cfg = read_config(SAMPLES[0])
    df = read_packets(spark, SAMPLES[:2], cfg, channels=[0], split_bytes=1)
    rows = df.orderBy("file_idx", "packet_idx").collect()
    ref = np.concatenate([oracle_decode(p) for p in SAMPLES[:2]])
    np.testing.assert_array_equal(
        np.array([r.channels[0] for r in rows], dtype=np.int16),
        ref["channels"][:, cfg.spike_channel_positions[0]],
    )
    assert len(rows) == 22


def test_read_raw_channel_zip_scan(spark, tmp_path):
    """S4/J1: flat .raw channel file zipped positionally with a uint64
    timestamps side-file; splits must align across both files."""
    from jagular_spark.sources import read_raw_channel

    rng = np.random.default_rng(7)
    vals = rng.integers(-3000, 3000, size=1000, dtype=np.int16)
    ts = (np.cumsum(rng.integers(1, 3, size=1000)) + 100).astype(np.uint64)
    ch_f, ts_f = str(tmp_path / "ch09.raw"), str(tmp_path / "timestamps.raw")
    vals.tofile(ch_f)
    ts.tofile(ts_f)

    # tiny split size -> many splits; zip must stay aligned
    df = read_raw_channel(spark, ch_f, ts_f, split_bytes=64)
    rows = df.orderBy("ts").collect()
    np.testing.assert_array_equal(
        np.array([r.ts for r in rows], dtype=np.uint64), ts
    )
    np.testing.assert_array_equal(
        np.array([r.value for r in rows], dtype=np.int16), vals
    )

    # ts auto-inference (reference leaves it unimplemented, readers.py:123):
    # ts = sample index from 0
    df2 = read_raw_channel(spark, ch_f, None, split_bytes=256)
    rows2 = df2.orderBy("ts").collect()
    assert [r.ts for r in rows2] == list(range(1000))

    # truncated ts side-file bounds the scan (zip semantics)
    ts[:900].tofile(ts_f)
    assert read_raw_channel(spark, ch_f, ts_f, split_bytes=64).count() == 900


def test_read_scaled_channel_uv(spark, tmp_path):
    from jagular_spark.sources import read_scaled_channel

    vals = np.array([-32768, 0, 1, 32767], dtype=np.int16)
    ch_f = str(tmp_path / "ch00.raw")
    vals.tofile(ch_f)
    df = read_scaled_channel(spark, ch_f, None)
    rows = df.orderBy("ts").collect()
    k = 4096.0 / 2.0**15
    np.testing.assert_allclose(
        np.array([r.uv for r in rows]), vals.astype(np.float64) * k
    )
    with pytest.raises(ValueError, match="channel_id"):
        read_scaled_channel(spark, str(tmp_path / "x.ns5"), None)


def _write_ns5(path: str, data: np.ndarray, channel_ids: list[int], period: int = 1) -> None:
    """Serialize (n_frames, n_channels) int16 ``data`` as a NEURALSG
    (NSx 2.1) container — the byte layout the parser under test reads."""
    import struct

    with open(path, "wb") as f:
        f.write(b"NEURALSG")
        f.write(b"30 kS/s".ljust(16, b"\x00"))
        f.write(struct.pack("<II", period, len(channel_ids)))
        f.write(np.asarray(channel_ids, dtype="<u4").tobytes())
        f.write(np.ascontiguousarray(data, dtype="<i2").tobytes())


def test_ns5_header_and_channel_decode(spark, tmp_path):
    from jagular_spark.sources import ns5_header, read_ns5_channel

    rng = np.random.default_rng(7)
    n_frames, ids = 500, [16, 18, 17, 20]
    data = rng.integers(-2048, 2048, size=(n_frames, len(ids)), dtype=np.int16)
    path = str(tmp_path / "rec.ns5")
    _write_ns5(path, data, ids, period=1)

    hdr = ns5_header(path)
    assert hdr["label"] == "30 kS/s"
    assert hdr["channel_ids"] == ids
    assert hdr["n_frames"] == n_frames

    # every channel decodes to its interleaved column, in ts order —
    # with a tiny split size so the multi-split path engages
    for pos, cid in enumerate(ids):
        rows = read_ns5_channel(spark, path, cid, split_bytes=256).orderBy("ts").collect()
        assert [r.ts for r in rows] == list(range(n_frames))
        np.testing.assert_array_equal(
            np.array([r.value for r in rows], dtype=np.int16), data[:, pos]
        )

    with pytest.raises(ValueError, match="channel 99"):
        read_ns5_channel(spark, path, 99)
    (tmp_path / "bad.ns5").write_bytes(b"NOTNEURAL" + b"\x00" * 40)
    with pytest.raises(ValueError, match="NEURALSG"):
        ns5_header(str(tmp_path / "bad.ns5"))


def test_read_scaled_channel_ns5(spark, tmp_path):
    from jagular_spark.sources import read_scaled_channel

    data = np.array([[-32768, 5], [0, 6], [32767, 7]], dtype=np.int16)
    path = str(tmp_path / "rec.ns5")
    _write_ns5(path, data, [3, 9])
    k = 4096.0 / 2.0**15
    rows = read_scaled_channel(spark, path, channel_id=3).orderBy("ts").collect()
    np.testing.assert_allclose(
        np.array([r.uv for r in rows]), data[:, 0].astype(np.float64) * k
    )


def test_compact_parquet(spark, tmp_path):
    from jagular_spark.sources import compact_parquet

    src = str(tmp_path / "many")
    # 40 tiny files (one per partition)
    df = spark.range(0, 40000).selectExpr("id AS ts", "id % 7 AS v")
    df.repartition(40).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "compacted")
    stats = compact_parquet(spark, src, out, target_mb=1024, order_cols=["ts"])
    assert stats["n_files_in"] >= 40
    assert stats["n_files_out"] == 1  # tiny data -> one target file
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert b.count() == a.count() == 40000
    assert b.agg({"v": "sum"}).collect()[0][0] == a.agg({"v": "sum"}).collect()[0][0]
