"""Throughput microbenchmark for the `.rec` extraction path (the
reference engine's primary workload, SURVEY §3.1).

Synthesizes a multi-file `.rec` corpus (same container format the S1-S8
source handles: XML workspace + fixed-geometry packets), then measures

  1. the distributed splittable scan (`read_samples` → channel-projected
     decode → one aggregate), and
  2. a reference-style single-thread replay (sequential `np.fromfile`
     structured decode per file, same channel slice, same aggregate),

and checks both produce IDENTICAL (row count, value sum) before
reporting MB/s. The reference publishes no numbers (BASELINE.md), so
this is the apples-to-apples single-node comparison: same bytes, same
output, chunked generator vs partitioned scan.

Usage: python tools/bench_rec.py [target_mb] [n_files]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_CH = 64
HEADER = 38  # 1 base byte + one 37-byte device
N_SPIKE = 16
PACKET = HEADER + 4 + 2 * N_CH


def _config_xml() -> bytes:
    # hwChan k maps to packet slot (k % 32) * n_cards + k // 32; pick
    # hw channels 0..15 (slots spread across both 32-channel cards)
    spike = "\n".join(
        f'      <SpikeChannel hwChan="{c}" />' for c in range(N_SPIKE)
    )
    return (
        f"""<Configuration>
  <HardwareConfiguration numChannels="{N_CH}" samplingRate="30000">
    <Device name="synth" numBytes="37" />
  </HardwareConfiguration>
  <SpikeConfiguration>
{spike}
  </SpikeConfiguration>
</Configuration>
""".encode()
    )


def synth_corpus(out_dir: str, target_mb: int, n_files: int) -> list[str]:
    cfg = _config_xml()
    per_file = max(1, (target_mb * 1024 * 1024) // (n_files * PACKET))
    dt = np.dtype(
        [("header", np.uint8, (HEADER,)), ("ts", "<u4"), ("channels", "<i2", (N_CH,))]
    )
    rng = np.random.default_rng(7)
    paths = []
    ts0 = 1000
    for i in range(n_files):
        arr = np.zeros(per_file, dtype=dt)
        arr["ts"] = ts0 + np.arange(per_file, dtype=np.uint32)
        ts0 += per_file
        arr["channels"] = rng.integers(-2048, 2048, size=(per_file, N_CH), dtype=np.int16)
        p = os.path.join(out_dir, f"synth_{i}.rec")
        with open(p, "wb") as f:
            f.write(cfg)
            arr.tofile(f)
        paths.append(p)
    return paths


def single_thread_replay(paths: list[str], positions: list[int], config_size: int):
    """The reference's shape: sequential per-file structured decode
    (readers.py read_block), channel gather, running aggregate."""
    dt = np.dtype(
        [("header", np.uint8, (HEADER,)), ("ts", "<u4"), ("channels", "<i2", (N_CH,))]
    )
    n, s = 0, 0
    for p in paths:
        with open(p, "rb") as f:
            f.seek(config_size)
            data = np.fromfile(f, dtype=dt)
        ch = data["channels"][:, positions]
        n += ch.size
        s += int(ch.astype(np.int64).sum())
    return n, s


def main() -> None:
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    out_dir = tempfile.mkdtemp(prefix="jspark_recbench_")
    t0 = time.perf_counter()
    paths = synth_corpus(out_dir, target_mb, n_files)
    total_bytes = sum(os.path.getsize(p) for p in paths)
    print(f"# synthesized {n_files} files, {total_bytes / 1e6:.0f} MB "
          f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    from jagular_spark.session import get_spark
    from jagular_spark.sources import read_config, read_samples

    spark = get_spark("rec_bench")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = read_config(paths[0])
    positions = list(cfg.spike_channel_positions)

    # warm the JVM/scan machinery on a small slice (untimed)
    read_samples(spark, paths[:1], cfg, split_bytes=1 << 24).limit(1000).count()

    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    agg = (
        read_samples(spark, paths, cfg, split_bytes=16 * 1024 * 1024)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("long")).alias("s"))
        .collect()[0]
    )
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_ref, s_ref = single_thread_replay(paths, positions, cfg.config_size)
    t_ref = time.perf_counter() - t0

    assert agg["n"] == n_ref and agg["s"] == s_ref, (
        f"MISMATCH spark=({agg['n']}, {agg['s']}) ref=({n_ref}, {s_ref})"
    )
    mb = total_bytes / 1e6
    print(
        f"# spark: {t_spark:.2f}s ({mb / t_spark:.0f} MB/s)  "
        f"single-thread replay: {t_ref:.2f}s ({mb / t_ref:.0f} MB/s)  "
        f"speedup {t_ref / t_spark:.1f}x  [outputs identical]",
        file=sys.stderr,
    )
    import json

    print(json.dumps({
        "metric": "rec_scan_mb_per_s",
        "value": round(mb / t_spark, 1),
        "unit": "MB/s",
        "single_thread_mb_per_s": round(mb / t_ref, 1),
        "speedup": round(t_ref / t_spark, 2),
        "total_mb": round(mb, 1),
        "outputs_match": True,
    }))
    for p in paths:
        os.unlink(p)
    os.rmdir(out_dir)


if __name__ == "__main__":
    main()
