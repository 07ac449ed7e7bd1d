"""Spike sink / scan (SURVEY §2.1 S9).

The reference persists detection output as a flat float64 binary of
``(waveform f8 × ncols, time f8)`` records (``save_spikes`` /
``load_spikes``, ``jagular/spikes.py:119-140``). Two Spark-first paths:

- **Parquet sink/scan** (the scale path): one row per spike,
  ``partitionBy(channel_group)`` so per-tetrode reads prune whole
  directories, rows sorted by ``peak_ts`` within files so min/max
  row-group stats prune time ranges. At 100 TB of raw signal the spike
  table is ~1000× smaller but still far beyond one node — it must be a
  first-class partitioned columnar table, not a driver-local file.
- **Flat-binary reader** (the parity path): a *splittable* scan of the
  reference's fixed-record format — record length is ``(ncols+1)·8``
  bytes, so byte splits are planned driver-side exactly like the
  ``.rec`` packet scan and decoded with one vectorized ``frombuffer``
  per split. A legacy writer streams rows through the driver because
  the format itself is a single headerless file (inherently
  single-writer); it exists only for interop with reference tooling.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_spikes(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_col: str | None = "channel_group",
    order_col: str = "peak_ts",
) -> None:
    """S9 sink: persist a spikes DataFrame (``schemas.SPIKES_SCHEMA``
    shape — ``channel_group, peak_ts, waveform, ...``) as a partitioned
    Parquet table (reference ``save_spikes``, ``jagular/spikes.py:119-124``).

    ``partitionBy(channel_group)`` → directory pruning for per-tetrode
    reads; ``sortWithinPartitions(order_col)`` → tight min/max row-group
    stats so a ``peak_ts`` range predicate skips row groups at scan time.
    """
    w = df
    if partition_col is not None and partition_col in df.columns:
        w = (
            w.repartition(partition_col)
            .sortWithinPartitions(order_col)
            .write.mode(mode)
            .partitionBy(partition_col)
        )
    else:
        w = w.sortWithinPartitions(order_col).write.mode(mode)
    w.parquet(path)


def load_spikes(
    spark: SparkSession,
    path: str,
    channel_groups: Sequence[int] | None = None,
    ts_start: int | None = None,
    ts_stop: int | None = None,
    ts_col: str = "peak_ts",
) -> DataFrame:
    """S9 scan: read a saved spike table with partition / row-group
    pruning (reference ``load_spikes``, ``jagular/spikes.py:126-140``).

    ``channel_groups`` prunes partition directories; the ``ts`` range
    reaches the Parquet reader as a pushed filter (min/max stats skip
    row groups written sorted by :func:`save_spikes`).
    """
    df = spark.read.parquet(path)
    if channel_groups is not None:
        df = df.where(F.col("channel_group").isin([int(g) for g in channel_groups]))
    if ts_start is not None:
        df = df.where(F.col(ts_col) >= F.lit(ts_start))
    if ts_stop is not None:
        df = df.where(F.col(ts_col) < F.lit(ts_stop))
    return df


# ---------------------------------------------------------------------------
# Reference flat-binary format (interop with reference tooling)
# ---------------------------------------------------------------------------

def save_spikes_flat(
    df: DataFrame,
    filename: str,
    waveform_col: str = "waveform",
    ts_col: str = "peak_ts",
) -> int:
    """Write the reference's flat f8 record file
    ``[waveform × ncols, time]`` (``jagular/spikes.py:119-124``). The
    format is one headerless file → single-writer by construction, so
    rows stream through the driver via ``toLocalIterator`` (bounded
    memory, one partition in flight). Use :func:`save_spikes` for the
    distributed sink. Returns the number of records written."""
    import numpy as np

    elem = df.schema[waveform_col].dataType.elementType
    wf = (
        F.flatten(waveform_col)  # multi-channel (tetrode) waveforms → row-major flat
        if elem.typeName() == "array"
        else F.col(waveform_col)
    )
    flat = df.select(
        wf.cast("array<double>").alias("wf"),
        F.col(ts_col).cast("double").alias("t"),
    )
    n = 0
    with open(filename, "wb") as f:
        for row in flat.toLocalIterator():
            rec = np.asarray(list(row.wf) + [row.t], dtype=np.float64)
            rec.tofile(f)
            n += 1
    return n


def load_spikes_flat(
    spark: SparkSession,
    filename: str,
    ncols: int = 120,
    split_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Splittable scan of the reference's flat spike file
    (``jagular/spikes.py:126-140``): fixed record length ``(ncols+1)·8``
    bytes → record-aligned byte splits planned driver-side, each decoded
    with one vectorized ``np.frombuffer`` (no per-row Python). Returns
    ``(spike_idx, peak_time, waveform array<double>)`` — ``spike_idx``
    is the stable record position, recovering the file order the
    reference's recarray preserves implicitly."""
    rec_bytes = (ncols + 1) * 8
    n_records = os.path.getsize(filename) // rec_bytes
    if n_records == 0:
        return spark.createDataFrame(
            [], "spike_idx long, peak_time double, waveform array<double>"
        )
    per_split = max(1, split_bytes // rec_bytes)
    splits = []
    off = 0
    while off < n_records:
        n = min(per_split, n_records - off)
        splits.append((off, n))
        off += n
    splits_df = spark.createDataFrame(
        pd.DataFrame(splits, columns=["first_rec", "n_recs"])
    ).repartition(len(splits))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            for row in b.itertuples(index=False):
                with open(filename, "rb") as f:
                    f.seek(row.first_rec * rec_bytes)
                    buf = f.read(row.n_recs * rec_bytes)
                data = np.frombuffer(buf, dtype=np.float64).reshape(-1, ncols + 1)
                yield pd.DataFrame(
                    {
                        "spike_idx": row.first_rec + np.arange(len(data), dtype=np.int64),
                        "peak_time": data[:, -1],
                        "waveform": list(data[:, :ncols]),
                    }
                )

    return splits_df.mapInPandas(
        decode, "spike_idx long, peak_time double, waveform array<double>"
    )
