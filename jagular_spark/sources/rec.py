"""SpikeGadgets ``.rec`` source for Spark (SURVEY §2.1 S1-S8).

A ``.rec`` file is an XML ``<Configuration>`` workspace followed by
fixed-size packets ``[header u1×H][timestamp u4][channel i2×N]``
(reference: ``jagular/readers.py:215-343``). This module re-expresses the
reference's reader stack Spark-first:

- **S1 schema inference** (``readers.py:215-285``): driver-side XML parse
  → :class:`RecConfig` (packet geometry + the spike-channel permutation),
  analogous to reading a Parquet footer.
- **S2/S6 catalog** (``readers.py:180-213``, ``io.py:68-96``): per-file
  ``(ts_start, ts_stop, n_packets)`` stats DataFrame, computed
  distributed (two 4-byte reads per file) — the min/max column stats
  that drive partition pruning.
- **S3/S5 splittable scan** (``readers.py:287-343``, ``io.py:234-280``):
  packet-aligned byte splits planned driver-side, decoded executor-side
  with ``np.frombuffer`` into Arrow batches via ``mapInPandas``. One
  giant file parallelizes across executors — the reference's
  single-threaded stitched-generator becomes a plain multi-split scan,
  and global order is recovered lazily by ``orderBy(ts)`` only when a
  consumer needs it.
- **Projection pushdown** (``readers.py:341``): only the requested
  logical channels are gathered from each packet *inside the decoder*,
  so un-selected channels never leave the scan.
- **Partition pruning** (``io.py:204-232``): a ``ts`` range predicate
  drops whole files via catalog bounds before any byte is read, then is
  re-applied per-row for partial overlap.

Scale notes: splits default to 128 MiB of packets; decode is a single
vectorized ``frombuffer`` + transpose per split (no per-row Python); the
catalog is tiny (2 longs/file) and broadcastable. At 100 TB / 30 kHz ×
128 ch this is ~13k files-worth of splits — well within driver planning
capacity, same regime as Spark's own FileSourceScanExec planning.
"""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CONFIG_END = b"</Configuration>"
_MAX_CONFIG_BYTES = 16 * 1024 * 1024  # sanity guard, mirrors the reference's line cap


@dataclass(frozen=True)
class RecConfig:
    """Packet geometry inferred from the embedded XML workspace (S1)."""

    n_channels: int
    header_size: int          # bytes of device headers per packet (incl. base byte)
    config_size: int          # bytes of XML section to skip
    sampling_rate: int
    spike_channel_positions: tuple[int, ...]  # packet slot per logical spike channel
    timestamp_size: int = 4
    bytes_per_channel: int = 2

    @property
    def packet_size(self) -> int:
        return self.header_size + self.timestamp_size + self.n_channels * self.bytes_per_channel

    @property
    def n_spike_channels(self) -> int:
        return len(self.spike_channel_positions)


def read_config(path: str) -> RecConfig:
    """S1: parse the embedded ``<Configuration>`` workspace (driver-side).

    Semantics per ``readers.py:215-285``: header = 1 base byte + one
    ``numBytes`` per hardware device; ``SpikeChannel hwChan`` entries (in
    document order — tetrode 1's four channels first, etc.) map to packet
    slots via ``(hw % 32) * n_cards + hw // 32``.
    """
    with open(path, "rb") as f:
        head = f.read(_MAX_CONFIG_BYTES)
    end = head.find(_CONFIG_END)
    if end < 0:
        raise ValueError(f"{path}: no </Configuration> terminator in first {_MAX_CONFIG_BYTES} bytes")
    # config section runs through the terminator line's trailing newline
    config_size = end + len(_CONFIG_END)
    while config_size < len(head) and head[config_size : config_size + 1] in (b"\r", b"\n"):
        config_size += 1

    root = ET.fromstring(head[:config_size].decode("utf-8", errors="replace"))
    hw = root.find("HardwareConfiguration")
    if hw is None:
        raise ValueError(f"{path}: no <HardwareConfiguration> in workspace")
    n_channels = int(hw.get("numChannels"))
    sampling_rate = int(hw.get("samplingRate", "30000"))
    header_size = 1 + sum(int(dev.get("numBytes", "0")) for dev in hw)

    n_cards, rem = divmod(n_channels, 32)
    if rem:
        raise ValueError(f"{path}: numChannels={n_channels} not a multiple of 32")
    positions = tuple(
        (int(sc.get("hwChan")) % 32) * n_cards + int(sc.get("hwChan")) // 32
        for sc in root.iter("SpikeChannel")
    )
    return RecConfig(
        n_channels=n_channels,
        header_size=header_size,
        config_size=config_size,
        sampling_rate=sampling_rate,
        spike_channel_positions=positions,
    )


def _bounds_one(path: str, cfg: RecConfig) -> tuple[int, int, int]:
    """S2: first/last ts + packet count from two point reads."""
    size = os.path.getsize(path) - cfg.config_size
    n_packets = size // cfg.packet_size
    if n_packets <= 0:
        raise ValueError(f"{path}: no complete packets")
    ts_off = cfg.header_size
    with open(path, "rb") as f:
        f.seek(cfg.config_size + ts_off)
        first = struct.unpack("<I", f.read(4))[0]
        f.seek(cfg.config_size + (n_packets - 1) * cfg.packet_size + ts_off)
        last = struct.unpack("<I", f.read(4))[0]
    return first, last, n_packets


def timestamp_bounds(path: str, cfg: RecConfig | None = None) -> tuple[int, int]:
    first, last, _ = _bounds_one(path, cfg or read_config(path))
    return first, last


def file_catalog(spark: SparkSession, paths: Sequence[str], cfg: RecConfig | None = None) -> DataFrame:
    """S2+S6: ``files(file_idx, path, ts_start, ts_stop, n_packets)``,
    ordered by ``ts_start`` (the reference's catalog sort, ``io.py:91-96``).

    Bounds are read distributed (one tiny task per file batch); file_idx
    is assigned *after* the sort so downstream keep-first tiebreaks follow
    recording order even when paths are passed shuffled.
    """
    cfg = cfg or read_config(paths[0])
    pdf = pd.DataFrame({"path": list(paths)})

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for p in b["path"]:
                first, last, n = _bounds_one(p, cfg)
                if first > last:
                    raise ValueError(f"{p}: first_ts {first} > last_ts {last}")
                rows.append({"path": p, "ts_start": first, "ts_stop": last, "n_packets": n})
            yield pd.DataFrame(rows)

    raw = (
        spark.createDataFrame(pdf)
        .repartition(min(len(paths), spark.sparkContext.defaultParallelism))
        .mapInPandas(stats, "path string, ts_start long, ts_stop long, n_packets long")
    )
    ordered = raw.orderBy("ts_start").collect()
    return spark.createDataFrame(
        [
            (i, r.path, r.ts_start, r.ts_stop, r.n_packets)
            for i, r in enumerate(ordered)
        ],
        "file_idx int, path string, ts_start long, ts_stop long, n_packets long",
    )


def _plan_splits(
    catalog_rows: list,
    cfg: RecConfig,
    ts_start: int | None,
    ts_stop: int | None,
    split_bytes: int,
) -> list[tuple[int, str, int, int]]:
    """Packet-aligned (file_idx, path, first_packet, n_packets) splits,
    with file-level pruning from catalog ts bounds (S7)."""
    packets_per_split = max(1, split_bytes // cfg.packet_size)
    splits = []
    for r in catalog_rows:
        if ts_start is not None and r.ts_stop < ts_start:
            continue
        if ts_stop is not None and r.ts_start > ts_stop:
            continue
        off = 0
        while off < r.n_packets:
            n = min(packets_per_split, r.n_packets - off)
            splits.append((r.file_idx, r.path, off, n))
            off += n
    return splits


def read_packets(
    spark: SparkSession,
    paths: Sequence[str],
    cfg: RecConfig | None = None,
    channels: Sequence[int] | None = None,
    ts_start: int | None = None,
    ts_stop: int | None = None,
    split_bytes: int = 128 * 1024 * 1024,
    catalog: DataFrame | None = None,
) -> DataFrame:
    """S3/S5: decode packets across all files into
    ``(file_idx, packet_idx, ts, channels array<short>)``.

    ``channels`` are *logical spike-channel* indices (document order in
    the workspace); only those slots are gathered from each packet —
    projection pushed into the scan. ``ts_start/ts_stop`` prune whole
    files via the catalog, then filter rows. ``(file_idx, packet_idx)``
    is the stable physical-order tiebreak used by keep-first dedup.
    """
    cfg = cfg or read_config(paths[0])
    cat = catalog if catalog is not None else file_catalog(spark, paths, cfg)
    sel = list(channels) if channels is not None else list(range(cfg.n_spike_channels))
    positions = [cfg.spike_channel_positions[c] for c in sel]
    splits = _plan_splits(cat.collect(), cfg, ts_start, ts_stop, split_bytes)
    if not splits:
        return spark.createDataFrame([], "file_idx int, packet_idx long, ts long, channels array<smallint>")

    splits_df = spark.createDataFrame(
        pd.DataFrame(splits, columns=["file_idx", "path", "first_packet", "n_packets"])
    ).repartition(len(splits))

    header_size, n_channels = cfg.header_size, cfg.n_channels
    config_size, packet_size = cfg.config_size, cfg.packet_size

    def decode(batches):
        # mapInArrow, not mapInPandas: the channel vectors go into ONE
        # Arrow ListArray built from the contiguous numpy buffer (an
        # offsets array + a values array — fully vectorized). The
        # earlier pandas path materialized a python object per packet
        # for the list column and converted them row-at-a-time —
        # measured 5x slower end-to-end on a 0.5 GB corpus.
        import numpy as np
        import pyarrow as pa

        dt = np.dtype(
            [
                ("header", np.uint8, (header_size,)),
                ("ts", np.uint32),
                ("channels", np.int16, (n_channels,)),
            ]
        )
        w = len(positions)
        for b in batches:
            for row in b.to_pylist():
                with open(row["path"], "rb") as f:
                    f.seek(config_size + row["first_packet"] * packet_size)
                    buf = f.read(row["n_packets"] * packet_size)
                data = np.frombuffer(buf, dtype=dt, count=len(buf) // packet_size)
                n = len(data)
                gathered = np.ascontiguousarray(data["channels"][:, positions])
                channels = pa.ListArray.from_arrays(
                    pa.array(np.arange(0, (n + 1) * w, w, dtype=np.int32)),
                    pa.array(gathered.ravel(), type=pa.int16()),
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(n, row["file_idx"], dtype=np.int32)),
                        pa.array(row["first_packet"] + np.arange(n, dtype=np.int64)),
                        pa.array(data["ts"].astype(np.int64)),
                        channels,
                    ],
                    ["file_idx", "packet_idx", "ts", "channels"],
                )

    out = splits_df.mapInArrow(decode, "file_idx int, packet_idx long, ts long, channels array<smallint>")
    if ts_start is not None:
        out = out.where(F.col("ts") >= F.lit(ts_start))
    if ts_stop is not None:
        out = out.where(F.col("ts") <= F.lit(ts_stop))
    return out


def read_samples(
    spark: SparkSession,
    paths: Sequence[str],
    cfg: RecConfig | None = None,
    channels: Sequence[int] | None = None,
    **kwargs,
) -> DataFrame:
    """Long-form ``samples(channel_id, ts, value, file_idx, packet_idx)``
    — the canonical columnar layout (§1.5). ``channel_id`` is the logical
    spike-channel index, recovered via ``posexplode`` over the projected
    packet vector (JVM-side, no UDF)."""
    cfg = cfg or read_config(paths[0])
    sel = list(channels) if channels is not None else list(range(cfg.n_spike_channels))
    pk = read_packets(spark, paths, cfg, channels=sel, **kwargs)
    chan_map = F.array(*[F.lit(c) for c in sel])
    return pk.select(
        "file_idx",
        "packet_idx",
        "ts",
        F.posexplode("channels").alias("pos", "value"),
    ).select(
        F.element_at(chan_map, F.col("pos") + 1).alias("channel_id"),
        "ts",
        F.col("value").cast("smallint").alias("value"),
        "file_idx",
        "packet_idx",
    )


def extract_channels(
    spark: SparkSession,
    paths: Sequence[str],
    out_path: str,
    channels: Sequence[int] | None = None,
    max_gap_size: int = 0,
    cfg: RecConfig | None = None,
    **kwargs,
) -> DataFrame:
    """The reference's ETL entry point (``utils.py:392-549``), Spark-shaped:
    scan → keep-FIRST ts dedup → linear gap interpolation ≤ max_gap_size →
    per-channel columnar sink (Parquet ``partitionBy(channel_id)`` — the
    row→column pivot of §1.2). Returns the written samples DataFrame.

    The reference's cross-block carry state disappears: Spark sees the
    whole stream, and interpolate_gaps handles partition-boundary gaps
    with its edge-row pass.
    """
    from jagular_spark.operators import dedup_keep_first, interpolate_gaps

    cfg = cfg or read_config(paths[0])
    pk = read_packets(spark, paths, cfg, channels=channels, **kwargs)
    # I1: keep the first occurrence per ts in physical (file, packet) order
    deduped = dedup_keep_first(pk, ts_col="ts", tiebreak_cols=["file_idx", "packet_idx"])
    sel = list(channels) if channels is not None else list(range(cfg.n_spike_channels))
    chan_map = F.array(*[F.lit(c) for c in sel])
    samples = deduped.select(
        "ts", F.posexplode("channels").alias("pos", "value")
    ).select(
        F.element_at(chan_map, F.col("pos") + 1).alias("channel_id"),
        "ts",
        F.col("value").cast("smallint").alias("value"),
    )
    if max_gap_size > 0:
        samples = interpolate_gaps(
            samples,
            ts_col="ts",
            value_cols=["value"],
            max_gap_size=max_gap_size,
            partition_cols=["channel_id"],
        )
    (
        samples.repartition("channel_id")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .partitionBy("channel_id")
        .parquet(out_path)
    )
    return spark.read.parquet(out_path)


# ---------------------------------------------------------------------------
# S4/J1: raw single-channel scan zipped with a timestamps side-file
# ---------------------------------------------------------------------------

def read_raw_channel(
    spark: SparkSession,
    channel_file: str,
    timestamps_file: str | None = None,
    value_dtype: str = "int16",
    ts_dtype: str = "uint64",
    split_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """S4: scan a flat per-channel ``.raw`` file (int16 samples) zipped
    row-positionally with its shared timestamps side-file (uint64) —
    the reference's ``SpikeGadgetsSingleChannelReader.read_block``
    (``jagular/readers.py:102-127``).

    The J1 positional equi-join (``readers.py:121-125``) never becomes a
    Spark join: splits are planned on the *sample index*, and each split
    reads the matching byte ranges of both files (offsets scale by dtype
    width), so the zip happens inside one vectorized ``np.frombuffer``
    pass per split — no shuffle, no row_number. Where the reference
    leaves ts auto-inference unimplemented (``readers.py:123``), passing
    ``timestamps_file=None`` synthesizes ``ts = sample index`` (gapless
    from 0), which is the documented intent.
    """
    import numpy as np

    vdt = np.dtype(value_dtype)
    tdt = np.dtype(ts_dtype)
    n_samples = os.path.getsize(channel_file) // vdt.itemsize
    if timestamps_file is not None:
        n_ts = os.path.getsize(timestamps_file) // tdt.itemsize
        if n_ts < n_samples:
            n_samples = n_ts
    samples_per_split = max(1, split_bytes // vdt.itemsize)
    splits = []
    off = 0
    while off < n_samples:
        n = min(samples_per_split, n_samples - off)
        splits.append((off, n))
        off += n
    if not splits:
        return spark.createDataFrame([], "ts long, value smallint")

    splits_df = spark.createDataFrame(
        pd.DataFrame(splits, columns=["first_sample", "n_samples"])
    ).repartition(len(splits))
    ch_path, ts_path = channel_file, timestamps_file
    v_name, t_name = vdt.str, tdt.str

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        v_dt, t_dt = np.dtype(v_name), np.dtype(t_name)
        for b in batches:
            for row in b.itertuples(index=False):
                with open(ch_path, "rb") as f:
                    f.seek(row.first_sample * v_dt.itemsize)
                    vals = np.frombuffer(
                        f.read(row.n_samples * v_dt.itemsize), dtype=v_dt
                    )
                if ts_path is None:
                    ts = row.first_sample + np.arange(len(vals), dtype=np.int64)
                else:
                    with open(ts_path, "rb") as f:
                        f.seek(row.first_sample * t_dt.itemsize)
                        ts = np.frombuffer(
                            f.read(row.n_samples * t_dt.itemsize), dtype=t_dt
                        ).astype(np.int64)
                yield pd.DataFrame(
                    {"ts": ts, "value": vals.astype(np.int16, copy=False)}
                )

    return splits_df.mapInPandas(decode, "ts long, value smallint")


NS5_MAGIC = b"NEURALSG"
_NS5_FIXED_HEADER = 32  # magic(8) + label(16) + period(4) + channel_count(4)


def ns5_header(path: str) -> dict:
    """Parse the NSx 2.1 ``NEURALSG`` basic header (the public Blackrock
    NSx spec; the container the reference's lazy ``ns5.Loader`` reads,
    ``jagular/spikes.py:84-86``): magic, 16-byte label, uint32 sampling
    period (in 1/30 kHz ticks), uint32 channel count, then the uint32
    channel-id list. Data frames follow as int16, one value per channel
    per frame, interleaved in header order."""
    import numpy as np

    with open(path, "rb") as f:
        head = f.read(_NS5_FIXED_HEADER)
        if len(head) < _NS5_FIXED_HEADER or head[:8] != NS5_MAGIC:
            raise ValueError(f"{path}: not a NEURALSG (NSx 2.1) file")
        label = head[8:24].split(b"\x00", 1)[0].decode("latin-1")
        period, n_channels = np.frombuffer(head[24:32], dtype="<u4")
        ids = np.frombuffer(f.read(4 * int(n_channels)), dtype="<u4")
    header_bytes = _NS5_FIXED_HEADER + 4 * int(n_channels)
    frame_bytes = 2 * int(n_channels)
    n_frames = (os.path.getsize(path) - header_bytes) // frame_bytes
    return {
        "label": label,
        "period": int(period),
        "n_channels": int(n_channels),
        "channel_ids": [int(c) for c in ids],
        "header_bytes": header_bytes,
        "n_frames": int(n_frames),
    }


def read_ns5_channel(
    spark: SparkSession,
    path: str,
    channel_id: int,
    split_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """S10: splittable scan of ONE channel out of an interleaved
    ``NEURALSG`` container (reference ``load_ns5`` yields one channel at
    a time for the same memory reason, ``jagular/spikes.py:63-90``).

    Splits are planned on the frame index so each task reads a bounded
    contiguous byte range of the row-major frame block and stride-slices
    its channel column out — the columnar-from-row-major gather happens
    in one ``np.frombuffer`` + reshape per split, no shuffle. ``ts`` is
    the global frame index (the file is gapless by construction)."""
    import numpy as np

    hdr = ns5_header(path)
    try:
        chan_idx = hdr["channel_ids"].index(int(channel_id))
    except ValueError:
        raise ValueError(
            f"channel {channel_id} not in {path} (has {hdr['channel_ids']})"
        ) from None
    nch = hdr["n_channels"]
    frame_bytes = 2 * nch
    frames_per_split = max(1, split_bytes // frame_bytes)
    splits = []
    off = 0
    while off < hdr["n_frames"]:
        n = min(frames_per_split, hdr["n_frames"] - off)
        splits.append((off, n))
        off += n
    if not splits:
        return spark.createDataFrame([], "ts long, value smallint")

    splits_df = spark.createDataFrame(
        pd.DataFrame(splits, columns=["first_frame", "n_frames"])
    ).repartition(len(splits))
    header_bytes = hdr["header_bytes"]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for row in b.itertuples(index=False):
                with open(path, "rb") as f:
                    f.seek(header_bytes + row.first_frame * frame_bytes)
                    block = np.frombuffer(
                        f.read(row.n_frames * frame_bytes), dtype="<i2"
                    ).reshape(-1, nch)
                yield pd.DataFrame(
                    {
                        "ts": row.first_frame
                        + np.arange(block.shape[0], dtype=np.int64),
                        "value": np.ascontiguousarray(block[:, chan_idx]),
                    }
                )

    return splits_df.mapInPandas(decode, "ts long, value smallint")


def read_scaled_channel(
    spark: SparkSession,
    channel_file: str,
    timestamps_file: str | None = None,
    bit_to_uv: float = 4096.0 / 2.0**15,
    channel_id: int | None = None,
    **kwargs,
) -> DataFrame:
    """S10/P6: channel scan with bits→µV scaling (reference ``load_ns5``,
    ``jagular/spikes.py:63-90``; scale constant at ``spikes.py:87``).
    ``.ns5`` containers decode through the NEURALSG parser
    (:func:`read_ns5_channel` — ``channel_id`` selects the channel);
    flat ``.raw`` channels take the S4 path. The scaling projection (the
    only Spark-side logic) is a JVM column expression either way."""
    if channel_file.endswith(".ns5"):
        if channel_id is None:
            raise ValueError("reading an .ns5 container requires channel_id")
        raw = read_ns5_channel(spark, channel_file, channel_id, **kwargs)
    else:
        raw = read_raw_channel(spark, channel_file, timestamps_file, **kwargs)
    return raw.withColumn("uv", F.col("value") * F.lit(float(bit_to_uv)))


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 256,
    order_cols: Sequence[str] | None = None,
) -> dict:
    """Small-file compaction — the operational sibling of the
    per-channel sink (S8): long-running ingest (micro-batches, one
    file per trigger) accumulates thousands of tiny parquet files, and
    at warehouse scale the file-listing + task-per-file overhead
    dominates scans. Rewrites the dataset into ~``target_mb`` output
    files: ``repartitionByRange(order_cols)`` when an ordering is given
    (keeps range clustering so downstream ts-predicates still prune row
    groups), plain round-robin otherwise. Sizing uses the INPUT byte
    count, so recompression can land under target — the guarantee is
    file COUNT, not exact size. Writes to ``out_path`` (side-by-side,
    then swap at the catalog level — never in place)."""
    import glob as _glob
    import math

    files = [
        f for f in _glob.glob(os.path.join(in_path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]
    in_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(in_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    if order_cols:
        df = df.repartitionByRange(n_out, *[F.col(c) for c in order_cols])
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    out_files = [
        f for f in _glob.glob(os.path.join(out_path, "**", "*"), recursive=True)
        if os.path.isfile(f) and f.endswith(".parquet")
    ]
    return {
        "n_files_in": len(files),
        "n_files_out": len(out_files),
        "in_bytes": in_bytes,
        "target_files": n_out,
    }
