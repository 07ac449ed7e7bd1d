"""Native ``jagular_rec`` Spark data source (SURVEY §4's optional
DataSourceV2 promotion) built on PySpark 4's Python Data Source API.

The helper API (``sources/rec.read_packets``) plans splits and prunes
files imperatively; this wrapper hands the SAME planner to Catalyst so
pruning composes with the engine:

- ``spark.read.format("jagular_rec").load(path)`` — schema, catalog
  bounds and packet-aligned splits all come from the existing S1-S7
  machinery (read_config / _bounds_one / _plan_splits).
- **Filter pushdown**: with ``spark.sql.python.filterPushdown.enabled``
  (on by default in jagular_spark sessions), Catalyst offers the
  query's predicates to :meth:`JagularRecReader.pushFilters`; ts-range
  comparisons prune whole FILES via the catalog before any data byte is
  read — the same effect as parquet row-group stats pruning, now driven
  by the optimizer instead of helper arguments. All filters are
  reported back as unhandled, so Spark re-applies them exactly
  (pruning is a superset guarantee, not exact row filtering).
- Explicit ``ts_start``/``ts_stop`` options remain as the pushdown
  fallback for vanilla sessions where the config is off.
- Each split is one :class:`InputPartition`; ``read`` emits Arrow
  RecordBatches from the same vectorized ``np.frombuffer`` decode as
  the helper scan — no per-row Python.

Scale: planning is O(files) driver-side with 8 bytes of stats I/O per
file (the FileSourceScanExec regime); decode parallelism = split count.

Reference parity: the reference's reader stack is
``jagular/readers.py:215-343`` (schema, bounds, block scan); its
bounded-range read is a stub (``jagular/io.py:204-232``) — here it is
a real optimizer-integrated pruning path.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

REC_SCHEMA = "file_idx int, packet_idx long, ts long, channels array<smallint>"


@dataclass
class RecSplit(InputPartition):
    file_idx: int
    path: str
    first_packet: int
    n_packets: int


def _resolve_paths(opts: dict) -> list[str]:
    raw = opts.get("path") or opts.get("paths")
    if not raw:
        raise ValueError("jagular_rec: 'path' option is required")
    paths: list[str] = []
    for p in str(raw).split(","):
        p = p.strip()
        hits = sorted(_glob.glob(p)) if any(c in p for c in "*?[") else [p]
        paths.extend(hits)
    if not paths:
        raise ValueError(f"jagular_rec: no files match {raw!r}")
    return paths


class JagularRecReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        from jagular_spark.sources.rec import _bounds_one, read_config

        self.paths = _resolve_paths(options)
        self.cfg = read_config(self.paths[0])
        self.split_bytes = int(options.get("split_bytes", 128 * 1024 * 1024))
        chans = options.get("channels")
        self.channels: list[int] | None = (
            [int(c) for c in str(chans).split(",")] if chans else None
        )
        # explicit-bound fallback for sessions without Python filter
        # pushdown; pushFilters() narrows these further
        self.ts_start = int(options["ts_start"]) if "ts_start" in options else None
        self.ts_stop = int(options["ts_stop"]) if "ts_stop" in options else None
        # catalog stats: two 4-byte reads per file, driver-side — the
        # same planning regime as parquet footer reads
        self._catalog = [
            (i, p, *_bounds_one(p, self.cfg)) for i, p in enumerate(self.paths)
        ]

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Harvest ts-range bounds for FILE pruning; report every filter
        back as unhandled so Spark re-applies exact row semantics."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr else None
            if col == "ts":
                v = getattr(f, "value", None)
                if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo = int(v) + (1 if isinstance(f, GreaterThan) else 0)
                    self.ts_start = lo if self.ts_start is None else max(self.ts_start, lo)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    hi = int(v) - (1 if isinstance(f, LessThan) else 0)
                    self.ts_stop = hi if self.ts_stop is None else min(self.ts_stop, hi)
                elif isinstance(f, EqualTo):
                    self.ts_start = int(v) if self.ts_start is None else max(self.ts_start, int(v))
                    self.ts_stop = int(v) if self.ts_stop is None else min(self.ts_stop, int(v))
        return iter(filters)

    def partitions(self) -> Sequence[RecSplit]:
        from jagular_spark.sources.rec import _plan_splits

        class _Row:
            __slots__ = ("file_idx", "path", "ts_start", "ts_stop", "n_packets")

            def __init__(self, t):
                (self.file_idx, self.path, self.ts_start, self.ts_stop,
                 self.n_packets) = t

        splits = _plan_splits(
            [_Row(t) for t in self._catalog],
            self.cfg,
            self.ts_start,
            self.ts_stop,
            self.split_bytes,
        )
        return [RecSplit(*s) for s in splits]

    def read(self, part: RecSplit):
        import numpy as np
        import pyarrow as pa

        cfg = self.cfg
        sel = (
            self.channels
            if self.channels is not None
            else list(range(cfg.n_spike_channels))
        )
        positions = [cfg.spike_channel_positions[c] for c in sel]
        dt = np.dtype(
            [
                ("header", np.uint8, (cfg.header_size,)),
                ("ts", np.uint32),
                ("channels", np.int16, (cfg.n_channels,)),
            ]
        )
        with open(part.path, "rb") as f:
            f.seek(cfg.config_size + part.first_packet * cfg.packet_size)
            buf = f.read(part.n_packets * cfg.packet_size)
        data = np.frombuffer(buf, dtype=dt, count=len(buf) // cfg.packet_size)
        n = len(data)
        w = len(positions)
        gathered = np.ascontiguousarray(data["channels"][:, positions])
        channels = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * w, w, dtype=np.int32)),
            pa.array(gathered.ravel(), type=pa.int16()),
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(n, part.file_idx, dtype=np.int32)),
                pa.array(part.first_packet + np.arange(n, dtype=np.int64)),
                pa.array(data["ts"].astype(np.int64)),
                channels,
            ],
            ["file_idx", "packet_idx", "ts", "channels"],
        )


class JagularRecDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jagular_rec"

    def schema(self) -> str:
        return REC_SCHEMA

    def reader(self, schema) -> JagularRecReader:
        return JagularRecReader(dict(self.options))


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('jagular_rec')``."""
    spark.dataSource.register(JagularRecDataSource)
