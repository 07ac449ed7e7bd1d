"""Timestamp hygiene operators (SURVEY §2.4 A5-A9, §2.6 I1).

Reference semantics (re-expressed, not ported):

- ``dedup_keep_first``   ~ ``jagular/utils.py:292-346`` (sanitize_timestamps
  dedup step, keep-FIRST-occurrence, ``utils.py:331-338``)
- ``is_sorted``          ~ ``jagular/utils.py:54-74``
- ``duplicate_timestamps`` ~ ``jagular/utils.py:96-113``
- ``contiguous_segments``  ~ ``jagular/utils.py:124-290`` (gaps-and-islands:
  break where diff >= 2*step; stop bound exclusive = last + step)
- ``gap_lengths``        ~ ``jagular/utils.py:115-122``
- ``check_timestamps``   ~ ``jagular/utils.py:348-390``

Scale design
------------
The reference streams one array through a single process. Here the
stream may be 100 TB, so nothing below ever funnels the full data
through a single-partition global window:

- Neighbor-pair ops (island detection, sortedness) run as
  ``repartitionByRange(order) + sortWithinPartitions + mapInPandas``:
  each executor resolves its own range locally and emits a tiny
  per-partition summary (local segments / boundary rows). A second,
  cheap pass merges across partition boundaries — that pass touches
  ``O(n_segments)`` or ``O(n_partitions)`` rows, not ``O(n_samples)``.
- Keyed variants (per channel / per user) put the key first in the
  range partitioning so groups never straddle more partitions than
  their size requires, and the merge pass is a window partitioned by
  the key over segment rows only.
- Dedup is a plain keyed window (``partitionBy(ts)``) — the shuffle is
  unavoidable for exact keep-first semantics, but it hash-distributes
  on ts so there is no skew (each ts has a handful of duplicates).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: Sequence[str] | None) -> list[str]:
    return list(cols) if cols else []


# ---------------------------------------------------------------------------
# Dedup (keep first occurrence)
# ---------------------------------------------------------------------------

def dedup_keep_first(
    df: DataFrame,
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Drop duplicate timestamps, keeping the FIRST occurrence.

    "First" is defined by ``tiebreak_cols`` (e.g. ``(file_id,
    packet_idx)`` captured at decode) — the stable tiebreaker SURVEY §7
    calls out as required for exact reference parity under unordered
    partitions. Without tiebreak cols this degrades to
    ``dropDuplicates`` (any occurrence), which callers must opt into.
    """
    keys = _cols(partition_cols) + [ts_col]
    if not tiebreak_cols:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in tiebreak_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_timestamps(
    df: DataFrame,
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows that would be dropped by :func:`dedup_keep_first` (the 2nd+
    occurrence of each duplicated timestamp)."""
    keys = _cols(partition_cols) + [ts_col]
    order = [F.col(c).asc() for c in (tiebreak_cols or [ts_col])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Sortedness / audit
# ---------------------------------------------------------------------------

def is_sorted(
    df: DataFrame,
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> bool:
    """True iff ``ts_col`` is non-decreasing when rows are ordered by
    ``order_cols`` (default: physical order is meaningless in Spark, so
    default order is the ts column itself — which checks for exact
    equality of sort orders, i.e. detects ties only; pass provenance
    cols like ``(file_id, packet_idx)`` for the reference semantics).

    Distributed: range-partition on the order, check each partition
    locally, then compare only the O(n_partitions) boundary rows on the
    driver. No global single-partition window.
    """
    order = _cols(order_cols) or [ts_col]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.select(*order, ts_col).repartitionByRange(n, *order).sortWithinPartitions(*order)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first_ts = last_ts = None
        ok = True
        for pdf in batches:
            if pdf.empty:
                continue
            ts = pdf[ts_col].to_numpy()
            if (ts[1:] < ts[:-1]).any():
                ok = False
            if first_ts is None:
                first_ts = ts[0]
            last_ts = ts[-1]
        if first_ts is None:
            return
        yield pd.DataFrame({"pid": [pid], "first_ts": [first_ts], "last_ts": [last_ts], "ok": [ok]})

    summary = parted.mapInPandas(summarize, "pid int, first_ts long, last_ts long, ok boolean").collect()
    if not summary:
        return True
    if not all(r["ok"] for r in summary):
        return False
    # repartitionByRange assigns ascending key ranges to ascending partition
    # ids — order boundary rows by pid, NOT by ts (ts order is what we're
    # checking), then verify the O(n_partitions) junctions.
    rows = sorted(summary, key=lambda r: r["pid"])
    return all(rows[i]["last_ts"] <= rows[i + 1]["first_ts"] for i in range(len(rows) - 1))


def sortedness_stats(
    df: DataFrame,
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-group sortedness AUDIT as a DataFrame (the reporting twin of
    :func:`is_sorted`'s global boolean — A5 with provenance semantics):
    order each group by ``order_cols`` (arrival/provenance order) and
    count timestamp inversions against that order.
    ``(…, n_rows, n_inversions, is_sorted)``. One window shuffle per
    group key; the aggregate is map-side combinable."""
    keys = _cols(partition_cols)
    order = _cols(order_cols) or [ts_col]
    w = Window.partitionBy(*keys).orderBy(*order)
    inv = (F.lag(ts_col).over(w) > F.col(ts_col)).cast("int")
    return (
        df.withColumn("__inv", F.coalesce(inv, F.lit(0)))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__inv").cast("long").alias("n_inversions"),
        )
        .withColumn("is_sorted", F.col("n_inversions") == 0)
    )


def check_timestamps(
    df: DataFrame,
    ts_col: str = "ts",
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Post-write audit (reference runs it after every extraction,
    ``utils.py:544-547``): per group — row count, distinct count,
    duplicate flag, monotone flag, bounds. One hash aggregation; the
    monotone check rides on min/max of neighbor diffs computed with the
    same distributed pattern as :func:`contiguous_segments` when needed,
    but for audit purposes count==distinct ∧ sorted-by-construction
    suffices and costs a single shuffle.
    """
    keys = _cols(partition_cols)
    gb = df.groupBy(*keys) if keys else df.groupBy()
    return gb.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(ts_col)).alias("n_distinct"),
        F.min(ts_col).alias("ts_min"),
        F.max(ts_col).alias("ts_max"),
    ).withColumn("has_duplicates", F.col("n") != F.col("n_distinct"))


# ---------------------------------------------------------------------------
# Gaps-and-islands segmentation
# ---------------------------------------------------------------------------

def infer_step(
    df: DataFrame,
    ts_col: str = "ts",
    partition_cols: Sequence[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Median inter-sample interval per group (reference:
    ``step = np.median(np.diff(data))``, ``utils.py:189-190``).

    Diffs are computed locally inside range partitions (boundary diffs —
    one per partition — are omitted; negligible at scale and exact for
    single-partition tests). ``exact=True`` uses ``median`` (full sort of
    diffs); default uses ``percentile_approx`` (t-digest, one pass).
    """
    keys = _cols(partition_cols)
    diffs = _local_diffs(df, ts_col, keys)
    gb = diffs.groupBy(*keys) if keys else diffs.groupBy()
    agg = F.median("__diff") if exact else F.percentile_approx("__diff", 0.5)
    return gb.agg(agg.cast("double").alias("step"))


def _local_diffs(df: DataFrame, ts_col: str, keys: list[str]) -> DataFrame:
    n = df.sparkSession.sparkContext.defaultParallelism
    order = keys + [ts_col]
    parted = df.select(*order).repartitionByRange(n, *order).sortWithinPartitions(*order)

    def diffs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc: list[pd.DataFrame] = []
        for pdf in batches:
            acc.append(pdf)
        if not acc:
            return
        pdf = pd.concat(acc, ignore_index=True)
        if keys:
            for kv, g in pdf.groupby(keys, sort=False):
                if len(g) < 2:
                    continue
                d = np.diff(g[ts_col].to_numpy())
                out = pd.DataFrame({"__diff": d})
                kv = kv if isinstance(kv, tuple) else (kv,)
                for k, v in zip(keys, kv):
                    out[k] = v
                yield out[keys + ["__diff"]]
        else:
            if len(pdf) >= 2:
                yield pd.DataFrame({"__diff": np.diff(pdf[ts_col].to_numpy())})

    key_schema = ", ".join(f"{k} {t}" for k, t in df.select(*keys).dtypes) if keys else ""
    schema = (key_schema + ", " if key_schema else "") + "__diff long"
    return parted.mapInPandas(diffs, schema)


def _segments_window(
    df: DataFrame,
    ts_col: str,
    gap: float,
    step: float,
    keys: list[str],
) -> DataFrame:
    """Keyed gaps-and-islands with pure window functions (all JVM,
    whole-stage codegen): lag → break flag → running sum → hash agg.
    Right strategy when the key space provides the parallelism (each
    key's stream fits a task's spill budget); the range-partitioned
    strategy below handles the unkeyed / giant-key case."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    brk = (
        F.when(F.col(ts_col) - F.lag(ts_col).over(w) >= F.lit(gap), 1).otherwise(0).cast("long")
    )
    return (
        df.select(*keys, ts_col)
        .withColumn("__seg", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(*keys, "__seg")
        .agg(
            F.min(ts_col).alias("ts_start"),
            (F.max(ts_col) + F.lit(step).cast("long")).alias("ts_stop"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .withColumn("segment_id", F.col("__seg"))
        .drop("__seg")
        .select(*keys, "segment_id", "ts_start", "ts_stop", "n_samples")
    )


def contiguous_segments(
    df: DataFrame,
    ts_col: str = "ts",
    step: float | None = None,
    gap_factor: float = 2.0,
    partition_cols: Sequence[str] | None = None,
    num_partitions: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Gaps-and-islands: split the (per-group) timestamp stream wherever
    ``ts - prev_ts >= gap_factor * step``; emit
    ``(partition_cols..., segment_id, ts_start, ts_stop, n_samples)``
    with ``ts_stop`` exclusive (= last ts + step), matching the
    reference's ``get_contiguous_segments`` (``utils.py:124-248``,
    doctest ``[1,2,3,4,10,11,12] -> [[1,5],[10,13]]``).

    Two-level plan (scales to streams that dwarf one executor):

    1. ``repartitionByRange(keys + ts)`` → each task finds LOCAL islands
       with vectorized numpy and emits only segment summaries.
    2. A window over those summaries (tiny: O(segments)) merges islands
       that touch across partition boundaries, then numbers them.

    Duplicate timestamps (diff 0 < step) never split a segment but do
    not inflate ``n_samples`` semantics — dedup first if exactness on
    counts matters.

    ``strategy``: ``'window'`` = keyed window functions (JVM codegen;
    parallel across keys, single task per key); ``'range'`` = the
    two-level plan above (parallel within a single huge stream);
    ``'auto'`` = window when ``partition_cols`` given, else range.
    """
    if step is None:
        raise ValueError(
            "step=None requires inference; call infer_step() and pass the "
            "value explicitly (keeps this op a single deterministic plan)"
        )
    keys = _cols(partition_cols)
    gap_ = float(gap_factor) * float(step)
    if strategy == "window" or (strategy == "auto" and keys):
        # keyed: windows partitioned by key are fully parallel and stay
        # inside whole-stage codegen — no Python workers on the hot path
        return _segments_window(df, ts_col, gap_, step, keys)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    order = keys + [ts_col]
    parted = df.select(*order).repartitionByRange(n, *order).sortWithinPartitions(*order)
    gap = float(gap_factor) * float(step)

    def local_segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = [pdf for pdf in batches]
        if not acc:
            return
        pdf = pd.concat(acc, ignore_index=True)
        if pdf.empty:
            return

        def segs(ts: "np.ndarray") -> pd.DataFrame:
            brk = np.flatnonzero(np.diff(ts) >= gap)
            starts = np.concatenate(([0], brk + 1))
            stops = np.concatenate((brk, [len(ts) - 1]))
            return pd.DataFrame(
                {
                    "ts_start": ts[starts],
                    "ts_last": ts[stops],
                    "n_samples": (stops - starts + 1).astype("int64"),
                }
            )

        if keys:
            for kv, g in pdf.groupby(keys, sort=False):
                out = segs(g[ts_col].to_numpy())
                kv = kv if isinstance(kv, tuple) else (kv,)
                for k, v in zip(keys, kv):
                    out[k] = v
                yield out[keys + ["ts_start", "ts_last", "n_samples"]]
        else:
            yield segs(pdf[ts_col].to_numpy())

    key_schema = ", ".join(f"{k} {t}" for k, t in df.select(*keys).dtypes) if keys else ""
    schema = (key_schema + ", " if key_schema else "") + "ts_start long, ts_last long, n_samples long"
    local = parted.mapInPandas(local_segments, schema)

    # Merge across partition boundaries: a local segment continues the
    # previous one when the boundary gap is < gap. Window over segment
    # rows only (O(n_segments), not O(n_samples)).
    w = Window.partitionBy(*keys).orderBy("ts_start") if keys else Window.orderBy("ts_start")
    merged = (
        local.withColumn("__prev_last", F.lag("ts_last").over(w))
        .withColumn(
            "__new_seg",
            (F.col("__prev_last").isNull() | ((F.col("ts_start") - F.col("__prev_last")) >= F.lit(gap))).cast("int"),
        )
        .withColumn("__seg", F.sum("__new_seg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    gb_keys = keys + ["__seg"]
    out = (
        merged.groupBy(*gb_keys)
        .agg(
            F.min("ts_start").alias("ts_start"),
            (F.max("ts_last") + F.lit(step).cast("long")).alias("ts_stop"),
            F.sum("n_samples").alias("n_samples"),
        )
        .withColumn("segment_id", F.col("__seg") - 1)
        .drop("__seg")
    )
    return out.select(*keys, "segment_id", "ts_start", "ts_stop", "n_samples")


def gap_lengths(
    segments: DataFrame,
    partition_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Inter-segment gap lengths (reference ``utils.py:115-122``:
    ``segments[1:, 0] - segments[:-1, 1]``). Window over segment rows —
    tiny relative to the sample stream."""
    keys = _cols(partition_cols)
    w = Window.partitionBy(*keys).orderBy("ts_start") if keys else Window.orderBy("ts_start")
    return (
        segments.withColumn("next_start", F.lead("ts_start").over(w))
        .where(F.col("next_start").isNotNull())
        .select(
            *keys,
            "segment_id",
            F.col("ts_stop").alias("gap_start"),
            F.col("next_start").alias("gap_stop"),
            (F.col("next_start") - F.col("ts_stop")).alias("gap_len"),
        )
    )
