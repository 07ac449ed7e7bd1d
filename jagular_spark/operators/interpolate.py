"""Linear gap interpolation (SURVEY §2.6 I2/I3).

Reference behavior (``jagular/utils.py:459-528``): for each interior gap
of ≤ ``max_gap_size`` missing samples, synthesize the missing integer
timestamps and linearly interpolate every value column between the two
boundary samples, casting back to the storage type; larger gaps are left
as epoch boundaries. The reference carries ``prev_ts/prev_channel_data``
across blocks to handle gaps straddling block boundaries
(``utils.py:443-446, 461-477``); in Spark that special case is replaced
by a tiny edge-row pass:

1. ``repartitionByRange(keys + ts)`` + local sort: each task detects its
   own interior gaps vectorized and emits ``(left, right)`` boundary
   pairs — plus its first/last row per key as tagged edge rows.
2. Edge rows (O(2 × n_partitions), tiny) are paired across partition
   boundaries with one window, yielding the cross-boundary gaps.
3. Qualifying gaps explode ``sequence(left+step, right-step, step)``
   and interpolate JVM-side (built-in expressions, codegen'd); the new
   rows union back with the originals.

So the heavy data is touched exactly once, gap synthesis is proportional
to the number of missing samples, and there is no carried state.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("value",),
    max_gap_size: int = 0,
    step: int = 1,
    partition_cols: Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fill interior gaps of 1..max_gap_size missing samples with
    linearly interpolated rows; return originals ∪ synthesized rows.

    ``max_gap_size`` counts missing samples (a gap of ``diff = k*step``
    has ``k-1`` missing); the reference's inclusive boundary
    (``utils.py:463, 485``) is preserved: a gap with exactly
    ``max_gap_size`` missing samples IS filled. Values are cast back to
    their input types with truncation-toward-zero, matching numpy
    ``astype`` on the reference path.
    """
    if max_gap_size <= 0:
        return df
    keys = list(partition_cols) if partition_cols else []
    vals = list(value_cols)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    order = keys + [ts_col]
    value_types = dict(df.select(*vals).dtypes)
    parted = (
        df.select(*order, *vals)
        .repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
    )

    key_schema = ", ".join(f"{k} {t}" for k, t in df.select(*keys).dtypes) + ", " if keys else ""
    pair_schema = (
        key_schema
        + "kind string, pid int, left_ts long, right_ts long, "
        + ", ".join(f"l_{c} double, r_{c} double" for c in vals)
    )

    def find_gaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        acc = [b for b in batches if len(b)]
        if not acc:
            return
        pdf = pd.concat(acc, ignore_index=True) if len(acc) > 1 else acc[0]
        n_rows = len(pdf)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)

        # Group starts via key-change detection on the sorted partition
        # (no per-group groupby slicing — one numpy pass).
        if keys:
            from jagular_spark.operators.grouped import key_change_mask

            change = key_change_mask(pdf[keys])
            starts = np.flatnonzero(change)
        else:
            change = np.zeros(n_rows, dtype=bool)
            change[0] = True
            starts = np.array([0], dtype=np.int64)
        ends = np.append(starts[1:], n_rows) - 1

        # Interior gaps: consecutive rows of the SAME group with a
        # timestamp jump. Emission is fully vectorized fancy indexing.
        if n_rows > 1:
            gap_idx = np.flatnonzero(~change[1:] & (np.diff(ts) > step))
        else:
            gap_idx = np.array([], dtype=np.int64)

        li = np.concatenate([gap_idx, starts, ends])
        ri = np.concatenate([gap_idx + 1, starts, ends])
        kind = np.concatenate(
            [
                np.full(len(gap_idx), "gap", dtype=object),
                np.full(len(starts), "F", dtype=object),
                np.full(len(ends), "L", dtype=object),
            ]
        )
        out: dict[str, object] = {k: pdf[k].to_numpy()[li] for k in keys}
        out["kind"] = kind
        out["pid"] = np.full(len(li), pid, dtype=np.int32)
        out["left_ts"] = ts[li]
        out["right_ts"] = ts[ri]
        for c in vals:
            v = pdf[c].to_numpy(dtype=np.float64)
            out[f"l_{c}"] = v[li]
            out[f"r_{c}"] = v[ri]
        yield pd.DataFrame(out)

    pairs = parted.mapInPandas(find_gaps, pair_schema)

    # ONE window pass consumes the (tiny) pairs frame: within each key,
    # ordering by (pid, left_ts, kind) sequences every physical
    # partition's rows as F, gaps..., L — so lead() of an 'L' row is the
    # next partition's 'F' row, yielding the cross-boundary gap, while
    # 'gap' rows already carry their own boundary values. No cache, no
    # second execution of the heavy scan.
    w = (
        Window.partitionBy(*keys).orderBy("pid", "left_ts", F.col("kind"))
        if keys
        else Window.orderBy("pid", "left_ts", F.col("kind"))
    )
    is_gap = F.col("kind") == "gap"
    enriched = pairs.select(
        *keys,
        "kind",
        "left_ts",
        F.when(is_gap, F.col("right_ts")).otherwise(F.lead("left_ts").over(w)).alias("right_ts"),
        F.lead("kind").over(w).alias("kind2"),
        *[F.col(f"l_{c}") for c in vals],
        *[
            F.when(is_gap, F.col(f"r_{c}")).otherwise(F.lead(f"l_{c}").over(w)).alias(f"r_{c}")
            for c in vals
        ],
    )
    gaps = enriched.where(
        is_gap
        | (
            (F.col("kind") == "L")
            & (F.col("kind2") == "F")
            & (F.col("right_ts") - F.col("left_ts") > step)
        )
    ).select(*keys, "left_ts", "right_ts", *[F.col(f"l_{c}") for c in vals], *[F.col(f"r_{c}") for c in vals])

    # Fillable: 1..max_gap_size missing samples (inclusive upper bound).
    n_missing = ((F.col("right_ts") - F.col("left_ts")) / F.lit(step)).cast("long") - 1
    fillable = gaps.where(n_missing.between(1, max_gap_size))

    filled = fillable.withColumn(
        ts_col,
        F.explode(
            F.sequence(
                F.col("left_ts") + F.lit(step),
                F.col("right_ts") - F.lit(step),
                F.lit(step),
            )
        ),
    )
    frac = (F.col(ts_col) - F.col("left_ts")) / (F.col("right_ts") - F.col("left_ts"))
    for c in vals:
        interp = F.col(f"l_{c}") + (F.col(f"r_{c}") - F.col(f"l_{c}")) * frac
        # Spark's double→integral CAST truncates toward zero, matching the
        # reference's numpy .astype(np.int16) (utils.py:519).
        filled = filled.withColumn(c, interp.cast(value_types[c]))
    filled = filled.select(*keys, ts_col, *vals)

    original = df.select(*keys, ts_col, *vals)
    return original.unionByName(filled)
