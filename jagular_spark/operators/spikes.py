"""Spike detection pipeline (SURVEY §2.7 F7, §2.5 W1-W4, §2.4 A3,
§2.3 J2-J4, §2.2 P4/P5).

Composition (reference ``detect_spikes``, ``jagular/spikes.py:142-186``):
MAD threshold → debounced crossings → censor (dead time) → waveform
extraction with peak re-centering → tetrode assembly → artifact filter.

Spark design notes:
- threshold (A3) = one hash agg per (channel, segment); exact median.
- crossings (W1) = filter + ``lead`` window per (channel, segment) —
  JVM-side; the window input is already reduced by the threshold
  predicate? No: debounce needs the NEXT SAMPLE, so the window runs on
  samples, then the predicate filters. To keep the sort cheap the op
  accepts pre-filtered candidate regions when the caller knows them.
- censor (W2) is inherently sequential (each decision depends on the
  last KEPT edge — ``spikes.py:303-337``): ``applyInPandas`` over
  crossing rows only (tiny: crossings ≪ samples).
- extract (J2/W3/W4) = bucketed range join (equi-join on ts DIV bucket
  ± 1, then range predicate — scales like a hash join, no broadcast
  nested loop), then sorted array gather, argmin re-centering and
  zero-padding as pure array expressions.
- tetrode (J3/J4) = groupBy(peak) + pivot/collect over the channel dim.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jagular_spark.operators.grouped import grouped_map_in_pandas


# ---------------------------------------------------------------------------
# A3: robust MAD threshold
# ---------------------------------------------------------------------------

def mad_threshold(
    df: DataFrame,
    value_col: str = "value",
    multiplier: float = 4.0,
    partition_cols: Sequence[str] = ("channel_id",),
    approx: bool = False,
) -> DataFrame:
    """``multiplier * median(|x|) / 0.6745`` per group (reference
    ``get_threshold``, ``jagular/spikes.py:239-258``). Computing it per
    (channel, segment) gives the drift-adaptive threshold README
    promises. ``approx=True`` uses t-digest percentile for one-pass
    scale."""
    keys = list(partition_cols)
    med = (
        F.percentile_approx(F.abs(F.col(value_col)), 0.5)
        if approx
        else F.median(F.abs(F.col(value_col)))
    )
    return df.groupBy(*keys).agg(
        (F.lit(multiplier) * med / F.lit(0.6745)).alias("threshold")
    )


# ---------------------------------------------------------------------------
# W1: debounced threshold crossings
# ---------------------------------------------------------------------------

def crossings(
    df: DataFrame,
    thresholds: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    partition_cols: Sequence[str] = ("channel_id", "segment_id"),
    polarity: str = "neg",
    step: int = 1,
) -> DataFrame:
    """Samples that cross the threshold AND whose next sample also
    crosses (debounce, reference ``spikes.py:339-375``). Implements the
    *intended* 'both' polarity (the reference's elif chain drops it —
    SURVEY §2.10, do-not-replicate).

    ``thresholds``: one row per threshold group (broadcast).
    """
    keys = list(partition_cols)
    tkeys = [c for c in thresholds.columns if c != "threshold"]
    joined = df.join(F.broadcast(thresholds), on=tkeys, how="inner")
    if polarity == "neg":
        pred = F.col(value_col) < -F.col("threshold")
    elif polarity == "pos":
        pred = F.col(value_col) > F.col("threshold")
    elif polarity == "both":
        pred = F.abs(F.col(value_col)) > F.col("threshold")
    else:
        raise ValueError(f"polarity must be neg|pos|both, got {polarity!r}")

    w = Window.partitionBy(*keys).orderBy(ts_col)
    below = pred.cast("int")
    return (
        joined.withColumn("__cross", below)
        .withColumn("__next_cross", F.lead("__cross").over(w))
        .withColumn("__next_ts", F.lead(ts_col).over(w))
        .where(
            (F.col("__cross") == 1)
            & (F.col("__next_cross") == 1)
            & (F.col("__next_ts") == F.col(ts_col) + step)
        )
        .drop("__cross", "__next_cross", "__next_ts", "threshold")
    )


def crossings_chunked(
    df: DataFrame,
    thresholds: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    partition_cols: Sequence[str] = ("channel_id", "segment_id"),
    polarity: str = "neg",
    step: int = 1,
    buffer_len: int = 2**22,
) -> DataFrame:
    """:func:`crossings` with a range-chunked window — the huge-epoch
    scale path. A gapless multi-day recording is ONE (channel, segment)
    group, so the plain lead-window serializes it into one task; here
    the window partitions on ``(keys, ts DIV span)`` instead, and each
    chunk receives a 1-row halo (the debounce looks exactly one sample
    ahead): any row in the first ``step`` ticks of chunk ``c`` is also
    emitted into chunk ``c-1`` as halo. Core rows of every chunk then
    see the same ``lead`` values as the global window, so output is
    exactly :func:`crossings` — mirrors the ``filtfilt_chunked``
    strategy (reference chunking contract, ``jagular/filtering.py:
    148-161``), with halo = 1 row instead of the filter's impulse
    response."""
    keys = list(partition_cols)
    tkeys = [c for c in thresholds.columns if c != "threshold"]
    joined = df.join(F.broadcast(thresholds), on=tkeys, how="inner")
    if polarity == "neg":
        pred = F.col(value_col) < -F.col("threshold")
    elif polarity == "pos":
        pred = F.col(value_col) > F.col("threshold")
    elif polarity == "both":
        pred = F.abs(F.col(value_col)) > F.col("threshold")
    else:
        raise ValueError(f"polarity must be neg|pos|both, got {polarity!r}")

    span = buffer_len * step
    c0 = F.floor(F.col(ts_col) / F.lit(span))
    in_prev_halo = (F.col(ts_col) - c0 * F.lit(span)) < F.lit(step)
    assignments = F.filter(
        F.array(
            F.struct(c0.alias("c"), F.lit(True).alias("core")),
            F.struct((c0 - 1).alias("c"), F.lit(False).alias("core")),
        ),
        lambda a: a["core"] | in_prev_halo,
    )
    chunked = (
        joined.withColumn("__a", F.explode(assignments))
        .withColumn("__chunk", F.col("__a")["c"])
        .withColumn("__is_core", F.col("__a")["core"])
        .drop("__a")
    )
    w = Window.partitionBy(*keys, "__chunk").orderBy(ts_col)
    below = pred.cast("int")
    return (
        chunked.withColumn("__cross", below)
        .withColumn("__next_cross", F.lead("__cross").over(w))
        .withColumn("__next_ts", F.lead(ts_col).over(w))
        .where(
            F.col("__is_core")
            & (F.col("__cross") == 1)
            & (F.col("__next_cross") == 1)
            & (F.col("__next_ts") == F.col(ts_col) + step)
        )
        .drop("__cross", "__next_cross", "__next_ts", "__chunk", "__is_core", "threshold")
    )


# ---------------------------------------------------------------------------
# W2: censor (dead-time suppression) — sequential, pandas per group
# ---------------------------------------------------------------------------

def censor(
    df: DataFrame,
    width: int = 30,
    ts_col: str = "ts",
    partition_cols: Sequence[str] = ("channel_id", "segment_id"),
) -> DataFrame:
    """Keep the first crossing; drop later ones within ``width`` of the
    last KEPT edge (reference ``spikes.py:303-337``, doctest
    ``[110,111,112,120,270,271,280] w=30 → [110,270]``). The boundary is
    exclusive like the reference's ``sample > edges[-1] + width``
    (``spikes.py:335``): an edge landing exactly ``width`` after the
    last kept edge is censored. Running state makes this non-windowable;
    the pandas kernel sees only crossing rows, which are sparse."""
    keys = list(partition_cols)
    in_schema = df.select(*keys, ts_col).schema
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[ts_col].to_numpy()
        keep = []
        last_kept = None
        for i, t in enumerate(ts):
            if last_kept is None or t - last_kept > width:
                keep.append(i)
                last_kept = t
        return pdf.iloc[keep]

    # crossings are sparse but spread over MANY (channel, segment) groups
    # — use the partition-batched grouped-map strategy (grouped.py)
    return grouped_map_in_pandas(df.select(*keys, ts_col), keys, [ts_col], kernel, schema)


# ---------------------------------------------------------------------------
# J2/W3/W4: waveform extraction with peak re-centering
# ---------------------------------------------------------------------------

def bucketed_range_join(
    samples: DataFrame,
    points: DataFrame,
    radius_before: int,
    radius_after: int,
    ts_col: str = "ts",
    point_ts_col: str = "point_ts",
    join_cols: Sequence[str] = ("channel_id",),
    step: int = 1,
) -> DataFrame:
    """Range join ``samples.ts ∈ [point - before, point + after)`` as an
    equi-join: bucket width = the full window span; each point probes
    its bucket ±1. Scales like a hash join on (join_cols, bucket) —
    no broadcast-nested-loop, no skew (buckets are time-uniform)."""
    span = (radius_before + radius_after) * step
    keys = list(join_cols)
    s = samples.withColumn("__bucket", (F.col(ts_col) / F.lit(span)).cast("long"))
    p = points.withColumn(
        "__buckets",
        F.array(
            (F.col(point_ts_col) / F.lit(span)).cast("long") - 1,
            (F.col(point_ts_col) / F.lit(span)).cast("long"),
            (F.col(point_ts_col) / F.lit(span)).cast("long") + 1,
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    return s.join(p, on=keys + ["__bucket"], how="inner").where(
        (F.col(ts_col) >= F.col(point_ts_col) - radius_before * step)
        & (F.col(ts_col) < F.col(point_ts_col) + radius_after * step)
    ).drop("__bucket")


def extract_waveforms(
    samples: DataFrame,
    peaks: DataFrame,
    patch_size: int = 30,
    ts_col: str = "ts",
    value_col: str = "value",
    join_cols: Sequence[str] = ("channel_id",),
    step: int = 1,
    recenter: str = "min",
) -> DataFrame:
    """Gather a ``patch_size`` window around each censored crossing,
    re-center on the true extremum, zero-pad truncated edges (reference
    ``extract``, ``jagular/spikes.py:377-425``).

    Gather radius is ``size + size`` so the re-centered patch is always
    in view; the slice/argmin/pad steps are JVM array expressions.
    Output: one row per (join_cols..., peak_ts) with ``waveform``
    (length ``patch_size``) and the re-centered integer ``peak_ts``.
    """
    size = patch_size // 2
    keys = list(join_cols)
    pts = peaks.select(*keys, F.col(ts_col).alias("crossing_ts"))

    joined = bucketed_range_join(
        samples, pts, radius_before=2 * size, radius_after=2 * size,
        ts_col=ts_col, point_ts_col="crossing_ts", join_cols=keys, step=step,
    )
    # r18: pin the gather exchange at session width ON THE AGGREGATE
    # KEYS — the aggregate's required distribution is satisfied by the
    # explicit repartition, so the shuffle COUNT is unchanged, but an
    # explicit-N repartition is exempt from AQE coalescing. Without it,
    # the few-hundred-KB post-shuffle stage coalesces to ONE task and
    # the whole interpreted higher-order-function chain below (the
    # expensive part — HOFs never compile) runs single-threaded:
    # measured 8.0 s of single-task CPU at sf0.1, ~0.4 s spread wide.
    # At warehouse scale the stage is wide either way; this only stops
    # byte-based coalescing from serializing a CPU-bound projection.
    from jagular_spark.session import shuffle_width

    width = shuffle_width(samples.sparkSession)
    gathered = (
        joined.repartition(width, *keys, "crossing_ts")
        .groupBy(*keys, "crossing_ts")
        .agg(F.array_sort(F.collect_list(F.struct(F.col(ts_col), F.col(value_col).alias("v")))).alias("win"))
    )
    # W3: locate the extremum inside the ±size window around the
    # crossing. ``win`` is already the (ts, v) struct array — the
    # pre-r18 form re-derived vals/ts_arr projections and arrays_zip'd
    # them back together (two full per-row array rebuilds that existed
    # only to be taken apart again); filtering ``win`` directly is
    # element-identical. The in-center slice and its value array bind
    # ONCE per row as transform-lambda variables (the _grams_expr
    # idiom) instead of re-evaluating per reference.
    center_lo = F.col("crossing_ts") - size * step
    center_hi = F.col("crossing_ts") + size * step
    in_center = F.filter(
        "win", lambda s: (s[ts_col] >= center_lo) & (s[ts_col] < center_hi)
    )
    if recenter == "min":
        _ext = F.array_min
    else:
        _ext = F.array_max
    peak_ts = F.transform(
        F.array(in_center),
        lambda ic: F.transform(
            F.array(F.transform(ic, lambda s: s["v"].cast("double"))),
            # 1-based first-occurrence position of the extremum — the
            # numpy-argmin tiebreak, unchanged
            lambda cv: F.element_at(
                ic, F.array_position(cv, _ext(cv)).cast("int")
            )[ts_col],
        )[0],
    )[0]

    with_peak = gathered.withColumn("peak_ts", peak_ts)
    # final patch: [peak - size, peak + size) with zero-pad at stream edges (W4)
    lo = F.col("peak_ts") - size * step
    hi = F.col("peak_ts") + size * step
    patch = F.transform(
        F.filter("win", lambda s: (s[ts_col] >= lo) & (s[ts_col] < hi)),
        lambda s: s["v"].cast("double"),
    )
    n_before = F.aggregate(
        "win",
        F.lit(0),
        lambda acc, s: acc
        + F.when((s[ts_col] >= lo) & (s[ts_col] < F.col("peak_ts")), 1).otherwise(0),
    )
    pad_left = F.greatest(F.lit(0), F.lit(size) - n_before)
    pad_right = F.greatest(F.lit(0), F.lit(patch_size) - pad_left - F.size(patch))
    waveform = F.concat(
        F.array_repeat(F.lit(0.0), pad_left.cast("int")),
        patch,
        F.array_repeat(F.lit(0.0), pad_right.cast("int")),
    )
    return with_peak.select(*keys, "crossing_ts", "peak_ts", waveform.alias("waveform"))


# ---------------------------------------------------------------------------
# J3/J4/P4: tetrode assembly + artifact filter
# ---------------------------------------------------------------------------

def form_tetrode(
    samples: DataFrame,
    peak_times: DataFrame,
    tetrode_channels: Sequence[int],
    patch_size: int = 30,
    ts_col: str = "ts",
    value_col: str = "value",
    channel_col: str = "channel_id",
    artifact_bound: float = 300.0,
    step: int = 1,
) -> DataFrame:
    """Join one peak-time list against all 4 tetrode channel streams and
    assemble per-spike (4 × patch) waveforms; drop spikes where any
    sample exceeds ±artifact_bound (reference ``form_tetrode``,
    ``jagular/spikes.py:188-237``)."""
    size = patch_size // 2
    chans = samples.where(F.col(channel_col).isin(list(tetrode_channels)))
    pts = peak_times.select(F.col(ts_col).alias("peak_ts")).distinct()
    # every channel pairs with every peak: add channel to points via the
    # tiny tetrode dim (J4 — a 4-row broadcast)
    spark = samples.sparkSession
    dim = spark.createDataFrame([(int(c),) for c in tetrode_channels], f"{channel_col} int")
    pts_by_chan = pts.crossJoin(F.broadcast(dim))
    joined = bucketed_range_join(
        chans, pts_by_chan, radius_before=size, radius_after=size,
        ts_col=ts_col, point_ts_col="peak_ts", join_cols=[channel_col], step=step,
    )
    # ONE shuffle: collect all channels' samples per spike in a single
    # groupBy(peak_ts), then regroup per-channel with array expressions.
    # (Was two chained collect_list shuffles — groupBy(peak_ts, channel)
    # then groupBy(peak_ts) — same result, double the exchange volume.)
    # r18: explicit-N repartition on the aggregate key pins the (single)
    # exchange at session width so AQE's byte-based coalescing cannot
    # serialize the interpreted per-channel patch assembly below into
    # one task (see extract_waveforms).
    from jagular_spark.session import shuffle_width

    joined = joined.repartition(shuffle_width(spark), "peak_ts")
    gathered = joined.groupBy("peak_ts").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(channel_col).alias("ch"),
                    F.col(ts_col).alias("t"),
                    F.col(value_col).alias("v"),
                )
            )
        ).alias("smp")
    )

    def _chan_patch(c: int) -> F.Column:
        # smp is sorted by (ch, t, v), so the filtered slice is already
        # time-ordered within the channel; zero-pad to patch_size.
        vals = F.transform(
            F.filter("smp", lambda s: s["ch"] == F.lit(int(c))),
            lambda s: s["v"].cast("float"),
        )
        return F.concat(
            vals,
            F.array_repeat(
                F.lit(0.0).cast("float"),
                F.greatest(F.lit(0), F.lit(patch_size) - F.size(vals)).cast("int"),
            ),
        )

    n_chans = F.size(F.array_distinct(F.transform("smp", lambda s: s["ch"])))
    assembled = (
        gathered.where(n_chans == len(tetrode_channels))
        .withColumn("waveform", F.array(*[_chan_patch(c) for c in sorted(tetrode_channels)]))
        .drop("smp")
    )
    # P4: all samples within (−bound, bound)
    ok = F.forall(
        F.flatten("waveform"), lambda x: (x > -artifact_bound) & (x < artifact_bound)
    )
    return assembled.where(ok)


# ---------------------------------------------------------------------------
# F7: the composed detection pipeline
# ---------------------------------------------------------------------------

def detect_spikes(
    samples: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    channel_col: str = "channel_id",
    segment_col: str = "segment_id",
    multiplier: float = 4.0,
    censor_width: int = 30,
    patch_size: int = 30,
    polarity: str = "neg",
    step: int = 1,
) -> DataFrame:
    """threshold → crossings → censor → extract, one Catalyst lineage
    (reference ``detect_spikes``, ``jagular/spikes.py:142-186``)."""
    keys = [channel_col, segment_col]
    thr = mad_threshold(samples, value_col, multiplier, partition_cols=keys)
    x = crossings(samples, thr, ts_col, value_col, partition_cols=keys, polarity=polarity, step=step)
    c = censor(x, censor_width, ts_col, partition_cols=keys)
    return extract_waveforms(
        samples, c, patch_size, ts_col, value_col,
        join_cols=[channel_col], step=step,
        recenter="min" if polarity == "neg" else "max",
    )
