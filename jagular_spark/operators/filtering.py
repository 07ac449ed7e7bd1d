"""Zero-phase filtering within epochs (SURVEY §2.7 F1-F5).

Reference shape (re-expressed): design an SOS filter once on the driver
(``jagular/filtering.py:17-112``), then apply ``sosfiltfilt`` to each
contiguous epoch independently, chunking huge epochs with a ±overlap
halo so chunked output equals unchunked (``filtering.py:114-194``, the
ASCII diagram at 152-161 is the invariant we test).

Spark design:

- F1 design: driver-side scipy, the tiny SOS ndarray is captured in the
  UDF closure (broadcast by Spark automatically with the task binary).
- F2 apply: ``groupBy(channel, segment).applyInPandas(sosfiltfilt)``
  when epochs fit an executor; for epochs that don't, the halo-chunk
  physical strategy: assign ``chunk = (ts - seg_start) DIV buffer_len``
  JVM-side, self-union shifted copies so each chunk also receives its
  ±overlap halo rows, run the kernel per (channel, segment, chunk), and
  keep only core rows. This is the flagship custom physical op — no
  Catalyst primitive expresses it (SURVEY §4).
- The scipy kernel is shared verbatim with the in-core oracle, so tests
  pin the *partitioning* (chunked == unchunked), not scipy itself.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jagular_spark import dsp
from jagular_spark.operators.grouped import grouped_map_partition_bounds


# ---------------------------------------------------------------------------
# F1: filter design (driver-side)
# ---------------------------------------------------------------------------

def design_sos(
    fs: float,
    fl: float | None = None,
    fh: float | None = None,
    gpass: float = 0.1,
    gstop: float = 30.0,
    ftype: str = "cheby2",
    transition_factor: tuple[float, float] = (0.8, 1.4),
) -> np.ndarray:
    """Low/high/band-pass SOS design from corner frequencies.

    Mirrors the reference's spec construction (transition bands at
    0.8×/1.4× the corners, all-pass rejected, cheby2 default with
    gpass 0.1 dB / gstop 30 dB — ``jagular/filtering.py:44-101``) over
    the engine's pure-numpy design kernels (jagular_spark.dsp).
    """
    lo_t, hi_t = transition_factor
    nyq = fs / 2.0
    if fl is None and fh is None:
        raise ValueError("all-pass (fl=None, fh=None) is not a filter")
    if fl is not None and fh is not None:
        wp = [fl / nyq, fh / nyq]
        ws = [lo_t * fl / nyq, hi_t * fh / nyq]
        btype = "bandpass"
    elif fl is not None:
        wp, ws = fl / nyq, lo_t * fl / nyq
        btype = "highpass"
    else:
        wp, ws = fh / nyq, hi_t * fh / nyq
        btype = "lowpass"
    order = dsp.iir_order_estimate(wp, ws, gpass, gstop, ftype)
    if ftype == "cheby2":
        return dsp.cheby2_sos(order, gstop, ws, btype)
    return dsp.butter_sos(order, wp, btype)


def butter_bandpass_sos(fs: float, fl: float, fh: float, order: int = 3) -> np.ndarray:
    """3-pole Butterworth band-pass with Nyquist clamp (reference F3,
    ``jagular/spikes.py:260-301`` semantics)."""
    nyq = fs / 2.0
    hi = min(fh, 0.99 * nyq)
    return dsp.butter_sos(order, [fl / nyq, hi / nyq], "bandpass")


def design_fir(fs: float, fl: float | None, fh: float | None, numtaps: int = 801) -> np.ndarray:
    """Windowed-sinc FIR band-pass — the preferred kernel at scale:
    finite support makes halo-chunked == unchunked EXACT, and the
    convolution vectorizes (FFT) inside the pandas kernel."""
    return dsp.firwin_bandpass(numtaps, fl, fh, fs)


# F4 presets (constants from BASELINE.md; independent dict form)
SPIKE_FILTER_PARAMS = {"fl": 600.0, "fh": 6000.0, "fs": 30000.0, "buffer_len": 2**24, "overlap_len": 2**16}
LFP_FILTER_PARAMS = {"fl": None, "fh": 400.0, "fs": 30000.0, "buffer_len": 2**22, "overlap_len": 60000}


def _apply_zero_phase(coeffs: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Dispatch on coefficient shape: 2-D = SOS cascade (IIR,
    reference-parity, zeros below the 30-sample warm-up), 1-D =
    symmetric FIR taps (deterministic direct convolution; zeros below
    ``numtaps`` — both mirror the reference's degenerate-epoch rule)."""
    if coeffs.ndim == 2:
        if len(x) <= 30:
            return np.zeros_like(np.asarray(x, dtype=np.float64))
        return dsp.sosfiltfilt(coeffs, x)
    return dsp.fir_zero_phase(coeffs, x)


def _min_len(coeffs: np.ndarray) -> int:
    """Groups shorter than this produce zeros without a kernel call."""
    return 31 if coeffs.ndim == 2 else len(coeffs)


# ---------------------------------------------------------------------------
# F2: zero-phase filtering per epoch (with halo-chunk strategy)
# ---------------------------------------------------------------------------

def filtfilt_segments(
    df: DataFrame,
    sos: np.ndarray,
    ts_col: str = "ts",
    value_col: str = "value",
    partition_cols: Sequence[str] = ("channel_id", "segment_id"),
    out_type: str = "double",
) -> DataFrame:
    """Whole-epoch ``sosfiltfilt`` per group. Use when every (channel,
    segment) fits executor memory; otherwise :func:`filtfilt_chunked`."""
    keys = list(partition_cols)
    sos_arr = np.asarray(sos, dtype=np.float64)
    min_len = _min_len(sos_arr)
    key_schema = ", ".join(f"{k} {t}" for k, t in df.select(*keys).dtypes)
    schema = f"{key_schema}, {ts_col} long, filtered {out_type}"

    def partition_kernel(pdf: pd.DataFrame, bounds) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y = np.zeros_like(x)
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= min_len:  # short groups stay zeros — no Python call
                y[s:e] = _apply_zero_phase(sos_arr, x[s:e])
        out = pdf[keys + [ts_col]].copy()
        out["filtered"] = y
        return out

    # many-small-groups strategy: one Arrow transfer AND one pandas
    # construction per partition — per-group cost is a numpy slice
    return grouped_map_partition_bounds(
        df.select(*keys, ts_col, value_col), keys, [ts_col], partition_kernel, schema
    )


def filtfilt_chunked(
    df: DataFrame,
    sos: np.ndarray,
    segments: DataFrame | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    channel_cols: Sequence[str] = ("channel_id",),
    segment_col: str = "segment_id",
    buffer_len: int = 2**22,
    overlap_len: int = 60000,
    step: int = 1,
    out_type: str = "double",
) -> DataFrame:
    """Halo-chunked zero-phase filtering for epochs larger than executor
    memory — the custom physical strategy.

    Plan (ONE pass over the input — no self-union, no segments rejoin):
    1. ``__seg_start = min(ts) over (channel, segment)`` — a window on
       keys the input is already clustered by after the segment-id
       window, so it adds a sort but NO exchange; dense row index
       ``rn = (ts - __seg_start) / step`` follows as arithmetic. (If a
       pre-computed ``segments`` frame is passed it is broadcast-joined
       instead, for callers whose segments come from elsewhere.)
    2. ``chunk = rn DIV buffer_len`` JVM-side.
    3. Each row emits 1-3 ``(chunk, is_core)`` assignments via a
       literal-array ``explode``: its own chunk (core) plus the
       previous/next chunk when it falls inside an ``overlap_len`` halo.
       Pure column arithmetic — the input lineage is scanned ONCE (a
       self-union here would recompute the whole upstream per branch).
    4. ``applyInPandas`` per (channel, segment, chunk): sort, filter
       with the shared scipy kernel, emit only core rows.

    Chunked output is exactly ``sosfiltfilt`` of the whole epoch on the
    core interior, and matches within transient tolerance at chunk
    seams when ``overlap_len`` covers the filter's impulse response —
    same contract as the reference (``filtering.py:148-161``).
    """
    keys = list(channel_cols) + [segment_col]
    sos_arr = np.asarray(sos, dtype=np.float64)

    if segments is None:
        seg_w = Window.partitionBy(*keys)
        base = df.withColumn("__seg_start", F.min(ts_col).over(seg_w))
    else:
        seg_bounds = segments.select(
            *[F.col(c) for c in channel_cols if c in segments.columns],
            F.col(segment_col),
            F.col("ts_start").alias("__seg_start"),
        )
        join_keys = [c for c in channel_cols if c in segments.columns] + [segment_col]
        base = df.join(F.broadcast(seg_bounds), on=join_keys, how="inner")
    base = base.withColumn(
        "__rn", ((F.col(ts_col) - F.col("__seg_start")) / F.lit(step)).cast("long")
    ).withColumn("__chunk0", (F.col("__rn") / F.lit(buffer_len)).cast("long"))

    in_prev_halo = (
        ((F.col("__rn") - F.lit(overlap_len)) / F.lit(buffer_len)).cast("long")
        != F.col("__chunk0")
    ) & (F.col("__rn") >= F.lit(overlap_len))
    in_next_halo = (
        (F.col("__rn") + F.lit(overlap_len)) / F.lit(buffer_len)
    ).cast("long") != F.col("__chunk0")
    assignments = F.filter(
        F.array(
            F.struct(F.col("__chunk0").alias("c"), F.lit(True).alias("core")),
            F.struct((F.col("__chunk0") - 1).alias("c"), F.lit(False).alias("core")),
            F.struct((F.col("__chunk0") + 1).alias("c"), F.lit(False).alias("core")),
        ),
        lambda a: a["core"]
        | F.when(a["c"] < F.col("__chunk0"), in_prev_halo).otherwise(in_next_halo),
    )
    unioned = (
        base.withColumn("__a", F.explode(assignments))
        .withColumn("__chunk", F.col("__a")["c"])
        .withColumn("__is_core", F.col("__a")["core"])
        .drop("__a", "__chunk0", "__rn", "__seg_start")
    )

    key_schema = ", ".join(f"{k} {t}" for k, t in df.select(*keys).dtypes)
    schema = f"{key_schema}, {ts_col} long, filtered {out_type}"
    min_len = _min_len(sos_arr)

    def partition_kernel(pdf: pd.DataFrame, bounds) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y = np.zeros_like(x)
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= min_len:
                y[s:e] = _apply_zero_phase(sos_arr, x[s:e])
        keep = pdf["__is_core"].to_numpy()
        out = pdf.loc[keep, keys + [ts_col]].copy()
        out["filtered"] = y[keep]
        return out

    return grouped_map_partition_bounds(
        unioned.select(*keys, "__chunk", ts_col, value_col, "__is_core"),
        keys + ["__chunk"], [ts_col], partition_kernel, schema,
    )


# ---------------------------------------------------------------------------
# F5: decimate
# ---------------------------------------------------------------------------

def decimate(
    df: DataFrame,
    sos: np.ndarray,
    q: int | None = None,
    segments: DataFrame | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    channel_cols: Sequence[str] = ("channel_id",),
    segment_col: str = "segment_id",
    step: int = 1,
    fs: float | None = None,
    fs_out: float | None = None,
    **chunk_kwargs,
) -> DataFrame:
    """Anti-alias prefilter (the SOS you pass should cut at the new
    Nyquist) then keep every q-th sample — ``ts % (q*step) == 0`` so no
    row index is needed.

    Reference API parity (``jagular/signal.py:3-40``): pass either the
    integer factor ``q``, or ``fs``+``fs_out`` to derive it —
    ``fs/fs_out`` must be a whole number, like the reference's
    divisibility validation."""
    if q is None:
        if fs is None or fs_out is None:
            raise ValueError("pass q, or both fs and fs_out")
        ratio = fs / fs_out
        if abs(ratio - round(ratio)) > 1e-9 or round(ratio) < 1:
            raise ValueError(f"fs/fs_out must be a positive integer, got {ratio}")
        q = int(round(ratio))
    elif fs_out is not None:
        raise ValueError("pass q or fs_out, not both")
    filtered = filtfilt_chunked(
        df, sos, segments, ts_col=ts_col, value_col=value_col,
        channel_cols=channel_cols, segment_col=segment_col, step=step, **chunk_kwargs,
    )
    return filtered.where((F.col(ts_col) % F.lit(q * step)) == 0)


# ---------------------------------------------------------------------------
# A2: common average reference
# ---------------------------------------------------------------------------

def common_reference(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    channel_col: str = "channel_id",
    method: str = "mean",
) -> DataFrame:
    """Cross-channel reference subtraction (reference ``common_ref``,
    ``jagular/spikes.py:92-117``): value - mean(value over channels at
    same ts). On the exploded `samples` layout this is a groupBy(ts) +
    re-join; on the packets-wide layout prefer
    ``aggregate(channels)/size(channels)`` (no shuffle at all)."""
    agg = F.avg(value_col) if method == "mean" else F.median(value_col)
    ref = df.groupBy(ts_col).agg(agg.alias("__ref"))
    return (
        df.join(ref, on=ts_col)
        .withColumn("value_ref", F.col(value_col) - F.col("__ref"))
        .drop("__ref")
    )


def common_reference_packets(
    packets: DataFrame,
    channels_col: str = "channels",
) -> DataFrame:
    """Wide-form common average reference: one pass, zero shuffles.
    ``channels - mean(channels)`` via JVM array expressions."""
    mean = F.aggregate(
        channels_col, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    ) / F.size(channels_col).cast("double")
    return (
        packets.withColumn("__mean", mean)
        .withColumn(
            "channels_ref",
            F.transform(channels_col, lambda x: x.cast("double") - F.col("__mean")),
        )
        .drop("__mean")
    )


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    partition_cols: Sequence[str] = ("channel_id",),
    order_cols: Sequence[str] = (),
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Robust outlier clipping to the exact rank-selected [p_lo, p_hi]
    band per group (artifact rejection / heavy-tail clamping). The
    quantiles are DISCRETE order statistics — index floor((cnt−1)·p) of
    the (value, *order_cols) sort, deterministic ties — computed as
    window aggregates over the SAME partition the rank sort uses: one
    shuffle total, no quantile-table join back. The clip itself is pure
    comparison/selection (no float arithmetic), so cross-engine parity
    is structural. Appends ``lo``, ``hi``, ``value_clipped``,
    ``was_clipped`` to the input columns."""
    keys = list(partition_cols)
    cols = list(df.columns)
    wo = Window.partitionBy(*keys).orderBy(value_col, *order_cols)
    wp = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.select(
        *cols,
        (F.row_number().over(wo) - 1).cast("long").alias("__rn__"),
        F.count(F.lit(1)).over(wp).alias("__cnt__"),
    )
    idx_lo = F.floor((F.col("__cnt__") - 1) * F.lit(p_lo)).cast("long")
    idx_hi = F.floor((F.col("__cnt__") - 1) * F.lit(p_hi)).cast("long")
    lo = F.max(F.when(F.col("__rn__") == idx_lo, F.col(value_col))).over(wp)
    hi = F.max(F.when(F.col("__rn__") == idx_hi, F.col(value_col))).over(wp)
    out = ranked.select(*cols, lo.alias("lo"), hi.alias("hi"))
    return out.select(
        *cols,
        "lo",
        "hi",
        F.least(F.greatest(F.col(value_col), F.col("lo")), F.col("hi")).alias(
            "value_clipped"
        ),
        (
            (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi"))
        ).alias("was_clipped"),
    )


def winsorize_chunked(
    df: DataFrame,
    value_col: str = "value",
    partition_cols: Sequence[str] = ("channel_id",),
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """:func:`winsorize` with a SCALE-SAFE physical plan — result-
    identical columns (``lo``, ``hi``, ``value_clipped``,
    ``was_clipped`` appended; no ``order_cols`` parameter because the
    rank-``idx`` ORDER STATISTIC VALUE is tiebreak-invariant: every
    total order consistent with the value order places the same value
    at index floor((cnt−1)·p)).

    The plain form ranks each group's FULL row stream in one window
    task — a single giant channel (billions of samples at 100 TB)
    serializes. Here quantile selection runs on the per-group VALUE
    HISTOGRAM instead (the classic distributed selection shape):

    1. ``groupBy(keys, value).count()`` — map-side partial combine, so
       the one full-data shuffle moves ≤ |distinct values| rows per
       group, not |rows| (quantized signals: ≤ 2^16 per channel);
    2. a cumulative-count window over the tiny histogram picks
       ``lo = min{v : cum(v) > idx_lo}`` (and hi) exactly;
    3. the O(groups) quantile table broadcast-joins back and the clip
       is the same pure comparison/selection as the plain form.

    Pass 2's window sorts only distinct values — for continuous
    (all-distinct) data the histogram degenerates to |rows| per group
    and the plain form's single sort is no worse; this variant targets
    the quantized-signal regime the reference records in (int16 ADC
    counts, jagular/filtering.py's artifact bounds).
    """
    keys = list(partition_cols)
    cols = list(df.columns)
    hist = df.groupBy(*keys, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c__")
    )
    wv = Window.partitionBy(*keys).orderBy(value_col)
    wg = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        *keys,
        F.col(value_col).alias("__v__"),
        F.sum("__c__").over(wv).alias("__cum__"),
        F.sum("__c__").over(wg).alias("__cnt__"),
    )
    idx_lo = F.floor((F.col("__cnt__") - 1) * F.lit(p_lo)).cast("long")
    idx_hi = F.floor((F.col("__cnt__") - 1) * F.lit(p_hi)).cast("long")
    qtab = cum.groupBy(*keys).agg(
        F.min(F.when(F.col("__cum__") > idx_lo, F.col("__v__"))).alias("lo"),
        F.min(F.when(F.col("__cum__") > idx_hi, F.col("__v__"))).alias("hi"),
    )
    out = df.join(F.broadcast(qtab), keys)
    return out.select(
        *cols,
        "lo",
        "hi",
        F.least(F.greatest(F.col(value_col), F.col("lo")), F.col("hi")).alias(
            "value_clipped"
        ),
        (
            (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi"))
        ).alias("was_clipped"),
    )


# Pearson r from integer moments; one literal expression string shared
# verbatim with the DuckDB oracle so the float tree matches exactly.
XCORR_CORR_SQL = (
    "CASE WHEN (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) <= 0"
    " THEN NULL ELSE "
    "(CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))"
    " / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))"
    " END"
)


def lag_correlation(
    samples: DataFrame,
    max_lag: int = 2,
    ch_col: str = "ch",
    ts_col: str = "t",
    value_col: str = "iv",
) -> DataFrame:
    """Cross-channel lag correlation (multi-electrode coupling audit):
    Pearson r between every channel pair at integer lags −max_lag..+max_lag.
    ``value_col`` must already be integer-quantized — the five moments
    accumulate in exact BIGINT; the only float step is the final shared
    correlation expression (XCORR_CORR_SQL). Pair alignment is an
    EQUI-join on the precomputed shifted index (hash join, not theta);
    the input lineage is materialized once and feeds both sides.
    ``(ch_a, ch_b, lag_k, n, sab, corr)``."""
    s = samples.select(
        F.col(ch_col).cast("long").alias("ch"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(value_col).cast("long").alias("iv"),
    ).localCheckpoint(eager=False)
    spark = samples.sparkSession
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("long").alias("lag_k")
    )
    a = (
        s.select(F.col("ch").alias("ch_a"), "t", F.col("iv").alias("ia"))
        .crossJoin(F.broadcast(lags))
        .withColumn("t_plus", F.col("t") + F.col("lag_k"))
    )
    b = s.select(
        F.col("ch").alias("ch_b"), F.col("t").alias("tb"), F.col("iv").alias("ib")
    )
    pr = a.join(b, (F.col("tb") == F.col("t_plus")) & (F.col("ch_a") < F.col("ch_b")))
    m = pr.groupBy("ch_a", "ch_b", "lag_k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ia").cast("long").alias("sa"),
        F.sum("ib").cast("long").alias("sb"),
        F.sum(F.col("ia") * F.col("ia")).cast("long").alias("saa"),
        F.sum(F.col("ib") * F.col("ib")).cast("long").alias("sbb"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("sab"),
    )
    return m.select(
        "ch_a", "ch_b", "lag_k", "n", "sab", F.expr(XCORR_CORR_SQL).alias("corr")
    )


# z-score from integer moments; the single float expression is shared
# VERBATIM with the DuckDB oracle (same tree ⇒ same doubles), with the
# all-integer numerator n·iv − s and one sqrt:
#   z = (iv − μ)/σ = (n·iv − s) / sqrt(n·ss − s²)
ZSCORE_SQL = (
    "CASE WHEN CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) <= 0 THEN NULL ELSE "
    "(CAST(n AS DOUBLE) * CAST(iv AS DOUBLE) - CAST(s AS DOUBLE))"
    " / sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) END"
)


def zscore(
    df: DataFrame,
    value_col: str = "value",
    partition_cols: Sequence[str] = ("channel_id",),
    quanta: int = 1000,
) -> DataFrame:
    """Per-group standard-score normalization (feature scaling /
    artifact z-thresholding): values quantize to ``floor(v·quanta)``
    BIGINT, the three moments (n, Σ, Σ²) accumulate exactly as window
    aggregates over the group — ONE shuffle, no stats-table join back —
    and the only float arithmetic is the shared ZSCORE_SQL expression.
    Appends ``iv`` (the quantized value) and ``z`` (NULL for
    zero-variance groups). Σ² budget: |iv| ≤ q·|v| ⇒ n·max(iv²) must
    stay under 2^63 — at 100 TB row counts, lower ``quanta`` or switch
    the moments to the split-sum (DIV/% 2^31) recombination used by the
    revenue aggregates."""
    keys = list(partition_cols)
    cols = list(df.columns)
    wp = Window.partitionBy(*keys)
    out = (
        df.withColumn("iv", F.expr(f"CAST(floor({value_col} * {quanta}) AS BIGINT)"))
        .withColumn("n", F.count(F.lit(1)).over(wp).cast("long"))
        .withColumn("s", F.sum("iv").over(wp).cast("long"))
        .withColumn("ss", F.sum(F.col("iv") * F.col("iv")).over(wp).cast("long"))
    )
    return out.select(*cols, "iv", F.expr(ZSCORE_SQL).alias("z"))
