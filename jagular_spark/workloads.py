"""Driver-facing query workload: Spark implementations + DuckDB oracle SQL.

Each entry demonstrates one or more operators from SURVEY.md §2 on the
driver's TPC-H-ish tables (TESTDATA.md). Conventions that make the
hash-compare deterministic across engines:

- Money aggregations accumulate in DECIMAL (exact, order-insensitive)
  and cast the final value to DOUBLE — bit-identical in Spark and DuckDB.
- Timestamps are returned as unix microseconds (BIGINT) — Spark
  ``unix_micros`` / DuckDB ``epoch_us`` — never as raw timestamp columns.
- Every aggregate/window output is explicitly cast: DuckDB promotes
  SUM(BIGINT)→HUGEINT and ``len()``→BIGINT while Spark ``row_number``→INT;
  both sides pin BIGINT/DOUBLE.
- Top-k queries always carry a unique tiebreak column in ORDER BY.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from jagular_spark.operators import (
    contiguous_segments,
    dedup_keep_first,
    gap_lengths,
    interpolate_gaps,
)
from jagular_spark import dsp
from jagular_spark.operators import similarity as sim
from jagular_spark.operators import text as txt
from jagular_spark.workload_params import (
    _BP_TAPS,
    _DISC_PRICE_QUANTA,
    _IVF_FROZEN_CENTS,
    _BPE_FIT_ROWS,
    _BPE_MERGES,
    _LP_TAPS,
    _REBALANCE_TARGETS,
    _STRATA_FRACTIONS,
    _TOKEN_BUDGETS,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


_TABLE_SCHEMAS: dict[tuple, object] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one input table, serving the schema catalog-style (r18):
    a bare ``spark.read.parquet`` runs a footer schema-inference JOB
    per call, so every registry query paid 1-3 driver round-trips of
    pure latency re-deriving metadata that is static for the life of
    the process — a real warehouse reads the schema from its catalog
    and schedules zero work for it. The memo holds only the
    ``StructType`` (never rows, never plans): every query still scans
    the parquet data in full, and the key carries (mtime, size) so a
    rewritten file re-infers instead of serving a stale schema."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path)
    schema = _TABLE_SCHEMAS.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _TABLE_SCHEMAS[key] = schema
    return spark.read.schema(schema).parquet(path)


def _dec(c, scale: int = 4):
    return F.col(c).cast(f"decimal(18,{scale})")


def _fp4(c: str) -> F.Column:
    """Column as exact BIGINT fixed-point quanta of 10^-4 (the storage
    doubles carry ≤4 decimals, so DECIMAL(18,4)·10^4 is integral and
    the BIGINT cast is exact on both engines)."""
    return F.expr(f"CAST(CAST({c} AS DECIMAL(18,4)) * 10000 AS BIGINT)")


def _disc_price_sum() -> F.Column:
    """SUM(extendedprice · (1 − discount)) as a DOUBLE that is
    bit-identical across engines: all arithmetic is exact BIGINT quanta
    of 10^-8, SPLIT-SUMMED as (Σ p DIV 2^31, Σ p % 2^31) so neither
    partial overflows int64 — per-row quanta reach ~1.05e13, so a
    single int64 sum wraps at ~9e5 rows/group (≈ sf0.3 for q1); the
    split carries headroom to ~3e9 rows/group (≈ sf1000). The floating
    steps (two correctly-rounded int64→double conversions, one
    multiply-add by 2^31, one division by 1e8) are the IDENTICAL
    expression tree on the DuckDB side, so results stay hash-equal at
    every scale. (A DECIMAL-sum → DOUBLE cast is NOT portable: the
    scale-8 sum exceeds 2^53 quanta and Spark/DuckDB round the cast to
    ADJACENT doubles — a measured 1-ulp hash mismatch.)"""
    hi = F.sum(F.expr(f"({_DISC_PRICE_QUANTA}) DIV 2147483648"))
    lo = F.sum(F.expr(f"({_DISC_PRICE_QUANTA}) % 2147483648"))
    return (
        hi.cast("double") * F.lit(2147483648.0) + lo.cast("double")
    ) / F.lit(100000000.0)


def _us(df: DataFrame, c: str = "ts"):
    """``c`` as unix microseconds BIGINT, matching DuckDB ``epoch_us``.

    Handles both parquet timestamp encodings the driver has shipped:
    TIMESTAMP(MICROS) reads natively as TIMESTAMP_NTZ (wall-clock ==
    UTC instant under the session's UTC timezone); TIMESTAMP(NANOS)
    reads as a raw nano long via ``nanosAsLong`` (session.py), where
    integer division truncates exactly like DuckDB's nanos→micros.
    """
    if isinstance(df.schema[c].dataType, LongType):
        return F.expr(f"CAST({c} DIV 1000 AS BIGINT)")
    return F.unix_micros(F.to_utc_timestamp(F.col(c), "UTC"))


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with a ``us`` (unix-microsecond BIGINT) column."""
    ev = load(spark, sf_dir, "events")
    return ev.withColumn("us", _us(ev))


# ---------------------------------------------------------------------------
# Relational core (scan → filter → agg → join → top-k)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: predicate pushdown + hash agg (SURVEY A-class).

    Plan check: parquet scan shows PushedFilters on l_shipdate and a
    partial→final hash aggregate (map-side combine) — one shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            _disc_price_sum().alias("sum_disc_price"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-10 (broadcast the small
    filtered customer side; Catalyst/AQE picks broadcast-hash)."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_disc_price_sum().alias("revenue"))
        .select(
            "l_orderkey",
            F.unix_micros(F.to_utc_timestamp(F.col("o_orderdate"), "UTC")).alias("o_orderdate_us"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way snowflake join; dims (region/nation/supplier) broadcast."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_disc_price_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side filter + one global aggregate — the
    pushdown/pruning showcase (every predicate reaches the parquet
    scan). Revenue = Σ price·discount in exact 10^-8 BIGINT quanta,
    split-summed like the other revenue queries so the double
    recombination is bit-identical across engines at any scale; the
    discount band compares exact 10^-4 quanta, not doubles."""
    li = load(spark, sf_dir, "lineitem")
    disc_q = "CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    prod = f"CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) * ({disc_q})"
    hi = F.sum(F.expr(f"({prod}) DIV 2147483648"))
    lo = F.sum(F.expr(f"({prod}) % 2147483648"))
    revenue = (
        hi.cast("double") * F.lit(2147483648.0) + lo.cast("double")
    ) / F.lit(100000000.0)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.expr(disc_q) >= 500)
            & (F.expr(disc_q) <= 700)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(revenue.alias("revenue"), F.count(F.lit(1)).cast("long").alias("n_items"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting, adapted to the driver
    schema): lineitem filtered to returns joins a quarter of orders,
    customer, and the broadcast nation dim; revenue is the shared
    split-sum quanta expression; deterministic top-20 by (revenue DESC,
    custkey)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_disc_price_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month of lineitem joined to the
    part dim, promo revenue share as the ratio of two split-summed
    quanta revenues (each recombined exactly as in _disc_price_sum, so
    the single ratio is bit-identical across engines)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    promo_q = f"CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_QUANTA} ELSE CAST(0 AS BIGINT) END"
    hi_p = F.sum(F.expr(f"({promo_q}) DIV 2147483648"))
    lo_p = F.sum(F.expr(f"({promo_q}) % 2147483648"))
    hi_a = F.sum(F.expr(f"({_DISC_PRICE_QUANTA}) DIV 2147483648"))
    lo_a = F.sum(F.expr(f"({_DISC_PRICE_QUANTA}) % 2147483648"))
    promo = (hi_p.cast("double") * F.lit(2147483648.0) + lo_p.cast("double")) / F.lit(1e8)
    total = (hi_a.cast("double") * F.lit(2147483648.0) + lo_a.cast("double")) / F.lit(1e8)
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        (F.lit(100.0) * promo / total).alias("promo_revenue_pct"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the HAVING-subquery becomes
    an aggregate-then-join — the big-order keylist IS the quantity
    total, so no re-aggregation after the join (one shuffle agg + two
    joins, the small agg side broadcast by AQE). Quantities are integral
    doubles cast to BIGINT, so the sum is exact on both engines."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("long").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.to_utc_timestamp(F.col("o_orderdate"), "UTC")).alias(
                "o_orderdate_us"
            ),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (SURVEY W8): row_number per customer by price."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("price_rank", F.row_number().over(w).cast("long"))
        .where(F.col("price_rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "price_rank")
    )


# ---------------------------------------------------------------------------
# Timestamped-stream operators over `events` (the jagular surface)
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap
_STEP_US = 60 * 1_000_000      # nominal 1-minute step => gap_factor 30


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization per user (SURVEY A7 on event
    time): new session when inter-event gap >= 30 min."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flag = (
        F.when(F.col("us") - F.lag("us").over(w) >= _GAP_US, 1)
        .otherwise(0)
        .cast("long")
    )
    # first row per user gets lag NULL -> otherwise(0); cumulative sum
    # starts sessions at 0
    return (
        ev.withColumn("session_id", F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


def events_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's contiguous_segments operator (SURVEY A7) on event
    time: distributed local-island detection + tiny merge pass."""
    ev = _events_us(spark, sf_dir).select("user_id", "us")
    return contiguous_segments(
        ev, ts_col="us", step=_STEP_US, gap_factor=30.0, partition_cols=["user_id"]
    ).select("user_id", "segment_id", "ts_start", "ts_stop", "n_samples")


def events_gap_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-segment gaps (SURVEY A8) composed on top of segments."""
    segs = events_segments(spark, sf_dir)
    return gap_lengths(segs, partition_cols=["user_id"]).select(
        "user_id", "segment_id", "gap_start", "gap_stop", "gap_len"
    )


def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-FIRST dedup (SURVEY I1): first event of each (user, type) by
    event time with event_id tiebreak — exact reference keep-first
    semantics under unordered partitions."""
    ev = _events_us(spark, sf_dir)
    out = dedup_keep_first(
        ev, ts_col="event_type", tiebreak_cols=["us", "event_id"], partition_cols=["user_id"]
    )
    return out.select("user_id", "event_type", "event_id", "us", "value")


def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation (SURVEY I2/I3) with an exact SQL oracle:
    one sample per (user, minute) — keep-first dedup — then fill interior
    gaps of ≤5 missing minutes with linearly interpolated values via the
    engine's interpolate_gaps operator (edge-pass + sequence-explode)."""
    ev = _events_us(spark, sf_dir)
    base = dedup_keep_first(
        ev.withColumn("minute", F.expr("CAST(us DIV 60000000 AS BIGINT)")),
        ts_col="minute",
        tiebreak_cols=["us", "event_id"],
        partition_cols=["user_id"],
    ).select("user_id", "minute", "value")
    out = interpolate_gaps(
        base,
        ts_col="minute",
        value_cols=["value"],
        max_gap_size=5,
        step=1,
        partition_cols=["user_id"],
    )
    return out.select("user_id", "minute", "value")


def events_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced threshold crossings (SURVEY W1): value > 100 AND the
    next event (by time) also > 100, per user."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        ev.withColumn("next_value", F.lead("value").over(w))
        .where((F.col("value") > 100.0) & (F.col("next_value") > 100.0))
        .select("user_id", "event_id", "us", "value", "next_value")
    )


def events_mad_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD noise threshold (SURVEY A3): 4 * median(|value|) /
    0.6745 per event_type — exact median (both engines interpolate)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.median(F.abs(F.col("value"))).alias("mad_median"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .withColumn("threshold", F.lit(4.0) * F.col("mad_median") / F.lit(0.6745))
        .select("event_type", "mad_median", "threshold", "n")
    )


def events_stream_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream ts bounds + counts (SURVEY A1/S2/S6 catalog stats)."""
    ev = _events_us(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.min("us").alias("ts_first"),
        F.max("us").alias("ts_last"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Signal chain over `events` (value as a per-user sample stream)
# ---------------------------------------------------------------------------

_FIR5 = (0.1, 0.2, 0.4, 0.2, 0.1)  # symmetric 5-tap smoothing kernel

# FIR kernels for the filter-chain queries, designed once at import.
# dsp.fir_zero_phase accumulates taps in ascending order with reflect
# edge padding, so the SQL oracle reproduces it BIT-EXACTLY with the
# same left-associated add chain (see _fir_chain_sql).


def _rn_samples(spark: SparkSession, sf_dir: str, max_channel: int | None = None) -> DataFrame:
    """Events as per-user dense sample streams: channel = user, ts = the
    0-based position in the user's (time, event_id) order — the
    contiguous-epoch layout the signal operators expect."""
    ev = _events_us(spark, sf_dir)
    if max_channel is not None:
        # Filter BEFORE the window: the window partitions by user_id, so
        # pre-filtering on it is exact — and Catalyst cannot push the
        # predicate through the Window itself (it references a projected
        # cast, not the raw partition column), which would otherwise
        # window the full table only to drop 1496/1500 channels.
        ev = ev.where(F.col("user_id") < max_channel)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return ev.select(
        F.col("user_id").cast("int").alias("channel_id"),
        F.lit(0).cast("long").alias("segment_id"),
        (F.row_number().over(w) - 1).cast("long").alias("ts"),
        F.col("value"),
    )


def events_fir_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-phase FIR smoothing as PURE window expressions (F-class demo
    with an exact SQL oracle): symmetric 5-tap kernel over each user's
    event-value sequence; interior rows only (full support)."""
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    v = [
        F.lag("value", 2).over(w),
        F.lag("value", 1).over(w),
        F.col("value"),
        F.lead("value", 1).over(w),
        F.lead("value", 2).over(w),
    ]
    c = [F.lit(x) for x in _FIR5]
    # fixed left-to-right association so both engines sum identically
    smooth = ((((c[0] * v[0] + c[1] * v[1]) + c[2] * v[2]) + c[3] * v[3]) + c[4] * v[4])
    return (
        ev.withColumn("smoothed", smooth)
        .where(F.col("smoothed").isNotNull())
        .select("user_id", "event_id", "us", "value", "smoothed")
    )


def events_filtfilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-phase band-pass per user stream (the engine's flagship
    grouped filtering op — partition-batched pandas kernel). The
    deterministic FIR kernel makes the result EXACTLY reproducible in
    SQL (see _fir_chain_sql), so this runs with a full value-hash
    oracle; the IIR SOS-cascade variant of the same operator is covered
    by unit tests (chunked == unchunked, vs the numpy oracle)."""
    from jagular_spark.operators.filtering import filtfilt_segments

    out = filtfilt_segments(_rn_samples(spark, sf_dir), _BP_TAPS)
    return out.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("ts").alias("seq"),
        "filtered",
    )


def events_filtfilt_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2's halo-chunk physical strategy (the flagship custom op) under
    driver verification: a deliberately tiny buffer forces many chunks
    per epoch at sf0.01; the FIR kernel's finite support makes core
    rows bit-identical to the whole-epoch result (halo 21 ≥ half-width
    10), so this shares events_filtfilt's exact value-hash oracle."""
    from jagular_spark.operators.filtering import filtfilt_chunked

    out = filtfilt_chunked(
        _rn_samples(spark, sf_dir), _BP_TAPS, buffer_len=64, overlap_len=21
    )
    return out.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("ts").alias("seq"),
        "filtered",
    )


def events_detect_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full detection pipeline (MAD threshold → debounced crossings →
    censor → waveform extract) on per-user event-value streams — F7
    end-to-end on driver data. Waveforms are posexploded to scalar
    (idx, wv) rows; the DuckDB oracle replays the whole pipeline,
    expressing the sequential censor as a recursive CTE.

    The sample stream feeds three plan branches (MAD agg, crossings
    window, extraction range-join) — but each branch is a cheap
    parquet-scan+window, and the censored crossing set has a single
    consumer, so there is nothing a checkpoint can dedupe. Round 5
    tried ``localCheckpoint`` on the FULL stream (as events_tetrode
    does for its 4-channel subset) and the O(samples) block-manager
    write dominated: 19.5 s vs 5.7 s at sf0.1. At 100 TB a per-query
    full-stream materialization is exactly the wrong default — let the
    three branches re-scan parquet (pushed projection, no shuffle)."""
    from jagular_spark.operators.spikes import detect_spikes

    out = detect_spikes(
        _rn_samples(spark, sf_dir),
        multiplier=2.0, censor_width=5, patch_size=8, polarity="pos",
    )
    return out.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("crossing_ts").alias("crossing_seq"),
        F.col("peak_ts").alias("peak_seq"),
        F.posexplode("waveform").alias("idx", "wv"),
    ).withColumn("idx", F.col("idx").cast("long"))


# ---------------------------------------------------------------------------
# Training-data-pipeline ops over `documents`
# ---------------------------------------------------------------------------

def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy on md5(text), canonical row =
    min doc_id. One shuffle on the hash — no skew (hashes uniform)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (text analysis): whitespace tokenization, distinct
    ratio, char stats. All JVM-side expressions — no UDF."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_distinct_tokens"),
        F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", "")).cast("long").alias("n_token_chars"),
        (
            F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", "")).cast("double")
            / F.size(tokens).cast("double")
        ).alias("avg_token_len"),
    )


def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring heuristic (text analysis): alpha/digit/space
    ratios + stopword ratio -> weighted score. Pure column expressions."""
    docs = load(spark, sf_dir, "documents")
    r = txt.quality_ratios("text")
    return docs.select(
        "doc_id",
        r["alpha"].alias("alpha_ratio"),
        r["digit"].alias("digit_ratio"),
        r["space"].alias("space_ratio"),
        r["stop"].alias("stopword_ratio"),
        txt.quality_score_col("text").alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Similarity / dedup extension surface (documents + embeddings)
# ---------------------------------------------------------------------------

def docs_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands × 2) candidate near-dup pairs — the
    shingle→minhash→band→bucket-join scale path for fuzzy dedup."""
    docs = load(spark, sf_dir, "documents")
    return sim.lsh_candidate_pairs(sim.minhash_signature(docs))


def docs_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 hot-bucket guard under the driver oracle: same
    minhash banding as docs_minhash_lsh with ``max_members=3`` — every
    (band, key) bucket larger than 3 is dropped wholesale before pair
    generation, bounding candidate volume at corpus·cap/2 even when
    duplicate clusters grow with the corpus (the streaming scale probe
    measured uncapped pair volume going quadratic: 3.4k → 396k pairs
    across 20k → 320k synthetic docs). Cap 3 is demonstration-scale,
    chosen to BITE on the shipped corpora (max bucket 4 at sf0.01, 12
    at sf0.1) so the hash-verified rows certify the drop semantics,
    not a no-op."""
    docs = load(spark, sf_dir, "documents")
    return sim.lsh_candidate_pairs(sim.minhash_signature(docs), max_members=3)


def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.5 for shingle-sharing pairs.

    Perf attribution for the r6→r7 "drift" (2.52 → 4.29 s sweep-local
    at sf0.1): measured r8 on the same code path (no ngram-path change
    r6→r7 — similarity.py diffs in that window touch only cosine/IVFADC/
    sketch code). Isolated warm runs in ONE process span 2.45–4.24 s
    (shingle stage alone 0.76–3.40 s across consecutive reps), i.e. the
    two sweep measurements both sit inside the same plan's run-to-run
    envelope on this shared-host VM. Not a regression; the plan is the
    single-exchange bucketed pair gen documented in
    similarity.ngram_jaccard_pairs.

    r9: the stop-shingle guard is ENGAGED on this standalone call site
    (same recipe as docs_dedup_clusters in r8) — without it, one
    boilerplate shingle shared by 10^6 docs alone generates 10^12
    candidate pairs; the oracle mirrors the cutoff exactly."""
    docs = load(spark, sf_dir, "documents")
    return _ngram_jaccard_guarded(docs)


def _ngram_jaccard_guarded(docs: DataFrame) -> DataFrame:
    """The exact pair generator docs_ngram_jaccard wires, with the
    ``_JACCARD_MAX_BUCKET`` heavy-hitter guard ACTIVE. Split out so the
    plan test can pin the guard on the workload's exact path."""
    from jagular_spark.workload_params import _JACCARD_MAX_BUCKET

    return sim.ngram_jaccard_pairs(
        docs, min_jaccard=0.5, max_bucket=_JACCARD_MAX_BUCKET
    )


def docs_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram containment >= 0.8: max(|∩|/|A|, |∩|/|B|) —
    flags a short document embedded in a longer one (quotes, mirrors,
    boilerplate wrappers), which symmetric Jaccard dilutes below any
    usable threshold. Same single-exchange bucketed pair generator as
    docs_ngram_jaccard — and, r9, the same ``_JACCARD_MAX_BUCKET``
    stop-shingle guard engaged on the standalone call site (oracle
    mirrors the cutoff)."""
    docs = load(spark, sf_dir, "documents")
    return _ngram_containment_guarded(docs)


def _ngram_containment_guarded(docs: DataFrame) -> DataFrame:
    """docs_ngram_containment's exact pair generator with the
    stop-shingle guard ACTIVE (pinned by the plan test)."""
    from jagular_spark.workload_params import _JACCARD_MAX_BUCKET

    return sim.ngram_containment_pairs(
        docs, min_containment=0.8, max_bucket=_JACCARD_MAX_BUCKET
    )


def docs_ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-first exact Jaccard ≥ 0.5: MinHash-LSH banding proposes
    candidates, exact shingle-multiset Jaccard verifies candidates only
    — the sub-quadratic composition that replaces per-shingle bucket
    combinatorics at corpus scale."""
    docs = load(spark, sf_dir, "documents")
    return sim.ngram_jaccard_pairs_lsh(docs, min_jaccard=0.5)


def docs_neardup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate attribution — the provenance audit a
    curation team runs before trusting per-source mixture weights
    ("is src A leaking into src B?", the classic crawl/curated-set
    contamination question): the LSH-first exact-Jaccard near-dup pairs
    (docs_ngram_jaccard_lsh's composition, unchanged) are labeled with
    each side's source and rolled up to an unordered source-pair matrix
    ``(src_lo, src_hi, n_pairs, n_cross)``. At 100 TB the pair set
    grows linearly with the corpus (banded candidates, capped buckets)
    but is NOT broadcastable, so the label joins are plain equi-joins
    against the 2-column (doc_id, source) projection — the only
    corpus-width data that moves; the rollup output is ≤ |sources|²
    rows. least/greatest give the canonical unordered key with
    identical string collation on both engines (ASCII source ids)."""
    docs = load(spark, sf_dir, "documents")
    pairs = sim.ngram_jaccard_pairs_lsh(docs, min_jaccard=0.5).select(
        "id_a", "id_b"
    )
    src = docs.select("doc_id", "source")
    lab = pairs.join(
        src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("s_a")),
        "id_a",
    ).join(
        src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("s_b")),
        "id_b",
    )
    return lab.groupBy(
        F.least("s_a", "s_b").alias("src_lo"),
        F.greatest("s_a", "s_b").alias("src_hi"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.count(F.when(F.col("s_a") != F.col("s_b"), F.lit(1)))
        .cast("long")
        .alias("n_cross"),
    )


def docs_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact repeated-substring spans (the Lee et al. 2022
    substring-dedup pass): maximal token spans whose 8-token windows
    all repeat >= 2 times corpus-wide — the byte ranges a training-data
    dedup pass would cut. One uniform-hash groupBy + a semi-join + one
    per-doc window: no all-pairs stage (see
    operators/text.repeated_kgram_spans)."""
    docs = load(spark, sf_dir, "documents")
    return txt.repeated_kgram_spans(docs, k=8, min_count=2)


def docs_substring_dedup_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee-et-al pass END-TO-END: detect repeated-substring spans
    (docs_substring_dedup) and then CUT them, emitting the deduplicated
    corpus a training pipeline would actually shard — one row per
    document with the span count, tokens removed, and the cleaned text
    (operators/text.cut_spans: span aggregate + one equi-join + a
    row-local token-filter HOF; no second corpus exchange). Oracle
    replays detection + surgery in DuckDB string/list ops."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    spans = txt.repeated_kgram_spans(docs, k=8, min_count=2)
    return txt.cut_spans(docs, spans.select("doc_id", "span_start", "span_len"))


def docs_substring_dedup_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee-et-al pass with the PAPER's keep policy: every repeated
    8-token window is cut from all occurrences EXCEPT the
    corpus-minimum (doc_id, pos) one, so exactly one canonical copy of
    each repeated passage survives into the emitted corpus — what
    docs_substring_dedup_applied (cut-everywhere) deliberately does
    not promise. First-occurrence selection is a MIN(struct(id, pos))
    on the same single uniform-hash exchange (no window sort; total-
    order correct for any id domain — see repeated_kgram_spans);
    surgery is cut_spans. Oracle replays detection + min-key exemption
    + surgery."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    spans = txt.repeated_kgram_spans(docs, k=8, min_count=2, keep_first=True)
    return txt.cut_spans(docs, spans.select("doc_id", "span_start", "span_len"))


def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveText rule-based quality filter (published
    thresholds: word count, mean word length, symbol ratio, bullet /
    ellipsis line shares, alphabetic-word share, required stop words)
    as per-document flags + the combined keep bit — all thresholds as
    integer cross-multiplications, zero shuffles
    (operators/text.gopher_rules)."""
    docs = load(spark, sf_dir, "documents")
    return txt.gopher_rules(docs)


def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical top-k retrieval (the term-search complement to the ANN
    stack): Okapi BM25 over the corpus for a fixed query-term set,
    with the repo's cross-engine-exact numerics — all-integer
    numerator/denominator per term weight, rational integer idf
    surrogate, one fixed-order double sum (operators/text.bm25_topk).
    Plan: row-local tf/dl, ONE corpus aggregate broadcast back,
    TakeOrderedAndProject top-k — no explode, no per-term shuffle."""
    from jagular_spark.workload_params import _BM25_K, _BM25_QUANTA, _BM25_TERMS

    docs = load(spark, sf_dir, "documents")
    return txt.bm25_topk(docs, _BM25_TERMS, k=_BM25_K, quanta=_BM25_QUANTA)


def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit frequency-weighted SimHash fingerprint per document."""
    docs = load(spark, sf_dir, "documents")
    return sim.simhash(docs)


def emb_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding cosine ≥ 0.35 via exact scaled-integer dots."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.cosine_neardup_pairs(emb, threshold=0.35)


def emb_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for probe vecs (id<20):
    probes broadcast, corpus never shuffles, integer-dot ranking."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ann_topk_bruteforce(emb, F.col("id") < 20, k=5)


def emb_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket per embedding (the ANN scale path)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.lsh_bucket_assign(emb)


def docs_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID with deterministic argmax."""
    return txt.language_id(load(spark, sf_dir, "documents"))


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash + winnowing min-gram document fingerprints."""
    return txt.fingerprints(load(spark, sf_dir, "documents"))


def docs_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex BPE-ish token counts + subword estimates."""
    return txt.bpe_token_stats(load(spark, sf_dir, "documents"))


def docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup — the composition sequence packing
    feeds: identical 32-token windows across the corpus collapse by
    chunk hash (the cross-document boilerplate near-dup case document-
    level dedup misses). One hash aggregate over the chunk stream."""
    ck = txt.chunk_documents(load(spark, sf_dir, "documents"))
    return ck.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min(F.struct("doc_id", "chunk_idx")).getField("doc_id").alias("canonical_doc"),
        F.min(F.struct("doc_id", "chunk_idx")).getField("chunk_idx").alias("canonical_chunk"),
    )


def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition filter: duplicate 3-gram
    fraction per doc — zero-shuffle row-local expressions. Flag
    threshold 0.05 (the corpus' dup fractions top out ~0.07, so the
    boolean branch is actually exercised under the oracle)."""
    return txt.repetition_stats(load(spark, sf_dir, "documents"), flag_above=0.05)


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: train docs sharing >= 2 distinct
    8-token shingle hashes with the held-out set (every 50th doc) are
    flagged. The eval shingle set is broadcast — the training corpus
    is scanned once, no shuffle on the big side."""
    docs = load(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    return txt.decontaminate(train, eval_df, n=8, min_shared=2)


def docs_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: overlapping fixed-token windows per document
    (32-token chunks, stride 24), with an engine-portable md5 chunk
    hash for chunk-level dedup downstream."""
    return txt.chunk_documents(load(spark, sf_dir, "documents"))


def docs_vocab_topdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary head by document frequency (df half of
    tf-idf): deterministic top-10 with (df DESC, token ASC) ties."""
    return txt.vocab_top_df(load(spark, sf_dir, "documents"))


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing bookkeeping: docs are packed in
    deterministic doc_id order into 2048-token sequences PER SOURCE
    SHARD (packing is per-shard in practice, which is exactly what
    makes the running offset a partitioned window cumsum instead of an
    unscalable global one). A doc is assigned to the sequence its first
    token lands in (seq = offset DIV 2048); per (source, seq) we emit
    doc count, token fill, and whether the tail doc straddles the
    boundary — the padding/fragmentation audit a packing job reports.
    All-integer; hash-exact."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = docs.select("source", "doc_id", n_tok.alias("nt")).select(
        "source",
        "doc_id",
        "nt",
        (F.sum("nt").over(w) - F.col("nt")).alias("off"),
    )
    per_doc = base.select(
        "source",
        "nt",
        F.expr("off DIV 2048").alias("seq_id"),
        # does this doc run past its sequence's right edge?
        F.expr("((off + nt - 1) DIV 2048) > (off DIV 2048)").alias("straddles"),
    )
    return per_doc.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.sum(F.col("straddles").cast("long")).cast("long").alias("n_straddle"),
    )


def docs_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture bookkeeping per (lang, source) domain: docs,
    exact token totals, token share of the corpus."""
    return txt.domain_mixture(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Signal-chain extensions: common ref, LSH ANN, decimate, tetrode, alignment,
# multimodal decode
# ---------------------------------------------------------------------------

def _minute_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared base: one sample per (user, minute), keep-first dedup —
    the sanitized per-channel stream several signal queries build on."""
    ev = _events_us(spark, sf_dir)
    return dedup_keep_first(
        ev.withColumn("minute", F.expr("CAST(us DIV 60000000 AS BIGINT)")),
        ts_col="minute",
        tiebreak_cols=["us", "event_id"],
        partition_cols=["user_id"],
    ).select("user_id", "minute", "value")


def events_common_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 common average reference (reference ``common_ref``,
    ``jagular/spikes.py:92-117``): subtract the cross-channel mean at
    each timestamp. Values are floored to integer millis first so the
    mean's accumulation is exact (sums ≪ 2^53) and the single final
    division is bit-identical in both engines."""
    from jagular_spark.operators.filtering import common_reference

    base = _minute_grid(spark, sf_dir).withColumn(
        "iv", F.expr("CAST(floor(value * 1000) AS BIGINT)")
    )
    out = common_reference(
        base.select("user_id", "minute", F.col("iv").alias("value")),
        ts_col="minute",
        value_col="value",
        channel_col="user_id",
    )
    return out.select(
        "user_id", "minute", F.col("value").alias("iv"),
        F.col("value_ref").cast("double").alias("value_ref"),
    )


def emb_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 neighbors (the ANN scale path):
    candidates restricted to the probe's hyperplane bucket, exact
    integer-dot ranking inside."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ann_topk_lsh(emb, F.col("id") < 20, k=5, n_planes=6)


def events_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 decimate: FIR anti-alias prefilter through the halo-chunked
    zero-phase strategy, then keep every 4th sample — on fat per-user
    contiguous streams (one segment per user), so the kernel filters
    real data instead of degenerate 1-row islands. ``fs/fs_out`` API
    parity with ``jagular/signal.py:3-40``. Exact SQL oracle via the
    deterministic FIR chain."""
    from jagular_spark.operators.filtering import decimate

    out = decimate(
        _rn_samples(spark, sf_dir), _LP_TAPS, fs=1.0, fs_out=0.25,
        buffer_len=4096, overlap_len=32,
    )
    return out.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("ts").alias("seq"),
        "filtered",
    )


def events_tetrode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4/P4 tetrode assembly: peak times detected on channel 0 are
    joined against 4 channel streams; per-spike 4×8 waveforms pass an
    artifact bound, flattened and posexploded to (peak_seq, idx, wv)
    rows. Full SQL oracle (recursive-CTE censor + list assembly).

    Materialization policy: ``samples`` feeds FOUR branches of the plan
    (MAD agg, crossings window, detection range-join, tetrode range-join)
    — without a cut, each branch re-runs the parquet scan + row_number
    shuffle, and the composed tree quadruples Catalyst/codegen cost.
    ``localCheckpoint`` materializes the sanitized stream once (the same
    write-sanitized-then-reuse shape as the reference's per-channel
    intermediate files, ``jagular/core.py``); the censored peak list is
    O(spikes) ≪ O(samples) and cuts the detection pipeline out of the
    tetrode join's plan."""
    from jagular_spark.operators.spikes import detect_spikes, form_tetrode

    samples = _rn_samples(spark, sf_dir, max_channel=4).localCheckpoint(eager=False)
    spikes = detect_spikes(
        samples.where(F.col("channel_id") == 0),
        multiplier=1.0, censor_width=5, patch_size=8, polarity="pos",
    )
    pts = spikes.select(F.col("peak_ts").alias("ts")).localCheckpoint(eager=False)
    tet = form_tetrode(
        samples, pts,
        tetrode_channels=[0, 1, 2, 3], patch_size=8, artifact_bound=1e9,
    )
    return tet.select(
        F.col("peak_ts").alias("peak_seq"),
        F.posexplode(F.flatten("waveform")).alias("idx", "wv"),
    ).select(
        "peak_seq",
        F.col("idx").cast("long").alias("idx"),
        F.col("wv").cast("double").alias("wv"),
    )


def events_spike_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spike sorting lite — the composition the reference's pipeline
    feeds into downstream sorters: detect → per-spike integer feature
    vector (the 8-sample patch in exact 10^-2 quanta via the DECIMAL
    cast) → deterministic integer k-means (k=4, 2 Lloyd iterations,
    seeds by packed (channel, peak) id — the shared ``_lloyd_int``
    kernel) → per-spike cluster assignment. The fit follows the
    ``ivf_fit_centroids`` fit-on-sample discipline: only the
    engine-portable md5 hash-sample of detections
    (``_SPIKE_FIT_FRACTION``/``_SPIKE_FIT_SALT``) is collected for the
    driver-side Lloyd loop — detections over a 100 TB corpus are
    billions of rows, so the collect must be fraction-bounded, never
    O(all detections). Assignment is the nested-literal argmin over the
    FULL detection set, zero extra shuffles. The DuckDB oracle replays
    detection (recursive-CTE censor), quantization, the identical
    md5-sampled Lloyd chain and the assignment end-to-end."""
    import numpy as np

    from jagular_spark.operators.sampling import hash_sample
    from jagular_spark.operators.similarity import _cent_dists, _lloyd_int
    from jagular_spark.operators.spikes import detect_spikes
    from jagular_spark.workload_params import _SPIKE_FIT_FRACTION, _SPIKE_FIT_SALT

    samples = _rn_samples(spark, sf_dir, max_channel=16).localCheckpoint(eager=False)
    spikes = detect_spikes(
        samples, multiplier=2.0, censor_width=5, patch_size=8, polarity="pos"
    )
    feats = (
        spikes.select(
            F.col("channel_id").cast("long").alias("user_id"),
            F.col("peak_ts").alias("peak_seq"),
            F.expr(
                "transform(waveform, x -> CAST(CAST(x AS DECIMAL(18,4)) * 100 AS BIGINT))"
            ).alias("iv"),
        )
        .distinct()  # two crossings may relocate to one peak (same patch)
        .withColumn("sid", F.col("user_id") * F.lit(4294967296) + F.col("peak_seq"))
        .localCheckpoint(eager=False)
    )
    rows = (
        hash_sample(feats, "sid", _SPIKE_FIT_FRACTION, _SPIKE_FIT_SALT)
        .select("sid", "iv")
        .collect()
    )
    rows.sort(key=lambda r: r.sid)
    if len(rows) < 4:
        raise ValueError(f"spike fit sample has {len(rows)} rows < k=4")
    X = np.array([r.iv for r in rows], dtype=np.int64)
    cents = _lloyd_int(X, k=4, n_iter=2)
    cluster = F.array_min(
        F.zip_with(
            _cent_dists(cents),
            F.sequence(F.lit(0), F.lit(3)),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        )
    ).getField("i").cast("long")
    return feats.select("user_id", "peak_seq", cluster.alias("cluster"))


def events_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5-W7 sub-sample alignment: detected single-channel waveforms are
    wrapped as 1×N tetrodes and aligned to the parabola-vertex
    fractional peak, linear-resampled (reference ``interp1d`` mode,
    ``jagular/alignment.py:53-54``) and posexploded to scalar rows. The
    closed-form parabola + piecewise-linear resample is reproduced
    exactly by the SQL oracle; the cubic-spline mode of the same
    operator is covered by unit tests against the numpy oracle."""
    from jagular_spark.operators.alignment import align_waveforms
    from jagular_spark.operators.spikes import detect_spikes

    samples = _rn_samples(spark, sf_dir, max_channel=32).localCheckpoint(eager=False)
    spikes = detect_spikes(
        samples, multiplier=2.0, censor_width=5, patch_size=8, polarity="pos"
    )
    wrapped = spikes.withColumn(
        "waveform", F.array(F.col("waveform").cast("array<float>"))
    )
    aligned = align_waveforms(wrapped, mode="linear", polarity="pos")
    return aligned.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("peak_ts").alias("peak_seq"),
        F.posexplode(F.element_at("aligned", 1).cast("array<double>")).alias("idx", "av"),
    ).withColumn("idx", F.col("idx").cast("long"))


def events_align_cspline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 cubic-spline mode under driver verification (the linear mode
    is covered by events_align): at patch_size=8 the natural-cubic
    second derivatives are a FIXED 6-unknown tridiagonal system, so the
    Thomas forward sweep and back substitution unroll into
    literal-constant SQL expressions — the oracle replays detection →
    parabola vertex → spline evaluation bit-for-bit (cubes are explicit
    multiplies on both engines; float32-rounded like the pandas
    kernel)."""
    from jagular_spark.operators.alignment import align_waveforms
    from jagular_spark.operators.spikes import detect_spikes

    samples = _rn_samples(spark, sf_dir, max_channel=16).localCheckpoint(eager=False)
    spikes = detect_spikes(
        samples, multiplier=1.5, censor_width=5, patch_size=8, polarity="pos"
    )
    wrapped = spikes.withColumn(
        "waveform", F.array(F.col("waveform").cast("array<float>"))
    )
    aligned = align_waveforms(wrapped, mode="cspline", polarity="pos")
    return aligned.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("peak_ts").alias("peak_seq"),
        F.posexplode(F.element_at("aligned", 1).cast("array<double>")).alias("idx", "av"),
    ).withColumn("idx", F.col("idx").cast("long"))


def _ascii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents restricted to pure-ASCII text — the raw8 media fixture
    contract. The Spark media kernels operate on UTF-8 BYTES while the
    DuckDB oracles index CHARACTERS; on ASCII the two coincide, so the
    restriction (length == octet_length on both engines) makes parity
    hold by construction on ANY corpus instead of silently depending on
    the current fixture being ASCII-only."""
    docs = load(spark, sf_dir, "documents")
    return docs.where(F.length("text") == F.octet_length("text"))


def _codec_spread(media: DataFrame) -> DataFrame:
    """Spread Python-codec work (the Arrow mapInPandas kernels
    dominate these queries) across the session's configured shuffle
    parallelism instead of a hardcoded 64 — the same session-default
    policy repeated_kgram_spans uses (text.py hash_partitions). On the
    local[32] harness both widths measure the same band (see the A/B
    note there); on a real cluster the session value tracks executor
    count while a constant would not."""
    from jagular_spark.session import shuffle_width

    return media.repartition(shuffle_width(media.sparkSession), "media_id")


def docs_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing with an EXACT SQL oracle: each doc's
    UTF-8 bytes become a raw8 media payload; the Arrow-batched decode
    kernel computes integer byte stats (count/sum) and one final double
    division for the mean pixel value."""
    from jagular_spark.operators.multimodal import image_byte_stats

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("int").alias("width"),
        F.lit(1).alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return image_byte_stats(media)


def docs_media_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-codec round-trip under the driver oracle: doc
    bytes → raw8 image → actual PNG container (stdlib zlib encoder) →
    full PNG decode (inflate + unfilter) → exact integer byte stats.
    Losslessness makes the oracle the plain raw-byte statistics — any
    codec bug breaks the hash."""
    from jagular_spark.operators.multimodal import png_byte_stats, png_encode_images

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("int").alias("width"),
        F.lit(1).alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return png_byte_stats(png_encode_images(media))


def docs_media_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF round-trip under the driver oracle: doc bytes → raw8
    image → GIF89a container (identity gray palette + GIF-LZW,
    operators/gif.py) → full production decode (sub-block unwrap, LZW,
    palette luma) → exact integer byte stats. Lossless, so the oracle
    is the plain raw-byte statistics — any LZW width/reset or framing
    bug breaks the hash."""
    from jagular_spark.operators.multimodal import gif_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("int").alias("width"),
        F.lit(1).alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    # Python LZW dominates — spread across executor threads
    return gif_roundtrip_stats(_codec_spread(media))


def docs_media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG round-trip under the driver oracle: doc bytes
    become a 24-wide raw8 grayscale image (zero-padded tail), go
    through a full T.81 encode (Huffman + forward DCT, quality 100 →
    all-ones quant table) and a full production decode, and the kernel
    emits exact integer stats of the original pixels plus a
    ``roundtrip_ok`` tolerance flag (|err| ≤ 2; actual bound is the
    IDCT rounding ±1). JPEG is lossy, so the flag — not the decoded
    bytes — is the hash-verified signal; the spec-level decoder vectors
    live in tests/test_jpeg.py."""
    from jagular_spark.operators.multimodal import jpeg_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(24).alias("width"),
        F.greatest(F.lit(1), F.ceil(nb / F.lit(24))).cast("int").alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    # the sf docs fixture is a single parquet split; the Python codec
    # kernel is the cost here, so spread it across the executor threads
    # (same measured pattern as doc_shingle_hashes). At warehouse scale
    # partition count follows file splits and this is a no-op cost.
    # Measured: 14.6 s single-partition -> ~2 s at 32 threads (sf0.1).
    return jpeg_roundtrip_stats(_codec_spread(media), quality=100, tol=2)


def docs_media_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG round-trip under the driver oracle: the
    same raw8 grayscale framing as docs_media_jpeg_stats, but encoded
    with the 6-scan successive-approximation script (per-scan optimal
    Huffman tables) and decoded through the production multi-scan
    progressive path — DC first/refinement, AC first (two spectral
    bands) and the G.1.2.3 AC correction-bit walk all execute per
    document. Same exact original-pixel stats + tolerance flag as the
    baseline twin; the quantized coefficients are identical, so the
    decoded pixels (and the flag) must be too."""
    from jagular_spark.operators.multimodal import jpeg_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(24).alias("width"),
        F.greatest(F.lit(1), F.ceil(nb / F.lit(24))).cast("int").alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    # Python codec kernel dominates — spread across executor threads
    # (same measured pattern as docs_media_jpeg_stats)
    return jpeg_roundtrip_stats(
        _codec_spread(media), quality=100, tol=2, progressive=True
    )


def docs_media_mjpeg_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video roundtrip under the driver oracle: doc
    bytes become 16x16 grayscale frames, every frame is baseline-JPEG
    encoded, the frames are packed into a RIFF/AVI Motion-JPEG
    container, the container is parsed back and each frame decoded
    through the production jpeg path — per-frame exact original-byte
    stats + a frame_ok flag covering container header survival AND the
    pixel tolerance. Only inter-frame codecs needing external libs
    (H.264) remain stubbed."""
    from jagular_spark.operators.multimodal import mjpeg_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.where(nb >= 256).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        (nb / F.lit(256)).cast("int").alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    # Python codec kernel dominates — spread across executor threads
    return mjpeg_roundtrip_stats(
        _codec_spread(media), quality=100, tol=2
    )


def docs_media_mpeg1_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL inter-format video codec under the driver oracle (r9): doc
    bytes become 16x16 grayscale frames and ALL of a doc's frames are
    encoded into ONE MPEG-1 (ISO 11172-2) I-frame-only elementary
    stream — sequence/GOP/picture/slice/macroblock syntax, intra DC
    DPCM, run-level AC VLCs, flat custom intra quant matrix via the
    load_intra_quantizer_matrix path — then the stream is parsed back
    and every frame decoded (operators/mpeg1.py). frame_ok covers
    stream-header survival AND the per-pixel tolerance. Unlike MJPEG
    (stills in a RIFF box), this is a genuine video elementary-stream
    format; only motion-compensated inter coding (P/B) stays out of
    scope. Same frame geometry as docs_media_mjpeg_video, so the
    queries share one oracle."""
    from jagular_spark.operators.multimodal import mpeg1_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.where(nb >= 256).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        (nb / F.lit(256)).cast("int").alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return mpeg1_roundtrip_stats(
        _codec_spread(media), qscale=1, tol=8, flat_quant=16
    )


def docs_media_mpeg1_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR MPEG-1 intra video under the driver oracle: doc bytes
    become 8x8 RGB frames (192 B each — small enough that real corpus
    docs qualify; the r9 16x16/768 B gate matched ZERO documents at
    every shipped sf, making the query vacuous), all of a doc's frames
    encode into one 4:2:0 I-frame-only elementary stream with REAL
    chroma coding (JFIF RGB→YCbCr + 2x2 box downsample on the padded
    16-grid, chroma DC DPCM + AC run-level codes carrying live data),
    then the stream decodes to (Y, Cb, Cr) planes verified per frame
    against the luma and the encoder-side box-averaged chroma
    references (multimodal.mpeg1_color_roundtrip_stats). 8x8 frames
    also exercise the padding path on every single macroblock."""
    from jagular_spark.operators.multimodal import mpeg1_color_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.where(nb >= 192).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        (nb / F.lit(192)).cast("int").alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return mpeg1_color_roundtrip_stats(
        _codec_spread(media), qscale=1, tol=8, frame_h=8, frame_w=8,
        flat_quant=16,
    )


def docs_media_mpeg1_pframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOTION-COMPENSATED MPEG-1 under the driver oracle (r12): doc
    bytes become 32x8 grayscale frames — TWO macroblock rows tall (a
    single-MB-tall frame pads to a plane where the only legal vector
    is (0,0), so the MC path would never run) and 256 B small (the
    corpus' ASCII docs max out ~550 B; a bigger frame would mean
    single-frame streams with no P pictures at all) — cut at an 8-row
    (64 B) overlap stride: frame t+1 is frame t shifted up 8 rows,
    real vertical motion the top macroblock's search finds at dy=+8
    while the bottom one takes residual/intra — and every doc's
    frames encode into ONE
    I+P elementary stream (intra_period=4): exhaustive even full-pel
    motion search, pred-mc/pred-c/pred-m/intra/skip macroblock modes
    (tables B.1/B.2b/B.3/B.4), §2.4.4.2 non-intra quant with the
    flat-16 matrix. frame_ok additionally requires decode == the
    encoder's closed-loop internal reconstruction BIT-EXACTLY, so the
    hash-verified row carries the full P-picture syntax + arithmetic,
    not just a tolerance."""
    from jagular_spark.operators.multimodal import mpeg1_pframe_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.where(nb >= 256).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(8).alias("width"),
        F.lit(32).alias("height"),
        ((nb - 256) / F.lit(64) + 1).cast("int").alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return mpeg1_pframe_roundtrip_stats(
        _codec_spread(media), qscale=1, tol=8, intra_period=4, flat_quant=16
    )


def docs_media_mpeg1_bframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIDIRECTIONALLY-PREDICTED MPEG-1 under the driver oracle (r13):
    the docs_media_mpeg1_pframes geometry (32x8 grayscale frames cut at
    an 8-row overlap stride — frame t+1 is frame t shifted up 8 rows)
    encoded with ``b_frames=1``: anchors at even display positions
    (every 3rd anchor intra), a B picture between each pair,
    transmitted in decoding order with the decoder undoing the reorder.
    The geometry FORCES both prediction directions inside every B
    picture — the top macroblock's match exists only in the PAST
    anchor (dy=+8; the future anchor's match would sit above the
    plane) and the bottom macroblock's only in the FUTURE anchor
    (dy=-8) — so the hash-verified rows certify genuine forward AND
    backward motion compensation plus the §2.4.4.4 interpolation
    machinery (tables B.1/B.2c/B.3/B.4, per-direction vector
    predictors, skip-reuses-vectors semantics), not a mode that never
    fires (pinned in tests/test_mpeg1_bframes.py::
    test_corpus_geometry_forces_both_directions). frame_ok requires
    decode == the encoder's closed-loop reconstruction BIT-EXACTLY in
    display order."""
    from jagular_spark.operators.multimodal import mpeg1_pframe_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.where(nb >= 256).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(8).alias("width"),
        F.lit(32).alias("height"),
        ((nb - 256) / F.lit(64) + 1).cast("int").alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return mpeg1_pframe_roundtrip_stats(
        _codec_spread(media), qscale=1, tol=8, intra_period=3,
        flat_quant=16, b_frames=1,
    )


def docs_media_mpeg1_halfpel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HALF-PEL MPEG-1 under the driver oracle (r13): 32x8 grayscale
    frames stepping by HALF A ROW per display position — even frames
    are plain row windows of the doc bytes, odd frames the
    §2.4.4.2-rounded average of adjacent rows, a true +0.5-pel
    vertical shift NO full-pel vector can express — encoded with
    ``half_pel=True`` (full_pel bits 0, vectors coded in half-pel
    units, two-stage search, chroma truncating-division vectors). The
    geometry forces the search onto ODD vertical vectors (pinned in
    tests/test_mpeg1_halfpel.py on this exact construction — r12
    vacuity discipline), so the hash-verified rows certify the
    decoder's half-pel interpolation path running inside the encoder's
    own closed loop: frame_ok requires decode == reconstruction
    BIT-EXACTLY. The oracle replays the frame construction — rounded
    row averages included — in exact integer SQL."""
    from jagular_spark.operators.multimodal import mpeg1_halfpel_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.where(nb >= 272).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(8).alias("width"),
        F.lit(32).alias("height"),
        F.least(
            F.lit(2) * (nb / 8).cast("int") - 63, F.lit(8)
        ).cast("int").alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return mpeg1_halfpel_roundtrip_stats(
        _codec_spread(media), qscale=1, tol=8, intra_period=4, flat_quant=16,
        max_frames=8,
    )


def docs_media_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 COLOR baseline-JPEG roundtrip under the driver oracle: doc
    bytes become a (h, 16, 3) RGB image, go through the full color
    encode (chroma MCU schedule, K.2/K.4/K.6 chroma tables, three DC
    predictor chains) and the production multi-component decode; the
    kernel emits exact integer stats of the original bytes plus the
    y_ok/chroma_ok tolerance flags (see jpeg_color_roundtrip_stats —
    quality 100, so the residual is quantization + IDCT rounding)."""
    from jagular_spark.operators.multimodal import jpeg_color_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    nb = F.length(F.encode("text", "UTF-8"))
    media = docs.where(nb >= 48).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(16).alias("width"),
        (nb / F.lit(48)).cast("int").alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    # Python codec kernel dominates — spread across executor threads
    # (same measured pattern as docs_media_jpeg_stats)
    return jpeg_color_roundtrip_stats(
        _codec_spread(media), quality=100, tol=2
    )


def events_crossings_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 at huge-epoch scale: the range-chunked crossings variant
    (1-row halo per chunk) over the dense per-user rn streams, with a
    deliberately tiny buffer so chunking engages at sf0.01 — output is
    exactly the global-window debounce, which is what the oracle
    replays."""
    from jagular_spark.operators.spikes import crossings_chunked, mad_threshold

    s = _rn_samples(spark, sf_dir)
    thr = mad_threshold(
        s, "value", multiplier=1.0, partition_cols=["channel_id", "segment_id"]
    )
    # buffer 16 on ~67-sample streams → 5 chunks/group, so the halo
    # machinery genuinely engages (stream length is sf-INVARIANT in the
    # testdata — users scale with sf, not samples-per-user — so a
    # buffer "scaled to sf" would never chunk at any sf)
    x = crossings_chunked(
        s, thr, partition_cols=("channel_id", "segment_id"),
        polarity="pos", buffer_len=16,
    )
    return x.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("ts").alias("seq"),
        F.col("value").cast("double").alias("value"),
    )


def events_crossings_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 with ``polarity='both'`` — the INTENDED two-sided debounce the
    reference's elif chain silently drops (``jagular/spikes.py:339-375``
    falls through to neg-only; SURVEY §2.10 do-not-replicate): keep a
    sample when |value| and |next value| both exceed the per-user MAD
    threshold. Exercises the third branch of ``crossings`` under the
    driver oracle (pos is covered by events_crossings_chunked). The raw
    stream is strictly positive (so 'both' would degenerate to 'pos');
    centering by a CONSTANT keeps the float math a per-row IEEE op that
    is bit-identical across engines while making both signs occur."""
    from jagular_spark.operators.spikes import crossings, mad_threshold

    s = _rn_samples(spark, sf_dir).withColumn(
        "value", F.col("value") - F.lit(245.0)
    )
    thr = mad_threshold(
        s, "value", multiplier=0.75, partition_cols=["channel_id", "segment_id"]
    )
    x = crossings(
        s, thr, partition_cols=("channel_id", "segment_id"), polarity="both"
    )
    return x.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("ts").alias("seq"),
        F.col("value").cast("double").alias("value"),
    )


def events_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/A9 whole-stream audit (reference runs it after every
    extraction, ``jagular/utils.py:544-547``): per-user row count,
    distinct-ts count, duplicate flag, ts bounds — one hash
    aggregation."""
    from jagular_spark.operators import check_timestamps

    ev = _events_us(spark, sf_dir)
    out = check_timestamps(ev, ts_col="us", partition_cols=["user_id"])
    return out.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("ts_min").alias("ts_min"),
        F.col("ts_max").alias("ts_max"),
        "has_duplicates",
    )


def docs_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling with an EXACT SQL oracle: each doc's
    UTF-8 bytes become a raw8 'video' of 1×16 frames; every 3rd full
    frame yields integer (n_bytes, byte_sum) + one double division —
    same oracle-checkable contract as docs_media_stats."""
    from jagular_spark.operators.multimodal import video_frame_byte_stats

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(16).alias("width"),
        F.lit(1).alias("height"),
        (F.length(F.encode("text", "UTF-8")) / 16).cast("int").alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return video_frame_byte_stats(media, every_k=3)


def docs_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming ≤ 1 via half-fingerprint
    banding (pigeonhole-complete candidates, exact bit_count verify);
    the oracle is the provably-equivalent all-pairs formulation.
    32-bit fingerprints — 16 bits saturate with birthday collisions at
    corpus scale."""
    docs = load(spark, sf_dir, "documents")
    return sim.simhash_neardup_pairs(docs, bits=32, max_hamming=1)


def docs_media_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing with an EXACT SQL oracle: each doc's UTF-8 bytes
    become raw8 PCM; every full 32-byte window yields integer
    deviation-from-midpoint stats + one fixed double chain for rms."""
    from jagular_spark.operators.multimodal import audio_window_byte_stats

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit(0).alias("n_frames"),
        F.lit(8000).alias("sample_rate"),
    )
    return audio_window_byte_stats(media, window=32)


def docs_media_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-container round-trip under the driver oracle: doc
    bytes -> PCM16 WAV (samples = byte - 128, stdlib RIFF encoder) ->
    full WAV decode -> the same windowed integer deviation stats the
    raw-byte oracle scores."""
    from jagular_spark.operators.multimodal import (
        wav_encode_audio,
        wav_window_byte_stats,
    )

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit(0).alias("n_frames"),
        F.lit(8000).alias("sample_rate"),
    )
    return wav_window_byte_stats(wav_encode_audio(media), window=32)


def docs_media_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-compressed-audio roundtrip under the driver
    oracle: doc bytes -> int16 PCM (byte - 128) -> full FLAC encode
    (fixed predictors, Rice residuals, CRC-8/16 — the format speech
    corpora actually ship) -> full FLAC decode -> the same windowed
    integer deviation stats the raw-byte oracle scores. Lossless, so
    the oracle is identical to the raw-audio one: any predictor / Rice
    / framing bug breaks the hash."""
    from jagular_spark.operators.multimodal import flac_roundtrip_byte_stats

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit(0).alias("n_frames"),
        F.lit(8000).alias("sample_rate"),
    )
    # Python codec kernel dominates — spread across executor threads
    return flac_roundtrip_byte_stats(
        _codec_spread(media), window=32
    )


def docs_media_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-audio roundtrip, HASH-EXACT under the driver oracle:
    doc bytes -> int16 PCM ((byte-128)*256, spanning the full mu-law
    chord range) -> G.711 mu-law compress -> expand -> windowed integer
    stats of the DECODED samples. mu-law is stateless, so every decoded
    value is a pure integer function of the input byte and the DuckDB
    oracle replays the compress/expand chain exactly (256-entry lookup
    built from an independent scalar G.711 implementation) — unlike the
    JPEG/ADPCM roundtrips there is no tolerance flag anywhere; the
    lossy codec output itself is hash-verified."""
    from jagular_spark.operators.audio_codecs import mulaw_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return mulaw_roundtrip_stats(media, window=32)


def docs_media_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stateful-codec roundtrip: doc bytes -> int16 PCM -> IMA
    ADPCM encode (4-bit adaptive differential, 89-entry step table) ->
    decode through the packed nibble stream. The per-payload contract
    the oracle verifies: exact original-sample stats, the 4-bit rate
    law (n_adpcm_bytes = ceil(n/2)), and ``decode_exact`` — decoder
    output equals the encoder's internal reconstruction bit-for-bit,
    the codec's defining invariant (corpus-independent, no calibrated
    tolerance). Python-loop kernel (state recursion), so the corpus is
    spread across executor threads like the JPEG query."""
    from jagular_spark.operators.audio_codecs import adpcm_roundtrip_stats

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return adpcm_roundtrip_stats(_codec_spread(media))


def docs_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor image resize with an EXACT SQL oracle: each
    doc's UTF-8 bytes become a (n_chars//16)×16 raw8 image, resized to
    4×8; every output pixel is an integer row the oracle replays with
    the same trunc(i·in/out) index mapping."""
    from jagular_spark.operators.multimodal import resize_pixel_grid

    docs = _ascii_docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("raw8").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(16).alias("width"),
        (F.length(F.encode("text", "UTF-8")) / 16).cast("int").alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(0).alias("sample_rate"),
    )
    return resize_pixel_grid(media, out_h=4, out_w=8)


def emb_cosine_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked cosine near-dup (the 100-TB path): candidates from
    hyperplane buckets within Hamming distance 1 (multi-probe), exact
    integer-dot verify. Deterministic planes → exact SQL oracle."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.cosine_neardup_lsh(emb, threshold=0.35)


def emb_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (clustering scale path): deterministic
    integer-quantized Lloyd coarse quantizer (seeds by id, int64
    distances, floor-divided centroid updates, first-min ties) →
    inverted lists → nprobe centroid search → exact integer-dot
    ranking. The fit runs on the engine-portable md5 half-sample of the
    corpus (the FAISS-style train-on-sample 100-TB path: one collect,
    driver-side integer Lloyd). Every stage is exact int64, so the
    DuckDB oracle replays the FIT TOO — the 3 Lloyd iterations over the
    same sample unrolled as chained CTEs — and hash-matches the fitted
    pipeline end-to-end."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ann_topk_ivf(
        emb, F.col("id") < 20, k=5, n_centroids=16, nprobe=4, n_iter=3,
        fit_fraction=0.5,
    )


def emb_ann_topk_ivf_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-INDEX IVF serving shape (build once, serve many —
    what a 100 TB deployment actually runs instead of refitting per
    query): the corpus is written ONCE as a parquet index PARTITIONED
    BY inverted-list cell (sim.ivf_write_index), and the search reads
    it back with the probes' nprobe cells as a STATIC partition filter
    — Catalyst prunes every other cell's files at planning time, so
    the serving scan touches ~nprobe/n_centroids of the index bytes
    (PartitionFilters pinned in tests/test_plans.py). Same fit
    (fit_fraction=0.5 md5 half-sample, 3 integer Lloyd iterations),
    same probes, same exact-integer scoring as emb_ann_topk_ivf, so
    the result is bit-identical and this query REUSES that oracle
    verbatim — the hash match certifies that persist→prune→search
    loses nothing vs the inline pipeline."""
    emb = load(spark, sf_dir, "embeddings")
    stage = _stage_dir("ivf_index", sf_dir)
    cents = sim.ivf_write_index(
        emb, stage, n_centroids=16, n_iter=3, fit_fraction=0.5
    )
    probes = sim.ivf_probe_rows(emb, F.col("id") < 20, cents, nprobe=4)
    return sim.ivf_search_index(spark, stage, probes, k=5)


def emb_ann_topk_ivf_pq_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVFADC index — THE memory-bounded 100 TB ANN
    deployment: the table written once is ``(id, codes)`` (m=4 small
    ints per vector, ~100× smaller than raw) PARTITIONED BY
    inverted-list cell, so serving combines BOTH scale levers — the
    codes-only representation AND static partition pruning to the
    probes' nprobe cells' files. ADC tables ride in on the broadcast
    probe rows; the ADC top-32 shortlist is re-ranked with exact
    integer dots against the full-precision store, fetched for
    shortlist candidates only. Same fit (one md5 half-sample collect
    feeding both quantizers), same probes, same exact-integer
    arithmetic as emb_ann_topk_ivf_pq, so the result is bit-identical
    and this query REUSES that oracle verbatim."""
    emb = load(spark, sf_dir, "embeddings")
    stage = _stage_dir("ivfpq_index", sf_dir)
    cents, books = sim.ivf_pq_write_index(
        emb, stage, n_centroids=16, n_iter=3, m=4, pq_k=16, pq_iter=2,
        fit_fraction=0.5,
    )
    probes = sim.ivf_probe_rows(emb, F.col("id") < 20, cents, nprobe=4)
    return sim.ivf_pq_search_index(
        spark, emb, stage, probes, books, k=5, refine=32
    )


def emb_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL persisted-index operational loop a long-lived 100 TB
    deployment runs, as one oracle-verified composition: BUILD the
    cell-partitioned IVF index from the initial (even-id) half of the
    corpus — the coarse quantizer fits on that half's md5 hash-sample —
    then APPEND the odd-id half with the FROZEN sidecar model (never
    refit: refitting would re-home existing cells), read the per-cell
    ``ivf_index_stats`` telemetry and COMPACT exactly the cells whose
    ``n_files`` drifted above 1 (the stats→compact trigger, now running
    the r17 crash-repair preamble), and finally serve the same
    partition-pruned search as emb_ann_topk_ivf_prebuilt. Append
    assignment uses the identical frozen-centroid argmin and compaction
    is a data-identical rewrite, so the DuckDB oracle is the fitted
    pipeline with only the FIT BASE restricted to even ids — the hash
    match certifies no row is lost, duplicated, or re-homed anywhere in
    write→append→stats→compact→search. The stats collect is bounded by
    n_centroids (≤16 rows)."""
    emb = load(spark, sf_dir, "embeddings")
    stage = _stage_dir("ivf_lifecycle", sf_dir)
    cents = sim.ivf_write_index(
        emb.where(F.col("vec_id") % 2 == 0), stage,
        n_centroids=16, n_iter=3, fit_fraction=0.5,
    )
    sim.ivf_append_index(emb.where(F.col("vec_id") % 2 == 1), stage)
    churned = [
        r.cell
        for r in sim.ivf_index_stats(spark, stage)
        .where(F.col("n_files") > 1)
        .collect()
    ]
    if churned:
        sim.ivf_compact_index(spark, stage, cells=churned)
    probes = sim.ivf_probe_rows(emb, F.col("id") < 20, cents, nprobe=4)
    return sim.ivf_search_index(spark, stage, probes, k=5)


def emb_ann_topk_ivf_fitrows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat with an ABSOLUTE fit budget (r13): same fitted pipeline
    as emb_ann_topk_ivf but the coarse quantizer trains on exactly the
    ``fit_rows=300`` smallest-hash vectors regardless of corpus size —
    the 100-TB fit shape SCALE.md measures (a fixed driver-side sample
    that does not grow with the corpus), now a first-class parameter
    instead of a hand-computed fraction. The sample is
    ``ORDER BY md5-bucket, id LIMIT 300`` (TakeOrderedAndProject — no
    shuffle; membership is a pure function of the corpus and replays
    bit-for-bit on any engine), so the DuckDB oracle reproduces fit +
    search end-to-end and hash-matches. 300 < the 500-row sf0.01
    corpus, so the sample is a strict subset at every shipped sf."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ann_topk_ivf(
        emb, F.col("id") < 20, k=5, n_centroids=16, nprobe=4, n_iter=3,
        fit_rows=300,
    )


def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus: the IVF integer k-means
    (same sampled fit as emb_ann_topk_ivf) partitions vectors into 16
    clusters; within each cluster any vector with a smaller-id
    neighbor at cosine >= 0.35 is dropped. Emits the full
    (vec_id, cluster, kept) verdict table — the keep-list a semantic
    dedup pass feeds downstream. Pairwise work is an equi-join on the
    cluster id (never cross-cluster); the oracle replays fit +
    assignment + pruning in exact int64.

    r9: the hot-cluster guard is ENGAGED (``_SEMDEDUP_MAX_CLUSTER``):
    oversized clusters sub-split into rank-bounded cells before the
    pair join, so no cell's pair set exceeds cap² even on a
    duplicate-heavy corpus. Sizing note for real deployments: keep
    ``n_centroids`` ≈ corpus_size / target_cluster_size (the SemDeDup
    paper scales k with the corpus — 50k clusters for LAION-440M); the
    pinned k=16 here is the sf-scale equivalent, and the cap is the
    backstop for skew the fit doesn't capture."""
    from jagular_spark.workload_params import _SEMDEDUP_MAX_CLUSTER

    emb = load(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(
        emb, n_centroids=16, n_iter=3, threshold=0.35, fit_fraction=0.5,
        max_cluster=_SEMDEDUP_MAX_CLUSTER,
    )


def emb_ann_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-style IVFADC — the memory-bounded ANN serving shape: the
    scan side carries only (id, IVF cell, m PQ codes); candidates from
    nprobe cells are shortlisted by exact-integer ADC dot tables and
    the top-32 re-ranked with full-precision integer dots. Both fits
    (IVF coarse + per-subspace PQ codebooks) run on the shared md5
    half-sample in exact int64, so the DuckDB oracle replays fit +
    encode + ADC + re-rank end-to-end and hash-matches.

    Perf attribution for the r11→r12 "drift" (2.56 → 4.80 s on both
    bench hosts; code unchanged — the r12 similarity.py diff is the LSH
    cap only): measured r13 isolated in ONE warm process at sf0.1,
    best-of-5 = 2.58 s (reps 2.58–3.18; stages: fit 0.13 s, corpus
    encode 0.27 s) — exactly r11's 2.56 s. The r12 readings were
    position + rerun-contamination: the stalest-first reorder moved the
    query 58th → 17th, so its pass-1 run now pays the IVFADC shape's
    first-execution codegen/Arrow warm-up (r12 run1_s=4.80), and the
    one RERUN_ABOVE rerun that should have recovered the warm time
    recorded 368 steal ticks and read 6.52 s (BENCH_r12_local env), so
    best-of-2 kept the cold 4.80. Not a regression; bench.py now
    retries a steal-hit rerun once more so this recovery is mechanical
    (see bench.py RERUN_ABOVE block)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ann_topk_ivf_pq(
        emb, F.col("id") < 20, k=5, n_centroids=16, nprobe=4, n_iter=3,
        m=4, pq_k=16, pq_iter=2, refine=32, fit_fraction=0.5,
    )


# Frozen IVF coarse quantizer: one offline deterministic Lloyd fit
# (k=8, n_iter=3, on the sf0.01 corpus), floored to ints. Integer


def emb_ann_topk_ivf_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF serving path with a frozen integer coarse quantizer —
    assignment + nprobe selection + ranking are exact BIGINT, so this
    is the hash-matched driver row for the IVF machinery (the Lloyd
    fit itself stays rows-only in emb_ann_topk_ivf)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ann_topk_ivf_frozen(
        emb, F.col("id") < 20, _IVF_FROZEN_CENTS, k=5, nprobe=2
    )


def emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit for BOTH approximate ANN serving paths against the
    exact brute-force top-k, computed inside the engine (and replayed by
    the oracle), so index quality is a first-class, hash-verified
    metric instead of an offline eyeball: per (method, probe) the
    exact/approx result sizes, their overlap, and recall@5. The exact
    result is materialized once and shared by both comparisons.
    All-integer counts; recall is the single final division."""
    emb = load(spark, sf_dir, "embeddings")
    probes = F.col("id") < 20
    exact = (
        sim.ann_topk_bruteforce(emb, probes, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    variants = {
        "lsh": sim.ann_topk_lsh(emb, probes, k=5, n_planes=6),
        "ivf": sim.ann_topk_ivf_frozen(emb, probes, _IVF_FROZEN_CENTS, k=5, nprobe=2),
    }
    ne = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    parts = []
    for method, ap in variants.items():
        ap = ap.select("query_id", "neighbor_id")
        # r18: ONE pass per variant — the old separate n_approx/n_overlap
        # aggregates consumed the un-checkpointed `ap` twice, re-running
        # each ANN search per consumer (5 corpus passes for this query;
        # now the 3-pass minimum). Left-joining the tiny checkpointed
        # exact set (broadcast: n_probes·k rows) cannot multiply rows —
        # exact (query_id, neighbor_id) pairs are unique — so count(*)
        # is still n_approx and count(__hit__) counts exactly the
        # overlap pairs the old inner-join aggregate counted.
        stats = (
            ap.join(
                F.broadcast(exact.withColumn("__hit__", F.lit(1))),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_approx"),
                F.count("__hit__").cast("long").alias("n_overlap"),
            )
        )
        parts.append(
            ne.join(F.broadcast(stats), "query_id", "left")
            .select(
                F.lit(method).alias("method"),
                "query_id",
                "n_exact",
                F.coalesce("n_approx", F.lit(0).cast("long")).alias("n_approx"),
                F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            )
        )
    u = parts[0].unionByName(parts[1])
    return u.withColumn(
        "recall",
        F.col("n_overlap").cast("double") / F.col("n_exact").cast("double"),
    )


def events_spikes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 sink/scan driver surface: detection output is persisted with
    ``save_spikes`` (Parquet, partitioned by channel, peak-sorted row
    groups) and re-read with ``load_spikes``; the round-tripped table
    must satisfy the same oracle as ``events_detect_spikes`` — the sink
    is correct iff it is invisible to the query result."""
    import os
    import re
    import tempfile

    from jagular_spark.operators.spikes import detect_spikes
    from jagular_spark.sources.spikes_io import load_spikes, save_spikes

    out = detect_spikes(
        _rn_samples(spark, sf_dir, max_channel=16).localCheckpoint(eager=False),
        multiplier=2.0, censor_width=5, patch_size=8, polarity="pos",
    )
    tag = re.sub(r"\W+", "_", sf_dir).strip("_")
    # pid-unique so two concurrent harness runs can't race on the sink;
    # same-process re-runs reuse (save_spikes overwrites).
    path = f"{tempfile.gettempdir()}/jspark_spikes_rt_{tag}_{os.getpid()}"
    save_spikes(out, path, partition_col="channel_id", order_col="peak_ts")
    back = load_spikes(spark, path, ts_col="peak_ts")
    return back.select(
        F.col("channel_id").cast("long").alias("user_id"),
        F.col("crossing_ts").alias("crossing_seq"),
        F.col("peak_ts").alias("peak_seq"),
        F.posexplode("waveform").alias("idx", "wv"),
    ).withColumn("idx", F.col("idx").cast("long"))


def docs_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: connected components over the
    exact 3-gram Jaccard ≥ 0.5 pair graph (min-label propagation, one
    equi-join shuffle per diameter round), then every document labeled
    with its component-minimum ``cluster_id`` and a canonical flag —
    the keep-list of a corpus-scale dedup pass. DuckDB oracle replays
    the closure with a recursive CTE (mirroring the stop-shingle
    cutoff)."""
    from jagular_spark.operators.graph import dedup_clusters

    docs = load(spark, sf_dir, "documents")
    return dedup_clusters(docs, _dedup_cluster_pairs(docs))


def _dedup_cluster_pairs(docs: DataFrame) -> DataFrame:
    """Pair generation for the flagship cluster-dedup query, with the
    heavy-hitter guard ENGAGED: ``_JACCARD_MAX_BUCKET`` caps per-bucket
    pair fanout at k², so one boilerplate stop-shingle can never
    generate an unbounded candidate set (similarity.py documents the
    10^12-pair failure mode this prevents). Split out so the plan test
    can pin the guard on the exact path the workload wires."""
    from jagular_spark.workload_params import _JACCARD_MAX_BUCKET

    return sim.ngram_jaccard_pairs(
        docs, min_jaccard=0.5, max_bucket=_JACCARD_MAX_BUCKET
    )


def docs_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding (the pre-shard-write
    step of a pretraining pipeline): shard = row-local md5 bucket,
    position = rank within shard by an independent salted hash — one
    per-shard window, NO global sort (operators/sampling.shuffle_shards).
    Reproducible across runs, engines and partitionings."""
    from jagular_spark.operators.sampling import shuffle_shards

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, "doc_id", n_shards=8, salt="train-mix-v1")


def docs_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing toward a target language composition: the
    per-language keep-fraction is COMPUTED from observed counts
    (min(1, target·N/n_g)) — over-represented strata shrink, the rest
    pass through; membership is the deterministic md5 threshold, so
    corpus rows never shuffle (operators/sampling.rebalance_sample)."""
    from jagular_spark.operators.sampling import rebalance_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return rebalance_sample(docs, "lang", _REBALANCE_TARGETS)


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample: membership is a
    pure md5 function of ``doc_id`` (reproducible across engines, runs
    and partitionings — rand() sampling is none of those), with
    per-stratum keep fractions. Pure filter, no shuffle."""
    from jagular_spark.operators.sampling import stratified_sample

    docs = txt.language_id(load(spark, sf_dir, "documents"))
    out = stratified_sample(
        docs, "pred_lang", _STRATA_FRACTIONS, key_col="doc_id"
    )
    return out.select("doc_id", "pred_lang")


def docs_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016) — the
    tokenizer-fitting stage of the pretraining pipeline, in the
    engine's bounded-fit / frozen-serving shape: 16 merges fitted
    driver-side on the ABSOLUTE 256-doc md5 hash-sample (the
    fit_rows quantizer precedent — corpus-size-invariant fit,
    TakeOrderedAndProject membership a pure function of the corpus),
    served in the DISTINCT-WORD shape (r16): one corpus scan feeds a
    word-frequency aggregate (map-side combine onto the Zipf-small
    word keyspace — the only corpus-width exchange), each DISTINCT
    word is encoded ONCE (rank-based encoder, Arrow-batched pandas on
    the tiny aggregate — provably identical to the literal replace
    chain), and symbol counts are the occurrence-weighted rollup.
    This is the shape that survives a realistic 32k-merge vocabulary:
    the per-occurrence replace chain's cost and expression depth grow
    with merge count (measured cliff in SCALE.md), while this encode
    is |distinct words| × merges-a-word-uses. Output: the per-merge
    audit (rank, token, n_final) — how often each fitted token
    survives in the final encoding (later merges legitimately consume
    earlier tokens to 0). The DuckDB oracle re-derives the merge list
    INDEPENDENTLY (one unrolled CTE round per merge — the
    integer-Lloyd-in-SQL precedent) and replays the encode
    per-occurrence, so the hash match certifies fit AND both serving
    forms end-to-end (operators/bpe.py)."""
    from jagular_spark.operators.bpe import bpe_fit, bpe_vocab_audit_distinct

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=_BPE_MERGES, fit_rows=_BPE_FIT_ROWS)
    return bpe_vocab_audit_distinct(docs, merges)


def docs_bpe_corpus_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE CORPUS-ENCODE serving path under the driver's eye (r17
    verdict #4: the r17 join-strategy knob was plan-pinned and
    property-tested but no registry query actually ran
    bpe_encode_corpus_words): fit the frozen 16-merge vocabulary on
    the absolute 256-doc md5 hash-sample (same fit as docs_bpe_vocab),
    encode every word occurrence through the DISTINCT-WORD map join —
    one corpus scan, the map built by a pandas rank-encode over the
    Zipf-small distinct-word aggregate, corpus side never runs Python
    — then roll the per-occurrence encodings up to the per-document
    tokenization manifest a shard writer consumes: ``(doc_id,
    n_words, n_tokens)`` where n_tokens counts the BPE symbols each
    word's encoding carries. The rollup keeps the driver compare
    bounded (one row per doc) while the join itself runs at
    per-occurrence width. The DuckDB oracle re-derives the merges
    independently (the unrolled-CTE fit) and replays the encode as
    the per-occurrence literal replace chain, so the hash match
    certifies fit + rank-encoder + map-join + rollup end-to-end —
    the rank-vs-chain equivalence the unit pins assert, now
    driver-verified (operators/bpe.py)."""
    from jagular_spark.operators.bpe import bpe_encode_corpus_words, bpe_fit

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=_BPE_MERGES, fit_rows=_BPE_FIT_ROWS)
    enc = bpe_encode_corpus_words(docs, merges)
    n_sym = F.size(
        F.regexp_extract_all("enc", F.lit(r"\(([^)]*)\)"), F.lit(1))
    ).cast("long")
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(n_sym).cast("long").alias("n_tokens"),
    )


def docs_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's TERMINAL shape end-to-end — "write the training
    shards" (r14 verdict optional task #7), composing three verified
    operators in their deployment order: (1) build the mixture to
    ABSOLUTE per-source token budgets (token_budget_sample — bounded
    threshold fit, scan-level md5 membership, the corpus never
    shuffles), (2) lay the survivors out as deterministic training
    shards (shuffle_shards — row-local hash shard + per-shard rank,
    NO global sort), (3) pack each shard's stream into 2048-token
    sequences in shard order (per-shard window cumsum — the
    docs_pack_sequences bookkeeping on the SHARD axis; the pack rides
    the same by-shard exchange the rank already required, so the
    composition adds no extra corpus shuffle). Output is the 8-row
    shard MANIFEST a shard-writing job publishes: docs, exact token
    mass, packed sequence count, and boundary-straddle count per
    shard. At 100 TB ``n_shards`` scales with the cluster (thousands);
    8 here matches docs_shuffle_shards for oracle parity. The one
    DuckDB oracle replays sample → shard → pack in sequence, so the
    green row certifies the composition, not just the stages."""
    from jagular_spark.operators.sampling import (
        shuffle_shards,
        token_budget_sample,
    )

    docs = load(spark, sf_dir, "documents")
    sampled = token_budget_sample(docs, _TOKEN_BUDGETS, group_col="source").select(
        "doc_id", "n_tokens"
    )
    sharded = shuffle_shards(sampled, "doc_id", n_shards=8, salt="train-mix-v1")
    w = (
        Window.partitionBy("shard")
        .orderBy("pos_in_shard")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = sharded.select(
        "shard",
        F.col("n_tokens").alias("nt"),
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("off"),
    )
    per_doc = base.select(
        "shard",
        "nt",
        F.expr("off DIV 2048").alias("seq_id"),
        F.expr("((off + nt - 1) DIV 2048) > (off DIV 2048)").alias("straddles"),
    )
    # n_sequences is the PACKED-FILE sequence count ceil(Σnt / 2048) —
    # docs pack back-to-back, so the file's last sequence is the one
    # holding the final token, not the last one a document STARTS in
    # (max(seq_id)+1 under-counted when a shard's last doc straddled
    # boundaries: one 5000-token doc is 1 start but 3 sequences; r15
    # advice). seq_id still feeds the per-doc straddle flag. The ceil
    # is written (Σnt + 2047) DIV 2048, not ((Σnt - 1) DIV 2048) + 1:
    # the latter returns 1 for an (impossible today) zero-token shard
    # (correct ceil: 0) and divides a NEGATIVE operand — DuckDB's
    # integer // truncates like Spark's DIV (measured), but on a
    # DECIMAL/DOUBLE operand // degenerates to PLAIN division
    # (5.0 // 2 = 2.5 in v1.0.0), so any future type promotion in
    # the oracle would silently split the engines (r16/r17 advice).
    # Identical on all positive sums; pinned in
    # tests/test_workload_extensions.py.
    return per_doc.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.expr("CAST((sum(nt) + 2047) DIV 2048 AS BIGINT)").alias(
            "n_sequences"
        ),
        F.sum(F.col("straddles").cast("long")).cast("long").alias("n_straddle"),
    )


def docs_training_shards_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of docs_training_shards — the terminal
    composition as a shard-writer would actually run it at ingest:
    token-budget admission and shard/order assignment are the frozen
    row-local md5 expressions (stateless), and the 2048-token pack's
    running offset is the ONLY state — one long per shard, carried
    through applyInPandasWithState
    (streaming/pipeline.stream_training_shard_pack). One availableNow
    pass over the staged corpus packs every shard in the batch
    layout's (ord, id) order, so the manifest rolled up from the sink
    is bit-identical to the batch composition's and the query shares
    docs_training_shards' oracle VERBATIM (hash match, not
    rows-only)."""
    from jagular_spark.operators.sampling import token_budget_thresholds
    from jagular_spark.streaming.pipeline import stream_training_shard_pack

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    thresholds = token_budget_thresholds(docs, _TOKEN_BUDGETS, group_col="source")
    stage = _stage_dir("shards_stream", sf_dir)
    docs.write.mode("overwrite").parquet(stage)
    stream = _spread_stream(spark.readStream.schema(docs.schema).parquet(stage))
    tbl = _run_stream_to_table(
        stream_training_shard_pack(stream, thresholds, salt="train-mix-v1"),
        "shards_stream",
        shuffle_partitions=8,
    )
    per_doc = spark.table(tbl).select(
        "shard",
        "nt",
        F.expr("((off + nt - 1) DIV 2048) > (off DIV 2048)").alias("straddles"),
    )
    return per_doc.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.expr("CAST((sum(nt) + 2047) DIV 2048 AS BIGINT)").alias(
            "n_sequences"
        ),
        F.sum(F.col("straddles").cast("long")).cast("long").alias("n_straddle"),
    )


def docs_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture building to ABSOLUTE per-source token budgets (the way
    a pretraining run is actually specified — "N tokens of web, M of
    code" — which count-share rebalancing cannot hit when strata have
    different mean document lengths): per-stratum exact token totals
    from one bounded aggregate, then the deterministic md5-threshold
    keep rule with ``thr = min(2^32, budget·2^32 // T_g)``, computed
    driver-side in arbitrary-precision ints because the multiply
    overflows int64 on any large corpus (the oracle replays it in
    HUGEINT). Budgets here exercise all three regimes: src1's budget
    exceeds its total (clamp → keep-all), src0/src2/src3/src4 cut at
    different depths, and the 15 unlisted sources are dropped (a
    mixture is a whole composition). Scoring is a scan-level filter —
    the corpus never shuffles (operators/sampling.py)."""
    from jagular_spark.operators.sampling import token_budget_sample

    docs = load(spark, sf_dir, "documents")
    out = token_budget_sample(docs, _TOKEN_BUDGETS, group_col="source")
    return out.select("doc_id", "source", "n_tokens")


def docs_token_budget_sample_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of docs_token_budget_sample — the serving shape
    of mixture building: the per-source thresholds are fit OFFLINE on
    the corpus snapshot (one bounded aggregate + driver-side
    arbitrary-precision floor-divisions) and every arriving document
    is admitted or dropped incrementally against the frozen literal
    table (streaming/pipeline.stream_token_budget_sample). Completely
    STATELESS — membership is a row-local md5 filter, so there is no
    watermark and no state store; one availableNow pass over the
    staged corpus emits exactly the batch rows, and the query shares
    docs_token_budget_sample's oracle verbatim (hash match, not
    rows-only)."""
    from jagular_spark.operators.sampling import token_budget_thresholds
    from jagular_spark.streaming.pipeline import stream_token_budget_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    thresholds = token_budget_thresholds(docs, _TOKEN_BUDGETS, group_col="source")
    stage = _stage_dir("tbs_stream", sf_dir)
    docs.write.mode("overwrite").parquet(stage)
    stream = _spread_stream(spark.readStream.schema(docs.schema).parquet(stage))
    tbl = _run_stream_to_table(
        stream_token_budget_sample(stream, thresholds), "tbs_stream"
    )
    return spark.table(tbl).select("doc_id", "source", "n_tokens")


def docs_curation_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING curation funnel (r17 verdict #6: the r17
    dropDuplicatesWithinWatermark rework lived only in unit-tested
    operators — this puts the bounded-state dedup composition under
    the driver's eye): quality scoring + language ID as stateless
    row-local expressions, exact content dedup through Structured
    Streaming's native ``dropDuplicatesWithinWatermark`` on the md5
    content hash (state is O(in-flight hashes) and EVICTED past the
    watermark — the r17 fix; the pre-r17 ``dropDuplicates`` kept one
    state row per distinct hash forever), then the deterministic
    md5 hash-sample. Emitted CONTENT-KEYED — ``(content_hash,
    quality_score)``, every column a pure function of the text — so
    the result is identical whichever duplicate-text arrival the
    dedup keeps first (arrival order within a micro-batch is not
    deterministic; doc_id-keyed output would only be reproducible on
    a duplicate-free corpus). Event time is synthesized from doc_id
    (timestamp_millis) — any per-doc timestamp serves; an
    availableNow drain is never late against its own watermark. The
    near-dup stage is deliberately absent (a connected component is a
    global property of the pair graph — at scale it runs as periodic
    batch compaction over this streamed survivor table); the DuckDB
    oracle replays score → filter → distinct-text → hash-sample
    exactly (streaming/pipeline.stream_curation)."""
    from jagular_spark.streaming.pipeline import stream_curation

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("event_time", F.timestamp_millis(F.col("doc_id")))
    )
    stage = _stage_dir("curation_stream", sf_dir)
    docs.write.mode("overwrite").parquet(stage)
    stream = _spread_stream(spark.readStream.schema(docs.schema).parquet(stage))
    tbl = _run_stream_to_table(
        stream_curation(stream, "event_time", content_keyed=True),
        "curation_stream",
        shuffle_partitions=8,
    )
    return spark.table(tbl).select("content_hash", "quality_score")


def docs_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-count quantiles (p50/p90/p99) per (language,
    stopword-density decile) via rank-index selection over a
    (n_tokens, doc_id) sort — deterministic discrete quantiles, unlike
    interpolating percentile built-ins whose float semantics differ
    across engines. One shuffle (window partition by stratum) + one
    map-side-combined aggregate."""
    docs = load(spark, sf_dir, "documents")
    n_col = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    base = txt.language_id(docs.withColumn("n_tokens", n_col), keep=("n_tokens",))
    # second stratum: stopword-density decile — an integer from one
    # deterministic double chain on the post-barrier s_en attribute
    # (low-stopword bands ≈ low-quality docs in curation pipelines)
    base = base.withColumn("stop_dec", F.floor(F.col("s_en") * F.lit(10.0)).cast("long"))
    w = Window.partitionBy("pred_lang", "stop_dec").orderBy("n_tokens", "doc_id")
    ranked = base.select(
        "pred_lang",
        "stop_dec",
        "n_tokens",
        (F.row_number().over(w) - 1).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("pred_lang", "stop_dec")).alias("cnt"),
    )

    def q_at(q: float) -> F.Column:
        idx = F.floor((F.col("cnt") - 1) * F.lit(q)).cast("long")
        return F.max(F.when(F.col("rn") == idx, F.col("n_tokens")))

    return ranked.groupBy("pred_lang", "stop_dec").agg(
        F.count(F.lit(1)).alias("n_docs"),
        q_at(0.5).alias("p50_tokens"),
        q_at(0.9).alias("p90_tokens"),
        q_at(0.99).alias("p99_tokens"),
    )


# Pearson r expression shared verbatim with the DuckDB oracle — lives
# beside the operator (operators/filtering.XCORR_CORR_SQL).
from jagular_spark.operators.filtering import XCORR_CORR_SQL as _XCORR_CORR  # noqa: E402


def events_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-channel lag correlation (multi-electrode coupling audit):
    Pearson r between every channel pair of a 4-channel subset at lags
    −2..+2 samples. The pair alignment is an EQUI-join on the shifted
    sample index (t_plus = t + lag precomputed on the exploded probe
    side — a hash join, not a theta join); all five moments accumulate
    in exact BIGINT quanta (floor(value·10³)); the only float step is
    the final shared correlation expression."""
    from jagular_spark.operators.filtering import lag_correlation

    s = _rn_samples(spark, sf_dir, max_channel=4).select(
        F.col("channel_id").alias("ch"),
        F.col("ts").alias("t"),
        F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("iv"),
    )
    return lag_correlation(s, max_lag=2)


def events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-channel outlier clipping (winsorize to the exact
    [p01, p99] band): artifact rejection for recordings / heavy-tail
    clamping for feature columns. The quantiles are DISCRETE
    rank-selected order statistics (deterministic ties via (us,
    event_id)), computed as window aggregates over the SAME partition
    the rank sort uses — one shuffle total, no quantile-table join back;
    the clip itself is pure comparison/selection (no float arithmetic),
    so the result hash-matches trivially. Operator:
    operators/filtering.winsorize (shared with the hypothesis property
    test, so the driver query and the numpy-checked band are the SAME
    code path)."""
    from jagular_spark.operators.filtering import winsorize

    ev = _events_us(spark, sf_dir).select("user_id", "event_id", "us", "value")
    return winsorize(
        ev,
        value_col="value",
        partition_cols=("user_id",),
        order_cols=("us", "event_id"),
    )


def events_winsorize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_winsorize on the SCALE-SAFE physical plan: quantile
    selection over the per-channel value HISTOGRAM (groupBy with
    map-side combine → cumulative count over distinct values →
    broadcast quantile table back) instead of ranking each channel's
    full row stream in one window task. Same rank-selected [p01, p99]
    band — the order-statistic value is tiebreak-invariant — so this
    shares events_winsorize's exact value-hash oracle. Operator:
    operators/filtering.winsorize_chunked."""
    from jagular_spark.operators.filtering import winsorize_chunked

    ev = _events_us(spark, sf_dir).select("user_id", "event_id", "us", "value")
    return winsorize_chunked(ev, value_col="value", partition_cols=("user_id",))


# ---------------------------------------------------------------------------
# Streaming twins executed FOR the driver: a one-shot availableNow pass
# through Structured Streaming whose output hash-matches a batch oracle,
# so the driver's correctness gate exercises streaming execution (state
# store, memory sink, watermark emission), not just the batch planner.
# ---------------------------------------------------------------------------

_STREAM_SEQ = [0]
_STREAM_TBL: dict[str, str] = {}

# One staging directory per (prefix, sf_dir) per session — overwritten
# on re-invocation instead of leaking a fresh mkdtemp full of table
# copies per bench/driver run; removed at interpreter exit.
_STAGE_DIRS: dict[tuple[str, str], str] = {}


def _spread_stream(stream: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Session-width exchange on a file-source STREAM before heavy
    row-local work (r18, the streaming face of selection._spread): the
    staged corpus at probe scale is one parquet file, and a one-file
    micro-batch runs the ENTIRE map side — gram/window md5 hashing,
    minhash signatures, quality scoring — in a single task (profiled:
    6.7 s single-task CPU on docs_substring_dedup_streamed's hash
    stage). Writing the stage wider does not help: the file source
    packs small files ~32-per-split via openCostInBytes, so the only
    reliable spread is an in-plan exchange. Stateless, deterministic
    hash partitioning; every downstream kernel is arrival-order-safe
    (internal sorts / set-semantics outputs), so outputs are
    bit-identical — the shared batch oracles pin it. At 100 TB the
    source is thousands of files per batch and a deployment drops
    this (or keeps it — one narrow exchange of the text)."""
    from jagular_spark.session import shuffle_width

    return stream.repartition(shuffle_width(stream.sparkSession), F.col(id_col))


def _stage_dir(prefix: str, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    key = (prefix, sf_dir)
    if key not in _STAGE_DIRS:
        d = tempfile.mkdtemp(prefix=f"jgs_{prefix}_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _STAGE_DIRS[key] = d
    return _STAGE_DIRS[key]


def _run_stream_to_table(
    sdf: DataFrame, prefix: str, shuffle_partitions: int | None = None
) -> str:
    """Run a streaming DataFrame to completion under availableNow into a
    uniquely named memory-sink table; return the table name. Unique
    names keep repeated driver/bench invocations independent; the
    PREVIOUS invocation's sink table for the same prefix is dropped so
    repeated runs don't accumulate full result copies in driver
    memory.

    ``shuffle_partitions`` narrows the STREAM's shuffle width (the
    session conf is snapshotted into the query's cloned session at
    ``start()`` and restored immediately after): a stateful streaming
    query materializes one state-store instance per shuffle partition
    per micro-batch — delta file + CRC + commit under the checkpoint —
    so at probe scale the fixed per-store I/O dominates the drain.
    Measured r14 on docs_lsh_candidates_streamed at sf0.1: drain 4.6 s
    at 32 partitions vs 2.3-2.8 s at 8, identical output (keyed state
    is partitioning-invariant; the oracles pin it). On a 100 TB cluster
    this knob rises with executor count exactly like the session width
    — it exists because a 32-way local probe is OVER-partitioned for a
    256-bucket state layout, not to cap cluster parallelism."""
    spark = sdf.sparkSession
    if prefix in _STREAM_TBL:
        spark.catalog.dropTempView(_STREAM_TBL[prefix])
    _STREAM_SEQ[0] += 1
    name = f"{prefix}_{_STREAM_SEQ[0]}"
    _STREAM_TBL[prefix] = name
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_width)
    # awaitTermination returns False on timeout with the query STILL
    # RUNNING — returning then would read a partial memory-sink table
    # and silently produce wrong results; fail loudly instead.
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError(f"stream {name} did not finish within 300s")
    return name


def _stream_events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file-source STREAM with the same ``us``
    (unix-microsecond BIGINT) column the batch queries use — schema
    comes from a batch read, the nanos/micros encoding dispatch from
    the shared ``_us`` helper."""
    batch = load(spark, sf_dir, "events")
    # the file stream source requires a DIRECTORY; select the single
    # events file out of the sf dir with a glob filter
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("us", _us(stream))


def events_sessionize_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_sessionize through Structured Streaming: session_window +
    watermark (streaming/pipeline.stream_sessionize), one availableNow
    pass, memory sink. Append mode emits exactly the sessions CLOSED by
    the final watermark — with delay 0 that is every session whose last
    event precedes the global max event time by >= the 30-min gap, a
    deterministic subset the DuckDB oracle reproduces with a
    max-over-table filter on the batch islands. Still-open tail
    sessions stay in the state store (the streaming-correct behavior:
    they are not yet complete)."""
    from jagular_spark.streaming.pipeline import stream_sessionize

    ev = _stream_events_us(spark, sf_dir).select(
        "user_id", "event_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    out = stream_sessionize(ev, gap="30 minutes", watermark="0 seconds")
    tbl = _run_stream_to_table(
        out.select(
            F.col("user_id"),
            F.unix_micros("session_start").alias("session_start_us"),
            F.unix_micros("last_event").alias("session_end_us"),
            F.col("n_events").cast("long").alias("n_events"),
        ),
        "sessionize_stream",
        shuffle_partitions=8,
    )
    return spark.table(tbl)


def events_censor_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming censor for the driver: threshold exceedances
    (value > 150) per user, dead-time suppressed with a carried
    ``last_kept`` GroupState (streaming/pipeline.stream_censor — the
    reference's sequential censor loop, jagular/spikes.py:334-336, as
    applyInPandasWithState). Append emission is complete (no watermark
    holdback), so the oracle is the exact batch censor: a greedy
    recursive CTE over the DISTINCT exceedance times. No explicit
    streaming dedup is needed — the kernel itself collapses duplicate
    timestamps (a duplicate of a kept edge sits at distance 0, inside
    the dead window; a duplicate of a censored edge is censored for the
    same reason the original was), so censor(raw) == censor(distinct).
    Dead-time width: 24 hours of event time (the exceedance stream is
    sparse — minutes-to-days between hits — so a day-scale dead window
    is what actually exercises the suppression path)."""
    from jagular_spark.streaming.pipeline import stream_censor, stream_crossings

    ev = _stream_events_us(spark, sf_dir).select("user_id", "us", "value")
    x = stream_crossings(ev, threshold=150.0).select("user_id", "us")
    out = stream_censor(
        x, width=24 * 3600 * 1_000_000, ts_col="us", partition_cols=("user_id",)
    )
    tbl = _run_stream_to_table(
        out.select(F.col("user_id").cast("long").alias("user_id"), F.col("us")),
        "censor_stream",
        shuffle_partitions=8,
    )
    return spark.table(tbl)


def events_interpolate_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_interpolate through the STREAMING kernel: the deduped
    per-minute base is staged to a temp directory, re-read as a file
    stream, and gap-filled by stream_interpolate's GroupState kernel
    (the reference's cross-block carry, jagular/utils.py:443-446, as
    applyInPandasWithState). Emission is complete, so the oracle is
    identical to the batch query's — the driver hash proves the
    streaming execution path computes the exact batch result."""
    from jagular_spark.streaming.pipeline import stream_interpolate

    ev = _events_us(spark, sf_dir)
    base = dedup_keep_first(
        ev.withColumn("minute", F.expr("CAST(us DIV 60000000 AS BIGINT)")),
        ts_col="minute",
        tiebreak_cols=["us", "event_id"],
        partition_cols=["user_id"],
    ).select("user_id", "minute", "value")
    stage_dir = _stage_dir("interp_stream", sf_dir)
    base.write.mode("overwrite").parquet(stage_dir)
    stream = spark.readStream.schema(base.schema).parquet(stage_dir)
    out = stream_interpolate(
        stream,
        max_gap_size=5,
        ts_col="minute",
        value_cols=("value",),
        partition_cols=("user_id",),
    )
    tbl = _run_stream_to_table(
        out.select("user_id", "minute", "value"), "interp_stream",
        shuffle_partitions=8,
    )
    return spark.table(tbl)


def orders_bucketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located-join machinery (sources/bucketed.py) end-to-end
    FOR the driver: orders and lineitem are written as bucket-sorted
    external tables on the same key/count, re-read through the catalog,
    joined — both Exchanges elided straight off the scans (plan pinned
    in tests/test_skew_bucketing.py) — and revenue-aggregated by order
    status. The oracle is the plain join on the raw parquet, proving
    the bucketed layout changes the PLAN, never the result. This is the
    'pre-partition the fact tables once at ingest, join for free
    forever' 100-TB pattern."""
    import hashlib

    from jagular_spark.sources.bucketed import read_table, write_bucketed_table

    # fixed table names per sf_dir + overwrite: repeated runs replace
    # the bucketed copies instead of accumulating catalog entries
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    stage = _stage_dir("buckets", sf_dir)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    t_o, t_l = f"jgs_orders_b{tag}", f"jgs_lineitem_b{tag}"
    write_bucketed_table(orders, t_o, ["o_orderkey"], path=f"{stage}/orders")
    write_bucketed_table(li, t_l, ["l_orderkey"], path=f"{stage}/lineitem")
    return (
        read_table(spark, t_o)
        .join(read_table(spark, t_l), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            _disc_price_sum().alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


def docs_lsh_candidates_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful STREAMING MinHash-LSH candidate generation for the
    driver (streaming/pipeline.stream_lsh_candidate_pairs): per
    arriving doc, the row-local (shuffle-free) signature bands into
    bucket keys whose member lists live in GroupState — each arrival
    pairs against every earlier member, one emission per shared band.
    A one-shot availableNow pass emits every in-bucket pair exactly
    once per band, so the per-pair band count aggregated from the
    memory sink equals the batch operator's n_bands — the query shares
    docs_minhash_lsh's oracle verbatim.

    r14 attribution of the r13 driver reading (5.4 -> 15.0 s
    driver-to-driver, code untouched; committed clean run 3.17 s).
    Isolated staged timing at sf0.1, fresh process, 32 cores:

    =====================  ======  ======  ======  =====  =====
    stage                  cold    warm2   warm3   sp=8   sp=8
    =====================  ======  ======  ======  =====  =====
    stage write (parquet)  2.27    0.41    0.42    0.28   0.32
    stream start           1.42    0.59    0.45    0.43   0.28
    availableNow drain     7.78    4.95    4.56    2.84   2.33
    sink aggregate         0.74    0.34    0.40    0.22   0.25
    total                  12.21   6.30    5.83    3.77   3.17
    =====================  ======  ======  ======  =====  =====

    Three stacked causes: (a) ~6 s ONE-TIME cost on the first stateful
    streaming execution in a process (engine + state-store provider +
    stateful-worker init) — in both r12 and r13 registry orders this
    query is the first stateful stream, and bench.py now absorbs the
    cost with an untimed pre-warm drain; (b) per-run fixed cost scales
    with state-store count (one store per shuffle partition per batch:
    drain 4.6 s at 32 partitions vs 2.3 s at 8 on a 256-bucket state
    layout) — fixed by shuffle_partitions=8 below; (c) the r13 driver
    host ran this query under 10-16% CPU steal (run2/run3 carried
    8642/5585 steal ticks in its env block), which hits the
    store-commit fsync path superlinearly. The committed-vs-driver gap
    also had a systematic half: r13's committed numbers came from a
    contamination-rejected pass2 (everything warm) while the driver ran
    a single cold pass1 — the pre-warm closes exactly that asymmetry.
    """
    from jagular_spark.streaming.pipeline import stream_lsh_candidate_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    stage = _stage_dir("lsh_stream", sf_dir)
    docs.write.mode("overwrite").parquet(stage)
    stream = _spread_stream(spark.readStream.schema(docs.schema).parquet(stage))
    tbl = _run_stream_to_table(
        stream_lsh_candidate_pairs(stream), "lsh_stream", shuffle_partitions=8
    )
    return (
        spark.table(tbl)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"))
    )


def docs_substring_dedup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of docs_substring_dedup: arriving docs explode
    into per-hash window occurrences; GroupState buffers a hash's first
    occurrence and emits retroactively when the hash turns duplicate
    (streaming/pipeline.stream_dup_kgram_marks). One availableNow pass
    emits exactly the batch operator's duplicated-window marks, and the
    gaps-and-islands span merge runs as a batch aggregate over the
    memory sink — so the query shares docs_substring_dedup's oracle
    verbatim."""
    from jagular_spark.streaming.pipeline import stream_dup_kgram_marks

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    stage = _stage_dir("ssd_stream", sf_dir)
    docs.write.mode("overwrite").parquet(stage)
    stream = _spread_stream(spark.readStream.schema(docs.schema).parquet(stage))
    tbl = _run_stream_to_table(
        stream_dup_kgram_marks(stream, k=8), "ssd_stream", shuffle_partitions=8
    )
    from pyspark.sql import Window

    marked = spark.table(tbl)
    grp = F.col("pos") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    return (
        marked.withColumn("__grp__", grp)
        .groupBy("doc_id", "__grp__")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(8)).cast("long").alias("span_len"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_len", "n_windows")
    )


def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (the canonical timeseries enrichment Spark
    lacks natively): every 'view' event gets the most recent preceding
    'purchase' per user. Implemented as a tagged union + one window
    carry — a single shuffle, no join node (operators/asof.py); the
    oracle is DuckDB's NATIVE ASOF LEFT JOIN, cross-validating the
    window formulation against an independent implementation."""
    from jagular_spark.operators.asof import asof_join

    ev = _events_us(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "us", F.col("event_id").alias("view_id"), "value"
    )
    w = Window.partitionBy("user_id", "us").orderBy("event_id")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .select("user_id", "us", "value")
    )
    out = asof_join(
        views, purchases, on=["user_id"], ts_col="us", right_cols=("value",), suffix="_p"
    )
    return out.select(
        "user_id",
        F.col("us").alias("view_us"),
        "view_id",
        F.col("us_p").alias("purchase_us"),
        F.col("value_p").alias("purchase_value"),
    )


def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-direction-complete as-of: every view matched to the
    NEAREST purchase in time (backward on exact ties, like
    merge_asof). Same single-shuffle tagged union, both carries over
    one exchange; the oracle composes DuckDB's native backward and
    forward ASOF joins and picks the closer — two independent
    implementations of the same semantics."""
    from jagular_spark.operators.asof import asof_join

    ev = _events_us(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "us", F.col("event_id").alias("view_id"), "value"
    )
    w = Window.partitionBy("user_id", "us").orderBy("event_id")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .select("user_id", "us", "value")
    )
    out = asof_join(
        views, purchases, on=["user_id"], ts_col="us",
        right_cols=("value",), suffix="_p", direction="nearest",
    )
    return out.select(
        "user_id",
        F.col("us").alias("view_us"),
        "view_id",
        F.col("us_p").alias("purchase_us"),
        F.col("value_p").alias("purchase_value"),
    )


def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline a training-data user actually
    runs, as one composed query: quality-score filter → language filter
    → exact dedup (md5 canonical) → near-dup removal (jaccard ≥ 0.5
    connected components, keep cluster minimum) → deterministic 50 %
    hash sample. Every stage is an operator that is individually
    hash-verified elsewhere; this query verifies their COMPOSITION
    (stage ordering, survivor-set threading) against one DuckDB oracle
    that replays the whole funnel."""
    docs = load(spark, sf_dir, "documents")
    return _curation_funnel(docs)


def docs_curation_funnel_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel with the Lee-et-al substring-dedup SURGERY stage in
    front — the full "clean corpus out" pipeline: detect repeated
    8-token windows corpus-wide, cut every occurrence except the
    corpus-minimum canonical one (keep_first), drop documents the
    surgery emptied, then run the whole curation funnel (quality →
    language → exact dedup → LSH near-dup closure → 50% hash sample)
    over the CUT text. Emits the surviving documents WITH their
    cleaned text — what a training pipeline would actually shard.
    Every stage is individually hash-verified elsewhere; this query
    pins the composition, including that quality/language/dedup
    decisions are made on post-surgery text, not the raw corpus."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    spans = txt.repeated_kgram_spans(docs, k=8, min_count=2, keep_first=True)
    cleaned = (
        txt.cut_spans(docs, spans.select("doc_id", "span_start", "span_len"))
        .where(F.length("clean_text") > 0)
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    return _curation_funnel(cleaned, with_text=True)


def _curation_funnel(
    docs: DataFrame, with_text: bool = False, stage_dir: str | None = None
) -> DataFrame:
    """Shared funnel body (see docs_curation_funnel): ``docs`` is any
    (doc_id, text) corpus — raw documents for v1, the keep-first
    substring-cut corpus for v2.

    ``stage_dir`` is the warehouse fault-tolerance mode SCALE.md
    prescribes: the post-filter survivor set (which feeds BOTH the
    pair-generation branch and the final join) is STAGED TO PARQUET
    there and read back, instead of the default lazy
    ``localCheckpoint`` — checkpoint blocks are lineage-truncated, so
    an executor loss mid-funnel forfeits them and fails the job, while
    a parquet stage survives any executor churn and is re-readable by
    retries. Identical results by construction (pinned in
    tests/test_workload_extensions.py); the default stays checkpoint
    for the single-host harness where re-execution is cheaper than
    I/O."""
    from jagular_spark.operators.graph import dedup_clusters
    from jagular_spark.operators.sampling import hash_sample
    scored = txt.language_id(
        docs.withColumn("quality_score", txt.quality_score_col("text")),
        keep=("text", "quality_score"),
    )
    s1 = scored.where(
        (F.col("quality_score") >= F.lit(0.6)) & (F.col("pred_lang") == "en")
    ).select("doc_id", "text", "quality_score")

    # exact dedup: keep the min doc_id per identical text
    w_txt = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    s2 = (
        s1.withColumn("__min_id__", F.min("doc_id").over(w_txt))
        .where(F.col("doc_id") == F.col("__min_id__"))
        .drop("__min_id__")
    )
    # s2 feeds pair generation AND the final survivor join — materialize
    # the (small) post-filter working set once instead of re-running the
    # scoring+dedup lineage per consumer (standard practice: persist the
    # survivor set between curation stages).
    if stage_dir is not None:
        s2.write.mode("overwrite").parquet(stage_dir)
        s2 = docs.sparkSession.read.parquet(stage_dir)
    else:
        s2 = s2.localCheckpoint(eager=False)

    # near-dup removal over the SURVIVORS only (stage threading matters).
    # LSH-first: banded candidates + exact-Jaccard verify — the
    # sub-quadratic 100-TB composition (the all-bucket exact operator
    # stays the verification baseline under docs_ngram_jaccard).
    pairs = sim.ngram_jaccard_pairs_lsh(s2, min_jaccard=0.5)
    kept = (
        dedup_clusters(s2.select("doc_id"), pairs)
        .where(F.col("is_canonical"))
        .select("doc_id")
    )
    s3 = s2.join(kept, "doc_id")

    sampled = hash_sample(s3, "doc_id", 0.5)
    if with_text:
        return sampled.select(
            "doc_id", F.col("text").alias("clean_text"), "quality_score"
        )
    return sampled.select("doc_id", "quality_score")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking, adapted: the slim
    lineitem has no commit/receipt dates, so 'late' = shipped more than
    90 days after the order date): a LEFT SEMI join — Catalyst's EXISTS
    — from a quarter of orders into lineitem on (key, late-predicate),
    then a tiny priority count. The semi join dedups on the stream side
    (no row multiplication however many lines match)."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (bilateral trade volume): supplier-nation ↔
    customer-nation revenue by ship year for the NATION_1/NATION_2
    pair, either direction. Five joins — the two nation dims broadcast
    under distinct aliases, the symmetric pair predicate sits on the
    joined row (Catalyst pushes each alias's IN-list into its own dim
    scan), revenue split-summed quanta per (supp, cust, year) group."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_disc_price_sum().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): for orders shipped to
    region-0 customers, NATION_1 suppliers' share of revenue per order
    year — a ratio of two split-summed quanta revenues per year group
    (numerator conditionally zeroed, single final division — the q14
    exactness pattern under a GROUP BY). Six-table join; both nation
    dims and region prune broadcast-side."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    cn = nation.where(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").alias("cn_key")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nat_q = (
        f"CASE WHEN supp_nation = 'NATION_1' THEN {_DISC_PRICE_QUANTA} "
        f"ELSE CAST(0 AS BIGINT) END"
    )
    hi_n = F.sum(F.expr(f"({nat_q}) DIV 2147483648"))
    lo_n = F.sum(F.expr(f"({nat_q}) % 2147483648"))
    hi_a = F.sum(F.expr(f"({_DISC_PRICE_QUANTA}) DIV 2147483648"))
    lo_a = F.sum(F.expr(f"({_DISC_PRICE_QUANTA}) % 2147483648"))
    nat = (hi_n.cast("double") * F.lit(2147483648.0) + lo_n.cast("double")) / F.lit(1e8)
    allr = (hi_a.cast("double") * F.lit(2147483648.0) + lo_a.cast("double")) / F.lit(1e8)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((nat / allr).alias("mkt_share"), F.count(F.lit(1)).cast("long").alias("n_lines"))
        .orderBy("o_year")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, then
    the WHERE total = (SELECT MAX(...)) — computed as an aggregate
    joined to its own 1-row max, compared on the EXACT BIGINT quanta
    total (never on a float). Per-supplier quarterly quanta stay well
    under 2^63 (~1e15 at sf100); the global split-sum pattern applies
    above that. AQE broadcasts the 1-row max side."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(F.expr(_DISC_PRICE_QUANTA)).cast("long").alias("total_q")
    )
    mx = rev.agg(F.max("total_q").alias("max_q"))
    return (
        rev.join(F.broadcast(mx), F.col("total_q") == F.col("max_q"))
        .join(supp, F.col("sk") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_q").cast("double") / F.lit(1e8)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q12_shipping_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classes; the slim schema
    has no l_shipmode, so classes group by l_linestatus): one year of
    lineitem joins orders, conditional CASE aggregation splits counts
    into critical (1-URGENT/2-HIGH) vs other priority. Counts only —
    exact on both engines."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = load(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): customer LEFT
    OUTER JOIN orders, per-customer order count, then the count-of-
    counts histogram. Two shuffles (join + first groupBy); the second
    groupBy input is O(customers) and the histogram O(distinct counts).
    Pure counts — exact."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitem rows
    whose quantity is below 20% of their part's average quantity. The
    correlated AVG subquery becomes a per-part aggregate joined back
    (AQE broadcasts the O(parts) agg side); the 0.2·avg comparison is
    the INTEGER cross-multiplication 5·qty·n_l < sum_qty — no float
    threshold, so cross-engine parity is exact. Output: one row, the
    quanta-summed extendedprice of qualifying lines divided by 7.0
    (single final float op)."""
    li = load(spark, sf_dir, "lineitem")
    brand = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("long").alias("sum_qty"),
        F.count(F.lit(1)).cast("long").alias("n_l"),
    )
    qual = (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .where(
            F.col("l_quantity").cast("bigint") * F.lit(5) * F.col("n_l")
            < F.col("sum_qty")
        )
    )
    total = qual.agg(
        F.sum(F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"))
        .cast("long")
        .alias("q")
    )
    return total.select(
        (F.col("q").cast("double") / F.lit(10000.0) / F.lit(7.0)).alias("avg_yearly")
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under an OR-of-ANDs
    predicate): lineitem joins the broadcast part dim; the three
    brand/size/quantity disjuncts sit in the join condition, where
    Catalyst pushes the common l_quantity bound to the scan. Revenue is
    the shared split-sum quanta expression."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(cond).agg(_disc_price_sum().alias("revenue"))


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (prospective customers who never ordered): the
    scalar AVG subquery becomes a broadcast 1-row aggregate, the NOT
    EXISTS a LEFT ANTI join, grouped by market segment. This synthetic
    data has no order-less customers at all, so the anti-join side is
    the URGENT-priority orders — 'prospects with a balance but no
    urgent order' — which leaves a real surviving population. The
    above-average-balance test is the integer cross-multiplication
    quanta(bal)·n > total_quanta (exact); the output balance sum is
    quanta-summed with one final division."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bal_q = "CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    pos = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.expr(bal_q)).cast("long").alias("tot_q"),
        F.count(F.lit(1)).cast("long").alias("n_pos"),
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .crossJoin(F.broadcast(pos))
        .where(F.expr(bal_q) * F.col("n_pos") > F.col("tot_q"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            (F.sum(F.expr(bal_q)).cast("long").cast("double") / F.lit(10000.0)).alias(
                "totacctbal"
            ),
        )
        .orderBy("c_mktsegment")
    )


def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier, adapted: the synthetic
    schema has no partsupp, so 'cost' is the supplier's average sale
    price of the part from lineitem). For size-15 parts, keep the
    REGION-0 supplier(s) whose average price for that part equals the
    minimum among region-0 suppliers — like the original, the region
    scopes the candidate set BEFORE the correlated MIN, which becomes a
    per-part aggregate joined back. The average is the division of two
    exact BIGINTs (fp4 price quanta / line count): one IEEE double op,
    the identical expression tree in the oracle, so the min-equality
    compare is cross-engine exact.

    r8→r9 drift attribution (0.99 → 1.98 s across the two r8 local
    sweeps, code unchanged): measured r9 in ONE warm process at sf0.1,
    6 consecutive reps: 5.69 (cold plan), 2.56, 2.28, 1.62, 1.26,
    1.25 s — the sweep measurements sit inside this warm-up/steal-tick
    envelope on the shared-VM host (same conclusion as the r7 driver
    rerun, which saw q2 swing 3.7 → 2.4 s). Plan unchanged: dims
    broadcast, one lineitem shuffle, min-table broadcast back."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_size") == 15)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    scoped_supp = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(scoped_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(
            (
                F.sum(_fp4("l_extendedprice")).cast("long").cast("double")
                / F.count(F.lit(1)).cast("long").cast("double")
            ).alias("avg_price")
        )
    )
    mn = ps.groupBy(F.col("l_partkey").alias("mpk")).agg(
        F.min("avg_price").alias("min_price")
    )
    return (
        ps.join(
            F.broadcast(mn),
            (ps.l_partkey == F.col("mpk")) & (ps.avg_price == F.col("min_price")),
        )
        .join(supp, ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            (F.col("avg_price") / F.lit(10000.0)).alias("supply_price"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year, adapted:
    no partsupp → profit is the discounted revenue, not revenue minus
    supply cost). Five-table join over red-named parts, grouped by
    supplier nation and order year, split-summed quanta revenue."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_disc_price_sum().alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock, adapted: part 'value' is its
    total sales by NATION_1 suppliers from lineitem, not partsupp
    stock value). Keep parts whose value exceeds 0.01% of the nation's
    total — the scalar HAVING subquery is a broadcast 1-row aggregate,
    the threshold compare is integer cross-multiplication
    value_q · 10000 > total_q (no float threshold).

    r8→r9 drift attribution (0.72 → 1.54 s across the two r8 local
    sweeps, code unchanged): measured r9 in ONE warm process at sf0.1,
    6 consecutive reps: 1.28 (cold plan), 0.92, 0.85, 0.84, 0.92,
    0.93 s — warm runtime is stably ≤ 0.95 s; both sweep values are
    the plan-compile/steal-tick envelope, not a regression."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    scoped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(_fp4("l_extendedprice")).cast("long").alias("value_q")
    )
    tot = per_part.agg(F.sum("value_q").cast("long").alias("tot_q"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(F.col("value_q") * F.lit(10000) > F.col("tot_q"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_q").cast("double") / F.lit(10000.0)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier count by part attributes): for parts
    outside Brand#1 / non-PROMO / sizes {1, 15, 23}, count DISTINCT
    suppliers from the lineitem part-supplier pairs, excluding
    'complaint' suppliers (adapted proxy: negative account balance —
    the schema has no comment column). The NOT IN subquery is a LEFT
    ANTI join; the distinct count is exact."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 15, 23))
    )
    bad = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_sk")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == F.col("bad_sk"), "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock suppliers, adapted: no partsupp
    availqty, so the correlated-quantity test inverts to DOMINANCE — a
    supplier qualifies if for some blue-named part it shipped MORE than
    a quarter of that part's total 1995-1996 volume; with ~25 suppliers
    per part the half-share original is vacuous on this data). The
    nested IN chain is two semi-joins; the share compare is the integer
    cross-multiplication 4·qty_ps > qty_p."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%blue%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    scoped = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    ps = scoped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("long").alias("qty_ps")
    )
    pt = scoped.groupBy(F.col("l_partkey").alias("tpk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("long").alias("qty_p")
    )
    dominant = (
        ps.join(F.broadcast(pt), ps.l_partkey == F.col("tpk"))
        .where(F.col("qty_ps") * F.lit(4) > F.col("qty_p"))
        .select(F.col("l_suppkey").alias("dom_sk"))
        .distinct()
    )
    return (
        supp.join(dominant, supp.s_suppkey == F.col("dom_sk"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted: no
    commit/receipt dates, so the 'late' line proxy is l_returnflag =
    'R'). For finished (status F) multi-supplier orders, count per
    NATION_3 supplier the orders where it was the ONLY supplier with a
    flagged line — EXISTS(another supplier's line) as a semi-join on
    the distinct-supplier order set, NOT EXISTS(another supplier's
    flagged line) as an anti-join."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # EXISTS: some line of the order from a DIFFERENT supplier
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    ).distinct()
    # NOT EXISTS: a flagged line from a DIFFERENT supplier
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    ).distinct()
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def events_sortedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (sortedness check, provenance semantics) through the driver:
    per user, does event time run monotonically in event_id (arrival)
    order? Inversion counts via one LAG window + map-side-combined
    aggregate (operators/timestamps.sortedness_stats — the reporting
    twin of is_sorted's boundary-row global check; reference
    ``jagular/utils.py`` sanitize/sortedness intent). The fixture's
    event_id order IS time order (zero inversions — a degenerate
    audit), so the query audits a deterministic synthetic provenance
    instead: arrival reversed within each hour, as when per-hour files
    are read tail-first — real inversions for the count to find."""
    from jagular_spark.operators.timestamps import sortedness_stats

    ev = _events_us(spark, sf_dir).withColumn(
        "prov",
        F.expr("CAST(us DIV 3600000000 AS BIGINT) * 1000000 - event_id"),
    )
    return sortedness_stats(
        ev, ts_col="us", order_cols=["prov"], partition_cols=["user_id"]
    ).select("user_id", "n_rows", "n_inversions", "is_sorted")


def events_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame analytics (the rolling-baseline subtraction shape
    signal pipelines run constantly): per-channel centered ±5-row
    rolling sum/count/min/max of the milli-quantized value — one window
    shuffle, every aggregate exact BIGINT. ROWS framing (not RANGE) so
    ties cannot differ between engines."""
    ev = _events_us(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-5, 5)
    )
    iv = F.expr("CAST(floor(value * 1000) AS BIGINT)")
    return ev.select(
        "user_id",
        "event_id",
        "us",
        iv.alias("iv"),
        F.count(F.lit(1)).over(w).cast("long").alias("win_n"),
        F.sum(iv).over(w).cast("long").alias("win_sum"),
        F.min(iv).over(w).cast("long").alias("win_min"),
        F.max(iv).over(w).cast("long").alias("win_max"),
    )


def docs_survivor_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation shapes (INTERSECT ⇒ left-semi distinct, EXCEPT ⇒
    left-anti distinct in Catalyst): documents passing the quality gate
    INTERSECT those passing the repetition gate, EXCEPT the
    decontamination-flagged set — the id-algebra form of a curation
    pipeline where each gate is produced by a different job. Gates
    reuse the exact driver-verified gate queries, so this also checks
    their composability."""
    good = (
        docs_quality(spark, sf_dir)
        .where(F.col("quality_score") >= 0.6)
        .select("doc_id")
    )
    unrep = (
        docs_repetition(spark, sf_dir)
        .where(~F.col("is_repetitive"))
        .select("doc_id")
    )
    flagged = (
        docs_decontaminate(spark, sf_dir)
        .where(F.col("contaminated"))
        .select("doc_id")
    )
    return good.intersect(unrep).exceptAll(flagged).orderBy("doc_id")


def events_salted_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation machinery (operators/skew.salted_agg)
    driven end-to-end: the SAME per-user per-hour rollup as
    events_hourly_rollup, but aggregated through the two-phase salted
    path — phase 1 per (keys, content-hash salt), phase 2 merging the
    ≤ n_salts partials. Result-identical by construction (salting only
    changes the physical key distribution), so it shares
    events_hourly_rollup's oracle verbatim — the driver hash proves the
    salted plan computes exactly the plain aggregate."""
    from jagular_spark.operators.skew import salted_agg

    ev = _events_us(spark, sf_dir).select(
        "user_id",
        F.expr("CAST(us DIV 3600000000 AS BIGINT)").alias("hour_bucket"),
        F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("mv"),
    )
    out = salted_agg(
        ev,
        ["user_id", "hour_bucket"],
        {"n_events": ("count", "mv"), "sum_mv": ("sum", "mv")},
        n_salts=8,
    )
    return out.select(
        "user_id",
        "hour_bucket",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_mv").cast("long").alias("sum_mv"),
    )


def events_compacted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (sources/rec.compact_parquet — S8's
    operational sibling) driven end-to-end: the events table is first
    shattered into many tiny per-trigger-style files, compacted back
    into range-clustered files ordered by (user_id, ts), and the
    compacted copy is aggregated — sharing events_hourly_rollup's
    oracle verbatim, since compaction must never change a row."""
    from jagular_spark.sources.rec import compact_parquet

    ev = load(spark, sf_dir, "events")
    stage = _stage_dir("compact", sf_dir)
    shattered, compacted = f"{stage}/shards", f"{stage}/compacted"
    ev.repartition(64).write.mode("overwrite").parquet(shattered)
    compact_parquet(spark, shattered, compacted, target_mb=256, order_cols=["user_id"])
    back = spark.read.parquet(compacted)
    return (
        back.withColumn("us", _us(back))
        .groupBy(
            "user_id",
            F.expr("CAST(us DIV 3600000000 AS BIGINT)").alias("hour_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("CAST(floor(value * 1000) AS BIGINT)"))
            .cast("long")
            .alias("sum_mv"),
        )
    )


def events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel standard-score normalization (feature scaling for
    training pipelines / z-based artifact thresholds): exact integer
    moments via window aggregates — one shuffle, no stats join back —
    and the single float expression shared verbatim with the oracle
    (operators/filtering.zscore, same ZSCORE_SQL literal both sides)."""
    from jagular_spark.operators.filtering import zscore

    ev = _events_us(spark, sf_dir).select("user_id", "event_id", "us", "value")
    return zscore(ev, value_col="value", partition_cols=("user_id",)).select(
        "user_id", "event_id", "us", "iv", "z"
    )


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup (the continuous-aggregate
    shape time-series stores build materialized views from): per-user
    per-hour event count and milli-quantized value sum. One hash
    aggregate with map-side combine — the bucket key is arithmetic on
    the scan, so the single shuffle moves O(buckets), not O(events);
    at 100 TB this is the day-one downsampling pass. floor(value·1000)
    keeps the sum in exact BIGINT on both engines."""
    ev = _events_us(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id",
            F.expr("CAST(us DIV 3600000000 AS BIGINT)").alias("hour_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("CAST(floor(value * 1000) AS BIGINT)"))
            .cast("long")
            .alias("sum_mv"),
        )
    )


def q1_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1's aggregate over a ROLLUP lattice ((flag, status) → (flag) →
    ()): Catalyst's Expand operator feeds one hash aggregate with
    grouping-set ids — subtotals and the grand total in a single
    shuffle, no union of three scans. Counts and integral quantity
    sums only — exact. NULL group values mark the rolled-up levels on
    both engines."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("long").alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def docs_hll_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-vocabulary estimate via the engine's
    DETERMINISTIC HyperLogLog (operators/sketches.py): md5-derived
    registers, string-length-of-bin leading-bit ranks, and a
    harmonic-mean estimate whose denominator is a sum of exact binary
    fractions — so unlike builtin approx_count_distinct (engine-specific
    HLL++), the whole sketch INCLUDING the float estimate hash-matches
    the DuckDB replay. Alongside: the exact distinct count, making the
    sketch's error auditable in the same row. r15: one-pass
    formulation (hll_distinct_with_exact) — register maxima depend
    only on DISTINCT tokens, so one distinct() stage feeds both the
    sketch and the exact count; the old sketch-pass + countDistinct-
    pass + join shape scanned/exploded the corpus twice for the same
    values."""
    from jagular_spark.operators.sketches import hll_distinct_with_exact

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    return hll_distinct_with_exact(toks, "tok", ["lang"], m=64)


def docs_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter token frequencies through the engine's ALL-INTEGER
    Count-Min Sketch (operators/sketches.py): a d=4 × w=256 salted-md5
    cell table per language (bounded size regardless of corpus scale;
    map-side partial agg IS the sketch merge), probed for each
    language's exact top-5 tokens — estimate beside truth, with the
    CMS ≥ exact guarantee visible in the row. Every value BIGINT, so
    the DuckDB replay hash-matches trivially."""
    from jagular_spark.operators.sketches import cms_estimate, cms_table

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    sketch = cms_table(toks, "tok", ["lang"])
    w = Window.partitionBy("lang").orderBy(F.col("exact_n").desc(), F.col("tok").asc())
    top = (
        toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
    )
    return cms_estimate(top, sketch, "tok", ["lang"]).select(
        "lang", "tok", "rk", "exact_n", "cms_count"
    )


def docs_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination through a DETERMINISTIC Bloom filter
    (operators/sketches.bloom_bits/bloom_probe): the eval set's 8-token
    shingle hashes populate a 4096-bit sparse bitset (≤ 4096 rows
    however big the benchmark — the memory-bounded alternative to
    broadcasting the raw shingle set), train shingles probe it, and a
    doc is flagged at ≥ 2 maybe-present shingles. No false negatives —
    every exactly-contaminated doc is flagged — while the false
    positives are THEMSELVES deterministic (salted md5 bits), so the
    oracle replays the filter bit-for-bit, false positives included."""
    from jagular_spark.operators.sketches import bloom_bits, bloom_probe

    docs = load(spark, sf_dir, "documents")
    hashes = sim.doc_shingle_hashes(docs, n=8)
    ev = hashes.where(F.col("doc_id") % 50 == 0).select("h").distinct()
    bits = bloom_bits(ev, "h")
    train = (
        hashes.where(F.col("doc_id") % 50 != 0).select("doc_id", "h").distinct()
    )
    probed = bloom_probe(train, bits, "h")
    per_doc = (
        probed.where(F.col("maybe_present"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_maybe"))
    )
    return (
        docs.where(F.col("doc_id") % 50 != 0)
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_maybe", F.lit(0).cast("long")).alias("n_maybe"),
            (F.coalesce("n_maybe", F.lit(0)) >= 2).alias("bloom_flagged"),
        )
    )


def docs_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus (operators/text.redact_pii): the
    synthetic documents carry no PII, so the query first APPENDS a
    deterministic contact block (email, IPv4, dashed phone derived from
    doc_id — identical string construction in the oracle), then redacts
    and counts. All JVM-side regexp expressions, zero shuffle — the
    redaction composes with any scan."""
    from jagular_spark.operators.text import redact_pii

    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@mail"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" tel 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return redact_pii(seeded).select(
        "doc_id", "redacted", "n_emails", "n_ips", "n_phones", "was_redacted"
    )


def docs_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by integer-exact tf·idf (keyword
    extraction / relevance scoring; the idf is the monotone integer
    surrogate (N·10^6) DIV df so the ranking hash-matches DuckDB)."""
    return txt.tfidf_top(load(spark, sf_dir, "documents"))


def docs_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: corpus-fit token-bigram model,
    every doc scored by mean bigram corpus frequency (exact BIGINT sums,
    one final double division)."""
    return txt.bigram_fluency(load(spark, sf_dir, "documents"))


def docs_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style targeted selection scores (Xie et al. 2023,
    arXiv:2302.03169) under the driver oracle: every 50th document is
    the high-quality TARGET seed set, the rest are the raw pool; both
    get hashed unigram+bigram count models (4096 md5 buckets, the
    paper's feature hashing), and every raw document is scored by the
    exact-BIGINT cross-multiplied probability-difference surrogate of
    the paper's log-likelihood-ratio importance (operators/selection.py
    — the BM25-rational-idf discipline: no transcendental in the
    hash-matched path; the paper-exact log form is replayed in
    tests/test_spec_boundaries.py). Fit = two bounded aggregates
    (≤ 4096 rows collected); scoring = row-local literal-table lookup,
    zero shuffles on the corpus; the only floats are two final IEEE
    divisions."""
    from jagular_spark.operators.selection import dsir_scores

    docs = load(spark, sf_dir, "documents")
    return dsir_scores(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0),
    )


def docs_dsir_scores_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of docs_dsir_scores — the serving shape of
    targeted selection: the hashed-ngram models are fit OFFLINE on the
    target/raw snapshots (two bounded batch aggregates) and every
    arriving document is scored incrementally against the frozen
    integer delta table (streaming/pipeline.stream_dsir_scores).
    Completely STATELESS — the fit rides into the plan as a literal and
    scoring is a row-local projection, so there is no watermark and no
    state store; one availableNow pass over the staged corpus emits
    exactly the batch rows, and the query shares docs_dsir_scores'
    oracle verbatim (hash match, not rows-only)."""
    from jagular_spark.operators.selection import dsir_fit_deltas
    from jagular_spark.streaming.pipeline import stream_dsir_scores

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    raw = docs.where(F.col("doc_id") % 50 != 0)
    delta, mt, mr = dsir_fit_deltas(raw, docs.where(F.col("doc_id") % 50 == 0))
    stage = _stage_dir("dsir_stream", sf_dir)
    raw.write.mode("overwrite").parquet(stage)
    stream = _spread_stream(spark.readStream.schema(raw.schema).parquet(stage))
    tbl = _run_stream_to_table(
        stream_dsir_scores(stream, delta, mt, mr), "dsir_stream"
    )
    return spark.table(tbl)


def docs_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR selection cut: the 100 most target-like raw documents
    by (score_num DESC, doc_id ASC) — an exact-integer total order, so
    the k-boundary is engine-reproducible, and orderBy+limit plans as
    TakeOrderedAndProject (per-task heap top-k; the corpus never
    shuffles — pinned in tests/test_plans.py)."""
    from jagular_spark.operators.selection import dsir_topk

    docs = load(spark, sf_dir, "documents")
    return dsir_topk(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0),
        k=100,
    )


def docs_dsir_select_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR paper's ACTUAL pipeline, end-to-end (Xie et al. 2023
    §3: importance-resample the raw pool toward the target, THEN apply
    the standard quality/dedup cleaning to the selected subset): the
    200 most target-like raw documents by the exact-BIGINT surrogate
    importance (dsir_topk — TakeOrderedAndProject, corpus never
    shuffles) are joined back to their text via a BROADCAST of the
    200-row selection (at 100 TB the selected id-set is k rows however
    big the pool is — the join must broadcast the selection, never
    shuffle the corpus) and fed through the shared curation funnel
    (quality → language → exact dedup → LSH near-dup closure → 50 %
    hash sample). Selection-then-cleaning composition matters: the
    funnel's dedup/near-dup decisions run over the SELECTED subset
    only, exactly as the paper resamples before cleaning — and the one
    DuckDB oracle replays both halves in sequence, so the green row
    certifies the composition, not just the stages."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return _curation_funnel(_dsir_selected_docs(docs, k=200))


def _dsir_selected_docs(docs: DataFrame, k: int) -> DataFrame:
    """The selection half of docs_dsir_select_funnel, split out so its
    plan shape is pinnable in isolation (tests/test_plans.py — the
    funnel's survivor checkpoint truncates the composed explain string
    at the RDD-scan barrier, hiding everything upstream): top-k by the
    exact-integer surrogate importance, then the k-row id-set joined
    back to the corpus text as the BROADCAST side."""
    from jagular_spark.operators.selection import dsir_topk

    sel = dsir_topk(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0),
        k=k,
    ).select("doc_id")
    return docs.join(F.broadcast(sel), "doc_id")


def emb_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncated-dimension recall audit (Kusupati et al.
    2022, arXiv:2205.13147) under the driver oracle: per probe, the
    exact full-64-dim top-5 vs the top-5 retrieved using only the
    first 16 and 32 vector components — overlap counts and recall@5,
    so the standard cheap-first-pass dimension/quality trade is a
    hash-verified measurement. Both sides are exact integer dots (the
    truncated space slices the integer vectors before norm + dot);
    probes broadcast, the corpus never shuffles; the single float is
    the final recall division."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.mrl_recall(emb, F.col("id") < 20, k=5, dims_list=(16, 32))


def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote label propagation (semi-supervised labeling):
    50 probe vectors classified by their 10 exact-integer-dot nearest
    neighbors' labels."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.knn_classify(emb, F.col("id") < 50, k=10)


def events_band_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-limited signal energy per channel: the flagship zero-phase
    FIR band-pass (shared with events_filtfilt — same bit-exact kernel)
    followed by a per-channel energy aggregate in integer quanta
    (q = floor(filtered·10^3); Σq² stays ≪ 2^63 to ~10^6 samples/channel
    per unit amplitude — document headroom before raising the quanta).
    The spectral-power summary a recording-QA pass runs after filtering."""
    from jagular_spark.operators.filtering import filtfilt_segments

    out = filtfilt_segments(_rn_samples(spark, sf_dir), _BP_TAPS)
    q = F.expr("CAST(floor(filtered * 1000.0) AS BIGINT)")
    return (
        out.withColumn("q", q)
        .groupBy(F.col("channel_id").cast("long").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("power_q"),
        )
        .withColumn(
            "band_power",
            F.col("power_q").cast("double") / F.col("n").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Registry order IS the driver's verification order: the correctness
# harness oracle-checks only the FIRST 50 entries per round, so the dict
# is ordered by verification debt, not by topic. Policy: (a) queries
# whose operator code changed this round and queries NEW this round go
# in the window unconditionally; (b) the rest of the window is filled
# stalest-first (oldest last-driver-green round); (c) no query may go
# more than 2 rounds without driver verification — rotate before that.
#
# Since r12 the order is DERIVED, not hand-maintained (the r11
# verdict's #1 task): jagular_spark/rotation.py computes per-query
# last-driver-green from the CORRECTNESS_r*.json artifacts (rounds
# < REGISTRY_ROUND only, so the derivation is stable after the
# current round's own results land) and orders the whole registry
# stalest-first with ROUND_TOUCHED forced into the window. The dict
# below is the output of `python tools/rotate_window.py`;
# tests/test_rotation.py pins the shipped order to the derivation,
# and `tools/rotate_window.py --check` verifies it from the CLI.
REGISTRY_ROUND = 18

# Queries whose OPERATOR CODE changed this round (window policy a).
# Output-identical refactors pinned by unit tests do not consume
# window slots — e.g. r12's session.shuffle_width extraction leaves
# every _codec_spread caller's plan byte-identical on numeric confs
# (tests/test_session.py), so the media family is not charged here;
# likewise r14's mpeg1 residual-helper extraction (the duplicated
# quantize/CBP/reconstruct step shared by the anchor and B encoders)
# is charged to NO query: it is bit-identical by construction and
# pinned by the 40-test golden/property mpeg1 suite.
ROUND_TOUCHED: set[str] = {
    # r18 charges exactly the budget (48 r15-stale queries are
    # mandatory in this window, leaving TWO slots — the r17 verdict's
    # two requested queries):
    # - docs_bpe_corpus_encode (NEW): the corpus-encode serving path
    #   (bpe_encode_corpus_words' distinct-word map join) finally has
    #   a CORRECTNESS row — the r17 join-strategy knob was plan- and
    #   property-pinned but driver-invisible.
    # - docs_curation_streamed (NEW): the r17
    #   dropDuplicatesWithinWatermark bounded-state dedup rework under
    #   the driver's eye, content-keyed so the output is deterministic
    #   under streaming arrival order.
    # Exempt under the standing output-identical-and-pinned footnote:
    # - n_sequences ceil form in docs_training_shards/_streamed +
    #   oracle ((sum+2047) DIV 2048 — the r16-advice latent-divergence
    #   kill): hash-identical on every positive sum, re-verified 2/2
    #   by hash at sf0.01 on landing day; cross-engine pin in
    #   tests/test_workload_extensions.py. Both queries are r16-green
    #   and rotate into the r19 window on schedule.
    # - bpe broadcast_map="auto" persist-handle exposure (r17 advice):
    #   attribute added to the RETURNED DataFrame only; join plans and
    #   rows byte-identical, pinned in tests/test_bpe.py.
    # - stream_censor plan-side unix_millis watermark compare (r17
    #   advice): identical cutoff under any fixed zone (the old code
    #   localized to the same zone kernel-side); non-UTC parity pinned
    #   in tests/test_streaming.py; events_censor_streamed is
    #   r15-stale and re-verifies inside this window regardless.
    # - domain_mixture keyword-only params (r17 advice): signature
    #   only; docs_domain_mixture calls by keyword, re-verified by
    #   hash on landing day.
    # - stream_curation content_keyed param: default False preserves
    #   the r17 operator byte-for-byte; True is exercised ONLY by the
    #   new docs_curation_streamed, charged above.
    # - NULL-semantics policies (language_id null_pred, gopher_rules
    #   null_text, sampler null_keys/null_groups, knn null_labels,
    #   connected_components null_ids, grouped-map key_change_mask,
    #   hash_sample_rows NULLS LAST, knn string-label try_cast guard):
    #   every default is output-identical on NULL-free inputs — and NO
    #   shipped corpus carries a NULL anywhere (measured
    #   sf0.001/0.01/0.1) — pinned both-ways in
    #   tests/test_null_semantics.py; the touched registry queries
    #   were re-verified by hash on landing day (docs_language_id,
    #   docs_gopher_rules, docs_stratified_sample,
    #   docs_rebalance_sample, docs_token_budget_sample,
    #   docs_dedup_clusters, docs_curation_funnel, emb_knn_classify ->
    #   8/8; fit-sampler users emb_ann_topk_ivf_fitrows,
    #   docs_bpe_vocab, emb_mrl_recall -> 3/3; grouped-map users
    #   events_interpolate, events_common_ref, events_decimate,
    #   events_filtfilt -> 4/4), and the full registry re-verified
    #   150/150 at BOTH sf0.01 and sf0.1 the same day.
    "docs_bpe_corpus_encode",
    "docs_curation_streamed",
}
# Still queued for the r20 window (result-changing NULL semantics, the
# n_sequences precedent class; operators + pins BUILT in r18 behind
# legacy-default parameters — language_id null_pred, gopher_rules
# null_text, sampler null_keys/null_groups, knn_classify null_labels;
# the legacy defaults mean): language_id NULL text -> 'es',
# NULL-key rows silently dropped by hash_bucket-based samplers and
# rebalance_sample's inner join, gopher_rules NULL flags, knn_classify
# NULL-label votes. Flip engine+oracle together in r20 when
# docs_language_id, docs_stratified_sample, docs_gopher_rules are
# mandatory re-verifies anyway. See memory null-semantics-backlog.


# Queries allowed to return 0 rows on both engines at sf0.01. The
# correctness harness (tools/check_oracles.py) FAILS any other query
# whose Spark and oracle outputs are both empty: a 0-vs-0 green
# certifies nothing about the operator (r9's docs_media_mpeg1_color
# lesson — its 768 B gate matched zero docs at every shipped sf, so a
# never-executed color path carried a green row for a full round).
# Currently empty by design: every registry query selects real rows.
EXPECT_EMPTY: set[str] = set()

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ---- driver window: first 50, stalest-first (forced: ROUND_TOUCHED) ----
    "docs_bpe_corpus_encode": docs_bpe_corpus_encode,  # last green r0
    "docs_curation_streamed": docs_curation_streamed,  # last green r0
    "docs_bm25_search": docs_bm25_search,  # last green r15
    "docs_bpe_tokens": docs_bpe_tokens,  # last green r15
    "docs_chunk_dedup": docs_chunk_dedup,  # last green r15
    "docs_chunking": docs_chunking,  # last green r15
    "docs_curation_funnel": docs_curation_funnel,  # last green r15
    "docs_curation_funnel_v2": docs_curation_funnel_v2,  # last green r15
    "docs_dedup_clusters": docs_dedup_clusters,  # last green r15
    "docs_hll_vocab": docs_hll_vocab,  # last green r15
    "docs_lsh_candidates_streamed": docs_lsh_candidates_streamed,  # last green r15
    "docs_media_audio": docs_media_audio,  # last green r15
    "docs_media_flac_roundtrip": docs_media_flac_roundtrip,  # last green r15
    "docs_media_frames": docs_media_frames,  # last green r15
    "docs_media_gif_roundtrip": docs_media_gif_roundtrip,  # last green r15
    "docs_media_jpeg_stats": docs_media_jpeg_stats,  # last green r15
    "docs_media_mjpeg_video": docs_media_mjpeg_video,  # last green r15
    "docs_media_mpeg1_color": docs_media_mpeg1_color,  # last green r15
    "docs_media_mpeg1_video": docs_media_mpeg1_video,  # last green r15
    "docs_media_resize": docs_media_resize,  # last green r15
    "docs_minhash_lsh": docs_minhash_lsh,  # last green r15
    "docs_minhash_lsh_capped": docs_minhash_lsh_capped,  # last green r15
    "docs_ngram_containment": docs_ngram_containment,  # last green r15
    "docs_ngram_jaccard": docs_ngram_jaccard,  # last green r15
    "docs_ngram_jaccard_lsh": docs_ngram_jaccard_lsh,  # last green r15
    "docs_pii_redaction": docs_pii_redaction,  # last green r15
    "docs_rebalance_sample": docs_rebalance_sample,  # last green r15
    "docs_shuffle_shards": docs_shuffle_shards,  # last green r15
    "docs_substring_dedup": docs_substring_dedup,  # last green r15
    "docs_substring_dedup_applied": docs_substring_dedup_applied,  # last green r15
    "docs_substring_dedup_keepfirst": docs_substring_dedup_keepfirst,  # last green r15
    "docs_substring_dedup_streamed": docs_substring_dedup_streamed,  # last green r15
    "docs_tfidf_top": docs_tfidf_top,  # last green r15
    "emb_ann_recall": emb_ann_recall,  # last green r15
    "emb_ann_topk_ivf_frozen": emb_ann_topk_ivf_frozen,  # last green r15
    "emb_knn_classify": emb_knn_classify,  # last green r15
    "events_asof": events_asof,  # last green r15
    "events_asof_nearest": events_asof_nearest,  # last green r15
    "events_audit": events_audit,  # last green r15
    "events_band_power": events_band_power,  # last green r15
    "events_censor_streamed": events_censor_streamed,  # last green r15
    "events_detect_spikes": events_detect_spikes,  # last green r15
    "events_hourly_rollup": events_hourly_rollup,  # last green r15
    "events_interpolate_streamed": events_interpolate_streamed,  # last green r15
    "events_salted_hourly": events_salted_hourly,  # last green r15
    "events_sessionize_streamed": events_sessionize_streamed,  # last green r15
    "events_sortedness": events_sortedness,  # last green r15
    "events_winsorize": events_winsorize,  # last green r15
    "events_winsorize_chunked": events_winsorize_chunked,  # last green r15
    "events_xcorr": events_xcorr,  # last green r15
    # ---- driver window ends here ----
    "docs_bigram_fluency": docs_bigram_fluency,  # last green r16
    "docs_bpe_vocab": docs_bpe_vocab,  # last green r16
    "docs_decontaminate": docs_decontaminate,  # last green r16
    "docs_domain_mixture": docs_domain_mixture,  # last green r16
    "docs_dsir_scores": docs_dsir_scores,  # last green r16
    "docs_dsir_scores_streamed": docs_dsir_scores_streamed,  # last green r16
    "docs_dsir_topk": docs_dsir_topk,  # last green r16
    "docs_exact_dedup": docs_exact_dedup,  # last green r16
    "docs_fingerprint": docs_fingerprint,  # last green r16
    "docs_media_mpeg1_bframes": docs_media_mpeg1_bframes,  # last green r16
    "docs_media_mpeg1_halfpel": docs_media_mpeg1_halfpel,  # last green r16
    "docs_media_mpeg1_pframes": docs_media_mpeg1_pframes,  # last green r16
    "docs_simhash_neardup": docs_simhash_neardup,  # last green r16
    "docs_stratified_sample": docs_stratified_sample,  # last green r16
    "docs_survivor_setops": docs_survivor_setops,  # last green r16
    "docs_token_quantiles": docs_token_quantiles,  # last green r16
    "docs_training_shards": docs_training_shards,  # last green r16
    "docs_training_shards_streamed": docs_training_shards_streamed,  # last green r16
    "emb_ann_topk_ivf": emb_ann_topk_ivf,  # last green r16
    "emb_ann_topk_ivf_fitrows": emb_ann_topk_ivf_fitrows,  # last green r16
    "emb_ann_topk_ivf_pq": emb_ann_topk_ivf_pq,  # last green r16
    "emb_mrl_recall": emb_mrl_recall,  # last green r16
    "emb_semantic_dedup": emb_semantic_dedup,  # last green r16
    "events_compacted_roundtrip": events_compacted_roundtrip,  # last green r16
    "events_filtfilt_chunked": events_filtfilt_chunked,  # last green r16
    "events_rolling_stats": events_rolling_stats,  # last green r16
    "events_sessionize": events_sessionize,  # last green r16
    "events_spike_clusters": events_spike_clusters,  # last green r16
    "events_zscore": events_zscore,  # last green r16
    "orders_bucketed_revenue": orders_bucketed_revenue,  # last green r16
    "q10_returned_items": q10_returned_items,  # last green r16
    "q11_important_parts": q11_important_parts,  # last green r16
    "q12_shipping_classes": q12_shipping_classes,  # last green r16
    "q13_customer_distribution": q13_customer_distribution,  # last green r16
    "q14_promo_effect": q14_promo_effect,  # last green r16
    "q15_top_supplier": q15_top_supplier,  # last green r16
    "q16_supplier_counts": q16_supplier_counts,  # last green r16
    "q17_small_quantity_revenue": q17_small_quantity_revenue,  # last green r16
    "q18_large_volume_customers": q18_large_volume_customers,  # last green r16
    "q19_disjunctive_revenue": q19_disjunctive_revenue,  # last green r16
    "q1_rollup_summary": q1_rollup_summary,  # last green r16
    "q20_dominant_suppliers": q20_dominant_suppliers,  # last green r16
    "q21_waiting_suppliers": q21_waiting_suppliers,  # last green r16
    "q22_global_sales_opportunity": q22_global_sales_opportunity,  # last green r16
    "q2_min_price_supplier": q2_min_price_supplier,  # last green r16
    "q4_order_priority": q4_order_priority,  # last green r16
    "q6_forecast_revenue": q6_forecast_revenue,  # last green r16
    "q7_volume_shipping": q7_volume_shipping,  # last green r16
    "q8_market_share": q8_market_share,  # last green r16
    "q9_product_profit": q9_product_profit,  # last green r16
    "docs_bloom_decontaminate": docs_bloom_decontaminate,  # last green r17
    "docs_cms_heavyhitters": docs_cms_heavyhitters,  # last green r17
    "docs_dsir_select_funnel": docs_dsir_select_funnel,  # last green r17
    "docs_gopher_rules": docs_gopher_rules,  # last green r17
    "docs_language_id": docs_language_id,  # last green r17
    "docs_media_adpcm_roundtrip": docs_media_adpcm_roundtrip,  # last green r17
    "docs_media_jpeg_color": docs_media_jpeg_color,  # last green r17
    "docs_media_jpeg_progressive": docs_media_jpeg_progressive,  # last green r17
    "docs_media_mulaw_roundtrip": docs_media_mulaw_roundtrip,  # last green r17
    "docs_media_png_roundtrip": docs_media_png_roundtrip,  # last green r17
    "docs_media_stats": docs_media_stats,  # last green r17
    "docs_media_wav_roundtrip": docs_media_wav_roundtrip,  # last green r17
    "docs_neardup_source_matrix": docs_neardup_source_matrix,  # last green r17
    "docs_pack_sequences": docs_pack_sequences,  # last green r17
    "docs_quality": docs_quality,  # last green r17
    "docs_repetition": docs_repetition,  # last green r17
    "docs_simhash": docs_simhash,  # last green r17
    "docs_token_budget_sample": docs_token_budget_sample,  # last green r17
    "docs_token_budget_sample_streamed": docs_token_budget_sample_streamed,  # last green r17
    "docs_token_stats": docs_token_stats,  # last green r17
    "docs_vocab_topdf": docs_vocab_topdf,  # last green r17
    "emb_ann_topk": emb_ann_topk,  # last green r17
    "emb_ann_topk_ivf_pq_prebuilt": emb_ann_topk_ivf_pq_prebuilt,  # last green r17
    "emb_ann_topk_ivf_prebuilt": emb_ann_topk_ivf_prebuilt,  # last green r17
    "emb_ann_topk_lsh": emb_ann_topk_lsh,  # last green r17
    "emb_cosine_neardup": emb_cosine_neardup,  # last green r17
    "emb_cosine_neardup_lsh": emb_cosine_neardup_lsh,  # last green r17
    "emb_index_lifecycle": emb_index_lifecycle,  # last green r17
    "emb_lsh_buckets": emb_lsh_buckets,  # last green r17
    "events_align": events_align,  # last green r17
    "events_align_cspline": events_align_cspline,  # last green r17
    "events_common_ref": events_common_ref,  # last green r17
    "events_crossings": events_crossings,  # last green r17
    "events_crossings_both": events_crossings_both,  # last green r17
    "events_crossings_chunked": events_crossings_chunked,  # last green r17
    "events_decimate": events_decimate,  # last green r17
    "events_dedup_first": events_dedup_first,  # last green r17
    "events_filtfilt": events_filtfilt,  # last green r17
    "events_fir_smooth": events_fir_smooth,  # last green r17
    "events_gap_lengths": events_gap_lengths,  # last green r17
    "events_interpolate": events_interpolate,  # last green r17
    "events_mad_threshold": events_mad_threshold,  # last green r17
    "events_segments": events_segments,  # last green r17
    "events_spikes_roundtrip": events_spikes_roundtrip,  # last green r17
    "events_stream_bounds": events_stream_bounds,  # last green r17
    "events_tetrode": events_tetrode,  # last green r17
    "q1_pricing_summary": q1_pricing_summary,  # last green r17
    "q3_shipping_priority": q3_shipping_priority,  # last green r17
    "q5_region_revenue": q5_region_revenue,  # last green r17
    "top3_orders_per_customer": top3_orders_per_customer,  # last green r17
}



# Oracle SQL lives in its own module; re-exported here so existing
# importers (driver entry, tests, tools) keep working. No cycle:
# oracles.py imports workload_params, never workloads.
from jagular_spark.oracles import ORACLE_SQL  # noqa: E402,F401
