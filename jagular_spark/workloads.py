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

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c, scale: int = 4):
    return F.col(c).cast(f"decimal(18,{scale})")


def _fp4(c: str) -> F.Column:
    """Column as exact BIGINT fixed-point quanta of 10^-4 (the storage
    doubles carry ≤4 decimals, so DECIMAL(18,4)·10^4 is integral and
    the BIGINT cast is exact on both engines)."""
    return F.expr(f"CAST(CAST({c} AS DECIMAL(18,4)) * 10000 AS BIGINT)")


_DISC_PRICE_QUANTA = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    " * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))"
)


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
_BP_TAPS = dsp.firwin_bandpass(21, 0.05, 0.2, 1.0)   # band-pass (filtfilt)
_LP_TAPS = dsp.firwin_bandpass(21, None, 0.125, 1.0)  # low-pass (decimate, q=4)


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


# Shared SQL prefix: the same per-user rn stream + per-user value lists.
_ORDERED_LISTS_CTE = """
    ordered AS (
        SELECT user_id, value,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS rn
        FROM events
    ), lists AS (
        SELECT user_id, list(value ORDER BY rn) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered GROUP BY user_id
    )"""


def _fir_chain_sql(taps, rn: str = "o.rn", xs: str = "l.xs", n: str = "l.n") -> str:
    """Left-associated FIR dot product with reflect indexing — the exact
    fold order of dsp.fir_zero_phase; taps embedded as string-cast
    literals (array literals would round-trip through DECIMAL)."""
    half = (len(taps) - 1) // 2
    chain = "0.0"
    for k, t in enumerate(taps):
        d = k - half
        j = f"({rn} + {d})" if d >= 0 else f"({rn} - {-d})"
        refl = (
            f"(CASE WHEN {j} < 0 THEN -{j} "
            f"WHEN {j} >= {n} THEN 2*({n}-1) - {j} "
            f"ELSE {j} END) + 1"
        )
        chain = f"({chain} + CAST('{float(t)!r}' AS DOUBLE) * {xs}[{refl}])"
    return f"CASE WHEN {n} < {len(taps)} THEN 0.0 ELSE {chain} END"


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
    n = F.length(F.col("text")).cast("double")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")).cast("double") / n
    digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("double") / n
    space = F.length(F.regexp_replace(F.col("text"), r"[^\s]", "")).cast("double") / n
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    stop = F.expr(
        "CAST(size(filter(split(trim(text), '\\\\s+'), t -> t IN ('the','a','of','and','to'))) AS DOUBLE)"
    ) / F.size(tokens).cast("double")
    score = F.lit(0.4) * alpha + F.lit(0.3) * stop + F.lit(0.3) * (F.lit(1.0) - digit)
    return docs.select(
        "doc_id",
        alpha.alias("alpha_ratio"),
        digit.alias("digit_ratio"),
        space.alias("space_ratio"),
        stop.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Similarity / dedup extension surface (documents + embeddings)
# ---------------------------------------------------------------------------

def docs_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH(4 bands × 2) candidate near-dup pairs — the
    shingle→minhash→band→bucket-join scale path for fuzzy dedup."""
    docs = load(spark, sf_dir, "documents")
    return sim.lsh_candidate_pairs(sim.minhash_signature(docs))


def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.5 for shingle-sharing pairs."""
    docs = load(spark, sf_dir, "documents")
    return sim.ngram_jaccard_pairs(docs, min_jaccard=0.5)


def docs_ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-first exact Jaccard ≥ 0.5: MinHash-LSH banding proposes
    candidates, exact shingle-multiset Jaccard verifies candidates only
    — the sub-quadratic composition that replaces per-shingle bucket
    combinatorics at corpus scale."""
    docs = load(spark, sf_dir, "documents")
    return sim.ngram_jaccard_pairs_lsh(docs, min_jaccard=0.5)


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
    kernel) → per-spike cluster assignment. The fit runs driver-side on
    the detected-spike set (O(spikes) ≪ O(samples) — detections are the
    sparse output of the funnel, the natural fit-on-sample); assignment
    is the nested-literal argmin, zero extra shuffles. The DuckDB
    oracle replays detection (recursive-CTE censor), quantization, the
    Lloyd chain and the assignment end-to-end."""
    import numpy as np

    from jagular_spark.operators.similarity import _cent_dists, _lloyd_int
    from jagular_spark.operators.spikes import detect_spikes

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
    rows = feats.select("sid", "iv").collect()
    rows.sort(key=lambda r: r.sid)
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


def emb_ann_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-style IVFADC — the memory-bounded ANN serving shape: the
    scan side carries only (id, IVF cell, m PQ codes); candidates from
    nprobe cells are shortlisted by exact-integer ADC dot tables and
    the top-32 re-ranked with full-precision integer dots. Both fits
    (IVF coarse + per-subspace PQ codebooks) run on the shared md5
    half-sample in exact int64, so the DuckDB oracle replays fit +
    encode + ADC + re-rank end-to-end and hash-matches."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ann_topk_ivf_pq(
        emb, F.col("id") < 20, k=5, n_centroids=16, nprobe=4, n_iter=3,
        m=4, pq_k=16, pq_iter=2, refine=32, fit_fraction=0.5,
    )


# Frozen IVF coarse quantizer: one offline deterministic Lloyd fit
# (k=8, n_iter=3, on the sf0.01 corpus), floored to ints. Integer
# centroids make assignment/nprobe/ranking exact BIGINT arithmetic,
# hence fully SQL-expressible (see sim.ann_topk_ivf_frozen).
_IVF_FROZEN_CENTS: list[list[int]] = [
    [17147, -354, 44195, -93804, 8356, -21768, -14391, 13960, 59683, -18163, -14134, 7420, -40273, -8982, -13699, -2336, 56150, 39848, 24358, 29263, -60788, 11201, -10636, -17269, 3781, 81554, 93833, -6230, -16332, 65826, -26215, 67046, 6081, -43471, 4673, -55811, -7373, 15896, 22653, 10608, -841, 28, 1303, 68, 15999, 23958, 34559, -51874, 9835, -47366, 2294, 21260, 9320, -57817, 31548, 16950, -15406, 5118, -70614, -19648, -14546, 37669, 37151, -46332],
    [-24088, -22184, 11548, 2205, 12375, 30291, -96955, -9407, 2707, -5895, -55314, 47405, 67538, -81973, 32985, 2595, -4815, -21956, 31871, -49973, 33564, 18874, 3364, -25762, 37838, 74975, -7700, -17705, -1759, 12351, -23500, 5158, -2800, 5322, 17190, -1820, -48040, 11156, 21660, -76677, 3776, -40749, 19840, 13005, 21451, 18688, -35502, -14666, -66227, -93662, -16471, 10656, -18811, 4076, -23324, 44910, 49191, -4057, 31672, 11024, -22088, -3046, -48265, -11144],
    [-1151, 8456, -41534, 49235, 44732, -6920, -12233, 21564, -6012, -71251, -17702, -20910, -62746, 69977, 460, 8792, -26897, 48174, -8029, -22090, -365, 9238, 70466, -25242, -2749, -58243, 4506, -5124, 13912, 5057, -18048, -88896, 1901, 1978, 4780, 3506, 7569, 60847, 48816, 60787, -8027, -7190, 16222, 24756, -4873, -14213, -14962, -1295, 50283, 34946, 48207, -62670, -15930, -32005, 47440, 5443, 14319, -18378, 17147, 49879, 41304, 2738, 19389, 3400],
    [-24332, 29551, -18641, -17504, -14558, 28473, 26731, -1638, -33755, 1049, -3029, 43016, 17974, 86811, 14046, -14311, -42633, -47298, 14766, 35617, 8584, -2798, -23500, 11840, -13124, 30975, -31808, -14841, -64065, -36389, -2267, -8592, 84900, -12453, 3207, -19442, 10078, -30385, -36619, -27973, -6320, -41959, -73302, -37099, 4600, 3735, -16742, -40536, 63602, -46782, 11582, -20823, 14573, 20118, -41342, -36341, 13047, -6648, 34616, -47081, 35634, 4547, -4455, -46878],
    [27699, -745, 69510, -18022, -46224, -71920, 48581, -6374, 4561, 27097, 25543, -65047, 31428, -44679, 18021, -16545, 51216, 28124, 7972, 29147, -19160, 39591, -23983, 13308, -27643, 4045, 23305, 6388, 28798, -43873, 34377, -31571, 18411, 18487, 32653, -51063, 15791, -82421, -24097, 8342, 30023, -5741, -8067, 15808, -32944, 144, -34488, 66758, -35425, 2423, -11462, 6921, 24512, 17671, 88020, -19734, 148, -14573, 27528, -4051, -66794, -8083, 36748, 367],
    [-31472, -16906, 26157, -577, 53249, -13618, -50625, 68874, -17096, 18233, 24927, -13577, 4997, 8731, -17843, 7147, 3956, -47763, -15492, 33683, 6292, -25822, 28198, -10776, 25338, 44881, -34544, 6663, 6525, 18941, 9192, -27613, -297, -2396, 1646, 51002, 12344, 62673, -31898, 13262, -43158, 58632, 9653, 27522, -81432, -48429, 9167, -23798, -11549, 25424, 39604, 40703, 11785, 30440, -36793, -78537, 33603, -38693, 13306, -9042, -7404, 39542, -39921, 25616],
    [-22528, -44807, -11586, -16053, 47977, 71940, -29950, -51208, 7140, 47676, 59425, 16806, 11271, 47326, -18165, 44727, 26473, 52453, -61114, -46519, 2319, -12549, -3113, -57450, -42784, -17364, -5305, 48883, 28917, -43424, 7544, 1742, -15134, -46715, -23899, 46433, 21078, -15175, -10116, -7781, 35830, -38567, 3346, -23769, 1093, 14110, 29281, 47392, 9917, 21696, -28699, -136, 46422, -2877, 23588, 35380, -64042, 52877, -23004, -36909, 17334, -9938, -4692, 22749],
    [91574, 14662, -36089, 44567, -35677, 29183, -14257, 41359, -24665, -16323, 23224, 3345, -62150, -76466, -14049, 12731, -24008, 12494, 14621, 5521, -15520, -6779, -7809, 48813, 3986, -49882, -31441, 65205, -4178, 36146, 62827, 40585, -24679, 25747, 9996, 12442, -61071, -43492, 13626, 16399, -21495, -25586, 37919, -20260, -11116, 42121, 20818, 67298, -56452, 8847, 32809, -11938, -12095, -26643, -28293, 12249, 10305, 1228, -80137, -8887, 3560, -21126, 10883, -69367],
]


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
        na = ap.groupBy("query_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_approx")
        )
        nov = (
            exact.join(ap, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
        )
        parts.append(
            ne.join(na, "query_id", "left")
            .join(nov, "query_id", "left")
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


def _text_oracles() -> dict[str, str]:
    ratio = {
        lang: (
            f"CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), "
            f"t -> t IN ({', '.join(chr(39) + w + chr(39) for w in words)}))) AS DOUBLE)"
            f" / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)"
        )
        for lang, words in txt.LANG_STOPWORDS.items()
    }
    lang_sql = f"""
        WITH scored AS (
            SELECT doc_id, {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM documents
        )
        SELECT doc_id, s_en, s_fr, s_de, s_es,
               CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END AS pred_lang
        FROM scored"""

    fp_sql = f"""
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                    (acc, x) -> (acc * 31 + x) % {txt.P}) AS fp_roll,
               list_min(list_transform(generate_series(1, greatest(1, length(text) - 7)),
                    i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 8))::BIGINT)) AS fp_min8
        FROM documents"""

    toks = f"regexp_extract_all(text, '{txt.BPE_TOKEN_RE}')"
    bpe_sql = f"""
        SELECT doc_id,
               CAST(len({toks}) AS BIGINT) AS n_regex_tokens,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform({toks}, t -> CASE WHEN regexp_matches(t, '^[A-Za-z0-9]')
                        THEN (length(t) + 3) // 4 ELSE CAST(1 AS BIGINT) END)),
                    (acc, x) -> acc + x) AS BIGINT) AS n_subwords,
               CAST(len(list_filter({toks}, t -> NOT regexp_matches(t, '^[A-Za-z0-9]'))) AS BIGINT)
                   AS n_punct
        FROM documents"""

    case_lang = """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END"""
    thr_case = (
        "CASE pred_lang "
        + " ".join(
            f"WHEN '{k}' THEN {int(v * (1 << 32))}"
            for k, v in sorted(_STRATA_FRACTIONS.items())
        )
        + " ELSE 0 END"
    )
    sample_sql = f"""
        WITH scored AS (
            SELECT doc_id, {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM documents
        ), lang AS (
            SELECT doc_id, {case_lang} AS pred_lang FROM scored
        )
        SELECT doc_id, pred_lang FROM lang
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < {thr_case}"""

    quantiles_sql = f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
                   {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM documents
        ), lang AS (
            SELECT doc_id, n_tokens,
                   CAST(floor(s_en * 10.0) AS BIGINT) AS stop_dec,
                   {case_lang} AS pred_lang
            FROM base
        ), ranked AS (
            SELECT pred_lang, stop_dec, n_tokens,
                   CAST(ROW_NUMBER() OVER (PARTITION BY pred_lang, stop_dec
                        ORDER BY n_tokens, doc_id) AS BIGINT) - 1 AS rn,
                   COUNT(*) OVER (PARTITION BY pred_lang, stop_dec) AS cnt
            FROM lang
        )
        SELECT pred_lang, stop_dec, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.5) AS BIGINT) THEN n_tokens END) AS p50_tokens,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.9) AS BIGINT) THEN n_tokens END) AS p90_tokens,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.99) AS BIGINT) THEN n_tokens END) AS p99_tokens
        FROM ranked GROUP BY pred_lang, stop_dec"""

    return {
        "docs_language_id": lang_sql,
        "docs_fingerprint": fp_sql,
        "docs_bpe_tokens": bpe_sql,
        "docs_stratified_sample": sample_sql,
        "docs_token_quantiles": quantiles_sql,
    }


def _sim_hash_sql() -> str:
    return "('0x' || substr(md5({col}), 1, 8))::BIGINT"


def _similarity_oracles() -> dict[str, str]:
    P = sim.P
    shingle_cte = f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
        ), sh AS (
            SELECT doc_id, CASE WHEN len(t) >= 3 THEN
                list_distinct(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS shingles FROM toks
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), hashes AS (
            SELECT doc_id, {_sim_hash_sql().format(col='s')} % {P} AS h FROM ex
        )"""
    sig_cols = ", ".join(
        f"MIN(({a} * h + {b}) % {P}) AS m{j}"
        for j, (a, b) in enumerate(zip(sim.MINHASH_A, sim.MINHASH_B))
    )
    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc_id AS id, {b} AS band, m{2*b} * 2147483648 + m{2*b+1} AS key FROM sig"
        for b in range(sim.LSH_BANDS)
    )
    minhash_lsh = f"""{shingle_cte}, sig AS (
            SELECT doc_id, {sig_cols} FROM hashes GROUP BY doc_id
        ), buckets AS (
            {band_selects}
        )
        SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_bands
        FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key AND a.id < b.id
        GROUP BY a.id, b.id"""

    jaccard = f"""{shingle_cte}, sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM hashes a JOIN hashes b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, n_common,
               CAST(sa.n_sh + sb.n_sh - n_common AS BIGINT) AS n_union,
               n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        FROM common
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5"""

    # LSH-first exact Jaccard: candidates from the minhash band buckets,
    # common-shingle counting restricted to candidate pairs. The shared
    # hashes JOIN counts multiplicity products like the engine's
    # aggregate-over-multiset expression.
    jaccard_lsh = f"""{shingle_cte}, sig AS (
            SELECT doc_id, {sig_cols} FROM hashes GROUP BY doc_id
        ), buckets AS (
            {band_selects}
        ), cand AS (
            SELECT a.id AS id_a, b.id AS id_b
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.key = b.key AND a.id < b.id
            GROUP BY a.id, b.id
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id
        ), common AS (
            SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM cand c
            JOIN hashes a ON a.doc_id = c.id_a
            JOIN hashes b ON b.doc_id = c.id_b AND a.h = b.h
            GROUP BY c.id_a, c.id_b
        )
        SELECT id_a, id_b, n_common,
               CAST(sa.n_sh + sb.n_sh - n_common AS BIGINT) AS n_union,
               n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        FROM common
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5"""

    def _simhash_sql_for(bits: int) -> str:
        sum_cols = ", ".join(
            f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(bits)
        )
        fp = " + ".join(f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
        return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
        ), h AS (
            SELECT doc_id, {_sim_hash_sql().format(col='tok')} AS h FROM toks
        ), sums AS (
            SELECT doc_id, {sum_cols} FROM h GROUP BY doc_id
        )
        SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums"""

    simhash_sql = _simhash_sql_for(16)

    normed_cte = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), normed AS (
            SELECT vec_id, iv,
                   CAST(list_sum(list_transform(generate_series(1, len(iv)),
                        i -> iv[i] * iv[i])) AS BIGINT) AS nrm
            FROM base
        )"""
    pair_dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(a.iv)), "
        "i -> a.iv[i] * b.iv[i])) AS BIGINT)"
    )
    neardup = f"""{normed_cte}, scored AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {pair_dot} AS dot,
                   a.nrm AS nrm_a, b.nrm AS nrm_b
            FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM scored
        WHERE dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) >= 0.35"""

    probe_dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(q.iv)), "
        "i -> q.iv[i] * c.iv[i])) AS BIGINT)"
    )
    ann = f"""{normed_cte}, scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {probe_dot} AS dot,
                   q.nrm AS nrm_a, c.nrm AS nrm_b
            FROM normed q JOIN normed c
              ON q.vec_id < 20 AND c.vec_id != q.vec_id
        ), ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM ranked WHERE rank <= 5"""

    plane_terms = []
    for j in range(8):
        signs = "[" + ", ".join(str(sim._plane_sign(j, i)) for i in range(64)) + "]"
        plane_terms.append(
            f"CAST(list_sum(list_transform(generate_series(1, 64), i -> ({signs}[i]) * iv[i])) AS BIGINT) AS p{j}"
        )
    bucket_expr = " + ".join(f"(CASE WHEN p{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(8))
    lsh_buckets = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), proj AS (
            SELECT vec_id, {', '.join(plane_terms)} FROM base
        )
        SELECT vec_id, CAST({bucket_expr} AS BIGINT) AS bucket FROM proj"""

    # Connected-components closure of the jaccard>=0.5 pair graph as a
    # recursive CTE: reach = transitive closure over symmetric edges,
    # component label = min reachable id (matches min-label propagation).
    cluster_sql = f"""{shingle_cte.replace("WITH ", "WITH RECURSIVE ", 1)}, sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM hashes a JOIN hashes b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), prs AS (
            SELECT id_a, id_b FROM common
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
            WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM prs
            UNION ALL
            SELECT id_b, id_a FROM prs
        ), reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ), comp AS (
            SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
        )
        SELECT d.doc_id,
               CAST(COALESCE(c.comp, d.doc_id) AS BIGINT) AS cluster_id,
               d.doc_id = COALESCE(c.comp, d.doc_id) AS is_canonical
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id"""

    # All-pairs Hamming<=1 over 32-bit fingerprints: provably the same
    # result set as the engine's half-fingerprint banding (pigeonhole).
    # 32 bits, not 16: a 16-bit space saturates at corpus scale (5000
    # docs already produced ~700k birthday-collision "pairs" at sf0.1);
    # at 32 bits survivors are genuine near-dups.
    simhash_neardup_sql = f"""
        WITH fps AS ({_simhash_sql_for(32)})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 1"""

    return {
        "docs_minhash_lsh": minhash_lsh,
        "docs_ngram_jaccard": jaccard,
        "docs_ngram_jaccard_lsh": jaccard_lsh,
        "docs_simhash": simhash_sql,
        "docs_simhash_neardup": simhash_neardup_sql,
        "docs_dedup_clusters": cluster_sql,
        "emb_cosine_neardup": neardup,
        "emb_ann_topk": ann,
        "emb_lsh_buckets": lsh_buckets,
    }


# ---------------------------------------------------------------------------
# Dedup clustering, deterministic sampling, corpus stats
# ---------------------------------------------------------------------------

_STRATA_FRACTIONS = {"en": 0.5, "fr": 1.0, "de": 0.8, "es": 0.25}


def docs_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: connected components over the
    exact 3-gram Jaccard ≥ 0.5 pair graph (min-label propagation, one
    equi-join shuffle per diameter round), then every document labeled
    with its component-minimum ``cluster_id`` and a canonical flag —
    the keep-list of a corpus-scale dedup pass. DuckDB oracle replays
    the closure with a recursive CTE."""
    from jagular_spark.operators.graph import dedup_clusters

    docs = load(spark, sf_dir, "documents")
    pairs = sim.ngram_jaccard_pairs(docs, min_jaccard=0.5)
    return dedup_clusters(docs, pairs)


_REBALANCE_TARGETS = {"en": 0.2, "fr": 0.3, "de": 0.2, "es": 0.2, "zh": 0.1}


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


def _run_stream_to_table(sdf: DataFrame, prefix: str) -> str:
    """Run a streaming DataFrame to completion under availableNow into a
    uniquely named memory-sink table; return the table name. Unique
    names keep repeated driver/bench invocations independent."""
    _STREAM_SEQ[0] += 1
    name = f"{prefix}_{_STREAM_SEQ[0]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
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
    )
    return spark.table(tbl)


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
    from jagular_spark.operators.graph import dedup_clusters
    from jagular_spark.operators.sampling import hash_sample

    docs = load(spark, sf_dir, "documents")
    n = F.length(F.col("text")).cast("double")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")).cast("double") / n
    digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("double") / n
    stop = F.expr(
        "CAST(size(filter(split(trim(text), '\\\\s+'), t -> t IN ('the','a','of','and','to'))) AS DOUBLE)"
    ) / F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    score = F.lit(0.4) * alpha + F.lit(0.3) * stop + F.lit(0.3) * (F.lit(1.0) - digit)
    scored = txt.language_id(
        docs.withColumn("quality_score", score), keep=("text", "quality_score")
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

    return hash_sample(s3, "doc_id", 0.5).select("doc_id", "quality_score")


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
# is ordered by verification debt, not by topic. Block 1 = queries the
# driver has never seen green (or last saw in r4); block 2 = queries new
# this round; block 3 = r5-driver-green queries whose code was touched
# this round (or are flagships) — they must be re-verified; block 4 =
# r5-driver-green untouched queries (out of window this round, rotate
# back next round). Keep new/changed queries in the first 50.
SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- block 1: never driver-verified (r5 additions) or displaced since r4
    "emb_ann_topk_ivf": emb_ann_topk_ivf,
    "emb_ann_topk_ivf_pq": emb_ann_topk_ivf_pq,
    "emb_ann_recall": emb_ann_recall,
    "emb_knn_classify": emb_knn_classify,
    "events_winsorize": events_winsorize,
    "events_xcorr": events_xcorr,
    "events_band_power": events_band_power,
    "events_asof_nearest": events_asof_nearest,
    "q10_returned_items": q10_returned_items,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_volume_customers": q18_large_volume_customers,
    "docs_tfidf_top": docs_tfidf_top,
    "docs_bigram_fluency": docs_bigram_fluency,
    "docs_rebalance_sample": docs_rebalance_sample,
    "events_filtfilt_chunked": events_filtfilt_chunked,
    "emb_ann_topk_ivf_frozen": emb_ann_topk_ivf_frozen,
    "docs_media_frames": docs_media_frames,
    "events_audit": events_audit,
    "docs_dedup_clusters": docs_dedup_clusters,
    "docs_stratified_sample": docs_stratified_sample,
    "docs_token_quantiles": docs_token_quantiles,
    "docs_media_audio": docs_media_audio,
    "docs_media_resize": docs_media_resize,
    "docs_simhash_neardup": docs_simhash_neardup,
    "docs_curation_funnel": docs_curation_funnel,
    "events_asof": events_asof,
    # -- block 2: new this round (r6) — inserted here as implemented
    "events_winsorize_chunked": events_winsorize_chunked,
    "events_sessionize_streamed": events_sessionize_streamed,
    "events_censor_streamed": events_censor_streamed,
    # -- block 3: r5-green but touched this round, plus flagships
    "events_detect_spikes": events_detect_spikes,
    "docs_ngram_jaccard": docs_ngram_jaccard,
    "docs_ngram_jaccard_lsh": docs_ngram_jaccard_lsh,
    "docs_minhash_lsh": docs_minhash_lsh,
    "events_sessionize": events_sessionize,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "top3_orders_per_customer": top3_orders_per_customer,
    "events_filtfilt": events_filtfilt,
    "events_interpolate": events_interpolate,
    "events_tetrode": events_tetrode,
    "events_crossings": events_crossings,
    "events_align": events_align,
    "events_align_cspline": events_align_cspline,
    "emb_cosine_neardup_lsh": emb_cosine_neardup_lsh,
    "events_spikes_roundtrip": events_spikes_roundtrip,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_decontaminate": docs_decontaminate,
    # -- block 4: r5-driver-green, untouched — out of the 50-entry window
    # this round; rotate into block 1 next round
    "events_segments": events_segments,
    "events_gap_lengths": events_gap_lengths,
    "events_dedup_first": events_dedup_first,
    "events_mad_threshold": events_mad_threshold,
    "events_stream_bounds": events_stream_bounds,
    "events_fir_smooth": events_fir_smooth,
    "docs_token_stats": docs_token_stats,
    "docs_quality": docs_quality,
    "docs_chunking": docs_chunking,
    "docs_chunk_dedup": docs_chunk_dedup,
    "docs_repetition": docs_repetition,
    "docs_media_png_roundtrip": docs_media_png_roundtrip,
    "docs_media_wav_roundtrip": docs_media_wav_roundtrip,
    "docs_vocab_topdf": docs_vocab_topdf,
    "docs_domain_mixture": docs_domain_mixture,
    "docs_pack_sequences": docs_pack_sequences,
    "docs_simhash": docs_simhash,
    "emb_cosine_neardup": emb_cosine_neardup,
    "emb_ann_topk": emb_ann_topk,
    "emb_lsh_buckets": emb_lsh_buckets,
    "docs_language_id": docs_language_id,
    "docs_fingerprint": docs_fingerprint,
    "docs_bpe_tokens": docs_bpe_tokens,
    "events_common_ref": events_common_ref,
    "emb_ann_topk_lsh": emb_ann_topk_lsh,
    "events_decimate": events_decimate,
    "events_crossings_chunked": events_crossings_chunked,
    "events_crossings_both": events_crossings_both,
    "events_spike_clusters": events_spike_clusters,
    "docs_media_stats": docs_media_stats,
}


def _funnel_oracle() -> str:
    """DuckDB replay of the whole curation funnel (quality → language →
    exact dedup → LSH-candidate near-dup closure → hash sample). The
    near-dup stage mirrors the engine's LSH-first composition: minhash
    band buckets propose candidate pairs over the survivor set, exact
    shingle-Jaccard ≥ 0.5 verifies them."""
    sig_cols = ", ".join(
        f"MIN(({a} * h + {b}) % {sim.P}) AS m{j}"
        for j, (a, b) in enumerate(
            zip(sim.MINHASH_A[: sim.N_MINHASH], sim.MINHASH_B[: sim.N_MINHASH])
        )
    )
    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc_id AS id, {b} AS band, m{2*b} * 2147483648 + m{2*b+1} AS key FROM sig"
        for b in range(sim.LSH_BANDS)
    )
    ratio = {
        lang: (
            f"CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), "
            f"t -> t IN ({', '.join(chr(39) + w + chr(39) for w in words)}))) AS DOUBLE)"
            f" / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)"
        )
        for lang, words in txt.LANG_STOPWORDS.items()
    }
    quality = (
        "0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE))"
        " + 0.3 * (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),"
        " t -> t IN ('the','a','of','and','to'))) AS DOUBLE)"
        " / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE))"
        " + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE))"
    )
    case_lang = """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END"""
    return f"""
        WITH RECURSIVE scored AS (
            SELECT doc_id, text, {quality} AS quality_score,
                   {ratio['en']} AS s_en, {ratio['fr']} AS s_fr,
                   {ratio['de']} AS s_de, {ratio['es']} AS s_es
            FROM documents
        ), f1 AS (
            SELECT doc_id, text, quality_score FROM scored
            WHERE quality_score >= 0.6 AND {case_lang} = 'en'
        ), d AS (
            SELECT doc_id, text, quality_score FROM (
                SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id FROM f1
            ) WHERE doc_id = min_id
        ), toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM d
        ), sh AS (
            SELECT doc_id, CASE WHEN len(t) >= 3 THEN
                list_distinct(list_transform(generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                ELSE [] END AS shingles FROM toks
        ), ex AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), hashes AS (
            SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {sim.P} AS h FROM ex
        ), sig AS (
            SELECT doc_id, {sig_cols} FROM hashes GROUP BY doc_id
        ), buckets AS (
            {band_selects}
        ), cand AS (
            SELECT a.id AS id_a, b.id AS id_b
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.key = b.key AND a.id < b.id
            GROUP BY a.id, b.id
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM hashes GROUP BY doc_id
        ), common AS (
            SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM cand c
            JOIN hashes a ON a.doc_id = c.id_a
            JOIN hashes b ON b.doc_id = c.id_b AND a.h = b.h
            GROUP BY c.id_a, c.id_b
        ), prs AS (
            SELECT id_a, id_b FROM common
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
            WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM prs
            UNION ALL
            SELECT id_b, id_a FROM prs
        ), reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ), comp AS (
            SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
        ), kept AS (
            SELECT d.doc_id, d.quality_score
            FROM d LEFT JOIN comp c ON d.doc_id = c.id
            WHERE d.doc_id = COALESCE(c.comp, d.doc_id)
        )
        SELECT doc_id, quality_score FROM kept
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT < {int(0.5 * (1 << 32))}"""


ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS sum_disc_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    * (CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    * (CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) BETWEEN 500 AND 700
          AND l_quantity < 24.0
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               epoch_us(o_orderdate) AS o_orderdate_us,
               (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               (CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                        * (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT))) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0 AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "top3_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, price_rank FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS price_rank
            FROM orders
        ) WHERE price_rank <= 3
    """,
    "events_sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), sess AS (
            SELECT user_id, us,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               MIN(us) AS session_start_us, MAX(us) AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "events_segments": """
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 30.0 * 60000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), seg AS (
            SELECT user_id, us,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
            FROM flagged
        )
        SELECT user_id, segment_id,
               MIN(us) AS ts_start, MAX(us) + 60000000 AS ts_stop,
               CAST(COUNT(*) AS BIGINT) AS n_samples
        FROM seg GROUP BY user_id, segment_id
    """,
    "events_gap_lengths": """
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 30.0 * 60000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), seg AS (
            SELECT user_id, us,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
            FROM flagged
        ), segments AS (
            SELECT user_id, segment_id,
                   MIN(us) AS ts_start, MAX(us) + 60000000 AS ts_stop
            FROM seg GROUP BY user_id, segment_id
        )
        SELECT user_id, segment_id,
               ts_stop AS gap_start,
               LEAD(ts_start) OVER (PARTITION BY user_id ORDER BY ts_start) AS gap_stop,
               LEAD(ts_start) OVER (PARTITION BY user_id ORDER BY ts_start) - ts_stop AS gap_len
        FROM segments
        QUALIFY gap_stop IS NOT NULL
    """,
    "events_dedup_first": """
        SELECT user_id, event_type, event_id, us, value FROM (
            SELECT user_id, event_type, event_id, epoch_us(ts) AS us, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                        ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "events_interpolate": """
        WITH dedup AS (
            SELECT user_id, minute, value FROM (
                SELECT user_id, epoch_us(ts) // 60000000 AS minute, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 60000000
                            ORDER BY epoch_us(ts), event_id) AS rn
                FROM events
            ) WHERE rn = 1
        ), pairs AS (
            SELECT user_id, minute AS l_ts, value AS l_v,
                   LEAD(minute) OVER (PARTITION BY user_id ORDER BY minute) AS r_ts,
                   LEAD(value)  OVER (PARTITION BY user_id ORDER BY minute) AS r_v
            FROM dedup
        ), filled AS (
            SELECT user_id, CAST(t.ts AS BIGINT) AS minute,
                   l_v + (r_v - l_v) * ((t.ts - l_ts) / (r_ts - l_ts)) AS value
            FROM pairs, UNNEST(generate_series(l_ts + 1, r_ts - 1)) AS t(ts)
            WHERE r_ts - l_ts - 1 BETWEEN 1 AND 5
        )
        SELECT user_id, minute, value FROM dedup
        UNION ALL
        SELECT user_id, minute, value FROM filled
    """,
    "events_crossings": """
        SELECT user_id, event_id, us, value, next_value FROM (
            SELECT user_id, event_id, epoch_us(ts) AS us, value,
                   LEAD(value) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id) AS next_value
            FROM events
        ) WHERE value > 100.0 AND next_value > 100.0
    """,
    "events_fir_smooth": """
        SELECT user_id, event_id, us, value, smoothed FROM (
            SELECT user_id, event_id, epoch_us(ts) AS us, value,
                   ((((0.1 * LAG(value, 2) OVER w + 0.2 * LAG(value, 1) OVER w)
                      + 0.4 * value)
                      + 0.2 * LEAD(value, 1) OVER w)
                      + 0.1 * LEAD(value, 2) OVER w) AS smoothed
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ) WHERE smoothed IS NOT NULL
    """,
    "events_mad_threshold": """
        SELECT event_type,
               CAST(MEDIAN(ABS(value)) AS DOUBLE) AS mad_median,
               CAST(4.0 * CAST(MEDIAN(ABS(value)) AS DOUBLE) / 0.6745 AS DOUBLE) AS threshold,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    "events_stream_bounds": """
        SELECT event_type,
               MIN(epoch_us(ts)) AS ts_first,
               MAX(epoch_us(ts)) AS ts_last,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    """,
    "docs_exact_dedup": """
        SELECT md5(text) AS text_hash,
               MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "docs_token_stats": """
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_distinct_tokens,
               CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS BIGINT) AS n_token_chars,
               CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS avg_token_len
        FROM documents
    """,
    "docs_quality": """
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS alpha_ratio,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS digit_ratio,
               CAST(length(regexp_replace(text, '[^\\s]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS space_ratio,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                        t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                   / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS stopword_ratio,
               0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE))
             + 0.3 * (CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                        t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                      / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE))
             + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE)) AS quality_score
        FROM documents
    """,
}

def _detect_cte(multiplier: float, width: int, chan_pred: str) -> str:
    """CTE chain replaying the spike-detection pipeline in SQL:
    per-user rn streams → exact-median MAD threshold → debounced
    crossings (LEAD) → greedy censor as a RECURSIVE CTE (each iteration
    keeps, per user, the first crossing strictly more than ``width``
    after the last kept edge — the reference's sequential loop) →
    peak re-location as first-argmax over the ±4 center window."""
    mult = repr(float(multiplier))
    return f"""
        WITH RECURSIVE {_ORDERED_LISTS_CTE}, thr AS (
            SELECT user_id,
                   ({mult} * CAST(MEDIAN(ABS(value)) AS DOUBLE)) / 0.6745 AS threshold
            FROM ordered WHERE {chan_pred} GROUP BY user_id
        ), nxt AS (
            SELECT user_id, rn, value,
                   LEAD(value) OVER (PARTITION BY user_id ORDER BY rn) AS next_value
            FROM ordered WHERE {chan_pred}
        ), cr AS (
            SELECT n.user_id, n.rn
            FROM nxt n JOIN thr t ON n.user_id = t.user_id
            WHERE n.value > t.threshold AND n.next_value > t.threshold
        ), kept AS (
            SELECT c.user_id, c.rn FROM cr c
            WHERE NOT EXISTS (
                SELECT 1 FROM cr c2 WHERE c2.user_id = c.user_id AND c2.rn < c.rn)
            UNION ALL
            SELECT c.user_id, c.rn
            FROM cr c JOIN kept k ON c.user_id = k.user_id AND c.rn > k.rn + {width}
            WHERE NOT EXISTS (
                SELECT 1 FROM cr c2
                WHERE c2.user_id = c.user_id AND c2.rn > k.rn + {width} AND c2.rn < c.rn)
        ), located AS (
            SELECT k.user_id, k.rn AS crossing_seq, l.xs, l.n,
                   GREATEST(k.rn - 4, 0)
                     + CAST(list_position(
                           list_slice(l.xs, GREATEST(k.rn - 4, 0) + 1, LEAST(k.rn + 4, l.n)),
                           list_max(list_slice(l.xs, GREATEST(k.rn - 4, 0) + 1, LEAST(k.rn + 4, l.n)))
                       ) AS BIGINT) - 1 AS peak_seq
            FROM kept k JOIN lists l ON k.user_id = l.user_id
        )"""


def _signal_oracles() -> dict[str, str]:
    """Exact oracles for the filter/detection chain. The FIR queries
    reproduce dsp.fir_zero_phase's ascending-tap left fold bit-for-bit;
    the detection queries replay threshold→crossings→censor→extract with
    a recursive-CTE censor; align adds the closed-form parabola vertex +
    np.interp-convention piecewise-linear resample (float32-rounded like
    the pandas kernel)."""
    filtfilt = f"""
        WITH {_ORDERED_LISTS_CTE}
        SELECT o.user_id, o.rn AS seq, {_fir_chain_sql(_BP_TAPS)} AS filtered
        FROM ordered o JOIN lists l ON o.user_id = l.user_id"""

    decimate = f"""
        WITH {_ORDERED_LISTS_CTE}
        SELECT o.user_id, o.rn AS seq, {_fir_chain_sql(_LP_TAPS)} AS filtered
        FROM ordered o JOIN lists l ON o.user_id = l.user_id
        WHERE o.rn % 4 = 0"""

    detect = f"""{_detect_cte(2.0, 5, "TRUE")}
        SELECT d.user_id, d.crossing_seq, d.peak_seq, CAST(t.j AS BIGINT) AS idx,
               CASE WHEN d.peak_seq - 4 + t.j BETWEEN 0 AND d.n - 1
                    THEN d.xs[d.peak_seq - 4 + t.j + 1] ELSE 0.0 END AS wv
        FROM located d, UNNEST(generate_series(0, 7)) AS t(j)"""

    tetrode = f"""{_detect_cte(1.0, 5, "user_id = 0")}, pk AS (
            SELECT DISTINCT peak_seq FROM located
        ), patches AS (
            SELECT p.peak_seq, l.user_id AS ch, l.xs,
                   GREATEST(p.peak_seq - 4, 0) AS lo,
                   LEAST(p.peak_seq + 4, l.n) AS hi
            FROM pk p, lists l WHERE l.user_id < 4
        ), ok AS (
            SELECT peak_seq FROM patches GROUP BY peak_seq
            HAVING COUNT(*) = 4 AND MIN(hi - lo) > 0
        )
        SELECT p.peak_seq, CAST(p.ch * 8 + t.j AS BIGINT) AS idx,
               CAST(CAST(CASE WHEN t.j < p.hi - p.lo
                    THEN p.xs[p.lo + t.j + 1] ELSE 0.0 END AS FLOAT) AS DOUBLE) AS wv
        FROM patches p, ok o, UNNEST(generate_series(0, 7)) AS t(j)
        WHERE p.peak_seq = o.peak_seq"""

    align = f"""{_detect_cte(2.0, 5, "user_id < 32")}, wvs AS (
            SELECT user_id, crossing_seq, peak_seq,
                   list_transform(generate_series(0, 7), j ->
                       CAST(CAST(CASE WHEN peak_seq - 4 + j BETWEEN 0 AND n - 1
                            THEN xs[peak_seq - 4 + j + 1] ELSE 0.0 END AS FLOAT) AS DOUBLE)) AS w
            FROM located
        ), pk2 AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CAST(list_position(w, list_max(w)) AS BIGINT) - 1 AS p
            FROM wvs
        ), fr AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CASE WHEN p BETWEEN 1 AND 6
                             AND ((w[p] - 2.0 * w[p+1]) + w[p+2]) != 0.0
                        THEN CAST(p AS DOUBLE)
                             + (w[p] - w[p+2]) / (2.0 * ((w[p] - 2.0 * w[p+1]) + w[p+2]))
                        ELSE CAST(p AS DOUBLE) END AS frac
            FROM pk2
        ), grid AS (
            SELECT user_id, crossing_seq, peak_seq, w, CAST(t.i AS BIGINT) AS idx,
                   LEAST(GREATEST(frac + CAST(t.i - 4 AS DOUBLE), 0.0), 7.0) AS q
            FROM fr, UNNEST(generate_series(0, 7)) AS t(i)
        )
        SELECT user_id, peak_seq, idx,
               CAST(CAST(CASE WHEN q >= 7.0 THEN w[8]
                    ELSE (w[CAST(FLOOR(q) AS BIGINT) + 2] - w[CAST(FLOOR(q) AS BIGINT) + 1])
                         * (q - FLOOR(q)) + w[CAST(FLOOR(q) AS BIGINT) + 1]
               END AS FLOAT) AS DOUBLE) AS av
        FROM grid"""

    # W6 cspline: the n=8 natural-cubic tridiagonal solve (b=4, a=c=1)
    # has CONSTANT Thomas coefficients — compute them with the exact
    # float ops dsp.cubic_spline_eval uses and embed their reprs, so the
    # unrolled forward sweep / back substitution is bit-identical.
    _n = 8
    _cp = [0.0] * (_n - 2)
    _m = [4.0] * (_n - 2)
    _cp[0] = 1.0 / 4.0
    for _i in range(1, _n - 2):
        _m[_i] = 4.0 - 1.0 * _cp[_i - 1]
        _cp[_i] = (1.0 / _m[_i]) if _i < _n - 3 else 0.0
    _rhs = [
        f"(6.0 * ((w[{_j + 3}] - 2.0 * w[{_j + 2}]) + w[{_j + 1}]))"
        for _j in range(_n - 2)
    ]
    _dp_exprs = [f"({_rhs[0]} / 4.0) AS dp0"] + [
        f"(({_rhs[_i]} - dp{_i - 1}) / {_m[_i]!r}) AS dp{_i}"
        for _i in range(1, _n - 2)
    ]
    _m_exprs = ["dp5 AS M6"] + [
        f"(dp{_i} - {_cp[_i]!r} * M{_i + 2}) AS M{_i + 1}"
        for _i in range(_n - 4, -1, -1)
    ]
    _tt = "(q - CAST(j AS DOUBLE))"
    _u = f"(1.0 - {_tt})"
    _av = (
        f"((((Ml[j+1] * (({_u} * {_u}) * {_u})) / 6.0)"
        f" + ((Ml[j+2] * (({_tt} * {_tt}) * {_tt})) / 6.0))"
        f" + ((w[j+1] - Ml[j+1] / 6.0) * {_u}))"
        f" + ((w[j+2] - Ml[j+2] / 6.0) * {_tt})"
    )
    align_cspline = f"""{_detect_cte(1.5, 5, "user_id < 16")}, wvs AS (
            SELECT user_id, crossing_seq, peak_seq,
                   list_transform(generate_series(0, 7), j ->
                       CAST(CAST(CASE WHEN peak_seq - 4 + j BETWEEN 0 AND n - 1
                            THEN xs[peak_seq - 4 + j + 1] ELSE 0.0 END AS FLOAT) AS DOUBLE)) AS w
            FROM located
        ), pk2 AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CAST(list_position(w, list_max(w)) AS BIGINT) - 1 AS p
            FROM wvs
        ), fr AS (
            SELECT user_id, crossing_seq, peak_seq, w,
                   CASE WHEN p BETWEEN 1 AND 6
                             AND ((w[p] - 2.0 * w[p+1]) + w[p+2]) != 0.0
                        THEN CAST(p AS DOUBLE)
                             + (w[p] - w[p+2]) / (2.0 * ((w[p] - 2.0 * w[p+1]) + w[p+2]))
                        ELSE CAST(p AS DOUBLE) END AS frac
            FROM pk2
        ), spl AS (
            SELECT user_id, crossing_seq, peak_seq, w, frac,
                   {', '.join(_dp_exprs)},
                   {', '.join(_m_exprs)}
            FROM fr
        ), msl AS (
            SELECT user_id, crossing_seq, peak_seq, w, frac,
                   [0.0, M1, M2, M3, M4, M5, M6, 0.0] AS Ml
            FROM spl
        ), grid AS (
            SELECT user_id, crossing_seq, peak_seq, w, Ml, CAST(t.i AS BIGINT) AS idx,
                   LEAST(GREATEST(frac + CAST(t.i - 4 AS DOUBLE), 0.0), 7.0) AS q
            FROM msl, UNNEST(generate_series(0, 7)) AS t(i)
        ), ev AS (
            SELECT user_id, peak_seq, idx, w, Ml, q,
                   LEAST(CAST(FLOOR(q) AS BIGINT), 6) AS j
            FROM grid
        )
        SELECT user_id, peak_seq, idx,
               CAST(CAST(({_av}) AS FLOAT) AS DOUBLE) AS av
        FROM ev"""

    return {
        "events_filtfilt": filtfilt,
        "events_decimate": decimate,
        "events_detect_spikes": detect,
        "events_tetrode": tetrode,
        "events_align": align,
        "events_align_cspline": align_cspline,
    }


def _extension_oracles() -> dict[str, str]:
    """Oracles for the common-ref/ANN/multimodal extension queries."""
    dedup_cte = """
        WITH dedup AS (
            SELECT user_id, minute, value FROM (
                SELECT user_id, epoch_us(ts) // 60000000 AS minute, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 60000000
                            ORDER BY epoch_us(ts), event_id) AS rn
                FROM events
            ) WHERE rn = 1
        )"""
    common_ref = f"""{dedup_cte}, iv AS (
            SELECT user_id, minute, CAST(floor(value * 1000) AS BIGINT) AS iv FROM dedup
        ), ref AS (
            SELECT minute, AVG(iv) AS m FROM iv GROUP BY minute
        )
        SELECT i.user_id, i.minute, i.iv,
               CAST(i.iv - r.m AS DOUBLE) AS value_ref
        FROM iv i JOIN ref r ON i.minute = r.minute"""

    def _lsh_parts(n_planes: int):
        terms = []
        for j in range(n_planes):
            signs = "[" + ", ".join(str(sim._plane_sign(j, i)) for i in range(64)) + "]"
            terms.append(
                f"CAST(list_sum(list_transform(generate_series(1, 64), i -> ({signs}[i]) * iv[i])) AS BIGINT) AS p{j}"
            )
        bexpr = " + ".join(f"(CASE WHEN p{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(n_planes))
        msks = ", ".join(str(m) for m in [0] + [1 << j for j in range(n_planes)])
        return terms, bexpr, msks

    plane_terms, bucket_expr, _ = _lsh_parts(8)
    # the top-k query runs 6 planes (64 buckets): at fixture scale the
    # 8-plane table is so sparse (~2 vectors/bucket) that even
    # multi-probe recall collapses — 6 planes keeps the sub-linear
    # bucket-join shape with usable occupancy (recall audited by
    # emb_ann_recall)
    plane_terms6, bucket_expr6, masks6 = _lsh_parts(6)
    pair_dot = (
        "CAST(list_sum(list_transform(generate_series(1, len(q.iv)), "
        "i -> q.iv[i] * c.iv[i])) AS BIGINT)"
    )
    ann_lsh = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), normed AS (
            SELECT vec_id, iv,
                   CAST(list_sum(list_transform(generate_series(1, len(iv)),
                        i -> iv[i] * iv[i])) AS BIGINT) AS nrm
            FROM base
        ), proj AS (
            SELECT vec_id, {', '.join(plane_terms6)} FROM base
        ), bucketed AS (
            SELECT vec_id, CAST({bucket_expr6} AS BIGINT) AS bucket FROM proj
        ), qprobes AS (
            -- multi-probe: the probe's own bucket + every Hamming-1 flip
            SELECT b.vec_id, xor(b.bucket, t.m) AS pb
            FROM bucketed b, UNNEST([{masks6}]) AS t(m)
            WHERE b.vec_id < 20
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {pair_dot} AS dot,
                   q.nrm AS nrm_a, c.nrm AS nrm_b
            FROM qprobes p
            JOIN normed q ON q.vec_id = p.vec_id
            JOIN bucketed cb ON cb.bucket = p.pb AND cb.vec_id != p.vec_id
            JOIN normed c ON c.vec_id = cb.vec_id
        ), ranked AS (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM ranked WHERE rank <= 5"""

    media_stats = """
        WITH b AS (
            SELECT doc_id AS media_id,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)),
                        i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS byte_sum
            FROM documents WHERE length(text) = strlen(text)
        )
        SELECT media_id, n_bytes, byte_sum,
               CASE WHEN n_bytes = 0 THEN 0.0
                    ELSE CAST(byte_sum AS DOUBLE) / CAST(n_bytes * 255 AS DOUBLE)
               END AS mean_px
        FROM b"""

    masks = ", ".join(str(m) for m in [0] + [1 << j for j in range(8)])
    neardup_lsh = f"""
        WITH base AS (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
            FROM embeddings
        ), normed AS (
            SELECT vec_id, iv,
                   CAST(list_sum(list_transform(generate_series(1, len(iv)),
                        i -> iv[i] * iv[i])) AS BIGINT) AS nrm
            FROM base
        ), proj AS (
            SELECT vec_id, {', '.join(plane_terms)} FROM base
        ), bucketed AS (
            SELECT vec_id, CAST({bucket_expr} AS BIGINT) AS bucket FROM proj
        ), probes AS (
            SELECT b.vec_id, xor(b.bucket, t.m) AS pb
            FROM bucketed b, UNNEST([{masks}]) AS t(m)
        ), scored AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {pair_dot.replace('q.', 'a.').replace('c.', 'b.')} AS dot,
                   a.nrm AS nrm_a, b.nrm AS nrm_b
            FROM probes p
            JOIN bucketed cb ON cb.bucket = p.pb AND p.vec_id < cb.vec_id
            JOIN normed a ON a.vec_id = p.vec_id
            JOIN normed b ON b.vec_id = cb.vec_id
        )
        SELECT id_a, id_b,
               dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
        FROM scored
        WHERE dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) >= 0.35"""

    return {
        "events_common_ref": common_ref,
        "emb_ann_topk_lsh": ann_lsh,
        "docs_media_stats": media_stats,
        "emb_cosine_neardup_lsh": neardup_lsh,
    }


ORACLE_SQL.update(_similarity_oracles())
ORACLE_SQL.update(_text_oracles())
ORACLE_SQL.update(_extension_oracles())
ORACLE_SQL.update(_signal_oracles())
ORACLE_SQL["docs_curation_funnel"] = _funnel_oracle()

# As-of join: the oracle is DuckDB's NATIVE ASOF LEFT JOIN — an
# independent implementation of the same semantics, cross-validating
# the engine's union+window-carry formulation.
ORACLE_SQL["events_asof"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS us, event_id AS view_id, value
        FROM events WHERE event_type = 'view'
    ), p0 AS (
        SELECT user_id, epoch_us(ts) AS us, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                    ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), p AS (
        SELECT user_id, us, value FROM p0 WHERE rn = 1
    )
    SELECT v.user_id, v.us AS view_us, v.view_id,
           p.us AS purchase_us, p.value AS purchase_value
    FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.us >= p.us"""

# nearest = closer of DuckDB's native backward and forward ASOF joins,
# backward on exact ties (pandas merge_asof semantics)
ORACLE_SQL["events_asof_nearest"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS us, event_id AS view_id, value
        FROM events WHERE event_type = 'view'
    ), p0 AS (
        SELECT user_id, epoch_us(ts) AS us, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                    ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), p AS (
        SELECT user_id, us, value FROM p0 WHERE rn = 1
    ), b AS (
        SELECT v.user_id, v.us, v.view_id, p.us AS bus, p.value AS bval
        FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.us >= p.us
    ), f AS (
        SELECT v.user_id, v.us, v.view_id, p.us AS fus, p.value AS fval
        FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.us <= p.us
    )
    SELECT b.user_id, b.us AS view_us, b.view_id,
           CASE WHEN b.bus IS NULL THEN f.fus
                WHEN f.fus IS NULL THEN b.bus
                WHEN (b.us - b.bus) <= (f.fus - f.us) THEN b.bus
                ELSE f.fus END AS purchase_us,
           CASE WHEN b.bus IS NULL THEN f.fval
                WHEN f.fus IS NULL THEN b.bval
                WHEN (b.us - b.bus) <= (f.fus - f.us) THEN b.bval
                ELSE f.fval END AS purchase_value
    FROM b JOIN f ON b.user_id = f.user_id AND b.us = f.us AND b.view_id = f.view_id"""
# S11/A9 audit: one hash aggregation per user.
ORACLE_SQL["events_audit"] = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT epoch_us(ts)) AS BIGINT) AS n_distinct,
           MIN(epoch_us(ts)) AS ts_min,
           MAX(epoch_us(ts)) AS ts_max,
           COUNT(*) != COUNT(DISTINCT epoch_us(ts)) AS has_duplicates
    FROM events GROUP BY user_id"""

# Frame sampling: every 3rd 16-byte frame, exact integer byte stats.
ORACLE_SQL["docs_media_frames"] = """
    WITH b AS (
        SELECT doc_id AS media_id, text, length(text) AS n_chars
        FROM documents WHERE length(text) = strlen(text)
    ), f AS (
        SELECT media_id, CAST(t.fi AS BIGINT) AS frame_idx,
               substr(text, CAST(t.fi * 16 + 1 AS BIGINT), 16) AS fr
        FROM b, UNNEST(generate_series(0, CAST(n_chars // 16 AS BIGINT) - 1, 3)) AS t(fi)
        WHERE n_chars >= 16
    )
    SELECT media_id, frame_idx, CAST(16 AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(generate_series(1, 16),
                i -> ord(substr(fr, i, 1)))) AS BIGINT) AS byte_sum,
           CAST(list_sum(list_transform(generate_series(1, 16),
                i -> ord(substr(fr, i, 1)))) AS DOUBLE) / (16 * 255) AS mean_px
    FROM f"""

# Audio windowing: every full 32-byte window, exact integer deviation
# stats; rms is a fixed double chain (/32 and /128 are powers of two,
# sqrt is IEEE-correctly-rounded, so both engines agree bit-for-bit).
ORACLE_SQL["docs_media_audio"] = """
    WITH b AS (
        SELECT doc_id AS media_id, text, length(text) AS n
        FROM documents WHERE length(text) = strlen(text)
    ), w AS (
        SELECT media_id, CAST(t.wi AS BIGINT) AS window_idx,
               substr(text, CAST(t.wi * 32 + 1 AS BIGINT), 32) AS seg
        FROM b, UNNEST(generate_series(0, CAST(n // 32 AS BIGINT) - 1)) AS t(wi)
        WHERE n >= 32
    ), s AS (
        SELECT media_id, window_idx,
               CAST(list_sum(list_transform(generate_series(1, 32),
                    i -> (ord(substr(seg, i, 1)) - 128) * (ord(substr(seg, i, 1)) - 128))) AS BIGINT) AS sum_dev2,
               CAST(list_max(list_transform(generate_series(1, 32),
                    i -> abs(ord(substr(seg, i, 1)) - 128))) AS BIGINT) AS peak_dev,
               CAST(len(list_filter(generate_series(1, 32),
                    i -> abs(ord(substr(seg, i, 1)) - 128) >= 127)) AS BIGINT) AS n_clipped
        FROM w
    )
    SELECT media_id, window_idx, sum_dev2, peak_dev, n_clipped,
           sqrt(CAST(sum_dev2 AS DOUBLE) / 32) / 128 AS rms
    FROM s"""

# wav round-trip is lossless over byte-128 samples: same oracle as raw8
ORACLE_SQL["docs_media_wav_roundtrip"] = ORACLE_SQL["docs_media_audio"]

# Nearest-neighbor resize to 4x8: per-output-pixel byte fetch with the
# same trunc(i*in/out) index mapping the kernel uses.
ORACLE_SQL["docs_media_resize"] = """
    WITH b AS (
        SELECT doc_id AS media_id, text,
               CAST(length(text) // 16 AS BIGINT) AS h
        FROM documents WHERE length(text) >= 16 AND length(text) = strlen(text)
    ), g AS (
        SELECT media_id, text, h, CAST(t.r AS BIGINT) AS r, CAST(t2.c AS BIGINT) AS c
        FROM b, UNNEST(generate_series(0, 3)) AS t(r),
                UNNEST(generate_series(0, 7)) AS t2(c)
    )
    SELECT media_id, r, c,
           CAST(ord(substr(text,
                CAST(LEAST(CAST(floor(r * h / 4.0) AS BIGINT), h - 1) * 16
                     + LEAST(CAST(floor(c * 16 / 8.0) AS BIGINT), 15) + 1 AS BIGINT),
                1)) AS BIGINT) AS px
    FROM g"""

# IVF with frozen integer centroids: assignment, nprobe selection and
# ranking replayed in exact BIGINT arithmetic.
_ivf_cent_rows = ",\n            ".join(
    f"({ci}, [{', '.join(str(v) for v in c)}])"
    for ci, c in enumerate(_IVF_FROZEN_CENTS)
)
ORACLE_SQL["emb_ann_topk_ivf_frozen"] = f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
        FROM embeddings
    ), normed AS (
        SELECT vec_id, iv,
               CAST(list_sum(list_transform(generate_series(1, len(iv)),
                    i -> iv[i] * iv[i])) AS BIGINT) AS nrm
        FROM base
    ), cents(c, civ) AS (
        VALUES {_ivf_cent_rows}
    ), dists AS (
        SELECT n.vec_id, n.iv, n.nrm, c.c,
               CAST(list_sum(list_transform(generate_series(1, 64),
                    i -> (n.iv[i] - c.civ[i]) * (n.iv[i] - c.civ[i]))) AS BIGINT) AS d
        FROM normed n CROSS JOIN cents c
    ), corpus AS (
        SELECT vec_id, iv, nrm, c AS cl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM dists
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id, iv, nrm, c AS pcl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM dists WHERE vec_id < 20
        ) WHERE rn <= 2
    ), scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                    i -> q.iv[i] * t.iv[i])) AS BIGINT) AS dot,
               q.nrm AS nrm_a, t.nrm AS nrm_b
        FROM probes q JOIN corpus t ON q.pcl = t.cl AND t.vec_id != q.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank,
           dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
    FROM ranked WHERE rank <= 5"""

# Fitted IVF: the integer-quantized Lloyd fit unrolled as chained CTEs
# (seeds = 16 smallest vec_ids; per iteration: exact int64 argmin
# assignment → per-dim integer sums → floor-divided centroid update;
# empty clusters keep their previous centroid), then the same frozen
# search shape (nprobe=4). Bit-exact vs sim.ivf_fit_centroids +
# sim.ann_topk_ivf because every quantity on both sides is int64.
def _ivf_fit_prefix(k: int, n_iter: int, fit_fraction: float) -> str:
    """WITH-prefix replaying the sampled integer IVF coarse fit:
    base → normed → fitset (the engine-portable md5 hash-sample, the
    Spark side's operators/sampling.hash_bucket construction) →
    cents0..cents{n_iter}. The search half of each consumer still runs
    over the FULL corpus."""
    fit_thr = int(fit_fraction * (1 << 32))
    its = []
    for i in range(n_iter):
        its.append(f"""
    , d{i} AS (
        SELECT n.vec_id, c.c,
               CAST(list_sum(list_transform(generate_series(1, 64),
                    j -> (n.iv[j] - c.civ[j]) * (n.iv[j] - c.civ[j]))) AS BIGINT) AS d
        FROM fitset n CROSS JOIN cents{i} c
    ), a{i} AS (
        SELECT vec_id, c FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM d{i}
        ) WHERE rn = 1
    ), s{i} AS (
        SELECT a.c, t.j, SUM(n.iv[t.j]) AS sv, COUNT(*) AS cnt
        FROM a{i} a JOIN fitset n USING (vec_id), UNNEST(generate_series(1, 64)) AS t(j)
        GROUP BY a.c, t.j
    ), cents{i + 1} AS (
        SELECT p.c, COALESCE(u.civ, p.civ) AS civ
        FROM cents{i} p LEFT JOIN (
            SELECT c, list(CAST(floor(CAST(sv AS DOUBLE) / cnt) AS BIGINT) ORDER BY j) AS civ
            FROM s{i} GROUP BY c
        ) u ON p.c = u.c
    )""")
    return f"""
    WITH base AS (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
        FROM embeddings
    ), normed AS (
        SELECT vec_id, iv,
               CAST(list_sum(list_transform(generate_series(1, len(iv)),
                    i -> iv[i] * iv[i])) AS BIGINT) AS nrm
        FROM base
    ), fitset AS (
        SELECT vec_id, iv FROM normed
        WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT < {fit_thr}
    ), cents0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c, iv AS civ
        FROM (SELECT vec_id, iv FROM fitset ORDER BY vec_id LIMIT {k})
    ){''.join(its)}"""


def _ivf_fitted_oracle(
    k: int = 16, n_iter: int = 3, nprobe: int = 4, fit_fraction: float = 0.5
) -> str:
    return f"""{_ivf_fit_prefix(k, n_iter, fit_fraction)}
    , fdist AS (
        SELECT n.vec_id, n.iv, n.nrm, c.c,
               CAST(list_sum(list_transform(generate_series(1, 64),
                    j -> (n.iv[j] - c.civ[j]) * (n.iv[j] - c.civ[j]))) AS BIGINT) AS d
        FROM normed n CROSS JOIN cents{n_iter} c
    ), corpus AS (
        SELECT vec_id, iv, nrm, c AS cl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id, iv, nrm, c AS pcl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist WHERE vec_id < 20
        ) WHERE rn <= {nprobe}
    ), scored AS (
        SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                    i -> q.iv[i] * t.iv[i])) AS BIGINT) AS dot,
               q.nrm AS nrm_a, t.nrm AS nrm_b
        FROM probes q JOIN corpus t ON q.pcl = t.cl AND t.vec_id != q.vec_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank,
           dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
    FROM ranked WHERE rank <= 5"""


ORACLE_SQL["emb_ann_topk_ivf"] = _ivf_fitted_oracle()


def _pq_fitted_oracle(
    k: int = 5,
    n_centroids: int = 16,
    n_iter: int = 3,
    nprobe: int = 4,
    m: int = 4,
    pq_k: int = 16,
    pq_iter: int = 2,
    refine: int = 32,
    fit_fraction: float = 0.5,
    dim: int = 64,
) -> str:
    """DuckDB replay of the WHOLE IVFADC pipeline: sampled integer IVF
    fit (shared prefix), sampled per-subspace integer PQ fits (subspace
    rides the CTEs as a key column — one Lloyd chain covers all ``m``
    codebooks), corpus cell assignment + PQ encode, per-probe ADC dot
    tables, cell-restricted ADC shortlist of ``refine``, exact integer
    re-rank."""
    d = dim // m
    pq_its = []
    for i in range(pq_iter):
        pq_its.append(f"""
    , pd{i} AS (
        SELECT n.vec_id, n.j, c.c,
               CAST(list_sum(list_transform(generate_series(1, {d}),
                    t -> (n.siv[t] - c.civ[t]) * (n.siv[t] - c.civ[t]))) AS BIGINT) AS dd
        FROM fitsub n JOIN pcents{i} c ON n.j = c.j
    ), pa{i} AS (
        SELECT vec_id, j, c FROM (
            SELECT vec_id, j, c, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dd, c) AS rn
            FROM pd{i}
        ) WHERE rn = 1
    ), ps{i} AS (
        SELECT a.j, a.c, t.t, SUM(n.siv[t.t]) AS sv, COUNT(*) AS cnt
        FROM pa{i} a JOIN fitsub n ON a.vec_id = n.vec_id AND a.j = n.j,
             UNNEST(generate_series(1, {d})) AS t(t)
        GROUP BY a.j, a.c, t.t
    ), pcents{i + 1} AS (
        SELECT p.j, p.c, COALESCE(u.civ, p.civ) AS civ
        FROM pcents{i} p LEFT JOIN (
            SELECT j, c, list(CAST(floor(CAST(sv AS DOUBLE) / cnt) AS BIGINT) ORDER BY t) AS civ
            FROM ps{i} GROUP BY j, c
        ) u ON p.j = u.j AND p.c = u.c
    )""")
    return f"""{_ivf_fit_prefix(n_centroids, n_iter, fit_fraction)}
    , fitsub AS (
        SELECT vec_id, sj.j, list_slice(iv, sj.j * {d} + 1, sj.j * {d} + {d}) AS siv
        FROM fitset, UNNEST(generate_series(0, {m - 1})) AS sj(j)
    ), pcents0 AS (
        SELECT s.j, CAST(ROW_NUMBER() OVER (PARTITION BY s.j ORDER BY s.vec_id) - 1 AS INT) AS c,
               s.siv AS civ
        FROM fitsub s
        WHERE s.vec_id IN (SELECT vec_id FROM fitset ORDER BY vec_id LIMIT {pq_k})
    ){''.join(pq_its)}
    , fdist AS (
        SELECT n.vec_id, n.nrm, c.c,
               CAST(list_sum(list_transform(generate_series(1, {dim}),
                    j -> (n.iv[j] - c.civ[j]) * (n.iv[j] - c.civ[j]))) AS BIGINT) AS d
        FROM normed n CROSS JOIN cents{n_iter} c
    ), cells AS (
        SELECT vec_id, c AS cl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist
        ) WHERE rn = 1
    ), allsub AS (
        SELECT vec_id, sj.j, list_slice(iv, sj.j * {d} + 1, sj.j * {d} + {d}) AS siv
        FROM normed, UNNEST(generate_series(0, {m - 1})) AS sj(j)
    ), ecodes AS (
        SELECT vec_id, j, c AS cj FROM (
            SELECT n.vec_id, n.j, c.c,
                   ROW_NUMBER() OVER (PARTITION BY n.vec_id, n.j ORDER BY
                        CAST(list_sum(list_transform(generate_series(1, {d}),
                             t -> (n.siv[t] - c.civ[t]) * (n.siv[t] - c.civ[t]))) AS BIGINT), c.c) AS rn
            FROM allsub n JOIN pcents{pq_iter} c ON n.j = c.j
        ) WHERE rn = 1
    ), pcells AS (
        SELECT vec_id, c AS pcl FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
            FROM fdist WHERE vec_id < 20
        ) WHERE rn <= {nprobe}
    ), ptab AS (
        SELECT q.vec_id, c.j, c.c,
               CAST(list_sum(list_transform(generate_series(1, {d}),
                    t -> q.siv[t] * c.civ[t])) AS BIGINT) AS tv
        FROM allsub q JOIN pcents{pq_iter} c ON q.j = c.j
        WHERE q.vec_id < 20
    ), adc AS (
        SELECT p.vec_id AS query_id, t.vec_id AS neighbor_id,
               CAST(SUM(pt.tv) AS BIGINT) AS adc
        FROM pcells p
        JOIN cells t ON p.pcl = t.cl AND t.vec_id != p.vec_id
        JOIN ecodes e ON e.vec_id = t.vec_id
        JOIN ptab pt ON pt.vec_id = p.vec_id AND pt.j = e.j AND pt.c = e.cj
        GROUP BY p.vec_id, t.vec_id
    ), shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc DESC, neighbor_id ASC) AS rr
            FROM adc
        ) WHERE rr <= {refine}
    ), rescored AS (
        SELECT s.query_id, s.neighbor_id,
               CAST(list_sum(list_transform(generate_series(1, {dim}),
                    i -> q.iv[i] * t.iv[i])) AS BIGINT) AS dot,
               q.nrm AS nrm_a, t.nrm AS nrm_b
        FROM shortlist s
        JOIN normed q ON q.vec_id = s.query_id
        JOIN normed t ON t.vec_id = s.neighbor_id
    ), rranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot DESC, neighbor_id ASC) AS BIGINT) AS rank
        FROM rescored
    )
    SELECT query_id, neighbor_id, rank,
           dot / (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))) AS cos
    FROM rranked WHERE rank <= {k}"""


ORACLE_SQL["emb_ann_topk_ivf_pq"] = _pq_fitted_oracle()

# F2 chunked: core-exact halo contract — same oracle as whole-epoch FIR.
ORACLE_SQL["events_filtfilt_chunked"] = ORACLE_SQL["events_filtfilt"]

# W1 chunked: result is exactly the global-window debounce — the oracle
# replays threshold + LEAD on the dense rn streams.
ORACLE_SQL["events_crossings_chunked"] = f"""
    WITH {_ORDERED_LISTS_CTE}, thr AS (
        SELECT user_id, CAST(MEDIAN(ABS(value)) AS DOUBLE) / 0.6745 AS threshold
        FROM ordered GROUP BY user_id
    ), led AS (
        SELECT user_id, rn, value,
               LEAD(value) OVER (PARTITION BY user_id ORDER BY rn) AS nv
        FROM ordered
    )
    SELECT o.user_id, o.rn AS seq, CAST(o.value AS DOUBLE) AS value
    FROM led o JOIN thr t ON o.user_id = t.user_id
    WHERE o.value > t.threshold AND o.nv > t.threshold"""

# chunk-level dedup over the same windows; canonical = (min doc, min
# chunk) lexicographic, matching min(struct) on the Spark side
ORACLE_SQL["docs_chunk_dedup"] = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), ck AS (
        SELECT doc_id, CAST(s.i AS BIGINT) AS chunk_idx,
               md5(array_to_string(list_slice(t, s.i * 24 + 1, s.i * 24 + 32), ' ')) AS chunk_hash
        FROM toks, UNNEST(generate_series(0, (len(t) - 1) // 24)) AS s(i)
    )
    SELECT chunk_hash, n_copies,
           CAST(mp // 4294967296 AS BIGINT) AS canonical_doc,
           CAST(mp % 4294967296 AS BIGINT) AS canonical_chunk
    FROM (
        SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_copies,
               MIN(doc_id * 4294967296 + chunk_idx) AS mp
        FROM ck GROUP BY chunk_hash
    )"""

ORACLE_SQL["docs_repetition"] = """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                   list_transform(generate_series(1, len(t) - 2),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE [] END AS grams
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)
    ), c AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams
        FROM g
    )
    SELECT doc_id, n_grams, n_distinct_grams,
           CASE WHEN n_grams > 0
                THEN CAST(n_grams - n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END AS dup_frac,
           (CASE WHEN n_grams > 0
                THEN CAST(n_grams - n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END) > 0.05 AS is_repetitive
    FROM c"""

ORACLE_SQL["docs_decontaminate"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
        SELECT doc_id, CASE WHEN len(t) >= 8 THEN
            list_distinct(list_transform(generate_series(1, len(t) - 7),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                  || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))
            ELSE [] END AS shingles FROM toks
    ), hashes AS (
        SELECT doc_id, ('0x' || substr(md5(s.s), 1, 8))::BIGINT % {sim.P} AS h
        FROM sh, UNNEST(shingles) AS s(s)
    ), ev AS (
        SELECT DISTINCT h FROM hashes WHERE doc_id % 50 = 0
    ), shared AS (
        SELECT t.doc_id, CAST(COUNT(DISTINCT t.h) AS BIGINT) AS n_shared
        FROM hashes t JOIN ev USING (h)
        WHERE t.doc_id % 50 != 0
        GROUP BY t.doc_id
    )
    SELECT d.doc_id, COALESCE(s.n_shared, 0) AS n_shared,
           COALESCE(s.n_shared, 0) >= 2 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
    LEFT JOIN shared s ON d.doc_id = s.doc_id"""

# Sequence packing: chunk starts every 24 tokens, 32-token windows
# (ragged tail kept); DuckDB list_slice clamps exactly like Spark slice
# PNG round-trip is lossless: the oracle is the plain raw-byte stats
ORACLE_SQL["docs_media_png_roundtrip"] = """
    WITH b AS (
        SELECT doc_id AS media_id,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(COALESCE(list_sum(list_transform(generate_series(1, length(text)),
                    i -> ord(substr(text, i, 1)))), 0) AS BIGINT) AS byte_sum
        FROM documents WHERE length(text) = strlen(text)
    )
    SELECT media_id, n_bytes, byte_sum,
           CASE WHEN n_bytes = 0 THEN 0.0
                ELSE CAST(byte_sum AS DOUBLE) / CAST(n_bytes * 255 AS DOUBLE)
           END AS mean_px
    FROM b"""

ORACLE_SQL["docs_chunking"] = """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), ck AS (
        SELECT doc_id, CAST(s.i AS BIGINT) AS chunk_idx,
               CAST(s.i * 24 AS BIGINT) AS start_tok,
               list_slice(t, s.i * 24 + 1, s.i * 24 + 32) AS w
        FROM toks, UNNEST(generate_series(0, (len(t) - 1) // 24)) AS s(i)
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(len(w) AS BIGINT) AS n_tokens,
           md5(array_to_string(w, ' ')) AS chunk_hash
    FROM ck"""

ORACLE_SQL["docs_vocab_topdf"] = """
    WITH tok AS (
        SELECT lang AS grp, doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
        FROM documents
    ), dfc AS (
        SELECT grp, token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY grp, token
    ), r AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY grp
                ORDER BY df DESC, token ASC) AS BIGINT) AS rank
        FROM dfc
    )
    SELECT grp AS lang, token, df, rank FROM r WHERE rank <= 10"""

ORACLE_SQL["docs_domain_mixture"] = """
    WITH per AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
    FROM per"""

def _spike_cluster_oracle(k: int = 4, n_iter: int = 2, dim: int = 8) -> str:
    """Replay detection → integer patch features → integer Lloyd →
    assignment (events_spike_clusters)."""
    its = []
    for i in range(n_iter):
        its.append(f"""
        , kd{i} AS (
            SELECT n.sid, c.c,
                   CAST(list_sum(list_transform(generate_series(1, {dim}),
                        t -> (n.iv[t] - c.civ[t]) * (n.iv[t] - c.civ[t]))) AS BIGINT) AS d
            FROM wvq n CROSS JOIN kc{i} c
        ), ka{i} AS (
            SELECT sid, c FROM (
                SELECT sid, c, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d, c) AS rn
                FROM kd{i}
            ) WHERE rn = 1
        ), ks{i} AS (
            SELECT a.c, t.t, SUM(n.iv[t.t]) AS sv, COUNT(*) AS cnt
            FROM ka{i} a JOIN wvq n USING (sid),
                 UNNEST(generate_series(1, {dim})) AS t(t)
            GROUP BY a.c, t.t
        ), kc{i + 1} AS (
            SELECT p.c, COALESCE(u.civ, p.civ) AS civ
            FROM kc{i} p LEFT JOIN (
                SELECT c, list(CAST(floor(CAST(sv AS DOUBLE) / cnt) AS BIGINT) ORDER BY t) AS civ
                FROM ks{i} GROUP BY c
            ) u ON p.c = u.c
        )""")
    return f"""{_detect_cte(2.0, 5, "user_id < 16")}
        , wvq AS (
            SELECT DISTINCT user_id, peak_seq,
                   list_transform(generate_series(0, {dim - 1}), j ->
                       CAST(CAST((CASE WHEN d.peak_seq - 4 + j BETWEEN 0 AND d.n - 1
                            THEN d.xs[d.peak_seq - 4 + j + 1] ELSE 0.0 END) AS DECIMAL(18,4))
                            * 100 AS BIGINT)) AS iv,
                   user_id * 4294967296 + peak_seq AS sid
            FROM located d
        ), kc0 AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY sid) - 1 AS INT) AS c, iv AS civ
            FROM (SELECT sid, iv FROM wvq ORDER BY sid LIMIT {k})
        ){''.join(its)}
        , fdist AS (
            SELECT n.user_id, n.peak_seq, c.c,
                   CAST(list_sum(list_transform(generate_series(1, {dim}),
                        t -> (n.iv[t] - c.civ[t]) * (n.iv[t] - c.civ[t]))) AS BIGINT) AS d
            FROM wvq n CROSS JOIN kc{n_iter} c
        )
        SELECT user_id, peak_seq, CAST(c AS BIGINT) AS cluster FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, peak_seq ORDER BY d, c) AS rn
            FROM fdist
        ) WHERE rn = 1"""


ORACLE_SQL["events_spike_clusters"] = _spike_cluster_oracle()

# W1 polarity='both' — the two-sided debounce on the constant-centered
# stream (MAD multiplier 1.0; the dense rn stream makes LEAD the ts+1
# sample, so the step gate is implied)
ORACLE_SQL["events_crossings_both"] = f"""
    WITH {_ORDERED_LISTS_CTE}, centered AS (
        SELECT user_id, rn, value - 245.0 AS value FROM ordered
    ), thr AS (
        SELECT user_id, CAST(0.75 * MEDIAN(ABS(value)) AS DOUBLE) / 0.6745 AS threshold
        FROM centered GROUP BY user_id
    ), led AS (
        SELECT user_id, rn, value,
               LEAD(value) OVER (PARTITION BY user_id ORDER BY rn) AS nv
        FROM centered
    )
    SELECT o.user_id, o.rn AS seq, CAST(o.value AS DOUBLE) AS value
    FROM led o JOIN thr t ON o.user_id = t.user_id
    WHERE ABS(o.value) > t.threshold AND ABS(o.nv) > t.threshold"""

# S9 round-trip: a correct sink/scan is invisible — the oracle is the
# detection oracle itself, scoped to the query's 16-channel subset (the
# sink surface needs correctness coverage, not full-corpus throughput).
ORACLE_SQL["events_spikes_roundtrip"] = f"""{_detect_cte(2.0, 5, "user_id < 16")}
        SELECT d.user_id, d.crossing_seq, d.peak_seq, CAST(t.j AS BIGINT) AS idx,
               CASE WHEN d.peak_seq - 4 + t.j BETWEEN 0 AND d.n - 1
                    THEN d.xs[d.peak_seq - 4 + t.j + 1] ELSE 0.0 END AS wv
        FROM located d, UNNEST(generate_series(0, 7)) AS t(j)"""

# Integer-exact tf·idf: idf_q = (N · 10^6) // df is floor division on
# both engines; score = tf · idf_q is BIGINT, ties (score DESC, token).
ORACLE_SQL["docs_tfidf_top"] = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ), tfc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
    ), dfc AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY token
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ), scored AS (
        SELECT t.doc_id, t.token, t.tf, d.df,
               CAST(t.tf * ((nn.n * 1000000) // d.df) AS BIGINT) AS score
        FROM tfc t JOIN dfc d USING (token) CROSS JOIN nn
    )
    SELECT doc_id, token, tf, df, score, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token ASC) AS rank
        FROM scored
    ) WHERE rank <= 3"""

# Bigram-LM fluency: model = global bigram counts, score = mean corpus
# frequency of the doc's bigrams (BIGINT sums, one final division).
ORACLE_SQL["docs_bigram_fluency"] = """
    WITH bgs AS (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM (SELECT doc_id, lang,
                     string_split_regex(trim(text), '\\s+') AS t
              FROM documents)
    ), model AS (
        SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bgs GROUP BY bg
    ), agg AS (
        SELECT b.doc_id, b.lang,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(m.cnt) AS BIGINT) AS freq_sum
        FROM bgs b JOIN model m USING (bg)
        GROUP BY b.doc_id, b.lang
    )
    SELECT doc_id, lang, n_bigrams, freq_sum,
           CAST(freq_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS fluency
    FROM agg"""

# k-NN label vote: exact integer dots, (dot DESC, neighbor) top-10,
# (votes DESC, label) argmax — all-integer output.
ORACLE_SQL["emb_knn_classify"] = f"""
    WITH base AS (
        SELECT vec_id, label, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * {sim.EMB_SCALE}) AS BIGINT)) AS iv
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, CAST(q.label AS BIGINT) AS true_label,
               c.vec_id AS neighbor_id, CAST(c.label AS BIGINT) AS nbr_label,
               CAST(list_sum(list_transform(generate_series(1, len(q.iv)),
                    i -> q.iv[i] * c.iv[i])) AS BIGINT) AS dot
        FROM base q JOIN base c ON q.vec_id < 50 AND c.vec_id != q.vec_id
    ), top AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, neighbor_id ASC) AS nrank
            FROM scored
        ) WHERE nrank <= 10
    ), votes AS (
        SELECT query_id, true_label, nbr_label, CAST(COUNT(*) AS BIGINT) AS votes
        FROM top GROUP BY query_id, true_label, nbr_label
    )
    SELECT query_id, true_label, nbr_label AS pred_label, votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY votes DESC, nbr_label ASC) AS vrank
        FROM votes
    ) WHERE vrank = 1"""

# Band power on the exact FIR chain: quanta floor is identical FLOOR()
# on both engines; Σq² needs CAST (DuckDB SUM promotes to HUGEINT).
ORACLE_SQL["events_band_power"] = f"""
    WITH {_ORDERED_LISTS_CTE}, filt AS (
        SELECT o.user_id, {_fir_chain_sql(_BP_TAPS)} AS filtered
        FROM ordered o JOIN lists l ON o.user_id = l.user_id
    ), qq AS (
        SELECT user_id, CAST(FLOOR(filtered * 1000.0) AS BIGINT) AS q FROM filt
    ), agg AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q * q) AS BIGINT) AS power_q
        FROM qq GROUP BY user_id
    )
    SELECT user_id, n, power_q,
           CAST(power_q AS DOUBLE) / CAST(n AS DOUBLE) AS band_power
    FROM agg"""

# Q10/Q18 oracles share the split-sum revenue recombination (see
# _disc_price_sum: identical expression tree → hash-equal at any sf).
_REV_SPLIT_SQL = f"""(CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) // 2147483648) AS BIGINT) AS DOUBLE)
                    * 2147483648.0
                + CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) % 2147483648) AS BIGINT) AS DOUBLE))
                   / 100000000.0"""

ORACLE_SQL["q10_returned_items"] = f"""
    SELECT c_custkey, c_name, c_acctbal, n_name, {_REV_SPLIT_SQL} AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20"""

ORACLE_SQL["q18_large_volume_customers"] = """
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
    )
    SELECT c_name, c_custkey, o_orderkey,
           epoch_us(o_orderdate) AS o_orderdate_us, o_totalprice, total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100"""


def _ann_recall_oracle() -> str:
    """Compose the recall audit from the ALREADY-VERIFIED per-method
    oracles (brute / LSH / frozen-IVF result sets as subquery CTEs) —
    the metric layer adds only integer counts + one division."""
    exact_sql = ORACLE_SQL["emb_ann_topk"]
    method_sqls = {
        "lsh": ORACLE_SQL["emb_ann_topk_lsh"],
        "ivf": ORACLE_SQL["emb_ann_topk_ivf_frozen"],
    }
    parts = []
    for m, msql in method_sqls.items():
        parts.append(f"""
    SELECT '{m}' AS method, ne.query_id, ne.n_exact,
           COALESCE(na.n_approx, CAST(0 AS BIGINT)) AS n_approx,
           COALESCE(nov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap
    FROM (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM ({exact_sql}) e GROUP BY query_id
    ) ne
    LEFT JOIN (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_approx
        FROM ({msql}) a GROUP BY query_id
    ) na ON ne.query_id = na.query_id
    LEFT JOIN (
        SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM ({exact_sql}) e JOIN ({msql}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    ) nov ON ne.query_id = nov.query_id""")
    body = "\n    UNION ALL\n".join(parts)
    return f"""
    SELECT method, query_id, n_exact, n_approx, n_overlap,
           CAST(n_overlap AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
    FROM ({body})"""


ORACLE_SQL["emb_ann_recall"] = _ann_recall_oracle()

# Winsorize: discrete rank-selected p01/p99 + pure-comparison clip —
# no float arithmetic anywhere, so parity is structural.
ORACLE_SQL["events_winsorize"] = """
    WITH ranked AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, value,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY value, epoch_us(ts), event_id) AS BIGINT) - 1 AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS cnt
        FROM events
    ), q AS (
        SELECT user_id, event_id, us, value,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.01) AS BIGINT)
                   THEN value END) OVER (PARTITION BY user_id) AS lo,
               MAX(CASE WHEN rn = CAST(floor((cnt - 1) * 0.99) AS BIGINT)
                   THEN value END) OVER (PARTITION BY user_id) AS hi
        FROM ranked
    )
    SELECT user_id, event_id, us, value, lo, hi,
           LEAST(GREATEST(value, lo), hi) AS value_clipped,
           (value < lo OR value > hi) AS was_clipped
    FROM q"""

# The chunked (histogram-selection) variant computes the identical
# rank-selected band — one oracle serves both physical strategies.
ORACLE_SQL["events_winsorize_chunked"] = ORACLE_SQL["events_winsorize"]

# Streaming sessionize (availableNow, append mode): the emitted set is
# the batch gaps-and-islands sessions CLOSED by the final watermark —
# last event at least one 30-min gap before the global max event time.
ORACLE_SQL["events_sessionize_streamed"] = """
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sess AS (
        SELECT user_id, us,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    ), agg AS (
        SELECT user_id,
               MIN(us) AS session_start_us, MAX(us) AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, session_start_us, session_end_us, n_events
    FROM agg
    WHERE session_end_us + 1800000000 <= (SELECT MAX(epoch_us(ts)) FROM events)
"""

# Streaming censor (GroupState dead-time): append emission is complete,
# so the oracle is the exact greedy censor over distinct exceedances.
ORACLE_SQL["events_censor_streamed"] = """
    WITH RECURSIVE x AS (
        SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS us
        FROM events WHERE value > 150.0
    ), kept AS (
        SELECT user_id, us FROM x WHERE NOT EXISTS (
            SELECT 1 FROM x x2 WHERE x2.user_id = x.user_id AND x2.us < x.us)
        UNION ALL
        SELECT x.user_id, x.us
        FROM x JOIN kept k ON x.user_id = k.user_id AND x.us > k.us + 86400000000
        WHERE NOT EXISTS (
            SELECT 1 FROM x x2
            WHERE x2.user_id = x.user_id AND x2.us > k.us + 86400000000 AND x2.us < x.us)
    )
    SELECT user_id, us FROM kept
"""

ORACLE_SQL["events_xcorr"] = f"""
    WITH s AS (
        SELECT user_id AS ch,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS t,
               CAST(floor(value * 1000) AS BIGINT) AS iv
        FROM events WHERE user_id < 4
    ), lags(lag_k) AS (
        SELECT CAST(x AS BIGINT) FROM UNNEST([-2, -1, 0, 1, 2]) AS u(x)
    ), pr AS (
        SELECT a.ch AS ch_a, b.ch AS ch_b, l.lag_k,
               a.iv AS ia, b.iv AS ib
        FROM s a CROSS JOIN lags l
        JOIN s b ON b.t = a.t + l.lag_k AND a.ch < b.ch
    ), m AS (
        SELECT ch_a, ch_b, lag_k, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ia) AS BIGINT) AS sa, CAST(SUM(ib) AS BIGINT) AS sb,
               CAST(SUM(ia * ia) AS BIGINT) AS saa,
               CAST(SUM(ib * ib) AS BIGINT) AS sbb,
               CAST(SUM(ia * ib) AS BIGINT) AS sab
        FROM pr GROUP BY ch_a, ch_b, lag_k
    )
    SELECT ch_a, ch_b, lag_k, n, sab, {_XCORR_CORR} AS corr FROM m"""

# Sequence packing: per-shard running token offset (window cumsum),
# seq assignment by integer floor-division of the start offset.
ORACLE_SQL["docs_pack_sequences"] = """
    WITH base AS (
        SELECT source, doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nt
        FROM documents
    ), offs AS (
        SELECT source, nt,
               CAST(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
                    AS BIGINT) AS off
        FROM base
    ), per_doc AS (
        SELECT source, nt,
               off // 2048 AS seq_id,
               ((off + nt - 1) // 2048) > (off // 2048) AS straddles
        FROM offs
    )
    SELECT source, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
    FROM per_doc GROUP BY source, seq_id"""

_PROMO_QUANTA = (
    f"CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_QUANTA} ELSE CAST(0 AS BIGINT) END"
)
ORACLE_SQL["q14_promo_effect"] = f"""
    SELECT 100.0 *
           ((CAST(CAST(SUM(({_PROMO_QUANTA}) // 2147483648) AS BIGINT) AS DOUBLE)
                * 2147483648.0
             + CAST(CAST(SUM(({_PROMO_QUANTA}) % 2147483648) AS BIGINT) AS DOUBLE))
            / 100000000.0)
           /
           ((CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) // 2147483648) AS BIGINT) AS DOUBLE)
                * 2147483648.0
             + CAST(CAST(SUM(({_DISC_PRICE_QUANTA}) % 2147483648) AS BIGINT) AS DOUBLE))
            / 100000000.0) AS promo_revenue_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'"""

# Mixture rebalancing: computed per-stratum fraction min(1, t·N/n_g) in
# the identical float tree, md5-threshold membership.
_REBALANCE_CASE = "CASE " + " ".join(
    f"WHEN d.lang = '{k}' THEN {v!r}" for k, v in sorted(_REBALANCE_TARGETS.items())
) + " ELSE 0.0 END"
ORACLE_SQL["docs_rebalance_sample"] = f"""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g FROM documents GROUP BY lang
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM documents
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN counts c ON d.lang = c.lang CROSS JOIN tot
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT <
          CAST(floor(LEAST(({_REBALANCE_CASE}) * CAST(n_tot AS DOUBLE)
                           / CAST(n_g AS DOUBLE), 1.0) * 4294967296.0) AS BIGINT)"""
