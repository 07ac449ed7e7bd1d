"""Deterministic distributed sketches.

Spark's own ``approx_count_distinct`` (HLL++) and DuckDB's
``approx_count_distinct`` use different hash functions and register
layouts, so their estimates can never cross-verify. This module builds
the sketch from ENGINE-PORTABLE primitives instead — the md5-derived
32-bit hash the sampling/sharding operators already use — which makes
every stage integer-exact and replayable in plain SQL: the register
table, the rank-of-leading-bit, even the final harmonic-mean estimate
(a sum of exact binary fractions — no rounding anywhere, in any
summation order), all hash-match an independent engine. A sketch you
can AUDIT, not just trust.

Scale shape: one explode + one two-level aggregate with map-side
combine — registers are (group, m) rows, m per group, regardless of
corpus size; merging shards is ``max`` per register (the HLL merge
law), so partial aggregation is exactly the distributed merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha_64: the standard HLL bias constant for m = 64 registers
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hash32(col: str) -> F.Column:
    """The engine-portable 32-bit hash — sampling.hash_bucket VERBATIM
    (delegated since r17: one md5/conv recipe, one definition; the
    oracle's ``('0x' || substr(md5, 1, 8))::BIGINT`` twin)."""
    from jagular_spark.operators.sampling import hash_bucket

    return hash_bucket(col)


def _hll_register_rank_rows(
    df: DataFrame, item_col: str, group_cols: list[str], m: int
) -> DataFrame:
    """Pre-aggregate HLL rows ``(*group_cols, register, rank)`` — the
    single construction both :func:`hll_register_ranks` and
    :func:`hll_distinct_with_exact` aggregate (r17: previously
    duplicated verbatim; a rank-formula fix applied to one copy would
    silently diverge the auditable estimator from its twin)."""
    import math

    b = 32 - int(math.log2(m))
    return (
        df.select(*group_cols, _hash32(item_col).alias("__h__"))
        .withColumn("__w__", F.expr(f"CAST(__h__ DIV {m} AS BIGINT)"))
        .withColumn("register", F.pmod(F.col("__h__"), F.lit(m)).cast("long"))
        .withColumn(
            "rank",
            F.when(F.col("__w__") == 0, F.lit(b + 1))
            .otherwise(F.lit(b) - F.length(F.bin(F.col("__w__"))) + F.lit(1))
            .cast("long"),
        )
    )


def _hll_est_col(m: int) -> F.Column:
    """The raw-HLL estimate ``α·m²/S`` over the aggregated ``__s__`` /
    ``n_registers`` columns — shared by both estimator entry points."""
    return F.lit(_ALPHA[m] * m * m) / (
        F.col("__s__") + (F.lit(m) - F.col("n_registers")).cast("double")
    )


def hll_register_ranks(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    m: int = 64,
) -> DataFrame:
    """Per-(group, register) max leading-one rank — the HLL register
    table. ``register = h mod m``; the rank is the position of the
    highest set bit of the REMAINING bits (via the cross-engine
    ``length(bin(w))`` trick — no float log anywhere): for
    ``w = h div m`` over ``b = 32 - log2(m)`` bits,
    ``rank = b - length(bin(w)) + 1`` and all-zero w gets ``b + 1``.
    Map-side combinable max = the HLL shard-merge law.

    Precondition: ``item_col`` must be non-null — a NULL item hashes to
    a NULL register row, which would distort ``n_registers`` in the
    estimate. Filter or coalesce NULLs before sketching."""
    return (
        _hll_register_rank_rows(df, item_col, group_cols, m)
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").cast("long").alias("max_rank"))
    )


def hll_distinct(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    m: int = 64,
) -> DataFrame:
    """Per-group HLL distinct-count estimate, every step cross-engine
    exact: registers from :func:`hll_register_ranks`; the harmonic-mean
    denominator ``S = Σ 2^(−max_rank) + (m − n_present)`` is a sum of
    exact binary fractions plus an integer — NO floating-point rounding
    in any order — and the raw estimate ``α·m²/S`` is two final float
    ops. (The small-range linear-counting correction is intentionally
    omitted: the estimator definition here is the raw HLL formula, and
    the oracle replays exactly that.) Returns
    ``(*group_cols, n_registers, est_distinct)``."""
    if m not in _ALPHA:
        raise ValueError(f"m must be one of {sorted(_ALPHA)}, got {m}")
    regs = hll_register_ranks(df, item_col, group_cols, m)
    s_present = F.sum(F.pow(F.lit(0.5), F.col("max_rank")))
    n_present = F.count(F.lit(1)).cast("long")
    return (
        regs.groupBy(*group_cols)
        .agg(s_present.alias("__s__"), n_present.alias("n_registers"))
        .withColumn("est_distinct", _hll_est_col(m))
        .drop("__s__")
    )


def hll_distinct_with_exact(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    m: int = 64,
) -> DataFrame:
    """:func:`hll_distinct` AND the exact per-group distinct count from
    ONE pass over the data — the auditable-sketch shape (estimate
    beside truth) without scanning the corpus twice.

    The trick: HLL register maxima only depend on the DISTINCT item
    values (``max`` over duplicates == ``max`` over distinct), so a
    single ``distinct()`` stage feeds a LINEAR chain — distinct
    (group, item) pairs → per-(group, register) ``max(rank)`` plus the
    register's distinct-item count → per-group estimate plus
    ``exact_distinct = Σ register counts``. One corpus scan, one
    corpus-sized exchange (the same one an exact ``countDistinct``
    needs anyway), two bounded aggregates (≤ m rows per group), no
    join. The two-scan formulation (sketch pass + countDistinct pass +
    join) computes the identical values at twice the scan cost — r15
    measured halving of ``docs_hll_vocab``'s honest work.
    ``(*group_cols, n_registers, est_distinct, exact_distinct)``."""
    if m not in _ALPHA:
        raise ValueError(f"m must be one of {sorted(_ALPHA)}, got {m}")
    dt = df.select(*group_cols, item_col).distinct()
    regs = (
        _hll_register_rank_rows(dt, item_col, group_cols, m)
        .groupBy(*group_cols, "register")
        .agg(
            F.max("rank").cast("long").alias("max_rank"),
            F.count(F.lit(1)).cast("long").alias("__n_items__"),
        )
    )
    s_present = F.sum(F.pow(F.lit(0.5), F.col("max_rank")))
    return (
        regs.groupBy(*group_cols)
        .agg(
            s_present.alias("__s__"),
            F.count(F.lit(1)).cast("long").alias("n_registers"),
            F.sum("__n_items__").cast("long").alias("exact_distinct"),
        )
        .withColumn("est_distinct", _hll_est_col(m))
        .select(*group_cols, "n_registers", "est_distinct", "exact_distinct")
    )


def _cms_cells(item_col: str, d: int, w: int) -> F.Column:
    """The d salted-md5 ``(row, cell)`` structs of one item — the ONE
    CMS cell-hash construction (r17: previously copy-pasted between
    cms_table and cms_estimate; a salt/width change applied to one
    copy would silently mispair sketch and probe, the exact agreement
    CMS correctness depends on)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"cms{j}:"), F.col(item_col))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(w),
                ).alias("cell"),
            )
            for j in range(d)
        ]
    )


def cms_table(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Count-Min Sketch cell table per group: ``d`` salted md5 hash
    rows × ``w`` counters, one ``(group, row, cell) → count`` tuple per
    occupied cell. ALL-INTEGER — the sketch, its merge (cell-wise sum,
    which is exactly what map-side partial aggregation performs), and
    every estimate replay identically on any engine. O(explode) + one
    combinable aggregate; the table is ≤ d·w rows per group regardless
    of corpus size."""
    return (
        df.select(*group_cols, F.explode(_cms_cells(item_col, d, w)).alias("rc"))
        .select(*group_cols, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .groupBy(*group_cols, "row", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    group_cols: list[str],
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a CMS table: re-derive each probe
    item's d cells (the shared :func:`_cms_cells` construction),
    LEFT-join the sketch (broadcast — it is ≤ d·w rows per group; an
    unoccupied cell counts as 0, the standard CMS estimator), take the
    MIN counter. Guaranteed ≥ the true count (all collisions inflate)
    and EVERY probe row gets a row — including duplicate probe rows,
    which each keep their own output (r17: the old groupBy over the
    probe columns collapsed duplicates and broke on probe columns
    named row/cell/cnt or of non-groupable types; probes now carry a
    unique row id through the join and the internal columns are
    collision-proofed). An item with any empty cell estimates exactly
    0 (it was certainly never inserted). Appends ``cms_count``."""
    probes = (
        items.withColumn("__rid__", F.monotonically_increasing_id())
        .withColumn("__rc__", F.explode(_cms_cells(item_col, d, w)))
        .withColumn("__row__", F.col("__rc__.row"))
        .withColumn("__cell__", F.col("__rc__.cell"))
        .drop("__rc__")
    )
    sk = sketch.select(
        *[F.col(g).alias(f"__g{i}__") for i, g in enumerate(group_cols)],
        F.col("row").alias("__srow__"),
        F.col("cell").alias("__scell__"),
        F.col("cnt").alias("__cnt__"),
    )
    cond = [probes[g] == sk[f"__g{i}__"] for i, g in enumerate(group_cols)] + [
        probes["__row__"] == sk["__srow__"],
        probes["__cell__"] == sk["__scell__"],
    ]
    joined = probes.join(F.broadcast(sk), cond, "left")
    return (
        joined.groupBy("__rid__")
        .agg(
            *[F.first(c).alias(c) for c in items.columns],
            F.min(F.coalesce(F.col("__cnt__"), F.lit(0)))
            .cast("long")
            .alias("cms_count"),
        )
        .select(*items.columns, "cms_count")
    )


def _bloom_pos(item_col: str, j: int, m_bits: int) -> F.Column:
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{j}:"), F.col(item_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long"),
        F.lit(m_bits),
    )


def bloom_bits(
    df: DataFrame, item_col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Deterministic Bloom filter as a SPARSE BITSET: ``k`` salted-md5
    positions per item, kept as distinct ``(bit)`` rows — ≤ m_bits rows
    total however large the input, mergeable by plain union+distinct.
    Like the HLL/CMS siblings, every value is an exact integer, so the
    filter — including its false positives — replays identically on any
    engine."""
    return (
        df.select(
            F.explode(
                F.array(*[_bloom_pos(item_col, j, m_bits) for j in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    items: DataFrame,
    bits: DataFrame,
    item_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Membership probe: an item is ``maybe_present`` iff ALL ``k`` of
    its bits are set (no false negatives; false-positive rate
    ≈ fill^k, and deterministic here). The bitset broadcasts — the
    probe side never shuffles. Appends ``maybe_present``.

    ONE LINEAR PLAN, no row ids: each of the ``k`` probe positions is
    resolved by its own broadcast LEFT join against the (distinct)
    bitset — a probe matches at most one bit row, so row multiplicity
    is preserved exactly and there is nothing nondeterministic to
    mispair. (An earlier formulation tagged rows with
    ``monotonically_increasing_id`` and re-joined an aggregate back —
    two plan branches evaluating the nondeterministic id
    independently, which can mispair hit counts whenever the probe set
    has an upstream shuffle, breaking the no-false-negative
    guarantee.) NULLs in carried columns never touch a join key, and a
    NULL ``item_col`` itself hashes to NULL positions and probes
    ``maybe_present = false`` — consistent with insertion, where a
    NULL item sets no bits."""
    uniq = bits.select("bit").distinct()
    out = items
    hit_cols = []
    for j in range(k):
        bcol = f"__bloom_hit_{j}__"
        out = out.join(
            F.broadcast(uniq.select(F.col("bit").alias(bcol))),
            _bloom_pos(item_col, j, m_bits) == F.col(bcol),
            "left",
        )
        hit_cols.append(bcol)
    pred = F.lit(True)
    for bcol in hit_cols:
        pred = pred & F.col(bcol).isNotNull()
    return out.withColumn("maybe_present", pred).drop(*hit_cols)
