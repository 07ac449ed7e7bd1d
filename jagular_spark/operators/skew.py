"""Skew mitigation operators (the 100-TB survival kit SURVEY §4 calls
for): salted equi-joins and salted two-phase aggregation for hot keys
that AQE's size-based skew splitting cannot fix (AQE splits oversized
PARTITIONS; a single pathological key inside one partition still lands
on one task unless the key itself is salted).

Both operators are result-identical to their unsalted forms — salting
only changes the physical key distribution — and are property-tested
against the plain implementations on deliberately skewed data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic-enough spread: a per-row hash of the partition id and
# the row's position within it. Any assignment is CORRECT (the salt is
# only ever matched against a replicated small side carrying every salt
# value); uniformity is all that matters.
def _salt_col(n_salts: int) -> F.Column:
    return F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small side without any
    hot-key task: every big row gets a uniform salt in [0, n_salts);
    the small side is replicated n_salts times (explode of a literal
    range — cost n_salts × |small|, the standard trade); the join key
    becomes (on…, salt), so one hot key spreads over n_salts tasks.

    Result-identical to ``big.join(small, on, how)`` for 'inner' and
    'left' (each big row matches exactly its own salt's replica).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    b = big.withColumn("__salt__", _salt_col(n_salts))
    s = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, keys + ["__salt__"], how).drop("__salt__")


_AGG_FNS = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
# how partials of each algebraic aggregate recombine in phase 2
_MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 aggregates
    per (keys…, salt) — the hot key's rows split across n_salts tasks —
    phase 2 merges the ≤ n_salts partials per key. Supports the
    algebraic aggregates (sum/count/min/max) whose partials recombine
    exactly.

    ``aggs`` maps output column → (fn, input column), e.g.
    ``{"total": ("sum", "v"), "n": ("count", "v")}``.

    Note: Spark's hash aggregate already does map-side partials, which
    handles MOST skew; this operator exists for the residual case where
    a single key's partials still overwhelm one reduce task (e.g.
    billions of rows of one key at 100 TB) — the salt bounds any reduce
    task at 1/n_salts of the hot key.
    """
    bad = {f for f, _ in aggs.values()} - set(_AGG_FNS)
    if bad:
        raise ValueError(f"unsupported aggregate fns: {sorted(bad)}")
    ks = list(keys)
    p1 = (
        df.withColumn("__salt__", _salt_col(n_salts))
        .groupBy(*ks, "__salt__")
        .agg(*[_AGG_FNS[fn](col).alias(out) for out, (fn, col) in aggs.items()])
    )
    return p1.groupBy(*ks).agg(
        *[
            _MERGE_FNS[fn](out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )
