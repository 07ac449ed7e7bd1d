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

def _salt_col(n_salts: int, columns: Sequence[str]) -> F.Column:
    """Uniform salt in [0, n_salts), derived from ROW CONTENT
    (xxhash64 over the given columns) so it is DETERMINISTIC under
    partial stage re-execution. The earlier form hashed
    ``spark_partition_id() + monotonically_increasing_id()``, which is
    re-assigned when a fetch failure recomputes a map task — already-
    committed reduce outputs keyed on the old salts would then silently
    duplicate or drop rows, and Catalyst does not mark user expressions
    INDETERMINATE, so no stage rollback protects it. Content hashing
    spreads a hot JOIN key as long as the non-key columns vary (they do
    — identical full rows land on one salt, which only matters if one
    exact row repeats ~|hot key| times)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in columns]), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small side without any
    hot-key task: every big row gets a uniform salt in [0, n_salts);
    the small side is replicated n_salts times (explode of a literal
    range — cost n_salts × |small|, the standard trade); the join key
    becomes (on…, salt), so one hot key spreads over n_salts tasks.

    Result-identical to ``big.join(small, on, how)`` for every
    supported ``how`` (inner/left/right/full_outer), property-tested
    against the unsalted join on skewed data:

    - inner/left: each big row matches exactly its own salt's replica,
      so no correction is needed.
    - right/full_outer: because this is an EQUI-join, a small row is
      null-padded in the plain join iff its KEY never appears in big
      at all. So the result is assembled as (salted inner part) ∪
      (small rows anti-joined against big's distinct keys,
      null-padded once each) — and for full_outer additionally ∪
      (big rows anti-joined against small's distinct keys). An
      earlier formulation kept the salt-0 replica of any unmatched
      small REPLICA, which is wrong when a matched key's big rows all
      hash to non-zero salts (its salt-0 replica is unmatched yet the
      key has matches → a spurious null-padded row); deciding per KEY
      via anti-join is replica-independent. Null join keys match
      nothing in either the equi-join or the anti-join, so NULL-keyed
      rows null-pad exactly once, as in the plain join.

    Cost note (100 TB): the right/full_outer path adds one
    column-pruned distinct over big's key columns (map-side combined,
    so a hot key contributes one partial per input partition); the
    small-side anti-join for full_outer broadcasts. inner/left add
    nothing beyond the salt itself.

    The salt is a content hash (retry-deterministic — see
    ``_salt_col``); pass ``salt_cols`` (e.g. a stable row id) to
    control which columns feed it, default = every big-side column.
    """
    if how not in ("inner", "left", "right", "full_outer", "full", "outer"):
        raise ValueError(
            f"salted_join supports inner/left/right/full_outer, got {how!r}"
        )
    keys = list(on)
    b = big.withColumn("__salt__", _salt_col(n_salts, salt_cols or big.columns))
    s = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    if how in ("inner", "left"):
        return b.join(s, keys + ["__salt__"], how).drop("__salt__")

    big_nonkey = [c for c in big.columns if c not in keys]
    small_nonkey = [c for c in small.columns if c not in keys]
    out = b.join(s, keys + ["__salt__"], "inner").drop("__salt__")
    # small rows whose key never appears in big → one null-padded row each
    pad_small = small.join(big.select(*keys).distinct(), keys, "left_anti").select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(big.schema[c].dataType).alias(c) for c in big_nonkey],
        *[F.col(c) for c in small_nonkey],
    )
    out = out.unionByName(pad_small)
    if how in ("full_outer", "full", "outer"):
        pad_big = big.join(
            F.broadcast(small.select(*keys).distinct()), keys, "left_anti"
        ).select(
            *[F.col(k) for k in keys],
            *[F.col(c) for c in big_nonkey],
            *[F.lit(None).cast(small.schema[c].dataType).alias(c) for c in small_nonkey],
        )
        out = out.unionByName(pad_big)
    return out


_AGG_FNS = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
# how partials of each algebraic aggregate recombine in phase 2
_MERGE_FNS = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
    salt_cols: Sequence[str] | None = None,
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
        df.withColumn("__salt__", _salt_col(n_salts, salt_cols or df.columns))
        .groupBy(*ks, "__salt__")
        .agg(*[_AGG_FNS[fn](col).alias(out) for out, (fn, col) in aggs.items()])
    )
    return p1.groupBy(*ks).agg(
        *[
            _MERGE_FNS[fn](out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )
