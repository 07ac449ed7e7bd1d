"""Backward as-of join — the canonical timeseries join Spark lacks.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` within the same keys (optionally within a
``tolerance``). The classic use: enrich each event with the latest
reading/state that preceded it.

Spark-first shape: NOT a join. Both sides are tagged and unioned, then
one window pass per key carries the last non-null right payload forward
(``last(..., ignorenulls=True)`` over rows-unbounded-preceding). That is
a single shuffle on the keys with a local sort — no range-join
explosion, no broadcast requirement, and skew follows the key
distribution exactly like any window. At equal timestamps the right row
sorts FIRST (side tiebreak), so ``<=`` semantics hold. Right-side
duplicates at the same (keys, ts) must be resolved by the caller (e.g.
keep-first) for deterministic output — the same requirement DuckDB's
native ASOF JOIN has.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("value",),
    suffix: str = "_asof",
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: all left columns plus ``<ts_col><suffix>`` and
    ``<col><suffix>`` for each of ``right_cols`` (NULL when no right row
    matches, or none within ``tolerance``).

    ``direction`` follows pandas ``merge_asof``: ``backward`` (latest
    right.ts <= left.ts — the default), ``forward`` (earliest right.ts
    >= left.ts, a mirrored first-over-following carry), or ``nearest``
    (whichever of the two is closer; exact-distance ties go backward,
    matching pandas). All three are the same single-shuffle tagged
    union — nearest computes both carries over the one exchange."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = list(on)
    rcols = list(right_cols)
    lcols = [c for c in left.columns]

    # The whole right payload rides in ONE struct carried by ONE
    # last(ignorenulls): the struct is non-null for every right row even
    # when individual payload fields are NULL, so the matched timestamp
    # and all payload columns always come from the SAME right row —
    # per-column carries desynchronize on NULL fields (an older row's
    # value under a newer row's ts), diverging from pandas merge_asof /
    # DuckDB ASOF semantics. Field "__ts__" avoids clashing with a
    # payload column named like ts_col.
    rstruct = F.struct(
        F.col(ts_col).alias("__ts__"), *[F.col(c).alias(c) for c in rcols]
    )
    rstruct_type = right.select(rstruct.alias("s")).schema["s"].dataType
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side__"),
        F.lit(None).cast(rstruct_type).alias("__r__"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in keys + [ts_col] else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side__"),
        rstruct.alias("__r__"),
    )
    u = l_tagged.unionByName(r_tagged)
    # backward: right sorts FIRST at equal ts (side asc) so <= holds
    # under a last-over-preceding; forward mirrors it — right sorts
    # AFTER left (side desc) so >= holds under a first-over-following.
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side__").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carries = []
    if direction in ("backward", "nearest"):
        carries.append(F.last("__r__", ignorenulls=True).over(wb).alias("__cb__"))
    if direction in ("forward", "nearest"):
        carries.append(F.first("__r__", ignorenulls=True).over(wf).alias("__cf__"))
    out = u.select(*lcols, "__side__", *carries).where(F.col("__side__") == 1)

    def _in_tol(c: str, back: bool) -> F.Column:
        if tolerance is None:
            return F.col(c).isNotNull()
        bound = (
            F.col(c)["__ts__"] >= (F.col(ts_col) - F.lit(tolerance))
            if back
            else F.col(c)["__ts__"] <= (F.col(ts_col) + F.lit(tolerance))
        )
        return F.col(c).isNotNull() & bound

    if direction == "backward":
        chosen = F.when(_in_tol("__cb__", True), F.col("__cb__"))
    elif direction == "forward":
        chosen = F.when(_in_tol("__cf__", False), F.col("__cf__"))
    else:
        b = F.when(_in_tol("__cb__", True), F.col("__cb__"))
        f = F.when(_in_tol("__cf__", False), F.col("__cf__"))
        # ties at equal distance go BACKWARD (pandas merge_asof)
        chosen = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(
                (F.col(ts_col) - b["__ts__"]) <= (f["__ts__"] - F.col(ts_col)), b
            )
            .otherwise(f)
        )
    out = out.withColumn("__c__", chosen)
    return out.select(
        *lcols,
        F.col("__c__")["__ts__"].alias(f"{ts_col}{suffix}"),
        *[F.col("__c__")[c].alias(f"{c}{suffix}") for c in rcols],
    )
