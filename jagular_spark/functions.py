"""Utility surface (SURVEY §2.8 U1/U2/U4), re-expressed as column
expressions / tiny plan helpers.

- U1 ``frange`` (reference ``jagular/utils.py:17-22``): float grid.
  The reference delegates to ``np.linspace(..., endpoint=False)`` with
  ``num = floor((stop-start)/step)`` — note the *actual spacing* is
  ``(stop-start)/num``, not ``step``, whenever the range is not an
  integer multiple of ``step``. That quirk is replicated (it is the
  documented behavior callers see), as a JVM array expression.
- U2 ``pairwise`` (``utils.py:24-36``): neighbor pairs of an ordered
  stream — a ``lead`` window, the idiom every sortedness/gap operator
  here already uses internally.
- U4 pretty formatting (``utils.py:552-675``): human-readable bytes /
  ints / durations as string columns for audit reports. String
  rendering of the fractional-seconds case follows Java's shortest
  double repr (same as Python's for the common cases). The reference's
  ``PrettyBytes`` silently returns ``None`` at ≥ 1 TiB (falls off the
  elif chain); here terabytes render properly — documented divergence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lit_bigint_array(vals: Sequence[int]) -> Column:
    """A large ``array<bigint>`` literal built from ONE SQL-string
    parse instead of ``F.lit(list)``'s one-py4j-call-per-element
    construction (r18: a 4096-element DSIR delta table measured ~10 s
    of driver time as ``F.lit``, ~0.1 s as a single ``expr`` parse —
    the JVM sees the identical ``array(...)`` of foldable literals
    either way, so plans and results are bit-identical)."""
    if not vals:
        return F.expr("cast(array() as array<bigint>)")
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def lit_double_array(vals: Sequence[float]) -> Column:
    """``array<double>`` literal via one SQL parse. ``repr(float)`` is
    Python's shortest round-trip decimal and the SQL parser's
    ``Double.parseDouble`` is correctly rounded, so every element is
    bit-identical to the ``F.lit`` path (pinned in
    tests/test_functions.py); the ``D`` suffix keeps the parser from
    typing plain decimals as DECIMAL(p,s)."""
    if not vals:
        return F.expr("cast(array() as array<double>)")
    return F.expr("array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")")


def lit_bigint_matrix(rows: Sequence[Sequence[int]]) -> Column:
    """``array<array<bigint>>`` literal (centroid / codebook tables)
    via one SQL parse — same construction as :func:`lit_bigint_array`,
    nested."""
    if not rows:
        return F.expr("cast(array() as array<array<bigint>>)")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in r) + ")" for r in rows
        )
        + ")"
    )


def frange(start: float, stop: float, step: float) -> Column:
    """U1: array<double> grid ``[start, stop)`` with
    ``num = floor((stop-start)/step)`` linspace semantics."""
    num = int((float(stop) - float(start)) // float(step))
    if num <= 0:
        return F.array().cast("array<double>")
    delta = (float(stop) - float(start)) / num
    return F.transform(
        F.sequence(F.lit(0), F.lit(num - 1)),
        lambda i: F.lit(float(start)) + i.cast("double") * F.lit(delta),
    )


def pairwise(
    df: DataFrame,
    col: str,
    partition_cols: Sequence[str] = (),
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """U2: ``(a, b)`` neighboring pairs of ``col`` in ``order_cols``
    order (default: ordered by ``col`` itself) — the reference's
    ``tee``/``zip`` helper as a ``lead`` window. Keys parallelize the
    window; the final element of each group (no successor) is dropped,
    like ``zip`` truncation."""
    keys = list(partition_cols)
    order = list(order_cols) if order_cols is not None else [col]
    w = Window.partitionBy(*keys).orderBy(*order) if keys else Window.orderBy(*order)
    return (
        df.select(*keys, F.col(col).alias("a"), F.lead(col).over(w).alias("b"))
        .where(F.col("b").isNotNull())
    )


def pretty_int(col: Column | str) -> Column:
    """U4: thousands-separated integer string (``'{:,}'``)."""
    return F.format_number(F.col(col) if isinstance(col, str) else col, 0)


def pretty_bytes(col: Column | str) -> Column:
    """U4: byte count → '123 bytes' / '1.206 kilobytes' / ... with the
    reference's 3-decimal format (``utils.py:552-569``)."""
    v = (F.col(col) if isinstance(col, str) else col).cast("double")
    return (
        F.when(v < 1024, F.concat(v.cast("long").cast("string"), F.lit(" bytes")))
        .when(v < 1024.0**2, F.concat(F.format_string("%.3f", v / 1024.0), F.lit(" kilobytes")))
        .when(v < 1024.0**3, F.concat(F.format_string("%.3f", v / 1024.0**2), F.lit(" megabytes")))
        .when(v < 1024.0**4, F.concat(F.format_string("%.3f", v / 1024.0**3), F.lit(" gigabytes")))
        .otherwise(F.concat(F.format_string("%.3f", v / 1024.0**4), F.lit(" terabytes")))
    )


def pretty_duration(col: Column | str) -> Column:
    """U4: seconds → the reference's duration string
    (``utils.py:583-646``): ``d days h:mm:ss:ms hours`` /
    ``m:ss:ms minutes`` / ``s.frac seconds`` / ``ms milliseconds``,
    with a leading ``-`` for negative durations and ``inf`` passthrough.
    """
    x = (F.col(col) if isinstance(col, str) else col).cast("double")
    neg = x < 0
    sec = F.abs(x)
    # ms with one decimal: round((sec % 1) * 10000) / 10
    ms = F.round(sec % 1 * 10000) / 10.0
    whole = F.floor(sec).cast("long")
    ss = whole % 60
    mm = (whole / 60).cast("long") % 60
    hh = (whole / 3600).cast("long") % 24
    dd = (whole / 86400).cast("long")

    # fractional-seconds suffix: '.5' style when minutes==0, ':500' else
    frac_str = F.regexp_replace((ms / 1000.0).cast("string"), "^0+", "")
    sstr_secs = F.when(ms > 0, frac_str).otherwise(F.lit(""))
    sstr_colon = F.when(ms > 0, F.format_string(":%03d", ms.cast("int"))).otherwise(F.lit(""))

    daystr = F.when(dd > 0, F.format_string("%d days ", dd)).otherwise(F.lit(""))
    body = (
        F.when(hh > 0, F.concat(daystr, F.format_string("%d:%02d:%02d", hh, mm, ss), sstr_colon, F.lit(" hours")))
        .when(mm > 0, F.concat(daystr, F.format_string("%d:%02d", mm, ss), sstr_colon, F.lit(" minutes")))
        .when(ss > 0, F.concat(daystr, ss.cast("string"), sstr_secs, F.lit(" seconds")))
        .otherwise(F.concat(daystr, ms.cast("string"), F.lit(" milliseconds")))
    )
    return (
        F.when(x == float("inf"), F.lit("inf"))
        .when(neg, F.concat(F.lit("-"), body))
        .otherwise(body)
    )
