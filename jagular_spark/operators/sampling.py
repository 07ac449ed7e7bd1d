"""Deterministic hash-based sampling — the reproducible alternative to
``df.sample()`` for training-data pipelines.

``rand()``-based sampling is not reproducible across retries, partition
layouts, or engines, which breaks dataset versioning: the same pipeline
run twice must emit the same sample. Hashing a stable key instead makes
membership a pure function of the row — re-runs, backfills, and the
DuckDB oracle all agree bit-for-bit, and the sample composes with
incremental ingestion (new rows don't reshuffle old membership).

All expressions are JVM-side column ops (md5 + integer compare): no
UDFs, no shuffle — sampling is a pure filter pushed at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_SPACE = 1 << 32


def hash_bucket(key_col: str, salt: str = "") -> F.Column:
    """Uniform deterministic bucket in [0, 2^32) from the md5 of the
    (salted) key — same construction as the oracle's
    ``('0x' || substr(md5(..), 1, 8))::BIGINT``."""
    keyed = (
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
        if salt
        else F.col(key_col).cast("string")
    )
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the hash
    space. Exact integer threshold compare — no float drift between
    engines."""
    thr = int(fraction * _HASH_SPACE)
    return df.where(hash_bucket(key_col, salt) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    strata_col: F.Column | str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each row's keep-threshold is
    chosen by its stratum value (e.g. upsample rare languages, drop
    low-quality buckets). ``fractions`` maps stratum value → fraction;
    unlisted strata get ``default_fraction``. One pass, no shuffle."""
    strata = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    thr = F.lit(int(default_fraction * _HASH_SPACE))
    for value, frac in sorted(fractions.items()):
        thr = F.when(strata == F.lit(value), F.lit(int(frac * _HASH_SPACE))).otherwise(thr)
    return df.where(hash_bucket(key_col, salt) < thr)
