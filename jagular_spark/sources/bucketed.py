"""Bucketed-table sink for shuffle-free co-located joins (SURVEY §4 /
README scale notes: "pre-partition the big fact tables on their join
key once at ingest, join for free forever").

Spark's bucketing ties file layout to the join hash: two tables
bucketed by the same key into the same bucket count satisfy the join's
distribution requirement straight off the scan, so repeated large-fact
joins skip BOTH Exchanges (verified by plan assertion in
tests/test_skew_bucketing.py). Sorting within buckets additionally
removes the per-task Sort of the sort-merge join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.
    Bucket metadata only exists through the catalog — a plain
    ``.parquet(path)`` write cannot carry it — hence ``saveAsTable``.
    Pass ``path`` to make it an EXTERNAL table (data at an explicit
    location instead of the session warehouse dir)."""
    cols = list(bucket_cols)
    # r18: cluster rows to their bucket BEFORE the write — repartition's
    # HashPartitioning is the same murmur3-mod-N the bucket spec uses,
    # so each of the n_buckets write tasks holds exactly one bucket and
    # emits one sorted file. Without it the write inherits the input's
    # partitioning (ONE task on a one-split scan — profiled 2.7 s of
    # single-task sort+encode CPU in orders_bucketed_revenue), and a
    # multi-split input would emit one file per (task, bucket) pair.
    # At warehouse scale this exchange is the standard cluster-on-write.
    df = df.repartition(n_buckets, *[F.col(c) for c in cols])
    w = df.write.mode(mode).bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
