"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full workload (jagular_spark/workloads.py)
for the driver's DuckDB-oracle correctness harness at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """The driver may hand us a vanilla session; apply the configs the
    engine relies on (nano-parquet reads, Arrow)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - conf may be frozen; queries may still run
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: gaps-and-islands sessionization of the events
    stream (the reference's core segmentation semantics, SURVEY A7) on
    /root/testdata/sf0.001."""
    from jagular_spark.workloads import events_sessionize

    return events_sessionize(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jagular_spark.workloads import SPARK_QUERIES

    return {
        name: (lambda spark, sf_dir, fn=fn: fn(_configure(spark), sf_dir))
        for name, fn in SPARK_QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from jagular_spark.workloads import ORACLE_SQL

    return dict(ORACLE_SQL)
