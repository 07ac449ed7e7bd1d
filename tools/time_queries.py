"""Quick per-query timer: python tools/time_queries.py sf_dir q1 q2 ...

Runs each named SPARK_QUERIES entry twice (reports both) against sf_dir.
Dev tool for A/B-ing plan changes — not the official bench. Forces
FULL materialization (noop sink + Observation row count), same as
bench.py force_full — a bare .count() lets Catalyst prune computed
columns and unique-key left joins, timing the scan instead of the
operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jagular_spark.session import get_spark
from jagular_spark.workloads import SPARK_QUERIES


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("timer")
    # warm-up: executor threads + python worker pool
    from pyspark.sql import functions as F

    w = spark.range(0, 1 << 19, 1, 32).select((F.col("id") % 97).alias("k"))
    w.groupBy("k").count().count()
    w.mapInPandas(lambda it: (b for b in it), "k long").count()
    from jagular_spark.session import heap_ramp_warmup

    heap_ramp_warmup(spark)  # steady-state heap before any timing (r16)
    from pyspark.sql import Observation

    for name in names:
        for i in range(2):
            t0 = time.perf_counter()
            obs = Observation()
            SPARK_QUERIES[name](spark, sf_dir).observe(
                obs, F.count(F.lit(1)).alias("rows")
            ).write.mode("overwrite").format("noop").save()
            n = int(obs.get["rows"])
            print(f"{name} run{i}: {time.perf_counter() - t0:.3f}s rows={n}", flush=True)


if __name__ == "__main__":
    main()
