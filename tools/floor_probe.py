"""Decompose the per-query driver floor (r19 verdict item #1).

For each named query (default: ALL registry queries), measures — in one
warm session, second run of each query so one-time costs are excluded:

- construct_s : the ``fn(spark, sf_dir)`` call (py4j plan construction,
  plus any eager work a query does while building — stream drains,
  stage writes, collect-based operators)
- analyze_s   : first ``df.schema`` access (analysis phase only)
- exec_s      : Observation + noop-sink save (optimization + physical
  planning + job scheduling + task execution)
- n_jobs      : Spark jobs launched during exec (AQE stage waves,
  checkpoint materializations, the final write — everything)
- n_jobs_fn   : jobs launched during construction (eager operators)

Usage: python tools/floor_probe.py SF_DIR [QUERY ...]
Prints one line per query plus an aggregate histogram. Writes the full
table to /tmp/floor_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jagular_spark.session import get_spark, heap_ramp_warmup
from jagular_spark.workloads import SPARK_QUERIES


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or list(SPARK_QUERIES)
    spark = get_spark("floor_probe")
    from pyspark.sql import Observation, functions as F

    sc = spark.sparkContext
    w = spark.range(0, 1 << 19, 1, 32).select((F.col("id") % 97).alias("k"))
    w.groupBy("k").count().count()
    w.mapInPandas(lambda it: (b for b in it), "k long").count()
    heap_ramp_warmup(spark)

    tracker = sc.statusTracker()

    def job_count() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    def measure(name: str) -> dict:
        fn = SPARK_QUERIES[name]
        j0 = job_count()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        _ = df.schema
        t2 = time.perf_counter()
        j1 = job_count()
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).format("noop").save()
        n = int(obs.get["rows"])
        t3 = time.perf_counter()
        j2 = job_count()
        return {
            "construct_s": round(t1 - t0, 4),
            "analyze_s": round(t2 - t1, 4),
            "exec_s": round(t3 - t2, 4),
            "total_s": round(t3 - t0, 4),
            "n_jobs_fn": j1 - j0,
            "n_jobs_exec": j2 - j1,
            "rows": n,
        }

    out: dict[str, dict] = {}
    for name in names:
        try:
            r1 = measure(name)     # run1: what the bench pays (codegen cold)
            r = measure(name)      # run2: steady state
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        r["run1_total_s"] = r1["total_s"]
        r["run1_construct_s"] = r1["construct_s"]
        out[name] = r
        print(
            f"{name:42s} total {r['total_s']:7.3f}  construct {r['construct_s']:6.3f} "
            f"analyze {r['analyze_s']:6.3f}  exec {r['exec_s']:7.3f}  "
            f"jobs fn={r['n_jobs_fn']:2d} exec={r['n_jobs_exec']:2d}  "
            f"run1 {r1['total_s']:7.3f}"
        )

    tot = sum(r["total_s"] for r in out.values())
    con = sum(r["construct_s"] for r in out.values())
    ana = sum(r["analyze_s"] for r in out.values())
    exe = sum(r["exec_s"] for r in out.values())
    jf = sum(r["n_jobs_fn"] for r in out.values())
    je = sum(r["n_jobs_exec"] for r in out.values())
    print(
        f"\nTOTALS over {len(out)} queries: total {tot:.1f}s = construct {con:.1f}s "
        f"+ analyze {ana:.1f}s + exec {exe:.1f}s; jobs fn={jf} exec={je}"
    )
    import collections

    hist = collections.Counter(r["n_jobs_exec"] + r["n_jobs_fn"] for r in out.values())
    print("jobs-per-query histogram:", dict(sorted(hist.items())))
    with open("/tmp/floor_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
