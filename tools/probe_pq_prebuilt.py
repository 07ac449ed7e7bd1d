#!/usr/bin/env python
"""r18 attribution probe for the emb_ann_topk_ivf_pq_prebuilt
regression (r17 verdict's one weak item: 2.65 s r16 -> 3.66 s in the
builder's clean r17 window -> 4.51 s driver).

Staged isolation in ONE warm process at sf0.1 (the protocol that
closed docs_hll_vocab, dsir_score_frozen and the events family), with
the two r17-code suspects A/B'd directly:

  A  query as shipped (pending-swap guard ON, no preceding churn)
  B  query with _assert_no_pending_swap monkeypatched to a no-op
  C  query run immediately AFTER emb_index_lifecycle (bench-order
     churn: the lifecycle writes/compacts its own index tree in the
     same process right before the r17 window position of this query)
  D  the guard call alone on the prebuilt tree, 20 reps

Stages A/B/C interleave rep-by-rep (A1 B1 C1 A2 ...) so slow host
drift cannot masquerade as a stage effect; every rep records steal
ticks and JVM GC ms so a contaminated rep is visible. Output: one
JSON block for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from jagular_spark.session import get_spark, heap_ramp_warmup


def steal_ticks() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PQ_PROBE_REPS", "3"))
    spark = get_spark("jagular_spark_pq_probe")
    spark.sparkContext.setLogLevel("ERROR")

    warm = spark.range(0, 1 << 20, 1, 32).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    warm.groupBy("k").agg(F.sum("v"), F.max("v")).count()
    warm.mapInPandas(lambda it: (b for b in it), "k long, v long").count()
    heap_ramp_warmup(spark)

    from pyspark.sql import Observation

    def force_full(df) -> int:
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).format("noop").save()
        return int(obs.get["rows"])

    from jagular_spark.operators import similarity as sim
    from jagular_spark.workloads import SPARK_QUERIES

    def jvm_gc_ms() -> int:
        beans = (
            spark._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    pq = SPARK_QUERIES["emb_ann_topk_ivf_pq_prebuilt"]
    lifecycle = SPARK_QUERIES.get("emb_index_lifecycle")

    # untimed warm rep: first execution pays shape codegen/Arrow init
    force_full(pq(spark, sf_dir))

    real_guard = getattr(sim, "_assert_no_pending_swap", None)

    def timed(fn) -> dict:
        st0, gc0 = steal_ticks(), jvm_gc_ms()
        t0 = time.perf_counter()
        n = force_full(fn(spark, sf_dir))
        return {
            "s": round(time.perf_counter() - t0, 3),
            "steal": steal_ticks() - st0,
            "gc_ms": jvm_gc_ms() - gc0,
            "rows": n,
        }

    # PQ_PROBE_STAGES=A runs only the as-shipped stage — the form the
    # cross-version interleaved bisect uses (stage B's monkeypatch
    # target does not exist before r17)
    stages = os.environ.get("PQ_PROBE_STAGES", "ABC")
    out: dict[str, list] = {"A_shipped": [], "B_guard_off": [], "C_after_lifecycle": []}
    for _ in range(reps):
        if "A" in stages:
            out["A_shipped"].append(timed(pq))

        if "B" in stages:
            sim._assert_no_pending_swap = lambda spark, path: None
            try:
                out["B_guard_off"].append(timed(pq))
            finally:
                sim._assert_no_pending_swap = real_guard

        if "C" in stages:
            force_full(lifecycle(spark, sf_dir))  # untimed churn
            out["C_after_lifecycle"].append(timed(pq))

    # D: the guard listing alone, on the tree the A reps just wrote
    if real_guard is not None and "D" in stages + "D":
        from jagular_spark.workloads import _stage_dir

        tree = _stage_dir("ivfpq_index", sf_dir)
        t0 = time.perf_counter()
        for _ in range(20):
            real_guard(spark, tree)
        out["D_guard_only_ms_per_call"] = round(
            (time.perf_counter() - t0) / 20 * 1000, 2
        )

    for k in ("A_shipped", "B_guard_off", "C_after_lifecycle"):
        clean = [r["s"] for r in out[k] if r["steal"] <= 50]
        out[k + "_best"] = min(clean) if clean else None
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, **out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
