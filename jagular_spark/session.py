"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we'd set cluster-side: AQE on (runtime
coalescing + skew-join handling), Arrow enabled for the pandas-UDF slow
path, shuffle partitions sized to cores rather than the 200 default.
On a real cluster only ``master`` and memory sizing change; the plan-level
settings are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jagular_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism; shuffle
    partitions default to the same so a local run has one post-shuffle
    partition per core. At 100 TB on a 1000-executor cluster you would
    instead leave AQE to coalesce from a few thousand initial partitions —
    the code below keys off the env so both work unchanged.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is byte-based: with the default 1m floor
        # (parallelismFirst targets minPartitionSize), every CPU-dense
        # but byte-small post-shuffle stage — md5 shingle/minhash
        # hashing, interpreted higher-order-function projections,
        # in-bucket pair combinatorics — collapses to 1-3 tasks and
        # runs serialized (profiled r18: ngram pair-gen 3.6 s CPU in 3
        # tasks, LSH bucket+verify 3.2 s CPU in 1 task). A 16k floor
        # keeps such stages at session width; stages with real bytes
        # are unaffected (they sit above any floor), so at warehouse
        # scale — where post-shuffle partitions are MBs-GBs — this
        # conf never binds, which is why it is safe as a default.
        # Env-overridable for A/B and for deployments that prefer the
        # stock floor.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_COALESCE", "16k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # PySpark 4's DataFrame-API debugging decorates EVERY DataFrame/
        # Column method with a call-site capture: a conf.get + origin-set
        # + origin-clear py4j round trip (plus a Python stack walk) per
        # call — measured r19 at 60-75% of plan-CONSTRUCTION time
        # (events_tetrode 5.0 -> 1.3 s, q5 0.85 -> 0.24 s best-of-3;
        # ~1,800 py4j commands per mid-sized query before, a third
        # after). The flag only enriches error messages with user-code
        # line numbers; plans, execution and results are identical —
        # the 150-query oracle suite pins that. A debugging session can
        # flip it back at runtime.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # the driver's testdata stores TIMESTAMP(NANOS) parquet, which Spark
        # rejects natively; read as raw nano longs (converted to micros at
        # the query layer, matching DuckDB's nanos→micros truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # lets Catalyst offer predicates to Python data sources
        # (jagular_rec prunes .rec files by catalog ts bounds with it;
        # without it the source still reads correctly, just unpruned)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        # 32g, not 16g: the shingle/explode-heavy queries allocate faster
        # than a 16g ZGC can reclaim concurrently, and the resulting
        # allocation stalls injected 2-6x nondeterministic swings
        # (ngram-jaccard @ sf0.1 measured 4 s steady vs 30 s stalled);
        # a larger heap holds the same loop at 3-5 s. 32g and no higher:
        # ZGC multi-maps the heap ~1.8 mappings/MB, and the default
        # vm.max_map_count (65530) caps a safe heap at ~35 g — beyond
        # that ZGC itself warns of premature OOM. (128 GiB box; on a
        # real cluster this is the executor-memory sizing knob.)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # ZGC: G1's evacuation pauses on a multi-GB local[32] heap were
        # measured at 0.5-3 s and injected 5-50 s of nondeterministic
        # stall into individual queries; ZGC holds the same workload at
        # sub-ms pauses (ngram-jaccard @ sf0.1: mean 7 s → 0.9 s)
        # 512m code cache: whole-stage codegen across many distinct
        # queries in one session can exhaust the 240m default, silently
        # dropping the JVM to interpreted mode
        .config("spark.driver.extraJavaOptions", "-XX:+UseZGC -XX:ReservedCodeCacheSize=512m")
        # ContextCleaner frees shuffle files / broadcast blocks only when
        # driver GC collects their weak refs; ZGC on a 16g heap can go
        # many minutes without a cycle, so a long multi-query session
        # accumulates dead shuffle state until queries crawl. Force a
        # periodic GC so cleanup keeps pace (same setting is standard on
        # long-running cluster drivers).
        .config("spark.cleaner.periodicGC.interval", "45s")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def shuffle_width(spark: SparkSession) -> int:
    """The session's shuffle parallelism as an int, tolerating
    non-numeric conf values.

    Operators that repartition by hash (codec spread, k-gram hashing)
    want one task per post-shuffle core, i.e. the session's
    ``spark.sql.shuffle.partitions``. Some deployments set that conf to
    a non-numeric token (e.g. ``"auto"`` under Databricks AQE
    conventions); a raw ``int(...)`` would then raise at plan-build
    time. Fall back to the cluster's ``defaultParallelism``, which
    tracks executor count the same way the session default does.
    """
    raw = spark.conf.get("spark.sql.shuffle.partitions", "")
    try:
        return int(raw)
    except ValueError:
        return spark.sparkContext.defaultParallelism


def heap_ramp_warmup(spark: SparkSession, rows: int = 200_000) -> None:
    """Untimed allocation-heavy warm-up — run ONCE before timing
    anything (bench.py, tools/time_queries.py, tools/scale_probe.py).

    ZGC grows the heap toward the workload's steady-state working set
    on the process's FIRST allocation-heavy jobs: measured r16, run1
    of a 320k-doc hashed-gram scoring job pays 10-13 s of GC that
    run4 does not, and the tax lands on whichever queries happen to
    run early. One throwaway md5/string-churn pass at the heavy
    queries' allocation scale (~12M md5-hex strings) ramps the heap so
    subsequent measurements see the steady state a long-lived cluster
    actually runs at. Isolated A/B ×2 at sf0.1: first-run dsir_scores
    8.9 → 6.5 s, dsir_topk 5.8 → 4.9 s; the full bench's cold-start
    recovery count went 4-10 → 0."""
    from pyspark.sql import functions as F

    (
        spark.range(0, rows, 1, 32)
        .select(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(0), F.lit(59)),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("id").cast("string"), i.cast("string")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("s")
        )
        .groupBy((F.col("s") % 97).alias("b"))
        .count()
        .count()
    )
