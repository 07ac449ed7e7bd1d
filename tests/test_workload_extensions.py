"""Smoke tests for the signal/ANN/multimodal extension queries (their
value-level correctness is pinned by the DuckDB oracle harness; the
rows-only ones are pinned here structurally)."""

import pytest

from jagular_spark.workloads import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name,cols",
    [
        ("events_common_ref", {"user_id", "minute", "iv", "value_ref"}),
        ("emb_ann_topk_lsh", {"query_id", "neighbor_id", "rank", "cos"}),
        ("events_decimate", {"user_id", "seq", "filtered"}),
        ("events_tetrode", {"peak_seq", "idx", "wv"}),
        ("events_align", {"user_id", "peak_seq", "idx", "av"}),
        ("docs_media_stats", {"media_id", "n_bytes", "byte_sum", "mean_px"}),
    ],
)
def test_extension_query_runs(spark, name, cols):
    df = SPARK_QUERIES[name](spark, SF_DIR)
    assert set(df.columns) == cols
    rows = df.limit(2000).collect()
    assert len(rows) >= 0  # driver smoke contract: runs, stable schema


def test_decimate_keeps_every_4th(spark):
    df = SPARK_QUERIES["events_decimate"](spark, SF_DIR)
    assert df.where("seq % 4 != 0").count() == 0


def test_tetrode_waveform_width(spark):
    df = SPARK_QUERIES["events_tetrode"](spark, SF_DIR)
    idx = df.groupBy("peak_seq").count().collect()
    for r in idx:
        assert r["count"] == 4 * 8  # one row per flattened 4×8 sample


def test_crossings_chunked_matches_window(spark):
    """Chunked crossings == global-window crossings on ONE gapless
    segment (the huge-epoch case the chunking exists for), including
    chunk-boundary crossings caught by the 1-row halo."""
    import numpy as np
    from pyspark.sql import functions as F

    from jagular_spark.operators.spikes import crossings, crossings_chunked

    rng = np.random.default_rng(3)
    n = 5000
    vals = rng.normal(scale=10.0, size=n)
    # plant consecutive super-threshold pairs straddling chunk boundaries
    for base in (998, 1999, 3000, 4096):
        vals[base] = vals[base + 1] = -99.0
    rows = [(0, 0, int(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "channel_id int, segment_id long, ts long, value double")
    thr = spark.createDataFrame(
        [(0, 0, 50.0)], "channel_id int, segment_id long, threshold double"
    )
    a = sorted(
        (r.ts for r in crossings(df, thr, polarity="neg").collect())
    )
    b = sorted(
        (r.ts for r in crossings_chunked(df, thr, polarity="neg", buffer_len=1000).collect())
    )
    assert a == b and len(a) >= 4


def test_curation_funnel_stage_monotonicity(spark):
    """Each funnel stage only removes documents, survivors are real
    doc_ids, and the sample stage matches the reference md5 rule."""
    import hashlib

    from jagular_spark.workloads import SPARK_QUERIES, load

    sf = "/root/testdata/sf0.001"
    out = SPARK_QUERIES["docs_curation_funnel"](spark, sf).collect()
    all_ids = {r.doc_id for r in load(spark, sf, "documents").select("doc_id").collect()}
    got = {r.doc_id for r in out}
    assert got <= all_ids and len(got) > 0
    # survivors satisfy the sampling rule exactly
    thr = int(0.5 * (1 << 32))
    for d in got:
        assert int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) < thr
    # quality floor holds on the carried score column
    assert all(r.quality_score >= 0.6 for r in out)


def test_funnel_v2_partition_count_invariance(spark):
    """The r11 'clean corpus out' composition (keep-first substring
    surgery -> full funnel) is a pure function of the data: its
    detection hash width, LSH banding, connected components and hash
    sample must all be independent of the session's shuffle
    parallelism. Run at two widths, require identical row sets."""
    name = "docs_curation_funnel_v2"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = sorted(map(tuple, SPARK_QUERIES[name](spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, SPARK_QUERIES[name](spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert len(a) > 0 and a == b


def test_media_query_partition_count_invariance(spark):
    """A media workload's result is a pure function of the data, not
    of the session's shuffle parallelism — _codec_spread reads
    spark.sql.shuffle.partitions (the r10 fix for the hardcoded
    repartition(64) on every media call site), so run the de-vacuated
    color MPEG-1 query at two different widths and require identical
    row sets."""
    name = "docs_media_mpeg1_color"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = sorted(map(tuple, SPARK_QUERIES[name](spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, SPARK_QUERIES[name](spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert len(a) > 0 and a == b


def test_curation_funnel_parquet_staging_matches_checkpoint(spark, tmp_path):
    """The warehouse fault-tolerance mode (SCALE.md: 'stage the
    survivor set to parquet instead of localCheckpoint — checkpoint
    blocks die with executors'): stage_dir= produces IDENTICAL rows to
    the default checkpoint path, and the stage really materialized (a
    retry could re-read it)."""
    import os

    from jagular_spark.workloads import _curation_funnel, load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    stage = str(tmp_path / "funnel_stage")
    base = {
        tuple(r) for r in _curation_funnel(docs, with_text=True).collect()
    }
    staged = {
        tuple(r)
        for r in _curation_funnel(docs, with_text=True, stage_dir=stage).collect()
    }
    assert staged == base and len(base) > 0
    assert any(f.endswith(".parquet") for f in os.listdir(stage))
    # the staged survivor set is independently re-readable — the
    # property executor churn needs
    assert spark.read.parquet(stage).count() >= len(base)


def test_load_schema_memo_matches_and_invalidates(spark, tmp_path):
    """r18: ``load`` serves the table schema catalog-style (one footer
    inference per (path, mtime, size) per process). Pins that (a) the
    memoized read returns the identical schema and rows as a bare
    ``spark.read.parquet``, and (b) rewriting the file invalidates the
    memo instead of serving a stale schema."""
    import os
    import time

    from jagular_spark.workloads import _TABLE_SCHEMAS, load

    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "t.parquet")
    spark.range(5).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)

    bare = spark.read.parquet(path)
    first = load(spark, sf_dir, "t")
    assert first.schema == bare.schema
    assert sorted((r["id"], r["v"]) for r in first.collect()) == sorted(
        (r["id"], r["v"]) for r in bare.collect()
    )
    # second load is served from the memo (same key present)
    assert any(k[0] == path for k in _TABLE_SCHEMAS)
    again = load(spark, sf_dir, "t")
    assert again.schema == first.schema

    # rewrite with a DIFFERENT schema: the (mtime, size) key must miss
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse clocks
    spark.range(3).selectExpr(
        "id", "CAST(id AS STRING) AS s"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    fresh = load(spark, sf_dir, "t")
    assert set(fresh.columns) == {"id", "s"}
    assert fresh.schema == spark.read.parquet(path).schema


def test_n_sequences_ceil_form_cross_engine(spark):
    """The shard manifest's n_sequences is (sum(nt)+2047) DIV 2048,
    not ((sum(nt)-1) DIV 2048)+1: on a zero-token shard the old form
    returned 1 (wrong value — the correct ceil is 0) and divided a
    NEGATIVE operand. Measured here: DuckDB's integer // truncates
    toward zero exactly like Spark's DIV (-1 // 2048 = 0), so the
    engines agreed on the wrong answer — but DuckDB v1.0.0's // on a
    DECIMAL/DOUBLE operand degenerates to PLAIN division (5.0 // 2 =
    2.5, measured below), so any type promotion in a future oracle
    edit would silently turn the DuckDB side fractional while Spark
    stayed integral (the r16/r17-advice latent divergence). The
    ceil form has no negative operand and no zero special case. Pin:
    the shipped form equals math.ceil on both engines for zero and
    positive sums."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    rows = [("s0", 0), ("s1", 1), ("s2", 2048), ("s3", 2049), ("s4", 5000)]
    df = spark.createDataFrame(rows, "shard string, nt long")
    got = {
        r["shard"]: r["n_sequences"]
        for r in df.groupBy("shard")
        .agg(
            F.expr("CAST((sum(nt) + 2047) DIV 2048 AS BIGINT)").alias(
                "n_sequences"
            )
        )
        .collect()
    }
    want = {s: math.ceil(nt / 2048) for s, nt in rows}
    assert got == want

    con = duckdb.connect()
    duck = dict(
        con.execute(
            "SELECT shard, CAST((SUM(nt) + 2047) // 2048 AS BIGINT) "
            "FROM (VALUES " + ", ".join(f"('{s}', {nt})" for s, nt in rows) +
            ") AS t(shard, nt) GROUP BY shard"
        ).fetchall()
    )
    assert duck == want
    # the OLD form's zero-shard value bug (1, should be 0) on both
    # engines, and the promotion hazard that would split them:
    old_spark = spark.sql("SELECT ((0 - 1) DIV 2048) + 1").collect()[0][0]
    old_duck = con.execute("SELECT (0 - 1) // 2048 + 1").fetchone()[0]
    assert (old_spark, old_duck) == (1, 1)  # agree, but wrong vs ceil=0
    assert con.execute("SELECT 5.0 // 2").fetchone()[0] == 2.5  # not int div
