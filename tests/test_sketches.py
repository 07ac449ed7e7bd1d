"""Deterministic-HLL sketch: estimate quality, shard-merge law, and
partition invariance (the estimate is a pure function of the data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jagular_spark.operators.sketches import hll_distinct, hll_register_ranks


def _items(spark, n, n_parts=1):
    return spark.range(n, numPartitions=n_parts).select(
        F.lit("g").alias("g"), F.concat(F.lit("item_"), F.col("id")).alias("it")
    )


def test_hll_estimate_within_expected_error(spark):
    """m=64 → standard error 1.04/sqrt(64) ≈ 13%; assert within 3σ for
    a few cardinalities well above the register count."""
    for n in (500, 2000, 10_000):
        est = hll_distinct(_items(spark, n), "it", ["g"]).collect()[0]
        assert abs(est.est_distinct - n) / n < 0.40, (n, est.est_distinct)


def test_hll_is_partition_invariant_and_duplicate_insensitive(spark):
    """The register table is a max-aggregate: physical layout and row
    duplication must not change a single register, hence not the
    estimate."""
    a = hll_distinct(_items(spark, 3000, 1), "it", ["g"]).collect()[0]
    b = hll_distinct(_items(spark, 3000, 13), "it", ["g"]).collect()[0]
    dup = _items(spark, 3000, 7)
    c = hll_distinct(dup.union(dup).union(dup), "it", ["g"]).collect()[0]
    assert a.est_distinct == b.est_distinct == c.est_distinct
    assert a.n_registers == b.n_registers == c.n_registers


def test_hll_shard_merge_law(spark):
    """max-merging two shards' register tables == the register table of
    the union (the property that makes the sketch distributable)."""
    s1 = _items(spark, 1500)
    s2 = spark.range(1000, 4000).select(
        F.lit("g").alias("g"), F.concat(F.lit("item_"), F.col("id")).alias("it")
    )
    merged = (
        hll_register_ranks(s1, "it", ["g"])
        .union(hll_register_ranks(s2, "it", ["g"]))
        .groupBy("g", "register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    direct = hll_register_ranks(s1.union(s2), "it", ["g"])
    got = {(r.register, r.max_rank) for r in merged.collect()}
    want = {(r.register, r.max_rank) for r in direct.collect()}
    assert got == want


def test_cms_overestimates_and_is_partition_invariant(spark):
    """CMS point estimates are >= the true count (collisions only
    inflate), exact for most items at this load factor, and a pure
    function of the data (partition-layout independent)."""
    from jagular_spark.operators.sketches import cms_estimate, cms_table

    rows = [("g", f"t{i % 50}") for i in range(5000)]  # 50 items x 100
    df = spark.createDataFrame(rows, "g string, it string")
    exact = df.groupBy("g", "it").agg(F.count(F.lit(1)).cast("long").alias("n"))
    for parts in (1, 11):
        sk = cms_table(df.repartition(parts), "it", ["g"])
        est = {
            r.it: r.cms_count
            for r in cms_estimate(exact, sk, "it", ["g"]).collect()
        }
        truth = {r.it: r.n for r in exact.collect()}
        assert set(est) == set(truth)
        assert all(est[k] >= truth[k] for k in truth)
        # d=4 rows x w=256 cells at 50 items: collisions are rare —
        # at least 90% of estimates should be exact
        exact_hits = sum(est[k] == truth[k] for k in truth)
        assert exact_hits >= 45


def test_bloom_no_false_negatives_and_probe_shape(spark):
    """Every inserted item must probe maybe_present (no false
    negatives); a disjoint probe set shows only the (deterministic)
    false-positive residue, bounded well below certainty at this fill."""
    from jagular_spark.operators.sketches import bloom_bits, bloom_probe

    ins = spark.range(500).select(F.concat(F.lit("in_"), F.col("id")).alias("it"))
    out = spark.range(500).select(F.concat(F.lit("out_"), F.col("id")).alias("it"))
    bits = bloom_bits(ins, "it")
    hit = bloom_probe(ins, bits, "it")
    assert hit.where(~F.col("maybe_present")).count() == 0
    # fill = |bits|/4096; fp rate ≈ fill^3 — assert < 20% observed
    fp = bloom_probe(out, bits, "it").where(F.col("maybe_present")).count()
    assert fp < 100, fp


def test_cms_absent_probe_estimates_zero(spark):
    """A probe item never inserted must still get a row, with
    cms_count = 0 when any of its d cells is empty — the standard CMS
    estimator (an inner join would silently drop it, and min over
    occupied cells only would overestimate)."""
    from jagular_spark.operators.sketches import cms_estimate, cms_table

    df = spark.createDataFrame([("g", "present")], "g string, it string")
    sk = cms_table(df, "it", ["g"])
    probes = spark.createDataFrame(
        [("g", "present"), ("g", "never_inserted_xyz")], "g string, it string"
    )
    est = {r.it: r.cms_count for r in cms_estimate(probes, sk, "it", ["g"]).collect()}
    assert est["present"] >= 1
    assert est["never_inserted_xyz"] == 0


def test_bloom_probe_null_carried_column_keeps_guarantee(spark):
    """A NULL in a carried (non-item) column must not produce a false
    negative — the hit-count aggregate re-attaches by row id, not by
    equality on item columns."""
    from jagular_spark.operators.sketches import bloom_bits, bloom_probe

    ins = spark.createDataFrame(
        [("a", None), ("b", "meta")], "it string, extra string"
    )
    bits = bloom_bits(ins, "it")
    res = bloom_probe(ins, bits, "it")
    assert res.where(~F.col("maybe_present")).count() == 0
    assert res.count() == 2


def test_hll_with_exact_matches_two_pass_formulation(spark):
    """The r15 one-pass hll_distinct_with_exact must reproduce the
    two-pass shape (sketch pass + countDistinct pass + join) value for
    value — register maxima over distinct items equal maxima over all
    occurrences, and the per-register distinct counts sum to the exact
    count. Duplicated rows and multiple groups included."""
    from jagular_spark.operators.sketches import hll_distinct_with_exact

    base = spark.range(4000, numPartitions=9).select(
        F.concat(F.lit("g"), (F.col("id") % 3)).alias("g"),
        F.concat(F.lit("item_"), (F.col("id") % 1100)).alias("it"),
    )
    df = base.union(base.limit(700))  # real duplicates
    one = {
        r.g: (r.n_registers, r.est_distinct, r.exact_distinct)
        for r in hll_distinct_with_exact(df, "it", ["g"]).collect()
    }
    est = hll_distinct(df, "it", ["g"])
    exact = df.groupBy("g").agg(
        F.countDistinct("it").cast("long").alias("exact_distinct")
    )
    two = {
        r.g: (r.n_registers, r.est_distinct, r.exact_distinct)
        for r in est.join(exact, "g").collect()
    }
    assert one == two and len(one) == 3


def test_cms_estimate_duplicate_probes_and_hostile_columns(spark):
    """r17 contract fixes: duplicate probe rows each keep their own
    output row (the old groupBy over the probe columns collapsed
    them), and probe columns named 'row'/'cell'/'cnt' no longer
    collide with the join internals."""
    from jagular_spark.operators.sketches import cms_estimate, cms_table

    data = spark.createDataFrame(
        [("g", "a")] * 5 + [("g", "b")] * 2, "grp string, item string"
    )
    sketch = cms_table(data, "item", ["grp"])

    probes = spark.createDataFrame(
        [("g", "a", 1), ("g", "a", 1), ("g", "b", 2), ("g", "zzz", 3)],
        "grp string, item string, row int",  # hostile col name + a dup row
    )
    out = cms_estimate(probes, sketch, "item", ["grp"]).collect()
    assert len(out) == 4  # the duplicate probe row survives
    by_item = {}
    for r in out:
        by_item.setdefault(r.item, []).append((r.row, r.cms_count))
    assert sorted(by_item["a"]) == [(1, 5), (1, 5)]
    assert by_item["b"] == [(2, 2)]
    assert by_item["zzz"] == [(3, 0)]  # absent item -> exactly 0


def test_ivf_probe_guard_limits_before_collect(spark):
    """r17: the max_probes guard limits BEFORE collecting, so a
    corpus-sized probe filter raises instead of OOMing the driver, and
    legitimate probe sets are unaffected."""
    import pytest
    from pyspark.sql import functions as F

    from jagular_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.ivf_fit_centroids(emb, 4, 2, fit_fraction=1.0)
    probes = sim.ivf_probe_rows(emb, F.col("id") < 5, cents, nprobe=2)
    assert len(probes) == 5
    with pytest.raises(ValueError, match="max_probes"):
        sim.ivf_probe_rows(emb, F.lit(True), cents, nprobe=2, max_probes=10)
