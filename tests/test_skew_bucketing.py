"""Skew-mitigation and bucketed-join machinery: salted join/agg must be
result-identical to the plain forms on deliberately skewed data, and
bucketed tables must join without either side shuffling."""

from __future__ import annotations

from pyspark.sql import functions as F

from jagular_spark.operators.skew import salted_agg, salted_join
from jagular_spark.sources.bucketed import write_bucketed_table


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _skewed(spark, n=20_000, hot_frac=0.9):
    # 90% of rows share key 0 — the pathological single-hot-key shape
    return spark.range(n).select(
        F.when(F.col("id") < int(n * hot_frac), F.lit(0))
        .otherwise(F.col("id") % 50)
        .cast("long")
        .alias("k"),
        (F.col("id") % 997).cast("long").alias("v"),
    )


def test_salted_join_matches_plain_inner_and_left(spark):
    big = _skewed(spark)
    small = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    for how in ("inner", "left"):
        got = salted_join(big, small, ["k"], n_salts=4, how=how)
        want = big.join(small, ["k"], how)
        assert got.count() == want.count()
        g = {tuple(r) for r in got.collect()}
        w = {tuple(r) for r in want.collect()}
        assert g == w, how


def test_salted_join_spreads_the_hot_key(spark):
    """The physical join key must include the salt: the hot key's rows
    hash to n_salts distinct shuffle keys instead of one."""
    big = _skewed(spark)
    small = spark.range(4).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    from jagular_spark.operators.skew import _salt_col

    p = _formatted(salted_join(big, small, ["k"], n_salts=4))
    assert "__salt__" in p  # salt participates in the join condition
    salts = (
        big.withColumn("__salt__", _salt_col(4, big.columns))
        .where(F.col("k") == 0)
        .select("__salt__")
        .distinct()
        .count()
    )
    assert salts == 4


def test_salt_is_retry_deterministic(spark):
    """The salt must be a pure function of row CONTENT — a recomputed
    map task (fetch-failure retry) must re-derive identical salts, or
    salted_join/salted_agg silently duplicate/drop rows at scale. A
    repartition between two evaluations simulates rows landing in
    different partitions/positions, which flips partition-id or
    monotonically_increasing_id derived salts."""
    from jagular_spark.operators.skew import _salt_col

    big = _skewed(spark, n=2_000)
    a = {
        (r.k, r.v, r.s)
        for r in big.withColumn("s", _salt_col(8, big.columns)).collect()
    }
    shuffled = big.repartition(13)
    b = {
        (r.k, r.v, r.s)
        for r in shuffled.withColumn("s", _salt_col(8, shuffled.columns)).collect()
    }
    assert a == b


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed(spark)
    got = {
        (r.k, r.total, r.n, r.lo, r.hi)
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": ("sum", "v"),
                "n": ("count", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            n_salts=4,
        ).collect()
    }
    want = {
        (r.k, r.total, r.n, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_bucketed_tables_join_without_exchange(spark):
    """Two tables bucketed on the join key into the same bucket count
    must sort-merge-join with NO Exchange on either side — the co-located
    join that makes repeated fact-fact joins free at 100 TB."""
    a = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed_table(a, "bkt_a", ["k"], n_buckets=4)
    write_bucketed_table(b, "bkt_b", ["k"], n_buckets=4)
    # at fixture size the planner would broadcast one side (its own
    # shuffle-free strategy, but it hides the bucketing); force the
    # sort-merge path the join takes at fact-fact scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        p = _formatted(j)
        assert "Exchange" not in p, p[:2000]
        assert "SortMergeJoin" in p
        assert j.count() == 1_000
        # correctness spot-check
        row = j.where(F.col("k") == 7).collect()[0]
        assert (row.va, row.vb) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_right_and_full_outer(spark):
    """right/full_outer need the multiplicity correction: an unmatched
    small row must surface exactly ONCE (not once per salt replica).
    Compared as multisets against the unsalted join, with small-side
    keys that miss big entirely (50..79) and a duplicated small row."""
    big = _skewed(spark)
    small = spark.range(30, 80).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    dup = spark.createDataFrame([(60, 600)], "k long, w long")
    small = small.union(dup)  # k=60 twice, both unmatched in big
    for how in ("right", "full_outer"):
        got = sorted(
            map(tuple, salted_join(big, small, ["k"], n_salts=4, how=how).collect())
        )
        want = sorted(map(tuple, big.join(small, ["k"], how).collect()))
        assert got == want, how
        assert len(got) > 0


def test_salted_join_outer_sparse_salt_coverage(spark):
    """Regression for the salt-coverage bug: with exactly ONE big row
    per matched key, that row's content hash occupies a single salt, so
    3 of 4 small replicas are unmatched — an implementation that keeps
    any unmatched replica at salt 0 emits a spurious null-padded row
    for every matched key whose lone big row hashed to salt != 0.
    Null-padding must be decided per small ROW (key-level), never per
    replica. Also covers NULL join keys (match nothing, pad once)."""
    big = spark.createDataFrame(
        [(k, 2 * k) for k in range(1, 41)], "k long, v long"
    )
    small = spark.createDataFrame(
        [(k, 10 * k) for k in range(1, 41)]
        + [(100, 1000), (101, 1010), (None, -1)],
        "k long, w long",
    )
    for how in ("right", "full_outer"):
        got = sorted(
            map(
                lambda r: tuple(None if x is None else x for x in r),
                salted_join(big, small, ["k"], n_salts=4, how=how).collect(),
            )
        , key=str)
        want = sorted(
            map(
                lambda r: tuple(None if x is None else x for x in r),
                big.join(small, ["k"], how).collect(),
            )
        , key=str)
        assert got == want, how
    # full_outer must also surface big-only keys — add some
    big2 = big.union(spark.createDataFrame([(200, 400), (None, -2)], "k long, v long"))
    got = sorted(
        map(tuple, salted_join(big2, small, ["k"], n_salts=4, how="full_outer").collect()),
        key=str,
    )
    want = sorted(
        map(tuple, big2.join(small, ["k"], "full_outer").collect()), key=str
    )
    assert got == want
