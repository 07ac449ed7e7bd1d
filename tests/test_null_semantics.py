"""Pins for the NULL-semantics policies built in r18 (r17 verdict
Missing #1 / task #2): the result-changing edge behaviors found in the
r17 review, each implemented behind a parameter whose DEFAULT keeps
every current oracle hash-identical (no shipped corpus carries a NULL
anywhere — measured across sf0.001/0.01/0.1), scheduled to flip
engine+oracle together in the r20 window where the affected queries
are mandatory re-verifies. These tests pin BOTH sides of each knob so
the flip is a one-line default change against an already-proven
behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- language_id

def test_language_id_null_text_policy(spark):
    """Legacy: the greedy argmax CASE falls through every NULL
    comparison to the LAST profile — NULL text is "classified" as
    Spanish. null_pred=True: NULL text -> NULL pred_lang. Empty text
    is a real value either way (scores 0.0, argmax -> first profile)."""
    from jagular_spark.operators.text import language_id

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the cat of the house and the dog")],
        "doc_id long, text string",
    )
    legacy = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert legacy == {1: "es", 2: "en", 3: "en"}
    fixed = {
        r.doc_id: r.pred_lang for r in language_id(df, null_pred=True).collect()
    }
    assert fixed == {1: None, 2: "en", 3: "en"}
    # scores are NULL exactly for the NULL text under both policies
    srow = {r.doc_id: r.s_en for r in language_id(df, null_pred=True).collect()}
    assert srow[1] is None and srow[2] == 0.0


# ---------------------------------------------------------------- gopher_rules

def test_gopher_rules_null_text_policy(spark):
    from jagular_spark.operators.text import gopher_rules

    df = spark.createDataFrame(
        [(1, None), (2, "word " * 60)], "doc_id long, text string"
    )
    legacy = {r.doc_id: r for r in gopher_rules(df).collect()}
    # propagate (default): NULL text poisons every count and flag
    assert legacy[1].keep is None and legacy[1].r1_word_count is None
    assert legacy[1].n_words is None

    fixed = {
        r.doc_id: r for r in gopher_rules(df, null_text="reject").collect()
    }
    # reject: evaluated as empty string — every flag a real boolean,
    # keep an explicit False a WHERE keep filter drops
    assert fixed[1].keep is False and fixed[1].r1_word_count is False
    assert fixed[1].n_words == 1 and fixed[1].word_chars == 0
    # non-null rows identical under both policies
    assert tuple(legacy[2]) == tuple(fixed[2])

    with pytest.raises(ValueError, match="null_text"):
        gopher_rules(df, null_text="bogus")


# ---------------------------------------------------------------- samplers

def _null_key_df(spark):
    return spark.createDataFrame(
        [(None, "web", "alpha beta"), (2, "web", "gamma delta"),
         (3, "code", "epsilon zeta"), (4, None, "eta theta")],
        "doc_id long, source string, text string",
    )


def test_hash_sample_null_key_policies(spark):
    from jagular_spark.operators.sampling import hash_sample

    df = _null_key_df(spark)
    # drop (legacy): the NULL-key row silently falls out even at
    # fraction 1.0 — the silent-loss behavior the r17 review flagged
    kept = {r.doc_id for r in hash_sample(df, "doc_id", 1.0).collect()}
    assert None not in kept and kept == {2, 3, 4}
    # keep: NULL keys pass through unconditionally
    kept = {
        r.doc_id
        for r in hash_sample(df, "doc_id", 0.0, null_keys="keep").collect()
    }
    assert kept == {None}
    # error: loud
    with pytest.raises(Exception, match="NULL sampling key"):
        hash_sample(df, "doc_id", 0.5, null_keys="error").collect()
    with pytest.raises(ValueError, match="null_keys"):
        hash_sample(df, "doc_id", 0.5, null_keys="bogus")


def test_stratified_and_token_budget_null_keys(spark):
    from jagular_spark.operators.sampling import (
        stratified_sample,
        token_budget_sample,
    )

    df = _null_key_df(spark)
    kept = {
        r.doc_id
        for r in stratified_sample(
            df, "source", {"web": 1.0, "code": 1.0}, default_fraction=1.0,
            null_keys="keep",
        ).collect()
    }
    assert kept == {None, 2, 3, 4}  # NULL stratum takes default_fraction

    out = token_budget_sample(
        df, {"web": 10_000, "code": 10_000}, null_keys="keep"
    )
    kept = {r.doc_id for r in out.collect()}
    # NULL key kept by policy; NULL GROUP still dropped explicitly
    # (threshold 0 — a mixture is a whole composition)
    assert None in kept and 4 not in kept


def test_rebalance_sample_null_group_policies(spark):
    from jagular_spark.operators.sampling import rebalance_sample

    df = _null_key_df(spark)
    tgt = {"web": 0.5, "code": 0.5}
    # drop (legacy): the inner equi-join silently loses the NULL-group
    # row BEFORE any share policy sees it
    kept = {
        r.doc_id
        for r in rebalance_sample(df, "source", tgt, default_share=1.0).collect()
    }
    assert 4 not in kept
    # default_share: null-safe join — the NULL group flows through as
    # an ordinary unlisted stratum
    kept = {
        r.doc_id
        for r in rebalance_sample(
            df, "source", tgt, default_share=1.0, null_groups="default_share"
        ).collect()
    }
    assert 4 in kept
    with pytest.raises(Exception, match="NULL group"):
        rebalance_sample(
            df, "source", tgt, null_groups="error"
        ).collect()
    with pytest.raises(ValueError, match="null_groups"):
        rebalance_sample(df, "source", tgt, null_groups="bogus")


def test_samplers_null_policies_identity_on_null_free_corpus(spark):
    """On a NULL-free corpus every policy is a no-op: the r20 default
    flip cannot move a single registry row. Pinned on the real
    documents table with the registry's own sampler shapes."""
    from jagular_spark.operators.sampling import hash_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = {r.doc_id for r in hash_sample(docs, "doc_id", 0.5).collect()}
    for nk in ("keep", "error"):
        got = {
            r.doc_id
            for r in hash_sample(docs, "doc_id", 0.5, null_keys=nk).collect()
        }
        assert got == base


# ---------------------------------------------------------------- graph

def test_connected_components_null_ids_consistent_across_paths(spark):
    """The r17-review inconsistency: NULL-endpoint edges made the
    driver union-find crash (None vs int comparison) while the
    distributed loop silently dropped the NULL side. r18: both paths
    drop NULL-endpoint edges BEFORE labeling, so the same graph gets
    the same answer at any small_graph_edges threshold."""
    from jagular_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 7), (8, None), (10, 11)],
        "src long, dst long",
    )
    via_driver = {
        (r.id, r.component)
        for r in connected_components(edges, small_graph_edges=10**6).collect()
    }
    via_loop = {
        (r.id, r.component)
        for r in connected_components(edges, small_graph_edges=0).collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert via_driver == via_loop == want
    with pytest.raises(Exception, match="NULL vertex id"):
        connected_components(edges, null_ids="error").collect()
    with pytest.raises(ValueError, match="null_ids"):
        connected_components(edges, null_ids="bogus")


# ---------------------------------------------------------------- knn

def test_knn_classify_null_label_policies(spark):
    """Three labeled vectors + two unlabeled ones nearest to the
    probe: under "legacy" the NULL labels form their own voting bloc
    and win the argmax (pred_label None); under "exclude" the
    unlabeled vectors never enter the neighborhood, so the nearest
    LABELED vectors decide."""
    from jagular_spark.operators.similarity import knn_classify

    rows = [
        # id, embedding, label — probe is id 0; ids 1,2 are nearly
        # parallel to it but unlabeled; 3,4,5 labeled
        (0, [1.0, 0.0, 0.0], 7),
        (1, [0.99, 0.1, 0.0], None),
        (2, [0.98, 0.15, 0.0], None),
        (3, [0.9, 0.3, 0.0], 5),
        (4, [0.85, 0.4, 0.0], 5),
        (5, [0.0, 1.0, 0.0], 6),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    legacy = knn_classify(df, F.col("vec_id") == 0, k=2).collect()
    assert legacy[0].pred_label is None  # the unlabeled bloc won
    fixed = knn_classify(
        df, F.col("vec_id") == 0, k=2, null_labels="exclude"
    ).collect()
    assert fixed[0].pred_label == 5 and fixed[0].votes == 2
    with pytest.raises(ValueError, match="null_labels"):
        knn_classify(df, F.col("vec_id") == 0, null_labels="bogus")


# ------------------------------------------------------------ fit sampling

def test_hash_sample_rows_null_keys_match_duckdb_order(spark):
    """hash_sample_rows is the fit-sample primitive every quantizer
    routes through (_collect_fit_sample, bpe_fit). A NULL key hashes
    to a NULL bucket; Spark's bare asc sorts NULLS FIRST while
    DuckDB's ORDER BY ... LIMIT sorts NULLS LAST — before r18 a
    NULL-key corpus silently gave the two engines DIFFERENT fit
    samples (the n_sequences latent-divergence class). Pin: explicit
    NULLS LAST ordering keeps real keys ahead of unhashable rows and
    matches the oracle construction exactly."""
    import duckdb

    from jagular_spark.operators.sampling import hash_sample_rows

    rows = [(None,), (7,), (11,), (13,), (None,), (29,)]
    df = spark.createDataFrame(rows, "doc_id long")
    got = [r.doc_id for r in hash_sample_rows(df, "doc_id", 3).collect()]
    assert None not in got and len(got) == 3

    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM (VALUES (NULL),(7),(11),(13),(NULL),(29)) "
            "t(doc_id) ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, "
            "doc_id LIMIT 3"
        ).fetchall()
    ]
    assert sorted(got) == sorted(want)
    # with fewer real keys than n_rows, NULL rows backfill on BOTH
    # engines (nulls-last, not excluded)
    got5 = [r.doc_id for r in hash_sample_rows(df, "doc_id", 5).collect()]
    assert sorted(x for x in got5 if x is not None) == [7, 11, 13, 29]
    assert got5.count(None) == 1


# ------------------------------------------------------------ grouped strategy

def test_grouped_map_null_keys_form_one_group(spark):
    """The many-small-groups strategy advertises groupBy().applyInPandas
    semantics; before r18 its pandas boundary scan used kf != kf.shift()
    where NaN != NaN is True, so a NULL-keyed group silently shattered
    into one-row groups — kernels that aggregate within a group (means,
    censors, filters) returned per-row garbage for NULL keys while the
    real applyInPandas grouped them together. Pin: one kernel call sees
    ALL NULL-key rows, same as applyInPandas."""
    from jagular_spark.operators.grouped import grouped_map_in_pandas

    df = spark.createDataFrame(
        [(None, 1, 10.0), (None, 2, 20.0), (7, 1, 1.0), (7, 2, 2.0)],
        "channel_id int, ts long, value double",
    )

    def kernel(g):
        import pandas as pd

        return pd.DataFrame(
            {
                "channel_id": [g["channel_id"].iloc[0]],
                "n": [len(g)],
                "total": [float(g["value"].sum())],
            }
        )

    rows = {
        (r.channel_id, r.n, r.total)
        for r in grouped_map_in_pandas(
            df, ["channel_id"], ["ts"], kernel,
            "channel_id int, n long, total double",
        ).collect()
    }
    assert rows == {(None, 2, 30.0), (7, 2, 3.0)}


def test_knn_classify_string_labels_validated(spark):
    """String label columns cast to long for the vote; before r18 a
    non-numeric string cast to NULL SILENTLY — the neighbor lost its
    vote (or joined the NULL bloc under legacy) with no signal the
    label set was bad. Numeric strings still work; a garbage label
    raises row-locally."""
    from jagular_spark.operators.similarity import knn_classify

    ok = spark.createDataFrame(
        [(0, [1.0, 0.0], "7"), (1, [0.9, 0.1], "5"), (2, [0.8, 0.2], "5")],
        "vec_id long, embedding array<double>, label string",
    )
    got = knn_classify(ok, F.col("vec_id") == 0, k=2).collect()
    assert got[0].pred_label == 5
    bad = spark.createDataFrame(
        [(0, [1.0, 0.0], "7"), (1, [0.9, 0.1], "spam")],
        "vec_id long, embedding array<double>, label string",
    )
    with pytest.raises(Exception, match="non-numeric label"):
        knn_classify(bad, F.col("vec_id") == 0, k=1).collect()
