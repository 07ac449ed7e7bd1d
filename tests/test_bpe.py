"""BPE tokenizer training: merge selection on a hand-checkable corpus,
the replace-semantics equivalence the cross-engine exactness rests on,
frozen-encode parity vs a pure-Python reference, and the loud
exhaustion guard."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from jagular_spark.operators.bpe import (
    _apply_merge,
    _pair_str,
    bpe_encode_words,
    bpe_fit,
    bpe_vocab_audit,
    bpe_words_col,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fit_on_hand_checkable_corpus(spark):
    """'low low lower': pairs of the symbolized words
    (l o w #) (l o w #) (l o w e r #) — (l,o) and (o,w) both count 3;
    the (cnt DESC, pair ASC) tie-break picks '(l)(o)' first, then
    ('lo','w') at 3 beats everything, then ('low','#') at 2."""
    df = _docs(spark, [(1, "low low lower")])
    merges = bpe_fit(df, n_merges=3, fit_rows=10)
    assert merges == [("l", "o"), ("lo", "w"), ("low", "#")]


def test_fit_ignores_non_alphabetic_and_case(spark):
    """cat42 / punctuation tokens are outside the vocabulary; 'The'
    and 'the' are the same word."""
    a = bpe_fit(_docs(spark, [(1, "The the cat42 !! the")]), 2, 10)
    b = bpe_fit(_docs(spark, [(1, "the the the")]), 2, 10)
    assert a == b


def test_apply_merge_matches_string_replace_semantics(spark):
    """The driver fit's list emulation must equal the engines' literal
    replace-all on the paren representation — including the
    overlapping-run case replace resolves leftmost-first without
    rescanning ((a)(a)(a) -> (aa)(a)). Checked exhaustively over runs
    and mixed patterns via the JVM replace itself."""
    cases = [
        (["a", "a", "a"], ("a", "a")),
        (["a", "a", "a", "a"], ("a", "a")),
        (["x", "a", "b", "a", "b", "y"], ("a", "b")),
        (["ab", "c", "b", "c"], ("b", "c")),  # boundary safety: 'ab'+'c' must not match
        (["a", "b"], ("c", "d")),
    ]
    rows = [
        ("(" + ")(".join(syms) + ")", _pair_str(*pair), f"({pair[0] + pair[1]})", i)
        for i, (syms, pair) in enumerate(cases)
    ]
    got = {
        r.i: r.out
        for r in spark.createDataFrame(rows, "sym string, pat string, rep string, i int")
        .select(F.replace("sym", "pat", "rep").alias("out"), "i")
        .collect()
    }
    for i, (syms, pair) in enumerate(cases):
        expect = "(" + ")(".join(_apply_merge(syms, *pair)) + ")"
        assert got[i] == expect, (syms, pair, got[i], expect)


def test_encode_matches_python_reference_on_real_docs(spark):
    """Frozen-merge serving parity: the JVM replace-chain encode equals
    the pure-Python list-level encode word for word on the sf0.001
    documents corpus."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=8, fit_rows=64)
    enc = docs.select(
        "doc_id", bpe_encode_words("text", merges).alias("ws")
    ).collect()
    assert enc and any(r.ws for r in enc)
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        words = [
            t.lower()
            for t in re.split(r"\s+", (r.text or "").strip())
            if re.fullmatch("[A-Za-z]+", t)
        ]
        expect = []
        for w in words:
            syms = list(w) + ["#"]
            for a, b in merges:
                syms = _apply_merge(syms, a, b)
            expect.append("(" + ")(".join(syms) + ")")
        got = next(e.ws for e in enc if e.doc_id == r.doc_id)
        assert list(got) == expect, (r.doc_id, got[:3], expect[:3])


def test_vocab_audit_counts_and_zero_rows(spark):
    """n_final counts the token's survivals in the FINAL encoding; a
    token fully consumed by a later merge legitimately reads 0 but its
    rank row must still be present (the left-join contract)."""
    df = _docs(spark, [(1, "aaaa aaaa"), (2, "aaaa")])
    # merges: (a,a)->aa dominates; then (aa,aa)->aaaa consumes every aa
    merges = bpe_fit(df, n_merges=2, fit_rows=10)
    assert merges[0] == ("a", "a")
    out = {r.rank: (r.token, r.n_final) for r in bpe_vocab_audit(df, merges).collect()}
    assert len(out) == 2 and out[1][0] == "aa"
    if merges[1] == ("aa", "aa"):
        assert out[1][1] == 0  # every 'aa' merged into 'aaaa'


def test_fit_exhaustion_raises(spark):
    """A sample whose words fully merge before n_merges must fail
    loudly, not return a silently short vocabulary."""
    with pytest.raises(ValueError, match="exhausted"):
        bpe_fit(_docs(spark, [(1, "ab ab")]), n_merges=10, fit_rows=10)


def test_bpe_audit_plan_shape(spark):
    """Scale shape: the encode is scan-local (no exchange before the
    bounded symbol-count aggregate), the rank attach is a broadcast
    join, and nothing sorts the corpus."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=4, fit_rows=32)
    p_df = bpe_vocab_audit(docs, merges)
    jvm = spark._jvm
    p = p_df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_fit_is_partition_invariant(spark):
    """The merge list is a pure function of (corpus, salt): physical
    layout of the sample scan must not change a single merge (counts
    are order-independent, ties broken on the pair string, sample
    membership deterministic)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    a = bpe_fit(docs, n_merges=12, fit_rows=64)
    b = bpe_fit(docs.repartition(7), n_merges=12, fit_rows=64)
    assert a == b


def test_encode_partitions_the_word(spark):
    """Structural invariant of any correct BPE application: the encoded
    symbols, concatenated (parens stripped), must reconstruct the
    original lowercased word plus the end marker EXACTLY — merges
    re-segment, never alter, the character stream. Checked via the JVM
    expression over the real corpus for several merge depths."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    for n_merges in (1, 8, 16):
        merges = bpe_fit(docs, n_merges=n_merges, fit_rows=64)
        bad = (
            docs.select(
                F.explode(
                    F.arrays_zip(
                        bpe_words_col("text").alias("w"),
                        bpe_encode_words("text", merges).alias("e"),
                    )
                ).alias("z")
            )
            .where(
                F.replace(
                    F.replace(F.col("z.e"), F.lit("("), F.lit("")),
                    F.lit(")"),
                    F.lit(""),
                )
                != F.concat(F.col("z.w"), F.lit("#"))
            )
            .count()
        )
        assert bad == 0, f"n_merges={n_merges}: {bad} words corrupted"


def test_rank_encoder_equals_chain_encoder(spark):
    """The rank-based word encoder (serving path at realistic merge
    counts) must replay the sequential replace chain bit-for-bit:
    applying merge r only creates pairs involving the new token, and
    any fitted pair containing it was learned later — so lowest-rank-
    first equals chain order. Checked on every distinct word of the
    real corpus plus adversarial overlap cases."""
    from jagular_spark.operators.bpe import bpe_encode_word_py, bpe_merge_ranks

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=16, fit_rows=64)
    ranks = bpe_merge_ranks(merges)
    words = {
        t.lower()
        for r in docs.collect()
        for t in re.split(r"\s+", (r.text or "").strip(), flags=re.ASCII)
        if re.fullmatch("[A-Za-z]+", t)
    }
    words |= {"aaaa", "abababab", "lowlowlower", "zzz"}
    for w in sorted(words):
        syms = list(w) + ["#"]
        for a, b in merges:
            syms = _apply_merge(syms, a, b)
        chain = "(" + ")(".join(syms) + ")"
        assert bpe_encode_word_py(w, ranks) == chain, w


def test_audit_distinct_equals_chain_audit(spark):
    """bpe_vocab_audit_distinct is result-identical to the
    per-occurrence chain audit on the real corpus (same oracle)."""
    from jagular_spark.operators.bpe import bpe_vocab_audit_distinct

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=16, fit_rows=64)
    chain = {(r.rank, r.token, r.n_final) for r in bpe_vocab_audit(docs, merges).collect()}
    dist = {
        (r.rank, r.token, r.n_final)
        for r in bpe_vocab_audit_distinct(docs, merges).collect()
    }
    assert dist == chain and len(dist) == 16


def test_encode_corpus_words_broadcast_plan_and_values(spark):
    """The corpus-side encode job is one scan + one BROADCAST join (the
    plan pin the 32k-merge serving shape rests on) and its (id, word,
    enc) rows agree with the chain encode."""
    from jagular_spark.operators.bpe import bpe_encode_corpus_words

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=8, fit_rows=64)
    out = bpe_encode_corpus_words(docs, merges)
    jvm = spark._jvm
    p = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    got = sorted(
        (r.doc_id, r.word, r.enc) for r in out.collect()
    )
    expect = sorted(
        (r.doc_id, r.z.w, r.z.e)
        for r in docs.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    bpe_words_col("text").alias("w"),
                    bpe_encode_words("text", merges).alias("e"),
                )
            ).alias("z"),
        ).collect()
    )
    assert got == expect and got


def test_rank_encoder_equals_chain_on_random_words():
    """Property check (no Spark needed): for random words over a small
    alphabet and a random-but-valid merge sequence (each merge's parts
    exist when it is learned — built by running the fit on a random
    sample), the rank-based encoder equals the full sequential chain."""
    import random

    from jagular_spark.operators.bpe import (
        _apply_merge,
        _pair_str,
        bpe_encode_word_py,
        bpe_merge_ranks,
    )

    rng = random.Random(20260816)
    for trial in range(25):
        alpha = "abcd"[: rng.randint(2, 4)]
        sample = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
            for _ in range(rng.randint(5, 40))
        ]
        # fit merges on the sample exactly like bpe_fit's inner loop
        words = [list(w) + ["#"] for w in sample]
        merges = []
        for _ in range(rng.randint(1, 12)):
            counts = {}
            for w in words:
                for i in range(len(w) - 1):
                    counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + 1
            if not counts:
                break
            pair = min(counts, key=lambda p: (-counts[p], _pair_str(*p)))
            merges.append(pair)
            words = [_apply_merge(w, *pair) for w in words]
        ranks = bpe_merge_ranks(merges)
        probes = sample + [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
            for _ in range(20)
        ]
        for w in probes:
            syms = list(w) + ["#"]
            for a, b in merges:
                syms = _apply_merge(syms, a, b)
            chain = "(" + ")(".join(syms) + ")"
            assert bpe_encode_word_py(w, ranks) == chain, (trial, w, merges)


def test_encode_corpus_words_with_prebuilt_map(spark):
    """The build-once/serve-many form: a provided (word, enc) map
    skips the map-build pre-pass and yields identical rows."""
    from jagular_spark.operators.bpe import (
        bpe_encode_corpus_words,
        bpe_word_encodings,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=8, fit_rows=64)
    prebuilt = bpe_word_encodings(
        docs.select(F.explode(bpe_words_col("text")).alias("word")).distinct(),
        merges,
    )
    a = sorted(tuple(r) for r in bpe_encode_corpus_words(docs, merges).collect())
    b = sorted(
        tuple(r)
        for r in bpe_encode_corpus_words(docs, merges, enc_map=prebuilt).collect()
    )
    assert a == b and a


def test_encode_corpus_words_join_strategy_exactness(spark):
    """The broadcast_map knob (r17) is a pure join-strategy choice:
    broadcast, shuffle-hash, and the auto path on BOTH sides of its
    threshold all yield identical rows. max_broadcast_words=0 drives
    auto onto the shuffle-hash branch (every real map exceeds 0);
    the default 4M threshold keeps the fixture map broadcast-side."""
    import pytest

    from jagular_spark.operators.bpe import bpe_encode_corpus_words

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    merges = bpe_fit(docs, n_merges=8, fit_rows=64)
    ref = sorted(
        tuple(r)
        for r in bpe_encode_corpus_words(
            docs, merges, broadcast_map=True
        ).collect()
    )
    assert ref
    for kwargs in (
        {"broadcast_map": False},
        {"broadcast_map": "auto"},
        {"broadcast_map": "auto", "max_broadcast_words": 0},
    ):
        got = sorted(
            tuple(r)
            for r in bpe_encode_corpus_words(docs, merges, **kwargs).collect()
        )
        assert got == ref, kwargs
    with pytest.raises(ValueError, match="broadcast_map"):
        bpe_encode_corpus_words(docs, merges, broadcast_map="yes")


def test_encode_corpus_words_auto_exposes_persist_handle(spark):
    """broadcast_map="auto" persists the sizing copy of the encoding
    map; the returned DataFrame must carry the cached map as
    .persisted_enc_map so a long-lived caller can release it after
    the consuming action (r17 advice: the old function-local handle
    made the cache unreleasable). Non-auto paths persist nothing and
    expose no handle."""
    from pyspark import StorageLevel

    from jagular_spark.operators.bpe import bpe_encode_corpus_words

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe_fit(docs, n_merges=4, fit_rows=64)
    out = bpe_encode_corpus_words(docs, merges, broadcast_map="auto")
    handle = out.persisted_enc_map
    assert handle.storageLevel != StorageLevel.NONE
    assert out.count() > 0  # consuming action reads the cached map
    handle.unpersist()
    assert handle.storageLevel == StorageLevel.NONE
    for kwargs in ({"broadcast_map": True}, {"broadcast_map": False}):
        assert not hasattr(
            bpe_encode_corpus_words(docs, merges, **kwargs),
            "persisted_enc_map",
        )
