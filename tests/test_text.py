"""Property tests for text-analysis operators (exact values are pinned
by the DuckDB oracle harness; these check semantic properties)."""

from __future__ import annotations

import pytest

from jagular_spark.operators import text as txt


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id_picks_profile_language(spark):
    rows = [
        (0, "the cat and the dog of a house in the garden is big"),
        (1, "le chat et la maison de les arbres un jour une nuit"),
        (2, "der hund und die katze das haus ein garten zu hause"),
        (3, "el perro y la casa de los gatos un dia en madrid"),
    ]
    out = {r.doc_id: r.pred_lang for r in txt.language_id(_df(spark, rows)).collect()}
    assert out == {0: "en", 1: "fr", 2: "de", 3: "es"}


def test_rolling_fingerprint_is_order_sensitive(spark):
    rows = [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")]
    fp = {r.doc_id: r.fp_roll for r in txt.fingerprints(_df(spark, rows)).collect()}
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]


def test_min_gram_fingerprint_stable_under_distant_edit(spark):
    base = "x" * 40 + " the quick brown fox jumps over the lazy dog"
    edited = "y" * 40 + " the quick brown fox jumps over the lazy dog"
    rows = [(0, base), (1, edited)]
    fp = {r.doc_id: r.fp_min8 for r in txt.fingerprints(_df(spark, rows)).collect()}
    # the minimizing 8-gram usually survives an edit elsewhere; at minimum
    # the op is deterministic and produces 32-bit hashes
    assert all(0 <= v < 2**32 for v in fp.values())


def test_bpe_token_stats_counts(spark):
    rows = [(0, "hello, world! abc123 longwordhere")]
    r = txt.bpe_token_stats(_df(spark, rows)).collect()[0]
    # tokens: hello , world ! abc 123 longwordhere  -> 7
    assert r.n_regex_tokens == 7
    assert r.n_punct == 2
    # subwords: ceil(5/4)+1+ceil(5/4)+1+ceil(3/4)+ceil(3/4)+ceil(12/4) = 2+1+2+1+1+1+3
    assert r.n_subwords == 11


def test_chunk_documents_windows(spark):
    from jagular_spark.operators.text import chunk_documents

    words = [f"w{i}" for i in range(70)]
    rows = [(1, " ".join(words)), (2, "a b"), (3, " ".join(f"x{i}" for i in range(24)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.start_tok, r.n_tokens, r.chunk_hash)
        for r in chunk_documents(df, chunk_tokens=32, stride=24).collect()
    }
    import hashlib

    # python reference: starts at 0, 24, 48, ... while start < n
    want = {}
    for doc_id, text in rows:
        t = text.split()
        for ci, start in enumerate(range(0, len(t), 24)):
            w = t[start : start + 32]
            want[(doc_id, ci)] = (
                start,
                len(w),
                hashlib.md5(" ".join(w).encode()).hexdigest(),
            )
    assert got == want
    # overlap property: consecutive full chunks share chunk-stride tokens
    assert got[(1, 0)][1] == 32 and got[(1, 1)][0] == 24


def test_vocab_top_df_determinism_and_counts(spark):
    from jagular_spark.operators.text import vocab_top_df

    df = spark.createDataFrame(
        [
            (1, "aa bb aa", "en"),   # aa counted once per doc (distinct)
            (2, "aa cc", "en"),
            (3, "bb cc", "en"),
            (4, "zz", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    got = [(r.lang, r.token, r.df, r.rank) for r in vocab_top_df(df, top_k=2)
           .orderBy("lang", "rank").collect()]
    # en: aa=2, bb=2, cc=2 -> tie broken by token asc -> aa, bb
    assert got == [("en", "aa", 2, 1), ("en", "bb", 2, 2), ("fr", "zz", 1, 1)]


def test_domain_mixture_shares(spark):
    from jagular_spark.operators.text import domain_mixture

    df = spark.createDataFrame(
        [(1, "a b c", "en", "s0"), (2, "d e", "en", "s1"), (3, "f", "fr", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    rows = domain_mixture(df).collect()
    shares = {(r.lang, r.source): (r.n_docs, r.n_tokens, r.token_share) for r in rows}
    assert shares[("en", "s0")] == (1, 3, 0.5)
    assert shares[("en", "s1")] == (1, 2, 2 / 6)
    assert shares[("fr", "s0")] == (1, 1, 1 / 6)
    assert abs(sum(v[2] for v in shares.values()) - 1.0) < 1e-12


def test_repetition_stats_crafted(spark):
    from jagular_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),    # heavy 3-gram repetition
            (2, "one two three four"),   # all distinct
            (3, "x y"),                  # shorter than one gram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_grams, r.n_distinct_grams, r.is_repetitive)
           for r in repetition_stats(df, flag_above=0.3).collect()}
    # doc1: 7 grams, distinct {abc, bca, cab} = 3 -> dup_frac 4/7 -> flagged
    assert got[1] == (7, 3, True)
    assert got[2] == (2, 2, False)
    assert got[3] == (0, 0, False)


def test_decontaminate_crafted(spark):
    from jagular_spark.operators.text import decontaminate

    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [
            (1, leak + " extra tail words here"),            # contains eval 8-grams
            (2, "totally unrelated content with many words"),
            (3, "alpha beta gamma delta only four shared"),  # < 8-gram overlap
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    got = {r.doc_id: (r.n_shared, r.contaminated)
           for r in decontaminate(train, eval_df, n=8, min_shared=2).collect()}
    assert got[1][1] is True and got[1][0] >= 2
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_tfidf_top_ranks_rare_terms_highest(spark):
    rows = [
        (0, "common rare common common unique"),
        (1, "common filler filler words here"),
        (2, "common more words again filler"),
        (3, "common words words yet another"),
    ]
    out = txt.tfidf_top(_df(spark, rows), top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: "rare"/"unique" (df=1, score 4e6) outrank "common"
    # (df=4 → tf 3 · idf 1e6 = 3e6) despite the higher tf
    top0 = sorted(by_doc[0], key=lambda r: r.rank)
    assert {top0[0].token, top0[1].token} == {"rare", "unique"}
    # score is the exact integer surrogate tf * ((N * 1e6) DIV df)
    assert all(r.score == r.tf * ((4 * 1_000_000) // r.df) for r in out)
    # deterministic ties: equal scores ordered by token ascending
    assert top0[0].token == "rare"


def test_bigram_fluency_scores_coherent_text_higher(spark):
    # "a b" appears in 3 docs; the shuffled doc's bigrams are unique
    rows = [
        (0, "a b c d", "en"),
        (1, "a b c d", "en"),
        (2, "a b c d", "en"),
        (3, "d c b a", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in txt.bigram_fluency(df).collect()}
    assert out[0].n_bigrams == 3 and out[0].freq_sum == 9
    assert out[3].freq_sum == 3  # each reversed bigram occurs once
    assert out[0].fluency > out[3].fluency
    assert out[0].fluency == out[0].freq_sum / out[0].n_bigrams


def test_repeated_kgram_spans_semantics(spark):
    """Hand-built corpus: doc 1 and doc 2 share one 10-token run (k=4
    -> 7 duplicated windows merged into ONE maximal span per doc); doc
    3 repeats a 4-token phrase intra-document (both occurrences
    flagged); doc 4 is unique (no rows); doc 5 is shorter than k (no
    rows, no sequence error)."""
    from jagular_spark.operators.text import repeated_kgram_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"intro one two {shared} outro"),
        (2, f"{shared} different tail here"),
        (3, "x y z w junk1 junk2 junk3 x y z w end"),
        (4, "totally unique words nothing repeats in here at all"),
        (5, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start): (r.span_len, r.n_windows)
        for r in repeated_kgram_spans(df, k=4).collect()
    }
    # doc 1: shared run starts at token 3, 10 tokens -> windows 3..9
    assert got[(1, 3)] == (10, 7)
    # doc 2: same run at token 0
    assert got[(2, 0)] == (10, 7)
    # doc 3: "x y z w" at 0 and at 7, one window each
    assert got[(3, 0)] == (4, 1) and got[(3, 7)] == (4, 1)
    assert {d for d, _ in got} == {1, 2, 3}


def test_cut_spans_semantics(spark):
    """Token surgery on the hand-built corpus: spans from
    repeated_kgram_spans are CUT (every covered token dropped,
    survivors re-joined with single spaces); span-free docs pass
    through whitespace-normalized; a fully-covered doc yields empty
    text, not NULL."""
    from jagular_spark.operators.text import cut_spans, repeated_kgram_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"intro one two {shared} outro"),
        (2, f"{shared} different tail here"),
        (3, "totally unique words nothing repeats in here at all"),
        (4, shared),
        (5, f"  {shared}  "),  # whole doc duplicated + stray whitespace
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_kgram_spans(df, k=4).select(
        "doc_id", "span_start", "span_len"
    )
    got = {r.doc_id: r for r in cut_spans(df, spans).collect()}
    assert got[1].clean_text == "intro one two outro"
    assert (got[1].n_spans, got[1].n_tokens_cut) == (1, 10)
    assert got[2].clean_text == "different tail here"
    # no spans: normalized passthrough, zero cuts
    assert got[3].n_spans == 0 and got[3].n_tokens_cut == 0
    assert got[3].clean_text == rows[2][1]
    # docs 4/5 are entirely the duplicated run -> empty string out
    assert got[4].clean_text == "" and got[4].n_tokens_cut == 10
    assert got[5].clean_text == "" and got[5].n_tokens_cut == 10


def test_keep_first_exempts_canonical_occurrence(spark):
    """keep_first=True: the corpus-minimum (doc_id, pos) occurrence of
    each duplicated window is NOT marked, so after cut_spans exactly
    one copy of the repeated run survives (in the smallest doc_id) and
    every other copy is cut — the published Lee-et-al keep policy.
    Default mode on the same corpus cuts every copy."""
    from jagular_spark.operators.text import cut_spans, repeated_kgram_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"intro one two {shared} outro"),
        (2, f"{shared} different tail here"),
        (3, shared),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans_kf = repeated_kgram_spans(df, k=4, keep_first=True).select(
        "doc_id", "span_start", "span_len"
    )
    got = {r.doc_id: r for r in cut_spans(df, spans_kf).collect()}
    # doc 1 holds the min (doc_id, pos) occurrence of every shared
    # window -> fully exempt; docs 2 and 3 lose the run
    assert got[1].clean_text == f"intro one two {shared} outro"
    assert got[1].n_tokens_cut == 0
    assert got[2].clean_text == "different tail here"
    assert got[3].clean_text == ""
    # default policy cuts every copy, including doc 1's
    spans_all = repeated_kgram_spans(df, k=4).select(
        "doc_id", "span_start", "span_len"
    )
    got_all = {r.doc_id: r for r in cut_spans(df, spans_all).collect()}
    assert got_all[1].clean_text == "intro one two outro"


def test_keep_first_ordering_survives_hostile_id_domain(spark):
    """The canonical-occurrence MIN is a struct(id, pos) aggregate, so
    it orders correctly for NEGATIVE doc_ids and ids >= 2^31 — the r9
    packed id*2^32+pos BIGINT mis-ordered the former and overflowed on
    the latter, silently keeping the wrong copy."""
    from jagular_spark.operators.text import cut_spans, repeated_kgram_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (-5, shared),                       # corpus-min id: the keeper
        (2**31 + 7, f"{shared} tail here"),  # packed form overflowed here
        (3, shared),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_kgram_spans(df, k=4, keep_first=True).select(
        "doc_id", "span_start", "span_len"
    )
    got = {r.doc_id: r for r in cut_spans(df, spans).collect()}
    assert got[-5].n_tokens_cut == 0 and got[-5].clean_text == shared
    assert got[2**31 + 7].clean_text == "tail here"
    assert got[3].clean_text == ""


def test_repeated_kgram_spans_partition_invariant(spark):
    """Same hashes at 1 and 7 input partitions — the operator's output
    is a pure function of the corpus, not the layout."""
    from jagular_spark.operators.text import repeated_kgram_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        map(tuple, repeated_kgram_spans(docs, k=8).collect())
    )
    b = sorted(
        map(tuple, repeated_kgram_spans(docs.repartition(7), k=8).collect())
    )
    assert a == b and len(a) > 0


def test_substring_dedup_staged_equals_composed(spark, tmp_path):
    """substring_dedup_staged (the 100 TB deployment shape: detect →
    stage spans to parquet → cut) is output-identical to the composed
    one-job form on the real documents fixture, for BOTH span
    policies — only the execution shape (peak memory, fault-tolerance
    of the intermediate) differs. Also pins that the staged span table
    actually landed on disk (the fault-tolerant intermediate is the
    point)."""
    import os

    from jagular_spark.operators.text import (
        cut_spans,
        repeated_kgram_spans,
        substring_dedup_staged,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for keep_first in (False, True):
        stage = str(tmp_path / f"spans_kf{keep_first}")
        composed = sorted(
            map(tuple, cut_spans(
                docs, repeated_kgram_spans(docs, k=8, keep_first=keep_first)
            ).collect())
        )
        staged = sorted(
            map(tuple, substring_dedup_staged(
                docs, stage, k=8, keep_first=keep_first
            ).collect())
        )
        assert staged == composed and len(staged) > 0
        assert any(f.endswith(".parquet") for f in os.listdir(stage))
        # the staged table IS the detect output — reusable by a resume
        spans = spark.read.parquet(stage)
        assert set(spans.columns) == {"doc_id", "span_start", "span_len", "n_windows"}
        assert spans.count() > 0


def test_substring_dedup_streamed_equals_batch(spark):
    """The availableNow streamed composition (GroupState retroactive
    dup marks -> batch span merge) must equal the batch operator
    row-for-row."""
    from jagular_spark.workloads import (
        docs_substring_dedup,
        docs_substring_dedup_streamed,
    )

    sf = "/root/testdata/sf0.001"
    batch = sorted(map(tuple, docs_substring_dedup(spark, sf).collect()))
    streamed = sorted(map(tuple, docs_substring_dedup_streamed(spark, sf).collect()))
    assert streamed == batch and len(batch) > 0


def test_bm25_topk_semantics(spark):
    """BM25 ordering on a hand-built corpus: rarer query terms weigh
    more (idf), repeated terms saturate (tf normalization), longer
    docs are penalized (length norm), zero-match docs are excluded."""
    from jagular_spark.operators.text import bm25_topk

    rows = [
        (1, "rare word here"),             # has the rare term
        (2, "common stuff common filler"),  # common only
        (3, "common words and padding text galore making this doc long common"),
        (4, "nothing relevant at all"),
        (5, "common rare"),                # both terms, short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["rare", "common"], k=10).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # doc 5 (both terms, shortest) first; doc 4 (no match) excluded
    assert ranked[0] == 5
    assert 4 not in ranked
    # doc 1 (rare term) outranks docs with only the common term
    assert ranked.index(1) < ranked.index(2)
    assert ranked.index(1) < ranked.index(3)
    # shorter common-only doc outranks the long one (length norm;
    # doc 3 has 2x 'common' but 12 tokens vs doc 2's 2x in 4 tokens)
    assert ranked.index(2) < ranked.index(3)
    # ranks are 1..n, scores strictly ordered with id tiebreak
    got = sorted(out, key=lambda r: r.rank)
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    assert all(
        (a.score, -a.doc_id) >= (b.score, -b.doc_id)
        for a, b in zip(got, got[1:])
    )


def test_bm25_surrogate_vs_ln_ranking(spark):
    """Documents (does not hide) the engine's cross-term divergence
    from classic ln-idf BM25: the hash-exact rational idf surrogate
    grows LINEARLY in N/df where ln grows logarithmically, so a doc
    strong on one rare term can outrank a doc strong on a commoner
    term even when ln-BM25 orders them the other way. Crafted corpus
    (N=10 docs, 10 tokens each, df_rare=1, df_common=2, tf_common=3):
    the engine ranks the rare-term doc FIRST while the ln replay
    ranks the common-term doc first — both assertions pinned, per the
    bm25_topk docstring's fidelity caveat."""
    import math

    from jagular_spark.operators.text import bm25_topk

    fill = [f"f{i}a f{i}b f{i}c f{i}d f{i}e f{i}f f{i}g f{i}h f{i}i f{i}j"
            for i in range(10)]
    rows = [
        (0, "rare " + " ".join(fill[0].split()[:9])),          # A: rare x1
        (1, "common common common " + " ".join(fill[1].split()[:7])),  # B
        (2, "common " + " ".join(fill[2].split()[:9])),        # df_common=2
    ] + [(i, fill[i]) for i in range(3, 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bm25_topk(df, ["rare", "common"], k=10).collect()}
    # engine (surrogate idf): rare-term doc A beats common-term doc B
    assert out[0].score > out[1].score, (out[0], out[1])
    # ln-idf replay of the SAME tf/length normalization flips the pair
    N, T = 10, 100
    tfpart = lambda tf, dl: 22 * tf * T / (10 * tf * T + 3 * T + 9 * dl * N)  # noqa: E731
    lnidf = lambda dfreq: math.log((2 * N - 2 * dfreq + 1) / (2 * dfreq + 1))  # noqa: E731
    score_a_ln = lnidf(1) * tfpart(1, 10)
    score_b_ln = lnidf(2) * tfpart(3, 10)
    assert score_b_ln > score_a_ln, (score_a_ln, score_b_ln)


def test_bm25_ln_idf_variant(spark):
    """idf="ln" (r10 verdict task #4: the docstring promised the
    published-formula variant; now it is a parameter). On the same
    crafted corpus as test_bm25_surrogate_vs_ln_ranking, the engine's
    ln path must (a) numerically reproduce that test's Python ln
    replay for both pinned docs and (b) flip the pair order relative
    to the rational default — doc B (common term, tf=3) above doc A
    (rare term, tf=1), the opposite of the surrogate's ranking."""
    import math

    from jagular_spark.operators.text import bm25_topk

    fill = [f"f{i}a f{i}b f{i}c f{i}d f{i}e f{i}f f{i}g f{i}h f{i}i f{i}j"
            for i in range(10)]
    rows = [
        (0, "rare " + " ".join(fill[0].split()[:9])),
        (1, "common common common " + " ".join(fill[1].split()[:7])),
        (2, "common " + " ".join(fill[2].split()[:9])),
    ] + [(i, fill[i]) for i in range(3, 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in bm25_topk(df, ["rare", "common"], k=10, idf="ln").collect()
    }
    N, T = 10, 100
    tfpart = lambda tf, dl: 22 * tf * T / (10 * tf * T + 3 * T + 9 * dl * N)  # noqa: E731
    lnidf = lambda dfreq: math.log((2 * N - 2 * dfreq + 1) / (2 * dfreq + 1))  # noqa: E731
    assert out[0].score == pytest.approx(lnidf(1) * tfpart(1, 10), rel=1e-12)
    assert out[1].score == pytest.approx(lnidf(2) * tfpart(3, 10), rel=1e-12)
    # the published formula orders B above A — opposite of the
    # rational surrogate (pinned in the test above)
    assert out[1].score > out[0].score
    assert out[1].rank < out[0].rank
    # bad variant name fails fast
    with pytest.raises(ValueError, match="rational"):
        bm25_topk(df, ["rare"], idf="nope")


def test_bm25_topk_partition_invariant(spark):
    from jagular_spark.operators.text import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in bm25_topk(docs, ["hash", "join"], k=15).collect()]
    b = [
        tuple(r)
        for r in bm25_topk(docs.repartition(7), ["hash", "join"], k=15).collect()
    ]
    assert a == b and len(a) == 15


def test_gopher_rules_crafted(spark):
    """Each rule trips on a purpose-built doc: short doc (r1), long
    gibberish words (r2), symbol-heavy (r3), bullet list (r4),
    ellipsis trailers (r5), numeric tokens (r6), no stop words (r7) —
    and a clean 60-word prose doc passes everything."""
    from jagular_spark.operators.text import gopher_rules

    clean = " ".join(
        ["the data and the model have to be of use with care that works"] * 5
    )
    rows = [
        (0, clean),
        (1, "too short to keep the and of"),                     # r1
        (2, " ".join(["pneumonoultramicroscopics"] * 60) + " the of and"),  # r2
        (3, " ".join(["# the of and to"] * 12)),                 # r3 (12 '#' / 60 words)
        (4, "\n".join(["- item the of and to be that"] * 5)),    # r4 (all lines bullets)
        (5, "\n".join(["the of and to be that have with..."] * 5)),  # r5
        (6, " ".join(["12345"] * 58) + " the of"),               # r6
        (7, " ".join(["zork"] * 60)),                            # r7
        # 50% bullet lines sits INSIDE the published keep band (paper
        # SSA1.1 removes only >90% bullet docs) — regression for the
        # r9 inversion that rejected everything over 10%
        (8, "\n".join(
            ["- the quality data pipeline holds and that with have",
             "the quality data pipeline holds and that with have more"] * 5
        )),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert got[0].keep, got[0]
    assert not got[1].r1_word_count and not got[1].keep
    assert not got[2].r2_mean_word_len and not got[2].keep
    assert not got[3].r3_symbol_ratio and not got[3].keep
    assert not got[4].r4_bullet_lines and not got[4].keep
    assert not got[5].r5_ellipsis_lines and not got[5].keep
    assert not got[6].r6_alpha_words and not got[6].keep
    assert not got[7].r7_stop_words and not got[7].keep
    assert got[8].r4_bullet_lines and got[8].keep, got[8]
    # integer evidence columns are exact
    assert got[3].n_hash == 12 and got[3].n_words == 60
    assert got[4].n_bullet_lines == 5 and got[4].n_lines == 5
    assert got[8].n_bullet_lines == 5 and got[8].n_lines == 10


def test_quality_score_null_not_crash_on_empty_text(spark):
    """r17 (ANSI mode is ON in the session factory): an empty-string
    document previously threw DIVIDE_BY_ZERO out of the quality
    ratios, poison-pilling every consumer. Empty text now yields NULL
    ratios/score (the oracle carries the same nullif), and a quality
    gate simply drops the row."""
    from jagular_spark.operators.text import quality_ratios, quality_score_col

    df = spark.createDataFrame(
        [(1, ""), (2, "the quick brown fox and the lazy dog")],
        "doc_id long, text string",
    )
    r = quality_ratios("text")
    rows = {
        x.doc_id: x
        for x in df.select(
            "doc_id",
            r["alpha"].alias("alpha"),
            quality_score_col("text").alias("score"),
        ).collect()
    }
    assert rows[1].alpha is None and rows[1].score is None
    assert rows[2].score is not None and rows[2].score > 0
    kept = df.where(quality_score_col("text") >= 0.3).collect()
    assert [x.doc_id for x in kept] == [2]


def test_bm25_handles_quoted_terms_and_ln_common_terms(spark):
    """r17: (a) a query term containing a single quote no longer
    crashes the parse (the tf filter now escapes the literal like the
    df aggregate's F.lit); (b) under idf='ln', a term present in most
    documents gets NEGATIVE Robertson idf — matching docs must still
    be returned (the old score>0 filter dropped them, up to returning
    an empty result for a common term)."""
    from jagular_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "don't stop the music"),
            (2, "the music plays on and on"),
            (3, "the band don't play"),
        ],
        "doc_id long, text string",
    )
    quoted = bm25_topk(df, ["don't"], k=3).collect()
    assert sorted(r.doc_id for r in quoted) == [1, 3]

    common = bm25_topk(df, ["the"], idf="ln", k=3).collect()
    assert sorted(r.doc_id for r in common) == [1, 2, 3]  # all match
    assert all(r.score < 0 for r in common)  # df > N/2 -> negative idf
    # and the surrogate mode's result set is unchanged by the new filter
    surro = bm25_topk(df, ["the"], k=3).collect()
    assert sorted(r.doc_id for r in surro) == [1, 2, 3]


def test_domain_mixture_params_keyword_only():
    """domain_mixture dropped its unused middle positional (id_col) in
    r17; keyword-only params make a stale positional call site fail
    immediately with TypeError instead of silently re-meaning
    arguments (text_col='doc_id', domain_cols='text' iterating as
    characters) and erroring confusingly at analysis time."""
    import inspect

    import pytest

    from jagular_spark.operators.text import domain_mixture

    sig = inspect.signature(domain_mixture)
    assert all(
        p.kind is inspect.Parameter.KEYWORD_ONLY
        for n, p in sig.parameters.items()
        if n != "df"
    )
    with pytest.raises(TypeError):
        domain_mixture(None, "doc_id", "text")
