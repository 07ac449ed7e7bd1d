"""Spec-vs-oracle boundary pins (r10 verdict task #3).

The Gopher r4 inversion stayed green for two rounds because the DuckDB
oracle mirrored the same misreading — a hash-match verifies
engine ≡ oracle, never engine ≡ published-spec. These tests pin every
published threshold the repo implements against the PAPER's number,
with a crafted input just INSIDE and just OUTSIDE each bound, so a
mirrored misreading cannot survive:

- Gopher / MassiveText rules r1-r7 (Rae et al. 2021, arXiv:2112.11446
  §A1.1) — both sides of all seven thresholds, plus the r3 regression
  this audit itself found (hash and ellipsis ratios are SEPARATE
  checks in the paper; an earlier revision summed them).
- BM25 constants (Robertson/Okapi, k1 = 1.2, b = 0.75) — the engine's
  integer 22/10/3/9 algebra replayed against the published float
  formula.
- Lee et al. 2022 substring-dedup span semantics — window length k and
  occurrence count min_count, both sides, PLUS a third independent
  pure-Python replay of the whole pass (value-compared windows, no
  hashing) on a seeded threshold-biased random corpus.
- SemDeDup (Abbas et al. 2023) keep rule — cosine threshold boundary,
  both sides, inclusive-≥ drop pinned, PLUS a third independent
  float64 replay of the within-cluster drop policy on a seeded
  grid-exact random corpus.
"""

from __future__ import annotations

import math

import pytest

from jagular_spark.operators.text import bm25_topk, gopher_rules


def _gopher_one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_rules(df).collect()[0]


def _words(*groups):
    out = []
    for word, n in groups:
        out.extend([word] * n)
    return " ".join(out)


# ---------------------------------------------------------------------------
# Gopher rule boundaries — the paper's numbers, not the oracle's
# ---------------------------------------------------------------------------


def test_gopher_r1_word_count_boundaries(spark):
    """Paper: remove docs with <50 or >100,000 words — so exactly 50
    and exactly 100,000 are KEPT."""
    base = [("the", 1), ("of", 1)]
    keep_lo = _gopher_one(spark, _words(*base, ("word", 48)))       # 50
    rej_lo = _gopher_one(spark, _words(*base, ("word", 47)))        # 49
    keep_hi = _gopher_one(spark, _words(*base, ("word", 99_998)))   # 100000
    rej_hi = _gopher_one(spark, _words(*base, ("word", 99_999)))    # 100001
    assert keep_lo.n_words == 50 and keep_lo.r1_word_count and keep_lo.keep
    assert rej_lo.n_words == 49 and not rej_lo.r1_word_count and not rej_lo.keep
    assert keep_hi.n_words == 100_000 and keep_hi.r1_word_count and keep_hi.keep
    assert rej_hi.n_words == 100_001 and not rej_hi.r1_word_count and not rej_hi.keep


def test_gopher_r2_mean_word_length_boundaries(spark):
    """Paper: remove docs whose mean word length is outside [3, 10] —
    means of exactly 3.0 and exactly 10.0 are KEPT."""
    # exactly 3.0: 50 words x 3 chars = 150 chars
    keep3 = _gopher_one(spark, _words(("the", 1), ("and", 1), ("abc", 48)))
    assert keep3.word_chars == 150 and keep3.n_words == 50
    assert keep3.r2_mean_word_len and keep3.keep
    # just below 3.0: one 3-char word swapped for a 2-char word
    rej3 = _gopher_one(spark, _words(("the", 1), ("and", 1), ("of", 1), ("abc", 47)))
    assert rej3.word_chars == 149 and not rej3.r2_mean_word_len and not rej3.keep
    # exactly 10.0: 50 words totalling 500 chars (3+4+47*10+23)
    keep10 = _gopher_one(
        spark,
        _words(("the", 1), ("have", 1), ("abcdefghij", 47), ("a" * 23, 1)),
    )
    assert keep10.word_chars == 500 and keep10.n_words == 50
    assert keep10.r2_mean_word_len and keep10.keep
    # just above 10.0: 501 chars
    rej10 = _gopher_one(
        spark,
        _words(("the", 1), ("have", 1), ("abcdefghij", 47), ("a" * 24, 1)),
    )
    assert rej10.word_chars == 501 and not rej10.r2_mean_word_len and not rej10.keep


def test_gopher_r3_hash_ratio_boundaries(spark):
    """Paper: remove if hash-to-word ratio > 0.1 — exactly 10% KEPT."""
    keep = _gopher_one(spark, _words(("the", 1), ("of", 1), ("#", 5), ("word", 43)))
    assert keep.n_hash == 5 and keep.n_words == 50
    assert keep.r3_symbol_ratio and keep.keep
    rej = _gopher_one(spark, _words(("the", 1), ("of", 1), ("#", 6), ("word", 42)))
    assert rej.n_hash == 6 and not rej.r3_symbol_ratio and not rej.keep


def test_gopher_r3_ellipsis_ratio_boundaries(spark):
    """Paper: remove if ellipsis-to-word ratio > 0.1 — exactly 10%
    KEPT. Ellipses sit mid-line so r5 (line-ending ellipsis) is not
    engaged."""
    keep = _gopher_one(spark, _words(("the", 1), ("of", 1), ("...", 5), ("word", 43)))
    assert keep.n_ellipsis == 5 and keep.n_words == 50
    assert keep.r3_symbol_ratio and keep.keep
    rej = _gopher_one(spark, _words(("the", 1), ("of", 1), ("...", 6), ("word", 42)))
    assert rej.n_ellipsis == 6 and not rej.r3_symbol_ratio and not rej.keep


def test_gopher_r3_separate_ratios_regression(spark):
    """THE BUG THIS AUDIT FOUND (fixed with the gopher-r4 treatment —
    engine + oracle together): the paper removes when the ratio
    exceeds 0.1 "for either the hash symbol or the ellipsis" — two
    SEPARATE checks. A doc with 6% hashes and 6% ellipses is inside
    the published bound on both counts and must be KEPT; the earlier
    summed-count revision (12% combined > 10%) wrongly rejected it."""
    doc = _gopher_one(
        spark, _words(("the", 1), ("of", 1), ("#", 3), ("...", 3), ("word", 42))
    )
    assert doc.n_hash == 3 and doc.n_ellipsis == 3 and doc.n_words == 50
    assert doc.r3_symbol_ratio and doc.keep


def test_gopher_r4_bullet_line_boundaries(spark):
    """Paper SSA1.1: remove docs with MORE THAN 90% bullet lines —
    exactly 90% KEPT (regression class: the r9 inversion)."""
    bullet = "- the pipeline holds value here"
    plain = "of and that have with something more extra"
    keep = _gopher_one(spark, "\n".join([bullet] * 9 + [plain]))
    assert keep.n_bullet_lines == 9 and keep.n_lines == 10
    assert keep.r4_bullet_lines and keep.keep
    # 10/10 bullet lines -> 100% > 90%
    rej = _gopher_one(spark, "\n".join([bullet] * 9 + ["- " + plain]))
    assert rej.n_bullet_lines == 10 and rej.n_lines == 10
    assert not rej.r4_bullet_lines and not rej.keep


def test_gopher_r5_ellipsis_line_boundaries(spark):
    """Paper: remove docs with MORE THAN 30% of lines ending in an
    ellipsis — exactly 30% KEPT."""
    plain = "the of brown fox jumps over it"
    dots = plain + "..."
    keep = _gopher_one(spark, "\n".join([dots] * 3 + [plain] * 7))
    assert keep.n_ellipsis_lines == 3 and keep.n_lines == 10
    assert keep.r5_ellipsis_lines and keep.keep
    rej = _gopher_one(spark, "\n".join([dots] * 4 + [plain] * 6))
    assert rej.n_ellipsis_lines == 4 and not rej.r5_ellipsis_lines and not rej.keep


def test_gopher_r6_alpha_word_boundaries(spark):
    """Paper: remove docs where LESS THAN 80% of words have at least
    one alphabetic character — exactly 80% KEPT."""
    keep = _gopher_one(spark, _words(("the", 1), ("of", 1), ("word", 38), ("123", 10)))
    assert keep.n_alpha_words == 40 and keep.n_words == 50
    assert keep.r6_alpha_words and keep.keep
    rej = _gopher_one(spark, _words(("the", 1), ("of", 1), ("word", 37), ("123", 11)))
    assert rej.n_alpha_words == 39 and not rej.r6_alpha_words and not rej.keep


def test_gopher_r7_stop_word_boundaries(spark):
    """Paper: remove docs that do not contain at least TWO of the
    required stop words — 2 distinct members keep, and repetition of
    ONE member does not count as two."""
    keep = _gopher_one(spark, _words(("the", 1), ("of", 1), ("word", 48)))
    assert keep.n_stops_present == 2 and keep.r7_stop_words and keep.keep
    rej = _gopher_one(spark, _words(("the", 2), ("word", 48)))
    assert rej.n_stops_present == 1 and not rej.r7_stop_words and not rej.keep


def _gopher_reference(text: str) -> dict:
    """Independent pure-Python implementation of the seven rules,
    written from the PAPER's wording (not from the engine or the
    oracle) — the third implementation that makes a mirrored
    misreading in engine+oracle visible."""
    import re

    words = re.split(r"\s+", text.strip())
    lines = text.split("\n")
    n_words = len(words)
    word_chars = sum(len(w) for w in words)
    n_hash = text.count("#")
    n_ellipsis = len(re.findall(r"\.\.\.", text)) + text.count("…")
    n_alpha = sum(1 for w in words if re.search(r"[A-Za-z]", w))
    n_bullet = sum(
        1 for line in lines if line.lstrip().startswith(("-", "*", "•"))
    )
    n_ell_lines = sum(
        1 for line in lines if line.rstrip().endswith(("...", "…"))
    )
    stops = sum(1 for s in ("the", "be", "to", "of", "and", "that", "have", "with") if s in words)
    return {
        "r1_word_count": 50 <= n_words <= 100_000,
        "r2_mean_word_len": 3 <= word_chars / n_words <= 10,
        "r3_symbol_ratio": n_hash / n_words <= 0.1 and n_ellipsis / n_words <= 0.1,
        "r4_bullet_lines": n_bullet / len(lines) <= 0.9,
        "r5_ellipsis_lines": n_ell_lines / len(lines) <= 0.3,
        "r6_alpha_words": n_alpha / n_words >= 0.8,
        "r7_stop_words": stops >= 2,
    }


def test_gopher_rules_match_independent_python_reference(spark):
    """Engine flags == an independent float-arithmetic Python replay
    of the paper's rules on a seeded 200-doc random corpus mixing
    every trigger ingredient (bullets, ellipses, hashes, numerics,
    stop words, short/long words, multi-line). The engine's integer
    cross-multiplications must agree with the reference's float
    ratios at every generated point — and the generator is biased to
    land near thresholds (ratios cluster around 0.1/0.3/0.8/0.9)."""
    import random

    rng = random.Random(11)
    pool = ["the", "of", "and", "word", "data", "12345", "#", "...",
            "pneumonoultramicro", "ab", "x"]
    docs = []
    for i in range(200):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            n = rng.randint(3, 30)
            toks = [rng.choice(pool) for _ in range(n)]
            line = " ".join(toks)
            r = rng.random()
            if r < 0.25:
                line = "- " + line
            elif r < 0.4:
                line = line + "..."
            lines.append(line)
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    mismatches = []
    for doc_id, text in docs:
        ref = _gopher_reference(text)
        for rule, want in ref.items():
            if bool(got[doc_id][rule]) != want:
                mismatches.append((doc_id, rule, want, text[:80]))
    assert not mismatches, mismatches[:5]


# ---------------------------------------------------------------------------
# BM25 constants — the integer algebra IS k1=1.2, b=0.75
# ---------------------------------------------------------------------------


def test_bm25_integer_algebra_is_k1_12_b_075(spark):
    """The engine's 22/10/3/9 integer weight was derived from Okapi
    BM25 with k1 = 1.2, b = 0.75 by clearing fractions. Replay the
    PUBLISHED formula — idf(df) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with idf = ln((N−df+0.5)/(df+0.5)) — in Python and assert the
    engine's ln path reproduces it, doc by doc. A wrong constant in
    the derivation (any of 22/10/3/9) shifts every score and fails
    this regardless of what the oracle mirrors."""
    rows = [
        (0, "rare pad0 fill0 word more yet other end open shut"),
        (1, "common common pad1 fill word more yet other end close"),
        (2, "common pad2 fill word more yet other end open shut"),
        (3, "rare rare rare pad3 fill more yet other end close"),
        (4, "w4a w4b w4c w4d w4e w4f w4g w4h w4i w4j"),
        (5, "w5a w5b w5c w5d w5e w5f w5g w5h w5i w5j"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in bm25_topk(df, ["rare", "common"], k=10, idf="ln").collect()
    }
    N, T = 6, 60
    avgdl = T / N
    k1, b = 1.2, 0.75
    tf = {  # per doc: (tf_rare, tf_common, dl); every dl is 10
        0: (1, 0, 10), 1: (0, 2, 10), 2: (0, 1, 10),
        3: (3, 0, 10), 4: (0, 0, 10), 5: (0, 0, 10),
    }
    df_rare, df_common = 2, 2  # idf = ln((6-2+0.5)/(2+0.5)) = ln(1.8) > 0

    def okapi(tf_t, dfreq, dl):
        if tf_t == 0:
            return 0.0
        idf = math.log((N - dfreq + 0.5) / (dfreq + 0.5))
        return idf * tf_t * (k1 + 1) / (tf_t + k1 * (1 - b + b * dl / avgdl))

    matched = 0
    for doc_id, (tr, tc, dl) in tf.items():
        expected = okapi(tr, df_rare, dl) + okapi(tc, df_common, dl)
        if expected <= 0:
            assert doc_id not in got  # score>0 filter
        else:
            assert got[doc_id].score == pytest.approx(expected, rel=1e-9), (
                doc_id, got[doc_id].score, expected,
            )
            matched += 1
    assert matched == 4  # the equality check is not vacuous


# ---------------------------------------------------------------------------
# Lee et al. 2022 substring-dedup span semantics
# ---------------------------------------------------------------------------


def test_substring_dedup_window_length_boundary(spark):
    """A duplicated run of exactly k tokens is detected (one k-window);
    a run of k-1 tokens shares NO k-window and is invisible — the
    published pass only sees duplicates at or above the window
    length."""
    from jagular_spark.operators.text import repeated_kgram_spans

    k = 4
    rows4 = [(0, "p q r s tail0 end0"), (1, "head1 x p q r s")]
    out4 = repeated_kgram_spans(
        spark.createDataFrame(rows4, "doc_id long, text string"), k=k
    ).collect()
    got = {(r.doc_id): (r.span_start, r.span_len) for r in out4}
    assert got == {0: (0, 4), 1: (2, 4)}, got
    rows3 = [(0, "p q r tail0 end0 pad0"), (1, "head1 x y z p q r")]
    out3 = repeated_kgram_spans(
        spark.createDataFrame(rows3, "doc_id long, text string"), k=k
    ).collect()
    assert out3 == []


def test_substring_dedup_min_count_boundary(spark):
    """A window occurring exactly min_count times is marked; one below
    is not (>= semantics, both sides)."""
    from jagular_spark.operators.text import repeated_kgram_spans

    rows = [
        (0, "a b c d pad0 end0"),
        (1, "x y a b c d tail"),
        (2, "a b c d pad2 end2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the shared window occurs 3 times: min_count=3 marks all three
    out3 = repeated_kgram_spans(df, k=4, min_count=3).collect()
    assert {r.doc_id for r in out3} == {0, 1, 2}
    # min_count=4 marks nothing (3 < 4)
    out4 = repeated_kgram_spans(df, k=4, min_count=4).collect()
    assert out4 == []


def test_keepfirst_oracle_matches_engine_on_hostile_ids(spark):
    """Cross-engine keep-first on a hostile id domain (id ≥ 2³¹ and a
    negative id): the engine's MIN(struct(id, pos)) and the oracle's
    MIN(struct_pack(...)) must agree. The oracle's previous packed
    doc_id·2³² + pos key did not merely mis-order here — it OVERFLOWED
    int64 at id ≥ 2³¹ (DuckDB raises out-of-range), so this test fails
    loudly against any packed-key regression on either side."""
    import duckdb
    import pandas as pd

    from jagular_spark.oracles import ORACLE_SQL
    from jagular_spark.operators.text import cut_spans, repeated_kgram_spans

    shared = "a b c d e f g h"
    rows = [
        (2**31 + 7, shared + " tailA tailB"),
        (-5, "pre1 pre2 " + shared),
        (0, shared + " end0"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_kgram_spans(docs, k=8, min_count=2, keep_first=True)
    eng = {
        r.doc_id: (r.n_spans, r.n_tokens_cut, r.clean_text)
        for r in cut_spans(
            docs, spans.select("doc_id", "span_start", "span_len")
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    ora = {
        int(r[0]): (int(r[1]), int(r[2]), r[3])
        for r in con.execute(
            ORACLE_SQL["docs_substring_dedup_keepfirst"]
        ).fetchall()
    }
    assert eng == ora, (eng, ora)
    # the canonical (exempted) occurrence is doc -5's — struct order
    # puts (-5, 2) below (0, 0) and (2^31+7, 0)
    assert eng[-5][1] == 0 and shared in eng[-5][2]
    assert eng[0][1] == 8 and eng[2**31 + 7][1] == 8


def test_substring_dedup_keep_first_exempts_one_copy(spark):
    """Published policy: remove all but ONE occurrence. keep_first=True
    must exempt exactly the corpus-minimum (id, pos) occurrence."""
    from jagular_spark.operators.text import repeated_kgram_spans

    rows = [(0, "a b c d pad0 end0"), (1, "x y a b c d tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_kgram_spans(df, k=4, min_count=2, keep_first=True).collect()
    assert [(r.doc_id, r.span_start, r.span_len) for r in out] == [(1, 2, 4)]


def test_decontaminate_min_shared_boundary(spark):
    """Decontamination flags a train doc at >= min_shared DISTINCT
    shared shingle hashes — a doc sharing exactly min_shared is
    contaminated, one sharing min_shared-1 is not, and a repeated
    instance of the SAME shingle does not count twice (distinctness,
    both sides)."""
    from jagular_spark.operators.text import decontaminate

    ev = spark.createDataFrame(
        [(100, "e1 e2 e3 e4 f1 f2 f3 f4 g1 g2 g3 g4")],
        "doc_id long, text string",
    )
    # shingles are 4-token windows; craft exact distinct-overlap counts
    train = spark.createDataFrame(
        [
            # shares the two disjoint windows (e1..e4) and (f1..f4) -> 2
            (0, "e1 e2 e3 e4 zz0 f1 f2 f3 f4"),
            # shares only (e1..e4) -> 1
            (1, "e1 e2 e3 e4 zz1 qq1 rr1 ss1 tt1"),
            # shares (e1..e4) TWICE (same hash) -> still 1 distinct
            (2, "e1 e2 e3 e4 zz2 e1 e2 e3 e4"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shared, r.contaminated)
        for r in decontaminate(train, ev, n=4, min_shared=2).collect()
    }
    assert got[0] == (2, True)
    assert got[1] == (1, False)
    assert got[2] == (1, False)


# ---------------------------------------------------------------------------
# SemDeDup keep rule — cosine threshold, both sides
# ---------------------------------------------------------------------------


def test_semdedup_threshold_boundary(spark):
    """Within a cluster, a pair at cosine EXACTLY the threshold is a
    duplicate (inclusive ≥, documented in the operator) and the larger
    id is dropped; a pair strictly below keeps both. Vectors are
    chosen so the integer-quantized cosine is IEEE-exact: (1,0) vs
    (4,3) → 4/5 = 0.8; (1,0) vs (3,4) → 3/5 = 0.6."""
    from jagular_spark.operators.similarity import semantic_dedup

    rows = [(0, [1.0, 0.0]), (1, [4.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    at = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            df, n_centroids=1, n_iter=1, threshold=0.8, fit_fraction=1.0
        ).collect()
    }
    assert at == {0: True, 1: False}  # cos == threshold -> dropped
    above = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            df, n_centroids=1, n_iter=1, threshold=0.8000001, fit_fraction=1.0
        ).collect()
    }
    assert above == {0: True, 1: True}  # cos < threshold -> both kept
    rows_lo = [(0, [1.0, 0.0]), (1, [3.0, 4.0])]
    df_lo = spark.createDataFrame(rows_lo, "vec_id long, embedding array<float>")
    lo = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            df_lo, n_centroids=1, n_iter=1, threshold=0.8, fit_fraction=1.0
        ).collect()
    }
    assert lo == {0: True, 1: True}


# ---------------------------------------------------------------------------
# Third independent implementations (r11 verdict task #3) — the Gopher
# pattern extended to the two remaining published-spec operators where
# a mirrored engine+oracle misreading could still hide.
# ---------------------------------------------------------------------------


def _lee_reference(docs, k, min_count, keep_first):
    """Independent pure-Python replay of the Lee et al. 2022 substring
    dedup pass, written from the PAPER's semantics (not from the
    engine or the oracle): a token position is duplicated iff its
    k-token window occurs >= min_count times corpus-wide (window
    VALUES compared directly — no hashing); keep_first exempts the
    corpus-minimum (id, pos) occurrence of each such window; maximal
    spans are runs of consecutive duplicated positions, reported as
    (id, span_start, span_len = last - first + k, n_windows)."""
    occ = {}
    for doc_id, text in docs:
        toks = text.split()
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p : p + k]), []).append((doc_id, p))
    marked = {}
    for places in occ.values():
        if len(places) < min_count:
            continue
        exempt = min(places) if keep_first else None
        for place in places:
            if place != exempt:
                marked.setdefault(place[0], set()).add(place[1])
    spans = []
    for doc_id, positions in marked.items():
        run = []
        for p in sorted(positions) + [None]:
            if run and (p is None or p != run[-1] + 1):
                spans.append((doc_id, run[0], run[-1] - run[0] + k, len(run)))
                run = []
            if p is not None:
                run.append(p)
    return sorted(spans)


@pytest.mark.parametrize("keep_first", [False, True])
@pytest.mark.parametrize("min_count", [2, 3])
def test_substring_spans_match_independent_python_reference(
    spark, keep_first, min_count
):
    """Engine spans == the independent replay on a seeded 50-doc
    random corpus biased to land near the spec's edges: shared
    passages of length k-1 (invisible), exactly k (one window), k+1,
    2k and 3k; intra-document repeats (they count toward min_count);
    passages occurring 1..4 times (straddling both min_count values);
    and a 12-token vocabulary small enough that chance k-window
    collisions also occur."""
    import random

    from jagular_spark.operators.text import repeated_kgram_spans

    k = 5
    rng = random.Random(12)
    vocab = [f"w{i}" for i in range(12)]
    passages = [
        [rng.choice(vocab) for _ in range(n)] for n in (k - 1, k, k + 1, 2 * k, 3 * k)
    ]
    docs = []
    for i in range(50):
        toks = []
        for _ in range(rng.randint(1, 4)):
            toks.extend(rng.choice(vocab) for _ in range(rng.randint(2, 8)))
            if rng.random() < 0.6:
                toks.extend(rng.choice(passages))
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_len, r.n_windows)
        for r in repeated_kgram_spans(
            df, k=k, min_count=min_count, keep_first=keep_first
        ).collect()
    )
    want = _lee_reference(docs, k, min_count, keep_first)
    assert got == want, (got[:5], want[:5])


def _semdedup_reference(vectors, clusters, threshold):
    """Independent pure-Python replay of the SemDeDup keep rule
    (Abbas et al. 2023), written from the paper/reference practice:
    within each cluster, an example is dropped iff some LOWER-id
    example in the same cluster has cosine similarity >= threshold
    with it (the deterministic one-representative-per-duplicate-group
    policy). Float64 arithmetic straight from the raw embeddings."""
    kept = {}
    by_cluster = {}
    for vid, c in clusters.items():
        by_cluster.setdefault(c, []).append(vid)
    for members in by_cluster.values():
        for vid in members:
            v = vectors[vid]
            drop = False
            for other in members:
                if other >= vid:
                    continue
                u = vectors[other]
                dot = sum(a * b for a, b in zip(u, v))
                cos = dot / (
                    math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v))
                )
                if cos >= threshold:
                    drop = True
                    break
            kept[vid] = not drop
    return kept


def test_semdedup_keep_rule_matches_independent_python_reference(spark):
    """Engine kept-flags == the independent float replay on a seeded
    80-vector corpus whose components sit on the 1/16 grid — exactly
    representable in float32 AND under the engine's 2^20 integer
    quantization, so the two arithmetics must agree at every pair,
    including the many pairwise cosines this corpus scatters around
    the 0.35 threshold. Cluster assignment is the engine's own output
    (the k-means fit is an implementation detail; the published rule
    under test is the within-cluster drop policy)."""
    import random

    from jagular_spark.operators.similarity import semantic_dedup

    rng = random.Random(7)
    vectors = {}
    for vid in range(80):
        while True:
            v = [rng.randint(-4, 4) / 16 for _ in range(3)]
            if any(v):
                break
        vectors[vid] = v
    df = spark.createDataFrame(
        [(vid, v) for vid, v in vectors.items()],
        "vec_id long, embedding array<float>",
    )
    rows = semantic_dedup(
        df, n_centroids=3, n_iter=2, threshold=0.35, fit_fraction=1.0
    ).collect()
    clusters = {r.vec_id: r.cluster for r in rows}
    got = {r.vec_id: r.kept for r in rows}
    want = _semdedup_reference(vectors, clusters, 0.35)
    mismatches = {v: (got[v], want[v]) for v in got if got[v] != want[v]}
    assert not mismatches, mismatches


def test_substring_cut_matches_independent_python_reference(spark):
    """The FULL published pass — keep-first detection composed with
    span surgery — against the independent replay: every document's
    cleaned text must equal its tokens minus the replay's marked
    positions, re-joined with single spaces (Lee et al. 2022 'remove
    all but one occurrence'). Same seeded threshold-biased corpus as
    the detection cross-check, so k-1/k/k+1 passages, intra-doc
    repeats and chance collisions all flow through the surgery."""
    import random

    from jagular_spark.operators.text import cut_spans, repeated_kgram_spans

    k = 5
    rng = random.Random(12)
    vocab = [f"w{i}" for i in range(12)]
    passages = [
        [rng.choice(vocab) for _ in range(n)] for n in (k - 1, k, k + 1, 2 * k, 3 * k)
    ]
    docs = []
    for i in range(50):
        toks = []
        for _ in range(rng.randint(1, 4)):
            toks.extend(rng.choice(vocab) for _ in range(rng.randint(2, 8)))
            if rng.random() < 0.6:
                toks.extend(rng.choice(passages))
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = repeated_kgram_spans(df, k=k, min_count=2, keep_first=True)
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_tokens_cut)
        for r in cut_spans(df, spans.select("doc_id", "span_start", "span_len")).collect()
    }

    # independent replay of detect (same function as the detection
    # cross-check) + surgery: drop every token inside a marked span
    ref_spans = _lee_reference(docs, k, 2, True)
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for doc_id, start, length, _nw in ref_spans:
        by_doc.setdefault(doc_id, []).append((start, length))
    mismatches = []
    for doc_id, text in docs:
        toks = text.split()
        cut = set()
        for start, length in by_doc.get(doc_id, []):
            cut.update(range(start, start + length))
        want_text = " ".join(t for j, t in enumerate(toks) if j not in cut)
        want = (want_text, len(by_doc.get(doc_id, [])), len(cut))
        if got[doc_id] != want:
            mismatches.append((doc_id, got[doc_id], want))
    assert not mismatches, mismatches[:3]


# ---------------------------------------------------------------------------
# Bloom decontamination — third independent replay (r12 verdict task #6)
# ---------------------------------------------------------------------------


def _bloom_reference(train_docs, eval_docs, n, m_bits, k, min_shared):
    """Independent pure-Python replay of the Bloom decontamination
    pipeline, written from the documented construction (hashlib md5,
    set arithmetic — no Spark, no DuckDB): shingle hash =
    md5(shingle)[:8] as hex -> int % P; bit positions =
    md5('bf{j}:' + str(h))[:8] % m_bits for j < k; the filter is the
    union of the eval set's bit positions; a train shingle is
    maybe-present iff ALL k of its bits are set; a doc is flagged at
    >= min_shared distinct maybe-present shingle hashes. Returns
    {doc_id: (n_maybe, flagged)} plus the exact intersection counts
    {doc_id: n_shared} so the same corpus also cross-checks the
    non-Bloom `decontaminate` (>= is inclusive on both)."""
    import hashlib

    P = 2147483647

    def shingle_hashes(text):
        toks = text.split()
        return {
            int(
                hashlib.md5(" ".join(toks[p : p + n]).encode()).hexdigest()[:8], 16
            )
            % P
            for p in range(len(toks) - n + 1)
        }

    def bit_positions(h):
        return [
            int(hashlib.md5(f"bf{j}:{h}".encode()).hexdigest()[:8], 16) % m_bits
            for j in range(k)
        ]

    eval_hashes = set()
    bits = set()
    for _, text in eval_docs:
        for h in shingle_hashes(text):
            eval_hashes.add(h)
            bits.update(bit_positions(h))
    bloom = {}
    exact = {}
    for doc_id, text in train_docs:
        hs = shingle_hashes(text)
        n_maybe = sum(1 for h in hs if all(b in bits for b in bit_positions(h)))
        bloom[doc_id] = (n_maybe, n_maybe >= min_shared)
        exact[doc_id] = len(hs & eval_hashes)
    return bloom, exact


def test_bloom_decontaminate_matches_independent_python_reference(spark):
    """Engine Bloom flags == the independent hashlib replay on a
    seeded corpus biased to the min_shared=2 boundary: train docs
    embed exactly 0, 1, 2 or 3 distinct eval shingles, and m_bits is
    squeezed to 512 so genuine Bloom FALSE POSITIVES occur — the
    replay must agree on those too (the filter's FPs are documented as
    deterministic). The same corpus cross-checks the exact
    `decontaminate` n_shared counts, so a mirrored engine+oracle
    misreading of the >= min_shared rule or of distinctness cannot
    hide behind either implementation."""
    import random

    from pyspark.sql import functions as F

    from jagular_spark.operators.sketches import bloom_bits, bloom_probe
    from jagular_spark.operators.text import decontaminate
    from jagular_spark.operators import similarity as sim

    rng = random.Random(13)
    vocab = [f"v{i:02d}" for i in range(40)]
    n, m_bits, k, min_shared = 4, 512, 3, 2

    eval_docs = [
        (1000 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(16, 28))))
        for i in range(5)
    ]

    def eval_window(rng):
        _, etext = eval_docs[rng.randrange(len(eval_docs))]
        toks = etext.split()
        p = rng.randrange(len(toks) - n + 1)
        return toks[p : p + n]

    train_docs = []
    for i in range(60):
        toks = [rng.choice(vocab) for _ in range(rng.randint(10, 24))]
        # 0..3 embedded eval windows, cycling so every boundary case
        # (below / exactly at / above min_shared) is populated
        for _ in range(i % 4):
            pos = rng.randrange(len(toks) + 1)
            toks[pos:pos] = eval_window(rng)
        train_docs.append((i, " ".join(toks)))

    ref_bloom, ref_exact = _bloom_reference(
        train_docs, eval_docs, n, m_bits, k, min_shared
    )
    # the corpus must genuinely exercise the semantics: both flag
    # outcomes present, at least one doc at EXACTLY min_shared, and at
    # least one Bloom false positive (n_maybe > exact intersection)
    n_maybe_vals = {doc: v[0] for doc, v in ref_bloom.items()}
    assert any(v for _, v in ref_bloom.values()) and not all(
        v for _, v in ref_bloom.values()
    )
    assert any(v[0] == min_shared for v in ref_bloom.values())
    assert any(
        n_maybe_vals[doc] > ref_exact[doc] for doc in n_maybe_vals
    ), "no Bloom false positive generated — shrink m_bits"

    train = spark.createDataFrame(train_docs, "doc_id long, text string")
    ev = spark.createDataFrame(eval_docs, "doc_id long, text string")

    # engine: same composition as docs_bloom_decontaminate, with the
    # test's (n, m_bits, k) so false positives occur
    ev_h = sim.doc_shingle_hashes(ev, n=n).select("h").distinct()
    bits = bloom_bits(ev_h, "h", m_bits=m_bits, k=k)
    tr_h = sim.doc_shingle_hashes(train, n=n).select("doc_id", "h").distinct()
    per_doc = (
        bloom_probe(tr_h, bits, "h", m_bits=m_bits, k=k)
        .where("maybe_present")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_maybe"))
    )
    got_bloom = {
        r.doc_id: (
            int(r.n_maybe) if r.n_maybe is not None else 0,
            (int(r.n_maybe) if r.n_maybe is not None else 0) >= min_shared,
        )
        for r in train.select("doc_id").join(per_doc, "doc_id", "left").collect()
    }
    assert got_bloom == ref_bloom, {
        d: (got_bloom[d], ref_bloom[d])
        for d in ref_bloom
        if got_bloom[d] != ref_bloom[d]
    }

    # exact decontaminate on the same corpus: n_shared == set
    # intersection size; flag inclusive at min_shared
    got_exact = {
        r.doc_id: (int(r.n_shared), bool(r.contaminated))
        for r in decontaminate(train, ev, n=n, min_shared=min_shared).collect()
    }
    want_exact = {d: (c, c >= min_shared) for d, c in ref_exact.items()}
    assert got_exact == want_exact, {
        d: (got_exact[d], want_exact[d])
        for d in want_exact
        if got_exact[d] != want_exact[d]
    }


# ---------------------------------------------------------------------------
# DSIR targeted selection — independent replay + paper-log-form agreement
# ---------------------------------------------------------------------------


def _dsir_reference(raw_docs, target_docs, n_buckets=4096, alpha=1):
    """Independent pure-Python replay of the DSIR surrogate (hashlib +
    Counter — no Spark, no DuckDB): hashed unigram+bigram occurrence
    counts, delta[b] = (tc+alpha)·Mr − (rc+alpha)·Mt, per-doc BIGINT
    sum, two IEEE divisions. ALSO returns the PAPER's exact
    log-likelihood-ratio score (math.log of the same smoothed
    probabilities) so the surrogate's ranking behaviour is checked
    against the published form, not just against itself."""
    import hashlib
    import math
    from collections import Counter

    def grams(text):
        t = text.split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    tc, rc = Counter(), Counter()
    for _, text in target_docs:
        tc.update(bucket(g) for g in grams(text))
    for _, text in raw_docs:
        rc.update(bucket(g) for g in grams(text))
    mt = sum(tc.values()) + alpha * n_buckets
    mr = sum(rc.values()) + alpha * n_buckets
    delta = {
        b: (tc.get(b, 0) + alpha) * mr - (rc.get(b, 0) + alpha) * mt
        for b in set(tc) | set(rc)
    }
    base_delta = alpha * mr - alpha * mt  # unseen-bucket value

    out, log_scores = {}, {}
    for doc_id, text in raw_docs:
        gs = grams(text)
        num = sum(delta.get(bucket(g), base_delta) for g in gs)
        out[doc_id] = (len(gs), num, num / mt / mr)
        log_scores[doc_id] = sum(
            math.log((tc.get(bucket(g), 0) + alpha) / mt)
            - math.log((rc.get(bucket(g), 0) + alpha) / mr)
            for g in gs
        )
    return out, log_scores


def test_dsir_log_form_matches_replay_and_diverges_from_surrogate(spark):
    """r13 verdict task #5: the paper-exact ``importance="log"`` knob.
    Its oracle is the independent hashlib/Counter + math.log replay
    (_dsir_reference's log_scores) — asserted BIT-EQUAL, since the
    engine folds the same per-bucket doubles in the same left-to-right
    gram order. The corpus is built so the two rankings genuinely
    diverge: bucket 'big' carries large gram MASS at a moderate
    target/raw ratio, bucket 'niche' tiny mass at an extreme ratio —
    the mass-weighted surrogate ranks big > niche while the
    ratio-weighted log form ranks niche > big (exactly the regime the
    surrogate's docstring warns about, now pinned)."""
    import hashlib

    from jagular_spark.operators.selection import dsir_scores, dsir_topk

    n_buckets = 64

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    # three single tokens in distinct buckets whose filler bigram
    # ('other other') also avoids the big/niche buckets
    toks, i = [], 0
    while True:
        t = f"tok{i}"
        i += 1
        if all(bucket(t) != bucket(o) for o in toks):
            toks.append(t)
        if len(toks) == 3:
            big, niche, other = toks
            if bucket(f"{other} {other}") not in (bucket(big), bucket(niche)):
                break
            toks = toks[:2]
    target_docs = [(1000 + j, big) for j in range(30)] + [
        (1100 + j, niche) for j in range(5)
    ]
    raw_docs = (
        [(j, other) for j in range(23)]
        + [(50, big), (51, niche), (52, f"{other} {other}")]
        + [(60 + j, big) for j in range(10)]
    )
    ref, log_scores = _dsir_reference(raw_docs, target_docs, n_buckets=n_buckets)
    # the divergence this knob exists for (checked on the replay first,
    # so the corpus itself is proven non-vacuous)
    assert ref[50][1] > ref[51][1], "surrogate must rank big > niche"
    assert log_scores[51] > log_scores[50], "log form must rank niche > big"

    raw = spark.createDataFrame(raw_docs, "doc_id long, text string")
    tgt = spark.createDataFrame(target_docs, "doc_id long, text string")
    got = {
        r.doc_id: (int(r.n_grams), float(r.score))
        for r in dsir_scores(
            raw, tgt, n_buckets=n_buckets, importance="log"
        ).collect()
    }
    assert set(got) == set(log_scores)
    for d, s in log_scores.items():
        assert got[d][0] == ref[d][0]  # n_grams agree with the replay
        assert got[d][1] == s, (d, got[d][1], s)  # bit-equal double fold
    # the selection cut flips leaders between the two forms (ties under
    # the surrogate break by id: doc 50 is the smallest big-bucket doc)
    assert [r.doc_id for r in dsir_topk(raw, tgt, 1, n_buckets=n_buckets).collect()] == [50]
    assert [
        r.doc_id
        for r in dsir_topk(
            raw, tgt, 1, n_buckets=n_buckets, importance="log"
        ).collect()
    ] == [51]


def test_dsir_blank_docs_score_zero(spark):
    """r13 advice item: ``split('')`` yields ``['']``, so before the
    empty-token filter a blank / whitespace-only document contributed
    ONE empty-string unigram (n_grams=1 and a nonzero smoothing-bucket
    score), diverging from the paper's ``text.split()`` tokenization.
    Pinned: blank docs keep their row (the engine scores every raw doc
    row-locally) with exactly n_grams=0, score_num=0, score=0.0."""
    from jagular_spark.operators.selection import dsir_scores

    raw = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "alpha beta")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        [(100, "alpha alpha")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in dsir_scores(raw, tgt, n_buckets=64).collect()}
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        assert rows[d].n_grams == 0
        assert rows[d].score_num == 0
        assert rows[d].score == 0.0
    assert rows[3].n_grams == 3  # alpha, beta, 'alpha beta'


def test_dsir_scores_match_independent_python_reference(spark):
    """Engine DSIR scores == the hashlib/Counter replay — exact BIGINT
    score_num and bit-equal IEEE-division score — on a seeded corpus
    with a disjoint target vocabulary mixed into raw docs at doc-
    controlled rates, so the scores span strongly-negative to
    strongly-positive. The same corpus checks the surrogate against
    the PAPER's log-ratio form: documents whose target-gram fraction
    strictly dominates another's must rank above it under BOTH
    scores (the claim the surrogate is shipped on)."""
    import random

    from jagular_spark.operators.selection import dsir_scores

    rng = random.Random(17)
    tvoc = [f"tq{i:02d}" for i in range(30)]   # target-favored vocab
    rvoc = [f"rw{i:02d}" for i in range(60)]   # raw-background vocab
    target_docs = [
        (1000 + i, " ".join(rng.choice(tvoc) for _ in range(rng.randint(15, 25))))
        for i in range(20)
    ]
    raw_docs = []
    for i in range(100):
        # target-gram fraction rises with i%5: 0, 1/4, 1/2, 3/4, 1 —
        # the top tier is pure target vocabulary so positive scores
        # occur; 256 buckets keep the +1 smoothing mass (alpha times
        # n_buckets) from drowning the organic counts at this corpus
        # size (probability-DIFFERENCE weighting needs the fitted
        # distributions, not the uniform prior, to dominate)
        n = 24
        k = (i % 5) * 6
        toks = [rng.choice(tvoc) for _ in range(k)] + [
            rng.choice(rvoc) for _ in range(n - k)
        ]
        rng.shuffle(toks)
        raw_docs.append((i, " ".join(toks)))

    ref, log_scores = _dsir_reference(raw_docs, target_docs, n_buckets=256)
    raw = spark.createDataFrame(raw_docs, "doc_id long, text string")
    tgt = spark.createDataFrame(target_docs, "doc_id long, text string")
    got = {
        r.doc_id: (int(r.n_grams), int(r.score_num), float(r.score))
        for r in dsir_scores(raw, tgt, n_buckets=256).collect()
    }
    assert got == ref, {
        d: (got[d], ref[d]) for d in ref if got.get(d) != ref[d]
    }
    # corpus must genuinely span both signs (vacuity guard)
    nums = [v[1] for v in ref.values()]
    assert min(nums) < 0 < max(nums)
    # paper-form agreement: mean surrogate and mean log score per
    # target-fraction tier must BOTH be strictly increasing in the
    # tier — the ordering claim the surrogate ships on
    tiers = {t: [d for d, _ in raw_docs if d % 5 == t] for t in range(5)}

    def tier_means(scores):
        return [
            sum(scores[d] for d in tiers[t]) / len(tiers[t]) for t in range(5)
        ]

    sur = tier_means({d: v[1] for d, v in ref.items()})
    logm = tier_means(log_scores)
    assert all(a < b for a, b in zip(sur, sur[1:])), sur
    assert all(a < b for a, b in zip(logm, logm[1:])), logm
