"""DSIR-style targeted data selection (Xie et al. 2023,
arXiv:2302.03169): pick the raw-corpus documents whose hashed n-gram
distribution looks most like a small TARGET set (the "give me more data
like my high-quality seed set" step of pretraining data curation).

The paper fits bag-of-hashed-ngram (unigram + bigram) models over the
target and raw corpora and scores every raw document by the summed
per-feature log-likelihood ratio. This engine keeps the exact same
pipeline shape — hash grams into a fixed bucket space, fit both
distributions with one aggregate each, score documents row-locally
against the fitted table — but replaces the transcendental log with the
repo's standard engines-agree discipline (the BM25 rational-idf /
tf-idf floor-division precedent): per bucket the INTEGER
cross-multiplied probability difference

    delta[b] = (tc[b] + alpha) * Mr  -  (rc[b] + alpha) * Mt

where Mt = sum_b (tc[b] + alpha) and Mr likewise, so a document's

    score_num = sum_{gram g in doc} delta[bucket(g)]

is an exact BIGINT equal to (Mt * Mr) * sum_g (p_target(b) - p_raw(b))
— the summed probability DIFFERENCE rather than the paper's summed
log-ratio (same sign per bucket, monotone in each bucket's ratio; the
paper-exact log form is replayed in tests/test_spec_boundaries.py,
which pins this surrogate's agreement on rank where it must agree and
documents where it may not). The only floating steps are two final
IEEE divisions (correctly rounded, hence engine-identical):
score = score_num / Mt / Mr.

Scale shape: the gram explode feeds ONE hash aggregate per corpus that
map-side-combines to at most n_buckets rows per task; both fitted
count tables are collected bounded by n_buckets (4096 default) and the
delta table ships to the scorer as a LITERAL array — scoring is a pure
row-local projection, ZERO shuffles on the corpus. Overflow headroom:
|delta| <= (max_count + alpha) * (M_other); keep Tt * Tr < 2^62 — at
extreme corpus sizes fit the counts on a hash-sample
(operators/sampling.py), the standard distribution-estimation shape,
exactly as the IVF/PQ quantizer fits do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DSIR_BUCKETS = 4096


def _grams_expr(text_col: str) -> str:
    """SQL expression: the document's unigram + bigram array, with the
    token array bound once as a ``transform`` lambda variable (the
    doc_shingle_hashes idiom — a bare multi-reference alias would make
    Catalyst's project-collapse re-run split() per element).

    Empty tokens are filtered: ``split('')`` yields ``['']``, so a
    blank / whitespace-only document would otherwise contribute ONE
    empty-string unigram (n_grams=1, a nonzero smoothing-bucket score)
    where the paper's ``text.split()`` tokenization yields zero grams.
    With the filter, a blank document scores exactly (n_grams=0,
    score_num=0, score=0.0) on engine, oracle, and the pure-Python
    replay alike (r13 advice; boundary pinned in
    tests/test_spec_boundaries.py)."""
    return (
        f"transform(array(filter(split(trim({text_col}), '\\\\s+'), x -> x <> '')), t -> "
        f"concat(t, if(size(t) >= 2, "
        f"   transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1])), "
        f"   cast(array() as array<string>))))[0]"
    )


def _bucket(g: F.Column, n_buckets: int) -> F.Column:
    """Deterministic md5 bucket of one gram — the engine-portable
    sampling.hash_bucket construction, mod the feature-space size."""
    return (
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def hashed_gram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """``(id, bucket)`` — one row per unigram/bigram OCCURRENCE (the
    DSIR feature stream; not distinct: the model is a count model)."""
    return (
        df.select(F.col(id_col), F.expr(_grams_expr(text_col)).alias("__gs__"))
        .select(F.col(id_col), F.explode("__gs__").alias("__g__"))
        .select(F.col(id_col), _bucket(F.col("__g__"), n_buckets).alias("bucket"))
    )


def dsir_fit_deltas(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
) -> tuple[list[int], int, int]:
    """Fit both hashed-gram count models and return the integer scoring
    table: ``(delta, Mt, Mr)`` with ``delta[b] = (tc+alpha)·Mr −
    (rc+alpha)·Mt``. Two bounded collects (≤ n_buckets rows each) —
    the quantizer-fit pattern; everything int64."""

    def counts(df: DataFrame) -> dict[int, int]:
        rows = (
            hashed_gram_buckets(df, id_col, text_col, n_buckets)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .collect()
        )
        return {int(r.bucket): int(r.c) for r in rows}

    tc, rc = counts(target), counts(raw)
    mt = sum(tc.values()) + alpha * n_buckets
    mr = sum(rc.values()) + alpha * n_buckets
    delta = [
        (tc.get(b, 0) + alpha) * mr - (rc.get(b, 0) + alpha) * mt
        for b in range(n_buckets)
    ]
    return delta, mt, mr


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
) -> DataFrame:
    """Score every raw document: ``(id, n_grams, score_num, score)``.
    score_num is the exact BIGINT surrogate importance; score is the
    probability-difference scale (score_num / Mt / Mr — two IEEE
    divisions, engine-identical). Positive score ⇒ the document's gram
    mass sits in buckets the TARGET favors. Scoring is row-local
    against the literal delta table: zero shuffles on the corpus."""
    delta, mt, mr = dsir_fit_deltas(
        raw, target, id_col, text_col, n_buckets, alpha
    )
    return score_with_deltas(raw, delta, mt, mr, id_col, text_col, n_buckets)


def score_with_deltas(
    df: DataFrame,
    delta: list[int],
    mt: int,
    mr: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The serving half: score documents against an ALREADY-FITTED
    delta table — a pure row-local projection (no shuffle, no state),
    which is also exactly the frozen-model STREAMING shape
    (streaming/pipeline.stream_dsir_scores wires a document stream
    through this very function; stream-static with zero stateful
    operators, so append mode just works)."""
    lit = F.lit(delta).cast("array<bigint>")
    gs = F.expr(_grams_expr(text_col))
    out = df.select(F.col(id_col), gs.alias("__gs__")).select(
        F.col(id_col),
        F.size("__gs__").cast("long").alias("n_grams"),
        F.aggregate(
            F.transform(
                F.col("__gs__"),
                lambda g: F.element_at(lit, _bucket(g, n_buckets) + F.lit(1)),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("score_num"),
    )
    return out.withColumn(
        "score",
        F.col("score_num").cast("double")
        / F.lit(float(mt))
        / F.lit(float(mr)),
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
) -> DataFrame:
    """The selection step: the ``k`` most target-like raw documents
    (score_num DESC, id ASC — exact-integer total order, so the cut is
    engine-reproducible). orderBy+limit plans as TakeOrderedAndProject:
    per-task heap top-k, no global sort, the corpus never shuffles."""
    s = dsir_scores(raw, target, id_col, text_col, n_buckets, alpha)
    return s.orderBy(F.col("score_num").desc(), F.col(id_col).asc()).limit(k)
