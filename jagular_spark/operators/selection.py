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

Since r14 the PAPER-EXACT form is also first-class behind
``importance="log"`` (the BM25 ``idf="ln"`` precedent): per-bucket
ln-likelihood-ratio weights computed once on the driver, scored by the
same zero-shuffle literal-table fold; its oracle is the pure-Python
replay rather than the DuckDB hash gate (a transcendental cannot be
certified engine-identical). The surrogate stays the default.

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
    """Deterministic md5 bucket of one gram — DELEGATES to the
    engine-portable sampling.hash_bucket construction (r17: this was a
    verbatim re-implementation; if the bucket recipe ever changes to
    match a new oracle, the DSIR features and the samplers must move
    in lockstep), mod the feature-space size."""
    from jagular_spark.operators.sampling import hash_bucket

    return (hash_bucket(g) % n_buckets).cast("int")


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


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Exchange a few-split input to session parallelism BEFORE the
    per-gram md5 work (the doc_shingle_hashes precedent, r18): the
    corpus parquet at probe scale is a single input split, so without
    the exchange every O(grams) md5 runs in ONE task. Skipped when the
    scan already has at least session-width files — the 100 TB case,
    where the input is thousands of splits and the exchange would be a
    pure corpus-text move. Hash-partitioned by ``id_col`` (keyless
    round-robin repartition pays a local sort, SPARK-23207)."""
    from jagular_spark.session import shuffle_width

    width = shuffle_width(df.sparkSession)
    try:
        if len(df.inputFiles()) >= width:
            return df
    except Exception:  # pragma: no cover — non-file plans just spread
        pass
    return df.repartition(width, F.col(id_col))


def _tagged_union(
    raw: DataFrame, target: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``(id, text, __is_tgt__)`` — both corpora in ONE frame so the
    two count models fit in ONE aggregate job (r18: the old per-corpus
    ``counts()`` ran two scans and two driver round-trips; per-bucket
    ``count_if`` over the tagged union is the same integer counts from
    a single pass), spread to session width (see :func:`_spread`)."""
    u = raw.select(
        F.col(id_col), F.col(text_col), F.lit(0).alias("__is_tgt__")
    ).unionByName(
        target.select(F.col(id_col), F.col(text_col), F.lit(1).alias("__is_tgt__"))
    )
    return _spread(u, id_col)


def _counts_from_tagged(
    tagged_buckets: DataFrame, n_buckets: int, alpha: int
) -> tuple[dict[int, int], dict[int, int], int, int]:
    """Collect ``(tc, rc, Mt, Mr)`` from a ``(__is_tgt__, bucket)``
    stream — ONE aggregate, ≤ n_buckets rows collected, everything
    int64 (the quantizer-fit pattern)."""
    rows = (
        tagged_buckets.groupBy("bucket")
        .agg(
            F.count_if(F.col("__is_tgt__") == 1).cast("long").alias("tc"),
            F.count_if(F.col("__is_tgt__") == 0).cast("long").alias("rc"),
        )
        .collect()
    )
    tc = {int(r.bucket): int(r.tc) for r in rows if r.tc}
    rc = {int(r.bucket): int(r.rc) for r in rows if r.rc}
    mt = sum(tc.values()) + alpha * n_buckets
    mr = sum(rc.values()) + alpha * n_buckets
    return tc, rc, mt, mr


def _fit_counts(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    alpha: int,
) -> tuple[dict[int, int], dict[int, int], int, int]:
    """Fit both hashed-gram count models: ``(tc, rc, Mt, Mr)`` where
    Mt/Mr are the smoothed totals.

    r18 shape: ONE job over the tagged union of both corpora (explode
    the gram stream, md5-bucket post-explode in codegen, per-bucket
    ``count_if`` split by the tag) instead of two scans + two collects
    — identical integer counts, half the passes and driver
    round-trips, and the gram/md5 stage runs at session width instead
    of one-task-per-input-split (see :func:`_spread`)."""
    u = _tagged_union(raw, target, id_col, text_col)
    tagged = u.select(
        "__is_tgt__", F.explode(F.expr(_grams_expr(text_col))).alias("__g__")
    ).select("__is_tgt__", _bucket(F.col("__g__"), n_buckets).alias("bucket"))
    return _counts_from_tagged(tagged, n_buckets, alpha)


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
    (rc+alpha)·Mt``."""
    tc, rc, mt, mr = _fit_counts(raw, target, id_col, text_col, n_buckets, alpha)
    delta = [
        (tc.get(b, 0) + alpha) * mr - (rc.get(b, 0) + alpha) * mt
        for b in range(n_buckets)
    ]
    return delta, mt, mr


def dsir_fit_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
) -> list[float]:
    """PAPER-EXACT per-bucket log-likelihood-ratio weights (Xie et al.
    2023 eq. 2): ``logw[b] = ln((tc[b]+α)/Mt) − ln((rc[b]+α)/Mr)``.
    The transcendental runs ONCE PER BUCKET on the driver (≤ n_buckets
    ``math.log`` calls against the collected fit tables), never per
    row — scoring stays a row-local literal-table lookup exactly like
    the surrogate path. The oracle for this form is the independent
    hashlib/Counter replay (tests/test_spec_boundaries.py), not the
    DuckDB hash gate: a transcendental cannot be certified
    engine-identical, which is why the BIGINT surrogate remains the
    hash-matched default (the BM25 ``idf="ln"`` precedent)."""
    import math

    tc, rc, mt, mr = _fit_counts(raw, target, id_col, text_col, n_buckets, alpha)
    return [
        math.log((tc.get(b, 0) + alpha) / mt)
        - math.log((rc.get(b, 0) + alpha) / mr)
        for b in range(n_buckets)
    ]


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
    importance: str = "diff",
) -> DataFrame:
    """Score every raw document.

    ``importance="diff"`` (default, hash-matched): ``(id, n_grams,
    score_num, score)`` — score_num is the exact BIGINT surrogate
    importance; score is the probability-difference scale (score_num /
    Mt / Mr — two IEEE divisions, engine-identical). Positive score ⇒
    the document's gram mass sits in buckets the TARGET favors.

    ``importance="log"`` (paper-exact, r13 verdict task #5): ``(id,
    n_grams, score)`` — score is the paper's summed per-gram
    log-likelihood ratio Σ ln((tc+α)/Mt) − ln((rc+α)/Mr), folded
    left-to-right over the document's grams so it is bit-reproducible
    against the pure-Python replay. The two rankings agree where gram
    masses dominate and MAY diverge where a rare bucket's ratio is
    extreme but its probability mass tiny (the log form is
    ratio-weighted, the surrogate mass-weighted) — the divergence is
    pinned in tests/test_spec_boundaries.py.

    Either way scoring is row-local against a literal table: zero
    shuffles on the corpus.

    r18 execution shape (identical output, measured ~0.6× wall at
    sf0.1): the per-doc BUCKET ARRAY is computed ONCE over the tagged
    union of both corpora and lineage-truncated (``localCheckpoint``),
    so the raw corpus pays the gram split + per-gram md5 exactly once
    — the fit's per-bucket counts explode the already-hashed int
    arrays, and scoring folds the literal table over the same arrays
    (array order = gram order, so the ``log`` form's float fold stays
    bit-identical). Fit is ONE job (tagged ``count_if``) instead of
    two scans + two collects. The returned scoring plan reads the
    checkpointed arrays: still zero Exchange, zero Generate (pinned in
    tests/test_plans.py). At warehouse scale the checkpoint is the
    materialize-vs-recompute trade `_curation_funnel` already makes
    for its survivor set — per-doc int arrays instead of a second
    full-text md5 pass; a deployment that cannot hold them swaps the
    checkpoint for a parquet stage, exactly as the funnel's
    ``stage_dir`` mode does."""
    if importance not in ("diff", "log"):
        raise ValueError(f"importance must be 'diff' or 'log', got {importance!r}")
    import math

    bucketed = (
        _tagged_union(raw, target, id_col, text_col)
        .select(
            F.col(id_col),
            "__is_tgt__",
            F.transform(
                F.expr(_grams_expr(text_col)), lambda g: _bucket(g, n_buckets)
            ).alias("__bs__"),
        )
        .localCheckpoint(eager=False)
    )
    tc, rc, mt, mr = _counts_from_tagged(
        bucketed.select("__is_tgt__", F.explode("__bs__").alias("bucket")),
        n_buckets,
        alpha,
    )
    from jagular_spark.functions import lit_bigint_array, lit_double_array

    if importance == "log":
        table = lit_double_array(
            [
                math.log((tc.get(b, 0) + alpha) / mt)
                - math.log((rc.get(b, 0) + alpha) / mr)
                for b in range(n_buckets)
            ]
        )
        acc0 = F.lit(0.0)
    else:
        table = lit_bigint_array(
            [
                (tc.get(b, 0) + alpha) * mr - (rc.get(b, 0) + alpha) * mt
                for b in range(n_buckets)
            ]
        )
        acc0 = F.lit(0).cast("long")
    out = bucketed.where(F.col("__is_tgt__") == 0).select(
        F.col(id_col),
        F.size("__bs__").cast("long").alias("n_grams"),
        F.aggregate(
            F.col("__bs__"),
            acc0,
            lambda acc, b: acc + F.element_at(table, b + F.lit(1)),
        ).alias("score" if importance == "log" else "score_num"),
    )
    if importance == "log":
        return out
    return out.withColumn(
        "score",
        F.col("score_num").cast("double")
        / F.lit(float(mt))
        / F.lit(float(mr)),
    )


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
    from jagular_spark.functions import lit_bigint_array

    lit = lit_bigint_array(delta)
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


def score_with_log_weights(
    df: DataFrame,
    logw: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Serving half of the PAPER-EXACT form: score documents against an
    already-fitted per-bucket log-weight table (dsir_fit_log_weights).
    Same zero-shuffle, frozen-model shape as score_with_deltas — the
    double sum folds left-to-right over the gram array, matching the
    replay's per-gram ``math.log`` accumulation order bit-for-bit
    (each logw entry IS the per-gram summand)."""
    from jagular_spark.functions import lit_double_array

    lit = lit_double_array(logw)
    gs = F.expr(_grams_expr(text_col))
    return df.select(F.col(id_col), gs.alias("__gs__")).select(
        F.col(id_col),
        F.size("__gs__").cast("long").alias("n_grams"),
        F.aggregate(
            F.transform(
                F.col("__gs__"),
                lambda g: F.element_at(lit, _bucket(g, n_buckets) + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("score"),
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
    importance: str = "diff",
) -> DataFrame:
    """The selection step: the ``k`` most target-like raw documents.
    Default surrogate form orders by (score_num DESC, id ASC) — an
    exact-integer total order, so the cut is engine-reproducible; the
    paper-exact ``importance="log"`` form orders by (score DESC, id
    ASC) with the usual float-tie caveat. orderBy+limit plans as
    TakeOrderedAndProject: per-task heap top-k, no global sort, the
    corpus never shuffles."""
    s = dsir_scores(raw, target, id_col, text_col, n_buckets, alpha, importance)
    rank = "score" if importance == "log" else "score_num"
    return s.orderBy(F.col(rank).desc(), F.col(id_col).asc()).limit(k)
