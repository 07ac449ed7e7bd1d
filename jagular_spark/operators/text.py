"""Text-analysis operators for training-data pipelines (BASELINE.json
extension surface): language ID, document fingerprinting, tokenization
stats. All pure JVM-side column expressions (whole-stage codegen — no
Python UDFs), each with an exact DuckDB-oracle twin in workloads.py.

Determinism notes (same playbook as operators/similarity.py): integer
rolling hashes mod the Mersenne prime 2^31-1; md5-based 32-bit gram
hashes; double division only as the final step with identical expression
trees on both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2147483647

# tiny per-language stopword profiles (language-ID is a ratio heuristic)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "de", "et", "les", "un", "une"),
    "de": ("der", "die", "das", "und", "ein", "zu"),
    "es": ("el", "la", "de", "y", "los", "un", "en"),
}
# fixed priority order for deterministic argmax tiebreaks
LANG_ORDER = ("en", "fr", "de", "es")

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
# Spark SQL string literals consume one level of backslash escaping
_BPE_RE_SPARK = BPE_TOKEN_RE.replace("\\", "\\\\")


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple = (),
    null_pred: bool = False,
) -> DataFrame:
    """Stopword-ratio language ID over LANG_ORDER profiles; greedy
    first-wins argmax (``pred`` deterministic under score ties).
    ``(id, *keep, s_<lang>..., pred_lang)``. ``keep`` columns ride the
    same single projection (no re-join against the source).

    ``null_pred=True`` emits a NULL ``pred_lang`` for NULL text
    instead of the greedy CASE's fall-through to the LAST profile
    ('es') — a real web corpus has null fields, and a silent 'es' is
    a misclassification, not a policy (r17 review; r20 default flip
    per the NULL-semantics schedule — the oracle's CASE grows the
    same leading ``WHEN s_en IS NULL THEN NULL`` arm). All stopword
    scores are NULL exactly when the text is NULL, so the guard rides
    the score array — no extra column carried. Empty text is
    unaffected either way: its scores are defined (0.0) and argmax
    to the first profile.

    Expression-structure matters here: the argmax CASE references each
    score up to 3×, and a downstream filter on ``pred_lang`` (e.g.
    stratified sampling) references the whole CASE again — Catalyst
    project-collapse inlines multiply-referenced aliases, so the naive
    form re-splits and re-filters the text dozens of times per row
    (measured 12× slowdown on the sampling query). Two guards: (1) the
    token array and score array are bound as ``transform`` lambda
    variables, evaluated once; (2) the result struct passes through a
    one-element ``explode`` — a Generate node is a collapse barrier, so
    consumers reference the computed attribute instead of re-inlining
    the expression tree."""
    n_l = len(LANG_ORDER)
    ratio_terms = ", ".join(
        "CAST(size(filter(t, w -> w IN ({wl}))) AS DOUBLE) / CAST(size(t) AS DOUBLE)".format(
            wl=", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        )
        for lang in LANG_ORDER
    )
    null_arm = "WHEN sc[0] IS NULL THEN NULL " if null_pred else ""
    pred_case = (
        "CASE "
        + null_arm
        + " ".join(
            "WHEN "
            + " AND ".join(f"sc[{i}] >= sc[{j}]" for j in range(i + 1, n_l))
            + f" THEN '{LANG_ORDER[i]}'"
            for i in range(n_l - 1)
        )
        + f" ELSE '{LANG_ORDER[-1]}' END"
    )
    struct_fields = ", ".join(
        [f"'s_{lang}', sc[{i}]" for i, lang in enumerate(LANG_ORDER)]
        + [f"'pred_lang', {pred_case}"]
    )
    lang_struct = (
        f"transform(array(transform(array(split(trim({text_col}), '\\\\s+')), "
        f"t -> array({ratio_terms}))[0]), "
        f"sc -> named_struct({struct_fields}))[0]"
    )
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        F.explode(F.array(F.expr(lang_struct))).alias("__lang__"),
    ).select(
        id_col,
        *keep,
        *[F.col(f"__lang__.s_{lang}").alias(f"s_{lang}") for lang in LANG_ORDER],
        F.col("__lang__.pred_lang").alias("pred_lang"),
    )


def rolling_fingerprint(text_col: str) -> F.Column:
    """Whole-document polynomial rolling hash: fold (h·31 + ascii) mod P
    over characters — the order-sensitive fingerprint (reordered text
    changes it; md5 of the raw bytes wouldn't expose prefix structure)."""
    return F.expr(
        f"aggregate(transform(split({text_col}, ''), c -> CAST(ascii(c) AS BIGINT)), 0L, "
        f"(acc, x) -> (acc * 31 + x) % {P})"
    )


def min_gram_fingerprint(text_col: str, gram: int = 8) -> F.Column:
    """Winnowing-style signature: minimum md5-based hash over all
    ``gram``-char windows — stable under local edits away from the
    minimizing window (the MOSS/winnowing trick)."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(1, length({text_col}) - {gram - 1})), "
        f"i -> CAST(conv(substring(md5(substring({text_col}, i, {gram})), 1, 8), 16, 10) AS BIGINT)))"
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    # r18: the rolling/winnowing fingerprints are the heaviest
    # row-local projections in the text family (3.3 s single-task CPU
    # at sf0.1 — the whole query was ONE task on the one-split corpus
    # scan, zero shuffles anywhere); spread to session width first
    # (skipped automatically when the scan is already wide).
    from jagular_spark.operators.selection import _spread

    return _spread(df, id_col).select(
        F.col(id_col),
        rolling_fingerprint(text_col).alias("fp_roll"),
        min_gram_fingerprint(text_col).alias("fp_min8"),
    )


def bpe_token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BPE-ish tokenization stats: regex word/number/punct split plus a
    subword estimate of ceil(len/4) pieces per alphanumeric token.
    ``(id, n_regex_tokens, n_subwords, n_punct)``."""
    toks = f"regexp_extract_all({text_col}, '{_BPE_RE_SPARK}', 0)"
    return df.select(
        F.col(id_col),
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_regex_tokens"),
        F.expr(
            f"CAST(aggregate(transform({toks}, t -> CASE WHEN t RLIKE '^[A-Za-z0-9]' "
            f"THEN (length(t) + 3) DIV 4 ELSE 1 END), 0L, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("n_subwords"),
        F.expr(
            f"CAST(size(filter({toks}, t -> NOT t RLIKE '^[A-Za-z0-9]')) AS BIGINT)"
        ).alias("n_punct"),
    )


# ---------------------------------------------------------------------------
# Sequence packing, corpus vocabulary, domain-mixture stats
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Fixed-window token chunking with overlap — the sequence-packing
    step of a pretraining pipeline (every doc becomes ⌈n/stride⌉
    windows of ``chunk_tokens`` tokens, consecutive windows sharing
    ``chunk_tokens - stride``). One narrow projection + one posexplode:
    chunk starts ride a ``sequence()``, the window is a ``slice`` of the
    token array, identity is the md5 of the re-joined window (an
    engine-portable chunk hash for downstream chunk-level dedup).
    ``(id, chunk_idx, start_tok, n_tokens, chunk_hash)``."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = f"split(trim({text_col}), '\\\\s+')"
    # starts: 0, stride, 2·stride, … strictly below n (a doc shorter
    # than one window still yields its single ragged chunk)
    chunks = F.expr(
        f"transform(array({toks}), t -> "
        f"transform(sequence(0, CAST((size(t) - 1) DIV {stride} AS INT)), "
        f"           i -> slice(t, i * {stride} + 1, {chunk_tokens})))[0]"
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "ck"))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * F.lit(stride)).cast("long").alias("start_tok"),
            F.size("ck").cast("long").alias("n_tokens"),
            F.md5(F.array_join("ck", " ")).alias("chunk_hash"),
        )
    )


def vocab_top_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    top_k: int = 10,
) -> DataFrame:
    """Per-group vocabulary head by DOCUMENT frequency (the df half of
    tf-idf; corpus-analysis step behind stopword lists and quality
    filters). Distinct (doc, token) explode → one hash agg per
    (group, token) → window top-k with (df DESC, token ASC) determinism.
    ``(group, token, df, rank)``."""
    from pyspark.sql import Window

    toks = F.expr(f"array_distinct(split(trim({text_col}), '\\\\s+'))")
    tok = (
        df.select(F.col(group_col).alias("grp"), F.col(id_col), F.explode(toks).alias("token"))
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("df").desc(), F.col("token").asc())
    return (
        tok.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select(F.col("grp").alias(group_col), "token", "df", "rank")
    )


def domain_mixture(
    df: DataFrame,
    *,
    text_col: str = "text",
    domain_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Per-domain corpus composition — the bookkeeping behind training
    data mixture weights: docs, token totals (exact BIGINT), and each
    domain's share of all corpus tokens (single double division at the
    end, identical expression both engines).
    ``(domains…, n_docs, n_tokens, token_share)``. ``n_docs`` is a
    plain row count — rows, not distinct ids, which is why this takes
    no id column (the r17 review found the old ``id_col`` parameter
    unused and implying a dedup that never happened). Parameters are
    keyword-only because dropping that middle positional changed the
    positional meaning: a stale external ``domain_mixture(df,
    "doc_id", "text")`` call would silently bind text_col="doc_id"
    and iterate domain_cols="text" character-by-character, failing
    only at analysis time with a confusing error — now it is an
    immediate TypeError (r17 advice)."""
    n_tok = F.expr(f"CAST(size(split(trim({text_col}), '\\\\s+')) AS BIGINT)")
    per = df.select(*[F.col(c) for c in domain_cols], n_tok.alias("nt")).groupBy(
        *domain_cols
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    )
    # corpus total via a broadcast 1-row aggregate (map-side partials),
    # not a partition-less window that would funnel the domain table
    # through a single task
    total = per.agg(F.sum("n_tokens").cast("long").alias("__tot__"))
    return per.crossJoin(F.broadcast(total)).select(
        *domain_cols,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("__tot__").cast("double")).alias(
            "token_share"
        ),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_above: float = 0.3,
) -> DataFrame:
    """Intra-document repetition (the Gopher-style duplicate n-gram
    quality filter): per doc, total vs distinct token n-grams and the
    duplicate fraction, flagged above ``flag_above``. Pure row-local
    array lambdas — zero shuffle; the fraction is one double division
    at the end (identical expression both engines).
    ``(id, n_grams, n_distinct_grams, dup_frac, is_repetitive)``."""
    gram = ", ".join(f"t[i + {j}]" for j in range(n))
    grams = (
        f"transform(array(split(trim({text_col}), '\\\\s+')), t -> "
        f"if(size(t) >= {n}, "
        f"   transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', {gram})), "
        f"   cast(array() as array<string>)))[0]"
    )
    out = df.select(
        F.col(id_col),
        F.expr(f"CAST(size({grams}) AS BIGINT)").alias("n_grams"),
        F.expr(f"CAST(size(array_distinct({grams})) AS BIGINT)").alias(
            "n_distinct_grams"
        ),
    ).withColumn(
        "dup_frac",
        F.when(F.col("n_grams") > 0,
               (F.col("n_grams") - F.col("n_distinct_grams")).cast("double")
               / F.col("n_grams").cast("double")).otherwise(F.lit(0.0)),
    )
    return out.withColumn("is_repetitive", F.col("dup_frac") > F.lit(flag_above))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 2,
) -> DataFrame:
    """Eval-set decontamination — remove training documents that leak
    benchmark content: a train doc is contaminated when it shares at
    least ``min_shared`` distinct ``n``-token shingle hashes with ANY
    eval document. The eval shingle set is tiny by construction
    (benchmarks are small), so the plan broadcasts it and the training
    corpus is scanned ONCE with no shuffle on the big side; the count
    is a hash aggregate on (train doc, shared hash).
    ``(id, n_shared, contaminated)`` for every train doc."""
    from jagular_spark.operators.similarity import doc_shingle_hashes

    tr = doc_shingle_hashes(train, id_col, text_col, n)
    ev = (
        doc_shingle_hashes(eval_df, id_col, text_col, n)
        .select("h").distinct()
    )
    shared = (
        tr.join(F.broadcast(ev), "h")
        .groupBy(id_col)
        .agg(F.count_distinct("h").cast("long").alias("n_shared"))
    )
    return (
        train.select(id_col)
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared", F.lit(0).cast("long")).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= F.lit(min_shared)).alias(
                "contaminated"
            ),
        )
    )


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def quality_ratios(text_col: str = "text") -> dict:
    """The quality heuristic's component ratios as column expressions
    (alpha / digit / space / stopword fractions of ``text_col``) —
    ONE construction shared by the batch queries (docs_quality, the
    curation funnels) and the streaming twin (stream_curation), so a
    weight/stopword/regex tweak cannot land in one copy and silently
    break the advertised batch/stream parity (r17: the expressions
    previously lived verbatim in three places).

    The character-count denominator is ``nullif``-guarded: an
    empty-string document previously threw DIVIDE_BY_ZERO under the
    session's default ANSI mode, poison-pilling every consumer (one
    blank doc killed the whole funnel query and the stream_curation
    stream). Empty text now yields NULL ratios/score — a ``>= floor``
    quality gate drops it, never crashes. The DuckDB oracles carry the
    same nullif. The stopword denominator needs no guard:
    ``split(trim(''), '\\s+')`` is the 1-element [''] array."""
    n = F.nullif(F.length(F.col(text_col)).cast("double"), F.lit(0.0))
    alpha = (
        F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("double") / n
    )
    digit = (
        F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("double") / n
    )
    space = (
        F.length(F.regexp_replace(F.col(text_col), r"[^\s]", "")).cast("double") / n
    )
    stop = F.expr(
        f"CAST(size(filter(split(trim({text_col}), '\\\\s+'), "
        "t -> t IN ('the','a','of','and','to'))) AS DOUBLE)"
    ) / F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("double")
    return {"alpha": alpha, "digit": digit, "space": space, "stop": stop}


def quality_score_col(text_col: str = "text") -> F.Column:
    """The weighted quality score over :func:`quality_ratios` —
    0.4·alpha + 0.3·stopword + 0.3·(1 − digit), the single scoring
    expression every quality gate in the repo applies."""
    r = quality_ratios(text_col)
    return (
        F.lit(0.4) * r["alpha"]
        + F.lit(0.3) * r["stop"]
        + F.lit(0.3) * (F.lit(1.0) - r["digit"])
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    null_text: str = "propagate",
) -> DataFrame:
    """The Gopher / MassiveText quality-rule bundle (Rae et al. 2021,
    arXiv:2112.11446 §A1.1) as per-document pass flags + the combined
    keep decision — the published rule-based filter stage of a
    pretraining pipeline (complementing the continuous
    ``quality_scores`` heuristic):

    r1  50 ≤ word count ≤ 100 000
    r2  3 ≤ mean word length ≤ 10
    r3  symbol-to-word ratio ≤ 0.1 for the hash symbol AND ≤ 0.1 for
        the ellipsis, as TWO separate checks — the paper removes docs
        whose ratio exceeds 0.1 "for either the hash symbol or the
        ellipsis".  [an earlier revision summed the two counts into
        one ratio, wrongly rejecting docs with e.g. 6% hashes + 6%
        ellipses — each inside the published bound — the same
        mirrored-misreading class as the r4 inversion below]
    r4  ≤ 90% of lines start with a bullet (- * •)  [paper SSA1.1
        removes docs with MORE THAN 90% bullet lines, so keep ⇔
        10·bullets ≤ 9·lines; an earlier revision inverted this to
        bullets ≤ 10%, wrongly rejecting 11-90% bullet docs]
    r5  ≤ 30% of lines end with an ellipsis
    r6  ≥ 80% of words contain ≥ 1 alphabetic character
    r7  ≥ 2 distinct members of the required stop-word set present

    All thresholds compare as INTEGER cross-multiplications (10·sym ≤
    words, 10·alpha ≥ 8·words, 3·words ≤ chars ≤ 10·words, …) — no
    float anywhere, so the flags hash-match any conformant replay.
    Pure row-local projection: zero shuffles, composes with any scan.

    ``null_text="reject"`` evaluates a NULL text as the empty string
    (``coalesce``), so every count is defined, every flag is a real
    boolean and ``keep`` is FALSE — a downstream ``WHERE keep``
    rejects the document explicitly. The default ``"propagate"``
    keeps the legacy behavior: NULL text → NULL counts → NULL flags →
    NULL keep, which a keep-filter also drops but which poisons any
    aggregate over the flag columns (r17 review; r20 default flip per
    the NULL-semantics schedule — the oracle change is the same
    ``coalesce(text, '')``).

    ``(id, n_words, word_chars, n_lines, n_hash, n_ellipsis,
    n_alpha_words, n_bullet_lines, n_ellipsis_lines, n_stops_present,
    r1..r7 boolean, keep boolean)``."""
    if null_text not in ("propagate", "reject"):
        raise ValueError(f"null_text must be 'propagate' or 'reject', got {null_text!r}")
    src_text = f"coalesce({text_col}, '')" if null_text == "reject" else text_col
    t = f"split(trim({src_text}), '\\\\s+')"
    lines = f"split({src_text}, '\\n')"
    stops_sum = " + ".join(
        f"CAST(array_contains(__t__, '{w}') AS BIGINT)" for w in GOPHER_STOPS
    )
    out = (
        df.select(
            F.col(id_col),
            F.expr(src_text).alias(text_col),
            F.expr(t).alias("__t__"),
            F.expr(lines).alias("__l__"),
        )
        .select(
            F.col(id_col),
            F.size("__t__").cast("long").alias("n_words"),
            F.expr(
                "aggregate(__t__, CAST(0 AS BIGINT), (a, x) -> a + length(x))"
            ).alias("word_chars"),
            F.size("__l__").cast("long").alias("n_lines"),
            F.regexp_count(F.col(text_col), F.lit("#"))
            .cast("long")
            .alias("n_hash"),
            (
                F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))
                + F.regexp_count(F.col(text_col), F.lit("…"))
            ).cast("long").alias("n_ellipsis"),
            F.expr(
                "CAST(size(filter(__t__, x -> x rlike '[A-Za-z]')) AS BIGINT)"
            ).alias("n_alpha_words"),
            F.expr(
                "CAST(size(filter(__l__, l -> startswith(ltrim(l), '-') OR "
                "startswith(ltrim(l), '*') OR startswith(ltrim(l), '•'))) AS BIGINT)"
            ).alias("n_bullet_lines"),
            F.expr(
                "CAST(size(filter(__l__, l -> endswith(rtrim(l), '...') OR "
                "endswith(rtrim(l), '…'))) AS BIGINT)"
            ).alias("n_ellipsis_lines"),
            F.expr(f"CAST({stops_sum} AS BIGINT)").alias("n_stops_present"),
        )
    )
    r = {
        "r1_word_count": (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000),
        "r2_mean_word_len": (
            (F.lit(3) * F.col("n_words") <= F.col("word_chars"))
            & (F.col("word_chars") <= F.lit(10) * F.col("n_words"))
        ),
        "r3_symbol_ratio": (
            (F.lit(10) * F.col("n_hash") <= F.col("n_words"))
            & (F.lit(10) * F.col("n_ellipsis") <= F.col("n_words"))
        ),
        "r4_bullet_lines": F.lit(10) * F.col("n_bullet_lines")
        <= F.lit(9) * F.col("n_lines"),
        "r5_ellipsis_lines": F.lit(10) * F.col("n_ellipsis_lines")
        <= F.lit(3) * F.col("n_lines"),
        "r6_alpha_words": F.lit(10) * F.col("n_alpha_words")
        >= F.lit(8) * F.col("n_words"),
        "r7_stop_words": F.col("n_stops_present") >= 2,
    }
    for name, cond in r.items():
        out = out.withColumn(name, cond)
    keep = None
    for name in r:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 25,
    quanta: int = 1_000_000,
    idf: str = "rational",
) -> DataFrame:
    """BM25 top-k term retrieval over the corpus — the lexical-search
    complement to the ANN stack: score every document against a fixed
    query-term set with Okapi BM25 (k1 = 1.2, b = 0.75) and return the
    k best, rank-ordered.

    Cross-engine-exact numerics (the repo's oracle discipline): the
    per-term weight idf · tf(k1+1) / (tf + k1(1−b+b·dl/avgdl)) is
    cleared of fractions by multiplying through by 10·avgdl·N — with
    k1 = 6/5, b = 3/4 the weight becomes idf · (22·tf·T) /
    (10·tf·T + 3·T + 9·dl·N), ALL-INTEGER numerator and denominator
    (T = corpus token count, N = corpus docs) — and the transcendental
    ln in idf is replaced by the integer rational surrogate
    ((2N − 2df + 1)·quanta) DIV (2df + 1), i.e. the ln's ARGUMENT
    scaled to clear the +0.5s, not its logarithm.

    **Ranking caveat — read before using for relevance work.** The
    surrogate is monotone per term, so ordering within a SINGLE term
    matches classic BM25 exactly. But across terms it changes how
    scores MIX: the surrogate grows linearly in N/df where ln grows
    logarithmically, so rare terms weigh far more against common
    terms than classic BM25 gives them, and multi-term rankings CAN
    differ from Okapi's (a doc strong on a rare term beats a doc
    strong on two common terms earlier than ln-BM25 would rank it;
    ``tests/test_text.py::test_bm25_surrogate_vs_ln_ranking`` pins a
    crafted case where the two orders diverge). The surrogate exists
    for one reason: cross-engine hash-exactness against the DuckDB
    oracle (no transcendental is bit-reproducible across engines).
    For fidelity to the published formula pass ``idf="ln"``: the idf
    becomes ``ln((2N − 2df + 1) / (2df + 1))`` — exactly Robertson's
    ``ln((N − df + 0.5) / (df + 0.5))`` with the halves cleared — and
    everything else (tf shape, length normalization, top-k, ties) is
    unchanged. Use ``"ln"`` wherever an oracle hash is not required;
    ``"rational"`` stays the default because it is what every
    registry oracle mirrors.

    The only float
    steps are one int64→double cast pair and a fixed left-associated
    sum of the per-term weights — bit-identical IEEE ops in Spark and
    DuckDB. tf = 0 terms contribute exactly 0 (zero numerator), so no
    branch is needed.

    Scale shape: tf and dl are ROW-LOCAL array ops (no explode, no
    per-term shuffle); N, T and every per-term df come from ONE corpus
    aggregate broadcast back as a 1-row table; the only ordering work
    is the top-k itself, which Spark executes as TakeOrderedAndProject
    (per-partition heap + driver merge of k·partitions rows, never a
    global sort). Ties break by ascending id.

    ``(id, dl, score, rank)``."""
    from pyspark.sql import Window

    terms = list(query_terms)
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if idf not in ("rational", "ln"):
        raise ValueError(f"idf must be 'rational' or 'ln', got {idf!r}")
    toks = F.expr(f"split(trim({text_col}), '\\\\s+')")
    base = df.select(F.col(id_col), toks.alias("__t__"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("__n__"),
        F.sum(F.size("__t__")).cast("long").alias("__tt__"),
    ]
    for j, t in enumerate(terms):
        aggs.append(
            F.sum(F.array_contains("__t__", F.lit(t)).cast("long"))
            .cast("long")
            .alias(f"__df{j}__")
        )
    stats = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(stats)).withColumn(
        "__dl__", F.size("__t__").cast("long")
    )
    for j, t in enumerate(terms):
        # escape the literal (r17): a term containing a quote previously
        # crashed the parse (and was an expression-injection vector); the
        # df aggregate above already passes terms safely via F.lit
        esc = t.replace("\\", "\\\\").replace("'", "\\'")
        scored = scored.withColumn(
            f"__tf{j}__",
            F.expr(f"CAST(size(filter(__t__, x -> x = '{esc}')) AS BIGINT)"),
        )
    parts = []
    for j in range(len(terms)):
        if idf == "rational":
            idf_expr = (
                f"CAST((((2 * __n__ - 2 * __df{j}__ + 1)"
                f" * CAST({quanta} AS BIGINT))"
                f" DIV (2 * __df{j}__ + 1)) AS DOUBLE)"
            )
        else:  # "ln" — Robertson idf with the +0.5s cleared of fractions
            idf_expr = (
                f"LN(CAST(2 * __n__ - 2 * __df{j}__ + 1 AS DOUBLE)"
                f" / CAST(2 * __df{j}__ + 1 AS DOUBLE))"
            )
        parts.append(
            f"({idf_expr} * CAST(__tf{j}__ * 22 * __tt__ AS DOUBLE)"
            f" / CAST(10 * __tf{j}__ * __tt__ + 3 * __tt__ + 9 * __dl__ * __n__"
            f" AS DOUBLE))"
        )
    # "document matches the query" = some term occurs (r17): the old
    # `score > 0` filter was only equivalent for the always-positive
    # rational-surrogate idf — under idf="ln", terms with df > ~N/2 get
    # NEGATIVE Robertson idf, and score>0 silently dropped matching
    # documents (up to returning nothing for a common term). tf>0 is
    # the mode-independent match test; for the surrogate it is provably
    # the same set (idf>0 and every part >= 0), oracle hash unchanged.
    matches = F.greatest(*[F.col(f"__tf{j}__") for j in range(len(terms))]) > 0 \
        if len(terms) > 1 else F.col("__tf0__") > 0
    top = (
        scored.withColumn("score", F.expr(" + ".join(parts)))
        .where(matches)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(id_col, F.col("__dl__").alias("dl"), "score", "rank")
    )


def tfidf_top(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    idf_quanta: int = 1_000_000,
) -> DataFrame:
    """Per-document top-k terms by tf·idf — the classic relevance /
    keyword-extraction scoring, in EXACT integer arithmetic so it
    hash-matches across engines: idf is the integer surrogate
    ``(N · idf_quanta) DIV df`` (monotone in N/df; floor-division is
    identical in Spark ``DIV`` and DuckDB ``//``) and the score is the
    BIGINT product ``tf · idf_q``. Plan: one explode feeds BOTH the
    per-(doc, token) tf aggregate and the per-token df aggregate; the
    tf←df equi-join on token is AQE-broadcast when the vocabulary is
    small and a plain shuffle join at corpus scale; the corpus size N
    rides in as a broadcast 1-row aggregate. Ties are (score DESC,
    token ASC). ``(id, token, tf, df, score, rank)``."""
    from pyspark.sql import Window

    toks = F.expr(f"split(trim({text_col}), '\\\\s+')")
    tok = df.select(F.col(id_col), F.explode(toks).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = (
        tok.select(id_col, "token").distinct()
        .groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n__"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(total))
        .withColumn("idf_q", F.expr(f"(__n__ * CAST({idf_quanta} AS BIGINT)) DIV df"))
        .withColumn("score", (F.col("tf") * F.col("idf_q")).cast("long"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )


def bigram_fluency(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """CCNet-style statistical fluency scoring: fit a token-bigram
    frequency model on the corpus itself, then score every document by
    the mean corpus frequency of its bigrams (word-salad / boilerplate
    scores low, locally-coherent text high). The LM-filtering shape —
    fit a model with one aggregate, score with one join — with the
    transcendental log replaced by exact BIGINT sums so both engines
    hash-match; the only floating step is the single final division.

    Plan: row-local bigram explode → global (bigram → count) model —
    small next to the corpus, AQE-broadcast when it fits — then join
    the exploded stream back and hash-aggregate per document. At 100 TB
    the model table would be materialized once and reused (see the
    frozen-model streaming twin in streaming/pipeline.py).
    ``(id, group, n_bigrams, freq_sum, fluency)``."""
    bg = bigram_explode(df, id_col, text_col, group_col)
    return score_bigrams(bg, bigram_model(bg), id_col, group_col)


def bigram_explode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Row-local token-bigram explode (shared by the batch fit+score and
    the frozen-model streaming twin). ``(id, group, bg)``."""
    bgs = F.expr(
        f"transform(array(split(trim({text_col}), '\\\\s+')), t -> "
        f"if(size(t) >= 2, "
        f"   transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1])), "
        f"   cast(array() as array<string>)))[0]"
    )
    return df.select(F.col(id_col), F.col(group_col), F.explode(bgs).alias("bg"))


def bigram_model(bg: DataFrame) -> DataFrame:
    """The bigram LM: one global hash aggregate. ``(bg, cnt)``."""
    return bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def score_bigrams(
    bg: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Score exploded bigrams against a (bg, cnt) model: inner equi-join
    (stream-static and stateless when ``bg`` is a stream and ``model``
    a frozen batch table) + one per-doc hash aggregate."""
    return (
        bg.join(model, "bg")
        .groupBy(id_col, group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("cnt").cast("long").alias("freq_sum"),
        )
        .withColumn(
            "fluency",
            F.col("freq_sum").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


# PII redaction: dialect-portable regexes (work identically under Java
# regex and RE2/DuckDB — no lookaround, no backreferences) applied in a
# FIXED order, since redactions compose (an email contains digit runs a
# looser phone pattern could claim). Order: email → IPv4 → dashed phone.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4,8}\b", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails / IPv4 addresses / dashed phone numbers from a text
    column — the pre-training privacy pass every large-scale corpus
    pipeline needs. Appends ``out_col`` (redacted text),
    ``n_emails``/``n_ips``/``n_phones`` (match counts, taken BEFORE any
    replacement so counts are independent of redaction order), and
    ``was_redacted``. All JVM-side ``regexp_replace``/``regexp_count``
    expressions — no UDF, no shuffle: the redaction is a pure
    projection that composes with scans at any scale."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}s")
        for name, pat, _ in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return df.select(
        *df.columns,
        *counts,
        red.alias(out_col),
    ).withColumn("was_redacted", F.col(out_col) != F.col(text_col))


def window_hash_expr(text_col: str, k: int) -> str:
    """SQL expression: the md5 hash of every k-token sliding window of
    ``text_col`` as an array (row-local; binds the token array once via
    the transform-wrapper idiom; the size guard keeps ``sequence`` from
    descending on short docs). Shared by the batch and streaming
    substring-dedup paths."""
    return (
        f"transform(array(split(trim({text_col}), '\\\\s+')), t -> "
        f"if(size(t) >= {k}, "
        f"   transform(sequence(0, size(t) - {k}), "
        f"             i -> md5(concat_ws(' ', slice(t, i + 1, {k})))), "
        f"   cast(array() as array<string>)))[0]"
    )


def repeated_kgram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    hash_partitions: int | None = None,
    keep_first: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """Exact repeated-substring span detection — the corpus-level
    "substring dedup" pass (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): find every maximal token span
    whose k-token windows ALL occur >= ``min_count`` times across the
    corpus (including intra-document repeats), i.e. the spans a
    dedup pass would cut before training.

    Shape (scale path): one narrow map emits (id, pos, window-hash)
    via a single ``transform`` lambda binding the token array once
    (the O(tokens^2) project-collapse trap documented in
    similarity.doc_shingle_hashes); one groupBy(hash) marks duplicated
    windows — the ONLY corpus-wide exchange, keyed on a uniform md5
    hash so no skew; a semi-join brings the flag back to (id, pos)
    rows; maximal spans are gaps-and-islands per document (pos -
    row_number), one partitioned window + one aggregate. No all-pairs
    stage anywhere: cost is O(total windows) regardless of how many
    documents share a span, which is what makes the pass viable at
    100 TB (the published pass uses a suffix array on one machine; the
    windowed-hash formulation is its shuffle-parallel equivalent for
    fixed k).

    Returns one row per maximal duplicated span: (id, span_start,
    span_len, n_windows), token-indexed, span_len in tokens.

    ``keep_first=False`` (default) marks EVERY occurrence of a
    duplicated window — the detection report. ``keep_first=True``
    exempts the corpus-minimum (id, pos) occurrence of each window,
    the published pass's "remove all but one occurrence" policy: the
    spans then cut every repeat while one canonical copy survives
    (compose with :func:`cut_spans`). Same single uniform-hash
    exchange — the first-occurrence key is ``MIN(struct(id, pos))``
    (Spark structs order lexicographically by field), map-side
    combinable, not a window sort. The struct form is total-order
    correct for ANY id domain — an earlier packed ``id·2³² + pos``
    BIGINT mis-ordered negative ids and overflowed at id ≥ 2³¹."""
    win_expr = window_hash_expr(text_col, k)
    # repartition spreads the O(tokens·k) window hashing across executor
    # threads regardless of input split count (same measured pattern as
    # similarity.doc_shingle_hashes); the width follows the session's
    # shuffle parallelism unless overridden, so the hash stage scales
    # with the cluster instead of capping at a constant task count. The
    # lazy localCheckpoint materializes the window stream ONCE for its
    # two consumers (the dup-hash aggregate and the flag-back join)
    # instead of re-hashing the corpus per branch; at warehouse scale
    # prefer a staged parquet table for the same role (checkpoint blocks
    # are lineage-truncated, so an executor loss forfeits them).
    # A/B at sf0.1 (3 runs each): plain {7.5, 3.0, 3.8} s,
    # +repartition(64) {2.1, 1.3, 1.2} s, +checkpoint too {1.0-2.9} s
    # with the outliers gone; width 32 (session default) measures the
    # same band.
    if hash_partitions is None:
        from jagular_spark.session import shuffle_width

        hash_partitions = shuffle_width(df.sparkSession)
    wins = (
        df.repartition(hash_partitions, id_col)
        .select(F.col(id_col), F.expr(win_expr).alias("__ws__"))
        .select(F.col(id_col), F.posexplode("__ws__").alias("pos", "h"))
    )
    if checkpoint:
        # checkpoint=False trades the re-hash of the corpus per branch
        # for fault tolerance: lineage-truncated blocks die with their
        # executor, so a warehouse deployment stages the window stream
        # to parquet (or disables this) instead
        wins = wins.localCheckpoint(eager=False)
    from pyspark.sql import Window

    if keep_first:
        pk = F.struct(F.col(id_col), F.col("pos"))
        dup = (
            wins.groupBy("h")
            .agg(
                F.count(F.lit(1)).alias("__cnt__"),
                F.min(pk).alias("__first__"),
            )
            .where(F.col("__cnt__") >= min_count)
        )
        marked = (
            wins.join(dup, "h")
            .where(pk != F.col("__first__"))
            .select(id_col, "pos")
        )
    else:
        dup = (
            wins.groupBy("h")
            .agg(F.count(F.lit(1)).alias("__cnt__"))
            .where(F.col("__cnt__") >= min_count)
            .select("h")
        )
        marked = wins.join(dup, "h").select(id_col, "pos")
    grp = F.col("pos") - F.row_number().over(
        Window.partitionBy(id_col).orderBy("pos")
    )
    return (
        marked.withColumn("__grp__", grp)
        .groupBy(id_col, "__grp__")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(k)).cast("long").alias("span_len"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .select(id_col, "span_start", "span_len", "n_windows")
    )


def substring_dedup_staged(
    docs: DataFrame,
    staging_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    keep_first: bool = False,
    hash_partitions: int | None = None,
) -> DataFrame:
    """The 100 TB deployment shape of substring dedup as a first-class
    helper (r16 verdict Missing #2): DETECT spans → STAGE them to
    parquet → CUT from the staged table, as two separate jobs instead
    of one composed plan. Output-identical to
    ``cut_spans(docs, repeated_kgram_spans(docs, ...))`` by
    construction (property-pinned in tests/test_text.py) — only the
    execution shape differs, and it differs where it matters at scale:

    - PEAK MEMORY: the r16 staged attribution (SCALE.md) measured the
      composed one-job form at 15.5 s / 160k docs with up to 32 s of
      GC — holding the localCheckpoint window blocks and every
      exchange of BOTH halves in flight at once — while the same
      stages run separately are perfectly linear with ZERO GC (6.2 s
      total). Staging releases the detect job's blocks before the cut
      job starts.
    - FAULT TOLERANCE: the composed form's lazy ``localCheckpoint``
      blocks die with their executor; the staged span table is
      ordinary parquet, so a 100 TB pass resumes from the cut job.
    - The span table is tiny relative to the corpus (one row per
      maximal duplicated span), so the stage write is noise.

    The detect half passes ``checkpoint=True`` unchanged — within one
    job it still saves the second corpus hash of the dup-aggregate /
    flag-join pair; the parquet staging is BETWEEN the jobs. Returns
    cut_spans' ``(id, n_spans, n_tokens_cut, clean_text)``."""
    spans = repeated_kgram_spans(
        docs, id_col, text_col, k, min_count, hash_partitions, keep_first
    )
    spans.write.mode("overwrite").parquet(staging_path)
    staged = docs.sparkSession.read.parquet(staging_path)
    return cut_spans(docs, staged, id_col, text_col)


def cut_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply substring-dedup spans to the corpus — the OUTPUT half of
    the Lee et al. 2022 pass (reference behavior: the published pass
    deletes the repeated byte ranges and emits the deduplicated text;
    :func:`repeated_kgram_spans` only *detects* them). Every token
    whose 0-based position falls inside any ``[span_start, span_start +
    span_len)`` range of its document is removed and the survivors are
    re-joined with single spaces (the same whitespace normalization the
    detection pass applies). Documents with no spans pass through
    (normalized) untouched. The cut-everywhere policy is deterministic;
    to keep one canonical occurrence corpus-wide, pre-filter ``spans``
    to exempt it before calling.

    Scale shape: spans aggregate per doc (one shuffle on the uniform
    corpus key), then ONE equi-join back to the docs — no explode of
    the token stream, no second corpus-wide exchange. The surgery
    itself is a row-local ``filter`` HOF over the token array: the
    token array and span list bind once per row (arrays referenced from
    the previous projection, not rebuilt inside the lambda), so the
    per-row cost is O(tokens · spans_in_doc) interpreted compares with
    spans_in_doc small by construction (maximal spans are disjoint).

    ``(id, n_spans, n_tokens_cut, clean_text)``."""
    agg = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("__spans__")
    )
    kept = F.expr(
        "filter(__t__, (x, i) -> __spans__ IS NULL OR NOT exists(__spans__, "
        "s -> i >= s.span_start AND i < s.span_start + s.span_len))"
    )
    # r18: the surgery (split + filter HOF + concat_ws) is row-local
    # CPU that executes on the DOCS side of the broadcast span join —
    # at probe scale that side is a one-split parquet scan, so the
    # whole cut ran in a single task (profiled 1.4 s single-task CPU
    # inside docs_curation_funnel_v2). Same corpus-spread heuristic as
    # selection._spread: exchange to session width only when the scan
    # has fewer splits than the session is wide.
    from jagular_spark.operators.selection import _spread

    return (
        _spread(docs, id_col).join(agg, id_col, "left")
        .withColumn("__t__", F.expr(f"split(trim({text_col}), '\\\\s+')"))
        .withColumn("__k__", kept)
        .select(
            F.col(id_col),
            F.coalesce(F.size("__spans__"), F.lit(0)).cast("long").alias("n_spans"),
            (F.size("__t__") - F.size("__k__")).cast("long").alias("n_tokens_cut"),
            F.concat_ws(" ", F.col("__k__")).alias("clean_text"),
        )
    )
