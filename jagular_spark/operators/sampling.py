"""Deterministic hash-based sampling — the reproducible alternative to
``df.sample()`` for training-data pipelines.

``rand()``-based sampling is not reproducible across retries, partition
layouts, or engines, which breaks dataset versioning: the same pipeline
run twice must emit the same sample. Hashing a stable key instead makes
membership a pure function of the row — re-runs, backfills, and the
DuckDB oracle all agree bit-for-bit, and the sample composes with
incremental ingestion (new rows don't reshuffle old membership).

All expressions are JVM-side column ops (md5 + integer compare): no
UDFs, no shuffle — sampling is a pure filter pushed at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_SPACE = 1 << 32


def _null_key_predicate(key: F.Column, pred: F.Column, null_keys: str, op: str) -> F.Column:
    """Membership predicate wrapper implementing the NULL-key policy
    shared by every hash-threshold sampler (r17 review: md5(NULL) is
    NULL, NULL < thr is NULL, so a NULL-key row was SILENTLY dropped
    by every sampler — on a real web corpus that is data loss, not a
    policy). Policies:

    - "drop" (legacy default until the r20 semantics flip): unchanged
      predicate — NULL keys fall out via three-valued logic.
    - "keep": NULL-key rows pass through unconditionally — sampling
      cannot lose rows it could never hash; the caller owns any
      downstream dedup/repair of keyless rows.
    - "error": the scan raises on the first NULL key (assert_true
      rides the predicate) — the loud option for pipelines where a
      keyless row is a bug upstream.

    Oracle mirror: "keep" is ``OR key IS NULL``; "error" is DuckDB's
    ``error()`` guard — both exact."""
    if null_keys == "drop":
        return pred
    if null_keys == "keep":
        return key.isNull() | pred
    if null_keys == "error":
        return F.when(
            F.assert_true(
                key.isNotNull(), F.lit(f"{op}: NULL sampling key")
            ).isNull(),
            pred,
        )
    raise ValueError(
        f"null_keys must be 'drop', 'keep' or 'error', got {null_keys!r}"
    )



def hash_bucket(key_col, salt: str = "") -> F.Column:
    """Uniform deterministic bucket in [0, 2^32) from the md5 of the
    (salted) key — same construction as the oracle's
    ``('0x' || substr(md5(..), 1, 8))::BIGINT``. Accepts a column name
    or a Column expression (r17: lets selection._bucket delegate
    instead of duplicating the recipe; Catalyst's SimplifyCasts
    removes the no-op string cast on an already-string expression, so
    delegating callers keep their exact plan)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    keyed = (
        F.concat(F.lit(salt), key.cast("string"))
        if salt
        else key.cast("string")
    )
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    null_keys: str = "drop",
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the hash
    space. Exact integer threshold compare — no float drift between
    engines. ``null_keys``: see :func:`_null_key_predicate`."""
    thr = int(fraction * _HASH_SPACE)
    return df.where(
        _null_key_predicate(
            F.col(key_col),
            hash_bucket(key_col, salt) < F.lit(thr),
            null_keys,
            "hash_sample",
        )
    )


def hash_sample_rows(
    df: DataFrame, key_col: str, n_rows: int, salt: str = ""
) -> DataFrame:
    """Keep EXACTLY the ``n_rows`` smallest-hash rows (ties broken by
    key) — the absolute-size twin of :func:`hash_sample` and the
    100-TB quantizer-fit shape (SCALE.md measures fits at a FIXED
    sample size; with only a fraction knob a deployment had to compute
    ``n_rows / corpus_count`` by hand, r12 verdict task #3).

    Determinism: membership is a pure function of (corpus, salt) —
    the n smallest md5 buckets are the same under any partitioning,
    retry, or engine, so a DuckDB oracle reproduces the set with
    ``ORDER BY bucket, key LIMIT n``. Scale: Catalyst plans
    orderBy+limit as TakeOrderedAndProject — each task keeps its local
    top-n and the driver merges k·n_partitions candidates; no global
    sort, no shuffle of the corpus.

    The sort is explicitly NULLS LAST (r18): a NULL key hashes to a
    NULL bucket, and Spark's bare ``asc`` is NULLS FIRST while
    DuckDB's ``ORDER BY`` is NULLS LAST — on a corpus with NULL keys
    the two engines would silently pick DIFFERENT fit samples (the
    n_sequences latent-divergence class; every quantizer fit routes
    through here via _collect_fit_sample). NULLS LAST matches the
    oracle AND keeps unhashable rows out of the sample unless the
    corpus has fewer than ``n_rows`` real keys; identical on every
    NULL-free corpus, pinned cross-engine in
    tests/test_null_semantics.py."""
    b = hash_bucket(key_col, salt)
    return df.orderBy(
        b.asc_nulls_last(), F.col(key_col).asc_nulls_last()
    ).limit(int(n_rows))


def stratified_sample(
    df: DataFrame,
    strata_col: F.Column | str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
    null_keys: str = "drop",
) -> DataFrame:
    """Per-stratum deterministic sampling: each row's keep-threshold is
    chosen by its stratum value (e.g. upsample rare languages, drop
    low-quality buckets). ``fractions`` maps stratum value → fraction;
    unlisted strata get ``default_fraction``. One pass, no shuffle.
    A NULL stratum takes ``default_fraction`` (the CASE's otherwise
    arm — already explicit); ``null_keys`` governs NULL sampling KEYS
    (see :func:`_null_key_predicate`)."""
    strata = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    thr = F.lit(int(default_fraction * _HASH_SPACE))
    for value, frac in sorted(fractions.items()):
        thr = F.when(strata == F.lit(value), F.lit(int(frac * _HASH_SPACE))).otherwise(thr)
    return df.where(
        _null_key_predicate(
            F.col(key_col),
            hash_bucket(key_col, salt) < thr,
            null_keys,
            "stratified_sample",
        )
    )


def rebalance_sample(
    df: DataFrame,
    group_col: str,
    target_shares: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    default_share: float = 0.0,
    null_keys: str = "drop",
    null_groups: str = "drop",
) -> DataFrame:
    """Mixture REBALANCING: downsample each stratum toward a target
    composition (the upweight-low-resource-languages step of training
    data prep). Unlike ``stratified_sample``'s fixed fractions, the
    per-stratum keep-fraction is COMPUTED from the observed counts:
    ``f_g = min(1, target_g · N / n_g)`` — strata above their target
    share shrink, strata at/below their target keep everything (pure
    downsampling; no row duplication, so the result stays a subset).

    A stratum NOT listed in ``target_shares`` gets ``default_share``
    (default 0.0 → its rows are DROPPED — a target mixture is a whole
    composition, so unlisted means unwanted). Pass e.g.
    ``default_share=1.0 / len(target_shares)`` — or any share — to keep
    an unexpected new stratum flowing instead; this mirrors
    ``stratified_sample``'s ``default_fraction`` escape hatch.

    Determinism/parity: counts are exact BIGINT; the fraction is two
    float ops (one multiply, one divide) in a fixed tree, floored into
    the 2^32 integer hash space, and membership is the usual md5
    threshold — the DuckDB oracle reproduces it bit-for-bit. Plan: one
    count aggregate (broadcast back), membership stays a scan-level
    filter on the corpus — the big side never shuffles.

    NULL handling (r17 review): the counts join is an INNER equi-join
    on ``group_col``, and NULL never equals NULL, so a NULL-group row
    was silently dropped BEFORE any share policy could see it —
    unlike an unlisted stratum, which at least takes
    ``default_share``. ``null_groups="default_share"`` switches the
    join to null-safe equality so a NULL group flows through as an
    ordinary unlisted stratum (its own count row, ``default_share``
    target); ``"error"`` raises on the first NULL group; ``"drop"``
    (legacy default until the r20 flip) keeps the silent inner-join
    behavior. ``null_keys`` governs NULL sampling keys (see
    :func:`_null_key_predicate`).
    """
    if null_groups not in ("drop", "default_share", "error"):
        raise ValueError(
            f"null_groups must be 'drop', 'default_share' or 'error', got {null_groups!r}"
        )
    tgt = F.lit(float(default_share))
    for value, share in sorted(target_shares.items()):
        tgt = F.when(F.col(group_col) == F.lit(value), F.lit(share)).otherwise(tgt)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("__n_g__"))
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("__n_tot__"))
    # fixed float tree: ((target · N) / n_g), clamped, floored into the
    # integer hash space — mirrored verbatim in the oracle SQL
    frac = F.least(
        tgt * F.col("__n_tot__").cast("double") / F.col("__n_g__").cast("double"),
        F.lit(1.0),
    )
    thr = F.floor(frac * F.lit(4294967296.0)).cast("long")
    pred = _null_key_predicate(
        F.col(key_col),
        hash_bucket(key_col, salt) < thr,
        null_keys,
        "rebalance_sample",
    )
    if null_groups == "error":
        # EAGER check on the counts aggregate (one map-side-combined
        # scan to <= |strata| rows): an inline assert predicate is not
        # reliable here — Catalyst pushes the inner join's
        # isnotnull(group) into the same scan filter and may order it
        # BEFORE the assert conjunct, silently discarding the row the
        # assert exists to catch. The "error" policy buys loudness at
        # the cost of this one extra aggregate job.
        if counts.where(F.col(group_col).isNull()).limit(1).count() > 0:
            raise ValueError("rebalance_sample: NULL group")
    if null_groups == "default_share":
        joined = df.join(
            F.broadcast(counts.withColumnRenamed(group_col, "__g__")),
            F.col(group_col).eqNullSafe(F.col("__g__")),
        ).drop("__g__")
    else:
        joined = df.join(F.broadcast(counts), group_col)
    return (
        joined.crossJoin(F.broadcast(tot))
        .where(pred)
        .drop("__n_g__", "__n_tot__")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    null_keys: str = "drop",
) -> DataFrame:
    """Mixture building to ABSOLUTE token budgets — the shape a
    training run actually specifies ("200 B tokens of web, 30 B of
    code"), which neither ``stratified_sample`` (fixed fractions) nor
    ``rebalance_sample`` (doc-COUNT shares) expresses: long-document
    strata need fewer docs per token, so a count-based share misses a
    token target by the stratum's mean-length ratio.

    Per stratum the exact token total ``T_g`` comes from ONE bounded
    aggregate (map-side combine to ≤ |strata| rows per task, collected
    bounded); the keep rule is the usual deterministic md5 threshold
    with ``thr_g = min(2^32, budget_g · 2^32 // T_g)`` so the EXPECTED
    surviving token mass is ``min(budget_g, T_g)``. The threshold
    division runs driver-side in arbitrary-precision Python ints —
    ``budget · 2^32`` overflows int64 for any corpus past ~2^31 tokens,
    so neither engine may do that multiply in 64-bit; the DuckDB oracle
    replays it in HUGEINT and lands on the identical BIGINT threshold.
    Membership is then a scan-level filter against a ≤ |strata|-branch
    literal CASE: the corpus never shuffles. A stratum not in
    ``budgets`` is DROPPED (budget 0 — a mixture is a whole
    composition), mirroring ``rebalance_sample``.

    Sampling (hash-uniform within the stratum), not a greedy
    quality-ordered fill: an exact running-cumsum cut would need a
    per-stratum total order — a single-task sort for a hot stratum at
    100 TB — while the expected-budget threshold is exact-integer,
    partition-invariant, and one scan. Output = surviving rows plus
    their exact ``n_tokens`` (whitespace tokens, the domain_mixture
    convention)."""
    thresholds = token_budget_thresholds(df, budgets, group_col, text_col)
    return apply_token_thresholds(
        df, thresholds, group_col, key_col, text_col, salt, null_keys
    )


def _ntok_expr(text_col: str) -> F.Column:
    """Exact whitespace token count — the domain_mixture convention."""
    return F.expr(f"CAST(size(split(trim({text_col}), '\\\\s+')) AS BIGINT)")


def token_budget_thresholds(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "source",
    text_col: str = "text",
) -> dict[str, int]:
    """The FIT half of :func:`token_budget_sample`: exact per-stratum
    token totals from one bounded aggregate, floor-divided into the
    md5 hash space driver-side in arbitrary-precision ints. Returns
    ``{stratum: threshold}`` — a frozen, serializable model a serving
    path (the streaming twin) applies without touching the corpus
    snapshot again."""
    totals = {
        r[0]: int(r[1])
        for r in (
            df.where(F.col(group_col).isin(list(budgets)))
            .select(F.col(group_col), _ntok_expr(text_col).alias("__nt__"))
            .groupBy(group_col)
            .agg(F.sum("__nt__").cast("long").alias("__t__"))
            .collect()
        )
    }
    return {
        g: (
            _HASH_SPACE
            if totals.get(g, 0) == 0
            else min(_HASH_SPACE, (int(b) * _HASH_SPACE) // totals[g])
        )
        for g, b in budgets.items()
    }


def apply_token_thresholds(
    df: DataFrame,
    thresholds: dict[str, int],
    group_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    null_keys: str = "drop",
) -> DataFrame:
    """The SERVING half: membership against ALREADY-FITTED thresholds —
    a scan-level md5 filter with the thresholds as a ≤ |strata|-branch
    literal CASE (zero shuffle, zero state), which is also exactly the
    frozen-model STREAMING shape (streaming/pipeline.
    stream_token_budget_sample wires a document stream through this
    very function; stream-static with no stateful operators, so append
    mode just works)."""
    thr = F.lit(0).cast("long")
    for g, cut in sorted(thresholds.items()):
        thr = F.when(F.col(group_col) == F.lit(g), F.lit(int(cut))).otherwise(thr)
    # NULL group: threshold 0 via the otherwise arm — an explicit
    # drop, same as any unbudgeted stratum (a mixture is a whole
    # composition); null_keys governs NULL sampling KEYS
    return df.withColumn("n_tokens", _ntok_expr(text_col)).where(
        _null_key_predicate(
            F.col(key_col),
            hash_bucket(key_col, salt) < thr,
            null_keys,
            "token_budget_sample",
        )
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding — the step a pretraining
    pipeline runs before writing training shards: every row gets a
    pseudorandom (but salt-reproducible) shard and position so that
    readers streaming shard files see a uniformly mixed corpus.

    Scale shape: NO global sort. The shard is a row-local hash bucket
    (uniform, so shards balance), and the position is a rank within the
    shard ordered by a SECOND independent hash — one window per shard
    partition, fully parallel. A global row_number would funnel 100 TB
    through one task; per-shard ranking is the standard distributed
    formulation and changes nothing a shard-local reader can observe.
    Ties (hash collisions) break by key, so the layout is a pure
    function of (corpus, salt) — retry- and partition-count-invariant.

    ``(…input cols…, shard, pos_in_shard)``."""
    from pyspark.sql import Window

    shard = F.pmod(hash_bucket(key_col, salt), F.lit(n_shards)).cast("long")
    order = hash_bucket(key_col, salt + "#pos")
    w = Window.partitionBy("shard").orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("shard", shard)
        .withColumn("pos_in_shard", (F.row_number().over(w) - 1).cast("long"))
    )
