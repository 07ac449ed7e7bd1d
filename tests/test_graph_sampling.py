"""Connected-components clustering + deterministic sampling tests."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from jagular_spark.operators.graph import connected_components, dedup_clusters
from jagular_spark.operators.sampling import hash_sample, stratified_sample


def _edges(spark, pairs, n_parts=1):
    return spark.createDataFrame(pairs, "src long, dst long").repartition(n_parts)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3: needs >1 propagation round), pair 10-11,
    # triangle 20-21-22 with redundant edge
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    cc = {r.id: r.component for r in connected_components(_edges(spark, pairs)).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_partition_invariance(spark):
    pairs = [(i, i + 1) for i in range(1, 30)] + [(100, 101), (102, 101)]
    a = sorted(map(tuple, connected_components(_edges(spark, pairs, 1)).collect()))
    b = sorted(map(tuple, connected_components(_edges(spark, pairs, 7)).collect()))
    assert a == b
    # the 30-chain floods to the single minimum label 1
    assert all(c == 1 for v, c in a if v <= 30)


def test_connected_components_empty_edges(spark):
    cc = connected_components(_edges(spark, []).limit(0))
    assert cc.count() == 0


def test_dedup_clusters_covers_all_docs(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_a long, id_b long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(docs, pairs).collect()}
    assert out[1] == (1, True) and out[3] == (1, False) and out[5] == (1, False)
    # untouched docs are their own canonical singleton
    for d in (0, 2, 4, 6, 7):
        assert out[d] == (d, True)
    # a dedup keep-list retains exactly one doc per cluster
    assert sum(1 for _, (c, k) in out.items() if k) == len({c for c, _ in out.values()})


def _py_bucket(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def test_hash_sample_matches_reference_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    frac = 0.3
    got = {r.doc_id for r in hash_sample(df, "doc_id", frac).collect()}
    want = {i for i in range(500) if _py_bucket(str(i)) < int(frac * (1 << 32))}
    assert got == want
    # determinism across partitionings
    got7 = {r.doc_id for r in hash_sample(df.repartition(7), "doc_id", frac).collect()}
    assert got7 == got


def test_stratified_sample_per_stratum_fractions(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = stratified_sample(df, "stratum", {"a": 1.0, "b": 0.0}, key_col="doc_id")
    got = {(r.doc_id, r.stratum) for r in out.collect()}
    assert got == {(i, s) for i, s in rows if s == "a"}
    # unlisted strata fall back to default_fraction
    out2 = stratified_sample(df, "stratum", {"a": 1.0}, key_col="doc_id")
    assert {r.stratum for r in out2.collect()} == {"a"}


# ---------------------------------------------------------------------------
# Property: distributed min-label CC == sequential union-find
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 35), st.integers(0, 35)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=50,
)


def _union_find_components(pairs):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for v in parent:
        roots.setdefault(find(v), []).append(v)
    return {v: min(vs) for vs in roots.values() for v in vs}


@given(pairs=edge_lists)
@_SET
def test_connected_components_matches_union_find(spark, pairs):
    edges = _edges(spark, [(int(a), int(b)) for a, b in pairs])
    want = _union_find_components(pairs)
    # default path (driver union-find below the small-graph threshold)
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == want
    # distributed min-label loop, forced (small_graph_edges=-1) — the
    # 100-TB path must stay equivalent, not just the fast path
    got_d = {
        r.id: r.component
        for r in connected_components(edges, small_graph_edges=-1).collect()
    }
    assert got_d == want


def test_rebalance_sample_shrinks_only_overrepresented(spark):
    """min(1, target·N/n_g): strata above target shrink toward it,
    strata at/below pass through untouched (pure downsampling)."""
    from jagular_spark.operators.sampling import rebalance_sample

    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_sample(df, "lang", {"big": 0.5, "small": 0.5})
    got = {r.lang: n for r, n in [(r, r["count"]) for r in out.groupBy("lang").count().collect()]}
    # small (200 docs, 20% < 50% target): all kept
    assert got["small"] == 200
    # big (800 docs, 80% > 50% target): fraction = 0.5*1000/800 = 0.625
    # → ~500 expected under md5 uniformity (σ ≈ 14; ±5σ bound)
    assert 430 <= got["big"] <= 570
    # determinism: re-running yields the identical membership
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in rebalance_sample(df, "lang", {"big": 0.5, "small": 0.5}).collect()}
    assert a == b


def test_rebalance_sample_default_share_for_unlisted_strata(spark):
    """A stratum absent from target_shares is dropped by default
    (default_share=0.0 — a target mixture is a whole composition), and
    kept at the requested rate when default_share is passed — the
    escape hatch for an unexpected new language showing up mid-corpus."""
    from jagular_spark.operators.sampling import rebalance_sample

    rows = [(i, "en" if i < 500 else "surprise") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    dropped = rebalance_sample(df, "lang", {"en": 1.0})
    assert dropped.where(F.col("lang") == "surprise").count() == 0
    kept = rebalance_sample(df, "lang", {"en": 0.25}, default_share=0.25)
    # surprise: f = min(1, 0.25*1000/500) = 0.5 → ~250 of 500 kept
    n = kept.where(F.col("lang") == "surprise").count()
    assert 180 <= n <= 320


def test_shuffle_shards_deterministic_and_balanced(spark):
    """Shard assignment is a pure salted-hash function (partition-count
    invariant); positions are contiguous 0..n_s-1 within each shard;
    shards are roughly balanced; a different salt yields a different
    permutation."""
    from jagular_spark.operators.sampling import shuffle_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id"
    )
    a = sorted(map(tuple, shuffle_shards(docs, "doc_id", 8, "s1").collect()))
    b = sorted(
        map(tuple, shuffle_shards(docs.repartition(7), "doc_id", 8, "s1").collect())
    )
    assert a == b and len(a) > 0
    by_shard = {}
    for doc_id, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    n = len(a)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
        assert len(poss) > n // 8 // 4  # no empty/starved shard
    c = sorted(map(tuple, shuffle_shards(docs, "doc_id", 8, "s2").collect()))
    assert c != a  # salt changes the permutation


# ---------------------------------------------------------------------------
# token_budget_sample (r14): absolute-token-budget mixture building
# ---------------------------------------------------------------------------

def test_token_budget_sample_matches_pure_python_replay(spark):
    """Independent hashlib/int replay of the whole keep rule: exact
    per-stratum token totals, threshold = min(2^32, budget·2^32 // T_g)
    in arbitrary-precision ints, membership = md5 bucket < threshold.
    The budget for stratum 'c' is deliberately past int64/2^32 so a
    64-bit engine-side multiply would overflow — the driver-side
    Python-int division must not."""
    from jagular_spark.operators.sampling import token_budget_sample

    rows = [
        (i, ["a", "b", "c", "d"][i % 4], "tok " * (3 + i % 5))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    budgets = {"a": 150, "b": 0, "c": 1 << 40}
    got = {
        (r.doc_id, r.src, r.n_tokens)
        for r in token_budget_sample(
            df, budgets, group_col="src", key_col="doc_id"
        ).collect()
    }

    # replay: trailing space means split('\s+') of the trimmed text
    # yields exactly (3 + i%5) tokens
    ntok = {i: 3 + i % 5 for i, _, _ in rows}
    totals = {}
    for i, s, _ in rows:
        if s in budgets:
            totals[s] = totals.get(s, 0) + ntok[i]
    thr = {
        s: min(1 << 32, (b << 32) // totals[s]) for s, b in budgets.items()
    }
    expect = {
        (i, s, ntok[i])
        for i, s, _ in rows
        if s in thr and _py_bucket(str(i)) < thr[s]
    }
    assert got == expect
    # the three regimes all occurred: 'c' clamped to keep-all, 'a'
    # genuinely cut, 'b' (budget 0) and unlisted 'd' fully dropped
    assert {s for _, s, _ in got if s == "c"} and sum(
        1 for _, s, _ in got if s == "c"
    ) == sum(1 for _, s, _ in rows if s == "c")
    n_a = sum(1 for _, s, _ in got if s == "a")
    assert 0 < n_a < sum(1 for _, s, _ in rows if s == "a")
    assert not any(s in ("b", "d") for _, s, _ in got)


corpora = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),      # stratum
        st.integers(1, 9),                      # token count
    ),
    min_size=1,
    max_size=60,
)
budget_maps = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.one_of(st.integers(0, 40), st.just(1 << 40)),
    min_size=1,
    max_size=3,
)


@_SET
@given(corpora, budget_maps)
def test_token_budget_sample_property_matches_replay(spark, rows_spec, budgets):
    """Property: for ANY stratum/length composition and ANY budget map
    (including zero budgets and budgets past int64/2^32), the sampler
    equals the arbitrary-precision pure-Python replay exactly."""
    from jagular_spark.operators.sampling import token_budget_sample

    rows = [
        (i, s, "t " * n) for i, (s, n) in enumerate(rows_spec)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {
        (r.doc_id, r.src, r.n_tokens)
        for r in token_budget_sample(
            df, budgets, group_col="src", key_col="doc_id"
        ).collect()
    }
    ntok = {i: n for i, (_, n) in enumerate(rows_spec)}
    totals: dict[str, int] = {}
    for i, (s, n) in enumerate(rows_spec):
        if s in budgets:
            totals[s] = totals.get(s, 0) + n
    thr = {
        s: (1 << 32) if totals.get(s, 0) == 0
        else min(1 << 32, (b << 32) // totals[s])
        for s, b in budgets.items()
    }
    expect = {
        (i, s, ntok[i])
        for i, (s, _) in enumerate(rows_spec)
        if s in thr and _py_bucket(str(i)) < thr[s]
    }
    assert got == expect
