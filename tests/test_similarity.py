"""Similarity/dedup operator tests: cross-checks between the exact and
approximate paths (the oracle harness already pins exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jagular_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_lsh_candidates_cover_high_jaccard_pairs(spark):
    """With 4 bands × 2 rows, a pair at jaccard ≥ 0.5 collides in ≥1 band
    with prob ~1-(1-0.25)^4 ≈ 0.68 per-pair; the fixture's near-dups are
    ≥0.9 jaccard where recall ≈ 1-(1-0.81)^4 ≈ 0.9987. Require full
    recall on jaccard ≥ 0.9 and ≥ half on ≥ 0.5."""
    docs = _docs(spark)
    exact = sim.ngram_jaccard_pairs(docs, min_jaccard=0.5).collect()
    cand = {(r.id_a, r.id_b) for r in sim.lsh_candidate_pairs(sim.minhash_signature(docs)).collect()}
    high = {(r.id_a, r.id_b) for r in exact if r.jaccard >= 0.9}
    mid = {(r.id_a, r.id_b) for r in exact}
    assert high <= cand
    if mid:
        assert len(mid & cand) >= len(mid) / 2


def test_simhash_near_dups_have_close_fingerprints(spark):
    """Near-identical docs (jaccard ≥ 0.9) should differ in few simhash
    bits; random pairs should differ in many on average."""
    docs = _docs(spark)
    fp = {r.doc_id: r.simhash for r in sim.simhash(docs).collect()}
    pairs = sim.ngram_jaccard_pairs(docs, min_jaccard=0.9).collect()
    if not pairs:
        return
    ham = [bin(fp[r.id_a] ^ fp[r.id_b]).count("1") for r in pairs]
    assert max(ham) <= 4


def test_ann_lsh_is_subset_ranked_like_bruteforce(spark):
    emb = _emb(spark)
    probe = F.col("id") < 10
    exact = sim.ann_topk_bruteforce(emb, probe, k=5).collect()
    approx = sim.ann_topk_lsh(emb, probe, k=5).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    # every approx neighbor shares the probe's bucket; ranking within the
    # candidate set must follow the same integer-dot order (rank 1..k dense)
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # candidates come only from the probe's bucket, and the approximate
    # best can never beat the exact best
    buckets = {r.vec_id: r.bucket for r in sim.lsh_bucket_assign(emb).collect()}
    for r in approx:
        assert buckets[r.query_id] == buckets[r.neighbor_id]
    exact_best = {r.query_id: r.cos for r in exact if r.rank == 1}
    for r in approx:
        if r.rank == 1:
            assert r.cos <= exact_best[r.query_id] + 1e-12
    assert {(r.query_id, r.neighbor_id) for r in approx} or not exact_pairs


def test_bucket_assignment_deterministic(spark):
    emb = _emb(spark)
    b1 = {r.vec_id: r.bucket for r in sim.lsh_bucket_assign(emb).collect()}
    b2 = {r.vec_id: r.bucket for r in sim.lsh_bucket_assign(emb.repartition(7)).collect()}
    assert b1 == b2
    assert all(0 <= v < 256 for v in b1.values())
