"""Connected components over candidate-pair edges — the clustering
step of a large-scale dedup pipeline.

After pair generation (MinHash-LSH, n-gram Jaccard, SimHash or
embedding-cosine blocking), near-duplicate groups are the connected
components of the pair graph: keep one canonical document per
component, drop the rest. The reference engine stops at pair lists;
at 100 TB the grouping itself has to be distributed, so it is a
first-class operator here.

Algorithm: iterative min-label propagation ("hash-to-min" small-star
style). Every vertex starts labeled with itself; each round, a vertex
adopts the minimum label among itself and its direct neighbors. The
label of the component minimum floods one hop per round, and a
pointer-doubling step (label := label-of-label) compresses paths so
the loop converges in O(log diameter) rounds — near-dup components
are clique-like anyway (diameter 1-2), so 2-3 rounds in practice. Each round
is one shuffle (join on vertex id) + one min-aggregate; lineage is
truncated per round with ``localCheckpoint`` so the plan does not grow
with iterations (the classic iterative-algorithm trap on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = 1_000_000,
    null_ids: str = "drop",
) -> DataFrame:
    """``(id, component)`` for every vertex appearing in ``edges``;
    ``component`` is the minimum vertex id of the connected component
    (deterministic canonical label, no RNG).

    Scale shape per round: ``labels ⋈ edges`` is an equi-join on the
    vertex id (corpus-partitionable, AQE-skew-handled) followed by a
    map-side-combinable ``min`` aggregate, then a labels self-join for
    the doubling step. Rounds = O(log diameter), not component count or
    diameter. The convergence check rides the same aggregate
    (max of per-vertex "label shrank" flags) — no extra pass.

    ``small_graph_edges``: a dedup pair graph is orders of magnitude
    smaller than the corpus that produced it — at or below this edge
    count (~16 MB collected) the rounds' fixed driver/job cost exceeds
    the work, so the component labeling runs as one driver-side
    union-find over the collected edge list (identical min-label
    result; property-tested against the distributed loop). Above it,
    the O(log d) distributed loop runs. The materializing count that
    decides this is needed anyway to size the loop's partitions.

    ``null_ids``: a NULL endpoint has no vertex identity, and before
    r18 the two execution paths DISAGREED about it — the driver
    union-find crashed comparing None against int in the min-label
    pass, while the distributed loop's equi-joins silently dropped
    the NULL side (r17 review: same graph, different answer depending
    on edge count). "drop" (default — consistent, and bit-identical
    on any NULL-free graph, which every registry graph is) filters
    NULL-endpoint edges before EITHER path; "error" raises loudly on
    the first one.
    """
    if null_ids not in ("drop", "error"):
        raise ValueError(f"null_ids must be 'drop' or 'error', got {null_ids!r}")
    # Materialize the directed edges BEFORE symmetrizing: the union
    # references the edge lineage twice, and pair generation (LSH /
    # jaccard join) is the expensive part — without the checkpoint it
    # would execute twice. The edge list is small relative to the docs
    # it came from, and it is re-read every propagation round anyway.
    # Lazy checkpoint + count = ONE materialization job, not two.
    e0 = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    if null_ids == "error":
        e0 = e0.where(
            F.assert_true(
                F.col("a").isNotNull() & F.col("b").isNotNull(),
                F.lit("connected_components: NULL vertex id"),
            ).isNull()
        )
    else:
        e0 = e0.where(F.col("a").isNotNull() & F.col("b").isNotNull())
    e0 = e0.localCheckpoint(eager=False)
    # Partition the propagation loop proportionally to the edge count
    # (~1M edges per partition), not to the corpus that produced the
    # pairs: a dedup pair graph is orders of magnitude smaller than its
    # corpus, and running each round's joins at corpus-sized partition
    # counts wastes a fixed per-task cost per round (measured 3-4 s of
    # pure scheduling at sf0.1's ~500 edges × 32 partitions × rounds).
    n_edges = e0.count()
    if n_edges <= small_graph_edges:
        return _driver_union_find(e0)
    n_parts = max(1, min(int(n_edges // 1_000_000) + 1, 2048))
    # Both derived sets checkpoint lazily: round 1's single action
    # materializes them as a side effect instead of two more blocking
    # driver jobs. (Driver job round-trips, not data volume, dominate
    # CC on a pair graph — measured 2-4 s for a 500-edge graph when
    # every checkpoint and convergence probe was its own job.)
    e0 = e0.repartition(n_parts).localCheckpoint(eager=False)
    sym = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("l", F.col("id"))
    ).localCheckpoint(eager=False)
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            sym["a"].alias("id"), F.col("l")
        )
        new = (
            labels.select("id", "l", F.col("l").alias("l_old"))
            .unionByName(nbr.withColumn("l_old", F.lit(None).cast("long")))
            .groupBy("id")
            .agg(F.min("l").alias("l"), F.min("l_old").alias("l_old"))
        )
        # Pointer doubling: follow the label's own label (labels are
        # always vertex ids, so the self-join hits). One-hop flooding
        # alone needs diameter rounds — a 10^6-long path chain at 100 TB
        # would never finish; compressing two levels per round makes it
        # O(log diameter). In the converged round it degenerates to an
        # identity join over |V| rows — cheaper than the extra driver
        # round-trip a propagate-then-check-then-double split would cost.
        par = new.select(F.col("id").alias("pid"), F.col("l").alias("pl"))
        new = (
            new.join(par, new["l"] == par["pid"], "left")
            .select("id", F.coalesce("pl", "l").alias("l"), "l_old")
        ).localCheckpoint(eager=False)
        # ONE job per round: the convergence probe materializes the lazy
        # checkpoint (truncating lineage for the next round) and returns
        # the already-computed "any label shrank" flag in the same pass.
        changed = new.agg(
            F.max((F.col("l") < F.col("l_old")).cast("int")).alias("c")
        ).first()["c"]
        labels = new.select("id", "l")
        if not changed:
            break
    return labels.select("id", F.col("l").alias("component"))


def _driver_union_find(e0: DataFrame) -> DataFrame:
    """Min-label components of a SMALL collected edge list (one job to
    collect, one createDataFrame back) — path-compressed union-find,
    then every root relabeled to its component's minimum vertex id, so
    the output is bit-identical to the distributed min-label loop."""
    rows = e0.collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r.a, r.b
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-id root -> min label
    out = [(v, find(v)) for v in parent]
    return e0.sparkSession.createDataFrame(out, "id long, component long")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """``(doc_id, cluster_id, is_canonical)`` for EVERY document:
    near-dup components get the component-minimum id as ``cluster_id``;
    documents in no pair are their own singleton cluster. The keep-list
    of a dedup pass is ``is_canonical``."""
    cc = connected_components(pairs, src=pair_a, dst=pair_b)
    out = (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    return out.withColumn(
        "is_canonical", (F.col(id_col) == F.col("cluster_id"))
    )
