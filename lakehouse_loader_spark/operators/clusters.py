"""Duplicate-cluster formation: connected components over near-dup pairs.

Pair lists (from minhash/simhash/cosine dedup) answer "which two docs
match"; a training-data pipeline needs "which GROUP of docs is one
document" plus a canonical representative.  That's connected components,
computed here with distributed min-label propagation: every node repeatedly
adopts the smallest label among itself and its neighbors.  Each iteration
is one join + one aggregate (shuffle on node id); components of diameter d
converge in ≤ d iterations, and d is tiny for dedup graphs (dup clusters
are near-cliques), so a fixed iteration budget is safe and keeps the plan
fully declarative — no driver-side convergence polling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min node
    id reachable (deterministic canonical representative)."""
    both = F.explode(
        F.array(
            F.struct(F.col(src_col).alias("node"), F.col(dst_col).alias("nbr")),
            F.struct(F.col(dst_col).alias("node"), F.col(src_col).alias("nbr")),
        )
    )
    edges = (
        # explode to both orientations in ONE pass over pairs — a unionAll
        # of two selects would reference (and recompute) the expensive
        # upstream pair plan twice
        pairs.select(both.alias("e"))
        .select("e.node", "e.nbr")
        .distinct()
        .persist()  # referenced once per iteration — without this, the
        # upstream pair computation (minhash etc.) re-runs every round
        # (AQE coalesces the per-iteration shuffles down to the graph's
        # actual size, so no manual repartition-by-count is needed)
    )
    # fill the cache with ONE upstream pass before the loop: the first
    # iteration's plan references edges through several subtrees, and a
    # lazy persist materializes concurrently per subtree — the expensive
    # pair computation would run 3-4× inside the first checkpoint
    edges.count()
    # seed labels with round 1 fused in: label₀ = min(node, min neighbor) —
    # the same groupBy that would otherwise only enumerate distinct nodes
    # does the first propagation step for free
    labels = (
        edges.groupBy("node")
        .agg(F.min("nbr").alias("mn"))
        .select("node", F.least("node", "mn").alias("label"))
    )

    # Deterministic block reclamation for the iterative checkpoints: each
    # round's eager localCheckpoint persists a new RDD that SUPERSEDES the
    # previous round's — but nothing unpersists the old one until driver GC
    # happens to drop the py4j reference, so a long session accumulates
    # dead blocks (and GC pauses get charged to whatever runs next).  Track
    # the persistent-RDD ids each checkpoint creates and free the
    # superseded generation explicitly.  (The id-diff is session-global:
    # this operator assumes no concurrent thread persists RDDs mid-call —
    # true for the engine's one-query-at-a-time execution.)
    jsc = edges.sparkSession.sparkContext._jsc

    def _persistent_ids() -> set[int]:
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    def _free(ids: set[int]) -> None:
        rdds = jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = rdds.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)

    prev_ckpt_ids: set[int] = set()
    # every checkpoint generation currently persisted — the failure path
    # frees ALL of these (covering a crash between creating a checkpoint
    # and retiring its predecessor, when two generations are live at once)
    live_ckpt_ids: set[int] = set()
    converged = False
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(labels.withColumnRenamed("node", "nbr"), "nbr")
                .groupBy("node")
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label")).alias("__changed"),
            )
            # each iteration references `labels` twice → without lineage
            # truncation the logical plan doubles per round (2^k nodes);
            # an eager localCheckpoint keeps every iteration O(1) plan size —
            # the standard shape for iterative DataFrame algorithms
            before = _persistent_ids()
            new_labels = new_labels.localCheckpoint(eager=True)
            new_ids = _persistent_ids() - before
            live_ckpt_ids = prev_ckpt_ids | new_ids
            changed = new_labels.filter("__changed").count()
            labels = new_labels.drop("__changed")
            # the previous round's checkpoint is now unreachable — free it
            _free(prev_ckpt_ids)
            prev_ckpt_ids = new_ids
            live_ckpt_ids = new_ids
            if changed == 0:  # fixpoint: labels stable ⇒ components final
                converged = True
                break
    finally:
        # on ANY exit the edge cache is done; on a FAILED exit every live
        # checkpoint generation is also unreachable — reclaim them (the
        # success path must keep its final checkpoint alive: the returned
        # frame reads it)
        edges.unpersist()
        if not converged:
            _free(live_ckpt_ids)
    if not converged:
        # budget exhausted without a fixpoint: silent partial components
        # would split real duplicate groups — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations (component diameter exceeds "
            "the budget)"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster summary per component: canonical (min) doc id and member
    count.  Docs not in any pair are singletons and excluded (they keep
    themselves)."""
    cc = connected_components(pairs)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"), F.min("node").alias("canonical_doc"))
        .select(
            F.col("component").cast("bigint").alias("cluster_id"),
            F.col("canonical_doc").cast("bigint").alias("canonical_doc"),
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )
