"""Connected components over near-duplicate pair sets — the clustering
step between pair generation (MinHash/SimHash/Jaccard, operators/dedup.py)
and the dedup decision.

Pairwise keep-min (``dedup.remove_near_dups``) guarantees one survivor
per cluster but assigns no cluster identity: it cannot answer "which
documents are duplicates OF EACH OTHER" when similarity is transitive
only through intermediates (a~b, b~c, a≁c). Connected components gives
every document its canonical cluster id (the minimum reachable doc id),
which is what corpus curation pipelines log, sample from, and use for
per-cluster quality voting.

Algorithm: iterative min-label propagation over the symmetrized edge
set — each round, every node takes the minimum component id among
itself and its neighbors. Spark-first shape per round: ONE shuffle join
(edges ⋈ labels on the neighbor id) + ONE groupBy-min on uniformly
distributed node ids, so no skew and no driver materialization; the
per-round convergence probe is a COUNT aggregate (a scalar, not a
collect). Rounds needed = the largest cluster's DIAMETER, which for
near-dup clusters (dense cliques around a template) is almost always
1-3; the ``max_iter`` guard fails loudly rather than looping forever.
For adversarial million-hop chains the alternating large-star/small-star
formulation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) drops rounds to O(log² n) at the cost of emitting
reshaped edges each round — the propagation loop below is the right
trade for dedup-shaped graphs.

Each round ``localCheckpoint``s the new label frame: iterative
self-referential plans otherwise grow lineage exponentially (analysis
time, not data) and lose AQE stats. Checkpointing labels — the SMALL
(node, comp) frame, 2 longs/row — is cheap; edges are checkpointed once
up front for the same reason.

No reference parity: the reference (SCD-Configuration Setup.sql /
SCD-Automation.sql) has no graph operators; this is north-star LLM-
pipeline surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, src: str = "d1", dst: str = "d2",
                         max_iter: int = 30) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; ``comp`` is
    the minimum node id reachable through the pair graph (the canonical
    cluster id — stable across runs and engines).

    ``pairs`` is treated as undirected; duplicate and self edges are
    tolerated. Raises RuntimeError if labels haven't converged after
    ``max_iter`` rounds (rounds needed = max cluster diameter).
    """
    e = pairs.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v")).filter("u IS NOT NULL AND v IS NOT NULL")
    edges = (e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
             .filter("u != v").distinct().localCheckpoint(eager=False))
    labels = edges.select(F.col("u").alias("node")).distinct() \
                  .select("node", F.col("node").alias("comp"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.select(F.col("node").alias("v"),
                                     F.col("comp").alias("vcomp")), "v")
            .groupBy("u").agg(F.min("vcomp").alias("nbr_comp"))
            .select(F.col("u").alias("node"), "nbr_comp")
        )
        # least() skips nulls, so nodes whose neighbors carry no smaller
        # label keep their component unchanged.
        new_labels = (labels.join(nbr_min, "node", "left")
                      .select("node", F.least("comp", "nbr_comp").alias("comp"))
                      .localCheckpoint(eager=False))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "cluster diameter exceeds max_iter; raise max_iter or switch to "
        "a large-star/small-star formulation for chain-shaped graphs")


def dedup_clusters(pairs: DataFrame, src: str = "d1", dst: str = "d2",
                   max_iter: int = 30) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every document in a
    near-dup pair: transitive-closure cluster identity plus the cluster's
    member count (window count over the component — one extra shuffle on
    the component id)."""
    labels = connected_components(pairs, src, dst, max_iter)
    from pyspark.sql.window import Window
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.count(F.lit(1)).over(Window.partitionBy("comp")).alias("cluster_size"),
    )


def keep_cluster_canonical(docs: DataFrame, pairs: DataFrame,
                           id_col: str = "doc_id", src: str = "d1",
                           dst: str = "d2", max_iter: int = 30) -> DataFrame:
    """Dedup decision via connected components: keep exactly ONE document
    per duplicate cluster (the minimum id — each cluster's canonical
    member) plus every document in no pair at all. Anti join on the
    non-canonical node set; equivalent to ``dedup.remove_near_dups`` when
    similarity is transitive, and strictly correct when it is not."""
    labels = connected_components(pairs, src, dst, max_iter)
    losers = labels.filter(F.col("node") != F.col("comp")) \
                   .select(F.col("node").alias(id_col))
    return docs.join(losers, id_col, "left_anti")
