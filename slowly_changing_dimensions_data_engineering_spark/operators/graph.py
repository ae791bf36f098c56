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

Two regimes, selected by the edge count (the same dictionary-vs-corpus
split ``ivf_assign`` draws):

- **edge set fits the driver** (≤ ``spark.sds.cc.local_max_edges``,
  default 5M edges = ~80 MB of long pairs): collect the deduplicated
  edges and run union-find with path compression + union-by-min-root
  locally, returning the labels as an Arrow-built frame. The pair graph
  is the OUTPUT of near-dup detection — it is corpus-SMALL (dup pairs,
  not documents), and a bounded union-find is milliseconds where the
  distributed loop pays seconds of fixed per-iteration job overhead for
  chain-shaped graphs (measured: 2,110-edge diameter-~18 profile-space
  graph, 18.7s iterative vs 0.3s local; identical labels). This is the
  same bounded-model-on-the-driver class as the k-means centroid
  collect — the threshold, not hope, is what keeps it safe.
- **larger graphs**: iterative min-label propagation over the
  symmetrized edge set — each round, every node takes the minimum
  component id among itself and its neighbors, plus pointer jumping.
  Spark-first shape per round: ONE shuffle join (edges ⋈ labels on the
  neighbor id) + ONE groupBy-min on uniformly distributed node ids, so
  no skew and no driver materialization; the per-round convergence
  probe is a COUNT aggregate (a scalar, not a collect). Rounds needed =
  O(log diameter) with the jump, and the ``max_iter`` guard fails
  loudly rather than looping forever. For adversarial million-hop
  chains the alternating large-star/small-star formulation (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14) drops
  rounds to O(log² n) at the cost of emitting reshaped edges each
  round — the propagation loop below is the right trade for dedup-
  shaped graphs.

Each round ``stabilize``s the new label frame: iterative
self-referential plans otherwise grow lineage exponentially (analysis
time, not data) and lose AQE stats. Checkpointing labels — the SMALL
(node, comp) frame, 2 longs/row — is cheap; edges are checkpointed once
up front for the same reason. The checkpoint strategy follows the
``spark.sds.stabilize.mode`` session conf (``session.stabilize``):
executor-local blocks by default; ``"reliable"`` for cluster runs where
a lost executor must not strand the truncated-lineage label frame.

No reference parity: the reference (SCD-Configuration Setup.sql /
SCD-Automation.sql) has no graph operators; this is north-star LLM-
pipeline surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..session import stabilize


#: Conf key: edge-count ceiling for the driver-local union-find path.
#: 5M symmetrized edges = ~80 MB of long pairs — well under the
#: session's 4g maxResultSize, and the label result (≤ 2·edges nodes)
#: rebuilds through Arrow in well under a second.
LOCAL_MAX_EDGES_CONF = "spark.sds.cc.local_max_edges"
_LOCAL_MAX_EDGES_DEFAULT = 5_000_000


def _union_find_labels(rows) -> list[tuple[int, int]]:
    """Union-find with path halving + union-by-min-root over (u, v)
    pairs. Because every union links the LARGER root under the smaller,
    the final root of each tree is the component's minimum node id —
    exactly the iterative path's fixpoint, so the two regimes are
    bit-interchangeable."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]  # path halving
            r = parent[r]
        # compress the queried node too
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return sorted((n, find(n)) for n in parent)


def connected_components(pairs: DataFrame, src: str = "d1", dst: str = "d2",
                         max_iter: int = 30,
                         steps_per_action: int = 3,
                         local_max_edges: int | None = None,
                         stats: dict | None = None) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; ``comp`` is
    the minimum node id reachable through the pair graph (the canonical
    cluster id — stable across runs and engines).

    ``pairs`` is treated as undirected; duplicate and self edges are
    tolerated. Raises RuntimeError if labels haven't converged after
    ``max_iter`` propagation steps (steps needed = max cluster diameter).

    ``local_max_edges`` (default: the ``spark.sds.cc.local_max_edges``
    conf, 5M) selects the driver-local union-find for graphs at or
    under that many symmetrized edges; 0 forces the distributed loop.
    Both regimes produce identical labels (pinned by test).

    ``stats``, if passed, receives {"edges": symmetrized edge count,
    "regime": local|distributed, "steps": propagation steps run} —
    measurement plumbing for tools/bench_cc_scale.py (the distributed
    regime's at-scale evidence), zero cost when omitted.

    ``steps_per_action`` chains that many propagation steps LAZILY into
    one Spark job before the convergence probe: on tiny label frames the
    per-job fixed overhead (stage scheduling), not data volume, is the
    cost, so fewer-but-deeper jobs win. Convergence needs only the LAST
    step's change flag — min-propagation is monotone, so one no-change
    step proves the fixpoint regardless of earlier steps in the batch.
    Measured (3,665-edge diameter-7 embedding pair graph, sf0.1,
    local[32]): 1 step/action 8.3s → flag-based probe 5.1s →
    3 steps/action 3.8s, identical components.
    """
    e = pairs.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v")).filter("u IS NOT NULL AND v IS NOT NULL")
    edges = stabilize(
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter("u != v").distinct())
    spark = pairs.sparkSession
    n_edges = edges.count()
    if local_max_edges is None:
        local_max_edges = int(spark.conf.get(
            LOCAL_MAX_EDGES_CONF, str(_LOCAL_MAX_EDGES_DEFAULT)))
    if stats is not None:
        stats["edges"] = n_edges
        stats["regime"] = ("local" if n_edges <= local_max_edges
                           else "distributed")
        stats["steps"] = 0
    if n_edges <= local_max_edges:
        # Driver-local regime: the collect is BOUNDED by the threshold
        # just checked. Arrow both ways (toPandas / createDataFrame on
        # a pandas frame) keeps the transfer columnar.
        import pandas as pd

        pdf = edges.filter("u < v").toPandas()  # one direction suffices
        labels = _union_find_labels(
            zip(pdf["u"].tolist(), pdf["v"].tolist()))
        out = pd.DataFrame(labels, columns=["node", "comp"])
        return spark.createDataFrame(out, schema="node long, comp long")
    # Distributed regime: ≥ millions of edges, so the session's
    # shuffle-partition count is the right parallelism — no conf
    # scoping (an earlier revision lowered the SESSION conf for the
    # loop's benefit, which leaked to concurrent queries; small graphs
    # where empty-task overhead dominated now take the local path).
    labels = edges.select(F.col("u").alias("node")).distinct() \
                  .select("node", F.col("node").alias("comp"))

    def step(lab: DataFrame) -> DataFrame:
        nbr_min = (
            edges.join(lab.select(F.col("node").alias("v"),
                                  F.col("comp").alias("vcomp")), "v")
            .groupBy("u").agg(F.min("vcomp").alias("nbr_comp"))
            .select(F.col("u").alias("node"), "nbr_comp")
        )
        # least() skips nulls, so nodes whose neighbors carry no smaller
        # label keep their component unchanged. The propagated frame is
        # stabilized because the jump below consumes it TWICE (as rows
        # and as the parent map): an RDD barrier makes both references
        # share one evaluation, keeping a lazily chained multi-step
        # batch LINEAR — an unbarriered double reference re-evaluates
        # the whole previous chain per consumer, 3^steps blow-up.
        prop = stabilize(
            lab.join(nbr_min, "node", "left")
            .select("node", F.col("comp").alias("_old"),
                    F.least("comp", "nbr_comp").alias("comp")))
        # Pointer jumping (path halving): comp <- label(comp). One extra
        # join of the SMALL label frame per step, and the propagation
        # distance SQUARES each round, so chain-shaped clusters converge
        # in O(log diameter) instead of O(diameter) steps — profile-
        # space near-dup graphs (multimodal_near_dup_summary) form long
        # gradual chains that overran the plain-propagation cap at
        # sf0.1. Correctness: every comp value is the id of a node
        # reachable from `node`, and label(comp) is a min over nodes
        # reachable from comp, so the jump never leaves the component
        # and the monotone-min fixpoint (every node at its cluster
        # minimum, which labels itself) is unchanged. _ch compares
        # against the pre-step label so a jump-only improvement still
        # defers the convergence verdict.
        parent = prop.select(F.col("node").alias("comp"),
                             F.col("comp").alias("_pc"))
        return (prop.join(parent, "comp", "left")
                .select("node",
                        F.least("comp", F.coalesce("_pc", "comp"))
                        .alias("comp"),
                        (F.least("comp", F.coalesce("_pc", "comp"))
                         < F.col("_old")).alias("_ch")))

    steps_done = 0
    while steps_done < max_iter:
        cur = labels
        for _ in range(min(steps_per_action, max_iter - steps_done)):
            cur = step(cur.select("node", "comp"))
            steps_done += 1
        new_labels = stabilize(cur)
        changed = new_labels.filter("_ch").count()
        labels = new_labels.select("node", "comp")
        if stats is not None:
            stats["steps"] = steps_done
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} steps — "
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
