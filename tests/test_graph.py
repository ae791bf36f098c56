"""Unit tests for operators/graph.py — connected components over
near-dup pairs and the cluster-canonical dedup decision. Complements the
DuckDB recursive-CTE oracle check on the dedup_clusters_cc query."""

from __future__ import annotations

import pytest

from slowly_changing_dimensions_data_engineering_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    keep_cluster_canonical,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["d1", "d2"])


# Both regimes of connected_components must agree everywhere: the
# driver-local union-find (default for graphs under the edge ceiling)
# and the distributed min-label loop (forced via local_max_edges=0).
REGIMES = pytest.mark.parametrize("local_max", [None, 0],
                                  ids=["local-uf", "distributed"])


@REGIMES
def test_transitive_chain_clusters_together(spark, local_max):
    # a~b, b~c but never a~c: pairwise logic can't name the cluster;
    # components must put all three under min id 1.
    labels = {r["node"]: r["comp"] for r in connected_components(
        _pairs(spark, [(1, 2), (2, 3), (7, 8)]),
        local_max_edges=local_max).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


@REGIMES
def test_direction_and_duplicates_ignored(spark, local_max):
    labels = {r["node"]: r["comp"] for r in connected_components(
        _pairs(spark, [(5, 4), (4, 5), (5, 4), (4, 6)]),
        local_max_edges=local_max).collect()}
    assert labels == {4: 4, 5: 4, 6: 4}


@REGIMES
def test_long_chain_converges_past_one_round(spark, local_max):
    # A 12-node path has diameter 11 — label propagation needs several
    # rounds; the min label must still flood the whole chain.
    chain = [(i, i + 1) for i in range(11)]
    labels = {r["node"]: r["comp"] for r in connected_components(
        _pairs(spark, chain), local_max_edges=local_max).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 12


def test_max_iter_guard_raises(spark):
    # the guard belongs to the distributed loop; the union-find path
    # has no iteration count to cap
    chain = [(i, i + 1) for i in range(11)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, chain), max_iter=1,
                             local_max_edges=0)


def test_cluster_sizes(spark):
    rows = dedup_clusters(_pairs(spark, [(1, 2), (2, 3), (7, 8)])).collect()
    by_doc = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in rows}
    assert by_doc == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


@REGIMES
def test_empty_pairs_yield_empty_labels(spark, local_max):
    empty = spark.createDataFrame([], "d1 long, d2 long")
    assert connected_components(empty, local_max_edges=local_max).count() == 0
    assert dedup_clusters(empty).count() == 0


def test_keep_cluster_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"])
    # clusters {0,1,2} and {3,4}; 5 untouched → keep 0, 3, 5.
    kept = keep_cluster_canonical(
        docs, _pairs(spark, [(0, 1), (1, 2), (3, 4)]))
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 3, 5]


def test_random_graphs_match_union_find(spark):
    """Property check: on random graphs, the distributed min-label
    propagation must agree with a driver-side union-find."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(35)]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for a, b in edges:
            for x in (a, b):
                # canonical id = min member of the component
                expected[x] = min(m for m in range(n)
                                  if find(m) == find(x))

        got = {r["node"]: r["comp"] for r in connected_components(
            _pairs(spark, edges), local_max_edges=0).collect()}
        assert got == expected, f"trial {trial}"
        # and the default (driver-local union-find) regime agrees
        got_local = {r["node"]: r["comp"] for r in connected_components(
            _pairs(spark, edges)).collect()}
        assert got_local == expected, f"trial {trial} (local regime)"
