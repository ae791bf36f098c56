"""Soak-scale datapoint for the DISTRIBUTED connected-components regime
(VERDICT r15 #8).

Above ``spark.sds.cc.local_max_edges`` (5M symmetrized edges) the
operator switches from driver-local union-find to the distributed
min-label + pointer-jumping loop (operators/graph.py). The regime has
correctness tests but until r16 no measured at-threshold datapoint —
this tool generates a ≥5M-edge synthetic with a KNOWN component
structure and long chains (the worst case for label propagation: rounds
needed ~ log2(diameter) with pointer jumping), runs both regimes where
feasible, and reports edges / rounds-to-converge / wall seconds.

Graph: ``n_chains`` disjoint chains of length ``chain_len`` (diameter =
chain_len) plus ``n_rand`` random intra-block edges for realistic
degree skew. Ground truth: each chain is one component labeled by its
minimum node id — verified, not assumed.

Usage: python tools/bench_cc_scale.py [n_chains] [chain_len] [n_rand]
Defaults give 6.0M directed edges (≥5M after symmetrize+dedup: 12M).
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_rand = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.graph import connected_components
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="sds-bench-cc")

    # chain c occupies ids [c*chain_len, (c+1)*chain_len); chain edges
    # i -> i+1 within each chain
    chain = (spark.range(n_chains * chain_len)
             .select(F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
             .filter((F.col("d2") % chain_len) != 0))
    # deterministic pseudo-random extra edges WITHIN a chain (keeps the
    # ground truth trivially checkable while adding degree skew)
    rand = (spark.range(n_rand)
            .select((F.xxhash64(F.col("id")) % (n_chains * chain_len))
                    .alias("_a"),
                    (F.xxhash64(F.col("id") + 7_777_777)
                     % chain_len).alias("_off"))
            .select(F.abs(F.col("_a")).alias("a"),
                    F.abs(F.col("_off")).alias("off"))
            .select(F.col("a").alias("d1"),
                    ((F.col("a") - F.col("a") % chain_len)
                     + F.col("off")).alias("d2"))
            .filter(F.col("d1") != F.col("d2")))
    pairs = chain.unionByName(rand).localCheckpoint()
    n_directed = pairs.count()

    for regime, lme in (("distributed", 0), ):
        st: dict = {}
        t0 = time.time()
        labels = connected_components(pairs, src="d1", dst="d2",
                                      max_iter=40, local_max_edges=lme,
                                      stats=st)
        agg = labels.agg(
            F.count("*").alias("nodes"),
            F.countDistinct("comp").alias("components"),
            # ground truth: comp must be the chain's min id
            F.sum((F.col("comp") != (F.col("node") - F.col("node")
                                     % chain_len)).cast("long"))
            .alias("mislabeled")).head()
        wall = time.time() - t0
        rec = {
            "regime": regime,
            "directed_edges": n_directed,
            "chains": n_chains, "chain_len": chain_len,
            "nodes": agg["nodes"], "components": agg["components"],
            "mislabeled": agg["mislabeled"],
            "symmetrized_edges": st.get("edges"),
            "steps_to_converge": st.get("steps"),
            "wall_sec": round(wall, 1),
        }
        print(json.dumps(rec), flush=True)
        assert agg["mislabeled"] == 0, "distributed CC mislabeled nodes"
        assert agg["components"] == n_chains


if __name__ == "__main__":
    main()
