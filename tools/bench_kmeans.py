"""Measure what corpus-trained centroids buy an IVF index over the
lowest-id data-row convention.

Two centroid dictionaries over the same corpus — ``lowid`` (the k
lowest-id data rows, the deterministic convention the oracles restate)
and ``kmeans`` (``kmeans_fit`` Lloyd training, fast means) — compared
on the two things that matter for a partitioned 100 TB index:

- **Cell balance**: the population of the fattest cell bounds both the
  worst-case file size of the partitioned layout and the worst-case
  per-probe scoring cost; max/mean is the imbalance factor. Empty
  cells are wasted dictionary entries (a probe that can never match).
- **Recall@10**: fraction of the exact brute-force top-10 recovered
  when scoring is restricted to the query's ``nprobe`` nearest cells.

Corpora are the fidelity harness's generators (hash-uniform worst case
and the 80-center clustered mixture, dim 64) so numbers line up with
the BENCH_NOTES fidelity tables. Results are committed in BENCH_NOTES
(«r8: trained centroids vs lowid data rows»).

Usage: python tools/bench_kmeans.py [n_vectors] [n_centroids]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_twolevel import _corpus  # noqa: E402  (same synthetic corpora)


def _recall_at10(spark, vecs, cents, k: int, nprobe: int, n_queries: int) -> float:
    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        ivf_assign, l2sq,
    )

    assign = ivf_assign(vecs, cents, n_centroids=k)
    corpus = vecs.join(assign, "vec_id")
    queries = vecs.filter(F.col("vec_id") % 401 == 0).limit(n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))

    # exact brute-force top-10 (excluding the query row itself)
    scored = (corpus.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("qid"))
              .select("qid", "vec_id", "centroid_id",
                      F.round(l2sq(F.col("embedding"), F.col("qv")), 9).alias("d")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("qid").orderBy("d", "vec_id")
    truth = scored.withColumn("rk", F.row_number().over(w)).filter("rk <= 10")

    # the query's nprobe nearest cells, then top-10 within those cells
    qcells = (queries.crossJoin(F.broadcast(cents))
              .select("qid", "centroid_id",
                      F.round(l2sq(F.col("embedding"), F.col("qv")), 9).alias("d"))
              .withColumn("rk", F.row_number().over(
                  Window.partitionBy("qid").orderBy("d", "centroid_id")))
              .filter(F.col("rk") <= nprobe).select("qid", "centroid_id"))
    probed = (scored.join(qcells, ["qid", "centroid_id"])
              .withColumn("rk", F.row_number().over(w)).filter("rk <= 10"))

    hits = (truth.select("qid", "vec_id")
            .join(probed.select("qid", "vec_id"), ["qid", "vec_id"]).count())
    total = truth.count()
    return hits / total if total else 0.0


def main() -> None:
    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        ivf_assign, kmeans_fit,
    )
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim, n_queries = 64, 50

    spark = get_spark("sds-kmeans-bench")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"n={n} k={k} dim={dim}; imbalance = max cell / mean cell; "
          f"recall@10 over {n_queries} queries")
    print(f"{'corpus':10s} {'cents':8s} {'train_s':>7s} {'imbal':>6s} "
          f"{'empty':>5s} " + " ".join(f"r@10 p={p}" for p in (1, 2, 4)))
    for kind in ("uniform", "clustered"):
        vecs = _corpus(spark, kind, n, dim).cache()
        vecs.count()
        lowid = vecs.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("centroid_id"), "embedding")
        t0 = time.time()
        trained = kmeans_fit(vecs, k=k, iters=5, mean_mode="fast")
        train_s = time.time() - t0
        for label, cents, ts in (("lowid", lowid, 0.0),
                                 ("kmeans", trained, train_s)):
            pops = (ivf_assign(vecs, cents, n_centroids=k)
                    .groupBy("centroid_id").count().collect())
            sizes = [r["count"] for r in pops]
            imbal = max(sizes) / (n / k)
            empty = k - len(sizes)
            recalls = [_recall_at10(spark, vecs, cents, k, p, n_queries)
                       for p in (1, 2, 4)]
            print(f"{kind:10s} {label:8s} {ts:7.1f} {imbal:6.2f} "
                  f"{empty:5d} " + " ".join(f"{r:8.3f}" for r in recalls))
        vecs.unpersist()


if __name__ == "__main__":
    main()
