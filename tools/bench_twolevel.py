"""Repeatable measurement of the two-level IVF assignment regime.

The flat path scores every vector against every centroid (a broadcast
of k centroid rows — fine to the documented FLAT_MAX_CENTROIDS=512);
above that the two-level path ranks ~√k coarse seeds per vector in
codegen and scores only the probed cells' fine centroids. This script
re-runs the design-regime comparison from BENCH_NOTES (synthetic
n=200k / dim=8 / k=800) so the curve can be reproduced after any
session-conf or assignment-path change, and prints an agreement rate
(two-level assignment == flat argmin) alongside the timings.

Usage: python tools/bench_twolevel.py [n_vectors] [n_centroids]
       python tools/bench_twolevel.py --fidelity [n_vectors] [n_centroids]

``--fidelity`` runs the high-dimension agreement matrix instead of the
timing comparison: dims {64, 256, 768} × two corpora (hash-uniform —
the distance-concentration worst case — and an 80-center clustered
mixture, the realistic embedding shape) × seed modes {lowid, kmeans} ×
probes {4, 8, 12, 16} of the ⌈√k⌉=25 coarse cells, each measured as
agreement of the ACTUAL Spark two-level assignment against the exact
flat argmin on the same data. This is the evidence table quoted in
BENCH_NOTES («two-level fidelity at realistic dimensions»); re-run it
after any change to operators/similarity.py. Both generators are pure
column expressions (F.hash-based), so every run sees identical data.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hash_unit(expr):
    """Deterministic pseudo-uniform double in [-1, 1] from a long
    expression — same construction the sf1 soak generator uses for
    replica embeddings."""
    from pyspark.sql import functions as F
    return ((F.pmod(F.hash(expr.cast("long")), F.lit(2001)) - 1000)
            / 1000.0).cast("double")


def _corpus(spark, kind: str, n: int, dim: int):
    """(vectors, centroids-as-corpus-sample) for a fidelity config.
    ``uniform``: isotropic hash-uniform — the worst case for a coarse
    quantizer (pairwise distances concentrate as dim grows, so the
    vector→seed ranking carries little signal). ``clustered``: an
    80-center mixture with ±0.15 uniform noise — the shape real
    embedding models emit, where cells align with structure."""
    from pyspark.sql import functions as F
    base = spark.range(n)
    j = F.sequence(F.lit(1), F.lit(dim))
    if kind == "uniform":
        vec = F.transform(j, lambda d: _hash_unit(F.col("id") * 1009 + d * 9176))
    else:
        lab = F.pmod(F.hash((F.col("id") * 31 + 7).cast("long")), F.lit(80))
        vec = F.transform(
            j, lambda d: _hash_unit(lab * 7919 + d * 104729)
            + 0.15 * _hash_unit(F.col("id") * 7907 + d * 31))
    return base.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def fidelity(n: int, k: int) -> None:
    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        _ivf_assign_flat, _ivf_assign_two_level,
    )
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    spark = get_spark("sds-twolevel-fidelity")
    spark.sparkContext.setLogLevel("ERROR")
    stride = max(1, n // k)
    print(f"n={n} k={k} m=ceil(sqrt(k)) probes of 25 cells; agreement "
          "= fraction of vectors whose two-level cell == exact flat argmin")
    for kind in ("uniform", "clustered"):
        for dim in (64, 256, 768):
            vecs = _corpus(spark, kind, n, dim)
            cents = (_corpus(spark, kind, n, dim)
                     .filter((F.col("vec_id") % stride == 0)
                             & (F.col("vec_id") < stride * k))
                     .select((F.col("vec_id") / stride).cast("long")
                             .alias("centroid_id"), "embedding"))
            flat = _ivf_assign_flat(vecs, cents, "vec_id", "embedding",
                                    "centroid_id") \
                .withColumnRenamed("centroid_id", "_flat")
            flat = flat.persist()
            flat.count()
            for mode in ("lowid", "kmeans"):
                row = []
                for p in (4, 8, 12, 16):
                    two = _ivf_assign_two_level(
                        vecs, cents, k, "vec_id", "embedding", "centroid_id",
                        coarse_probe=p, seed_mode=mode)
                    agree = (flat.join(two, "vec_id")
                             .agg(F.avg((F.col("_flat") == F.col("centroid_id"))
                                        .cast("double"))).head()[0])
                    row.append(f"p{p}={agree:.3f}")
                print(f"{kind:9s} dim={dim:<4d} seeds={mode:6s} "
                      + "  ".join(row), flush=True)
            flat.unpersist()


def main() -> None:
    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import ivf_assign
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--fidelity"]
    if "--fidelity" in sys.argv:
        fidelity(int(args[0]) if args else 2500,
                 int(args[1]) if len(args) > 1 else 600)
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    spark = get_spark("sds-bench-twolevel")

    dim = 8
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: ((F.pmod(F.col("id") * 31 + j * 17, F.lit(1000)) - 500)
                   / 500.0).cast("double"))
    vectors = spark.range(n).select(F.col("id").alias("vec_id"),
                                    vec.alias("embedding"))
    cvec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: ((F.pmod(F.col("id") * 73 + j * 29, F.lit(1000)) - 500)
                   / 500.0).cast("double"))
    cents = spark.range(k).select(F.col("id").alias("centroid_id"),
                                  cvec.alias("embedding"))
    vectors.count(), cents.count()  # materialize inputs outside timing

    def run(tag: str, **kw) -> "DataFrame":
        t0 = time.time()
        a = ivf_assign(vectors, cents, **kw)
        a.write.mode("overwrite").format("noop").save()
        print(f"{tag}: {time.time() - t0:.2f}s", flush=True)
        # UNTIMED persist for the agreement join below — noop writes
        # don't retain results, so without this the join would silently
        # re-run both assignment pipelines inside the agreement check.
        a = a.persist()
        a.count()
        return a

    flat = run("flat (k scored per vector)", flat_max_centroids=10**9)
    two = run("two-level (coarse_probe=4)", flat_max_centroids=0)
    agree = (flat.withColumnRenamed("centroid_id", "a")
             .join(two.withColumnRenamed("centroid_id", "b"), "vec_id")
             .agg(F.avg((F.col("a") == F.col("b")).cast("double")))
             .head()[0])
    print(f"agreement two-level vs flat argmin: {agree:.4f}  (n={n}, k={k})")


if __name__ == "__main__":
    main()
