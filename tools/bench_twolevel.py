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
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import ivf_assign
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

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
