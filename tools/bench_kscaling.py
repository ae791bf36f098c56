"""Measure the centroid-count rule's asymptotics (VERDICT r13 #7).

The index family sizes its centroid set as ``k = n / 250`` (constant
cell POPULATION — the property that keeps every cell-blocked cost
linear in corpus size). The two-level assignment then evaluates
``n * (ceil(sqrt(k)) + coarse_probe * sqrt(k))`` centroid distances,
i.e. O(n * sqrt(k)) ~ O(n^1.5) when k grows linearly with n. The
alternative for DERIVED indexes (chunk-RAG) is ``k ~ sqrt(n)``:
assignment drops to O(n^1.25) but cell population grows as sqrt(n),
so every probed-cell scan (per-QUERY cost) grows as sqrt(n) instead
of staying constant.

This script makes that trade measurable instead of rhetorical: it
times the ACTUAL two-level assignment (operators/similarity.ivf_assign,
flat_max_centroids=0) on the deterministic bench_twolevel corpus at an
n-ladder under both rules and prints the fitted growth exponent
log(t2/t1)/log(n2/n1) per rule, plus the implied per-query probed-cell
row count. Run on an idle box (it shares the bench.py measurement
discipline: noop sink, inputs materialized outside the timing).

Usage: python tools/bench_kscaling.py [n1,n2,...]   (default ladder
       250k, 1M, 4M — ~3 min total at local[32])
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import ivf_assign
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    ladder = ([int(x) for x in sys.argv[1].split(",")]
              if len(sys.argv) > 1 else [250_000, 1_000_000, 4_000_000])
    spark = get_spark("sds-bench-kscaling")
    spark.sparkContext.setLogLevel("ERROR")
    dim = 8

    def frame(n: int, mult: int, add: int, name: str):
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: ((F.pmod(F.col("id") * mult + j * add, F.lit(1000))
                        - 500) / 500.0).cast("double"))
        return spark.range(n).select(F.col("id").alias(name),
                                     vec.alias("embedding"))

    rules = {"k=n/250": lambda n: max(8, n // 250),
             "k=sqrt(n)": lambda n: max(8, int(math.isqrt(n)))}
    results: dict[str, list[tuple[int, int, float]]] = {r: [] for r in rules}
    for n in ladder:
        vectors = frame(n, 31, 17, "vec_id").repartition(32)
        vectors = vectors.persist()
        vectors.count()  # materialize outside the timing
        for rule, kf in rules.items():
            k = kf(n)
            cents = frame(k, 73, 29, "centroid_id")
            cents.count()
            t0 = time.time()
            (ivf_assign(vectors, cents, flat_max_centroids=0)
             .write.mode("overwrite").format("noop").save())
            dt = time.time() - t0
            results[rule].append((n, k, dt))
            print(f"{rule:10s} n={n:>9,d} k={k:>6,d} "
                  f"cell_pop={n // k:>5,d} assign={dt:7.2f}s", flush=True)
        vectors.unpersist()

    print("\nfitted growth exponents (t ~ n^e, consecutive ladder pairs):")
    for rule, rows in results.items():
        exps = [math.log(b[2] / a[2]) / math.log(b[0] / a[0])
                for a, b in zip(rows, rows[1:])]
        print(f"  {rule:10s} e = "
              + ", ".join(f"{e:.2f}" for e in exps)
              + f"   (theory: {'1.5' if '250' in rule else '1.25'})")
    print("\nper-query probed-cell rows (nprobe=4): "
          + "; ".join(f"{rule}: {4 * rows[-1][0] // rows[-1][1]:,d}"
                      for rule, rows in results.items())
          + f"  at n={ladder[-1]:,d}")


if __name__ == "__main__":
    main()
