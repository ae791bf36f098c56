"""Build the sf1 soak dataset: a deterministic 10x scale-up of
/root/testdata/sf0.1 written to <repo>/_soak/sf1/ (gitignored).

The driver testdata tree tops out at sf0.1 (TESTDATA.md), so the
sf0.1->sf1 scaling soak the r4 VERDICT asks for needs a synthetic sf1.
This is a SOAK input (timing ratios), not an oracle input — the driver's
correctness gate stays on its own sf0.01 tree.

Replication is 10 key-shifted replicas (replica 0 == the original
rows bit-for-bit), built so per-replica STATISTICS match sf0.1 — i.e.
the scaled corpus behaves like 10x more data of the same distribution,
not like 10 copies of the same data:

- **Fact/dim keys** shift by ``replica * (max_key + 1)`` consistently
  across tables, so FK joins (orders->customer, lineitem->part/supplier,
  events->user) keep exactly the sf0.1 per-key fan-out. region/nation
  stay fixed (TPC-H dimension tables don't scale with sf).
- **documents.text** of replicas >0 gets every WORD suffixed with a
  replica tag: a bijection on the shingle alphabet, so WITHIN a replica
  every exact/near-dup relationship (and every Jaccard score) is
  preserved exactly, while ACROSS replicas shingle sets are disjoint —
  the dup-rate stays sf0.1's instead of every doc gaining 9 clones
  (which would quadratically inflate every pair join and measure an
  adversarial corpus, not scale).
- **embeddings** of replicas >0 are regenerated from a hash of
  (vec_id, dim): deterministic, uniform in [-1, 1] like the isotropic
  originals, and independent across replicas — again preserving the
  near-dup density instead of multiplying it.

Run:  python tools/make_soak_sf1.py   (~1-2 min at local[32])
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from slowly_changing_dimensions_data_engineering_spark import schemas  # noqa: E402
from slowly_changing_dimensions_data_engineering_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
_SOAK_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_soak")
DST = os.path.join(_SOAK_ROOT, "sf1")
N_REPLICAS = 10
# Optional CLI: `python tools/make_soak_sf1.py 30 sf3` builds a 30-replica
# tree at _soak/sf3 — same construction, third point for a scaling curve.
if len(sys.argv) > 1:
    N_REPLICAS = int(sys.argv[1])
    DST = os.path.join(_SOAK_ROOT, sys.argv[2] if len(sys.argv) > 2
                       else f"x{N_REPLICAS}")


def _stride(df, col):
    return df.agg(F.max(col)).head()[0] + 1


def main():
    spark = get_spark("sds-make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    t = schemas.load_testdata(spark, SRC)
    os.makedirs(DST, exist_ok=True)

    strides = {
        "c_custkey": _stride(t["customer"], "c_custkey"),
        "s_suppkey": _stride(t["supplier"], "s_suppkey"),
        "p_partkey": _stride(t["part"], "p_partkey"),
        "o_orderkey": _stride(t["orders"], "o_orderkey"),
        "event_id": _stride(t["events"], "event_id"),
        "user_id": _stride(t["events"], "user_id"),
        "doc_id": _stride(t["documents"], "doc_id"),
        "vec_id": _stride(t["embeddings"], "vec_id"),
    }
    # key column -> stride name, per table
    shifted = {
        "customer": {"c_custkey": "c_custkey"},
        "supplier": {"s_suppkey": "s_suppkey"},
        "part": {"p_partkey": "p_partkey"},
        "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
        "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                     "l_suppkey": "s_suppkey"},
        "events": {"event_id": "event_id", "user_id": "user_id"},
        "documents": {"doc_id": "doc_id"},
        "embeddings": {"vec_id": "vec_id"},
    }
    out_files = {"lineitem": 32, "orders": 32, "events": 16}

    for name in ("region", "nation"):
        t[name].write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: copied")

    for name, keymap in shifted.items():
        parts = []
        for i in range(N_REPLICAS):
            df = t[name]
            for col, sname in keymap.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * strides[sname]))
            if name == "documents" and i > 0:
                salted = F.array_join(
                    F.transform(F.split("text", " "),
                                lambda w: F.concat(w, F.lit(f"_r{i}"))), " ")
                df = (df.withColumn("text", salted)
                      .withColumn("n_chars", F.length("text")))
            if name == "embeddings" and i > 0:
                dim = F.size("embedding")
                fresh = F.transform(
                    F.sequence(F.lit(0), dim - 1),
                    lambda d: ((F.pmod(F.hash(F.col("vec_id") * 101 + d * 7
                                              + F.lit(i)), F.lit(2001))
                                - 1000) / 1000.0).cast("float"))
                df = df.withColumn("embedding", fresh)
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u = u.repartition(out_files.get(name, 8))
        u.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: {u.count()} rows")


if __name__ == "__main__":
    main()
