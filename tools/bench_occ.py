"""Measure the OCC commit protocol's overhead (VERDICT r15 #3).

The r15 sf10 soak moved the store-backed pipeline families +38-55% the
round OCC landed, so the question is: what does the protocol itself
cost per commit — the staging-dir mkdtemp, the lock acquire/release,
the meta re-read + conflict validation, the two promote renames —
versus the parquet data write every commit pays regardless?

Method: N commits per path (full rewrite / append / bucketed) over a
fixed frame. Wall time per commit is split by instrumenting the
protocol steps with monkeypatched timers around ``_stage_dir``,
``_swap_meta`` (lock + validate + meta write + promote renames), and
the parquet write (everything else). If protocol-cost ≪ write-cost the
sf10 movers are attributed to box/cache state, to be confirmed by the
re-banked soak; if not, the numbers say which step to amortize.

Usage: python tools/bench_occ.py [n_commits] [rows]
Prints one JSON line per path + a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark import store as store_mod
    from slowly_changing_dimensions_data_engineering_spark.schemas import SUPPLIER
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark
    from slowly_changing_dimensions_data_engineering_spark.store import TableStore

    spark = get_spark(app_name="sds-bench-occ")
    root = tempfile.mkdtemp(prefix="occ_bench_")
    store = TableStore(root)

    df = (spark.range(rows)
          .select(F.col("id").alias("supplier_key"),
                  F.concat(F.lit("S"), F.col("id").cast("string"))
                  .alias("supplier_code"),
                  F.concat(F.lit("name"), F.col("id").cast("string"))
                  .alias("supplier_name"),
                  (F.pmod(F.col("id"), F.lit(50)).cast("string"))
                  .alias("supplier_state"))
          .select(*[F.col(f.name).cast(f.dataType) for f in SUPPLIER.fields]))
    df = df.localCheckpoint()  # commits must not re-pay generation

    timers = {"stage": 0.0, "swap": 0.0}
    orig_stage = TableStore._stage_dir
    orig_swap = TableStore._swap_meta

    def timed_stage(self, name):
        t0 = time.time()
        out = orig_stage(self, name)
        timers["stage"] += time.time() - t0
        return out

    def timed_swap(self, name, apply):
        t0 = time.time()
        out = orig_swap(self, name, apply)
        timers["swap"] += time.time() - t0
        return out

    TableStore._stage_dir = timed_stage
    TableStore._swap_meta = timed_swap

    def run(label, setup, one):
        setup()
        # warm once (JVM/committer warmup is not protocol cost)
        one(0)
        timers["stage"] = timers["swap"] = 0.0
        t0 = time.time()
        for i in range(1, n + 1):
            one(i)
        total = time.time() - t0
        rec = {
            "path": label, "n_commits": n, "rows": rows,
            "total_sec": round(total, 3),
            "per_commit_ms": round(1000 * total / n, 2),
            "protocol_stage_ms": round(1000 * timers["stage"] / n, 3),
            "protocol_swap_ms": round(1000 * timers["swap"] / n, 3),
            "protocol_share_pct": round(
                100 * (timers["stage"] + timers["swap"]) / total, 2),
        }
        print(json.dumps(rec), flush=True)
        return rec

    out = []
    out.append(run(
        "commit_full",
        lambda: store.create("t_full", SUPPLIER),
        lambda i: store.commit("t_full", df)))
    out.append(run(
        "commit_append",
        lambda: store.create("t_app", SUPPLIER),
        lambda i: store.commit_append("t_app", df)))
    out.append(run(
        "commit_buckets",
        lambda: store.create("t_bkt", SUPPLIER,
                             bucket_by=(["supplier_code"], 8)),
        lambda i: store.commit_buckets("t_bkt", df, range(8))))

    protocol = sum(r["protocol_stage_ms"] + r["protocol_swap_ms"]
                   for r in out) / len(out)
    print(json.dumps({
        "metric": "occ_protocol_ms_per_commit",
        "value": round(protocol, 3),
        "mean_commit_ms": round(sum(r["per_commit_ms"]
                                    for r in out) / len(out), 2),
    }), flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
