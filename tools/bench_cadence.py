"""Sustained-cadence parity record (VERDICT r15 #6, BASELINE.md
"1 cycle / minute sustained").

Runs the Structured Streaming pipeline variant
(streaming/pipeline_stream.py) with the reference's
``trigger(processingTime='1 minute')`` for N wall-clock minutes,
dropping one supplier CSV into the stage per minute (2,000 rows per
load: half state-mutations of known codes — each one a full SCD2
close+open — plus new codes), then reports per-cycle latency from the
streaming query's own progress events. Parity bar: p95 cycle latency
< 60s, i.e. every cycle completes inside its schedule slot and the
pipeline never falls behind.

Usage: python tools/bench_cadence.py [n_cycles] [rows_per_load]
Prints one JSON line per processed batch + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from slowly_changing_dimensions_data_engineering_spark.pipeline import STAGING, SupplierPipeline
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark
    from slowly_changing_dimensions_data_engineering_spark.streaming.pipeline_stream import (
        start_streaming_pipeline,
    )

    spark = get_spark(app_name="sds-bench-cadence")
    root = tempfile.mkdtemp(prefix="cadence_")
    p = SupplierPipeline(spark, root)
    p.setup()

    def drop(cycle: int) -> None:
        """2k-row load: codes [0, rows) — half mutate to this cycle's
        state (a close+open per code), half are this cycle's new codes."""
        path = os.path.join(root, f"load{cycle}.csv")
        with open(path, "w", encoding="ascii") as fh:
            for i in range(rows // 2):
                fh.write(f"{i},C{i},name{i},st{cycle}\n")
            base = 10_000 + cycle * rows
            for i in range(rows // 2):
                fh.write(f"{base+i},N{base+i},new{base+i},st0\n")
        p.stage.put(path)

    drop(0)
    q = start_streaming_pipeline(p, trigger_interval="1 minute")
    t_end = time.time() + 60 * n_cycles + 30
    next_drop, cycle = time.time() + 60, 1
    while time.time() < t_end:
        if time.time() >= next_drop and cycle < n_cycles:
            drop(cycle)
            cycle += 1
            next_drop += 60
        time.sleep(1)
    q.stop()

    lat = []
    for pr in q.recentProgress:
        if pr is None or pr.get("numInputRows", 0) == 0:
            continue
        d = pr["durationMs"]
        lat.append(d.get("triggerExecution", 0) / 1000.0)
        print(json.dumps({
            "batch": pr["batchId"], "rows": pr["numInputRows"],
            "trigger_exec_sec": round(d.get("triggerExecution", 0) / 1000.0, 2),
            "addBatch_sec": round(d.get("addBatch", 0) / 1000.0, 2),
        }), flush=True)
    lat.sort()
    staging_rows = p.store.read(spark, STAGING).count()
    summary = {
        "metric": "cycle_latency_sec",
        "cycles": len(lat),
        "p50": round(lat[len(lat) // 2], 2) if lat else None,
        "p95": round(lat[max(0, int(len(lat) * 0.95) - 1)], 2) if lat else None,
        "max": round(lat[-1], 2) if lat else None,
        "sustained_under_60s": bool(lat) and lat[-1] < 60.0,
        "staging_rows": staging_rows,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
