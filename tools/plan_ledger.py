"""Plan-signature ledger: freeze every query's STRUCTURAL plan shape.

The plan-assertion suite (tests/test_plans.py) pins specific
scale-critical properties — no cartesians, pushdown, pinned shuffles,
the no-auto broadcast invariant. This tool generalizes the idea to the
whole registry: for each non-pipeline query it records a SIGNATURE of
the statically-planned physical tree — the per-node-type counts of the
nodes that decide 100 TB behavior:

    joins (per strategy), exchanges (shuffle vs broadcast), aggregates,
    windows, generates, sorts, global limits, Python evals, scans.

Cosmetic nodes (Project/Filter) are excluded: their counts churn with
refactors that change nothing about distribution. What remains is
exactly the shape a plan review checks — a broadcast that silently
became a shuffle (or worse, vice versa), a new exchange, Python
creeping into a JVM path, a lost partial aggregate.

Usage:
    python tools/plan_ledger.py --update   # rewrite tests/plan_ledger.json
    python tools/plan_ledger.py            # diff current plans vs ledger

The pytest gate (tests/test_plans.py::test_plan_signatures_match_ledger)
runs the diff; on an INTENDED plan change, re-run with --update and
commit the new ledger alongside the code change — the diff then
documents the plan change in review.

Signatures are computed at sf0.001 with the session's standard confs;
they are deterministic for fixed code + data + Spark version (static
planning only — AQE runtime re-planning happens after this snapshot).

GEOMETRY-PINNED: `_spread` (queries.py) repartitions only when the
scan yields fewer splits than cores, so a plan's exchange count can
legitimately differ between a 4-core and a 32-core session. The ledger
is generated and checked under the TEST geometry (cpus=4,
shuffle_partitions=4 — tests/conftest.py); main() pins the same.
"""

from __future__ import annotations

import json
import os
import re
import sys

# repo root (package imports) AND the tools dir (plan_sweep import) —
# pinned at module top so any importer gets working imports without
# pre-arranging sys.path itself.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LEDGER = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "plan_ledger.json")
SF = "/root/testdata/sf0.001"

#: node name -> signature key. Only structure that matters at scale.
STRUCTURAL = {
    "BroadcastHashJoin": "broadcast_hash_join",
    "ShuffledHashJoin": "shuffled_hash_join",
    "SortMergeJoin": "sort_merge_join",
    "BroadcastNestedLoopJoin": "broadcast_nested_loop_join",
    "CartesianProduct": "cartesian_product",
    "BroadcastExchange": "broadcast_exchange",
    # "Exchange" alone would double-count BroadcastExchange; handled below
    "HashAggregate": "hash_aggregate",
    "ObjectHashAggregate": "object_hash_aggregate",
    "SortAggregate": "sort_aggregate",
    "Window": "window",
    "WindowGroupLimit": "window_group_limit",
    "Generate": "generate",
    "GlobalLimit": "global_limit",
    "TakeOrderedAndProject": "take_ordered",
    "BatchEvalPython": "python_row_udf",
    "BatchEvalPythonUDTF": "python_udtf",
    "ArrowEvalPython": "python_arrow_udf",
    "ArrowAggregatePython": "python_arrow_agg",
    "FlatMapGroupsInPandas": "pandas_grouped",
    "FlatMapGroupsInPandasWithState": "pandas_grouped_state",
    "MapInPandas": "pandas_map",
    "Scan parquet": "parquet_scan",
    "Scan ExistingRDD": "rdd_scan",
}


def signature(plan: str) -> dict[str, int]:
    header = plan.split("\n\n")[0]
    sig: dict[str, int] = {}
    for node, key in STRUCTURAL.items():
        c = len(re.findall(rf"\b{re.escape(node)}\b", header))
        if c:
            sig[key] = c
    # shuffle exchanges: standalone "Exchange" nodes only — the
    # lookbehind excludes Broadcast/ReusedExchange (those have a letter
    # immediately before "Exchange").
    shuffles = len(re.findall(r"(?<![A-Za-z])Exchange\b", header))
    if shuffles:
        sig["shuffle_exchange"] = shuffles
    return sig


def ledgered_names() -> set[str]:
    """Every registry name that must have a ledger row (all of them —
    pipeline queries get nested entries). Spark-free, so the cheap
    registration gate (tests/test_plans.py) can run it before the
    expensive signature diff."""
    from slowly_changing_dimensions_data_engineering_spark import queries as q
    return set(q._REGISTRY)


def current_signatures(spark) -> dict[str, dict[str, int]]:
    from plan_sweep import PIPELINE_QUERIES, formatted_plan

    from slowly_changing_dimensions_data_engineering_spark import queries as q
    out = {}
    for name, (fn, _) in sorted(q._REGISTRY.items()):
        if name in PIPELINE_QUERIES:
            continue
        out[name] = signature(formatted_plan(fn(spark, SF)))
    out.update(pipeline_signatures(spark))
    return out


def pipeline_signatures(spark) -> dict[str, dict]:
    """Ledger entries for the multi-commit pipeline queries — the 10
    queries the static sweep skips because CONSTRUCTING their result
    frame executes a pipeline (store builds, streaming runs). For each,
    freeze (a) the FINAL-READ plan signature and (b) the ordered list
    of per-commit write plans, captured via ``store.PLAN_CAPTURE`` with
    the pipeline caches reset so every run rebuilds from scratch. The
    commit list is where the scale-critical shapes live: the pruned
    load-3 bucket merge of the SCD2 pipelines must keep its
    bucket-pruned scan count, a streaming micro-batch commit must not
    grow an exchange, the incremental-MV fold must never rescan its
    base. Entries are nested ({final_read, commits}) next to the flat
    non-pipeline signatures; the diff gate compares them structurally
    all the same."""
    from plan_sweep import PIPELINE_QUERIES, formatted_plan

    from slowly_changing_dimensions_data_engineering_spark import (
        queries as q,
        store as store_mod,
    )
    out = {}
    for name in sorted(PIPELINE_QUERIES):
        q.reset_pipeline_caches()
        commits: list[dict] = []

        def cap(tbl, kind, df, _commits=commits):
            _commits.append({"table": tbl, "kind": kind,
                             "sig": signature(formatted_plan(df))})

        store_mod.PLAN_CAPTURE = cap
        try:
            df = q._REGISTRY[name][0](spark, SF)
            final = signature(formatted_plan(df))
        finally:
            store_mod.PLAN_CAPTURE = None
        out[name] = {"final_read": final, "commits": commits}
    return out


def main() -> int:
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark
    spark = get_spark("sds-plan-ledger", cpus=4, shuffle_partitions=4)
    cur = current_signatures(spark)
    if "--update" in sys.argv:
        with open(LEDGER, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"wrote {len(cur)} signatures to {LEDGER}")
        return 0
    with open(LEDGER) as f:
        ref = json.load(f)
    bad = 0
    for name in sorted(set(cur) | set(ref)):
        if cur.get(name) != ref.get(name):
            bad += 1
            print(f"DRIFT {name}:\n  ledger:  {ref.get(name)}\n  current: {cur.get(name)}")
    print(f"DONE drifted: {bad} / {len(cur)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
