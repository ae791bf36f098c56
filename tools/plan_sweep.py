"""Physical-plan sweep: flag raw fact-table broadcasts at scale.

For every registered query (or a named subset), renders the FORMATTED
physical plan against a data tree and classifies each BroadcastExchange
subtree:

- **AGG-REDUCED** — an aggregation sits between the exchange and any
  fact-table scan (min/max bounds, boundary buckets, IDF tables,
  benchmark shingle sets ...). Broadcasting these is scale-correct: the
  relation is a reduction, not the table.
- **RAW** — the broadcast subtree reaches a fact-table scan through
  only row-preserving nodes (Filter/Project/Generate/Exchange). These
  are the plans a 1000-executor cluster must never run: the relation
  grows with the data. This sweep at sf1 is what caught the 64MB
  autoBroadcastJoinThreshold implicit-broadcasting a pruned 6M-row
  lineitem (see BENCH_NOTES.md, r6) — run it against `_soak/sf1` after
  any join-shape change.

Usage: python tools/plan_sweep.py [--sf DIR] [--no-auto] [query ...]
Exit code 1 if any RAW fact broadcast is found.

Two modes, two different questions:

- default: "what does the optimizer pick at THIS scale?" Raw hits here
  are usually estimate-driven broadcasts that flip to shuffle joins on
  their own as data grows (size-based, production-default threshold) —
  informational, not failures in themselves.
- ``--no-auto`` sets autoBroadcastJoinThreshold=-1 before planning, so
  every implicit broadcast disappears. Any raw fact broadcast that
  SURVIVES is pinned by an explicit F.broadcast()/hint in the code and
  will still be a broadcast at 100× the data — a genuine scale bug.
  This mode is the CI invariant (tests/test_plans.py).

Fact tables = the ones that scale with sf (orders/lineitem/events/
documents/embeddings); dimensions (region/nation/customer/supplier/
part) are legitimately broadcastable at any scale this engine targets.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = ("orders.parquet", "lineitem.parquet", "events.parquet",
         "documents.parquet", "embeddings.parquet")
# Nodes that bound the broadcast relation's size independently of the
# input's: aggregations (group count bounds rows) and limits (row count
# pinned). A broadcast whose subtree passes through one of these is
# scale-safe even when a fact scan sits below it (e.g. the explicit
# F.broadcast of a LIMIT-5 query frame in the ANN contracts).
REDUCTION_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate",
                   "GlobalLimit", "LocalLimit", "CollectLimit",
                   "TakeOrderedAndProject")

# Queries whose construction EXECUTES a pipeline (multi-commit store
# builds, streaming runs) before returning the final frame — their
# result plan is a table scan, and building state just to render it
# makes the sweep minutes slower. Sweep them explicitly when touched.
PIPELINE_QUERIES = {
    "scd2_supplier_history", "scd2_master_current",
    "scd2_orders_history_bucketed", "streaming_mv_order_status",
    "streaming_ann_index_state", "snapshot_diff_suppliers",
    "delete_dml_state_stats", "incremental_mv_state_stats",
    "minhash_incremental_dedup", "ivf_two_level_assign_state",
    "streaming_ivfpq_index_state", "streaming_click_attribution",
    "streaming_click_attribution_outer",
    "streaming_trained_scores",
    "deletion_cascade_audit",
    "deletion_neardup_expansion",
    "scd1_landing_current",
    "scd3_supplier_prev_state",
    "chunk_retrieval_topk",
    "scd2_backdated_correction_history",
}


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


#: Physical-node class names of the REDUCTION_NODES above.
_REDUCTION_EXECS = {n + "Exec" for n in REDUCTION_NODES}


def _static_plan(df):
    """The statically-planned physical tree WITH exchanges — what
    formatted explain renders. Under AQE the executed plan is wrapped
    in AdaptiveSparkPlanExec (whose children() is empty — it hides its
    subtree); its initialPlan() is the pre-runtime tree."""
    ep = df._jdf.queryExecution().executedPlan()
    if ep.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        return ep.initialPlan()
    return ep


def _jchildren(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _scan_files(node) -> list[str]:
    try:
        paths = node.relation().location().rootPaths()
        return [str(paths.apply(i)).rsplit("/", 1)[-1]
                for i in range(paths.size())]
    except Exception:
        return []  # not a file scan (RDD/in-memory/v2 source)


def _raw_scans_below(node, hits: list[str]) -> None:
    """Collect fact files reachable from ``node`` WITHOUT crossing a
    reduction node — the per-scan ancestor-path check: a branch that
    passes through an aggregate/limit is bounded regardless of what it
    scans, while sibling branches of the same broadcast subtree are
    judged on their own path."""
    name = node.getClass().getSimpleName()
    if name in _REDUCTION_EXECS:
        return  # this branch is bounded; nothing below counts as raw
    for f in _scan_files(node):
        if f in FACTS:
            hits.append(f)
    for c in _jchildren(node):
        _raw_scans_below(c, hits)


def raw_fact_broadcasts(df) -> list[str]:
    """Return the fact files any BroadcastExchange in ``df``'s static
    physical plan reaches through only row-preserving nodes. Walks the
    ACTUAL plan tree via the JVM (not the rendered explain text), so
    subtree extent and the reduction-on-path test are structural — no
    indentation arithmetic, and a broadcast joining an aggregated
    branch with a raw fact branch is correctly flagged for the raw
    branch. ReusedExchange references are skipped (their target is
    visited where it physically sits)."""
    hits: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "ReusedExchangeExec":
            return
        if name == "BroadcastExchangeExec":
            for c in _jchildren(node):
                _raw_scans_below(c, hits)
        for c in _jchildren(node):
            walk(c)

    walk(_static_plan(df))
    return sorted(set(hits))


def main() -> int:
    from slowly_changing_dimensions_data_engineering_spark import queries as q
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    no_auto = False
    if "--no-auto" in args:
        no_auto = True
        args.remove("--no-auto")
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args or [n for n in q._REGISTRY if n not in PIPELINE_QUERIES]
    spark = get_spark()
    if no_auto:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bad = 0
    for name in names:
        try:
            hits = raw_fact_broadcasts(q._REGISTRY[name][0](spark, sf))
        except Exception as ex:  # surface, keep sweeping
            print(f"ERR   {name}: {str(ex)[:120]}")
            bad += 1
            continue
        if hits:
            print(f"RAW   {name}: broadcasts {hits}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"DONE raw-fact-broadcast queries: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
