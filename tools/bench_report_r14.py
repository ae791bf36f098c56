"""Assemble bench_history/r14_local.json from the bench_runs.jsonl
records emitted by bench.py and print the cross-round comparisons for
BENCH_NOTES r14:

- common-set raw ratio vs bench_history/r13_local.json — per-query
  arbiters: ``r13_sf01`` (the 140-query r13 freeze record); never
  totals;
- CACHE FAMILIES ARE COMPARED JOINTLY (VERDICT r12 #6): queries
  sharing a one-time build (classifier training, BPE/unigram
  tokenizer training, IVF / IVF-PQ index, the SCD2 store, the
  deletion-family fixture, the chunk-RAG index) are summed before
  cross-round diffs, so a board-rotation flip of which member pays
  the build (the r12 ``classifier_trained_scores`` 6.8× /
  ``classifier_train_rounds`` 0.06× artifact) cannot masquerade as a
  regression — movers are reported at family granularity;
- sf0.1 -> sf3 -> sf10 per-query ratios at the full r14 registry,
  the watch-list (chunk_retrieval_topk / ivf_search_ann — VERDICT r13
  #1: the post-fix soak must show the small-file write explosion
  gone) and the r14-new queries called out, superlinear check vs the
  data multiplier.

All cross-record indexing INTERSECTS keys first and prints what is
missing.

Usage: python tools/bench_report_r14.py
"""

from __future__ import annotations

import json
import os
import statistics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "bench_history")

NEW_R14 = ["bm25_chunk_topk", "hybrid_rag_fusion",
           "scd2_point_in_time_lineitems", "ann_post_erasure_topk",
           "scd2_backdated_correction_history",
           "scd4_current_with_history", "scd6_supplier_hybrid"]

#: VERDICT r13 #1: queries whose sf10 ratios the r14 soak must prove
#: recovered after the repartition(centroid_id) clustered-write fix.
WATCH_R14 = ["chunk_retrieval_topk", "ivf_search_ann",
             "range_join_active_orders", "multimodal_near_dup_summary"]

#: One-time-build cost pools: cross-round diffs only make sense on the
#: family SUM (board order decides which member pays the build).
FAMILIES = {
    "classifier_train": [
        "classifier_train_rounds", "classifier_train_weights",
        "classifier_trained_scores", "classifier_calibration_bins"],
    "classifier_minibatch": [
        "classifier_train_minibatch", "classifier_minibatch_weights"],
    # ONE pool for both tokenizer trainings: unigram_fertility_vs_bpe
    # consumes BOTH caches, so board order can shift the BPE build cost
    # between the two sub-families (r13->r14 flip: bpe 2.2->6.8 while
    # unigram 14.0->9.2, jointly 16.2->16.0) — only the joint sum is
    # order-invariant.
    "tokenizer_train": [
        "bpe_train_merges", "bpe_vocab_segmentation", "bpe_corpus_tokens",
        "bpe_fertility_by_source", "bpe_token_stats",
        "unigram_lm_train", "unigram_lm_segmentation",
        "unigram_corpus_tokens", "unigram_fertility_vs_bpe"],
    "ivf_index": [
        "ivf_search_ann", "ivf_recall_at10", "ivf_recall_nprobe",
        "ann_batch_topk", "embedding_near_dup_pairs",
        "semantic_dedup_summary", "ann_filtered_topk_index"],
    "ivfpq_index": [
        "pq_adc_batch_embeddings", "ivfpq_search_embeddings",
        "ivfpq_residual_search_embeddings", "streaming_ivfpq_index_state"],
    "scd2_store": [
        "scd2_supplier_history", "scd2_master_current",
        "scd1_landing_current", "scd2_point_in_time_lineitems",
        "scd2_backdated_correction_history",
        "scd4_current_with_history", "scd6_supplier_hybrid"],
    "forget_fixture": [
        "deletion_cascade_audit", "deletion_neardup_expansion",
        "ann_post_erasure_topk"],
    "chunk_rag_index": ["chunk_retrieval_topk", "hybrid_rag_fusion"],
}
_FAMILY_OF = {q: f for f, qs in FAMILIES.items() for q in qs}


def _arbiter(r13: dict) -> dict[str, float]:
    """Per-query r13 baseline (the r13 freeze record covered the whole
    140-query registry, so no post-freeze patching is needed)."""
    return dict(r13["r13_sf01"]["per_query_seconds"])


def _family_sums(q: dict[str, float]) -> dict[str, float]:
    out: dict[str, float] = {}
    for k, v in q.items():
        out[_FAMILY_OF.get(k, k)] = out.get(_FAMILY_OF.get(k, k), 0.0) + v
    return out


def main() -> None:
    with open(os.path.join(HIST, "bench_runs.jsonl")) as f:
        runs = [json.loads(line) for line in f if line.strip()]
    # r14-generation records: the registry grew 142 -> 144 -> 147 within
    # the round (post-soak additions are covered by targeted
    # bench_queries datapoints, BENCH_NOTES «r14 additions»); latest
    # record per sf wins, so the 147-query sf0.1 freeze coexists with
    # the 144-query sf3/sf10 soak records (key intersection below
    # handles the width difference).
    # r14-generation records carry no "round" tag (bench.py only began
    # tagging in r15) and sit in the 142..147 registry-width window —
    # both bounds, so r15+ records (tagged, and/or wider) are excluded
    # (ADVICE r14 #3).
    r14 = [r for r in runs
           if "round" not in r and 142 <= r["n_queries"] <= 147]
    by_sf: dict[float, dict] = {}
    for r in r14:
        by_sf[r["sf"]] = r  # last record per sf wins
    sf01, sf3, sf10 = by_sf.get(0.1), by_sf.get(3.0), by_sf.get(10.0)
    assert sf01, "no r14-generation sf0.1 record"

    out = {}
    for label, rec in (("r14_sf01", sf01), ("r14_sf3", sf3),
                       ("r14_sf10", sf10)):
        if rec:
            out[label] = rec
    with open(os.path.join(HIST, "r14_local.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} records to bench_history/r14_local.json")

    q01 = sf01["per_query_seconds"]
    print(f"\nsf0.1: {sum(q01.values()):.1f}s total, {len(q01)} queries, "
          f"calib {sf01['calib_sec']}")

    r13 = json.load(open(os.path.join(HIST, "r13_local.json")))
    prev = _arbiter(r13)
    common = sorted(set(q01) & set(prev))
    only_now = sorted(set(q01) - set(prev))
    only_prev = sorted(set(prev) - set(q01))
    if only_now:
        print(f"  new since r13 (excluded from ratios): {only_now}")
    if only_prev:
        print(f"  missing vs r13 (excluded from ratios): {only_prev}")
    tc, tp = sum(q01[k] for k in common), sum(prev[k] for k in common)
    rats = [q01[k] / prev[k] for k in common if prev[k] > 0.05]
    print(f"vs r13 arbiters ({len(common)} common): raw total "
          f"{tc:.1f}/{tp:.1f} = {tc / tp:.3f}, median per-query "
          f"{statistics.median(rats):.2f}")

    # family-joint movers: sum each cache family BEFORE diffing
    fam_now = _family_sums({k: q01[k] for k in common})
    fam_prev = _family_sums({k: prev[k] for k in common})
    fam_common = sorted(set(fam_now) & set(fam_prev))
    movers = sorted(((fam_now[k] / fam_prev[k], k) for k in fam_common
                     if fam_prev[k] > 0.5), reverse=True)[:6]
    print("top family-joint movers (build-cost pools summed):")
    for v, k in movers:
        members = FAMILIES.get(k)
        tag = f" [{len(members)}q]" if members else ""
        print(f"  {k}{tag}: {fam_prev[k]:.2f} -> {fam_now[k]:.2f} "
              f"({v:.2f}x)")

    for label, rec, mult in (("sf3", sf3, 30), ("sf10", sf10, 100)):
        if not rec:
            continue
        q = rec["per_query_seconds"]
        shared = sorted(set(q) & set(q01))
        miss = sorted(set(q01) - set(q))
        if miss:
            print(f"\n{label}: MISSING queries (partial record): {miss}")
        rat = {k: q[k] / q01[k] for k in shared if q01[k] > 0.05}
        sup = {k: round(v, 1) for k, v in rat.items() if v > mult}
        print(f"\n{label} ({mult}x data): {sum(q.values()):.1f}s, "
              f"{len(q)}/{len(q01)}, calib {rec['calib_sec']}; median "
              f"ratio {statistics.median(rat.values()):.2f}, max "
              f"{max(rat.values()):.1f} "
              f"({max(rat, key=rat.get)}); superlinear: {sup or 'none'}")
        print("  watch-list (VERDICT r13 #1) + r14-new queries:")
        for k in WATCH_R14 + NEW_R14:
            if k in q and k in q01:
                extra = (f" ({q[k] / q01[k]:.2f}x)" if q01[k] > 0.01 else "")
                print(f"    {k}: {q01[k]:.2f}s -> {q[k]:.2f}s{extra}")
            else:
                print(f"    {k}: absent from one record")


if __name__ == "__main__":
    main()
