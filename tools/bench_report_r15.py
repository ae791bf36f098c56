"""Assemble bench_history/r15_local.json from bench_runs.jsonl records
and print the cross-round comparisons for BENCH_NOTES r15:

- records are selected by the ``round == "r15"`` generation tag
  (ADVICE r14 #3 — no more registry-width heuristics; bench.py stamps
  the tag since r15);
- common-set raw ratio vs bench_history/r14_local.json per-query
  arbiters (``r14_sf01``, the 147-query final r14 freeze); never
  totals;
- cache families compared JOINTLY (the r12 protocol): one-time-build
  pools summed before cross-round diffs so board-rotation flips of
  who pays a build cannot masquerade as regressions. r15 pool deltas:
  ``scd2_store`` gains ``streaming_scd2_backdate_history`` (it clones
  the shared two-load store; scd0/evolution build their own dim-sized
  stores and stay unpooled);
  ``chunk_rag_index`` gains the two new BM25/fusion-family members
  (they share the chunk corpus scan, the contrib-slice cache and the
  RAG index cache);
  NEW ``click_attribution`` pool: the pair shares no cache but moves
  together (micro-batch fixed-overhead class — BENCH_NOTES r15
  attribution), so cross-round reads are family-joint by protocol;
- sf0.1 -> sf3 -> sf10 per-query ratios; the r15 watch-list is the
  minhash family (rewritten write/probe this round) plus the three
  SCD queries folded into the full soak for the first time
  (VERDICT r14 #6); superlinear check vs the data multiplier.

Usage: python tools/bench_report_r15.py
"""

from __future__ import annotations

import json
import os
import statistics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "bench_history")

NEW_R15 = ["scd0_supplier_fixed", "scd1_evolved_landing",
           "streaming_scd2_backdate_history", "bm25_prune_stats",
           "hybrid_fusion_recall"]

#: r15 watch-list: the minhash family runs under the new clustered
#: write + pinned broadcast probe; the three r14 post-soak SCD queries
#: get their first full-soak datapoints (VERDICT r14 #6).
WATCH_R15 = ["minhash_incremental_dedup", "minhash_lsh_candidates",
             "minhash_near_dups", "bm25_chunk_topk",
             "scd2_backdated_correction_history",
             "scd4_current_with_history", "scd6_supplier_hybrid"]

FAMILIES = {
    "classifier_train": [
        "classifier_train_rounds", "classifier_train_weights",
        "classifier_trained_scores", "classifier_calibration_bins"],
    "classifier_minibatch": [
        "classifier_train_minibatch", "classifier_minibatch_weights"],
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
        "scd4_current_with_history", "scd6_supplier_hybrid",
        "streaming_scd2_backdate_history"],
    "forget_fixture": [
        "deletion_cascade_audit", "deletion_neardup_expansion",
        "ann_post_erasure_topk"],
    "chunk_rag_index": [
        "chunk_retrieval_topk", "hybrid_rag_fusion",
        "bm25_chunk_topk", "bm25_prune_stats", "hybrid_fusion_recall"],
    "click_attribution": [
        "streaming_click_attribution", "streaming_click_attribution_outer"],
}
_FAMILY_OF = {q: f for f, qs in FAMILIES.items() for q in qs}


def _family_sums(q: dict[str, float]) -> dict[str, float]:
    out: dict[str, float] = {}
    for k, v in q.items():
        fam = _FAMILY_OF.get(k, k)
        out[fam] = out.get(fam, 0.0) + v
    return out


def main() -> None:
    with open(os.path.join(HIST, "bench_runs.jsonl")) as f:
        runs = [json.loads(line) for line in f if line.strip()]
    r15 = [r for r in runs if r.get("round") == "r15"]
    by_sf: dict[float, dict] = {}
    for r in r15:
        by_sf[r["sf"]] = r  # last record per sf wins within the round
    sf01, sf3, sf10 = by_sf.get(0.1), by_sf.get(3.0), by_sf.get(10.0)
    assert sf01, "no r15-tagged sf0.1 record"

    out = {}
    for label, rec in (("r15_sf01", sf01), ("r15_sf3", sf3),
                       ("r15_sf10", sf10)):
        if rec:
            out[label] = rec
    with open(os.path.join(HIST, "r15_local.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} records to bench_history/r15_local.json")

    q01 = sf01["per_query_seconds"]
    print(f"\nsf0.1: {sum(q01.values()):.1f}s total, {len(q01)} queries, "
          f"calib {sf01['calib_sec']}")

    r14 = json.load(open(os.path.join(HIST, "r14_local.json")))
    prev = dict(r14["r14_sf01"]["per_query_seconds"])
    common = sorted(set(q01) & set(prev))
    only_now = sorted(set(q01) - set(prev))
    only_prev = sorted(set(prev) - set(q01))
    if only_now:
        print(f"  new since r14 (excluded from ratios): {only_now}")
    if only_prev:
        print(f"  missing vs r14 (excluded from ratios): {only_prev}")
    tc, tp = sum(q01[k] for k in common), sum(prev[k] for k in common)
    rats = [q01[k] / prev[k] for k in common if prev[k] > 0.05]
    print(f"vs r14 arbiters ({len(common)} common): raw total "
          f"{tc:.1f}/{tp:.1f} = {tc / tp:.3f}, median per-query "
          f"{statistics.median(rats):.2f}")

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
        print("  watch-list + r15-new queries:")
        for k in WATCH_R15 + NEW_R15:
            if k in q and k in q01:
                extra = (f" ({q[k] / q01[k]:.2f}x)" if q01[k] > 0.01 else "")
                print(f"    {k}: {q01[k]:.2f}s -> {q[k]:.2f}s{extra}")
            else:
                print(f"    {k}: absent from one record")


if __name__ == "__main__":
    main()
