"""Assemble bench_history/r17_local.json from bench_runs.jsonl records
and print the cross-round comparisons for BENCH_NOTES r17:

- records are selected by the ``round == "r17"`` generation tag;
- sf0.1 compared vs BOTH the r15 final freeze (the last trustworthy
  small-sf arbiter — VERDICT r16 #2: the r16 sf0.1 record is
  contention-contaminated) and the r16 record;
- sf3/sf10 compared vs the r14 arbiters AND the r16 banks (the r16
  sf10 bank is itself contaminated — BENCH_NOTES "r16 soak" section —
  so r14 stays the soak arbiter; the r17 idle-box record is the
  replacement bank);
- cache families compared JOINTLY (the r12 protocol). r17 pool
  deltas: ``chunk_rag_index`` gains ``streaming_bm25_index_topk``
  (its own streamed 80/20 index build, same retrieval-family slot).
  NOTE: the chunk-IVF index is now a PERSISTED artifact like the BM25
  index (VERDICT r16 #4) — the ~200s in-process build that landed on
  the family's first runner disappears from warm-machine suites; the
  one-time offline build cost is reported separately in BENCH_NOTES.

Usage: python tools/bench_report_r17.py
"""

from __future__ import annotations

import json
import os
import statistics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "bench_history")

NEW_R17 = ["streaming_bm25_index_topk"]

#: r17 watch-list: the r16 verdict's weak items (substring span 100x
#: ratio, the retrieval first-runner composite, the contaminated-bank
#: spikes on untouched code) plus the paths r17 touches (flock commit
#: lock -> store-backed pipelines; retry backoff -> OCC merges;
#: persisted chunk index -> retrieval family).
WATCH_R17 = [
    "substring_dedup_spans", "substring_dedup_cut",
    "hybrid_rag_fusion", "chunk_retrieval_topk", "hybrid_fusion_recall",
    "bm25_chunk_topk", "bm25_index_append_topk",
    "dedup_clusters_cc", "streaming_trained_scores",
    "pandas_udf_grouped_price_range", "multimodal_near_dup_summary",
    "scd2_supplier_history", "scd2_orders_history_bucketed",
    "incremental_mv_state_stats",
]

FAMILIES = {
    # Everything gated on _CLS_TRAIN_CACHE: the first runner carries
    # the 6-round training; board rotation reshuffles which one that
    # is, so only the JOINT total is cross-round comparable (the r17
    # sf0.1 "quality_rank_fusion 2.4x" was exactly this reshuffle).
    "classifier_train": [
        "classifier_train_rounds", "classifier_train_weights",
        "classifier_trained_scores", "classifier_calibration_bins",
        "curriculum_quality_shards", "quality_rank_fusion",
        "pretraining_funnel_v2", "streaming_trained_scores"],
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
        "bm25_chunk_topk", "bm25_prune_stats", "hybrid_fusion_recall",
        "bm25_index_append_topk", "streaming_bm25_index_topk"],
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


def _vs(label: str, q_now: dict, q_prev: dict, top: int = 8) -> None:
    common = sorted(set(q_now) & set(q_prev))
    tc = sum(q_now[k] for k in common)
    tp = sum(q_prev[k] for k in common)
    rats = [q_now[k] / q_prev[k] for k in common if q_prev[k] > 0.05]
    print(f"{label} ({len(common)} common): raw total {tc:.1f}/{tp:.1f} = "
          f"{tc / tp:.3f}, median per-query {statistics.median(rats):.2f}")
    fam_now = _family_sums({k: q_now[k] for k in common})
    fam_prev = _family_sums({k: q_prev[k] for k in common})
    movers = sorted(((fam_now[k] / fam_prev[k], k)
                     for k in set(fam_now) & set(fam_prev)
                     if fam_prev[k] > 0.5), reverse=True)[:top]
    print("  top family-joint movers:")
    for v, k in movers:
        members = FAMILIES.get(k)
        tag = f" [{len(members)}q]" if members else ""
        print(f"    {k}{tag}: {fam_prev[k]:.2f} -> {fam_now[k]:.2f} "
              f"({v:.2f}x)")


def main() -> None:
    with open(os.path.join(HIST, "bench_runs.jsonl")) as f:
        runs = [json.loads(line) for line in f if line.strip()]
    r17 = [r for r in runs if r.get("round") == "r17"]
    by_sf: dict[float, dict] = {}
    for r in r17:
        by_sf[r["sf"]] = r  # last record per sf wins within the round
    sf01, sf3, sf10 = by_sf.get(0.1), by_sf.get(3.0), by_sf.get(10.0)
    assert sf01, "no r17-tagged sf0.1 record"

    out = {}
    for label, rec in (("r17_sf01", sf01), ("r17_sf3", sf3),
                       ("r17_sf10", sf10)):
        if rec:
            out[label] = rec
    with open(os.path.join(HIST, "r17_local.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} records to bench_history/r17_local.json")

    q01 = sf01["per_query_seconds"]
    print(f"\nsf0.1: {sum(q01.values()):.1f}s total, {len(q01)} queries, "
          f"calib {sf01['calib_sec']}")
    r16 = json.load(open(os.path.join(HIST, "r16_local.json")))
    r15 = json.load(open(os.path.join(HIST, "r15_local.json")))
    r14 = json.load(open(os.path.join(HIST, "r14_local.json")))
    _vs("vs r15 final freeze (trustworthy small-sf arbiter)", q01,
        r15["r15_sf01"]["per_query_seconds"])
    _vs("vs r16 record (contention-contaminated)", q01,
        r16["r16_sf01"]["per_query_seconds"])

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
        key = f"r16_{label.replace('.', '')}"
        k14 = f"r14_{label.replace('.', '')}"
        if k14 in r14:
            _vs(f"  {label} vs r14 bank (trustworthy soak arbiters)", q,
                r14[k14]["per_query_seconds"], top=5)
        if key in r16:
            _vs(f"  {label} vs r16 bank (contaminated — see BENCH_NOTES"
                f" r16-soak section)", q,
                r16[key]["per_query_seconds"], top=5)
        print("  watch-list + r17-new queries:")
        for k in WATCH_R17 + NEW_R17:
            if k in q and k in q01:
                extra = (f" ({q[k] / q01[k]:.2f}x)" if q01[k] > 0.01 else "")
                print(f"    {k}: {q01[k]:.2f}s -> {q[k]:.2f}s{extra}")
            else:
                print(f"    {k}: absent from one record")


if __name__ == "__main__":
    main()
