"""Assemble bench_history/r12_local.json from the bench_runs.jsonl
records emitted by bench.py and print the cross-round comparisons the
BENCH_NOTES r12 section quotes:

- common-set (128-query) raw ratio vs bench_history/r11_local.json
  r11_sf01_final — the designated per-query arbiter;
- sf0.1 -> sf3 -> sf10 per-query ratios at the full 134-query r12
  registry, with the 7 r12-new queries called out;
- superlinear check: any query whose sf3 (sf10) ratio exceeds the 30x
  (100x) data multiplier.

Usage: python tools/bench_report_r12.py
(reads the LAST record per sf among the 134-query bench_runs.jsonl
records — the r12 freeze soak triple.)
"""

from __future__ import annotations

import json
import os
import statistics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "bench_history")

NEW_R12 = [
    "classifier_train_minibatch", "classifier_minibatch_weights",
    "classifier_calibration_bins", "unigram_lm_train",
    "unigram_lm_segmentation", "unigram_fertility_vs_bpe",
    "deletion_cascade_audit",
]


def main() -> None:
    with open(os.path.join(HIST, "bench_runs.jsonl")) as f:
        runs = [json.loads(line) for line in f if line.strip()]
    # freeze soak triple = the 134-query records; the post-freeze full
    # registry (136: + deletion_neardup_expansion, unigram_corpus_
    # tokens) lands under its own r12_sf01_final key (r11 convention)
    r12 = [r for r in runs if r["n_queries"] == 134]
    by_sf: dict[float, dict] = {}
    for r in r12:
        by_sf[r["sf"]] = r  # last record per sf wins
    sf01, sf3, sf10 = by_sf.get(0.1), by_sf.get(3.0), by_sf.get(10.0)
    assert sf01, "no 134-query sf0.1 record"
    final = [r for r in runs if r["n_queries"] > 134 and r["sf"] == 0.1]

    out = {}
    for label, rec in (("r12_sf01", sf01), ("r12_sf3", sf3),
                       ("r12_sf10", sf10),
                       ("r12_sf01_final", final[-1] if final else None)):
        if rec:
            out[label] = rec
    with open(os.path.join(HIST, "r12_local.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} records to bench_history/r12_local.json")

    q01 = sf01["per_query_seconds"]
    print(f"\nsf0.1: {sum(q01.values()):.1f}s total, {len(q01)} queries, "
          f"calib {sf01['calib_sec']}")

    r11 = json.load(open(os.path.join(HIST, "r11_local.json")))
    prev = r11["r11_sf01_final"]["per_query_seconds"]
    common = sorted(set(q01) & set(prev))
    tc, tp = sum(q01[k] for k in common), sum(prev[k] for k in common)
    rats = [q01[k] / prev[k] for k in common if prev[k] > 0.05]
    print(f"vs r11_sf01_final ({len(common)} common): raw total "
          f"{tc:.1f}/{tp:.1f} = {tc / tp:.3f}, median per-query "
          f"{statistics.median(rats):.2f}")
    movers = sorted(((q01[k] / prev[k], k) for k in common
                     if prev[k] > 0.5), reverse=True)[:5]
    for v, k in movers:
        print(f"  mover {k}: {prev[k]:.2f} -> {q01[k]:.2f} ({v:.2f}x)")

    for label, rec, mult in (("sf3", sf3, 30), ("sf10", sf10, 100)):
        if not rec:
            continue
        q = rec["per_query_seconds"]
        rat = {k: q[k] / q01[k] for k in q01 if q01[k] > 0.05}
        sup = {k: round(v, 1) for k, v in rat.items() if v > mult}
        print(f"\n{label} ({mult}x data): {sum(q.values()):.1f}s, "
              f"{len(q)}/{len(q01)}, calib {rec['calib_sec']}; median "
              f"ratio {statistics.median(rat.values()):.2f}, max "
              f"{max(rat.values()):.1f} "
              f"({max(rat, key=rat.get)}); superlinear: {sup or 'none'}")
        print("  r12-new queries:")
        for k in NEW_R12:
            print(f"    {k}: {q01[k]:.2f}s -> {q[k]:.2f}s "
                  f"({q[k] / q01[k]:.2f}x)" if q01[k] > 0.01 else
                  f"    {k}: {q01[k]:.2f}s -> {q[k]:.2f}s")


if __name__ == "__main__":
    main()
