"""Assemble bench_history/r11_local.json from the bench_runs.jsonl
records emitted by bench.py, and print the cross-round comparison the
BENCH_NOTES r11 section quotes:

- common-set raw ratio vs bench_history/r9_local.json (r9_run1) and vs
  the BENCH_r10.json driver tail;
- sf0.1 -> sf3 -> sf10 per-query ratios, with the r10/r11-new queries
  (classifier family, trigram LM, stream-stream joins) called out;
- superlinear check: any query whose sf10/sf0.1 ratio exceeds 100x.

Usage: python tools/bench_report_r11.py [label=path.jsonl-offset ...]
(default: the last three records of bench_history/bench_runs.jsonl are
r11_sf01, r11_sf3, r11_sf10 in that order).
"""

from __future__ import annotations

import json
import os
import statistics

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "bench_history")

NEW_R10_R11 = [
    "classifier_train_rounds", "classifier_train_weights",
    "classifier_train_minibatch", "classifier_trained_scores",
    "lm_trigram_perplexity_docs", "streaming_click_attribution",
    "streaming_click_attribution_outer",
]


def _tail_queries(path: str) -> dict:
    """Parse the driver's BENCH_r*.json: the per-query dict is a
    TRUNCATED tail fragment under "tail" (the front of the JSON line is
    cut off), so recover the complete trailing "name": sec pairs."""
    import re
    tail = json.load(open(path)).get("tail", "")
    return {m.group(1): float(m.group(2)) for m in re.finditer(
        r'"([a-z0-9_]+)": ([0-9.]+)', tail)}


def main() -> None:
    with open(os.path.join(HIST, "bench_runs.jsonl")) as f:
        runs = [json.loads(line) for line in f if line.strip()]
    # FIRST record per sf = the freeze-time soak triple the BENCH_NOTES
    # r11 section quotes; the LAST sf0.1 record (if later and larger)
    # is the post-freeze full registry, written under its own key so
    # the quoted numbers stay reproducible.
    by_sf: dict[float, dict] = {}
    for r in runs:
        by_sf.setdefault(r["sf"], r)
    sf01, sf3, sf10 = by_sf.get(0.1), by_sf.get(3.0), by_sf.get(10.0)
    assert sf01, "no sf0.1 record in bench_runs.jsonl"
    last01 = [r for r in runs if r["sf"] == 0.1][-1]

    out = {}
    for label, rec in (("r11_sf01", sf01), ("r11_sf3", sf3),
                       ("r11_sf10", sf10),
                       ("r11_sf01_final",
                        last01 if last01 is not sf01 else None)):
        if rec is None:
            continue
        out[label] = {
            "total": rec["total_sec"], "calib_sec": rec["calib_sec"],
            "n_queries": rec["n_queries"],
            "per_query_seconds": rec["per_query_seconds"],
        }
    path = os.path.join(HIST, "r11_local.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {list(out)}")

    cur = sf01["per_query_seconds"]
    print(f"\nsf0.1: total {sf01['total_sec']}s, {sf01['n_queries']} "
          f"queries, calib {sf01['calib_sec']}")

    # vs r9_run1 (the committed arbiter) and vs the BENCH_r10 tail
    for name, ref in (
        ("r9_local.json:r9_run1",
         json.load(open(os.path.join(HIST, "r9_local.json")))
         ["r9_run1"]["per_query_seconds"]),
        ("BENCH_r10.json tail",
         _tail_queries(os.path.join(ROOT, "BENCH_r10.json"))),
    ):
        common = sorted(set(cur) & set(ref))
        if not common:
            print(f"vs {name}: no common queries")
            continue
        tot_c = sum(cur[q] for q in common)
        tot_r = sum(ref[q] for q in common)
        ratios = sorted((cur[q] / ref[q], q) for q in common
                        if ref[q] > 0.05)
        print(f"vs {name}: {len(common)} common, raw total ratio "
              f"{tot_c / tot_r:.3f} ({tot_c:.1f}s vs {tot_r:.1f}s); "
              f"median per-query {statistics.median(r for r, _ in ratios):.2f}; "
              f"worst {ratios[-1][0]:.2f}x ({ratios[-1][1]}), "
              f"best {ratios[0][0]:.2f}x ({ratios[0][1]})")

    for label, rec, mult in (("sf3 (30x)", sf3, 30), ("sf10 (100x)", sf10, 100)):
        if rec is None:
            continue
        pq = rec["per_query_seconds"]
        common = sorted(set(cur) & set(pq))
        ratios = {q: pq[q] / cur[q] for q in common if cur[q] > 0.03}
        med = statistics.median(ratios.values())
        worst = max(ratios.items(), key=lambda kv: kv[1])
        sup = [q for q, r in ratios.items() if r > mult]
        print(f"\n{label}: total {rec['total_sec']}s over "
              f"{rec['n_queries']} queries (calib {rec['calib_sec']}); "
              f"median ratio {med:.2f}x, max {worst[1]:.1f}x ({worst[0]}), "
              f"superlinear(> {mult}x): {sup or 'none'}")
        for q in NEW_R10_R11:
            if q in pq and q in cur:
                print(f"  {q}: {cur[q]:.2f}s -> {pq[q]:.2f}s "
                      f"({pq[q] / max(cur[q], 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
