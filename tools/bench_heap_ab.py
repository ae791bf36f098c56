"""Same-box A/B of the driver-heap default over the r16 regression
movers (VERDICT r16 #2 protocol).

The r16 sf0.1 common-set regressed 1.12x vs r15 at equal calibration
with every mover in code-untouched families (tokenizer_train 1.77x,
classifier_minibatch 1.85x, tfidf 2.42x, minhash 1.5-1.6x); the prime
code suspect is the 32g driver-heap default (commit dc0ed1d — a 4x
heap changes GC cadence at small sf). This tool measures exactly that:
each (heap, repeat) run is a COLD subprocess (fresh JVM) executing the
mover pools via tools/bench_queries.py with SPARK_GRAFT_DRIVER_MEM
pinned, interleaved A/B/A/B so slow box drift cancels.

Usage: python tools/bench_heap_ab.py [SF_DIR] [repeats]
Prints per-run pool totals and the median 32g/8g ratio per pool.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

POOLS = {
    "tokenizer_train": [
        "bpe_train_merges", "bpe_vocab_segmentation", "bpe_corpus_tokens",
        "bpe_fertility_by_source", "bpe_token_stats",
        "unigram_lm_train", "unigram_lm_segmentation",
        "unigram_corpus_tokens", "unigram_fertility_vs_bpe"],
    "classifier_minibatch": [
        "classifier_train_minibatch", "classifier_minibatch_weights"],
    "tfidf": ["tfidf_top_terms"],
    "minhash": ["minhash_lsh_candidates", "minhash_near_dups",
                "minhash_incremental_dedup"],
}


def run_once(sf_dir: str, heap: str) -> dict[str, float]:
    names = [n for qs in POOLS.values() for n in qs]
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_queries.py"),
         sf_dir] + names,
        env=env, capture_output=True, text=True, check=True)
    last = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{") and "per_query_seconds" in ln][-1]
    per = json.loads(last)["per_query_seconds"]
    return {pool: round(sum(per[n] for n in qs), 3)
            for pool, qs in POOLS.items()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs: dict[str, list[dict[str, float]]] = {"8g": [], "32g": []}
    for i in range(repeats):
        for heap in ("8g", "32g"):  # interleaved: box drift cancels
            r = run_once(sf_dir, heap)
            runs[heap].append(r)
            print(json.dumps({"repeat": i, "heap": heap, "pools": r}),
                  flush=True)
    summary = {}
    for pool in POOLS:
        a = statistics.median(r[pool] for r in runs["8g"])
        b = statistics.median(r[pool] for r in runs["32g"])
        summary[pool] = {"8g_median_sec": round(a, 3),
                         "32g_median_sec": round(b, 3),
                         "ratio_32g_over_8g": round(b / a, 3)}
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats,
                      "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
