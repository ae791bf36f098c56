"""Deterministic waste detector: per-query job/stage/task counts and
scan/shuffle byte totals via the local Spark UI REST API.

Wall-clock on a noisy box lies; task counts and bytes do not. A query
whose lineage is re-derived N times shows ~N x the input bytes of one
scan of its tables; a query shuffling far more than its input is a
projection/partial-agg miss (guide §2.3). Use this to FIND waste, then
prove the fix with the plan diff and an interleaved timing probe.

Usage: python tools/profile_io.py SF_DIR query [query ...]
Prints one JSON line per query:
  {"query": q, "jobs": J, "stages": S, "tasks": T,
   "input_gb": .., "shuffle_write_gb": .., "sec": ..}

Known undercounts (ADVICE r17): the job count derives from each
stage's jobIds[0] via /stages (a stage shared by several jobs is
charged to its first, and stages lacking jobIds are dropped from the
job tally), and status=complete excludes SKIPPED stages — exactly the
AQE exchange-reuse stages a reuse-heavy plan produces. Treat "jobs" as
a lower bound and rely on tasks/bytes (complete stages only) for the
waste arithmetic; byte totals are unaffected because skipped stages
re-serve already-counted shuffle output rather than reading new input.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ui(spark) -> str:
    return spark.sparkContext.uiWebUrl


def _app_id(spark) -> str:
    return spark.sparkContext.applicationId


def _stages(spark) -> list[dict]:
    url = f"{_ui(spark)}/api/v1/applications/{_app_id(spark)}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as e
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="sds-profile-io")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in names:
        before = {s["stageId"]: s for s in _stages(spark)}
        t0 = time.time()
        spark.sparkContext.setJobDescription(name)
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        sec = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        new = [s for s in _stages(spark) if s["stageId"] not in before]
        rec = {
            "query": name,
            "stages": len(new),
            "jobs": len({s["jobIds"][0] for s in new if s.get("jobIds")}),
            "tasks": sum(s["numCompleteTasks"] for s in new),
            "input_gb": round(sum(s["inputBytes"] for s in new) / 2**30, 3),
            "shuffle_write_gb": round(
                sum(s["shuffleWriteBytes"] for s in new) / 2**30, 3),
            "sec": sec,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
