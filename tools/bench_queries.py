"""Time a named subset of registered queries at an arbitrary sf_dir.

The per-round bench (bench.py) times the whole registry; this tool is
for post-freeze additions that need scale datapoints without a full
soak re-run (the r9 protocol: «Scale datapoints for the two post-freeze
queries at sf3»). Same measurement rules as bench.py: noop-sink timing
(a bare .count() constant-folds 1-row results), one shared session,
each query timed cold-in-process in registry order.

Usage: python tools/bench_queries.py SF_DIR query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as e
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="sds-bench-subset")
    qs = e.queries()
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = round(time.time() - t0, 3)
        print(json.dumps({"query": name, "sec": out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "per_query_seconds": out}))


if __name__ == "__main__":
    main()
