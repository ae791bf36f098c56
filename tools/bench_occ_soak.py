"""Sustained multi-writer OCC soak (VERDICT r16 #7).

The two-thread contention drills (tests/test_concurrency.py) prove the
protocol's correctness at one interleaving each; this tool measures the
lock + conflict-retry path UNDER SUSTAINED LOAD and checks the global
invariants a production multi-writer deployment rests on:

- **throughput**: N writer threads x M merge_upsert commits each into
  ONE bucketed table; every writer updates its own key group (disjoint
  buckets where the hash allows) PLUS one shared hot key, so every
  commit risks a true bucket conflict with every concurrent commit;
- **zero lost updates**: every successful commit's assigned version is
  recorded; the set must be exactly {1..total} with no duplicates (two
  commits sharing a version = one silently overwrote the other), and
  the final table state must equal the max-version writer's value on
  the hot key and each writer's own last value on its private keys;
- **bounded retry depth**: ConcurrentCommitError raises are counted
  per merge call (max consecutive = the starvation measure);
- **zero double-consumed stream batches**: K concurrent
  merge_from_stream consumers drain B appended CDC batches of +1-row
  inserts; the staging table must end with exactly the union of all
  batch rows (a double-apply would violate SCD2 key uniqueness of
  current rows; a drop would lose rows).

Usage: python tools/bench_occ_soak.py [writers] [commits] [consumers] [batches]
Prints one JSON summary line (the BENCH_NOTES row).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 8


def main() -> None:
    writers = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    commits = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    consumers = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    batches = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    from pyspark.sql import Row

    from slowly_changing_dimensions_data_engineering_spark import schemas, store as store_mod
    from slowly_changing_dimensions_data_engineering_spark.operators.merge import merge_upsert
    from slowly_changing_dimensions_data_engineering_spark.operators.scd2 import (
        merge_from_stream,
    )
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark
    from slowly_changing_dimensions_data_engineering_spark.store import TableStore

    spark = get_spark(app_name="sds-occ-soak", cpus=8, shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="occ_soak_")
    store = TableStore(root)

    KEY = ["supplier_code"]
    CMP = ["supplier_state", "supplier_name", "supplier_key"]

    def rows(spec):
        return spark.createDataFrame(
            [Row(supplier_key=k, supplier_code=f"S{k}",
                 supplier_name=f"name{k}", supplier_state=st)
             for k, st in spec], schemas.SUPPLIER)

    # ---- phase 1: N x M merge storm on one bucketed table ----------
    store.create("t", schemas.SUPPLIER, bucket_by=(KEY, N_BUCKETS))
    merge_upsert(store, spark, "t",
                 rows([(k, "seed") for k in range(writers + 1)]), KEY, CMP)
    hot = writers  # every writer also updates S{hot}

    # instrument: count ConcurrentCommitError raises from commits and
    # the max consecutive conflicts one merge call absorbed
    conflicts = {"total": 0}
    local = threading.local()
    real = {m: getattr(TableStore, m)
            for m in ("commit", "commit_append", "commit_buckets")}

    def counting(method):
        def wrapper(self, *a, **kw):
            try:
                v = real[method](self, *a, **kw)
            except store_mod.ConcurrentCommitError:
                conflicts["total"] += 1
                local.streak = getattr(local, "streak", 0) + 1
                local.max_streak = max(getattr(local, "max_streak", 0),
                                       local.streak)
                raise
            local.streak = 0
            return v
        return wrapper

    for m in real:
        setattr(TableStore, m, counting(m))
    versions: list[tuple[int, int, int]] = []  # (version, writer, i)
    errors: list[str] = []
    max_streaks: list[int] = []
    lock = threading.Lock()

    def writer_loop(w: int) -> None:
        try:
            for i in range(commits):
                v = merge_upsert(
                    store, spark, "t",
                    rows([(w, f"w{w}i{i}"), (hot, f"hot-w{w}i{i}")]),
                    KEY, CMP, occ_retries=100)
                with lock:
                    versions.append((v, w, i))
        except Exception as ex:  # noqa: BLE001 — recorded, asserted below
            errors.append(f"w{w}: {ex!r}")
        finally:
            with lock:
                max_streaks.append(getattr(local, "max_streak", 0))

    t0 = time.time()
    ts = [threading.Thread(target=writer_loop, args=(w,))
          for w in range(writers)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    storm_sec = time.time() - t0
    for m, fn in real.items():
        setattr(TableStore, m, fn)

    total = writers * commits
    vs = sorted(v for v, _w, _i in versions)
    assert not errors, errors
    assert len(versions) == total, (len(versions), total)
    # zero lost updates: versions strictly unique and contiguous
    assert vs == list(range(1, total + 1)), (vs[:5], vs[-5:])
    final = {r["supplier_code"]: r["supplier_state"]
             for r in store.read(spark, "t").collect()}
    # hot key = the max-version commit's value (as-if-serial winner)
    win_v, win_w, win_i = max(versions)
    assert final[f"S{hot}"] == f"hot-w{win_w}i{win_i}", (
        final[f"S{hot}"], win_v, win_w, win_i)
    # each writer's own key shows its LAST commit (its thread is serial)
    for w in range(writers):
        assert final[f"S{w}"] == f"w{w}i{commits - 1}", (w, final[f"S{w}"])

    # ---- phase 2: K concurrent merge_from_stream consumers ---------
    # An appender feeds CDC batches WHILE K instances of the composed
    # task4 statement race to consume them; each pending batch must be
    # merged exactly once (a double-apply would duplicate an SCD2
    # current row; a drop would lose one).
    store.create("base", schemas.SUPPLIER)
    store.create("staging", schemas.SUPPLIER_STAGING)
    scd2_key = ["supplier_code", "supplier_state"]
    now = dt.datetime(2024, 1, 1, 12, 0, 0)
    cerrors: list[str] = []
    done = threading.Event()

    def appender() -> None:
        try:
            for b in range(batches):
                merge_upsert(store, spark, "base",
                             rows([(1000 + b, f"b{b}")]), KEY, CMP)
                time.sleep(0.05)
        except Exception as ex:  # noqa: BLE001
            cerrors.append(f"appender: {ex!r}")
        finally:
            done.set()

    def consumer_loop(c: int) -> None:
        try:
            while not (done.is_set()
                       and store.get_offset("soak", table="staging")
                       >= max(store.change_versions("base", -1))):
                merge_from_stream(store, spark, "staging", "base",
                                  "soak", scd2_key, now,
                                  occ_retries=consumers * 4)
        except Exception as ex:  # noqa: BLE001
            import traceback
            cerrors.append(f"c{c}: {ex!r}\n{traceback.format_exc()}")

    t1 = time.time()
    ap = threading.Thread(target=appender)
    cs = [threading.Thread(target=consumer_loop, args=(c,))
          for c in range(consumers)]
    ap.start()
    for t in cs:
        t.start()
    ap.join()
    for t in cs:
        t.join()
    stream_sec = time.time() - t1

    assert not cerrors, cerrors
    cur = store.read(spark, "staging").filter("current_flag = 'Y'")
    got = sorted(r["supplier_code"] for r in cur.collect())
    want = sorted(f"S{1000 + b}" for b in range(batches))
    # exactly-once: every batch row present ONCE, none doubled/dropped
    assert got == want, (got, want)

    print(json.dumps({
        "writers": writers, "commits_per_writer": commits,
        "total_commits": total, "storm_sec": round(storm_sec, 1),
        "commits_per_sec": round(total / storm_sec, 2),
        "conflict_retries_total": conflicts["total"],
        "max_retry_depth": max(max_streaks),
        "lost_updates": 0, "version_holes": 0,
        "stream_consumers": consumers, "stream_batches": batches,
        "double_consumed_batches": 0,
        "stream_drain_sec": round(stream_sec, 1),
    }))


if __name__ == "__main__":
    main()
