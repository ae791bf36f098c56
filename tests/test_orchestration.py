"""T1/T3/T4 orchestration + S1 gzip ingest + D1 catalog introspection
(VERDICT r1 #9, #10, and the D1 gap).

- T1: the schedule loop actually cycles (interval 0, bounded).
- T3: resume()/suspend() lifecycle — background schedule starts, runs,
  stops after the in-flight cycle, and can be resumed again.
- T4: task_history() returns SUCCEEDED runs newest-first.
- S1/COMPRESSION='AUTO': a staged .csv.gz loads through COPY INTO
  (Setup.sql:91 loads a gzip; Spark auto-detects by extension).
- D1: SHOW TABLES / SHOW STREAMS (Setup.sql:60).
"""

from __future__ import annotations

import gzip
import shutil
import time

from pyspark.sql import functions as F

from slowly_changing_dimensions_data_engineering_spark.pipeline import (
    LANDING, RAW, STAGING, SupplierPipeline,
)
from slowly_changing_dimensions_data_engineering_spark.sources.csv import copy_into


def _pipeline(spark, tmp_path) -> SupplierPipeline:
    p = SupplierPipeline(spark, str(tmp_path))
    p.setup()
    return p


def test_scheduled_runs_and_task_history(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    p.stage.put("/root/reference/suppliers.csv")
    runs = p.run_scheduled(interval_sec=0, max_cycles=2)
    assert len(runs) == 2
    # load 1 landed; cycle 2 saw an empty stage (purge) and no-oped
    assert p.store.read(spark, STAGING).count() == 6

    hist = p.task_history()
    assert len(hist) == 2
    assert all(r["state"] == "SUCCEEDED" for r in hist)
    times = [r["completed_time"] for r in hist]
    assert times == sorted(times, reverse=True)  # ORDER BY COMPLETED_TIME DESC


def test_resume_suspend_lifecycle(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    p.stage.put("/root/reference/suppliers.csv")

    p.resume(interval_sec=0.05)
    p.resume(interval_sec=0.05)  # idempotent second RESUME
    deadline = time.time() + 60
    while not p.task_history() and time.time() < deadline:
        time.sleep(0.1)
    p.suspend()
    assert not p.is_running
    n = len(p.task_history())
    assert n >= 1
    assert p.store.read(spark, STAGING).count() == 6

    # suspended = no more cycles
    time.sleep(0.3)
    assert len(p.task_history()) == n

    # RESUME again (reference resumes tasks after suspension)
    p.stage.put("/root/reference/suppliers_v2.csv")
    p.resume(interval_sec=0.05)
    deadline = time.time() + 60
    while p.store.read(spark, STAGING).count() != 10 and time.time() < deadline:
        time.sleep(0.2)
    assert p.suspend() is True
    assert p.store.read(spark, STAGING).count() == 10


def test_suspend_timeout_keeps_handles(tmp_path):
    """A suspend that times out while a cycle is in flight must NOT
    clear the stop/thread handles (the worker would re-read a None stop
    and the loop would become unstoppable). It reports False, the flag
    stays set, and a later suspend completes the shutdown."""
    import time as _time

    from slowly_changing_dimensions_data_engineering_spark.pipeline import SupplierPipeline

    class SlowPipeline(SupplierPipeline):
        def __init__(self, root):  # no Spark needed — cycles are faked
            self.cycles = 0
            self._runs_path = str(root / "runs.jsonl")

        def run_cycle(self, now=None, purge=True):
            self.cycles += 1
            _time.sleep(0.5)
            return {"state": "SUCCEEDED"}

        @property
        def stage(self):
            raise AssertionError("not used")

    p = SlowPipeline(tmp_path)
    p.resume(interval_sec=30.0)
    _time.sleep(0.1)  # worker is inside its first (slow) cycle
    assert p.suspend(timeout=0.05) is False
    assert p.is_running  # handles kept, flag set
    assert p.suspend(timeout=10.0) is True
    assert not p.is_running and p.cycles == 1


def test_gzip_staged_load(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    gz = tmp_path / "suppliers.csv.gz"
    with open("/root/reference/suppliers.csv", "rb") as fin, \
            gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    p.stage.put(str(gz))
    copy_into(p.store, spark, RAW, p.stage, purge=True)
    raw = p.store.read(spark, RAW)
    assert raw.count() == 6
    assert raw.filter(F.col("supplier_code") == "A101").count() == 1
    assert p.stage.list() == []  # PURGE=TRUE removed the gz


def test_show_tables_and_streams(spark, tmp_path):
    p = _pipeline(spark, tmp_path)
    assert p.store.show_tables() == [
        "supplier_landing", "supplier_master", "supplier_raw",
        "supplier_staging"]
    assert p.store.show_streams() == []  # no changes committed yet
    p.stage.put("/root/reference/suppliers.csv")
    p.run_cycle()
    # the landing merge attached a CDC batch -> the stream is visible
    assert p.store.show_streams() == [LANDING]


def test_catalog_namespaces(spark, tmp_path):
    """D1 — CREATE DATABASE/SCHEMA/USE (Setup.sql:5-10): namespaced
    stores are isolated; catalog introspection lists them."""
    from slowly_changing_dimensions_data_engineering_spark import schemas
    from slowly_changing_dimensions_data_engineering_spark.store import Catalog

    cat = Catalog(str(tmp_path / "warehouse"))
    scd = cat.create_database("scd_type2", "scd")
    other = cat.create_database("analytics")
    assert cat.show_databases() == ["analytics", "scd_type2"]
    assert cat.show_schemas("scd_type2") == ["scd"]

    scd.create("supplier_raw", schemas.SUPPLIER)
    assert scd.show_tables() == ["supplier_raw"]
    assert other.show_tables() == []          # namespaces are isolated
    assert cat.database("scd_type2", "scd").show_tables() == ["supplier_raw"]

    cat.drop_database("analytics")
    assert cat.show_databases() == ["scd_type2"]


def test_maintenance_task_is_data_neutral_and_retires_changes(spark, tmp_path):
    """task6_maintenance: compaction + vacuum + change retention after
    two load cycles leaves every pipeline table's CONTENT untouched,
    retires exactly the consumed change batches (none unread), and the
    next cycle still runs clean on the maintained store."""
    import datetime as dt

    p = _pipeline(spark, tmp_path)
    p.stage.put("/root/reference/suppliers.csv")
    p.run_cycle(now=dt.datetime(2024, 1, 1))
    p.stage.put("/root/reference/suppliers_v2.csv")
    p.run_cycle(now=dt.datetime(2024, 2, 1))

    staging_before = {(r["supplier_code"], r["supplier_state"],
                       r["current_flag"]) for r in
                      p.store.read(spark, STAGING).collect()}
    offset = p.store.get_offset("scd2")
    assert p.store.change_versions(LANDING, -1)  # batches exist pre-GC

    out = p.task6_maintenance(keep_versions=1)
    # consumed batches retired; nothing unread existed, so ALL are gone
    assert out["changes_retired"]
    assert p.store.change_versions(LANDING, -1) == []
    # unread batches would have survived: offset equals landing head
    assert offset == p.store.version(LANDING)

    after = {(r["supplier_code"], r["supplier_state"], r["current_flag"])
             for r in p.store.read(spark, STAGING).collect()}
    assert after == staging_before
    assert p.store.read(spark, "supplier_master").count() == 8

    # the maintained store still takes the next cycle (re-load v2: no-op)
    p.stage.put("/root/reference/suppliers_v2.csv")
    p.run_cycle(now=dt.datetime(2024, 3, 1))
    assert p.store.read(spark, STAGING).count() == 10


def test_bench_summary_line_is_compact_and_parseable():
    """The bench's FINAL stdout line is the driver's machine-readable
    total; its tail capture truncates long lines from the FRONT (this
    silently cost rounds 4 and 5 their recorded totals). Pin the
    contract: exactly the five summary keys, no embedded per-query
    dict, and comfortably under 200 chars even with a big registry."""
    import json as _json

    import bench

    timings = {f"query_{i:03d}": 123.456 for i in range(200)}
    line = bench.summary_line(timings, 0.1, calib=1.234)
    assert len(line) < 200, len(line)
    parsed = _json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "n_queries", "sf",
                           "calib_sec"}
    assert parsed["n_queries"] == 200
    assert parsed["value"] == round(123.456 * 200, 3)
    assert parsed["calib_sec"] == 1.234
    # calib omitted (older callers) still parses with the five base keys
    base = _json.loads(bench.summary_line(timings, 0.1))
    assert set(base) == {"metric", "value", "unit", "n_queries", "sf"}
