"""Late-arriving SCD2 backdate splice (operators/scd2.py::plan_scd2_backdate
/ scd2_backdate_splice) — every documented semantic pinned:

mid-interval splice, idempotent re-assertion (null-safe), restatement at
E == start (no degenerate stub), early-E closed stub, post-closed-chain
open row, unknown-key open row, latest-eff dedupe, and the bucket-pruned
store path (only buckets holding corrected keys rewrite).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from slowly_changing_dimensions_data_engineering_spark.operators.scd2 import (
    plan_scd2_backdate, scd2_backdate_splice,
)

T = dt.datetime.fromisoformat

STG_SCHEMA = ("code string, state string, start_date timestamp_ntz, "
              "end_date timestamp_ntz, current_flag string")
CORR_SCHEMA = "code string, state string, effective_ts timestamp"


def _stg(spark):
    return spark.createDataFrame(
        [("A", "CA", T("2024-01-01"), T("2024-02-01"), "N"),
         ("A", "AZ", T("2024-02-01"), None, "Y"),
         ("B", "NY", T("2024-01-01"), None, "Y"),
         ("C", "TX", T("2024-01-01"), T("2024-03-01"), "N")],
        STG_SCHEMA)


def _run(spark, stg_rows, corr_rows):
    stg = spark.createDataFrame(stg_rows, STG_SCHEMA)
    corr = spark.createDataFrame(corr_rows, CORR_SCHEMA)
    out = plan_scd2_backdate(stg, corr, ["code"], ["state"])
    return sorted(tuple(r) for r in out.collect())


def test_mid_interval_splice_and_noop(spark):
    corr = spark.createDataFrame(
        [("A", "OR", T("2024-01-15")),   # mid v1 -> splice
         ("B", "NY", T("2024-01-20"))],  # same state -> no-op
        CORR_SCHEMA)
    out = sorted(tuple(r) for r in
                 plan_scd2_backdate(_stg(spark), corr,
                                    ["code"], ["state"]).collect())
    assert out == [
        ("A", "AZ", T("2024-02-01"), None, "Y"),          # v2 untouched
        ("A", "CA", T("2024-01-01"), T("2024-01-15"), "N"),  # head closed at E
        ("A", "OR", T("2024-01-15"), T("2024-02-01"), "N"),  # spliced, inherits end
        ("B", "NY", T("2024-01-01"), None, "Y"),          # no-op
        ("C", "TX", T("2024-01-01"), T("2024-03-01"), "N"),
    ]


def test_restatement_at_exact_start_emits_no_empty_stub(spark):
    out = _run(spark,
               [("A", "CA", T("2024-01-01"), None, "Y")],
               [("A", "OR", T("2024-01-01"))])
    assert out == [("A", "OR", T("2024-01-01"), None, "Y")]


def test_early_effective_inserts_closed_stub(spark):
    out = _run(spark,
               [("A", "CA", T("2024-02-01"), None, "Y")],
               [("A", "OR", T("2024-01-01"))])
    assert out == [
        ("A", "CA", T("2024-02-01"), None, "Y"),
        ("A", "OR", T("2024-01-01"), T("2024-02-01"), "N"),
    ]


def test_after_fully_closed_chain_opens_version(spark):
    out = _run(spark,
               [("C", "TX", T("2024-01-01"), T("2024-03-01"), "N")],
               [("C", "WA", T("2024-04-01"))])
    assert out == [
        ("C", "TX", T("2024-01-01"), T("2024-03-01"), "N"),
        ("C", "WA", T("2024-04-01"), None, "Y"),
    ]


def test_unknown_key_opens_version(spark):
    out = _run(spark, [("A", "CA", T("2024-01-01"), None, "Y")],
               [("D", "NV", T("2024-01-10"))])
    assert ("D", "NV", T("2024-01-10"), None, "Y") in out


def test_latest_effective_wins_dedupe(spark):
    out = _run(spark,
               [("A", "CA", T("2024-01-01"), None, "Y")],
               [("A", "ZZ", T("2024-01-05")),
                ("A", "OR", T("2024-01-15"))])  # later eff wins
    assert out == [
        ("A", "CA", T("2024-01-01"), T("2024-01-15"), "N"),
        ("A", "OR", T("2024-01-15"), None, "Y"),
    ]


def test_null_state_reassertion_is_noop(spark):
    # null-SAFE comparison: re-asserting a NULL state is a no-op, not a
    # splice (documented divergence from the merge path's J3 guard)
    out = _run(spark,
               [("A", None, T("2024-01-01"), None, "Y")],
               [("A", None, T("2024-01-15"))])
    assert out == [("A", None, T("2024-01-01"), None, "Y")]


def test_store_splice_is_bucket_pruned(spark, tmp_path):
    from pyspark.sql import types as Ty

    from slowly_changing_dimensions_data_engineering_spark.store import TableStore

    store = TableStore(str(tmp_path / "bd_store"))
    schema = Ty.StructType([
        Ty.StructField("code", Ty.StringType()),
        Ty.StructField("state", Ty.StringType()),
        Ty.StructField("start_date", Ty.TimestampNTZType()),
        Ty.StructField("end_date", Ty.TimestampNTZType()),
        Ty.StructField("current_flag", Ty.StringType())])
    store.create("staging", schema, bucket_by=(["code"], 4))
    store.commit_buckets("staging", _stg(spark), range(4))

    import os

    corr = spark.createDataFrame([("A", "OR", T("2024-01-15"))], CORR_SCHEMA)
    scd2_backdate_splice(store, spark, "staging", corr, ["code"], ["state"])

    # only A's bucket materialized in the new version dir (the
    # test_bucketed_store convention: untouched buckets keep their
    # pointers into prior versions)
    vdir = store._vdir("staging", store.version("staging"))
    written = sorted(d for d in os.listdir(vdir) if d.startswith("_bucket="))
    assert len(written) == 1

    rows = sorted(tuple(r) for r in
                  store.read(spark, "staging").collect())
    assert ("A", "OR", T("2024-01-15"), T("2024-02-01"), "N") in rows
    assert ("A", "CA", T("2024-01-01"), T("2024-01-15"), "N") in rows
    assert ("B", "NY", T("2024-01-01"), None, "Y") in rows


def test_null_effective_ts_correction_is_dropped(spark):
    # ADVICE r14 #1: a NULL effective_ts covers no interval — it must be
    # rejected outright, not fall through the orphan arm as an open row
    # with NULL start_date beside the existing current version.
    out = _run(spark,
               [("A", "CA", T("2024-01-01"), None, "Y")],
               [("A", "OR", None)])
    assert out == [("A", "CA", T("2024-01-01"), None, "Y")]


def test_dedupe_tie_break_covers_noncompared_payload(spark):
    # ADVICE r14 #2: two corrections tying on eff AND every cmp column
    # but differing in a non-compared payload column must pick ONE
    # deterministic survivor (desc order over the remaining payload).
    schema = ("code string, state string, name string, "
              "start_date timestamp_ntz, end_date timestamp_ntz, "
              "current_flag string")
    stg = spark.createDataFrame(
        [("A", "CA", "old", T("2024-01-01"), None, "Y")], schema)
    corr = spark.createDataFrame(
        [("A", "OR", "alpha", T("2024-01-15")),
         ("A", "OR", "zeta", T("2024-01-15"))],
        "code string, state string, name string, effective_ts timestamp")
    outs = set()
    for _ in range(3):
        out = plan_scd2_backdate(stg, corr, ["code"], ["state"])
        outs.add(tuple(sorted(tuple(r) for r in out.collect())))
    assert len(outs) == 1
    spliced = [r for r in next(iter(outs)) if r[1] == "OR"]
    assert spliced[0][2] == "zeta"  # desc tie-break on the payload col


def test_idempotent_reapply(spark):
    # applying the same correction to the already-spliced table is a
    # no-op (the spliced version now covers E with the corrected state)
    stg = [("A", "CA", T("2024-01-01"), T("2024-02-01"), "N"),
           ("A", "AZ", T("2024-02-01"), None, "Y")]
    corr = [("A", "OR", T("2024-01-15"))]
    once = _run(spark, stg, corr)
    twice = _run(spark, [tuple(r) for r in once], corr)
    assert once == twice
