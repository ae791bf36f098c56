"""Unit tests for operators/diff.py (snapshot_diff) and
operators/quality.py (check_expectations) on small controlled stores —
complementing the oracle-checked snapshot_diff_suppliers /
dq_checks_orders registered queries.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import Row, functions as F

from slowly_changing_dimensions_data_engineering_spark import schemas
from slowly_changing_dimensions_data_engineering_spark.operators.diff import snapshot_diff
from slowly_changing_dimensions_data_engineering_spark.operators.merge import merge_upsert
from slowly_changing_dimensions_data_engineering_spark.operators.quality import (
    check_expectations,
)
from slowly_changing_dimensions_data_engineering_spark.store import TableStore

KEY = ["supplier_code"]
CMP = ["supplier_state", "supplier_name", "supplier_key"]


def _rows(spark, spec):
    return spark.createDataFrame(
        [Row(supplier_key=k, supplier_code=c, supplier_name=n,
             supplier_state=s) for (k, c, n, s) in spec], schemas.SUPPLIER)


def test_snapshot_diff_insert_delete_update_and_noop(spark):
    store = TableStore(tempfile.mkdtemp())
    store.create("t", schemas.SUPPLIER)
    merge_upsert(store, spark, "t", _rows(spark, [
        (1, "A", "a", "NY"), (2, "B", "b", "CA"), (3, "C", "c", "TX")]),
        KEY, CMP)
    # v1: A updated, B kept identical (no-op), C gone, D new
    store.commit("t", _rows(spark, [
        (1, "A", "a", "NJ"), (2, "B", "b", "CA"), (4, "D", "d", "WA")]))

    d = snapshot_diff(store, spark, "t", 0, 1, KEY)
    got = {(r["supplier_code"], r["change_type"], r["supplier_state"])
           for r in d.collect()}
    assert got == {
        ("D", "insert", "WA"),
        ("C", "delete", "TX"),
        ("A", "update_preimage", "NY"),
        ("A", "update_postimage", "NJ"),
    }  # B (unchanged) emits nothing


def test_snapshot_diff_null_safe_compare_and_null_keys(spark):
    store = TableStore(tempfile.mkdtemp())
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, [
        (1, "A", None, "NY"), (2, None, "b", "CA")]))   # NULL name + NULL key
    store.commit("t", _rows(spark, [
        (1, "A", None, "NY"), (2, None, "b", "TX")]))   # only null-key row moved
    d = snapshot_diff(store, spark, "t", 0, 1, KEY)
    got = {(r["supplier_code"], r["change_type"]) for r in d.collect()}
    # NULL name == NULL name (null-safe): A is a no-op;
    # NULL key matches NULL key (eqNullSafe join): the null-key row is
    # an UPDATE pair, not a delete+insert
    assert got == {(None, "update_preimage"), (None, "update_postimage")}


def test_snapshot_diff_rejects_duplicate_keys(spark):
    store = TableStore(tempfile.mkdtemp())
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, [
        (1, "A", "a", "NY"), (1, "A", "a2", "CA")]))
    store.commit("t", _rows(spark, [(1, "A", "a", "NY")]))
    with pytest.raises(ValueError, match="duplicate keys"):
        snapshot_diff(store, spark, "t", 0, 1, KEY)


def test_check_expectations_counts_and_null_as_violation(spark):
    df = spark.createDataFrame(
        [Row(x=1, y="a"), Row(x=None, y="b"), Row(x=-3, y=None),
         Row(x=5, y="a")])
    out = {r["rule"]: (r["n_rows"], r["n_violations"], r["pass_frac"])
           for r in check_expectations(df, {
               "x_not_null": F.col("x").isNotNull(),
               "x_positive": F.col("x") > 0,       # NULL x -> violation
               "y_in_set": F.col("y").isin("a", "b"),
           }).collect()}
    assert out["x_not_null"] == (4, 1, 0.75)
    assert out["x_positive"] == (4, 2, 0.5)   # None and -3 both fail
    assert out["y_in_set"] == (4, 1, 0.75)    # NULL y fails
    with pytest.raises(ValueError):
        check_expectations(df, {})


def test_check_expectations_empty_frame_passes_explicitly(spark):
    """Empty-input contract (ADVICE r5): zero rows must yield
    n_violations=0 and pass_frac=1.0 — NOT NULL — so a gate like
    `n_violations == 0` passes an empty micro-batch vacuously instead
    of evaluating to unknown."""
    df = spark.createDataFrame([], "x int, y string")
    out = {r["rule"]: (r["n_rows"], r["n_violations"], r["pass_frac"])
           for r in check_expectations(df, {
               "x_not_null": F.col("x").isNotNull(),
               "y_in_set": F.col("y").isin("a", "b"),
           }).collect()}
    assert out["x_not_null"] == (0, 0, 1.0)
    assert out["y_in_set"] == (0, 0, 1.0)


def test_snapshot_diff_check_keys_false_skips_guard(spark):
    """check_keys=False (ADVICE r5 / VERDICT #6): the uniqueness guard
    and its two eager pre-aggregations are skipped. Same result on
    clean-keyed input; duplicate keys no longer raise (documented
    contract-violation mode)."""
    store = TableStore(tempfile.mkdtemp())
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, [(1, "A", "a", "NY")]))
    store.commit("t", _rows(spark, [(1, "A", "a", "NJ")]))
    got = {(r["supplier_code"], r["change_type"])
           for r in snapshot_diff(store, spark, "t", 0, 1, KEY,
                                  check_keys=False).collect()}
    assert got == {("A", "update_preimage"), ("A", "update_postimage")}

    dup = TableStore(tempfile.mkdtemp())
    dup.create("t", schemas.SUPPLIER)
    dup.commit("t", _rows(spark, [(1, "A", "a", "NY"), (2, "A", "a2", "CA")]))
    dup.commit("t", _rows(spark, [(1, "A", "a", "NY")]))
    # guard off: no raise (result is fan-out garbage by contract)
    snapshot_diff(dup, spark, "t", 0, 1, KEY, check_keys=False).collect()


def test_diff_as_cdc_feeds_scd2_like_the_stream(spark):
    """Round-trip interop: folding snapshot_diff(v0→v1) re-encoded via
    as_cdc through scd2_merge must produce the IDENTICAL staging state
    as consuming the store's actually-recorded change batch — the
    'reconstructed deltas behave like streamed ones' contract."""
    import datetime as dt

    from slowly_changing_dimensions_data_engineering_spark.operators.diff import as_cdc
    from slowly_changing_dimensions_data_engineering_spark.operators.scd2 import scd2_merge

    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    scd2_key = ["supplier_code", "supplier_state"]

    def build(consume):
        """Two-load store; staging fed by `consume(store, spark) -> batch2`."""
        store = TableStore(tempfile.mkdtemp())
        store.create("landing", schemas.SUPPLIER)
        store.create("staging", schemas.SUPPLIER_STAGING)
        merge_upsert(store, spark, "landing", _rows(spark, [
            (1, "A", "a", "NY"), (2, "B", "b", "CA")]), KEY, CMP)
        scd2_merge(store, spark, "staging",
                   store.read_changes(spark, "landing", -1), scd2_key, t1)
        off = store.version("landing")
        merge_upsert(store, spark, "landing", _rows(spark, [
            (1, "A", "a", "NJ"), (3, "C", "c", "TX")]), KEY, CMP)
        scd2_merge(store, spark, "staging", consume(store, off),
                   scd2_key, t2)
        return {(r["supplier_code"], r["supplier_state"], r["current_flag"],
                 r["start_date"], r["end_date"])
                for r in store.read(spark, "staging").collect()}

    streamed = build(lambda s, off: s.read_changes(spark, "landing", off))
    reconstructed = build(lambda s, off: as_cdc(
        snapshot_diff(s, spark, "landing", off, s.version("landing"), KEY),
        KEY))
    assert reconstructed == streamed
    assert len(streamed) == 4  # A closed+reopened, B untouched, C opened
