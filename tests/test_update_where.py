"""update_where (DML UPDATE with CDC emission) + stabilize strategies.

Coverage mirrors delete_where's suite (ADVICE r4): CDC pair encoding
(shared ROW_ID, ISUPDATE=true), pre-image SET semantics (swap), NULL
predicates, the bucketed pruned rewrite, the bucket-column-assignment
full-rewrite fallback — plus the single-evaluation contract for
nondeterministic SET expressions and the ``spark.sds.stabilize.mode``
knob (VERDICT r4 #5), including the reliable-checkpoint path.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import Row, functions as F

from slowly_changing_dimensions_data_engineering_spark import schemas
from slowly_changing_dimensions_data_engineering_spark.operators.merge import (
    merge_upsert, update_where,
)
from slowly_changing_dimensions_data_engineering_spark.session import (
    STABILIZE_MODE_CONF, stabilize,
)
from slowly_changing_dimensions_data_engineering_spark.store import TableStore, bucket_id

KEY = ["supplier_code"]
CMP = ["supplier_state", "supplier_name", "supplier_key"]
N_BUCKETS = 8


def _supplier_rows(spark, keys):
    return spark.createDataFrame(
        [Row(supplier_key=k, supplier_code=f"S{k}", supplier_name=f"name{k}",
             supplier_state=f"state{k % 4}") for k in keys],
        schemas.SUPPLIER)


def _store(spark, n=10, bucket_by=None):
    store = TableStore(tempfile.mkdtemp())
    store.create("t", schemas.SUPPLIER, bucket_by=bucket_by)
    merge_upsert(store, spark, "t", _supplier_rows(spark, range(n)), KEY, CMP)
    return store


def test_update_where_cdc_pair_encoding(spark):
    store = _store(spark)
    v0 = store.version("t")
    v = update_where(store, spark, "t", "supplier_key % 3 = 0",
                     {"supplier_name": F.upper("supplier_name")}, KEY)
    assert v == v0 + 1

    got = {r["supplier_key"]: r["supplier_name"]
           for r in store.read(spark, "t").collect()}
    assert got[3] == "NAME3" and got[4] == "name4" and len(got) == 10

    ch = store.read_changes(spark, "t", v0).collect()
    # one DELETE pre-image + one INSERT post-image per updated row,
    # both ISUPDATE=true, sharing a ROW_ID (the stream's update pair)
    assert len(ch) == 8  # 4 updated rows (0,3,6,9) × 2
    assert all(r["METADATA$ISUPDATE"] is True for r in ch)
    by_rid: dict[str, list] = {}
    for r in ch:
        by_rid.setdefault(r["METADATA$ROW_ID"], []).append(r)
    assert len(by_rid) == 4
    for pair in by_rid.values():
        actions = sorted(p["METADATA$ACTION"] for p in pair)
        assert actions == ["DELETE", "INSERT"]
        pre = next(p for p in pair if p["METADATA$ACTION"] == "DELETE")
        post = next(p for p in pair if p["METADATA$ACTION"] == "INSERT")
        assert post["supplier_name"] == pre["supplier_name"].upper()

    # pre-update snapshot still readable (time travel)
    old = {r["supplier_key"]: r["supplier_name"]
           for r in store.read(spark, "t", version=v0).collect()}
    assert old[3] == "name3"
    # no-match predicate → no-op: no commit, no change batch
    assert update_where(store, spark, "t", "supplier_key = 999",
                        {"supplier_name": F.lit("x")}, KEY) == v
    assert store.change_versions("t", v) == []


def test_update_where_swap_reads_pre_image(spark):
    """All assignments see PRE-update values: {'a': b, 'b': a} swaps."""
    store = _store(spark, n=3)
    update_where(store, spark, "t", "supplier_key = 1",
                 {"supplier_name": F.col("supplier_state"),
                  "supplier_state": F.col("supplier_name")}, KEY)
    r = {x["supplier_key"]: x for x in store.read(spark, "t").collect()}
    assert r[1]["supplier_name"] == "state1"
    assert r[1]["supplier_state"] == "name1"
    assert r[2]["supplier_name"] == "name2"  # untouched


def test_update_where_null_predicate_rows_untouched(spark):
    store = TableStore(tempfile.mkdtemp())
    store.create("t", schemas.SUPPLIER)
    rows = spark.createDataFrame(
        [Row(supplier_key=1, supplier_code="S1", supplier_name=None,
             supplier_state="X"),
         Row(supplier_key=2, supplier_code="S2", supplier_name="hit",
             supplier_state="X")], schemas.SUPPLIER)
    merge_upsert(store, spark, "t", rows, KEY, CMP)
    update_where(store, spark, "t", "supplier_name = 'hit'",
                 {"supplier_state": F.lit("updated")}, KEY)
    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "t").collect()}
    # S1's NULL name makes the predicate NULL — SQL UPDATE skips it
    assert got == {"S1": "X", "S2": "updated"}


def test_update_where_unknown_set_column_raises(spark):
    store = _store(spark, n=2)
    with pytest.raises(ValueError, match="SET columns"):
        update_where(store, spark, "t", "supplier_key = 1",
                     {"nope": F.lit(1)}, KEY)


def test_update_where_bucketed_rewrites_only_matching_buckets(spark):
    store = _store(spark, n=64, bucket_by=(KEY, N_BUCKETS))
    pointers_before = dict(store._read_meta("t")["buckets"])
    v = update_where(store, spark, "t", "supplier_code = 'S7'",
                     {"supplier_name": F.lit("renamed")}, KEY)
    vdir = store._vdir("t", v)
    written = sorted(d for d in os.listdir(vdir) if d.startswith("_bucket="))
    expected = spark.createDataFrame([("S7",)], ["supplier_code"]) \
        .select(bucket_id(KEY, N_BUCKETS).alias("b")).head()["b"]
    assert written == [f"_bucket={expected}"]
    after = store._read_meta("t")["buckets"]
    assert [k for k in after if after[k] != pointers_before[k]] == [str(expected)]
    got = {r["supplier_code"]: r["supplier_name"]
           for r in store.read(spark, "t").collect()}
    assert got["S7"] == "renamed" and got["S8"] == "name8" and len(got) == 64


def test_update_where_bucket_column_assignment_full_rewrite(spark):
    """Assigning a bucket column can move rows across buckets — the
    pruned path is invalid, so the update falls back to a full rewrite
    (every non-empty bucket written at the new version)."""
    store = _store(spark, n=16, bucket_by=(KEY, N_BUCKETS))
    v = update_where(store, spark, "t", "supplier_code = 'S3'",
                     {"supplier_code": F.lit("S300")}, KEY)
    meta = store._read_meta("t")
    assert all(bv == v for bv in meta["buckets"].values())
    got = sorted(r["supplier_code"] for r in store.read(spark, "t").collect())
    assert "S300" in got and "S3" not in got and len(got) == 16
    # the moved row is readable from its NEW bucket via the pruned path
    b = spark.createDataFrame([("S300",)], ["supplier_code"]) \
        .select(bucket_id(KEY, N_BUCKETS).alias("b")).head()["b"]
    assert [r["supplier_code"] for r in
            store.read_buckets(spark, "t", [b])
            .filter("supplier_code = 'S300'").collect()] == ["S300"]


def test_update_where_nondeterministic_set_single_evaluation(spark):
    """A rand()-derived SET value must land IDENTICALLY in the committed
    snapshot and the CDC post-image (the r4 ADVICE hazard: two lazy
    plans evaluating the expression twice)."""
    store = _store(spark, n=20)
    v0 = store.version("t")
    update_where(store, spark, "t", "supplier_key >= 0",
                 {"supplier_name": F.concat(F.lit("r"), F.rand(seed=None))},
                 KEY)
    snap = {r["supplier_code"]: r["supplier_name"]
            for r in store.read(spark, "t").collect()}
    post = {r["supplier_code"]: r["supplier_name"]
            for r in store.read_changes(spark, "t", v0)
            .filter("`METADATA$ACTION` = 'INSERT'").collect()}
    assert snap == post


@pytest.mark.parametrize("mode", ["local", "reliable", "none"])
def test_stabilize_modes_update_where(spark, mode):
    """The spark.sds.stabilize.mode knob: all strategies produce the
    same (deterministic) result; 'reliable' must actually write to the
    session's checkpoint dir so the plan survives executor loss."""
    old = spark.conf.get(STABILIZE_MODE_CONF, "local")
    spark.conf.set(STABILIZE_MODE_CONF, mode)
    try:
        ckpt_dir = (spark.sparkContext._jsc.sc().getCheckpointDir().get()
                    .removeprefix("file:"))

        def n_ckpt_entries():
            return len(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else 0

        before = n_ckpt_entries()
        store = _store(spark, n=12)
        v0 = store.version("t")
        update_where(store, spark, "t", "supplier_key % 2 = 0",
                     {"supplier_name": F.upper("supplier_name")}, KEY)
        got = {r["supplier_key"]: r["supplier_name"]
               for r in store.read(spark, "t").collect()}
        assert got[2] == "NAME2" and got[3] == "name3"
        ch = store.read_changes(spark, "t", v0)
        assert ch.count() == 12  # 6 updated rows × 2
        if mode == "reliable":
            assert n_ckpt_entries() > before, \
                "reliable mode should persist RDDs under the checkpoint dir"
    finally:
        spark.conf.set(STABILIZE_MODE_CONF, old)


def test_stabilize_invalid_mode_raises(spark):
    with pytest.raises(ValueError, match="stabilize"):
        stabilize(spark.range(1), mode="bogus")
