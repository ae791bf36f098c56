"""Optimistic concurrency control for the store (VERDICT r14 #2).

The reference runs on Snowflake, whose transactions validate against
concurrent writers; Delta does the same with commit-version conflict
checks. The store's pointer-swap commit must therefore:

- never lose a commit to last-writer-wins on the meta file;
- REBASE physically-independent interleavings (blind appends, bucketed
  commits touching disjoint buckets) with no error and no retry;
- RAISE ``ConcurrentCommitError`` on true conflicts (same bucket, or a
  snapshot-derived full rewrite racing any commit), after which the DML
  layer re-reads and re-derives (``merge_upsert`` retries internally),
  producing the as-if-serial result;
- keep version numbers in COMMIT order so change-feed consumer offsets
  (version high-watermarks) stay monotonic under concurrency.

Deterministic interleaving: a ``_swap_meta`` hook injects a competing
commit at the exact moment the victim transaction reaches its pointer
swap — its staged data is already written from the stale read, which is
precisely the race window. A thread-stress test exercises the real lock.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from slowly_changing_dimensions_data_engineering_spark import schemas
from slowly_changing_dimensions_data_engineering_spark.operators.merge import merge_upsert
from slowly_changing_dimensions_data_engineering_spark.store import (
    ConcurrentCommitError, TableStore, bucket_id,
)

KEY = ["supplier_code"]
CMP = ["supplier_state", "supplier_name", "supplier_key"]
N_BUCKETS = 8


def _rows(spark, keys, state="state0"):
    return spark.createDataFrame(
        [Row(supplier_key=k, supplier_code=f"S{k}", supplier_name=f"name{k}",
             supplier_state=state) for k in keys],
        schemas.SUPPLIER)


def _bucket_of(spark, key_str):
    return (spark.createDataFrame([(key_str,)], ["supplier_code"])
            .select(bucket_id(KEY, N_BUCKETS).alias("b")).head()["b"])


def _keys_in_distinct_buckets(spark, n=2, per=2):
    """n groups of `per` supplier keys, each group in its own bucket."""
    groups: dict[int, list[int]] = {}
    k = 0
    while sum(1 for g in groups.values() if len(g) >= per) < n:
        b = _bucket_of(spark, f"S{k}")
        groups.setdefault(b, []).append(k)
        k += 1
    picked = [g[:per] for g in groups.values() if len(g) >= per][:n]
    return picked


def _inject_before_swap(monkeypatch, table, action):
    """Run ``action`` once, right before the NEXT ``_swap_meta`` on
    ``table`` executes — i.e. after the victim staged its data from its
    (now stale) snapshot read."""
    orig = TableStore._swap_meta
    fired = []

    def hooked(self, name, apply):
        if not fired and name == table:
            fired.append(1)
            action()
        return orig(self, name, apply)

    monkeypatch.setattr(TableStore, "_swap_meta", hooked)


def test_disjoint_bucket_merges_rebase_without_conflict(
        spark, tmp_path, monkeypatch):
    (ka, kb) = _keys_in_distinct_buckets(spark, n=2, per=2)
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER, bucket_by=(KEY, N_BUCKETS))
    merge_upsert(store, spark, "t", _rows(spark, range(32)), KEY, CMP)
    v0 = store.version("t")

    # B's merge (bucket of kb) lands while A's merge (bucket of ka) is
    # between its snapshot read and its pointer swap
    _inject_before_swap(
        monkeypatch, "t",
        lambda: merge_upsert(store, spark, "t",
                             _rows(spark, kb, state="B"), KEY, CMP))
    va = merge_upsert(store, spark, "t", _rows(spark, ka, state="A"),
                      KEY, CMP, occ_retries=0)  # rebase ≠ retry: 0 budget

    # both commits landed, in commit order, neither lost
    assert va == v0 + 2 and store.version("t") == v0 + 2
    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "t").collect()}
    for k in ka:
        assert got[f"S{k}"] == "A"
    for k in kb:
        assert got[f"S{k}"] == "B"
    assert len(got) == 32

    # the bucket map references BOTH writers' version dirs
    meta = store._read_meta("t")
    vs = {int(v) for v in meta["buckets"].values()}
    assert {v0 + 1, v0 + 2} <= vs

    # CDC batches for both commits are on the feed, offset-ordered
    ch = store.read_changes(spark, "t", since=v0)
    acts = {(r["supplier_code"], r["METADATA$ACTION"], r["METADATA$ISUPDATE"])
            for r in ch.collect()}
    for k in ka + kb:
        assert (f"S{k}", "INSERT", True) in acts
        assert (f"S{k}", "DELETE", True) in acts


def test_same_bucket_merge_conflicts_then_retry_serializes(
        spark, tmp_path, monkeypatch):
    [ka] = _keys_in_distinct_buckets(spark, n=1, per=2)
    k1, k2 = ka  # same bucket → true conflict
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER, bucket_by=(KEY, N_BUCKETS))
    merge_upsert(store, spark, "t", _rows(spark, range(16)), KEY, CMP)
    v0 = store.version("t")

    # zero retry budget: the loser must surface the conflict
    _inject_before_swap(
        monkeypatch, "t",
        lambda: merge_upsert(store, spark, "t",
                             _rows(spark, [k2], state="B"), KEY, CMP))
    with pytest.raises(ConcurrentCommitError):
        merge_upsert(store, spark, "t", _rows(spark, [k1], state="A"),
                     KEY, CMP, occ_retries=0)
    # the losing attempt left no version and no phantom change batch
    assert store.version("t") == v0 + 1
    assert store.change_versions("t", v0) == [v0 + 1]

    # with the default retry budget the loser re-derives against the
    # winner's state: the as-if-serial outcome (both updates present)
    _inject_before_swap(
        monkeypatch, "t",
        lambda: merge_upsert(store, spark, "t",
                             _rows(spark, [k2], state="B2"), KEY, CMP))
    va = merge_upsert(store, spark, "t", _rows(spark, [k1], state="A2"),
                      KEY, CMP)
    assert va == store.version("t")
    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "t").collect()}
    assert got[f"S{k1}"] == "A2" and got[f"S{k2}"] == "B2"
    assert len(got) == 16


def test_blind_append_never_conflicts(spark, tmp_path, monkeypatch):
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(4)))
    v0 = store.version("t")

    _inject_before_swap(
        monkeypatch, "t",
        lambda: store.commit_append("t", _rows(spark, [100], state="B")))
    va = store.commit_append("t", _rows(spark, [200], state="A"))

    assert va == v0 + 2
    got = {r["supplier_key"] for r in store.read(spark, "t").collect()}
    assert got == set(range(4)) | {100, 200}
    # snapshot references all three segments
    assert store._read_meta("t")["segments"] == [v0, v0 + 1, v0 + 2]


def test_full_rewrite_racing_any_commit_conflicts(
        spark, tmp_path, monkeypatch):
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(4)))
    v0 = store.version("t")

    _inject_before_swap(
        monkeypatch, "t",
        lambda: store.commit_append("t", _rows(spark, [100])))
    with pytest.raises(ConcurrentCommitError):
        store.commit("t", _rows(spark, range(2)))
    # the interleaved append won; the aborted rewrite left nothing
    assert store.version("t") == v0 + 1
    assert store.read(spark, "t").count() == 5


def test_restore_racing_commit_conflicts(spark, tmp_path, monkeypatch):
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(4)))      # v0
    store.commit("t", _rows(spark, range(2)))      # v1
    _inject_before_swap(
        monkeypatch, "t",
        lambda: store.commit_append("t", _rows(spark, [100])))
    with pytest.raises(ConcurrentCommitError):
        store.restore("t", 0)
    assert store.read(spark, "t").count() == 3  # append won, not lost


def test_threaded_writers_disjoint_keys_all_commit(spark, tmp_path):
    """Real lock contention: two threads interleave merges into one
    bucketed table. Disjoint key sets may still share a bucket, so the
    internal retry absorbs true conflicts; every load must land."""
    import threading

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER, bucket_by=(KEY, N_BUCKETS))
    merge_upsert(store, spark, "t", _rows(spark, range(8)), KEY, CMP)

    errs: list[Exception] = []

    def writer(keys, state):
        try:
            for k in keys:
                merge_upsert(store, spark, "t",
                             _rows(spark, [k], state=state), KEY, CMP,
                             occ_retries=8)
        except Exception as ex:  # surfaced below — a test thread must not die silently
            errs.append(ex)

    t1 = threading.Thread(target=writer, args=([0, 1, 2, 3], "T1"))
    t2 = threading.Thread(target=writer, args=([4, 5, 6, 7], "T2"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "t").collect()}
    assert len(got) == 8
    for k in range(4):
        assert got[f"S{k}"] == "T1"
    for k in range(4, 8):
        assert got[f"S{k}"] == "T2"
    # every merge committed exactly one version (no lost updates):
    # v0 initial + 8 single-key merges
    assert store.version("t") == 8


def test_add_column_racing_commit_is_not_lost(spark, tmp_path, monkeypatch):
    """The ALTER's read-modify-write runs under the same lock as
    commits: a schema evolved mid-commit survives (the commit's swap
    rewrites meta from the FRESH copy, which carries the new column)."""
    from pyspark.sql import types as T

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(4)))

    _inject_before_swap(
        monkeypatch, "t",
        lambda: store.add_column(
            "t", T.StructField("note", T.StringType(), True)))
    store.commit_append("t", _rows(spark, [100]))
    assert "note" in store.schema("t").fieldNames()
    assert store.read(spark, "t").filter(F.col("note").isNull()).count() == 5


def test_scd0_racing_loads_cannot_double_insert(spark, tmp_path, monkeypatch):
    """The Type-0 append path is snapshot-DERIVED (anti-join of current
    keys), not blind: a load racing another load that inserts the same
    key must lose the swap and re-derive — the key lands exactly once,
    first-committer-wins (fixed attributes)."""
    from slowly_changing_dimensions_data_engineering_spark.operators.merge import scd0_insert

    store = TableStore(str(tmp_path))
    store.create("dim", schemas.SUPPLIER)
    scd0_insert(store, spark, "dim", _rows(spark, [1], state="base"),
                ["supplier_code"])

    # loser reads v0, winner commits S2 with state "W" at swap time;
    # loser re-derives: its S2 row is now matched -> dropped
    _inject_before_swap(
        monkeypatch, "dim",
        lambda: scd0_insert(store, spark, "dim",
                            _rows(spark, [2], state="W"),
                            ["supplier_code"]))
    scd0_insert(store, spark, "dim",
                _rows(spark, [2, 3], state="L"), ["supplier_code"])

    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "dim").collect()}
    assert got == {"S1": "base", "S2": "W", "S3": "L"}
    # zero-retry surfaces the conflict instead
    _inject_before_swap(
        monkeypatch, "dim",
        lambda: scd0_insert(store, spark, "dim",
                            _rows(spark, [4], state="W2"),
                            ["supplier_code"]))
    with pytest.raises(ConcurrentCommitError):
        scd0_insert(store, spark, "dim", _rows(spark, [5], state="L2"),
                    ["supplier_code"], occ_retries=0)


def test_delete_where_retry_serializes_after_concurrent_merge(
        spark, tmp_path, monkeypatch):
    """WHERE-DML under OCC: a DELETE racing a merge re-evaluates its
    predicate on the winner's state and retries — no lost update in
    either direction; zero-retry surfaces the conflict."""
    from slowly_changing_dimensions_data_engineering_spark.operators.merge import delete_where

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(5), state="keep")
                 .unionByName(_rows(spark, [5], state="drop")))

    # the DELETE (predicate: state='drop') matches S5 and reaches its
    # swap; the winner flips S1 to 'drop' in that window — the retry
    # must re-evaluate and delete the NEWLY-dropped row too
    _inject_before_swap(
        monkeypatch, "t",
        lambda: merge_upsert(store, spark, "t",
                             _rows(spark, [1], state="drop"), KEY, CMP))
    delete_where(store, spark, "t", "supplier_state = 'drop'", KEY)
    got = {r["supplier_key"] for r in store.read(spark, "t").collect()}
    assert got == {0, 2, 3, 4}

    store.commit("t", _rows(spark, range(2), state="keep")
                 .unionByName(_rows(spark, [9], state="drop")))
    _inject_before_swap(
        monkeypatch, "t",
        lambda: merge_upsert(store, spark, "t",
                             _rows(spark, [0], state="drop"), KEY, CMP))
    with pytest.raises(ConcurrentCommitError):
        delete_where(store, spark, "t", "supplier_state = 'drop'", KEY,
                     occ_retries=0)
