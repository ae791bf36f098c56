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

import os

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
    commits, and bumps the table's SCHEMA EPOCH: a commit whose frame
    was schema-validated BEFORE the ALTER loses conflict validation
    (the Delta metadata-change rule) instead of landing pre-ALTER
    files — the ALTER itself is never lost, and the retried commit
    carrying the widened schema succeeds."""
    from pyspark.sql import types as T

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(4)))

    _inject_before_swap(
        monkeypatch, "t",
        lambda: store.add_column(
            "t", T.StructField("note", T.StringType(), True)))
    with pytest.raises(ConcurrentCommitError, match="schema epoch"):
        store.commit_append("t", _rows(spark, [100]))
    # the evolved schema survived the race ...
    assert "note" in store.schema("t").fieldNames()
    # ... the conflicted append landed nothing (and left no _txn orphan) ...
    assert store.read(spark, "t").count() == 4
    assert os.listdir(os.path.join(str(tmp_path), "t", "_txn")) == []
    # ... and the retry, re-validated against the evolved schema, lands.
    store.commit_append(
        "t", _rows(spark, [100]).withColumn("note", F.lit(None).cast("string")))
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


# ---- the read→derive window (baseline captured at SNAPSHOT READ) --------

def test_commit_validates_against_snapshot_read_version(spark, tmp_path):
    """A commit whose frame derives from an earlier snapshot read passes
    that read's version as the validation baseline: a competing commit
    landing anywhere between the read and the commit call — not just
    inside the swap — conflicts instead of being silently overwritten
    (pre-fix, commit() re-captured the baseline at entry, so this exact
    interleaving was last-writer-wins)."""
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(4)))

    rv = store.version("t")
    derived = store.read(spark, "t", version=rv).filter(
        F.col("supplier_key") < 2)
    # the competing commit lands DURING the victim's derivation window
    store.commit_append("t", _rows(spark, [100]))

    with pytest.raises(ConcurrentCommitError):
        store.commit("t", derived, read_version=rv)
    # the competing append was not lost
    assert store.read(spark, "t").count() == 5
    # and the aborted commit left no staging orphan
    assert os.listdir(os.path.join(str(tmp_path), "t", "_txn")) == []


def test_commit_buckets_validates_against_snapshot_read_version(
        spark, tmp_path):
    """Bucketed variant: the caller-captured read_version recovers the
    base bucket map from history, so a competing DISJOINT-bucket commit
    in the read→commit window still rebases, while a same-bucket
    competitor conflicts."""
    (ka, kb) = _keys_in_distinct_buckets(spark, n=2, per=2)
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER, bucket_by=(KEY, N_BUCKETS))
    all_keys = ka + kb
    merge_upsert(store, spark, "t", _rows(spark, all_keys), KEY, CMP)

    rv = store.version("t")
    b_a = _bucket_of(spark, f"S{ka[0]}")
    mine = store.read_buckets(spark, "t", [b_a]).withColumn(
        "supplier_state", F.lit("mine"))
    # competitor touches the OTHER bucket during our window → rebase
    merge_upsert(store, spark, "t", _rows(spark, [kb[0]], state="theirs"),
                 KEY, CMP)
    v = store.commit_buckets("t", mine, [b_a], read_version=rv)
    assert v == store.version("t")
    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "t").collect()}
    assert got[f"S{ka[0]}"] == "mine" and got[f"S{kb[0]}"] == "theirs"

    # same-bucket competitor in the window → true conflict
    rv2 = store.version("t")
    mine2 = store.read_buckets(spark, "t", [b_a]).withColumn(
        "supplier_state", F.lit("mine2"))
    merge_upsert(store, spark, "t", _rows(spark, [ka[1]], state="race"),
                 KEY, CMP)
    with pytest.raises(ConcurrentCommitError):
        store.commit_buckets("t", mine2, [b_a], read_version=rv2)
    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "t").collect()}
    assert got[f"S{ka[1]}"] == "race"  # the winner survived


def test_update_where_retries_commit_landing_during_derivation(
        spark, tmp_path, monkeypatch):
    """ADVICE r15 (high): inject the competing commit BETWEEN the DML's
    store.read() and its commit — i.e. during the stabilize()/isEmpty()
    derivation jobs, outside the old entry-captured validation window.
    The statement must re-derive and serialize AFTER the winner, never
    silently drop the winner's merge."""
    from slowly_changing_dimensions_data_engineering_spark.operators.merge import update_where

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(4), state="old"))

    orig = TableStore.read
    fired = []

    def read_then_race(self, spark_, name, version=None, as_of=None):
        df = orig(self, spark_, name, version=version, as_of=as_of)
        if not fired and name == "t":
            fired.append(1)  # set BEFORE the competing DML (no recursion)
            merge_upsert(store, spark, "t",
                         _rows(spark, [9], state="old"), KEY, CMP)
        return df

    monkeypatch.setattr(TableStore, "read", read_then_race)
    update_where(store, spark, "t", "supplier_state = 'old'",
                 {"supplier_state": F.lit("new")}, KEY)

    got = {r["supplier_code"]: r["supplier_state"]
           for r in store.read(spark, "t").collect()}
    # serial order: winner's insert of S9 (state old) happened BEFORE the
    # retried UPDATE re-read — so S9 was updated too, and nothing is lost
    assert got == {f"S{k}": "new" for k in [0, 1, 2, 3, 9]}


def test_commit_stage_cleaned_on_any_failure(spark, tmp_path, monkeypatch):
    """ADVICE r15 (low): a non-OCC failure inside the critical section
    (here a lock timeout) must also clear the _txn staging dir instead
    of leaking it until vacuum's age-gated sweep."""
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    store.commit("t", _rows(spark, range(2)))

    def boom(self, name, apply):
        raise TimeoutError("commit lock busy (injected)")

    monkeypatch.setattr(TableStore, "_swap_meta", boom)
    with pytest.raises(TimeoutError):
        store.commit("t", _rows(spark, [5]))
    assert os.listdir(os.path.join(str(tmp_path), "t", "_txn")) == []


# ---- crash-safe commit lock (advisory flock) ------------------------------
#
# ADVICE r16 (medium): the previous existence-based O_EXCL lock needed a
# rename-based stale-lock steal, and the steal could transiently vacate
# the lock path while a LIVE holder was inside the critical section —
# admitting a second writer. The fix is structural: an advisory
# fcntl.flock on a PERMANENT per-table lock file. The kernel releases a
# crashed holder's lock when its fds close, so there is no staleness
# heuristic and no steal protocol to race; the lock file is never
# unlinked, so the lock path is never vacant.

def test_concurrent_offset_mirror_writers_never_collide(tmp_path):
    """Found by tools/bench_occ_soak.py (VERDICT r16 #7): set_offset's
    tmp file was a FIXED name, so two concurrent mirror writers raced
    on the os.replace — the loser's tmp was already moved
    (FileNotFoundError). Writer-unique tmp names make the mirror write
    collision-free; last-replace-wins is fine for this
    observability/retention mirror (an old value only retains change
    batches longer)."""
    import json as _json
    import threading

    store = TableStore(str(tmp_path))
    errs: list[str] = []

    def hammer(base: int) -> None:
        try:
            for i in range(200):
                store.set_offset("mirror", base + i)
        except Exception as ex:  # noqa: BLE001
            errs.append(repr(ex))

    ts = [threading.Thread(target=hammer, args=(b,)) for b in (0, 1000)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == []
    with open(store._offset_path("mirror")) as fh:
        v = _json.load(fh)["version"]  # intact JSON, one of the writes
    assert v in set(range(200)) | set(range(1000, 1200))
    # no leaked tmp files
    d = os.path.dirname(store._offset_path("mirror"))
    assert [p for p in os.listdir(d) if ".tmp" in p] == []


def test_crashed_holder_lock_released_by_kernel(spark, tmp_path):
    """A holder that dies while flocked never wedges the table: the
    kernel releases the advisory lock on process exit, so the next
    committer acquires immediately — no grace period, no steal."""
    import subprocess
    import sys

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    lock = store._meta_path("t") + ".lock"
    # Subprocess takes the flock then dies holding it; os._exit skips
    # all cleanup handlers — only the kernel's fd teardown releases it.
    code = (
        "import fcntl, os\n"
        f"fd = os.open({lock!r}, os.O_CREAT | os.O_RDWR)\n"
        "fcntl.flock(fd, fcntl.LOCK_EX)\n"
        "os._exit(9)\n")
    subprocess.run([sys.executable, "-c", code], check=False)

    store.commit("t", _rows(spark, range(2)))  # proceeds immediately
    assert store.version("t") == 0
    assert os.path.exists(lock)  # permanent file, never unlinked


def test_live_holder_blocks_waiter_until_release(spark, tmp_path,
                                                 monkeypatch):
    """A LIVE holder's flock blocks the waiter (TimeoutError at the
    bound), and the waiter succeeds as soon as the holder releases.
    flock is per open-file-description, so a second os.open in the
    same process is a genuine competing acquirer."""
    import fcntl

    from slowly_changing_dimensions_data_engineering_spark import store as store_mod

    monkeypatch.setattr(store_mod, "LOCK_TIMEOUT_SECS", 0.3)
    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    lock = store._meta_path("t") + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        with pytest.raises(TimeoutError):
            store.commit("t", _rows(spark, range(2)))
    finally:
        os.close(fd)  # release

    store.commit("t", _rows(spark, range(2)))  # proceeds after release
    assert store.version("t") == 0


def test_stale_lock_file_content_never_blocks(spark, tmp_path):
    """A leftover lock FILE (crash orphan, old-protocol artifact, or
    arbitrary content) is inert: only a held flock blocks, never the
    file's existence, content, or mtime."""
    import time as _time

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    lock = store._meta_path("t") + ".lock"
    with open(lock, "w") as fh:
        fh.write("dead-12345")
    old = _time.time() - 120
    os.utime(lock, (old, old))

    store.commit("t", _rows(spark, range(2)))  # no wait at all
    assert store.version("t") == 0


# ---- MERGE-from-stream: the OCC × consume-once interaction ---------------

def test_merge_from_stream_concurrent_consumer_no_double_consume(
        spark, tmp_path, monkeypatch):
    """Two instances of the composed task4 statement (stream read +
    SCD2 merge + offset advance in one transaction) race on the same
    consumer: the loser's retry re-reads the offset from the winner's
    committed watermark and finds the batch GONE (Automation:142) — it
    no-ops instead of replaying the merge and re-stamping rows."""
    import datetime as dt

    from slowly_changing_dimensions_data_engineering_spark.operators.scd2 import merge_from_stream

    scd2_key = ["supplier_code", "supplier_state"]
    now = dt.datetime(2026, 1, 1)
    store = TableStore(str(tmp_path))
    store.create("landing", schemas.SUPPLIER)
    store.create("staging", schemas.SUPPLIER_STAGING,
                 bucket_by=(KEY, N_BUCKETS))
    merge_upsert(store, spark, "landing", _rows(spark, range(4)), KEY, CMP)

    _inject_before_swap(
        monkeypatch, "staging",
        lambda: merge_from_stream(store, spark, "staging", "landing",
                                  "scd2", scd2_key, now))
    merge_from_stream(store, spark, "staging", "landing", "scd2",
                      scd2_key, now)

    rows = store.read(spark, "staging").collect()
    assert len(rows) == 4  # opened exactly once, not once per instance
    assert all(r["current_flag"] == "Y" for r in rows)
    # offset is exact: the single pending batch, consumed by the winner
    assert (store.get_offset("scd2", table="staging")
            == max(store.change_versions("landing", -1)))
    # loser committed nothing: winner's merge is the only staging version
    assert store.version("staging") == 0


def test_merge_from_stream_concurrent_writer_exact_once(
        spark, tmp_path, monkeypatch):
    """An UNRELATED staging writer (e.g. a backfill rewrite) lands
    between the stream read and the merge commit: the statement
    re-derives against the winner's staging and consumes the pending
    batch EXACTLY once — no lost rows, no double-applied batch."""
    import datetime as dt

    from slowly_changing_dimensions_data_engineering_spark.operators.scd2 import merge_from_stream

    scd2_key = ["supplier_code", "supplier_state"]
    t1 = dt.datetime(2026, 1, 1)
    t2 = dt.datetime(2026, 1, 2)
    store = TableStore(str(tmp_path))
    store.create("landing", schemas.SUPPLIER)
    store.create("staging", schemas.SUPPLIER_STAGING,
                 bucket_by=(KEY, N_BUCKETS))
    merge_upsert(store, spark, "landing", _rows(spark, range(4)), KEY, CMP)
    merge_from_stream(store, spark, "staging", "landing", "scd2",
                      scd2_key, t1)

    # batch 2 pending: S0 changes state, S4 appears
    merge_upsert(store, spark, "landing",
                 _rows(spark, [0, 4], state="v2"), KEY, CMP)
    off_before = store.get_offset("scd2", table="staging")

    # identity rewrite of staging lands mid-derivation (full commit →
    # every bucket repointed → certain conflict for the merge)
    _inject_before_swap(
        monkeypatch, "staging",
        lambda: store.commit("staging", store.read(spark, "staging")))
    merge_from_stream(store, spark, "staging", "landing", "scd2",
                      scd2_key, t2)

    rows = {(r["supplier_code"], r["supplier_state"]): r
            for r in store.read(spark, "staging").collect()}
    # exactly once: 4 originals + 1 new state version + 1 new key = 6
    assert len(rows) == 6
    assert rows[("S0", "state0")]["current_flag"] == "N"   # closed once
    assert rows[("S0", "v2")]["current_flag"] == "Y"       # opened once
    assert rows[("S4", "v2")]["current_flag"] == "Y"
    # the close was stamped by THIS cycle's statement-constant now
    assert rows[("S0", "state0")]["end_date"] == t2
    # offset advanced past batch 2 exactly
    assert (store.get_offset("scd2", table="staging")
            == max(store.change_versions("landing", off_before)))

    # nothing pending: a further call is a version-stable no-op
    v = store.version("staging")
    assert merge_from_stream(store, spark, "staging", "landing", "scd2",
                             scd2_key, t2) == v


# ---- pessimistic fallback (exclusive derivation lock) ---------------------
#
# tools/bench_occ_soak.py measured retry depth 59 of a 100 budget at
# just 6 writers on one hot key: free-running OCC re-derives OUTSIDE
# any lock, so a slow loser can lose unboundedly many races. After
# _EXCLUSIVE_AFTER lost races a writer escalates to the table's
# derivation lock (flock EX held across derive+commit) while every
# ordinary commit's pointer swap takes it SHARED — bounding depth at
# the threshold without slowing the uncontended path.

def test_occ_retry_escalates_to_exclusive(tmp_path):
    """After _EXCLUSIVE_AFTER lost races _occ_retry runs the closure
    under store.exclusive_writer: the closure observes the thread-local
    holder mark, and the free-running attempts before it do not."""
    from slowly_changing_dimensions_data_engineering_spark.operators.merge import (
        _EXCLUSIVE_AFTER, _occ_retry,
    )

    store = TableStore(str(tmp_path))
    seen: list[bool] = []

    def fn():
        exclusive = "t" in getattr(store._tl, "exclusive", ())
        seen.append(exclusive)
        if not exclusive:
            raise ConcurrentCommitError("forced lost race")
        return 42

    assert _occ_retry(fn, 10, store, "t") == 42
    assert seen == [False] * _EXCLUSIVE_AFTER + [True]
    # the lock is RELEASED after the call: a fresh EX acquisition works
    with store.exclusive_writer("t"):
        pass
    # without store/table the wrapper stays purely optimistic
    seen.clear()
    with pytest.raises(ConcurrentCommitError):
        _occ_retry(fn, _EXCLUSIVE_AFTER + 2, None, None)
    assert seen == [False] * (_EXCLUSIVE_AFTER + 3)


def test_exclusive_writer_gates_other_commits(spark, tmp_path):
    """While a fallback writer holds the derivation lock, another
    writer's pointer swap BLOCKS at the shared gate and lands only
    after release — and the holder's own commit passes the gate via
    the thread-local (no self-deadlock)."""
    import threading
    import time as _time

    store = TableStore(str(tmp_path))
    store.create("t", schemas.SUPPLIER)
    merge_upsert(store, spark, "t", _rows(spark, [0]), KEY, CMP)

    done = threading.Event()
    outcome: list[str] = []

    def other_commit():
        # snapshot-derived rewrite staged BEFORE reaching the gate
        try:
            store.commit("t", store.read(spark, "t"))
            outcome.append("landed")
        except ConcurrentCommitError:
            outcome.append("conflict")
        done.set()

    with store.exclusive_writer("t"):
        th = threading.Thread(target=other_commit)
        th.start()
        # give the other writer time to stage data and reach the gate
        _time.sleep(2.0)
        assert not done.is_set(), "commit crossed the EX gate"
        # holder's own commit goes through (reentrancy via thread-local)
        v_held = merge_upsert(store, spark, "t",
                              _rows(spark, [1], state="held"), KEY, CMP)
        assert v_held == store.version("t")
    th.join()
    assert done.is_set()
    # the gated writer resumed only after release, and its stale
    # snapshot-read rewrite then failed validation against the holder's
    # commit — exactly the conflict the DML layer re-derives through
    assert outcome == ["conflict"]
    codes = {r["supplier_code"]
             for r in store.read(spark, "t").collect()}
    assert codes == {"S0", "S1"}
