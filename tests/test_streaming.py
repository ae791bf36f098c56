"""Structured Streaming coverage (SURVEY §2.2 streaming row, §3.3):

- the foreachBatch pipeline variant whose checkpoint provides file-level
  consume-once (C3 analogue) and replays the reference golden scenario;
- event-time watermark + tumbling window in append mode (late windows
  emit only once the watermark passes);
- dropDuplicatesWithinWatermark.

Deterministic driving: ``trigger(availableNow=True)`` drains the input
and stops; ``maxFilesPerTrigger=1`` + explicit file mtimes force the
multi-batch sequence watermark progression needs.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F, types as T


# --------------------------------------------------------------------
# foreachBatch pipeline variant
# --------------------------------------------------------------------

def test_streaming_pipeline_replays_reference_golden(spark, tmp_path):
    from slowly_changing_dimensions_data_engineering_spark.pipeline import (
        STAGING, MASTER, SupplierPipeline,
    )
    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        start_streaming_pipeline,
    )
    import datetime as dt

    p = SupplierPipeline(spark, str(tmp_path))
    p.setup()
    ticks = iter([dt.datetime(2024, 3, 26, 23, 41, 54),
                  dt.datetime(2024, 3, 27, 0, 5, 43)])

    def run_once():
        q = start_streaming_pipeline(p, available_now=True,
                                     now_fn=lambda: next(ticks))
        q.awaitTermination(120)
        assert not q.isActive

    # load 1: 6 suppliers -> 6 open versions
    p.stage.put("/root/reference/suppliers.csv")
    run_once()
    st = p.store.read(spark, STAGING)
    assert st.count() == 6
    assert st.filter(F.col("current_flag") == "Y").count() == 6

    # load 2: 2 updates + 2 inserts -> golden 10 rows (8 Y / 2 N)
    p.stage.put("/root/reference/suppliers_v2.csv")
    run_once()
    rows = p.store.read(spark, STAGING).collect()
    y = sum(1 for r in rows if r["current_flag"] == "Y")
    assert (len(rows), y) == (10, 8)
    assert p.store.read(spark, MASTER).count() == 8

    # consume-once: rerunning with the same checkpoint and no new files
    # must not change anything (both staged files already consumed).
    v_before = p.store.version(STAGING)
    run_once()
    assert p.store.read(spark, STAGING).count() == 10
    assert p.store.read(spark, MASTER).count() == 8
    # no SCD2 commit happened (the empty batch closes/opens nothing)
    assert p.store.read(spark, STAGING).filter(
        F.col("current_flag") == "Y").count() == 8
    assert p.store.version(STAGING) in (v_before, v_before + 1)


# --------------------------------------------------------------------
# event-time streaming: watermark + tumbling window, dedup-in-watermark
# --------------------------------------------------------------------

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
])


def _write_event_file(path, rows, mtime):
    with open(path, "w") as f:
        for eid, ts, et in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "event_type": et}) + "\n")
    os.utime(path, (mtime, mtime))


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_watermark_tumbling_append_emits_closed_windows(spark, tmp_path):
    """Append-mode windowed agg: a window emits exactly once, when the
    watermark (max event time - delay) passes its end. File 1 fills the
    10:00 hour; file 2's 13:00 events push the watermark past 11:00 so
    the 10:00 window emits; 13:00 itself never emits (watermark never
    passes it)."""
    src = tmp_path / "events_in"
    src.mkdir()
    t0 = time.time()
    _write_event_file(src / "f1.json", [
        (1, "2024-01-01 10:05:00", "click"),
        (2, "2024-01-01 10:20:00", "click"),
        (3, "2024-01-01 10:50:00", "view"),
    ], t0 - 100)
    _write_event_file(src / "f2.json", [
        (4, "2024-01-01 13:00:00", "click"),
        (5, "2024-01-01 13:10:00", "view"),
    ], t0 - 50)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("ws"), "event_type", "n")
    )
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("wm_tumbling")
         .option("checkpointLocation", str(tmp_path / "ck1"))
         .trigger(availableNow=True).start())
    _drain(q)

    got = {(r["ws"], r["event_type"]): r["n"]
           for r in spark.table("wm_tumbling").collect()}
    assert got == {
        ("2024-01-01 10:00:00", "click"): 2,
        ("2024-01-01 10:00:00", "view"): 1,
    }


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event_ids arriving within
    the watermark horizon are suppressed (batch 1's id=1 dup and batch
    2's replay of id=2); distinct ids all pass through once."""
    src = tmp_path / "dups_in"
    src.mkdir()
    t0 = time.time()
    _write_event_file(src / "f1.json", [
        (1, "2024-01-01 10:00:00", "click"),
        (1, "2024-01-01 10:01:00", "click"),   # in-batch duplicate
        (2, "2024-01-01 10:02:00", "view"),
    ], t0 - 100)
    _write_event_file(src / "f2.json", [
        (2, "2024-01-01 10:03:00", "view"),    # cross-batch dup, in horizon
        (3, "2024-01-01 10:30:00", "click"),
    ], t0 - 50)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("wm_dedup")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    _drain(q)

    ids = sorted(r["event_id"] for r in spark.table("wm_dedup").collect())
    assert ids == [1, 2, 3]


def test_apply_in_pandas_with_state_running_counts(spark, tmp_path):
    """applyInPandasWithState — the custom stateful streaming operator
    hook: a per-event_type running count whose state survives across
    micro-batches (file 2's clicks continue file 1's count)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = tmp_path / "state_in"
    src.mkdir()
    t0 = time.time()
    _write_event_file(src / "f1.json", [
        (1, "2024-01-01 10:00:00", "click"),
        (2, "2024-01-01 10:01:00", "click"),
        (3, "2024-01-01 10:02:00", "view"),
    ], t0 - 100)
    _write_event_file(src / "f2.json", [
        (4, "2024-01-01 10:03:00", "click"),
    ], t0 - 50)

    out_schema = T.StructType([
        T.StructField("event_type", T.StringType()),
        T.StructField("total", T.LongType()),
    ])
    state_schema = T.StructType([T.StructField("count", T.LongType())])

    def running_count(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"event_type": [key[0]], "total": [total]})

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .groupBy("event_type")
        .applyInPandasWithState(
            running_count, out_schema, state_schema,
            "update", GroupStateTimeout.NoTimeout)
    )
    q = (stream.writeStream.outputMode("update").format("memory")
         .queryName("state_counts")
         .option("checkpointLocation", str(tmp_path / "ck3"))
         .trigger(availableNow=True).start())
    _drain(q)

    rows = [(r["event_type"], r["total"])
            for r in spark.table("state_counts").collect()]
    # batch 1 emits click=2, view=1; batch 2 emits click=3 (state carried)
    assert ("click", 3) in rows          # proves cross-batch state
    assert ("view", 1) in rows
    assert max(t for e, t in rows if e == "click") == 3


def test_session_window_streaming_append(spark, tmp_path):
    """Streaming session windows with a watermark: gap-separated bursts
    close into distinct sessions once the watermark passes; the final
    burst stays open (never emitted in append mode)."""
    src = tmp_path / "sess_in"
    src.mkdir()
    t0 = time.time()
    _write_event_file(src / "f1.json", [
        (1, "2024-01-01 10:00:00", "u1"),
        (2, "2024-01-01 10:05:00", "u1"),   # same session (gap < 10m)
        (3, "2024-01-01 11:00:00", "u1"),   # new session
    ], t0 - 100)
    _write_event_file(src / "f2.json", [
        (4, "2024-01-01 13:00:00", "u1"),   # watermark -> 12:50, closes both
    ], t0 - 50)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy("event_type", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("event_type", F.col("w.start").cast("string").alias("ws"), "n")
    )
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("sess_win")
         .option("checkpointLocation", str(tmp_path / "ck4"))
         .trigger(availableNow=True).start())
    _drain(q)

    got = {(r["ws"], r["n"]) for r in spark.table("sess_win").collect()}
    assert got == {("2024-01-01 10:00:00", 2), ("2024-01-01 11:00:00", 1)}


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Watermarked stream-stream inner join: clicks joined to views by
    the same user within 30 minutes AFTER the click — both sides buffer
    in state bounded by their watermarks (the join Spark requires
    time-range conditions + watermarks for)."""
    src = tmp_path / "ssj_in"
    src.mkdir()
    t0 = time.time()
    _write_event_file(src / "f1.json", [
        (1, "2024-01-01 10:00:00", "click"),
        (2, "2024-01-01 10:10:00", "view"),    # joins click 1 (+10m)
        (3, "2024-01-01 11:30:00", "view"),    # too late for click 1
        (4, "2024-01-01 11:40:00", "click"),
        (5, "2024-01-01 11:50:00", "view"),    # joins click 4 (+10m)
    ], t0 - 100)
    _write_event_file(src / "f2.json", [
        (6, "2024-01-01 14:00:00", "click"),   # advances both watermarks
    ], t0 - 50)

    base = (spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1).json(str(src)))
    # single-user fixture: constant join key keeps the fixture tiny
    clicks = (base.filter("event_type = 'click'")
              .select(F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"), F.lit(1).alias("uid"))
              .withWatermark("click_ts", "10 minutes"))
    views = (base.filter("event_type = 'view'")
             .select(F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"), F.lit(1).alias("vuid"))
             .withWatermark("view_ts", "10 minutes"))
    joined = clicks.join(
        views,
        F.expr("""uid = vuid AND
                  view_ts >= click_ts AND
                  view_ts <= click_ts + INTERVAL 30 MINUTES"""),
        "inner",
    ).select("click_id", "view_id")

    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("ssj")
         .option("checkpointLocation", str(tmp_path / "ck5"))
         .trigger(availableNow=True).start())
    _drain(q)

    pairs = {(r["click_id"], r["view_id"]) for r in spark.table("ssj").collect()}
    assert pairs == {(1, 2), (4, 5)}


# --------------------------------------------------------------------
# streaming incremental dedup (foreachBatch over the MinHash index)
# --------------------------------------------------------------------

def test_streaming_dedup_batches_grow_index(spark, tmp_path):
    """VERDICT coverage (streaming/dedup_stream.py): each micro-batch
    dedups against the stored index AND grows it — a doc arriving in a
    later batch that near-dups an earlier batch's survivor is dropped,
    with consume-once on the input files via the streaming checkpoint."""
    import json as _json

    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        start_streaming_dedup,
    )

    src = tmp_path / "in"
    src.mkdir()
    index = str(tmp_path / "mhidx")
    out = str(tmp_path / "survivors")
    ck = str(tmp_path / "ck")

    def put(name, rows):
        with open(src / name, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def run_once():
        q = start_streaming_dedup(spark, str(src), index, out, ck,
                                  available_now=True, threshold=0.5)
        _drain(q)

    novel = "the quick brown fox jumps over the lazy dog again and again"
    # batch 1 bootstraps the index: two copies of one doc -> keep-min
    put("b1.json", [(0, novel), (1, novel),
                    (2, "completely different words with zero overlap whatsoever")])
    run_once()
    s1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert s1 == {0, 2}  # 1 deduped within the bootstrap batch

    # batch 2: dup of batch-1 survivor 0 + a novel doc
    put("b2.json", [(10, novel),
                    (11, "entirely new content sharing nothing with anything")])
    run_once()
    s2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert s2 == {0, 2, 11}  # 10 dropped against the GROWN index

    # batch 3: dup of batch-2 survivor 11 -> the index grew again
    put("b3.json", [(20, "entirely new content sharing nothing with anything")])
    run_once()
    s3 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert s3 == {0, 2, 11}  # 20 dropped; consume-once: 0/2/11 not re-emitted


def test_streaming_bm25_index_restart_append_equals_rebuild(spark, tmp_path):
    """streaming/bm25_stream.py (VERDICT r16 #6): batch 0 bootstraps the
    token-bucket index, a checkpointed RESTART appends batch 1 exactly
    once, stored postings silently RESCORE under the merged corpus
    statistics, and the grown index is score-identical to a
    from-scratch one-pass build of the same corpus."""
    import json as _json

    from slowly_changing_dimensions_data_engineering_spark.operators.bm25 import (
        bm25_build_index, bm25_query_slice, bm25_term_freqs,
        bm25_tokenize_documents,
    )
    from slowly_changing_dimensions_data_engineering_spark.streaming.bm25_stream import (
        start_streaming_bm25_index,
    )

    src = tmp_path / "in"
    src.mkdir()
    index = str(tmp_path / "bm25idx")
    ck = str(tmp_path / "ck")
    docs = {1: "alpha beta gamma alpha", 2: "beta delta epsilon",
            3: "alpha zeta beta beta"}

    def put(name, ids):
        with open(src / name, "w") as f:
            for i in ids:
                f.write(_json.dumps({"doc_id": i, "text": docs[i]}) + "\n")

    def run_once():
        _drain(start_streaming_bm25_index(spark, str(src), index, ck,
                                          available_now=True))

    def probe(path):
        return {(r["cid"], r["token"]): r["contrib"] for r in
                bm25_query_slice(spark, path, ["alpha", "beta"]).collect()}

    put("b1.json", [1, 2])
    run_once()
    boot = probe(index)
    assert {c for c, _t in boot} == {100, 200}  # cid = doc_id*100

    put("b2.json", [3])
    run_once()  # RESTART on the same checkpoint: appends doc 3 only
    grown = probe(index)
    assert {c for c, _t in grown} == {100, 200, 300}
    # the probe rescored doc 1's stored posting under the 3-doc stats
    assert grown[(100, "alpha")] != boot[(100, "alpha")]

    # consume-once: a run with no new files appends nothing
    n_post = spark.read.parquet(index + "/postings").count()
    run_once()
    assert spark.read.parquet(index + "/postings").count() == n_post

    # append ≡ rebuild: one-pass build of the full corpus, same scores
    all_docs = spark.createDataFrame(sorted(docs.items()),
                                     ["doc_id", "text"])
    rebuilt = str(tmp_path / "rebuilt")
    bm25_build_index(bm25_term_freqs(bm25_tokenize_documents(all_docs)),
                     rebuilt)
    assert probe(rebuilt) == grown


def test_streaming_ann_index_grows_and_stays_searchable(spark, tmp_path):
    """streaming/ann_stream.py: batch 0 freezes the centroid geometry
    and builds the IVF index; later batches append into the existing
    centroid partitions (no rebuild, no reassignment of stored rows);
    searches between batches see monotonically growing coverage; the
    checkpoint gives consume-once across restarts."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        ivf_search_index_inplan,
    )
    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        load_centroids, start_streaming_ann_index,
    )

    src = tmp_path / "vin"
    src.mkdir()
    index = str(tmp_path / "ivfidx")
    ck = str(tmp_path / "ck")

    def put(name, rows):
        with open(src / name, "w") as f:
            for vid, vec in rows:
                f.write(_json.dumps({"vec_id": vid, "embedding": vec,
                                     "label": vid % 3}) + "\n")

    def run_once():
        q = start_streaming_ann_index(spark, str(src), index, ck,
                                      n_centroids=2, available_now=True)
        _drain(q)

    def search(vid):
        qrow = (spark.read.parquet(index)
                .filter(F.col("vec_id") == vid).select("vec_id", "embedding"))
        return {r["vec_id"] for r in
                ivf_search_index_inplan(spark, index, qrow,
                                        load_centroids(spark, index),
                                        k=10, nprobe=1).collect()}

    # batch 1 bootstraps: ids 0,1 become the frozen centroids
    put("b1.json", [(0, [1.0, 0.0]), (1, [10.0, 10.0]),
                    (2, [1.5, 0.1]), (3, [9.5, 10.0])])
    run_once()
    assert {r["centroid_id"] for r in
            load_centroids(spark, index).collect()} == {0, 1}
    assert spark.read.parquet(index).count() == 4
    assert search(0) == {2}          # cluster 0 holds {0, 2}

    # batch 2 appends near each centroid — partitions grow, no rebuild
    files_before = {os.path.join(dp, f)
                    for dp, _, fs in os.walk(index) for f in fs
                    if f.endswith(".parquet")}
    put("b2.json", [(10, [1.2, 0.1]), (11, [10.2, 9.9])])
    run_once()
    assert spark.read.parquet(index).count() == 6
    files_after = {os.path.join(dp, f)
                   for dp, _, fs in os.walk(index) for f in fs
                   if f.endswith(".parquet")}
    assert files_before < files_after  # pure append: old files untouched
    assert search(0) == {2, 10}      # the grown cluster is searchable
    assert search(1) == {3, 11}

    # restart with same checkpoint: consumed files never reprocessed
    run_once()
    assert spark.read.parquet(index).count() == 6


def test_stream_static_join_enriches_batches(spark, tmp_path):
    """Stream-static join: a streaming fact joined to a static
    dimension enriches every micro-batch (the dimension is re-resolved
    per batch — Spark's documented stream-static semantics), completing
    the streaming-join matrix next to the stream-stream interval join."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "ss_in"
    src.mkdir()
    dim = spark.createDataFrame(
        [(0, "browse"), (1, "buy")], ["type_id", "type_name"])

    with open(src / "b1.json", "w") as f:
        for i in range(6):
            f.write(_json.dumps({"event_id": i, "type_id": i % 2}) + "\n")

    stream = (spark.readStream
              .schema("event_id long, type_id int").json(str(src))
              .join(F.broadcast(dim), "type_id"))
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("ss_join").option("checkpointLocation",
                                      str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    _drain(q)
    rows = spark.sql("SELECT * FROM ss_join").collect()
    assert len(rows) == 6
    assert {(r["event_id"], r["type_name"]) for r in rows} == {
        (i, "buy" if i % 2 else "browse") for i in range(6)}


def test_streaming_mv_tracks_base_across_batches(spark, tmp_path):
    """streaming/mv_stream.py: each micro-batch merges a load file into
    the base and folds its CDC batch into the MV — after every batch the
    MV equals a full recompute, including updates that move rows between
    groups, with consume-once on input files via the checkpoint."""
    import json as _json

    from pyspark.sql import functions as F

    from slowly_changing_dimensions_data_engineering_spark import schemas
    from slowly_changing_dimensions_data_engineering_spark.store import TableStore
    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        start_streaming_mv,
    )

    src = tmp_path / "loads"
    src.mkdir()
    ck = str(tmp_path / "ck")
    store = TableStore(str(tmp_path / "store"))
    store.create("base", schemas.SUPPLIER, bucket_by=(["supplier_code"], 4))

    def put(name, rows):
        with open(src / name, "w") as f:
            for k, st in rows:
                f.write(_json.dumps({
                    "supplier_key": k, "supplier_code": f"S{k}",
                    "supplier_name": f"n{k}", "supplier_state": st}) + "\n")

    def run_once():
        q = start_streaming_mv(
            spark, str(src), store, "base", "mv", schemas.SUPPLIER,
            key=["supplier_code"],
            compare_cols=["supplier_state", "supplier_name", "supplier_key"],
            group_cols=["supplier_state"], sum_cols={"sum_key": "supplier_key"},
            checkpoint=ck, available_now=True,
            delete_match="supplier_name = '__tombstone__'")
        _drain(q)

    def mv():
        return {r["supplier_state"]: (r["n_rows"], r["sum_key"])
                for r in store.read(spark, "mv").collect()}

    def recompute():
        return {r["supplier_state"]: (r["n"], r["s"])
                for r in store.read(spark, "base").groupBy("supplier_state")
                .agg(F.count("*").alias("n"),
                     F.sum("supplier_key").alias("s")).collect()}

    put("l1.json", [(1, "CA"), (2, "CA"), (3, "NY")])
    run_once()
    assert mv() == recompute() == {"CA": (2, 3), "NY": (1, 3)}

    # batch 2: S3 moves NY->CA (NY vanishes), S4 inserts
    put("l2.json", [(3, "CA"), (4, "TX")])
    run_once()
    assert mv() == recompute()
    assert "NY" not in mv()

    # restart with same checkpoint: l1/l2 are NOT remerged (consume-once)
    run_once()
    assert mv() == recompute() == {"CA": (3, 6), "TX": (1, 4)}

    # batch 3: a tombstone row deletes S4 through the stream loop
    with open(src / "l3.json", "w") as f:
        f.write(_json.dumps({
            "supplier_key": 4, "supplier_code": "S4",
            "supplier_name": "__tombstone__", "supplier_state": "TX"}) + "\n")
    run_once()
    assert mv() == recompute() == {"CA": (3, 6)}


def test_streaming_ivfpq_freezes_both_dictionaries(spark, tmp_path):
    """The IVF-PQ stream's bootstrap freezes centroids AND codebooks;
    a checkpointed second batch must append rows whose stored codes
    equal a fresh pq_encode of those rows under the LOADED sidecar
    codebooks (frozen-dictionary contract, code-level), into the
    partitions of the loaded centroid geometry."""
    from slowly_changing_dimensions_data_engineering_spark.operators.pq import pq_encode
    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        ivf_assign,
    )
    from slowly_changing_dimensions_data_engineering_spark.streaming.ann_stream import (
        load_centroids, load_codebooks, start_streaming_ivfpq_index,
    )

    m, dim, ks, ncells = 2, 4, 4, 2
    root = str(tmp_path)
    in_dir, ckpt, idx = (os.path.join(root, d) for d in ("in", "ck", "idx"))
    os.makedirs(in_dir)

    def vec(i):
        return [round(((i * 37 + d * 11) % 97) / 48.0 - 1.0, 6)
                for d in range(1, dim + 1)]

    def stage(name, ids):
        with open(os.path.join(in_dir, name), "w") as fh:
            for i in ids:
                fh.write(json.dumps(
                    {"vec_id": i, "embedding": vec(i), "label": 0}) + "\n")

    def run():
        q = start_streaming_ivfpq_index(
            spark, in_dir, idx, ckpt, m=m, dim=dim, n_centroids=ncells,
            ks=ks, available_now=True)
        q.awaitTermination()

    stage("b0.json", range(0, 12))
    run()
    stage("b1.json", range(100, 108))
    run()

    cents = load_centroids(spark, idx)
    cb = load_codebooks(spark, idx)
    assert {r["centroid_id"] for r in cents.collect()} == {0, 1}  # batch-0 ids
    assert cb.count() == m * ks

    stored = {r["vec_id"]: (r["codes"], r["centroid_id"])
              for r in spark.read.parquet(idx).collect()}
    assert set(stored) == set(range(0, 12)) | set(range(100, 108))

    batch2 = spark.createDataFrame(
        [(i, vec(i)) for i in range(100, 108)], ["vec_id", "embedding"])
    expect_codes = {r["vec_id"]: r["codes"]
                    for r in pq_encode(batch2, cb, m, dim).collect()}
    expect_cells = {r["vec_id"]: r["centroid_id"]
                    for r in ivf_assign(batch2, cents,
                                        n_centroids=ncells).collect()}
    for i in range(100, 108):
        assert stored[i] == (expect_codes[i], expect_cells[i])


# --------------------------------------------------------------------
# click→purchase attribution pipeline (streaming/join_stream.py)
# --------------------------------------------------------------------

ATTR_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


def _write_attr_file(path, rows, mtime):
    with open(path, "w") as f:
        for eid, ts, uid, val in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts,
                                "user_id": uid, "value": val}) + "\n")
    os.utime(path, (mtime, mtime))


def test_click_attribution_restart_exactly_once_and_late_drop(spark, tmp_path):
    """The attribution pipeline end-to-end on synthetic streams:

    - run 1 (one file per side): the in-window pair emits to the
      parquet sink; the batch also advances both watermarks to ~19:50;
    - run 2 RESTARTS on the same checkpoint with a purchase at 10:30 —
      statically it matches click 1, but it arrives behind the global
      watermark and is DROPPED (the bounded-state price the module
      docstring states), and the restart must not re-emit run-1 pairs
      (parquet sink exactly-once via _spark_metadata)."""
    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        start_click_attribution,
    )

    c_dir, p_dir = tmp_path / "clicks", tmp_path / "purch"
    c_dir.mkdir()
    p_dir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = time.time()

    _write_attr_file(c_dir / "c1.json", [
        (1, "2024-01-01 10:00:00", 7, 0.0),
        (2, "2024-01-01 20:00:00", 7, 0.0),   # advances clicks watermark
    ], t0 - 100)
    _write_attr_file(p_dir / "p1.json", [
        (101, "2024-01-01 20:01:00", 7, 5.0),  # joins click 2 (+1m)
    ], t0 - 100)

    def run():
        q = start_click_attribution(
            spark, str(c_dir), str(p_dir), out, ckpt, ATTR_SCHEMA,
            join_window="1 hour", watermark_delay="10 minutes",
            available_now=True)
        _drain(q)

    run()
    pairs = {(r["click_id"], r["purchase_id"])
             for r in spark.read.parquet(out).collect()}
    assert pairs == {(2, 101)}

    # late beyond the global watermark (~19:51): statically matches
    # click 1, but the join must drop it
    _write_attr_file(p_dir / "p2.json", [
        (102, "2024-01-01 10:30:00", 7, 9.0),
    ], t0 - 50)
    run()
    rows = spark.read.parquet(out).collect()
    assert {(r["click_id"], r["purchase_id"]) for r in rows} == {(2, 101)}
    assert len(rows) == 1  # restart did not re-emit the run-1 pair


def test_click_attribution_cross_batch_match_within_watermark(spark, tmp_path):
    """The flip side of the eviction test: a purchase in a LATER
    micro-batch still joins a click buffered in state when it arrives
    within the watermark — cross-batch completeness under in-order
    feeding (what the registry pipeline relies on)."""
    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        start_click_attribution,
    )

    c_dir, p_dir = tmp_path / "clicks", tmp_path / "purch"
    c_dir.mkdir()
    p_dir.mkdir()
    t0 = time.time()
    _write_attr_file(c_dir / "c1.json", [
        (1, "2024-01-01 10:00:00", 7, 0.0),
    ], t0 - 100)
    _write_attr_file(p_dir / "p1.json", [
        (100, "2024-01-01 10:01:00", 7, 1.0),
    ], t0 - 100)
    # batch 2: purchase at 10:40 joins the batch-1 click (watermark
    # after batch 1 is ~9:51 — the click is live, the row is on time);
    # click 2 at 10:45 is AFTER purchase 101, so it matches nothing
    _write_attr_file(c_dir / "c2.json", [
        (2, "2024-01-01 10:45:00", 7, 0.0),
    ], t0 - 50)
    _write_attr_file(p_dir / "p2.json", [
        (101, "2024-01-01 10:40:00", 7, 2.0),
    ], t0 - 50)

    q = start_click_attribution(
        spark, str(c_dir), str(p_dir), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), ATTR_SCHEMA,
        join_window="1 hour", watermark_delay="10 minutes",
        available_now=True, max_files_per_trigger=1)
    _drain(q)
    pairs = {(r["click_id"], r["purchase_id"])
             for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert pairs == {(1, 100), (1, 101)}


def test_click_attribution_left_outer_null_after_watermark(spark, tmp_path):
    """The left-outer semantics that differ from inner: an unmatched
    click's NULL row is emitted only when the GLOBAL watermark — the
    MIN across both sources — passes the end of its join interval.
    Three phases pin exactly that:

    1. matched click emits its pair immediately; the unmatched click
       emits NOTHING (watermark hasn't passed click_ts + window);
    2. a far-future event on the CLICKS side only still emits nothing
       (the purchases watermark lags, and global = min of the two —
       note the per-source max-event-time trackers reset across
       restarts, so a later purchases-only run can NOT combine with
       this run's clicks advance; the flush sentinel must land on both
       sides within ONE run, which is what phase 3 does and what the
       registry pipeline's sentinel staging relies on);
    3. far-future events on BOTH sides in one run flush the null row —
       exactly once, and a further restart re-emits nothing."""
    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        start_click_attribution,
    )

    c_dir, p_dir = tmp_path / "clicks", tmp_path / "purch"
    c_dir.mkdir()
    p_dir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = time.time()

    def run():
        q = start_click_attribution(
            spark, str(c_dir), str(p_dir), out, ckpt, ATTR_SCHEMA,
            join_window="1 hour", watermark_delay="10 minutes",
            available_now=True, max_files_per_trigger=1,
            how="left_outer")
        _drain(q)

    def sink():
        return sorted((r["click_id"], r["purchase_id"])
                      for r in spark.read.parquet(out).collect())

    # phase 1: click 1 converts (pair emits on arrival — the inner
    # path), click 2 on user 8 never will; its interval ends 11:00 but
    # the watermark is only ~10:20 — no null row yet
    _write_attr_file(c_dir / "c1.json", [
        (1, "2024-01-01 10:00:00", 7, 0.0),
        (2, "2024-01-01 10:00:00", 8, 0.0),
    ], t0 - 100)
    _write_attr_file(p_dir / "p1.json", [
        (101, "2024-01-01 10:30:00", 7, 5.0),
    ], t0 - 100)
    run()
    assert sink() == [(1, 101)]

    # phase 2: advance only the clicks-side watermark far past 11:00 —
    # global watermark = min(sides) still ~10:20, null row still held
    _write_attr_file(c_dir / "c2.json", [
        (-1, "2024-01-02 10:00:00", -1, 0.0),
    ], t0 - 50)
    run()
    assert sink() == [(1, 101)]

    # phase 3: advance BOTH sides within one run — the global watermark
    # passes 11:00 and the no-data batch evicts click 2, emitting its
    # null-padded row exactly once (the sentinel events don't match:
    # the sentinel purchase precedes both sentinel clicks by 2h+)
    _write_attr_file(c_dir / "c3.json", [
        (-3, "2024-01-02 10:10:00", -1, 0.0),
    ], t0 - 40)
    _write_attr_file(p_dir / "p2.json", [
        (-2, "2024-01-02 08:00:00", -1, 0.0),
    ], t0 - 40)
    run()
    assert sink() == [(1, 101), (2, None)]
    # and the restart re-emits nothing
    run()
    assert sink() == [(1, 101), (2, None)]


def test_click_attribution_rejects_bad_join_type(spark, tmp_path):
    from slowly_changing_dimensions_data_engineering_spark.streaming import (
        start_click_attribution,
    )

    with pytest.raises(ValueError, match="join type"):
        start_click_attribution(
            spark, str(tmp_path), str(tmp_path), str(tmp_path / "o"),
            str(tmp_path / "k"), ATTR_SCHEMA, how="full_outer")


def test_trained_scoring_stream_exactly_once_and_exact(spark, tmp_path):
    """The stateless inference stream: scores equal the batch sigmoid
    bit-for-bit, an idle restart re-emits nothing, and a new slice
    after the restart appends exactly its rows (file-source tracking +
    parquet-sink commit log — the only exactly-once machinery this
    topology has)."""
    import json as _json
    import math

    from pyspark.sql import types as T
    from slowly_changing_dimensions_data_engineering_spark.streaming.score_stream import (
        start_trained_scoring,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    w, b = [0.5, -1.0, 2.0], 0.25

    def write_slice(name, rows):
        with open(in_dir / name, "w") as f:
            for vid, emb in rows:
                f.write(_json.dumps({"vec_id": vid, "embedding": emb}) + "\n")

    def run():
        q = start_trained_scoring(spark, str(in_dir), out, ckpt, schema,
                                  w, b, available_now=True)
        _drain(q)

    s1 = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 1.0])]
    write_slice("s1.json", s1)
    run()
    got = {r["vec_id"]: r for r in spark.read.parquet(out).collect()}
    for vid, emb in s1:
        z = sum(a * c for a, c in zip(emb, w)) + b
        assert got[vid]["score"] == round(1.0 / (1.0 + math.exp(-z)), 9)
        assert got[vid]["kept"] == (got[vid]["score"] >= 0.5)

    run()  # idle restart: nothing new, nothing re-emitted
    assert spark.read.parquet(out).count() == 2

    write_slice("s2.json", [(3, [1.0, 1.0, 1.0])])
    run()  # post-restart slice appends exactly once
    rows = spark.read.parquet(out).collect()
    assert sorted(r["vec_id"] for r in rows) == [1, 2, 3]


# --------------------------------------------------------------------
# streaming late-arriving SCD2 corrections (backdate_stream)
# --------------------------------------------------------------------

def test_streaming_backdate_restart_exactly_once_and_idempotent(
        spark, tmp_path):
    """streaming/backdate_stream.py restart drill: two correction files
    consumed across two availableNow runs on ONE checkpoint — run 2
    must splice ONLY the new file (file-level exactly-once), a third
    run with no new files must commit nothing, and replaying a
    correction (new file, same content) is the splice's documented
    no-op arm."""
    import datetime as dt

    from slowly_changing_dimensions_data_engineering_spark.store import TableStore
    from slowly_changing_dimensions_data_engineering_spark.streaming.backdate_stream import (
        start_streaming_backdate,
    )

    T_ = dt.datetime.fromisoformat
    store = TableStore(str(tmp_path / "store"))
    schema_stg = T.StructType([
        T.StructField("code", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("start_date", T.TimestampNTZType()),
        T.StructField("end_date", T.TimestampNTZType()),
        T.StructField("current_flag", T.StringType())])
    store.create("staging", schema_stg, bucket_by=(["code"], 4))
    store.commit_buckets("staging", spark.createDataFrame(
        [("A", "CA", T_("2024-01-01"), T_("2024-02-01"), "N"),
         ("A", "AZ", T_("2024-02-01"), None, "Y"),
         ("B", "NY", T_("2024-01-01"), None, "Y")],
        schema_stg), range(4))

    in_dir = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    corr_schema = T.StructType([
        T.StructField("code", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("effective_ts", T.StringType())])

    def write_corr(name, rows):
        with open(in_dir / name, "w") as f:
            for code, state, eff in rows:
                f.write(json.dumps({"code": code, "state": state,
                                    "effective_ts": eff}) + "\n")

    def run():
        q = start_streaming_backdate(
            spark, str(in_dir), store, "staging", corr_schema,
            business_key=["code"], cmp_cols=["state"],
            checkpoint=ckpt, available_now=True)
        q.awaitTermination()

    def chain():
        return sorted(tuple(r) for r in
                      store.read(spark, "staging").collect())

    # run 1: A corrected mid-interval
    write_corr("c0.json", [("A", "OR", "2024-01-15 00:00:00")])
    run()
    v1 = store.version("staging")
    assert chain() == [
        ("A", "AZ", T_("2024-02-01"), None, "Y"),
        ("A", "CA", T_("2024-01-01"), T_("2024-01-15"), "N"),
        ("A", "OR", T_("2024-01-15"), T_("2024-02-01"), "N"),
        ("B", "NY", T_("2024-01-01"), None, "Y")]

    # run 2 (RESTART): only the new file splices; c0 is not replayed
    write_corr("c1.json", [("B", "WA", "2024-01-20 00:00:00")])
    run()
    assert store.version("staging") == v1 + 1
    assert ("B", "WA", T_("2024-01-20"), None, "Y") in chain()
    assert ("B", "NY", T_("2024-01-01"), T_("2024-01-20"), "N") in chain()

    # run 3: nothing new -> no commit
    v2 = store.version("staging")
    run()
    assert store.version("staging") == v2

    # replayed correction content (new file, same rows as c0): the
    # spliced version already covers E with that state -> no-op arm,
    # chain unchanged (this is the crash-replay tolerance contract)
    before = chain()
    write_corr("c2.json", [("A", "OR", "2024-01-15 00:00:00")])
    run()
    assert chain() == before


def test_streaming_bm25_epoch_publish_replay_is_exactly_once(spark, tmp_path):
    """bm25_index_append_epoch: a replay of the SAME epoch (the
    crash-in-commit-window case the stream checkpoint produces)
    converges to the identical visible index state — including from a
    torn half-publish — instead of doubling the batch's tf rows the way
    a blind parquet append would."""
    from slowly_changing_dimensions_data_engineering_spark.operators.bm25 import (
        bm25_index_append_epoch, bm25_query_slice, bm25_term_freqs,
        bm25_tokenize_documents,
    )

    idx = str(tmp_path / "idx")
    docs0 = spark.createDataFrame([(1, "alpha beta alpha"),
                                   (2, "beta gamma")], ["doc_id", "text"])
    docs1 = spark.createDataFrame([(3, "alpha delta")], ["doc_id", "text"])
    tf0 = bm25_term_freqs(bm25_tokenize_documents(docs0))
    tf1 = bm25_term_freqs(bm25_tokenize_documents(docs1))

    def snap():
        rows = bm25_query_slice(spark, idx, ["alpha", "beta"]).collect()
        return sorted((r["cid"], r["token"], r["contrib"]) for r in rows)

    bm25_index_append_epoch(tf0, idx, 0)   # first publish bootstraps
    bm25_index_append_epoch(tf1, idx, 1)
    want = snap()
    assert {c for c, _t, _v in want} == {100, 200, 300}

    # clean replay of epoch 1 (append finished, checkpoint didn't)
    bm25_index_append_epoch(tf1, idx, 1)
    assert snap() == want
    # torn half-publish: one of epoch 1's published files is missing
    ep1 = [os.path.join(r, f)
           for r, _d, fs in os.walk(os.path.join(idx, "postings"))
           for f in fs if f.startswith("epoch1-")]
    assert ep1, "expected epoch-tagged posting files"
    os.remove(ep1[0])
    bm25_index_append_epoch(tf1, idx, 1)   # replay heals the tear
    assert snap() == want
    # no staging leftovers
    assert not os.path.isdir(os.path.join(idx, "_staging", "epoch-1"))
