"""Deletion-request propagation (operators/forget.py): once an id is
forgotten, it must be unreachable via EVERY derived artifact — the ANN
index, the minhash dedup index, the shard manifest — and gone from the
corpus store's current state, history, and change feed. The rewrites
must also be partition-LOCAL: untouched partition directories keep
their files byte-for-byte."""

import os

import pytest

from pyspark.sql import functions as F

from slowly_changing_dimensions_data_engineering_spark.operators.dedup import (
    minhash_band_frame,
    minhash_dedup_batch,
    minhash_index_append,
)
from slowly_changing_dimensions_data_engineering_spark.operators.forget import (
    forget_cascade,
    forget_partitions,
)
from slowly_changing_dimensions_data_engineering_spark.operators.merge import delete_where
from slowly_changing_dimensions_data_engineering_spark.operators.sampling import shard_assign
from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
    ivf_build_index,
    ivf_search_index,
    nearest_centroids,
)
from slowly_changing_dimensions_data_engineering_spark.store import TableStore


def _file_state(root):
    """{relative parquet path: (size, mtime_ns)} for every data file."""
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _mk_vectors(spark, n=40, dim=4):
    rows = [(i, [float((i * 7 + d * 3) % 11) / 11.0 + (1.0 if i % 4 == d else 0.0)
                 for d in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_forget_partitions_rewrites_only_affected(tmp_path, spark):
    """IVF layout: kills live in a subset of centroid partitions; the
    other partition directories keep their files byte-identical, and
    killed ids are gone from the tree."""
    vecs = _mk_vectors(spark)
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    path = str(tmp_path / "ivf")
    ivf_build_index(vecs, cents, path, n_centroids=4)
    idx = spark.read.parquet(path)
    # kill two vectors from ONE cell so at least one cell is untouched
    cell = idx.groupBy("centroid_id").count().orderBy("centroid_id") \
              .collect()[0]["centroid_id"]
    kill_ids = [r["vec_id"] for r in
                idx.filter(F.col("centroid_id") == cell)
                .orderBy("vec_id").limit(2).collect()]
    before = _file_state(path)
    n_before = idx.count()

    kill = spark.createDataFrame([(i,) for i in kill_ids], ["vec_id"])
    rep = forget_partitions(spark, path, kill, "vec_id", "centroid_id")

    assert rep["n_before"] == n_before
    assert rep["n_removed"] == len(kill_ids)
    assert rep["partitions_rewritten"] == [cell]
    assert rep["partitions_dropped"] == []
    after = _file_state(path)
    untouched_before = {p: s for p, s in before.items()
                        if f"centroid_id={cell}" not in p}
    untouched_after = {p: s for p, s in after.items()
                       if f"centroid_id={cell}" not in p}
    assert untouched_before == untouched_after  # byte-for-byte
    left = spark.read.parquet(path)
    assert left.filter(F.col("vec_id").isin(kill_ids)).count() == 0
    assert left.count() == n_before - len(kill_ids)


def test_forget_partitions_drops_emptied_partition(tmp_path, spark):
    """Killing every row of a partition must remove its directory —
    dynamic overwrite writes nothing for an empty partition, so stale
    files would otherwise stay live."""
    vecs = _mk_vectors(spark)
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    path = str(tmp_path / "ivf")
    ivf_build_index(vecs, cents, path, n_centroids=4)
    idx = spark.read.parquet(path)
    cell = idx.groupBy("centroid_id").count().orderBy("centroid_id") \
              .collect()[0]["centroid_id"]
    kill_ids = [r["vec_id"] for r in
                idx.filter(F.col("centroid_id") == cell).collect()]
    kill = spark.createDataFrame([(i,) for i in kill_ids], ["vec_id"])
    rep = forget_partitions(spark, path, kill, "vec_id", "centroid_id")
    assert rep["partitions_dropped"] == [cell]
    assert not os.path.exists(os.path.join(path, f"centroid_id={cell}"))
    left = spark.read.parquet(path)
    assert left.filter(F.col("centroid_id") == cell).count() == 0
    assert left.filter(F.col("vec_id").isin(kill_ids)).count() == 0


def test_forget_partitions_escaped_string_partition_values(tmp_path, spark):
    """Dropped-partition cleanup must resolve the ACTUAL escaped
    directory names Spark writes (%XX encoding for characters like
    ':' or ' '), not a formatted f"{col}={value}" guess — an unescaped
    guess raises FileNotFoundError mid-cleanup and aborts the audit
    after some partitions were already dropped."""
    rows = [(1, "plain"), (2, "has space"), (3, "a:b=c"), (4, "pct%20")]
    df = spark.createDataFrame(rows, ["doc_id", "shard"])
    path = str(tmp_path / "sharded")
    df.repartition(F.col("shard")).write.partitionBy("shard").parquet(path)
    # every value except "plain" needs escaping in its directory name
    kill = spark.createDataFrame([(2,), (3,), (4,)], ["doc_id"])
    rep = forget_partitions(spark, path, kill, "doc_id", "shard")
    assert sorted(rep["partitions_dropped"]) == ["a:b=c", "has space", "pct%20"]
    assert rep["n_after"] == 1
    left = spark.read.parquet(path)
    assert [r["shard"] for r in left.collect()] == ["plain"]


def test_forget_partitions_total_erasure_returns_zero(tmp_path, spark):
    """Killing EVERY row leaves a parquet tree with no data files; the
    audit must report n_after=0 instead of raising schema inference on
    the empty directory (r12 ADVICE)."""
    vecs = _mk_vectors(spark, n=12)
    cents = (vecs.filter(F.col("vec_id") < 2)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    path = str(tmp_path / "ivf")
    ivf_build_index(vecs, cents, path, n_centroids=2)
    kill = spark.createDataFrame([(i,) for i in range(12)], ["vec_id"])
    rep = forget_partitions(spark, path, kill, "vec_id", "centroid_id")
    assert rep["n_before"] == 12
    assert rep["n_after"] == 0 and rep["n_removed"] == 12
    assert rep["partitions_rewritten"] == []
    assert sorted(rep["partitions_dropped"]) == [0, 1]


def test_forget_partitions_safe_under_stabilize_none(tmp_path, spark):
    """spark.sds.stabilize.mode=none makes stabilize() pure lineage —
    which is NOT a read-before-overwrite barrier. forget_partitions must
    force a real checkpoint regardless, or the overwrite would consume a
    lazy plan over the very files it replaces (r12 ADVICE, medium)."""
    from slowly_changing_dimensions_data_engineering_spark.session import STABILIZE_MODE_CONF

    vecs = _mk_vectors(spark)
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    path = str(tmp_path / "ivf")
    ivf_build_index(vecs, cents, path, n_centroids=4)
    expected_survivors = sorted(
        r["vec_id"] for r in spark.read.parquet(path)
        .filter(~F.col("vec_id").isin([0, 1, 2, 3, 4, 5])).collect())
    prev = spark.conf.get(STABILIZE_MODE_CONF, "local")
    spark.conf.set(STABILIZE_MODE_CONF, "none")
    try:
        kill = spark.createDataFrame([(i,) for i in range(6)], ["vec_id"])
        rep = forget_partitions(spark, path, kill, "vec_id", "centroid_id")
    finally:
        spark.conf.set(STABILIZE_MODE_CONF, prev)
    left = spark.read.parquet(path)
    assert sorted(r["vec_id"] for r in left.collect()) == expected_survivors
    assert rep["n_removed"] == 6


def test_forget_partitions_rejects_remote_paths(tmp_path, spark):
    """Erasure over a non-local tree would silently no-op its
    dropped-partition cleanup (driver-local rmtree) — refuse loudly."""
    kill = spark.createDataFrame([(1,)], ["vec_id"])
    with pytest.raises(NotImplementedError, match="local filesystem"):
        forget_partitions(spark, "hdfs://nn/warehouse/idx", kill,
                          "vec_id", "centroid_id")


def test_forget_partitions_noop_on_absent_ids(tmp_path, spark):
    vecs = _mk_vectors(spark, n=12)
    cents = (vecs.filter(F.col("vec_id") < 2)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    path = str(tmp_path / "ivf")
    ivf_build_index(vecs, cents, path, n_centroids=2)
    before = _file_state(path)
    kill = spark.createDataFrame([(999,)], ["vec_id"])
    rep = forget_partitions(spark, path, kill, "vec_id", "centroid_id")
    assert rep["n_removed"] == 0
    assert rep["partitions_rewritten"] == []
    assert _file_state(path) == before  # nothing touched at all


def test_forgotten_vector_unreachable_via_ann_search(tmp_path, spark):
    """After the cascade, probing EVERY cell never returns the
    forgotten vector — the index-level unreachability claim."""
    vecs = _mk_vectors(spark)
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    path = str(tmp_path / "ivf")
    ivf_build_index(vecs, cents, path, n_centroids=4)
    victim = vecs.filter("vec_id = 17").collect()[0]
    # pre-delete: the victim IS its own nearest neighbor
    probes = nearest_centroids(cents, victim["embedding"], nprobe=4)
    pre = ivf_search_index(spark, path, victim["embedding"], probes, k=3)
    assert 17 in {r["vec_id"] for r in pre.collect()}

    forget_partitions(spark, path,
                      spark.createDataFrame([(17,)], ["vec_id"]),
                      "vec_id", "centroid_id")
    post = ivf_search_index(spark, path, victim["embedding"], probes,
                            k=vecs.count())
    assert 17 not in {r["vec_id"] for r in post.collect()}


def test_forgotten_doc_unreachable_via_minhash_index(tmp_path, spark):
    """A re-submitted duplicate of a forgotten document must sail
    through incremental dedup: the forgotten signatures seed no
    candidate pairs."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, "a completely different document about spark sql "
                        "engines and shuffle behavior at scale")],
        ["doc_id", "text"])
    path = str(tmp_path / "mh")
    minhash_index_append(minhash_band_frame(docs), path)

    # sanity: before erasure, a near-copy of doc 1 is caught
    dup = spark.createDataFrame([(10, text)], ["doc_id", "text"])
    caught = minhash_dedup_batch(spark, dup, path)
    assert caught.count() == 0  # dropped as a duplicate of doc 1

    forget_partitions(spark, path,
                      spark.createDataFrame([(1,), (10,)], ["doc_id"]),
                      "doc_id", "band")
    assert (spark.read.parquet(path)
            .filter(F.col("doc_id").isin([1, 10])).count() == 0)
    dup2 = spark.createDataFrame([(11, text)], ["doc_id", "text"])
    survived = minhash_dedup_batch(spark, dup2, path)
    assert [r["doc_id"] for r in survived.collect()] == [11]


def test_forget_cascade_and_store_erasure(tmp_path, spark):
    """The composed story: delete_where on the store (CDC DELETE rows,
    then vacuum erases the pre-deletion version AND the change batch)
    plus forget_cascade over a manifest — audit counts line up and the
    id is gone from every surface including time travel."""
    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(20)],
        "doc_id long, text string")
    store = TableStore(str(tmp_path / "store"))
    store.create("docs", docs.schema, bucket_by=(["doc_id"], 4))
    store.commit_buckets("docs", docs, range(4))
    v_loaded = store.version("docs")

    man_path = str(tmp_path / "manifest")
    (shard_assign(docs.select("doc_id"), n_shards=4, seed="e1")
     .write.partitionBy("shard").parquet(man_path))
    man_before = {(r["doc_id"], r["shard"], r["pos"])
                  for r in spark.read.parquet(man_path).collect()}

    delete_where(store, spark, "docs", "doc_id = 7", ["doc_id"])
    ch = store.read_changes(spark, "docs", since=v_loaded)
    assert [(r["doc_id"], r["METADATA$ACTION"], r["METADATA$ISUPDATE"])
            for r in ch.collect()] == [(7, "DELETE", False)]

    kill = spark.createDataFrame([(7,)], ["kid"])
    audit = {r["artifact"]: r for r in forget_cascade(
        spark, kill, "kid",
        {"manifest": (man_path, "doc_id", "shard")}).collect()}
    assert audit["manifest"]["n_removed"] == 1

    # current state: gone everywhere; surviving manifest rows untouched
    assert store.read(spark, "docs").filter("doc_id = 7").count() == 0
    man_after = {(r["doc_id"], r["shard"], r["pos"])
                 for r in spark.read.parquet(man_path).collect()}
    assert man_after == {t for t in man_before if t[0] != 7}

    # history: time travel still shows the row (retention window) ...
    assert store.read(spark, "docs", version=v_loaded) \
                .filter("doc_id = 7").count() == 1
    # ... until vacuum ages it out: full erasure
    store.vacuum("docs", keep_last=1)
    store.vacuum_changes("docs", through_version=store.version("docs"))
    with pytest.raises(Exception):
        store.read(spark, "docs", version=v_loaded).collect()
    assert store.read_changes(spark, "docs", since=v_loaded) is None or \
        store.read_changes(spark, "docs", since=v_loaded) \
             .filter("doc_id = 7").count() == 0


def test_neardup_expansion_erases_partners(tmp_path, spark):
    """Kill-list expansion: erasing a document also erases its
    near-duplicates from the index — the syndicated-copy case a
    per-id delete misses."""
    from slowly_changing_dimensions_data_engineering_spark.operators.dedup import minhash_near_dups
    from slowly_changing_dimensions_data_engineering_spark.operators.forget import forget_cascade

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill nearby and the "
            "afternoon sun slowly sets behind the old oak trees at "
            "the far end of the quiet garden path")
    near = base.replace("warm", "cold")
    other = ("completely unrelated text about distributed query "
             "engines shuffling parquet row groups across executors")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["doc_id", "text"])
    path = str(tmp_path / "mh")
    minhash_index_append(minhash_band_frame(docs), path)

    seeds = spark.createDataFrame([(1,)], ["doc_id"])
    pairs = minhash_near_dups(docs, threshold=0.5)
    partners = (pairs.join(seeds.withColumnRenamed("doc_id", "d1"), "d1")
                .select(F.col("d2").alias("doc_id"))
                .unionByName(
                    pairs.join(seeds.withColumnRenamed("doc_id", "d2"),
                               "d2")
                    .select(F.col("d1").alias("doc_id"))))
    kill = seeds.unionByName(partners).distinct()
    assert {r["doc_id"] for r in kill.collect()} == {1, 2}  # 2 = partner

    forget_cascade(spark, kill, "doc_id",
                   {"mh": (path, "doc_id", "band")})
    left = {r["doc_id"] for r in
            spark.read.parquet(path).select("doc_id").distinct().collect()}
    assert left == {3}


def test_forgotten_vector_unreachable_via_ivfpq_index(tmp_path, spark):
    """The cascade generalizes to the IVF-PQ index unchanged — same
    centroid_id-partitioned layout, rows are codes instead of floats:
    after erasure the victim is gone from the tree, never surfaces
    from an all-cells ADC search, and untouched cells keep their files
    byte-for-byte."""
    from slowly_changing_dimensions_data_engineering_spark.operators.pq import (
        ivfpq_build_index,
        ivfpq_search,
        pq_codebooks,
    )

    dim, m = 8, 2
    rows = [(i, [float((i * 5 + d * 3) % 13) / 13.0
                 + (1.0 if i % 4 == d % 4 else 0.0)
                 for d in range(dim)]) for i in range(32)]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = (vecs.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    cbs = pq_codebooks(vecs, m=m, ks=4, dim=dim)
    path = str(tmp_path / "ivfpq")
    ivfpq_build_index(vecs, cents, cbs, path, m=m, dim=dim,
                      n_centroids=4)
    victim = vecs.filter("vec_id = 13").collect()[0]
    qdf = spark.createDataFrame([(13, victim["embedding"])],
                                ["vec_id", "embedding"])
    pre = ivfpq_search(spark, path, cbs, cents, qdf, m=m, dim=dim,
                       k=32, nprobe=4, exclude_query_id=False)
    assert 13 in {r["vec_id"] for r in pre.collect()}
    idx = spark.read.parquet(path)
    vcell = idx.filter("vec_id = 13").collect()[0]["centroid_id"]
    before = _file_state(path)

    rep = forget_partitions(
        spark, path, spark.createDataFrame([(13,)], ["vec_id"]),
        "vec_id", "centroid_id")
    assert rep["n_removed"] == 1
    assert rep["partitions_rewritten"] == [vcell]
    untouched = lambda st: {p: v for p, v in st.items()  # noqa: E731
                            if f"centroid_id={vcell}" not in p}
    assert untouched(before) == untouched(_file_state(path))
    post = ivfpq_search(spark, path, cbs, cents, qdf, m=m, dim=dim,
                        k=32, nprobe=4, exclude_query_id=False)
    assert 13 not in {r["vec_id"] for r in post.collect()}
    assert spark.read.parquet(path).filter("vec_id = 13").count() == 0


def test_forgotten_media_asset_unreachable_via_feature_neardup(tmp_path, spark):
    """Media corpus as a forget-cascade target (VERDICT r12 #3): after
    erasing an asset from the centroid-partitioned feature artifact,
    the near-dup pair generation over the LIVE artifact can no longer
    surface it — its syndicated copy sails through as unique."""
    import struct

    from slowly_changing_dimensions_data_engineering_spark.operators.multimodal import (
        frame_mean_features, pack_fake_media)
    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        embedding_near_dup_pairs, ivf_assign)

    # two byte-identical assets (1, 2) + two distinct ones
    def frames(seed):
        return [bytes((seed * 37 + i * 11 + j) % 251 for j in range(16))
                for i in range(16)]

    payloads = [(1, pack_fake_media(16, 1, frames(3))),
                (2, pack_fake_media(16, 1, frames(3))),
                (3, pack_fake_media(16, 1, frames(5))),
                (4, pack_fake_media(16, 1, frames(9)))]
    media = spark.createDataFrame(payloads, "media_id long, content binary")
    feats = frame_mean_features(media).select("media_id", "features")
    cents = (feats.orderBy("media_id").limit(2)
             .select(F.col("media_id").alias("centroid_id"),
                     F.col("features").alias("embedding")))
    # persist the centroid-partitioned feature artifact (the IVF layout)
    assign = ivf_assign(feats, cents, id_col="media_id", vec_col="features")
    path = str(tmp_path / "media_feats")
    (feats.join(assign, "media_id")
     .write.partitionBy("centroid_id").parquet(path))

    def live_pairs():
        idx = spark.read.parquet(path)
        return {(r["v1"], r["v2"]) for r in embedding_near_dup_pairs(
            idx, block_col="centroid_id", id_col="media_id",
            vec_col="features", threshold=0.95).collect()}

    assert (1, 2) in live_pairs()  # the duplicate is visible pre-erasure

    rep = forget_partitions(
        spark, path, spark.createDataFrame([(1,)], ["media_id"]),
        "media_id", "centroid_id")
    assert rep["n_removed"] == 1
    post = live_pairs()
    assert all(1 not in p for p in post)
    assert spark.read.parquet(path).filter("media_id = 1").count() == 0
