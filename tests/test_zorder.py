"""Z-order clustered compaction: the claim is a LAYOUT property, so the
assertions read actual parquet footer min/max stats. For 2-D uniform
data split into 8 files, a linear layout gives every file the full
range of both columns (nothing prunable on either); the z-ordered
layout must give every file a narrow slab of BOTH columns, so a point
predicate on either dimension skips most files."""

from __future__ import annotations

import random

import pyarrow.parquet as pq

from slowly_changing_dimensions_data_engineering_spark import schemas
from slowly_changing_dimensions_data_engineering_spark.store import (
    TableStore, zorder_cluster)


def _file_spans(store, name, cols):
    """Per parquet file: {col: (min, max)} from the footer row groups."""
    meta = store._read_meta(name)
    out = []
    for f in store._parquet_files(store._vdir(name, meta["latest"])):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        spans = {}
        for c in cols:
            idx = names.index(c)
            mn = min(pf.metadata.row_group(g).column(idx).statistics.min
                     for g in range(pf.metadata.num_row_groups))
            mx = max(pf.metadata.row_group(g).column(idx).statistics.max
                     for g in range(pf.metadata.num_row_groups))
            spans[c] = (mn, mx)
        out.append(spans)
    return out


def _covered_fraction(spans, col, lo, hi):
    """Mean fraction of the [lo, hi] domain each file's stats cover."""
    return sum((mx - mn) / (hi - lo) for mn, mx in
               (s[col] for s in spans)) / len(spans)


def test_zorder_compact_tightens_stats_on_both_dims(spark, tmp_path):
    rng = random.Random(11)
    rows = [(i, f"S{i}", float(rng.randrange(10_000)),
             float(rng.randrange(10_000))) for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, code string, x double, y double")

    store = TableStore(str(tmp_path))
    sch = df.schema
    store.create("lin", sch)
    store.commit("lin", df.repartition(8))          # layout-free baseline
    store.create("zed", sch)
    store.commit("zed", df.coalesce(1))
    v0 = store.version("zed")
    v = store.compact(spark, "zed", cluster_by=["x", "y"],
                      target_file_bytes=20_000)     # force ~16 output files
    assert v == v0 + 1
    # contents bit-identical
    assert store.read(spark, "zed").count() == 20_000
    assert (store.read(spark, "zed").agg({"x": "sum"}).head()[0]
            == store.read(spark, "lin").agg({"x": "sum"}).head()[0])

    lin = _file_spans(store, "lin", ["x", "y"])
    zed = _file_spans(store, "zed", ["x", "y"])
    assert len(zed) >= 4
    for c in ("x", "y"):
        # hash-partitioned files span ~the whole domain on every column…
        assert _covered_fraction(lin, c, 0, 9999) > 0.9
        # …z-ordered files must be materially tighter on BOTH columns
        # (16 z-range files over 2-D ≈ quarter-slabs in each dimension)
        assert _covered_fraction(zed, c, 0, 9999) < 0.55, (c, zed)


def test_zorder_within_buckets_preserves_layout_and_sorts(spark, tmp_path):
    """Per-bucket Z-ORDER (compact cluster_by on a bucketed table): the
    hash-bucket layout survives (pruned reads still resolve), contents
    are bit-identical, and every bucket file is Morton-sorted so row
    groups carry tight stats on both cluster columns."""
    from slowly_changing_dimensions_data_engineering_spark.store import bucket_id, morton_key

    rng = random.Random(7)
    rows = [(i, f"S{i}", float(rng.randrange(10_000)),
             float(rng.randrange(10_000))) for i in range(5_000)]
    df = spark.createDataFrame(rows, "id long, code string, x double, y double")
    store = TableStore(str(tmp_path))
    store.create("b", df.schema, bucket_by=(["code"], 4))
    store.commit("b", df)
    before = store.read(spark, "b").agg({"x": "sum"}).head()[0]

    v = store.compact(spark, "b", cluster_by=["x", "y"])
    assert v == store.version("b")
    got = store.read(spark, "b")
    assert got.count() == 5_000
    assert got.agg({"x": "sum"}).head()[0] == before

    # bucket layout intact: a pruned single-bucket read returns exactly
    # that bucket's keys
    b7 = spark.createDataFrame([("S7",)], ["code"]) \
        .select(bucket_id(["code"], 4).alias("b")).head()["b"]
    pruned = store.read_buckets(spark, "b", [b7])
    assert pruned.filter("code = 'S7'").count() == 1
    assert pruned.select(bucket_id(["code"], 4).alias("bb")) \
        .filter(f"bb != {b7}").count() == 0

    # every bucket file is sorted by the Morton key
    import pyarrow.parquet as pq
    mn = [min(r[2] for r in rows), min(r[3] for r in rows)]
    mx = [max(r[2] for r in rows), max(r[3] for r in rows)]
    vdir = store._vdir("b", v)
    import os
    checked = 0
    for d in sorted(os.listdir(vdir)):
        if not d.startswith("_bucket="):
            continue
        for f in store._parquet_files(os.path.join(vdir, d)):
            t = pq.read_table(f, columns=["x", "y"]).to_pydict()
            zdf = spark.createDataFrame(
                list(zip(t["x"], t["y"])), "x double, y double") \
                .coalesce(1) \
                .select(morton_key(["x", "y"], mn, mx).alias("z"))
            zs = [r["z"] for r in zdf.collect()]
            assert zs == sorted(zs), f
            checked += 1
    assert checked >= 4


def test_zorder_bucketed_non_numeric_or_constant_cluster_cols(spark, tmp_path):
    """ADVICE r5 (store.py compact): a cluster column whose double cast
    is all-NULL (a string code) or whose bounds are degenerate must be
    treated as the constant-column case — it drops out of the Morton
    ordering instead of raising TypeError on a None comparison."""
    rows = [(i, f"S{i}", float(i % 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, code string, x double")
    store = TableStore(str(tmp_path))
    store.create("b", df.schema, bucket_by=(["code"], 2))
    store.commit("b", df)

    # 'code' casts to all-NULL doubles -> None bounds -> constant case
    v = store.compact(spark, "b", cluster_by=["code", "x"])
    got = store.read(spark, "b")
    assert got.count() == 200
    assert v == store.version("b")

    # all-constant cluster set (every bound degenerate) also commits
    v2 = store.compact(spark, "b", cluster_by=["code"])
    assert store.read(spark, "b").count() == 200
    assert v2 == store.version("b")
