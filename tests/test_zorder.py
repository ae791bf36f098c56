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


def test_zorder_rejects_bucketed_tables(spark, tmp_path):
    import pytest

    store = TableStore(str(tmp_path))
    store.create("b", schemas.SUPPLIER, bucket_by=(["supplier_code"], 4))
    with pytest.raises(ValueError):
        store.compact(spark, "b", cluster_by=["supplier_key"])
