"""Snapshot diff — version-to-version row-level change reconstruction.

The store's CDC stream (``read_changes``) is the PRIMARY change surface:
merges attach their change batches at commit time. But two snapshots can
also differ where no batch exists — a table loaded by full rebuilds, a
clone that diverged, an audit of what a maintenance window actually
touched. ``snapshot_diff`` reconstructs the logical delta between any
two readable versions, emitting the SAME row encoding the CDC stream
uses (DELETE pre-image + INSERT post-image per update, shared key), so
downstream consumers — the incremental-MV fold, the SCD2 merge — can
consume a reconstructed delta exactly like a streamed one. This is the
Delta Lake ``table_changes``-without-CDF fallback.

Cost model (honest): one full-outer join of the two snapshots on the
key — both sides shuffle. That is inherent to diffing WITHOUT a change
log; when the store recorded CDC for the interval, ``read_changes`` is
O(delta) and strictly better. Diff is the audit/fallback tool, priced
accordingly; at 100 TB run it bucket-parallel (both snapshots of a
bucketed table share the bucket function, so the join never crosses
buckets — Spark still plans the shuffle, but skew is bounded by key
uniformity).

No reference parity: the reference exposes only the stream
(SCD-Configuration Setup.sql:58); diff is engine surface its users gain.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..schemas import CDC_ACTION, CDC_ISUPDATE, CDC_ROW_ID


def snapshot_diff(store, spark, name: str, v_from: int, v_to: int,
                  key: list[str], check_keys: bool = True) -> DataFrame:
    """Row-level changes turning version ``v_from`` into ``v_to``.

    Returns the table's columns + ``change_type`` ∈ {'insert',
    'delete', 'update_preimage', 'update_postimage'}; an update emits
    its pre- and post-image as two rows (the stream's pair encoding).
    ``key`` must identify logical rows in both versions (enforced:
    duplicate keys on either side raise, because pair encoding is
    ill-defined for them — diff multisets instead if you need that).

    ``check_keys=False`` skips the two eager full-snapshot
    pre-aggregations that enforce uniqueness — for tables whose key is
    already guaranteed unique (a merge-maintained table, a primary-keyed
    load), the guard is two extra full scans per audit. CONTRACT
    VIOLATION MODE: with duplicates present and the guard off, the
    full-outer join fans out per duplicate pair and the emitted
    "pairs" are meaningless — no error is raised. Only disable the
    guard when uniqueness is enforced upstream.
    """
    cols = store.schema(name).fieldNames()
    nonkey = [c for c in cols if c not in key]
    a = store.read(spark, name, version=v_from)
    b = store.read(spark, name, version=v_to)
    if check_keys:
        for side, df in (("v_from", a), ("v_to", b)):
            dups = df.groupBy(*key).count().filter("count > 1")
            if not dups.isEmpty():
                raise ValueError(
                    f"snapshot_diff: duplicate keys in {name}@{side}; "
                    "pair encoding needs unique keys per version")
    fa = a.withColumn("_pa", F.lit(True)).alias("a")
    fb = b.withColumn("_pb", F.lit(True)).alias("b")
    on = reduce(lambda x, y: x & y,
                [F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in key])
    j = fa.join(fb, on, "full_outer")
    changed = (
        reduce(lambda x, y: x | y,
               [~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in nonkey])
        if nonkey else F.lit(False))

    def side_cols(p):
        return [F.col(f"{p}.{c}").alias(c) for c in cols]

    ins = (j.filter(F.col("_pa").isNull())
           .select(*side_cols("b"), F.lit("insert").alias("change_type")))
    dele = (j.filter(F.col("_pb").isNull())
            .select(*side_cols("a"), F.lit("delete").alias("change_type")))
    upd = j.filter(F.col("_pa").isNotNull() & F.col("_pb").isNotNull()
                   & changed)
    pre = upd.select(*side_cols("a"),
                     F.lit("update_preimage").alias("change_type"))
    post = upd.select(*side_cols("b"),
                      F.lit("update_postimage").alias("change_type"))
    return ins.unionByName(dele).unionByName(pre).unionByName(post)


def as_cdc(diff_df: DataFrame, key: list[str]) -> DataFrame:
    """Re-encode a ``snapshot_diff`` result as a CDC change batch —
    the exact METADATA$ACTION / METADATA$ISUPDATE / METADATA$ROW_ID
    schema the store's stream emits (schemas.cdc_schema), so every
    stream consumer (``scd2_merge``, the incremental-MV fold) ingests a
    reconstructed delta with zero special-casing:

    - insert            → (INSERT, ISUPDATE=false)
    - delete            → (DELETE, ISUPDATE=false)  — a true removal
    - update_preimage   → (DELETE, ISUPDATE=true)
    - update_postimage  → (INSERT, ISUPDATE=true)

    ROW_ID is the same key hash the merge assigns, so an update's
    reconstructed pre/post rows pair up exactly like streamed ones
    (round-trip proven in tests/test_diff_quality.py)."""
    rid = F.md5(F.concat_ws("\x1f",
                            *[F.col(k).cast("string") for k in key]))
    cols = [c for c in diff_df.columns if c != "change_type"]
    ct = F.col("change_type")
    return diff_df.select(
        *cols,
        F.when(ct.isin("insert", "update_postimage"), F.lit("INSERT"))
         .otherwise(F.lit("DELETE")).alias(CDC_ACTION),
        ct.startswith("update").alias(CDC_ISUPDATE),
        rid.alias(CDC_ROW_ID))
