"""M2 — SCD Type-2 merge (CDC stream → history table) + S9 master refresh.

Re-implements the STAGING merge of
``SCD-Configuration Setup.sql:143-153`` / ``SCD-Automation.sql:83-93``:

    MERGE INTO staging USING stream
      ON (t.supplier_code = s.supplier_code
          AND t.supplier_state = s.supplier_state)     -- J2: composite key;
                                                       -- the SCD column of
                                                       -- interest IS part of
                                                       -- the key
      WHEN MATCHED AND METADATA$ACTION = 'DELETE' THEN
        UPDATE SET end_date = now, current_flag = 'N'   -- close version
      WHEN NOT MATCHED AND METADATA$ACTION = 'INSERT' THEN
        INSERT (..., start_date, end_date, current_flag)
        VALUES (..., now, NULL, 'Y')                    -- open version

Deliberately-preserved reference quirks (SURVEY.md §2.1 edge case 4):
- matched + INSERT action   → no-op (a supplier reverting to a previously
  held state does NOT reopen a version — latent reference bug, kept);
- not-matched + DELETE      → no-op;
- a DELETE row closes EVERY staging row matching (code, state), exactly
  like Snowflake's multi-row MATCHED update.

**Statement-constant timestamp** (F1/F2, golden Setup.sql:255-258): all
rows touched by one merge share ONE ``now`` value, so callers pass it in
(computed once per cycle) rather than letting each task re-evaluate.

Physical strategy: the stream batch is delta-sized → both the close join
and the open anti-join broadcast the batch; the staging rewrite is the
only large-data path. On a partitioned staging table only partitions
holding matched keys would rewrite (Delta-merge file pruning analogue).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from ..schemas import CDC_ACTION
from ..session import stabilize

SCD2_COLS = ["start_date", "end_date", "current_flag"]


def plan_scd2(
    staging: DataFrame,
    stream: DataFrame,
    key: list[str],
    now: dt.datetime,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Return the post-merge staging snapshot (lazy plan).

    ``key`` is the composite merge key — for the reference pipeline
    ``["supplier_code", "supplier_state"]`` (business key + SCD column of
    interest, SCD-Automation.sql:85).
    ``carry_cols`` are the non-key payload columns inserted into new
    versions (defaults to every staging column except the SCD2 triplet).
    """
    base_cols = [c for c in staging.columns if c not in SCD2_COLS]
    carry_cols = carry_cols if carry_cols is not None else base_cols
    now_lit = F.lit(now).cast("timestamp_ntz")

    # WHEN MATCHED AND action='DELETE' → close the version. No broadcast
    # hint: the stream batch scales with the load; AQE broadcasts it at
    # runtime when it is actually small (a full-table backfill must not
    # be forced through the driver).
    del_keys = (
        stream.filter(F.col(f"`{CDC_ACTION}`") == "DELETE")
        .select(*key).distinct().withColumn("_close", F.lit(True))
    )
    closed = (
        staging.join(del_keys, key, "left")
        .withColumn(
            "end_date",
            F.when(F.col("_close"), now_lit).otherwise(F.col("end_date")),
        )
        .withColumn(
            "current_flag",
            F.when(F.col("_close"), F.lit("N")).otherwise(F.col("current_flag")),
        )
        .drop("_close")
        .select(*staging.columns)
    )

    # WHEN NOT MATCHED AND action='INSERT' → open a version.
    # Scale note: an anti-join of (small stream) against (huge staging)
    # would shuffle staging. Instead, semi-probe staging with the
    # broadcast stream to get the matched-key set (≤ stream size), then
    # anti-join the stream against THAT — staging is only ever the probe
    # side of a broadcast join.
    ins = stream.filter(F.col(f"`{CDC_ACTION}`") == "INSERT")
    matched_keys = (
        staging.join(ins.select(*key).distinct(), key, "left_semi")
        .select(*key).distinct()
    )
    opened = (
        ins.join(matched_keys, key, "left_anti")
        .select(
            *base_cols,
            now_lit.alias("start_date"),
            F.lit(None).cast("timestamp_ntz").alias("end_date"),
            F.lit("Y").alias("current_flag"),
        )
        .select(*staging.columns)
    )
    return closed.unionByName(opened)


def scd2_merge(store, spark, staging_name: str, stream: DataFrame,
               key: list[str], now: dt.datetime,
               offsets: dict[str, int] | None = None) -> int:
    """Execute M2 against the store (one atomic commit).

    On a bucketed staging table the merge is PRUNED to the buckets the
    stream batch touches (bucket cols ⊆ the composite merge key, so every
    close/open lands in a stream-key bucket); other buckets keep their
    files — see merge.merge_upsert.

    ``offsets`` rides the staging commit's atomic meta swap (C3): a
    consuming pipeline passes its stream consumer's high-watermark so a
    crash right after this merge can never replay the batch into the
    already-merged staging (replay is structurally idempotent for SCD2
    — re-closes re-match, re-opens no-op — but would re-stamp closed
    rows' end_date with the replay cycle's timestamp)."""
    # The stream batch feeds the bucket probe, the close join and the
    # open anti-join — materialize it once (delta-sized).
    stream = stabilize(stream)
    if store.version(staging_name) < 0:
        # Empty staging: nothing can match — every INSERT action opens a
        # version (no close join needed).
        scols = store.schema(staging_name).fieldNames()
        base_cols = [c for c in scols if c not in SCD2_COLS]
        now_lit = F.lit(now).cast("timestamp_ntz")
        opened = (
            stream.filter(F.col(f"`{CDC_ACTION}`") == "INSERT")
            .select(*base_cols,
                    now_lit.alias("start_date"),
                    F.lit(None).cast("timestamp_ntz").alias("end_date"),
                    F.lit("Y").alias("current_flag"))
            .select(*scols)
        )
        return store.commit(staging_name, opened, offsets=offsets)
    spec = store.bucket_spec(staging_name)
    # Pruning requires bucket cols ⊆ merge key (see merge.merge_upsert);
    # a staging table bucketed otherwise takes the full-read path.
    if spec is not None and set(spec[0]) <= set(key):
        from .merge import touched_buckets
        bcols, n = spec
        ids = touched_buckets(stream, bcols, n)
        staging = store.read_buckets(spark, staging_name, ids)
        return store.commit_buckets(
            staging_name, plan_scd2(staging, stream, key, now), ids,
            offsets=offsets)
    staging = store.read(spark, staging_name)
    return store.commit(staging_name, plan_scd2(staging, stream, key, now),
                        offsets=offsets)


def plan_master(staging: DataFrame, cols: list[str]) -> DataFrame:
    """S9 + P1 + P2 — current-rows-only reporting snapshot
    (``INSERT OVERWRITE INTO master SELECT <cols> WHERE current_flag='Y'``,
    Setup.sql:160-161). Full rebuild each cycle, as in the reference."""
    return staging.filter(F.col("current_flag") == "Y").select(*cols)


def refresh_master(store, spark, master_name: str, staging_name: str) -> int:
    staging = store.read(spark, staging_name)
    return store.commit(master_name, plan_master(staging, store.schema(master_name).fieldNames()))
