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
    # Validation baseline captured at snapshot-read time (the close/open
    # derivation is a table-sized job on the unbucketed path; a commit
    # landing during it must conflict, not be silently overwritten).
    read_version = store.version(staging_name)
    if read_version < 0:
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
        return store.commit(staging_name, opened, offsets=offsets,
                            read_version=-1)
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
            offsets=offsets, read_version=read_version)
    staging = store.read(spark, staging_name, version=read_version)
    return store.commit(staging_name, plan_scd2(staging, stream, key, now),
                        offsets=offsets, read_version=read_version)


def merge_from_stream(store, spark, staging_name: str, base_name: str,
                      consumer: str, key: list[str], now: dt.datetime,
                      occ_retries: int = 3) -> int:
    """The reference's task4 as ONE statement: ``MERGE INTO staging
    USING (SELECT * FROM stream)`` (``SCD-Automation.sql:83-93``) —
    stream read, SCD2 merge, and consume-once offset advance in a
    single optimistic transaction, instead of the caller composing
    ``get_offset`` + ``read_changes`` + ``scd2_merge`` by hand.

    The OCC × C3 interaction this closes: the offset and the stream
    batch are (re)resolved INSIDE each optimistic attempt, and the
    staging commit validates the version the merge's snapshot read saw.
    So a concurrent writer landing between the stream read and the
    merge commit — another instance of this statement, a backfill, a
    backdate splice — conflicts, and the retry re-reads the offset
    from the WINNER's committed watermark: a batch the winner already
    consumed is not replayed (the retry sees it gone — Snowflake's
    "stream data once used will be GONE permanently",
    ``SCD-Automation.sql:142``), and a batch nobody consumed is merged
    exactly once. No interleaving can double-apply or drop a change
    batch; drilled in tests/test_concurrency.py.

    Returns the staging version (current version if nothing pending)."""
    from .merge import _occ_retry

    def attempt() -> int:
        offset = store.get_offset(consumer, table=staging_name)
        stream = store.read_changes(spark, base_name, since=offset)
        if stream is None:
            return store.version(staging_name)
        consumed_to = max(store.change_versions(base_name, offset))
        return scd2_merge(store, spark, staging_name, stream, key, now,
                          offsets={consumer: consumed_to})

    v = _occ_retry(attempt, occ_retries, store, staging_name)
    # Best-effort global mirror (retention bookkeeping only; the
    # authoritative watermark rode the staging commit's meta swap).
    consumed = store.get_offset(consumer, table=staging_name)
    if consumed >= 0:
        store.set_offset(consumer, consumed)
    return v


def plan_master(staging: DataFrame, cols: list[str]) -> DataFrame:
    """S9 + P1 + P2 — current-rows-only reporting snapshot
    (``INSERT OVERWRITE INTO master SELECT <cols> WHERE current_flag='Y'``,
    Setup.sql:160-161). Full rebuild each cycle, as in the reference."""
    return staging.filter(F.col("current_flag") == "Y").select(*cols)


def refresh_master(store, spark, master_name: str, staging_name: str) -> int:
    staging = store.read(spark, staging_name)
    return store.commit(master_name, plan_master(staging, store.schema(master_name).fieldNames()))


def plan_scd2_backdate(staging: DataFrame, corrections: DataFrame,
                       business_key: list[str], cmp_cols: list[str],
                       eff_col: str = "effective_ts") -> DataFrame:
    """Late-arriving SCD2 correction SPLICE (lazy plan) — the dimension
    capability the reference's forward-only merge cannot express: a
    correction whose effective time E lies in the PAST is spliced into
    the existing version chain so point-in-time queries as of t >= E see
    the corrected state, without disturbing versions after the next
    known change.

    ``corrections`` carries the base (non-SCD2) payload columns plus
    ``eff_col``; ``business_key`` is the BUSINESS key (the reference's
    ``supplier_code``), NOT the (code, state) composite — the covering
    version is located by interval, not by state equality. One
    correction per key per call: the latest ``eff_col`` wins
    (deterministic row_number dedupe).

    Semantics per correction (key K, payload P, effective E):

    - **covering version exists** (start <= E < end, end NULL = +inf):
      - state unchanged (every ``cmp_cols`` value null-SAFE equal —
        unlike the merge path's deliberately null-sensitive J3 guard,
        a re-assertion of NULL must be a no-op here, not a splice):
        correction dropped (idempotent re-assertion);
      - state differs and start < E: the covering version is CLOSED at
        E (its flag becomes 'N' — it is no longer the latest knowledge
        for any instant >= E) and a spliced version [E, old end) with
        payload P inherits the old end/current_flag;
      - state differs and start == E: full RESTATEMENT of that version
        — it is replaced by [E, old end) with payload P (no degenerate
        empty [start, start) stub is emitted).
    - **no covering version** (E in a gap, E before the first version,
      E after a fully-closed chain, or unknown key): a version
      [E, next start after E) is inserted, closed 'N' when a later
      version exists, open 'Y' otherwise (unknown keys therefore insert
      an open version — the correction IS the current knowledge).

    Scale shape: corrections are delta-sized; staging is scanned exactly
    TWICE — once by the main pass (one left join against the deduped
    correction frame, AQE-broadcast like plan_scd2's no-hint policy,
    emitting 1-2 output rows per staging row via a single explode —
    never one scan per case arm) and once by the orphan aggregate,
    whose shuffle payload is only the corrected keys' (key, start)
    pairs. Staging itself is never shuffled.
    """
    from pyspark.sql import Window

    base_cols = [c for c in staging.columns if c not in SCD2_COLS]
    # Tie-break over ALL payload columns, not just cmp_cols: two
    # corrections tying on eff_col and every compared column but
    # differing in a non-compared payload column must pick ONE
    # deterministic survivor, or the spliced row's payload would vary
    # across runs (ADVICE r14 #2). Key columns are partition-constant
    # and drop out naturally.
    tie_cols = cmp_cols + [c for c in base_cols
                           if c not in cmp_cols and c not in business_key]
    w = Window.partitionBy(*business_key).orderBy(
        F.desc(eff_col), *[F.desc(c) for c in tie_cols])
    corr = (corrections
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*[F.col(c).alias(f"_c_{c}") for c in base_cols],
                    F.col(eff_col).cast("timestamp_ntz").alias("_eff"))
            # A NULL effective time is garbage input, not a correction:
            # it can cover no interval, and letting it through to the
            # orphan arm would emit an open row with a NULL start_date
            # next to an existing current version (ADVICE r14 #1).
            .filter(F.col("_eff").isNotNull()))
    corr = stabilize(corr)  # feeds the main join, the orphan arm and
    # the key probe — one evaluation (delta-sized frame)

    on = [staging[k].eqNullSafe(F.col(f"_c_{k}")) for k in business_key]
    j = staging.join(corr, _and_all(on), "left")
    covers = (F.col("_eff").isNotNull()
              & (F.col("_eff") >= F.col("start_date"))
              & (F.col("end_date").isNull()
                 | (F.col("_eff") < F.col("end_date"))))
    same = _and_all([F.col(c).eqNullSafe(F.col(f"_c_{c}"))
                     for c in cmp_cols])
    split = covers & ~same

    # One output struct per case, fields in staging column order; the
    # per-row case picks which structs to emit and ONE explode yields
    # them — the whole main pass is a single staging scan.
    def mk(fields: dict) -> F.Column:
        return F.struct(*[fields[c].alias(c) for c in staging.columns])

    orig = mk({c: F.col(c) for c in staging.columns})
    closed_head = mk({**{c: F.col(c) for c in base_cols},
                      "start_date": F.col("start_date"),
                      "end_date": F.col("_eff"),
                      "current_flag": F.lit("N")})
    spliced = mk({**{c: F.col(f"_c_{c}") for c in base_cols},
                  "start_date": F.col("_eff"),
                  "end_date": F.col("end_date"),
                  "current_flag": F.col("current_flag")})
    emit = (F.when(split & (F.col("start_date") < F.col("_eff")),
                   F.array(closed_head, spliced))
            .when(split, F.array(spliced))      # restatement at E==start
            .otherwise(F.array(orig)))
    main = j.select(F.explode(emit).alias("_r")).select("_r.*")

    # Orphan arm: corrections whose key+E no version covers get a
    # [E, next start after E) row. One aggregate over the JOINED frame
    # (matched rows only) yields per-key coverage AND the next start;
    # unknown keys never match, fall out of the aggregate, and take the
    # open-row branch through the left join's NULLs. Conditional agg,
    # NOT filter-then-agg: a correction after a fully-CLOSED chain
    # (every start <= E) must still produce its open row.
    stats = (j.filter(F.col("_eff").isNotNull())
             .groupBy(*[F.col(f"_c_{k}").alias(k) for k in business_key])
             .agg(F.min(F.when(F.col("start_date") > F.col("_eff"),
                               F.col("start_date"))).alias("_next"),
                  F.max(covers.cast("int")).alias("_cov")))
    corr_plain = corr.select(
        *[F.col(f"_c_{k}").alias(k) for k in business_key],
        *[F.col(f"_c_{c}") for c in base_cols if c not in business_key],
        "_eff")
    orphan_rows = (
        corr_plain.join(stats, business_key, "left")
        .filter(F.coalesce(F.col("_cov"), F.lit(0)) == 0)
        .select(*business_key,
                *[F.col(f"_c_{c}").alias(c) for c in base_cols
                  if c not in business_key],
                F.col("_eff").alias("start_date"),
                F.col("_next").alias("end_date"),
                F.when(F.col("_next").isNull(), F.lit("Y"))
                 .otherwise(F.lit("N")).alias("current_flag"))
        .select(*staging.columns))

    return main.unionByName(orphan_rows)


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def scd2_backdate_splice(store, spark, staging_name: str,
                         corrections: DataFrame, business_key: list[str],
                         cmp_cols: list[str], eff_col: str = "effective_ts",
                         offsets: dict[str, int] | None = None) -> int:
    """Execute the late-arriving splice against the store (one atomic
    commit; bucket-PRUNED when the staging table is bucketed on a subset
    of the business key — only buckets holding corrected keys rewrite,
    the merge_upsert convention)."""
    corrections = stabilize(corrections)
    spec = store.bucket_spec(staging_name)
    if spec is not None and set(spec[0]) <= set(business_key):
        from .merge import touched_buckets
        bcols, n = spec
        ids = touched_buckets(corrections, bcols, n)
        staging = store.read_buckets(spark, staging_name, ids)
        return store.commit_buckets(
            staging_name,
            plan_scd2_backdate(staging, corrections, business_key,
                               cmp_cols, eff_col),
            ids, offsets=offsets)
    staging = store.read(spark, staging_name)
    return store.commit(
        staging_name,
        plan_scd2_backdate(staging, corrections, business_key, cmp_cols,
                           eff_col),
        offsets=offsets)
