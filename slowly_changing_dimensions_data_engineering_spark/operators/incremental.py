"""Incremental materialized-aggregate maintenance over the CDC stream.

The reference keeps MASTER in sync with STAGING through the
STREAM → TASK chain (SCD-Automation.sql:7-41 reads the stream,
Setup.sql:155-161 rebuilds the projection). This module generalizes
that pattern to ALGEBRAIC aggregates: a grouped SUM/COUNT table is
maintained purely from the DELETE+INSERT change pairs the merge
emitted (Setup.sql:127,218 — the stream's row encoding), never
rescanning the base table.

Why it matters at 100 TB: a nightly `GROUP BY` over the full base is a
full scan + shuffle of everything; the incremental refresh touches only
(a) the pending change batches — delta-sized — and (b) the MV itself —
group-cardinality-sized. Both are orders of magnitude smaller than the
base. The algebra: every INSERT change row contributes +1/+value to its
group, every DELETE (an update's pre-image) contributes -1/-value; an
update thus moves its row between groups exactly. SUM and COUNT are
self-mergeable, so folding the signed delta into the MV is a re-
aggregation of two partial frames — AVG derives as sum/count
downstream.

Only SUM/COUNT (and derived AVG) qualify: MIN/MAX are not subtractable
— a DELETE of the current minimum would need the base to find the
runner-up — so they are deliberately not offered here; recompute those
per-group from the base or keep a sketch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import CDC_ACTION

N_ROWS = "n_rows"


def aggregate_delta(changes: DataFrame, group_cols: list[str],
                    sum_cols: dict[str, str]) -> DataFrame:
    """Signed per-group partials for one or more CDC batches.

    ``sum_cols`` maps output column -> source column; output schema is
    ``group_cols + [n_rows] + list(sum_cols)``. INSERT rows count +1,
    DELETE rows (update pre-images) -1, so the frame is a mergeable
    partial: summing it into the MV yields the post-change aggregate.
    One map-side-combined groupBy over a delta-sized input — the base
    table never appears in this plan.
    """
    sign = F.when(F.col(f"`{CDC_ACTION}`") == "INSERT", F.lit(1)) \
            .otherwise(F.lit(-1))
    aggs = [F.sum("_sign").alias(N_ROWS)]
    aggs += [F.sum(F.col("_sign") * F.col(src)).alias(out)
             for out, src in sum_cols.items()]
    return (changes.withColumn("_sign", sign)
            .groupBy(*group_cols).agg(*aggs))


def apply_delta(mv: DataFrame | None, delta: DataFrame,
                group_cols: list[str]) -> DataFrame:
    """Fold a signed delta into the current MV contents.

    Union-then-reaggregate (partials are mergeable) rather than a full
    outer join: same single shuffle on the group key, no column-collision
    bookkeeping, and AQE sizes it off MV + delta — the base is not an
    input. Groups whose row count reaches 0 vanished from the base and
    are dropped (their sums are exact zeros by the signed algebra).
    """
    merged = delta if mv is None else mv.unionByName(delta)
    val_cols = [c for c in merged.columns if c not in group_cols]
    out = (merged.groupBy(*group_cols)
           .agg(*[F.sum(c).alias(c) for c in val_cols]))
    return out.filter(F.col(N_ROWS) != 0)


def refresh_aggregate(store, spark: SparkSession, mv_name: str,
                      base_name: str, consumer: str,
                      group_cols: list[str],
                      sum_cols: dict[str, str],
                      occ_retries: int = 3) -> int:
    """Consume the base table's pending change batches (offset-tracked,
    C3 consume-once — SCD-Automation.sql:43 advances the stream the same
    way) and commit the refreshed MV. Returns the MV version; a call
    with nothing pending is a no-op (no empty commit, offset untouched).

    Crash safety: the consumed-to watermark rides INSIDE the MV commit
    (``offsets=`` → the same atomic ``meta.json`` swap as the snapshot
    pointer), so commit and offset advance can never be split by a
    crash — the Snowflake contract ("stream data once used is gone",
    SCD-Automation.sql:142). This matters here specifically because
    ``apply_delta`` folds a SIGNED delta into the already-refreshed MV:
    replaying a consumed batch would double-count it. A crash *before*
    the commit leaves both MV and watermark at the previous state (the
    batch is simply re-run); a crash *after* leaves only the global
    offset mirror stale, and ``get_offset(..., table=mv_name)`` reads
    the meta-carried watermark first, skipping the batch.

    Concurrency: the MV commit validates the version the fold READ
    (a concurrent refresh landing during the fold would otherwise be
    double-counted or lost); a lost race re-reads offset + changes and
    re-derives — the retried statement consumes exactly the still-
    pending batches, because ``since`` is re-resolved from the
    winner's committed watermark (``occ_retries``, the merge_upsert
    convention)."""
    from .merge import _occ_retry

    def attempt() -> int:
        since = store.get_offset(consumer, table=mv_name)
        changes = store.read_changes(spark, base_name, since)
        if changes is None:
            return store.version(mv_name) if store.exists(mv_name) else -1
        consumed_to = max(store.change_versions(base_name, since))
        delta = aggregate_delta(changes, group_cols, sum_cols)
        if not store.exists(mv_name) or store.version(mv_name) < 0:
            if not store.exists(mv_name):
                # overwrite=False (ADVICE r16): two concurrent FIRST
                # refreshes can both pass the exists() check; the
                # default CREATE OR REPLACE would let the loser rmtree
                # the winner's committed v0 (and its meta-carried
                # offsets) outside any lock. Non-overwriting create
                # keeps the winner's table; the loser's commit then
                # fails read_version=-1 validation and re-derives
                # through _occ_retry.
                store.create(mv_name, delta.schema, overwrite=False)
            mv_read_version = -1
            new = apply_delta(None, delta, group_cols)
        else:
            # Baseline pinned at the MV snapshot read: the signed delta
            # is folded into THIS version — a concurrent MV commit
            # landing during the fold must conflict, or its refresh is
            # lost/double-counted.
            mv_read_version = store.version(mv_name)
            new = apply_delta(store.read(spark, mv_name,
                                         version=mv_read_version), delta,
                              group_cols)
        v = store.commit(mv_name, new, offsets={consumer: consumed_to},
                         read_version=mv_read_version)
        store.set_offset(consumer, consumed_to)  # global mirror (retention)
        return v

    return _occ_retry(attempt, occ_retries, store, mv_name)
