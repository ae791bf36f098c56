"""Streaming materialized-view maintenance — the streaming face of
``operators/incremental.py``, and the full streaming analogue of the
reference's STREAM → TASK chain (``SCD-Automation.sql:7-41``): changes
flow, a consumer folds them, an aggregate stays current.

Each micro-batch is one upsert-then-refresh cycle inside
``foreachBatch``:

- ``spark.readStream`` on a landing directory of JSON-lines load files —
  the file-source checkpoint is the consume-once contract at the FILE
  level (a load is merged exactly once, across restarts);
- the batch is MERGEd into the base table (M1, emitting the
  DELETE+INSERT change pairs), then ``refresh_aggregate`` folds the
  table's pending change batches into the MV — offset-tracked, so the
  fold also survives restarts and a crash between merge and refresh
  replays only the fold (store offsets advance after the MV commit).

At 100 TB the per-batch work is the already-scale-shaped batch
operators: the merge rewrites only touched buckets, the fold shuffles
delta + MV (never the base), and nothing in the loop scans history.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def start_streaming_mv(
    spark: SparkSession,
    input_dir: str,
    store,
    base_name: str,
    mv_name: str,
    schema: T.StructType,
    key: list[str],
    compare_cols: list[str],
    group_cols: list[str],
    sum_cols: dict[str, str],
    checkpoint: str,
    consumer: str = "streaming_mv",
    trigger_interval: str = "1 minute",
    available_now: bool = False,
    delete_match=None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the merge→fold loop over JSON-lines load files arriving in
    ``input_dir``. The MV table named ``mv_name`` tracks
    ``group_cols + [n_rows] + sum_cols`` of the base at every batch
    boundary. Restart with the same ``checkpoint`` to resume.
    ``delete_match`` forwards the MERGE tombstone clause — load rows
    satisfying it REMOVE their base row (and the fold subtracts them),
    so a CDC feed carrying deletes maintains base + MV in one loop.
    ``max_files_per_trigger`` caps files per micro-batch (with
    ``available_now`` this partitions a backlog into deterministic-size
    batches instead of one giant catch-up batch)."""
    from ..operators.incremental import refresh_aggregate
    from ..operators.merge import merge_upsert

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.json(input_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert(store, spark, base_name, batch_df, key, compare_cols,
                     delete_match=delete_match)
        refresh_aggregate(store, spark, mv_name, base_name, consumer,
                          group_cols, sum_cols)

    writer = (src.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
