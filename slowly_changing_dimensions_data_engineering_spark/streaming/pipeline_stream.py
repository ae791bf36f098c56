"""Structured Streaming variant of the SCD2 pipeline (SURVEY.md §3.3).

The reference automates the pipeline as a 5-task DAG on a 1-minute
schedule (``SCD-Automation.sql:34-38``). The streaming analogue:

- ``spark.readStream`` on the stage directory with the reference CSV
  file format (S1) — the file source's checkpoint tracks which staged
  files were consumed, so each file is processed exactly once even
  across restarts: the streaming checkpoint subsumes C3's consume-once
  offset at the FILE level (the CDC-stream offset inside the store
  still guards the stream level).
- ``foreachBatch``: each micro-batch is one pipeline cycle — the batch
  frame plays RAW (truncate-and-load semantics: the batch IS the new
  RAW content), then tasks 3-5 run unchanged against the store.
- ``trigger(processingTime="1 minute")`` mirrors ``SCHEDULE='1 minute'``
  (``SCD-Automation.sql:36``); ``trigger(availableNow=True)`` drains the
  stage and stops — the deterministic mode tests use.

T3 lifecycle parity (``SCD-Automation.sql:108-122``): ``start_…`` is
ALTER TASK RESUME, ``query.stop()`` is SUSPEND, and restarting with the
same checkpoint resumes where the stream left off.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql.streaming import StreamingQuery

from ..sources.csv import CSV_LOAD_FORMAT


def start_streaming_pipeline(
    pipeline,
    trigger_interval: str = "1 minute",
    available_now: bool = False,
    checkpoint: str | None = None,
    now_fn=None,
) -> StreamingQuery:
    """Start the streaming pipeline over ``pipeline``'s stage directory.

    ``now_fn`` (optional) supplies the statement-constant cycle
    timestamp (F1) — injectable for deterministic tests; defaults to
    wall-clock UTC.
    """
    from ..pipeline import RAW

    spark = pipeline.spark
    checkpoint = checkpoint or os.path.join(pipeline.store.root, "_checkpoint")
    schema = pipeline.store.schema(RAW)

    src = (
        spark.readStream.schema(schema)
        .options(**CSV_LOAD_FORMAT)
        .csv(pipeline.stage.path)
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        # One micro-batch == one reference cycle. Tasks 1+2 (truncate +
        # COPY INTO) collapse into "RAW := this batch": the file-source
        # checkpoint already guarantees each staged file lands in exactly
        # one batch.
        now = (now_fn() if now_fn is not None
               else dt.datetime.now(dt.timezone.utc).replace(tzinfo=None))
        pipeline.store.truncate(spark, RAW)
        pipeline.store.commit(RAW, batch_df.select(*schema.fieldNames()))
        pipeline.task3_merge_landing()
        pipeline.task4_scd2_merge(now)
        pipeline.task5_refresh_master()

    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
