"""Streaming consumption of LATE-ARRIVING SCD2 corrections — the
streaming face of ``operators/scd2.py::scd2_backdate_splice`` (VERDICT
r14 #4), completing the streaming family next to the MV, ANN, dedup and
attribution loops.

A correction feed is the canonical late-data stream: rows whose
effective time lies arbitrarily far in the PAST (an audit fix, a
source-system replay). Watermarked window operators cannot hold state
that long by design; the right shape is ``foreachBatch`` over the batch
splice operator:

- ``spark.readStream`` on a directory of JSON-lines correction files —
  the file-source checkpoint is the exactly-once contract at the FILE
  level (each correction batch splices once, across restarts);
- each micro-batch runs ONE ``scd2_backdate_splice`` commit: covering
  versions close at E, spliced segments inherit end/current_flag, gap
  and unknown-key corrections open/insert per the batch operator's
  pinned semantics (tests/test_backdate.py).

Crash contract: a crash AFTER the splice commit but BEFORE the
checkpoint advances replays the batch — and the splice is idempotent by
construction (the spliced version now covers E with the corrected
state, so the replay takes the re-assertion no-op arm). This is the
same replay-tolerance argument the SCD2 merge stream makes, without
needing store-offset plumbing.

At 100 TB each micro-batch does delta-scaled work: the correction
frame is broadcast-sized, staging is scanned twice (the batch
operator's documented shape) and only buckets holding corrected keys
rewrite (bucket-pruned path).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def start_streaming_backdate(
    spark: SparkSession,
    input_dir: str,
    store,
    staging_name: str,
    schema: T.StructType,
    business_key: list[str],
    cmp_cols: list[str],
    eff_col: str = "effective_ts",
    checkpoint: str | None = None,
    trigger_interval: str = "1 minute",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the correction-splice loop over JSON-lines files arriving
    in ``input_dir``. ``schema`` declares the correction payload (the
    staging base columns plus ``eff_col``; a string-typed ``eff_col``
    is fine — the splice casts to timestamp_ntz). Restart with the same
    ``checkpoint`` to resume exactly-once file consumption."""
    from ..operators.scd2 import scd2_backdate_splice

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.json(input_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scd2_backdate_splice(store, spark, staging_name, batch_df,
                             business_key, cmp_cols, eff_col)

    writer = (src.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
