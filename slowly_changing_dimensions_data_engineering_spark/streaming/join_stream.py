"""Watermarked stream-stream join — click→purchase attribution, the
last headline Structured Streaming operator class in the engine's
streaming surface (watermarks, all three window families, stateful
dedup/applyInPandasWithState, stream-static joins and four foreachBatch
sinks were already covered; this adds the two-moving-sides join).

No reference parity: the reference's streaming story is the STREAM →
TASK chain (SCD-Automation.sql:7-41), a single change feed; joining two
live feeds within an event-time interval is engine surface its users
gain.

Shape: two file streams (the landing-directory convention of
streaming/mv_stream.py), each watermarked on event time, inner-joined
on the entity key with an event-time range predicate

    purchases.ts ∈ [clicks.ts, clicks.ts + join_window]

written append-mode to a parquet sink. This is the canonical
attribution topology:

- **State**: Spark keeps each side's rows in the state store keyed by
  the join key until the OTHER side's watermark passes beyond the
  interval — so state is bounded by (join_window + watermark_delay) of
  data per key, never the full history. At 100 TB/day that bound is
  the difference between a runnable job and an OOM.
- **Completeness vs lateness**: a row arriving more than
  ``watermark_delay`` behind the stream's max event time is DROPPED
  (asserted in tests/test_streaming.py) — the price of bounded state.
  Feed batches in roughly event-time order (the driver pipeline slices
  input by day) and the join is exactly the static inner join of the
  same inputs, which is what the registered query's oracle checks.
- **Sink**: the native parquet streaming sink — exactly-once at the
  file level via the checkpoint + ``_spark_metadata`` commit log (on
  restart, uncommitted files are re-listed, committed ones are not
  re-emitted), in contrast to the documented at-least-once window of
  the foreachBatch index sinks (ann_stream.py).

``how="left_outer"`` is the conversion-rate topology — every click
emits, converters with their purchase, non-converters with nulls. The
semantics that differ from inner are WHEN the null row appears: an
unmatched click is held in state until the watermark passes the END of
its join interval (``click_ts + join_window``) — only then can Spark
prove no matching purchase can still arrive, and it emits the
null-padded row as it evicts the state (asserted in
tests/test_streaming.py). A click near the head of the stream
therefore never emits its null row until later data advances the
watermark past its interval — batch pipelines that want ALL
non-converters flushed must feed a past-the-end sentinel to BOTH
sides within ONE run (per-source max-event-time trackers reset on
restart, and the global watermark is the MIN across sources — a
one-side advance, or a two-side advance split across restarts, flushes
nothing; pinned in tests/test_streaming.py). See
queries._stream_join_outer_out.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def start_click_attribution(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: T.StructType,
    join_window: str = "1 hour",
    watermark_delay: str = "2 hours",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    how: str = "inner",
) -> StreamingQuery:
    """Start the attribution join over JSON-lines event files landing in
    ``clicks_dir`` / ``purchases_dir`` (both with ``schema``; must carry
    ``event_id``, ``user_id``, ``ts``, ``value``). Emits one row per
    (click, purchase) pair with the purchase inside
    ``[click.ts, click.ts + join_window]`` for the same user, appended
    to ``out_dir`` as parquet. Restart with the same ``checkpoint`` to
    resume exactly-once.

    ``how="left_outer"`` additionally emits every unmatched click with
    null purchase columns — but only once the watermark passes
    ``click_ts + join_window`` (watermark-driven null emission; see
    module docstring)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r}")

    def src(d: str):
        r = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.json(d)

    clicks = (src(clicks_dir).withWatermark("ts", watermark_delay)
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id"), F.col("ts").alias("click_ts")))
    purchases = (src(purchases_dir).withWatermark("ts", watermark_delay)
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("p_user_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value")))
    joined = (clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {join_window}")),
        how)
        .select("user_id", "click_id", "purchase_id",
                "click_ts", "purchase_ts", "purchase_value"))

    writer = (joined.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
