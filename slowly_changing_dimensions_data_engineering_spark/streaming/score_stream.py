"""Streaming model INFERENCE — scoring arriving documents' embeddings
with the trained quality probe, the deployment half of the classifier
family (operators/classifier.py trains; this serves).

No reference parity: the reference's streaming story is the STREAM →
TASK chain (SCD-Automation.sql:7-41); model inference over a live feed
is engine surface its users gain, and the missing member of the
streaming family's topology set — every prior pipeline is stateful
(MV fold, dedup index, ANN/IVF-PQ growth, stream-stream join state);
this one is the STATELESS map topology, where exactly-once comes
entirely from the source's file tracking plus the parquet sink's
``_spark_metadata`` commit log (no state store at all).

Shape: one file stream of (vec_id, embedding double[]) JSON lines →
a whole-stage-codegen dot-product fold + sigmoid against the trained
weight vector baked in as a LITERAL (the classifier_trained_scores
convention: the model is dim+1 numbers, collected once and compiled
into the plan — no join, no broadcast, no Python) → append-mode
parquet sink. At 100 TB/day this is embarrassingly parallel: zero
shuffles, zero state, per-batch cost linear in arriving rows, and a
restart re-emits nothing already committed (checkpointed restart
asserted in tests/test_streaming.py and exercised by the registered
query's third-slice-after-restart drill).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def start_trained_scoring(spark: SparkSession, in_dir: str, out_dir: str,
                          checkpoint: str, schema: T.StructType,
                          weights: Sequence[float], bias: float,
                          threshold: float = 0.5,
                          available_now: bool = True,
                          max_files_per_trigger: int | None = None,
                          ) -> StreamingQuery:
    """Start the stateless scoring stream: JSON file source →
    codegen sigmoid(w·x + b) → (vec_id, score, kept) parquet sink.

    ``weights``/``bias`` are plain Python floats (the trained model),
    compiled into the plan as literals; ``score`` is rounded to 9 dp —
    the repo's cross-engine sigmoid convention, so the sink's rows
    hash-match the chained-CTE replay's final scoring CTE."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.json(in_dir)

    wlit = F.array(*[F.lit(float(w)) for w in weights])
    z = F.aggregate(F.zip_with(F.col("embedding"), wlit, lambda a, b: a * b),
                    F.lit(0.0), lambda acc, v: acc + v) + F.lit(float(bias))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    scored = src.select("vec_id", p.alias("score"),
                        (p >= F.lit(threshold)).alias("kept"))

    writer = (scored.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
