"""Streaming incremental corpus dedup (SURVEY.md LLM-pipeline surface;
the streaming face of ``operators/dedup.py``'s persisted MinHash index).

The batch story: ``minhash_build_index`` materializes a band-partitioned
signature index; ``minhash_dedup_batch`` dedups each new document batch
against (stored corpus ∪ itself) and appends the survivors' signatures,
so the index grows with the corpus. The streaming analogue wires exactly
that step into ``foreachBatch``:

- ``spark.readStream`` on a documents directory — the file source's
  checkpoint guarantees each arriving file lands in exactly one
  micro-batch, even across restarts (consume-once at the file level,
  the same C3-analogue contract as ``pipeline_stream``);
- each micro-batch is one incremental-dedup cycle: pair the batch
  against the index, drop corpus dups + keep-min within the batch,
  append survivors to the output directory AND their signatures to the
  index — batch N+1 then dedups against batch N with no extra wiring;
- the first batch bootstraps an absent index: intra-batch near-dups via
  the exact two-phase verifier (LSH candidates → exact Jaccard — at
  bootstrap the text is in hand, so exact verification is free), then
  the surviving docs become the initial corpus.

At 100 TB: every per-batch step is the already-scale-shaped batch
operator — the index append writes only new files into existing band
partitions, the candidate join keys on (band, bsig) so stored
signatures outside matching buckets never shuffle, and nothing here
re-reads corpus text.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

#: (doc_id, text) — the minimal corpus schema the dedup operators key on.
DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _index_initialized(index_path: str) -> bool:
    """The index exists once minhash_build_index wrote ≥1 band partition
    (an empty/missing dir is the bootstrap case — parquet cannot even
    infer a schema from it)."""
    return os.path.isdir(index_path) and any(
        d.startswith("band=") for d in os.listdir(index_path))


def start_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    output_dir: str,
    checkpoint: str,
    schema: T.StructType = DOC_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 5,
    threshold: float = 0.5,
    trigger_interval: str = "1 minute",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the streaming dedup over JSON-lines document files arriving
    in ``input_dir``. Survivors append to ``output_dir`` (parquet); their
    signatures append to the band-partitioned index at ``index_path``.

    Restarting with the same ``checkpoint`` resumes exactly where the
    stream left off; already-consumed files are never reprocessed, so a
    doc is deduped (and its signatures appended) at most once."""
    from ..operators.dedup import (
        minhash_build_index,
        minhash_dedup_batch,
        minhash_near_dups,
        remove_near_dups,
    )

    src = spark.readStream.schema(schema).json(input_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if not _index_initialized(index_path):
            # Bootstrap: this batch IS the initial corpus — dedup it
            # against itself with exact verification, then build.
            pairs = minhash_near_dups(batch_df, id_col, text_col,
                                      num_hashes, bands, n, threshold)
            survivors = remove_near_dups(batch_df, pairs, id_col)
            minhash_build_index(survivors, index_path, id_col, text_col,
                                num_hashes, bands, n)
        else:
            survivors = minhash_dedup_batch(
                spark, batch_df, index_path, id_col, text_col,
                num_hashes, bands, n, threshold)
        survivors.write.mode("append").parquet(output_dir)

    writer = (src.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
