"""Streaming BM25 index growth — the streaming face of
``operators/bm25.py``'s persisted impact index, completing the
streaming-index family (ANN ``ann_stream``, IVF-PQ, minhash
``dedup_stream`` — VERDICT r16 #6).

A production retrieval corpus grows continuously (new documents →
chunk → tokenize → postings); the searchable index must grow WITHOUT
rebuilds. The batch story already has the right pieces:
``bm25_build_index`` materializes the token-bucket-partitioned layout
and ``bm25_index_append`` grows it with blind bucket-dir appends
(postings + pure-append stat partials + a global partial row — never a
read-modify-write of stored lists). This module wires that append into
``foreachBatch``:

- ``spark.readStream`` on a documents directory — the file source's
  checkpoint gives exactly-once file consumption (the C3-analogue
  contract every streaming module here shares), so a document's
  postings land at most once across clean restarts;
- every micro-batch is ONE tokenize + term-frequency pass over the
  batch rows followed by the partitioned append; batch 0 bootstraps an
  absent index via ``bm25_build_index`` (same layout, overwrite mode —
  idempotent if a crash interrupts the bootstrap);
- searches between batches go through the standard probe
  (``bm25_query_slice``): scores are computed AT PROBE TIME under the
  CURRENT aggregated corpus statistics, so every stored posting
  silently rescores as the corpus grows — an append-grown index is
  score-identical to a from-scratch rebuild of the same corpus (the
  equivalence the driver checks via ``streaming_bm25_index_topk``
  against the unchanged full-corpus oracle).

Unlike the ANN/IVF-PQ streams there is NO frozen geometry to bootstrap:
BM25's "dictionary" is the token hash-bucketing, a pure function of the
token string — so batch order can never mis-partition history and
restarts need no sidecar state.

At 100 TB: per-batch cost is the batch's tokenize + one partitioned
append; stored postings are never re-read on growth; the probe reads
Σ df(query terms) rows through bucket-pruned listings, independent of
corpus size.

Delivery contract, precisely: SOURCE consumption is exactly-once (the
checkpoint's file offsets commit per epoch), but the parquet-append
SINK is at-least-once — a crash in the window after an append finishes
but before its epoch commits replays that batch's postings on restart
(doubling those tf rows). Clean stops/restarts (the driver-checked
path) are duplicate-free; an exactly-once sink would need epoch-tagged
staging dirs moved in atomically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

#: (doc_id, text) — the minimal corpus schema the BM25 operators key on.
DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _index_initialized(index_path: str) -> bool:
    """The index exists once bm25_build_index wrote ≥1 token-bucket
    partition under postings/ (an empty/missing dir is the bootstrap
    case — parquet cannot even infer a schema from it)."""
    postings = os.path.join(index_path, "postings")
    return os.path.isdir(postings) and any(
        d.startswith("tbkt=") for d in os.listdir(postings))


def start_streaming_bm25_index(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint: str,
    schema: T.StructType = DOC_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
    trigger_interval: str = "1 minute",
    available_now: bool = False,
) -> StreamingQuery:
    """Start the streaming BM25 index builder over JSON-lines document
    files arriving in ``input_dir``. Restarting with the same
    ``checkpoint`` resumes exactly-once; the index at ``index_path``
    grows by bucket-partitioned appends and is searchable between
    batches via ``bm25_query_slice(spark, index_path, query_tokens)``
    — probe scores always reflect the statistics of everything appended
    so far (append ≡ rebuild)."""
    from ..operators.bm25 import (
        bm25_build_index, bm25_index_append, bm25_term_freqs,
        bm25_tokenize_documents,
    )

    src = spark.readStream.schema(schema).json(input_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tf = bm25_term_freqs(bm25_tokenize_documents(
            batch_df, chunk_chars=chunk_chars, overlap=overlap,
            id_col=id_col, text_col=text_col))
        if not _index_initialized(index_path):
            bm25_build_index(tf, index_path)
        else:
            bm25_index_append(tf, index_path)

    writer = (src.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
