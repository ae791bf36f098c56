"""Streaming ANN index maintenance — the streaming face of
``operators/similarity.py``'s centroid-partitioned IVF index, mirroring
``dedup_stream``'s structure for the vector corpus.

Production embedding pipelines produce vectors continuously (new
documents → encoder → vector sink); the searchable index must grow
WITHOUT rebuilds. The batch story already has the right pieces:
``ivf_build_index`` materializes the centroid-partitioned layout and
``ivf_index_append`` adds a batch as new files inside the existing
``centroid_id=`` partition directories (O(batch), never a rewrite).
This module wires that append into ``foreachBatch``:

- ``spark.readStream`` on a vectors directory — the file source's
  checkpoint gives exactly-once file consumption (the C3-analogue
  contract every streaming module here shares), so a vector is
  assigned and appended at most once across restarts;
- batch 0 bootstraps an absent index: the first ``n_centroids``
  vectors of the batch (lowest ids — deterministic) freeze the
  centroid set, which is then written next to the index
  (``<path>/_centroids``) so later batches and searches use the SAME
  geometry (appending under re-trained centroids would mis-partition
  history — ``ivf_index_append``'s documented contract);
- every subsequent batch is ONE broadcast scoring pass over the batch
  rows + a partitioned append. Searches (``ivf_search_index_inplan``)
  run against the live index between batches and see monotonically
  growing coverage.

At 100 TB: the stored corpus is never re-read or re-assigned; per-batch
cost is the batch's size; the search path stays partition-pruned. The
frozen-centroid drift tradeoff is the standard IVF one — re-train =
rebuild offline, swap paths atomically.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

#: (vec_id, embedding, label) — the vector-corpus schema.
VEC_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
    T.StructField("label", T.IntegerType()),
])


def centroids_path(index_path: str) -> str:
    """``<index_path>/_centroids`` — INSIDE the index directory, so two
    indexes sharing a parent never collide on centroid geometry. Spark's
    file listing ignores underscore-prefixed paths, so reads of the
    ``centroid_id=`` partitions are unaffected by the sibling dir."""
    return os.path.join(index_path.rstrip("/"), "_centroids")


def _index_initialized(index_path: str) -> bool:
    """Initialized = partitions AND the frozen-geometry sidecar exist.
    Requiring ``_centroids`` too makes the bootstrap crash-safe: a crash
    between the index build and the sidecar write leaves a partial
    bootstrap that RE-RUNS on restart (the build's overwrite mode makes
    that idempotent) instead of wedging the append path on a missing
    centroid read forever."""
    return (os.path.isdir(index_path)
            and any(d.startswith("centroid_id=")
                    for d in os.listdir(index_path))
            and os.path.isdir(centroids_path(index_path)))


def load_centroids(spark: SparkSession, index_path: str):
    """The index's frozen centroid set (written at bootstrap)."""
    return spark.read.parquet(centroids_path(index_path))


def start_streaming_ann_index(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint: str,
    schema: T.StructType = VEC_SCHEMA,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_interval: str = "1 minute",
    available_now: bool = False,
    **assign_opts,
) -> StreamingQuery:
    """Start the streaming IVF index builder over JSON-lines vector
    files arriving in ``input_dir``. Restarting with the same
    ``checkpoint`` resumes exactly-once; the index at ``index_path``
    grows by partitioned appends and is searchable between batches via
    ``ivf_search_index_inplan(spark, index_path, ...,
    load_centroids(spark, index_path))``. ``assign_opts`` forward to
    ``ivf_assign`` (two-level knobs) for BOTH bootstrap and appends —
    the same-geometry rule that binds batch ``ivf_index_append``.

    Delivery contract, precisely: SOURCE consumption is exactly-once
    (the checkpoint's file offsets commit per epoch; a restart never
    re-reads a committed batch), but the parquet-append SINK is
    at-least-once — ``foreachBatch`` + ``mode("append")`` is not
    idempotent, so a crash in the window after the append finishes but
    before the epoch commits replays that batch's rows into the index
    on restart. Clean stops/restarts (the driver-checked path) are
    duplicate-free; an exactly-once sink would need an epoch-tagged
    staging dir moved in atomically (or dedup-on-read by ``id_col``)."""
    from ..operators.similarity import ivf_build_index, ivf_index_append

    src = spark.readStream.schema(schema).json(input_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not _index_initialized(index_path):
            # Bootstrap: freeze geometry from this batch's lowest-id
            # vectors, persist it beside the index, then build.
            cents = (batch_df.orderBy(F.asc(id_col)).limit(n_centroids)
                     .select(F.col(id_col).alias("centroid_id"), vec_col))
            # Build FIRST (overwrite mode would wipe a pre-written
            # ``_centroids`` inside the index dir), then persist the
            # frozen geometry beside the partitions it produced.
            ivf_build_index(batch_df, cents, index_path, id_col, vec_col,
                            **assign_opts)
            cents.write.mode("overwrite").parquet(centroids_path(index_path))
        else:
            ivf_index_append(batch_df, load_centroids(spark, index_path),
                             index_path, id_col, vec_col, **assign_opts)

    writer = (src.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def codebooks_path(index_path: str) -> str:
    """``<index_path>/_codebooks`` — the PQ dictionary sidecar of a
    streaming IVF-PQ index, beside ``_centroids`` (same underscore
    convention: invisible to partition reads)."""
    return os.path.join(index_path.rstrip("/"), "_codebooks")


def load_codebooks(spark: SparkSession, index_path: str):
    """The index's frozen PQ codebooks (written at bootstrap)."""
    return spark.read.parquet(codebooks_path(index_path))


def start_streaming_ivfpq_index(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint: str,
    m: int,
    dim: int,
    schema: T.StructType = VEC_SCHEMA,
    n_centroids: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_interval: str = "1 minute",
    available_now: bool = False,
    **assign_opts,
) -> StreamingQuery:
    """Streaming growth of an ENCODED (IVF-PQ) index: like
    ``start_streaming_ann_index``, but the bootstrap freezes TWO
    dictionaries — the centroid geometry (``_centroids``) AND the
    m×ks lowid PQ codebooks derived from the first batch
    (``_codebooks``) — and every appended row is stored as m small int
    codes instead of floats. The frozen-dictionary rule doubles:
    appending under re-trained centroids would mis-partition history,
    under re-trained codebooks it would mis-DECODE history
    (``ivfpq_index_append``'s contract). Searches between batches:
    ``operators.pq.ivfpq_search(spark, index_path,
    load_codebooks(...), load_centroids(...), ...)``. At 100 TB the
    stream writes 32× fewer index bytes than the float index and the
    stored corpus is never re-read. Delivery contract: identical to
    ``start_streaming_ann_index`` — exactly-once source consumption,
    at-least-once parquet-append sink (a crash between a finished
    append and its epoch commit replays that batch on restart)."""
    from ..operators.pq import (
        ivfpq_build_index, ivfpq_index_append, pq_codebooks,
    )

    src = spark.readStream.schema(schema).json(input_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not _index_initialized(index_path):
            cents = (batch_df.orderBy(F.asc(id_col)).limit(n_centroids)
                     .select(F.col(id_col).alias("centroid_id"), vec_col))
            cb = pq_codebooks(batch_df, m, ks, dim, id_col=id_col,
                              vec_col=vec_col)
            # Build first (overwrite would wipe pre-written sidecars),
            # then persist BOTH frozen dictionaries beside the
            # partitions; _index_initialized requires _centroids, so a
            # crash mid-bootstrap re-runs the idempotent build.
            ivfpq_build_index(batch_df, cents, cb, index_path, m, dim,
                              id_col=id_col, vec_col=vec_col,
                              **assign_opts)
            cb.write.mode("overwrite").parquet(codebooks_path(index_path))
            cents.write.mode("overwrite").parquet(centroids_path(index_path))
        else:
            ivfpq_index_append(
                batch_df, load_centroids(spark, index_path),
                load_codebooks(spark, index_path), index_path, m, dim,
                id_col=id_col, vec_col=vec_col, **assign_opts)

    writer = (src.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
