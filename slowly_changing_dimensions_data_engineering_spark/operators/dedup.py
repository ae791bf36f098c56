"""Deduplication operators — north-star LLM-pipeline surface.

Exact dedup is a hash groupBy (see ``queries.dedup_prefix_fingerprint``).
This module adds near-duplicate detection, all expressed with JVM-side
higher-order functions (transform/aggregate/explode) — no Python UDFs —
so the plans stay inside whole-stage codegen and scale linearly:

- **n-gram Jaccard**: shingle → candidate pairs via shared shingle →
  exact Jaccard on candidates only. At 100 TB the candidate join is the
  bottleneck: it shuffles on the shingle hash, which is uniformly
  distributed (md5), so no skew; pairs are deduped by (d1 < d2).
- **MinHash + LSH**: k hash functions simulated as md5(seed ‖ shingle)
  (portable across engines, uniformly distributed); signatures split
  into bands; docs sharing any band bucket become candidates — the
  standard shuffle-on-band-key formulation whose cost is O(candidates),
  not O(n²).
- **SimHash**: 32-bit signature from token hashes; near-dups = pairs in
  the same high-bit bucket with small Hamming distance (bit_count(xor)).

Determinism: every hash is md5 (stable everywhere); min over hex strings
is lexicographic; all ratios are exact int/int divisions done in double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..session import stabilize


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), " ")


def shingles(col: Column | str, n: int = 5) -> Column:
    """Distinct word n-gram md5 shingles of a text column (JVM-side:
    sequence + transform + slice, no UDF)."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
    )
    return F.array_distinct(grams)


def ngram_candidate_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 5,
                          max_df: int | None = 500) -> DataFrame:
    """Distinct candidate pairs (d1 < d2) sharing >= 1 shingle with
    document frequency <= ``max_df``.

    The df cap is the 100 TB guard: a shingle occurring in d documents
    emits d²/2 pairs from ONE join key — a web-scale boilerplate 5-gram
    is a single-reducer d² bomb. Shingles above the cap carry ~0 Jaccard
    signal (they are corpus-wide stop-shingles), so dropping them from
    CANDIDATE GENERATION is the standard fix; pass ``max_df=None`` to
    disable. The df aggregation shuffles on the uniform shingle hash and
    the filtered df frame joins back shingle-keyed — both skew-free.
    """
    ex = docs.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("sh"))
    if max_df is not None:
        # shingles() is array_distinct per doc, so count(*) == df
        keep = (ex.groupBy("sh").agg(F.count("*").alias("df"))
                .filter(F.col("df") <= max_df).select("sh"))
        ex = ex.join(keep, "sh")
    # shuffle_hash pins the self-join to a shuffle on the uniform
    # shingle key: both sides are the SAME corpus-sized frame, so a
    # size-estimate broadcast (seen at sf1, where the narrow exploded
    # frame slips under the threshold) would hash-build the whole
    # corpus on every task — and be re-chosen at any scale where the
    # estimate is wrong. Measured at sf1: shuffle 1.8× faster.
    a, b = ex.alias("a"), ex.hint("shuffle_hash").alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) &
               (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        threshold: float = 0.2,
                        max_df: int | None = 500) -> DataFrame:
    """All pairs (d1 < d2) with shingle-set Jaccard >= threshold.

    Two-phase: df-capped candidate generation (:func:`ngram_candidate_pairs`
    — only docs sharing a sub-cap shingle are compared), then EXACT
    verification |∩| / (|A|+|B|-|∩|) on the FULL shingle sets — the df
    cap bounds the join but never changes a reported jaccard value; only
    a pair whose entire overlap is stop-shingles can be missed (such a
    pair has ~0 Jaccard anyway).
    """
    cands = ngram_candidate_pairs(docs, id_col, text_col, n, max_df)
    sh = docs.select(F.col(id_col), shingles(text_col, n).alias("shl"))
    s1 = sh.select(F.col(id_col).alias("d1"), F.col("shl").alias("shl1"))
    s2 = sh.select(F.col(id_col).alias("d2"), F.col("shl").alias("shl2"))
    inter = F.size(F.array_intersect("shl1", "shl2"))
    union = F.size("shl1") + F.size("shl2") - inter
    return (
        cands.join(s1, "d1").join(s2, "d2")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def _seeded_md5(j: int):
    """Unary lambda factory for hash family h_j(s) = md5('j|' ‖ s).

    MUST stay a closure over a ONE-argument lambda: a two-parameter
    lambda (e.g. ``lambda s, j=j: …``) is treated by F.transform as the
    binary (element, index) form — the second parameter binds to the
    array-index Column, and an f-string over it bakes the Column's repr
    into the hash prefix. The result is still a deterministic hash
    family (so LSH "works"), but not md5(j|s): signatures silently
    diverge from any external reimplementation. Caught by the sf0.1
    cross-engine soak; pinned in tests/test_llm_ops.py."""
    prefix = f"{j}|"
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(col: Column | str, num_hashes: int = 16, n: int = 5) -> Column:
    """MinHash signature: array of k minima of md5(seed ‖ shingle).
    Hash family h_j(s) = md5(j ‖ s) — independent uniform hashes,
    reproducible in any engine with md5.

    NOTE: embeds the shingle pipeline once per hash function — fine for
    a single-column expression, but k uses = k re-evaluations. DataFrame
    pipelines should use :func:`minhash_signatures`, which materializes
    the shingle array in its own projection first (7× faster measured)."""
    sh = shingles(col, n)
    return F.array(*[
        F.array_min(F.transform(sh, _seeded_md5(j))) for j in range(num_hashes)
    ])


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 16,
                       n: int = 5) -> DataFrame:
    """(id, mh) signature frame, computed in two projections so the
    shingle array is evaluated ONCE per row, then the k hash transforms
    read the materialized column (Catalyst's CollapseProject keeps the
    barrier because inlining would duplicate a non-cheap expression)."""
    sh = docs.select(F.col(id_col), shingles(text_col, n).alias("__shl"))
    return sh.select(
        id_col,
        F.array(*[
            F.array_min(F.transform(F.col("__shl"), _seeded_md5(j)))
            for j in range(num_hashes)
        ]).alias("mh"),
    )


def minhash_band_frame(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 16,
                       bands: int = 4, n: int = 5) -> DataFrame:
    """(id, mh, band, bsig): the full minhash signature plus one row per
    LSH band — band signature = md5(concat of the band's minhashes).
    This is the unit of the persisted dedup index (each doc is shingled
    exactly once, here)."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, n)
    return sig.select(
        id_col, "mh",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.md5(F.concat_ws("|", *[F.col("mh")[i * rows + r]
                                              for r in range(rows)])).alias("bsig"))
            for i in range(bands)
        ])).alias("b"),
    ).select(id_col, "b.band", "b.bsig", "mh")


def minhash_lsh_candidates(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 16,
                           bands: int = 4, n: int = 5,
                           band_frame: DataFrame | None = None) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band bucket.

    The band join shuffles on (band_idx, signature) — uniform keys, no
    skew. The two sides of the self-join shuffle identically, so Spark's
    ReusedExchange evaluates the signature pipeline once.

    ``band_frame`` lets a caller that ALREADY built (and typically
    persisted) the corpus band frame — e.g. an index build sharing one
    shingle pass with pair generation — hand it in instead of
    re-shingling; it must come from :func:`minhash_band_frame` with the
    same parameters."""
    bands_df = (band_frame if band_frame is not None
                else minhash_band_frame(docs, id_col, text_col, num_hashes,
                                        bands, n)).drop("mh")
    # Pin the band self-join to a shuffle on (band, bsig): the two
    # sides are the same corpus-sized frame, so an estimate-driven
    # broadcast (observed at sf1) evaluates the signature pipeline for
    # a per-task hash build of the whole corpus. shuffle_hash measured
    # 5.7s → 3.1s at sf1; ~equal at sf0.1.
    x, y = bands_df.alias("x"), bands_df.hint("shuffle_hash").alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band")) &
               (F.col("x.bsig") == F.col("y.bsig")) &
               (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
        .select(F.col(f"x.{id_col}").alias("d1"), F.col(f"y.{id_col}").alias("d2"))
        .distinct()
    )


def minhash_near_dups(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 16,
                      bands: int = 4, n: int = 5,
                      threshold: float = 0.5,
                      band_frame: DataFrame | None = None) -> DataFrame:
    """End-to-end MinHash near-dup pipeline: LSH candidate generation
    followed by EXACT Jaccard verification on the candidates only —
    the standard two-phase shape whose cost is O(candidates), never
    O(n²). Returns (d1, d2, jaccard) with jaccard >= threshold.
    ``band_frame`` forwards to :func:`minhash_lsh_candidates` (share
    one shingle pass with an index build)."""
    cands = minhash_lsh_candidates(docs, id_col, text_col, num_hashes,
                                   bands, n, band_frame=band_frame)
    sh = docs.select(F.col(id_col), shingles(text_col, n).alias("shl"))
    s1 = sh.select(F.col(id_col).alias("d1"), F.col("shl").alias("shl1"))
    s2 = sh.select(F.col(id_col).alias("d2"), F.col("shl").alias("shl2"))
    inter = F.size(F.array_intersect("shl1", "shl2"))
    union = F.size("shl1") + F.size("shl2") - inter
    return (
        cands.join(s1, "d1").join(s2, "d2")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def _simhash_fold(hashes: Column, bits: int) -> Column:
    """Per-bit ±1 fold of a materialized token-hash array into the
    ``bits``-wide SimHash signature — ONE pass over the array.

    A single ``aggregate`` accumulates an array of ``bits`` counts
    (zip_with the running counts against the element's ±1 bit vector),
    then the signature is assembled by summing the masks of positive
    counts. The previous formulation ran ``bits`` separate aggregate
    passes per row and was the most CPU-dense query in the bench."""
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(masks, lambda m: F.when(h.bitwiseAND(m) != 0,
                                                F.lit(1)).otherwise(F.lit(-1))),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(counts, masks,
                   lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _token_hashes(col: Column | str, bits: int) -> Column:
    """Token → first ceil(bits/4) md5 hex chars parsed base-16. bits <= 60
    keeps the value positive in a signed 64-bit long (and parseable with
    the same expression by the DuckDB oracle)."""
    hex_chars = (bits + 3) // 4
    return F.transform(
        tokens(col),
        lambda t: F.conv(F.substring(F.md5(t), 1, hex_chars), 16, 10).cast("long"),
    )


def simhash(col: Column | str, bits: int = 48) -> Column:
    """SimHash signature: for each bit position, sum ±1 over token hashes
    (weighted by occurrence); bit = 1 iff the sum is positive.

    NOTE: single-column form — embeds the token-hash pipeline once per
    bit. DataFrame pipelines should materialize :func:`_token_hashes`
    in a projection and fold from the column (see simhash_near_dups)."""
    return _simhash_fold(_token_hashes(col, bits), bits)


def simhash_near_dups(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      bucket_bits: int = 12, bits: int = 48) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top ``bucket_bits`` bits
    (LSH-style — at scale this bounds the self-join), verify with
    bit_count(xor) <= max_hamming. 48-bit signatures by default: 32 bits
    is collision-heavy for web-scale corpora; 48 stays positive-parseable
    on every engine's signed 64-bit integer.

    Formulation note (measured, sf0.1/local[32]): the one-pass array
    fold below computes the signature in ~0.8s warm; the explode →
    groupBy alternative (one row per token, 48 scalar ``(h>>i)&1`` sum
    aggregates, bit=1 iff 2·s_i>n) produces bit-identical signatures but
    takes ~2.5s — the token-row explosion and 48-expression aggregate
    cost more than the fold's per-token array allocations save. Keep the
    fold."""
    hs = docs.select(F.col(id_col), _token_hashes(text_col, bits).alias("__hs"))
    sig = hs.select(id_col, _simhash_fold(F.col("__hs"), bits).alias("sh"))
    sig = sig.withColumn("bucket", F.shiftright("sh", bits - bucket_bits))
    # Same-size self-join on the uniform bucket key: pin the shuffle
    # (see minhash_lsh_candidates — estimate broadcasts regress at sf1).
    a, b = sig.alias("a"), sig.hint("shuffle_hash").alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) &
               (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("hamming", F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"),
                F.col("hamming").cast("long").alias("hamming"))
    )


def minhash_build_index(docs: DataFrame, path: str, id_col: str = "doc_id",
                        text_col: str = "text", num_hashes: int = 16,
                        bands: int = 4, n: int = 5) -> None:
    """Materialize the MinHash dedup index: the corpus' band frame
    (id, band, bsig, mh) written partitioned by ``band``.

    This is the 100 TB incremental-dedup layout: the corpus is shingled
    and minhashed EXACTLY ONCE, at build time; every later batch of new
    documents joins its own (small) band frame against these stored
    signatures — never re-reading, let alone re-shingling, the corpus
    text. Mirrors ``ivf_build_index`` for the embedding side. Readers
    must use the same (num_hashes, bands, n) parameters.

    The write is CLUSTERED by band before partitionBy (the same
    repartition(centroid_id) fix the IVF index write got in r14's
    soak): without it every shuffle task emits a file into every band
    dir (tasks × bands small files — at sf0.1 that was 128 files for
    16k rows, and the per-file open cost dominated the probe's read at
    scale), with it each band is written by one task."""
    (minhash_band_frame(docs, id_col, text_col, num_hashes, bands, n)
     .repartition("band")
     .write.mode("overwrite").partitionBy("band").parquet(path))


def minhash_near_dups_incremental(spark, new_docs: DataFrame, path: str,
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  num_hashes: int = 16, bands: int = 4,
                                  n: int = 5,
                                  threshold: float = 0.5,
                                  new_band_frame: DataFrame | None = None
                                  ) -> DataFrame:
    """Near-dup pairs (d1 < d2, jaccard_est) with at least one side in
    ``new_docs``: new-vs-corpus via the stored index at ``path``, plus
    new-vs-new.

    The new batch is shingled once (``minhash_band_frame``); the corpus
    side is ONLY the stored signatures — the candidate join keys on
    (band, bsig), so corpus rows in non-matching buckets never leave the
    shuffle. Verification uses the MinHash Jaccard ESTIMATE (fraction of
    equal signature components, the unbiased minhash estimator): exact
    shingle verification would require re-reading corpus text, which is
    exactly what the incremental path exists to avoid. Ids must be
    unique across corpus ∪ new batch. ``new_band_frame`` lets a caller
    that already materialized the batch's band frame (``minhash_dedup_batch``)
    pass it in instead of re-shingling."""
    new_bf = new_band_frame if new_band_frame is not None else \
        minhash_band_frame(new_docs, id_col, text_col, num_hashes, bands, n)
    idx = spark.read.parquet(path).select(id_col, "band", "bsig", "mh")
    both = idx.unionByName(new_bf.select(id_col, "band", "bsig", "mh"))
    # The NEW side is delta-sized by definition (that is the whole point
    # of the incremental path); pin it as the broadcast build side so
    # the corpus-sized stored index is only ever the streamed probe —
    # never shuffled. AQE usually picks this anyway, but the stored
    # side's size estimate is file-based and a 100 TB index must not
    # ride a statistics guess into a sort-merge join.
    a, b = F.broadcast(new_bf).alias("a"), both.alias("b")
    matches = F.size(F.filter(
        F.zip_with(F.col("a.mh"), F.col("b.mh"), lambda x, y: x == y),
        lambda eq: eq))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) &
               (F.col("a.bsig") == F.col("b.bsig")) &
               (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("d1"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("d2"),
            (matches.cast("double") / F.lit(float(num_hashes))).alias("jaccard_est"),
        )
        .distinct()
        .filter(F.col("jaccard_est") >= threshold)
    )


def minhash_index_append(band_frame: DataFrame, path: str,
                         id_col: str = "doc_id") -> None:
    """Grow the stored index with a batch's band rows: ONE partitioned
    append into the existing ``band=`` directories (new files only —
    never a rewrite of stored signatures; the same cost profile as
    ``TableStore.commit_append``). At 100 TB the index must grow with
    the corpus or every batch after the first silently skips
    new-vs-recent duplicates. Caller guarantees the frame was built with
    the index's (num_hashes, bands, n) parameters."""
    (band_frame.select(id_col, "band", "bsig", "mh")
     .write.mode("append").partitionBy("band").parquet(path))


def minhash_dedup_batch(spark, new_docs: DataFrame, path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_hashes: int = 16, bands: int = 4, n: int = 5,
                        threshold: float = 0.5) -> DataFrame:
    """The full incremental-dedup step: find the batch's near-dup pairs
    against (stored corpus ∪ itself), DROP every new doc that duplicates
    the corpus or a smaller-id batchmate, append the SURVIVORS'
    signatures to the index, and return the surviving docs.

    Decision rule (corpus is canonical, keep-min within the batch): for
    a pair d1 < d2, d2 always loses; d1 additionally loses when d2 is a
    corpus doc — a new doc never displaces stored content. The batch is
    shingled exactly once (the band frame is lazily checkpointed and
    shared by the pair join and the append). NOTE: the index append runs
    eagerly (a write action) before this returns; batch N+1 then dedups
    against batch N's survivors with no extra wiring — tested in
    tests/test_llm_ops.py."""
    new_bf = stabilize(minhash_band_frame(new_docs, id_col, text_col,
                                        num_hashes, bands, n))
    pairs = minhash_near_dups_incremental(
        spark, new_docs, path, id_col, text_col, num_hashes, bands, n,
        threshold, new_band_frame=new_bf)
    new_ids = new_bf.select(id_col).distinct()
    losers_d2 = pairs.select(F.col("d2").alias(id_col))
    losers_d1 = (pairs.join(new_ids.withColumnRenamed(id_col, "d2"), "d2",
                            "left_anti")
                 .select(F.col("d1").alias(id_col)))
    losers = losers_d2.union(losers_d1).distinct()
    survivors = new_docs.join(losers, id_col, "left_anti")
    minhash_index_append(new_bf.join(survivors.select(id_col), id_col), path,
                         id_col)
    return survivors


def remove_near_dups(docs: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Turn near-dup PAIRS into the dedup decision: drop every doc that
    has a smaller-id near-duplicate partner (pairs carry d1 < d2, so
    dropping the distinct d2 set keeps exactly the local-minimum ids —
    each duplicate cluster's minimum has no smaller partner and always
    survives). One distinct + one broadcast-able anti join; no iterative
    connected components needed for a keep-one guarantee."""
    losers = pairs.select(F.col("d2").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def benchmark_overlap(docs: DataFrame, bench: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 5, threshold: float = 0.1) -> DataFrame:
    """Benchmark DECONTAMINATION: per-document n-gram overlap of the
    corpus against a benchmark/eval set — the leakage check every
    pretraining pipeline runs before shipping a corpus (a doc sharing a
    large shingle fraction with an eval set inflates downstream scores).

    Scale shape: the benchmark side is eval-set-sized (MBs against a
    100 TB corpus), so its distinct shingle set BROADCASTS and the
    overlap count is a map-side broadcast join over the exploded corpus
    shingles — the corpus shuffles only the per-doc count aggregation,
    keyed by doc. Output: (id, n_shingles, n_overlap, overlap_frac,
    contaminated >= threshold)."""
    # ONE corpus shingle pass: explode, LEFT-join the broadcast benchmark
    # set with a hit flag, and derive both the total (count) and the
    # overlap (sum of hits) in the same per-doc aggregation — shingling
    # (md5 per gram) is the expensive step, so the naive shape (separate
    # size() branch + re-join) would md5 the corpus twice.
    b = (bench.select(F.explode(shingles(text_col, n)).alias("s"))
         .distinct().withColumn("_hit", F.lit(1)))
    ex = docs.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("s"))
    per = (ex.join(F.broadcast(b), "s", "left")
           .groupBy(id_col)
           .agg(F.count("*").alias("n_shingles"),
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap")))
    frac = F.col("n_overlap") / F.col("n_shingles")
    return per.select(id_col, "n_shingles", "n_overlap",
                      F.round(frac, 6).alias("overlap_frac"),
                      (frac >= threshold).alias("contaminated"))


def fuzzy_decontaminate(docs: DataFrame, bench: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_hashes: int = 16, bands: int = 4, n: int = 5,
                        threshold: float = 0.5) -> DataFrame:
    """FUZZY benchmark decontamination: flag corpus documents that are
    MinHash-LSH near-duplicates of any benchmark/eval document — the
    paraphrase-level leakage check that :func:`benchmark_overlap`'s
    exact shingle-fraction test misses (a lightly reworded eval item
    shares few exact 5-grams but keeps a high Jaccard signature).

    Scale shape: the benchmark side is eval-set-sized (MBs against a
    100 TB corpus), so its band frame — signatures included —
    BROADCASTS; the corpus is shingled/signed exactly ONCE
    (minhash_band_frame carries ``mh`` through the band explode), the
    candidate join is map-side on (band, bsig), and the only shuffles
    are the two bounded per-(doc,eval) / per-doc aggregations. The
    signature-component match fraction (the incremental-dedup
    estimator) stands in for exact Jaccard so no shingle set is ever
    re-materialized for verification. Output: one row per corpus doc
    sharing >= 1 LSH band bucket with the eval set —
    (id, n_eval_cands, max_jaccard_est, contaminated >= threshold).

    CONTRACT — ``bench`` must be small enough to broadcast: the
    explicit ``F.broadcast`` here is the whole scale design (no corpus
    re-shingle, map-side candidate join), and it is only valid because
    eval sets are MB-sized. Handing a corpus-sized frame as ``bench``
    would OOM the driver/executors, not degrade gracefully — if both
    sides are large you want :func:`minhash_near_dup_pairs`'s
    symmetric bucket-blocked self-join instead. (The registered
    ``decontamination_fuzzy`` query's 10%-of-documents eval split is a
    fixture stand-in, exempted in test_plans.py on exactly this
    contract — r11 ADVICE.)"""
    cb = minhash_band_frame(docs, id_col, text_col, num_hashes, bands, n)
    bb = minhash_band_frame(bench, id_col, text_col, num_hashes, bands, n)
    est = (F.aggregate(
        F.zip_with(F.col("x.mh"), F.col("y.mh"),
                   lambda a, b: (a == b).cast("int")),
        F.lit(0), lambda acc, v: acc + v) / F.lit(float(num_hashes)))
    pairs = (cb.alias("x")
             .join(F.broadcast(bb.alias("y")),
                   (F.col("x.band") == F.col("y.band")) &
                   (F.col("x.bsig") == F.col("y.bsig")))
             .select(F.col(f"x.{id_col}").alias("did"),
                     F.col(f"y.{id_col}").alias("bid"),
                     F.round(est, 6).alias("est"))
             # a pair can collide in several bands; the estimate is a
             # pure function of the two signatures, so max() dedupes
             .groupBy("did", "bid").agg(F.max("est").alias("est")))
    return (pairs.groupBy("did")
            .agg(F.count("*").alias("n_eval_cands"),
                 F.max("est").alias("max_jaccard_est"))
            .select(F.col("did").alias(id_col), "n_eval_cands",
                    "max_jaccard_est",
                    (F.col("max_jaccard_est") >= threshold)
                    .alias("contaminated")))


def positional_shingles(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", w: int = 8) -> DataFrame:
    """POSITION-INDEXED w-token shingles: one row per (doc, start
    position), 1-based, with the md5 of the w-token window — the
    substrate of substring-level dedup, where *where* a shingle occurs
    matters, unlike :func:`shingles` (distinct, position-free).

    Docs shorter than ``w`` tokens emit no rows (no w-window exists).
    The sequence bound is guarded: Spark's ``sequence(1, n)`` counts
    DOWN when n < 1, so the position list is empty-when-short by a
    ``when``, not by clamping."""
    toks = tokens(text_col)
    n_sh = F.size(toks) - (w - 1)
    pos_list = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)) \
                .otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        pos_list,
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(toks, i, w))).alias("h")))
    ex = docs.select(F.col(id_col), F.size(toks).alias("n_tokens"),
                     F.explode(sh).alias("_s"))
    return ex.select(id_col, "n_tokens",
                     F.col("_s.pos").alias("pos"), F.col("_s.h").alias("h"))


def substring_dup_spans(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", w: int = 8,
                        min_count: int = 2) -> DataFrame:
    """Substring-level exact dedup (the Lee et al. 2021 "Deduplicating
    Training Data" operator, Spark-shaped): find maximal token spans
    that are repeated — within a document or across the corpus — and
    report them as cuttable (start, end) spans per document.

    Shape (all linear, never all-pairs):

    1. position-indexed w-token shingle hashes (:func:`positional_shingles`)
       — one explode, corpus-linear;
    2. the corpus-wide duplicate-shingle set: ``groupBy(h)`` keeping
       hashes with total occurrence count >= ``min_count`` (md5 keys are
       uniform, so the shuffle is skew-free);
    3. join positions back to the duplicate set on ``h`` — pinned
       ``shuffle_hash`` like the candidate self-joins: the dup-hash
       frame is corpus-scaled in the worst case (boilerplate-heavy
       corpora), so an estimate-driven broadcast of it is exactly the
       flip :mod:`tests.test_plans` exists to prevent;
    4. gaps-and-islands per doc: duplicated start positions whose gap
       is <= ``w`` have overlapping/abutting w-windows, so they merge
       into ONE maximal span (window function over ``(doc, pos)``);
       a gap > w leaves at least one uncovered token between spans,
       so distinct islands are disjoint by construction.

    Cost note: the positional-shingle frame is EVALUATED TWICE (the
    duplicate-hash aggregate and the join probe side) — recomputing
    the explode is the deliberate trade against materializing a
    corpus×w row frame; ``stabilize()`` the
    :func:`positional_shingles` output yourself if IO is cheaper than
    CPU in your deployment.

    Returns one row per span: (id, n_tokens, span_start, span_end,
    span_tokens) where the span covers tokens ``span_start ..
    span_start + span_tokens - 1`` (1-based, ``span_tokens =
    last_window_start - span_start + w``). Aggregate for per-doc
    dup-fraction; anti-join/slice for the actual cut.

    100 TB: two uniform-key shuffles (h-agg, h-join) + one doc-keyed
    window — same scale class as :func:`ngram_candidate_pairs` minus
    the self-join, because substring dedup never compares documents
    pairwise at all."""
    ps = positional_shingles(docs, id_col, text_col, w)
    dup = (ps.groupBy("h").agg(F.count("*").alias("_c"))
           .filter(F.col("_c") >= min_count).select("h"))
    hits = ps.join(dup.hint("shuffle_hash"), "h")
    return _hits_to_spans(hits, id_col, w)


def _hits_to_spans(hits: DataFrame, id_col: str, w: int) -> DataFrame:
    """Gaps-and-islands over matched window START positions → maximal
    disjoint spans (the substring_dup_spans step 4, shared with
    :func:`contamination_spans`): starts whose gap is <= w have
    overlapping/abutting w-windows and merge; a gap > w leaves an
    uncovered token between islands."""
    from pyspark.sql.window import Window
    win = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(win)
    brk = F.when(prev.isNull() | ((F.col("pos") - prev) <= w), 0) \
           .otherwise(1)
    spans = (hits.withColumn("_span", F.sum(brk).over(win))
             .groupBy(id_col, "n_tokens", "_span")
             .agg(F.min("pos").alias("span_start"),
                  F.max("pos").alias("_last_start")))
    return spans.select(
        F.col(id_col), F.col("n_tokens"), F.col("span_start"),
        (F.col("_last_start") + (w - 1)).alias("span_end"),
        (F.col("_last_start") - F.col("span_start") + w)
        .alias("span_tokens"))


def contamination_spans(docs: DataFrame, bench: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        w: int = 5) -> DataFrame:
    """SURGICAL decontamination, span stage: find the maximal token
    spans of every corpus document whose w-token windows appear
    VERBATIM in the benchmark/eval set — :func:`substring_dup_spans`'s
    span algebra with the duplicate-hash set replaced by the eval
    shingle set, so the output composes with :func:`cut_dup_spans` to
    REWRITE contaminated documents instead of dropping them (the
    surgical alternative to :func:`benchmark_overlap`'s doc-level
    flag: a long document with one quoted eval item keeps its clean
    remainder).

    Scale shape: the eval side is MBs against a 100 TB corpus, so its
    DISTINCT w-gram hash set BROADCASTS (the benchmark_overlap
    design); the corpus pays one position-indexed shingle explode,
    the hit filter is map-side, and the islands window is doc-keyed —
    linear end-to-end, nothing pairwise."""
    ps = positional_shingles(docs, id_col, text_col, w)
    ev = bench.select(F.explode(shingles(text_col, w)).alias("h")).distinct()
    hits = ps.join(F.broadcast(ev), "h")
    return _hits_to_spans(hits, id_col, w)


def cut_dup_spans(docs: DataFrame, spans: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Turn :func:`substring_dup_spans` output into the dedup ACTION:
    cut every duplicated span out of every document's token stream
    (the Lee et al. policy — remove all copies; repeated boilerplate
    carries no training signal from any occurrence) and return the
    cleaned corpus.

    Shape: the span frame collapses to one row per affected doc
    (collect_list of (start, end) — spans per doc are few and disjoint
    by construction), LEFT-joins the corpus on the id (one linear
    shuffle; untouched docs pass through with text intact), and the
    cut itself is a pure-codegen filter over the token array — keep
    token position p iff no span covers it (``exists`` over the row's
    own dictionary-sized span list; no explode, no second shuffle).

    Returns the input columns plus ``<text_col>_clean``,
    ``n_tokens_before``, ``n_tokens_after``. Contract: token streams
    are single-space-delimited (the corpus convention everywhere in
    this package); consecutive-space inputs produce empty-string
    tokens that count per the whitespace convention, and on such
    inputs the span-arithmetic restatement (n_tokens − covered) can
    differ from the string recount by the surviving empty tokens."""
    sp = (spans.groupBy(F.col(id_col))
          .agg(F.collect_list(
              F.struct("span_start", "span_end")).alias("_spans")))
    # worst case (boilerplate-heavy corpus) the span frame has a row
    # per document — corpus-scaled, so pin the join to a shuffle on the
    # id instead of letting a small-sf size estimate broadcast it
    j = docs.join(sp.hint("shuffle_hash"), id_col, "left")
    toks = tokens(text_col)
    indexed = F.transform(
        toks, lambda x, i: F.struct(x.alias("t"), (i + 1).alias("p")))
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda b: (s["p"] >= b["span_start"])
            & (s["p"] <= b["span_end"])))
    # split("") yields [""] (size 1), so gate the counts on emptiness —
    # an empty/whitespace-only doc carries 0 tokens, not 1 (found by
    # the random-corpus property test)
    n_before = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)) \
        .otherwise(F.size(toks))
    cleaned = F.when(F.col("_spans").isNull(), F.trim(F.col(text_col))) \
        .otherwise(F.concat_ws(" ", F.transform(kept, lambda s: s["t"])))
    # count from the STRING the caller gets (empty string = 0 tokens),
    # so the report can never disagree with a recount of text_clean —
    # relevant only for the pathological consecutive-space inputs where
    # every surviving token is the empty string
    n_after = F.when(F.col("_spans").isNull(), n_before) \
        .otherwise(F.when(F.length(cleaned) == 0, F.lit(0))
                   .otherwise(F.size(kept)))
    return (j.withColumn(f"{text_col}_clean", cleaned)
            .withColumn("n_tokens_before", n_before.cast("long"))
            .withColumn("n_tokens_after", n_after.cast("long"))
            .drop("_spans"))
