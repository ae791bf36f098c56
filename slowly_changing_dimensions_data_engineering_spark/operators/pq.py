"""Product quantization (PQ) — sub-vector codebook compression for
embedding columns, the standard way a 100 TB vector corpus fits in
serving memory (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public literature, no reference-repo
counterpart; this extends the LLM-pipeline similarity surface next to
``similarity.quantize_int8``).

A dim-d vector is split into ``m`` contiguous sub-vectors of d/m dims;
each sub-vector is replaced by the id of its nearest codeword in that
subspace's ``ks``-entry codebook. Storage drops from d floats to m
small ints (dim-64 float32 → m=8 one-byte codes = 32×); search runs
against the codes with an asymmetric distance computation (ADC): the
query is NOT quantized — per subspace, its exact distances to all ks
codewords form an m×ks lookup table, and a document's approximate
distance is the sum of m table lookups.

Everything here is pure column expressions over a ONE-ROW broadcast
codebook frame (m·ks codewords — dictionary-sized, like the IVF
centroid and two-level seed broadcasts): encoding, reconstruction, and
ADC scoring all run inside whole-stage codegen with zero shuffles on
the corpus. Determinism follows the registry convention: distances
rounded to 9 before argmin, ties → lowest code id.

Codebooks come in two modes, mirroring the IVF centroid story:
``"lowid"`` (subspace j's codewords are the j-th sub-vectors of the ks
lowest-id corpus rows — the deterministic convention the DuckDB oracle
restates) and ``"kmeans"`` (per-subspace Lloyd training via
``kmeans_fit`` on the projected sub-vector column — the quality path;
``tools/bench_pq.py`` measures what it buys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import as_double, l2sq


def _subvec(vec: Column, j: Column | int, sub: int) -> Column:
    """Sub-vector j (0-based) of a vector column: elements
    [j*sub+1 .. (j+1)*sub] (slice is 1-based)."""
    jj = F.lit(j) if isinstance(j, int) else j
    return F.slice(vec, jj * sub + 1, sub)


def pq_codebooks(vectors: DataFrame, m: int, ks: int, dim: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 mode: str = "lowid", iters: int = 5) -> DataFrame:
    """Train/derive the per-subspace codebooks: (subspace, code,
    codeword array<double>), ``m``·``ks`` rows. ``dim`` must divide by
    ``m``. ``mode="lowid"``: codeword c of subspace j is the j-th
    sub-vector of the c-th lowest-id row (oracle-restatable).
    ``mode="kmeans"``: each subspace's codebook is ``kmeans_fit`` over
    that subspace's projection of the WHOLE corpus (m dictionary-sized
    trainings; fast means — this is the production-quality path).
    Analysis-time cost note: the m trainings run SEQUENTIALLY, m·iters
    Spark jobs of dictionary-sized driver work — fine for a one-off
    dictionary build, not a per-query path."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    v = vectors.select(F.col(id_col), as_double(vec_col).alias("_v"))
    if mode == "lowid":
        from pyspark.sql.window import Window
        seed = (v.orderBy(id_col).limit(ks)
                .select((F.row_number().over(Window.orderBy(id_col)) - 1)
                        .alias("code"), F.col("_v")))
        return (seed.select(
            "code",
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: _subvec(F.col("_v"), j, sub))))
            .select(F.col("pos").alias("subspace"), "code",
                    F.col("col").alias("codeword")))
    if mode == "kmeans":
        from .similarity import kmeans_fit
        parts = []
        for j in range(m):
            proj = v.select(F.col(id_col),
                            _subvec(F.col("_v"), j, sub).alias(vec_col))
            cb = kmeans_fit(proj, k=ks, iters=iters, id_col=id_col,
                            vec_col=vec_col, mean_mode="fast")
            parts.append(cb.select(F.lit(j).alias("subspace"),
                                   F.col("centroid_id").alias("code"),
                                   F.col("embedding").alias("codeword")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    raise ValueError(f"unknown mode {mode!r}")


def _codebook_arr(codebooks: DataFrame) -> DataFrame:
    """Collapse the codebook frame to ONE row: _cb[j][c] = codeword —
    the broadcastable dictionary every PQ expression indexes into."""
    return (codebooks
            .groupBy("subspace")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("code", "codeword"))),
                lambda s: s["codeword"]).alias("_row"))
            .groupBy()
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "_row"))),
                lambda s: s["_row"]).alias("_cb")))


def pq_encode(vectors: DataFrame, codebooks: DataFrame, m: int, dim: int,
              id_col: str = "vec_id", vec_col: str = "embedding",
              keep: list[str] | None = None,
              with_dist: bool = False) -> DataFrame:
    """(id, codes array<int>): per subspace, the id of the nearest
    codeword (L2², rounded to 9, ties → lowest code). One broadcast of
    the 1-row codebook frame; encoding is a pure codegen expression —
    no shuffle, no join fan-out, the corpus streams once.
    ``with_dist`` adds ``dists array<double>`` — the per-subspace
    quantization error of the chosen codeword (the contract query's
    checksum; production encoding skips it)."""
    sub = dim // m
    v = vectors.select(F.col(id_col), *(keep or []),
                       as_double(vec_col).alias("_v"))
    enc = v.crossJoin(F.broadcast(_codebook_arr(codebooks)))
    best = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.array_min(F.transform(
            F.try_element_at(F.col("_cb"), j + 1),
            (lambda cw, c: F.struct(
                F.round(l2sq(_subvec(F.col("_v"), j, sub), cw), 9).alias("d"),
                c.alias("c"))))))
    if not with_dist:
        return enc.select(F.col(id_col), *(keep or []),
                          F.transform(best, lambda s: s["c"]).alias("codes"))
    # materialize the argmin array in its own projection so codes and
    # dists don't each re-evaluate the m×ks scoring (expressions
    # referenced twice run twice — operators/dedup.py precedent)
    staged = enc.select(F.col(id_col), *(keep or []), best.alias("_best"))
    return staged.select(
        F.col(id_col), *(keep or []),
        F.transform("_best", lambda s: s["c"]).alias("codes"),
        F.transform("_best", lambda s: s["d"]).alias("dists"))


def pq_reconstruct(codes_df: DataFrame, codebooks: DataFrame,
                   id_col: str = "vec_id") -> DataFrame:
    """(id, embedding): concatenation of each code's codeword — the
    lossy inverse of ``pq_encode`` (reconstruction error is the
    quantization loss ``tools/bench_pq.py`` measures)."""
    rec = codes_df.crossJoin(F.broadcast(_codebook_arr(codebooks)))
    emb = F.flatten(F.transform(
        F.col("codes"),
        lambda c, j: F.try_element_at(F.try_element_at(F.col("_cb"), j + 1),
                                      c + 1)))
    return rec.select(F.col(id_col), emb.alias("embedding"))


def pq_adc_topk(codes_df: DataFrame, codebooks: DataFrame,
                query_vec: DataFrame, m: int, dim: int, k: int = 10,
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance top-k over the ENCODED corpus: the query
    stays exact; its per-subspace distances to every codeword form the
    m×ks lookup table (one 1-row broadcast — computed once, reused by
    every corpus row), and each document scores as the sum of m table
    lookups — no vector math on the corpus at all, which is the point
    of PQ at 100 TB: the float corpus is never read at query time.
    ``query_vec`` is a 1-row DataFrame with ``embedding`` (the exact
    query vector; resolve it with a limit-1 shape so the broadcast
    subtree stays structurally bounded — see queries.embed_topk_cosine).
    Returns (id, adc_d): the k lowest approximate distances, distances
    rounded to 9, ties → lowest id."""
    sub = dim // m
    q = query_vec.select(as_double("embedding").alias("_q"))
    # distance table: _dtab[j][c] = round(l2sq(q_sub_j, cb[j][c]), 9)
    tab = (q.crossJoin(F.broadcast(_codebook_arr(codebooks)))
           .select(F.transform(
               F.col("_cb"),
               lambda row, j: F.transform(
                   row, lambda cw: F.round(
                       l2sq(_subvec(F.col("_q"), j, sub), cw), 9)))
               .alias("_dtab")))
    scored = (codes_df.crossJoin(F.broadcast(tab))
              .select(F.col(id_col),
                      F.round(F.aggregate(
                          F.transform(
                              F.col("codes"),
                              lambda c, j: F.try_element_at(
                                  F.try_element_at(F.col("_dtab"), j + 1),
                                  c + 1)),
                          F.lit(0.0), lambda a, x: a + x), 9).alias("adc_d")))
    return scored.orderBy(F.asc("adc_d"), F.asc(id_col)).limit(k)


def pq_adc_topk_batch(codes_df: DataFrame, codebooks: DataFrame,
                      queries_df: DataFrame, m: int, dim: int, k: int = 10,
                      id_col: str = "vec_id", qid_col: str = "qid",
                      qvec_col: str = "qv") -> DataFrame:
    """Batch ADC: top-k for EVERY query in one plan. The per-query m×ks
    distance tables are materialized as a (qid, subspace, code, d)
    frame — |Q|·m·ks rows, queries × dictionary, not corpus — and the
    encoded corpus joins it per subspace on (subspace, code): an
    equi-join Catalyst can broadcast (small Q) or shuffle (large Q),
    never a per-query driver loop. Scoring sums each (qid, doc)'s m
    lookups with an ORDERED fold over subspace (collect_list sorted —
    the deterministic convention), then ranks top-k per query with a
    (adc_d, id) tie-break window. The float corpus is never read."""
    sub = dim // m
    q = queries_df.select(F.col(qid_col), as_double(qvec_col).alias("_q"))
    cb = codebooks.select("subspace", "code",
                          as_double("codeword").alias("_cw"))
    dtab = (q.crossJoin(F.broadcast(cb))
            .select(qid_col, "subspace", "code",
                    F.round(l2sq(_subvec(F.col("_q"),
                                         F.col("subspace").cast("int"), sub),
                                 F.col("_cw")), 9).alias("_d")))
    ex = codes_df.select(
        F.col(id_col),
        F.posexplode("codes").alias("subspace", "code"))
    scored = (ex.join(dtab, ["subspace", "code"])
              .groupBy(qid_col, id_col)
              .agg(F.round(F.aggregate(
                  F.transform(
                      F.array_sort(F.collect_list(F.struct("subspace", "_d"))),
                      lambda s: s["_d"]),
                  F.lit(0.0), lambda a, x: a + x), 9).alias("adc_d")))
    from pyspark.sql.window import Window
    w = Window.partitionBy(qid_col).orderBy(F.asc("adc_d"), F.asc(id_col))
    return (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def ivfpq_build_index(vectors: DataFrame, centroids: DataFrame,
                      codebooks: DataFrame, path: str, m: int, dim: int,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      keep: list[str] | None = None,
                      **assign_opts) -> None:
    """IVF-PQ index: the corpus PQ-ENCODED and written partitioned by
    IVF ``centroid_id`` — the production ANN layout (FAISS IVFPQ
    shape). A probe reads one partition directory (pruning, from IVF)
    whose rows are m one-byte codes (compression, from PQ): at 100 TB
    of float32 embeddings the scanned bytes per probe drop by
    (corpus/cells) × 32. ``assign_opts`` forward to ``ivf_assign``
    (two-level regime knobs); ``keep`` carries metadata columns into
    the index for filtered search."""
    from .similarity import ivf_assign
    assign = ivf_assign(vectors, centroids, id_col, vec_col, **assign_opts)
    codes = pq_encode(vectors, codebooks, m, dim, id_col=id_col,
                      vec_col=vec_col, keep=keep)
    # cells-per-task clustering before the partitioned write (one file
    # per cell dir, not per upstream task — see similarity.ivf_build_index)
    (codes.join(assign, id_col).repartition(F.col("centroid_id"))
     .write.mode("overwrite").partitionBy("centroid_id").parquet(path))


def ivfpq_search(spark, path: str, codebooks: DataFrame,
                 centroids: DataFrame, query_df: DataFrame, m: int, dim: int,
                 k: int = 10, nprobe: int = 1, shortlist: int | None = None,
                 rerank_vectors: DataFrame | None = None,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 exclude_query_id: bool = True) -> DataFrame:
    """Partition-pruned ADC search over an IVF-PQ index, query resolved
    IN-PLAN (no driver collect): the query's ``nprobe`` nearest cells
    are ranked by broadcasting the 1-row query against the streaming
    centroid frame (the ivf_search_index_inplan convention — never
    broadcast the corpus-scaled centroid set), the probe frame joins
    the partitioned index so dynamic partition pruning limits the scan
    to the probed directories, and the probed rows are scored by ADC
    from a 1-row broadcast distance table — the float corpus is never
    read for scoring.

    ``shortlist``/``rerank_vectors`` compose the production two-stage
    pattern: take the ``shortlist`` best ADC rows, then join ONLY those
    ids back to the float vectors for an exact re-rank of the final
    top-``k`` (float IO = shortlist rows, not the corpus). Without
    ``rerank_vectors`` the raw ADC top-k is returned. Distances follow
    the registry convention (rounded to 9, ties → lowest id).

    ``exclude_query_id`` (default True): drop the corpus row whose
    ``id_col`` equals the query's — the self-match convention for
    queries drawn FROM the corpus (``pq_adc_topk`` keeps self-matches;
    this flag makes the difference explicit instead of implicit). Pass
    False for out-of-corpus query vectors, where an id collision would
    silently drop a legitimate neighbor. The query frame must still
    carry an ``id_col`` column either way (it keys the per-query
    distance-table join); synthesize any literal id for external
    vectors — with False it never touches the result."""
    from ..session import stabilize

    q = stabilize(query_df.limit(1).select(
        F.col(id_col).alias("_qid"), as_double(vec_col).alias("_qv")))
    c = centroids.select(F.col("centroid_id").alias("_qc"),
                         as_double("embedding").alias("_ce"))
    from pyspark.sql.window import Window
    scored = (c.crossJoin(F.broadcast(q))
              .withColumn("_d", F.round(l2sq(F.col("_qv"), F.col("_ce")), 9)))
    w = Window.partitionBy("_qid").orderBy(F.asc("_d"), F.asc("_qc"))
    probes = (scored.select("_qid", "_qc", "_d")
              .withColumn("_r", F.row_number().over(w))
              .filter(F.col("_r") <= nprobe).select("_qid", "_qc"))
    sub = dim // m
    dtab = (q.crossJoin(F.broadcast(_codebook_arr(codebooks)))
            .select("_qid", F.transform(
                F.col("_cb"),
                lambda row, j: F.transform(
                    row, lambda cw: F.round(
                        l2sq(_subvec(F.col("_qv"), j, sub), cw), 9)))
                .alias("_dtab")))
    idx = spark.read.parquet(path)
    cond = idx["centroid_id"] == probes["_qc"]
    if exclude_query_id:
        cond = cond & (idx[id_col] != probes["_qid"])
    pruned = idx.join(F.broadcast(probes), cond)
    adc = (pruned.join(F.broadcast(dtab), "_qid")
           .select(F.col(id_col), F.col("centroid_id"),
                   F.round(F.aggregate(
                       F.transform(
                           F.col("codes"),
                           lambda cc, j: F.try_element_at(
                               F.try_element_at(F.col("_dtab"), j + 1),
                               cc + 1)),
                       F.lit(0.0), lambda a, x: a + x), 9).alias("adc_d")))
    short = (adc.orderBy(F.asc("adc_d"), F.asc(id_col))
             .limit(shortlist if shortlist else k))
    if rerank_vectors is None:
        return short.limit(k)
    rv = rerank_vectors.select(F.col(id_col),
                               as_double(vec_col).alias("_rv"))
    # the shortlist is limit-reduced (structurally bounded) — broadcast
    # it into the float-vector join so the re-rank reads only its rows
    rer = (rv.join(F.broadcast(short), id_col)
           .crossJoin(F.broadcast(q))
           .select(F.col(id_col), F.col("centroid_id"), F.col("adc_d"),
                   F.round(l2sq(F.col("_rv"), F.col("_qv")), 9)
                   .alias("exact_d")))
    return rer.orderBy(F.asc("exact_d"), F.asc(id_col)).limit(k)


def ivfpq_index_append(new_vectors: DataFrame, centroids: DataFrame,
                       codebooks: DataFrame, path: str, m: int, dim: int,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       keep: list[str] | None = None,
                       **assign_opts) -> None:
    """Grow the stored IVF-PQ index with a batch: assign + PQ-encode
    the BATCH ONLY (the stored corpus is never re-read) and append into
    the existing ``centroid_id=`` partition directories — O(batch),
    never a rewrite (the ``ivf_index_append`` contract, inherited).
    Both the centroid set AND the codebooks must be the index's own
    frozen dictionaries: appending under re-trained geometry would
    mis-partition (cells) or mis-decode (codes) the history; retrain =
    rebuild (``ivfpq_build_index``)."""
    from .similarity import ivf_assign
    assign = ivf_assign(new_vectors, centroids, id_col, vec_col,
                        **assign_opts)
    codes = pq_encode(new_vectors, codebooks, m, dim, id_col=id_col,
                      vec_col=vec_col, keep=keep)
    (codes.join(assign, id_col).repartition(F.col("centroid_id"))
     .write.mode("append").partitionBy("centroid_id").parquet(path))


def residual_frame(vectors: DataFrame, centroids: DataFrame,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   **assign_opts) -> DataFrame:
    """(id, embedding = vector − assigned-cell centroid): the residual
    corpus. Classic IVF-PQ refinement (Jégou et al. §IV): residuals
    have a fraction of the raw vectors' spread, so the same m×ks code
    budget quantizes them with far less error. Train residual
    codebooks by passing this frame to ``pq_codebooks``."""
    from .similarity import ivf_assign
    assign = ivf_assign(vectors, centroids, id_col, vec_col, **assign_opts)
    c = centroids.select(F.col("centroid_id"),
                         as_double("embedding").alias("_ce"))
    v = vectors.select(F.col(id_col), as_double(vec_col).alias("_v"))
    return (v.join(assign, id_col).join(c, "centroid_id")
            .select(F.col(id_col),
                    F.zip_with("_v", "_ce", lambda x, y: x - y)
                    .alias(vec_col)))


def _residual_codes(vectors: DataFrame, centroids: DataFrame,
                    codebooks: DataFrame, m: int, dim: int,
                    id_col: str, vec_col: str,
                    keep: list[str] | None, assign_opts: dict) -> DataFrame:
    """Shared residual-encode plan for build and append: assign each
    vector, subtract its cell centroid, PQ-encode the residual, and
    carry ``centroid_id`` (+ any ``keep`` metadata) alongside the
    codes."""
    from .similarity import ivf_assign
    assign = ivf_assign(vectors, centroids, id_col, vec_col, **assign_opts)
    c = centroids.select(F.col("centroid_id"),
                         as_double("embedding").alias("_ce"))
    extra = list(keep or [])
    v = vectors.select(F.col(id_col), as_double(vec_col).alias("_v"),
                       *[F.col(k) for k in extra])
    res = (v.join(assign, id_col).join(c, "centroid_id")
           .select(F.col(id_col), F.col("centroid_id"),
                   F.zip_with("_v", "_ce", lambda x, y: x - y)
                   .alias(vec_col), *[F.col(k) for k in extra]))
    return pq_encode(res, codebooks, m, dim, id_col=id_col,
                     vec_col=vec_col, keep=["centroid_id"] + extra)


def ivfpq_build_index_residual(vectors: DataFrame, centroids: DataFrame,
                               codebooks: DataFrame, path: str, m: int,
                               dim: int, id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               keep: list[str] | None = None,
                               **assign_opts) -> None:
    """IVF-PQ with RESIDUAL encoding: each row's codes quantize
    (vector − its cell centroid) against residual-trained
    ``codebooks`` (build them over ``residual_frame`` — mixing raw
    codebooks with residual encoding mis-decodes everything). Same
    partitioned layout and append/search contracts as the raw index:
    ``keep`` carries metadata columns for filtered search,
    ``ivfpq_index_append_residual`` grows it O(batch), and
    ``ivfpq_search_residual`` is the matching read path."""
    codes = _residual_codes(vectors, centroids, codebooks, m, dim,
                            id_col, vec_col, keep, assign_opts)
    (codes.repartition(F.col("centroid_id"))
     .write.mode("overwrite").partitionBy("centroid_id").parquet(path))


def ivfpq_index_append_residual(new_vectors: DataFrame,
                                centroids: DataFrame,
                                codebooks: DataFrame, path: str, m: int,
                                dim: int, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                keep: list[str] | None = None,
                                **assign_opts) -> None:
    """Grow a RESIDUAL IVF-PQ index with a batch — the
    ``ivfpq_index_append`` contract applied to residual encoding: the
    batch alone is assigned, residual-subtracted, and encoded under the
    index's FROZEN centroids and residual codebooks, then appended into
    the existing ``centroid_id=`` partition directories (the stored
    corpus is never re-read; retrain = rebuild)."""
    codes = _residual_codes(new_vectors, centroids, codebooks, m, dim,
                            id_col, vec_col, keep, assign_opts)
    (codes.repartition(F.col("centroid_id"))
     .write.mode("append").partitionBy("centroid_id").parquet(path))


def ivfpq_search_residual(spark, path: str, codebooks: DataFrame,
                          centroids: DataFrame, query_df: DataFrame,
                          m: int, dim: int, k: int = 10, nprobe: int = 1,
                          shortlist: int | None = None,
                          rerank_vectors: DataFrame | None = None,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          exclude_query_id: bool = True) -> DataFrame:
    """Partition-pruned ADC over a RESIDUAL IVF-PQ index. Per probed
    cell the distance table is computed against the query's residual in
    THAT cell (q − cell centroid): ||x − q||² = ||x_res − (q − c)||²
    for x in cell c, so per-cell tables make the ADC approximation
    exact up to quantization — the accuracy win residual encoding buys
    (measured in BENCH_NOTES «r8: residual vs raw IVF-PQ»). The tables
    ride a (cell, subspace, code) frame of nprobe·m·ks rows that the
    probed partitions' exploded codes equi-join; sums use the
    ordered-fold convention; shortlist/re-rank and
    ``exclude_query_id`` (self-match convention for in-corpus queries;
    pass False for external query vectors) compose as in
    ``ivfpq_search``."""
    from ..session import stabilize

    q = stabilize(query_df.limit(1).select(
        F.col(id_col).alias("_qid"), as_double(vec_col).alias("_qv")))
    c = centroids.select(F.col("centroid_id").alias("_qc"),
                         as_double("embedding").alias("_ce"))
    from pyspark.sql.window import Window
    scored = (c.crossJoin(F.broadcast(q))
              .withColumn("_d", F.round(l2sq(F.col("_qv"), F.col("_ce")), 9)))
    w = Window.partitionBy("_qid").orderBy(F.asc("_d"), F.asc("_qc"))
    probes = (scored.select("_qid", "_qv", "_qc", "_ce", "_d")
              .withColumn("_r", F.row_number().over(w))
              .filter(F.col("_r") <= nprobe)
              .select("_qid", "_qc",
                      F.zip_with("_qv", "_ce", lambda x, y: x - y)
                      .alias("_qres")))
    sub = dim // m
    cb = codebooks.select("subspace", "code",
                          as_double("codeword").alias("_cw"))
    dtab = (probes.crossJoin(F.broadcast(cb))
            .select("_qid", "_qc", "subspace", "code",
                    F.round(l2sq(_subvec(F.col("_qres"),
                                         F.col("subspace").cast("int"), sub),
                                 F.col("_cw")), 9).alias("_d")))
    idx = spark.read.parquet(path)
    cond = idx["centroid_id"] == probes["_qc"]
    if exclude_query_id:
        cond = cond & (idx[id_col] != probes["_qid"])
    pruned = idx.join(F.broadcast(probes.select("_qid", "_qc")), cond)
    ex = pruned.select(F.col(id_col), F.col("centroid_id"), "_qid",
                       F.posexplode("codes").alias("subspace", "code"))
    adc = (ex.join(F.broadcast(dtab),
                   (ex["centroid_id"] == dtab["_qc"]) &
                   (ex["subspace"] == dtab["subspace"]) &
                   (ex["code"] == dtab["code"]))
           .groupBy(ex[id_col], ex["centroid_id"])
           .agg(F.round(F.aggregate(
               F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(ex["subspace"], F.col("_d")))),
                   lambda s: s["_d"]),
               F.lit(0.0), lambda a, x: a + x), 9).alias("adc_d")))
    short = (adc.orderBy(F.asc("adc_d"), F.asc(id_col))
             .limit(shortlist if shortlist else k))
    if rerank_vectors is None:
        return short.limit(k)
    rv = rerank_vectors.select(F.col(id_col),
                               as_double(vec_col).alias("_rv"))
    rer = (rv.join(F.broadcast(short), id_col)
           .crossJoin(F.broadcast(q))
           .select(F.col(id_col), F.col("centroid_id"), F.col("adc_d"),
                   F.round(l2sq(F.col("_rv"), F.col("_qv")), 9)
                   .alias("exact_d")))
    return rer.orderBy(F.asc("exact_d"), F.asc(id_col)).limit(k)


def pq_balanced_permutation(vectors: DataFrame, m: int, dim: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> list[int]:
    """OPQ-lite dimension reordering: a permutation that BALANCES
    per-dimension variance across the ``m`` subspaces — the structured
    "eigenvalue allocation" baseline of OPQ (Ge et al., "Optimized
    Product Quantization", CVPR 2013: allocate dimensions so every
    subspace carries comparable energy, because PQ spends an equal
    ``ks``-codeword budget per subspace regardless of how much variance
    lives there).

    Natural (contiguous) ordering on an anisotropic corpus — real
    embedding spectra decay — concentrates the high-variance dims in
    the first subspaces: their codebooks saturate while the tail
    subspaces' budgets idle. The fix here is analysis-time linear and
    tiny: one per-dimension ``var_pop`` aggregate over the corpus (one
    shuffle keyed by the dim index — ``dim`` groups), a driver-side
    greedy (highest-variance dim → currently-lightest subspace,
    deterministic index tiebreak), and the result is a plain ``dim``-
    length permutation: ``perm[out_pos] = src_dim`` (0-based), output
    positions grouped contiguously by subspace so the standard
    ``_subvec`` slicing applies unchanged.

    Apply with :func:`apply_dim_permutation` to the corpus BEFORE
    codebook training / encoding and to every query vector at search
    time (same frozen-dictionary rule as centroids/codebooks: the
    permutation is part of the index geometry). Measured trade:
    BENCH_NOTES «r9: OPQ-lite balanced permutation».
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    v = vectors.select(as_double(vec_col).alias("_v"))
    per_dim = (v.select(F.posexplode("_v").alias("_dim", "_x"))
               .groupBy("_dim").agg(F.var_pop("_x").alias("_var"))
               .collect())                      # dim rows — bounded
    if len(per_dim) != dim:
        raise ValueError(
            f"corpus carries {len(per_dim)} dims, expected {dim}")
    order = sorted(per_dim, key=lambda r: (-r["_var"], r["_dim"]))
    loads = [0.0] * m
    counts = [0] * m
    groups: list[list[int]] = [[] for _ in range(m)]
    for r in order:
        # lightest non-full subspace; deterministic index tiebreak
        j = min((j for j in range(m) if counts[j] < sub),
                key=lambda j: (loads[j], j))
        groups[j].append(r["_dim"])
        loads[j] += r["_var"]
        counts[j] += 1
    return [d for g in groups for d in g]


def apply_dim_permutation(df: DataFrame, perm: list[int],
                          vec_col: str = "embedding") -> DataFrame:
    """Reorder a vector column by a permutation (``out[i] =
    vec[perm[i]]``, 0-based) — pure codegen element_at projection, no
    shuffle; the inverse is ``apply_dim_permutation(df,
    inverse_permutation(perm))``."""
    c = F.col(vec_col)
    return df.withColumn(
        vec_col, F.array(*[F.element_at(c, p + 1) for p in perm]))


def inverse_permutation(perm: list[int]) -> list[int]:
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return inv
