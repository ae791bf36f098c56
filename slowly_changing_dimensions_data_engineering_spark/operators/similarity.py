"""Embedding similarity search — north-star LLM-pipeline surface.

Brute-force cosine top-k is the exactness baseline
(``queries.embed_topk_cosine``). This module adds the scale paths:

- **IVF (inverted-file) ANN**: assign every vector to its nearest
  centroid (one broadcast join against the small centroid set), search
  only the query's cluster (+ optional probes). At 100 TB the corpus is
  hash-partitioned by cluster id, so a query touches one partition
  group instead of the full corpus.
- **Embedding near-dup pairs**: blocked self-join (block = label/IVF
  cluster) + exact cosine threshold — the O(n²/k) analogue of LSH
  dedup for dense vectors.

All vector math is JVM-side (zip_with + aggregate over array<double>).
Determinism: cosines are rounded before thresholds/ordering so double
ulp noise cannot flip a comparison across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..session import stabilize


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column, digits: int = 9) -> Column:
    c = dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))
    return F.round(c, digits)


def l2sq(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


#: Above this many centroids, ``ivf_assign`` switches from the flat
#: all-centroids scoring pass to the two-level coarse→fine quantizer.
#: Rationale: with cell population held constant (k = n/250), flat
#: assignment is O(n·k) = O(n²/250) total distance evaluations AND
#: broadcasts all k centroid vectors — both die long before n = 10⁹
#: (k ≈ 4M). Two-level keeps the broadcast at O(√k) seed vectors and
#: the per-vector work at O(√k·probes), so build/append cost stays
#: O(n·√k) — linear-ish in corpus size with k scaled. 512 flat
#: centroids ≈ a few hundred KB broadcast and ≤512 distance evals per
#: row: comfortably cheap, and every driver/oracle scale (k ≤ 80)
#: stays on the flat path whose semantics the DuckDB oracles mirror
#: exactly.
FLAT_MAX_CENTROIDS = 512


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cid_col: str = "centroid_id",
               flat_max_centroids: int = FLAT_MAX_CENTROIDS,
               coarse_probe: int = 4,
               seed_mode: str = "lowid",
               seed_iters: int = 5,
               n_centroids: int | None = None) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2, rounded;
    ties → lowest centroid id). centroids: (centroid_id, embedding).

    Two regimes (the count() on the dictionary-sized centroid frame is
    the only driver action):

    - **k ≤ flat_max_centroids — flat, exact**: one broadcast
      nested-loop against the tiny centroid table, then a per-row
      argmin. This is the path every registered query and oracle runs
      (and mirrors bit-for-bit in DuckDB).
    - **k > flat_max_centroids — two-level coarse→fine**
      (``coarse_probe`` ≥ 1): ~√k coarse seed centroids are broadcast
      as ONE array row; each vector ranks its ``coarse_probe`` nearest
      coarse cells with pure array expressions (no shuffle), then
      scores only those cells' fine centroids via equi-joins on the
      coarse id. Distance evaluations drop from n·k to
      n·√k·(1+probes), and no plan ever broadcasts the full centroid
      set — the fine-centroid join is a plain equi-join Catalyst can
      execute as broadcast OR shuffle hash join as size dictates.
      APPROXIMATION CONTRACT: a vector whose true nearest fine
      centroid lives in a non-probed coarse cell gets its best probed
      cell instead (standard IMI/coarse-quantizer behavior; raise
      ``coarse_probe`` to trade cost for fidelity — probing ALL coarse
      cells reproduces the flat assignment exactly, tested in
      tests/test_llm_ops.py). Measured agreement with the exact flat
      assignment on UNIFORM random vectors (the worst case — no
      cluster structure, distances concentrate in high dim; clustered
      real corpora agree far better), 800 vectors:

        probes   dim=4 k=36/100   dim=16 k=36/100
           1       0.70 / 0.67      0.53 / 0.39
           2       0.86 / 0.88      0.72 / 0.57
           4       0.98 / 0.98      0.93 / 0.84

      The default probes=4 costs ~2× probes=2 but stays ~3× cheaper
      than flat at n=200k/k=800 (11.5s vs 5.9s vs 33.4s, local[16])
      while holding worst-case fidelity ≥0.84 — assignment fidelity is
      search recall: a vector parked outside its true cell is invisible
      to a search probing that cell.

      At REALISTIC embedding dimensions (64/256/768) the trade shifts
      (``tools/bench_twolevel.py --fidelity`` reproduces the table in
      BENCH_NOTES.md «r8: two-level fidelity at realistic
      dimensions»): on an isotropic-uniform corpus — the provable
      worst case, distances concentrate so the coarse ranking carries
      little signal — probes=4 agreement falls to 0.50-0.58 and
      restoring ≥0.8 takes probes≈8-16 of the ⌈√k⌉≈25 cells. On a
      CLUSTERED corpus (any real embedding model's output) probes=4
      holds ≥0.994 at every measured dimension. ``seed_mode="kmeans"``
      (below) recovers most of the uniform-case loss at no per-vector
      cost: it Lloyd-refines the coarse seeds over the
      dictionary-sized fine-centroid set, improving the coarse
      ranking's signal by 0.07-0.15 agreement at every uniform cell
      (dim-768 probes=8: 0.686 → 0.835; clustered reaches exact-1.0
      agreement at probes=4).

    ``seed_mode`` selects the coarse seeds of the two-level path:
    ``"lowid"`` (default — the ⌈√k⌉ lowest-id fine centroids, the
    deterministic convention the DuckDB oracles restate) or
    ``"kmeans"`` — start from the lowid seeds and run ``seed_iters``
    Lloyd rounds over the FINE-CENTROID dictionary only (k rows, never
    the corpus; per-dimension means use the exact decimal-sum
    accumulator so the refined seeds are partition-count independent).
    Refinement cost is O(k·√k·iters) distance evaluations at index
    build — noise next to the O(n·√k·probes) corpus pass.

    ``n_centroids`` lets callers that already know the centroid count
    skip the regime-selecting ``count()`` job (e.g. the registry
    computes k = max(8, n//250) before building the centroid frame)."""
    k = centroids.count() if n_centroids is None else n_centroids
    if k <= flat_max_centroids:
        return _ivf_assign_flat(vectors, centroids, id_col, vec_col, cid_col)
    return _ivf_assign_two_level(vectors, centroids, k, id_col, vec_col,
                                 cid_col, coarse_probe, seed_mode, seed_iters)


def _ivf_assign_flat(vectors: DataFrame, centroids: DataFrame,
                     id_col: str, vec_col: str, cid_col: str) -> DataFrame:
    # Only (id, vector) enter the n×k crossJoin — payload columns would
    # be replicated k-fold and discarded by the aggregate anyway.
    v = vectors.select(id_col, as_double(vec_col).alias("_v"))
    c = centroids.select(F.col(cid_col), as_double("embedding").alias("_c"))
    scored = (
        v.crossJoin(F.broadcast(c))
        .withColumn("_d", F.round(l2sq(F.col("_v"), F.col("_c")), 9))
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("_d"), F.col(cid_col))).alias("_best"))
    return best.select(id_col, F.col(f"_best.{cid_col}").alias(cid_col))


def _lloyd_refine_seeds(seeds: DataFrame, cents: DataFrame,
                        iters: int) -> DataFrame:
    """Lloyd-refine the coarse seeds over the FINE-CENTROID dictionary
    (k rows — the corpus is never touched). Each round assigns every
    fine centroid to its nearest current seed (one broadcast of the
    m-row seed array, distances rounded + lowest-seed-id tie-break,
    exactly the coarse-ranking convention) and moves each seed to the
    per-dimension mean of its members; a seed that captures no members
    keeps its position. Seed IDENTITY is stable — ``_coarse`` stays the
    founding lowid centroid id — only the positions move. Means use the
    exact decimal-sum accumulator (associative addition), so refined
    seeds are bit-identical under any partitioning of the centroid
    frame. Everything here is dictionary-sized: per round, k×m rounded
    distances plus a k·dim posexplode aggregation.

    Each round MATERIALIZES the refined m-row seed set to the driver
    and rebuilds it as a literal frame: the round's plan references the
    previous seeds twice (the collect_list broadcast AND the join back
    to the means), so chaining rounds lazily doubles the unresolved
    plan per iteration (~2^iters copies of the seed subtree) — a large
    caller-supplied ``seed_iters`` would hang the driver at ANALYSIS
    time. The collect is bounded at m = ⌈√k⌉ rows (dictionary-sized,
    like the other audited collect sites); rows are re-sorted by seed
    id so the rebuilt frame is deterministic, and the downstream
    two-level plan gets a constant-size seed leaf as a bonus."""
    spark = seeds.sparkSession
    for _ in range(max(0, iters)):
        sarr = seeds.agg(F.collect_list(F.struct(
            F.col("_coarse").alias("c"), F.col("_se").alias("e"))).alias("_s"))
        owned = (cents.crossJoin(F.broadcast(sarr))
                 .select("_ce",
                         F.array_min(F.transform(
                             F.col("_s"),
                             lambda s: F.struct(
                                 F.round(l2sq(F.col("_ce"), s["e"]), 9).alias("d"),
                                 s["c"].alias("c"))))["c"].alias("_coarse")))
        means = (owned.select("_coarse", F.posexplode("_ce"))
                 .groupBy("_coarse", "pos")
                 .agg((F.sum(F.col("col").cast("decimal(38,15)"))
                       .cast("double") / F.count("*")).alias("v"))
                 .groupBy("_coarse")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "v"))),
                     lambda s: s["v"]).alias("_new")))
        refined = (seeds.join(means, "_coarse", "left")
                   .select("_coarse",
                           F.coalesce(F.col("_new"), F.col("_se")).alias("_se")))
        rows = sorted(refined.collect(), key=lambda r: r["_coarse"])
        seeds = spark.createDataFrame(rows, schema=refined.schema)
    return seeds


def _ivf_assign_two_level(vectors: DataFrame, centroids: DataFrame, k: int,
                          id_col: str, vec_col: str, cid_col: str,
                          coarse_probe: int, seed_mode: str = "lowid",
                          seed_iters: int = 5) -> DataFrame:
    """Coarse→fine assignment for large centroid sets (see ivf_assign).

    Coarse seeds are the ⌈√k⌉ lowest-id fine centroids (the same
    deterministic lowest-ids convention the streaming bootstrap uses for
    centroids themselves); every fine centroid is assigned to its
    nearest seed with the flat path (a k×√k scoring over the
    dictionary-sized centroid frame, not the corpus). The per-cell fine
    lists ride a groupBy(coarse) collect_list — √k rows whose TOTAL
    payload is the k fine centroids, never materialized as one
    broadcast row."""
    import math
    m = max(2, math.isqrt(k - 1) + 1)  # ceil(sqrt(k))
    p = max(1, coarse_probe)
    cents = centroids.select(F.col(cid_col), as_double("embedding").alias("_ce"))
    seeds = (cents.orderBy(F.asc(cid_col)).limit(m)
             .select(F.col(cid_col).alias("_coarse"),
                     F.col("_ce").alias("_se")))
    if seed_mode == "kmeans":
        seeds = _lloyd_refine_seeds(seeds, cents, seed_iters)
    elif seed_mode != "lowid":
        raise ValueError(f"unknown seed_mode {seed_mode!r}")
    # fine centroid -> owning coarse cell (k rows scored against m
    # seeds; renamed to dodge the fine-id/centroid-id name collision)
    f2c = _ivf_assign_flat(
        cents.select(F.col(cid_col).alias("_fid"),
                     F.col("_ce").alias("embedding")),
        seeds.select(F.col("_coarse").alias("centroid_id"),
                     F.col("_se").alias("embedding")),
        "_fid", "embedding", "centroid_id") \
        .select(F.col("_fid").alias(cid_col),
                F.col("centroid_id").alias("_coarse"))
    fine_by_coarse = (cents.join(f2c, cid_col)
                      .groupBy("_coarse")
                      .agg(F.collect_list(F.struct(
                          F.col(cid_col).alias("c"),
                          F.col("_ce").alias("e"))).alias("_fines")))
    # one array row of seeds, broadcast: per-vector coarse ranking is a
    # pure codegen expression — zero shuffle on the corpus
    seeds_arr = seeds.agg(F.collect_list(F.struct(
        F.col("_coarse").alias("c"), F.col("_se").alias("e"))).alias("_seeds"))
    v = vectors.select(id_col, as_double(vec_col).alias("_v"))
    ranked = (v.crossJoin(F.broadcast(seeds_arr))
              .withColumn("_probes", F.slice(F.array_sort(F.transform(
                  F.col("_seeds"),
                  lambda s: F.struct(
                      F.round(l2sq(F.col("_v"), s["e"]), 9).alias("d"),
                      s["c"].alias("c")))), 1, p))
              .drop("_seeds"))
    # score the p probed cells' fine centroids: p equi-joins (Catalyst
    # picks broadcast vs shuffle by build size), per-cell argmin as an
    # array_min over the cell's fine list, overall argmin via least()
    # — identical (d, cid) lexicographic tie-break as the flat path.
    out = ranked
    bests = []
    for i in range(1, p + 1):
        fbc = fine_by_coarse.select(
            F.col("_coarse").alias(f"_pc_{i}"),
            F.col("_fines").alias(f"_fines_{i}"))
        out = out.join(
            fbc,
            F.try_element_at(F.col("_probes"), F.lit(i))["c"]
            == F.col(f"_pc_{i}"),
            "left")
        bests.append(F.array_min(F.transform(
            F.col(f"_fines_{i}"),
            lambda f: F.struct(
                F.round(l2sq(F.col("_v"), f["e"]), 9).alias("d"),
                f["c"].alias("c")))))
    best = bests[0] if p == 1 else F.least(*bests)
    return out.select(F.col(id_col), best["c"].alias(cid_col))


def kmeans_fit(vectors: DataFrame, k: int, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               mean_mode: str = "exact",
               coarse_probe: int = 4) -> DataFrame:
    """Corpus-level Lloyd k-means: train ``k`` centroids over the FULL
    vector table with ``iters`` assign→update rounds. Returns
    (centroid_id, embedding) — feed it to ``ivf_assign``/``ivf_build``
    as a trained centroid dictionary instead of the lowest-id data-row
    convention (the fidelity matrix in BENCH_NOTES «r8: two-level
    fidelity at realistic dimensions» shows data-row seeds are the weak
    spot on unstructured corpora; trained centroids are the standard
    IVF answer).

    Per round: every vector is assigned to its nearest centroid through
    ``ivf_assign`` — so the scoring inherits the flat path's broadcast
    argmin for k ≤ 512 and the two-level coarse→fine path above it
    (distance evaluations stay O(n·√k·probes), never O(n·k), at large
    k) — then each centroid moves to the element-wise mean of its
    members; an empty centroid keeps its position (deterministic rule,
    restated by the oracle). Initialization is the k lowest-``id_col``
    vectors with dense ids 0..k-1 (the registry's deterministic lowid
    convention).

    ``mean_mode`` picks the mean accumulator:

    - ``"exact"`` (default): per (centroid, dimension), fold the member
      values in ascending ``id_col`` order — a sequential left fold
      over an ``array_sort``-ed ``collect_list``. Bit-identical under
      any partitioning AND bit-identical to DuckDB's
      ``list_reduce(list(x ORDER BY id), +)`` — measured: the
      decimal-cast accumulator used elsewhere in the registry is NOT
      cross-engine-stable on float32 embeddings (Spark casts
      double→decimal through the SHORTEST decimal repr, DuckDB through
      the exact binary expansion; per-mean divergence ~1e-17 on real
      data), while ordered folds matched 21/21 probe cells exactly.
      Cost: the collect_list cannot partially aggregate, so the update
      shuffles n·dim (id, value) pairs per round.
    - ``"fast"``: plain ``avg`` — map-side partial aggregation shuffles
      only k·dim partials per partition (the 100 TB path), at the price
      of run-to-run low-order-bit drift from partition order. Use for
      production training where a ±1 ulp centroid wobble is
      irrelevant; use "exact" wherever a downstream oracle or golden
      file replays the centroids.

    Each round MATERIALIZES the k-row centroid frame (driver collect,
    re-sorted by id, rebuilt as a literal frame — the same linear-plan
    discipline as ``_lloyd_refine_seeds``; beyond 4096 centroids it
    switches to ``localCheckpoint``, keeping the collect bounded)."""
    spark = vectors.sparkSession
    v = vectors.select(F.col(id_col), as_double(vec_col).alias("_v"))
    from pyspark.sql.window import Window
    cents = (v.orderBy(id_col).limit(k)
             .select((F.row_number().over(Window.orderBy(id_col)) - 1)
                     .alias("centroid_id"), F.col("_v").alias("embedding")))
    vv = v.select(id_col, F.col("_v").alias(vec_col))
    for _ in range(max(0, iters)):
        assigned = ivf_assign(vv, cents, id_col=id_col, vec_col=vec_col,
                              n_centroids=k, coarse_probe=coarse_probe)
        exploded = (vv.join(assigned, id_col)
                    .select("centroid_id", F.col(id_col).alias("_id"),
                            F.posexplode(vec_col)))
        if mean_mode == "exact":
            mean_col = (F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_id", "col"))),
                    lambda s: s["col"]),
                F.lit(0.0), lambda a, x: a + x) / F.count("*"))
        elif mean_mode == "fast":
            mean_col = F.avg("col")
        else:
            raise ValueError(f"unknown mean_mode {mean_mode!r}")
        means = (exploded.groupBy("centroid_id", "pos")
                 .agg(mean_col.alias("_m"))
                 .groupBy("centroid_id")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "_m"))),
                     lambda s: s["_m"]).alias("_new")))
        moved = (cents.join(means, "centroid_id", "left")
                 .select("centroid_id",
                         F.coalesce(F.col("_new"), F.col("embedding"))
                         .alias("embedding")))
        if k <= 4096:
            rows = sorted(moved.collect(), key=lambda r: r["centroid_id"])
            cents = spark.createDataFrame(rows, schema=moved.schema)
        else:
            cents = stabilize(moved)
    return cents


def ivf_search(vectors: DataFrame, centroids: DataFrame, query_id: int,
               k: int = 5, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score ONLY the query's cluster.

    The cluster restriction is an equi-join on ``centroid_id == qc``
    (1-row build side, broadcast) — Catalyst probes the hash table
    before any cosine is evaluated, so non-cluster rows are discarded
    at the join, not filtered after a full cross product. Over an
    on-disk index the same predicate becomes a partition-pruned scan
    (``ivf_search_index``) — at 100 TB a query touches one partition
    directory instead of the corpus."""
    assign = ivf_assign(vectors, centroids, id_col, vec_col)
    tagged = vectors.join(assign, id_col)
    qrow = tagged.filter(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("qv"), F.col("centroid_id").alias("qc"))
    return (
        tagged.join(F.broadcast(qrow), F.col("centroid_id") == F.col("qc"))
        .filter(F.col(id_col) != query_id)
        .select(id_col, F.col("centroid_id"),
                cosine(as_double(vec_col), F.col("qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_build_index(vectors: DataFrame, centroids: DataFrame, path: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    **assign_opts) -> None:
    """Materialize the IVF index: the corpus written partitioned by
    ``centroid_id``. This is the 100 TB layout — each cluster is its own
    partition directory, so a search's cluster filter prunes at the file
    listing (``PartitionFilters`` in the scan, zero non-cluster IO).
    ``assign_opts`` forward to ``ivf_assign`` (``flat_max_centroids``,
    ``coarse_probe`` — the cost/fidelity knobs of the two-level path)."""
    assign = ivf_assign(vectors, centroids, id_col, vec_col, **assign_opts)
    # Repartition ON the partition column before the partitioned write:
    # without it every upstream task writes a file into every cell dir
    # it holds rows for — tasks × cells files (measured: the 4.4k-cell
    # chunk index at the 100× soak exploded to ~280k four-row files and
    # a 143× read cost). Hash-clustering first puts each cell wholly in
    # one task, so the tree has exactly one file per cell directory.
    (vectors.join(assign, id_col).repartition(F.col("centroid_id"))
     .write.mode("overwrite").partitionBy("centroid_id").parquet(path))


def ivf_index_append(new_vectors: DataFrame, centroids: DataFrame, path: str,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     **assign_opts) -> None:
    """Grow the stored IVF index with a batch of new vectors: assign the
    BATCH (one broadcast scoring pass over the new rows only — the
    stored corpus is never re-read or re-assigned) and append into the
    existing ``centroid_id=`` partition directories as new files. Same
    cost profile as ``minhash_index_append``: O(batch), never a rewrite.
    Centroids must be the index's own (frozen) centroid set — appending
    under re-trained centroids would mis-partition the history; retrain
    = rebuild (``ivf_build_index``). ``assign_opts`` forward to
    ``ivf_assign``; pass the SAME values the build used, or a batch can
    be assigned under different coarse geometry than the stored rows."""
    assign = ivf_assign(new_vectors, centroids, id_col, vec_col,
                        **assign_opts)
    # same cells-per-task clustering as ivf_build_index: one new file
    # per touched cell per batch, not per upstream task
    (new_vectors.join(assign, id_col).repartition(F.col("centroid_id"))
     .write.mode("append").partitionBy("centroid_id").parquet(path))


def nearest_centroids(centroids: DataFrame, query_vec: list[float],
                      nprobe: int = 1, cid_col: str = "centroid_id") -> list[int]:
    """Top-``nprobe`` centroid ids for a query — query planning, not
    data processing. The ranking runs IN-PLAN (distance + TakeOrdered
    over the centroid frame, same ``round(l2sq, 9)`` + lowest-id
    tie-break as ``ivf_assign``); only the ``nprobe`` winning ids reach
    the driver, never the centroid set itself — at k = millions of
    centroids the old full-collect would be the first thing to die.
    Multi-probe is the standard IVF recall knob: scanning p clusters
    instead of 1 recovers neighbors that fell across a Voronoi
    boundary, at p× scan cost — still a partition-pruned fraction of
    the corpus."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    rows = (centroids
            .select(F.col(cid_col),
                    F.round(l2sq(as_double("embedding"), qv), 9).alias("_d"))
            .orderBy(F.asc("_d"), F.asc(cid_col))
            .limit(nprobe)
            .collect())
    return [r[cid_col] for r in rows]


def nearest_centroid(centroids: DataFrame, query_vec: list[float],
                     cid_col: str = "centroid_id") -> int:
    return nearest_centroids(centroids, query_vec, 1, cid_col)[0]


def ivf_search_index(spark, path: str, query_vec: list[float],
                     qc: int | list[int], query_id: int | None = None,
                     k: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """ANN top-k over a materialized IVF index: a literal
    ``centroid_id`` predicate on a centroid-partitioned layout →
    static partition pruning (verify with ``.explain``: the scan's
    PartitionFilters carries the literal; only the probed directories
    are read). ``qc`` may be a single cluster or a multi-probe list."""
    probes = [qc] if isinstance(qc, int) else list(qc)
    idx = spark.read.parquet(path).filter(F.col("centroid_id").isin(probes))
    if query_id is not None:
        idx = idx.filter(F.col(id_col) != query_id)
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        idx.select(id_col, F.col("centroid_id"),
                   cosine(as_double(vec_col), qv).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_search_index_inplan(spark, path: str, query_df: DataFrame,
                            centroids: DataFrame, k: int = 5,
                            nprobe: int = 1, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            single_query: bool = True,
                            pre_filter=None) -> DataFrame:
    """ANN top-k over a materialized IVF index with the query row
    resolved INSIDE the plan — no driver ``.head()``/``collect`` in the
    build path. The query's ``nprobe`` nearest clusters are ranked with
    the same rounded squared-L2 + lowest-id tie-break ``ivf_assign``
    uses, then the tiny probe frame is broadcast-joined against the
    centroid-partitioned index on the partition column: Spark's dynamic
    partition pruning rewrites that join into a runtime partition
    filter, so only the probed cluster directories are scanned (assert:
    ``dynamicpruning`` in the plan). Prefer this for registered /
    production queries; the literal-probe ``ivf_search_index`` remains
    for precomputed probe lists.

    ``pre_filter`` (Column or SQL string over the INDEX's columns) is
    the hybrid-search composition: a metadata predicate applied to the
    probed partitions BEFORE any cosine is scored. Because it sits
    directly on the index scan, simple predicates reach the parquet
    reader (``PushedFilters``) and compose with the partition pruning —
    the 100 TB filtered-ANN plan reads (probed clusters) ∩ (predicate
    row groups), never the corpus. Pre-filtering keeps the top-k EXACT
    over the filtered probed set (post-filtering an unfiltered k would
    silently under-fill under selective predicates — the classic
    hybrid-search recall bug).

    ``single_query=True`` (default) ENFORCES the one-query contract with
    ``query_df.limit(1)`` and keeps the global top-k tail — a
    TakeOrderedAndProject, which computes partial top-k per scan
    partition before the merge (the shape you want when one query probes
    a 100 TB cluster). ``single_query=False`` accepts a BATCH of query
    rows and ranks per query (``row_number`` over ``query_id``),
    returning k rows per query with a ``query_id`` column."""
    from pyspark.sql import Window

    if single_query:
        query_df = query_df.limit(1)
    # q has TWO consumers below (the probe-ranking cross join and the
    # post-ranking re-join). An unordered limit(1) — or any
    # non-deterministic query frame — could resolve to different rows
    # per evaluation, silently emptying the _qid equi-join; stabilize
    # pins one evaluation (session.stabilize, delta-sized frame).
    q = stabilize(query_df.select(F.col(id_col).alias("_qid"),
                                  as_double(vec_col).alias("_qv")))
    c = centroids.select(F.col("centroid_id").alias("_qc"),
                         as_double("embedding").alias("_ce"))
    # Broadcast the QUERY side (1 row / a small batch), not the centroid
    # frame: the centroid set scales with the corpus (k = n/250) and
    # broadcasting it dies first at 100 TB — the same asymptote the
    # two-level ivf_assign removes from the build path. With q
    # broadcast, centroids stream through executors and the probe
    # ranking shuffles only (qid, cid, d) triples into the per-query
    # window — k small rows, no embedding payload.
    scored = (c.crossJoin(F.broadcast(q))
              .withColumn("_d", F.round(l2sq(F.col("_qv"), F.col("_ce")), 9)))
    w = Window.partitionBy("_qid").orderBy(F.asc("_d"), F.asc("_qc"))
    ranked = (scored.select("_qid", "_qc", "_d")
              .withColumn("_r", F.row_number().over(w))
              .filter(F.col("_r") <= nprobe)
              .select("_qid", "_qc"))
    probes = ranked.join(F.broadcast(q), "_qid")\
        .select("_qid", "_qv", "_qc")
    idx = spark.read.parquet(path)
    if pre_filter is not None:
        pf = F.expr(pre_filter) if isinstance(pre_filter, str) else pre_filter
        idx = idx.filter(pf)
    joined = idx.join(
        F.broadcast(probes), (idx["centroid_id"] == probes["_qc"]) &
        (idx[id_col] != probes["_qid"]))
    if single_query:
        return (
            joined.select(id_col, "centroid_id",
                          cosine(as_double(vec_col), F.col("_qv")).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k)
        )
    scored_all = joined.select(
        F.col("_qid").alias("query_id"), F.col(id_col), F.col("centroid_id"),
        cosine(as_double(vec_col), F.col("_qv")).alias("cosine"))
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored_all.withColumn("_rk", F.row_number().over(wk))
            .filter(F.col("_rk") <= k).drop("_rk")
            .orderBy("query_id", F.desc("cosine"), F.asc(id_col)))


def _blas_block_pairs(blocked: DataFrame, threshold: float,
                      id_col: str) -> DataFrame:
    """In-block all-pairs cosine via per-block matrix multiplication
    (``applyInPandas`` → numpy/BLAS), EXACT with respect to the
    expression-level scorer: the engine-side filter is
    ``round(dot/(na*nb), 9) >= threshold`` where dot/norm are
    left-to-right folds, and this scorer reproduces that decision —
    and the emitted 9-dp cosine — bit-for-bit.

    Why it is exact: BLAS evaluates the same real-valued quantities
    with a different summation order, so its result c̃ differs from
    the fold's c by at most ~d·u (d=dim, u=2⁻⁵³; Cauchy-Schwarz bounds
    the cancellation term). The safety band eps is derived from the
    ACTUAL dimension of the block — max(1e-13, 4·d·u) — so the exact
    re-check band keeps tracking the error bound even at d≈1000+
    (ADVICE r16: a fixed 1e-13 is only safe for small d). Every pair
    whose c̃ lies within the band of a 1e-9 rounding grid line — the
    only pairs where BLAS could round differently — is RE-SCORED with
    a pure-Python left-to-right fold, which is the same sequence of
    IEEE-754 double operations the JVM fold performs (Python floats
    ARE IEEE doubles), then rounded with decimal ROUND_HALF_UP,
    matching Spark's BigDecimal HALF_UP round(). Borderline pairs are
    ~grid-width/tolerance ≈ 0.02% of candidates, so the exact path
    costs microseconds.

    Input contract, enforced loudly (ADVICE r16): every vector in a
    block must have the same dimension (ragged input would crash the
    matmul with an opaque numpy error) and a nonzero norm (cosine is
    undefined; the expression-level scorer raises ANSI divide-by-zero
    on the same input, so silently dropping NaN rows here would be a
    semantic divergence, not a cleanup).

    Why it is fast: the quadratic candidate grid becomes ONE dgemm per
    block (µs-per-thousand-candidates instead of ~µs-per-candidate
    through the interpreted higher-order-function fold), and skewed
    mega-blocks are a single dense matmul instead of a hot shuffle
    task. Row-blocked at 2048 rows so a mega-block's score matrix
    never exceeds ~2048·n·8 bytes in flight."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    # round9(c) >= threshold  <=>  c >= threshold - 0.5e-9 (HALF_UP)
    lo_true = threshold - 0.5e-9

    def round9(x: float) -> float:
        # Spark's round(double, 9) goes through Scala BigDecimal.decimal
        # = java BigDecimal(Double.toString(d)): it rounds the SHORTEST
        # decimal representation, not the exact binary expansion.
        # Python's repr() is the same shortest-roundtrip form, so
        # Decimal(repr(x)) — NOT Decimal(x) — reproduces the JVM value
        # (e.g. the double nearest 0.9899999995 must HALF_UP to 0.99,
        # though its exact expansion is 0.98999999949999996…).
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"),
                                               rounding=ROUND_HALF_UP))

    def exact_cos(a, b) -> float:
        s = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            s = s + x * y
            na = na + x * x
            nb = nb + y * y
        return s / (math.sqrt(na) * math.sqrt(nb))

    def score(pdf: pd.DataFrame):
        # Fully vectorized emission (r16 suite hardening): the first
        # cut appended per-pair Python objects — tens of millions of
        # interpreter ops and list reallocations per mega-cell, enough
        # heap churn to destabilize a long bench process. Per slab,
        # candidates are masked/emitted as numpy arrays; only the
        # borderline set (≈0.02%) drops to the exact per-pair fold.
        ids = pdf["_id"].to_numpy()
        if not len(ids):
            return pd.DataFrame({"v1": pd.Series(dtype="int64"),
                                 "v2": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        # Ragged detection rides the numpy conversion the scorer pays
        # anyway (VERDICT r17 #4: the first cut ran a Python-object
        # pdf["_v"].map(len) pass over every row of every block BEFORE
        # the vectorized path — ~2.4s of added floor at sf0.1): a
        # uniform block converts to a 2-D float64 array in one shot;
        # ragged input either raises (numpy >= 1.24) or lands as a 1-D
        # object array, and only THAT error path pays per-row lens for
        # the diagnostic.
        try:
            X = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
        except ValueError:
            X = None
        if X is None or X.ndim != 2:
            bad = sorted({int(len(v)) for v in pdf["_v"]})
            raise ValueError(
                f"blas scorer: ragged embedding dimensions {bad} within "
                f"one block — a uniform dimension is required (matmul is "
                f"undefined on ragged input; fix the upstream vectors)")
        d = X.shape[1]
        nrm = np.sqrt(np.einsum("ij,ij->i", X, X))
        if not np.all(nrm > 0.0):
            zid = ids[nrm == 0.0][:5].tolist()
            raise ArithmeticError(
                f"blas scorer: zero-norm embedding(s), e.g. ids {zid} — "
                f"cosine undefined; the expression scorer raises ANSI "
                f"divide-by-zero on the same input, so these rows are "
                f"refused, never silently dropped")
        # BLAS-vs-fold divergence tracks the ACTUAL dimension: ~d·u
        # accumulated error (u=2^-53); 4·d·u is a ≥4x margin over the
        # worst case and never below the small-d floor 1e-13. The
        # grid-proximity band lives on the 1e9-scaled axis, kept at 2x
        # the scaled eps (its legacy value 2e-4 for small d).
        eps = max(1e-13, 4.0 * d * 2.0 ** -53)
        band = max(2e-4, 2.0 * eps * 1e9)
        n = len(ids)
        col = np.arange(n)
        chunks = []
        for s0 in range(0, n, 2048):
            s1 = min(s0 + 2048, n)
            C = (X[s0:s1] @ X.T) / np.outer(nrm[s0:s1], nrm)
            # upper triangle (each unordered pair once) ∧ possibly-pass
            # (eps covers the BLAS-vs-fold divergence)
            mask = (C >= lo_true - eps) & (col[None, :]
                                           > (np.arange(s0, s1)[:, None]))
            ri, cj = np.nonzero(mask)
            if not len(ri):
                continue
            c = C[ri, cj]
            rg = ri + s0
            g = c * 1e9
            # borderline: membership within eps of the pass bound, or
            # value within BLAS error of a ROUNDING BOUNDARY — both the
            # 1e-9 grid lines AND the half-grid points (x.5 at the 9th
            # decimal, where HALF_UP and half-even diverge); 2g vs
            # rint(2g) tests both families at once. Re-decided by the
            # bit-exact fold.
            border = (np.abs(2.0 * g - np.rint(2.0 * g)) < band) \
                | (c < lo_true + eps)
            # non-boundary values: every rounding rule agrees, and the
            # scaled-multiply error cannot cross a grid line, so
            # np.round == Spark's shortest-repr HALF_UP here
            c9 = np.round(c, 9)
            keep = np.ones(len(c), dtype=bool)
            for k in np.nonzero(border)[0]:
                v = round9(exact_cos(X[rg[k]], X[cj[k]]))
                if v < threshold:
                    keep[k] = False
                else:
                    c9[k] = v
            ia, ib = ids[rg][keep], ids[cj][keep]
            chunks.append(pd.DataFrame({
                "v1": np.minimum(ia, ib), "v2": np.maximum(ia, ib),
                "cosine": c9[keep]}))
        if not chunks:
            return pd.DataFrame({"v1": pd.Series(dtype="int64"),
                                 "v2": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        return pd.concat(chunks, ignore_index=True)

    prepped = blocked.select(F.col("_blk"), F.col(id_col).alias("_id"),
                             F.col("_v"))
    return prepped.groupBy("_blk").applyInPandas(
        score, schema="v1 long, v2 long, cosine double")


def embedding_near_dup_pairs(vectors: DataFrame, block_col: str | None = None,
                             threshold: float = 0.3, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             centroids: DataFrame | None = None,
                             salt: int = 1,
                             collapse_identical: bool = False,
                             scorer: str = "grid") -> DataFrame:
    """Pairs (v1 < v2) within a block with cosine >= threshold.

    Blocking defaults to **IVF clusters** (``centroids`` required):
    geometry-derived blocks keep sizes bounded by cluster population
    regardless of payload skew — a payload label with n/5 rows is an
    O(n²/25) block, while k-means-style cells shrink as k grows. Pass
    ``block_col`` to override with a precomputed/payload block — in
    particular, a frame read from ``ivf_build_index``'s output already
    carries ``centroid_id`` as a column, so blocking costs ZERO extra
    passes (the preferred production path; recomputing the assignment
    here is a full corpus × centroids scoring pass per run).

    Norms are computed ONCE per row before the self-join (a per-pair
    ``cosine()`` would re-evaluate dot(a,a)/dot(b,b) per candidate —
    3× the array passes). ``sqrt(dot(x,x))`` is the identical IEEE
    expression either way, so results are bit-equal to the naive form.

    ``salt`` > 1 splits each block's candidate grid across that many
    tasks: the left side hashes into ``salt`` buckets, the right side
    replicates into every bucket, and the equi-key becomes
    (block, bucket) — the standard skew-salting shape. Use it when the
    BLOCK COUNT, not the row count, caps parallelism (a small corpus in
    few cells: per-pair scoring is interpreted HOF work at ~µs/pair, so
    one 1k-row block is seconds on one core). At scale the cell count
    n/250 already exceeds the cluster's cores — callers there leave
    salt=1 and pay zero replication. Pair output is identical for any
    salt (each (a,b) meets in exactly one bucket — a's).

    ``collapse_identical`` bounds the EXACT-replication degeneracy: a
    corpus full of literal re-posts (byte-identical content, hence
    byte-identical vectors) piles copies into the same cell, and the
    within-cell candidate grid goes quadratic in the replication
    factor. (NEAR-identical replication — e.g. the soak trees'
    word-suffixed copies, whose profiles correlate but differ
    byte-wise — is the ``scorer="blas"`` case instead; measured r16:
    collapse found ≲10% duplication there while the matmul scorer cut
    the 209M-candidate in-cell grid 10×.) The fix groups rows
    with byte-identical vectors per block (one window shuffle), runs
    the quadratic self-join over the DISTINCT representatives only,
    then expands each qualifying rep pair back to its member pairs with
    two broadcast joins (linear in the emitted pairs). EXACT by
    construction — cosine is a pure function of the two vectors, so
    every member pair inherits its rep pair's cosine bit-for-bit and
    the (v1 < v2) pair set is reproduced precisely (intra-group pairs
    score cosine(v, v) through the SAME expression; zero-norm vectors
    raise ANSI divide-by-zero identically in both paths, so the domain
    is unchanged too) — unlike a max-cell split or per-cell
    candidate cap, which silently drops cross-fragment pairs. Scoring
    cost becomes quadratic in distinct profiles per cell (the n/250
    sizing restores its guarantee); replication only ever pays the
    linear expansion. Off by default: deduplicated/isotropic corpora
    would pay the grouping shuffle for nothing.

    ``scorer``: ``"grid"`` (default) scores candidates through the
    expression-level join — whole plan stays declarative, Catalyst
    owns the physical strategy. ``"blas"`` routes the in-block
    scoring through one numpy/BLAS matmul per block
    (``_blas_block_pairs``) with an exact borderline re-check — the
    sanctioned only-where-built-ins-can't Pandas escape hatch: the
    per-candidate fold cost (interpreted HOF, ~10µs) is the scale
    bottleneck when blocks hold thousands of genuinely-near rows
    (the r15 sf10 multimodal mega-cell: 209M candidates), and dgemm
    evaluates the identical decision 100×+ cheaper. Same pair set and
    same 9-dp cosines by the argument in ``_blas_block_pairs``."""
    if scorer not in ("grid", "blas"):
        raise ValueError(f"embedding_near_dup_pairs: unknown scorer "
                         f"{scorer!r} (grid|blas)")
    if scorer == "blas" and collapse_identical:
        raise ValueError(
            "embedding_near_dup_pairs: collapse_identical composes with "
            "the grid scorer only — the BLAS scorer already amortizes "
            "replicated rows inside its per-block matmul")
    computed_assign = False
    if block_col is None:
        if centroids is None:
            raise ValueError("embedding_near_dup_pairs: pass centroids for "
                             "IVF-cluster blocking or an explicit block_col")
        assign = ivf_assign(vectors, centroids, id_col, vec_col)
        vectors = vectors.join(assign, id_col)
        block_col = "centroid_id"
        computed_assign = True
    v = vectors.select(F.col(id_col), F.col(block_col).alias("_blk"),
                       as_double(vec_col).alias("_v"))
    if scorer == "blas":
        return _blas_block_pairs(v, threshold, id_col)
    v = v.withColumn("_n", F.sqrt(dot(F.col("_v"), F.col("_v"))))
    if collapse_identical:
        from pyspark.sql import Window

        # One shuffle keyed on (block, vector): every row learns its
        # identical-vector group's representative (min id) and size.
        wg = Window.partitionBy("_blk", "_v")
        vg = stabilize(v.withColumn("_gid", F.min(id_col).over(wg))
                        .withColumn("_m", F.count("*").over(wg)))
        reps = vg.filter(F.col(id_col) == F.col("_gid")) \
                 .select("_gid", "_blk", "_v", "_n", "_m")
        memb = vg.select(F.col(id_col).alias("_mid"), "_gid")
        a, b = reps.alias("a"), reps.alias("b")
        # a._gid == b._gid is the intra-group pair — only meaningful
        # when the group has ≥2 members.
        pair_cond = (F.col("a._gid") < F.col("b._gid")) | (
            (F.col("a._gid") == F.col("b._gid")) & (F.col("a._m") > 1))
        if salt > 1:
            buckets = vectors.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("_bkt"))
            a = reps.withColumn(
                "_bkt", F.pmod(F.hash(F.col("_gid")), F.lit(salt))
                .cast("int")).alias("a")
            b = reps.crossJoin(F.broadcast(buckets)).alias("b")
            pair_cond = pair_cond & (F.col("a._bkt") == F.col("b._bkt"))
        cos = F.round(dot(F.col("a._v"), F.col("b._v"))
                      / (F.col("a._n") * F.col("b._n")), 9)
        rp = (a.join(b, (F.col("a._blk") == F.col("b._blk")) & pair_cond)
              .select(F.col("a._gid").alias("_ga"),
                      F.col("b._gid").alias("_gb"), cos.alias("cosine"))
              .filter(F.col("cosine") >= threshold))
        # Expansion: every member pair of a qualifying rep pair shares
        # its cosine exactly. Rep pairs are few (distinct-profile scale)
        # → broadcast; the two joins are map-side over the corpus.
        ma = memb.alias("ma")
        mb = memb.select(F.col("_mid").alias("_mid2"),
                         F.col("_gid").alias("_gid2")).alias("mb")
        return (F.broadcast(rp)
                .join(ma, F.col("ma._gid") == F.col("_ga"))
                .join(mb, F.col("mb._gid2") == F.col("_gb"))
                .filter((F.col("_ga") < F.col("_gb"))
                        | (F.col("_mid") < F.col("_mid2")))
                .select(F.least("_mid", "_mid2").alias("v1"),
                        F.greatest("_mid", "_mid2").alias("v2"),
                        F.col("cosine")))
    if computed_assign:
        # Both self-join sides embed the ivf_assign scoring pass —
        # materialize it once instead of running it twice. With a
        # caller-provided block column the duplicated sub-plan is just a
        # scan + cheap projections: re-reading beats materializing the
        # whole corpus in executor block storage (and keeps the lineage
        # recomputable on executor loss). Strategy per
        # spark.sds.stabilize.mode (session.stabilize).
        v = stabilize(v)
    if salt > 1:
        buckets = vectors.sparkSession.range(salt).select(
            F.col("id").cast("int").alias("_bkt"))
        a = v.withColumn(
            "_bkt", F.pmod(F.hash(F.col(id_col)), F.lit(salt)).cast("int")
        ).alias("a")
        b = v.crossJoin(F.broadcast(buckets)).alias("b")
        on = ((F.col("a._blk") == F.col("b._blk")) &
              (F.col("a._bkt") == F.col("b._bkt")) &
              (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    else:
        a, b = v.alias("a"), v.alias("b")
        on = ((F.col("a._blk") == F.col("b._blk")) &
              (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    cos = F.round(dot(F.col("a._v"), F.col("b._v"))
                  / (F.col("a._n") * F.col("b._n")), 9)
    return (
        a.join(b, on)
        .select(F.col(f"a.{id_col}").alias("v1"), F.col(f"b.{id_col}").alias("v2"),
                cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def quantize_int8(vectors: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization — the 4× (vs float32)
    index-compression step production ANN systems apply before scale-out
    (a 100 TB float corpus becomes 25 TB of int8 + one scale per
    vector). ``q[i] = floor(x[i] * 127 / amax + 0.5)`` with
    ``amax = max|x|``; ``floor(v + 0.5)`` instead of round() because the
    two engines' round() half-rule differs (HALF_UP vs half-even) while
    floor is identical — the oracle twin must quantize bit-equally.

    Cosine over quantized vectors needs NO dequantization: the
    per-vector scale divides out of the cosine, so ``cosine(q_a, q_b)``
    IS the quantized-space similarity (dot products run on small ints).
    Reconstruction ``x̂ = q * amax / 127`` serves the error metric.

    Pure codegen map (transform/aggregate over the array column): no
    shuffle, no Python. Returns (id, q  int array, amax double).
    """
    v = as_double(vec_col)
    amax_raw = F.array_max(F.transform(v, lambda x: F.abs(x)))
    amax = F.when(amax_raw == 0, F.lit(1.0)).otherwise(amax_raw)
    q = F.transform(v, lambda x: F.floor(x * 127.0 / amax + F.lit(0.5))
                    .cast("int"))
    return vectors.select(F.col(id_col), q.alias("q"), amax.alias("amax"))
