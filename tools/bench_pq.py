"""Measure the product-quantization trade: compression vs
reconstruction error vs ADC search recall, lowid vs kmeans codebooks.

Corpora are the fidelity harness's generators (dim 64): hash-uniform
(worst case) and the 80-center clustered mixture (realistic embedding
shape). m=8 subspaces × ks=256 codewords → 8 one-byte codes per vector
vs 64 float32s = **32× compression**. Recall@10 = overlap of the ADC
top-10 (scored from codes only) with the exact float top-10, averaged
over 50 queries. Results committed in BENCH_NOTES («r8: product
quantization — compression vs recall»).

Usage: python tools/bench_pq.py [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_twolevel import _corpus  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from slowly_changing_dimensions_data_engineering_spark.operators.pq import (
        pq_adc_topk_batch, pq_codebooks, pq_encode,
    )
    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import l2sq
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    m, ks, dim, n_queries = 8, 256, 64, 50

    spark = get_spark("sds-pq-bench")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"n={n} dim={dim} m={m} ks={ks} "
          f"({dim * 4}B float32 -> {m}B codes = {dim * 4 // m}x); "
          f"recall@10 over {n_queries} queries")
    print(f"{'corpus':10s} {'cbooks':8s} {'train_s':>7s} {'mse':>8s} {'r@10':>6s} {'rr100':>6s}")
    for kind in ("uniform", "clustered"):
        vecs = _corpus(spark, kind, n, dim).cache()
        vecs.count()
        qids = [r["vec_id"] for r in
                vecs.filter(F.col("vec_id") % 401 == 0)
                    .limit(n_queries).collect()]
        # exact float top-10 per query, one pass
        qdf = vecs.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        w = Window.partitionBy("qid").orderBy("d", "vec_id")
        truth = (vecs.crossJoin(F.broadcast(qdf))
                 .filter(F.col("vec_id") != F.col("qid"))
                 .select("qid", "vec_id",
                         F.round(l2sq(F.col("embedding"), F.col("qv")), 9)
                         .alias("d"))
                 .withColumn("rk", F.row_number().over(w)).filter("rk <= 10"))
        truth_sets = {}
        for r in truth.collect():
            truth_sets.setdefault(r["qid"], set()).add(r["vec_id"])

        for mode in ("lowid", "kmeans"):
            t0 = time.time()
            cb = pq_codebooks(vecs, m, ks, dim, mode=mode, iters=5)
            if mode == "kmeans":
                cb = cb.cache()
                cb.count()
            train_s = time.time() - t0
            codes = pq_encode(vecs, cb, m, dim).cache()
            from slowly_changing_dimensions_data_engineering_spark.operators.pq import pq_reconstruct
            mse = (pq_reconstruct(codes, cb)
                   .withColumnRenamed("embedding", "rv")
                   .join(vecs, "vec_id")
                   .agg(F.avg(l2sq(F.col("rv"), F.col("embedding"))))
                   .head()[0])
            top = pq_adc_topk_batch(
                codes, cb, qdf.withColumnRenamed("qid", "q_id"),
                m, dim, k=101, qid_col="q_id", qvec_col="qv").cache()
            rows_by_q: dict[int, list] = {}
            for r in top.collect():
                rows_by_q.setdefault(r["q_id"], []).append(
                    (r["adc_d"], r["vec_id"]))
            hits = 0
            for qid, rs in rows_by_q.items():
                rs.sort()
                got = [vid for _, vid in rs if vid != qid][:10]
                hits += len(set(got) & truth_sets.get(qid, set()))
            # the production pattern: ADC top-100 SHORTLIST, exact
            # re-rank on the floats of just those rows (0.5% of corpus)
            rr = (top.withColumnRenamed("q_id", "qid")
                  .join(vecs, "vec_id").join(qdf, "qid")
                  .filter(F.col("vec_id") != F.col("qid"))
                  .select("qid", "vec_id",
                          F.round(l2sq(F.col("embedding"), F.col("qv")), 9)
                          .alias("d"))
                  .withColumn("rk", F.row_number().over(w))
                  .filter("rk <= 10"))
            rr_hits = sum(
                1 for r in rr.collect()
                if r["vec_id"] in truth_sets.get(r["qid"], set()))
            top.unpersist()
            print(f"{kind:10s} {mode:8s} {train_s:7.1f} {mse:8.4f} "
                  f"{hits / (10 * len(qids)):6.3f} "
                  f"{rr_hits / (10 * len(qids)):6.3f}")
            codes.unpersist()
        vecs.unpersist()




def residual_vs_raw() -> None:
    """`--residual`: does residual encoding (codes quantize v − cell
    centroid) beat raw encoding at the same m×ks budget? Answer: only
    when the centroids FIT the data. On the clustered corpus with
    kmeans-trained cells, residuals collapse the encoder's input spread
    and MSE/recall improve; on the isotropic-uniform corpus the
    residual v − c is the difference of two near-independent vectors —
    LARGER spread than v itself — and residual encoding hurts (also
    measured on the driver's hash-uniform embeddings: raw 0.76 vs
    residual 1.16 MSE). Engine guidance: default raw; switch to
    residual when the IVF centroids are trained on clustered data."""
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from slowly_changing_dimensions_data_engineering_spark.operators.pq import (
        ivfpq_build_index, ivfpq_build_index_residual, ivfpq_search,
        ivfpq_search_residual, pq_codebooks, residual_frame,
    )
    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        kmeans_fit, l2sq,
    )
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    n, kcells, m, ks, dim, n_queries, nprobe = 20_000, 64, 8, 256, 64, 20, 4
    spark = get_spark("sds-pq-residual")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"n={n} cells={kcells} m={m} ks={ks} nprobe={nprobe}; "
          f"rr100 = recall@10 after exact re-rank of the ADC top-100, "
          f"{n_queries} queries; centroids = kmeans_fit(k={kcells})")
    print(f"{'corpus':10s} {'scheme':9s} {'mse':>8s} {'rr100':>6s}")
    for kind in ("uniform", "clustered"):
        vecs = _corpus(spark, kind, n, dim).cache()
        vecs.count()
        cents = kmeans_fit(vecs, k=kcells, iters=5, mean_mode="fast").cache()
        cents.count()
        qids = [r["vec_id"] for r in
                vecs.filter(F.col("vec_id") % 997 == 3)
                    .limit(n_queries).collect()]
        qdf = vecs.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        w = Window.partitionBy("qid").orderBy("d", "vec_id")
        truth_sets: dict[int, set] = {}
        for r in (vecs.crossJoin(F.broadcast(qdf))
                  .filter(F.col("vec_id") != F.col("qid"))
                  .select("qid", "vec_id",
                          F.round(l2sq(F.col("embedding"), F.col("qv")), 9)
                          .alias("d"))
                  .withColumn("rk", F.row_number().over(w))
                  .filter("rk <= 10").collect()):
            truth_sets.setdefault(r["qid"], set()).add(r["vec_id"])

        res = residual_frame(vecs, cents, n_centroids=kcells).cache()
        for scheme in ("raw", "residual"):
            src = vecs if scheme == "raw" else res
            cb = pq_codebooks(src, m, ks, dim)
            from slowly_changing_dimensions_data_engineering_spark.operators.pq import (
                pq_encode, pq_reconstruct,
            )
            mse = (pq_reconstruct(pq_encode(src, cb, m, dim), cb)
                   .withColumnRenamed("embedding", "rv")
                   .join(src.select(
                       "vec_id",
                       F.transform("embedding",
                                   lambda x: x.cast("double")).alias("ve")),
                       "vec_id")
                   .agg(F.avg(l2sq(F.col("rv"), F.col("ve")))).head()[0])
            path = tempfile.mkdtemp(prefix="sds_pqres_") + "/idx"
            if scheme == "raw":
                ivfpq_build_index(vecs, cents, cb, path, m, dim,
                                  n_centroids=kcells)
            else:
                ivfpq_build_index_residual(vecs, cents, cb, path, m, dim,
                                           n_centroids=kcells)
            hits = 0
            for qid in qids:
                q = vecs.filter(F.col("vec_id") == qid).orderBy("vec_id").limit(1)
                fn = ivfpq_search if scheme == "raw" else ivfpq_search_residual
                top = fn(spark, path, cb, cents, q, m, dim, k=10,
                         nprobe=nprobe, shortlist=100, rerank_vectors=vecs)
                got = {r["vec_id"] for r in top.collect()}
                hits += len(got & truth_sets.get(qid, set()))
            print(f"{kind:10s} {scheme:9s} {mse:8.4f} "
                  f"{hits / (10 * n_queries):6.3f}")
        res.unpersist(); cents.unpersist(); vecs.unpersist()


def perm_trade(n: int = 20_000) -> None:
    """`--perm`: what does the OPQ-lite variance-balanced dimension
    permutation (pq_balanced_permutation — the OPQ paper's structured
    eigenvalue-allocation baseline) buy, at the same m×ks budget?
    Corpora: `aniso` = the clustered mixture with an exponentially
    decaying per-dim scale (0.93^d, ~100× energy range — the shape of
    real embedding spectra, and the case PQ's equal-budget-per-subspace
    assumption gets wrong under natural contiguous ordering); `clustered`
    = the isotropic control, where per-dim variances are already equal
    and the permutation should be ~a no-op. MSE over the corpus; rr100 =
    recall@10 after exact re-rank of the ADC top-100 (permutation-
    invariant truth: L2 is preserved under coordinate permutation).
    Results committed in BENCH_NOTES «r9: OPQ-lite balanced
    permutation»."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from slowly_changing_dimensions_data_engineering_spark.operators.pq import (
        apply_dim_permutation, pq_adc_topk_batch, pq_balanced_permutation,
        pq_codebooks, pq_encode, pq_reconstruct,
    )
    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import l2sq
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    m, ks, dim, n_queries = 8, 256, 64, 50
    spark = get_spark("sds-pq-perm")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"n={n} dim={dim} m={m} ks={ks}; recall@10 re-ranked from ADC "
          f"top-100, {n_queries} queries")
    print(f"{'corpus':10s} {'cbooks':8s} {'order':9s} {'mse':>9s} {'rr100':>6s}")
    for kind in ("clustered", "aniso"):
        base = _corpus(spark, "clustered", n, dim)
        if kind == "aniso":
            base = base.withColumn(
                "embedding",
                F.transform(F.col("embedding"),
                            lambda x, i: x * F.pow(F.lit(0.93), i)))
        vecs = base.cache(); vecs.count()
        qids = [r["vec_id"] for r in
                vecs.filter(F.col("vec_id") % 401 == 0)
                    .limit(n_queries).collect()]
        qdf = vecs.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        w = Window.partitionBy("qid").orderBy("d", "vec_id")
        truth = (vecs.crossJoin(F.broadcast(qdf))
                 .filter(F.col("vec_id") != F.col("qid"))
                 .select("qid", "vec_id",
                         F.round(l2sq(F.col("embedding"), F.col("qv")), 9)
                         .alias("d"))
                 .withColumn("rk", F.row_number().over(w)).filter("rk <= 10"))
        truth_sets: dict[int, set] = {}
        for r in truth.collect():
            truth_sets.setdefault(r["qid"], set()).add(r["vec_id"])
        perm = pq_balanced_permutation(vecs, m, dim)
        for mode in ("lowid", "kmeans"):
            for order, frame in (("natural", vecs),
                                 ("balanced",
                                  apply_dim_permutation(vecs, perm))):
                cb = pq_codebooks(frame, m, ks, dim, mode=mode, iters=3)
                if mode == "kmeans":
                    cb = cb.cache(); cb.count()
                codes = pq_encode(frame, cb, m, dim).cache()
                mse = (pq_reconstruct(codes, cb)
                       .withColumnRenamed("embedding", "rv")
                       .join(frame.withColumnRenamed("embedding", "ov"),
                             "vec_id")
                       .agg(F.avg(l2sq(F.col("rv"), F.col("ov"))))
                       .head()[0])
                qp = (apply_dim_permutation(
                          qdf.withColumnRenamed("qv", "embedding"), perm,
                          "embedding")
                      .withColumnRenamed("embedding", "qv")
                      if order == "balanced" else qdf)
                top = pq_adc_topk_batch(
                    codes, cb, qp.withColumnRenamed("qid", "q_id"),
                    m, dim, k=101, qid_col="q_id", qvec_col="qv").cache()
                rr = (top.withColumnRenamed("q_id", "qid")
                      .join(vecs, "vec_id").join(qdf, "qid")
                      .filter(F.col("vec_id") != F.col("qid"))
                      .select("qid", "vec_id",
                              F.round(l2sq(F.col("embedding"),
                                           F.col("qv")), 9).alias("d"))
                      .withColumn("rk", F.row_number().over(w))
                      .filter("rk <= 10"))
                rr_hits = sum(
                    1 for r in rr.collect()
                    if r["vec_id"] in truth_sets.get(r["qid"], set()))
                print(f"{kind:10s} {mode:8s} {order:9s} {mse:9.5f} "
                      f"{rr_hits / (10 * len(qids)):6.3f}")
                top.unpersist(); codes.unpersist()
        vecs.unpersist()


def perm_residual(n: int = 20_000) -> None:
    """`--perm-residual`: does the OPQ-lite balanced permutation still
    pay once the index is RESIDUAL? (r8 finding: residual encoding wins
    when the cells are kmeans-trained on clustered data; r9 finding:
    the permutation wins when the spectrum is anisotropic.) The
    composition is not obvious: residualization subtracts a
    same-spectrum centroid, so per-dimension variance KEEPS the
    anisotropic decay and the permutation's equal-energy subspace
    allocation should survive — but the residual spread is smaller, so
    the relative win may shrink. This measures the full 2×2
    (raw/residual × natural/balanced) on the aniso clustered mixture
    (0.93^d decay) with kmeans_fit(k=64) cells, trained in the
    permuted space for the balanced rows (L2 is permutation-invariant,
    so cell quality and the ground-truth top-10 are identical across
    orders; only the subspace split changes). Results committed in
    BENCH_NOTES «r11: OPQ-lite × residual IVF-PQ composition»."""
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from slowly_changing_dimensions_data_engineering_spark.operators.pq import (
        apply_dim_permutation, ivfpq_build_index,
        ivfpq_build_index_residual, ivfpq_search, ivfpq_search_residual,
        pq_balanced_permutation, pq_codebooks, pq_encode, pq_reconstruct,
        residual_frame,
    )
    from slowly_changing_dimensions_data_engineering_spark.operators.similarity import (
        kmeans_fit, l2sq,
    )
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    kcells, m, ks, dim, n_queries, nprobe = 64, 8, 256, 64, 20, 4
    spark = get_spark("sds-pq-permres")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"n={n} cells={kcells} m={m} ks={ks} nprobe={nprobe}; aniso "
          f"corpus (0.93^d); rr100 = recall@10 after exact re-rank of "
          f"the ADC top-100, {n_queries} queries")
    print(f"{'order':9s} {'scheme':9s} {'mse':>9s} {'rr100':>6s}")

    base = (_corpus(spark, "clustered", n, dim)
            .withColumn("embedding",
                        F.transform(F.col("embedding"),
                                    lambda x, i: x * F.pow(F.lit(0.93), i)))
            .cache())
    base.count()
    qids = [r["vec_id"] for r in
            base.filter(F.col("vec_id") % 997 == 3)
                .limit(n_queries).collect()]
    # ground truth in the original order — L2 is permutation-invariant,
    # so the same truth serves both orders
    qdf0 = base.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    w = Window.partitionBy("qid").orderBy("d", "vec_id")
    truth_sets: dict[int, set] = {}
    for r in (base.crossJoin(F.broadcast(qdf0))
              .filter(F.col("vec_id") != F.col("qid"))
              .select("qid", "vec_id",
                      F.round(l2sq(F.col("embedding"), F.col("qv")), 9)
                      .alias("d"))
              .withColumn("rk", F.row_number().over(w))
              .filter("rk <= 10").collect()):
        truth_sets.setdefault(r["qid"], set()).add(r["vec_id"])

    perm = pq_balanced_permutation(base, m, dim)
    for order in ("natural", "balanced"):
        vecs = (base if order == "natural"
                else apply_dim_permutation(base, perm).cache())
        vecs.count()
        cents = kmeans_fit(vecs, k=kcells, iters=5,
                           mean_mode="fast").cache()
        cents.count()
        res = residual_frame(vecs, cents, n_centroids=kcells).cache()
        for scheme in ("raw", "residual"):
            src = vecs if scheme == "raw" else res
            cb = pq_codebooks(src, m, ks, dim)
            mse = (pq_reconstruct(pq_encode(src, cb, m, dim), cb)
                   .withColumnRenamed("embedding", "rv")
                   .join(src.select(
                       "vec_id",
                       F.transform("embedding",
                                   lambda x: x.cast("double")).alias("ve")),
                       "vec_id")
                   .agg(F.avg(l2sq(F.col("rv"), F.col("ve")))).head()[0])
            path = tempfile.mkdtemp(prefix="sds_pqpr_") + "/idx"
            build = (ivfpq_build_index if scheme == "raw"
                     else ivfpq_build_index_residual)
            build(vecs, cents, cb, path, m, dim, n_centroids=kcells)
            fn = ivfpq_search if scheme == "raw" else ivfpq_search_residual
            hits = 0
            for qid in qids:
                q = (vecs.filter(F.col("vec_id") == qid)
                     .orderBy("vec_id").limit(1))
                top = fn(spark, path, cb, cents, q, m, dim, k=10,
                         nprobe=nprobe, shortlist=100,
                         rerank_vectors=vecs)
                got = {r["vec_id"] for r in top.collect()}
                hits += len(got & truth_sets.get(qid, set()))
            print(f"{order:9s} {scheme:9s} {mse:9.5f} "
                  f"{hits / (10 * n_queries):6.3f}")
        res.unpersist()
        cents.unpersist()
        if vecs is not base:
            vecs.unpersist()
    base.unpersist()


if __name__ == "__main__":
    _KNOWN = {"--residual", "--perm-residual", "--permres", "--perm"}
    unknown = [a for a in sys.argv[1:] if a.startswith("--")
               and a not in _KNOWN]
    if unknown:  # never fall through to the wrong benchmark silently
        raise SystemExit(f"bench_pq: unknown flag(s) {unknown}; "
                         f"known: {sorted(_KNOWN)}")
    if "--residual" in sys.argv:
        residual_vs_raw()
    elif "--perm-residual" in sys.argv or "--permres" in sys.argv:
        perm_residual()
    elif "--perm" in sys.argv:
        perm_trade()
    else:
        main()
