"""Distributed quality-classifier TRAINING — batch-gradient logistic
regression over an embedding column, the fitting loop behind
``classifier_quality_scores``'s inference-only linear probe (the
FineWeb-Edu pattern trains exactly this probe on teacher labels before
scoring the corpus with it).

No reference parity: the reference pipeline (SCD-Configuration
Setup.sql / SCD-Automation.sql) has no model-fitting surface; this is
engine capability its users gain for LLM-data curation.

Algorithm (full-batch gradient descent on mean log-loss):

    p_i   = sigmoid(w · x_i + b)          rounded to 9 decimals
    g_d   = Σ_i (p_i − y_i) · x_{i,d}     ordered fold over rows
    w_d  ← round(w_d − lr·g_d/n, 12)      (bias = an extra dimension)

Spark shape per round — the ``kmeans_fit`` / ``bpe_train`` bounded
iteration discipline:

- ONE codegen scoring pass over the corpus (the dot product is a
  ``zip_with``+``aggregate`` fold, the sigmoid plain arithmetic — no
  Python anywhere), materialized once via ``stabilize`` because two
  aggregates consume it;
- ONE global aggregate for the round metrics (decimal-exact mean
  log-loss, teacher-agreement count);
- ONE ``posexplode`` + per-dimension aggregate for the gradient, the
  updated weights computed IN the aggregate projection (so the
  round-half-up semantics live engine-side), then a ``dim+1``-row
  driver collect rebuilds the weight literal for the next round — the
  exact bounded-collect convention of ``kmeans_fit`` (similarity.py)
  and ``bpe_train`` (text.py); nothing corpus-sized ever reaches the
  driver.

At 100 TB the per-round cost is one corpus scan plus one shuffle of
(n·dim) values in ``sum_mode="exact"`` — or only k·dim map-side
partials in ``sum_mode="fast"`` — against a model of dim+1 floats; R
bounded rounds total. The trained weights then score the corpus as
pure whole-stage-codegen arithmetic (classifier_quality_scores).

Cross-engine determinism (why an oracle can replay every round):

- dot products and gradient sums are ORDERED sequential folds
  (``F.aggregate`` over a sorted ``collect_list``), bit-identical to
  DuckDB's ``list_reduce(list(v ORDER BY id), +)`` — the
  ``kmeans_fit`` "exact" finding: decimal accumulators are NOT
  cross-engine-stable on float32-derived doubles, ordered folds are;
- the only libm calls (exp in the sigmoid, ln in the loss) are
  immediately rounded to 9 decimals, the registry's lm_quality_scores
  convention;
- weight updates round to 12 decimals with both engines' HALF_UP, so
  per-round state is exactly a 12-decimal double on both sides.

``sum_mode="fast"`` swaps every ordered fold for a plain ``sum`` —
map-side partial aggregation, the production path; low-order-bit drift
per round is irrelevant when no oracle replays the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..session import stabilize
from .similarity import as_double

#: Clamp for ln() in the log-loss: round-9 can land p exactly on 0/1.
_EPS = 1e-9


def _ordered_fold(id_col: str, val: Column) -> Column:
    """Sequential left fold of ``val`` in ascending ``id_col`` order —
    deterministic under any partitioning and bit-identical to DuckDB's
    ``list_reduce(list(val ORDER BY id), (a,b) -> a+b)``."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(id_col), val.alias("v")))),
            lambda s: s["v"]),
        F.lit(0.0), lambda acc, x: acc + x)


def logreg_fit(vectors: DataFrame, label: Column, rounds: int = 5,
               lr: float = 2.0, id_col: str = "vec_id",
               vec_col: str = "embedding",
               sum_mode: str = "exact",
               sample_fraction: float | None = None,
               seed: int = 41) -> tuple[DataFrame, DataFrame]:
    """Fit a logistic-regression probe on ``vectors`` (id, vec_col)
    against the 0/1 ``label`` column expression.

    Returns ``(weights, metrics)``:

    - ``weights``: (round, dim, weight) for every round 1..R — the full
      training trajectory, dim −1 being the bias (so an oracle checks
      every update, not just the final state);
    - ``metrics``: (round, log_loss, n_correct) for rounds 0..R, each
      evaluated UNDER that round's weights — round 0 is the zero-weight
      baseline (log_loss = ln 2), round R the trained probe; gradient
      descent on the convex mean log-loss with lr below 2/L makes the
      sequence non-increasing (property-tested).

    Both are dictionary-sized frames built from bounded per-round
    collects (≤ dim+1 rows per round), like ``kmeans_fit``'s centroid
    frame.

    ``sample_fraction`` enables MINI-BATCH (sampled-gradient) rounds —
    the production-scale variant: each round's gradient is computed on
    an independent Bernoulli sample of the scored corpus and
    normalized by the ACTUAL sample size, so at 100 TB a round
    shuffles only fraction·n·dim values instead of the full corpus.
    Metrics stay full-corpus (the loss trajectory is still evaluated
    exactly). The per-round draw is the repo's DETERMINISTIC
    md5-Bernoulli rule (weighted_sample_docs convention): keep row iff
    the first 24 bits of ``md5('{seed}:{round}:' || id)`` scaled to
    [0,1) fall under ``fraction`` — a pure codegen filter with three
    consequences: (a) any engine draws the identical sample, so the
    sampled trajectory is chained-CTE-oracle-replayable exactly like
    full batch; (b) the two gradient aggregates (per-dim + bias) scan
    the filter independently yet can never diverge, under ANY
    ``spark.sds.stabilize.mode``, because membership is a pure
    function of (seed, round, id) — and each branch carries its OWN
    ``count(*)`` normalizer anyway (r11 ADVICE); (c) re-runs are
    reproducible without RNG state. Sampled descent is stochastic —
    per-round loss is only non-increasing in expectation; convergence
    is property-tested (tests/test_llm_ops.py) and the registered
    instance is driver-oracle-checked (classifier_train_minibatch)."""
    if sum_mode not in ("exact", "fast"):
        raise ValueError(f"unknown sum_mode {sum_mode!r}")
    if sample_fraction is not None and not (0.0 < sample_fraction <= 1.0):
        raise ValueError(f"sample_fraction must be in (0, 1], "
                         f"got {sample_fraction!r}")
    spark = vectors.sparkSession

    v = stabilize(vectors.select(
        F.col(id_col).alias("_id"), as_double(vec_col).alias("_x"),
        label.cast("double").alias("_y")))
    # One bounded-scalar aggregate: corpus row count + the vector-width
    # envelope. Ragged widths would make the zip_with dot product
    # null-pad and silently drop rows from the metrics/gradient
    # aggregates — fail loudly instead (r10 ADVICE).
    shape = v.agg(F.count("*").alias("n"),
                  F.min(F.size("_x")).alias("dmin"),
                  F.max(F.size("_x")).alias("dmax")).collect()[0]
    n = int(shape["n"])  # bounded driver scalar (the corpus row count)
    if n == 0:
        raise ValueError("logreg_fit: empty input")
    if shape["dmin"] != shape["dmax"]:
        raise ValueError(
            f"logreg_fit: ragged {vec_col!r} widths "
            f"(min {shape['dmin']}, max {shape['dmax']}) — all vectors "
            "must share one dimension")
    dim = int(shape["dmax"])

    def fold(val: Column) -> Column:
        return _ordered_fold("_id", val) if sum_mode == "exact" \
            else F.sum(val)

    w = [0.0] * dim
    b = 0.0
    weight_rows: list[tuple[int, int, float]] = []
    metric_rows: list[tuple[int, float, int]] = []

    for r in range(rounds + 1):
        wlit = F.array(*[F.lit(x) for x in w])
        z = F.aggregate(F.zip_with("_x", wlit, lambda a, c: a * c),
                        F.lit(0.0), lambda acc, x: acc + x) + F.lit(b)
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
        scored = stabilize(v.select("_id", "_y", "_x", p.alias("_p")))

        # round metrics under the CURRENT weights: decimal-exact mean
        # of round-9 per-row log-loss terms + teacher-agreement count
        pc = F.least(F.greatest(F.col("_p"), F.lit(_EPS)),
                     F.lit(1.0 - _EPS))
        term = F.round(-(F.col("_y") * F.log(pc)
                         + (F.lit(1.0) - F.col("_y"))
                         * F.log(F.lit(1.0) - pc)), 9)
        agree = ((F.col("_p") >= 0.5) == (F.col("_y") == 1.0))
        mrow = scored.agg(
            F.round(F.sum(term.cast("decimal(38,12)")).cast("double")
                    / F.lit(float(n)), 6).alias("log_loss"),
            F.sum(agree.cast("long")).alias("n_correct")).collect()[0]
        metric_rows.append((r, float(mrow["log_loss"]),
                            int(mrow["n_correct"])))
        if r == rounds:
            break

        if sample_fraction is not None:
            # mini-batch round: gradient over an independent
            # DETERMINISTIC md5-Bernoulli sample, the updated weight
            # computed IN each aggregate projection normalized by that
            # branch's own count(*) — the actual sample size, which
            # every per-dim group shares (each sampled row contributes
            # every dimension). An empty sample leaves the weights
            # unchanged this round (per-dim rows vanish -> keep old;
            # the bias guard is explicit).
            u = (F.conv(F.substring(F.md5(F.concat_ws(
                    ":", F.lit(str(seed)), F.lit(str(r)),
                    F.col("_id").cast("string"))), 1, 6),
                        16, 10).cast("long") / F.lit(16777216.0))
            ed = (scored
                  .filter(u < F.lit(sample_fraction))
                  .select("_id", (F.col("_p") - F.col("_y")).alias("_e"),
                          "_x"))
            ex = ed.select("_id", "_e", F.posexplode("_x"))
            lrn = F.lit(lr)
            rows = (ex.groupBy("pos")
                    .agg(F.round(F.get(wlit, F.col("pos")) - lrn
                                 * fold(F.col("_e") * F.col("col"))
                                 / F.count("*").cast("double"), 12)
                         .alias("w"))
                    .unionAll(ed.agg(
                        F.lit(-1).alias("pos"),
                        F.when(F.count("*") > 0,
                               F.round(F.lit(b) - lrn * fold(F.col("_e"))
                                       / F.count("*").cast("double"), 12))
                        .otherwise(F.lit(b)).alias("w")))
                    .collect())  # bounded: dim+1 rows, the model itself
            got = {int(row["pos"]): float(row["w"]) for row in rows}
            b = got[-1]
            w = [got.get(d, w[d]) for d in range(dim)]
            new = {-1: b, **{d: w[d] for d in range(dim)}}
        else:
            # gradient + update, engine-side: per-dimension ordered
            # folds of err·x (bias = the err fold), new weight =
            # round(w − lr·g/n, 12) computed in the aggregate
            # projection so HALF_UP stays in-engine
            ed = scored.select(
                "_id", (F.col("_p") - F.col("_y")).alias("_e"), "_x")
            ex = ed.select("_id", "_e", F.posexplode("_x"))
            lrn = F.lit(lr)
            nn = F.lit(float(n))
            grads = (ex.groupBy("pos")
                     .agg((F.round(F.get(wlit, F.col("pos")) - lrn
                                   * fold(F.col("_e") * F.col("col")) / nn,
                                   12))
                          .alias("w"))
                     .unionAll(ed.agg(
                         F.lit(-1).alias("pos"),
                         F.round(F.lit(b) - lrn * fold(F.col("_e")) / nn, 12)
                         .alias("w")))
                     .collect())  # bounded: dim+1 rows, the model itself
            new = {int(row["pos"]): float(row["w"]) for row in grads}
            b = new[-1]
            w = [new[d] for d in range(dim)]
        weight_rows.extend((r + 1, d, new[d]) for d in sorted(new))

    wschema = T.StructType([
        T.StructField("round", T.LongType()),
        T.StructField("dim", T.LongType()),
        T.StructField("weight", T.DoubleType())])
    mschema = T.StructType([
        T.StructField("round", T.LongType()),
        T.StructField("log_loss", T.DoubleType()),
        T.StructField("n_correct", T.LongType())])
    return (spark.createDataFrame(weight_rows, wschema),
            spark.createDataFrame(metric_rows, mschema))
