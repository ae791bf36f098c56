"""SparkSession factory with engine defaults.

The reference delegates execution to Snowflake's engine
(``SCD-Automation.sql:35`` — ``WAREHOUSE = COMPUTE_WH``); here Catalyst +
Tungsten play that role. Defaults are chosen for a large cluster
(AQE on, skew-join handling on) but work identically on ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine-level SQL confs. These are safe on an existing session too
# (all are runtime-settable), so `configure(spark)` can be applied to a
# driver-provided session.
RUNTIME_CONFS: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching. At 100 TB these are
    # the difference between a plan that survives skewed keys and one that
    # straggles on one reducer.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Wall-clock timestamps, no TZ — mirrors the reference's TIMESTAMP_NTZ
    # (SCD-Configuration Setup.sql:38-39).
    "spark.sql.session.timeZone": "UTC",
    # Parquet timestamps round-trip as NTZ so store reads match writes.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # Arrow for every pandas_udf / mapInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf not settable at runtime on this build — keep default
            pass
    return spark


#: Runtime conf selecting how iterative / multi-consumer plans are
#: stabilized (materialized once instead of re-evaluated per consumer).
#:
#: - ``"local"`` (default): ``localCheckpoint(eager=False)`` — blocks
#:   live in executor storage only. Fastest, and the right default on
#:   local[N] and on clusters where a lost executor may simply rerun the
#:   job (the store's commits are idempotent per version: a failed
#:   commit never swaps the pointer). The documented risk: lineage is
#:   TRUNCATED, so on a 1000-node cluster one lost executor makes the
#:   checkpointed blocks unrecoverable and fails the job rather than
#:   recomputing.
#: - ``"reliable"``: ``df.checkpoint(eager=False)`` — blocks persist to
#:   ``spark.sparkContext.setCheckpointDir`` storage (HDFS/S3), so the
#:   plan survives executor loss. The cluster-production choice for
#:   long multi-hour merges; costs a write+read of the stabilized frame.
#:   ``get_spark`` points the checkpoint dir at ``$SPARK_GRAFT_CKPT_DIR``
#:   or a temp dir so the mode works out of the box.
#: - ``"none"``: return the plan unchanged — pure lineage, fully
#:   recomputable, but multi-consumer plans re-evaluate per consumer
#:   (wrong for nondeterministic expressions: the CDC batch could
#:   diverge from the committed snapshot) and iterative loops grow
#:   exponential lineage. Only safe for one-shot deterministic plans.
STABILIZE_MODE_CONF = "spark.sds.stabilize.mode"


def stabilize(df, mode: str | None = None, eager: bool = False):
    """Materialize-once barrier for plans with multiple consumers or
    iterative self-reference. Strategy comes from ``mode`` or the
    session conf ``spark.sds.stabilize.mode`` (see above).

    ``eager=True`` materializes the checkpoint blocks NOW instead of on
    the first downstream action. Use it when the stabilized frame feeds
    several BROADCAST builds: broadcast-exchange jobs are planned and
    run before the main job touches the lazy checkpoint, so each
    broadcast re-derives the full upstream lineage (measured r17: the
    BM25 probe's pruning metadata re-ran the stored-index scan+join
    slice per broadcast — 22.8s → ~10s with the blocks pinned first).
    Lazy remains the default: single-consumer frames would pay an extra
    job for nothing. Under ``mode="none"`` eager is a NO-OP (the frame
    returns unchanged, so multi-broadcast consumers re-derive lineage)
    — acceptable for that debug-only mode (ADVICE r17)."""
    mode = mode or df.sparkSession.conf.get(STABILIZE_MODE_CONF, "local")
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    if mode == "none":
        return df
    raise ValueError(
        f"{STABILIZE_MODE_CONF}={mode!r}: expected local|reliable|none")


def _driver_mem() -> str:
    return os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")


def _driver_java_options() -> str | None:
    """Optional launch-time JVM options for the local-mode driver.

    ``SPARK_GRAFT_PRETOUCH=1`` adds ``-Xms<heap> -XX:+AlwaysPreTouch``:
    the JVM touches every heap page at startup instead of on first
    allocation. Measured r17 (BENCH_NOTES "r17: the variance root
    cause"): this sandbox class backs guest memory lazily and unbacks
    freed pages, so each first touch of a fresh heap page stalls in
    host-side backing (6-90 s/GiB, worst under concurrent faults from
    32 task threads — kernel-time storms that inflated random queries
    by 5-30 s). Pre-touching moves that one-time cost to session
    startup, outside any timed region, and pins the heap resident for
    the process lifetime; per-query variance collapsed (substring probe
    9.8/20.9/3.4/3.1/2.8 s → 2.4-2.8 s flat). Off by default: tests and
    short-lived sessions should not pay a multi-minute startup; the
    bench (one long process, timing-sensitive) opts in. On a real
    cluster the same flags are the standard latency-sensitive executor
    deployment practice."""
    if os.environ.get("SPARK_GRAFT_PRETOUCH") != "1":
        return None
    return f"-Xms{_driver_mem()} -XX:+AlwaysPreTouch"


def get_spark(app_name: str = "sds-spark-engine", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to 2×cpus — on a real cluster you'd
    size this to total executor cores; AQE coalesces the excess.
    """
    n = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = shuffle_partitions or max(2 * n, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.driver.maxResultSize", "4g")
        # local mode: driver heap IS the executor heap. The JVM default
        # (1g) OOMs building sub-threshold broadcast tables once the
        # data reaches sf1 — size it to the box, overridable for small
        # harnesses. Launch-time conf: applies to the session that
        # creates the JVM. 8g (the sf1-era default) exhausts at sf10
        # once a 150-query process accumulates its memoized
        # localCheckpoints (r16: the suite's multimodal pair pin OOM'd
        # the heap and poisoned the two queries behind it); 32g is
        # still a quarter of the target box and matches the
        # 32-thread × ~1g/task executor-sizing rule a real cluster
        # would get per its executor JVMs.
        .config("spark.driver.memory", _driver_mem())
        # Broadcast threshold stays at the PRODUCTION DEFAULT (10MB),
        # deliberately. An earlier 64MB setting let size estimates
        # implicit-broadcast fact-scale frames at sf1 (a pruned 6M-row
        # lineitem in the TPC-H Q3 shape; minhash band self-joins over
        # 50k documents) — plans a 1000-executor cluster would never
        # run, and measurably slower even here (q3 sf1: 4.5s broadcast
        # vs 1.0s shuffle; 13-query family total 70.6s → 42.0s at sf1).
        # True dimensions are explicitly F.broadcast()-ed at the query
        # sites (threshold-independent), and AQE still converts joins
        # whose RUNTIME size is genuinely small, so toy scales lose
        # nothing while the plan shape is the one that survives 100×.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    )
    opts = _driver_java_options()
    if opts:
        builder = builder.config("spark.driver.extraJavaOptions", opts)
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = configure(builder.getOrCreate())
    if opts:
        # launch-time conf: silently ignored when the JVM already exists
        # (ADVICE r17 — a caller setting SPARK_GRAFT_PRETOUCH=1 against a
        # pre-existing gateway would believe variance is controlled when
        # it is not). Warn loudly instead of proceeding quietly.
        eff = spark.conf.get("spark.driver.extraJavaOptions", "")
        if "-XX:+AlwaysPreTouch" not in (eff or ""):
            import warnings
            warnings.warn(
                "SPARK_GRAFT_PRETOUCH=1 requested but the existing "
                "driver JVM was launched without -XX:+AlwaysPreTouch; "
                "the pretouch is NOT in effect for this session",
                RuntimeWarning, stacklevel=2)
    # Reliable-checkpoint storage for stabilize(mode="reliable"): a
    # durable shared path in production ($SPARK_GRAFT_CKPT_DIR → HDFS/S3
    # on a cluster); a local temp dir otherwise so the mode is always
    # usable. Cheap no-op if already set.
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        import tempfile
        ckpt = os.environ.get("SPARK_GRAFT_CKPT_DIR") or tempfile.mkdtemp(
            prefix="sds_ckpt_")
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
