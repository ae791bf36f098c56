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
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
