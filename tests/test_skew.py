"""Salted join / two-phase salted aggregation (operators/skew.py):
results must be identical to the naive forms on skewed data, and the
partial phase must actually spread the hot key across salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from slowly_changing_dimensions_data_engineering_spark.operators.skew import (
    SALT, salted_aggregate, salted_join, with_salt,
)


def _skewed(spark, n=2000):
    # 90% of rows share key 'hot'
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain_groupby(spark):
    df = _skewed(spark)
    got = {tuple(r) for r in salted_aggregate(
        df, ["k"], {"n": ("count", "k"), "s": ("sum", "v"),
                    "mn": ("min", "v"), "mx": ("max", "v")},
        n_salts=8).collect()}
    want = {tuple(r) for r in df.groupBy("k").agg(
        F.count("k").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
    assert got == want


def test_hot_key_spreads_over_salts(spark):
    df = _skewed(spark)
    spread = (df.withColumn(SALT, with_salt(df, 8))
              .filter(F.col("k") == "hot")
              .select(SALT).distinct().count())
    assert spread == 8  # the straggler key really fans out


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(7)],
        ["k", "label"])
    for how in ("inner", "left"):
        got = {tuple(r) for r in
               salted_join(left, right, ["k"], n_salts=4, how=how).collect()}
        want = {tuple(r) for r in left.join(right, ["k"], how).collect()}
        assert got == want, how
