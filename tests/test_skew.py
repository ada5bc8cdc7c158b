"""Salted join / salted agg preserve exact semantics under skew."""

from __future__ import annotations

import pyspark.sql.functions as F

from disco_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # 90% of rows share key 0 — the hot-key shape
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    large = _skewed(spark)
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = large.join(small, "k").select("k", "v", "w")
    salted = salted_join(large, small, "k", n_salts=8).select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    large = _skewed(spark)
    small = spark.range(1).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    plain = large.join(small, "k", "left").select("k", "v", "w")
    salted = salted_join(large, small, "k", n_salts=4, how="left").select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_agg(
        df,
        ["k"],
        aggs=[F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps")],
        finals=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
