"""Bucketed co-located joins: the pre-shuffle strategy SURVEY §1.3/§2.6
maps DiscoDB's sorted index layout onto (bucketBy + sortBy saveAsTable).
A join of two tables bucketed on the join key plans with NO Exchange —
at 100 TB this removes the dominant shuffle entirely."""

from __future__ import annotations

import pyspark.sql.functions as F


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = _physical_plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() == 5_000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_needs_exchange(spark):
    """Control: the same join without bucketing plans two Exchanges."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(10_000).select(F.col("id").alias("k"))
        right = spark.range(5_000).select(F.col("id").alias("k"))
        plan = _physical_plan(left.join(right, "k"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_colocated_join_oracle(spark):
    from disco_spark import registry
    from disco_spark.testing import compare_query
    from tests.conftest import SF_SMOKE

    registry.load_all()

    compare_query(spark, "bucketed_colocated_join", SF_SMOKE)
    # idempotent across calls (tables cached): second run also matches
    compare_query(spark, "bucketed_colocated_join", SF_SMOKE)
