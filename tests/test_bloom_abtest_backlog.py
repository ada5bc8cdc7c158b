"""Bloom-prefiltered join, A/B z-test, open-order backlog."""

from __future__ import annotations

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_bloom_join_oracle(spark):
    compare_query(spark, "join_bloom_prefiltered", SF_CORRECT)


def test_abtest_oracle(spark):
    compare_query(spark, "abtest_conversion_ztest", SF_CORRECT)


def test_backlog_oracle(spark):
    compare_query(spark, "lineitem_transit_backlog", SF_CORRECT)


def test_bloom_join_equals_plain_join(spark):
    """The bloom prefilter is invisible: result == plain join."""
    from disco_spark.operators.skew import join_bloom_prefiltered
    from disco_spark.session import load_tables

    got = {
        r["l_suppkey"]: r["revenue"]
        for r in join_bloom_prefiltered(spark, SF_CORRECT).collect()
    }
    t = load_tables(spark, SF_CORRECT)
    plain = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["nation"], F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(F.col("n_name") == "NATION_7")
        .groupBy("l_suppkey")
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                    ).cast("bigint")
                ).cast("double")
                / 100
            ).alias("revenue")
        )
    )
    want = {r["l_suppkey"]: r["revenue"] for r in plain.collect()}
    assert got == want and got


def test_abtest_null_experiment_not_significant(spark):
    """Hash-split arms on identical behavior: the A/A test must come
    back non-significant (|z| small)."""
    from disco_spark.operators.stats import abtest_conversion_ztest

    r = abtest_conversion_ztest(spark, SF_CORRECT).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert 0 < r["conv_a"] + r["conv_b"] < r["n_a"] + r["n_b"]
    assert r["significant"] == 0
    assert abs(r["z"]) < 3.0


def test_backlog_never_negative_and_ends_at_zero(spark):
    """Open-order count is >= 0 everywhere and the final day's running
    value is 0 (every order eventually ships)."""
    from disco_spark.operators.temporal import lineitem_transit_backlog

    rows = sorted(
        lineitem_transit_backlog(spark, SF_CORRECT).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    assert all(r["n_open"] >= 0 for r in rows)
    assert rows[-1]["n_open"] == 0
    assert max(r["n_open"] for r in rows) > 0
