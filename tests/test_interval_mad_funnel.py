"""Interval coalescing, MAD outliers, 3-step ordered funnel."""

from __future__ import annotations

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_coalesce_oracle(spark):
    compare_query(spark, "interval_coalesce_coverage", SF_CORRECT)


def test_mad_oracle(spark):
    compare_query(spark, "outlier_mad_orders", SF_CORRECT)


def test_funnel3_oracle(spark):
    compare_query(spark, "events_funnel_3step", SF_CORRECT)


def test_coalesce_planted_intervals(spark):
    """Two overlapping windows fuse; a distant third stays separate:
    events at t=0, 100 (overlap within 300s) and t=1000."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from disco_spark.operators.interval import (
        ACTIVITY_WINDOW_S,
        interval_coalesce_coverage,
    )

    rows = [(1, 0), (1, 100), (1, 1000)]
    ev = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        r = interval_coalesce_coverage(spark, d).collect()[0]
    assert r["n_intervals"] == 2
    # [0, 100+300] fused + [1000, 1300]
    assert r["covered_s"] == (100 + ACTIVITY_WINDOW_S) + ACTIVITY_WINDOW_S


def test_mad_robust_to_whale(spark):
    """A single extreme value is flagged but does NOT drag the
    threshold: 20 tight values + one whale -> exactly one outlier."""
    import os
    import tempfile

    from disco_spark.operators.stats import outlier_mad_orders

    rows = [(i, "1-URGENT", 100.0 + (i % 5)) for i in range(20)]
    rows.append((99, "1-URGENT", 100000.0))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        r = outlier_mad_orders(spark, d).collect()[0]
    assert r["n"] == 21
    assert r["n_outliers"] == 1
    assert r["max_outlier_price"] == 100000.0


def test_funnel3_depths_monotone(spark):
    from disco_spark.operators.sessionize import events_funnel_3step

    r = events_funnel_3step(spark, SF_CORRECT).collect()[0]
    assert (
        r["n_sessions"]
        >= r["n_view"]
        >= r["n_view_click"]
        >= r["n_view_click_purchase"]
        >= 0
    )
    assert r["n_view"] > 0  # views do occur inside sessions
