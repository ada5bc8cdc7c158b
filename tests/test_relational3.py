"""Skyline, GROUPING SETS, RFM quartiles, activity bitmaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_skyline_oracle(spark):
    compare_query(spark, "skyline_parts_price_size", SF_CORRECT)


def test_grouping_sets_oracle(spark):
    compare_query(spark, "grouping_sets_orders", SF_CORRECT)


def test_rfm_oracle(spark):
    compare_query(spark, "rfm_customer_segments", SF_CORRECT)


def test_bitmap_oracle(spark):
    compare_query(spark, "bitmap_user_active_days", SF_CORRECT)


def test_global_prefix_max_matches_window(spark):
    """The two-pass harness equals the single-partition reference
    cummax on data spanning many range partitions."""
    from pyspark.sql import Window

    from disco_spark.operators.relational2 import global_prefix_max

    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["premax"]
        for r in global_prefix_max(df, ["k"], "v").collect()
    }
    w = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["k"]: r["m"]
        for r in df.withColumn(
            "m", F.coalesce(F.max("v").over(w), F.lit(-(2**62)))
        ).collect()
    }
    assert got == want


def test_skyline_planted_frontier(spark):
    """Known 2-D frontier: dominated points dropped, ties kept."""
    import os
    import tempfile

    from disco_spark.operators.relational3 import skyline_parts_price_size

    #         key  price  size
    rows = [
        (1, 1.0, 10),   # frontier (cheapest)
        (2, 2.0, 20),   # frontier
        (3, 2.0, 20),   # identical point — also kept
        (4, 2.5, 15),   # dominated by 2 (cheaper AND bigger)
        (5, 3.0, 30),   # frontier (biggest)
        (6, 3.0, 25),   # dominated by 5 (same price, bigger)
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_retailprice double, p_size int")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "part.parquet"))
        keys = {
            r["p_partkey"]
            for r in skyline_parts_price_size(spark, d).collect()
        }
    assert keys == {1, 2, 3, 5}


def test_rfm_quartiles_balanced(spark):
    """Each quartile holds n/4 +- 1 customers; segment is the digit
    concatenation of the three scores."""
    from disco_spark.operators.relational3 import rfm_customer_segments

    rows = rfm_customer_segments(spark, SF_CORRECT).collect()
    n = len(rows)
    for col in ("r_q", "f_q", "m_q"):
        sizes = {}
        for r in rows:
            assert 1 <= r[col] <= 4, r
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)
    for r in rows[:50]:
        assert r["segment"] == f"{r['r_q']}{r['f_q']}{r['m_q']}"
    assert n > 100


def test_bitmap_popcount_is_distinct_days(spark):
    """popcount(bitmap) == COUNT(DISTINCT day-of-month) per user."""
    from disco_spark.operators.relational3 import bitmap_user_active_days
    from disco_spark.session import load_tables

    got = {
        r["user_id"]: r["n_active_days"]
        for r in bitmap_user_active_days(spark, SF_CORRECT).collect()
    }
    ev = load_tables(spark, SF_CORRECT)["events"]
    want = {
        r["user_id"]: r["d"]
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct(F.dayofmonth("ts")).alias("d"))
        .collect()
    }
    assert got == want
