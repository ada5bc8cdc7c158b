"""Streaming sliding top-k and nested basket structs."""

from __future__ import annotations

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_stream_topk_oracle(spark):
    compare_query(spark, "streaming_sliding_topk_types", SF_CORRECT)


def test_basket_oracle(spark):
    compare_query(spark, "order_basket_structs", SF_CORRECT)


def test_stream_topk_at_most_two_per_window(spark):
    from disco_spark.streaming.windows import streaming_sliding_topk_types

    rows = streaming_sliding_topk_types(spark, SF_CORRECT).collect()
    per_window = {}
    for r in rows:
        per_window.setdefault(r["window_start"], []).append(r["n_events"])
    assert per_window
    for ws, counts in per_window.items():
        assert 1 <= len(counts) <= 2, (ws, counts)
        assert counts == sorted(counts, reverse=True)


def test_basket_top_is_true_max(spark):
    """The array-derived top item matches a relational max_by."""
    from pyspark.sql import functions as F

    from disco_spark.operators.relational3 import order_basket_structs
    from disco_spark.session import load_tables

    got = {
        r["l_orderkey"]: (r["top_qty"], r["top_partkey"], r["n_items"])
        for r in order_basket_structs(spark, SF_CORRECT).collect()
    }
    li = load_tables(spark, SF_CORRECT)["lineitem"]
    want = {
        r["l_orderkey"]: (r["tq"], r["tp"], r["n"])
        for r in li.groupBy("l_orderkey")
        .agg(
            F.max(
                F.struct(
                    F.col("l_quantity").cast("bigint").alias("q"),
                    F.col("l_partkey").alias("p"),
                )
            ).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_orderkey",
            F.col("m.q").alias("tq"),
            F.col("m.p").alias("tp"),
            "n",
        )
        .collect()
    }
    assert got == want
