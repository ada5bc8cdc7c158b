"""Markov transitions, last-touch attribution, per-user entropy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_markov_oracle(spark):
    compare_query(spark, "events_markov_transitions", SF_CORRECT)


def test_attribution_oracle(spark):
    compare_query(spark, "events_attribution_last_touch", SF_CORRECT)


def test_entropy_oracle(spark):
    compare_query(spark, "events_user_entropy", SF_CORRECT)


def test_markov_probs_row_normalized(spark):
    """Per-src transition probabilities sum to ~1 and every count >= 1."""
    from disco_spark.operators.eventflow import events_markov_transitions

    df = events_markov_transitions(spark, SF_CORRECT)
    sums = (
        df.groupBy("src_type")
        .agg(F.sum("prob").alias("s"), F.min("n_transitions").alias("m"))
        .collect()
    )
    assert sums, "no transitions found"
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-4, r
        assert r["m"] >= 1


def test_attribution_planted_stream(spark):
    """view -> purchase(5) -> purchase(7): first purchase credits the
    view, second credits nothing newer (still the view — purchases are
    never touches); a purchase that opens a stream credits 'none'."""
    from disco_spark.operators.eventflow import (
        events_attribution_last_touch,
    )
    import os
    import tempfile

    rows = [
        (1, 1_000_000, 10, "view", 0.0),
        (1, 2_000_000, 11, "purchase", 5.0),
        (1, 3_000_000, 12, "purchase", 7.0),
        (2, 1_000_000, 20, "purchase", 3.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, us long, event_id long, event_type string, value double"
    ).select(
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_id",
        "event_type",
        "value",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r["touch_type"]: (r["n_purchases"], r["attributed_value"])
            for r in events_attribution_last_touch(spark, d).collect()
        }
    assert got == {"view": (2, 12.0), "none": (1, 3.0)}


def test_entropy_bounds(spark):
    """0 <= H <= log2(n_types), exactly 0 for single-type users."""
    from disco_spark.operators.eventflow import events_user_entropy

    for r in events_user_entropy(spark, SF_CORRECT).collect():
        hi = math.log2(r["n_types"]) if r["n_types"] > 1 else 0.0
        assert -1e-9 <= r["entropy"] <= hi + 1e-6, r
        if r["n_types"] == 1:
            assert r["entropy"] == 0.0
