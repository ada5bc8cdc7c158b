"""Streaming surface: batch-window oracles + real streaming runs
(availableNow) converging to batch answers + bounded-state dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.streaming.windows import run_stream_to_memory
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()

WINDOWED = [
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_dedup_by_key",
    "streaming_tumbling_window",  # real readStream run, same oracle
    "streaming_stateful_user_totals",  # applyInPandasWithState run
    "events_funnel_view_purchase",
    "streaming_static_join_value_by_segment",  # real stream-static join run
    "events_daily_retention",
]


@pytest.mark.parametrize("name", WINDOWED)
def test_streaming_oracle(spark, name):
    compare_query(spark, name, SF_SMOKE)


def test_stream_equals_batch_for_sliding(spark):
    """Convergence check for the sliding window too (complete mode)."""

    def sliding(stream):
        return (
            stream.groupBy(F.window("ts", "1 hour", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )

    got = {(r.ws, r.n) for r in run_stream_to_memory(spark, SF_SMOKE, sliding).collect()}
    batch = registry.QUERIES["events_sliding_window"](spark, SF_SMOKE).collect()
    want = {(r.window_start, r.n_events) for r in batch}
    assert got == want


def test_streaming_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark bounds state and still dedups the
    replay: unique (event_type, user_id) pairs match the batch distinct."""

    def dedup(stream):
        return stream.select("event_type", "user_id", "ts").dropDuplicatesWithinWatermark(
            ["event_type", "user_id"]
        )

    out = run_stream_to_memory(spark, SF_SMOKE, dedup, output_mode="append")
    got = out.select("event_type", "user_id").distinct().count()
    t = registry.QUERIES  # batch truth
    batch = (
        registry.QUERIES["events_dedup_by_key"](spark, SF_SMOKE)
        .agg(F.sum("n_unique_users"))
        .collect()[0][0]
    )
    assert got == batch
