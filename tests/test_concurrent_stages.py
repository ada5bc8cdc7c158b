"""Concurrent/pipelined stages: the reference runs pipeline stages
concurrently — a consumer stage starts on a producer's outputs while the
producer is still emitting (master/src/pipeline_utils.erl:213-240,
job_coordinator.erl:478-489; exercised by reference tests/test_pipe.py).

SURVEY §4 maps that onto Structured Streaming micro-batches: the
consumer (aggregation + sink) processes delivery N while the producer
has not yet emitted delivery N+1. This test DEMONSTRATES the mapping
instead of asserting it: the second input file is written only AFTER the
consumer's output for the first file is observed, so consumption
provably began before the producer finished.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F


def _wait_until(pred, timeout_s: float = 60.0, poll_s: float = 0.25) -> bool:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(poll_s)
    return False


def test_consumer_starts_before_producer_finishes(spark):
    # (batch_id, cumulative_count_over_buckets, t) — update-mode groupBy
    # state is cumulative, so the summed counts reveal how much input the
    # consumer has seen so far
    deliveries: list[tuple[int, int, float]] = []

    def consume(batch_df, batch_id: int):
        row = batch_df.agg(F.sum("n").alias("total")).first()
        if row and row["total"]:
            deliveries.append((batch_id, int(row["total"]), time.monotonic()))

    with tempfile.TemporaryDirectory() as src:
        # producer delivery #1
        spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1).write.parquet(
            os.path.join(src, "d1")
        )
        stream = (
            spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*"))
        )
        q = (
            stream.groupBy((F.col("k") % 10).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.outputMode("update")
            .foreachBatch(consume)
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        try:
            # consumer must finish delivery #1 while the producer has
            # emitted nothing else
            assert _wait_until(lambda: len(deliveries) >= 1), "first batch never consumed"
            t_first_consumed = deliveries[0][2]

            # producer delivery #2 happens strictly AFTER that
            t_second_produced = time.monotonic()
            spark.range(100, 150).select(F.col("id").alias("k")).coalesce(1).write.parquet(
                os.path.join(src, "d2")
            )
            assert _wait_until(lambda: any(d[1] >= 150 for d in deliveries)), (
                f"second delivery never consumed: {deliveries}"
            )
        finally:
            q.stop()

    assert t_first_consumed < t_second_produced, (
        "consumer output must predate the producer's second delivery"
    )
    # incremental delivery: ≥2 distinct micro-batches, not one big batch;
    # the first consumed delivery saw ONLY the first file's 100 rows
    assert len(deliveries) >= 2
    assert deliveries[0][1] == 100 and deliveries[-1][1] == 150
