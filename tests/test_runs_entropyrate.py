"""Runs test and Markov entropy rate."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_runs_oracle(spark):
    compare_query(spark, "orders_runs_test", SF_CORRECT)


def test_entropy_rate_oracle(spark):
    compare_query(spark, "events_entropy_rate", SF_CORRECT)


def test_runs_detects_clustered_series(spark):
    """30 low days then 30 high days = 2 runs -> strongly negative z;
    a strict alternation maximizes runs -> strongly positive z."""
    import datetime

    from disco_spark.operators.temporal import orders_runs_test

    base = datetime.date(2020, 1, 1)

    def run(counts):
        rows, k = [], 0
        for d, c in enumerate(counts):
            for _ in range(c):
                k += 1
                rows.append((k, base + datetime.timedelta(days=d)))
        df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date")
        with tempfile.TemporaryDirectory() as dd:
            df.write.parquet(os.path.join(dd, "orders.parquet"))
            return orders_runs_test(spark, dd).collect()[0]

    clustered = run([1] * 30 + [5] * 30)
    assert clustered["n_runs"] == 2
    assert clustered["z"] < -5

    alternating = run([1, 5] * 30)
    assert alternating["n_runs"] == 60
    assert alternating["z"] > 5

    # degenerate two-day series: n1=n2=1 makes the variance exactly 0
    # (2*n1*n2-n1-n2 = 0) — z must be NULL on both engines, never a
    # NaN from 0/0 (NaN serialization differs between Spark and DuckDB)
    degenerate = run([1, 5])
    assert (degenerate["n1"], degenerate["n2"]) == (1, 1)
    assert degenerate["z"] is None


def test_entropy_rate_bounds(spark):
    """0 <= H <= log2(|types|); deterministic chains score 0."""
    import math

    from disco_spark.operators.eventflow import events_entropy_rate
    from disco_spark.session import load_tables

    r = events_entropy_rate(spark, SF_CORRECT).collect()[0]
    n_types = (
        load_tables(spark, SF_CORRECT)["events"]
        .select("event_type")
        .distinct()
        .count()
    )
    assert 0.0 <= r["entropy_rate_bits"] <= math.log2(n_types) + 1e-9

    rows = [
        (i, i * 1000, 1, "click" if i % 2 == 0 else "view", 0.0, "{}")
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, sec long, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        det = events_entropy_rate(spark, d).collect()[0]
    assert det["entropy_rate_bits"] == 0.0  # strict alternation: next
    # type is fully determined by the current one
