"""Seasonally-adjusted anomaly days and posting-list skew audit."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_anomaly_oracle(spark):
    compare_query(spark, "orders_anomaly_seasonal_adjusted", SF_CORRECT)


def test_skew_oracle(spark):
    compare_query(spark, "dedup_posting_skew_profile", SF_CORRECT)


def test_anomaly_ignores_weekly_pattern_flags_spike(spark):
    """A strict weekly pattern alone flags NOTHING; adding one wild
    spike day makes it the top-ranked, flagged row."""
    import datetime

    from disco_spark.operators.temporal import (
        orders_anomaly_seasonal_adjusted,
    )

    base = datetime.date(2020, 1, 6)  # a Monday

    def build(spike_day):
        rows, k = [], 0
        for d in range(70):
            count = 1 + 4 * ((d % 7) == 0)  # busy Mondays
            if d == spike_day:
                count += 40
            for _ in range(count):
                k += 1
                rows.append((k, base + datetime.timedelta(days=d)))
        return spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate date"
        )

    with tempfile.TemporaryDirectory() as d:
        build(-1).write.parquet(os.path.join(d, "orders.parquet"))
        clean = orders_anomaly_seasonal_adjusted(spark, d).collect()
    # strict weekly pattern: top-5 rows exist but NONE may be flagged
    assert len(clean) == 5
    assert all(r["is_anomaly"] == 0 for r in clean)

    with tempfile.TemporaryDirectory() as d:
        build(30).write.parquet(os.path.join(d, "orders.parquet"))
        top = orders_anomaly_seasonal_adjusted(spark, d).collect()
    spike = base + datetime.timedelta(days=30)
    by_resid = sorted(top, key=lambda r: -abs(r["residual"]))
    assert by_resid[0]["day"] == spike
    assert by_resid[0]["is_anomaly"] == 1
    # the spike dominates everything else in the top-5
    assert abs(by_resid[0]["residual"]) > 3 * abs(by_resid[1]["residual"])


def test_skew_bands_partition_vocab(spark):
    from pyspark.sql import functions as F

    from disco_spark.dedup.dedup import dedup_posting_skew_profile, shingle_df
    from disco_spark.session import load_tables

    rows = dedup_posting_skew_profile(spark, SF_CORRECT).collect()
    docs = load_tables(spark, SF_CORRECT)["documents"]
    n_shingles = (
        shingle_df(docs).select("shingle").distinct().count()
    )
    assert sum(r["n_shingles"] for r in rows) == n_shingles
    for r in rows:
        assert r["pair_weight"] >= r["n_shingles"]
