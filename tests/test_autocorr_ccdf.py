"""Daily autocorrelation and activity CCDF."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_autocorr_oracle(spark):
    compare_query(spark, "orders_autocorr_daily", SF_CORRECT)


def test_ccdf_oracle(spark):
    compare_query(spark, "events_user_activity_ccdf", SF_CORRECT)


def test_autocorr_planted_weekly_cycle(spark):
    """A strict 7-day cycle: acf(7) == 1, acf(1) well below it."""
    from disco_spark.operators.temporal import orders_autocorr_daily

    base = datetime.date(2020, 1, 1)
    rows = []
    k = 0
    for d in range(70):
        count = 1 + 5 * ((d % 7) in (0, 1))  # weekly spike
        for _ in range(count):
            k += 1
            rows.append((k, base + datetime.timedelta(days=d)))
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        got = {
            r["lag"]: r["acf"]
            for r in orders_autocorr_daily(spark, d).collect()
        }
    assert got[7] == 1.0
    assert got[1] < 0.6


def test_ccdf_monotone_nonincreasing(spark):
    from disco_spark.operators.eventflow import events_user_activity_ccdf

    rows = sorted(
        events_user_activity_ccdf(spark, SF_CORRECT).collect(),
        key=lambda r: r["threshold"],
    )
    assert rows[0]["threshold"] == 1 and rows[0]["ccdf"] == 1.0
    for a, b in zip(rows, rows[1:]):
        assert a["n_at_or_above"] >= b["n_at_or_above"]
        assert a["ccdf"] >= b["ccdf"]
