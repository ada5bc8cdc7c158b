"""DOW seasonality, order streaks, Benford audit."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_dow_oracle(spark):
    compare_query(spark, "orders_seasonality_dow", SF_CORRECT)


def test_streaks_oracle(spark):
    compare_query(spark, "customer_order_streaks", SF_CORRECT)


def test_benford_oracle(spark):
    compare_query(spark, "benford_acctbal_audit", SF_CORRECT)


def test_dow_shares_sum_to_one(spark):
    from disco_spark.operators.temporal import orders_seasonality_dow

    rows = orders_seasonality_dow(spark, SF_CORRECT).collect()
    assert {r["dow"] for r in rows} <= set(range(1, 8))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_streaks_planted_islands(spark):
    """Months 1,2,3 then 7,8 -> streaks 3 and 2; longest=3, active=5."""
    import datetime

    from disco_spark.operators.temporal import customer_order_streaks

    months = [1, 2, 3, 7, 8]
    rows = [
        (i, 1, datetime.date(2020, m, 15)) for i, m in enumerate(months)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        r = customer_order_streaks(spark, d).collect()[0]
    assert r["n_active_months"] == 5
    assert r["longest_streak"] == 3


def test_benford_uniform_data_underweights_one(spark):
    """This synthetic acctbal is ~uniform, so digit 1's share falls far
    short of Benford's 0.301 — the audit SHOULD flag it."""
    from disco_spark.operators.quality import benford_acctbal_audit

    rows = benford_acctbal_audit(spark, SF_CORRECT).collect()
    for r in rows:
        assert 1 <= r["d"] <= 9
        assert abs((r["share"] - r["benford"]) - r["excess"]) < 2e-6
    d1 = [r for r in rows if r["src"] == "customer" and r["d"] == 1][0]
    assert d1["excess"] < -0.05
