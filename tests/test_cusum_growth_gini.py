"""CUSUM changepoint, MoM/YoY growth, Gini concentration."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_cusum_oracle(spark):
    compare_query(spark, "events_cusum_changepoint", SF_CORRECT)


def test_mom_oracle(spark):
    compare_query(spark, "orders_mom_growth", SF_CORRECT)


def test_gini_oracle(spark):
    compare_query(spark, "gini_supplier_revenue", SF_CORRECT)


def test_cusum_finds_planted_shift(spark):
    """Rate jumps 1/day -> 5/day after day 10 of 20: the argmax of the
    CUSUM statistic is the last low-rate day (day 10)."""
    import datetime

    from disco_spark.operators.temporal import events_cusum_changepoint

    rows = []
    eid = 0
    for day in range(1, 21):
        rate = 1 if day <= 10 else 5
        for j in range(rate):
            eid += 1
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 12, j), 1, "click",
                 0.0, "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        r = events_cusum_changepoint(spark, d).collect()[0]
    assert r["changepoint_day"] == datetime.date(2024, 1, 10)
    assert r["n_days"] == 20


def test_growth_exact_on_planted_months(spark):
    """Revenue 100 -> 150 across consecutive months = +0.5 MoM."""
    import datetime

    from disco_spark.operators.temporal import orders_mom_growth

    rows = [
        (1, 1, datetime.date(2020, 1, 10), 100.0),
        (2, 1, datetime.date(2020, 2, 10), 150.0),
        (3, 1, datetime.date(2020, 4, 10), 80.0),  # gap: no March
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        got = {
            r["month_index"]: r["mom_growth"]
            for r in orders_mom_growth(spark, d).collect()
        }
    assert got[2020 * 12 + 2] == 0.5
    assert got[2020 * 12 + 4] is None  # gap month: no false compare
    assert got[2020 * 12 + 1] is None


def test_gini_bounds_and_equal_case(spark):
    """Uniform revenues => Gini ~ 0; real data in [0, 1)."""
    from disco_spark.operators.relational3 import gini_supplier_revenue

    r = gini_supplier_revenue(spark, SF_CORRECT).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    rows = [(s, 1, 100.0, 0.0) for s in range(1, 11)]
    df = spark.createDataFrame(
        rows,
        "l_suppkey long, l_orderkey long, l_extendedprice double,"
        " l_discount double",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "lineitem.parquet"))
        eq = gini_supplier_revenue(spark, d).collect()[0]
    assert abs(eq["gini"]) < 1e-9
