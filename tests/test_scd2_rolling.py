"""SCD2 interval construction (operators/cdc.py) and the 30-day
RANGE-frame rolling window (operators/relational2.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from disco_spark.operators.cdc import scd2_intervals
from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_scd2_oracle(spark):
    compare_query(spark, "scd2_user_state_intervals", SF_CORRECT)


def test_rolling_30d_oracle(spark):
    compare_query(spark, "window_rolling_30d_revenue", SF_CORRECT)


def test_scd2_planted_change_log(spark):
    """A->A->B->B->A collapses to 3 intervals with exact boundaries and
    one open (current) interval."""
    rows = [
        (1, "A", 10, 100),
        (1, "A", 20, 101),
        (1, "B", 30, 102),
        (1, "B", 40, 103),
        (1, "A", 50, 104),
        (2, "X", 5, 200),
    ]
    ev = spark.createDataFrame(rows, "k long, s string, sec long, eid long")
    out = sorted(
        scd2_intervals(ev, "k", "s", "sec", "eid").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    got = [
        (r["k"], r["s"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out
    ]
    assert got == [
        (1, "A", 10, 30, False),
        (1, "B", 30, 50, False),
        (1, "A", 50, None, True),
        (2, "X", 5, None, True),
    ]


def test_scd2_same_second_tiebreak(spark):
    """Two changes in the same second resolve by the tiebreak column —
    the later event id wins the open interval."""
    rows = [(1, "A", 10, 100), (1, "B", 10, 101)]
    ev = spark.createDataFrame(rows, "k long, s string, sec long, eid long")
    out = sorted(
        scd2_intervals(ev, "k", "s", "sec", "eid").collect(),
        key=lambda r: r["valid_from"] is None or not r["is_current"],
    )
    cur = [r for r in out if r["is_current"]]
    assert len(cur) == 1 and cur[0]["s"] == "B"


def test_rolling_30d_window_math(spark):
    """Orders on days 0, 10, 45 for one customer: day-45 order sees
    only itself (previous order is 35 > 30 days back); day-10 sees
    both earlier orders."""
    from disco_spark.registry import QUERIES  # noqa: F401  (registration)
    from pyspark.sql.window import Window

    o = spark.createDataFrame(
        [(1, 101, 0, 100.0), (1, 102, 10, 10.0), (1, 103, 45, 1.0)],
        "o_custkey long, o_orderkey long, day long, o_totalprice double",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    got = {
        r["o_orderkey"]: r["rev"]
        for r in o.select(
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
            .over(w)
            .cast("double")
            .alias("rev"),
        ).collect()
    }
    assert got == {101: 100.0, 102: 110.0, 103: 1.0}
