"""Bucketed interval join: equals the naive BETWEEN join, never plans a
nested-loop/cartesian."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from disco_spark.operators.interval import interval_join
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

from disco_spark import registry

registry.load_all()


def _fixtures(spark):
    pts = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, h, m)) for i, (h, m) in enumerate(
            [(0, 0), (0, 30), (1, 0), (2, 15), (5, 59), (6, 0), (23, 45)]
        )],
        "pid bigint, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0)),   # [0,1)
            (11, datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 1, 6, 0)),  # [0:30,6)
            (12, datetime(2024, 1, 1, 22, 0), datetime(2024, 1, 2, 1, 0)),  # crosses midnight
        ],
        "iid bigint, s timestamp, e timestamp",
    )
    return pts, iv


def _naive(pts, iv, how):
    cond = (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
    return pts.join(iv, cond, how).select("pid", "iid")


def test_interval_join_inner_matches_naive(spark):
    pts, iv = _fixtures(spark)
    got = sorted(map(tuple, interval_join(pts, iv, "ts", "s", "e", 3600).select("pid", "iid").collect()))
    want = sorted(map(tuple, _naive(pts, iv, "inner").collect()))
    assert got == want
    # boundary semantics: end-exclusive (ts == e does not match)
    assert (2, 10) not in got  # 1:00 point vs [0,1) interval
    assert (5, 11) not in got  # 6:00 point vs [0:30,6) interval


def test_interval_join_left_matches_naive(spark):
    pts, iv = _fixtures(spark)
    got = sorted(map(tuple, interval_join(pts, iv, "ts", "s", "e", 3600, how="left").select("pid", "iid").collect()), key=repr)
    want = sorted(map(tuple, _naive(pts, iv, "left").collect()), key=repr)
    assert got == want


def test_interval_join_no_cartesian_plan(spark):
    pts, iv = _fixtures(spark)
    plan = interval_join(pts, iv, "ts", "s", "e", 3600)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_oracle(spark):
    compare_query(spark, "interval_join_event_windows", SF_SMOKE)
