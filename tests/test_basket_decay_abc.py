"""Market-basket lift, recency-decay scoring, Pareto ABC."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from disco_spark.operators.decay import recency_decay_scores
from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_basket_lift_oracle(spark):
    compare_query(spark, "market_basket_lift", SF_CORRECT)


def test_decay_oracle(spark):
    compare_query(spark, "events_recency_decay_score", SF_CORRECT)


def test_abc_oracle(spark):
    compare_query(spark, "pareto_abc_parts", SF_CORRECT)


def test_decay_planted_values(spark):
    """An event AT the anchor scores its full value; one exactly tau
    days earlier scores value/e; recency strictly dominates."""
    rows = [
        (1, 7 * 86400, 10.0),   # anchor event (max sec)
        (2, 0, 10.0),           # exactly tau=7 days before anchor
    ]
    ev = spark.createDataFrame(rows, "k long, sec long, value double")
    got = {
        r["k"]: r["score"]
        for r in recency_decay_scores(ev, "k", "sec", "value", 7.0).collect()
    }
    assert got[1] == 10.0
    assert abs(got[2] - 10.0 / math.e) < 1e-6
    assert got[1] > got[2]


def test_basket_lift_structure(spark):
    from disco_spark.registry import QUERIES
    from disco_spark.similarity.triangles import MIN_COORDERS

    rows = QUERIES["market_basket_lift"](spark, SF_SMOKE).collect()
    assert rows, "no co-order edges at smoke scale"
    for r in rows:
        assert r["u"] < r["v"]
        assert r["strength"] >= MIN_COORDERS
        assert r["lift"] > 0


def test_abc_classes_partition_by_cumulative_share(spark):
    from disco_spark.registry import QUERIES

    rows = QUERIES["pareto_abc_parts"](spark, SF_SMOKE).collect()
    total = sum(r["revenue"] for r in rows)
    by_cls = {"A": 0.0, "B": 0.0, "C": 0.0}
    for r in rows:
        by_cls[r["abc_class"]] += r["revenue"]
    # A stops at the 80% boundary; A+B at 95% (within one part's share)
    max_share = max(r["revenue"] for r in rows) / total
    assert by_cls["A"] / total <= 0.8
    assert by_cls["A"] / total > 0.8 - max_share - 1e-9
    assert (by_cls["A"] + by_cls["B"]) / total <= 0.95
    # class boundary respects the revenue ordering (ties may straddle)
    min_a = min(r["revenue"] for r in rows if r["abc_class"] == "A")
    if any(r["abc_class"] == "B" for r in rows):
        max_b = max(r["revenue"] for r in rows if r["abc_class"] == "B")
        assert max_b <= min_a
