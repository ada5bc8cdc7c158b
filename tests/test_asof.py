"""as-of join semantics: <= matching, ties, unmatched rows, oracle."""

from __future__ import annotations

from disco_spark import registry
from disco_spark.operators.asof import asof_join
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, 10, "L10"), (1, 20, "L20"), (2, 5, "L5")], "k int, t int, lv string"
    )
    right = spark.createDataFrame(
        [(1, 5, "R5"), (1, 20, "R20"), (2, 9, "R9")], "k int, t int, rv string"
    )
    return left, right


def test_asof_inner_latest_at_or_before(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="t")
    got = {(r["k"], r["t"]): (r["r_t"], r["r_rv"]) for r in out.collect()}
    assert got == {
        (1, 10): (5, "R5"),
        (1, 20): (20, "R20"),  # equal timestamps match (<=)
    }  # (2, 5) unmatched: right t=9 is later -> dropped by inner


def test_asof_left_keeps_unmatched(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="t", how="left")
    got = {(r["k"], r["t"]): r["r_rv"] for r in out.collect()}
    assert got[(2, 5)] is None
    assert len(got) == 3


def test_asof_oracle(spark):
    compare_query(spark, "asof_purchase_after_view", SF_SMOKE)
