"""Grouped elasticity regression and normalized-rank windows."""

from __future__ import annotations

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_elasticity_oracle(spark):
    compare_query(spark, "regr_qty_vs_discount_by_brand", SF_CORRECT)


def test_pctrank_oracle(spark):
    compare_query(spark, "window_percent_rank_prices", SF_CORRECT)


def test_pctrank_bounds(spark):
    """percent_rank spans [0,1] (0 for each group's min), cume_dist
    spans (0,1] and reaches exactly 1 at each group's max."""
    from disco_spark.operators.relational3 import (
        window_percent_rank_prices,
    )

    rows = window_percent_rank_prices(spark, SF_CORRECT).collect()
    by_grp = {}
    for r in rows:
        assert 0.0 <= r["pct_rank"] <= 1.0
        assert 0.0 < r["cum_dist"] <= 1.0
        g = by_grp.setdefault(r["o_orderpriority"], [0.0, 0.0])
        g[0] = max(g[0], r["pct_rank"])
        g[1] = max(g[1], r["cum_dist"])
    for grp, (mx_pr, mx_cd) in by_grp.items():
        assert mx_pr == 1.0 and mx_cd == 1.0, grp
