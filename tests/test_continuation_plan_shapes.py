"""Plan-shape gates for the round-7 continuation operators: the
single-Exchange and no-single-partition claims PERFORMANCE.md records,
asserted on executed plans so regressions fail loudly (same contract
as test_round7_plan_shapes.py)."""

from __future__ import annotations

import re

from disco_spark import registry

from tests.conftest import SF_SMOKE

registry.load_all()


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_single_exchange_family(spark):
    """Operators whose docstrings claim exactly ONE partitioned
    Exchange: bitmap rollup, interval coalescing, heatmap grid,
    magic-byte dispatch, basket structs, unpivot stats, JSON props."""
    for name in (
        "bitmap_user_active_days",
        "interval_coalesce_coverage",
        "heatmap_qty_price_bins",
        "multimodal_magic_dispatch",
        "order_basket_structs",
        "unpivot_lineitem_measures",
        "events_props_json_stats",
    ):
        assert _n_exchanges(_plan(spark, name)) == 1, name


def test_no_single_partition_window_in_harness_users(spark):
    """Skyline and RFM ride the two-pass harnesses — no ordered
    single-partition window may appear (1-row global aggs excluded by
    matching the window operator, not the exchange)."""
    for name in ("skyline_parts_price_size", "rfm_customer_segments"):
        plan = _plan(spark, name)
        assert not re.search(
            r"Window .*windowspecdefinition\(((?!PARTITION).)*ORDER",
            plan,
        ), name
        # the harness's partition-local windows all partition on _pid;
        # any Exchange SinglePartition must feed a keys=[] global
        # aggregate (1-row anchor like RFM's max(o_orderdate)) — never
        # carry table-sized rows
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" in line:
                nxt = lines[i + 1] if i + 1 < len(lines) else ""
                assert "HashAggregate(keys=[]" in nxt, (name, line, nxt)


def test_no_python_in_continuation_surface(spark):
    """None of the continuation queries may plan a Python eval node."""
    for name in (
        "events_markov_transitions",
        "bm25_topk_docs",
        "grouping_sets_orders",
        "winsorized_stats_orders",
        "benford_acctbal_audit",
        "gini_supplier_revenue",
        "lineitem_transit_backlog",
        "orders_seasonal_decompose",
        "phrase_search_bigram",
        "weighted_median_price_by_priority",
        "nation_trade_matrix",
        "events_type_jaccard_matrix",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
