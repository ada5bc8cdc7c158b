"""Oracle-match tests for the relational suite (SURVEY §2.3/2.5 parity)."""

from __future__ import annotations

import pytest

from disco_spark import registry
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()

RELATIONAL = [
    "q1_pricing_summary",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "q16_parts_supplier_count",
    "q19_disjunctive_revenue",
    "q2_min_acctbal_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q22_prospect_customers",
    "q12_late_shipments",
    "q20_heavy_suppliers",
    "q21_return_then_clean_customers",
    "window_cumulative_revenue",
    "window_order_gap_days",
    "window_price_decile",
    "q3_shipping_priority",
    "q5_local_supplier",
    "join_count_by_priority",
    "broadcast_dim_join",
    "topk_orders",
    "global_sort_orders",
    "distinct_segments",
    "intersect_customers",
    "except_customers",
    "union_all_keys",
    "semi_join_active_customers",
    "anti_join_idle_customers",
    "theta_join_nation_pairs",
    "range_histogram_totalprice",
    "group_all_stats",
    "rollup_orders_by_status_priority",
    "pivot_orders_status_by_priority",
    "cube_orders_by_status_priority",
    "percentiles_totalprice_by_priority",
    "window_top_order_per_customer",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_oracle(spark, name):
    compare_query(spark, name, SF_SMOKE)


def test_pivot_unpivot_roundtrip(spark):
    """Melting the pivot matrix back to long format must reproduce the
    direct groupBy counts exactly (unpivot is the inverse reshape)."""
    from disco_spark.operators.relational2 import (
        _PRIORITIES,
        _PRIORITY_COLS,
        pivot_orders_status_by_priority,
    )
    from disco_spark.session import load_tables

    wide = pivot_orders_status_by_priority(spark, SF_SMOKE)
    long = wide.unpivot("status", _PRIORITY_COLS, "pcol", "n")
    got = {
        (r.status, r.pcol): r.n for r in long.collect() if r.n and r.n > 0
    }
    orders = load_tables(spark, SF_SMOKE)["orders"]
    col_of = dict(zip(_PRIORITIES, _PRIORITY_COLS))
    want = {
        (r.o_orderstatus, col_of[r.o_orderpriority]): r["count"]
        for r in orders.groupBy("o_orderstatus", "o_orderpriority").count().collect()
        if r["count"] > 0
    }
    assert got == want and want
