"""Plan-shape gates for the round-7 operators: the scale claims
PERFORMANCE.md records are asserted on executed plans so a regression
(an extra Exchange, a lost TakeOrdered lowering, a vanished dynamic
partition filter) fails loudly instead of silently costing a shuffle at
100 TB. Complements the repo-wide no-BatchEvalPython gate
(test_plan_hygiene.py)."""

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


def test_sessionize_single_exchange(spark):
    """Both windows and the final agg ride ONE user_id Exchange."""
    assert _n_exchanges(_plan(spark, "events_sessionize_gap")) == 1


def test_session_funnel_two_exchanges(spark):
    """Sessionization + per-session fold share the user_id Exchange; the
    outcome rollup is the one extra shuffle (session-level rows keyed by
    outcome — inherently a different key, and only 3 distinct values)."""
    assert _n_exchanges(_plan(spark, "events_session_funnel")) == 2


def test_vocab_cut_lowers_to_take_ordered(spark):
    """The top-500 vocab cut must be TakeOrderedAndProject — a global
    row_number window here would single-partition the whole term table."""
    plan = _plan(spark, "vocab_coverage_oov")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_dpp_plan_keeps_dynamic_pruning(spark):
    """The partitioned-fact join plans a dynamicpruning partition filter
    (duplicated from test_round7_ops at the REGISTERED query level: this
    runs the actual query's plan, not a reconstruction)."""
    plan = _plan(spark, "dpp_partition_pruned_join")
    assert "dynamicpruning" in plan


def test_gapfill_no_python_and_bounded_exchanges(spark):
    plan = _plan(spark, "events_gapfill_hourly")
    assert "BatchEvalPython" not in plan
    # grain agg + bounds agg + join keys: the spine never exceeds a
    # handful of partitioned exchanges
    assert _n_exchanges(plan) <= 5


def test_cdc_single_key_exchange(spark):
    """Latest-wins collapses on ONE merge-key Exchange (the union's two
    branches share the scan; the window is the only shuffle consumer)."""
    assert _n_exchanges(_plan(spark, "cdc_upsert_latest_wins")) == 1
