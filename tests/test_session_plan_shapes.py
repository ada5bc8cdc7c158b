"""Plan-shape gates for this session's operators (two-sample tests,
link prediction, EWMA, FD audit, containment, PMI, Theil, Lorenz) —
the scale claims their docstrings make, asserted on executed plans so
regressions fail loudly (same contract as test_round7_plan_shapes.py)."""

from __future__ import annotations

import re

from disco_spark import registry

from tests.conftest import SF_SMOKE

registry.load_all()


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_no_unbounded_sp_window(plan: str, name: str) -> None:
    """No ordered window without PARTITION BY (the single-task global
    sort every harness user must avoid)."""
    assert not re.search(
        r"Window .*windowspecdefinition\(((?!PARTITION).)*ORDER", plan
    ), name


def test_two_sample_harness_hygiene(spark):
    """KS and MWU ride the shared prefix harness: range-partitioned
    exchanges present, no global ordered window, SinglePartition only
    under keys=[] 1-row folds."""
    for name in ("ks_test_price_segments", "mannwhitney_u_price_segments"):
        plan = _plan(spark, name)
        assert "Exchange rangepartitioning" in plan, name
        _assert_no_unbounded_sp_window(plan, name)
        assert "CartesianProduct" not in plan, name


def test_graph_and_overlap_joins_are_keyed(spark):
    """Wedge/posting joins must be hash/merge joins on real keys —
    never a cartesian product."""
    for name in (
        "graph_ra_link_prediction",
        "graph_assortativity_degree",
        "dedup_containment_ngram",
        "vocab_pmi_collocations",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        _assert_no_unbounded_sp_window(plan, name)


def test_constant_size_aggregate_family(spark):
    """EWMA, FD audit, Theil: grouped/1-row folds only — no global
    ordered window, no cartesian; the only nested-loop joins are
    broadcast 1-row/kernel-sized sides."""
    for name in (
        "orders_ewma_daily",
        "fd_violations_audit",
        "theil_supplier_nation_decomposition",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        _assert_no_unbounded_sp_window(plan, name)


def test_token_budget_rides_prefix_harness(spark):
    """The per-source running-token cut must come from the shared
    range-partition prefix harness: every ordered window partitions by
    the harness's _pid (each task holds ~1/N rows), never by the
    low-cardinality source column (which would funnel a whole source
    through one task's sort)."""
    plan = _plan(spark, "sample_token_budget_per_source")
    assert "Exchange rangepartitioning" in plan
    keys = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert keys, "expected the harness window in the plan"
    assert all(k == "_pid" for k in keys), keys


def test_round9_dedup_ops_plan_hygiene(spark):
    """Calibration sweep and keep-best map: no cartesian products
    (the caps/total joins must be kernel-sized BROADCAST nested loops),
    and every ordered window partitions by a bounded key — per-bucket
    (band_idx, band_key), per-signature-group (mh*), or per-cluster —
    never an unpartitioned global sort."""
    for name, allowed in (
        ("dedup_band_cap_calibration", ("band_idx", "mh")),
        ("dedup_keep_best_quality", ("cluster_id", "mh")),
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        _assert_no_unbounded_sp_window(plan, name)
        for key in set(re.findall(r"windowspecdefinition\((\w+)#", plan)):
            assert key.startswith(allowed), (name, key)


def test_calibration_nonequi_join_builds_preaggregate(spark):
    """The calibration sweep's min_cap <= cap join must BUILD on the
    per-min_cap pre-aggregate (<= max(CAP_SWEEP) rows), never on the
    raw candidate-pair set: Spark cannot honor a broadcast hint on the
    preserved side of a left-outer BNLJ, so without the pre-aggregate
    it would broadcast every scored pair (executor OOM at scale)."""
    plan = _plan(spark, "dedup_band_cap_calibration")
    outer = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line and "LeftOuter" in line
    ]
    assert outer, "expected a left-outer BNLJ for the caps sweep"
    for line in outer:
        assert "BuildRight" in line, line
    # the build side must be the pre-aggregate: a HashAggregate on
    # min_cap feeds the broadcast exchange, so n_pairs/n_ok appear as
    # aggregate outputs in the plan
    assert re.search(r"n_pairs#\d+", plan) and re.search(r"n_ok#\d+", plan)


def test_lorenz_windows_only_over_deciles(spark):
    """The Lorenz cumulative window may order only the 10-row decile
    frame; ranks over raw customer revenue must come from the harness
    (no window ordering cents/rn)."""
    plan = _plan(spark, "orders_lorenz_deciles")
    assert "Exchange rangepartitioning" in plan
    for m in re.finditer(
        r"windowspecdefinition\(((?!PARTITION).)*ORDER BY (\w+)", plan
    ):
        assert m.group(2).startswith("decile"), m.group(0)
