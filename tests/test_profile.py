"""Table profiling: oracle parity + approx-sketch variant + persist release."""

from __future__ import annotations

from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.operators.profile import profile_table
from disco_spark.session import load_tables
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


def test_profile_oracle(spark):
    compare_query(spark, "profile_orders_columns", SF_SMOKE)


def test_profile_nulls_and_approx(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None), (5, "a")], "id bigint, tag string"
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["tag"].n_nulls == 2
    assert prof["tag"].n_distinct == 2  # count_distinct ignores nulls
    assert prof["id"].n_distinct == 5
    assert prof["id"].min_repr == "1" and prof["id"].max_repr == "5"
    # approx variant: same schema, HLL estimates exact at this cardinality
    aprof = {r.column: r for r in profile_table(df, approx=True).collect()}
    assert aprof["id"].n_distinct == 5
    assert prof["tag"].n_rows == aprof["tag"].n_rows == 5


def test_profile_approx_handles_all_primitive_types(spark):
    """hll_sketch_agg rejects doubles/dates/timestamps directly — the
    approx path must sketch the string cast so ANY primitive column
    profiles (regression: approx=True crashed on orders.o_totalprice)."""
    from datetime import date, datetime

    df = spark.createDataFrame(
        [(1.5, date(2020, 1, 1), datetime(2020, 1, 1, 12), True),
         (2.5, date(2020, 1, 2), datetime(2020, 1, 2, 12), False),
         (1.5, date(2020, 1, 1), datetime(2020, 1, 1, 12), True)],
        "d double, dt date, ts timestamp, b boolean",
    )
    prof = {r.column: r for r in profile_table(df, approx=True).collect()}
    assert prof["d"].n_distinct == 2
    assert prof["dt"].n_distinct == 2
    assert prof["ts"].n_distinct == 2
    assert prof["b"].n_distinct == 2


def test_registered_query_releases_prior_persists(spark):
    """The registry wrapper must release the previous query's deferred
    persists on entry: after running a persist-heavy query and then any
    other registered query, no deferred handles remain resident."""
    from disco_spark import session as S

    registry.QUERIES["dedup_lsh_jaccard"](spark, SF_SMOKE).count()
    assert len(S._DEFERRED_PERSISTS) > 0  # the query deferred its shingles
    registry.QUERIES["profile_orders_columns"](spark, SF_SMOKE).count()
    # profile defers nothing, so the release-on-entry left the list empty
    assert len(S._DEFERRED_PERSISTS) == 0


def test_snapshot_diff_oracle(spark):
    from disco_spark.testing import compare_query
    from tests.conftest import SF_SMOKE

    compare_query(spark, "corpus_snapshot_diff", SF_SMOKE)


def test_approx_profile_plan_no_expand(spark):
    """The PERFORMANCE.md round-5 claim as a gate: the HLL profile plans
    as ONE partial/final agg — no Catalyst Expand (the exact
    multi-count_distinct plan has one), at most the single-row final
    merge exchange."""
    from disco_spark.operators.profile import profile_table
    from disco_spark.session import load_tables

    base = load_tables(spark, "/root/testdata/sf0.001")["orders"]
    plan = (
        profile_table(base, approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    assert plan.count("Exchange") <= 1
    # the exact profile lost its Expand in the r14 optimization round:
    # per-column count_distinct aggregations (column-pruned scans,
    # broadcast-crossed 1-row results) replaced the 6x Expand shuffle
    exact_plan = (
        profile_table(base)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in exact_plan
