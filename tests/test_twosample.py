"""Two-sample KS and Mann-Whitney U tests (operators/stats.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_ks_oracle(spark):
    compare_query(spark, "ks_test_price_segments", SF_CORRECT)


def test_mwu_oracle(spark):
    compare_query(spark, "mannwhitney_u_price_segments", SF_CORRECT)


def _run_both(spark, prices_a, prices_b):
    """Build a minimal customer+orders dataset with segment A getting
    prices_a and segment B prices_b; return (ks_row, mwu_row)."""
    from disco_spark.operators.stats import (
        TS_SEG_A,
        TS_SEG_B,
        ks_test_price_segments,
        mannwhitney_u_price_segments,
    )

    cust = [(k + 1, TS_SEG_A) for k in range(len(prices_a))] + [
        (1000 + k, TS_SEG_B) for k in range(len(prices_b))
    ]
    orders = [(i + 1, k + 1, float(p)) for i, (k, p) in
              enumerate(enumerate(prices_a))] + [
        (5000 + i, 1000 + k, float(p))
        for i, (k, p) in enumerate(enumerate(prices_b))
    ]
    cdf = spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string"
    )
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as dd:
        cdf.write.parquet(os.path.join(dd, "customer.parquet"))
        odf.write.parquet(os.path.join(dd, "orders.parquet"))
        ks = ks_test_price_segments(spark, dd).collect()[0]
        mwu = mannwhitney_u_price_segments(spark, dd).collect()[0]
    return ks, mwu


def test_separated_distributions_flag_significant(spark):
    """Fully separated samples: D = 1, |z| far above critical."""
    a = [100.0 + i for i in range(40)]
    b = [5000.0 + i for i in range(40)]
    ks, mwu = _run_both(spark, a, b)
    assert ks["d_stat"] == 1.0
    assert ks["significant"] == 1
    # A entirely below B -> R1 minimal -> U = 0 -> strongly negative z
    assert mwu["u_stat"] == 0.0
    assert mwu["z"] < -5
    assert mwu["significant"] == 1


def test_identical_distributions_not_significant(spark):
    """Same values in both arms: D = 0, z = 0 (ties midranked)."""
    vals = [100.0 + (i % 25) for i in range(50)]
    ks, mwu = _run_both(spark, vals, vals)
    assert ks["d_stat"] == 0.0
    assert ks["significant"] == 0
    # complete symmetry: U exactly at its mean n1*n2/2
    assert mwu["u_stat"] == 50.0 * 50 / 2
    assert mwu["z"] == 0.0
    assert mwu["significant"] == 0


def test_mwu_tie_midrank_exactness(spark):
    """3 vs 2 values with a cross-group tie: hand-computed midranks.

    A = [1, 3, 5], B = [3, 4]: ranks 1, 2.5 (midrank of the tied
    3s), 5 for A -> R1 = 8.5, U1 = 8.5 - 6 = 2.5."""
    ks, mwu = _run_both(spark, [1, 3, 5], [3, 4])
    assert mwu["u_stat"] == 2.5
    assert ks["significant"] == 0
