"""Additive seasonal decomposition."""

from __future__ import annotations

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_decompose_oracle(spark):
    compare_query(spark, "orders_seasonal_decompose", SF_CORRECT)


def test_components_reconstruct_observed(spark):
    """observed == trend + seasonal + residual (to rounding)."""
    from disco_spark.operators.temporal import orders_seasonal_decompose

    rows = orders_seasonal_decompose(spark, SF_CORRECT).collect()
    assert len(rows) > 100
    for r in rows[:200]:
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert abs(recon - r["observed"]) < 1e-4, r


def test_seasonal_means_cancel(spark):
    """The seasonal component is mean-zero across the detrended series
    (per-dow means of a decomposition must cancel in aggregate)."""
    from disco_spark.operators.temporal import orders_seasonal_decompose

    rows = orders_seasonal_decompose(spark, SF_CORRECT).collect()
    resid_sum = sum(r["residual"] for r in rows)
    n = len(rows)
    # residuals average ~0 because per-dow seasonal means absorb the
    # detrended means exactly (up to dow-count imbalance and rounding)
    assert abs(resid_sum / n) < 1.0
