"""EWMA daily revenue smoother + FD audit (temporal.py, quality.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_ewma_oracle(spark):
    compare_query(spark, "orders_ewma_daily", SF_CORRECT)


def test_fd_oracle(spark):
    compare_query(spark, "fd_violations_audit", SF_CORRECT)


def _run_ewma(spark, daily_dollars):
    from disco_spark.operators.temporal import orders_ewma_daily

    base = datetime.date(2020, 1, 1)
    rows = [
        (i + 1, base + datetime.timedelta(days=i), float(v))
        for i, v in enumerate(daily_dollars)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "orders.parquet"))
        return orders_ewma_daily(spark, dd).collect()


def test_ewma_constant_series_is_identity(spark):
    """A flat series smooths to itself: renormalized kernel has unit
    gain, so ewma == actual on every full-window day, no spikes."""
    out = _run_ewma(spark, [100.0] * 20)
    # days 1..9 lack a full 10-day window -> 11 qualifying days
    assert len(out) == 11
    for r in out:
        assert r["actual_cents"] == 10000
        assert r["ewma_dollars"] == 100.0
        assert r["spike"] == 0


def test_ewma_flags_spike_day(spark):
    """A 10x jump on the last day: the kernel (alpha=0.3) only
    absorbs 30% of it, so actual > 1.5 * ewma -> spike."""
    out = _run_ewma(spark, [100.0] * 20 + [1000.0])
    last = out[-1]
    assert last["actual_cents"] == 100000
    # (0.3*1000 + (wsum-0.3)*100) / wsum ~ 377.85
    assert 300 < last["ewma_dollars"] < 400
    assert last["spike"] == 1
    assert all(r["spike"] == 0 for r in out[:-1])


def test_fd_detects_injected_violation(spark):
    """A duplicated p_partkey with two brands flips the key FD to
    violated; the clean orders keep o_orderkey -> o_custkey holding."""
    from disco_spark.operators.quality import fd_violations_audit

    part = spark.createDataFrame(
        [
            (1, "B1", "T1"),
            (1, "B2", "T1"),
            (2, "B1", "T2"),
        ],
        "p_partkey long, p_brand string, p_type string",
    )
    orders = spark.createDataFrame(
        [(10, 5, "1-URGENT"), (11, 5, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as dd:
        part.write.parquet(os.path.join(dd, "part.parquet"))
        orders.write.parquet(os.path.join(dd, "orders.parquet"))
        rows = {r["fd"]: r for r in fd_violations_audit(spark, dd).collect()}
    key_fd = rows["part: p_partkey -> p_brand"]
    assert key_fd["holds"] == 0
    assert key_fd["n_violating"] == 1
    assert key_fd["max_distinct_dep"] == 2
    assert rows["orders: o_orderkey -> o_custkey"]["holds"] == 1
    # brand B1 maps to two types -> violated; B2 to one -> holds
    brand_fd = rows["part: p_brand -> p_type"]
    assert brand_fd["n_violating"] == 1
    assert brand_fd["n_groups"] == 2
