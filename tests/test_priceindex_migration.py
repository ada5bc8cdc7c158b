"""Laspeyres index + quartile migration (relational3.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_laspeyres_oracle(spark):
    compare_query(spark, "part_price_index_laspeyres", SF_CORRECT)


def test_migration_oracle(spark):
    compare_query(spark, "customer_quartile_migration", SF_CORRECT)


def test_laspeyres_hand_values(spark):
    """One part, price 10 in 1995 and 12 in 1996 at any quantity ->
    index exactly 1.2; the base year is exactly 1.0."""
    from disco_spark.operators.relational3 import part_price_index_laspeyres

    rows = [
        # partkey, shipdate, qty, extendedprice (qty * unit price)
        (1, datetime.date(1995, 3, 1), 5.0, 50.0),
        (1, datetime.date(1995, 9, 1), 3.0, 30.0),
        (1, datetime.date(1996, 4, 1), 2.0, 24.0),
    ]
    df = spark.createDataFrame(
        rows,
        "l_partkey long, l_shipdate date, l_quantity double, "
        "l_extendedprice double",
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "lineitem.parquet"))
        out = {
            r["yr"]: r["laspeyres"]
            for r in part_price_index_laspeyres(spark, dd).collect()
        }
    assert out == {1995: 1.0, 1996: 1.2}


def test_migration_matrix_partitions_both_periods(spark):
    """Every quartile cell count is non-negative; row sums over
    q_late equal the early-quartile populations of customers active
    in BOTH periods; quartiles are 1..4."""
    from disco_spark.operators.relational3 import (
        customer_quartile_migration,
    )

    rows = customer_quartile_migration(spark, SF_CORRECT).collect()
    assert all(1 <= r["q_early"] <= 4 and 1 <= r["q_late"] <= 4
               for r in rows)
    total = sum(r["n_customers"] for r in rows)
    assert total > 1000  # most of the 1500 customers span both periods
    # diagonal should dominate corners on a stable-ish population
    diag = sum(r["n_customers"] for r in rows if r["q_early"] == r["q_late"])
    corner = sum(
        r["n_customers"]
        for r in rows
        if abs(r["q_early"] - r["q_late"]) == 3
    )
    assert diag > corner
