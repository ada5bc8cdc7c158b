"""Kaplan-Meier survival + ABC-XYZ matrix (temporal.py, relational3.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_km_oracle(spark):
    compare_query(spark, "customer_survival_km", SF_CORRECT)


def test_abcxyz_oracle(spark):
    compare_query(spark, "part_abc_xyz_matrix", SF_CORRECT)


def _km(spark, orders):
    from disco_spark.operators.temporal import customer_survival_km

    df = spark.createDataFrame(
        [
            (i + 1, ck, datetime.date.fromisoformat(d))
            for i, (ck, d) in enumerate(orders)
        ],
        "o_orderkey long, o_custkey long, o_orderdate date",
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "orders.parquet"))
        return customer_survival_km(spark, dd).collect()


def test_km_hand_curve_with_censoring(spark):
    """3 customers: churn at bucket 0, churn at bucket 2, censored at
    bucket 12 -> S = 2/3 then 1/3, flat after the censored exit."""
    rows = _km(
        spark,
        [
            (1, "2020-01-01"),  # tenure 0, churned
            (2, "2020-01-01"), (2, "2020-12-31"),  # censored at horizon
            (3, "2020-01-01"), (3, "2020-03-01"),  # tenure 60, churned
        ],
    )
    by_t = {r["t_bucket"]: r for r in rows}
    assert set(by_t) == {0, 2, 12}
    assert (by_t[0]["n_risk"], by_t[0]["d_churned"]) == (3, 1)
    assert abs(by_t[0]["s_hat"] - 0.666667) < 1e-6
    assert (by_t[2]["n_risk"], by_t[2]["d_churned"]) == (2, 1)
    assert abs(by_t[2]["s_hat"] - 0.333333) < 1e-6
    assert (by_t[12]["d_churned"], by_t[12]["c_censored"]) == (0, 1)
    assert by_t[12]["s_hat"] == by_t[2]["s_hat"]


def test_km_total_dieout_pins_zero(spark):
    """Everyone still at risk churns in the last occupied bucket:
    d = n_risk there -> S pinned to 0 (the ln(0) guard). Customer 2
    only sets the observation horizon and exits censored at t=0."""
    rows = _km(
        spark,
        [
            (1, "2020-01-01"), (1, "2020-03-01"),  # tenure 60, churned
            (2, "2020-09-01"),  # horizon setter, censored at t=0
        ],
    )
    by_t = {r["t_bucket"]: r for r in rows}
    assert by_t[0]["c_censored"] == 1 and by_t[0]["d_churned"] == 0
    assert by_t[0]["s_hat"] == 1.0
    assert (by_t[2]["n_risk"], by_t[2]["d_churned"]) == (1, 1)
    assert by_t[2]["s_hat"] == 0.0


def test_abcxyz_hand_cells(spark):
    """Part 1: 80% of revenue, constant weekly demand -> (A, X).
    Part 2: 20%, demand 1 vs 9 across two weeks (cv = 0.8) -> (C, Z)."""
    from disco_spark.operators.relational3 import part_abc_xyz_matrix

    base = datetime.date(1995, 1, 1)
    li = [
        # partkey, shipdate, qty, extendedprice, discount
        (1, base, 10.0, 20.0, 0.0),
        (1, base + datetime.timedelta(days=7), 10.0, 20.0, 0.0),
        (1, base + datetime.timedelta(days=14), 10.0, 20.0, 0.0),
        (1, base + datetime.timedelta(days=21), 10.0, 20.0, 0.0),
        (2, base, 1.0, 10.0, 0.0),
        (2, base + datetime.timedelta(days=7), 9.0, 10.0, 0.0),
    ]
    df = spark.createDataFrame(
        li,
        "l_partkey long, l_shipdate date, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "lineitem.parquet"))
        cells = {
            (r["abc_class"], r["xyz_class"]): r
            for r in part_abc_xyz_matrix(spark, dd).collect()
        }
    assert set(cells) == {("A", "X"), ("C", "Z")}
    assert cells[("A", "X")]["revenue_share"] == 0.8
    assert cells[("C", "Z")]["n_parts"] == 1


def test_abcxyz_full_partition(spark):
    """On the real table the cells partition all parts and shares sum
    to ~1."""
    from disco_spark.operators.relational3 import part_abc_xyz_matrix

    rows = part_abc_xyz_matrix(spark, SF_CORRECT).collect()
    assert sum(r["n_parts"] for r in rows) == 2000
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    assert all(r["abc_class"] in "ABC" and r["xyz_class"] in "XYZ"
               for r in rows)
