"""Statistical aggregates (operators/stats.py): oracle parity on the
real tables plus planted-signal assertions against the SHIPPED
constructions (regr_by_group / corr_matrix / mutual_information)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from disco_spark.operators.stats import (
    corr_matrix,
    mutual_information,
    regr_by_group,
)
from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_regr_oracle(spark):
    compare_query(spark, "regr_price_vs_qty", SF_CORRECT)


def test_corr_matrix_oracle(spark):
    compare_query(spark, "stats_corr_matrix", SF_CORRECT)


def test_mutual_information_oracle(spark):
    compare_query(spark, "stats_mutual_information", SF_CORRECT)


def test_regr_recovers_planted_line(spark):
    """y = 3x + 7 exactly -> slope 3, intercept 7, r2 1 (group 'a');
    a noisy group recovers the same slope with r2 < 1."""
    df = spark.range(1, 201).select(
        F.lit("a").alias("g"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 3 + 7).cast("double").alias("y"),
    )
    # deterministic +/-1 alternating noise, zero-mean and uncorrelated
    # with x in pairs, so the fitted slope stays exactly 3
    noisy = spark.range(1, 201).select(
        F.lit("b").alias("g"),
        F.col("id").cast("double").alias("x"),
        (
            F.col("id") * 3
            + 7
            + F.when(F.col("id") % 2 == 0, 50.0).otherwise(-50.0)
        ).alias("y"),
    )
    out = {
        r["g"]: r
        for r in regr_by_group(df.unionByName(noisy), "x", "y", "g").collect()
    }
    assert out["a"]["slope"] == 3.0
    assert out["a"]["intercept"] == 7.0
    assert out["a"]["r2"] == 1.0
    assert abs(out["b"]["slope"] - 3.0) < 0.01
    assert out["b"]["r2"] < 0.999


def test_corr_matrix_planted(spark):
    """x2 = -x1 -> corr -1; x3 independent-ish of x1 -> |corr| small."""
    df = spark.range(0, 1000).select(
        F.col("id").cast("double").alias("x1"),
        (-F.col("id")).cast("double").alias("x2"),
        # bit-mixed pseudo-noise, decorrelated from the linear ramp
        (F.xxhash64(F.col("id")) % 1000).cast("double").alias("x3"),
    )
    out = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in corr_matrix(df, ["x1", "x2", "x3"]).collect()
    }
    assert out[("x1", "x2")] == -1.0
    assert abs(out[("x1", "x3")]) < 0.1
    assert len(out) == 3


def test_mutual_information_planted(spark):
    """b == a (fully dependent) -> MI = H(a) = ln 2 for a balanced
    binary column; an independent b -> MI ~ 0."""
    base = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("a"),
        (F.col("id") % 2).cast("string").alias("b"),
    )
    dep = mutual_information(base, "a", "b").collect()[0]
    assert abs(dep["mi_nats"] - math.log(2)) < 1e-6
    assert dep["n"] == 1000

    indep = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("a"),
        (F.floor(F.col("id") / 2) % 2).cast("string").alias("b"),
    )
    ind = mutual_information(indep, "a", "b").collect()[0]
    assert abs(ind["mi_nats"]) < 1e-6
    assert abs(ind["chi2"]) < 1e-6


def test_corr_single_scan_plan(spark):
    """The 4x4 matrix must read lineitem ONCE: exactly one parquet scan
    node in the physical plan (a per-pair corr() would scan 6x)."""
    from disco_spark.registry import QUERIES

    df = QUERIES["stats_corr_matrix"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
