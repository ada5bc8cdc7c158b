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


# --- weighted sampling (sampling.weighted_sample_topn) ---------------------


def test_weighted_sample_oracle(spark):
    import disco_spark.sampling  # noqa: F401  (registration side-effect)

    compare_query(spark, "sample_weighted_topn", SF_CORRECT)


def test_weighted_sample_favors_heavy_weights(spark):
    """50 rows at weight 10000 among 1000 at weight 1: nearly all heavy
    rows must win a top-100 draw (deterministic md5 race)."""
    from disco_spark.sampling import weighted_sample_topn

    df = spark.range(0, 1050).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 50, 10000.0).otherwise(1.0).alias("w"),
    )
    sel = weighted_sample_topn(df, "k", F.col("w"), 100).collect()
    heavy = sum(1 for r in sel if r["k"] < 50)
    assert heavy >= 45, heavy
    assert len(sel) == 100


def test_weighted_sample_skews_long_docs(spark):
    """The registered length-weighted sample's mean n_chars must exceed
    the corpus mean."""
    from disco_spark.registry import QUERIES
    from disco_spark.session import load_tables

    sel = QUERIES["sample_weighted_topn"](spark, SF_SMOKE)
    mean_sel = sel.agg(F.avg("n_chars")).collect()[0][0]
    mean_all = (
        load_tables(spark, SF_SMOKE)["documents"]
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert mean_sel > mean_all


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from disco_spark.sampling import weighted_sample_topn

    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 10, 0.0).otherwise(1.0).alias("w"),
    )
    sel = weighted_sample_topn(df, "k", F.col("w"), 15).collect()
    assert len(sel) == 10 and all(r["k"] >= 10 for r in sel)
