"""k-fold split assignment and versioned time-travel reads."""

from __future__ import annotations

import pyspark.sql.functions as F

from disco_spark.sampling import K_FOLDS, kfold_assign
from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_kfold_oracle(spark):
    compare_query(spark, "split_kfold_counts", SF_CORRECT)


def test_timetravel_oracle(spark):
    compare_query(spark, "timetravel_orders_versions", SF_CORRECT)


def test_kfold_disjoint_exhaustive_balanced(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    folds = kfold_assign(df, "k")
    counts = {
        r["fold"]: r["c"]
        for r in folds.groupBy("fold").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert set(counts) == set(range(K_FOLDS))  # exhaustive fold ids
    assert sum(counts.values()) == 5000  # disjoint + exhaustive rows
    # balance: each fold within 20% of the ideal 1/k share
    for c in counts.values():
        assert abs(c - 1000) < 200, counts


def test_kfold_stable_under_repartition(spark):
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    a = {r["k"]: r["fold"] for r in kfold_assign(df, "k").collect()}
    b = {
        r["k"]: r["fold"]
        for r in kfold_assign(df.repartition(13), "k").collect()
    }
    assert a == b


def test_timetravel_v0_unchanged_after_v1(spark):
    """AS OF 0 must equal the original snapshot even though v1 landed
    in the same store — history is never rewritten."""
    from disco_spark.operators.timetravel import _write_versions, read_as_of
    from disco_spark.session import load_tables

    base = _write_versions(spark, SF_SMOKE)
    v0 = read_as_of(spark, base, 0)
    orig = load_tables(spark, SF_SMOKE)["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    diff = v0.select("o_orderkey", "cents").exceptAll(orig)
    assert diff.count() == 0
    assert v0.count() == orig.count()


def test_timetravel_v1_reprices_only_odd(spark):
    from disco_spark.operators.timetravel import _write_versions, read_as_of

    base = _write_versions(spark, SF_SMOKE)
    v0 = read_as_of(spark, base, 0).select(
        "o_orderkey", F.col("cents").alias("c0")
    )
    v1 = read_as_of(spark, base, 1).select(
        "o_orderkey", F.col("cents").alias("c1")
    )
    j = v0.join(v1, "o_orderkey")
    changed_even = j.filter(
        (F.col("o_orderkey") % 2 == 0) & (F.col("c0") != F.col("c1"))
    ).count()
    unchanged_odd = j.filter(
        (F.col("o_orderkey") % 2 == 1)
        & (F.col("c1") != F.expr("c0 * 11 div 10"))
    ).count()
    assert changed_even == 0 and unchanged_odd == 0
