"""Data-quality constraint audit (operators/quality.py): oracle parity
plus planted-violation assertions against the shipped helpers."""

from __future__ import annotations

import pyspark.sql.functions as F

from disco_spark.operators.quality import (
    constraint_counts,
    duplicate_key_count,
    fk_violations,
)
from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_quality_oracle(spark):
    compare_query(spark, "quality_constraint_violations", SF_CORRECT)


def test_constraint_counts_planted(spark):
    """3 nulls and 2 out-of-range rows out of 10 -> exact counts, and a
    never-violated rule reports 0 (not a missing row)."""
    df = spark.range(0, 10).select(
        F.when(F.col("id") < 3, None).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 100).alias("v"),
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in constraint_counts(
            df,
            {
                "k_null": F.col("k").isNull(),
                "v_over_700": F.col("v") > 700,
                "never": F.lit(False),
            },
        ).collect()
    }
    assert out == {"k_null": 3, "v_over_700": 2, "never": 0}


def test_fk_violations_planted(spark):
    child = spark.createDataFrame([(1,), (2,), (3,), (99,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = fk_violations(child, parent, "fk", "pk", "r").collect()
    assert out[0]["rule"] == "r" and out[0]["n_violations"] == 1


def test_duplicate_key_count_planted(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,), (3,)], "k long")
    out = duplicate_key_count(df, "k", "dups").collect()
    assert out[0]["n_violations"] == 3  # two extra 1s + one extra 3

    clean = spark.createDataFrame([(1,), (2,)], "k long")
    assert duplicate_key_count(clean, "k", "dups").collect()[0][
        "n_violations"
    ] == 0


def test_quality_rule_count_and_zero_rows_present(spark):
    """All 10 rules appear exactly once even when their count is 0."""
    from disco_spark.registry import QUERIES

    rows = QUERIES["quality_constraint_violations"](
        spark, SF_CORRECT
    ).collect()
    assert len(rows) == 10
    assert len({r["rule"] for r in rows}) == 10
    assert all(r["n_violations"] >= 0 for r in rows)
