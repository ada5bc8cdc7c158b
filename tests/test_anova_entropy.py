"""One-way ANOVA + payload entropy (stats.py, binary_ops.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_anova_oracle(spark):
    compare_query(spark, "anova_price_by_priority", SF_CORRECT)


def test_entropy_oracle(spark):
    compare_query(spark, "multimodal_payload_entropy", SF_CORRECT)


def test_anova_planted_group_effect(spark):
    """Three groups with means 100/100/500 and small within-group
    noise: SSB dwarfs SSW -> F enormous, significant."""
    from disco_spark.operators.stats import anova_price_by_priority

    rows = []
    k = 0
    for grp, mean in (("1-A", 100.0), ("2-B", 100.0), ("3-C", 500.0)):
        for i in range(30):
            k += 1
            rows.append((k, grp, mean + (i % 5)))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "orders.parquet"))
        r = anova_price_by_priority(spark, dd).collect()[0]
    assert r["n_groups"] == 3
    assert r["f_stat"] > 100
    assert r["significant"] == 1


def test_anova_null_on_identical_groups(spark):
    """Identical distributions across groups -> F ~ 0 (exactly 0 when
    every group has the same values in the same multiset)."""
    from disco_spark.operators.stats import anova_price_by_priority

    rows = [
        (g * 100 + i, f"{g}-G", 100.0 + i)
        for g in range(3)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "orders.parquet"))
        r = anova_price_by_priority(spark, dd).collect()[0]
    assert r["f_stat"] == 0.0
    assert r["significant"] == 0


def test_entropy_separates_random_from_degenerate(spark):
    """The planted audio stripe reads exactly 1 bit (two symbols,
    equal counts); md5 images read near-uniform and never below ~2.5
    bits on 32 nibbles."""
    from disco_spark.multimodal.binary_ops import (
        multimodal_payload_entropy,
    )

    out = {
        r["media_type"]: r
        for r in multimodal_payload_entropy(spark, SF_CORRECT).collect()
    }
    assert out["audio"]["entropy_mean"] == 1.0
    assert out["audio"]["entropy_min"] == out["audio"]["entropy_max"] == 1.0
    assert out["image"]["entropy_min"] > 2.5
    assert out["image"]["entropy_mean"] > 3.0
    assert out["image"]["entropy_max"] <= 4.0
