"""PMI collocations + Theil decomposition (vocab.py, relational3.py)."""

from __future__ import annotations

import math
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_pmi_oracle(spark):
    compare_query(spark, "vocab_pmi_collocations", SF_CORRECT)


def test_theil_oracle(spark):
    compare_query(spark, "theil_supplier_nation_decomposition", SF_CORRECT)


def test_pmi_hand_values(spark):
    """5 docs 'foo bar' + 5 docs 'a b c': all three bigrams clear the
    count floor; PMI(foo bar) = log2((5/15) / (5/25 * 5/25))."""
    from disco_spark.textops.vocab import vocab_pmi_collocations

    docs = [(i, "foo bar") for i in range(5)] + [
        (100 + i, "a b c") for i in range(5)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = vocab_pmi_collocations(spark, dd).collect()
    by_bigram = {r["bigram"]: r for r in rows}
    assert set(by_bigram) == {"foo bar", "a b", "b c"}
    expect = math.log2((5 / 15) / ((5 / 25) * (5 / 25)))
    assert abs(by_bigram["foo bar"]["pmi"] - round(expect, 6)) < 1e-6
    assert by_bigram["foo bar"]["n_xy"] == 5


def _run_theil(spark, nation_revenues):
    """nation_revenues: {nationkey: [revenue dollars per supplier]}."""
    from disco_spark.operators.relational3 import (
        theil_supplier_nation_decomposition,
    )

    sup, li, sk = [], [], 0
    for nk, revs in nation_revenues.items():
        for r in revs:
            sk += 1
            sup.append((sk, nk))
            li.append((sk, float(r), 0.0))
    sdf = spark.createDataFrame(sup, "s_suppkey long, s_nationkey long")
    ldf = spark.createDataFrame(
        li, "l_suppkey long, l_extendedprice double, l_discount double"
    )
    with tempfile.TemporaryDirectory() as dd:
        sdf.write.parquet(os.path.join(dd, "supplier.parquet"))
        ldf.write.parquet(os.path.join(dd, "lineitem.parquet"))
        return theil_supplier_nation_decomposition(spark, dd).collect()[0]


def test_theil_equal_revenues_zero(spark):
    r = _run_theil(spark, {1: [100, 100], 2: [100, 100]})
    assert r["theil_total"] == 0.0
    assert r["theil_between"] == 0.0
    assert r["theil_within"] == 0.0


def test_theil_pure_between_group_inequality(spark):
    """Equal within each nation, unequal across: the whole index is
    the between component. T = (1/n) sum (x/mu) ln(x/mu) with
    x/mu in {4/3, 2/3}."""
    r = _run_theil(spark, {1: [200, 200], 2: [100, 100]})
    expect = 0.5 * ((4 / 3) * math.log(4 / 3) + (2 / 3) * math.log(2 / 3))
    assert abs(r["theil_total"] - round(expect, 6)) < 1e-6
    assert abs(r["theil_between"] - r["theil_total"]) < 1e-6
    assert r["theil_within"] == 0.0
    assert r["between_share"] == 1.0


def test_theil_pure_within_group_inequality(spark):
    """Identical nation totals and sizes, inequality only inside:
    between = 0, within = total."""
    r = _run_theil(spark, {1: [150, 50], 2: [150, 50]})
    assert r["theil_between"] == 0.0
    assert r["theil_total"] > 0
    assert r["theil_within"] == r["theil_total"]
