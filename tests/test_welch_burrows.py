"""Welch's t-test + Burrows' Delta (stats.py, ranking.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_welch_oracle(spark):
    compare_query(spark, "welch_t_weekday_weekend", SF_CORRECT)


def test_burrows_oracle(spark):
    compare_query(spark, "text_burrows_delta_sources", SF_CORRECT)


def _welch(spark, weekday_vals, weekend_vals):
    from disco_spark.operators.stats import welch_t_weekday_weekend

    mon, sat = datetime.date(2020, 1, 6), datetime.date(2020, 1, 4)
    rows = [(i + 1, mon, float(v)) for i, v in enumerate(weekday_vals)] + [
        (1000 + i, sat, float(v)) for i, v in enumerate(weekend_vals)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "orders.parquet"))
        return welch_t_weekday_weekend(spark, dd).collect()[0]


def test_welch_separated_means_significant(spark):
    r = _welch(
        spark,
        [100 + (i % 5) for i in range(30)],
        [500 + (i % 5) for i in range(30)],
    )
    assert r["n_weekday"] == 30 and r["n_weekend"] == 30
    assert r["t"] < -5
    assert r["significant"] == 1


def test_welch_zero_variance_guard(spark):
    """All-constant arms: pooled variance 0 -> t/df NULL, not a
    divide-by-zero crash."""
    r = _welch(spark, [100] * 10, [100] * 10)
    assert r["t"] is None
    assert r["df"] is None
    assert r["significant"] == 0


def test_burrows_separates_registers(spark):
    """Sources A and B share a vocabulary profile; source C skews to
    different words -> delta(A,B) < delta(A,C) and delta(B,C)."""
    from disco_spark.textops.ranking import text_burrows_delta_sources

    a_text = "alpha beta gamma delta " * 10
    c_text = "omega psi chi phi " * 10
    docs = (
        [(i, "A", a_text) for i in range(5)]
        + [(10 + i, "B", a_text + " beta") for i in range(5)]
        + [(20 + i, "C", c_text) for i in range(5)]
    )
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = text_burrows_delta_sources(spark, dd).collect()
    d = {(r["source_a"], r["source_b"]): r["delta"] for r in rows}
    assert set(d) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert d[("A", "B")] < d[("A", "C")]
    assert d[("A", "B")] < d[("B", "C")]
