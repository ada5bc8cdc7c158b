"""EWMA backtest + template prefix clusters (temporal.py, analysis.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_backtest_oracle(spark):
    compare_query(spark, "orders_ewma_backtest", SF_CORRECT)


def test_template_oracle(spark):
    compare_query(spark, "doc_template_prefix_clusters", SF_CORRECT)


def _backtest(spark, daily_dollars):
    from disco_spark.operators.temporal import orders_ewma_backtest

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
        return orders_ewma_backtest(spark, dd).collect()[0]


def test_backtest_constant_series_guard(spark):
    """Flat series: both forecasters are perfect; the zero naive MAE
    makes skill NULL (guarded), not a divide-by-zero."""
    r = _backtest(spark, [100.0] * 25)
    assert r["mae_ewma"] == 0.0
    assert r["mae_naive"] == 0.0
    assert r["skill"] is None


def test_backtest_smoother_beats_naive_on_alternation(spark):
    """Alternating 100/200: persistence is always 100 off; the kernel
    averages toward ~150 so its error is roughly half -> skill > 0."""
    r = _backtest(spark, [100.0, 200.0] * 15)
    assert r["mae_naive"] == 100.0
    assert 0 < r["mae_ewma"] < 60
    assert r["skill"] > 0.4


def test_template_cluster_detection(spark):
    from disco_spark.textops.analysis import doc_template_prefix_clusters

    tmpl = "dear valued customer regarding your"
    docs = [
        (7, tmpl + " order of widgets"),
        (3, tmpl + " recent complaint about gadgets"),
        (9, tmpl + " subscription renewal"),
        (4, "completely different opening line here entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = doc_template_prefix_clusters(spark, dd).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 3
    assert rows[0]["rep_doc_id"] == 3
    assert rows[0]["prefix"] == tmpl
