"""Spearman rank stability and lang-ID confusion matrix."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_spearman_oracle(spark):
    compare_query(spark, "spearman_rank_stability", SF_CORRECT)


def test_langid_confusion_oracle(spark):
    compare_query(spark, "langid_confusion_matrix", SF_CORRECT)


def test_spearman_identical_and_inverted(spark):
    """Suppliers with identical cross-period revenue order score
    rho = 1; a perfectly inverted order scores rho = -1."""
    import datetime

    from disco_spark.operators.stats import (
        RANK_SPLIT_YEAR,
        spearman_rank_stability,
    )

    early = datetime.datetime(RANK_SPLIT_YEAR - 1, 6, 1)
    late = datetime.datetime(RANK_SPLIT_YEAR + 1, 6, 1)

    def run(rows):
        df = spark.createDataFrame(
            rows,
            "l_suppkey long, l_shipdate timestamp, l_extendedprice double,"
            " l_discount double",
        )
        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "lineitem.parquet"))
            return spearman_rank_stability(spark, d).collect()[0]

    same = []
    for s in range(1, 6):
        same.append((s, early, 100.0 * s, 0.0))
        same.append((s, late, 100.0 * s, 0.0))
    r = run(same)
    assert r["n_suppliers"] == 5 and r["spearman_rho"] == 1.0

    inv = []
    for s in range(1, 6):
        inv.append((s, early, 100.0 * s, 0.0))
        inv.append((s, late, 100.0 * (6 - s), 0.0))
    r = run(inv)
    assert r["spearman_rho"] == -1.0


def test_confusion_rows_normalize(spark):
    """Per-actual shares sum to 1; cell counts sum to corpus size."""
    from disco_spark.session import load_tables
    from disco_spark.textops.analysis import langid_confusion_matrix

    rows = langid_confusion_matrix(spark, SF_CORRECT).collect()
    n_docs = load_tables(spark, SF_CORRECT)["documents"].count()
    assert sum(r["n"] for r in rows) == n_docs
    by_actual = {}
    for r in rows:
        by_actual.setdefault(r["actual"], 0.0)
        by_actual[r["actual"]] += r["row_share"]
    for actual, s in by_actual.items():
        assert abs(s - 1.0) < 1e-4, (actual, s)
