"""BM25 top-k retrieval and Zipf rank-frequency fit."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_bm25_oracle(spark):
    compare_query(spark, "bm25_topk_docs", SF_CORRECT)


def test_zipf_oracle(spark):
    compare_query(spark, "zipf_token_slope", SF_CORRECT)


def test_bm25_planted_ranking(spark):
    """More query-term occurrences (same length) => higher BM25; a doc
    with no query terms never appears."""
    from disco_spark.textops.ranking import bm25_topk_docs

    docs = [
        (1, "spark spark spark pad pad pad", "en", "s", 30),
        (2, "spark pad pad pad pad pad", "en", "s", 30),
        (3, "pad pad pad pad pad pad", "en", "s", 30),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        rows = bm25_topk_docs(spark, d).collect()
    got = {r["doc_id"]: r["bm25"] for r in rows}
    assert set(got) == {1, 2}
    assert got[1] > got[2] > 0


def test_zipf_slope_negative(spark):
    """Rank-frequency fit: slope strictly negative, r2 in [0, 1]."""
    from disco_spark.textops.ranking import zipf_token_slope

    row = zipf_token_slope(spark, SF_CORRECT).collect()[0]
    assert row["slope"] < 0
    assert 0.0 <= row["r2"] <= 1.0
    assert row["n"] > 10
