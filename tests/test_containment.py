"""Asymmetric containment dedup (dedup/dedup.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_containment_oracle(spark):
    compare_query(spark, "dedup_containment_ngram", SF_CORRECT)


def test_snippet_in_long_doc_high_containment_low_jaccard(spark):
    """The measure's reason to exist: a short doc pasted verbatim into
    a much longer one has containment 1.0 but Jaccard far below any
    dup threshold — and the SHORT doc is reported as contained."""
    from disco_spark.dedup.dedup import dedup_containment_ngram

    snippet = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, snippet),
            (2, filler + " " + snippet),
            (3, "totally unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = dedup_containment_ngram(spark, dd).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["contained_doc"], r["container_doc"]) == (1, 2)
    assert r["containment"] == 1.0
    # 3 shingles shared, |A|=3, |B|=63 -> jaccard = 3/63
    assert r["jaccard"] < 0.1


def test_disjoint_docs_produce_no_pairs(spark):
    from disco_spark.dedup.dedup import dedup_containment_ngram

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "v w x y z")],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        assert dedup_containment_ngram(spark, dd).collect() == []
