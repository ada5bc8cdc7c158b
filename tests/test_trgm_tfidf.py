"""Trigram-index wildcard search (index/trgm.py) and tf-idf bigram
cosine dedup (textops/tfidf.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_trgm_oracle(spark):
    compare_query(spark, "search_trigram_wildcard", SF_CORRECT)


def test_tfidf_cosine_oracle(spark):
    compare_query(spark, "dedup_tfidf_cosine_bigram", SF_CORRECT)


def _write_docs(spark, dd, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(dd, "documents.parquet"))


def test_trgm_verify_kills_false_candidates(spark):
    """'w fox fastest' contains every trigram of the pattern 'w fast'
    ('w f', ' fa', 'fas', 'ast') without containing the pattern — the
    posting intersection proposes it, the verify pass must reject it.
    'slow fast' genuinely contains it; 'w fast w fast' counts 2."""
    from disco_spark.index.trgm import search_trigram_wildcard

    with tempfile.TemporaryDirectory() as dd:
        _write_docs(
            spark,
            dd,
            ["slow fast window", "w fox fastest ast", "w fast w fast"],
        )
        got = {
            (r["pattern"], r["doc_id"]): r["n_hits"]
            for r in search_trigram_wildcard(spark, dd).collect()
        }
    wf = {k: v for k, v in got.items() if k[0] == "w fast"}
    assert wf == {("w fast", 0): 1, ("w fast", 2): 2}
    # 'indow' matched via the index too
    assert got[("indow", 0)] == 1
    # absent pattern produced nothing
    assert not any(p == "zzz" for p, _ in got)


def test_tfidf_cosine_identical_docs_score_one(spark):
    """Two identical docs -> cosine exactly 1.0; a vocabulary-disjoint
    doc pairs with neither."""
    from disco_spark.textops.tfidf import dedup_tfidf_cosine_bigram

    with tempfile.TemporaryDirectory() as dd:
        _write_docs(
            spark,
            dd,
            [
                "alpha beta gamma delta epsilon",
                "alpha beta gamma delta epsilon",
                "zeta eta theta iota kappa",
            ],
        )
        rows = dedup_tfidf_cosine_bigram(spark, dd).collect()
    assert [(r["doc_a"], r["doc_b"], r["cosine"]) for r in rows] == [
        (0, 1, 1.0)
    ]


def test_tfidf_cosine_planted_gap_on_real_corpus(spark):
    """The registered threshold sits in a measured dead zone on the
    real corpus: every reported pair is far above it (>= 0.8), and
    there are exactly the 25 planted near-dup pairs."""
    from disco_spark.textops.tfidf import dedup_tfidf_cosine_bigram

    rows = dedup_tfidf_cosine_bigram(spark, SF_CORRECT).collect()
    assert len(rows) == 25
    assert all(r["cosine"] >= 0.8 for r in rows)
