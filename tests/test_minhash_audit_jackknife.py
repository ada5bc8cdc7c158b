"""MinHash estimator audit + jackknife CI (dedup.py, stats.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_minhash_audit_oracle(spark):
    compare_query(spark, "dedup_minhash_estimate_audit", SF_CORRECT)


def test_jackknife_oracle(spark):
    compare_query(spark, "orders_mean_ci_jackknife", SF_CORRECT)


def test_minhash_audit_identical_docs_agree_exactly(spark):
    """Two identical docs: every signature component matches AND exact
    Jaccard is 1 -> zero estimator error; a disjoint doc never pairs."""
    from disco_spark.dedup.dedup import dedup_minhash_estimate_audit

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words here now")],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = dedup_minhash_estimate_audit(spark, dd).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["est_jaccard"] == 1.0
    assert r["exact_jaccard"] == 1.0
    assert r["abs_err"] == 0.0


def test_jackknife_ci_statistics(spark):
    """CI brackets the mean symmetrically; se is positive and small
    relative to the mean on 15k uniform orders; the plain mean matches
    the exact cents ratio."""
    from disco_spark.operators.stats import orders_mean_ci_jackknife

    r = orders_mean_ci_jackknife(spark, SF_CORRECT).collect()[0]
    assert r["n_orders"] == 15000
    assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
    width_lo = r["mean_value"] - r["ci_lo"]
    width_hi = r["ci_hi"] - r["mean_value"]
    assert abs(width_lo - width_hi) < 0.01
    assert 0 < r["se_jackknife"] < r["mean_value"] * 0.05
