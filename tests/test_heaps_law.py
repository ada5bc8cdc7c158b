"""Heaps-law vocabulary-growth estimator (textops/heaps.py)."""

from __future__ import annotations

import math
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_heaps_oracle(spark):
    compare_query(spark, "vocab_heaps_law", SF_CORRECT)


def test_frozen_vocab_reads_beta_zero(spark):
    """A corpus whose vocabulary saturates in the first bucket — the
    exact pathology of the interleave-salted scale artifact — must fit
    beta = 0: the warning light the operator exists to raise."""
    from disco_spark.textops.heaps import vocab_heaps_law

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(40)],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = vocab_heaps_law(spark, dd).collect()
    assert len(rows) == 10
    assert all(r["cum_vocab"] == 4 for r in rows)
    assert all(r["heaps_beta"] == 0.0 for r in rows)
    assert all(r["heaps_k"] == 4.0 for r in rows)


def test_power_law_corpus_recovers_beta(spark):
    """A corpus constructed to grow vocabulary as V = N_docs^0.5 (doc i
    contributes its own fresh types at a sqrt-telescoping rate) must
    fit beta close to the planted exponent."""
    from disco_spark.textops.heaps import vocab_heaps_law

    rows_in, next_type = [], 0
    for i in range(1, 101):
        # cumulative types after doc i ~ 40 * i^0.5; each doc repeats a
        # fixed-size window of the newest types so occurrences stay flat
        want_cum = int(40 * math.sqrt(i))
        fresh = [f"t{j}" for j in range(next_type, want_cum)]
        next_type = max(next_type, want_cum)
        window = [f"t{j}" for j in range(max(0, next_type - 20), next_type)]
        rows_in.append((i, " ".join(fresh + window * 3)))
    docs = spark.createDataFrame(rows_in, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        out = vocab_heaps_law(spark, dd).collect()
    beta = out[0]["heaps_beta"]
    assert 0.3 < beta < 0.7, beta
    # the curve itself is monotone and ends at the planted vocab size
    assert out[-1]["cum_vocab"] == next_type
