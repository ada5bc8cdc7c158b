"""Cohort LTV, per-source dup rate, Heaps vocabulary growth."""

from __future__ import annotations

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_ltv_oracle(spark):
    compare_query(spark, "orders_cohort_ltv", SF_CORRECT)


def test_duprate_oracle(spark):
    compare_query(spark, "dedup_rate_by_source", SF_CORRECT)


def test_heaps_oracle(spark):
    compare_query(spark, "vocab_growth_heaps", SF_CORRECT)


def test_ltv_monotone_within_cohort(spark):
    """Cumulative LTV never decreases with months_since."""
    from disco_spark.operators.relational2 import orders_cohort_ltv

    rows = orders_cohort_ltv(spark, SF_CORRECT).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_m"], []).append(
            (r["months_since"], r["cum_ltv_per_customer"])
        )
    for cohort, pairs in by_cohort.items():
        pairs.sort()
        vals = [v for _, v in pairs]
        assert vals == sorted(vals), (cohort, vals)


def test_duprate_totals_match_corpus(spark):
    from disco_spark.dedup.cc import dedup_rate_by_source
    from disco_spark.session import load_tables

    rows = dedup_rate_by_source(spark, SF_CORRECT).collect()
    n_docs = load_tables(spark, SF_CORRECT)["documents"].count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0


def test_heaps_monotone_and_bounded(spark):
    """Vocab/doc/token counts all grow with the prefix; vocab never
    exceeds tokens."""
    from disco_spark.textops.ranking import vocab_growth_heaps

    rows = sorted(
        vocab_growth_heaps(spark, SF_CORRECT).collect(),
        key=lambda r: r["pct"],
    )
    assert [r["pct"] for r in rows] == [10, 25, 50, 100]
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] <= b["n_docs"]
        assert a["n_tokens"] <= b["n_tokens"]
        assert a["vocab_size"] <= b["vocab_size"]
    for r in rows:
        assert r["vocab_size"] <= r["n_tokens"]
    assert rows[-1]["vocab_size"] > 0
