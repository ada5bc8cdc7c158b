"""Deterministic sampling/splitting: oracle match + stability props."""

from __future__ import annotations

import pyspark.sql.functions as F

from disco_spark import registry
from disco_spark.sampling import deterministic_sample, train_val_test_split
from disco_spark.session import load_tables
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


def test_sample_oracle(spark):
    compare_query(spark, "sample_documents_10pct", SF_SMOKE)


def test_split_oracle(spark):
    compare_query(spark, "split_documents_counts", SF_SMOKE)


def test_sample_stable_under_repartition(spark):
    docs = load_tables(spark, SF_SMOKE)["documents"]
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(17), "doc_id", 0.2).collect()
    }
    assert a == b and a  # identical membership regardless of partitioning


def test_split_disjoint_exhaustive(spark):
    docs = load_tables(spark, SF_SMOKE)["documents"]
    split = train_val_test_split(docs, "doc_id")
    n = docs.count()
    by = dict(split.groupBy("split").count().collect()
              if False else [(r["split"], r["count"]) for r in split.groupBy("split").count().collect()])
    assert sum(by.values()) == n
    assert set(by) <= {"train", "val", "test"}
    # fractions approximately honored (hash uniformity)
    assert 0.05 < by.get("test", 0) / n < 0.15


def test_stratified_balance_oracle(spark):
    compare_query(spark, "sample_stratified_balance", SF_SMOKE)


def test_stratified_balance_equalizes(spark):
    """A 10:1-skewed corpus must come out ~balanced, deterministically."""
    from disco_spark.sampling import stratified_balance

    rows = [(i, "big") for i in range(500)] + [(1000 + i, "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out1 = {(r.doc_id, r.lang) for r in stratified_balance(df, "lang", "doc_id").collect()}
    out2 = {(r.doc_id, r.lang) for r in stratified_balance(df, "lang", "doc_id").collect()}
    assert out1 == out2  # deterministic
    from collections import Counter

    kept = Counter(l for _, l in out1)
    # big stratum downsampled to ~minority size (hash-binomial noise)
    assert 30 <= kept["big"] <= 70
    assert 30 <= kept["small"] <= 50
