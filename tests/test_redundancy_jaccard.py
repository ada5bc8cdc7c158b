"""Supplier redundancy histogram and event-type Jaccard matrix."""

from __future__ import annotations

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_redundancy_oracle(spark):
    compare_query(spark, "part_supplier_redundancy", SF_CORRECT)


def test_jaccard_oracle(spark):
    compare_query(spark, "events_type_jaccard_matrix", SF_CORRECT)


def test_redundancy_conserves_parts(spark):
    from pyspark.sql import functions as F

    from disco_spark.operators.relational3 import part_supplier_redundancy
    from disco_spark.session import load_tables

    rows = part_supplier_redundancy(spark, SF_CORRECT).collect()
    li = load_tables(spark, SF_CORRECT)["lineitem"]
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert all(r["n_suppliers"] >= 1 for r in rows)


def test_jaccard_bounds_and_symmetric_pairs(spark):
    """Jaccard in (0,1]; each unordered type pair appears once."""
    from disco_spark.operators.eventflow import events_type_jaccard_matrix

    rows = events_type_jaccard_matrix(spark, SF_CORRECT).collect()
    seen = set()
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0.0 < r["jaccard"] <= 1.0
        key = (r["type_a"], r["type_b"])
        assert key not in seen
        seen.add(key)
    # 5 event types -> at most C(5,2) = 10 pairs
    assert len(rows) <= 10
