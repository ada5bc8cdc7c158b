"""Positional phrase search and weighted median."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_phrase_oracle(spark):
    compare_query(spark, "phrase_search_bigram", SF_CORRECT)


def test_wmedian_oracle(spark):
    compare_query(spark, "weighted_median_price_by_priority", SF_CORRECT)


def test_phrase_planted_adjacency(spark):
    """Only ADJACENT '<a> <b>' counts; reversed or separated doesn't."""
    from disco_spark.textops.ranking import PHRASE, phrase_search_bigram

    a, b = PHRASE
    docs = [
        (1, f"{a} {b} pad {a} {b}", "en", "s", 10),   # 2 occurrences
        (2, f"{a} pad {b}", "en", "s", 10),           # separated: 0
        (3, f"{b} {a}", "en", "s", 10),               # reversed: 0
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_search_bigram(spark, d).collect()
        }
    assert got == {1: 2}


def test_wmedian_planted_weights(spark):
    """Weights dominate: price 10 with weight 9 vs price 100 with
    weight 1 -> weighted median 10."""
    from disco_spark.operators.relational3 import (
        weighted_median_price_by_priority,
    )

    li = [(1, 1, 10.0, 9.0), (2, 1, 100.0, 1.0)]
    od = [(1, "1-URGENT")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            li,
            "l_partkey long, l_orderkey long, l_extendedprice double,"
            " l_quantity double",
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        spark.createDataFrame(
            od, "o_orderkey long, o_orderpriority string"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        r = weighted_median_price_by_priority(spark, d).collect()[0]
    assert r["weighted_median_price"] == 10.0
    assert r["total_weight"] == 10
