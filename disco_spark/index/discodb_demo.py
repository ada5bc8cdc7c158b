"""Registered DiscoDB-parity queries: CNF boolean search over an
inverted token index on `documents`, plus metaquery expansion
(reference examples/util/query_ddb.py:10-25, doc/howto/discodb.rst:33-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.index.discodb import InvertedIndex
from disco_spark.registry import query
from disco_spark.session import load_tables

_TOKS_CTE = """
    WITH toks AS (
      SELECT DISTINCT tok AS key, doc_id AS value
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok, doc_id FROM documents)
      WHERE tok <> ''
    )
"""


def _token_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    t = load_tables(spark, sf_dir)
    return InvertedIndex.from_tokens(t["documents"], "text", "doc_id")


@query(
    "discodb_query_and",
    oracle=_TOKS_CTE
    + """
    SELECT value FROM toks WHERE key = 'join'
    INTERSECT SELECT value FROM toks WHERE key = 'vector'
    INTERSECT SELECT value FROM toks WHERE key = 'spark'
    """,
)
def discodb_query_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _token_index(spark, sf_dir).query("join & vector & spark")


@query(
    "discodb_query_or_not",
    oracle=_TOKS_CTE
    + """
    SELECT * FROM (
      SELECT value FROM toks WHERE key = 'spark'
      UNION
      SELECT value FROM toks WHERE key = 'vector'
    )
    EXCEPT SELECT value FROM toks WHERE key = 'slow'
    """,
)
def discodb_query_or_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _token_index(spark, sf_dir).query("(spark | vector) & ~slow")


@query(
    "discodb_unique_keys",
    oracle=_TOKS_CTE + "SELECT DISTINCT key FROM toks",
)
def discodb_unique_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _token_index(spark, sf_dir).keys()


@query(
    "discodb_metaquery",
    oracle="""
    SELECT DISTINCT c.c_name AS value
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
    """,
)
def discodb_metaquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level key graph (region->nation, nation->customer): metaquery
    expands the first query's values as keys — the reference's key->keys
    metadata walk, realized as a self semi-join of the index."""
    t = load_tables(spark, sf_dir)
    edges_rn = (
        t["region"]
        .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("r_name").alias("key"), F.col("n_name").alias("value"))
    )
    edges_nc = (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("key"), F.col("c_name").alias("value"))
    )
    idx = InvertedIndex(edges_rn.unionAll(edges_nc))
    return idx.metaquery("ASIA")


@query(
    "discodb_items",
    oracle=_TOKS_CTE + "SELECT key, value FROM toks",
)
def discodb_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full index enumeration — the reference's items() method dispatch
    (scheme_discodb.py:20-25)."""
    return _token_index(spark, sf_dir).items()


@query(
    "discodb_unique_values",
    oracle=_TOKS_CTE + "SELECT DISTINCT value FROM toks",
)
def discodb_unique_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unique_values() enumeration (scheme_discodb.py:20-25)."""
    return _token_index(spark, sf_dir).unique_values()
