"""Registered queries for the source-reader and external-program
surfaces (everything here has a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.operators.external import pipe_table
from disco_spark.registry import query
from disco_spark.session import load_tables
from disco_spark.sources.readers import read_raw


@query(
    "source_re_reader",
    oracle="""
    SELECT m AS match, COUNT(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS m FROM documents)
    GROUP BY m
    """,
)
def source_re_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """re_reader parity (reference task_io.py:251-317): every regex match
    is a record; counted per match here to keep output bounded."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(F.explode(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+a[a-z]*"), 0)).alias("match"))
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "source_raw_literals",
    oracle="""
    SELECT * FROM (VALUES ('alpha'), ('beta'), ('gamma')) AS t(value)
    """,
)
def source_raw_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw:// parity: the URL body is the record (scheme_raw.py:1-10)."""
    return read_raw(spark, ["raw://alpha", "raw://beta", "raw://gamma"])


@query(
    "external_pipe_upper",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS doc_id, upper(text) AS text_upper FROM documents",
)
def external_pipe_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-program operator end-to-end: documents piped through
    `tr a-z A-Z` as an executor-side subprocess (external.py parity)."""
    t = load_tables(spark, sf_dir)
    return pipe_table(
        t["documents"].select("doc_id", "text"),
        "tr 'a-z' 'A-Z'",
        "doc_id string, text_upper string",
    )
