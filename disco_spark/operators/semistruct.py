"""Semi-structured (JSON) column processing.

The reference ships JSON support as an external C library binding
(`ref contrib/` json readers; the classic worker parses JSON in user
map functions — pure Python row-at-a-time). Spark-first: JSON path
extraction is a Catalyst expression (`get_json_object`), evaluated
JVM-side inside whole-stage codegen — no Python in the plan, the
schema stays columnar, and the extracted value participates in
predicate pushdown-adjacent pruning like any other column.

Scale: parsing cost is per-row but embarrassingly parallel and
shuffle-free; the aggregate below shuffles only the tiny
(event_type, partial-agg) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


@query(
    "events_props_json_stats",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           MIN(k) AS min_k, MAX(k) AS max_k,
           CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k
    FROM x GROUP BY event_type
    """,
)
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events ``props`` payload:
    ``$.k`` pulled out per row (JVM `get_json_object`, zero Python),
    then integer-exact stats per event type — the log-analytics
    "parse the attributes blob" primitive. Malformed/missing paths
    surface as NULLs and are counted, not dropped."""
    ev = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").isNull().cast("int"))
            .cast("bigint")
            .alias("n_null"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
        )
    )
