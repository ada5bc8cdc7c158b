"""Temporal pattern analytics: day-of-week seasonality and
gaps-and-islands activity streaks.

Beyond-reference surface (the reference has no calendar machinery at
all; its examples treat time as opaque bytes). Both queries are
single-Exchange window/aggregate plans; all arithmetic is exact
integers until the final rounded ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


@query(
    "orders_seasonality_dow",
    # ISO day-of-week (1=Mon..7=Sun) order-volume profile; dev_ratio =
    # observed/uniform-expected as an exact-integer ratio
    oracle="""
    WITH d AS (SELECT isodow(o_orderdate) AS dow FROM orders),
    c AS (SELECT dow, COUNT(*) AS n FROM d GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.dow, c.n,
           ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
           ROUND(CAST(c.n * 7 AS DOUBLE) / t.total, 6) AS dev_ratio
    FROM c CROSS JOIN t
    """,
)
def orders_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality of order volume: per ISO weekday
    (1=Mon..7=Sun) the order count, its share, and the deviation ratio
    against a uniform week (1.0 = no seasonality) — the weekly-pattern
    profile every capacity/traffic forecast starts from.

    Spark's `weekday()` (0=Mon) + 1 replays DuckDB's `isodow` exactly;
    one grouped count folds map-side to 7 cells, the total rides along
    as a lazy broadcast 1-row aggregate."""
    o = load_tables(spark, sf_dir)["orders"]
    c = (
        o.select((F.expr("weekday(o_orderdate)") + 1).alias("dow"))
        .groupBy("dow")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = F.broadcast(c.agg(F.sum("n").alias("total")))
    return c.crossJoin(t).select(
        "dow",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.round(
            (F.col("n") * 7).cast("double") / F.col("total"), 6
        ).alias("dev_ratio"),
    )


@query(
    "customer_order_streaks",
    # gaps-and-islands over each customer's distinct order months:
    # island id = month_index - row_number (constant within a
    # consecutive run); output = months active + longest streak
    oracle="""
    WITH m AS (
      SELECT DISTINCT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS mi
      FROM orders
    ),
    g AS (
      SELECT o_custkey, mi,
             mi - ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY mi) AS grp
      FROM m
    ),
    runs AS (
      SELECT o_custkey, grp, COUNT(*) AS run_len
      FROM g GROUP BY 1, 2
    )
    SELECT o_custkey,
           CAST(SUM(run_len) AS BIGINT) AS n_active_months,
           MAX(run_len) AS longest_streak
    FROM runs GROUP BY o_custkey
    """,
)
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-month activity streaks per customer — the classic
    gaps-and-islands fold (month_index minus per-customer row_number is
    constant within each unbroken run). Output: total active months
    and the longest unbroken streak; the engagement-consistency metric
    behind "n-month streak" retention features.

    ONE Exchange on o_custkey serves the distinct, the island window,
    and both grouped folds; month indexes are pure integers."""
    o = load_tables(spark, sf_dir)["orders"]
    m = o.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("mi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mi")
    runs = (
        m.withColumn("grp", F.col("mi") - F.row_number().over(w))
        .groupBy("o_custkey", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("o_custkey").agg(
        F.sum("run_len").cast("bigint").alias("n_active_months"),
        F.max("run_len").alias("longest_streak"),
    )
