"""Table profiling: per-column data-quality statistics in ONE scan —
the audit pass every ingest pipeline runs before trusting a new drop of
data (null rates, distinct cardinality, numeric ranges, string length
envelope).

Shape at 100 TB: all columns' aggregates compute in a single
partial/final aggregation over one scan (no per-column passes, no
shuffle of the data itself — only k aggregate buffers); the per-column
rows are then unpivoted driver-free with a literal stack. Exact
distinct counts are the one shuffle-bearing measure, so the operator
takes `approx` to swap them for HLL sketches (same single-scan plan,
no shuffle) — exact is the oracle-checked default at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr, avg_len). min/max are cast to string so mixed
    column types fit one schema; avg_len is the mean string-repr length
    (a cheap width/size signal)."""
    aggs = []
    for c in df.columns:
        col = F.col(c)
        s = col.cast("string")
        # hll_sketch_agg accepts only int/bigint/string/binary — sketch
        # the STRING CAST so doubles/dates/decimals profile too (the
        # cast is injective for primitives, so cardinality is preserved)
        n_distinct = (
            F.hll_sketch_estimate(F.hll_sketch_agg(s))
            if approx
            else F.count_distinct(col)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            n_distinct.cast("bigint").alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
            F.round(F.avg(F.length(s)), 6).alias(f"{c}__avglen"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`, `{c}__avglen`"
        for c in df.columns
    )
    return wide.select(
        F.expr(
            f"stack({len(df.columns)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, n_distinct, min_repr, max_repr, avg_len)"
        )
    )


_PROFILE_ORACLE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_ORACLE_COLS:
        parts.append(f"""
    SELECT '{c}' AS column,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           MIN(CAST({c} AS VARCHAR)) AS min_repr,
           MAX(CAST({c} AS VARCHAR)) AS max_repr,
           ROUND(AVG(LENGTH(CAST({c} AS VARCHAR))), 6) AS avg_len
    FROM orders""")
    return " UNION ALL ".join(parts)


@query("profile_orders_columns", oracle=_profile_oracle())
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan column profile of the orders table (5 columns)."""
    t = load_tables(spark, sf_dir)
    return profile_table(t["orders"].select(*_PROFILE_ORACLE_COLS))
