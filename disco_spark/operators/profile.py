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
    (a cheap width/size signal).

    Exact-mode plan (guide §2.3/§7.2): k count_distincts mixed into one
    aggregate make Catalyst Expand the scan k+1-fold and shuffle the
    replicated rows — the one data-sized shuffle this operator had.
    Instead the non-distinct measures compute in ONE scan (no Expand,
    partial/final agg only) and each exact n_distinct runs as its own
    single-COLUMN aggregation (column-pruned scan, shuffle = that
    column's distinct values after map-side dedup); the k+1 one-row
    results recombine by broadcast cross join. Approx mode (HLL) never
    had the Expand and keeps its single-pass shape.

    Wide-table tradeoff: exact mode now pays k+1 scans (one full, k
    column-pruned) plus k one-row broadcast joins instead of Expand's
    single k+1-fold-replicated shuffle. Measured a win on the 5-column
    orders table (columnar source: each extra scan reads ONE column);
    on very wide tables or non-columnar/row-oriented sources, the
    repeated scans can dominate — there, or whenever exactness is not
    the contract, use approx=True (single pass, no distinct shuffles
    at all)."""
    aggs = []
    for c in df.columns:
        col = F.col(c)
        s = col.cast("string")
        # hll_sketch_agg accepts only int/bigint/string/binary — sketch
        # the STRING CAST so doubles/dates/decimals profile too (the
        # cast is injective for primitives, so cardinality is preserved)
        if approx:
            aggs.append(
                F.hll_sketch_estimate(F.hll_sketch_agg(s))
                .cast("bigint")
                .alias(f"{c}__distinct")
            )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
            F.round(F.avg(F.length(s)), 6).alias(f"{c}__avglen"),
        ]
    wide = df.agg(*aggs)
    if not approx:
        for c in df.columns:
            wide = wide.crossJoin(
                F.broadcast(
                    df.select(c).agg(
                        F.count_distinct(F.col(c))
                        .cast("bigint")
                        .alias(f"{c}__distinct")
                    )
                )
            )
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
    """Column profile of the orders table (5 columns).

    Exact n_distinct is what makes this oracle-checkable, but it is
    also the plan's one scale cost: as of this round each exact
    distinct runs as its own column-pruned aggregation instead of a
    Catalyst Expand replicating the scan 6-fold through one shuffle
    (see profile_table). At 100 TB call profile_table(approx=True)
    — or the registered profile_orders_columns_approx — whose HLL
    sketches keep the whole profile a single partial/final agg with no
    per-column distinct passes (PERFORMANCE.md, round 5)."""
    t = load_tables(spark, sf_dir)
    return profile_table(t["orders"].select(*_PROFILE_ORACLE_COLS))


def _profile_approx_oracle() -> str:
    """Same exact profile, plus the literal invariant bit (see below)."""
    parts = []
    for c in _PROFILE_ORACLE_COLS:
        parts.append(f"""
    SELECT '{c}' AS column,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           MIN(CAST({c} AS VARCHAR)) AS min_repr,
           MAX(CAST({c} AS VARCHAR)) AS max_repr,
           ROUND(AVG(LENGTH(CAST({c} AS VARCHAR))), 6) AS avg_len,
           TRUE AS distinct_within_5pct
    FROM orders""")
    return " UNION ALL ".join(parts)


@query("profile_orders_columns_approx", oracle=_profile_approx_oracle())
def profile_orders_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the approx (HLL-sketch) profile path.

    Sketch estimates are engine-specific — Spark's DataSketches HLL and
    DuckDB's HLL disagree in the last digits — so hashing the raw
    estimate cross-engine can never be green. Instead the checked
    output IS the operator's accuracy contract: every exact column of
    the profile, plus `distinct_within_5pct` = (|HLL estimate − exact
    n_distinct| / exact ≤ 5%). The oracle emits the same exact profile
    with a literal TRUE, so an HLL regression (or a plan change that
    breaks the sketch input) flips the boolean and fails the hash gate.
    The demo intentionally runs BOTH plans at test scale to compare
    them; production calls profile_table(approx=True) alone — a single
    no-Expand, no-shuffle agg."""
    t = load_tables(spark, sf_dir)
    base = t["orders"].select(*_PROFILE_ORACLE_COLS)
    exact = profile_table(base).select(
        "column", F.col("n_distinct").alias("nd_exact")
    )
    approx = profile_table(base, approx=True)
    return (
        approx.join(F.broadcast(exact), "column")
        .withColumn(
            "distinct_within_5pct",
            # all-null column: 0/0 would make this NULL, not a verdict —
            # define it as "sketch also says 0"
            F.when(
                F.col("nd_exact") == 0, F.col("n_distinct") == 0
            ).otherwise(
                F.abs(F.col("n_distinct") - F.col("nd_exact"))
                / F.col("nd_exact")
                <= F.lit(0.05)
            ),
        )
        .select(
            "column", "n_rows", "n_nulls", "min_repr", "max_repr",
            "avg_len", "distinct_within_5pct",
        )
    )


@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH prev AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' [old revision]'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 7
    ),
    cur AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3)
    SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
           CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN c.doc_id IS NULL THEN 'removed'
                WHEN md5(c.text) <> md5(p.text) THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two corpus snapshots — the QA pass between ingest drops:
    one row per doc_id in either snapshot with status added / removed /
    changed / unchanged, decided by content hash. The two snapshots are
    derived deterministically from the documents table (docs with
    id % 10 = 7 absent from prev = 'added'; id % 11 = 3 absent from
    cur = 'removed'; every 13th doc's text perturbed in prev =
    'changed') so both engines see identical inputs and every status
    branch fires. Physical shape: ONE full
    outer shuffle join on doc_id comparing 16-byte hashes — text never
    joins, only (doc_id, md5) pairs, which is what keeps a 100 TB
    snapshot diff shuffle-light; at scale both sides would also be
    bucketed on doc_id, making the join co-located (see
    bucketed_colocated_join)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    cur = docs.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id", F.md5("text").alias("h")
    )
    prev = (
        docs.filter(F.col("doc_id") % 10 != 7)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 13 == 0,
                    F.concat(F.col("text"), F.lit(" [old revision]")),
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
    )
    c, p = cur.alias("c"), prev.alias("p")
    j = c.join(p, F.col("c.doc_id") == F.col("p.doc_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("c.doc_id"), F.col("p.doc_id")).alias("doc_id"),
        F.when(F.col("p.doc_id").isNull(), "added")
        .when(F.col("c.doc_id").isNull(), "removed")
        .when(F.col("c.h") != F.col("p.h"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
