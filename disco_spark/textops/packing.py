"""Sequence packing: chop a tokenized corpus into fixed-budget training
sequences (beyond-reference surface; driver north star).

LLM training consumes fixed-length context windows, not documents: the
corpus is ordered, token streams are concatenated, and the stream is cut
every ``budget`` tokens — documents straddle cuts. The operator computes,
for every document, its token interval in the global stream and the
sequence ids it lands in, entirely from ONE exact global prefix sum.

Scale design (the part that must survive 100 TB):
- The global prefix sum uses the same two-pass range-partition plan as
  ``relational2.global_row_number`` (the scale-safe NTILE): range-
  partition on the order key, per-partition token subtotals (ONE row per
  partition to the driver), then a local window + offset. No single-
  partition exchange anywhere.
- The doc->sequence explode emits ``1 + n_toks/budget`` rows per doc
  (bounded by the doc's own length), and the per-sequence rollup
  shuffles on seq_id — uniformly distributed by construction since every
  sequence holds exactly ``budget`` tokens.
- Everything is integer arithmetic, so the DuckDB oracle matches
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables
from disco_spark.textops.analysis import _TOKS_SQL, with_toks

SEQ_BUDGET = 512


def global_prefix_sum(
    df: DataFrame, order_cols: list[str], value_col: str, out: str = "start"
) -> DataFrame:
    """Exact EXCLUSIVE prefix sum over a total order — thin wrapper over
    the ONE shared two-pass range-partition harness
    (`relational2.global_prefix_sum`, also the engine of the scale-safe
    NTILE); this module only drops the total it doesn't need."""
    from disco_spark.operators.relational2 import (
        global_prefix_sum as _shared_prefix_sum,
    )

    summed, _total = _shared_prefix_sum(df, order_cols, value_col, out=out)
    return summed


def pack_manifest(docs: DataFrame, budget: int = SEQ_BUDGET) -> DataFrame:
    """Per-document packing manifest: (doc_id, n_toks, start_tok,
    first_seq, last_seq). ``start_tok`` is the document's offset in the
    concatenated global token stream (docs ordered by doc_id); the
    sequence ids are the ``budget``-sized windows the doc's token
    interval [start_tok, start_tok + n_toks) intersects. Empty documents
    are dropped (they occupy no tokens)."""
    d = (
        with_toks(docs)
        .select("doc_id", F.size("toks").alias("n_toks"))
        .filter(F.col("n_toks") > 0)
    )
    c = global_prefix_sum(d, ["doc_id"], "n_toks", out="start_tok")
    return c.select(
        "doc_id",
        "n_toks",
        "start_tok",
        F.expr(f"start_tok div {budget}").alias("first_seq"),
        F.expr(f"(start_tok + n_toks - 1) div {budget}").alias("last_seq"),
    )


def pack_sequence_stats(docs: DataFrame, budget: int = SEQ_BUDGET) -> DataFrame:
    """Per-sequence rollup of the packing: how many documents touch each
    ``budget``-token window, how many tokens of it they fill (= budget
    except the final partial window), and how many docs carried over
    from an earlier window. The explode is bounded: a doc emits one row
    per window it spans."""
    m = pack_manifest(docs, budget)
    x = m.select(
        "doc_id",
        "n_toks",
        "start_tok",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    b = F.lit(budget).cast("long")
    tokens_here = F.least(
        F.col("start_tok") + F.col("n_toks"), (F.col("seq_id") + 1) * b
    ) - F.greatest(F.col("start_tok"), F.col("seq_id") * b)
    return x.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_here).alias("n_tokens"),
        F.sum(
            F.when(F.col("start_tok") < F.col("seq_id") * b, 1).otherwise(0)
        ).alias("n_carryover"),
    )


_PACK_CTE = f"""
    d AS (
      SELECT doc_id, len(toks) AS n_toks
      FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
      WHERE len(toks) > 0
    ),
    c AS (
      SELECT doc_id, n_toks,
             CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_tok
      FROM d
    ),
    m AS (
      SELECT doc_id, n_toks, start_tok,
             start_tok // {SEQ_BUDGET} AS first_seq,
             (start_tok + n_toks - 1) // {SEQ_BUDGET} AS last_seq
      FROM c
    )
"""


@query(
    "pack_manifest_documents",
    oracle=f"""
    WITH {_PACK_CTE}
    SELECT doc_id, n_toks, start_tok, first_seq, last_seq FROM m
    """,
)
def pack_manifest_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document packing manifest over the documents table."""
    t = load_tables(spark, sf_dir)
    return pack_manifest(t["documents"])


@query(
    "pack_sequence_stats",
    oracle=f"""
    WITH {_PACK_CTE},
    x AS (
      SELECT doc_id, n_toks, start_tok, s.seq AS seq_id
      FROM m, UNNEST(generate_series(first_seq, last_seq)) AS s(seq)
    )
    SELECT seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(LEAST(start_tok + n_toks, (seq_id + 1) * {SEQ_BUDGET})
               - GREATEST(start_tok, seq_id * {SEQ_BUDGET})) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN start_tok < seq_id * {SEQ_BUDGET} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_carryover
    FROM x GROUP BY 1
    """,
)
def pack_sequence_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence fill statistics for 512-token training windows."""
    t = load_tables(spark, sf_dir)
    return pack_sequence_stats(t["documents"])
