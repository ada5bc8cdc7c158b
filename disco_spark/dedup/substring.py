"""Exact duplicated-span detection across documents — the bounded,
shuffle-friendly form of exact-substring dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better": suffix-array
substring dedup; here at k-token span granularity, which is the form
that distributes).

Reference analog: none (the reference's dedup story ends at wordcount-
style distinct); this is beyond-reference training-pipeline surface
alongside dedup/dedup.py's MinHash/SimHash family, which catches
NEAR-duplicates — this operator catches literal copied passages between
otherwise-different documents (license boilerplate, quoted spam,
syndicated paragraphs).

Scale story: spans are hashed per document (distinct within doc), then
grouped BY SPAN — never an all-pairs document join. Ubiquitous spans
(appearing in > MAX_SPAN_DOCS docs) are dropped before the pair
generation, which (a) is what you want semantically (a span in 10k docs
is boilerplate, not plagiarism — the paragraph operator handles those)
and (b) bounds the per-span pair fan-out to MAX_SPAN_DOCS^2, the same
frequency-cap guard the LSH band join uses (dedup.py). One shuffle on
span, one on (doc_a, doc_b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.dedup.dedup import shingle_df
from disco_spark.registry import query
from disco_spark.session import load_tables
from disco_spark.textops.analysis import _TOKS_SQL, with_toks

SPAN_TOKENS = 8       # exact-match window length, in tokens
MAX_SPAN_DOCS = 50    # spans in more docs than this are boilerplate


def shared_span_pairs(
    docs: DataFrame, k: int = SPAN_TOKENS, max_span_docs: int = MAX_SPAN_DOCS
) -> DataFrame:
    """(doc_a, doc_b, n_shared_spans): document pairs sharing >= 1 exact
    k-token span, with the count of distinct shared spans."""
    spans = shingle_df(with_toks(docs), k=k, distinct=True).withColumnRenamed(
        "shingle", "span"
    )
    # frequency cap as a window over the SAME span partitioning the
    # self-join needs: one Exchange on span serves the count-filter and
    # both join sides (ReusedExchange), instead of a separate
    # agg + re-join shape that shuffles the span table twice more
    freq = Window.partitionBy("span")
    sp = (
        spans.withColumn("n_docs", F.count(F.lit(1)).over(freq))
        .filter(F.col("n_docs") <= max_span_docs)
        .drop("n_docs")
    )
    a = sp.select("span", F.col("doc_id").alias("doc_a"))
    b = sp.select("span", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "span")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        # spans are distinct per doc, so count(*) = distinct shared spans
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
    )


_LAST = SPAN_TOKENS - 1
_SPAN_CONCAT = ", ".join(f"toks[i+{j}]" for j in range(SPAN_TOKENS))

@query(
    "dedup_exact_substring",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    spans AS (
      SELECT DISTINCT doc_id, concat_ws(' ', {_SPAN_CONCAT}) AS span
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {_LAST})) AS i
            FROM d WHERE len(toks) >= {SPAN_TOKENS})
    ),
    keep AS (
      SELECT span FROM spans GROUP BY span HAVING COUNT(*) <= {MAX_SPAN_DOCS}
    ),
    sp AS (SELECT s.doc_id, s.span FROM spans s JOIN keep USING (span))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_spans
    FROM sp a JOIN sp b ON a.span = b.span AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return shared_span_pairs(t["documents"])
