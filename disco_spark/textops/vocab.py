"""Corpus vocabulary statistics and train/test contamination detection
(beyond-reference surface; driver north star: training-data pipeline ops).

Reference analog is only the wordcount family (README.md:17-30,
examples/util/wordcount_ddb.py:14-22) — these extend it to n-gram
vocabulary profiling and benchmark-contamination checks, two standard
steps in curating an LLM training corpus.

Scale notes (100 TB):
- `vocab_top_bigrams` is one scan + one shuffle (partial/final hash agg
  fuses the per-partition counts map-side) + a TakeOrdered(k) — the
  top-k never materializes the full vocabulary on the driver.
- `contamination_test_vs_train` joins on the shingle string. At real
  scale you would (a) use longer shingles (k=13 is the usual published
  choice) so the match set is sparse, and (b) semi-join the test side
  against a bloom filter of train shingles before the exact join. The
  k=3 setting here keeps the DuckDB oracle tractable; the plan shape
  (shuffle-on-shingle, distinct-before-join on the train side) is the
  one that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.dedup.dedup import _SHINGLES_SQL, shingle_df
from disco_spark.registry import query
from disco_spark.sampling import BUCKETS, _bucket_sql, hash_bucket
from disco_spark.session import load_tables
from disco_spark.textops.analysis import _TOKS_SQL, with_toks

TOP_K = 20
_TEST_HI = int(0.1 * BUCKETS)   # bucket < 1000  -> 'test'
_TRAIN_LO = int(0.2 * BUCKETS)  # bucket >= 2000 -> 'train' (val in between)


@query(
    "vocab_top_bigrams",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS toks FROM documents),
    bigrams AS (
      SELECT concat_ws(' ', toks[i], toks[i+1]) AS bigram
      FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
            FROM toks WHERE len(toks) >= 2)
    )
    SELECT bigram, COUNT(*) AS n FROM bigrams
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT {TOP_K}
    """,
)
def vocab_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} most frequent token bigrams corpus-wide (total order:
    count desc, then bigram — deterministic across engines)."""
    t = load_tables(spark, sf_dir)
    toks = F.col("toks")
    # toks is a projected column (never the raw split expression) — no
    # CSE inside higher-order lambdas, see analysis.with_toks.
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    return (
        with_toks(t["documents"])
        .filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(TOP_K)
    )


@query(
    "contamination_test_vs_train",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    labeled AS (
      SELECT doc_id, shingle, {_bucket_sql("doc_id")} AS b FROM shingles
    ),
    test_sh AS (SELECT doc_id, shingle FROM labeled WHERE b < {_TEST_HI}),
    train_sh AS (SELECT DISTINCT shingle FROM labeled WHERE b >= {_TRAIN_LO})
    SELECT t.doc_id, COUNT(*) AS n_shared
    FROM test_sh t JOIN train_sh USING (shingle)
    GROUP BY t.doc_id
    """,
)
def contamination_test_vs_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every doc in the deterministic 'test' split, how many of its
    3-token shingles also occur anywhere in the 'train' split — the
    standard benchmark-contamination screen. Splits are the same
    hash-bucket ranges as `sampling.train_val_test_split`, so this query
    audits exactly the splits the pipeline would ship."""
    t = load_tables(spark, sf_dir)
    sh = shingle_df(with_toks(t["documents"])).withColumn(
        "b", hash_bucket(F.col("doc_id"))
    )
    test_sh = sh.filter(F.col("b") < _TEST_HI).select("doc_id", "shingle")
    train_sh = sh.filter(F.col("b") >= _TRAIN_LO).select("shingle").distinct()
    return (
        test_sh.join(train_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
