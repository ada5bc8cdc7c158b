"""Naive Bayes train + predict as DataFrame plans — parity with the
reference's MapReduce implementation (examples/datamining/naive_bayes.py:
estimate_map/estimate_reduce build per-(class, feature) 2x2 contingency
counts with +1 pseudocounts, lines 44-155; predict_map sums
log-likelihoods per token occurrence, lines 77-92).

Reference semantics reproduced exactly:
- training counts are per-DOCUMENT (each doc's distinct tokens), the
  2x2 table for (class y, feature i) is over documents, +1 pseudocounts:
  ll(y, i) = ln(pairs + 1) - ln(items_i - pairs + 1)
  for EVERY class x vocab pair (a never-co-occurring pair still
  contributes -ln(items_i + 1), reference lines 128-141);
- the class prior accumulates once per VOCAB ITEM (reference line 151:
  loglikelihoods[l[0]] += ...), i.e.
  prior(y) = V * (ln(classes_y + 2) - ln(total - classes_y + 2));
- prediction sums ll over token OCCURRENCES (not distinct — reference
  predict_map iterates L[1:] raw, line 83).
One deliberate deviation: tokens unseen in training contribute 0 at
predict time (the reference raises KeyError — example-grade behavior a
production scorer cannot keep).

Scale shape: training is two token-grain groupBys (hash shuffles on
token); the model is a |vocab| x |classes| table joined to the test
corpus by token (hash join — broadcastable while the model is small,
shuffle join at web-corpus vocab sizes); scalars (total docs, vocab
size) ride as broadcast 1-row aggregates, so train+predict is ONE lazy
plan with no driver round-trips. Score summation accumulates in
DECIMAL(20,12) fixed-point so the result is shuffle-order-independent
and matches the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.sampling import BUCKETS, _bucket_sql, train_val_test_split
from disco_spark.session import load_tables
from disco_spark.textops.analysis import _TOKS_SQL, with_toks


def naive_bayes_train(train: DataFrame, class_col: str = "lang") -> DataFrame:
    """(doc_id, <class_col>, toks) -> the model: one row per
    (class, token) with `ll` plus the per-class `prior` replicated on
    each row (kept denormalized so predict needs a single join)."""
    y = F.col(class_col)
    tok_doc = train.select(
        "doc_id", y.alias("y"), F.explode(F.array_distinct("toks")).alias("tok")
    )
    items = tok_doc.groupBy("tok").agg(F.count(F.lit(1)).alias("n_i"))
    pairs = tok_doc.groupBy("tok", "y").agg(F.count(F.lit(1)).alias("n_yi"))
    classes = train.groupBy(y.alias("y")).agg(F.count(F.lit(1)).alias("n_y"))
    scalars = train.agg(F.count(F.lit(1)).alias("total")).crossJoin(
        F.broadcast(items.agg(F.count(F.lit(1)).alias("v")))
    )
    grid = items.crossJoin(F.broadcast(classes))
    model = (
        grid.join(pairs, ["tok", "y"], "left")
        .withColumn("n_yi", F.coalesce("n_yi", F.lit(0)))
        .crossJoin(F.broadcast(scalars))
        .select(
            "tok",
            "y",
            (F.log(F.col("n_yi") + 1) - F.log(F.col("n_i") - F.col("n_yi") + 1)).alias(
                "ll"
            ),
            (
                F.col("v")
                * (F.log(F.col("n_y") + 2) - F.log(F.col("total") - F.col("n_y") + 2))
            ).alias("prior"),
        )
    )
    return model


def naive_bayes_predict(test: DataFrame, model: DataFrame) -> DataFrame:
    """Score every test doc against every class: prior + sum of ll over
    the doc's token occurrences (decimal-exact, order-independent)."""
    occurrences = test.select("doc_id", F.explode("toks").alias("tok"))
    scored = (
        occurrences.join(model, "tok")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("ll").cast("decimal(20,12)")).alias("ll_sum"))
    )
    grid = test.select("doc_id").crossJoin(
        F.broadcast(model.select("y", "prior").distinct())
    )
    return (
        grid.join(scored, ["doc_id", "y"], "left")
        .select(
            "doc_id",
            F.col("y").alias("class"),
            F.round(
                F.col("prior") + F.coalesce(F.col("ll_sum").cast("double"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )


_NB_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, {_TOKS_SQL} AS toks,
             CASE WHEN {_bucket_sql("doc_id")} < {int(0.1 * BUCKETS)} THEN 'test'
                  WHEN {_bucket_sql("doc_id")} < {int(0.2 * BUCKETS)} THEN 'val'
                  ELSE 'train' END AS split
      FROM documents
    ),
    train AS (SELECT * FROM d WHERE split = 'train'),
    test AS (SELECT * FROM d WHERE split = 'test'),
    tok_doc AS (
      SELECT doc_id, lang AS y, t.tok
      FROM train, UNNEST(list_distinct(toks)) AS t(tok)
    ),
    items AS (SELECT tok, COUNT(*) AS n_i FROM tok_doc GROUP BY tok),
    pairs AS (SELECT tok, y, COUNT(*) AS n_yi FROM tok_doc GROUP BY tok, y),
    classes AS (SELECT lang AS y, COUNT(*) AS n_y FROM train GROUP BY lang),
    scalars AS (
      SELECT (SELECT COUNT(*) FROM train) AS total,
             (SELECT COUNT(*) FROM items) AS v
    ),
    model AS (
      SELECT i.tok, c.y,
             ln(COALESCE(p.n_yi, 0) + 1)
               - ln(i.n_i - COALESCE(p.n_yi, 0) + 1) AS ll,
             s.v * (ln(c.n_y + 2) - ln(s.total - c.n_y + 2)) AS prior
      FROM items i CROSS JOIN classes c
      LEFT JOIN pairs p ON p.tok = i.tok AND p.y = c.y, scalars s
    ),
    occ AS (SELECT doc_id, t.tok FROM test, UNNEST(toks) AS t(tok)),
    scored AS (
      SELECT o.doc_id, m.y,
             SUM(CAST(m.ll AS DECIMAL(20,12))) AS ll_sum
      FROM occ o JOIN model m ON m.tok = o.tok
      GROUP BY o.doc_id, m.y
    ),
    grid AS (
      SELECT t.doc_id, p.y, p.prior
      FROM test t CROSS JOIN (SELECT DISTINCT y, prior FROM model) p
    )
    SELECT g.doc_id, g.y AS class,
           ROUND(g.prior + COALESCE(CAST(s.ll_sum AS DOUBLE), 0.0), 6) AS score
    FROM grid g LEFT JOIN scored s ON s.doc_id = g.doc_id AND s.y = g.y
"""


@query("naive_bayes_lang_scores", oracle=_NB_ORACLE)
def naive_bayes_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the reference's Naive Bayes on the hash-split train docs
    (classes = lang, features = distinct tokens) and score every test
    doc against every class."""
    t = load_tables(spark, sf_dir)
    d = train_val_test_split(with_toks(t["documents"]), "doc_id", val=0.1, test=0.1)
    train = d.filter(F.col("split") == "train")
    test = d.filter(F.col("split") == "test")
    model = naive_bayes_train(train, "lang")
    return naive_bayes_predict(test, model)
