"""Token-bigram language-model perplexity scoring — the CCNet-style
quality filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"): score every document by a
small LM trained on trusted text, bucket by perplexity, keep the head.
Here the LM is a token-bigram model with add-one smoothing trained on
the TRAIN split — deterministic, engine-portable, and exactly
SQL-replayable (a real deployment swaps in a KenLM/fastText scorer via
the same broadcast-model join shape).

Reference analog: none (beyond-reference training-pipeline surface,
like textops/analysis.py). The probability model:

    p(b | a) = (c(a,b) + 1) / (c(a,*) + V)

with V = distinct bigram-successor vocabulary size of the train split;
unseen contexts fall back to 1 / V. A document's score is the mean
negative log2 probability over its bigrams (= log2 perplexity).

Scale story: the model is two aggregates over the train split (bigram
counts, context totals) joined once; documents score via ONE join of
their bigrams against the model table keyed by (a, b) — at 100 TB the
model table is vocabulary-sized (bounded), the doc side streams, and
the join broadcasts when the model fits (AQE decides). No Python in
the plan; everything is explode + join + agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.sampling import TEST_HI, VAL_HI, _bucket_sql, hash_bucket
from disco_spark.session import load_tables
from disco_spark.textops.analysis import _TOKS_SQL, with_toks

# bigrams as adjacent token pairs; docs with < 2 tokens have no bigrams
# and drop out (both engines agree by construction)
_BIGRAMS_SQL = f"""
    toked AS (
      SELECT doc_id, {_bucket_sql("doc_id")} AS bucket, {_TOKS_SQL} AS toks
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, bucket, toks[i] AS a, toks[i+1] AS b
      FROM (SELECT doc_id, bucket, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM toked WHERE len(toks) >= 2)
    )
"""


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, a, b): every adjacent token pair, with the
    split bucket riding along."""
    d = with_toks(docs).select(
        "doc_id", hash_bucket(F.col("doc_id")).alias("bucket"), "toks"
    )
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))"
    )
    return (
        d.filter(F.size("toks") >= 2)
        .select("doc_id", "bucket", F.explode(pairs).alias("p"))
        .select("doc_id", "bucket", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )


# composable CTE chain ending in `ppl` = (doc_id, n_bigrams, log2_ppl) —
# text_lm_perplexity selects from it directly; curriculum_ppl_buckets
# appends its quartile CTEs (single source, the two oracles can't drift)
LM_PPL_CTES = f"""{_BIGRAMS_SQL},
    train AS (SELECT a, b FROM bigrams WHERE bucket >= {VAL_HI}),
    counts AS (SELECT a, b, COUNT(*) AS c_ab FROM train GROUP BY 1, 2),
    ctx AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM counts GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT b) AS vocab FROM train),
    test AS (SELECT doc_id, a, b FROM bigrams WHERE bucket < {TEST_HI}),
    scored AS (
      SELECT t.doc_id,
             CASE WHEN ctx.c_a IS NULL THEN -log2(1.0 / v.vocab)
                  ELSE -log2((COALESCE(c.c_ab, 0) + 1.0) / (ctx.c_a + v.vocab))
             END AS nll
      FROM test t
      LEFT JOIN counts c ON t.a = c.a AND t.b = c.b
      LEFT JOIN ctx ON t.a = ctx.a
      CROSS JOIN v
    ),
    ppl AS (
      SELECT doc_id,
             COUNT(*) AS n_bigrams,
             ROUND(CAST(SUM(CAST(nll AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
               AS log2_ppl
      FROM scored GROUP BY doc_id
    )"""


@query(
    "text_lm_perplexity",
    oracle=f"""
    WITH {LM_PPL_CTES}
    SELECT doc_id, n_bigrams, log2_ppl FROM ppl
    """,
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram negative-log2-likelihood (= log2 perplexity) of every
    TEST-split document under the add-one-smoothed bigram LM trained on
    the TRAIN split. Per-bigram nll values are summed through an exact
    DECIMAL accumulator (order-independent) and the mean rounded to 6
    decimals, so Spark and DuckDB hash-match despite double log2."""
    t = load_tables(spark, sf_dir)
    return lm_perplexity_scores(t["documents"])


def lm_perplexity_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, log2_ppl) for TEST-split docs — the engine
    plan behind text_lm_perplexity and curriculum_ppl_buckets."""
    bg = _doc_bigrams(docs)
    train = bg.filter(F.col("bucket") >= VAL_HI).select("a", "b")
    counts = train.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    ctx = counts.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab = train.agg(
        F.countDistinct("b").alias("vocab")
    )  # 1-row scalar, broadcast below
    test = bg.filter(F.col("bucket") < TEST_HI).select("doc_id", "a", "b")
    nll = F.when(
        F.col("c_a").isNull(), -F.log2(F.lit(1.0) / F.col("vocab"))
    ).otherwise(
        -F.log2(
            (F.coalesce(F.col("c_ab"), F.lit(0)) + F.lit(1.0))
            / (F.col("c_a") + F.col("vocab"))
        )
    )
    return (
        test.join(counts, ["a", "b"], "left")
        .join(ctx, "a", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn("nll", nll)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("nll").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("log2_ppl"),
        )
    )


@query(
    "curriculum_ppl_buckets",
    # the quartile cut replays NTILE(4) over the shared ppl CTE chain —
    # the curriculum report: how many docs per difficulty band and the
    # band's score range (train on the easy head first, or mix by band)
    oracle=f"""
    WITH {LM_PPL_CTES},
    ranked AS (
      SELECT doc_id, log2_ppl,
             NTILE(4) OVER (ORDER BY log2_ppl, doc_id) AS bucket
      FROM ppl
    )
    SELECT bucket, COUNT(*) AS n_docs,
           MIN(log2_ppl) AS min_ppl, MAX(log2_ppl) AS max_ppl
    FROM ranked GROUP BY bucket
    """,
)
def curriculum_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-curriculum banding: quartile the TEST-split docs by
    bigram-LM log2 perplexity (composing text_lm_perplexity) and report
    each band's size and score range — the curriculum/mixture decision
    table a data pipeline feeds into sampling weights. The quartile is
    the SCALE-SAFE exact ntile (global_row_number: range partition +
    per-partition offsets + closed-form bucket from (rank, n)) — no
    single-partition window over the corpus."""
    from disco_spark.operators.relational2 import global_row_number

    t = load_tables(spark, sf_dir)
    scores = lm_perplexity_scores(t["documents"]).select("doc_id", "log2_ppl")
    ranked, n = global_row_number(scores, ["log2_ppl", "doc_id"])
    q, r = divmod(n, 4)
    if q == 0:
        bucket = F.col("rn")
    else:
        head = r * (q + 1)
        bucket = F.when(
            F.col("rn") <= head, F.expr(f"(rn + {q}) DIV {q + 1}")
        ).otherwise(F.expr(f"{r} + ((rn - {head} + {q - 1}) DIV {q})"))
    return (
        ranked.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("log2_ppl").alias("min_ppl"),
            F.max("log2_ppl").alias("max_ppl"),
        )
    )
