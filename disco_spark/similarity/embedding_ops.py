"""Embedding-column utilities for training-data pipelines: L2 norms /
unit-normalization and symmetric int8 quantization — the prep steps
before ANN indexing or model ingestion.

All arithmetic is JVM higher-order functions over the array column in
DOUBLE (no UDF, no explode — one scan, zero shuffle). Cross-engine
float parity follows the dedup_embedding_cosine pattern: accumulate in
double with identical left-to-right array order on both sides, ROUND
outputs to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.dedup.dedup import norm
from disco_spark.registry import query
from disco_spark.session import load_tables


@query(
    "embedding_l2_stats",
    oracle="""
    SELECT vec_id,
           label,
           len(embedding) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)
             AS l2_norm
    FROM embeddings
    """,
)
def embedding_l2_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector dimensionality + L2 norm: the sanity profile run before
    any ANN build (catches zero vectors, un-normalized mixes, truncated
    rows). One projection over the scan."""
    t = load_tables(spark, sf_dir)
    return t["embeddings"].select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(norm(F.col("embedding")), 6).alias("l2_norm"),
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Symmetric int8 quantization: scale = 127 / max|x| per vector,
    q_i = round(x_i * scale). Returns (quantized array<int>, scale).
    4x smaller than float32 on the wire — the shuffle-volume lever for
    embedding-heavy joins; dot products on int8 + per-vector scales
    reconstruct scores to ~1e-2, re-rank exact on the shortlist."""
    absmax = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(absmax == 0.0, F.lit(0.0)).otherwise(F.lit(127.0) / absmax)
    quant = F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("int"))
    return quant, scale


@query(
    "embedding_quantize_int8",
    # the codes travel as a CSV string, not array<int>: the driver's
    # pandas canonicalizer cannot sort unhashable cells (lists/bytes) —
    # the exact failure multimodal_frame_sample hit in round 2 with raw
    # binary. quantize_int8() itself still yields the true array column.
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS absmax
      FROM embeddings
    )
    SELECT vec_id,
           array_to_string(
             list_transform(v, x -> CAST(ROUND(x * CASE WHEN absmax = 0 THEN 0
                                                        ELSE 127.0 / absmax END)
                                         AS INTEGER)), ',') AS q_csv,
           ROUND(CASE WHEN absmax = 0 THEN 0 ELSE 127.0 / absmax END, 6) AS scale
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (array<int>
    + per-vector scale; serialized as CSV for the driver gate)."""
    t = load_tables(spark, sf_dir)
    q, scale = quantize_int8(F.col("embedding"))
    return t["embeddings"].select(
        "vec_id",
        F.array_join(F.transform(q, lambda x: x.cast("string")), ",").alias("q_csv"),
        F.round(scale, 6).alias("scale"),
    )


@query(
    "embedding_dim_variance",
    # per-dimension mean/variance across the corpus (population form,
    # exact decimal moment sums — the feature-scaling audit): a dead
    # dimension (var ~ 0) or an unscaled one jumps out immediately
    oracle="""
    WITH e AS (
      SELECT generate_subscripts(embedding, 1) AS pos,
             unnest(embedding)::DOUBLE AS val
      FROM embeddings
    ),
    s AS (
      SELECT pos, COUNT(*) AS n,
             CAST(SUM(CAST(val AS DECIMAL(38,15))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(val * val AS DECIMAL(38,15))) AS DOUBLE)
               AS sxx
      FROM e GROUP BY pos
    )
    SELECT pos, n,
           ROUND(sx / n, 6) AS mean_v,
           ROUND(sxx / n - (sx / n) * (sx / n), 6) AS var_v
    FROM s
    """,
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and population variance over the embedding
    corpus — the feature-scaling / dead-dimension audit run before
    quantization or indexing (a near-zero-variance dimension wastes a
    PQ subspace; wildly different scales break L2 geometry).

    posexplode + one grouped aggregate: the only shuffle carries
    (pos, partial-moment) pairs — dim cells total, independent of
    corpus size. Moments fold as exact DECIMAL(38,15); the variance
    formula runs on identical doubles both engines."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        F.posexplode("embedding").alias("pos0", "valf")
    ).select((F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val"))
    s = e.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("decimal(38,15)")).cast("double").alias("sx"),
        F.sum((F.col("val") * F.col("val")).cast("decimal(38,15)"))
        .cast("double")
        .alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    return s.select(
        "pos",
        "n",
        F.round(mean, 6).alias("mean_v"),
        F.round(F.col("sxx") / F.col("n") - mean * mean, 6).alias("var_v"),
    )


@query(
    "embedding_centroid_shift",
    # per-label centroid vs the corpus centroid, compared by cosine —
    # the cluster-coherence / label-drift audit. Centroid components
    # are exact-decimal sums divided by exact counts; the cosine folds
    # its 16 per-dimension products through DECIMAL again so the
    # statistic is shuffle-order-free.
    oracle="""
    WITH e AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding)::DOUBLE AS val
      FROM embeddings
    ),
    lc AS (
      SELECT label, pos,
             CAST(SUM(CAST(val AS DECIMAL(38,15))) AS DOUBLE)
               / COUNT(*) AS m,
             COUNT(*) AS n
      FROM e GROUP BY label, pos
    ),
    gc AS (
      SELECT pos,
             CAST(SUM(CAST(val AS DECIMAL(38,15))) AS DOUBLE)
               / COUNT(*) AS g
      FROM e GROUP BY pos
    ),
    terms AS (
      SELECT lc.label, lc.n,
             CAST(lc.m * gc.g AS DECIMAL(38,15)) AS t_dot,
             CAST(lc.m * lc.m AS DECIMAL(38,15)) AS t_mm,
             CAST(gc.g * gc.g AS DECIMAL(38,15)) AS t_gg
      FROM lc JOIN gc USING (pos)
    )
    SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(t_dot) AS DOUBLE)
                 / (sqrt(CAST(SUM(t_mm) AS DOUBLE))
                    * sqrt(CAST(SUM(t_gg) AS DOUBLE))), 6)
             AS cos_to_global
    FROM terms GROUP BY label
    """,
)
def embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid coherence: cosine between each label's mean
    vector and the corpus mean — the label-drift audit (a label whose
    centroid swings away from the corpus signals a skewed or
    mislabeled cluster; near-1.0 everywhere signals labels carry no
    geometric signal).

    Two grouped exploded aggregates (label x dim cells, then dim
    cells), a broadcast-size join on pos, and a per-label fold of the
    dim-wise products — every shuffle is bounded by label x dim, not
    by corpus size. Decimal folds at each stage keep the cosine
    engine-identical."""
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "label", F.posexplode("embedding").alias("pos", "valf")
    ).withColumn("val", F.col("valf").cast("double"))
    lc = e.groupBy("label", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(38,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    gc = e.groupBy("pos").agg(
        (
            F.sum(F.col("val").cast("decimal(38,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("g")
    )
    terms = lc.join(F.broadcast(gc), "pos").select(
        "label",
        "n",
        (F.col("m") * F.col("g")).cast("decimal(38,15)").alias("t_dot"),
        (F.col("m") * F.col("m")).cast("decimal(38,15)").alias("t_mm"),
        (F.col("g") * F.col("g")).cast("decimal(38,15)").alias("t_gg"),
    )
    return terms.groupBy("label").agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.round(
            F.sum("t_dot").cast("double")
            / (
                F.sqrt(F.sum("t_mm").cast("double"))
                * F.sqrt(F.sum("t_gg").cast("double"))
            ),
            6,
        ).alias("cos_to_global"),
    )
