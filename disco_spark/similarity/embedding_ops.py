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
