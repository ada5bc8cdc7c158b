"""Per-dimension variance and per-label centroid shift."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_dim_variance_oracle(spark):
    compare_query(spark, "embedding_dim_variance", SF_CORRECT)


def test_centroid_shift_oracle(spark):
    compare_query(spark, "embedding_centroid_shift", SF_CORRECT)


def _write_embeddings(spark, d, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(os.path.join(d, "embeddings.parquet"))


def test_dim_variance_dead_dimension(spark):
    """A constant dimension reports variance 0; a spread one doesn't."""
    from disco_spark.similarity.embedding_ops import embedding_dim_variance

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 2.0], 0),
        (3, [1.0, 4.0], 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_embeddings(spark, d, rows)
        got = {
            r["pos"]: (r["mean_v"], r["var_v"])
            for r in embedding_dim_variance(spark, d).collect()
        }
    assert got[1] == (1.0, 0.0)
    assert got[2][0] == 2.0 and got[2][1] > 2.6


def test_centroid_shift_aligned_label_is_one(spark):
    """Two labels mirrored about an off-axis corpus mean: both get the
    same |cos|; a label equal to the global mean direction scores 1."""
    from disco_spark.similarity.embedding_ops import (
        embedding_centroid_shift,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.0, 1.0], 1),
        (5, [0.5, 0.5], 2),  # equals the global centroid direction
        (6, [0.5, 0.5], 2),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_embeddings(spark, d, rows)
        got = {
            r["label"]: r["cos_to_global"]
            for r in embedding_centroid_shift(spark, d).collect()
        }
    assert abs(got[2] - 1.0) < 1e-6
    assert abs(got[0] - got[1]) < 1e-6
    assert got[0] < 0.99
