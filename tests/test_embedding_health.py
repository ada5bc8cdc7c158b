"""Label silhouette + quantization error (embedding_ops.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_silhouette_oracle(spark):
    compare_query(spark, "embedding_label_silhouette", SF_CORRECT)


def test_quanterr_oracle(spark):
    compare_query(spark, "embedding_quantization_error", SF_CORRECT)


def _write_embeddings(spark, dd, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(os.path.join(dd, "embeddings.parquet"))


def test_silhouette_separated_clusters_positive(spark):
    """Two tight clusters far apart: nearest_inter >> intra ->
    sep_score close to 1; labels point at each other."""
    from disco_spark.similarity.embedding_ops import (
        embedding_label_silhouette,
    )

    rows = []
    for i in range(10):
        jit = (i % 5) * 0.01
        rows.append((i, [1.0 + jit, 0.0], 0))
        rows.append((100 + i, [-1.0 - jit, 0.0], 1))
    with tempfile.TemporaryDirectory() as dd:
        _write_embeddings(spark, dd, rows)
        out = {
            r["label"]: r
            for r in embedding_label_silhouette(spark, dd).collect()
        }
    assert out[0]["nearest_label"] == 1
    assert out[1]["nearest_label"] == 0
    for r in out.values():
        assert r["n_vecs"] == 10
        assert r["sep_score"] > 0.9
        assert r["nearest_inter"] > 2.0


def test_quantization_error_bounds_and_zero_vector(spark):
    """int8 reconstruction: cosine ~1 and mse tiny for generic
    vectors; the all-zero vector round-trips exactly (guarded scale),
    its cosine undefined -> excluded from cos_min."""
    from disco_spark.similarity.embedding_ops import (
        embedding_quantization_error,
    )

    rows = [
        (1, [0.5, -0.25, 0.125, 1.0], 0),
        (2, [0.0, 0.0, 0.0, 0.0], 0),  # absmax = 0 path
        (3, [127.0, -127.0, 63.0, 0.0], 1),  # exactly representable
    ]
    with tempfile.TemporaryDirectory() as dd:
        _write_embeddings(spark, dd, rows)
        out = {
            r["label"]: r
            for r in embedding_quantization_error(spark, dd).collect()
        }
    assert out[0]["n_vecs"] == 2
    assert out[0]["cos_min"] > 0.999
    assert out[0]["mse_mean"] < 1e-4
    # label 1: values are exact multiples of absmax/127 -> zero error
    assert out[1]["mse_mean"] == 0.0
    assert out[1]["cos_mean"] == 1.0
