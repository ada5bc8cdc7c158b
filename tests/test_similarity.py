"""Similarity search: oracle match for brute force; IVF recall on
clustered data (the testdata embeddings are uniform random — labels
carry no neighborhood structure, so IVF recall there is nprobe/ncells
by construction; cluster structure is what IVF exploits in practice)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.similarity.ann import ann_ivf_search
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


def test_ann_bruteforce_oracle(spark):
    compare_query(spark, "ann_cosine_topk", SF_SMOKE)


def test_ann_ivf_runs_on_testdata(spark):
    rows = registry.QUERIES["ann_ivf_topk"](spark, SF_SMOKE).collect()
    assert len(rows) == 25  # 5 queries x top-5
    assert all(0 <= r.cos_sim <= 1 or r.cos_sim >= -1 for r in rows)


@pytest.fixture()
def clustered(spark):
    """200 vectors in 10 tight clusters; label = true cluster id."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(200):
        c = i % 10
        v = centers[c] + rng.normal(scale=0.05, size=16)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


def test_ann_ivf_high_recall_on_clustered(spark, clustered):
    q = clustered.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ivf = ann_ivf_search(clustered, q, k=5, nprobe=2).collect()

    # brute-force truth
    from disco_spark.dedup.dedup import cosine
    from pyspark.sql.window import Window

    e = clustered
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("q_emb"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    brute = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .collect()
    )
    truth = {(r.query_id, r.neighbor_id) for r in brute}
    got = {(r.query_id, r.neighbor_id) for r in ivf}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, f"IVF recall on clustered data: {recall}"
