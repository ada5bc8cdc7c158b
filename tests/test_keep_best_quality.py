"""Quality-aware dedup keep map (dedup/cc.py): keep the highest-
quality member of each near-dup cluster, not the min-doc_id one."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_keep_best_oracle(spark):
    compare_query(spark, "dedup_keep_best_quality", SF_CORRECT)


def test_exactly_one_keeper_per_cluster(spark):
    from disco_spark.dedup.cc import dedup_keep_best_quality

    df = dedup_keep_best_quality(spark, SF_CORRECT)
    per_cluster = {
        r["cluster_id"]: r["n"]
        for r in df.filter("keep = 1").groupBy("cluster_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert per_cluster
    assert set(per_cluster.values()) == {1}
    # every cluster has a keeper
    n_clusters = df.select("cluster_id").distinct().count()
    assert len(per_cluster) == n_clusters


def test_keeper_beats_min_id_when_quality_differs(spark):
    """Two near-identical docs where the HIGHER doc_id is cleaner
    (higher alpha ratio): keep must pick it over the min-id canonical.
    Doc 2 = doc 1's text without the symbol noise, replicated exactly
    so the pair lands in one signature group (a guaranteed near-dup
    pair regardless of banding)."""
    from disco_spark.dedup.cc import dedup_keep_best_quality

    clean = ("the quick brown fox jumps over the lazy dog and then "
             "walks away into the quiet field") * 3
    noisy = clean + " ####"
    docs = spark.createDataFrame(
        [(1, noisy), (2, clean), (3, "totally different content here")],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = {
            r["doc_id"]: r for r in dedup_keep_best_quality(spark, dd).collect()
        }
    # docs 1 and 2 cluster together (cluster 1); the cleaner doc 2 wins
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"]
    if rows[1]["cluster_id"] == rows[2]["cluster_id"] != 3:
        assert rows[2]["quality"] > rows[1]["quality"]
        assert rows[2]["keep"] == 1
        assert rows[1]["keep"] == 0
    # the singleton keeps itself
    assert rows[3]["keep"] == 1
