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


def test_ann_pq_recall_vs_bruteforce(spark):
    """PQ encode + ADC shortlist + exact rerank must recover most of the
    exact top-k (approximate op — this recall gate replaces a SQL oracle,
    same policy as ann_ivf_topk)."""
    from collections import defaultdict

    pq_rows = registry.QUERIES["ann_pq_topk"](spark, SF_SMOKE).collect()
    bf_rows = registry.QUERIES["ann_cosine_topk"](spark, SF_SMOKE).collect()
    got, want = defaultdict(set), defaultdict(set)
    for r in pq_rows:
        got[r.query_id].add(r.neighbor_id)
    for r in bf_rows:
        want[r.query_id].add(r.neighbor_id)
    recalls = [len(got[q] & want[q]) / len(want[q]) for q in want]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.8, f"PQ recall@5: {recalls}"


def test_pq_codes_are_compact_and_deterministic(spark):
    """Encoding is the 100-TB pass: codes must be within [0, ksub) and
    stable across runs (deterministic train + encode)."""
    from disco_spark.session import load_tables
    from disco_spark.similarity.pq import K_SUB, M_SUBSPACES, pq_encode, pq_train

    e = load_tables(spark, SF_SMOKE)["embeddings"]
    books = pq_train(e)
    assert books.shape == (M_SUBSPACES, K_SUB, 64 // M_SUBSPACES)
    codes1 = {r.vec_id: tuple(r.codes) for r in pq_encode(e, books).collect()}
    codes2 = {r.vec_id: tuple(r.codes) for r in pq_encode(e, books).collect()}
    assert codes1 == codes2
    assert all(
        len(c) == M_SUBSPACES and all(0 <= x < K_SUB for x in c)
        for c in codes1.values()
    )


def test_brp_lsh_crosscheck(spark):
    """spark.ml BucketedRandomProjectionLSH as an independent ANN
    implementation: on L2-normalized vectors, euclidean NN == cosine NN,
    so its approxNearestNeighbors should largely agree with our exact
    top-k. Cross-checks our operators against Spark's own LSH."""
    from collections import defaultdict

    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    from disco_spark.session import load_tables

    e = load_tables(spark, SF_SMOKE)["embeddings"]
    vecs = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(
        e.select("vec_id", array_to_vector(F.col("embedding")).alias("raw"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=6, seed=42
    )
    model = lsh.fit(vecs)
    queries = vecs.filter(F.col("vec_id") < 5).collect()

    bf_rows = registry.QUERIES["ann_cosine_topk"](spark, SF_SMOKE).collect()
    want = defaultdict(set)
    for r in bf_rows:
        want[r.query_id].add(r.neighbor_id)

    recalls = []
    for qrow in queries:
        nn = model.approxNearestNeighbors(
            vecs.filter(F.col("vec_id") != qrow.vec_id), qrow.features, 5
        ).collect()
        got = {r.vec_id for r in nn}
        recalls.append(len(got & want[qrow.vec_id]) / 5)
    assert sum(recalls) / len(recalls) >= 0.8, f"BRP-LSH vs exact: {recalls}"


def test_knn_graph_oracle(spark):
    compare_query(spark, "ann_knn_graph", SF_SMOKE)


def test_knn_graph_shape(spark):
    """Every vector gets <= k neighbors and no self-edges on testdata
    (whose embeddings are near-random — recall there is a property of
    the data, not the operator; see the clustered test below)."""
    from disco_spark.session import load_tables
    from disco_spark.similarity.ann import knn_graph

    e = load_tables(spark, SF_SMOKE)["embeddings"]
    g = knn_graph(e, k=3, nprobe=2).collect()
    by_src = {}
    for r in g:
        assert r.src_id != r.dst_id
        by_src.setdefault(r.src_id, []).append(r)
    assert all(len(v) <= 3 for v in by_src.values())
    assert len(by_src) == e.count()  # every vector has neighbors


def test_knn_graph_recall_on_clustered(spark, clustered):
    """On cluster-structured embeddings (the shape IVF assumes), the
    blocked graph recovers the brute-force top-1 for nearly every node."""
    from disco_spark.similarity.ann import knn_graph
    from disco_spark.dedup.dedup import dot, norm
    from pyspark.sql.window import Window as W

    by_src = {}
    for r in knn_graph(clustered, k=3, nprobe=2).collect():
        by_src.setdefault(r.src_id, set()).add(r.dst_id)
    a = clustered.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("qe"))
    b = clustered.select(F.col("vec_id").alias("dst_id"), F.col("embedding").alias("de"))
    pairs = a.join(b, F.col("src_id") != F.col("dst_id")).withColumn(
        "cs", dot(F.col("qe"), F.col("de")) / (norm(F.col("qe")) * norm(F.col("de")))
    )
    top1 = {
        r.src_id: r.dst_id
        for r in pairs.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("src_id").orderBy(F.desc("cs"), F.asc("dst_id"))),
        ).filter(F.col("rn") == 1).collect()
    }
    hit = sum(1 for s, dsts in by_src.items() if top1[s] in dsts)
    assert hit / len(by_src) >= 0.95


def test_knn_graph_plan_shape(spark):
    """The candidate join must be an equi (hash) join on the cell id —
    the only nested-loop allowed is vector-vs-centroid ranking, whose
    right side is the broadcast centroid table (O(cells) rows). A
    nested-loop against the member table would be the O(n^2) plan the
    operator exists to avoid."""
    from disco_spark.session import load_tables
    from disco_spark.similarity.ann import knn_graph

    e = load_tables(spark, SF_SMOKE)["embeddings"]
    plan = knn_graph(e)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # members joined by cell id
    # exactly one nested-loop: the centroid-ranking cross join
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_ann_ivfpq_oracle(spark):
    compare_query(spark, "ann_ivfpq_topk", SF_SMOKE)


def test_ivfpq_equals_ivf_exact(spark):
    """IVF-PQ's shortlist+rerank must recover the exact-within-probed-
    cells result (what ann_ivf_topk computes) — the property that makes
    the shared oracle valid."""
    ivf = {tuple(r) for r in registry.QUERIES["ann_ivf_topk"](spark, SF_SMOKE).collect()}
    ivfpq = {tuple(r) for r in registry.QUERIES["ann_ivfpq_topk"](spark, SF_SMOKE).collect()}
    assert ivf == ivfpq


def test_adaptive_cells_cardinality_grows(spark):
    """The scaling lesson: cell count must grow with n (k = ceil(sqrt(n)))."""
    import math

    from disco_spark.session import load_tables
    from disco_spark.similarity.ann import adaptive_cells
    from tests.conftest import SF_SMOKE

    e = load_tables(spark, SF_SMOKE)["embeddings"]
    n = e.count()
    cells = adaptive_cells(e)
    k_expected = max(8, math.isqrt(n - 1) + 1)
    n_cells = cells.select("label").distinct().count()
    assert n_cells <= k_expected  # empty cells may collapse
    assert n_cells >= k_expected // 2  # but most must be populated
    assert cells.count() == n  # total assignment, one cell per vector


def test_adaptive_knn_recall_gate(spark):
    """Adaptive-cell knn recall vs the exact baseline. The synthetic
    embeddings are near-uniform (hardest case for IVF); the gate is a
    regression tripwire, not an absolute-quality claim."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from disco_spark import registry
    from disco_spark.dedup.dedup import dot, norm
    from disco_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    registry.load_all()
    e = load_tables(spark, SF_SMOKE)["embeddings"]
    ed = e.withColumn("nrm", norm(F.col("embedding")))
    a = ed.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("ea"),
                  F.col("nrm").alias("na"))
    b = ed.select(F.col("vec_id").alias("dst_id"), F.col("embedding").alias("eb"),
                  F.col("nrm").alias("nb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("src_id") != F.col("dst_id"))
        .withColumn("cos_sim",
                    F.round(dot(F.col("ea"), F.col("eb"))
                            / (F.col("na") * F.col("nb")), 6))
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos_sim"), F.asc("dst_id"))
    exact = {
        (r.src_id, r.dst_id)
        for r in pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).select("src_id", "dst_id").collect()
    }
    approx = {
        (r.src_id, r.dst_id)
        for r in registry.QUERIES["ann_knn_graph_adaptive"](spark, SF_SMOKE).collect()
    }
    n_src = len({s for s, _ in exact})
    assert len(approx) == 5 * n_src  # k rows per source
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.45, f"recall collapsed: {recall:.3f}"
    # determinism: same assignment and graph on a second run
    approx2 = {
        (r.src_id, r.dst_id)
        for r in registry.QUERIES["ann_knn_graph_adaptive"](spark, SF_SMOKE).collect()
    }
    assert approx == approx2


def test_adaptive_near_dup_recall(spark):
    """The scale-path near-dup variant must recover most of the
    label-block join's pairs (it may legitimately find MORE: kmeans
    cells cross label boundaries the exact join never searches)."""
    from disco_spark import registry
    from tests.conftest import SF_CORRECT

    registry.load_all()
    # sf0.01, not the sf0.001 smoke dir: the 50-vector smoke corpus
    # yields a near-empty pair baseline where one boundary pair swings
    # the ratio by 20 points
    from disco_spark.dedup.dedup import embedding_cosine_block_exact

    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_cosine_block_exact(spark, SF_CORRECT).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in registry.QUERIES["dedup_embedding_cosine"](
            spark, SF_CORRECT
        ).collect()
    }
    assert exact, "baseline produced no pairs; threshold drifted"
    recall = len(exact & approx) / len(exact)
    # deterministic 3/5 at sf0.01 (kmeans is decimal-exact, so this is
    # stable run-to-run); the gate has margin below that observed value
    assert recall >= 0.55, f"near-dup recall collapsed: {recall:.2f}"


def test_dedup_deep_superset_of_default(spark):
    """k=20 pairs must contain every k=TOP_K pair: widening the per-
    vector edge cap only ADDS edges (same cells, same threshold)."""
    registry.load_all()
    base = {
        (r.vec_a, r.vec_b)
        for r in registry.QUERIES["dedup_embedding_cosine"](spark, SF_SMOKE).collect()
    }
    deep = {
        (r.vec_a, r.vec_b)
        for r in registry.QUERIES["dedup_embedding_cosine_deep"](spark, SF_SMOKE).collect()
    }
    assert base <= deep


def test_ann_recall_audit_oracle(spark):
    compare_query(spark, "ann_recall_audit", "/root/testdata/sf0.01")


def test_ann_recall_audit_accounting(spark):
    """Histogram bounds: every probe appears exactly once, matched
    counts sit in [0, TOP_K], and the implied recall agrees with a
    direct set comparison against the independently-computed ground
    truth and the registered graph's output."""
    from disco_spark.similarity.ann import (
        AUDIT_N_QUERIES,
        TOP_K,
        _exact_topk_pairs,
    )

    registry.load_all()
    rows = registry.QUERIES["ann_recall_audit"](spark, SF_SMOKE).collect()
    assert sum(r.n_queries for r in rows) == AUDIT_N_QUERIES
    assert all(0 <= r.n_matched <= TOP_K for r in rows)
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in _exact_topk_pairs(e, AUDIT_N_QUERIES).collect()
    }
    assert len(exact) == AUDIT_N_QUERIES * TOP_K
    approx = {
        (r.src_id, r.dst_id)
        for r in registry.QUERIES["ann_knn_graph_adaptive"](spark, SF_SMOKE).collect()
        if r.src_id < AUDIT_N_QUERIES
    }
    assert sum(r.n_matched * r.n_queries for r in rows) == len(exact & approx)
    # the 5-probe exact demo is the audit ground truth's prefix
    demo = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["ann_cosine_topk"](spark, SF_SMOKE).collect()
    }
    assert demo <= exact


def test_nprobe_calibration_oracle(spark):
    compare_query(spark, "ann_nprobe_calibration", "/root/testdata/sf0.01")


def test_nprobe_calibration_consistent_with_audit(spark):
    """Coverage is monotone in nprobe, tops out at the full ground
    truth, and at the production setting (nprobe=4) candidate coverage
    equals the audit's end-to-end matched count — scanned true
    neighbors always make the top-k cut, so the two instruments must
    agree at the operating point."""
    from disco_spark.similarity.ann import AUDIT_N_QUERIES, TOP_K

    registry.load_all()
    cal = {
        r.nprobe: r
        for r in registry.QUERIES["ann_nprobe_calibration"](spark, SF_SMOKE).collect()
    }
    probes = sorted(cal)
    for lo, hi in zip(probes, probes[1:]):
        assert cal[lo].n_covered <= cal[hi].n_covered
    total = AUDIT_N_QUERIES * TOP_K
    assert all(0 <= cal[p].n_covered <= total for p in probes)
    audit = registry.QUERIES["ann_recall_audit"](spark, SF_SMOKE).collect()
    matched = sum(r.n_matched * r.n_queries for r in audit)
    assert cal[4].n_covered == matched


def test_cluster_embedding_oracle(spark):
    compare_query(spark, "dedup_cluster_embedding", "/root/testdata/sf0.01")


def test_cluster_embedding_covers_every_pair_and_vector(spark):
    """Every >=COS_MIN knn pair shares a cluster; every vector appears
    exactly once; a cluster never straddles pairs it should join."""
    registry.load_all()
    cm = {
        r.vec_id: r.cluster_id
        for r in registry.QUERIES["dedup_cluster_embedding"](spark, SF_SMOKE).collect()
    }
    pairs = registry.QUERIES["dedup_embedding_cosine"](spark, SF_SMOKE).collect()
    assert pairs, "no cosine pairs at smoke SF; threshold drifted"
    for r in pairs:
        assert cm[r.vec_a] == cm[r.vec_b], (r.vec_a, r.vec_b)
    n = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(cm) == n
