"""PageRank: Spark loop must match a numpy power iteration of the same
formulation (uniform init, dangling redistribution, fixed iters)."""

from __future__ import annotations

import numpy as np

from disco_spark import registry
from disco_spark.similarity.pagerank import pagerank
from tests.conftest import SF_SMOKE

registry.load_all()


def _numpy_pagerank(edges, iters=5, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in set(edges):
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        recv = np.zeros(n)
        for a, b in set(edges):
            recv[idx[b]] += r[idx[a]] / out[idx[a]]
        dangling = (1.0 - recv.sum()) / n
        r = (1 - d) / n + d * (recv + dangling)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    expect = _numpy_pagerank(edges, iters=5)
    assert set(got) == set(expect)
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-12, (v, got[v], expect[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_registered_query(spark):
    df = registry.QUERIES["pagerank_supplier_part"](spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-3  # rounded ranks still ~sum to 1
    assert all(r["rank"] > 0 for r in rows)
