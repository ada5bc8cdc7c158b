"""Round-15 optimization-round pins: bench artifact contract fields
(cpus_effective / master / classes), the wall-classification map, the
LPA self-loop contract, and the pagerank symmetric fast path."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.conftest import SF_SMOKE


def test_bench_wall_class_map():
    """The contract-wall map is the r14 verdict's item #7 deliverable:
    pin its membership (the three adjudicated families) and the default
    so the artifact's classes can't silently drift."""
    import bench

    walls = bench.CONTRACT_WALLS
    # every classified name must be a real headline query
    assert set(walls) <= set(bench.HEADLINE)
    # the three adjudicated families, per OPTIMIZATION_r14/r15
    assert walls["streaming_stateful_recovery"].startswith("contract-wall:")
    assert walls["stats_corr_matrix"] == "contract-wall:decimal-exactness"
    assert walls["dedup_cluster_canonical"] == "contract-wall:cluster-map-floor"
    assert bench.query_class("q1_pricing_summary") == "optimizable"
    assert bench.query_class("streaming_index_add").startswith("contract-wall")


def test_bench_artifact_carries_effective_parallelism(tmp_path):
    """r14 verdict item #2: the driver's scaling probe flagged
    suspect_cpus_ignored on a harness that honors $SPARK_GRAFT_CPUS
    because nothing in the JSON line proved which master ran. Run the
    bench CLI restricted to two cheap queries at sf0.001 and pin
    cpus_effective + master + classes in the emitted line."""
    detail = tmp_path / "detail.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_ONLY="q1_pricing_summary,topk_orders",
        SPARK_GRAFT_BENCH_DETAIL=str(detail),
        SPARK_GRAFT_NO_RECALL_ROW="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    # ONLY-restricted runs are partial artifacts by metric name
    assert payload["metric"] == "headline_queries_total_partial"
    assert payload["cpus_effective"] == 4
    assert payload["master"] == "local[4]"
    assert payload["classes"] == {
        "q1_pricing_summary": "optimizable",
        "topk_orders": "optimizable",
    }
    # the detail artifact carries the same provenance
    saved = json.loads(detail.read_text())
    assert saved["cpus_effective"] == 4
    assert saved["master"] == "local[4]"


def test_lpa_input_self_loops_are_ignored(spark):
    """label_propagation's exported-API contract (r14 ADVICE): an input
    self-loop must not multiply a node's self-vote. Star graph 1-2, 1-3
    plus a self-loop (2,2): without the filter, node 2 gets three label
    rows and out-votes its neighbor; with it, every node self-votes
    exactly once and the star converges to the hub's label."""
    from disco_spark.similarity.communities import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 2)], "u long, v long"
    )
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(edges, rounds=2).collect()
    }
    # exactly one label row per node (the self-loop added none)
    assert sorted(labels) == [1, 2, 3]
    # with one self-vote each, ties at the first round resolve to the
    # smallest label (mode deterministic) and the component agrees on 1
    assert labels == {1: 1, 2: 1, 3: 1}


def test_pagerank_symmetric_matches_general(spark):
    """symmetric=True must be a pure physical-shape change: identical
    ranks to the general path on an edge list that really is
    symmetric."""
    from disco_spark.similarity.pagerank import pagerank

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    both = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(both, "src long, dst long")
    general = {
        r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()
    }
    fast = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=4, symmetric=True).collect()
    }
    assert general == fast


def test_load_tables_view_registration_skip(spark):
    """The per-query view re-registration skip must still re-register
    when the session alternates sf_dirs: after loading sf0.001 then a
    second dir, the temp view must resolve to the LATEST dir's data."""
    from disco_spark.session import load_tables

    load_tables(spark, SF_SMOKE)
    n_smoke = spark.table("orders").count()
    load_tables(spark, "/root/testdata/sf0.01")
    n_bigger = spark.table("orders").count()
    assert n_bigger > n_smoke
    # and switching back re-registers again (not stuck on last)
    load_tables(spark, SF_SMOKE)
    assert spark.table("orders").count() == n_smoke
