"""k-hop BFS reachability (similarity/khop.py): oracle parity plus
planted-graph distance assertions against the SHIPPED frontier-BFS."""

from __future__ import annotations

from disco_spark.similarity.khop import khop_reachability
from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_khop_oracle(spark):
    compare_query(spark, "graph_khop_reachability", SF_CORRECT)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_khop_path_graph_distances(spark):
    """Path 1-2-3-4-5: hops from node 1 are exact BFS distances; node 5
    (distance 4) is outside the k=3 horizon."""
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["hops"] for r in khop_reachability(edges, 3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_khop_min_distance_wins_over_long_path(spark):
    """Diamond with a shortcut: 1-2-4 and 1-3-4 plus direct 1-4 -> node
    4 reports hop 1, not 2 (anti-join keeps first discovery)."""
    edges = _edges(spark, [(1, 2), (2, 4), (1, 3), (3, 4), (1, 4)])
    out = {r["node"]: r["hops"] for r in khop_reachability(edges, 3).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 1}


def test_khop_disconnected_component_unreached(spark):
    edges = _edges(spark, [(1, 2), (10, 11)])
    out = {r["node"]: r["hops"] for r in khop_reachability(edges, 3).collect()}
    assert 10 not in out and 11 not in out
    assert out == {1: 0, 2: 1}
