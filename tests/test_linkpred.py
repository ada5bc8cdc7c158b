"""RA link prediction + degree assortativity (similarity/triangles.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_ra_oracle(spark):
    compare_query(spark, "graph_ra_link_prediction", SF_CORRECT)


def test_assortativity_oracle(spark):
    compare_query(spark, "graph_assortativity_degree", SF_CORRECT)


def _write_lineitem(spark, dd, orders):
    rows = [
        (ok, p) for ok, parts in enumerate(orders, start=1) for p in parts
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(os.path.join(dd, "lineitem.parquet"))


def test_path_graph_hand_values(spark):
    """Orders building the path 1-2-3 (each edge co-ordered twice):
    the only predicted link is (1,3) through middle 2 (deg 2) ->
    RA = 0.5; a path's endpoints are degree-1, middle degree-2 ->
    assortativity exactly -1."""
    from disco_spark.similarity.triangles import (
        graph_assortativity_degree,
        graph_ra_link_prediction,
    )

    with tempfile.TemporaryDirectory() as dd:
        _write_lineitem(
            spark, dd, [[1, 2], [1, 2], [2, 3], [2, 3]]
        )
        ra = graph_ra_link_prediction(spark, dd).collect()
        assert len(ra) == 1
        assert (ra[0]["a"], ra[0]["b"]) == (1, 3)
        assert ra[0]["n_common"] == 1
        assert ra[0]["ra_score"] == 0.5
        asrt = graph_assortativity_degree(spark, dd).collect()[0]
        assert asrt["n_nodes"] == 3
        assert asrt["n_edges"] == 2
        assert asrt["assortativity"] == -1.0


def test_ra_excludes_existing_edges_and_regular_graph_null(spark):
    """Completing the triangle leaves no non-adjacent pair -> RA
    empty; the triangle is 2-regular -> zero degree variance ->
    assortativity NULL (guarded, not a divide-by-zero)."""
    from disco_spark.similarity.triangles import (
        graph_assortativity_degree,
        graph_ra_link_prediction,
    )

    with tempfile.TemporaryDirectory() as dd:
        _write_lineitem(
            spark,
            dd,
            [[1, 2], [1, 2], [2, 3], [2, 3], [1, 3], [1, 3]],
        )
        assert graph_ra_link_prediction(spark, dd).collect() == []
        asrt = graph_assortativity_degree(spark, dd).collect()[0]
        assert asrt["n_edges"] == 3
        assert asrt["assortativity"] is None
