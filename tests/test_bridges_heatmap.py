"""Local bridges + dow-hour heatmap (triangles.py, eventflow.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_bridges_oracle(spark):
    compare_query(spark, "graph_local_bridges", SF_CORRECT)


def test_heatmap_oracle(spark):
    compare_query(spark, "events_dow_hour_heatmap", SF_CORRECT)


def test_bridges_hand_graph(spark):
    """Triangle 1-2-3 plus pendant edge 3-4: the triangle edges all
    close a triangle; only 3-4 is a local bridge (deg 3, deg 1)."""
    from disco_spark.similarity.triangles import graph_local_bridges

    orders = [
        [1, 2], [1, 2], [2, 3], [2, 3], [1, 3], [1, 3], [3, 4], [3, 4],
    ]
    rows = [
        (ok, p) for ok, parts in enumerate(orders, start=1) for p in parts
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "lineitem.parquet"))
        out = graph_local_bridges(spark, dd).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["v"]) == (3, 4)
    assert (r["deg_u"], r["deg_v"]) == (3, 1)


def test_heatmap_grid_invariants(spark):
    """Cells bounded by the 7x24 grid, shares sum to ~1, volume
    conserved."""
    from disco_spark.operators.eventflow import events_dow_hour_heatmap

    rows = events_dow_hour_heatmap(spark, SF_CORRECT).collect()
    assert len(rows) <= 168
    assert all(1 <= r["dow"] <= 7 and 0 <= r["hr"] <= 23 for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3


def test_heatmap_planted_peak(spark):
    """All traffic on Monday 9am except one stray event -> that cell
    carries ~all share and a dev_ratio ~ 168."""
    from disco_spark.operators.eventflow import events_dow_hour_heatmap

    mon9 = datetime.datetime(2020, 3, 2, 9, 30)  # Monday
    rows = [(i, mon9, i, "view") for i in range(99)] + [
        (99, datetime.datetime(2020, 3, 7, 22, 0), 99, "view")  # Sat 22h
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "events.parquet"))
        out = {
            (r["dow"], r["hr"]): r
            for r in events_dow_hour_heatmap(spark, dd).collect()
        }
    assert set(out) == {(1, 9), (6, 22)}
    assert out[(1, 9)]["share"] == 0.99
    assert abs(out[(1, 9)]["dev_ratio"] - round(0.99 * 168, 6)) < 1e-6
