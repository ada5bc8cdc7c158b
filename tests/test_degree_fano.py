"""Degree distribution and Fano burstiness."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_degree_oracle(spark):
    compare_query(spark, "graph_degree_distribution", SF_CORRECT)


def test_fano_oracle(spark):
    compare_query(spark, "events_burstiness_fano", SF_CORRECT)


def test_degree_histogram_conserves_edges(spark):
    """sum(degree * n_nodes) == 2 * |edges| (handshake lemma)."""
    from disco_spark.similarity.triangles import (
        coorder_edges,
        graph_degree_distribution,
    )
    from disco_spark.session import load_tables

    li = load_tables(spark, SF_CORRECT)["lineitem"]
    n_edges = coorder_edges(li).count()
    hist = graph_degree_distribution(spark, SF_CORRECT).collect()
    assert sum(r["degree"] * r["n_nodes"] for r in hist) == 2 * n_edges


def test_fano_poisson_vs_burst(spark):
    """A metronomic 1-event-per-hour user scores fano ~ 0; a user
    firing all events in one hour of a long span scores fano >> 1."""
    from disco_spark.operators.eventflow import events_burstiness_fano

    rows = []
    # user 1: one event each hour for 24h (variance 0 -> fano 0)
    for h in range(24):
        rows.append((100 + h, h * 3600, 1, "click", 0.0, "{}"))
    # user 2: 24 events in hour 0, then silence until hour 23
    for j in range(24):
        rows.append((200 + j, j, 2, "click", 0.0, "{}"))
    rows.append((299, 23 * 3600, 2, "click", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, sec long, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r["user_id"]: r
            for r in events_burstiness_fano(spark, d).collect()
        }
    assert got[1]["fano"] == 0.0 and got[1]["n_hours"] == 24
    assert got[2]["fano"] > 5.0
