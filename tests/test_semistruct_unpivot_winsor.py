"""JSON props extraction, unpivot reshape, winsorized stats."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_props_json_oracle(spark):
    compare_query(spark, "events_props_json_stats", SF_CORRECT)


def test_unpivot_oracle(spark):
    compare_query(spark, "unpivot_lineitem_measures", SF_CORRECT)


def test_winsor_oracle(spark):
    compare_query(spark, "winsorized_stats_orders", SF_CORRECT)


def test_props_malformed_counted_not_dropped(spark):
    """Broken JSON and missing keys surface as NULLs in n_null."""
    from disco_spark.operators.semistruct import events_props_json_stats

    rows = [
        (1, 0, 1, "click", 0.0, '{"k": 5}'),
        (2, 0, 1, "click", 0.0, "not json"),
        (3, 0, 1, "click", 0.0, '{"other": 1}'),
    ]
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
        r = events_props_json_stats(spark, d).collect()[0]
    assert r["n"] == 3 and r["n_null"] == 2
    assert r["min_k"] == r["max_k"] == 5 and r["sum_k"] == 5


def test_unpivot_row_conservation(spark):
    """4 measures x |lineitem| rows: each measure group counts n rows."""
    from disco_spark.operators.relational3 import unpivot_lineitem_measures
    from disco_spark.session import load_tables

    n_li = load_tables(spark, SF_CORRECT)["lineitem"].count()
    rows = unpivot_lineitem_measures(spark, SF_CORRECT).collect()
    assert len(rows) == 4
    assert all(r["n"] == n_li for r in rows)


def test_winsor_mean_tamed_by_whale(spark):
    """A whale order moves the raw mean far more than the winsorized
    mean, and gets counted in n_clip_hi."""
    from disco_spark.operators.stats import winsorized_stats_orders

    rows = [(i, "1-URGENT", 100.0) for i in range(200)]
    rows.append((999, "1-URGENT", 1_000_000.0))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        r = winsorized_stats_orders(spark, d).collect()[0]
    assert r["n_clip_hi"] >= 1
    assert r["mean_raw"] > 5000  # whale dominates the raw mean
    assert r["mean_winsor"] < 200  # winsorized mean stays near 100
