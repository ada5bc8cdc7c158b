"""Python DataSource + bot-score heuristic (pyds.py, eventflow.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_pyds_oracle(spark):
    compare_query(spark, "source_pyds_netstring", SF_CORRECT)


def test_botscore_oracle(spark):
    compare_query(spark, "events_bot_score_heuristic", SF_CORRECT)


def test_pyds_partitions_per_file(spark):
    """The DataSource plans one input partition per chunk file."""
    from disco_spark.sources.pyds import (
        FORMAT_NAME,
        register,
    )
    from disco_spark.sources.readers import write_disco_netstring

    df = spark.createDataFrame(
        [(str(i), f"v{i}") for i in range(20)], "key string, value string"
    ).repartition(4)
    with tempfile.TemporaryDirectory() as dd:
        path = os.path.join(dd, "ns")
        write_disco_netstring(df, path)
        register(spark)
        back = spark.read.format(FORMAT_NAME).load(path)
        assert back.rdd.getNumPartitions() == 4
        got = {(r["key"], r["value"]) for r in back.collect()}
    assert got == {(str(i), f"v{i}") for i in range(20)}


def test_botscore_flags_planted_bot(spark):
    """A clockwork single-type high-rate user scores 3; organic-ish
    users (mixed types, jittered gaps, low rate) score below."""
    from disco_spark.operators.eventflow import events_bot_score_heuristic

    base = datetime.datetime(2020, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # bot: every 60s exactly, one type, 200 events in ~3.3h -> 200/day
    for i in range(200):
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(seconds=60 * i), 999, "ping")
        )
    # humans: 2 events/day over 10 days, alternating types, jittery
    for u in range(5):
        for d in range(10):
            for j, jitter in enumerate((u * 977 + d * 3571) % 40000 for _ in range(2)):
                eid += 1
                rows.append(
                    (
                        eid,
                        base
                        + datetime.timedelta(
                            days=d, seconds=3600 * 8 * (j + 1) + jitter + eid
                        ),
                        u,
                        ["view", "click", "purchase"][(u + d + j) % 3],
                    )
                )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "events.parquet"))
        out = events_bot_score_heuristic(spark, dd).collect()
    top = out[0]
    assert top["user_id"] == 999
    assert top["bot_score"] == 3
    assert top["entropy"] == 0.0
    assert top["gap_cv"] == 0.0
    assert all(r["bot_score"] < 3 for r in out[1:])
