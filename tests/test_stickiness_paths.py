"""DAU/MAU stickiness + session paths (sessionize.py)."""

from __future__ import annotations

import datetime
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_stickiness_oracle(spark):
    compare_query(spark, "events_stickiness_dau_mau", SF_CORRECT)


def test_paths_oracle(spark):
    compare_query(spark, "events_session_path_topk", SF_CORRECT)


def _write_events(spark, dd, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(os.path.join(dd, "events.parquet"))


def test_stickiness_everyone_every_day_is_one(spark):
    """3 users x 7 consecutive days: dau == period_actives daily ->
    stickiness exactly 1 at both grains."""
    from disco_spark.operators.sessionize import events_stickiness_dau_mau

    base = datetime.datetime(2020, 3, 2)  # a Monday
    rows = [
        (d * 10 + u, base + datetime.timedelta(days=d, hours=u), u, "view")
        for d in range(7)
        for u in range(3)
    ]
    with tempfile.TemporaryDirectory() as dd:
        _write_events(spark, dd, rows)
        out = events_stickiness_dau_mau(spark, dd).collect()
    assert {r["grain"] for r in out} == {"month", "week"}
    for r in out:
        assert r["period_actives"] == 3
        assert r["stickiness"] == 1.0
    wk = [r for r in out if r["grain"] == "week"][0]
    assert wk["n_days"] == 7
    assert wk["period_start"] == datetime.date(2020, 3, 2)


def test_stickiness_one_shot_users_dilute(spark):
    """One daily user + 6 one-shot users in a 7-day week: avg DAU = 2
    less 1/7 of... dau_sum = 7 (daily) + 6 = 13; stickiness =
    13 / (7 * 7)."""
    from disco_spark.operators.sessionize import events_stickiness_dau_mau

    base = datetime.datetime(2020, 3, 2)
    rows = [
        (d, base + datetime.timedelta(days=d), 1, "view") for d in range(7)
    ] + [
        (100 + u, base + datetime.timedelta(days=u - 2), u, "view")
        for u in range(2, 8)
    ]
    with tempfile.TemporaryDirectory() as dd:
        _write_events(spark, dd, rows)
        out = {
            r["grain"]: r
            for r in events_stickiness_dau_mau(spark, dd).collect()
        }
    wk = out["week"]
    assert wk["period_actives"] == 7
    assert abs(wk["stickiness"] - round(13 / 49, 6)) < 1e-9


def test_session_path_order_and_truncation(spark):
    """One session view->click->purchase->error: path keeps the first
    PATH_LEN events in time order; a single-event session keeps a
    bare path."""
    from disco_spark.operators.sessionize import events_session_path_topk

    base = datetime.datetime(2020, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "view"),
        (2, base + datetime.timedelta(seconds=10), 1, "click"),
        (3, base + datetime.timedelta(seconds=20), 1, "purchase"),
        (4, base + datetime.timedelta(seconds=30), 1, "error"),
        (5, base, 2, "signup"),
    ]
    with tempfile.TemporaryDirectory() as dd:
        _write_events(spark, dd, rows)
        got = {
            r["path"]: r["n_sessions"]
            for r in events_session_path_topk(spark, dd).collect()
        }
    assert got == {"view>click>purchase": 1, "signup": 1}
