"""Streaming checkpoint recovery + small-file compaction."""

from __future__ import annotations

import datetime
import glob
import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_checkpoint_recovery_oracle(spark):
    compare_query(spark, "streaming_checkpoint_recovery", SF_CORRECT)


def test_compaction_oracle(spark):
    compare_query(spark, "table_compact_small_files", SF_CORRECT)


def test_checkpoint_recovery_synthetic_counts(spark):
    """With wave 1 deleted before the restart, the final counts can
    only be complete if the state store recovered — verify on a tiny
    hand-built stream where both waves contribute to every type."""
    from disco_spark.streaming.windows import streaming_checkpoint_recovery

    base = datetime.datetime(2020, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), i % 3, ["a", "b"][i % 2])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "events.parquet"))
        got = {
            r["event_type"]: r["n"]
            for r in streaming_checkpoint_recovery(spark, dd).collect()
        }
    # evens are type 'a', odds type 'b' -> each wave holds ONE type
    # entirely: losing wave-1 state would zero one of these
    assert got == {"a": 20, "b": 20}


def test_compaction_preserves_rows_and_merges_files(spark):
    from disco_spark.sources.demo import table_compact_small_files

    rows = [(i, i % 7, float(i % 50), "N") for i in range(5000)]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_returnflag string",
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "lineitem.parquet"))
        out = table_compact_small_files(spark, dd)
        assert out.count() == 5000
        # a few MB at most -> one compacted file (inputFiles returns
        # file:// URIs; strip the scheme before globbing)
        (result_dir,) = {
            os.path.dirname(f.removeprefix("file:")) for f in out.inputFiles()
        }
        assert len(glob.glob(os.path.join(result_dir, "part-*.parquet"))) == 1


def test_stateful_recovery_oracle(spark):
    compare_query(spark, "streaming_stateful_recovery", SF_CORRECT)


def test_stateful_recovery_synthetic_totals(spark):
    """applyInPandasWithState state survives the restart: wave 1 (even
    event_ids) is deleted before wave 2 runs, so a user's final totals
    can only include their wave-1 events if the state store recovered
    them. Every user here has events in BOTH waves."""
    from disco_spark.streaming.windows import streaming_stateful_recovery

    rows = [(i, i % 4, 1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "events.parquet"))
        got = {
            r["user_id"]: (r["n_events"], r["value_micro_sum"])
            for r in streaming_stateful_recovery(spark, dd).collect()
        }
    # 40 events over 4 users, half per wave: totals complete only with
    # recovered wave-1 state (losing it would halve every count)
    assert got == {u: (10, 10_000_000) for u in range(4)}
