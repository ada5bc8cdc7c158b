"""Streaming sink patterns + Spark-4 stateful API (SURVEY §2.8 extension).

Three production patterns beyond the memory-sink demos in windows.py:

- ``foreachBatch`` idempotent sink: per-micro-batch batch writes keyed by
  ``batch_id`` so replays after failure overwrite, not duplicate — the
  exactly-once recipe for sinks with no transactional streaming writer
  (JDBC, plain parquet dirs, external services). Reference parity: the
  classic worker's per-task output-commit protocol
  (lib/disco/worker/__init__.py output + master commit) solved the same
  replay problem with task-atomic renames.
- ``transformWithStateInPandas``: Spark 4's arbitrary-stateful successor
  to applyInPandasWithState (typed state handles, timers, RocksDB-backed
  state store) — the scale path for custom stateful operators: state
  lives off-heap in RocksDB and checkpoints incrementally.
- rate source: the built-in load-generator source (tests only — its
  output is wall-clock-dependent, so no oracle).

Scale notes: foreachBatch gives per-batch transactional boundaries, so
the sink write parallelism equals the batch's partitioning — repartition
inside the batch function if the target needs it. RocksDB state store
keeps per-key state off the JVM heap; at 10^9 live keys the heap-backed
HDFSBackedStateStore would OOM, RocksDB spills.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables
from disco_spark.streaming.windows import run_stream_to_memory

_TOTALS_ORACLE = """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro_sum
    FROM events GROUP BY user_id
"""


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet (ns-timestamp handled like
    windows.py:run_stream_to_memory)."""
    # events.parquet is TIMESTAMP(NANOS); a vanilla (driver) session can't
    # read it without this runtime conf (session.py invariant).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


@query("streaming_foreachbatch_user_totals", oracle=_TOTALS_ORACLE)
def streaming_foreachbatch_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user totals written through a foreachBatch parquet sink.

    The aggregation runs in update mode; every micro-batch hands its
    updated rows to the batch function, which writes them to
    ``batch=<id>/`` with mode=overwrite — a replayed batch id rewrites
    the same directory (idempotence) instead of appending duplicates.
    The final answer is each user's row from the highest batch id; with
    integer micro-unit accumulation it equals the batch GROUP BY, which
    is what the oracle checks.
    """
    out_dir = tempfile.mkdtemp(prefix="feb_sink_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch={batch_id}"))
        )

    agg = (
        _read_events_stream(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("bigint")).alias(
                "value_micro_sum"
            ),
        )
    )
    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sunk = spark.read.parquet(os.path.join(out_dir, "batch=*"))
    latest = sunk.groupBy("user_id").agg(F.max("batch_id").alias("batch_id"))
    result = (
        sunk.join(latest, ["user_id", "batch_id"])
        .select("user_id", "n_events", "value_micro_sum")
        .cache()
    )
    result.count()  # materialize before the temp dir goes away
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


# --------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4 arbitrary stateful processing
# --------------------------------------------------------------------------
try:  # Spark >= 4.0 AND protobuf present (the TWS driver worker imports
    # google.protobuf at runtime; this container lacks it, so gate both
    # the class definition and — below — the query registration).
    import google.protobuf.descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Typed-state running totals: ValueState(n, micro) per user.
        Integer micro-units keep accumulation exact and order-independent
        (same invariant as windows.py:_user_totals_fn)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, micro BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            n, micro = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                micro += int(
                    np.floor(pdf["value"].to_numpy() * 1e6).astype("int64").sum()
                )
            self._totals.update((int(n), int(micro)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_micro_sum": [micro]}
            )

        def close(self) -> None:
            pass

    HAVE_TWS = True
except ImportError:  # pragma: no cover
    HAVE_TWS = False


def tws_user_totals(stream: DataFrame) -> DataFrame:
    return stream.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        "user_id bigint, n_events bigint, value_micro_sum bigint",
        "update",
        "none",
    )


def _streaming_tws_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RunningTotalsProcessor run for real (readStream + availableNow).
    transformWithStateInPandas requires the RocksDB state store; set at
    runtime so the driver's vanilla session works (invariant: never rely
    on session-factory-only config)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return run_stream_to_memory(
        spark, sf_dir, tws_user_totals, output_mode="update", watermark=None
    )


if HAVE_TWS:
    # The same semantics are covered by streaming_stateful_user_totals
    # (applyInPandasWithState) when protobuf is unavailable.
    query("streaming_tws_user_totals", oracle=_TOTALS_ORACLE)(_streaming_tws_user_totals)
