"""Change-data-capture style latest-wins upsert — the Delta/Iceberg
MERGE INTO pattern expressed engine-native: base snapshot + change
batches union into a versioned log, and the CURRENT state is the
highest-version row per key. Reference analog: none (DDFS tags are
append-only blob sets; SURVEY §1.2) — this is the modern table-ops
surface a lakehouse user expects.

Scale story: one window (or max-join) over (key) on the unioned log —
a single hash Exchange on the merge key; change batches are tiny next
to the base, so AQE broadcasts them into the union cheaply. At real
scale the log is partitioned by ingest batch and the compaction job
(write the deduped current state back) runs the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def upsert_latest_wins(
    log: DataFrame, key: str, version: str
) -> DataFrame:
    """Current state of a versioned change log: per key, the row with
    the highest version (ties impossible by contract: version is unique
    per key — enforce upstream)."""
    w = Window.partitionBy(key).orderBy(F.desc(version))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@query(
    "cdc_upsert_latest_wins",
    # the change batch is derived deterministically from orders itself
    # (every 10th order re-priced at +10%, micro-unit exact), so the
    # oracle can replay merge semantics with no side files: updated keys
    # take the new price and version 1, everything else stays version 0
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0
                THEN CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) * 11 // 10
                ELSE CAST(FLOOR(o_totalprice * 1000000) AS BIGINT)
           END AS price_micro,
           CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END AS version
    FROM orders
    """,
)
def cdc_upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics end-to-end: base snapshot (version 0) plus
    a change batch re-pricing every 10th order (+10%, version 1) union
    into a log; latest-wins collapses it to the current state. Prices
    travel as integer micro-units so the +10% reprice is exact BIGINT
    arithmetic on both engines (11/10 in integer space)."""
    t = load_tables(spark, sf_dir)
    base = t["orders"].select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 1_000_000)
        .cast("bigint")
        .alias("price_micro"),
        F.lit(0).cast("bigint").alias("version"),
    )
    changes = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.expr("price_micro * 11 DIV 10").alias("price_micro"),
        F.lit(1).cast("bigint").alias("version"),
    )
    log = base.unionByName(changes)
    return upsert_latest_wins(log, "o_orderkey", "version")


# ---------------------------------------------------------------------------
# SCD2: slowly-changing-dimension type-2 interval construction from a
# change-event log — the other half of the lakehouse dimension story
# (upsert_latest_wins gives the CURRENT state; SCD2 gives the full
# validity history a point-in-time join needs).
# ---------------------------------------------------------------------------


def scd2_intervals(
    events: DataFrame, key: str, state: str, sec: str, tiebreak: str
) -> DataFrame:
    """(key, state, valid_from, valid_to, is_current): collapse a
    change log into type-2 validity intervals — consecutive duplicate
    states merge, each interval closes where the next one opens
    (valid_to NULL = current).

    Two windows over the SAME (key) partitioning/(sec, tiebreak) order,
    so the plan pays ONE hash Exchange on the key: lag() finds change
    points, lead() (after the change-point filter) closes intervals."""
    w = Window.partitionBy(key).orderBy(sec, tiebreak)
    changes = (
        events.select(key, state, sec, tiebreak)
        .withColumn("__prev", F.lag(state).over(w))
        .filter(F.col("__prev").isNull() | (F.col(state) != F.col("__prev")))
    )
    return (
        changes.withColumn("valid_to", F.lead(sec).over(w))
        .select(
            key,
            state,
            F.col(sec).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


@query(
    "scd2_user_state_intervals",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
      FROM events
    ),
    changes AS (
      SELECT * FROM (
        SELECT user_id, event_type, sec, event_id,
               LAG(event_type) OVER (
                 PARTITION BY user_id ORDER BY sec, event_id) AS prev
        FROM ev
      ) WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type, sec AS valid_from,
           LEAD(sec) OVER (
             PARTITION BY user_id ORDER BY sec, event_id) AS valid_to,
           (LEAD(sec) OVER (
             PARTITION BY user_id ORDER BY sec, event_id) IS NULL)
             AS is_current
    FROM changes
    """,
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 validity intervals of each user's event_type state over
    the events log: (user_id, event_type, valid_from, valid_to,
    is_current), seconds precision, (sec, event_id) tie-broken so the
    interval boundaries are engine-deterministic."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        "event_id",
    )
    return scd2_intervals(ev, "user_id", "event_type", "sec", "event_id")
