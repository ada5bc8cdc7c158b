"""Bucketed interval (range) join: points joined to intervals they fall
into, WITHOUT an equi key.

Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as
BroadcastNestedLoopJoin / cartesian — O(|points| x |intervals|) work
that dies at scale. The classic fix (used by every interval-join
implementation — Flink's interval join, Spark's own stream-stream time
join machinery): quantize time into fixed-width buckets, explode each
interval into the buckets it overlaps, equi-join on bucket id, then
re-check the exact predicate. Work becomes
O(|points| + |intervals| x spread + |candidate pairs|): a hash join a
1000-executor cluster can shuffle-partition, with the bucket id as the
co-location key.

Pick ``bucket_width`` near the median interval length: too small
explodes intervals into many buckets, too large makes every bucket a
mini cross product (the candidate/refine ratio degrades). Both costs
are linear and observable; tune per table statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def _bucket(col: Column, width: int) -> Column:
    e = F.unix_timestamp(col)
    return (e - F.pmod(e, F.lit(width))).cast("bigint")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start <= point < end (end-exclusive), via bucket quantization.

    Returns points columns + intervals columns. `how` supports
    inner/left (left keeps pointless rows with nulls, matching a plain
    BETWEEN left join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    # explode each interval into every bucket it overlaps
    b_start = _bucket(F.col(start_ts), bucket_width_s)
    # end-exclusive: an interval ending exactly on a bucket boundary does
    # not overlap that bucket
    b_end = _bucket(
        F.to_timestamp(F.unix_timestamp(F.col(end_ts)) - 1), bucket_width_s
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(b_start, b_end, F.lit(bucket_width_s))),
    )
    pt = points.withColumn("__bucket", _bucket(F.col(point_ts), bucket_width_s))
    exact = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    joined = pt.join(iv, on=["__bucket"], how="inner").filter(exact).drop("__bucket")
    if how == "inner":
        return joined
    # left: re-attach unmatched points with null interval columns
    matched_keys = joined.select(*points.columns).distinct()
    unmatched = pt.drop("__bucket").join(matched_keys, on=points.columns, how="left_anti")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return joined.unionByName(unmatched)


@query(
    "interval_join_event_windows",
    oracle="""
    WITH windows AS (
      SELECT CAST(to_timestamp(epoch(date_trunc('day', ts))::BIGINT + 3600 * (user_id % 4))
                  AS TIMESTAMP) AS w_start,
             CAST(to_timestamp(epoch(date_trunc('day', ts))::BIGINT + 3600 * (user_id % 4) + 7200)
                  AS TIMESTAMP) AS w_end,
             CAST(user_id % 4 AS BIGINT) AS w_id
      FROM events GROUP BY 1, 2, 3
    )
    SELECT w.w_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN windows w
      ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.w_id
    """,
)
def interval_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key): events against a derived set of
    global time windows (4 staggered 2-hour windows per active day),
    counted per window id. The plan is the bucketed interval join —
    hash exchange on bucket id, no BroadcastNestedLoopJoin/cartesian —
    while the oracle runs the naive BETWEEN join."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts")))
    windows = (
        ev.select(
            F.to_timestamp(day + 3600 * F.pmod(F.col("user_id"), F.lit(4))).alias("w_start"),
            F.to_timestamp(day + 3600 * F.pmod(F.col("user_id"), F.lit(4)) + 7200).alias("w_end"),
            F.pmod(F.col("user_id"), F.lit(4)).cast("bigint").alias("w_id"),
        )
        .distinct()
    )
    joined = interval_join(
        ev.select("ts", "user_id"), windows, "ts", "w_start", "w_end", bucket_width_s=3600
    )
    return joined.groupBy("w_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# interval coalescing: merge overlapping per-user intervals and report
# covered time — the timeline-union operator (PostgreSQL range_agg /
# "merge overlapping intervals" classic). Each event opens a fixed
# 5-minute activity window; overlapping windows fuse.
# ---------------------------------------------------------------------------
ACTIVITY_WINDOW_S = 300


@query(
    "interval_coalesce_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT) + {ACTIVITY_WINDOW_S} AS e
      FROM events
    ),
    flag AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             OR MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_iv
      FROM iv
    ),
    grp AS (
      SELECT user_id, s, e,
             SUM(new_iv) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      FROM flag
    ),
    merged AS (
      SELECT user_id, g, MIN(s) AS ms, MAX(e) AS me
      FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS covered_s
    FROM merged GROUP BY user_id
    """,
)
def interval_coalesce_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval timeline coverage: every event opens a 5-minute
    activity window; overlapping windows per user coalesce (classic
    sweep: exclusive running max of interval end -> new-interval flag ->
    running-sum group id), and the output is each user's merged-interval
    count and total covered seconds — "how long was the user actually
    active", the union-of-ranges operator.

    Scale: ONE Exchange on user_id serves both sweep windows and both
    grouped folds (all partition on user_id); per-user state is the
    sorted run the window operator already maintains. Integer epoch
    seconds end-to-end — no float anywhere."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("s"),
        (F.expr("unix_micros(ts) div 1000000") + ACTIVITY_WINDOW_S).alias(
            "e"
        ),
    )
    prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pmax = F.max("e").over(prev)
    flagged = ev.withColumn(
        "new_iv",
        F.when(pmax.isNull() | (F.col("s") > pmax), 1).otherwise(0),
    ).withColumn("g", F.sum("new_iv").over(run))
    merged = flagged.groupBy("user_id", "g").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).alias("covered_s"),
    )
