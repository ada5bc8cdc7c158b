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
