"""Time-bucketed rollup materialization (hypertable-style continuous
aggregates): raw events -> hourly grains -> coarser buckets derived FROM
the hourly grains, never re-scanning raw data.

This is the pattern every large event store uses (TimescaleDB
continuous aggregates, Druid rollup segments): the hourly table is the
materialization you'd `writeStream`/schedule; every coarser resolution
(6h, daily, weekly) re-aggregates the tiny hourly grain table. At
100 TB the raw events are touched ONCE per period; all dashboard
queries hit grains that are orders of magnitude smaller. Correct
because the measures are algebraic (count/sum re-aggregate exactly —
the same partial/final contract Catalyst uses internally).

Measure sums use integer micro-units (exact, order-independent) per the
streaming invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def hourly_grains(events: DataFrame) -> DataFrame:
    """The materialized hourly grain table: one row per
    (hour, event_type) with algebraic measures."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias(
                "value_micro_sum"
            ),
        )
    )


def epoch_bucket(col: str, hours: int) -> "F.Column":
    """Epoch-aligned `hours`-wide bucket start for a timestamp column.
    Spark's unix_timestamp truncates sub-second parts toward zero; the
    matching DuckDB fragment is _EPOCH_BUCKET_SQL — which must FLOOR
    epoch(ts) explicitly, because DuckDB's double->BIGINT cast ROUNDS
    and would push events in the last half-second of a window into the
    next bucket."""
    width = hours * 3600
    return F.timestamp_seconds(
        F.unix_timestamp(col) - F.pmod(F.unix_timestamp(col), F.lit(width))
    )


def _epoch_bucket_sql(col: str, hours: int) -> str:
    width = hours * 3600
    e = f"CAST(FLOOR(epoch({col})) AS BIGINT)"
    return f"CAST(to_timestamp({e} - {e} % {width}) AS TIMESTAMP)"


def rollup_grains(grains: DataFrame, hours: int) -> DataFrame:
    """Re-aggregate grain rows into `hours`-wide buckets (bucket start =
    epoch-aligned). Input is the (already tiny) grain table — raw events
    are never re-scanned."""
    return grains.groupBy(
        epoch_bucket("bucket", hours).alias("bucket"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_micro_sum").alias("value_micro_sum"),
    )


def merge_grains(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two hourly grain tables (algebraic measures add): the
    continuous-aggregate REFRESH step — new data's grains fold into the
    materialized table without ever re-scanning old raw events. Buckets
    present in both sides combine; disjoint buckets pass through."""
    return (
        a.unionByName(b)
        .groupBy("bucket", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_micro_sum").alias("value_micro_sum"),
        )
    )


# refresh cutoff: everything before is the "materialized" history,
# everything after is the incoming batch (testdata spans 1995-2001).
# MID-HOUR on purpose: the cutoff's own hourly bucket appears on BOTH
# sides of the union, so the driver-gated query exercises the
# combine-sum path, not just disjoint pass-through (a combine
# regression must show up as an oracle mismatch).
REFRESH_CUTOFF = "1998-06-01 00:30:00"


@query(
    "rollup_incremental_refresh",
    # the oracle is the FULL re-aggregation over all raw events: an
    # incremental refresh (old grains + new batch's grains) must be
    # indistinguishable from a rebuild — the hypertable/continuous-
    # aggregate correctness contract. A bucket straddling the cutoff
    # exercises the combine path.
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro_sum
    FROM events GROUP BY 1, 2
    """,
)
def rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate refresh: the pre-cutoff grain table (in
    production: the persisted materialization) merged with grains of the
    post-cutoff batch. At 100 TB the left side is a read of the tiny
    grain table and ONLY the new batch's raw rows are scanned; here both
    sides derive from the same events scan to stay oracle-checkable."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    old = ev.filter(F.col("ts") < F.lit(REFRESH_CUTOFF).cast("timestamp"))
    new = ev.filter(F.col("ts") >= F.lit(REFRESH_CUTOFF).cast("timestamp"))
    return merge_grains(hourly_grains(old), hourly_grains(new))


@query(
    "rollup_events_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro_sum
    FROM events GROUP BY 1, 2
    """,
)
def rollup_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly continuous-aggregate grain table."""
    t = load_tables(spark, sf_dir)
    return hourly_grains(t["events"])


@query(
    "rollup_events_6h_from_hourly",
    oracle=f"""
    SELECT {_epoch_bucket_sql("ts", 6)} AS bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro_sum
    FROM events GROUP BY 1, 2
    """,
)
def rollup_events_6h_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour buckets derived FROM the hourly grains (two-level rollup).
    The oracle aggregates raw events directly — passing proves the
    grain re-aggregation is exact (algebraic measures compose)."""
    t = load_tables(spark, sf_dir)
    return rollup_grains(hourly_grains(t["events"]), hours=6)


@query(
    "rollup_hll_daily_users",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_users
    FROM events GROUP BY 1
    UNION ALL
    SELECT NULL AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_users
    FROM events
    """,
)
def rollup_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup via DataSketches HLL: one pass
    builds per-day user sketches; the all-time row MERGES the daily
    sketches (hll_union_agg) without re-scanning raw events — the
    continuous-aggregate property COUNT(DISTINCT) lacks (distinct is
    not algebraic; sketches are). At 100 TB this is how per-day/
    per-week/all-time uniques come from one raw scan.

    Oracle note: the oracle compares against EXACT distinct counts —
    valid because DataSketches HLL is exact in sparse mode, and the
    driver's gate cardinality (~150 users/day at sf0.01) is far below
    the lgK=12 sparse-to-dense threshold. The estimator's behavior at
    real cardinalities is gated separately in pytest (relative error on
    100k synthetic ids)."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    per_day = daily.select(
        "day", F.hll_sketch_estimate("sk").cast("bigint").alias("est_users")
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("est_users")
    ).select(F.lit(None).cast("date").alias("day"), "est_users")
    return per_day.unionAll(total)


# --------------------------------------------------------------------------
# Mergeable histogram quantiles: the continuous-aggregate answer for
# percentiles. Exact percentiles (like exact distinct) are not algebraic —
# you cannot merge two hourly p95s into a 6h p95. A FIXED-BIN histogram is
# mergeable by construction (bin counts add), so one raw scan materializes
# hourly histogram grains and every coarser window's quantiles come from
# summed bins. Resolution is the bin width (here 8 value-units over the
# [0, 512) domain); the estimate is the lower edge of the first bin whose
# cumulative count crosses the rank — all integer arithmetic, so the
# DuckDB oracle (which bins raw events straight into 6h buckets) matching
# PROVES the hourly->6h merge is exact.
# --------------------------------------------------------------------------
_H_BINS = 64
_H_WIDTH = 8  # value domain [0, 512): 64 bins x 8


def histogram_grains(events: DataFrame) -> DataFrame:
    """Hourly histogram grain rows: (bucket, bin, n)."""
    binexp = F.least(
        F.lit(_H_BINS - 1), F.floor(F.col("value") / _H_WIDTH).cast("int")
    )
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), binexp.alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "rollup_histogram_quantiles_6h",
    oracle=f"""
    WITH b AS (
      SELECT {_epoch_bucket_sql("ts", 6)} AS bucket,
             LEAST({_H_BINS - 1}, CAST(FLOOR(value / {_H_WIDTH}) AS INT)) AS bin,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT bucket, bin, n,
             SUM(n) OVER (PARTITION BY bucket ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY bucket) AS total
      FROM b
    )
    SELECT bucket,
           CAST(MAX(total) AS BIGINT) AS n_events,
           CAST(MIN(CASE WHEN 2 * cum >= total THEN bin END) * {_H_WIDTH}
                AS BIGINT) AS p50_lo,
           CAST(MIN(CASE WHEN 20 * cum >= 19 * total THEN bin END) * {_H_WIDTH}
                AS BIGINT) AS p95_lo
    FROM c GROUP BY bucket
    """,
)
def rollup_histogram_quantiles_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95 of event value per 6-hour window, computed from HOURLY
    histogram grains merged by bin addition — raw events scanned once.
    The quantile is the lower edge of the first bin whose cumulative
    count reaches the rank (2*cum >= total for p50; 20*cum >= 19*total
    for p95 — integer inequalities, no float ranks). The window runs
    over at most `_H_BINS` rows per bucket; at 100 TB the grain table is
    buckets x 64 rows regardless of event volume."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    hourly = histogram_grains(t["events"])
    merged = hourly.groupBy(
        epoch_bucket("bucket", 6).alias("bucket"), "bin"
    ).agg(F.sum("n").alias("n"))
    w_cum = (
        Window.partitionBy("bucket").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("bucket")
    c = merged.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(w_all)
    )
    return c.groupBy("bucket").agg(
        F.max("total").cast("bigint").alias("n_events"),
        (F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("bin"))) * _H_WIDTH)
        .cast("bigint")
        .alias("p50_lo"),
        (
            F.min(F.when(20 * F.col("cum") >= 19 * F.col("total"), F.col("bin")))
            * _H_WIDTH
        )
        .cast("bigint")
        .alias("p95_lo"),
    )


# --------------------------------------------------------------------------
# Mergeable heavy hitters: count-min sketch rollup. Completes the sketch
# family — HLL for distinct, fixed-bin histograms for quantiles, count-min
# for per-key counts: an hourly (bucket, seed, col, n) grain table merges
# into any coarser window by pure addition, and a key's count estimate is
# the MIN over seeds of its hashed cell — never re-reading raw events.
# Hashes are md5-derived (the hash_bucket parity family), so DuckDB can
# replay the sketch arithmetic bit-for-bit: the oracle verifies the
# ESTIMATES, not the true counts (count-min overestimates on collisions
# by design; the estimate itself is deterministic).
# --------------------------------------------------------------------------
_CM_DEPTH = 4     # independent hash rows
_CM_WIDTH = 1024  # cells per row
_CM_TOPK = 20


def _cm_col(key, seed: int):
    """Cell index for `key` under hash row `seed` — same md5 family as
    sampling.hash_bucket, replayable in DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cm{seed} "), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint") % _CM_WIDTH


def _cm_col_sql(key: str, seed: int) -> str:
    return (
        f"(('0x' || substr(md5('cm{seed} ' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_CM_WIDTH})"
    )


def cm_sketch_grains(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Hourly count-min grain rows: (bucket, seed, col, n). One scan;
    at most depth x width rows per hour regardless of event volume."""
    rows = F.array(*[
        F.struct(F.lit(s).alias("seed"), _cm_col(F.col(key), s).alias("col"))
        for s in range(_CM_DEPTH)
    ])
    return (
        events.select(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.explode(rows).alias("r"),
        )
        .groupBy("bucket", F.col("r.seed").alias("seed"), F.col("r.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_CM_CELL_CASE = " ".join(
    "WHEN {s} THEN {expr}".format(s=s, expr=_cm_col_sql("user_id", s))
    for s in range(_CM_DEPTH)
)
_CM_PROBE_CASE = " ".join(
    "WHEN {s} THEN {expr}".format(s=s, expr=_cm_col_sql("k.user_id", s))
    for s in range(_CM_DEPTH)
)


@query(
    "rollup_cmsketch_top_users_6h",
    oracle=f"""
    WITH cells AS (
      SELECT {_epoch_bucket_sql("ts", 6)} AS bucket, seed,
             CASE seed {_CM_CELL_CASE} END AS col,
             COUNT(*) AS n
      FROM events, (SELECT unnest(generate_series(0, {_CM_DEPTH - 1})) AS seed)
      GROUP BY 1, 2, 3
    ),
    candidates AS (
      SELECT user_id FROM events GROUP BY 1
      ORDER BY COUNT(*) DESC, user_id LIMIT {_CM_TOPK}
    ),
    est AS (
      SELECT c.bucket, k.user_id, MIN(c.n) AS est_n
      FROM candidates k
      JOIN cells c
        ON c.col = CASE c.seed {_CM_PROBE_CASE} END
      GROUP BY 1, 2
      HAVING COUNT(*) = {_CM_DEPTH}  -- a missing cell is a zero: est = 0, no row
    )
    SELECT bucket, user_id, CAST(est_n AS BIGINT) AS est_n FROM est
    """,
)
def rollup_cmsketch_top_users_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-6h-window activity estimates for the corpus's heavy-hitter
    users, answered from MERGED hourly count-min grains: the 6h cells
    are sums of hourly cells (mergeable by addition, like every sketch
    in this family), and a user's estimate is the min over the sketch's
    hash rows. Candidates come from one exact global top-K pass
    (K = _CM_TOPK; count-min estimates counts for known keys — it
    cannot enumerate keys, so the standard pairing is a candidate
    tracker plus the sketch). The oracle replays the sketch arithmetic
    exactly — estimates are deterministic even where collisions
    inflate them.

    A probe must find ALL of its depth cells in the window's sketch:
    the grain table stores only touched cells, so a missing cell IS a
    zero — min(..., 0) = 0 — and a (window, user) with any absent cell
    has estimate 0 and is emitted as no row. Without that condition the
    inner join silently took the min over occupied cells only, which
    reported phantom activity for users with zero events in a window
    (25% of output rows at sf0.01 before the fix)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    hourly = cm_sketch_grains(ev)
    merged = hourly.groupBy(
        epoch_bucket("bucket", 6).alias("bucket"), "seed", "col"
    ).agg(F.sum("n").alias("n"))
    candidates = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(_CM_TOPK)
        .select("user_id")
    )
    probes = candidates.select(
        "user_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("seed"), _cm_col(F.col("user_id"), s).alias("col")
                )
                for s in range(_CM_DEPTH)
            ])
        ).alias("p"),
    ).select("user_id", F.col("p.seed").alias("seed"), F.col("p.col").alias("col"))
    return (
        merged.join(F.broadcast(probes), ["seed", "col"])
        .groupBy("bucket", "user_id")
        .agg(
            F.min("n").cast("bigint").alias("est_n"),
            F.count(F.lit(1)).alias("__cells"),
        )
        .filter(F.col("__cells") == _CM_DEPTH)
        .drop("__cells")
    )


def anomaly_buckets(events: DataFrame) -> DataFrame:
    """(bucket, event_type, n_events) hourly buckets beyond 2 population
    sigmas of their type's mean. The gate is EXACT WIDE-INTEGER
    arithmetic on both engines — Spark in DECIMAL(19,0) operands (whose
    products widen to decimal(38,0): exact while per-type event totals
    stay below ~1e18, far past any real grain table), DuckDB in HUGEINT
    — because a plain BIGINT s*s silently wraps once a type's total
    passes ~3e9, which 100 TB volumes do. Built ON the hourly_grains
    materialization (single grain definition; Catalyst prunes the
    unused measure column)."""
    from pyspark.sql import Window as W

    g = hourly_grains(events).select(
        "bucket", "event_type", F.col("n_events").alias("cnt")
    )
    w = W.partitionBy("event_type")
    dec = "decimal(19,0)"
    stats = (
        g.withColumn("n", F.count(F.lit(1)).over(w).cast(dec))
        .withColumn("s", F.sum("cnt").over(w).cast(dec))
        .withColumn(
            # cnt is widened BEFORE squaring: a per-bucket count past
            # ~3e9 would overflow the bigint product ahead of any cast
            "ss",
            F.sum(F.col("cnt").cast(dec) * F.col("cnt").cast(dec)).over(w),
        )
        .withColumn("cnt_w", F.col("cnt").cast(dec))
    )
    dev = F.col("n") * F.col("cnt_w") - F.col("s")
    return (
        stats.filter(
            dev * dev > 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        )
        .select("bucket", "event_type", F.col("cnt").alias("n_events"))
    )


@query(
    "events_hourly_anomaly",
    # z-score gate in EXACT integer arithmetic: |cnt - S/n| > 2*sigma
    # with sigma^2 = (n*SS - S^2)/n^2 rearranges (multiply both sides by
    # n^2, square) to (n*cnt - S)^2 > 4*(n*SS - S^2) — every term a
    # BIGINT on both engines, so there is no float threshold for Spark
    # and DuckDB to disagree about at the boundary.
    oracle="""
    WITH grains AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT bucket, event_type, cnt,
             CAST(COUNT(*) OVER w AS HUGEINT) AS n,
             CAST(SUM(cnt) OVER w AS HUGEINT) AS s,
             SUM(CAST(cnt AS HUGEINT) * cnt) OVER w AS ss
      FROM grains WINDOW w AS (PARTITION BY event_type)
    )
    SELECT bucket, event_type, CAST(cnt AS BIGINT) AS n_events
    FROM stats
    WHERE (n * cnt - s) * (n * cnt - s) > 4 * (n * ss - s * s)
    """,
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly screen over the hourly grain table: flag
    (hour, event_type) buckets whose count deviates from that type's
    mean by more than two population standard deviations. The grain
    table is the volume-independent input (hypertable pattern: the scan
    is the tiny materialization, never raw events), and the 2-sigma
    gate is evaluated in exact integer arithmetic — see the oracle
    comment — so the flag set is bit-stable across engines."""
    t = load_tables(spark, sf_dir)
    return anomaly_buckets(t["events"])


@query(
    "events_gapfill_hourly",
    # the spine is generated from the OBSERVED min/max hour per
    # event_type (scalar subqueries — no driver state); missing buckets
    # appear with n_events = 0, the time_bucket_gapfill contract
    oracle="""
    WITH grains AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM grains GROUP BY 1
    ),
    spine AS (
      SELECT b.event_type, CAST(unnest(generate_series(b.lo, b.hi,
                     INTERVAL 1 HOUR)) AS TIMESTAMP) AS bucket
      FROM bounds b
    )
    SELECT s.bucket, s.event_type,
           CAST(COALESCE(g.cnt, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN grains g
      ON g.bucket = s.bucket AND g.event_type = s.event_type
    """,
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type (TimescaleDB
    time_bucket_gapfill parity): a calendar spine spanning each type's
    observed [min, max] hour left-joins the grain table, so silent
    hours surface as explicit zero rows — without this, downstream
    anomaly/trend math never sees the outage it should be flagging.

    Scale story: the spine is sequence()+explode over per-type bounds
    (hours-per-year x types rows — volume-independent of raw events);
    the join is grain-table-sized. No driver state, no Python."""
    t = load_tables(spark, sf_dir)
    g = hourly_grains(t["events"]).select(
        "bucket", "event_type", F.col("n_events").alias("cnt")
    )
    bounds = g.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    return spine.join(g, ["bucket", "event_type"], "left").select(
        "bucket",
        "event_type",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n_events"),
    )
