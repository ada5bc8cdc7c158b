"""Batch gap-based sessionization over the events table.

The reference's only session-ish capability is a custom reduce over
per-user sorted streams (lib/disco/worker/classic/worker.py sort=True
reduce; SURVEY §2.3) — the user writes the gap logic imperatively. Here
it is the declarative classic: one shuffle on user_id, then pure window
functions (lag -> new-session flag -> running sum = session id), then a
grouped aggregate. Complements the STREAMING session windows
(streaming/windows.py events_session_window) with the batch/backfill
shape a training pipeline runs over historical logs.

Scale story: one Exchange on user_id serves the lag window, the
cumulative-sum window AND the final groupBy (all partition on user_id —
Catalyst reuses the partitioning, `.explain` shows a single Exchange).
No driver state, no Python; session count per user is unbounded but
each group folds to one row per session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import lazy_persist, load_tables

# session gap: a new session starts after > 30 min of inactivity
GAP_SECONDS = 1800


def sessionize(events: DataFrame, gap_s: int = GAP_SECONDS) -> DataFrame:
    """(user_id, session_seq, n_events, session_start, session_end,
    duration_s): gap-based sessions per user — the per-session fold of
    sessionized_events (ONE definition of the gap logic serves both
    this and the session funnel).

    Timestamps are folded to epoch seconds (bigint) up front — exact in
    both engines (events are µs-precision, DuckDB replays with
    FLOOR(epoch(ts))). Ties on (user_id, sec) are safe: tied rows see
    gap 0 regardless of their relative order, so the new-session flag
    and the running sum are order-independent within a tie group."""
    return (
        sessionized_events(events, gap_s)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("sec").alias("session_start"),
            F.max("sec").alias("session_end"),
            (F.max("sec") - F.min("sec")).alias("duration_s"),
        )
    )


def sessionized_events(events: DataFrame, gap_s: int = GAP_SECONDS) -> DataFrame:
    """(user_id, session_seq, sec, event_type): every event tagged with
    its gap-session id — the row-level sibling of sessionize() (which
    folds to one row per session)."""
    # event_type rides along when present (the funnel needs it); pure
    # timestamp streams sessionize without it
    extra = ["event_type"] if "event_type" in events.columns else []
    ev = events.select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        *extra,
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    new_sess = (
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) > gap_s),
            1,
        )
        .otherwise(0)
    )
    run = Window.partitionBy("user_id").orderBy("sec").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq", F.sum("new_sess").over(run)
    )


# shared DuckDB sessionization CTE chain ending in
# `s` = (user_id, sec, event_type, session_seq) — BOTH oracles
# (per-session stats, session funnel) compose from this single source,
# so the replayed gap logic cannot drift between them (mirrors the
# LM_PPL_CTES pattern in textops/lm_score.py)
SESSION_CTES = f"""
    e AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_type
      FROM events
    ),
    g AS (
      SELECT user_id, sec, event_type,
             CASE WHEN lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > {GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
    ),
    s AS (
      SELECT user_id, sec, event_type,
             CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY sec
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_seq
      FROM g
    )"""


@query(
    "events_session_funnel",
    # outcome per session: converted = a purchase at-or-after the
    # session's first view; viewed_only = views but no such purchase;
    # no_view = sessions without any view. Aggregated to counts per
    # outcome — the product-analytics session-conversion report.
    oracle=f"""
    WITH {SESSION_CTES},
    per_sess AS (
      SELECT user_id, session_seq,
             MIN(CASE WHEN event_type = 'view' THEN sec END) AS first_view,
             MAX(CASE WHEN event_type = 'purchase' THEN sec END) AS last_purchase
      FROM s GROUP BY 1, 2
    )
    SELECT CASE
             WHEN first_view IS NULL THEN 'no_view'
             WHEN last_purchase IS NOT NULL AND last_purchase >= first_view
               THEN 'converted'
             ELSE 'viewed_only'
           END AS outcome,
           COUNT(*) AS n_sessions
    FROM per_sess GROUP BY 1
    """,
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped conversion funnel: within each gap-session, did a
    purchase happen at-or-after the session's first view? Unlike the
    global funnel (events_funnel_view_purchase), conversion here must
    close INSIDE one session — the standard product-analytics framing.
    Same single user_id Exchange as sessionize; the per-session fold is
    two conditional aggregates."""
    t = load_tables(spark, sf_dir)
    s = sessionized_events(t["events"])
    per_sess = s.groupBy("user_id", "session_seq").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sec"))).alias(
            "last_purchase"
        ),
    )
    outcome = (
        F.when(F.col("first_view").isNull(), "no_view")
        .when(
            F.col("last_purchase").isNotNull()
            & (F.col("last_purchase") >= F.col("first_view")),
            "converted",
        )
        .otherwise("viewed_only")
    )
    return (
        per_sess.select(outcome.alias("outcome"))
        .groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@query(
    "events_sessionize_gap",
    oracle=f"""
    WITH {SESSION_CTES}
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(sec) AS session_start,
           MAX(sec) AS session_end,
           MAX(sec) - MIN(sec) AS duration_s
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return sessionize(t["events"])

@query(
    "events_conversion_delay",
    # per-session conversion delay: first purchase AT-OR-AFTER the
    # session's first view, minus that view; session-level rows fold to
    # one summary row per user-cohort-free grain (exact integer min/max,
    # decimal-exact mean)
    oracle=f"""
    WITH {SESSION_CTES},
    per_sess AS (
      SELECT user_id, session_seq,
             MIN(CASE WHEN event_type = 'view' THEN sec END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN sec END
                 ) FILTER (WHERE event_type = 'purchase'
                           AND sec >= (SELECT MIN(s2.sec) FROM s s2
                                       WHERE s2.user_id = s.user_id
                                         AND s2.session_seq = s.session_seq
                                         AND s2.event_type = 'view')) AS first_conv
      FROM s GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_converted,
           MIN(first_conv - first_view) AS min_delay_s,
           MAX(first_conv - first_view) AS max_delay_s,
           ROUND(CAST(SUM(CAST(first_conv - first_view AS DECIMAL(20,0)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_delay_s
    FROM per_sess
    WHERE first_view IS NOT NULL AND first_conv IS NOT NULL
    """,
)
def events_conversion_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase latency within sessions: for every converted
    session (first purchase at-or-after its first view), the delay in
    seconds — summarized as count / min / max / decimal-exact mean.
    The product-analytics follow-up to the funnel: not just WHETHER
    sessions convert but HOW FAST. Same single user_id Exchange; the
    summary is one global aggregate over session rows."""
    t = load_tables(spark, sf_dir)
    s = sessionized_events(t["events"])
    per_sess = s.groupBy("user_id", "session_seq").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias(
            "first_view"
        ),
    )
    # first purchase at-or-after the session's first view
    conv = (
        s.filter(F.col("event_type") == "purchase")
        .join(per_sess, ["user_id", "session_seq"])
        .filter(F.col("sec") >= F.col("first_view"))
        .groupBy("user_id", "session_seq", "first_view")
        .agg(F.min("sec").alias("first_conv"))
    )
    delay = F.col("first_conv") - F.col("first_view")
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min(delay).alias("min_delay_s"),
        F.max(delay).alias("max_delay_s"),
        F.round(
            F.sum(delay.cast("decimal(20,0)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_delay_s"),
    )


@query(
    "events_funnel_3step",
    # strictly-ordered 3-step funnel per session: first view, first
    # click at-or-after that view, first purchase at-or-after that
    # click; one row of depth counts
    oracle=f"""
    WITH {SESSION_CTES},
    fv AS (
      SELECT user_id, session_seq,
             MIN(CASE WHEN event_type = 'view' THEN sec END) AS fv
      FROM s GROUP BY 1, 2
    ),
    fc AS (
      SELECT s.user_id, s.session_seq, fv.fv,
             MIN(CASE WHEN s.event_type = 'click'
                       AND s.sec >= fv.fv THEN s.sec END) AS fc
      FROM s JOIN fv USING (user_id, session_seq)
      GROUP BY 1, 2, 3
    ),
    fp AS (
      SELECT s.user_id, s.session_seq, fc.fv, fc.fc,
             MIN(CASE WHEN s.event_type = 'purchase'
                       AND s.sec >= fc.fc THEN s.sec END) AS fp
      FROM s JOIN fc USING (user_id, session_seq)
      GROUP BY 1, 2, 3, 4
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view,
           CAST(SUM(CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view_click,
           CAST(SUM(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view_click_purchase
    FROM fp
    """,
)
def events_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ORDERED three-step funnel (view -> click -> purchase)
    within gap-sessions: a session reaches depth 2 only if some click
    happens at-or-after its FIRST view, depth 3 only if some purchase
    happens at-or-after that first qualifying click. The general
    k-step product-analytics funnel (events_session_funnel is the
    2-step specialization).

    Every stage folds and joins on (user_id, session_seq) — the one
    Exchange sessionization already produced; step chaining is two
    conditional-min rounds, never a per-row sequence scan."""
    t = load_tables(spark, sf_dir)
    s = sessionized_events(t["events"])
    keys = ["user_id", "session_seq"]
    fv = s.groupBy(*keys).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias(
            "fv"
        )
    )
    fc = (
        s.join(fv, keys)
        .groupBy(*keys, "fv")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("sec") >= F.col("fv")),
                    F.col("sec"),
                )
            ).alias("fc")
        )
    )
    fp = (
        s.join(fc, keys)
        .groupBy(*keys, "fv", "fc")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("sec") >= F.col("fc")),
                    F.col("sec"),
                )
            ).alias("fp")
        )
    )
    return fp.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("fv").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_view"),
        F.sum(F.col("fc").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_view_click"),
        F.sum(F.col("fp").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness + top session paths — the two product-analytics
# reads every event warehouse serves daily: "how habitual is usage"
# (average daily actives over period actives) and "what do sessions
# actually do" (the most common opening event paths).
# ---------------------------------------------------------------------------
PATH_LEN = 3
PATH_TOPK = 20


@query(
    "events_stickiness_dau_mau",
    oracle="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    daily AS (
      SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY 1
    ),
    grains AS (
      SELECT 'month' AS grain, date_trunc('month', day) AS period,
             day, user_id FROM d
      UNION ALL
      SELECT 'week', date_trunc('week', day), day, user_id FROM d
    ),
    au AS (
      SELECT grain, period,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS period_actives
      FROM grains GROUP BY 1, 2
    ),
    ds AS (
      SELECT g.grain, g.period,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(dau) AS BIGINT) AS dau_sum
      FROM (SELECT DISTINCT grain, period, day FROM grains) g
      JOIN daily ON daily.day = g.day
      GROUP BY 1, 2
    )
    SELECT ds.grain, CAST(ds.period AS DATE) AS period_start,
           ds.n_days, au.period_actives,
           ROUND(CAST(ds.dau_sum AS DOUBLE) / ds.n_days, 4) AS dau_avg,
           ROUND(CAST(ds.dau_sum AS DOUBLE)
                 / (ds.n_days * au.period_actives), 6) AS stickiness
    FROM ds JOIN au ON au.grain = ds.grain AND au.period = ds.period
    ORDER BY ds.grain, period_start
    """,
)
def events_stickiness_dau_mau(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stickiness = avg(DAU) / period actives at month and ISO-week
    grain (Spark trunc == DuckDB date_trunc, both Monday-start): 1.0
    means every period-active user shows up every day. Exact distinct
    counts per day and per period; the ratio is one rounded double
    division of exact integers.

    Plan: two grouped distinct-count passes (day grain, period grain)
    plus a calendar-bounded join — at 100 TB swap the exact distincts
    for HLL sketches (rollup_hll_daily_users is the registered
    pattern) if user cardinality per partition explodes."""
    ev = load_tables(spark, sf_dir)["events"]
    d = ev.select(F.to_date("ts").alias("day"), "user_id")
    daily = d.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    grains = d.select(
        F.lit("month").alias("grain"),
        F.trunc("day", "month").alias("period"),
        "day",
        "user_id",
    ).unionAll(
        d.select(
            F.lit("week").alias("grain"),
            F.trunc("day", "week").alias("period"),
            "day",
            "user_id",
        )
    )
    au = grains.groupBy("grain", "period").agg(
        F.count_distinct("user_id").cast("bigint").alias("period_actives")
    )
    ds = (
        grains.select("grain", "period", "day")
        .distinct()
        .join(daily, "day")
        .groupBy("grain", "period")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("dau").cast("bigint").alias("dau_sum"),
        )
    )
    return (
        ds.join(au, ["grain", "period"])
        .select(
            "grain",
            F.col("period").alias("period_start"),
            "n_days",
            "period_actives",
            F.round(
                F.col("dau_sum").cast("double") / F.col("n_days"), 4
            ).alias("dau_avg"),
            F.round(
                F.col("dau_sum").cast("double")
                / (F.col("n_days") * F.col("period_actives")),
                6,
            ).alias("stickiness"),
        )
        .orderBy("grain", "period_start")
    )


@query(
    "events_session_path_topk",
    oracle=f"""
    WITH {SESSION_CTES},
    ranked AS (
      SELECT user_id, session_seq, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, session_seq
               ORDER BY sec, event_type) AS rn
      FROM s
    ),
    paths AS (
      SELECT concat_ws('>',
               MAX(CASE WHEN rn = 1 THEN event_type END),
               MAX(CASE WHEN rn = 2 THEN event_type END),
               MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
      FROM ranked WHERE rn <= {PATH_LEN}
      GROUP BY user_id, session_seq
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM paths)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(CAST(COUNT(*) AS DOUBLE) / tot.n, 6) AS share
    FROM paths, tot
    GROUP BY path, tot.n
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOPK}
    """,
)
def events_session_path_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-{PATH_TOPK} opening session paths (first {PATH_LEN} event
    types, 'a>b>c'): the clickstream-shape report. Within-second ties
    order by event_type — deterministic in both engines without an
    event-id column in the shared session CTEs; shorter sessions keep
    their shorter path (concat_ws skips the missing positions).

    Plan: the shared gap-sessionization (per-user windows), one
    per-session ROW_NUMBER window on the SAME partitioning, a
    3-position conditional fold per session, a grouped count, bounded
    top-k."""
    ev = load_tables(spark, sf_dir)["events"]
    se = sessionized_events(ev)
    w = Window.partitionBy("user_id", "session_seq").orderBy(
        "sec", "event_type"
    )
    ranked = se.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= PATH_LEN
    )
    paths = ranked.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    paths = lazy_persist(paths)
    tot = paths.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .crossJoin(tot)
        .select(
            "path",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double") / F.col("n"), 6
            ).alias("share"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOPK)
    )
