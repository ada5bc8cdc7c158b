"""Event-stream flow analytics: Markov transitions, last-touch
attribution, and per-user event-type entropy.

The reference expresses per-user ordered-stream logic as a ``sort=True``
classic reduce over merged sorted runs (ref
lib/disco/worker/classic/worker.py, SURVEY §2.3) — the user hand-writes
the "previous event" bookkeeping. Here each query is the declarative
window-function classic: one Exchange on user_id serves the per-user
ordering, then lead/last-over-window does the sequencing JVM-side.

Scale story (100 TB of events): every query shuffles exactly once on
user_id (the lead/lag windows and any per-user fold reuse that
partitioning), then folds to a tiny grouped output (|event_type|^2
transition cells, |event_type| attribution rows, one row per user for
entropy). No driver state, no Python UDFs, no self-joins; per-user
sequencing is streamed by the window operator over sorted runs — the
same merge the reference performs, scheduled by Spark.

Ordering is total and engine-independent: microsecond epoch plus
event_id as tie-break (events carry unique ids), so lead()/last()
replay identically in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables

# shared DuckDB CTE: the totally-ordered per-user event stream — all
# three oracles compose from this single definition (SESSION_CTES
# pattern) so the replayed ordering cannot drift between them
ORDERED_EVENTS_CTE = """
    e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value
      FROM events
    )"""


def ordered_events(events: DataFrame) -> DataFrame:
    """(user_id, us, event_id, event_type, value): the Spark side of
    ORDERED_EVENTS_CTE — one definition of the total per-user order."""
    return events.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        "event_type",
        "value",
    )


@query(
    "events_markov_transitions",
    oracle=f"""
    WITH {ORDERED_EVENTS_CTE},
    p AS (
      SELECT event_type AS src_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY us, event_id) AS dst_type
      FROM e
    )
    SELECT src_type, dst_type, COUNT(*) AS n_transitions,
           ROUND(CAST(COUNT(*) AS DOUBLE) /
                 CAST(SUM(COUNT(*)) OVER (PARTITION BY src_type)
                      AS DOUBLE), 6) AS prob
    FROM p WHERE dst_type IS NOT NULL
    GROUP BY src_type, dst_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every (src, dst) event-type pair, how often dst
    immediately follows src, and the row-normalized transition
    probability. The classic clickstream "where do users go next"
    report.

    Plan: one Exchange on user_id for the lead() window, a grouped
    count folding to at most |types|^2 cells, then a tiny window over
    src_type for normalization. Probabilities are ratios of exact
    integers rounded to 6 decimals — deterministic cross-engine."""
    t = load_tables(spark, sf_dir)
    ev = ordered_events(t["events"])
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
        )
        .filter(F.col("dst_type").isNotNull())
    )
    counts = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wsrc = Window.partitionBy("src_type")
    return counts.select(
        "src_type",
        "dst_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wsrc).cast("double"),
            6,
        ).alias("prob"),
    )


@query(
    "events_attribution_last_touch",
    oracle=f"""
    WITH {ORDERED_EVENTS_CTE},
    a AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch_type
      FROM e
    )
    SELECT COALESCE(touch_type, 'none') AS touch_type,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
             AS attributed_value
    FROM a WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value is credited
    to the user's most recent PRECEDING non-purchase event type ('none'
    when the purchase opens the stream). The standard marketing-
    attribution fold, expressed as last(ignorenulls) over an
    unbounded-preceding window — no self-join, no per-row lookback
    loop.

    Same single user_id Exchange; attributed sums accumulate as exact
    DECIMAL before the final double cast (registry determinism rule).
    """
    t = load_tables(spark, sf_dir)
    ev = ordered_events(t["events"])
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch_type", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(F.col("touch_type"), F.lit("none")).alias(
                "touch_type"
            ),
            "value",
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@query(
    "events_user_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT user_id, c,
             CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM c
    )
    SELECT user_id, MAX(n) AS n_events, COUNT(*) AS n_types,
           ROUND(CAST(-SUM(CAST(
                 (CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)
                 AS DECIMAL(28,15))) AS DOUBLE), 6) AS entropy
    FROM w GROUP BY user_id
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity score (0 = single-type users, log2(|types|) =
    uniform). A training-data curation primitive: the same shape scores
    source/label diversity per document shard.

    Plan: grouped count per (user, type), an all-rows window over
    user_id for the per-user total (reuses the groupBy partitioning),
    then a per-user fold. Entropy terms accumulate as exact
    DECIMAL(28,15) (order-independent sum, PSI pattern) before the
    final double cast + round."""
    t = load_tables(spark, sf_dir)
    c = t["events"].groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wu = Window.partitionBy("user_id")
    p = F.col("c").cast("double") / F.col("n")
    return (
        c.withColumn("n", F.sum("c").over(wu))
        .withColumn("term", (p * F.log2(p)).cast("decimal(28,15)"))
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.round((-F.sum("term")).cast("double"), 6).alias("entropy"),
        )
    )


@query(
    "events_burstiness_fano",
    # index of dispersion (Fano factor) of each user's hourly event
    # counts over the user's own active span — zero-hours inside the
    # span count (they contribute 0 to both sums but stretch n_hours)
    oracle="""
    WITH h AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hr,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(SUM(c * c) AS BIGINT) AS sumsq,
             MAX(hr) - MIN(hr) + 1 AS n_hours
      FROM h GROUP BY user_id
    )
    SELECT user_id, n_events, n_hours,
           ROUND((CAST(sumsq AS DOUBLE) / n_hours
                  - (CAST(n_events AS DOUBLE) / n_hours)
                    * (CAST(n_events AS DOUBLE) / n_hours))
                 / (CAST(n_events AS DOUBLE) / n_hours), 6) AS fano
    FROM u
    """,
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per user: the Fano factor (variance/mean) of hourly
    event counts over the user's active span — 1.0 = Poisson-like,
    >> 1 = bursty sessions, << 1 = metronomic (bot-like). A stream-
    quality feature for both anomaly screens and user modeling.

    Hours inside the span with zero events count via the span length
    (they add nothing to either sum). Everything is exact integers
    until the final double formula — identical operands both engines.
    One Exchange on user_id serves the hourly fold and the per-user
    fold."""
    ev = load_tables(spark, sf_dir)["events"]
    h = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000 div 3600").alias("hr"),
    ).groupBy("user_id", "hr").agg(F.count(F.lit(1)).alias("c"))
    u = h.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sumsq"),
        (F.max("hr") - F.min("hr") + 1).alias("n_hours"),
    )
    mean = F.col("n_events").cast("double") / F.col("n_hours")
    return u.select(
        "user_id",
        "n_events",
        "n_hours",
        F.round(
            (F.col("sumsq").cast("double") / F.col("n_hours") - mean * mean)
            / mean,
            6,
        ).alias("fano"),
    )


CCDF_THRESHOLDS = (1, 2, 4, 8, 16, 32, 64, 128)


@query(
    "events_user_activity_ccdf",
    # complementary CDF of per-user event counts at power-of-2
    # thresholds — the heavy-tail diagnostic (straight line on log-log
    # = power law). Conditional counts over the per-user fold; the
    # thresholds never re-scan events.
    oracle=f"""
    WITH u AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1
    ),
    t AS (SELECT COUNT(*) AS n_users FROM u)
    {" UNION ALL ".join(f'''
    SELECT {th} AS threshold,
           CAST((SELECT SUM(CASE WHEN c >= {th} THEN 1 ELSE 0 END)
                 FROM u) AS BIGINT) AS n_at_or_above,
           ROUND(CAST((SELECT SUM(CASE WHEN c >= {th} THEN 1 ELSE 0 END)
                       FROM u) AS DOUBLE) / t.n_users, 6) AS ccdf
    FROM t''' for th in CCDF_THRESHOLDS)}
    """,
)
def events_user_activity_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complementary CDF of per-user event counts at power-of-two
    thresholds: share of users with >= t events — the heavy-tail
    diagnostic behind capacity planning and bot screens (power-law
    tails show as straight lines over these log-spaced probes).

    One per-user fold, then a single 1-row aggregate of conditional
    counts stacked to long form — thresholds never replicate or
    re-scan the event rows."""
    ev = load_tables(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    aggs = [F.count(F.lit(1)).alias("n_users")] + [
        F.sum((F.col("c") >= th).cast("int"))
        .cast("bigint")
        .alias(f"a{i}")
        for i, th in enumerate(CCDF_THRESHOLDS)
    ]
    wide = u.agg(*aggs)
    stack = ", ".join(
        f"{th}, a{i}" for i, th in enumerate(CCDF_THRESHOLDS)
    )
    long = wide.select(
        "n_users",
        F.expr(
            f"stack({len(CCDF_THRESHOLDS)}, {stack})"
            " AS (threshold, n_at_or_above)"
        ),
    )
    return long.select(
        "threshold",
        "n_at_or_above",
        F.round(
            F.col("n_at_or_above").cast("double") / F.col("n_users"), 6
        ).alias("ccdf"),
    )


@query(
    "events_type_jaccard_matrix",
    # pairwise Jaccard similarity of the USER SETS behind each event
    # type — bounded |types|^2 output; intersections via one
    # (user, type-pair) co-presence join on the distinct user-type
    # table, never on raw events
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    sizes AS (
      SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS both
      FROM ut a JOIN ut b
        ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.both,
           ROUND(CAST(i.both AS DOUBLE)
                 / (sa.n + sb.n - i.both), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def events_type_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: pairwise Jaccard similarity of the
    user sets behind each event type (who clicks also views?) — the
    set-similarity report behind segment-overlap dashboards.

    The self-join runs on the DISTINCT (user, type) table (at most
    |types| rows per user — a bounded fan-out, unlike raw-event
    self-joins); sizes broadcast back onto the |types|^2 pair cells.
    Exact integer intersections; Jaccard is a ratio of exact ints."""
    ev = load_tables(spark, sf_dir)["events"]
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "both",
            F.round(
                F.col("both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("both")),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "events_entropy_rate",
    # entropy rate of the first-order Markov chain: H = -sum_s pi(s)
    # sum_d P(d|s) log2 P(d|s) with pi the empirical share of
    # transitions leaving s — "how predictable is the next event".
    # Composes the same ordered-stream CTE as the transition matrix.
    oracle=f"""
    WITH {ORDERED_EVENTS_CTE},
    p AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY us, event_id) AS dst
      FROM e
    ),
    c AS (
      SELECT src, dst, COUNT(*) AS n FROM p
      WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
      SELECT src, SUM(n) AS sn FROM c GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS t FROM c),
    terms AS (
      SELECT CAST(
        (CAST(c.n AS DOUBLE) / tot.t)
        * log2(CAST(c.n AS DOUBLE) / s.sn)
        AS DECIMAL(28,15)) AS term
      FROM c JOIN s USING (src) CROSS JOIN tot
    )
    SELECT CAST((SELECT t FROM tot) AS BIGINT) AS n_transitions,
           ROUND(CAST(-SUM(term) AS DOUBLE), 6) AS entropy_rate_bits
    FROM terms
    """,
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the event stream's first-order Markov chain:
    the expected surprise (bits) of the NEXT event type given the
    current one — 0 = fully predictable flows, log2(|types|) =
    uniformly random. The one-number summary the transition-matrix
    query feeds (low entropy rate = strong funnels; compare against
    events_user_entropy's order-free diversity).

    Note pi(s)*P(d|s) = n_sd/total, so each term is
    (n_sd/total)*log2(n_sd/n_s.) — ratios of exact integers, folded
    as DECIMAL(28,15). Same single user_id Exchange as the matrix."""
    t = load_tables(spark, sf_dir)
    ev = ordered_events(t["events"])
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    c = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = c.groupBy("src").agg(F.sum("n").alias("sn"))
    tot = F.broadcast(c.agg(F.sum("n").alias("t")))
    terms = (
        c.join(F.broadcast(s), "src")
        .crossJoin(tot)
        .select(
            "t",
            (
                (F.col("n").cast("double") / F.col("t"))
                * F.log2(F.col("n").cast("double") / F.col("sn"))
            )
            .cast("decimal(28,15)")
            .alias("term"),
        )
    )
    return terms.agg(
        F.max("t").cast("bigint").alias("n_transitions"),
        F.round((-F.sum("term")).cast("double"), 6).alias(
            "entropy_rate_bits"
        ),
    )


# ---------------------------------------------------------------------------
# Bot-likelihood heuristic — the abuse/cleaning screen every event
# pipeline runs before events become training data: bots are FAST
# (high events/day), NARROW (low type entropy), and REGULAR (low
# inter-event gap variability). Three deterministic features, three
# fixed-threshold flags, a 0-3 score. On this uniform synthetic
# stream nobody trips all three — the honest null — while the
# planted-bot rejection is exercised in pytest.
# ---------------------------------------------------------------------------
BOT_RATE_MIN = 3.0  # events per active day above this -> fast
BOT_ENTROPY_MAX = 2.0  # bits (uniform over 5 types = log2 5 ~ 2.32)
BOT_GAP_CV_MAX = 0.5  # Poisson-ish traffic has cv ~ 1; clockwork << 1
BOT_TOPK = 50


@query(
    "events_bot_score_heuristic",
    oracle=f"""
    WITH feat AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS active_days
      FROM events GROUP BY 1
    ),
    tc AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    tw AS (
      SELECT user_id, c,
             CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM tc
    ),
    ent AS (
      SELECT user_id,
             ROUND(CAST(-SUM(CAST(
               (CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)
               AS DECIMAL(28,15))) AS DOUBLE), 6) AS entropy
      FROM tw GROUP BY user_id
    ),
    gaps AS (
      SELECT user_id, epoch_us(ts) - epoch_us(prev_ts) AS g FROM (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
      ) WHERE prev_ts IS NOT NULL
    ),
    gm AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(g AS DECIMAL(38,0))) AS BIGINT) AS s1,
             SUM(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0)))
               AS s2
      FROM gaps GROUP BY 1
    ),
    cv AS (
      SELECT user_id,
             CASE WHEN ng >= 2 AND s1 > 0 THEN
               ROUND(sqrt(GREATEST(CAST(s2 AS DOUBLE) / ng
                          - (CAST(s1 AS DOUBLE) / ng)
                            * (CAST(s1 AS DOUBLE) / ng), 0))
                     / (CAST(s1 AS DOUBLE) / ng), 6)
             END AS gap_cv
      FROM gm
    ),
    scored AS (
      SELECT f.user_id, f.n_events, f.active_days,
             ROUND(CAST(f.n_events AS DOUBLE) / f.active_days, 4)
               AS rate_per_day,
             e.entropy, cv.gap_cv,
             (CASE WHEN CAST(f.n_events AS DOUBLE) / f.active_days
                        > {BOT_RATE_MIN} THEN 1 ELSE 0 END
              + CASE WHEN e.entropy < {BOT_ENTROPY_MAX} THEN 1 ELSE 0 END
              + CASE WHEN cv.gap_cv < {BOT_GAP_CV_MAX} THEN 1 ELSE 0 END)
               AS bot_score
      FROM feat f
      JOIN ent e ON e.user_id = f.user_id
      LEFT JOIN cv ON cv.user_id = f.user_id
    )
    SELECT * FROM scored
    ORDER BY bot_score DESC, n_events DESC, user_id
    LIMIT {BOT_TOPK}
    """,
)
def events_bot_score_heuristic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-{BOT_TOPK} most bot-like users by a three-flag heuristic:
    rate_per_day > {BOT_RATE_MIN}, type entropy < {BOT_ENTROPY_MAX}
    bits, inter-event gap CV < {BOT_GAP_CV_MAX} (clockwork
    regularity). Gaps are exact epoch MICROSECONDS (unix_micros ==
    DuckDB epoch_us — integer end-to-end; the decimal(19,0) squares
    dodge bigint overflow on month-long gaps); entropy reuses the
    events_user_entropy decimal-term fold; every flag compares
    identically-computed doubles. NULL gap_cv (single-event users)
    never flags.

    Plan: three grouped passes over events (counts, type entropy,
    per-user LAG gaps — all partitioned by user, no global window),
    two user-keyed joins, bounded top-k."""
    ev = load_tables(spark, sf_dir)["events"]
    feat = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct(F.to_date("ts")).cast("bigint").alias(
            "active_days"
        ),
    )
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wu = Window.partitionBy("user_id")
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        tc.withColumn("n", F.sum("c").over(wu))
        .withColumn("term", (p * F.log2(p)).cast("decimal(28,15)"))
        .groupBy("user_id")
        .agg(
            F.round((-F.sum("term")).cast("double"), 6).alias("entropy")
        )
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("us"),
            F.unix_micros(F.lag("ts").over(wl)).alias("prev_us"),
        )
        .filter(F.col("prev_us").isNotNull())
        .select("user_id", (F.col("us") - F.col("prev_us")).alias("g"))
    )
    gm = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(F.col("g").cast("decimal(38,0)")).cast("bigint").alias("s1"),
        F.sum(
            F.col("g").cast("decimal(19,0)") * F.col("g").cast("decimal(19,0)")
        ).alias("s2"),
    )
    gmean = F.col("s1").cast("double") / F.col("ng")
    gvar = F.greatest(
        F.col("s2").cast("double") / F.col("ng") - gmean * gmean,
        F.lit(0.0),
    )
    cv = gm.select(
        F.col("user_id").alias("_cu"),
        F.when(
            (F.col("ng") >= 2) & (F.col("s1") > 0),
            F.round(F.sqrt(gvar) / gmean, 6),
        ).alias("gap_cv"),
    )
    ent2 = ent.select(
        F.col("user_id").alias("_eu"), "entropy"
    )
    rate = F.col("n_events").cast("double") / F.col("active_days")
    scored = (
        feat.join(ent2, F.col("_eu") == F.col("user_id"))
        .join(cv, F.col("_cu") == F.col("user_id"), "left")
        .select(
            "user_id",
            "n_events",
            "active_days",
            F.round(rate, 4).alias("rate_per_day"),
            "entropy",
            "gap_cv",
            (
                (rate > BOT_RATE_MIN).cast("int")
                + (F.col("entropy") < BOT_ENTROPY_MAX).cast("int")
                + F.coalesce(
                    (F.col("gap_cv") < BOT_GAP_CV_MAX).cast("int"),
                    F.lit(0),
                )
            ).alias("bot_score"),
        )
    )
    return scored.orderBy(
        F.desc("bot_score"), F.desc("n_events"), "user_id"
    ).limit(BOT_TOPK)


# ---------------------------------------------------------------------------
# Day-of-week x hour activity grid — the traffic heatmap behind
# capacity planning and anomaly baselining (the time-grid sibling of
# heatmap_qty_price_bins' value grid): 7x24 cells, each with volume,
# share, and the deviation ratio against a uniform week.
# ---------------------------------------------------------------------------
@query(
    "events_dow_hour_heatmap",
    oracle="""
    WITH g AS (
      SELECT isodow(ts) AS dow, hour(ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
    SELECT g.dow, g.hr, g.n,
           ROUND(CAST(g.n AS DOUBLE) / t.total, 6) AS share,
           ROUND(CAST(g.n * 168 AS DOUBLE) / t.total, 6) AS dev_ratio
    FROM g, t ORDER BY g.dow, g.hr
    """,
)
def events_dow_hour_heatmap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Event volume per (ISO weekday, hour-of-day) cell with share
    and the 168-cell uniform-week deviation ratio (1.0 = flat
    traffic) — the weekly load heatmap. Spark weekday()+1 replays
    isodow; one grouped count folds map-side to at most 168 cells at
    any volume, the total rides as a broadcast 1-row aggregate."""
    ev = load_tables(spark, sf_dir)["events"]
    g = ev.select(
        (F.expr("weekday(ts)") + 1).alias("dow"),
        F.hour("ts").alias("hr"),
    ).groupBy("dow", "hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = F.broadcast(g.agg(F.sum("n").cast("bigint").alias("total")))
    return g.crossJoin(t).select(
        "dow",
        "hr",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.round(
            (F.col("n") * 168).cast("double") / F.col("total"), 6
        ).alias("dev_ratio"),
    ).orderBy("dow", "hr")
