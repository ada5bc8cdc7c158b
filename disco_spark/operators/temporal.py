"""Temporal pattern analytics: day-of-week seasonality and
gaps-and-islands activity streaks.

Beyond-reference surface (the reference has no calendar machinery at
all; its examples treat time as opaque bytes). Both queries are
single-Exchange window/aggregate plans; all arithmetic is exact
integers until the final rounded ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import lazy_persist, load_tables


@query(
    "orders_seasonality_dow",
    # ISO day-of-week (1=Mon..7=Sun) order-volume profile; dev_ratio =
    # observed/uniform-expected as an exact-integer ratio
    oracle="""
    WITH d AS (SELECT isodow(o_orderdate) AS dow FROM orders),
    c AS (SELECT dow, COUNT(*) AS n FROM d GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.dow, c.n,
           ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
           ROUND(CAST(c.n * 7 AS DOUBLE) / t.total, 6) AS dev_ratio
    FROM c CROSS JOIN t
    """,
)
def orders_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality of order volume: per ISO weekday
    (1=Mon..7=Sun) the order count, its share, and the deviation ratio
    against a uniform week (1.0 = no seasonality) — the weekly-pattern
    profile every capacity/traffic forecast starts from.

    Spark's `weekday()` (0=Mon) + 1 replays DuckDB's `isodow` exactly;
    one grouped count folds map-side to 7 cells, the total rides along
    as a lazy broadcast 1-row aggregate."""
    o = load_tables(spark, sf_dir)["orders"]
    c = (
        o.select((F.expr("weekday(o_orderdate)") + 1).alias("dow"))
        .groupBy("dow")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = F.broadcast(c.agg(F.sum("n").alias("total")))
    return c.crossJoin(t).select(
        "dow",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.round(
            (F.col("n") * 7).cast("double") / F.col("total"), 6
        ).alias("dev_ratio"),
    )


@query(
    "customer_order_streaks",
    # gaps-and-islands over each customer's distinct order months:
    # island id = month_index - row_number (constant within a
    # consecutive run); output = months active + longest streak
    oracle="""
    WITH m AS (
      SELECT DISTINCT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS mi
      FROM orders
    ),
    g AS (
      SELECT o_custkey, mi,
             mi - ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY mi) AS grp
      FROM m
    ),
    runs AS (
      SELECT o_custkey, grp, COUNT(*) AS run_len
      FROM g GROUP BY 1, 2
    )
    SELECT o_custkey,
           CAST(SUM(run_len) AS BIGINT) AS n_active_months,
           MAX(run_len) AS longest_streak
    FROM runs GROUP BY o_custkey
    """,
)
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-month activity streaks per customer — the classic
    gaps-and-islands fold (month_index minus per-customer row_number is
    constant within each unbroken run). Output: total active months
    and the longest unbroken streak; the engagement-consistency metric
    behind "n-month streak" retention features.

    ONE Exchange on o_custkey serves the distinct, the island window,
    and both grouped folds; month indexes are pure integers."""
    o = load_tables(spark, sf_dir)["orders"]
    m = o.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("mi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mi")
    runs = (
        m.withColumn("grp", F.col("mi") - F.row_number().over(w))
        .groupBy("o_custkey", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("o_custkey").agg(
        F.sum("run_len").cast("bigint").alias("n_active_months"),
        F.max("run_len").alias("longest_streak"),
    )


@query(
    "events_cusum_changepoint",
    # offline changepoint estimate per event type: argmax_k |C_k| with
    # C_k = n*P_k - k*T over daily counts (the mean-shift CUSUM scaled
    # by n to stay in exact integers; P_k = inclusive prefix count,
    # T = total). Earliest day wins ties.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER w AS k,
             SUM(x) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(x) OVER (PARTITION BY event_type) AS t
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    scored AS (
      SELECT event_type, day,
             abs(CAST(n AS BIGINT) * CAST(p AS BIGINT)
                 - CAST(k AS BIGINT) * CAST(t AS BIGINT)) AS absc,
             n, t
      FROM c
    )
    SELECT event_type, day AS changepoint_day,
           CAST(absc AS BIGINT) AS max_abs_scaled,
           CAST(n AS BIGINT) AS n_days
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY absc DESC, day) AS rnk
      FROM scored
    ) WHERE rnk = 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline mean-shift changepoint per event type: the day k
    maximizing |n*P_k - k*T| over the daily-count series — the
    n-scaled CUSUM statistic (equivalent to argmax |P_k - k*T/n|, kept
    in exact integers so both engines agree bit-for-bit; multipliers
    are day counts, so no overflow at any realistic scale). The
    monitoring question behind "when did this stream's behavior
    change".

    ONE Exchange on event_type; every window partitions on it, and
    each partition holds one row per day (bounded by calendar span,
    not event volume)."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    c = (
        daily.withColumn("k", F.row_number().over(wo))
        .withColumn(
            "p",
            F.sum("x").over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("t", F.sum("x").over(wall))
    )
    scored = c.select(
        "event_type",
        "day",
        F.abs(F.col("n") * F.col("p") - F.col("k") * F.col("t")).alias(
            "absc"
        ),
        "n",
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.desc("absc"), F.asc("day")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wrank))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.col("absc").cast("bigint").alias("max_abs_scaled"),
            F.col("n").cast("bigint").alias("n_days"),
        )
    )


@query(
    "orders_mom_growth",
    # month-over-month and year-over-year revenue growth via self-joins
    # on the integer month index (never a global window): growth only
    # where the exact prior month/year-month exists
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT cur.mi AS month_index,
           CAST(cur.cents AS DOUBLE) / 100 AS revenue,
           ROUND(CAST(cur.cents - prev.cents AS DOUBLE)
                 / prev.cents, 6) AS mom_growth,
           ROUND(CAST(cur.cents - yoy.cents AS DOUBLE)
                 / yoy.cents, 6) AS yoy_growth
    FROM m cur
    LEFT JOIN m prev ON prev.mi = cur.mi - 1
    LEFT JOIN m yoy ON yoy.mi = cur.mi - 12
    """,
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth: monthly
    exact-cents revenue, joined to itself at mi-1 and mi-12 (growth is
    NULL where the exact prior period is absent — no lag-over-sorted-
    everything, so a missing month can't silently compare against the
    wrong period). The finance-reporting staple.

    The monthly table is calendar-bounded (one row per month); both
    self-joins are hash joins on the integer month index."""
    o = load_tables(spark, sf_dir)["orders"]
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mi")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    cur, prev, yoy = m.alias("cur"), m.alias("prev"), m.alias("yoy")
    g = (
        cur.join(prev, F.col("prev.mi") == F.col("cur.mi") - 1, "left")
        .join(yoy, F.col("yoy.mi") == F.col("cur.mi") - 12, "left")
    )
    return g.select(
        F.col("cur.mi").alias("month_index"),
        (F.col("cur.cents").cast("double") / 100).alias("revenue"),
        F.round(
            (F.col("cur.cents") - F.col("prev.cents")).cast("double")
            / F.col("prev.cents"),
            6,
        ).alias("mom_growth"),
        F.round(
            (F.col("cur.cents") - F.col("yoy.cents")).cast("double")
            / F.col("yoy.cents"),
            6,
        ).alias("yoy_growth"),
    )


@query(
    "lineitem_transit_backlog",
    # items in transit per calendar day (shipped, not yet received):
    # +1 at ship day, -1 the day after receipt, prefix-summed over the
    # day-grain delta table. Days with no traffic don't appear (the
    # backlog on such days equals the previous emitted day's value).
    oracle="""
    WITH span AS (
      SELECT o.o_orderkey, o.o_orderdate AS start_day,
             MAX(l.l_shipdate) AS last_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT CAST(start_day AS DATE) AS day, 1 AS d FROM span
      UNION ALL
      SELECT CAST(last_ship AS DATE) + 1, -1 FROM span
    ),
    byday AS (
      SELECT day, CAST(SUM(d) AS BIGINT) AS delta
      FROM deltas GROUP BY day
    )
    SELECT day,
           CAST(SUM(delta) OVER (
             ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_open
    FROM byday
    """,
)
def lineitem_transit_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog per day — the interval-stabbing operator
    (open orders, active sessions, concurrent jobs all share this
    shape): each order is open from its order date until its LAST
    lineitem ships; +1/-1 deltas at the boundaries, and the running
    sum of day-grain deltas IS the number of open intervals.

    One orderkey-grained join+fold computes each order's span; deltas
    fold to one row per calendar day BEFORE any ordering; the running
    sum over those ~2.5k day rows goes through the shared two-pass
    range-partition prefix harness (global_prefix_sum) — no
    single-partition window even though the day table is small,
    because at 100 TB the same plan serves second-grain backlogs where
    the grain table is NOT small."""
    from disco_spark.operators.relational2 import global_prefix_sum

    t = load_tables(spark, sf_dir)
    span = (
        t["orders"]
        .join(
            t["lineitem"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    deltas = span.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.lit(1).alias("d"),
    ).unionAll(
        span.select(F.date_add("last_ship", 1).alias("day"), F.lit(-1))
    )
    byday = deltas.groupBy("day").agg(
        F.sum("d").cast("bigint").alias("delta")
    )
    summed, _total = global_prefix_sum(byday, ["day"], "delta", out="pre")
    return summed.select(
        "day",
        (F.col("pre") + F.col("delta")).cast("bigint").alias("n_open"),
    )


# shared DuckDB CTE chain for the additive decomposition (byday ->
# centered MA -> detrended -> per-dow seasonal) — BOTH the
# decomposition oracle and the seasonally-adjusted anomaly oracle
# compose from this single source (SESSION_CTES pattern)
DECOMPOSE_CTES = """
    byday AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt
      FROM orders GROUP BY 1
    ),
    offsets AS (SELECT unnest(generate_series(-3, 3)) AS off),
    ma AS (
      SELECT b.day,
             CAST(SUM(n.cnt) AS BIGINT) AS wsum, COUNT(*) AS wn
      FROM byday b
      JOIN offsets o ON TRUE
      JOIN byday n ON n.day = b.day + CAST(o.off AS INTEGER)
      GROUP BY b.day HAVING COUNT(*) = 7
    ),
    detr AS (
      SELECT b.day, b.cnt, isodow(b.day) AS dow,
             CAST(b.cnt AS DOUBLE) - CAST(ma.wsum AS DOUBLE) / 7 AS d
      FROM byday b JOIN ma ON ma.day = b.day
    ),
    seas AS (
      SELECT dow,
             CAST(SUM(CAST(d AS DECIMAL(28,15))) AS DOUBLE) / COUNT(*)
               AS s
      FROM detr GROUP BY dow
    )"""


@query(
    "orders_seasonal_decompose",
    # classical additive decomposition of the daily order-count series:
    # trend = 7-day centered moving average (full windows only, built
    # by OFFSET SELF-JOIN on the day grain — no global window),
    # seasonal = per-ISO-dow mean of the detrended series, residual =
    # detrended - seasonal. Exact integer counts; only the final
    # averages are rounded doubles.
    oracle=f"""
    WITH {DECOMPOSE_CTES}
    SELECT detr.day, detr.cnt AS observed,
           ROUND(detr.cnt - detr.d, 6) AS trend,
           ROUND(seas.s, 6) AS seasonal,
           ROUND(detr.d - seas.s, 6) AS residual
    FROM detr JOIN seas USING (dow)
    """,
)
def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive time-series decomposition of daily order
    volume: observed = trend + seasonal + residual, with trend the
    7-day centered moving average (emitted only where the full week
    exists), seasonal the per-ISO-weekday mean of the detrended
    series, residual the rest — the decomposition every anomaly/
    forecast pipeline starts from.

    Scale shape: the raw scan folds to the day grain FIRST; the moving
    average is an offset SELF-JOIN on the day table (7 equi-join
    probes per day, shuffled on day) rather than any global ordered
    window, so the plan holds even at second-grain series where the
    grain table is large. Seasonal means fold detrended terms as
    DECIMAL(28,15)."""
    o = load_tables(spark, sf_dir)["orders"]
    byday = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    offsets = byday.sparkSession.range(-3, 4).select(
        F.col("id").cast("int").alias("off")
    )
    probes = byday.crossJoin(F.broadcast(offsets)).select(
        F.col("day"), F.expr("date_add(day, off)").alias("nday")
    )
    nbr = byday.select(
        F.col("day").alias("nday"), F.col("cnt").alias("ncnt")
    )
    ma = (
        probes.join(nbr, "nday")
        .groupBy("day")
        .agg(
            F.sum("ncnt").cast("bigint").alias("wsum"),
            F.count(F.lit(1)).alias("wn"),
        )
        .filter(F.col("wn") == 7)
    )
    detr = byday.join(ma, "day").select(
        "day",
        "cnt",
        (F.expr("weekday(day)") + 1).alias("dow"),
        (
            F.col("cnt").cast("double")
            - F.col("wsum").cast("double") / 7
        ).alias("d"),
    )
    seas = detr.groupBy("dow").agg(
        (
            F.sum(F.col("d").cast("decimal(28,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("s")
    )
    return detr.join(F.broadcast(seas), "dow").select(
        "day",
        F.col("cnt").alias("observed"),
        F.round(F.col("cnt") - F.col("d"), 6).alias("trend"),
        F.round(F.col("s"), 6).alias("seasonal"),
        F.round(F.col("d") - F.col("s"), 6).alias("residual"),
    )


ACF_LAGS = (1, 7)


@query(
    "orders_autocorr_daily",
    # autocorrelation of the daily order-count series at lags 1 and 7
    # — exact-moment Pearson over (x_t, x_{t-lag}) day-joined pairs;
    # the weekly-cycle detector behind the seasonal decomposition
    oracle=f"""
    WITH byday AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt
      FROM orders GROUP BY 1
    ),
    pairs AS (
      {" UNION ALL ".join(f'''
      SELECT {lag} AS lag,
             CAST(a.cnt AS DOUBLE) AS x, CAST(b.cnt AS DOUBLE) AS y
      FROM byday a JOIN byday b ON b.day = a.day - {lag}''' for lag in ACF_LAGS)}
    ),
    sums AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT lag, n,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS acf
    FROM sums
    """,
)
def orders_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily order volume at lags 1 and 7 — the
    is-there-a-weekly-cycle detector (acf(7) >> acf(1) says weekly
    seasonality; both ~0 says white noise). Pearson over day-joined
    (x_t, x_{t-lag}) pairs with the repo's exact decimal moments.

    The series folds to the day grain first; each lag is one
    equi-join on the shifted day key (never an ordered window), so
    the plan is grain-bounded like the decomposition's."""
    o = load_tables(spark, sf_dir)["orders"]
    byday = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    parts = []
    for lag in ACF_LAGS:
        a = byday.alias("a")
        b = byday.select(
            F.expr(f"date_add(day, {lag})").alias("jday"),
            F.col("cnt").alias("bcnt"),
        )
        parts.append(
            a.join(b, F.col("a.day") == F.col("jday")).select(
                F.lit(lag).alias("lag"),
                F.col("a.cnt").cast("double").alias("x"),
                F.col("bcnt").cast("double").alias("y"),
            )
        )
    pairs = parts[0]
    for p in parts[1:]:
        pairs = pairs.unionByName(p)

    def msum(e, alias):
        return F.sum(e.cast("decimal(38,10)")).cast("double").alias(alias)

    x, y = F.col("x"), F.col("y")
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        msum(x, "sx"),
        msum(y, "sy"),
        msum(x * x, "sxx"),
        msum(x * y, "sxy"),
        msum(y * y, "syy"),
    )
    n = F.col("n").cast("double")
    return sums.select(
        "lag",
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("acf"),
    )


@query(
    "orders_anomaly_seasonal_adjusted",
    # seasonally-ADJUSTED anomaly days: flag on the decomposition
    # RESIDUAL via the median/MAD modified-z gate — a weekend dip is
    # not an anomaly, a dip on a normally-busy Tuesday is. Composes
    # DECOMPOSE_CTES (shared with the decomposition oracle) + the
    # Iglewicz-Hoaglin gate from outlier_mad_orders.
    oracle=f"""
    WITH {DECOMPOSE_CTES},
    resid AS (
      SELECT detr.day, detr.cnt,
             ROUND(detr.d - seas.s, 6) AS r
      FROM detr JOIN seas USING (dow)
    ),
    med AS (SELECT median(r) AS m FROM resid),
    dev AS (
      SELECT resid.day, resid.cnt, resid.r, abs(resid.r - med.m) AS adev
      FROM resid CROSS JOIN med
    ),
    mad AS (SELECT median(adev) AS mad FROM dev)
    SELECT day, observed, residual, is_anomaly FROM (
      SELECT dev.day, dev.cnt AS observed, dev.r AS residual,
             CASE WHEN 0.6745 * dev.adev > 3.5 * mad.mad
                  THEN 1 ELSE 0 END AS is_anomaly,
             ROW_NUMBER() OVER (ORDER BY dev.adev DESC, dev.day) AS rnk
      FROM dev CROSS JOIN mad
    ) WHERE rnk <= 5
    """,
)
def orders_anomaly_seasonal_adjusted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-5 most seasonally-adjusted-anomalous days: the decomposition residual
    (orders_seasonal_decompose's third component) gated by the
    median/MAD modified z-score (outlier_mad_orders' rule) — the
    composed detector that doesn't page on weekends but does page on a
    dead Tuesday. Both building blocks are registered operators; this
    query proves they compose in one Catalyst plan, and its oracle
    composes their shared CTE/rule text so the definitions cannot
    drift.

    Residuals are rounded to 6 decimals BEFORE the gate on both
    engines, so the median/MAD cut sees identical operands."""
    from disco_spark.operators.stats import MAD_SCALE, MAD_Z_CUT

    resid = orders_seasonal_decompose(spark, sf_dir).select(
        "day",
        F.col("observed"),
        F.col("residual").alias("r"),
    )
    med = F.broadcast(
        resid.agg(F.expr("percentile(r, 0.5)").alias("m"))
    )
    dev = resid.crossJoin(med).withColumn(
        "adev", F.abs(F.col("r") - F.col("m"))
    )
    mad = F.broadcast(dev.agg(F.expr("percentile(adev, 0.5)").alias("mad")))
    return (
        dev.crossJoin(mad)
        .orderBy(F.desc("adev"), F.asc("day"))
        .limit(5)
        .select(
            "day",
            "observed",
            F.col("r").alias("residual"),
            (
                F.lit(MAD_SCALE) * F.col("adev")
                > F.lit(MAD_Z_CUT) * F.col("mad")
            )
            .cast("int")
            .alias("is_anomaly"),
        )
    )


@query(
    "orders_runs_test",
    # Wald-Wolfowitz runs test on the daily series: is the
    # above/below-median sequence random? Runs counted by the
    # gaps-and-islands trick on exact global day ranks; z from exact
    # integer counts. Days AT the median are excluded (standard).
    oracle="""
    WITH byday AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS cnt
      FROM orders GROUP BY 1
    ),
    med AS (SELECT median(cnt) AS m FROM byday),
    signed AS (
      SELECT day, CASE WHEN cnt > m THEN 1 ELSE 0 END AS above,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM byday CROSS JOIN med WHERE cnt <> m
    ),
    runs AS (
      SELECT COUNT(*) AS n_runs FROM (
        SELECT DISTINCT above, rn - grp_rn FROM (
          SELECT above, rn, ROW_NUMBER() OVER (
            PARTITION BY above ORDER BY rn) AS grp_rn
          FROM signed
        )
      )
    ),
    counts AS (
      SELECT CAST(SUM(above) AS BIGINT) AS n1,
             CAST(SUM(1 - above) AS BIGINT) AS n2
      FROM signed
    )
    SELECT counts.n1, counts.n2,
           CAST(runs.n_runs AS BIGINT) AS n_runs,
           CASE WHEN counts.n1 > 0 AND counts.n2 > 0
                 AND 2 * counts.n1 * counts.n2 - counts.n1 - counts.n2 > 0
           THEN
           ROUND((runs.n_runs
                  - (2.0 * counts.n1 * counts.n2
                     / (counts.n1 + counts.n2) + 1))
                 / sqrt(2.0 * counts.n1 * counts.n2
                        * (2.0 * counts.n1 * counts.n2
                           - counts.n1 - counts.n2)
                        / ((counts.n1 + counts.n2)
                           * (counts.n1 + counts.n2)
                           * (counts.n1 + counts.n2 - 1))), 6)
           END AS z
    FROM runs CROSS JOIN counts
    """,
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily order volume: counts runs of
    above/below-median days and standardizes against the
    random-sequence expectation — |z| >> 2 means the series clusters
    or oscillates (trend/seasonality), ~0 means day-to-day volumes mix
    randomly. The classic model-free randomness audit.

    The above/below sequence gets exact global ranks from the shared
    two-pass row-number harness; runs are counted with the
    gaps-and-islands trick (rn - per-sign rn is constant within a
    run), entirely in integers until the final z."""
    from disco_spark.operators.relational2 import global_row_number

    o = load_tables(spark, sf_dir)["orders"]
    byday = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    med = F.broadcast(byday.agg(F.expr("percentile(cnt, 0.5)").alias("m")))
    signed = (
        byday.crossJoin(med)
        .filter(F.col("cnt") != F.col("m"))
        .select("day", (F.col("cnt") > F.col("m")).cast("int").alias("above"))
    )
    ranked, _n = global_row_number(signed, ["day"], out="rn")
    w = Window.partitionBy("above").orderBy("rn")
    islands = ranked.withColumn(
        "grp", F.col("rn") - F.row_number().over(w)
    )
    runs = F.broadcast(
        islands.agg(
            F.countDistinct(F.struct("above", "grp")).alias("n_runs")
        )
    )
    counts = islands.agg(
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    nr = F.col("n_runs").cast("double")
    mean = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    # a one-sided series (n1=0 or n2=0) has zero variance, and so does
    # the n1=n2=1 two-day degenerate (2*n1*n2-n1-n2 = 0 exactly there
    # for positive n1,n2) — in both the statistic is undefined and the
    # division would produce /0 or NaN, whose serialization differs
    # between engines; NULL on both engines instead
    var_pos = 2 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2") > 0
    return counts.crossJoin(runs).select(
        "n1",
        "n2",
        F.col("n_runs").cast("bigint").alias("n_runs"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0) & var_pos,
            F.round((nr - mean) / F.sqrt(var), 6),
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Truncated-kernel EWMA of daily revenue — the forecasting/monitoring
# smoother (EWMA control chart), made cross-engine exact: the
# 10-term exponential kernel's weights 0.3 * 0.7^k are EXACT decimals
# (7^k/10^(k+1) terminates), generated once in Python and embedded as
# identical literals in both engines, so the weighted sum accumulates
# in DECIMAL with zero float drift; the only doubles are the final
# normalize-and-round.
# ---------------------------------------------------------------------------
EWMA_K = 10  # kernel length (days)


def _ewma_weights() -> list[tuple[int, str]]:
    """(lag k, exact decimal literal for 0.3 * 0.7^k), k = 0..EWMA_K-1.
    3*7^k scaled by 10^(k+1) terminates: one shared literal list."""
    return [
        (k, "0." + str(3 * 7**k).zfill(k + 1)) for k in range(EWMA_K)
    ]


# sum of the kernel weights = 1 - 0.7^10, exact
_EWMA_WSUM = "0.9717524751"

_EWMA_WEIGHTS_SQL = ", ".join(
    f"({k}, CAST('{w}' AS DECIMAL(12,11)))" for k, w in _ewma_weights()
)


@query(
    "orders_ewma_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    weights AS (
      SELECT * FROM (VALUES {_EWMA_WEIGHTS_SQL}) AS t(k, w)
    ),
    contrib AS (
      SELECT daily.day + weights.k AS target,
             CAST(daily.cents AS DECIMAL(24,0)) * weights.w AS weighted
      FROM daily, weights
    ),
    smoothed AS (
      SELECT target, SUM(weighted) AS num, COUNT(*) AS n_lags
      FROM contrib GROUP BY 1
    )
    SELECT d.day AS day, d.cents AS actual_cents,
           ROUND(CAST(s.num AS DOUBLE) / {_EWMA_WSUM} / 100, 4)
             AS ewma_dollars,
           CASE WHEN CAST(d.cents AS DOUBLE) / 100
                     > 1.5 * ROUND(CAST(s.num AS DOUBLE)
                                   / {_EWMA_WSUM} / 100, 4)
                THEN 1 ELSE 0 END AS spike
    FROM smoothed s JOIN daily d ON d.day = s.target
    WHERE s.n_lags = {EWMA_K}
    ORDER BY day
    """,
)
def orders_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily order revenue (alpha = 0.3, 10-day
    truncated kernel, renormalized by 1 - 0.7^10): each day's smoothed
    level is the exact-decimal weighted sum of its trailing 10 days,
    emitted alongside the actual and a 1.5x spike flag — the EWMA
    control chart every revenue monitor runs. Days without a full
    trailing window are excluded (no partial-kernel bias).

    Plan: one grouped daily aggregate, a 10-row broadcast kernel join
    (each day fans out to the 10 targets it contributes to — shuffle
    keyed on target day), one grouped decimal sum, one join back for
    the actual. Output is calendar-bounded (~2.4k rows at ANY scale
    factor — the date span is fixed); all shuffles carry daily
    aggregates, never raw orders."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .select(
            F.col("o_orderdate").cast("date").alias("day"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    weights = spark.sql(
        f"SELECT * FROM (VALUES {_EWMA_WEIGHTS_SQL}) AS t(k, w)"
    )
    contrib = daily.crossJoin(F.broadcast(weights)).select(
        F.date_add(F.col("day"), F.col("k")).alias("target"),
        (F.col("cents").cast("decimal(24,0)") * F.col("w")).alias(
            "weighted"
        ),
    )
    smoothed = contrib.groupBy("target").agg(
        F.sum("weighted").alias("num"),
        F.count(F.lit(1)).alias("n_lags"),
    )
    ewma = F.round(
        F.col("num").cast("double") / F.lit(float(_EWMA_WSUM)) / 100, 4
    )
    return (
        smoothed.filter(F.col("n_lags") == EWMA_K)
        .join(daily, F.col("day") == F.col("target"))
        .select(
            "day",
            F.col("cents").alias("actual_cents"),
            ewma.alias("ewma_dollars"),
            (F.col("cents").cast("double") / 100 > 1.5 * ewma)
            .cast("int")
            .alias("spike"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier customer survival — survival analysis with RIGHT
# CENSORING, the churn-modeling primitive: tenure = first->last order,
# a customer whose last order is > KM_CHURN_DAYS before the dataset
# horizon has churned (event); everyone else is censored (still
# active when observation ended). S(t) multiplies (1 - d_t/n_t) over
# 30-day tenure buckets.
# ---------------------------------------------------------------------------
KM_CHURN_DAYS = 90
KM_BUCKET_DAYS = 30


@query(
    "customer_survival_km",
    oracle=f"""
    WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
    cust AS (
      SELECT o_custkey,
             MIN(CAST(o_orderdate AS DATE)) AS first_o,
             MAX(CAST(o_orderdate AS DATE)) AS last_o
      FROM orders GROUP BY 1
    ),
    labeled AS (
      SELECT date_diff('day', first_o, last_o) // {KM_BUCKET_DAYS} AS t,
             CASE WHEN date_diff('day', last_o, maxd.md) > {KM_CHURN_DAYS}
                  THEN 1 ELSE 0 END AS ev
      FROM cust, maxd
    ),
    g AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM labeled GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM g),
    r AS (
      SELECT t, d, c,
             tot.n - CAST(COALESCE(SUM(d + c) OVER (
                 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM g, tot
    ),
    s AS (
      SELECT t, d, c, n_risk,
             SUM(CAST(CASE WHEN d < n_risk
                   THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                   ELSE 0 END AS DECIMAL(28,15))) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS logsum,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS died_out
      FROM r
    )
    SELECT CAST(t AS BIGINT) AS t_bucket, n_risk, d AS d_churned,
           c AS c_censored,
           CASE WHEN died_out = 1 THEN 0
                ELSE ROUND(exp(CAST(logsum AS DOUBLE)), 6)
           END AS s_hat
    FROM s ORDER BY t_bucket
    """,
)
def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer tenure ({KM_BUCKET_DAYS}
    -day buckets): per bucket the at-risk count, churn events (last
    order > {KM_CHURN_DAYS} days before the data horizon), censored
    exits (still-active customers whose observed tenure ends here),
    and the product-limit estimate S(t). The product is computed as
    exp of a DECIMAL-accumulated sum of ln((n-d)/n) terms (each term
    one IEEE log of exact-integer operands — both engines replay it
    identically); a bucket where everyone at risk churns pins S to 0
    thereafter (guarded; ln(0) would poison the fold).

    Plan: one groupBy(customer), one groupBy(bucket) down to a
    CALENDAR-BOUNDED frame (~80 rows at any data scale — tenure is
    capped by the fixed date span), where the cumulative windows run
    single-partition by design, like the Lorenz 10-row fold."""
    o = load_tables(spark, sf_dir)["orders"]
    d = F.col("o_orderdate").cast("date")
    maxd = o.agg(F.max(d).alias("md"))
    cust = o.groupBy("o_custkey").agg(
        F.min(d).alias("first_o"), F.max(d).alias("last_o")
    )
    labeled = cust.crossJoin(F.broadcast(maxd)).select(
        F.floor(
            F.datediff(F.col("last_o"), F.col("first_o")) / KM_BUCKET_DAYS
        )
        .cast("bigint")
        .alias("t"),
        (
            F.datediff(F.col("md"), F.col("last_o")) > KM_CHURN_DAYS
        )
        .cast("int")
        .alias("ev"),
    )
    g = labeled.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = g.agg(F.sum(F.col("d") + F.col("c")).cast("bigint").alias("n"))
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cur = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.crossJoin(tot).withColumn(
        "n_risk",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).cast("bigint"),
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk")
        ),
    ).otherwise(F.lit(0.0))
    s = r.withColumn(
        "logsum", F.sum(term.cast("decimal(28,15)")).over(w_cur)
    ).withColumn(
        "died_out",
        F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(w_cur),
    )
    return s.select(
        F.col("t").alias("t_bucket"),
        "n_risk",
        F.col("d").alias("d_churned"),
        F.col("c").alias("c_censored"),
        F.when(F.col("died_out") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("logsum").cast("double")), 6))
        .alias("s_hat"),
    ).orderBy("t_bucket")


# ---------------------------------------------------------------------------
# One-sample KS goodness-of-fit: are customer inter-order gaps
# exponentially distributed (i.e., is re-ordering a memoryless
# Poisson-ish process)? The distribution-fit sibling of the
# two-sample stats.ks_test_price_segments — same ECDF machinery, but
# against a THEORETICAL CDF with the rate fit from the data.
# ---------------------------------------------------------------------------
GOF_MIN_GAP = 1  # same-day repeats excluded (exponential support t > 0)


@query(
    "orders_interarrival_expfit_ks",
    oracle=f"""
    WITH gaps AS (
      SELECT date_diff('day', prev_d, d) AS gap FROM (
        SELECT CAST(o_orderdate AS DATE) AS d,
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_d
        FROM orders
      ) WHERE prev_d IS NOT NULL
        AND date_diff('day', prev_d, d) >= {GOF_MIN_GAP}
    ),
    g AS (
      SELECT gap, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(gap * c AS DECIMAL(38,0))) AS BIGINT) AS sg
      FROM g
    ),
    cum AS (
      SELECT gap, c,
             CAST(SUM(c) OVER (ORDER BY gap) AS BIGINT) AS incl
      FROM g
    ),
    diffs AS (
      SELECT GREATEST(
               ROUND(ABS(CAST(incl AS DOUBLE) / tot.n
                     - (1 - exp(-(CAST(tot.n AS DOUBLE) / tot.sg)
                                * gap))), 9),
               ROUND(ABS(CAST(incl - c AS DOUBLE) / tot.n
                     - (1 - exp(-(CAST(tot.n AS DOUBLE) / tot.sg)
                                * gap))), 9)
             ) AS dd
      FROM cum, tot
    )
    SELECT tot.n AS n_gaps,
           ROUND(CAST(tot.n AS DOUBLE) / tot.sg, 8) AS lambda_fit,
           ROUND((SELECT MAX(dd) FROM diffs), 6) AS d_stat,
           ROUND(1.358 / sqrt(CAST(tot.n AS DOUBLE)), 6) AS d_crit,
           CASE WHEN ROUND((SELECT MAX(dd) FROM diffs), 6)
                     > ROUND(1.358 / sqrt(CAST(tot.n AS DOUBLE)), 6)
                THEN 1 ELSE 0 END AS reject_exponential
    FROM tot
    """,
)
def orders_interarrival_expfit_ks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-sample KS test of customer inter-order gaps (days, >=
    {GOF_MIN_GAP}) against Exponential(lambda = 1/mean): D = max over
    observed gaps of |ECDF - F| checked from BOTH ECDF sides (the
    proper discrete-support statistic). Counts and the mean are exact
    integers; each per-gap deviation is one exp() + divide rounded to
    9 dp before the max (so a 1-ulp engine difference in exp cannot
    flip the result), and D rounds to 6. Caveat stated plainly:
    lambda is FIT from the sample, so the 1.358/sqrt(n) critical
    value is the standard-KS heuristic (a Lilliefors-corrected
    threshold would be tighter). On this synthetic data order dates
    are uniform random — a Poisson-like process whose gaps ARE
    near-exponential, so the test correctly fails to reject (D ~
    0.008 vs crit ~ 0.012 at sf0.01): the null read that validates
    the machinery, with the planted-signal rejection exercised in
    pytest.

    Plan: per-customer LAG windows (partitioned by customer — no
    global window), grouped to the CALENDAR-BOUNDED distinct-gap
    table (~2.4k rows max), where the cumulative fold is a bounded
    single-partition window like the Lorenz/KM queries."""
    o = load_tables(spark, sf_dir)["orders"]
    d = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = (
        o.select(d.alias("d"), F.lag(d).over(w).alias("prev_d"))
        .filter(F.col("prev_d").isNotNull())
        .select(F.datediff(F.col("d"), F.col("prev_d")).alias("gap"))
        .filter(F.col("gap") >= GOF_MIN_GAP)
    )
    g = gaps.groupBy("gap").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = g.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum((F.col("gap") * F.col("c")).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("sg"),
    )
    wc = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.withColumn("incl", F.sum("c").over(wc).cast("bigint"))
    lam = F.col("n").cast("double") / F.col("sg")
    theo = 1 - F.exp(-lam * F.col("gap"))
    dd = F.greatest(
        F.round(F.abs(F.col("incl").cast("double") / F.col("n") - theo), 9),
        F.round(
            F.abs(
                (F.col("incl") - F.col("c")).cast("double") / F.col("n")
                - theo
            ),
            9,
        ),
    )
    dmax = cum.crossJoin(tot).agg(F.max(dd).alias("dmax"))
    d_stat = F.round(F.col("dmax"), 6)
    d_crit = F.round(1.358 / F.sqrt(F.col("n").cast("double")), 6)
    return tot.crossJoin(dmax).select(
        F.col("n").alias("n_gaps"),
        F.round(lam, 8).alias("lambda_fit"),
        d_stat.alias("d_stat"),
        d_crit.alias("d_crit"),
        (d_stat > d_crit).cast("int").alias("reject_exponential"),
    )


# ---------------------------------------------------------------------------
# Forecast backtest — "measure, don't guess" applied to the EWMA
# smoother itself: use the trailing-kernel EWMA of days [t-10, t-1]
# as the forecast for day t, score MAE against actuals, and compare
# to the naive yesterday-persistence baseline. A forecaster that
# cannot beat persistence is decoration; the skill score makes that
# a single auditable number.
# ---------------------------------------------------------------------------
@query(
    "orders_ewma_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    weights AS (
      SELECT * FROM (VALUES {_EWMA_WEIGHTS_SQL}) AS t(k, w)
    ),
    contrib AS (
      SELECT daily.day + (weights.k + 1) AS target,
             CAST(daily.cents AS DECIMAL(24,0)) * weights.w AS weighted
      FROM daily, weights
    ),
    fc AS (
      SELECT target, SUM(weighted) AS num, COUNT(*) AS n_lags
      FROM contrib GROUP BY 1
    ),
    scored AS (
      SELECT d.cents AS actual,
             prev.cents AS naive,
             ROUND(CAST(fc.num AS DOUBLE) / {_EWMA_WSUM} / 100, 4)
               AS ewma_f
      FROM fc
      JOIN daily d ON d.day = fc.target
      JOIN daily prev ON prev.day = fc.target - 1
      WHERE fc.n_lags = {EWMA_K}
    ),
    folds AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CAST(ROUND(ABS(CAST(actual AS DOUBLE) / 100
                                      - ewma_f), 6)
                  AS DECIMAL(28,6))) AS DOUBLE) AS ae_ewma,
             CAST(SUM(CAST(ABS(actual - naive) AS DECIMAL(38,0)))
                  AS DOUBLE) / 100 AS ae_naive
      FROM scored
    )
    SELECT n_days,
           ROUND(ae_ewma / n_days, 4) AS mae_ewma,
           ROUND(ae_naive / n_days, 4) AS mae_naive,
           CASE WHEN ae_naive > 0
                THEN ROUND(1 - ae_ewma / ae_naive, 6) END AS skill
    FROM folds
    """,
)
def orders_ewma_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the EWMA revenue forecaster: forecast
    for day t = exact-decimal kernel over days [t-10, t-1] (the
    orders_ewma_daily weights shifted one day forward), scored by MAE
    against actuals and against naive persistence (yesterday's
    value); skill = 1 - MAE_ewma/MAE_naive (positive = the smoother
    earns its keep). Absolute errors fold as DECIMAL-rounded terms;
    the naive error is exact integer cents end-to-end.

    Plan: same kernel-join shape as orders_ewma_daily (10-row
    broadcast, shuffle keyed on target day), two day-keyed joins on
    the CALENDAR-BOUNDED daily table, one constant-size fold."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .select(
            F.col("o_orderdate").cast("date").alias("day"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    daily = lazy_persist(daily)
    weights = spark.sql(
        f"SELECT * FROM (VALUES {_EWMA_WEIGHTS_SQL}) AS t(k, w)"
    )
    contrib = daily.crossJoin(F.broadcast(weights)).select(
        F.date_add(F.col("day"), F.col("k") + 1).alias("target"),
        (F.col("cents").cast("decimal(24,0)") * F.col("w")).alias(
            "weighted"
        ),
    )
    fc = contrib.groupBy("target").agg(
        F.sum("weighted").alias("num"),
        F.count(F.lit(1)).alias("n_lags"),
    )
    act = daily.select(F.col("day").alias("_ad"), F.col("cents").alias("actual"))
    prv = daily.select(F.col("day").alias("_pd"), F.col("cents").alias("naive"))
    ewma_f = F.round(
        F.col("num").cast("double") / F.lit(float(_EWMA_WSUM)) / 100, 4
    )
    scored = (
        fc.filter(F.col("n_lags") == EWMA_K)
        .join(act, F.col("_ad") == F.col("target"))
        .join(prv, F.col("_pd") == F.date_sub(F.col("target"), 1))
        .select("actual", "naive", ewma_f.alias("ewma_f"))
    )
    folds = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(
            F.round(
                F.abs(F.col("actual").cast("double") / 100 - F.col("ewma_f")),
                6,
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("ae_ewma"),
        (
            F.sum(
                F.abs(F.col("actual") - F.col("naive")).cast("decimal(38,0)")
            ).cast("double")
            / 100
        ).alias("ae_naive"),
    )
    return folds.select(
        "n_days",
        F.round(F.col("ae_ewma") / F.col("n_days"), 4).alias("mae_ewma"),
        F.round(F.col("ae_naive") / F.col("n_days"), 4).alias("mae_naive"),
        F.when(
            F.col("ae_naive") > 0,
            F.round(1 - F.col("ae_ewma") / F.col("ae_naive"), 6),
        ).alias("skill"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on daily revenue — the non-parametric "is
# there a monotonic trend?" screen that completes the trend-diagnostic
# family (orders_runs_test for randomness, orders_autocorr_daily for
# memory, events_cusum_changepoint for level shifts). S = #(later day
# with higher revenue) - #(later day with lower revenue) over all day
# pairs; tau_b normalizes by the tie-corrected pair count. Reference
# analog: none (beyond-reference analytics surface).
#
# Scale story: the pair join runs over the DAILY aggregate — a
# calendar-bounded table (~2.4k rows over the 7-year TPC-H range), so
# the O(days^2) pair space is a constant w.r.t. row volume; the data-
# sized work is the one grouped cents sum. The non-equi join
# broadcasts the tiny daily table (BroadcastNestedLoopJoin, never a
# partitioned cartesian). All pair comparisons are on exact integer
# cents, so both engines count the same S bit-for-bit; the only float
# op is the final sqrt of identical bigint-derived doubles.
# ---------------------------------------------------------------------------
@query(
    "orders_trend_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_concordant,
             CAST(SUM(CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_discordant,
             CAST(SUM(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ties
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    tie_y AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) / 2), 0) AS BIGINT) AS n2
      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY cents)
      WHERE t > 1
    )
    SELECT n_days, n_concordant, n_discordant, n_ties,
           n_concordant - n_discordant AS s_stat,
           ROUND(
             CAST(n_concordant - n_discordant AS DOUBLE)
             / SQRT(CAST(n_days * (n_days - 1) / 2 AS DOUBLE)
                    * CAST(n_days * (n_days - 1) / 2 - n2 AS DOUBLE)),
             6) AS tau_b
    FROM pairs, nd, tie_y
    """,
)
def orders_trend_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Kendall monotonic-trend test over daily revenue: one row
    (n_days, n_concordant, n_discordant, n_ties, s_stat, tau_b). Days
    are the implicit x (distinct, so no x-tie correction); tau_b
    divides S by sqrt(n0 * (n0 - ties_y)) with n0 = n(n-1)/2.

    Plan: one scan -> daily exact-cents aggregate (calendar-bounded),
    then an all-pairs comparison via a broadcast non-equi self-join of
    that tiny table, then scalar arithmetic. Nothing here grows with
    the fact table; at 100 TB the cost is the daily groupBy scan."""
    o = load_tables(spark, sf_dir)["orders"]
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    daily = lazy_persist(daily)
    a = daily.select(F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("cents").alias("cb"))
    pairs = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1).otherwise(0)
            ).cast("bigint").alias("n_concordant"),
            F.sum(
                F.when(F.col("cb") < F.col("ca"), 1).otherwise(0)
            ).cast("bigint").alias("n_discordant"),
            F.sum(
                F.when(F.col("cb") == F.col("ca"), 1).otherwise(0)
            ).cast("bigint").alias("n_ties"),
        )
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    tie_y = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("n2")
        )
    )
    n0 = (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("bigint")
    s = (F.col("n_concordant") - F.col("n_discordant")).cast("bigint")
    return pairs.crossJoin(nd).crossJoin(tie_y).select(
        "n_days",
        "n_concordant",
        "n_discordant",
        "n_ties",
        s.alias("s_stat"),
        F.round(
            s.cast("double")
            / F.sqrt(
                n0.cast("double") * (n0 - F.col("n2")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )
