"""Time-decay (recency-weighted) scoring over the events stream — the
standing ranking signal behind "recently active users/items first":
score = sum(value * exp(-age_days / tau)) per user, anchored at the
corpus max timestamp so the score is a pure function of the data.

Reference analog: none (beyond-reference; the reference aggregates are
plain sums — decay weighting is the time-aware extension every
activity-ranking pipeline bolts on).

Scale story: one scan; the anchor timestamp is a 1-row aggregate
cross-joined in (broadcast, no driver action), per-row weights are
whole-stage-codegen double math, and the per-user reduction
decimal-accumulates the weighted terms (drift.py's PSI discipline:
each term is deterministic double arithmetic, the SUM is exact and
shuffle-order-independent). Map-side partial aggregation applies; the
shuffle carries one partial per (user, partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables

TAU_DAYS = 7.0


def recency_decay_scores(
    events: DataFrame, key: str, sec: str, value: str, tau_days: float
) -> DataFrame:
    """(key, score): exp(-age/tau)-weighted sum of `value`, age
    measured back from the max `sec` in `events`."""
    anchor = F.broadcast(events.agg(F.max(sec).alias("__anchor")))
    term = F.col(value) * F.exp(
        -((F.col("__anchor") - F.col(sec)) / F.lit(86400.0)) / F.lit(tau_days)
    )
    return (
        events.crossJoin(anchor)
        .select(key, term.alias("__t"))
        .groupBy(key)
        .agg(
            F.round(
                F.sum(F.col("__t").cast("decimal(28,12)")).cast("double"), 6
            ).alias("score")
        )
    )


@query(
    "events_recency_decay_score",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, value
      FROM events
    ),
    anchor AS (SELECT MAX(sec) AS a FROM ev)
    SELECT user_id,
           ROUND(CAST(SUM(CAST(
             value * EXP(-((anchor.a - sec) / 86400.0) / {TAU_DAYS})
           AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
    FROM ev CROSS JOIN anchor
    GROUP BY user_id
    """,
)
def events_recency_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, score): 7-day-half-ish exponential recency weighting
    of event values per user."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        "value",
    )
    return recency_decay_scores(ev, "user_id", "sec", "value", TAU_DAYS)
