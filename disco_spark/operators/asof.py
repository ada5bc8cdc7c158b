"""As-of join: for each left row, attach the most recent right row with
``right_time <= left_time`` within the same key — the temporal-join
primitive event/market-data pipelines need (beyond-reference surface;
the reference could only express this as a user reduce over a sorted
merge, exactly the shape `classic_sort_reduce` mirrors).

Implementation is the scalable MERGE form, not a range-expanded join:
union both sides tagged, one shuffle on the key, a single
`sortWithinPartitions`-backed window pass propagating the latest right
payload forward. Cost: one exchange + one sort — the same as any keyed
window — with no candidate-pair blowup for wide time gaps (a range join
would explode left×right within the gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    how: str = "inner",
) -> DataFrame:
    """Attach to each `left` row the latest `right` row (per `on` key)
    whose `right_time` <= the row's `left_time`.

    Right payload columns come back prefixed ``r_`` (plus ``r_<time>``
    itself). ``how='left'`` keeps unmatched left rows with nulls;
    ``'inner'`` drops them. Ties at equal timestamps match (<=), with
    the right row ordered before the left row that shares its instant.
    """
    r_payload = [c for c in right.columns if c != on]
    l_cols = [F.col(c) for c in left.columns]

    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *l_cols,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"r_{c}") for c in r_payload],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c).alias(f"r_{c}") for c in r_payload],
    )
    # right rows sort before left rows at the same instant => <= semantics
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in r_payload
        ],
    )
    out = (
        merged.filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col(f"__m_{c}").alias(f"r_{c}") for c in r_payload],
        )
    )
    if how == "inner":
        # matched iff the propagated right time is non-null
        out = out.filter(F.col(f"r_{right_time}").isNotNull())
    return out


# --------------------------------------------------------------------------
# registered demo: purchase events as-of joined to the user's most recent
# prior view (oracle = DuckDB's native ASOF JOIN)
# --------------------------------------------------------------------------
from pyspark.sql import SparkSession  # noqa: E402

from disco_spark.registry import query  # noqa: E402
from disco_spark.session import load_tables  # noqa: E402


@query(
    "asof_purchase_after_view",
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, p.ts AS purchase_ts, v.ts AS view_ts,
           epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
    FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def asof_purchase_after_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the same user's latest earlier view."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(purchases, views, on="user_id", left_time="ts", right_time="ts")
    return joined.select(
        "user_id",
        "event_id",
        F.col("ts").alias("purchase_ts"),
        F.col("r_ts").alias("view_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts"))).alias("lag_us"),
    )
