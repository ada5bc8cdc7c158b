"""Custom grouped aggregation in Python (the UDAF surface of SURVEY
§2.7: the reference's opaque user `reduce` folds — func.py:73-114 — when
the fold is genuinely not expressible with built-in aggregates).

Pattern: `groupBy(...).applyInPandas` with numpy doing the per-group
math on Arrow batches. Accumulation uses exact int64 arithmetic
(floor-to-micros) so the result is order-independent and hash-matches
any engine — the same determinism rule as `relational.dsum`.

At 100 TB: applyInPandas shuffles each group to one task, so grouped
UDAFs need group cardinality >> cores and no giant groups (salt first
via operators/skew.py if a group is hot); prefer built-in aggregates
whenever the fold is algebraic — this surface is for when it isn't.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def _weighted_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    qty = pdf["l_quantity"].to_numpy().astype(np.int64)
    price_micro = np.floor(pdf["l_extendedprice"].to_numpy() * 1e6).astype(np.int64)
    wsum = int((price_micro * qty).sum())
    qsum = int(qty.sum())
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "wsum_micro": [wsum],
            "qty_sum": [qsum],
            "weighted_avg_price": [float(wsum) / float(qsum) / 1e6],
        }
    )


@query(
    "udaf_weighted_avg_price",
    oracle="""
    WITH g AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum_micro,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, wsum_micro, qty_sum,
           CAST(CAST(wsum_micro AS DOUBLE) / CAST(qty_sum AS DOUBLE) / 1000000.0
                AS DOUBLE) AS weighted_avg_price
    FROM g
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag, computed by a
    numpy UDAF over Arrow groups; integer-exact accumulation makes the
    Python fold hash-match the SQL formulation."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(
            _weighted_stats,
            schema=(
                "l_returnflag string, wsum_micro bigint, qty_sum bigint, "
                "weighted_avg_price double"
            ),
        )
    )
