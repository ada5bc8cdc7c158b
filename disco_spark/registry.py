"""Query registry: the single source of truth for the driver contract.

Every operator module registers its demonstration queries here with the
``@query`` decorator; ``__spark_entry__.queries()`` / ``oracle_sql()``
just re-export these dicts. A query is a ``(spark, sf_dir) -> DataFrame``
callable; its oracle is an ANSI-SQL string DuckDB runs over the same
parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings).

Cross-engine determinism rules (so value-hashes match):
- money/measure aggregates: cast the per-row expression to DECIMAL
  before SUM (exact, order-independent), cast the result to DOUBLE.
- avg: exact decimal SUM cast to double, divided by COUNT in double.
- md5() is the shared deterministic hash (same hex in Spark & DuckDB).
- alias every computed column identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[["SparkSession", str], "DataFrame"]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from disco_spark.operators import relational  # noqa: F401
    from disco_spark.operators import relational2  # noqa: F401
    from disco_spark.textops import analysis  # noqa: F401
    from disco_spark.textops import vocab  # noqa: F401
    from disco_spark.dedup import dedup  # noqa: F401
    from disco_spark.dedup import cc  # noqa: F401
    from disco_spark.similarity import ann  # noqa: F401
    from disco_spark.index import discodb_demo  # noqa: F401
    from disco_spark.operators import classic_demo  # noqa: F401
    from disco_spark.plans import pipeline_demo  # noqa: F401
    from disco_spark.streaming import windows  # noqa: F401
    from disco_spark.streaming import sinks  # noqa: F401
    from disco_spark.multimodal import binary_ops  # noqa: F401
    from disco_spark.sources import demo  # noqa: F401
    from disco_spark.operators import asof  # noqa: F401
    from disco_spark.similarity import kmeans  # noqa: F401
    from disco_spark.similarity import pq  # noqa: F401
    from disco_spark.similarity import pagerank  # noqa: F401
    from disco_spark import sampling  # noqa: F401
    from disco_spark.functions import udaf  # noqa: F401
    from disco_spark.plans import curation  # noqa: F401  (last: composes other oracles)
