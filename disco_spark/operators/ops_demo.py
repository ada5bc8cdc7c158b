"""Driver-verified demonstration of the job-control surface (SURVEY
§2.9): the reference submits a named job, waits on it, and can kill it
by name (lib/disco/core.py:75-332). Here the same lifecycle is a job
group around DataFrame actions (ops.job_group / run_cancellable /
kill_job) — this query runs its materializing action through that
machinery, so the control path itself sits on the driver's oracle gate
rather than only in pytest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.operators.relational import dsum
from disco_spark.ops import run_cancellable
from disco_spark.registry import query
from disco_spark.session import lazy_persist, load_tables


@query(
    "ops_job_group_rollup",
    oracle="""
    SELECT o_orderstatus AS key, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def ops_job_group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate materialized via the async submit-and-wait lifecycle:
    run_cancellable executes the action in a worker thread under a named
    job group (kill_job(spark, name) from any thread would cancel it
    mid-flight, like Disco.kill(jobname)); the driver thread joins, then
    serves the persisted result."""
    t = load_tables(spark, sf_dir)
    agg = t["orders"].groupBy(F.col("o_orderstatus").alias("key")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
    )
    res = lazy_persist(agg)
    th = run_cancellable(spark, "disco:job:ops_rollup", lambda: res.count())
    th.join(timeout=300)
    assert not th.is_alive(), "job-group action did not complete"
    return res
