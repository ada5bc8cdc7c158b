"""Ops/control-surface tests (SURVEY §2.9): job groups, cancel, progress."""

from __future__ import annotations

import time

from disco_spark.ops import job_group, job_progress, kill_job, run_cancellable


def test_job_group_scopes_and_clears(spark):
    with job_group(spark, "g1", "demo") as name:
        assert name == "g1"
        assert spark.range(10).count() == 10
    # after the block, a fresh action runs under no group (no exception)
    assert spark.range(5).count() == 5


def test_kill_job_cancels_running_group(spark):
    import pyspark.sql.functions as F

    errors = []

    def slow_action():
        try:
            # a genuinely slow job: cartesian square of range(1e5)
            df = spark.range(100_000).crossJoin(spark.range(100_000))
            df.agg(F.count(F.lit(1))).collect()
        except Exception as ex:  # cancellation surfaces as an exception
            errors.append(ex)

    t = run_cancellable(spark, "to-kill", slow_action)
    deadline = time.time() + 30
    while time.time() < deadline and not job_progress(spark)["active_jobs"]:
        time.sleep(0.2)
    kill_job(spark, "to-kill")
    t.join(timeout=60)
    assert not t.is_alive(), "cancelled job should terminate"
    assert errors, "cancellation should raise inside the job thread"


def test_job_progress_shape(spark):
    snap = job_progress(spark)
    assert set(snap) == {"active_jobs", "active_stages"}


def test_concurrent_jobs_fair_pools(spark):
    """Reference parity for async submit + waitmany (tests/test_async.py,
    test_waitmany.py): N logical jobs submitted from N driver threads,
    each in its own FAIR scheduler pool, all completing with correct
    results. Spark's scheduler interleaves them; the pool property is
    thread-local so each job's stages land in its own pool."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    def one_job(i: int) -> int:
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"pool_{i}")
        try:
            return (
                spark.range(0, 20_000)
                .withColumn("g", F.col("id") % 7)
                .groupBy("g")
                .count()
                .count()
            )
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(one_job, range(4)))
    assert results == [7, 7, 7, 7]


def test_ops_job_group_rollup_oracle(spark):
    from disco_spark import registry
    from disco_spark.testing import compare_query

    registry.load_all()
    compare_query(spark, "ops_job_group_rollup", "/root/testdata/sf0.001")
