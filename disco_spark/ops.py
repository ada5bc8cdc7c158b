"""Cluster/ops control surface (SURVEY §2.9): the reference's Disco
client methods (submit/results/wait/jobinfo/joblist/events/kill/clean —
lib/disco/core.py:75-332, master routes master/src/disco_web.erl:14-45)
mapped onto the SparkSession lifecycle:

    submit + wait      -> DataFrame action (lazy plan + collect/write)
    kill               -> cancelJobGroup
    jobinfo/joblist    -> Spark UI / REST (native); statusTracker here
    events (log tail)  -> Spark event log (native)
    blacklist          -> excludeOnFailure conf (native)

Only the pieces with engine-level value get code: job-group scoping so a
logical "job" (possibly many Spark actions) can be cancelled as a unit,
exactly like `disco.core.Disco.kill(jobname)`.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def job_group(spark: SparkSession, name: str, description: str = ""):
    """Scope every action in the block under a cancellable group id.

    Mirrors submitting a named reference job: `kill_job(spark, name)`
    from any thread cancels all its running Spark jobs.
    """
    sc = spark.sparkContext
    sc.setJobGroup(name, description or name, interruptOnCancel=True)
    try:
        yield name
    finally:
        sc.setJobGroup("", "")


def kill_job(spark: SparkSession, name: str) -> None:
    """`Disco.kill(jobname)` analog (reference lib/disco/core.py:180-184)."""
    spark.sparkContext.cancelJobGroup(name)


def run_cancellable(spark: SparkSession, name: str, action, on_started=None):
    """Run `action()` (a driver-side DataFrame action) in a worker thread
    under `name`'s job group; returns the thread. The caller may
    `kill_job(spark, name)` to cancel — the pattern behind the
    reference's async submit + kill lifecycle."""

    def target():
        with job_group(spark, name):
            action()

    t = threading.Thread(target=target, name=f"disco-job-{name}", daemon=True)
    t.start()
    if on_started:
        on_started(t)
    return t


def job_progress(spark: SparkSession) -> dict:
    """`jobinfo`-style snapshot from the status tracker (active stage and
    job ids; full detail lives in the Spark UI/REST API)."""
    st = spark.sparkContext.statusTracker()
    return {
        "active_jobs": list(st.getActiveJobsIds()),
        "active_stages": list(st.getActiveStageIds()),
    }
