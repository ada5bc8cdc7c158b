"""Repo-wide physical-plan invariant: NO row-at-a-time Python UDFs.

Every registered query's executedPlan must be free of BatchEvalPython
nodes (pickled row-loop UDFs) — Arrow-batched MapInPandas /
ArrowEvalPython and pure-JVM expressions are the only sanctioned Python
paths (the 10-100x rule the module docstrings cite). A regression here
is exactly the kind of slow-path slip that survives correctness gates,
so it gets its own sweeping gate.
"""

from __future__ import annotations

from disco_spark import registry

from tests.conftest import SF_SMOKE

registry.load_all()

# streaming_* queries RUN the stream when the DataFrame is built
# (availableNow to a memory sink) — their plans are asserted in
# tests/test_streaming.py instead of re-running ~10-30s streams here.
# source_chunked_ingest asserts its own file-split bound, which needs
# sf0.01-sized data; its plan is a plain parquet scan.
SKIP = {"source_chunked_ingest"}


def test_no_row_at_a_time_python_udfs(spark):
    offenders = []
    for name in registry.QUERIES:
        if name.startswith("streaming_") or name in SKIP:
            continue
        plan = (
            registry.QUERIES[name](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"
