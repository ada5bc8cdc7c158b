"""k-core peel + exponential goodness-of-fit KS (triangles, temporal)."""

from __future__ import annotations

import datetime
import os
import tempfile

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_kcore_oracle(spark):
    compare_query(spark, "graph_kcore_membership", SF_CORRECT)


def test_expfit_oracle(spark):
    compare_query(spark, "orders_interarrival_expfit_ks", SF_CORRECT)


def test_kcore_peel_converged_on_real_graph(spark):
    """The registered KCORE_ROUNDS suffice here: every surviving node
    has core_degree >= k, and one MORE peel removes nobody — the
    bounded unroll IS the true 2-core on this graph."""
    from disco_spark.similarity.triangles import (
        KCORE_K,
        graph_kcore_membership,
    )

    core = graph_kcore_membership(spark, SF_CORRECT)
    assert core.filter(F.col("core_degree") < KCORE_K).count() == 0
    assert core.count() > 0


def test_kcore_hand_graph(spark):
    """Triangle 1-2-3 with a pendant path 3-4: the pendant peels off
    (deg 1), then node 3 still has deg 2 -> the 2-core is exactly the
    triangle with all degrees 2."""
    from disco_spark.similarity.triangles import graph_kcore_membership

    orders = [
        [1, 2], [1, 2], [2, 3], [2, 3], [1, 3], [1, 3], [3, 4], [3, 4],
    ]
    rows = [
        (ok, p) for ok, parts in enumerate(orders, start=1) for p in parts
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "lineitem.parquet"))
        got = {
            r["node"]: r["core_degree"]
            for r in graph_kcore_membership(spark, dd).collect()
        }
    assert got == {1: 2, 2: 2, 3: 2}


def test_expfit_rejects_constant_gaps(spark):
    """Perfectly regular ordering (every gap identical) is maximally
    non-exponential -> D large, reject flag set."""
    from disco_spark.operators.temporal import orders_interarrival_expfit_ks

    base = datetime.date(2020, 1, 1)
    rows = []
    k = 0
    for cust in range(40):
        for i in range(10):  # constant 30-day gap
            k += 1
            rows.append(
                (k, cust, base + datetime.timedelta(days=30 * i))
            )
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "orders.parquet"))
        r = orders_interarrival_expfit_ks(spark, dd).collect()[0]
    assert r["n_gaps"] == 360
    # all mass at gap=30 while Exponential(1/30) has F(30) ~ 0.63
    assert r["d_stat"] > 0.3
    assert r["reject_exponential"] == 1
