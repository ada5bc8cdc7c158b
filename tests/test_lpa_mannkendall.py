"""Label-propagation communities (similarity/communities.py) and the
Mann-Kendall trend test (operators/temporal.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_lpa_oracle(spark):
    compare_query(spark, "graph_label_propagation", SF_CORRECT)


def test_mann_kendall_oracle(spark):
    compare_query(spark, "orders_trend_mann_kendall", SF_CORRECT)


def test_lpa_converged_on_real_graph(spark):
    """The registered LPA_ROUNDS is the sync-LPA fixpoint on this
    graph: one MORE round changes no node's label."""
    from disco_spark.session import load_tables
    from disco_spark.similarity.communities import (
        LPA_ROUNDS,
        label_propagation,
    )
    from disco_spark.similarity.triangles import coorder_edges

    li = load_tables(spark, SF_CORRECT)["lineitem"]
    e = coorder_edges(li)
    at = {
        r["node"]: r["label"]
        for r in label_propagation(e, LPA_ROUNDS).collect()
    }
    plus1 = {
        r["node"]: r["label"]
        for r in label_propagation(e, LPA_ROUNDS + 1).collect()
    }
    assert at and at == plus1


def test_lpa_two_planted_communities(spark):
    """Two triangles {1,2,3} and {5,6,7} joined by one weak edge 3-5:
    sync self-vote LPA with min-tie-break converges (hand-traced) to
    exactly the two planted communities, labeled 1 and 5."""
    from disco_spark.similarity.communities import graph_label_propagation

    edges = [(1, 2), (2, 3), (1, 3), (5, 6), (6, 7), (5, 7), (3, 5)]
    rows = [
        (ok, p)
        for ok, (u, v) in enumerate(
            [e for e in edges for _ in range(2)], start=1
        )
        for p in (u, v)
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "lineitem.parquet"))
        got = {
            r["community"]: (r["n_members"], r["min_node"], r["max_node"])
            for r in graph_label_propagation(spark, dd).collect()
        }
    assert got == {1: (3, 1, 3), 5: (3, 5, 7)}


def test_mann_kendall_matches_bruteforce(spark):
    """Exact S / tie counts / tau_b vs an all-pairs pure-Python replay
    of the daily cents series at smoke scale."""
    import math

    import duckdb

    from disco_spark.operators.temporal import orders_trend_mann_kendall

    con = duckdb.connect()
    daily = con.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM '{SF_SMOKE}/orders.parquet' GROUP BY 1 ORDER BY d
        """
    ).fetchall()
    cents = [c for _, c in daily]
    n = len(cents)
    pos = neg = tie = 0
    for i in range(n):
        for j in range(i + 1, n):
            if cents[j] > cents[i]:
                pos += 1
            elif cents[j] < cents[i]:
                neg += 1
            else:
                tie += 1
    from collections import Counter

    n2 = sum(t * (t - 1) // 2 for t in Counter(cents).values() if t > 1)
    n0 = n * (n - 1) // 2
    tau = round((pos - neg) / math.sqrt(n0 * (n0 - n2)), 6)

    row = orders_trend_mann_kendall(spark, SF_SMOKE).collect()[0]
    assert (
        row["n_days"],
        row["n_concordant"],
        row["n_discordant"],
        row["n_ties"],
        row["s_stat"],
    ) == (n, pos, neg, tie, pos - neg)
    assert abs(row["tau_b"] - tau) < 1e-9
