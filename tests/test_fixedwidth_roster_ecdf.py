"""Fixed-width interchange, ordered roster agg, ECDF probes."""

from __future__ import annotations

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_fixed_width_oracle(spark):
    compare_query(spark, "source_fixed_width", SF_CORRECT)


def test_roster_oracle(spark):
    compare_query(spark, "nation_supplier_roster", SF_CORRECT)


def test_ecdf_oracle(spark):
    compare_query(spark, "orders_value_ecdf", SF_CORRECT)


def test_roster_is_rank_ordered(spark):
    """Roster names appear in descending-acctbal order and are at
    most 3 per nation."""
    from pyspark.sql import functions as F

    from disco_spark.operators.relational3 import nation_supplier_roster
    from disco_spark.session import load_tables

    rows = nation_supplier_roster(spark, SF_CORRECT).collect()
    assert rows
    t = load_tables(spark, SF_CORRECT)
    bal = {
        r["s_name"]: r["s_acctbal"]
        for r in t["supplier"].select("s_name", "s_acctbal").collect()
    }
    for r in rows:
        names = r["roster"].split(",")
        assert 1 <= len(names) <= 3
        bals = [bal[n] for n in names]
        assert bals == sorted(bals, reverse=True)


def test_ecdf_monotone_in_probe(spark):
    from disco_spark.operators.relational3 import orders_value_ecdf

    rows = orders_value_ecdf(spark, SF_CORRECT).collect()
    by_prio = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], []).append(
            (r["probe"], r["cdf"])
        )
    for prio, pairs in by_prio.items():
        pairs.sort()
        cdfs = [c for _, c in pairs]
        assert cdfs == sorted(cdfs), (prio, cdfs)
        assert all(0.0 <= c <= 1.0 for c in cdfs)
