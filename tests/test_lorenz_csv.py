"""Lorenz deciles + CSV roundtrip (relational3.py, sources/demo.py)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_lorenz_oracle(spark):
    compare_query(spark, "orders_lorenz_deciles", SF_CORRECT)


def test_csv_oracle(spark):
    compare_query(spark, "source_csv_roundtrip", SF_CORRECT)


def test_lorenz_invariants(spark):
    """10 deciles, shares ascending (ranked ascending), cumulative
    monotone and ending at exactly 1."""
    from disco_spark.operators.relational3 import orders_lorenz_deciles

    rows = orders_lorenz_deciles(spark, SF_CORRECT).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["revenue_share"] for r in rows]
    assert shares == sorted(shares)
    cums = [r["cum_revenue_share"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == 1.0
    assert sum(r["n_customers"] for r in rows) >= 1000


def test_csv_survives_hostile_fields(spark):
    """Quotes, commas, and embedded newlines roundtrip byte-exact
    through the RFC-4180 write/read options."""
    from disco_spark.sources.demo import source_csv_roundtrip

    hostile = [
        (1, "en", "s1", 'say "hi", ok?\nsecond line'),
        (2, "de", "s2", "plain"),
        (3, "fr", "s3", ',,",",""\n"'),
    ]
    df = spark.createDataFrame(
        hostile, "doc_id long, lang string, source string, text string"
    )
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "documents.parquet"))
        got = {
            r["doc_id"]: r["text_md5"]
            for r in source_csv_roundtrip(spark, dd).collect()
        }
        want = {
            r["doc_id"]: r["h"]
            for r in df.select(
                "doc_id", F.md5("text").alias("h")
            ).collect()
        }
    assert got == want
