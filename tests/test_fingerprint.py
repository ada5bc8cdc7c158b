"""Order-independent table fingerprints (operators/fingerprint.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from disco_spark.operators.fingerprint import row_hash, table_fingerprint
from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def _fp(spark, rows):
    df = spark.createDataFrame(rows, "k long, v string")
    canon = F.concat_ws("|", F.col("k").cast("string"), F.col("v"))
    return table_fingerprint(df, canon, "t").collect()[0]


def test_fingerprint_oracle(spark):
    compare_query(spark, "table_fingerprint_replicas", SF_CORRECT)


def test_fingerprint_invariant_under_order_and_partitioning(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    a = _fp(spark, rows)
    df = spark.createDataFrame(list(reversed(rows)), "k long, v string")
    canon = F.concat_ws("|", F.col("k").cast("string"), F.col("v"))
    b = table_fingerprint(df.repartition(7), canon, "t").collect()[0]
    assert (a["xor_fp"], a["sum_fp"], a["n_rows"]) == (
        b["xor_fp"],
        b["sum_fp"],
        b["n_rows"],
    )


def test_fingerprint_detects_single_value_mutation(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    mutated = rows[:50] + [(50, "vX")] + rows[51:]
    a, b = _fp(spark, rows), _fp(spark, mutated)
    assert a["n_rows"] == b["n_rows"]
    assert a["xor_fp"] != b["xor_fp"]
    assert a["sum_fp"] != b["sum_fp"]


def test_fingerprint_sum_channel_catches_duplicated_pair(spark):
    """Inserting the SAME row twice XOR-cancels (the known xor
    blindness) but shifts both the count and the sum channel."""
    rows = [(i, f"v{i}") for i in range(10)]
    a = _fp(spark, rows)
    b = _fp(spark, rows + [(3, "v3"), (3, "v3")])
    assert a["xor_fp"] == b["xor_fp"]  # the blindness, by construction
    assert a["n_rows"] != b["n_rows"]
    assert a["sum_fp"] != b["sum_fp"]


def test_row_hash_range(spark):
    out = spark.range(0, 1000).select(
        row_hash(F.col("id").cast("string")).alias("h")
    )
    mn, mx = out.agg(F.min("h"), F.max("h")).collect()[0]
    assert mn >= 0 and mx < 2**60
