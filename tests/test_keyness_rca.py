"""Keyness G2 + Balassa RCA (vocab.py, relational3.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_keyness_oracle(spark):
    compare_query(spark, "vocab_keyness_test_vs_train", SF_CORRECT)


def test_rca_oracle(spark):
    compare_query(spark, "nation_rca_by_part_type", SF_CORRECT)


def test_keyness_flags_planted_marker(spark):
    """A marker word appearing ONLY in the test split tops the G2
    ranking and is flagged overused_in='test'."""
    from disco_spark.sampling import BUCKETS, TEST_HI
    import hashlib

    from disco_spark.textops.vocab import vocab_keyness_test_vs_train

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % BUCKETS

    test_ids = [i for i in range(1000) if bucket(i) < TEST_HI][:5]
    train_ids = [i for i in range(1000) if bucket(i) >= TEST_HI][:20]
    base = "common words shared by every split " * 2
    docs = [(i, base + " zzmarker zzmarker") for i in test_ids] + [
        (i, base) for i in train_ids
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as dd:
        df.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = vocab_keyness_test_vs_train(spark, dd).collect()
    top = rows[0]
    assert top["w"] == "zzmarker"
    assert top["overused_in"] == "test"
    assert top["n_train"] == 0
    # common words split ~ proportionally -> far lower G2
    assert top["g2"] > rows[1]["g2"] * 2


def test_rca_shares_and_specialization(spark):
    """Hand case: nation A ships only type T1, nation B an even mix
    -> A's RCA in T1 is >1 and exactly (1) / (share of T1 in world)."""
    from disco_spark.operators.relational3 import nation_rca_by_part_type

    sup = [(1, 10), (2, 20)]
    nat = [(10, "A"), (20, "B")]
    part = [(100, "T1"), (200, "T2")]
    li = [
        # suppkey, partkey, extprice, discount
        (1, 100, 300.0, 0.0),  # A ships 300 of T1
        (2, 100, 100.0, 0.0),  # B: 100 T1
        (2, 200, 100.0, 0.0),  # B: 100 T2
    ]
    with tempfile.TemporaryDirectory() as dd:
        spark.createDataFrame(
            sup, "s_suppkey long, s_nationkey long"
        ).write.parquet(os.path.join(dd, "supplier.parquet"))
        spark.createDataFrame(
            nat, "n_nationkey long, n_name string"
        ).write.parquet(os.path.join(dd, "nation.parquet"))
        spark.createDataFrame(
            part, "p_partkey long, p_type string"
        ).write.parquet(os.path.join(dd, "part.parquet"))
        spark.createDataFrame(
            li,
            "l_suppkey long, l_partkey long, l_extendedprice double, "
            "l_discount double",
        ).write.parquet(os.path.join(dd, "lineitem.parquet"))
        cells = {
            (r["nation"], r["ptype"]): r
            for r in nation_rca_by_part_type(spark, dd).collect()
        }
    # world: 500 total, T1 = 400 -> world share 0.8; A is 100% T1
    a_t1 = cells[("A", "T1")]
    assert a_t1["specialized"] == 1
    assert abs(a_t1["rca"] - round(1.0 / 0.8, 6)) < 1e-9
    b_t2 = cells[("B", "T2")]
    # B: half its exports in T2 vs world share 0.2 -> RCA 2.5
    assert abs(b_t2["rca"] - 2.5) < 1e-9
    assert ("A", "T2") not in cells  # no zero-cell rows fabricated
