"""HHI concentration, 2-D heatmap bins, magic-byte dispatch."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_hhi_oracle(spark):
    compare_query(spark, "hhi_supplier_by_nation", SF_CORRECT)


def test_heatmap_oracle(spark):
    compare_query(spark, "heatmap_qty_price_bins", SF_CORRECT)


def test_magic_oracle(spark):
    compare_query(spark, "multimodal_magic_dispatch", SF_CORRECT)


def test_hhi_bounds_and_monopoly(spark):
    """HHI in [1/n, 1]; a single-supplier nation scores exactly 1."""
    from disco_spark.operators.stats import hhi_supplier_by_nation

    rows = hhi_supplier_by_nation(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9

    li = [(1, 100.0, 0.0), (1, 200.0, 0.0)]
    sup = [(1, 5)]
    nat = [(5, "X")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            li, "l_suppkey long, l_extendedprice double, l_discount double"
        ).write.parquet(os.path.join(d, "lineitem.parquet"))
        spark.createDataFrame(
            sup, "s_suppkey long, s_nationkey long"
        ).write.parquet(os.path.join(d, "supplier.parquet"))
        spark.createDataFrame(
            nat, "n_nationkey long, n_name string"
        ).write.parquet(os.path.join(d, "nation.parquet"))
        r = hhi_supplier_by_nation(spark, d).collect()[0]
    assert r["n_suppliers"] == 1 and r["hhi"] == 1.0


def test_heatmap_cells_cover_corpus(spark):
    from disco_spark.operators.relational3 import heatmap_qty_price_bins
    from disco_spark.session import load_tables

    rows = heatmap_qty_price_bins(spark, SF_CORRECT).collect()
    n_li = load_tables(spark, SF_CORRECT)["lineitem"].count()
    assert sum(r["n"] for r in rows) == n_li
    for r in rows:
        assert 0 <= r["bin_q"] <= 9 and 0 <= r["bin_p"] <= 9


def test_magic_partitions_corpus(spark):
    from disco_spark.multimodal.binary_ops import multimodal_magic_dispatch
    from disco_spark.session import load_tables

    rows = multimodal_magic_dispatch(spark, SF_CORRECT).collect()
    n_docs = load_tables(spark, SF_CORRECT)["documents"].count()
    assert sum(r["n_payloads"] for r in rows) == n_docs
    assert sum(r["total_bytes"] for r in rows) == 16 * n_docs
    assert {r["sniffed"] for r in rows} <= {"fmt_a", "fmt_b", "fmt_c", "fmt_d"}
