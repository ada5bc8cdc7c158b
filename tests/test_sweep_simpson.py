"""Dedup threshold sweep + Simpson audit (dedup.py, stats.py)."""

from __future__ import annotations

import os
import tempfile

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_sweep_oracle(spark):
    compare_query(spark, "dedup_threshold_sweep", SF_CORRECT)


def test_simpson_oracle(spark):
    compare_query(spark, "simpson_slope_reversal_audit", SF_CORRECT)


def test_sweep_monotone_and_calibrated(spark):
    """An identical pair survives every threshold; a half-overlapping
    pair only the low ones -> counts weakly decrease in the bar."""
    from disco_spark.dedup.dedup import dedup_threshold_sweep

    toks = [f"w{i}" for i in range(30)]
    a = " ".join(toks)
    mid = toks.copy()
    mid[15] = "CHANGED"  # jaccard vs a: 25/31 ~ 0.81
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, " ".join(mid))], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        rows = {
            r["threshold"]: r
            for r in dedup_threshold_sweep(spark, dd).collect()
        }
    assert set(rows) == {0.3, 0.5, 0.7, 0.9}
    counts = [rows[t]["n_pairs"] for t in (0.3, 0.5, 0.7, 0.9)]
    assert counts == sorted(counts, reverse=True)
    # only the identical pair clears 0.9; the 0.81 near-dup pairs with
    # BOTH copies below it
    assert rows[0.9]["n_pairs"] == 1
    assert rows[0.9]["n_docs"] == 2
    # band-cap semantics (round 8): docs 1 and 2 have IDENTICAL
    # signatures, so 2 collapses into rep 1 — candidates are the star
    # edge (1,2) plus the rep pair (1,3); (2,3) is represented through
    # the rep, so 0.7 implicates all 3 docs via 2 pairs, not 3
    assert rows[0.7]["n_pairs"] == 2
    assert rows[0.7]["n_docs"] == 3


def test_simpson_planted_paradox(spark):
    """Two brands each trending +1 within group, but group B sits at
    higher discount AND lower quantity -> pooled slope negative,
    both groups reversed."""
    from disco_spark.operators.stats import simpson_slope_reversal_audit

    li, part = [], [(1, "BA"), (2, "BB")]
    k = 0
    for i in range(20):
        x = i / 20.0
        k += 1
        li.append((1, x / 10, 10.0 + x))  # brand A: low discount, high qty
        k += 1
        li.append((2, 0.2 + x / 10, 0.0 + x))  # brand B: high disc, low qty
    ldf = spark.createDataFrame(
        li, "l_partkey long, l_discount double, l_quantity double"
    )
    pdf = spark.createDataFrame(part, "p_partkey long, p_brand string")
    with tempfile.TemporaryDirectory() as dd:
        ldf.write.parquet(os.path.join(dd, "lineitem.parquet"))
        pdf.write.parquet(os.path.join(dd, "part.parquet"))
        r = simpson_slope_reversal_audit(spark, dd).collect()[0]
    assert r["n_groups"] == 2
    assert r["pooled_slope"] < 0
    assert r["min_group_slope"] > 0  # every group trends up
    assert r["n_reversed"] == 2
