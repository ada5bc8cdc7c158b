"""BAND_CAP calibration sweep (dedup/dedup.py): the recall-vs-cap
curve a corpus owner reads to set the cap from data."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from disco_spark.testing import compare_query
from tests.conftest import SF_CORRECT


def test_calibration_oracle(spark):
    compare_query(spark, "dedup_band_cap_calibration", SF_CORRECT)


def _run(spark, docs):
    import os
    import tempfile

    from disco_spark.dedup.dedup import dedup_band_cap_calibration

    with tempfile.TemporaryDirectory() as dd:
        docs.write.parquet(os.path.join(dd, "documents.parquet"))
        return sorted(
            dedup_band_cap_calibration(spark, dd).collect(),
            key=lambda r: r["cap"],
        )


def test_sweep_is_monotone_and_tops_out(spark):
    """Raising the cap can only ADD candidate pairs (min_cap is the
    smallest cap admitting the pair), verified count follows, and
    recall is exactly 1.0 at the sweep's own max."""
    rng = random.Random(9)
    vocab = [f"t{i}" for i in range(25)]
    rows, doc_id = [], 0
    for _ in range(10):
        base = " ".join(rng.choices(vocab, k=rng.randint(6, 12)))
        for _ in range(rng.randint(1, 5)):
            rows.append((doc_id, base))
            doc_id += 1
    for _ in range(12):
        rows.append(
            (doc_id, " ".join(rng.choices(vocab, k=rng.randint(6, 12))))
        )
        doc_id += 1
    res = _run(spark, spark.createDataFrame(rows, "doc_id long, text string"))
    caps = [r["cap"] for r in res]
    assert caps == [5, 10, 20, 40]
    for lo, hi in zip(res, res[1:]):
        assert lo["n_candidates"] <= hi["n_candidates"]
        assert lo["n_verified"] <= hi["n_verified"]
    assert res[-1]["recall_vs_max"] == 1.0


def test_hot_bucket_differentiates_the_curve(spark):
    """A corpus with >5 DISTINCT-signature docs colliding in one band
    bucket must show cap 5 proposing strictly fewer candidates than
    cap 40 — the curve the calibration exists to reveal. Build it by
    giving 30 docs a shared 12-token core (band collisions likely)
    plus enough unique suffix tokens that full signatures differ."""
    core = " ".join(f"c{i}" for i in range(12))
    rows = [
        (i, core + " " + " ".join(f"u{i}x{j}" for j in range(6)))
        for i in range(30)
    ]
    res = _run(spark, spark.createDataFrame(rows, "doc_id long, text string"))
    by_cap = {r["cap"]: r for r in res}
    # signatures differ (unique suffixes), so pairs come from capped
    # rep buckets, not star edges — the cap must bind somewhere
    assert by_cap[40]["n_candidates"] > by_cap[5]["n_candidates"]
    assert by_cap[40]["recall_vs_max"] == 1.0


def test_star_edges_are_cap_independent(spark):
    """Exact replicas collapse to signature groups: their pairs ride
    the star arm with min_cap 1, so every cap row reports them and
    recall is flat 1.0 across the sweep."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)]
    res = _run(spark, spark.createDataFrame(rows, "doc_id long, text string"))
    for r in res:
        # star edges: rep (doc 0) to each member — 9 pairs at any cap
        assert r["n_candidates"] == 9
        assert r["n_verified"] == 9
        assert r["recall_vs_max"] == 1.0
