"""LSH banding recall S-curve (dedup_lsh_recall_curve): ground truth
is the lossless prefix-filtered exact join at t=0.5, candidates are
the PRODUCTION band chain (signature groups + BAND_CAP). The pinned
properties: the truth side is exactly the prefix join's pair set
(sum(n_true) accounting), identical-signature cliques count as caught
(the star representation compresses them deliberately), and recall is
a true fraction (n_proposed <= n_true, 0 <= recall <= 1)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from disco_spark.dedup.dedup import (
    RECALL_CURVE_T,
    lsh_recall_curve_frame,
    prefix_jaccard_pairs,
    with_toks,
)
from disco_spark.testing import compare_query

SF_CORRECT = "/root/testdata/sf0.01"


def _docs(spark, texts):
    return with_toks(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
    )


def test_recall_curve_oracle(spark):
    compare_query(spark, "dedup_lsh_recall_curve", SF_CORRECT)


def test_identical_clique_counts_as_caught(spark):
    """Three identical docs form 3 true pairs at j=1.0; the band chain
    emits only the 2 rep->member star edges, but the (member, member)
    pair shares the signature group — the audit must report bucket-9
    recall 1.0, not charge the chain for its own clique compression."""
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    fillers = [
        f"filler{i} word{i} unique{i} token{i} only{i} here{i}"
        for i in range(6)
    ]
    curve = lsh_recall_curve_frame(_docs(spark, [dup, dup, dup] + fillers))
    rows = {r.j_bucket: r for r in curve.collect()}
    assert rows[9].n_true == 3
    assert rows[9].n_proposed == 3
    assert rows[9].recall == 1.0


def test_truth_side_is_the_prefix_pair_set(spark):
    """sum(n_true) over buckets == |prefix_jaccard_pairs(t=0.5)| — the
    left join and bucketing lose and invent nothing."""
    rng = random.Random(7)
    base = ["tok%d" % rng.randrange(40) for _ in range(30)]
    texts = []
    for _ in range(25):
        toks = list(base)
        for _ in range(rng.randrange(12)):
            toks[rng.randrange(len(toks))] = "mut%d" % rng.randrange(99)
        texts.append(" ".join(toks))
    docs = _docs(spark, texts)
    curve = lsh_recall_curve_frame(docs).collect()
    n_truth = prefix_jaccard_pairs(docs, t=RECALL_CURVE_T).count()
    assert sum(r.n_true for r in curve) == n_truth
    for r in curve:
        assert 0 <= r.n_proposed <= r.n_true
        assert 0.0 <= r.recall <= 1.0
        assert 5 <= r.j_bucket <= 9


def test_bucket_edges_match_oracle_semantics(spark):
    """A pair at exactly j=0.8 must land in bucket 8 (the 1e-9 nudge
    exists for edge values that round to an exact tenth)."""
    # 10 shingles total, 9 shared: j = 9/(10+10-9) = 0.818...; build
    # instead an exact 0.8: |A|=9, |B|=9, c=8 -> 8/10 = 0.8
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"  # 9 shingles
    b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 zz"  # 8 shared, 1 own
    curve = lsh_recall_curve_frame(_docs(spark, [a, b])).collect()
    [row] = curve
    assert row.j_bucket == 8
    assert row.n_true == 1
