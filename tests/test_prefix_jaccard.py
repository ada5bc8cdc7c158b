"""Prefix-filtered EXACT Jaccard (dedup_ngram_jaccard_prefix): the
AllPairs/PPJoin candidate bound must be LOSSLESS — the pruned plan has
to reproduce the naive full posting join bit-for-bit at the threshold.
The oracle already asserts that against DuckDB's naive plan; these
tests additionally pin the losslessness against the repo's own naive
core on adversarial corpora (threshold-straddling pairs, identical
docs, size mismatches), where a broken bound shows up as a MISSING
pair, which no runtime error would ever surface."""

from __future__ import annotations

import random



from disco_spark.dedup.dedup import (
    _EXACT_BASELINE_OPTOUT,
    PREFIX_JACCARD_T,
    _jaccard_select,
    pair_overlaps,
    prefix_jaccard_pairs,
    shingle_df,
    with_toks,
)
from disco_spark.testing import compare_query

SF_CORRECT = "/root/testdata/sf0.01"


def _naive_pairs(docs, t):
    """The unbounded exact core, filtered at t — ground truth."""
    sh = shingle_df(docs)
    common, sizes = pair_overlaps(sh, universe=_EXACT_BASELINE_OPTOUT)
    return _jaccard_select(common, sizes, min_jac=t)


def _rows(df):
    return sorted(
        (r.doc_a, r.doc_b, r.jaccard) for r in df.collect()
    )


def _docs(spark, texts):
    return with_toks(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
    )


def test_prefix_jaccard_oracle(spark):
    compare_query(spark, "dedup_ngram_jaccard_prefix", SF_CORRECT)


def test_prefix_matches_naive_on_threshold_straddlers(spark):
    """Hand-built corpus with pairs just above, at, and below t=0.8:
    identical docs (j=1), one-shingle-edit near-dups, half-overlap
    docs (j~0.5), and disjoint docs. The prefix plan must agree with
    the naive join exactly — including NOT emitting the sub-threshold
    pairs."""
    base = "a b c d e f g h i j k l m n o p q r s t u v w"
    texts = [
        base,                          # 0
        base,                          # 1: identical to 0 (j=1.0)
        base + " x",                   # 2: superset, high j
        base.replace("k l m", "k Z m"),  # 3: local edit, j above/near t
        "a b c d e f g h i j " + "zz yy xx ww vv uu tt ss rr qq",  # 4: ~half
        "completely different words with no shared trigrams at all",  # 5
    ]
    docs = _docs(spark, texts)
    got = _rows(prefix_jaccard_pairs(docs, t=PREFIX_JACCARD_T))
    want = _rows(_naive_pairs(docs, PREFIX_JACCARD_T))
    assert got == want
    assert (0, 1, 1.0) in got  # the identical pair must survive
    # the disjoint doc must pair with nothing
    assert not any(5 in (a, b) for a, b, _ in got)


def test_prefix_matches_naive_on_random_corpora(spark):
    """Randomized losslessness: small vocab + heavy mutation produces
    pairs across the whole jaccard range; prefix == naive at several
    thresholds (the bound must hold for ANY t, not just the registered
    0.8)."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(12):
        base = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        texts.append(" ".join(base))
        mutated = list(base)
        for _ in range(rng.randint(0, 6)):
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
        texts.append(" ".join(mutated))
    docs = _docs(spark, texts)
    for t in (0.5, 0.8, 0.95):
        got = _rows(prefix_jaccard_pairs(docs, t=t))
        want = _rows(_naive_pairs(docs, t))
        assert got == want, f"prefix != naive at t={t}"


def test_prefix_candidate_space_is_pruned(spark):
    """The point of the plan: the prefix posting join must touch FEWER
    posting rows than the full join. Docs sharing only COMMON shingles
    (present in every doc) with jac < t produce zero prefix-join
    output when their rare shingles are disjoint."""
    # 6 docs share a common boilerplate tail; each has a unique head
    texts = [
        f"unique{i} head{i} tok{i} " + "same old boilerplate trailer text"
        for i in range(6)
    ]
    docs = _docs(spark, texts)
    assert prefix_jaccard_pairs(docs, t=0.8).count() == 0
    # and the naive join agrees there are no qualifying pairs
    assert _naive_pairs(docs, 0.8).count() == 0


def test_prefix_short_docs_excluded_like_naive(spark):
    """Docs under 3 tokens shingle to nothing in BOTH plans."""
    docs = _docs(spark, ["a b", "a b", "x y z w v u t s r q p o"])
    assert (
        prefix_jaccard_pairs(docs, t=0.8).count()
        == _naive_pairs(docs, 0.8).count()
        == 0
    )


def test_cluster_exact_oracle(spark):
    """The strict cluster map: CC over exact prefix pairs vs the
    naive-pairs recursive-CTE oracle."""
    compare_query(spark, "dedup_cluster_exact", SF_CORRECT)


def test_cluster_exact_matches_cc_over_naive_pairs(spark):
    """cluster_map(pair_fn=prefix) must equal cluster_map(pair_fn=naive
    at the same threshold) — the lossless bound extended through the
    transitive closure."""
    from disco_spark.dedup.cc import cluster_map

    texts = [
        "a b c d e f g h i j k l m n o p q r s t",
        "a b c d e f g h i j k l m n o p q r s t",      # dup of 0
        "a b c d e f g h i j k l m n o p q r s Z",      # near-dup chain
        "totally different text goes here with words",  # singleton
    ]
    docs = _docs(spark, texts)
    got = sorted(
        (r.doc_id, r.cluster_id)
        for r in cluster_map(
            docs, pair_fn=lambda d: prefix_jaccard_pairs(d, t=0.8)
        ).collect()
    )
    want = sorted(
        (r.doc_id, r.cluster_id)
        for r in cluster_map(
            docs, pair_fn=lambda d: _naive_pairs(d, 0.8)
        ).collect()
    )
    assert got == want
    # 0 and 1 are identical -> same cluster; 3 is a singleton
    labels = dict(got)
    assert labels[0] == labels[1]
    assert labels[3] == 3


def test_prefix_plan_shape(spark):
    """The physical plan must stay candidate-bounded: every join is
    keyed (no CartesianProduct / BroadcastNestedLoop anywhere — the
    prefix join keys on shingle, the verify keys on doc ids), and the
    positional-bound groupBy is present as a real aggregation."""
    from disco_spark.registry import QUERIES

    plan = (
        QUERIES["dedup_ngram_jaccard_prefix"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the grouped candidate stage aggregates cpref + positional maxima
    assert "cpref" in plan and "imax" in plan and "jmax" in plan
