"""tools/make_scaled_data.py --vocab-growth: the Heaps-law scale
artifact. The frozen-vocab interleave salt made every df-conditioned
dedup plan's 10x factor an artifact property (round-10 VERDICT), so
the growth mode's calibration IS the measurement's validity — pin it:

- replica 0 embeds the base corpus verbatim (p_0 = 0);
- mutation is deterministic per (token type, replica), so within-
  replica near-dup structure survives exactly;
- realized per-replica mutation rates track p_r = (r+1)^b - r^b and
  the cumulative vocabulary telescopes to V0 * R^b.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_scaled_data import replicate  # noqa: E402

BETA = 0.5
R = 4


@pytest.fixture(scope="module")
def scaled(spark):
    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", 22),
            (2, "alpha beta gamma epsilon", 24),  # near-dup of doc 1
            (3, "zeta eta theta iota kappa", 25),
        ],
        "doc_id long, text string, n_chars long",
    )
    rows = replicate(base, R, vocab_beta=BETA).collect()
    # replica id recovered from the doc_id offset (10_000 per replica)
    return {(r.doc_id % 10_000, r.doc_id // 10_000): r.text for r in rows}


def test_replica0_is_base_verbatim(scaled):
    assert scaled[(1, 0)] == "alpha beta gamma delta"
    assert scaled[(3, 0)] == "zeta eta theta iota kappa"


def test_mutation_uniform_within_replica_preserves_neardups(scaled):
    """Docs 1 and 2 share 3 token types; in EVERY replica the shared
    types must render identically (else near-dup structure — the whole
    point of the artifact — would degrade with replica id)."""
    for r in range(R):
        t1 = scaled[(1, r)].split()
        t2 = scaled[(2, r)].split()
        assert t1[:3] == t2[:3], (r, t1, t2)


def test_mutated_tokens_are_replica_unique_types(scaled):
    """A mutated type carries the replica suffix (disjoint across
    replicas -> the telescoping vocab sum), an unmutated one is the
    base type itself."""
    base_types = set("alpha beta gamma delta epsilon zeta eta theta iota kappa".split())
    for (doc, r), text in scaled.items():
        for tok in text.split():
            if r == 0:
                assert tok in base_types
            else:
                assert tok in base_types or tok.endswith(f"g{r}"), (doc, r, tok)


def test_realized_rates_and_vocab_follow_heaps(spark):
    """On a 2,000-type corpus the realized mutation rate per replica
    must sit within a 4-sigma binomial band of p_r = (r+1)^b - r^b,
    and the cumulative vocabulary within 5% of V0 * R^b."""
    v0, reps = 2000, 5
    text = " ".join(f"tok{i}" for i in range(v0))
    base = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = replicate(base, reps, vocab_beta=BETA).collect()
    by_rep = {r.doc_id // 10_000: r.text.split() for r in rows}
    vocab: set[str] = set()
    for r in range(reps):
        toks = by_rep[r]
        vocab.update(toks)
        p = 0.0 if r == 0 else (r + 1) ** BETA - r**BETA
        mutated = sum(1 for t in toks if t.endswith(f"g{r}"))
        sigma = math.sqrt(max(p * (1 - p) * v0, 1.0))
        assert abs(mutated - p * v0) <= 4 * sigma, (r, mutated, p * v0)
    want = v0 * reps**BETA
    assert abs(len(vocab) - want) / want < 0.05, (len(vocab), want)


def test_interleave_mode_unchanged(spark):
    """vocab_beta=None keeps the original salt (frozen-vocab artifact
    stays reproducible for the side-by-side rehearsal)."""
    base = spark.createDataFrame([(1, "a b", 3)], "doc_id long, text string, n_chars long")
    rows = replicate(base, 2, vocab_beta=None).collect()
    texts = {r.doc_id // 10_000: r.text for r in rows}
    assert texts[1] == "a r1x b"
