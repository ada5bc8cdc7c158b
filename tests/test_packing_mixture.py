"""Sequence packing, mixture resampling, logistic quality scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.sampling import mixture_temperature_sample
from disco_spark.session import load_tables
from disco_spark.testing import compare_query
from disco_spark.textops.packing import (
    global_prefix_sum,
    pack_manifest,
    pack_sequence_stats,
)
from tests.conftest import SF_SMOKE

registry.load_all()


def test_pack_manifest_oracle(spark):
    compare_query(spark, "pack_manifest_documents", SF_SMOKE)


def test_pack_stats_oracle(spark):
    compare_query(spark, "pack_sequence_stats", SF_SMOKE)


def test_mixture_oracle(spark):
    compare_query(spark, "sample_mixture_temperature", SF_SMOKE)


def test_quality_logistic_oracle(spark):
    compare_query(spark, "text_quality_logistic", SF_SMOKE)


def test_global_prefix_sum_exact(spark):
    """Two-pass prefix sum == single-partition reference on a small df,
    regardless of input partitioning."""
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, v int").repartition(9)
    got = {
        r.k: r.start
        for r in global_prefix_sum(df, ["k"], "v", out="start").collect()
    }
    expect, acc = {}, 0
    for k, v in rows:  # already ordered by k
        expect[k] = acc
        acc += v
    assert got == expect


def test_pack_manifest_contiguous(spark):
    """Token intervals tile the stream: each doc starts where the
    previous ends, and sequence spans cover [start, start+n) exactly."""
    docs = load_tables(spark, SF_SMOKE)["documents"]
    rows = sorted(pack_manifest(docs, budget=100).collect(), key=lambda r: r.doc_id)
    pos = 0
    for r in rows:
        assert r.start_tok == pos
        assert r.first_seq == pos // 100
        assert r.last_seq == (pos + r.n_toks - 1) // 100
        pos += r.n_toks


def test_pack_stats_full_sequences(spark):
    """Every sequence except the last holds exactly `budget` tokens, and
    total packed tokens equals the corpus token count."""
    docs = load_tables(spark, SF_SMOKE)["documents"]
    budget = 256
    stats = sorted(pack_sequence_stats(docs, budget).collect(), key=lambda r: r.seq_id)
    assert [r.seq_id for r in stats] == list(range(len(stats)))
    for r in stats[:-1]:
        assert r.n_tokens == budget
    assert 0 < stats[-1].n_tokens <= budget
    total = (
        docs.select(F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")))
        .groupBy()
        .sum()
        .collect()[0][0]
    )
    assert sum(r.n_tokens for r in stats) == total


def test_mixture_flattens_shares(spark):
    """sqrt-temperature sampling must shrink the majority share: with a
    9:1 mixture the kept set's majority share sits between the flattened
    ideal (75%) and the raw share (90%)."""
    rows = [(i, "web") for i in range(900)] + [(10_000 + i, "books") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")
    kept = mixture_temperature_sample(df, "src", "doc_id", target_frac=0.5).collect()
    from collections import Counter

    c = Counter(r.src for r in kept)
    share = c["web"] / (c["web"] + c["books"])
    assert 0.70 < share < 0.88, c
    # determinism
    kept2 = mixture_temperature_sample(df, "src", "doc_id", target_frac=0.5).collect()
    assert {r.doc_id for r in kept} == {r.doc_id for r in kept2}


def test_training_shards_oracle(spark):
    compare_query(spark, "sample_training_shards", SF_SMOKE)


def test_training_shards_balanced_and_stable(spark):
    from disco_spark.sampling import training_shards

    docs = load_tables(spark, SF_SMOKE)["documents"]
    a = {(r.doc_id, r.shard) for r in
         training_shards(docs, "doc_id", 8).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in
         training_shards(docs.repartition(13), "doc_id", 8).select("doc_id", "shard").collect()}
    assert a == b  # partitioning-independent
    from collections import Counter

    sizes = Counter(s for _, s in a)
    assert max(sizes.values()) - min(sizes.values()) <= 1  # round-robin balance


def test_mixture_no_overflow_on_large_source(spark):
    """Regression: the all-bigint threshold product wrapped past 2^63
    once a source held ~1.5M rows, yielding an empty/garbage sample."""
    rows_big = spark.range(2_000_000).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("src")
    )
    rows_small = spark.range(2_000_000, 2_000_500).select(
        F.col("id").alias("doc_id"), F.lit("books").alias("src")
    )
    kept = mixture_temperature_sample(
        rows_big.unionAll(rows_small), "src", "doc_id", 0.5
    )
    counts = {
        r["src"]: r["n"]
        for r in kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts.get("web", 0) > 500_000  # majority source still sampled
    assert counts.get("books", 0) > 0
