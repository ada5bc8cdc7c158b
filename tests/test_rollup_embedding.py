"""Hypertable-style rollup grains + embedding utilities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


@pytest.mark.parametrize(
    "name",
    [
        "rollup_events_hourly",
        "rollup_events_6h_from_hourly",
        "rollup_histogram_quantiles_6h",
        "rollup_cmsketch_top_users_6h",
        "embedding_l2_stats",
        "embedding_quantize_int8",
    ],
)
def test_oracle(spark, name):
    compare_query(spark, name, SF_SMOKE)


def test_rollup_grains_compose_exactly(spark):
    """6h buckets built FROM hourly grains equal 6h buckets built from
    raw events — algebraic measures re-aggregate exactly."""
    from disco_spark.operators.rollup import hourly_grains, rollup_grains
    from disco_spark.session import load_tables

    t = load_tables(spark, SF_SMOKE)
    from_grains = rollup_grains(hourly_grains(t["events"]), hours=6)
    width = 6 * 3600
    direct = (
        t["events"]
        .groupBy(
            F.timestamp_seconds(
                F.unix_timestamp("ts") - F.pmod(F.unix_timestamp("ts"), F.lit(width))
            ).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias(
                "value_micro_sum"
            ),
        )
    )
    assert sorted(map(tuple, from_grains.collect())) == sorted(map(tuple, direct.collect()))


def test_int8_quantization_reconstruction_error(spark):
    """Dequantized vectors reconstruct originals within the symmetric
    int8 bound (|err| <= 0.5/scale per component)."""
    from disco_spark.session import load_tables
    from disco_spark.similarity.embedding_ops import quantize_int8

    t = load_tables(spark, SF_SMOKE)
    q, scale = quantize_int8(F.col("embedding"))
    df = t["embeddings"].select("embedding", q.alias("q"), scale.alias("s")).limit(50)
    for row in df.collect():
        if row.s == 0:
            continue
        for orig, qi in zip(row.embedding, row.q):
            assert abs(qi / row.s - float(orig)) <= (0.5 / row.s) + 1e-9


def test_hll_rollup_oracle(spark):
    from disco_spark.testing import compare_query
    from tests.conftest import SF_SMOKE

    compare_query(spark, "rollup_hll_daily_users", SF_SMOKE)


def test_hll_error_bound_at_dense_cardinality(spark):
    """Beyond sparse mode (100k uniques vs lgK=12), the estimator must
    stay within a few percent — the contract the rollup relies on at
    real cardinalities — and merging split sketches must equal the
    single-pass sketch exactly."""
    from pyspark.sql import functions as F

    n = 100_000
    ids = spark.range(n).select((F.col("id") * 2654435761 % 2**31).alias("uid"),
                                (F.col("id") % 7).alias("part"))
    single = ids.agg(F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("e")).collect()[0]["e"]
    merged = (
        ids.groupBy("part").agg(F.hll_sketch_agg("uid").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    exact = ids.select("uid").distinct().count()
    assert abs(single - exact) / exact < 0.03
    assert merged == single  # sketch merge is lossless vs one-pass


def test_cmsketch_estimates_upper_bound_truth(spark):
    """Count-min never under-counts: every (window, user) estimate must
    be >= the true count, and equal for most cells at this load factor
    (the sketch is 4x1024 cells vs ~150 users/hour)."""
    from disco_spark import registry
    from disco_spark.operators.rollup import epoch_bucket
    from disco_spark.session import load_tables
    from pyspark.sql import functions as F

    registry.load_all()
    est = registry.QUERIES["rollup_cmsketch_top_users_6h"](spark, SF_SMOKE)
    ev = load_tables(spark, SF_SMOKE)["events"]
    truth = ev.groupBy(
        epoch_bucket("ts", 6).alias("bucket"), "user_id"
    ).agg(F.count(F.lit(1)).alias("true_n"))
    # NO phantom rows: a (window, user) the user never touched must not
    # appear (the all-cells-present rule — a missing sketch cell is a 0)
    assert est.join(truth, ["bucket", "user_id"], "left_anti").count() == 0

    j = est.join(truth, ["bucket", "user_id"]).collect()
    assert j  # candidates exist in the truth set
    assert all(r.est_n >= r.true_n for r in j)  # no under-counting, ever
    exact = sum(r.est_n == r.true_n for r in j)
    assert exact / len(j) > 0.9  # sparse regime: collisions are rare
