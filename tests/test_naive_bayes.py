"""Naive Bayes train/predict parity (reference naive_bayes.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.session import load_tables
from disco_spark.similarity.naive_bayes import naive_bayes_predict, naive_bayes_train
from disco_spark.testing import compare_query
from disco_spark.textops.analysis import with_toks
from tests.conftest import SF_SMOKE

registry.load_all()


def test_naive_bayes_oracle(spark):
    compare_query(spark, "naive_bayes_lang_scores", SF_SMOKE)


def test_naive_bayes_matches_reference_formulas(spark):
    """Hand-check the 2x2 + pseudocount arithmetic on the reference
    docstring's own toy example (train: 3 android docs saying 'cheap',
    1 apple doc saying 'expensive')."""
    rows = [
        (1, "android", "cheap"),
        (2, "apple", "expensive"),
        (3, "android", "cheap"),
        (4, "android", "cheap"),
    ]
    train = with_toks(
        spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    )
    model = {
        (r.tok, r.y): (r.ll, r.prior)
        for r in naive_bayes_train(train, "lang").collect()
    }
    # pairs(android,cheap)=3, items(cheap)=3 -> ll = ln(4) - ln(1)
    assert math.isclose(model[("cheap", "android")][0], math.log(4), rel_tol=1e-12)
    # pairs(apple,cheap)=0 -> ll = ln(1) - ln(4)
    assert math.isclose(model[("cheap", "apple")][0], -math.log(4), rel_tol=1e-12)
    # prior(android) = V * (ln(n_y+2) - ln(total-n_y+2)) = 2*(ln5-ln3)
    assert math.isclose(
        model[("cheap", "android")][1], 2 * (math.log(5) - math.log(3)), rel_tol=1e-12
    )
    # predict doc '1 cheap': android score = prior + ll(cheap|android)
    test = with_toks(
        spark.createDataFrame([(10, "cheap")], "doc_id bigint, text string")
    )
    scores = {
        r["class"]: r.score
        for r in naive_bayes_predict(
            test, naive_bayes_train(train, "lang")
        ).collect()
    }
    assert math.isclose(
        scores["android"],
        round(2 * (math.log(5) - math.log(3)) + math.log(4), 6),
        rel_tol=1e-9,
    )
    assert scores["android"] > scores["apple"]


def test_naive_bayes_model_covers_full_grid(spark):
    """Every (class, vocab token) pair gets a model row — absent
    co-occurrences still contribute -ln(n_i + 1), per the reference's
    items x ys loop."""
    docs = load_tables(spark, SF_SMOKE)["documents"]
    train = with_toks(docs).limit(50)
    model = naive_bayes_train(train, "lang")
    n_classes = model.select("y").distinct().count()
    n_vocab = model.select("tok").distinct().count()
    assert model.count() == n_classes * n_vocab
    assert model.filter(F.col("ll").isNull() | F.col("prior").isNull()).count() == 0
