"""ML pipeline tests (SURVEY §2.10 M1-M10, §5 test strategy)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from reddit_can_bigdata_spark.tables import load_tables

    return load_tables(spark, sf_dir)["documents"]


def test_lexicon_score_deterministic_and_bounded(docs):
    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.ml.sentiment import lexicon_score

    scored = lexicon_score(docs)
    row = scored.agg(
        F.min("lex_score").alias("lo"), F.max("lex_score").alias("hi")
    ).collect()[0]
    assert -1.0 <= row["lo"] <= row["hi"] <= 1.0
    labels = {r["lex_label"] for r in scored.select("lex_label").distinct().collect()}
    assert labels <= {"positive", "negative", "neutral"}
    # deterministic: same input -> same aggregate
    s1 = scored.agg(F.sum("lex_score")).collect()[0][0]
    s2 = lexicon_score(docs).agg(F.sum("lex_score")).collect()[0][0]
    assert s1 == s2


def test_train_sentiment_selects_model_and_reports_agreement(docs):
    from reddit_can_bigdata_spark.ml.sentiment import train_sentiment

    res = train_sentiment(docs)
    assert res.model_name in {"logistic_regression", "random_forest", "naive_bayes"}
    # trained on its own lexicon labels, accuracy should comfortably
    # beat the majority-class floor on this synthetic corpus
    assert res.accuracy >= 0.5
    assert 0.0 <= res.agreement_rate <= 1.0
    cols = set(res.predictions.columns)
    assert cols == {"id", "lex_label", "ml_prediction"}
    assert res.predictions.count() == docs.count()
