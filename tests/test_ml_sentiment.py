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


def test_shared_feature_fit_matches_per_classifier_pipelines(docs):
    """Round-9 refactor guard: fitting the six feature stages ONCE and
    sharing the featurized train/test across the three classifiers must
    produce predictions identical to the reference-shaped form that
    fits a full Pipeline(base + [clf]) per classifier
    (`spark-ml-sentiment/spark_ml_sentiment.py:223-296`) — same seeds,
    same features, same winner."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import (
        LogisticRegression,
        NaiveBayes,
        RandomForestClassifier,
    )
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import (
        IDF,
        CountVectorizer,
        IndexToString,
        StopWordsRemover,
        StringIndexer,
        Tokenizer,
        VectorAssembler,
    )
    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.functions.text import emoji_counts, word_count_expr
    from reddit_can_bigdata_spark.ml.sentiment import lexicon_score, train_sentiment

    # --- old form: three full pipelines, re-fitting the feature stages ---
    _, _, emoji_score = emoji_counts(F.col("text"))
    labeled = (
        lexicon_score(docs, "text")
        .withColumn("text_length", F.length("text").cast("double"))
        .withColumn("word_count", word_count_expr(F.col("text")).cast("double"))
        .withColumn("emoji_score", emoji_score.cast("double"))
    )
    numeric = ["text_length", "word_count", "emoji_score", "pos_hits", "neg_hits"]
    base = [
        Tokenizer(inputCol="text", outputCol="tokens"),
        StopWordsRemover(inputCol="tokens", outputCol="filtered"),
        CountVectorizer(inputCol="filtered", outputCol="tf", vocabSize=2000, minDF=2.0),
        IDF(inputCol="tf", outputCol="tfidf"),
        StringIndexer(inputCol="lex_label", outputCol="label", handleInvalid="keep"),
        VectorAssembler(
            inputCols=["tfidf"] + numeric, outputCol="features", handleInvalid="skip"
        ),
    ]
    classifiers = {
        "logistic_regression": LogisticRegression(maxIter=100, regParam=0.01),
        "random_forest": RandomForestClassifier(numTrees=50, maxDepth=10, seed=42),
        "naive_bayes": NaiveBayes(smoothing=1.0),
    }
    train, test = labeled.randomSplit([0.8, 0.2], seed=42)
    evaluator = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    )
    best_name, best_acc, best_model = "", -1.0, None
    for mname, clf in classifiers.items():
        model = Pipeline(stages=base + [clf]).fit(train)
        acc = evaluator.evaluate(model.transform(test))
        if acc > best_acc:
            best_name, best_acc, best_model = mname, acc, model
    full = best_model.transform(labeled)
    labels = best_model.stages[4].labelsArray[0]
    old_preds = (
        IndexToString(inputCol="prediction", outputCol="ml_prediction", labels=list(labels))
        .transform(full)
        .select(F.col("doc_id").alias("id"), "lex_label", "ml_prediction")
    )

    # --- new form: shared feature fit inside train_sentiment ---
    res = train_sentiment(docs)

    assert res.model_name == best_name
    assert res.accuracy == pytest.approx(best_acc, abs=1e-12)
    old_rows = sorted(map(tuple, old_preds.collect()))
    new_rows = sorted(map(tuple, res.predictions.collect()))
    assert old_rows == new_rows


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
