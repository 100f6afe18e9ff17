"""Phase-level wall/cpu/job breakdown of pipeline_e2e (optimization
round 12, guide §1: measure before touching the 22%-of-bench query).

Runs the same stages run_pipeline() runs, but sequentially with a
timer + AppStatusStore delta around each phase, so the per-phase cost
is attributable. The sequential form double-counts nothing; the real
query overlaps the ML and network stages, so the e2e wall is less
than the sum printed here.

Usage: python tools/profile_pipeline.py [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from reddit_can_bigdata_spark.session import DEFAULT_SF_DIR, get_spark
from tools.profile_queries import _Counters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()

    spark = get_spark("profile-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    from reddit_can_bigdata_spark.tables import load_tables

    warm = load_tables(spark, args.sf_dir)
    warm["documents"].count()
    meter = _Counters(spark.sparkContext)

    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.operators.common import tables
    from reddit_can_bigdata_spark.orchestration import (
        MIN_TEXT_LENGTH,
        pipeline_gate_report,
    )

    for rep in range(args.reps):
        print(f"=== rep {rep} ===")

        def phase(name, fn):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            m = meter.delta()
            print(
                f"{name:38s} wall {dt:7.3f}s cpu {m['cpu_s']:7.2f}s"
                f" jobs {m['jobs']:4d} stages {m['stages']:4d} tasks {m['tasks']:5d}"
            )
            return out

        gates = phase(
            "gates", lambda: pipeline_gate_report(spark, args.sf_dir).collect()[0].asDict()
        )

        from pyspark.ml.classification import (
            LogisticRegression,
            NaiveBayes,
            RandomForestClassifier,
        )
        from pyspark.ml.evaluation import MulticlassClassificationEvaluator
        from pyspark.ml import PipelineModel
        from pyspark.ml.feature import (
            IDF,
            CountVectorizer,
            IndexToString,
            StopWordsRemover,
            StringIndexer,
            Tokenizer,
            VectorAssembler,
        )

        from reddit_can_bigdata_spark.functions.text import emoji_counts, word_count_expr
        from reddit_can_bigdata_spark.ml.sentiment import lexicon_score

        docs = tables(spark, args.sf_dir)["documents"].where(
            F.length("text") > MIN_TEXT_LENGTH
        )
        _, _, emoji_score = emoji_counts(F.col("text"))
        labeled = (
            lexicon_score(docs, "text")
            .withColumn("text_length", F.length("text").cast("double"))
            .withColumn("word_count", word_count_expr(F.col("text")).cast("double"))
            .withColumn("emoji_score", emoji_score.cast("double"))
        )
        numeric = ["text_length", "word_count", "emoji_score", "pos_hits", "neg_hits"]
        labeled = labeled.cache()
        phase("labeled cache build (count)", lambda: labeled.count())

        train, test = labeled.randomSplit([0.8, 0.2], seed=42)
        tokenizer = Tokenizer(inputCol="text", outputCol="tokens")
        remover = StopWordsRemover(inputCol="tokens", outputCol="filtered")
        cv = CountVectorizer(inputCol="filtered", outputCol="tf", vocabSize=2000, minDF=2.0)
        idf = IDF(inputCol="tf", outputCol="tfidf")
        indexer = StringIndexer(inputCol="lex_label", outputCol="label", handleInvalid="keep")
        assembler = VectorAssembler(
            inputCols=["tfidf"] + numeric, outputCol="features", handleInvalid="skip"
        )

        toks = remover.transform(tokenizer.transform(train)).cache()
        phase("toks cache build (count)", lambda: toks.count())
        cv_model = phase("cv.fit", lambda: cv.fit(toks))
        idf_model = phase("idf.fit", lambda: idf.fit(cv_model.transform(toks)))
        si_model = phase("indexer.fit", lambda: indexer.fit(train))
        toks.unpersist()
        feat_model = PipelineModel(
            stages=[tokenizer, remover, cv_model, idf_model, si_model, assembler]
        )
        feat_train = feat_model.transform(train).cache()
        feat_test = feat_model.transform(test).cache()
        phase("feat_train materialize", lambda: feat_train.count())
        phase("feat_test materialize", lambda: feat_test.count())

        evaluator = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="accuracy"
        )
        lr_model = phase(
            "LR.fit", lambda: LogisticRegression(maxIter=100, regParam=0.01).fit(feat_train)
        )
        rf_model = phase(
            "RF.fit",
            lambda: RandomForestClassifier(numTrees=50, maxDepth=10, seed=42).fit(feat_train),
        )
        nb_model = phase("NB.fit", lambda: NaiveBayes(smoothing=1.0).fit(feat_train))
        accs = {}
        for nm, mdl in (("lr", lr_model), ("rf", rf_model), ("nb", nb_model)):
            accs[nm] = phase(
                f"evaluate {nm}",
                lambda m=mdl: evaluator.copy().evaluate(m.transform(feat_test)),
            )
        best = max(accs, key=accs.get)
        best_clf = {"lr": lr_model, "rf": rf_model, "nb": nb_model}[best]
        full = best_clf.transform(feat_model.transform(labeled))
        labels = feat_model.stages[4].labelsArray[0]
        to_str = IndexToString(
            inputCol="prediction", outputCol="ml_prediction", labels=list(labels)
        )
        preds = to_str.transform(full).select(
            F.col("doc_id").alias("id"), "lex_label", "ml_prediction"
        )
        phase("agreement agg", lambda: preds.agg(
            (F.sum((F.col("lex_label") == F.col("ml_prediction")).cast("long")) / F.count("*")).alias("r")
        ).collect())
        phase("predictions.count", lambda: preds.count())

        from reddit_can_bigdata_spark.operators.influencer import (
            influencer_composite_top20,
        )

        phase(
            "network stage (top20 count)",
            lambda: influencer_composite_top20(spark, args.sf_dir, closeness_mode=None).count(),
        )
        feat_train.unpersist()
        feat_test.unpersist()
        labeled.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
