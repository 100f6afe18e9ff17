"""Topic modeling (LDA) — declared in the reference's compose stack
but never implemented (`docker-compose.yml:319-337` defines a
topic-modeling service with no code behind it). Spark ML ships LDA,
so the engine closes the gap with the idiomatic pipeline:

    Tokenizer → StopWordsRemover → CountVectorizer → LDA(k, seed)

Scale: LDA's online optimizer is mini-batch EM over the corpus —
executor-parallel, no driver materialization; the topic matrix is
k × vocab (tiny). Seeded, so topic assignments are reproducible on
identical partitioning; tests assert structural invariants (topic
count, vocabulary coverage, probability simplex) rather than exact
word-topic allocations, which no two LDA runs across libraries share.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

N_TOPICS = 5
VOCAB_SIZE = 500


@dataclass
class TopicsResult:
    topics: DataFrame  # topic, term_indices, terms, term_weights
    doc_topics: DataFrame  # doc_id, topic_distribution (vector)
    vocab: list[str]
    log_perplexity: float


def fit_topics(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = N_TOPICS,
    seed: int = 42,
) -> TopicsResult:
    """Fit LDA over a document table; returns per-topic top terms and
    per-document topic mixtures."""
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer, StopWordsRemover, Tokenizer

    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="tokens"),
            StopWordsRemover(inputCol="tokens", outputCol="filtered"),
            CountVectorizer(
                inputCol="filtered", outputCol="tf", vocabSize=VOCAB_SIZE, minDF=2.0
            ),
            LDA(k=k, seed=seed, maxIter=10, featuresCol="tf"),
        ]
    )
    model = pipe.fit(docs)
    cv, lda = model.stages[2], model.stages[3]
    vocab = list(cv.vocabulary)
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    topics = lda.describeTopics(maxTermsPerTopic=10).select(
        "topic",
        "termIndices",
        F.transform(
            F.col("termIndices"), lambda i: F.element_at(vocab_arr, i + 1)
        ).alias("terms"),
        "termWeights",
    )
    transformed = model.transform(docs)
    doc_topics = transformed.select(
        F.col(id_col), F.col("topicDistribution").alias("topic_distribution")
    )
    lp = float(lda.logPerplexity(transformed.select("tf")))
    return TopicsResult(topics, doc_topics, vocab, lp)
