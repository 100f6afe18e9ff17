"""LDA topic-model invariants (the reference declares a topic-model
service but ships no code; Spark ML's LDA closes it)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def topics_result(spark, sf_dir):
    from reddit_can_bigdata_spark.ml.topics import fit_topics
    from reddit_can_bigdata_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    return fit_topics(docs), docs.count()


def test_topics_structure(topics_result):
    from reddit_can_bigdata_spark.ml.topics import N_TOPICS

    res, n_docs = topics_result
    rows = res.topics.collect()
    assert len(rows) == N_TOPICS
    for r in rows:
        assert len(r["terms"]) == len(r["termWeights"]) == 10
        assert all(t in res.vocab for t in r["terms"])
        assert all(w > 0 for w in r["termWeights"])


def test_doc_topic_distributions_are_simplex(topics_result):
    from reddit_can_bigdata_spark.ml.topics import N_TOPICS

    res, n_docs = topics_result
    rows = res.doc_topics.collect()
    assert len(rows) == n_docs
    for r in rows[:50]:
        dist = r["topic_distribution"].toArray()
        assert len(dist) == N_TOPICS
        assert abs(sum(dist) - 1.0) < 1e-6
        assert all(p >= 0 for p in dist)


def test_fit_is_seeded_reproducible(spark, sf_dir):
    """Same seed + same data + same partitioning => same top terms."""
    from reddit_can_bigdata_spark.ml.topics import fit_topics
    from reddit_can_bigdata_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"].coalesce(2).cache()
    docs.count()
    a = fit_topics(docs)
    b = fit_topics(docs)
    ta = [(r["topic"], tuple(r["terms"])) for r in a.topics.collect()]
    tb = [(r["topic"], tuple(r["terms"])) for r in b.topics.collect()]
    assert ta == tb
