"""Dashboard-analytics parity: every analytics.py function vs an
independent pandas recomputation on the synthetic domain fixtures
(pandas plays the oracle role the reference's dashboard actually ran
in)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_can_bigdata_spark import analytics as A


@pytest.fixture(scope="module")
def domain(spark):
    from reddit_can_bigdata_spark.sources.reddit import synthetic_posts_comments

    posts, comments = synthetic_posts_comments(spark)
    return posts.cache(), comments.cache(), posts.toPandas(), comments.toPandas()


def test_kpi_row(domain):
    posts, comments, pp, cp = domain
    row = A.kpi_row(posts, comments).collect()[0]
    assert row["n_posts"] == len(pp)
    assert row["n_comments"] == len(cp)
    assert row["n_authors"] == pp["author"].nunique()
    assert row["total_score"] == int(pp["score"].sum())
    assert row["avg_score"] == pytest.approx(pp["score"].mean())


def test_posts_timeline(domain):
    posts, _, pp, _ = domain
    got = {r["day"]: r["n_posts"] for r in A.posts_timeline(posts).collect()}
    days = pp["created_utc"].astype("int64").map(
        lambda s: dt.datetime.fromtimestamp(s, dt.timezone.utc).strftime("%Y-%m-%d")
    )
    expected = days.value_counts().to_dict()
    assert got == expected


def test_top_subreddits(domain):
    posts, _, pp, _ = domain
    got = [(r["subreddit"], r["n_posts"]) for r in A.top_subreddits(posts, n=3).collect()]
    vc = pp["subreddit"].value_counts()
    expected = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == [(k, v) for k, v in expected]


def test_engagement_buckets(domain):
    posts, _, pp, _ = domain
    got = {r["bucket"]: r["n_posts"] for r in A.engagement_buckets(posts).collect()}
    s = pp["score"]
    expected = {
        "viral": int((s > 100).sum()),
        "high": int(((s > 50) & (s <= 100)).sum()),
        "medium": int(((s > 10) & (s <= 50)).sum()),
        "low": int((s <= 10).sum()),
    }
    assert got == {k: v for k, v in expected.items() if v > 0}


def test_quantile_insights(domain):
    posts, _, pp, _ = domain
    row = A.quantile_insights(posts).collect()[0]
    assert row["score_p25"] == pytest.approx(pp["score"].quantile(0.25))
    assert row["score_p90"] == pytest.approx(pp["score"].quantile(0.9))
    assert row["comments_p90"] == pytest.approx(pp["num_comments"].quantile(0.9))


def test_weekday_histogram_zero_fill(domain):
    posts, _, pp, _ = domain
    rows = A.weekday_histogram(posts).collect()
    assert len(rows) == 7  # all weekdays present even if zero
    got = {r["weekday"]: r["n_posts"] for r in rows}
    wd = pp["created_utc"].astype("int64").map(
        lambda s: dt.datetime.fromtimestamp(s, dt.timezone.utc).strftime("%A")
    )
    expected = wd.value_counts().to_dict()
    for day in got:
        assert got[day] == expected.get(day, 0)


def test_country_mentions(domain):
    posts, _, pp, _ = domain
    got = {r["country"]: r["occurrences"] for r in A.country_mentions(posts).collect()}
    text = (pp["title"].fillna("") + " " + pp["selftext"].fillna("")).str.lower()
    for c in ("morocco", "maroc", "senegal", "nigeria"):
        assert got[c] == int(text.str.count(c).sum()), c


def test_interactive_posts(domain):
    posts, _, pp, _ = domain
    got = A.interactive_posts(posts, subreddit="soccer", min_score=50, n=5).collect()
    f = pp[(pp["subreddit"] == "soccer") & (pp["score"] >= 50)]
    expected = f.sort_values(["score", "id"], ascending=[False, True]).head(5)
    assert [r["id"] for r in got] == list(expected["id"])


def test_sentiment_distribution_and_divergence(spark, domain):
    posts, _, _, _ = domain
    from reddit_can_bigdata_spark.ml.sentiment import lexicon_score

    # fabricate an ml_prediction column that flips some labels
    scored = lexicon_score(posts, text_col="title").withColumn(
        "ml_prediction",
        F.when(F.col("score") % 7 == 0, F.lit("positive")).otherwise(F.col("lex_label")),
    )
    dist = {r["label"]: r["cnt"] for r in A.sentiment_distribution(scored).collect()}
    assert sum(dist.values()) == posts.count()
    div = A.label_divergence(scored)
    assert div.where(F.col("lex_label") == F.col("ml_prediction")).count() == 0


def test_influencers_and_community_rollup(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.influencer import user_network_table

    un = user_network_table(spark, sf_dir).cache()
    top = A.top_influencers(un, n=5).collect()
    assert [r["influencer_rank"] for r in top] == list(range(1, len(top) + 1))
    roll = A.community_rollup(un).collect()
    assert sum(r["members"] for r in roll) == un.count()


def test_table_checksum_is_partitioning_independent(spark, sf_dir):
    """The reconciliation checksum must be identical under any
    physical layout — that is its entire value. Recompute over a
    shuffled 17-partition copy of lineitem and compare all three
    fields."""
    import shutil
    import tempfile

    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY["table_checksum_lineitem"].fn
    base = fn(spark, sf_dir).collect()[0]

    tmp = tempfile.mkdtemp()
    try:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(
            17
        ).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
        alt = fn(spark, tmp).collect()[0]
        assert tuple(base) == tuple(alt), (base, alt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_topk_ties_keeps_every_row_at_the_boundary(spark, tmp_path):
    """Constructed k-th-place tie: with k=3 and three orders tied at
    the 3rd-highest price, ALL of them must be kept (5 rows out, not
    3) — the rank() semantics a row_number cap would break."""
    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "1-URGENT", 100.0),
            (2, "1-URGENT", 90.0),
            (3, "1-URGENT", 80.0),
            (4, "1-URGENT", 80.0),
            (5, "1-URGENT", 80.0),
            (6, "1-URGENT", 10.0),
        ],
        "o_orderkey bigint, o_orderpriority string, o_totalprice double",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    rows = REGISTRY["topk_per_group_ties"].fn(spark, d).collect()
    assert sorted(r["o_orderkey"] for r in rows) == [1, 2, 3, 4, 5], rows
