"""Dashboard analytics (SURVEY.md §3.3): the reference's query surface
as named Spark functions over the domain tables.

`dashboard/dashboard.py` loads whole MongoDB collections into pandas
and runs ~30 eager computations per page load. This module is the
swap-in replacement: each chart/KPI is a function taking the relevant
DataFrames (posts / comments / sentiments / user_network — batch or
streaming-produced, any size) and returning a DataFrame plan. Column
citations point at the pandas code each function re-expresses.

Tested against independent pandas recomputation on the synthetic
fixtures (tests/test_analytics.py) — same oracle idea as the
registry, with pandas in DuckDB's role for domain-shaped inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kpi_row(posts: DataFrame, comments: DataFrame) -> DataFrame:
    """Home KPIs (`dashboard/dashboard.py:216-248`): post/comment
    counts, unique authors, total and average score."""
    p = posts.agg(
        F.count("*").alias("n_posts"),
        F.countDistinct("author").alias("n_authors"),
        F.sum("score").alias("total_score"),
        (F.sum("score").cast("double") / F.count("*")).alias("avg_score"),
    )
    c = comments.agg(F.count("*").alias("n_comments"))
    return p.crossJoin(c)


def posts_timeline(posts: DataFrame) -> DataFrame:
    """A3 (`dashboard/dashboard.py:259-260`): posts per day."""
    return (
        posts.groupBy(
            F.date_format(F.to_timestamp(F.from_unixtime(F.col("created_utc").cast("long"))), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count("*").alias("n_posts"))
    )


def top_subreddits(posts: DataFrame, n: int = 8) -> DataFrame:
    """A2+W4 (`dashboard/dashboard.py:276`): subreddit value_counts,
    head(n), deterministic tie-break."""
    return (
        posts.groupBy("subreddit")
        .agg(F.count("*").alias("n_posts"))
        .orderBy(F.desc("n_posts"), F.asc("subreddit"))
        .limit(n)
    )


def sentiment_distribution(sentiments: DataFrame, col: str = "ml_prediction") -> DataFrame:
    """A2 (`dashboard/dashboard.py:701`): label distribution."""
    return sentiments.groupBy(F.col(col).alias("label")).agg(F.count("*").alias("cnt"))


def label_divergence(sentiments: DataFrame) -> DataFrame:
    """P10 (`spark-ml-sentiment/spark_ml_sentiment.py:424`): rows where
    the lexicon and ML labels disagree."""
    return sentiments.where(F.col("lex_label") != F.col("ml_prediction"))


def engagement_buckets(posts: DataFrame) -> DataFrame:
    """A10 (`dashboard/dashboard.py:840-845`): score histogram buckets
    in one pass."""
    bucket = (
        F.when(F.col("score") > 100, "viral")
        .when(F.col("score") > 50, "high")
        .when(F.col("score") > 10, "medium")
        .otherwise("low")
    )
    return posts.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n_posts"))


def quantile_insights(posts: DataFrame) -> DataFrame:
    """A9 (`dashboard/dashboard.py:955-1006`): score/comment quantiles."""
    return posts.agg(
        F.percentile("score", F.lit(0.25)).alias("score_p25"),
        F.percentile("score", F.lit(0.75)).alias("score_p75"),
        F.percentile("score", F.lit(0.9)).alias("score_p90"),
        F.percentile("num_comments", F.lit(0.9)).alias("comments_p90"),
    )


def weekday_histogram(posts: DataFrame) -> DataFrame:
    """F11 (`dashboard/dashboard.py:1020-1041`): posts per weekday with
    zero-fill via a 7-row weekday dimension (the reference reindexes in
    pandas)."""
    spark = posts.sparkSession
    weekdays = spark.createDataFrame(
        [(d,) for d in ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]],
        "weekday string",
    )
    counts = (
        posts.groupBy(
            F.date_format(
                F.to_timestamp(F.from_unixtime(F.col("created_utc").cast("long"))), "EEEE"
            ).alias("weekday")
        )
        .agg(F.count("*").alias("n_posts"))
    )
    return (
        F.broadcast(weekdays)
        .join(counts, "weekday", "left")
        .select("weekday", F.coalesce("n_posts", F.lit(0)).alias("n_posts"))
    )


def country_mentions(posts: DataFrame, countries: tuple[str, ...] = ("morocco", "maroc", "senegal", "nigeria")) -> DataFrame:
    """A12 (`dashboard/dashboard.py:1047-1057`): total occurrences per
    country name over title+selftext — distributed, not a driver-side
    corpus concat."""
    text = F.lower(F.concat_ws(" ", F.col("title"), F.coalesce(F.col("selftext"), F.lit(""))))
    words = F.explode(F.array(*[F.lit(c) for c in countries])).alias("country")
    occ = (
        (F.length("_t") - F.length(F.replace(F.col("_t"), F.col("country"))))
        / F.length("country")
    ).cast("long")
    return (
        posts.select(text.alias("_t"), words)
        .select("country", occ.alias("occ"))
        .groupBy("country")
        .agg(F.sum("occ").alias("occurrences"))
    )


def interactive_posts(
    posts: DataFrame,
    subreddit: str | None = None,
    min_score: int | None = None,
    sort_by: str = "score",
    n: int = 15,
) -> DataFrame:
    """P7+P8+O1+W4 (`dashboard/dashboard.py:788-801`): the interactive
    filter/sort/head block, parameterized."""
    out = posts
    if subreddit is not None:
        out = out.where(F.col("subreddit") == subreddit)
    if min_score is not None:
        out = out.where(F.col("score") >= min_score)
    return out.orderBy(F.desc(sort_by), F.asc("id")).limit(n)


def top_influencers(user_network: DataFrame, n: int = 10) -> DataFrame:
    """W3+P9 (`dashboard/dashboard.py:338,391`): ranked influencer
    head(n)."""
    return (
        user_network.where(F.col("is_influencer"))
        .orderBy(F.asc("influencer_rank"))
        .limit(n)
    )


def community_rollup(user_network: DataFrame) -> DataFrame:
    """A4 (`dashboard/dashboard.py:463-470`): per-community member
    count, average degree, total weighted degree."""
    return (
        user_network.groupBy("community_id")
        .agg(
            F.count("*").alias("members"),
            (F.sum("degree").cast("double") / F.count("*")).alias("avg_degree"),
            F.sum("weighted_degree").alias("total_weighted_degree"),
        )
    )
