"""Scalar-function unit tests (F1/F5/F12, O7, portable hash)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_portable_hash32_matches_python(spark):
    from reddit_can_bigdata_spark.functions.text import portable_hash32

    words = ["abc", "hello world", "éàç", ""]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", portable_hash32(F.col("s")).alias("h")).collect()}
    for w in words:
        assert got[w] == int(hashlib.md5(w.encode()).hexdigest()[:8], 16)


def test_emoji_counts(spark):
    from reddit_can_bigdata_spark.functions.text import emoji_counts

    df = spark.createDataFrame(
        [("great 😀😀 win 🏆",), ("sad 😢 day 💔💔",), ("plain text",)], "t string"
    )
    pos, neg, score = emoji_counts(F.col("t"))
    rows = df.select(pos.alias("p"), neg.alias("n"), score.alias("s")).collect()
    assert (rows[0]["p"], rows[0]["n"], rows[0]["s"]) == (3, 0, 3)
    assert (rows[1]["p"], rows[1]["n"], rows[1]["s"]) == (0, 3, -3)
    assert (rows[2]["p"], rows[2]["n"], rows[2]["s"]) == (0, 0, 0)


def test_clean_text_idempotent_and_plain(spark):
    from reddit_can_bigdata_spark.functions.text import clean_text_expr

    df = spark.createDataFrame(
        [("Check http://x.co/a @user #Tag!! Multi  space",)], "t string"
    )
    once = df.select(clean_text_expr(F.col("t")).alias("c"))
    row = once.collect()[0]
    assert row["c"] == "check tag multi space"
    twice = once.select(clean_text_expr(F.col("c")).alias("c")).collect()[0]
    assert twice["c"] == row["c"]  # idempotent


def test_clean_text_keeps_unicode_letters(spark):
    """The reference's domain is French CAN-2025 text; its UDF keeps
    \\w letters, so accented letters must survive cleaning (the keep
    class is \\p{L}, not [a-z])."""
    from reddit_can_bigdata_spark.functions.text import clean_text_expr

    df = spark.createDataFrame(
        [("L'Équipe du Sénégal a GAGNÉ!! #CAN2025 ça va 😀",)], "t string"
    )
    row = df.select(clean_text_expr(F.col("t")).alias("c")).collect()[0]
    assert row["c"] == "l équipe du sénégal a gagné can2025 ça va"


def test_o7_random_split_deterministic_with_seed(spark, sf_dir):
    """O7: randomSplit(seed=42) mirrors the reference's 80/20 split
    (`spark-ml-sentiment/spark_ml_sentiment.py:208`) — same seed, same
    partitioning => same split on repeated runs."""
    from reddit_can_bigdata_spark.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    a1, b1 = docs.randomSplit([0.8, 0.2], seed=42)
    a2, b2 = docs.randomSplit([0.8, 0.2], seed=42)
    ids = lambda d: sorted(r["doc_id"] for r in d.select("doc_id").collect())  # noqa: E731
    assert ids(a1) == ids(a2)
    assert ids(b1) == ids(b2)
    assert a1.count() + b1.count() == docs.count()
    assert set(ids(a1)).isdisjoint(ids(b1))


def test_pii_redaction_positive_path(spark):
    """The registered query proves the no-PII negative on the corpus;
    this pins the positive path — emails/phones actually get replaced
    and counted, identically in Spark and DuckDB."""
    import duckdb
    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.operators.textstats import _PII_EMAIL, _PII_PHONE

    rows = [
        (1, "contact me at alice.smith+spam@example.co.uk for details"),
        (2, "call 555-867-5309 or 555.123.4567 now"),
        (3, "mixed: bob@test.io and 111-222-3333"),
        (4, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    got = {
        r["doc_id"]: (r["red"], r["ne"], r["np"])
        for r in df.select(
            "doc_id",
            redacted.alias("red"),
            F.regexp_count("text", F.lit(_PII_EMAIL)).alias("ne"),
            F.regexp_count("text", F.lit(_PII_PHONE)).alias("np"),
        ).collect()
    }
    assert got[1] == ("contact me at <EMAIL> for details", 1, 0)
    assert got[2] == ("call <PHONE> or <PHONE> now", 0, 2)
    assert got[3] == ("mixed: <EMAIL> and <PHONE>", 1, 1)
    assert got[4] == ("clean text with no identifiers at all", 0, 0)

    con = duckdb.connect()
    for did, text in rows:
        duck_red, duck_ne, duck_np = con.execute(
            f"""SELECT regexp_replace(regexp_replace(?, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_PHONE}', '<PHONE>', 'g'),
                   len(regexp_extract_all(?, '{_PII_EMAIL}')),
                   len(regexp_extract_all(?, '{_PII_PHONE}'))""",
            [text, text, text],
        ).fetchone()
        assert (duck_red, duck_ne, duck_np) == got[did], (did, duck_red)
