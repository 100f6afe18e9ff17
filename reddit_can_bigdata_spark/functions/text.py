"""Scalar text expressions (SURVEY.md §2.7, F1-F5/F12-ish).

The reference implements text cleaning as row-at-a-time Python UDFs
(`spark-streaming-pyspark/spark_streaming.py:70-81`,
`spark-ml-sentiment/spark_ml_sentiment.py:150-174`). Here every one is
a pure Catalyst expression chain — JVM-side, whole-stage-codegen'd,
~100x cheaper per row than a pickled Python UDF, and the plan stays a
single codegen stage at any scale.

``portable_hash32`` is the engine's cross-engine-stable string hash:
first 8 hex chars of md5 parsed as an unsigned 32-bit integer. md5 is
available and bit-identical in Spark, DuckDB, and Python's hashlib, so
minhash/simhash/fingerprint results can be verified exactly against an
independent SQL oracle (unlike Spark's murmur `hash()`/`xxhash64`).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def portable_hash32(col: Column) -> Column:
    """Deterministic 32-bit hash of a string, identical across engines.

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 8))::BIGINT``.
    Python equivalent: ``int(hashlib.md5(x.encode()).hexdigest()[:8], 16)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# DuckDB twin of portable_hash32, as a SQL fragment template.
PORTABLE_HASH32_SQL = "(('0x' || substr(md5({x}), 1, 8))::BIGINT)"


def clean_text_expr(col: Column) -> Column:
    """F1 clean_text as built-in expressions (no UDF).

    Mirrors the reference semantics at
    `spark-streaming-pyspark/spark_streaming.py:70-81`: lowercase,
    strip URLs, strip @mentions, de-prefix #hashtags, non-word chars
    to space, collapse whitespace, trim. The keep-class is the unicode
    letter class ``\\p{L}`` (plus digits), not ``[a-z]`` — the
    reference's domain is French Reddit text ("équipe", "coupe
    d'afrique") and its UDF keeps ``\\w`` letters; ``\\p{L}`` parses
    identically under Java regex (Spark) and RE2 (DuckDB oracle).
    Patterns avoid capture-group backreferences for the same
    cross-dialect reason.

    Case-mapping convergence: Java's full case mapping expands 'İ'
    (U+0130) to 'i' + U+0307 while DuckDB's utf8proc maps it to plain
    'i' — Unicode SpecialCasing's ONLY lowercase expansion that emits a
    combining mark. Deleting exactly that artifact ('i'+U+0307 -> 'i')
    converges the engines WITHOUT destroying scripts where marks are
    load-bearing letters (Indic matras, Arabic/Hebrew points, which an
    earlier blanket ``\\p{M}`` delete silently mangled). Marks are also
    in the keep-class, so NFD text ('e'+U+0301) survives as-is —
    identically in both engines, since neither normalizes.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, "i̇", "i")
    c = F.regexp_replace(c, r"http\S+|www\S+", " ")
    c = F.regexp_replace(c, r"@\w+", " ")
    c = F.regexp_replace(c, r"#", "")
    c = F.regexp_replace(c, r"[^\p{L}\p{M}0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


# The same chain as DuckDB SQL (RE2, 'g' flag for replace-all).
CLEAN_TEXT_SQL = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(lower({x}), 'i\\x{{0307}}', 'i', 'g'),"
    " 'http\\S+|www\\S+', ' ', 'g'),"
    " '@\\w+', ' ', 'g'),"
    " '#', '', 'g'),"
    " '[^\\p{{L}}\\p{{M}}0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


def word_count_expr(col: Column) -> Column:
    """F5 word_count = size(split(text, ' ')) (reference
    `spark-streaming-pyspark/spark_streaming.py:92`)."""
    return F.size(F.split(col, " "))


# F12: emoji sentiment features. The reference counts occurrences of
# fixed emoji lists with a Python UDF (`spark-ml-sentiment/
# spark_ml_sentiment.py:88-101`); here the count is a pure expression:
# sum over the list of per-emoji occurrence counts, computed via the
# length-difference trick — one codegen stage, no Python worker.
POSITIVE_EMOJI = ("😀", "😂", "❤️", "🔥", "👍", "🏆")
NEGATIVE_EMOJI = ("😢", "😡", "👎", "💔", "😞")


def _occurrence_count(col: Column, needle: str) -> Column:
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle))))
        / F.length(F.lit(needle))
    ).cast("int")


def emoji_counts(col: Column) -> tuple[Column, Column, Column]:
    """Returns (positive_emojis, negative_emojis, emoji_score=pos-neg)
    column expressions (F12 semantics)."""
    pos = sum((_occurrence_count(col, e) for e in POSITIVE_EMOJI), F.lit(0))
    neg = sum((_occurrence_count(col, e) for e in NEGATIVE_EMOJI), F.lit(0))
    return pos, neg, (pos - neg)
