"""Round-8 extension of the independent-definition battery
(tests/test_definitional.py): third implementations in plain
pandas/Python for the queries added this round — the dashboard serving
variants and the e2e pipeline report row. Same doctrine: no SQL, no
Spark expressions, formulas re-derived from the documented definition,
so agreement requires the same bug in three independently-phrased
programs."""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(name: str, spark, sf_dir: str) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_dash_posts_explorer_matches_filter_sort_head(spark, sf_dir):
    """subreddit equality + score floor + score-desc/doc_id-asc head-15,
    word_count = whitespace-split length, preview = first 80 chars."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    picked = docs[(docs.source == "src7") & (docs.n_chars >= 120)].copy()
    picked["word_count"] = picked.text.map(
        lambda t: len(re.split(r"\s+", t.strip()))
    )
    picked["title_preview"] = picked.text.str[:80]
    picked = picked.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).head(15)
    want = [
        (r.doc_id, r.source, r.n_chars, r.word_count, r.title_preview)
        for r in picked.itertuples()
    ]

    got_df = _run("dash_posts_explorer", spark, sf_dir)
    got = [tuple(r) for r in got_df.itertuples(index=False)]
    assert got == want


def test_dash_sentiment_samples_matches_pure_python_vader(spark, sf_dir):
    """Labels from the pure-Python VADER reference (same published rule
    set, independent of both the Spark expression chain and the DuckDB
    twin), strongest-|compound|-first with doc_id tiebreak, head-5."""
    from reddit_can_bigdata_spark.functions.vader import vader_compound_py

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for r in docs.itertuples():
        c = round(vader_compound_py(r.text), 6) + 0.0  # -0.0 -> +0.0
        label = (
            "positive" if c >= 0.05 else "negative" if c <= -0.05 else "neutral"
        )
        if label == "positive":
            rows.append((r.doc_id, c, label))
    rows.sort(key=lambda t: (-abs(t[1]), t[0]))
    want = rows[:5]

    got_df = _run("dash_sentiment_samples", spark, sf_dir)
    got = [
        (r.doc_id, round(r.compound, 6), r.vader_label)
        for r in got_df.itertuples()
    ]
    assert got == want


def test_dash_stats_timeline_matches_decimal_rollup(spark, sf_dir):
    """[start, end) day/type counts; total_value re-derived with exact
    decimal arithmetic mirroring the documented cast-to-DECIMAL(20,6)
    HALF_UP sum, rounded half-up to 4dp."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = pd.to_datetime(ev.ts)
    lo, hi = pd.Timestamp("2024-01-10"), pd.Timestamp("2024-01-20")
    ev = ev[(ts >= lo) & (ts < hi)].copy()
    ev["day"] = pd.to_datetime(ev.ts).dt.strftime("%Y-%m-%d")

    want = {}
    for (day, et), grp in ev.groupby(["day", "event_type"]):
        total = sum(
            (
                Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                for v in grp.value
            ),
            Decimal(0),
        )
        want[(day, et)] = (
            len(grp),
            float(total.quantize(Decimal("0.0001"), ROUND_HALF_UP)),
        )

    got_df = _run("dash_stats_timeline", spark, sf_dir)
    got = {
        (r.day, r.event_type): (r.cnt, round(r.total_value, 4))
        for r in got_df.itertuples()
    }
    assert got == want
    assert got  # the fixture range is non-empty


def test_pipeline_e2e_report_matches_first_principles(spark, sf_dir):
    """The e2e report row re-derived from raw parquet: aggregates,
    DAG branch thresholds (50/30), sentiment_results = ETL-filtered
    count when ML runs, coverage 100.0/0.0, network_users =
    min(20, |graph nodes|) where nodes come from the co-order supplier
    graph (u<v canonical pairs) when the network gate passes."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    events = pd.read_parquet(f"{sf_dir}/events.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ].drop_duplicates()

    posts, comments = len(docs), len(events)
    processed = int((docs.text.str.len() > 20).sum())
    unique_users = int(events.user_id.nunique())
    ml = processed >= 50
    net = unique_users >= 30

    nodes = set()
    for _, grp in li.groupby("l_orderkey"):
        ks = sorted(grp.l_suppkey)
        if len(ks) > 1:
            nodes.update(ks)
    want = (
        posts,
        comments,
        processed,
        unique_users,
        "run_ml_analysis" if ml else "skip_ml",
        "run_network_analysis" if net else "skip_network",
        processed if ml else 0,
        100.0 if (ml and processed) else 0.0,
        min(20, len(nodes)) if net else 0,
    )

    got_df = _run("pipeline_e2e", spark, sf_dir)
    assert len(got_df) == 1
    got = tuple(got_df.iloc[0])
    assert got == want
