"""Tests for cohort retention, built-in session_window parity, and
hard-negative mining. Oracle parity runs in test_oracle_parity.py;
these pin semantics the hash can't explain."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from reddit_can_bigdata_spark.operators.common import tables
from reddit_can_bigdata_spark.operators.similarity import (
    HARDNEG_ANCHOR_MOD,
    HARDNEG_K,
    sim_hard_negatives,
)
from reddit_can_bigdata_spark.operators.timeseries import (
    cohort_retention,
    session_window_agg,
)


def test_cohort_week0_retention_is_full(spark, sf_dir):
    rows = cohort_retention(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.week_offset
        assert 0 < r.n_active <= r.cohort_size
        assert abs(r.retention - r.n_active / r.cohort_size) < 1e-6
        if r.week_offset == 0:
            # every cohort member is by definition active in week 0
            assert r.n_active == r.cohort_size and r.retention == 1.0
    # retention within a cohort never exceeds week 0
    assert any(r.week_offset == 0 for r in rows)


def test_session_window_exact_gap_merges(spark):
    """Spark closes a session at last+gap INCLUSIVE: an event at
    exactly the 30-min boundary merges; one microsecond past splits.
    This pins the `> gap` convention the oracle twin uses (same as
    the manual sessionize_events)."""
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t0, 1.0),
            (1, t0 + timedelta(minutes=30), 1.0),  # exactly gap -> merge
            (2, t0, 1.0),
            (2, t0 + timedelta(minutes=30, microseconds=1), 1.0),  # past
        ],
        ["user_id", "ts", "value"],
    )
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select("user_id", "n")
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n)
    assert per_user[1] == [2], "exact-gap event must merge"
    assert sorted(per_user[2]) == [1, 1], "past-gap event must split"


def test_session_window_totals_conserve_events(spark, sf_dir):
    out = session_window_agg(spark, sf_dir)
    n_events = out.agg(F.sum("n_events")).collect()[0][0]
    raw = tables(spark, sf_dir)["events"].count()
    assert n_events == raw, "every event lands in exactly one session"
    assert out.where(F.col("n_events") <= 0).count() == 0


def test_hard_negatives_golden(spark, sf_dir):
    rows = sim_hard_negatives(spark, sf_dir).collect()
    emb = tables(spark, sf_dir)["embeddings"].collect()
    vecs = {r.vec_id: (r.label, r.embedding) for r in emb}
    anchors = {i: v for i, v in vecs.items() if i % HARDNEG_ANCHOR_MOD == 0}
    assert rows and anchors

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    by_anchor: dict[int, list] = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == set(anchors)
    for aid, got in by_anchor.items():
        alabel, av = anchors[aid]
        # labels must differ and ranks must be 1..k in cosine order
        got.sort(key=lambda r: r.rn)
        assert [r.rn for r in got] == list(range(1, len(got) + 1))
        assert all(r.neg_label != alabel for r in got)
        cand = sorted(
            (
                (-cos(av, v), vid)
                for vid, (lbl, v) in vecs.items()
                if lbl != alabel
            ),
        )[:HARDNEG_K]
        assert [vid for _, vid in cand] == [r.neg_id for r in got]
        for (negc, _), r in zip(cand, got):
            assert abs(-negc - r.cosine) < 1e-5
