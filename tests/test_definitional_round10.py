"""Round-10 extension of the independent-definition battery: plain
pandas/Python third implementations for the queries added this round —
the incremental day-ingest layout and the Z-order pruned scan. Same
doctrine as tests/test_definitional.py: no SQL, no Spark expressions,
formulas re-derived from the documented definition, so agreement
requires the same bug in three independently-phrased programs."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(name: str, spark, sf_dir: str) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


def _dec_sum_round4(values) -> float:
    q6 = Decimal("0.000001")
    total = sum(
        (Decimal(repr(v)).quantize(q6, rounding=ROUND_HALF_UP) for v in values),
        Decimal(0),
    )
    return float(total.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def test_incremental_ingest_matches_hand_rollup(spark, sf_dir):
    """History (< 2024-01-15) plus the ingested day (the 15th) served
    over [2024-01-12, 2024-01-16): by hand this is simply the source
    rows in that window — ingest must add the day exactly once and
    lose nothing."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(subset=["ts"])
    win = ev[
        (ev.ts >= pd.Timestamp("2024-01-12")) & (ev.ts < pd.Timestamp("2024-01-16"))
    ].copy()
    win["day"] = win.ts.dt.strftime("%Y-%m-%d")
    want = {
        (day, et): (len(g), _dec_sum_round4(g.value))
        for (day, et), g in win.groupby(["day", "event_type"])
    }
    got_df = _run("layout_incremental_ingest", spark, sf_dir)
    got = {
        (r.day, r.event_type): (r.cnt, r.total_value)
        for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_zorder_pruned_scan_matches_hand_filter(spark, sf_dir):
    """The two-column predicate by hand on the pristine source: the
    Z-ordered physical layout must be invisible to the result."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    hit = ev[
        ev.user_id.between(3, 4) & ev.value.between(10.0, 30.0)
    ]
    want = {
        et: (len(g), _dec_sum_round4(g.value))
        for et, g in hit.groupby("event_type")
    }
    got_df = _run("layout_zorder_pruned_scan", spark, sf_dir)
    got = {
        r.event_type: (r.cnt, r.total_value)
        for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_crash_recovery_matches_hand_rollup(spark, sf_dir):
    """The recovered (promoted) generation must serve exactly the
    source rollup — by hand: per event_type count, distinct users,
    decimal-summed value."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = {
        et: (len(g), g.user_id.dropna().nunique(), _dec_sum_round4(g.value))
        for et, g in ev.groupby("event_type")
    }
    got_df = _run("maint_crash_recovery", spark, sf_dir)
    got = {
        r.event_type: (r.cnt, r.n_users, r.total_value)
        for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_pyds_manifest_stream_matches_hand_rollup(spark, sf_dir):
    """The grown-manifest streaming round trip must equal the plain
    per-language rollup of the source table, computed by hand."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {
        lang: (len(g), int(g.n_chars.fillna(0).sum()))
        for lang, g in docs.groupby("lang")
    }
    got_df = _run("streaming_pyds_manifest", spark, sf_dir)
    got = {
        r.subreddit: (r.cnt, r.total_score)
        for r in got_df.itertuples(index=False)
    }
    assert got == want


def test_bucketed_join_matches_hand_rollup(spark, sf_dir):
    """The bucketed-layout join must serve exactly the plain pandas
    merge rollup — bucketing moves bytes, never rows."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    lineitem = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    j = lineitem.merge(
        orders[["o_orderkey", "o_orderstatus"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    want = {
        st: (len(g), _dec_sum_round4(g.l_extendedprice))
        for st, g in j.groupby("o_orderstatus")
    }
    got_df = _run("layout_bucketed_join", spark, sf_dir)
    got = {
        r.o_orderstatus: (r.n_items, r.total_price)
        for r in got_df.itertuples(index=False)
    }
    assert got == want
