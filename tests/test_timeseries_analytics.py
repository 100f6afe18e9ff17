"""Invariant tests for the round-4 time-series/event analytics:
gap-fill interpolation, truncated-EWMA anomaly scoring, and the
ordered funnel. Exact oracle parity is covered by
test_oracle_parity.py; these pin the semantic properties a hash
can't explain."""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import functions as F

from reddit_can_bigdata_spark.operators.timeseries import (
    EWMA_TERMS,
    FUNNEL_STAGES,
    ewma_anomaly_daily,
    funnel_conversion,
    gapfill_interpolate_daily,
)


def test_gapfill_spine_is_dense_per_user(spark, sf_dir):
    rows = gapfill_interpolate_daily(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user, "no users in gapfill output"
    for _user, urows in by_user.items():
        days = sorted(date.fromisoformat(r.day) for r in urows)
        # dense: every day between min and max present exactly once
        assert len(set(days)) == len(days)
        assert days[-1] - days[0] == timedelta(days=len(days) - 1)


def test_gapfill_interpolation_between_neighbors(spark, sf_dir):
    rows = gapfill_interpolate_daily(spark, sf_dir).collect()
    by_user: dict[int, dict] = {}
    for r in rows:
        by_user.setdefault(r.user_id, {})[date.fromisoformat(r.day)] = r
    checked = 0
    for urows in by_user.values():
        days = sorted(urows)
        observed = [d for d in days if not urows[d].is_gap]
        # endpoints are always observed (spine spans min..max observed)
        assert not urows[days[0]].is_gap and not urows[days[-1]].is_gap
        for d in days:
            r = urows[d]
            if not r.is_gap:
                continue
            prev_obs = max(o for o in observed if o < d)
            next_obs = min(o for o in observed if o > d)
            pv = urows[prev_obs].value_filled
            nv = urows[next_obs].value_filled
            frac = (d - prev_obs).days / (next_obs - prev_obs).days
            expected = pv + (nv - pv) * frac
            assert abs(r.value_filled - expected) < 1e-5
            # linear interpolation stays inside the neighbor envelope
            lo, hi = min(pv, nv), max(pv, nv)
            assert lo - 1e-9 <= r.value_filled <= hi + 1e-9
            checked += 1
    assert checked > 0, "fixture produced no gaps; test is vacuous"


def test_ewma_matches_truncated_recursion(spark, sf_dir):
    rows = ewma_anomaly_daily(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        vals = [r.day_value for r in series]
        for i, r in enumerate(series):
            lo = max(0, i - EWMA_TERMS + 1)
            window = vals[lo : i + 1][::-1]  # most recent first
            num = sum(v * 0.5**k for k, v in enumerate(window))
            den = sum(0.5**k for k in range(len(window)))
            assert abs(r.ewma - num / den) < 1e-5
            # flag consistent with the 20% band around the smoothed value
            expect_flag = r.day_value > 1.2 * r.ewma or r.day_value < 0.8 * r.ewma
            assert r.is_anomaly == expect_flag


def test_funnel_counts_monotone_and_ordered(spark, sf_dir):
    rows = sorted(funnel_conversion(spark, sf_dir).collect(), key=lambda r: r.stage_no)
    assert [r.stage for r in rows] == list(FUNNEL_STAGES)
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True), "funnel must be monotone"
    assert rows[0].pct_of_first == 1.0
    assert all(0.0 <= r.pct_of_first <= 1.0 for r in rows)


def test_funnel_requires_strict_ordering(spark, sf_dir):
    """A user whose purchase precedes their click must not convert."""
    out = {r.stage: r.n_users for r in funnel_conversion(spark, sf_dir).collect()}
    # recompute stage-4 users naively in Python from raw events
    from reddit_can_bigdata_spark.operators.common import tables

    ev = (
        tables(spark, sf_dir)["events"]
        .select("user_id", "event_type", F.unix_micros("ts").alias("tus"))
        .collect()
    )
    by_user: dict[int, dict[str, list]] = {}
    for r in ev:
        by_user.setdefault(r.user_id, {}).setdefault(r.event_type, []).append(r.tus)
    n4 = 0
    for types in by_user.values():
        t = None
        ok = True
        for stage in FUNNEL_STAGES:
            cands = [x for x in types.get(stage, []) if t is None or x > t]
            if not cands:
                ok = False
                break
            t = min(cands)
        n4 += ok
    assert out["purchase"] == n4


def test_scd2_intervals_tile_and_single_current(spark, sf_dir):
    """SCD2 invariants: versions are contiguous from 1, intervals
    tile exactly (valid_to == next valid_from), exactly ONE current
    row per user, and zero violations in the dq_audit fixture."""
    from reddit_can_bigdata_spark.operators.extras import (
        dq_audit,
        scd2_user_event_type,
    )

    rows = scd2_user_event_type(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for urows in by_user.values():
        urows.sort(key=lambda r: r.version)
        assert [r.version for r in urows] == list(range(1, len(urows) + 1))
        assert sum(r.is_current for r in urows) == 1
        assert urows[-1].is_current and urows[-1].valid_to_us is None
        for a, b in zip(urows, urows[1:]):
            assert a.valid_to_us == b.valid_from_us, "intervals must tile"
            assert a.event_type != b.event_type, "no-op versions forbidden"

    audit = {r.rule: r for r in dq_audit(spark, sf_dir).collect()}
    assert len(audit) == 5
    for r in audit.values():
        assert r.n_violations == 0, f"fixture violates {r.rule}"
        assert r.n_checked > 0


def test_cusum_detects_front_changepoint(spark, tmp_path, sf_dir):
    """The empty-prefix term (drift_0 = 0): daily counts [9,1,1,1]
    have every prefix drift positive, so a running min WITHOUT the
    virtual zero clamps the statistic to 0 on every row and the day-1
    rate shift is never flagged. True CUSUM: [6, 4, 2, 0] with
    threshold 3*sqrt(3) = 5.196 -> day 1 is a changepoint."""
    import os
    import shutil

    import duckdb

    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded
    from reddit_can_bigdata_spark.tables import TABLE_NAMES

    _ensure_loaded()
    fix = tmp_path / "cusum_fix"
    fix.mkdir()
    for t in TABLE_NAMES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t != "events" and os.path.exists(src):
            shutil.copy(src, fix / f"{t}.parquet")
    con = duckdb.connect()
    rows = []
    eid = 0
    for day, n in enumerate([9, 1, 1, 1], start=1):
        for _ in range(n):
            eid += 1
            rows.append(f"({eid}, TIMESTAMP '2024-01-0{day} 12:00:00', 1, 'click', 1.0, NULL)")
    con.execute(
        "COPY (SELECT * FROM (VALUES " + ", ".join(rows) + ") "
        "v(event_id, ts, user_id, event_type, value, props)) "
        f"TO '{fix}/events.parquet' (FORMAT PARQUET)"
    )
    got = {
        r["day"]: r
        for r in REGISTRY["cusum_changepoint_daily"].fn(spark, str(fix)).collect()
    }
    assert [got[d]["cusum"] for d in sorted(got)] == [6.0, 4.0, 2.0, 0.0]
    assert got["2024-01-01"]["is_change"] is True
    assert all(not got[d]["is_change"] for d in sorted(got)[1:])
    # and the oracle agrees on the same crafted input
    for t in TABLE_NAMES:
        p = fix / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    drows = con.execute(REGISTRY["cusum_changepoint_daily"].oracle).fetchall()
    assert sorted((r[1], r[3], r[4]) for r in drows) == sorted(
        (r["day"], r["cusum"], r["is_change"]) for r in got.values()
    )
