"""Accuracy contracts for the sketch-based scale-path aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hll_distinct_within_rsd(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.approx import approx_user_counts
    from reddit_can_bigdata_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    exact = ev.select("user_id").distinct().count()
    approx = approx_user_counts(ev, "user_id").collect()[0]["approx_distinct"]
    assert approx == pytest.approx(exact, rel=0.1)  # 2% rsd target, 10% guard


def test_gk_quantiles_within_error(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.approx import approx_quantiles
    from reddit_can_bigdata_spark.tables import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    n = orders.count()
    got = approx_quantiles(orders, "o_totalprice", [0.5, 0.9], err=0.01)
    vals = sorted(r["o_totalprice"] for r in orders.select("o_totalprice").collect())
    for q, g in zip([0.5, 0.9], got):
        # rank-error contract: the returned value's rank is within n*err
        import bisect

        rank = bisect.bisect_left(vals, g)
        assert abs(rank - q * n) <= max(n * 0.02, 2)


def test_count_min_sketch_one_sided_error(spark, sf_dir):
    """CMS contract: for every observed key, true count <= estimate
    <= true + collisions (bounded by N/width per hash row)."""
    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.operators.approx import (
        CMS_WIDTH,
        cms_estimate,
        cms_sketch,
    )
    from reddit_can_bigdata_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"].select("event_type")
    sketch_rows = cms_sketch(ev, "event_type").collect()
    true = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(true.values())
    for key, t in true.items():
        est = cms_estimate(sketch_rows, key)
        assert t <= est <= t + n / CMS_WIDTH * 4, (key, t, est)


def test_misra_gries_contract(spark, sf_dir):
    """MG guarantees: (1) every item with true frequency > n/capacity
    survives the summary; (2) reported counts never exceed the truth
    and undercount by at most n/capacity."""
    from collections import Counter

    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.operators.approx import (
        MG_CAPACITY,
        misra_gries_summary,
    )
    from reddit_can_bigdata_spark.operators.common import tables
    from reddit_can_bigdata_spark.operators.pretrain import TOKENS_EXPR

    docs = tables(spark, sf_dir)["documents"]
    tok = docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("term")).repartition(8)
    got = dict(misra_gries_summary(tok, "term", MG_CAPACITY))
    truth = Counter(
        t for r in docs.select("text").collect() for t in r.text.split(" ") if t
    )
    n = sum(truth.values())
    bound = n / MG_CAPACITY
    for term, freq in truth.items():
        if freq > bound:
            assert term in got, f"guaranteed heavy hitter {term} lost"
    for term, est in got.items():
        assert est <= truth[term], "MG must never overcount"
        assert truth[term] - est <= bound, "undercount beyond the MG bound"
    assert 0 < len(got) <= MG_CAPACITY


def test_sample_ci_contains_exact_and_tightens(spark, sf_dir, sf001_dir):
    """approx_sample_revenue_ci: the 95% interval must contain the
    exact total at both SFs (the estimator's honesty), and the
    RELATIVE standard error must shrink going 6k -> 60k rows
    (~1/sqrt(10); assert a loose 2x to stay variance-proof)."""
    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    if sf_dir == sf001_dir:
        pytest.skip("needs two distinct SFs to compare se scaling")
    fn = REGISTRY["approx_sample_revenue_ci"].fn
    rows = {d: fn(spark, d).collect()[0] for d in (sf_dir, sf001_dir)}
    rel = {}
    for d, r in rows.items():
        assert r["ci95_lo"] <= r["exact_total"] <= r["ci95_hi"], dict(r.asDict())
        assert r["n_sample"] > 0 and r["se_total"] > 0
        rel[d] = r["se_total"] / r["est_total"]
    small, big = (sf_dir, sf001_dir) if rows[sf_dir]["n_total"] < rows[sf001_dir]["n_total"] else (sf001_dir, sf_dir)
    assert rel[big] < rel[small] / 2.0, rel
