"""Tests for the round-4 curation/text additions: PMI collocations,
Efraimidis-Spirakis weighted sampling, and the hashed-linear quality
classifier. Oracle parity runs in test_oracle_parity.py; these pin
Python goldens and the plan shapes the scale story depends on."""

from __future__ import annotations

import hashlib
import math

from reddit_can_bigdata_spark.operators.common import tables
from reddit_can_bigdata_spark.operators.curation import (
    CLF_DIM,
    U32_SPAN,
    WSAMPLE_K,
    curate_quality_classifier,
    curate_weighted_sample,
)
from reddit_can_bigdata_spark.operators.textstats import (
    PMI_MIN_COUNT,
    PMI_TOPK,
    text_pmi_collocations,
)
from reddit_can_bigdata_spark.plans.inspect import formatted_plan, join_kinds


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def test_pmi_matches_python_golden(spark, sf_dir):
    rows = text_pmi_collocations(spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOPK
    docs = tables(spark, sf_dir)["documents"].select("text").collect()
    uni: dict[str, int] = {}
    pair: dict[str, int] = {}
    t_toks = 0
    t_pairs = 0
    for r in docs:
        toks = _toks(r.text)
        t_toks += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pair[f"{a} {b}"] = pair.get(f"{a} {b}", 0) + 1
            t_pairs += 1
    for r in rows:
        assert r.pair_cnt >= PMI_MIN_COUNT
        assert r.pair_cnt == pair[r.bigram]
        w1, w2 = r.bigram.split(" ")
        assert (r.c1, r.c2) == (uni[w1], uni[w2])
        expect = math.log(
            (r.pair_cnt / t_pairs) / ((r.c1 / t_toks) * (r.c2 / t_toks))
        )
        assert abs(r.pmi - expect) < 1e-5
    # returned set is the true global top-k by (pmi, bigram)
    all_pmi = sorted(
        (
            round(
                math.log((c / t_pairs) / ((uni[g.split(" ")[0]] / t_toks) * (uni[g.split(" ")[1]] / t_toks))),
                6,
            ),
            g,
        )
        for g, c in pair.items()
        if c >= PMI_MIN_COUNT
    )
    expect_top = sorted((-p, g) for p, g in all_pmi)[: len(rows)]
    got_top = sorted((-r.pmi, r.bigram) for r in rows)
    assert got_top == expect_top


def test_pmi_plan_broadcasts_and_takeordered(spark, sf_dir):
    df = text_pmi_collocations(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in join_kinds(df)
    assert "SortMergeJoin" not in join_kinds(df), join_kinds(df)


def test_weighted_sample_is_exact_python_topk(spark, sf_dir):
    rows = curate_weighted_sample(spark, sf_dir).collect()
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "n_chars").collect()
    keyed = [
        (
            round(math.log((_h32(str(r.doc_id)) + 0.5) / U32_SPAN) / r.n_chars, 6),
            r.doc_id,
        )
        for r in docs
    ]
    expect = sorted(keyed, key=lambda t: (-t[0], t[1]))[:WSAMPLE_K]
    got = [(r.samp_key, r.doc_id) for r in rows]
    assert sorted(got, key=lambda t: (-t[0], t[1])) == expect
    assert len(rows) == min(WSAMPLE_K, len(docs))


def test_weighted_sample_plan_is_takeordered(spark, sf_dir):
    plan = formatted_plan(curate_weighted_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, "weighted sample must not shuffle the corpus"


def test_classifier_matches_python_golden(spark, sf_dir):
    out = {r.doc_id: r for r in curate_quality_classifier(spark, sf_dir).collect()}
    w = {
        r.feature_id: r.weight
        for r in spark.read.parquet(
            __import__(
                "reddit_can_bigdata_spark.operators.curation", fromlist=["CLF_FIXTURE"]
            ).CLF_FIXTURE
        ).collect()
    }
    bias = w.pop(-1)
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for r in docs[:25]:
        toks = _toks(r.text)
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        fids = [_h32(g) % CLF_DIM for g in grams]
        wsum = sum(round(w[f], 6) for f in fids)
        logit = bias + wsum / len(fids)
        score = round(1.0 / (1.0 + math.exp(-logit)), 6)
        got = out[r.doc_id]
        assert got.n_feats == len(fids)
        assert abs(got.quality_score - score) < 1e-5
        assert got.keep == (score >= 0.5)


def test_classifier_model_broadcasts(spark, sf_dir):
    df = curate_quality_classifier(spark, sf_dir)
    kinds = join_kinds(df)
    assert "BroadcastHashJoin" in kinds, kinds
    assert "SortMergeJoin" not in kinds, "the model must broadcast, never shuffle"
