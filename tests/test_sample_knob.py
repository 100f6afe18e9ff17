"""Round-6 judge item #4: the quality diagnostics' documented
"sampled slice at 100 TB" mode is now a ``sample_mod`` parameter.

Invariance: sample_mod=1 must be byte-identical to the registered
(full-population, oracle-checked) form — so the green CORRECTNESS rows
cover the default path and the knob only changes WHAT SLICE the same
measurement runs on. Sampled runs must respect the slice filter and
still produce well-formed metrics."""

from __future__ import annotations


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lsh_quality_sample_mod_identity_and_slice(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.dedup import (
        dedup_lsh_quality,
        dedup_ngram_jaccard,
    )

    base = _rows(dedup_lsh_quality(spark, sf_dir))
    assert _rows(dedup_lsh_quality(spark, sf_dir, sample_mod=1)) == base

    sampled = dedup_lsh_quality(spark, sf_dir, sample_mod=3).collect()
    assert len(sampled) == 1
    m = sampled[0]
    for col in ("precision", "recall"):
        assert m[col] is None or 0.0 <= m[col] <= 1.0
    assert m["n_hit"] <= min(m["n_exact"], m["n_lsh"])
    # the sliced exact arm only ever emits in-slice pairs
    pairs = dedup_ngram_jaccard(spark, sf_dir, sample_mod=3).collect()
    assert all(r["doc_a"] % 3 == 0 and r["doc_b"] % 3 == 0 for r in pairs)
    # and slicing actually shrinks the exact arm's pair set
    full_pairs = dedup_ngram_jaccard(spark, sf_dir).count()
    assert len(pairs) < full_pairs


def test_ivf_recall_sample_mod_identity_and_slice(spark, sf_dir):
    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY["sim_ivf_recall_at_k"].fn

    base = _rows(fn(spark, sf_dir))
    assert _rows(fn(spark, sf_dir, sample_mod=1)) == base

    sampled = fn(spark, sf_dir, sample_mod=3).collect()
    assert sampled  # every query still finds a top-k in the slice
    for r in sampled:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["n_overlap"] <= min(r["n_exact"], r["n_ivf"])
