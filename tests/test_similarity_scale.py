"""Round 11: corpus-sized production forms for the two embedding
operators whose pinned parameters the honest 10x probe caught growing
quadratically (dedup_embedding_lsh: 575 cpu-s at sf1, wall == cpu on
16 forever-fixed buckets; sim_semantic_dedup: 642 cpu-s, fixture-K
clusters growing with the corpus).

The driver embeddings are random unit vectors (no cos >= 0.92 pair
exists at any test SF — verified), so the recall/equivalence tests
plant synthetic near-duplicates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from reddit_can_bigdata_spark.operators import similarity
from reddit_can_bigdata_spark.operators.similarity import (
    EMB_LSH_TAU,
    dedup_embedding_lsh,
    embedding_lsh_for_scale,
    semantic_dedup_for_scale,
    sim_semantic_dedup,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("label", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


@pytest.fixture(scope="module")
def planted(spark):
    """400 random unit vectors + 60 perturbed twins (cos ~ 0.97-0.99
    with their base) — a corpus with a known near-dup pair set."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(400, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # cos(base, twin) ~ 1/sqrt(1 + sigma^2 * 64): sigma=0.03 -> ~0.97
    twins = base[:60] + 0.03 * rng.normal(size=(60, 64))
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)
    vecs = np.vstack([base, twins])
    rows = [
        (int(i), int(i % 10), [float(x) for x in v])
        for i, v in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    sims = vecs @ vecs.T
    iu = np.triu_indices(len(vecs), k=1)
    truth = {
        (int(a), int(b))
        for a, b in zip(iu[0][sims[iu] >= EMB_LSH_TAU],
                        iu[1][sims[iu] >= EMB_LSH_TAU])
    }
    assert len(truth) >= 40, "fixture must plant a real pair set"
    return df, truth


def test_embedding_lsh_pinned_params_match_registered(spark, sf_dir, planted):
    """n_bits=4, n_bands=1 IS the registered oracle query: identical
    pair set and cosines on a corpus that actually has pairs."""
    df, _ = planted
    want = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in dedup_embedding_lsh(spark, sf_dir, emb=df).collect()
    }
    got = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embedding_lsh_for_scale(
            spark, sf_dir, emb=df, n_bits=4, n_bands=1
        ).collect()
    }
    assert want and got == want


def test_embedding_lsh_for_scale_recall_and_precision(spark, sf_dir, planted):
    """Auto-sized bands hit the documented recall target against
    brute-force truth; precision is 1.0 by construction (every
    candidate pays the exact cosine filter)."""
    df, truth = planted
    found = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_lsh_for_scale(spark, sf_dir, emb=df).collect()
    }
    assert found <= truth  # exact-cosine filter admits no false pair
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} below target"


def test_embedding_lsh_bucket_count_grows_with_corpus(spark, sf_dir, planted):
    """The derived signature width scales with n: the join key space
    (bands x 2^bits) must exceed the pinned form's 16 keys once the
    corpus outgrows the target bucket population."""
    import math

    df, _ = planted
    n = df.count()
    n_bits = max(
        4,
        math.ceil(
            math.log2(n / similarity.EMB_LSH_TARGET_BUCKET)
        ),
    )
    assert n_bits > 4 or n <= 16 * similarity.EMB_LSH_TARGET_BUCKET


def test_semantic_dedup_for_scale_fixture_path(spark, sf001_dir):
    """Under the pair-work budget the gate serves the pinned fixture
    path — bit-identical to the registered oracle query."""
    want = {
        tuple(r) for r in sim_semantic_dedup(spark, sf001_dir).collect()
    }
    got = {
        tuple(r)
        for r in semantic_dedup_for_scale(spark, sf001_dir).collect()
    }
    assert got == want


def test_semantic_dedup_for_scale_trained_path(spark, sf001_dir, monkeypatch):
    """Budget forced to 0 -> the gate trains a corpus-sized codebook.
    The kept/dropped rule must stay internally consistent: every
    dropped vector records an earlier same-cluster near-dup at or
    above tau, every kept vector records none, and the vec_id domain
    is unchanged."""
    monkeypatch.setattr(similarity, "SEMDEDUP_PAIR_ROWS_PER_SLOT", 0)
    rows = semantic_dedup_for_scale(spark, sf001_dir).collect()
    base = sim_semantic_dedup(spark, sf001_dir).collect()
    assert {r["vec_id"] for r in rows} == {r["vec_id"] for r in base}
    for r in rows:
        if r["kept"]:
            assert r["n_earlier_dups"] == 0 and r["max_sim_earlier"] is None
        else:
            assert r["n_earlier_dups"] >= 1
            assert r["max_sim_earlier"] >= similarity.SEMDEDUP_TAU
