"""dedup_clusters invariants: the pair graph and the emitted
(doc_id, canonical_id) mapping must agree."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_clusters_consistent_with_pairs(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.dedup import (
        CLUSTER_JACCARD,
        dedup_clusters,
        dedup_minhash_lsh,
    )

    pairs = (
        dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("est_jaccard") >= CLUSTER_JACCARD)
        .collect()
    )
    mapping = {
        r["doc_id"]: r["canonical_id"] for r in dedup_clusters(spark, sf_dir).collect()
    }
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # total mapping: one row per document
    assert len(mapping) == docs_n
    # thresholded near-dup pairs land in the same cluster
    assert pairs, "fixture corpus should contain near-dup pairs"
    for r in pairs:
        assert mapping[r["doc_a"]] == mapping[r["doc_b"]]
    # canonical is the cluster minimum and a member of the cluster
    clusters: dict[int, list[int]] = {}
    for doc, canon in mapping.items():
        clusters.setdefault(canon, []).append(doc)
    for canon, members in clusters.items():
        assert canon == min(members)
    # docs not in any pair map to themselves
    paired = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    for doc, canon in mapping.items():
        if doc not in paired:
            assert canon == doc


def test_cluster_split_never_straddles_clusters(spark, sf_dir):
    """The leakage-safety invariant: every near-dup cluster lands
    wholly inside ONE split — the property per-document hashing lacks
    by construction."""
    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["dedup_cluster_split"].fn(spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["canonical_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # and the rule actually exercises all three splits on the fixture
    assert {s for ss in by_cluster.values() for s in ss} == {
        "train", "val", "test"
    }
