"""Graph algorithm invariants + a NumPy reference implementation for
PageRank (SURVEY §5: small-scale exactness against an independent
oracle, invariants beyond)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def edges(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.graph import _edges

    return [(r["u"], r["v"], r["weight"]) for r in _edges(spark, sf_dir).collect()]


def test_pagerank_matches_numpy_reference(spark, sf_dir, edges):
    from reddit_can_bigdata_spark.operators.graph import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        g6_pagerank,
    )

    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for u, v, wt in edges:
        w[idx[u], idx[v]] += wt
        w[idx[v], idx[u]] += wt
    trans = w / w.sum(axis=1, keepdims=True)  # row: src -> dst prob
    r = np.full(n, 1.0 / n)
    for _ in range(PAGERANK_ITERS):
        r = (1 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * trans.T @ r
    got = {row["node"]: row["pagerank"] for row in g6_pagerank(spark, sf_dir).collect()}
    assert len(got) == n
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=1e-5)


def test_pagerank_sums_to_one(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.graph import g6_pagerank

    total = sum(r["pagerank"] for r in g6_pagerank(spark, sf_dir).collect())
    assert total == pytest.approx(1.0, abs=1e-3)


def test_components_partition_nodes(spark, sf_dir, edges):
    from reddit_can_bigdata_spark.operators.graph import g7_connected_components

    nodes = {u for u, _, _ in edges} | {v for _, v, _ in edges}
    rows = g7_connected_components(spark, sf_dir).collect()
    assert sum(r["n_nodes"] for r in rows) == len(nodes)
    # component labels are the minimum node id of each component
    assert all(r["component"] in nodes for r in rows)


def test_distributed_brandes_full_sources_matches_exact(spark, sf_dir, edges):
    """With the sample widened to ALL sources, the distributed
    level-synchronous Brandes must EXACTLY reproduce the driver-side
    `betweenness_exact` — no sampling error, so any deviation is an
    algorithmic bug, not noise."""
    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.operators.graph import (
        BW_LEVELS,
        _brandes_backward,
        _brandes_forward,
        _edges,
        betweenness_exact,
    )

    e = _edges(spark, sf_dir).select("u", "v")
    sym = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).cache()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    frontiers = _brandes_forward(sym, nodes, BW_LEVELS)
    levels = _brandes_backward(sym, frontiers)
    all_lv = levels[0]
    for lv in levels[1:]:
        all_lv = all_lv.unionByName(lv)
    got = {
        r["node"]: r["bc"]
        for r in all_lv.where(F.col("node") != F.col("src"))
        .groupBy("node")
        .agg((F.sum("delta") / 2).alias("bc"))
        .collect()
    }
    exact = betweenness_exact([(u, v) for u, v, _ in edges])
    assert set(got) == set(exact)
    for nd, bc in exact.items():
        assert got[nd] == pytest.approx(bc, abs=1e-6), f"node {nd}"


def test_sampled_closeness_approximates_exact(spark, sf_dir):
    """g4c (1-in-7 pivot sample, Eppstein–Wang rescale) must track the
    exact all-sources closeness g4 on the test graph: every node
    estimated, small mean relative error."""
    from reddit_can_bigdata_spark.operators.advanced import (
        g4_closeness_centrality,
        g4c_closeness_sampled,
    )

    exact = {
        r["node"]: r["closeness"] for r in g4_closeness_centrality(spark, sf_dir).collect()
    }
    est = {
        r["node"]: r["closeness_est"]
        for r in g4c_closeness_sampled(spark, sf_dir).collect()
    }
    common = [n for n in est if n in exact]
    assert len(common) >= 0.9 * len(exact)
    errs = [abs(est[n] - exact[n]) / exact[n] for n in common]
    assert sum(errs) / len(errs) < 0.25


def test_components_match_union_find(spark, sf_dir, edges):
    from reddit_can_bigdata_spark.operators.graph import g7_connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edges:
        parent[find(u)] = find(v)
    expected: dict[int, int] = {}
    for node in parent:
        expected.setdefault(find(node), 0)
        expected[find(node)] += 1
    got = {
        r["component"]: r["n_nodes"]
        for r in g7_connected_components(spark, sf_dir).collect()
    }
    # same number of components, same size multiset (labels may differ
    # from union-find roots; min-label propagation uses min node id)
    assert sorted(got.values()) == sorted(expected.values())
