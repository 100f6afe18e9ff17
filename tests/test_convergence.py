"""`until_converged` mode: fixed-round loops truncate on graphs whose
diameter exceeds the round bound (the documented oracle-parity
trade-off); the converged mode must keep iterating to the true fixed
point. Oracle: closed forms on a path graph P_n (diameter n-1 >> every
fixed bound) — dist(i,j) = |i-j|, betweenness(k) = k*(n-1-k),
components of a path = one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N = 12  # path 0-1-...-11, diameter 11 > CLOSENESS_HOPS/BW_LEVELS/CC_ITERS


def _path_sym(spark, weighted: bool = False):
    edges = [(i, i + 1) for i in range(N - 1)]
    rows = [(u, v, 1) for u, v in edges] + [(v, u, 1) for u, v in edges]
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    if weighted:
        return df.select("src", "dst", F.col("weight").cast("double").alias("w")).cache()
    return df.select("src", "dst", "weight").cache()


def test_bfs_fixed_rounds_truncate_and_converged_exact(spark):
    from reddit_can_bigdata_spark.operators.advanced import CLOSENESS_HOPS, _bfs_distances

    sym = _path_sym(spark)
    assert CLOSENESS_HOPS < N - 1  # the premise: bound < diameter

    fixed = _bfs_distances(sym, CLOSENESS_HOPS, F.lit(1), unweighted=True)
    got_fixed = {(r["src"], r["node"]): r["dist"] for r in fixed.collect()}
    # truncated: pairs farther than the hop bound are MISSING
    assert (0, N - 1) not in got_fixed
    assert len(got_fixed) < N * N
    assert max(got_fixed.values()) == CLOSENESS_HOPS

    conv = _bfs_distances(sym, CLOSENESS_HOPS, F.lit(1), unweighted=True, until_converged=True)
    got = {(r["src"], r["node"]): r["dist"] for r in conv.collect()}
    want = {(i, j): abs(i - j) for i in range(N) for j in range(N)}
    assert got == want


def test_weighted_bfs_converged_exact(spark):
    from reddit_can_bigdata_spark.operators.advanced import CLOSENESS_HOPS, _bfs_distances

    sym = _path_sym(spark)
    conv = _bfs_distances(
        sym, CLOSENESS_HOPS, F.col("weight"), until_converged=True
    )
    got = {(r["src"], r["node"]): r["dist"] for r in conv.collect()}
    assert got == {(i, j): abs(i - j) for i in range(N) for j in range(N)}


def test_min_label_components_converged_single_component(spark):
    from reddit_can_bigdata_spark.operators.graph import min_label_components

    sym = _path_sym(spark).select("src", "dst")
    # 2 rounds < diameter: min-label hasn't swept the whole path
    trunc = min_label_components(sym, 2)
    assert trunc.select("label").distinct().count() > 1
    conv = min_label_components(sym, 2, until_converged=True)
    rows = conv.collect()
    assert {r["label"] for r in rows} == {0}
    assert len(rows) == N


def test_brandes_converged_matches_closed_form(spark):
    from reddit_can_bigdata_spark.operators.graph import (
        BW_LEVELS,
        _brandes_backward,
        _brandes_forward,
    )

    sym = _path_sym(spark).select("src", "dst")
    srcs = sym.select("src").distinct().select(F.col("src").alias("node"))

    # fixed rounds: BFS stops BW_LEVELS hops out -> truncated frontier list
    fixed = _brandes_forward(sym, srcs, BW_LEVELS)
    assert len(fixed) == BW_LEVELS + 1  # level 0 + BW_LEVELS rounds

    frontiers = _brandes_forward(sym, srcs, BW_LEVELS, until_converged=True)
    assert len(frontiers) == N  # levels 0..diameter

    levels = _brandes_backward(sym, frontiers)
    all_lv = levels[0]
    for lv in levels[1:]:
        all_lv = all_lv.unionByName(lv)
    acc = (
        all_lv.where(F.col("node") != F.col("src"))
        .groupBy("node")
        .agg((F.sum("delta") / 2).alias("bc"))
    )
    got = {r["node"]: r["bc"] for r in acc.collect()}
    # path graph: node k lies on every (i, j) pair with i < k < j
    want = {k: float(k * (N - 1 - k)) for k in range(N)}
    assert got == want


class TestReliableCheckpointMode:
    """iter_checkpoint: one runtime conf flips every iterative loop
    from executor-local localCheckpoint to RELIABLE checkpoint() —
    the 100x-scale requirement (executor-local blocks die with the
    executor; reliable checkpoints survive and restart the lineage
    from the last round, not round 0)."""

    def test_helper_switches_on_conf_and_truncates_lineage(self, spark, tmp_path):
        from reddit_can_bigdata_spark.operators.common import (
            ITER_CHECKPOINT_DIR_CONF,
            iter_checkpoint,
        )

        df = spark.range(100).selectExpr("id", "id * 2 AS v")
        try:
            spark.conf.set(ITER_CHECKPOINT_DIR_CONF, str(tmp_path / "ck"))
            ck = iter_checkpoint(df)
            # reliable checkpoint materializes files under the dir...
            files = list((tmp_path / "ck").rglob("*"))
            assert any(f.is_file() for f in files), files
            # ...and the plan is truncated to a scan of the checkpoint
            # (no Range/Project lineage left)
            plan = ck._jdf.queryExecution().optimizedPlan().toString()
            assert "LogicalRDD" in plan, plan
            assert "Range" not in plan, plan
            assert ck.count() == 100
        finally:
            spark.conf.unset(ITER_CHECKPOINT_DIR_CONF)
        # conf unset => back to localCheckpoint (no new files appear)
        n_before = len(list((tmp_path / "ck").rglob("*")))
        iter_checkpoint(df)
        assert len(list((tmp_path / "ck").rglob("*"))) == n_before

    def test_g6_pagerank_identical_under_reliable_checkpoints(self, spark, tmp_path):
        """The actual loop: g6 with reliable checkpoints produces
        bit-identical ranks to the default local mode (checkpointing
        must never change results, only fault tolerance)."""
        from reddit_can_bigdata_spark.operators.common import (
            ITER_CHECKPOINT_DIR_CONF,
        )
        from reddit_can_bigdata_spark.operators.graph import g6_pagerank

        sf = "/root/testdata/sf0.001"
        local = {
            (r["node"],): r["pagerank"] for r in g6_pagerank(spark, sf).collect()
        }
        try:
            spark.conf.set(ITER_CHECKPOINT_DIR_CONF, str(tmp_path / "g6ck"))
            reliable = {
                (r["node"],): r["pagerank"]
                for r in g6_pagerank(spark, sf).collect()
            }
            files = [f for f in (tmp_path / "g6ck").rglob("*") if f.is_file()]
            assert files, "loop rounds must write reliable checkpoints"
        finally:
            spark.conf.unset(ITER_CHECKPOINT_DIR_CONF)
        assert local == reliable
