"""Int8 scalar-quantized ANN + token-budget mixture invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sq_recall_vs_exact_topk(spark, sf_dir):
    """Quantized top-10 recovers >= 0.8 of the exact brute-force
    top-10 (int8 reconstruction error is small relative to neighbor
    gaps) — the accuracy side of the 4x memory/IO saving."""
    from reddit_can_bigdata_spark.operators.similarity import (
        sim_sq_quantized_topk,
        sim_topk_bruteforce,
    )

    exact = {r["vec_id"] for r in sim_topk_bruteforce(spark, sf_dir).collect()}
    quant = {r["vec_id"] for r in sim_sq_quantized_topk(spark, sf_dir).collect()}
    assert len(quant) == 10
    assert len(exact & quant) / len(exact) >= 0.8, (exact, quant)


def test_sq_codes_fit_int8(spark, sf_dir):
    """Every quantized code is within [-127, 127] by construction of
    the symmetric per-dimension scales (so a real deployment can store
    TINYINT without clamping)."""
    from reddit_can_bigdata_spark.operators.common import tables

    emb = tables(spark, sf_dir)["embeddings"]
    scales = (
        emb.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x").cast("double"))).alias("m"))
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, m))),"
                " p -> p.m / 127.0e0)"
            ).alias("s")
        )
    )
    codes = emb.crossJoin(F.broadcast(scales)).select(
        F.expr(
            "aggregate(zip_with(embedding, s, (x, sc) -> CASE WHEN sc > 0.0e0"
            " THEN abs(round(cast(x as double) / sc)) ELSE 0.0e0 END),"
            " cast(0.0 as double), (a, v) -> greatest(a, v))"
        ).alias("maxcode")
    )
    assert codes.agg(F.max("maxcode")).collect()[0][0] <= 127.0


def test_token_budget_respected_per_source(spark, sf_dir):
    """Each source's kept token total never exceeds its floor'd budget
    share, and the selection is a prefix of the deterministic hash
    order (rerun-stable)."""
    from reddit_can_bigdata_spark.operators.curation import (
        TOKEN_BUDGET,
        curate_token_budget,
    )

    kept = curate_token_budget(spark, sf_dir)
    per_src = {
        r["source"]: r["tot"]
        for r in kept.groupBy("source")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    assert sum(per_src.values()) <= TOKEN_BUDGET
    # cum_tokens of the kept set is exactly the running sum of its own
    # n_tokens in hash order => the kept rows form a prefix
    rows = kept.collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["cum_tokens"])
        run = 0
        for r in rs:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run, (src, r)


def test_token_budget_deterministic_across_runs(spark, sf_dir):
    from reddit_can_bigdata_spark.operators.curation import curate_token_budget

    a = sorted(map(tuple, curate_token_budget(spark, sf_dir).collect()))
    b = sorted(map(tuple, curate_token_budget(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_binary_rerank_recall_vs_exact(spark, sf_dir):
    """Two-stage (Hamming candidates -> exact rerank) must recover
    most of the exact cosine top-10, and the packed codes must agree
    with Python bit packing."""
    from pyspark.sql import functions as F

    from reddit_can_bigdata_spark.operators.common import tables
    from reddit_can_bigdata_spark.operators.similarity import (
        HAMMING_FINAL_K,
        sim_binary_rerank_topk,
        sim_topk_bruteforce,
    )

    two_stage = [r.vec_id for r in sim_binary_rerank_topk(spark, sf_dir).collect()]
    exact = [r.vec_id for r in sim_topk_bruteforce(spark, sf_dir).collect()]
    overlap = len(set(two_stage) & set(exact)) / HAMMING_FINAL_K
    assert overlap >= 0.5, f"recall@10 {overlap} too low for sign-bit codes"

    # python golden for the packing of a few vectors
    emb = tables(spark, sf_dir)["embeddings"].limit(5).collect()
    from reddit_can_bigdata_spark.operators.similarity import _pack_expr

    packed = (
        tables(spark, sf_dir)["embeddings"]
        .limit(5)
        .select(
            "vec_id",
            F.expr(_pack_expr("embedding", 0)).alias("w0"),
            F.expr(_pack_expr("embedding", 1)).alias("w1"),
        )
        .collect()
    )
    got = {r.vec_id: (r.w0, r.w1) for r in packed}
    for r in emb:
        w0 = sum(1 << i for i in range(32) if r.embedding[i] > 0)
        w1 = sum(1 << i for i in range(32) if r.embedding[32 + i] > 0)
        assert got[r.vec_id] == (w0, w1)
