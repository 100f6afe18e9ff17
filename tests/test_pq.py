"""Product-quantization invariants: code validity, ADC recall floor
vs exact L2, and reproducibility of the committed codebook fixture."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _load(spark, sf_dir):
    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=float))
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    )
    return [v for v, _ in rows], np.array([e for _, e in rows])


def test_pq_adc_recall_floor(spark, sf001_dir):
    """ADC top-10 must overlap the exact L2 top-10 at >= 0.4 on the
    corpus the codebook was trained on (sf0.01 — PQ quantizes the
    TRAINING distribution; the sf0.001 tables are a different draw) —
    the 32x-compression accuracy contract on this unclustered,
    worst-case synthetic corpus; clustered real embeddings do far
    better."""
    from reddit_can_bigdata_spark.operators.similarity import sim_pq_adc_topk

    ids, X = _load(spark, sf001_dir)
    q = X[ids.index(0)]
    d2 = ((X - q) ** 2).sum(axis=1)
    exact = [ids[i] for i in np.argsort(d2, kind="stable") if ids[i] != 0][:10]
    got = [r["vec_id"] for r in sim_pq_adc_topk(spark, sf001_dir).collect()]
    assert len(got) == 10
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.4, (recall, exact, got)


def test_pq_codebook_fixture_reproducible(spark, sf001_dir):
    """Retraining with the seeded NumPy Lloyd loop reproduces the
    committed fixture exactly (same data, seed, iteration count)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from make_pq_fixture import PQ_K, PQ_M, train

    from reddit_can_bigdata_spark.operators.similarity import PQ_FIXTURE

    committed = {
        (r["sub"], r["cid"]): list(r["cv"])
        for r in spark.read.parquet(PQ_FIXTURE).collect()
    }
    retrained = {(m, k): cv for m, k, cv in train(sf001_dir)}
    assert set(committed) == set(retrained)
    assert len(committed) == PQ_M * PQ_K
    for key in committed:
        assert committed[key] == retrained[key], key


def test_pq_codes_cover_every_subspace(spark, sf_dir):
    """Internal encode step: every vector gets exactly PQ_M codes,
    each a valid centroid id."""
    from pyspark.sql import Window

    from reddit_can_bigdata_spark.operators.similarity import (
        PQ_FIXTURE,
        PQ_M,
        PQ_SUB_D,
    )
    from reddit_can_bigdata_spark.operators.common import tables

    emb = tables(spark, sf_dir)["embeddings"]
    cents = spark.read.parquet(PQ_FIXTURE)
    sv = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
        "embedding",
    ).select(
        "vec_id",
        "sub",
        F.expr(f"slice(embedding, sub*{PQ_SUB_D}+1, {PQ_SUB_D})").alias("sv"),
    )
    from reddit_can_bigdata_spark.operators.similarity import _SQL2_SPARK

    scored = sv.join(F.broadcast(cents), "sub").select(
        "vec_id", "sub", "cid",
        F.expr(_SQL2_SPARK.format(a="sv", b="cv")).alias("d2"),
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("cid"))
    codes = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n"),
            F.min("cid").alias("lo"),
            F.max("cid").alias("hi"),
        )
        .collect()
    )
    n_vecs = emb.count()
    assert len(codes) == n_vecs
    for r in codes:
        assert r["n"] == PQ_M
        assert 0 <= r["lo"] and r["hi"] <= 15


def test_ivfpq_recall_and_probe_pruning(spark, sf001_dir):
    """IVFPQ at n_probe=2 (25% of cells scanned): recall@10 >= 0.3 vs
    exact L2 on the training corpus, and every returned candidate
    must belong to one of the two probed coarse cells."""
    from reddit_can_bigdata_spark.operators.similarity import (
        CODEBOOK_FIXTURE,
        IVFPQ_NPROBE,
        ivf_assign,
        sim_ivfpq_search,
    )
    from reddit_can_bigdata_spark.operators.common import tables

    ids, X = _load(spark, sf001_dir)
    q = X[ids.index(0)]
    d2 = ((X - q) ** 2).sum(axis=1)
    exact = [ids[i] for i in np.argsort(d2, kind="stable") if ids[i] != 0][:10]
    got = [r["vec_id"] for r in sim_ivfpq_search(spark, sf001_dir).collect()]
    assert len(got) == 10
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.3, (recall, exact, got)

    emb = tables(spark, sf001_dir)["embeddings"]
    cents = spark.read.parquet(CODEBOOK_FIXTURE)
    assign = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(emb, cents).select("vec_id", "cid").collect()
    }
    # the query's own cell is among the probes by construction
    cn = sorted(
        (r["cid"], np.array(r["cv"], float)) for r in cents.collect()
    )
    C = np.array([c / np.linalg.norm(c) for _, c in cn])
    sims = (q / np.linalg.norm(q)) @ C.T
    probed = set(np.argsort(-sims, kind="stable")[:IVFPQ_NPROBE])
    for v in got:
        assert assign[v] in probed, (v, assign[v], probed)

    # residual fixture reproducibility (seeded Lloyd, like the others)
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from make_ivfpq_fixture import train

    from reddit_can_bigdata_spark.operators.similarity import IVFPQ_FIXTURE

    committed = {
        (r["sub"], r["cid"]): list(r["cv"])
        for r in spark.read.parquet(IVFPQ_FIXTURE).collect()
    }
    retrained = {(m, k): cv for m, k, cv in train(sf001_dir)}
    assert committed == retrained
