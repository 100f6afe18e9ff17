"""Physical-layout strategies: bucketing, partitioning, salting.

SURVEY §4.2 / the 100 TB playbook: co-locate the big joins via
bucketing, prune scans via date partitioning, and neutralize skew via
key salting. Each strategy here is a small utility whose effect on
the physical plan is asserted in tests/test_layout.py — the point is
not the helper code but the demonstrated plan change (no Exchange /
PartitionFilters / balanced tasks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join
    key. Two tables bucketed the same way join WITHOUT any shuffle —
    at 100 TB this converts the dominant exchange of fact-fact joins
    into a metadata lookup. (Spark bucketing works with the built-in
    catalog; on a lakehouse the equivalent is Iceberg's bucket
    partition transform.)"""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-neutralized equi-join: spread each hot key of ``big``
    across ``n_salts`` shuffle partitions by appending a random salt,
    and explode ``small`` across all salts so every (key, salt) pair
    still matches. Use when one key holds a disproportionate share of
    rows and AQE's skew splitting isn't available (e.g. non-AQE sinks,
    streaming joins). Row-level results are identical to a plain join.
    """
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, part_col: str = "event_day"
) -> None:
    """Persist partitioned by day — range predicates on the partition
    column become partition pruning (entire directories skipped), the
    single biggest scan saver for time-series tables at 100 TB."""
    (
        df.withColumn(part_col, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(path)
    )


def write_ivf_index(
    emb: DataFrame, path: str, cents: DataFrame | None = None, trained: bool = False
) -> None:
    """Persist the IVF inverted file as a PHYSICAL layout: vectors
    partitioned on disk by centroid id, plus the (tiny) codebook next
    to it. A probe then reads exactly 1-of-K partition directories —
    at 100 TB the difference between scanning ~everything per query
    (the in-memory assignment `sim_ivf_cluster_search` recomputes) and
    scanning N/K. Asserted via PartitionFilters in tests/test_layout.py.

    ``trained=True`` (or an explicit ``cents`` table) swaps the
    deterministic stand-in codebook for the seeded k-means one
    (`ivf_centroids_trained`) — same layout, better-balanced cells and
    higher recall at equal n_probe."""
    from reddit_can_bigdata_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_centroids_trained,
    )

    if cents is None:
        cents = ivf_centroids_trained(emb) if trained else ivf_centroids(emb)
    ivf_assign(emb, cents=cents).write.mode("overwrite").partitionBy("cid").parquet(path)
    cents.write.mode("overwrite").parquet(path + "_centroids")


def ivf_probe(spark: SparkSession, path: str, query_vec, k: int = 5) -> DataFrame:
    """Top-k cosine search against a persisted IVF index: score the
    query against the K-row codebook (one collect of K scalars —
    O(K), not O(N)), then scan ONLY the winning ``cid=...`` partition
    with a literal partition filter so pruning is static and visible
    in the plan. ``query_vec`` is a python list[float]."""
    from reddit_can_bigdata_spark.operators.similarity import cosine_expr

    cents = spark.read.parquet(path + "_centroids")
    qlit = F.array(*[F.lit(float(x)) for x in query_vec]).alias("qv")
    best = (
        cents.select("cid", qlit, "cv")
        .select("cid", cosine_expr("cv", "qv").alias("sim"))
        .orderBy(F.desc("sim"), F.asc("cid"))
        .limit(1)
        .collect()
    )
    qcid = best[0]["cid"]
    part = spark.read.parquet(path).where(F.col("cid") == qcid)
    cos = cosine_expr("embedding", "qv")
    return (
        part.select("vec_id", "label", qlit, "embedding")
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", F.round("cos_raw", 6).alias("cosine"))
    )
