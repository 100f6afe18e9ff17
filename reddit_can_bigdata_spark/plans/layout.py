"""Physical-layout strategies: bucketing, partitioning, salting.

SURVEY §4.2 / the 100 TB playbook: co-locate the big joins via
bucketing, prune scans via date partitioning, and neutralize skew via
key salting. Each strategy here is a small utility whose effect on
the physical plan is asserted in tests/test_layout.py — the point is
not the helper code but the demonstrated plan change (no Exchange /
PartitionFilters / balanced tasks).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from reddit_can_bigdata_spark.registry import register


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


def partitioned_events_path(sf_dir: str) -> str:
    """Canonical temp location of the day-partitioned events copy for
    ``sf_dir`` (deterministic so repeat invocations reuse the path)."""
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(tempfile.gettempdir(), f"events_day_parted_{tag}")


@register(
    "layout_partitioned_timeline",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(round(SUM(CAST(value AS DECIMAL(20,6))), 4) AS DOUBLE)
             AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    GROUP BY day, event_type
    """,
    tags=("layout", "partition", "pruning", "agg"),
)
def layout_partitioned_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §4.2 made physical: the `dash_stats_timeline` widget
    range served FROM the day-partitioned layout. Writes the events
    table out partitioned by ``day=`` (the layout `retention_sweep`'s
    partition-drop form cleans), reads it back, and range-filters ON
    THE PARTITION COLUMN — the predicate lands in the scan's
    ``PartitionFilters`` (asserted in tests/test_layout.py), so at
    100 TB the scan opens ten directories, not the table. The oracle
    is the plain ts-range SQL over the unpartitioned table: identical
    because ``day = date(ts)`` makes the two predicates equivalent
    (NULL-ts rows land in the default partition and fail both)."""
    from pyspark.sql.types import DateType, StructField

    from reddit_can_bigdata_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    path = partitioned_events_path(sf_dir)
    write_date_partitioned(ev, path, "ts", part_col="day")
    # explicit schema (base + the day partition column): an EMPTY
    # events table writes zero data files and schema inference would
    # fail on read-back; with the schema given, empty-in -> empty-out
    parted = spark.read.schema(ev.schema.add(StructField("day", DateType()))).parquet(
        path
    )
    return (
        parted.where(
            (F.col("day") >= F.lit("2024-01-10").cast("date"))
            & (F.col("day") < F.lit("2024-01-20").cast("date"))
        )
        .groupBy(F.col("day").cast("string").alias("day"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.round(F.sum(F.col("value").cast("decimal(20,6)")), 4)
            .cast("double")
            .alias("total_value"),
        )
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


# ---------------------------------------------------------------------------
# round 4: Z-order (Morton) multi-dimensional clustering
# ---------------------------------------------------------------------------

ZORDER_BITS = 16  # bits per dimension interleaved into the Morton code


def zorder_value(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns:
    bit i of each input lands at positions 2i / 2i+1 of the code, so
    sorting by the code clusters rows that are close in BOTH
    dimensions — the multi-column layout trick behind Delta/Iceberg
    OPTIMIZE ZORDER. Pure shift/or expressions (one 2*bits-term OR
    chain, no UDF); inputs are range-normalized by the caller."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a.cast("bigint"), i) % 2, 2 * i))
        terms.append(F.shiftleft(F.shiftright(b.cast("bigint"), i) % 2, 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 8
) -> None:
    """Persist ``df`` clustered by the Z-order of two columns:
    range-partition + sort on the Morton code, so every output file
    covers a small rectangle of the (col_a, col_b) space and its
    parquet min/max footer stats are TIGHT in BOTH dimensions.

    Why this matters at 100 TB: a linear sort on col_a gives perfect
    pruning for col_a predicates and NONE for col_b (every file spans
    the full col_b range); Z-order gives ~sqrt-partitioned spans in
    each dimension, so selective predicates on EITHER column skip
    most row groups via footer stats. `tests/test_layout.py` measures
    exactly that: per-file min/max spans of the second column under
    linear sort vs Z-order."""
    zdf = df.withColumn(
        "_z", zorder_value(F.col(col_a), F.col(col_b))
    )
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
