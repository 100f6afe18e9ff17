"""Physical-layout strategy tests: the plan changes that matter at
100 TB, demonstrated and asserted locally."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_can_bigdata_spark.plans.inspect import count_exchanges, formatted_plan


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """J2 with both sides bucketed by the join key: zero shuffle
    exchanges (vs 2 for the plain join, asserted in
    test_plan_quality)."""
    from reddit_can_bigdata_spark.plans.layout import write_bucketed
    from reddit_can_bigdata_spark.tables import load_tables

    t = load_tables(spark, sf_dir)  # managed tables land in ./spark-warehouse (gitignored), dropped below
    write_bucketed(t["orders"], "orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(t["lineitem"], "lineitem_b", "l_orderkey", n_buckets=4)
    joined = (
        spark.table("orders_b")
        .join(spark.table("lineitem_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    # disable broadcast so the bucketing (not size) decides the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert count_exchanges(joined) == 0, formatted_plan(joined)
        # sanity: result matches the unbucketed join
        plain = (
            t["orders"]
            .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_date_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Range predicate on the partition column -> partition pruning
    (scan reads one directory, not the table)."""
    from reddit_can_bigdata_spark.plans.layout import write_date_partitioned
    from reddit_can_bigdata_spark.tables import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    path = str(tmp_path / "events_parted")
    write_date_partitioned(ev, path, "ts")
    parted = spark.read.parquet(path)
    one_day = parted.where(F.col("event_day") == "2024-01-02")
    plan = formatted_plan(one_day)
    assert "PartitionFilters" in plan and "event_day" in plan
    # correctness: same rows as filtering the unpartitioned table
    expected = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-02").count()
    assert one_day.count() == expected


def test_ivf_persisted_index_prunes_to_one_partition(spark, sf_dir, tmp_path):
    """The persisted IVF layout: a probe must (a) scan exactly one
    cid=... partition — PartitionFilters in the plan AND 1-of-K input
    files — and (b) return the same hits as the in-memory IVF search
    restricted to the query's cluster."""
    from reddit_can_bigdata_spark.operators.similarity import sim_ivf_cluster_search
    from reddit_can_bigdata_spark.plans.layout import ivf_probe, write_ivf_index
    from reddit_can_bigdata_spark.tables import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path)

    qv = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    probe = ivf_probe(spark, path, qv, k=6)
    plan = formatted_plan(probe)
    # static partition pruning: a literal cid equality in the scan's
    # PartitionFilters (inputFiles() is not pruning-aware, the plan is)
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*cid[^\]]*= \d+", plan), plan

    got = [(r["vec_id"], r["cosine"]) for r in probe.collect() if r["vec_id"] != 0]
    expected = [
        (r["vec_id"], r["cosine"]) for r in sim_ivf_cluster_search(spark, sf_dir).collect()
    ]
    assert got[: len(expected)] == expected


def test_salted_join_matches_plain_join(spark):
    """Salting preserves join semantics row-for-row on skewed data."""
    from reddit_can_bigdata_spark.plans.layout import salted_join

    # heavily skewed: 90% of rows share key 1
    big = spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(1, "hot"), (10, "cold"), (20, "cold2")], "k long, tag string")
    got = salted_join(big, small, "k").groupBy("k", "tag").agg(F.count("*").alias("n"))
    plain = big.join(small, "k").groupBy("k", "tag").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
