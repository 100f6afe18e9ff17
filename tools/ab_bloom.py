"""A/B harness for pretrain_bloom_decontaminate's corpus membership
test (optimization round 12, VERDICT item #5).

Variants (same md5 bit positions — the oracle's hash scheme is pinned —
only the execution strategy differs):

  hof     — current registered form: size(filter(grams, gr ->
            forall(array(4 md5), ...))) — higher-order functions are
            CodegenFallback, so every gram pays interpreted eval.
  explode — posexplode the gram array, compute the 4 positions as
            plain columns (whole-stage codegen), test the broadcast
            bitmap per row, re-aggregate count per doc. Adds one
            doc_id exchange of (doc_id, n_grams, partial-count) rows.

Usage: python tools/ab_bloom.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from reddit_can_bigdata_spark.session import DEFAULT_SF_DIR, get_spark
from tools.profile_queries import _Counters


def build_explode(spark, sf_dir: str):
    from reddit_can_bigdata_spark.operators.common import spread, tables
    from reddit_can_bigdata_spark.operators.pretrain import (
        BLOOM_K,
        DECONTAM_EVAL_MOD,
        DECONTAM_N,
        _bloom_pos_spark,
        _gram_expr,
    )

    docs = tables(spark, sf_dir)["documents"]
    g = spread(docs).select(
        "doc_id",
        F.array_distinct(F.expr(_gram_expr(DECONTAM_N))).alias("grams"),
    )
    is_eval = F.col("doc_id") % DECONTAM_EVAL_MOD == 0
    pos = (
        g.where(is_eval)
        .select(F.explode("grams").alias("gr"))
        .distinct()
        .select(
            F.explode(
                F.array(*[F.expr(_bloom_pos_spark(i, "gr")) for i in range(BLOOM_K)])
            ).alias("p")
        )
    )
    bloom_row = (
        pos.select(
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(1L, int(p % 64))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bm"))
    )
    exploded = (
        g.where(~is_eval)
        .select(
            "doc_id",
            F.size("grams").cast("bigint").alias("n_grams"),
            F.explode_outer("grams").alias("gr"),
        )
        .crossJoin(F.broadcast(bloom_row))
        .select(
            "doc_id",
            "n_grams",
            "gr",
            "bm",
            *[F.expr(_bloom_pos_spark(i, "gr")).alias(f"_p{i}") for i in range(BLOOM_K)],
        )
    )
    hit = F.lit(True)
    for i in range(BLOOM_K):
        hit = hit & (
            F.expr(
                f"(coalesce(element_at(bm, _p{i} div 64), 0L)"
                f" & shiftleft(1L, int(_p{i} % 64))) != 0"
            )
        )
    flagged = exploded.select(
        "doc_id",
        "n_grams",
        F.when(F.col("gr").isNotNull() & hit, 1).otherwise(0).alias("h"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.sum("h").cast("bigint").alias("n_flagged"),
        )
        .withColumn("maybe_contaminated", F.col("n_flagged") >= 1)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()

    spark = get_spark("ab-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded
    from reddit_can_bigdata_spark.tables import load_tables

    _ensure_loaded()
    warm = load_tables(spark, args.sf_dir)
    warm["documents"].count()
    meter = _Counters(spark.sparkContext)

    rows = {}
    for variant in ("hof", "explode"):
        walls, cpus = [], []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"bloom:{variant}#{rep}")
            t0 = time.perf_counter()
            df = (
                REGISTRY["pretrain_bloom_decontaminate"].fn(spark, args.sf_dir)
                if variant == "hof"
                else build_explode(spark, args.sf_dir)
            )
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            cpus.append(meter.delta()["cpu_s"])
            if rep == 0:
                rows[variant] = sorted(tuple(r) for r in df.collect())
                meter.delta()
        print(
            f"{variant:8s} wall med {statistics.median(walls):6.3f}"
            f" [{min(walls):6.3f}..{max(walls):6.3f}]"
            f" cpu med {statistics.median(cpus):7.2f}"
            f" [{min(cpus):7.2f}..{max(cpus):7.2f}]"
        )
    if rows["hof"] != rows["explode"]:
        diff = set(rows["hof"]) ^ set(rows["explode"])
        print(f"!! VALUE MISMATCH ({len(diff)} differing rows)")
    else:
        print(f"values identical ({len(rows['hof'])} rows)")


if __name__ == "__main__":
    main()
