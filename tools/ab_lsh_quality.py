"""A/B harness for dedup_lsh_quality's shingle-base sharing strategies
(optimization round 12, VERDICT item #3).

Variants (all value-identical by construction; verified by comparing
the one-row output across variants in-session):

  reuse     — current registered form: one distinct shingle frame
              threaded through both arms, optimizer exchange reuse.
  ckpt_sh   — localCheckpoint(eager=True) the distinct shingle base.
  split     — exact arm gets the distinct base, the MinHash arm builds
              its own non-distinct base (min over multiset == min over
              set), so no subtree is shared at all.
  ckpt_rare — share the distinct base lazily, but eagerly checkpoint
              the df-bounded `rare` frame the exact arm's three
              consumers re-derive.

Usage: python tools/ab_lsh_quality.py [--reps 3]
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


def build(spark, sf_dir: str, variant: str):
    from reddit_can_bigdata_spark.operators.dedup import (
        LSH_QUALITY_TAU,
        _shingles,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    sh = _shingles(spark, sf_dir)
    if variant == "ckpt_sh":
        sh = sh.localCheckpoint(eager=True)
    lsh_base = sh
    if variant == "split":
        lsh_base = None  # minhash builds its own non-distinct base
    exact = dedup_ngram_jaccard(spark, sf_dir, shingles=sh).select(
        "doc_a", "doc_b", F.lit(1).alias("fe")
    )
    lsh = (
        dedup_minhash_lsh(spark, sf_dir, shingles=lsh_base)
        .where(F.col("est_jaccard") >= LSH_QUALITY_TAU)
        .select("doc_a", "doc_b", F.lit(1).alias("fl"))
    )
    flagged = lsh.join(exact, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("fl", F.lit(0)).alias("fl"),
        F.coalesce("fe", F.lit(0)).alias("fe"),
    )
    hit = F.sum(F.col("fl") * F.col("fe"))
    return flagged.agg(
        F.sum("fe").cast("bigint").alias("n_exact"),
        F.sum("fl").cast("bigint").alias("n_lsh"),
        hit.cast("bigint").alias("n_hit"),
        F.round(F.when(F.sum("fl") > 0, hit * F.lit(1.0) / F.sum("fl")), 6).alias(
            "precision"
        ),
        F.round(F.when(F.sum("fe") > 0, hit * F.lit(1.0) / F.sum("fe")), 6).alias(
            "recall"
        ),
    )


def build_ckpt_rare(spark, sf_dir: str):
    """ckpt_rare: inline re-derivation of the exact arm with an eager
    checkpoint on `rare` (the frame its three consumers share)."""
    from reddit_can_bigdata_spark.operators.common import spread_parts, tables
    from reddit_can_bigdata_spark.operators.dedup import (
        LSH_QUALITY_TAU,
        NGRAM_DF_BOUND,
        NGRAM_JACCARD_TAU,
        _shingles,
        dedup_minhash_lsh,
    )

    sh = _shingles(spark, sf_dir)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    rare = sh.join(
        dfreq.where(F.col("n_docs") <= NGRAM_DF_BOUND), "shingle"
    ).select("doc_id", "shingle")
    rare = rare.repartition(
        spread_parts(tables(spark, sf_dir)["documents"]), "shingle"
    ).localCheckpoint(eager=True)
    sizes = rare.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    r1, r2 = rare.alias("r1"), rare.alias("r2")
    inter = (
        r1.join(
            r2,
            (F.col("r1.shingle") == F.col("r2.shingle"))
            & (F.col("r1.doc_id") < F.col("r2.doc_id")),
        )
        .groupBy(F.col("r1.doc_id").alias("doc_a"), F.col("r2.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    exact = (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .where(jac >= NGRAM_JACCARD_TAU)
        .select("doc_a", "doc_b", F.lit(1).alias("fe"))
    )
    lsh = (
        dedup_minhash_lsh(spark, sf_dir, shingles=sh)
        .where(F.col("est_jaccard") >= LSH_QUALITY_TAU)
        .select("doc_a", "doc_b", F.lit(1).alias("fl"))
    )
    flagged = lsh.join(exact, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("fl", F.lit(0)).alias("fl"),
        F.coalesce("fe", F.lit(0)).alias("fe"),
    )
    hit = F.sum(F.col("fl") * F.col("fe"))
    return flagged.agg(
        F.sum("fe").cast("bigint").alias("n_exact"),
        F.sum("fl").cast("bigint").alias("n_lsh"),
        hit.cast("bigint").alias("n_hit"),
        F.round(F.when(F.sum("fl") > 0, hit * F.lit(1.0) / F.sum("fl")), 6).alias(
            "precision"
        ),
        F.round(F.when(F.sum("fe") > 0, hit * F.lit(1.0) / F.sum("fe")), 6).alias(
            "recall"
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="reuse,ckpt_sh,split,ckpt_rare")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()

    spark = get_spark("ab-lsh-quality")
    spark.sparkContext.setLogLevel("ERROR")
    from reddit_can_bigdata_spark.tables import load_tables

    warm = load_tables(spark, args.sf_dir)
    warm["documents"].count()
    meter = _Counters(spark.sparkContext)

    rows = {}
    for variant in args.variants.split(","):
        walls, cpus = [], []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"lshq:{variant}#{rep}")
            t0 = time.perf_counter()
            df = (
                build_ckpt_rare(spark, args.sf_dir)
                if variant == "ckpt_rare"
                else build(spark, args.sf_dir, variant)
            )
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            cpus.append(meter.delta()["cpu_s"])
            if rep == 0:
                rows[variant] = [tuple(r) for r in df.collect()]
                meter.delta()
        print(
            f"{variant:10s} wall med {statistics.median(walls):6.3f}"
            f" [{min(walls):6.3f}..{max(walls):6.3f}]"
            f" cpu med {statistics.median(cpus):7.2f}"
            f" [{min(cpus):7.2f}..{max(cpus):7.2f}]"
        )
    base = rows.get("reuse")
    for v, r in rows.items():
        if base is not None and r != base:
            print(f"!! VALUE MISMATCH {v}: {r} vs reuse {base}")
    print("values:", rows.get("reuse"))


if __name__ == "__main__":
    main()
