"""TPC-H-shaped multi-join analytics.

The reference never joins more than two relations at once; a general
engine must chain dimension joins and compute conditional revenue
shares. These queries exercise the multi-way broadcast-join path and
decimal-exact revenue arithmetic (modeled on TPC-H Q5/Q14 shapes, the
standard public benchmarks for this pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from reddit_can_bigdata_spark.operators.common import tables
from reddit_can_bigdata_spark.registry import register

# Exact revenue term: decimal multiply (no float drift), see PERF.md.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(9,4))"
)
def _rev() -> F.Column:
    # built lazily: lit() needs an active SparkContext at call time
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(9,4)")


@register(
    "multiway_region_revenue",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY region, nation
    """,
    tags=("join", "multiway", "agg"),
    bench=True,
)
def multiway_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: fact table through a 3-level dimension chain
    (supplier → nation → region), revenue per (region, nation).

    Plan: all three dims broadcast (supplier/nation/region are tiny
    relative to lineitem at every scale), so lineitem streams through
    three BroadcastHashJoins inside one codegen stage and shuffles
    only the (region, nation) partial aggregates — the textbook
    star-schema plan at 100 TB.
    """
    t = tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["region"]), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
    )


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT ROUND(CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE), 12) AS promo_share,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    """,
    tags=("join", "agg", "conditional"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: conditional revenue share for PROMO parts.
    One broadcast join + one aggregate; both sums are decimal-exact,
    and the double ratio is rounded to 12 decimals because Spark's and
    DuckDB's decimal->double cast can land on adjacent ULPs."""
    t = tables(spark, sf_dir)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _rev())).cast("double")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(promo / F.sum(_rev()).cast("double"), 12).alias("promo_share"),
            F.count("*").alias("n_items"),
        )
    )
