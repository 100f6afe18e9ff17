"""Time-series operators the brief names as custom-operator examples:
hypertable-style multi-resolution rollup and a bucketed range join.

Both are pure DataFrame compositions (no UDFs) with exact DuckDB
oracles. Float stability: event values are summed in DECIMAL so the
result is associative (parallelism-independent) and cast to double
once at the end — the engine's standard money-sum rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from reddit_can_bigdata_spark.operators.common import tables
from reddit_can_bigdata_spark.registry import register

SESSION_GAP_US = 1_800_000_000  # 30 min, matches sessionize_events


@register(
    "hypertable_rollup",
    oracle="""
    WITH base AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS hour,
             value
      FROM events
    )
    SELECT CASE WHEN hour IS NOT NULL THEN 'hour'
                WHEN day IS NOT NULL THEN 'day'
                WHEN month IS NOT NULL THEN 'month'
                ELSE 'all' END AS resolution,
           coalesce(hour, day, month, '*') AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM base
    GROUP BY ROLLUP(month, day, hour)
    """,
    tags=("timeseries", "rollup", "hypertable"),
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour, day, month, and
    grand-total resolutions of the events table computed in ONE pass
    via ROLLUP over the derived (month, day, hour) hierarchy — the
    multi-resolution materialized view a TimescaleDB-style hypertable
    maintains, as a single grouping-sets aggregate (one shuffle covers
    every resolution; partial aggregation is per grouping set).

    At 100 TB this output IS the serving table: write it partitioned
    by resolution and queries hit the right granularity without
    rescanning raw events."""
    ev = tables(spark, sf_dir)["events"]
    base = ev.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
        "value",
    )
    res = (
        F.when(F.col("hour").isNotNull(), "hour")
        .when(F.col("day").isNotNull(), "day")
        .when(F.col("month").isNotNull(), "month")
        .otherwise("all")
    )
    return (
        base.rollup("month", "day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            res.alias("resolution"),
            F.coalesce("hour", "day", "month", F.lit("*")).alias("bucket"),
            "n_events",
            "total_value",
        )
    )


@register(
    "range_join_sessions",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_US}
                  OR lag(epoch_us(CAST(ts AS TIMESTAMP)))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, tus,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    ),
    windows AS (
      SELECT user_id, CAST(MIN(tus) AS BIGINT) AS start_us,
             CAST(MAX(tus) AS BIGINT) AS end_us
      FROM sess GROUP BY user_id, sid
    )
    SELECT e.event_id, e.user_id, w.start_us AS session_start_us
    FROM events e JOIN windows w
      ON w.user_id = e.user_id
     AND epoch_us(CAST(e.ts AS TIMESTAMP)) BETWEEN w.start_us AND w.end_us
    """,
    tags=("timeseries", "range-join"),
)
def range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join, bucketed: assign every event to the
    session window [start, end] that contains it.

    Spark has no interval-join operator; the naive formulation
    (equi-join on user + BETWEEN refinement) degenerates into
    per-user cartesian work when users have many windows. The
    scale-correct composition used here: explode each window into the
    DAYS it spans, bucket events by day, EQUI-join on (user, day) —
    partitionable, no inequality blowup — then refine with the exact
    BETWEEN predicate. Each candidate pairing is checked once; a
    window spanning k days appears in k buckets (k is tiny for
    session-scale windows).

    The windows are the users' own >30-min-gap sessions, so the
    result is exactly oracle-checkable against a plain inequality
    join in DuckDB."""
    ev = tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "tus",
        F.when(
            (F.col("tus") - F.lag("tus").over(w) > SESSION_GAP_US)
            | F.lag("tus").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
        F.col("event_id").alias("eid"),
    )
    sess = gaps.withColumn(
        "sid",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("tus", "eid")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    windows = sess.groupBy("user_id", "sid").agg(
        F.min("tus").alias("start_us"), F.max("tus").alias("end_us")
    )
    # bucket windows by the days they span; bucket events by their day
    wb = windows.select(
        "user_id",
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.to_date(F.timestamp_micros(F.col("start_us"))),
                F.to_date(F.timestamp_micros(F.col("end_us"))),
            )
        ).alias("day"),
    )
    eb = ev.select("event_id", "user_id", "tus", F.to_date("ts").alias("day"))
    return (
        eb.join(wb, ["user_id", "day"])
        .where(F.col("tus").between(F.col("start_us"), F.col("end_us")))
        .select("event_id", "user_id", F.col("start_us").alias("session_start_us"))
    )
