"""Stateful streaming via Spark 4's transformWithStateInPandas — the
NEW arbitrary-state API (SPARK-40434 successor to
applyInPandasWithState): typed state handles, multiple state
variables, timers. Here: per-user MILESTONE detection, the running
lifetime-counter pattern (loyalty tiers, rate-limit thresholds,
"user's 1000th event" triggers).

Semantics are deliberately BATCH-INVARIANT: a milestone row is
emitted when a user's cumulative event count (ordered by event time,
ties by event_id) crosses a multiple of MILESTONE_EVERY. The output
depends only on the event ORDER, never on how the stream was
micro-batched — which is what makes an exact SQL oracle possible for
a stateful streaming query.

Scale: state is ONE bigint per user (the lifetime count) in the
value-state store — O(users), no growth with events; each micro-batch
moves only that batch's rows through Arrow.

ENVIRONMENT GATE (the Kafka precedent): executing transformWithState
requires the `protobuf` package (the state-server protocol of the
new API's Python driver worker, verified by running it: the worker
dies with `ImportError: google.protobuf` here) — absent from this
container and not installable. So the QUERY registers only when
protobuf is importable; in this sandbox the plan-construction smoke
test pins everything up to query start, and the oracle SQL documents
the exact expected output for a deployment that has protobuf.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

from reddit_can_bigdata_spark.registry import register

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

import importlib.util as _ilu

try:  # find_spec raises if the parent 'google' namespace is absent
    TWS_RUNTIME_AVAILABLE = _ilu.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    TWS_RUNTIME_AVAILABLE = False


def _register_if_runnable(name: str, oracle: str, tags: tuple):
    """Register the query only where the TWS runtime can actually
    execute (a registered query that crashes would fail the driver's
    whole sample round)."""
    if TWS_RUNTIME_AVAILABLE:
        return register(name, oracle=oracle, tags=tags)
    return lambda fn: fn

MILESTONE_EVERY = 50

MILESTONE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("milestone", LongType()),
        StructField("tus", LongType()),
    ]
)

_COUNT_STATE_SCHEMA = StructType([StructField("n", LongType())])


class MilestoneProcessor(StatefulProcessor):
    """Value-state lifetime counter; emits one row per crossed
    multiple of MILESTONE_EVERY."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("lifetime_count", _COUNT_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: "Iterator[pd.DataFrame]", timerValues
    ) -> "Iterator[pd.DataFrame]":
        import pandas as pd

        (user_id,) = key
        batch = pd.concat(list(rows), ignore_index=True)
        # deterministic fold order: event time, then event_id (replay-stable)
        batch = batch.sort_values(["tus", "event_id"], kind="mergesort")
        n = self._count.get()[0] if self._count.exists() else 0
        out = []
        for tus in batch["tus"].tolist():
            n += 1
            if n % MILESTONE_EVERY == 0:
                out.append((user_id, n, int(tus)))
        self._count.update((n,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "milestone", "tus"])

    def close(self) -> None:
        pass


def milestones_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts) -> milestone rows via the new
    arbitrary-state API."""
    prepared = events.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("tus")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=MilestoneProcessor(),
        outputStructType=MILESTONE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def run_milestones_stream(
    spark, source_dir: str, checkpoint_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Drive the milestone processor as a real availableNow streaming
    query over a parquet file-stream; returns the materialized
    milestone table."""
    import uuid

    raw_schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(stream.dtypes)["ts"] != "timestamp":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    name = f"milestones_{uuid.uuid4().hex[:8]}"
    q = (
        milestones_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        return spark.table(name).localCheckpoint(eager=True)
    finally:
        if q.isActive:
            q.stop()
        spark.catalog.dropTempView(name)


@_register_if_runnable(
    "streaming_user_milestones",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    )
    SELECT user_id, CAST(rn AS BIGINT) AS milestone, CAST(tus AS BIGINT) AS tus
    FROM ordered WHERE rn % {MILESTONE_EVERY} = 0
    """,
    tags=("streaming", "stateful", "transformWithState"),
)
def streaming_user_milestones(spark, sf_dir: str) -> DataFrame:
    """ST-custom via the NEW transformWithStateInPandas API: per-user
    lifetime milestone rows from a REAL availableNow streaming run,
    hash-checked against the plain window-function SQL (possible
    because the emission rule is batch-invariant — see module
    docstring). State: one bigint per user."""
    import os
    import shutil
    import tempfile
    import uuid

    from reddit_can_bigdata_spark.operators.common import tables

    tables(spark, sf_dir)  # sets the nanos-as-long conf for the raw read
    path = os.path.join(sf_dir, "events.parquet")
    tag = uuid.uuid4().hex[:8]
    stream_dir = os.path.join(tempfile.gettempdir(), f"twsstream_{tag}")
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_tws_{tag}")
    os.makedirs(stream_dir, exist_ok=True)
    os.symlink(os.path.abspath(path), os.path.join(stream_dir, "events.parquet"))
    try:
        return run_milestones_stream(spark, stream_dir, ckpt)
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
