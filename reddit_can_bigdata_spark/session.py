"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every setting here is chosen to
also make sense on a large multi-executor cluster reading ~100 TB:

- **AQE on** (coalesce shuffle partitions, skew-join handling, runtime
  join-strategy switches) so plans re-optimize with real statistics.
- **Arrow on** for the few Pandas-UDF paths (similarity / multimodal);
  everything else stays JVM-side in whole-stage codegen.
- **UTC session timezone** so timestamp semantics are deterministic and
  independent of the host machine.
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster AQE coalesces from a deliberately high initial
  number, so we set the *initial* partition number high and let AQE
  shrink it (cheap locally, correct at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "reddit-can-bigdata-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``shuffle_partitions`` is the *initial* shuffle parallelism; AQE
    coalesces it downward at runtime, so at cluster scale this should
    be sized to ~2-3x total executor cores and left to AQE.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{CPUS}]")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type, so read as long and convert in tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
