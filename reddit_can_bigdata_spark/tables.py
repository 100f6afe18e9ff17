"""Table catalog: load the driver-generated parquet tables.

The reference loads whole MongoDB collections into pandas
(``dashboard/dashboard.py:148-155``); here every table is a columnar
parquet scan, so Catalyst pushes filters and prunes columns down to the
file reader for free. ``load_tables`` registers one temp view per
table so every query is also runnable via ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame and register temp views.

    At 100 TB these would be partitioned tables (e.g. ``orders`` by
    ``o_orderdate`` month, ``events`` by ``ts`` day) registered in a
    metastore; the query code below only depends on the view names, so
    swapping the physical layout is transparent to every operator.
    """
    # events.parquet stores TIMESTAMP(NANOS), which Spark rejects unless
    # read as long (converted back to timestamp below). Set defensively
    # here: the harness/driver may hand us a session built without it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
            # parquet TIMESTAMP(NANOS) read as epoch-nanos long (see
            # session.py nanosAsLong); values are µs-precision so the
            # div-1000 conversion is lossless.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif name == "events" and isinstance(
            df.schema["ts"].dataType, TimestampNTZType
        ):
            # parquet naive timestamp[us] reads as TIMESTAMP_NTZ under
            # Spark 4's inferTimestampNTZ; functions like unix_micros
            # require TIMESTAMP. Session tz is pinned to UTC
            # (session.py), so this cast preserves the wall clock and
            # matches DuckDB's naive reading of the same file.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
