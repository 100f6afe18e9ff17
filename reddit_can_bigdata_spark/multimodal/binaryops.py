"""Multimodal column plumbing: image/audio/video as opaque binary.

A 100 TB multimodal pipeline stores media as ``binary`` columns (or
pointers) with typed metadata, and runs decode / feature-extract /
resize / frame-sample as Arrow-batched Pandas functions over
``mapInPandas`` — that plumbing (schema, batch shape, partitioning) is
real and tested here; the codec step itself is stubbed because no
image/audio library ships in this container (see ``decode_image``).

Design rules baked in:
- decode runs *after* all relational filtering, so only surviving rows
  pay the Python/Arrow transfer;
- batch-level vectorization: one Python call per Arrow batch, never
  per row;
- output schemas are explicit StructTypes — no schema inference on
  the Python side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_hash", StringType()),
        StructField("feat_mean", LongType()),  # deterministic fake feature
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real codec entry point — intentionally stubbed.

    The container has no PIL/opencv/ffmpeg; a deployment installs one
    and replaces this body. Everything around it (batching, schema,
    partition flow) is independent of the codec.
    """
    raise NotImplementedError(
        "image decoding requires an image library (PIL/opencv) not present "
        "in this environment; wire it in here"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Uses a deterministic fake 'feature' (mean byte value) in place of
    the stubbed codec so the distributed plumbing is fully testable:
    the mapInPandas batch shape, the explicit output schema, and the
    one-Python-call-per-Arrow-batch contract are exactly what a real
    decoder plugs into.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat_mean": payloads.map(
                        lambda b: int(sum(bytes(b)) // max(len(b), 1))
                    ).astype("int64"),
                }
            )

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the media_id (no randomness — reproducible across runs)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") % 3 == 0, "image")
            .when(F.col("id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("kind"),
            F.encode(
                F.concat(F.lit("payload-"), F.col("id").cast("string"), F.lit("-"),
                         F.repeat(F.lit("x"), (F.col("id") % 17 + 1).cast("int"))),
                "utf-8",
            ).alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            (F.col("id") % 640).cast("int").alias("width"),
            (F.col("id") % 480).cast("int").alias("height"),
        )
    )
