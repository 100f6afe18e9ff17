"""Structured Streaming semantics tests (SURVEY §2.8)."""

from __future__ import annotations


def test_stream_batch_equivalence(spark, sf_dir):
    """The availableNow streaming aggregation must equal the batch
    aggregation over the same data — the ST correctness contract."""
    from reddit_can_bigdata_spark.streaming.pipeline import (
        run_stream_to_table,
        windowed_event_counts,
    )
    from reddit_can_bigdata_spark.tables import load_tables

    stream_rows = {
        (r["event_day"], r["event_type"]): r["cnt"]
        for r in run_stream_to_table(spark, sf_dir).collect()
    }
    batch_rows = {
        (r["event_day"], r["event_type"]): r["cnt"]
        for r in windowed_event_counts(load_tables(spark, sf_dir)["events"]).collect()
    }
    assert stream_rows == batch_rows


def test_streaming_dedup_with_watermark(spark, tmp_path):
    """O3/O4 done properly: dropDuplicates over a watermarked stream
    removes duplicate ids within the watermark horizon."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 2, 3, 3, 3],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:01:00",
                    "2024-01-01 00:01:00",
                    "2024-01-01 00:02:00",
                    "2024-01-01 00:02:30",
                    "2024-01-01 00:03:00",
                ]
            ).astype("datetime64[us]"),  # µs so Spark reads TimestampType
            "payload": ["a", "b", "b-dup", "c", "c-dup", "c-dup2"],
        }
    )
    pdf.to_parquet(src / "part0.parquet")

    batch_schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(batch_schema).parquet(str(src))
    # parquet NTZ timestamps -> TIMESTAMP (watermarks require tz-aware)
    stream = stream.withColumn("ts", stream["ts"].cast("timestamp"))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicates(["id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("dedup_test").collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3]
