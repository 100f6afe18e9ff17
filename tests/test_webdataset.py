"""WebDataset tar shard packer: byte determinism, round-trip, and
manifest consistency."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from reddit_can_bigdata_spark.operators.curation import (
    N_SHARDS,
    pack_webdataset_shards,
)


def _docs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def test_roundtrip_entries_and_contents(spark):
    docs = _docs(spark, 40)
    shards = pack_webdataset_shards(docs, n_shards=4).collect()
    assert sum(r["n_entries"] for r in shards) == 40
    seen = {}
    for r in shards:
        with tarfile.open(fileobj=io.BytesIO(bytes(r["tar_bytes"]))) as tf:
            members = tf.getmembers()
            # entries sorted by doc_id inside the shard
            names = [m.name for m in members]
            assert names == sorted(names)
            assert len(members) == r["n_entries"]
            for m in members:
                assert m.mtime == 0 and m.uid == 0 and m.gid == 0
                body = tf.extractfile(m).read()
                seen[int(m.name.split(".")[0])] = body
        assert r["tar_size"] == len(bytes(r["tar_bytes"]))
    assert seen == {
        i: f"document body {i}".encode() for i in range(40)
    }


def test_byte_determinism_across_partitionings(spark):
    """Same corpus, different physical layouts -> byte-identical
    shards (md5 per shard) — the property that makes re-runs and
    retries produce the same training set."""
    docs = _docs(spark, 64)
    a = {
        r["shard_id"]: r["tar_md5"]
        for r in pack_webdataset_shards(docs.repartition(1), 4).collect()
    }
    b = {
        r["shard_id"]: r["tar_md5"]
        for r in pack_webdataset_shards(docs.repartition(13), 4).collect()
    }
    assert a == b and a


def test_null_rows_drop_and_empty_input(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (None, "y"), (2, None)], "doc_id long, text string"
    )
    rows = pack_webdataset_shards(docs, 2).collect()
    assert sum(r["n_entries"] for r in rows) == 1
    empty = docs.where("doc_id < 0")
    assert pack_webdataset_shards(empty, 2).count() == 0


def test_matches_shard_manifest_assignment(spark, sf_dir):
    """The packer's per-shard counts must equal curate_shard_manifest's
    n_docs — one deterministic assignment, two views of it."""
    from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    manifest = {
        r["shard_id"]: r["n_docs"]
        for r in REGISTRY["curate_shard_manifest"].fn(spark, sf_dir).collect()
    }
    packed = {
        r["shard_id"]: r["n_entries"]
        for r in REGISTRY["curate_pack_tar_shards"].fn(spark, sf_dir).collect()
    }
    assert packed == manifest
    assert len(packed) <= N_SHARDS
