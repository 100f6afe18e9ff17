"""Multimodal binary-column plumbing tests (mapInPandas path)."""

from __future__ import annotations

import hashlib

import pytest


def test_extract_features_schema_and_determinism(spark):
    from reddit_can_bigdata_spark.multimodal.binaryops import (
        FEATURES_SCHEMA,
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=32).repartition(4)  # multi-partition batch path
    feats = extract_features(media)
    assert feats.schema == FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    # cross-check one row against a local computation
    payload = b"payload-7-" + b"x" * 8  # id 7 -> 7 % 17 + 1 = 8
    assert rows[7]["payload_hash"] == hashlib.md5(payload).hexdigest()
    assert rows[7]["n_bytes"] == len(payload)
    assert rows[7]["feat_mean"] == sum(payload) // len(payload)


def test_decode_is_explicitly_stubbed():
    from reddit_can_bigdata_spark.multimodal.binaryops import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
