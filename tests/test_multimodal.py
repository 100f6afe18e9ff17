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


def test_sample_frames_one_to_n_and_deterministic(spark):
    """Frame sampling: 1 video row -> every-Nth-frame rows, exact
    chunking/indexing, only video rows pass, stable across runs."""
    from reddit_can_bigdata_spark.multimodal.binaryops import (
        FRAME_BYTES,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_n=2)
    rows = frames.collect()
    assert rows, "expected frames"
    # only video rows produce frames
    video_ids = {r["media_id"] for r in media.where("kind = 'video'").collect()}
    assert {r["media_id"] for r in rows} <= video_ids
    # exact chunk semantics against a python reference
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.where("kind = 'video'").collect()
    }
    expected = set()
    for mid, raw in payloads.items():
        chunks = [raw[o : o + FRAME_BYTES] for o in range(0, len(raw), FRAME_BYTES)]
        for i in range(0, len(chunks), 2):
            expected.add((mid, i, chunks[i]))
    got = {(r["media_id"], r["frame_idx"], bytes(r["frame_payload"])) for r in rows}
    assert got == expected
    rerun = {
        (r["media_id"], r["frame_idx"], bytes(r["frame_payload"]))
        for r in sample_frames(media, every_n=2).collect()
    }
    assert rerun == got


def test_resize_media_schema_stable_and_metadata_updated(spark):
    """Resize keeps MEDIA_SCHEMA (composable with every downstream
    op), rewrites payload to the target size, updates width/height."""
    from reddit_can_bigdata_spark.multimodal.binaryops import (
        resize_media,
        synthetic_media,
    )

    media = synthetic_media(spark, 12)
    out = resize_media(media, 64, 64)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in media.schema.fields
    ]
    rows = out.collect()
    assert len(rows) == 12
    target = max(1, 64 * 64 // 1024)
    for r in rows:
        assert len(bytes(r["payload"])) == target
        assert (r["width"], r["height"]) == (64, 64)
    # feature extraction composes on the resized output
    from reddit_can_bigdata_spark.multimodal.binaryops import extract_features

    feats = extract_features(out)
    assert feats.count() == 12


def test_parse_image_headers_jvm_side(spark):
    """Real PNG/GIF byte layouts parse to exact dimensions with zero
    Python in the plan; JPEG detects mime with NULL dims; junk gets
    NULL mime."""
    import struct

    from reddit_can_bigdata_spark.multimodal.binaryops import parse_image_headers
    from reddit_can_bigdata_spark.plans.inspect import formatted_plan

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x06\x00\x00\x00"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    junk = b"not an image at all....."
    df = spark.createDataFrame(
        [(1, png), (2, gif), (3, jpeg), (4, junk)],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in parse_image_headers(df).collect()}
    assert (out[1].mime_detected, out[1].parsed_width, out[1].parsed_height) == (
        "image/png",
        640,
        480,
    )
    assert (out[2].mime_detected, out[2].parsed_width, out[2].parsed_height) == (
        "image/gif",
        320,
        200,
    )
    assert out[3].mime_detected == "image/jpeg"
    assert out[3].parsed_width is None and out[3].parsed_height is None
    assert out[4].mime_detected is None
    assert all(out[i].n_bytes == len(b) for i, b in [(1, png), (2, gif), (3, jpeg), (4, junk)])
    plan = formatted_plan(parse_image_headers(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
