"""The `reddit_rest_stream` Python streaming DataSource: offset
planning, executor-side partition reads, and — the property that makes
it a Kafka stand-in — resume from the COMMITTED offset on restart.
(Content correctness of the full round trip is hash-checked against
DuckDB via test_oracle_parity / `streaming_pyds_source`.)"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from reddit_can_bigdata_spark.sources.pyds import (
    RedditRestDataSource,
    RedditStreamDataSource,
    RedditStreamReader,
)


@pytest.fixture(scope="module")
def capture_files(tmp_path_factory):
    """Four JSON-lines capture files of 25 synthetic listing children
    each, ids globally unique so dupes/loss are detectable."""
    root = tmp_path_factory.mktemp("captures")
    paths = []
    for f in range(4):
        p = root / f"capture-{f:02d}.jsonl"
        with open(p, "w", encoding="utf-8") as fh:
            for i in range(25):
                fh.write(
                    json.dumps(
                        {
                            "id": f"t3_{f:02d}_{i:02d}",
                            "title": f"post {f}/{i}",
                            "subreddit": f"sub{i % 3}",
                            "score": f * 100 + i,
                        }
                    )
                    + "\n"
                )
        paths.append(str(p))
    return paths


def test_offset_slicing_plans_only_requested_files(capture_files):
    r = RedditStreamReader({"paths": ",".join(capture_files)})
    assert r.initialOffset()["index"] == 0
    assert r.latestOffset()["index"] == 4
    parts = r.partitions({"index": 1}, {"index": 3})
    assert [p.value for p in parts] == sorted(capture_files)[1:3]
    # an end offset beyond the currently-listed files must not plan
    # phantom partitions (restart with fewer files listed than
    # committed; bare-index offsets — an old checkpoint — are clamped)
    assert len(r.partitions({"index": 0}, {"index": 99})) == 4


def test_offsets_are_self_describing_and_fail_loudly_on_drift(
    capture_files, tmp_path
):
    """Round-9 advice (medium): an offset carries the md5 of the exact
    file prefix it was committed against. If a late-arriving capture
    sorts BEFORE already-committed files, bare indices would silently
    re-read some files and skip others; the prefix check must turn
    that into a loud planning error instead."""
    from pathlib import Path

    r = RedditStreamReader({"paths": ",".join(capture_files)})
    committed = r.latestOffset()  # covers all four sorted files
    # a fifth file arrives whose name sorts FIRST (same directory, so
    # full-path sort order is decided by the file name)
    cap_dir = Path(capture_files[0]).parent
    early = cap_dir / "capture--00.jsonl"
    early.write_text(json.dumps({"id": "t3_early", "title": "x"}) + "\n")
    r2 = RedditStreamReader(
        {"paths": ",".join(capture_files + [str(early)])}
    )
    # same prefix -> fine: planning [committed, latest) after a
    # late-arriving file that sorts AFTER the committed prefix
    sane = RedditStreamReader(
        {"paths": ",".join(capture_files + [str(cap_dir / "z-late.jsonl")])}
    )
    assert len(sane.partitions(committed, sane.latestOffset())) == 1
    # shifted prefix -> refuse
    with pytest.raises(ValueError, match="no longer matches"):
        r2.partitions(committed, r2.latestOffset())


def test_manifest_listing_picks_up_appended_files(spark, capture_files, tmp_path):
    """Verdict item #6: the at-scale listing form — an append-only
    manifest file re-listed per latestOffset call. New capture files
    appear to the RUNNING query between micro-batches via manifest
    append; offsets are line counts and resume is unchanged."""
    manifest = tmp_path / "captures.manifest"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(RedditStreamDataSource)

    def run_available():
        q = (
            spark.readStream.format("reddit_rest_stream")
            .option("manifest", str(manifest))
            .load()
            .writeStream.foreachBatch(
                lambda bdf, _bid: bdf.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    manifest.write_text("\n".join(capture_files[:2]) + "\n")
    run_available()
    assert len(_ids(spark, out_dir)) == 50
    # two more captures arrive: append lines, restart from checkpoint —
    # only the new files are read (no dupes, no loss)
    with open(manifest, "a", encoding="utf-8") as fh:
        fh.write("\n".join(capture_files[2:]) + "\n")
    run_available()
    ids = _ids(spark, out_dir)
    assert len(ids) == 100 and len(set(ids)) == 100


def _run_stream(spark, paths, ckpt, out_dir):
    spark.dataSource.register(RedditStreamDataSource)
    stream = (
        spark.readStream.format("reddit_rest_stream")
        .option("paths", ",".join(paths))
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _ids(spark, out_dir):
    from reddit_can_bigdata_spark.schemas import POST_SCHEMA

    return sorted(
        r["id"]
        for r in spark.read.schema(POST_SCHEMA).parquet(out_dir).select("id").collect()
    )


def test_restart_resumes_from_committed_offset(spark, capture_files, tmp_path):
    """Phase 1 consumes files 0-1; the restart lists all four files
    against the SAME checkpoint and must read ONLY files 2-3: the
    final sink equals a one-shot run — no loss, no dupes."""
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "sink")
    _run_stream(spark, capture_files[:2], ckpt, out_dir)
    phase1 = _ids(spark, out_dir)
    assert len(phase1) == 50 and len(set(phase1)) == 50

    _run_stream(spark, capture_files, ckpt, out_dir)
    final = _ids(spark, out_dir)

    oneshot_dir = str(tmp_path / "oneshot")
    _run_stream(spark, capture_files, str(tmp_path / "ckpt2"), oneshot_dir)
    assert final == _ids(spark, oneshot_dir)
    assert len(final) == 100 and len(set(final)) == 100


def test_stream_matches_batch_datasource(spark, capture_files, tmp_path):
    """The streaming source and the batch `reddit_rest` source apply
    the identical normalization: same rows either way."""
    out_dir = str(tmp_path / "sink")
    _run_stream(spark, capture_files, str(tmp_path / "ckpt"), out_dir)
    from reddit_can_bigdata_spark.schemas import POST_SCHEMA

    streamed = spark.read.schema(POST_SCHEMA).parquet(out_dir)
    spark.dataSource.register(RedditRestDataSource)
    batch = (
        spark.read.format("reddit_rest")
        .option("paths", ",".join(capture_files))
        .load()
    )
    cols = sorted(streamed.columns)
    assert sorted(map(tuple, streamed.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )
    shutil.rmtree(out_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# the reddit_rest_sink exactly-once commit protocol
# ---------------------------------------------------------------------------


class _Row:
    def __init__(self, **kw):
        self._d = kw

    def asDict(self, recursive=False):
        return dict(self._d)


def _writer(path):
    from reddit_can_bigdata_spark.sources.pyds import RedditStreamSinkWriter

    return RedditStreamSinkWriter({"path": str(path)})


def _staging_clean(path) -> bool:
    """True if the staging dir is gone (swept) or empty."""
    staging = os.path.join(str(path), ".staging")
    return not os.path.exists(staging) or not os.listdir(staging)


def test_sink_commit_publishes_and_replay_is_idempotent(tmp_path):
    """A batchId already in the manifest must not publish twice — the
    crash-between-sink-commit-and-offset-commit replay leg."""
    from reddit_can_bigdata_spark.sources.pyds import (
        sink_committed_files,
        sink_manifest,
    )

    w = _writer(tmp_path)
    m1 = w.write(iter([_Row(doc_id=1, lang="en"), _Row(doc_id=2, lang="fr")]))
    w.commit([m1], batchId=0)
    assert [b["batch"] for b in sink_manifest(str(tmp_path))] == [0]
    first = sorted(sink_committed_files(str(tmp_path)))
    assert len(first) == 1 and m1.n_rows == 2

    # Spark replays batch 0 after a simulated crash: new attempt, new
    # staging file, same batchId
    m1b = w.write(iter([_Row(doc_id=1, lang="en"), _Row(doc_id=2, lang="fr")]))
    w.commit([m1b], batchId=0)
    assert [b["batch"] for b in sink_manifest(str(tmp_path))] == [0]
    assert sorted(sink_committed_files(str(tmp_path))) == first
    assert _staging_clean(tmp_path), "replay staging not cleaned"

    w.commit([w.write(iter([_Row(doc_id=3, lang="de")]))], batchId=1)
    assert [b["batch"] for b in sink_manifest(str(tmp_path))] == [0, 1]
    assert len(sink_committed_files(str(tmp_path))) == 2


def test_sink_restarted_writer_still_skips_replayed_batch(tmp_path):
    """Verdict item #5's done-criterion: the max-committed batchId is
    CACHED in the writer (one integer compare per commit instead of an
    O(batches) manifest re-parse), and a brand-new writer instance —
    a query restart — re-reads the manifest once and still skips a
    replayed batchId."""
    from reddit_can_bigdata_spark.sources.pyds import (
        sink_committed_files,
        sink_manifest,
    )

    w = _writer(tmp_path)
    w.commit([w.write(iter([_Row(doc_id=1, lang="en")]))], batchId=0)
    w.commit([w.write(iter([_Row(doc_id=2, lang="fr")]))], batchId=1)
    published = sorted(sink_committed_files(str(tmp_path)))

    w2 = _writer(tmp_path)  # restart: fresh instance, cold cache
    w2.commit([w2.write(iter([_Row(doc_id=2, lang="fr")]))], batchId=1)
    assert [b["batch"] for b in sink_manifest(str(tmp_path))] == [0, 1]
    assert sorted(sink_committed_files(str(tmp_path))) == published
    assert _staging_clean(tmp_path)

    w2.commit([w2.write(iter([_Row(doc_id=3, lang="de")]))], batchId=2)
    assert [b["batch"] for b in sink_manifest(str(tmp_path))] == [0, 1, 2]


def test_sink_commit_sweeps_orphaned_staging_from_failed_attempts(tmp_path):
    """Round-9 advice: a FAILED/retried task attempt leaves a staging
    file that never reaches commit/abort as a message — each retry
    used to leak one orphan forever. commit() now sweeps the staging
    dir wholesale (safe: one batch at a time, all surviving tasks'
    files already published)."""
    from reddit_can_bigdata_spark.sources.pyds import sink_committed_files

    w = _writer(tmp_path)
    orphan = w.write(iter([_Row(doc_id=7, lang="it")]))  # failed attempt
    survivor = w.write(iter([_Row(doc_id=8, lang="pt")]))
    w.commit([survivor], batchId=0)  # orphan's message never delivered
    assert _staging_clean(tmp_path)
    assert not os.path.exists(orphan.staging_path)
    assert len(sink_committed_files(str(tmp_path))) == 1


def test_sink_abort_never_publishes(tmp_path):
    from reddit_can_bigdata_spark.sources.pyds import sink_committed_files

    w = _writer(tmp_path)
    m = w.write(iter([_Row(doc_id=9, lang="xx")]))
    w.abort([m, None], batchId=0)
    assert sink_committed_files(str(tmp_path)) == []
    assert _staging_clean(tmp_path)


def test_sink_end_to_end_exactly_once_restart(spark, sf_dir, tmp_path):
    """Stream half the documents through the sink with availableNow,
    stop, add the rest, restart from the same checkpoint: manifest row
    total equals the table exactly once."""
    import pandas as pd

    from reddit_can_bigdata_spark.sources.pyds import (
        RedditStreamSink,
        sink_committed_files,
        sink_manifest,
    )

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))[
        ["doc_id", "lang", "n_chars"]
    ]
    src = tmp_path / "src"
    src.mkdir()
    half = len(docs) // 2
    docs.iloc[:half].to_parquet(src / "h1.parquet", index=False)

    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(RedditStreamSink)

    def run():
        stream = spark.readStream.schema(
            "doc_id long, lang string, n_chars long"
        ).parquet(str(src))
        q = (
            stream.writeStream.format("reddit_rest_sink")
            .option("path", topic)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert sum(b["rows"] for b in sink_manifest(topic)) == half
    docs.iloc[half:].to_parquet(src / "h2.parquet", index=False)
    run()
    assert sum(b["rows"] for b in sink_manifest(topic)) == len(docs)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        sink_committed_files(topic)
    )
    got = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    assert got == sorted(docs["doc_id"].tolist())


def test_manifest_is_consumed_incrementally(capture_files, tmp_path):
    """At-scale listing cost: latestOffset must read only the bytes
    APPENDED since the last call (byte position advances, cached lines
    grow), tolerate a half-flushed final line until it completes, and
    recover from a truncated manifest by re-reading once."""
    manifest = tmp_path / "m.manifest"
    manifest.write_text(capture_files[0] + "\n")
    r = RedditStreamReader({"manifest": str(manifest)})
    assert r.latestOffset()["index"] == 1
    pos1 = r._mf_pos
    assert pos1 == len(capture_files[0]) + 1

    # append one complete line and one HALF line (no newline yet)
    with open(manifest, "a", encoding="utf-8") as fh:
        fh.write(capture_files[1] + "\n" + capture_files[2][:7])
    assert r.latestOffset()["index"] == 2  # half line not consumed
    assert r._mf_pos == pos1 + len(capture_files[1]) + 1
    # the half line completes
    with open(manifest, "a", encoding="utf-8") as fh:
        fh.write(capture_files[2][7:] + "\n")
    assert r.latestOffset()["index"] == 3
    assert r._list_files() == capture_files[:3]

    # truncation (contract violation) resets and re-reads
    manifest.write_text(capture_files[0] + "\n")
    assert r.latestOffset()["index"] == 1
    assert r._list_files() == capture_files[:1]


def test_prefix_hash_is_maintained_incrementally(
    capture_files, tmp_path, monkeypatch
):
    """At-scale validation cost (round-10 advice): the offsets'
    prefix-md5 must be extended through a rolling state, not recomputed
    over the whole listing each trigger — after the initial listing is
    consumed, appending one line feeds exactly that line to the roller
    in latestOffset, and partitions() validates both offsets with ZERO
    from-scratch hashing. The cached digests must equal the
    from-scratch _prefix_md5 at every index, so the loud-failure drift
    semantics are unchanged."""
    from reddit_can_bigdata_spark.sources import pyds
    from reddit_can_bigdata_spark.sources.pyds import _prefix_md5

    manifest = tmp_path / "m.manifest"
    manifest.write_text("".join(f + "\n" for f in capture_files[:3]))
    r = RedditStreamReader({"manifest": str(manifest)})
    start = r.latestOffset()
    assert start["prefix_md5"] == _prefix_md5(capture_files[:3])

    # meter the roller: count every line fed to it from now on
    fed = {"chars": 0}
    real_extend = r._extend_digests

    def metered(lines):
        fed["chars"] += sum(len(line) for line in lines)
        real_extend(lines)

    r._extend_digests = metered
    # and forbid any from-scratch re-hash on the hot path entirely
    monkeypatch.setattr(
        pyds,
        "_prefix_md5",
        lambda paths: (_ for _ in ()).throw(
            AssertionError("from-scratch prefix hash on the hot path")
        ),
    )
    with open(manifest, "a", encoding="utf-8") as fh:
        fh.write(capture_files[3] + "\n")
    end = r.latestOffset()
    assert fed["chars"] == len(capture_files[3]), fed
    # partitions() validates BOTH offsets without any further hashing
    parts = r.partitions(start, end)
    assert [p.value for p in parts] == [capture_files[3]]
    assert fed["chars"] == len(capture_files[3]), fed

    monkeypatch.undo()
    assert end["prefix_md5"] == _prefix_md5(capture_files[:4])
    # every cached index agrees with the from-scratch definition
    for k in range(5):
        assert r._mf_digests[k] == _prefix_md5(capture_files[:k])
