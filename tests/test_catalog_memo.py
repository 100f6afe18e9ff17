"""The per-process catalog memo in tables.load_tables (round 11).

Plan-handle reuse only: identical (session, dir, file-listing
fingerprint) calls return the same DataFrame handles without
re-reading parquet footers; any file rewrite (mtime/size change)
invalidates; an interleaved load of a different sf_dir must not leave
the temp views pointing at the wrong physical tables.
"""

from __future__ import annotations

import os
import shutil

import pytest

from reddit_can_bigdata_spark.tables import load_tables


@pytest.fixture(scope="module")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_memo_hit_returns_same_handles(spark, sf_dir):
    a = load_tables(spark, sf_dir)
    b = load_tables(spark, sf_dir)
    assert set(a) == set(b)
    for name in a:
        # same JVM plan handle — no footer re-read happened
        assert a[name]._jdf.equals(b[name]._jdf)


def test_memo_returns_fresh_dict(spark, sf_dir):
    a = load_tables(spark, sf_dir)
    a["lineitem"] = None  # caller mutates its copy
    b = load_tables(spark, sf_dir)
    assert b["lineitem"] is not None


def test_rewrite_invalidates(spark, sf_dir, tmp_path):
    work = tmp_path / "sfcopy"
    work.mkdir()
    for f in os.listdir(sf_dir):
        shutil.copy2(os.path.join(sf_dir, f), work / f)
    a = load_tables(spark, str(work))
    # rewrite one table in place (byte-identical content, new mtime)
    li = work / "lineitem.parquet"
    data = li.read_bytes()
    li.write_bytes(data)
    b = load_tables(spark, str(work))
    assert not a["lineitem"]._jdf.equals(b["lineitem"]._jdf)
    # unchanged key keeps memoizing afterward
    c = load_tables(spark, str(work))
    assert b["lineitem"]._jdf.equals(c["lineitem"]._jdf)


def test_interleaved_dirs_repoint_views(spark, sf_dir, tmp_path):
    work = tmp_path / "sfother"
    work.mkdir()
    for f in os.listdir(sf_dir):
        shutil.copy2(os.path.join(sf_dir, f), work / f)
    full = load_tables(spark, sf_dir)
    n_full = full["lineitem"].count()
    other = load_tables(spark, str(work))
    # shrink the copy so the two dirs are distinguishable via the view
    other["lineitem"].limit(5).write.mode("overwrite").parquet(
        str(tmp_path / "li5")
    )
    spark.read.parquet(str(tmp_path / "li5")).write.mode("overwrite").parquet(
        str(work / "lineitem2.parquet")
    )
    shutil.rmtree(work / "lineitem.parquet", ignore_errors=True)
    (work / "lineitem.parquet").unlink(missing_ok=True)
    os.rename(work / "lineitem2.parquet", work / "lineitem.parquet")
    load_tables(spark, str(work))  # view 'lineitem' -> 5-row copy
    assert spark.sql("SELECT COUNT(*) c FROM lineitem").first()["c"] == 5
    # memo hit on the original dir must re-register the views
    load_tables(spark, sf_dir)
    assert (
        spark.sql("SELECT COUNT(*) c FROM lineitem").first()["c"] == n_full
    )
