"""Empty-input degradation: queries must return well-defined results
(not stack traces) when every table has zero rows, and must still agree
with their DuckDB oracles there.

This pins the fix for the round-5 empty-input fuzz findings
(``tools/empty_check.py``): seven Spark-side crashes (ANSI
DIVIDE_BY_ZERO in graph density / clustering / funnel percentages,
Python ``1/N`` and ``int(None)`` in PageRank / k-core / the influencer
composites) and the three ROLLUP/CUBE queries where Spark emits no
grand-total row on empty input while the SQL standard (and DuckDB)
emits one — repaired scan-free by ``common.standard_grand_total``.

The whole-registry fuzz stays a tool (15 min); this suite re-runs just
the queries that ever failed it, so the class stays pinned cheaply.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from reddit_can_bigdata_spark import registry
from reddit_can_bigdata_spark.tables import TABLE_NAMES
from tools.empty_check import (
    make_empty_dir,
    make_nulls_dir,
    make_slice_dir,
    make_textfuzz_dir,
    norm as _norm_rows,
)

FIXED = [
    "g8_graph_metadata",
    "g9_triangles_clustering",
    "g6_pagerank",
    "g12_kcore",
    "funnel_conversion",
    "influencer_composite_top20",
    "rollup_priority_status",
    "cube_priority_status",
    "hypertable_rollup",
]


@pytest.fixture(scope="module")
def empty_dir() -> str:
    return make_empty_dir()


@pytest.fixture(scope="module")
def duck(empty_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(empty_dir, t)}.parquet'"
        )
    yield con
    con.close()


_norm = _norm_rows  # one shared normalizer with the whole-registry fuzz tool


@pytest.mark.parametrize("name", FIXED)
def test_empty_input_matches_oracle(spark, empty_dir, duck, name):
    registry._ensure_loaded()
    spec = registry.REGISTRY[name]
    sdf = spec.fn(spark, empty_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(spec.oracle)
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _norm(srows, sdf.columns) == _norm(drows, dcols)


SINGLE_ROW_FIXED = [
    # LIMIT-1 fuzz finding: min-max normalization over a single user
    # (max == min) divided by zero — must yield NULL on both engines
    "w5_w6_normalized_composite",
]


@pytest.mark.parametrize("name", SINGLE_ROW_FIXED)
def test_single_row_input_matches_oracle(spark, name):
    """The n=1 slice exercises the single-sample edge (degenerate
    normalization ranges, stddev/percentile of one) that neither the
    empty fuzz nor full-SF parity reaches."""
    registry._ensure_loaded()
    one_dir = make_slice_dir(1)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(one_dir, t)}.parquet'"
        )
    spec = registry.REGISTRY[name]
    sdf = spec.fn(spark, one_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(spec.oracle)
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _norm(srows, sdf.columns) == _norm(drows, dcols)


# NULL-injection fuzz findings (tools/empty_check.py --nulls): the 19
# queries that ever diverged when every 5th row of each non-key column
# is NULL. Classes fixed: NULL embeddings (DuckDB list_reduce raises
# where Spark yields NULL — both sides now filter), NULL event times
# (engines' window null-ordering defaults differ — both sides now
# exclude), NULL group names at a LIMIT boundary (explicit NULLS LAST),
# null-safe SCD2 change detection (IS DISTINCT FROM / eqNullSafe),
# UNPIVOT INCLUDE NULLS, a zero-weight EWMA window (try_divide), and
# (round 8) a NULL shard key breaking the pack-firstfit oracle's
# recursive chain after rn=1 (= vs IS NOT DISTINCT FROM — Spark's
# groupBy treats NULL as one group).
NULLS_FIXED = [
    "pretrain_pack_firstfit",
    "sim_topk_bruteforce",
    "dedup_embedding_lsh",
    "sim_knn_join",
    "sim_semantic_dedup",
    "ewma_anomaly_daily",
    "streaming_windowed_counts",
    "sessionize_events",
    "session_window_agg",
    "w_lag_daily_change",
    "tpch_q21_waiting_suppliers",
    "scd2_user_event_type",
    "scd2_point_in_time_join",
    "unpivot_lineitem_measures",
]


@pytest.fixture(scope="module")
def nulls_ctx():
    nulls_dir = make_nulls_dir()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(nulls_dir, t)}.parquet'"
        )
    yield nulls_dir, con
    con.close()


@pytest.mark.parametrize("name", NULLS_FIXED)
def test_null_injected_input_matches_oracle(spark, nulls_ctx, name):
    nulls_dir, con = nulls_ctx
    registry._ensure_loaded()
    spec = registry.REGISTRY[name]
    sdf = spec.fn(spark, nulls_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(spec.oracle)
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _norm(srows, sdf.columns) == _norm(drows, dcols)


# Adversarial-Unicode fuzz findings (tools/empty_check.py --textfuzz):
# the queries that diverged on hostile text. Root cause was the İ/U+0130
# case mapping (Java's full mapping expands to 'i'+U+0307, DuckDB's
# simple mapping gives 'i') — both sides now collapse exactly that
# artifact ('i'+U+0307 -> 'i') after lowercasing, leaving genuine
# combining marks (Indic matras, Arabic points) intact in both engines.
TEXTFUZZ_FIXED = [
    "f1_clean_text_etl",
    "text_bpeish_token_count",
    # round 6: syllable runs would split on 'i'+U+0307 in Spark only
    "text_readability",
]


@pytest.mark.parametrize("name", TEXTFUZZ_FIXED)
def test_adversarial_text_matches_oracle(spark, name):
    registry._ensure_loaded()
    fuzz_dir = make_textfuzz_dir()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(fuzz_dir, t)}.parquet'"
        )
    spec = registry.REGISTRY[name]
    sdf = spec.fn(spark, fuzz_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(spec.oracle)
    dcols = [c[0] for c in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _norm(srows, sdf.columns) == _norm(drows, dcols)


def test_grand_total_row_values(spark, empty_dir):
    """The SQL-standard () grouping set on empty input: COUNT 0, sums
    NULL, all group columns NULL — exactly one row."""
    registry._ensure_loaded()
    rows = registry.REGISTRY["rollup_priority_status"].fn(spark, empty_dir).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["cnt"] == 0
    assert r["total_price"] is None
    assert r["o_orderpriority"] is None and r["o_orderstatus"] is None
