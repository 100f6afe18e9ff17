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
from tools.empty_check import make_empty_dir, make_slice_dir, norm as _norm_rows

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
