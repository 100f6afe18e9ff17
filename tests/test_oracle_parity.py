"""Golden-output tests: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 check: row count, column names, and an
order-insensitive comparison of values (floats to 9 significant
digits — the queries themselves already round/stabilize anything
order-dependent, so this tolerance is belt-and-braces)."""

from __future__ import annotations

import math

import pytest

from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        # 9 significant digits
        from decimal import Decimal

        return float(f"{v:.9g}")
    if isinstance(v, (int, str)):
        return v
    return str(v)


def _normalize(rows, cols):
    out = []
    for row in rows:
        d = dict(zip(cols, row))
        out.append(tuple(_norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        assert len(spark_rows) >= 0  # rows-only smoke
        return

    res = duck.execute(spec.oracle)
    duck_cols = [c[0] for c in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows, first 3: {mismatches[:3]}"
