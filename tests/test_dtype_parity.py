"""Pandas-representation parity: every oracle column must land on the
same dtype KIND (int / float / decimal-object / string-object / bool /
timestamp) as the Spark result when both are fetched through their
pandas client APIs.

Why this matters even though values already match: an external
verifier that hashes pandas-rendered cells sees "520.0" != "520" when
one engine's column arrives as float64 and the other's as int64 — a
pure representation mismatch with zero value difference. Two real
offenders (driver round-5 red rows, both value-identical):

- DuckDB ``SUM(BIGINT)`` returns HUGEINT, which ``.df()`` renders as
  float64; Spark's window/aggregate sum stays BIGINT -> int64. Fix:
  ``CAST(SUM(..) AS BIGINT)`` in the oracle (curate_token_budget).
- ``DECIMAL(38,0)`` comes back float64 from DuckDB's pandas API but as
  ``decimal.Decimal`` objects from Spark's. Fix: emit BIGINT
  (table_checksum_lineitem's checksum_sum, now the sum mod 10^18).

Nullable-int columns are NOT a problem: BOTH engines degrade an int64
column containing NULLs to float64 (NaN), so the kinds still agree —
asserted here rather than special-cased.

Runs each query once per engine at the session SF (sf0.001 default),
so it is the most expensive structural test in the suite; it exists
because this failure class is invisible to every value-level check.
"""

from __future__ import annotations

import pytest

from reddit_can_bigdata_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _kind(dtype) -> str:
    s = str(dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if s.startswith("datetime"):
        return "ts"
    return "obj"


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)
)
def test_pandas_dtype_kinds_match(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    ddf = duck.execute(spec.oracle).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    bad = {
        c: (str(sdf[c].dtype), str(ddf[c].dtype))
        for c in sdf.columns
        if _kind(sdf[c].dtype) != _kind(ddf[c].dtype)
    }
    assert not bad, (
        f"{name}: pandas dtype-kind mismatch (spark, duck) = {bad} — an "
        "external verifier hashing rendered cells will flag this even "
        "though the values are identical; cast the oracle (or the Spark "
        "side) so both engines emit the same kind"
    )
