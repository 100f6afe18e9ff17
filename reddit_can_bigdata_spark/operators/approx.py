"""Sketch-based approximate aggregates — the 100 TB substitutions.

The exact forms (COUNT DISTINCT, exact percentile) are the oracle
gate; these are the drop-in scale variants the engine swaps in when
an exact global sort/distinct-shuffle stops being worth it
(PERF.md): HyperLogLog++ distinct counts and a quantile sketch.
Accuracy is contract-tested against the exact values in
tests/test_approx.py rather than oracle-hashed (sketches are not
bit-portable across engines by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_user_counts(df: DataFrame, col: str, rsd: float = 0.02) -> DataFrame:
    """A6 at scale: HLL++ distinct count with target relative standard
    deviation. No distinct-shuffle — partial sketches merge."""
    return df.agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
        F.count(col).alias("total"),
    )


def approx_quantiles(df: DataFrame, col: str, probs: list[float], err: float = 0.01) -> list[float]:
    """A9 at scale: Greenwald-Khanna sketch via approxQuantile —
    single pass, bounded error, no global sort."""
    return df.stat.approxQuantile(col, probs, err)
