"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the engine's query
registry (``reddit_can_bigdata_spark/registry.py``): every implemented
operator from SURVEY.md §2 registers a Spark builder and, where
SQL-expressible, an exact DuckDB oracle alongside it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from reddit_can_bigdata_spark import registry  # noqa: E402


_REPO_ROOT = str(Path(__file__).resolve().parent)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: influencer ranking
    (groupBy rollup → decimal-exact totals → window rank top-20),
    SURVEY.md §2.5 W2/W3."""
    fn = registry.all_queries()["w2_influencer_ranking"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline extras: dedup, similarity, text analysis,
    graph, streaming).

    Ordered least-externally-checked-first (driver samples the first 50
    per round); rotation state comes from this repo's CORRECTNESS_r*.json
    artifacts so every query earns an external row within ceil(N/50)
    rounds.  The library API (``registry.all_queries``) stays in stable
    registration order — the rotation is a driver-contract concern only.
    """
    return registry.rotated_queries(_REPO_ROOT)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query that is SQL-expressible.
    Keys missing here get the rows-only check."""
    return registry.rotated_oracles(_REPO_ROOT)
