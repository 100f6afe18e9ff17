"""reddit_can_bigdata_spark — a PySpark-native analytics engine with
the query/data-processing capabilities of salmaJennane/reddit-can-bigdata,
re-expressed Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Entry points:
- ``registry.all_queries()`` / ``all_oracles()`` — the named query
  inventory with DuckDB oracle SQL (the parity surface).
- ``session.get_spark()`` — tuned SparkSession factory.
- ``tables.load_tables()`` — testdata catalog.
"""

__version__ = "0.1.0"
