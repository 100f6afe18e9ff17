"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each timing covers plan construction + full execution (count-style
consumption of every result row) — cold caches except the shared
SparkSession and the OS page cache.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from reddit_can_bigdata_spark.registry import bench_queries
from reddit_can_bigdata_spark.session import DEFAULT_SF_DIR, get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM/codegen/parquet-reader paths once so the first
    # measured query doesn't absorb ~4s of session startup.
    from reddit_can_bigdata_spark.tables import load_tables

    warm = load_tables(spark, sf_dir)
    warm["documents"].count()
    warm["lineitem"].groupBy("l_returnflag").count().collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(bench_queries().items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # noop sink materializes every column of every row (a bare
        # count() would let Catalyst prune the computed columns away)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
