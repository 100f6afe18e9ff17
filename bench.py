"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3);
``queries`` holds per-query MEDIANS (``value`` = sum of medians).
Per-query [min, max] spreads — so a regression is distinguishable
from single-run variance (the round-3 lesson: n=1 made a 27% delta
unattributable) — are written to BENCH_SPREADS.json and stderr, NOT
the stdout line, which must stay short enough for tail-capturing
harnesses (the round-4/5 lesson). Reps of one query run
back-to-back, so rep 2+ benefit from page cache / codegen caches —
the median reflects warm steady-state, which is the comparable
number across rounds.

Each timing covers plan construction + full execution (noop-sink
consumption of every result column/row).
"""

from __future__ import annotations

import json
import os
import statistics
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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, spec in sorted(bench_queries().items()):
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # noop sink materializes every column of every row (a bare
            # count() would let Catalyst prune the computed columns away)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
        print(
            f"# {name}: median {timings[name]:.3f}s"
            f" (min {spread[name][0]:.3f} / max {spread[name][1]:.3f}, n={reps})",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # Spreads go to a SIDE FILE (and stderr), NOT the stdout JSON line:
    # harnesses that capture only the tail of stdout truncated the
    # r4/r5 result line once ~50 queries of [min,max] pairs pushed it
    # past their window, losing the medians entirely. The stdout
    # contract stays one compact line.
    spread_path = Path(__file__).resolve().parent / "BENCH_SPREADS.json"
    try:
        spread_path.write_text(
            json.dumps({"sf": sf, "reps": reps, "spread": spread}, indent=1)
        )
    except OSError as e:  # read-only checkout: stderr still has it all
        print(f"# could not write {spread_path}: {e}", file=sys.stderr)
    print(f"# spread: {json.dumps(spread)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
