"""Strict driver-style check: exact value comparison (no float tolerance)
for a set of registered queries at a given SF dir.

Usage: python tools/exact_check.py [sf_dir] [name ...]
Defaults: sf0.01, the queries never seen in any CORRECTNESS_r*.json.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from reddit_can_bigdata_spark import registry  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry._ensure_loaded()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        checked: set[str] = set()
        for p in ROOT.glob("CORRECTNESS_r*.json"):
            checked |= set(json.loads(p.read_text()))
        names = [n for n in registry.REGISTRY if n not in checked]

    # honor declared oracle SF ceilings (oracle_max_sf): a few oracles
    # are written in the naive correlated/recursive style and explode
    # past sf0.01 (17 GB DuckDB spill, measured) — skip, don't spill
    try:
        sf = float(
            Path(sf_dir).name.replace("sf", "")
        )
    except ValueError:
        sf = None
    if sf is not None:
        skipped = [
            n for n in names
            if (m := registry.REGISTRY[n].oracle_max_sf) is not None and sf > m
        ]
        for n in skipped:
            print(f"SKIP {n}: oracle declared tractable only up to "
                  f"sf{registry.REGISTRY[n].oracle_max_sf}")
        names = [n for n in names if n not in set(skipped)]

    import duckdb

    from reddit_can_bigdata_spark.session import get_spark
    from reddit_can_bigdata_spark.tables import TABLE_NAMES

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("exact-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    def norm(rows, cols):
        out = []
        for row in rows:
            d = dict(zip(cols, row))
            out.append(tuple(repr(d[c]) for c in sorted(cols)))
        return sorted(out)

    failures = []
    for name in names:
        spec = registry.REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"ERR  {name}: {e}")
            continue
        if spec.oracle is None:
            print(f"rows {name}: {len(srows)} (no oracle)")
            continue
        try:
            res = duck.execute(spec.oracle)
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duck error: {e}"))
            print(f"ERR  {name}: duck {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"cols spark={scols} duck={dcols}"))
            print(f"FAIL {name}: column mismatch")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rows {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: row count {len(srows)} vs {len(drows)}")
            continue
        ns, nd = norm(srows, scols), norm(drows, dcols)
        bad = [(a, b) for a, b in zip(ns, nd) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} mismatched rows; first: {bad[0]}"))
            print(f"FAIL {name}: {len(bad)} EXACT mismatches; first: {bad[0]}")
        else:
            print(f"OK   {name}: {len(srows)} rows exact")

    print(f"\n{len(failures)} failures / {len(names)} checked")
    for n, msg in failures:
        print(f"  {n}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
