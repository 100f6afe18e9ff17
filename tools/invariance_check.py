"""Partitioning-invariance sweep: every registered query must produce
IDENTICAL rows (repr-exact) under different parallelism.

At cluster scale the shuffle partition count is an ops knob, not a
semantic one — but float accumulation order, unstable window tiebreaks,
and LIMIT-without-order would all silently make results depend on it.
The registry engineers this away (DECIMAL sums, rounded iterative
floats, explicit tiebreaks); this harness verifies the claim wholesale
by running each query twice in the SAME session with
``spark.sql.shuffle.partitions`` set to 3 and then 32 (the conf is read
at plan time, so per-query SET switches are effective), comparing the
collected rows with the oracle-style normal form.

A second axis, ``--aqe``, reruns each query with
``spark.sql.adaptive.enabled`` false then true: AQE rewrites the
physical plan at runtime (coalesced shuffles, demoted broadcasts,
skew splits) and none of that may change a single row.

Usage: python tools/invariance_check.py [--aqe] [name ...]
Exits 1 on any divergence.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from reddit_can_bigdata_spark import registry  # noqa: E402
from tools.empty_check import norm  # noqa: E402

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
PARTS = (3, 32)


def main() -> int:
    registry._ensure_loaded()
    argv = sys.argv[1:]
    aqe_axis = "--aqe" in argv
    names = [a for a in argv if not a.startswith("--")] or list(registry.REGISTRY)
    # (knob conf key, per-run values) — both confs are read at plan time,
    # so per-query SET switches inside one session are effective.
    if aqe_axis:
        knob, values = "spark.sql.adaptive.enabled", ("false", "true")
    else:
        knob, values = "spark.sql.shuffle.partitions", tuple(str(p) for p in PARTS)

    from reddit_can_bigdata_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("invariance-check", shuffle_partitions=PARTS[0])
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name in names:
        spec = registry.REGISTRY[name]
        results = []
        err = None
        for p in values:
            spark.conf.set(knob, p)
            try:
                sdf = spec.fn(spark, SF_DIR)
                results.append(norm([tuple(r) for r in sdf.collect()], sdf.columns))
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"
                break
        if err is not None:
            failures.append((name, f"raised at parts sweep: {err[:200]}"))
            print(f"ERR  {name}: {err[:160]}")
            continue
        a, b = results
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y]
            failures.append(
                (name, f"{len(bad)} row diffs across {knob}={values}; first: {bad[0] if bad else (len(a), len(b))}")
            )
            print(f"FAIL {name}: differs across {knob} {values}")
        else:
            print(f"OK   {name}: {len(a)} rows invariant")

    print(f"\n{len(failures)} failures / {len(names)} checked")
    for n, msg in failures:
        print(f"  {n}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
