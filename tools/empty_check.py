"""Tiny-input fuzz: run every registered query (and its DuckDB oracle)
against LIMIT-n copies of all tables (default n=0: zero rows).

Rationale: the advisor-findings class "latent cross-engine divergence on
tiny/filtered input" (e.g. a variance term dividing by ``n - 1`` with no
``n >= 2`` guard) only surfaces when a query's input collapses to 0..k
rows.  This harness makes that class testable wholesale: every query
must either (a) return the same rows as its oracle on the sliced
tables, or (b) raise the *same declared* error class on both engines.
n=0 exercises the empty-relation identities (grouping sets, outer
joins, scalar aggregates); n=1 exercises the single-sample edge
(stddev/variance NULL, percentile-of-one, self-join singletons); small
n>1 exercises broken-FK sparsity (slices keep the first rows of each
table, so most joins go dark).

Usage: python tools/empty_check.py [--limit N] [name ...]
Writes nothing; exits 1 on any divergence.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from reddit_can_bigdata_spark import registry  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"


def make_slice_dir(n: int = 0) -> str:
    """Materialize LIMIT-n parquet slices with the source schemas.

    The cache directory is keyed by a fingerprint of the source
    schemas (plus n), so a column added/renamed in the testdata
    invalidates the cache instead of silently fuzzing against a stale
    schema. Both engines read the SAME materialized files, so which
    rows the LIMIT picked is irrelevant to parity."""
    import hashlib

    import duckdb
    import pyarrow.parquet as pq

    from reddit_can_bigdata_spark.tables import TABLE_NAMES

    sig = hashlib.md5()
    for t in TABLE_NAMES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        sig.update(t.encode())
        sig.update(str(pq.read_schema(src)).encode())
    out = os.path.join(
        tempfile.gettempdir(), f"sf_slice{n}_{sig.hexdigest()[:12]}"
    )
    os.makedirs(out, exist_ok=True)
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            duck.execute(
                f"COPY (SELECT * FROM '{src}' LIMIT {int(n)}) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    return out


def make_empty_dir() -> str:
    """Materialize 0-row parquet slices (the n=0 case of
    make_slice_dir; kept as the name tests import)."""
    return make_slice_dir(0)


# Join/identity keys stay non-null so the injected tables keep their
# relational structure; every OTHER column gets NULL on every 5th row.
_KEY_COLS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey",
    "c_nationkey", "s_suppkey", "s_nationkey", "p_partkey",
    "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "event_id", "user_id", "doc_id", "vec_id",
}


def make_nulls_dir(every: int = 5) -> str:
    """Materialize copies of the sf0.001 tables with NULLs injected
    into every ``every``-th row of each non-key column.

    Targets the NULL-semantics divergence class: default null ordering
    under LIMIT (Spark ASC is NULLS FIRST, DuckDB's is NULLS LAST),
    NULL group keys, NULL-propagating string/date expressions, and
    Python-side paths that assume collected scalars are non-None.
    Both engines read the SAME materialized files."""
    import hashlib

    import duckdb
    import pyarrow.parquet as pq

    from reddit_can_bigdata_spark.tables import TABLE_NAMES

    sig = hashlib.md5()
    for t in TABLE_NAMES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        sig.update(t.encode())
        sig.update(str(pq.read_schema(src)).encode())
    out = os.path.join(
        tempfile.gettempdir(), f"sf_nulls{every}_{sig.hexdigest()[:12]}"
    )
    os.makedirs(out, exist_ok=True)
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        cols = [f.name for f in pq.read_schema(src)]
        exprs = ", ".join(
            f'"{c}"' if c in _KEY_COLS
            else f'CASE WHEN __rn % {int(every)} = 0 THEN NULL '
                 f'ELSE "{c}" END AS "{c}"'
            for c in cols
        )
        duck.execute(
            f"COPY (SELECT {exprs} FROM (SELECT *, row_number() OVER () "
            f"AS __rn FROM '{src}')) TO '{dst}' (FORMAT PARQUET)"
        )
    return out


def norm(rows, cols):
    """Engine-independent row normal form: column-name-sorted reprs.
    Shared with tests/test_empty_input.py so the fuzz tool and the
    pinned suite can never disagree on what counts as a divergence."""
    out = []
    for row in rows:
        d = dict(zip(cols, row))
        out.append(tuple(repr(d[c]) for c in sorted(cols)))
    return sorted(out)


# Adversarial corpus for the text stack: the Unicode shapes web scrapes
# actually contain, where Java (Spark) and DuckDB string/regex
# semantics are most likely to diverge — exotic whitespace, CJK/RTL,
# emoji (surrogate pairs), combining marks, fullwidth forms, control
# and NUL bytes, pathological token lengths.
ADVERSARIAL_TEXTS = [
    "",
    " ",
    "\t\n\r",
    "\u00a0\u2028\u2029 nbsp and line separators",
    "héllo wörld café straße",
    "ｆｕｌｌｗｉｄｔｈ text",
    "日本語のテキストです。",
    "مرحبا بالعالم",
    "\U0001f44d\U0001f525\U0001f4af emoji storm \U0001f680 end",
    "éclair naïve combining marks",
    "a" * 5000,
    "word " * 500,
    "Mixed123Numbers456 and UPPER lower",
    "ALL CAPS SHOUTING TEXT HERE",
    "punct!!! ??? ;;; ,,, ... ---",
    "tab\tseparated\tvalues here",
    "quote \"double\" and 'single' marks",
    "back\\slash and /forward/ slash",
    "null\x00byte embedded",
    "control\x01\x02\x03chars",
    "İstanbul Iı turkish dotted",
    "<html><b>markup &amp; entities</b></html>",
]


def make_textfuzz_dir() -> str:
    """Materialize table copies where every SECOND documents.text row
    is replaced by a deterministic adversarial string (cycling
    ADVERSARIAL_TEXTS); alternate rows keep real text so df/idf-style
    statistics stay meaningful. All other tables pass through
    untouched. Both engines read the SAME files, so any failure is an
    expression-semantics divergence, not a data difference."""
    import hashlib

    import duckdb
    import pyarrow.parquet as pq

    from reddit_can_bigdata_spark.tables import TABLE_NAMES

    sig = hashlib.md5()
    for t in TABLE_NAMES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        sig.update(t.encode())
        sig.update(str(pq.read_schema(src)).encode())
    sig.update(repr(ADVERSARIAL_TEXTS).encode())
    out = os.path.join(
        tempfile.gettempdir(), f"sf_textfuzz_{sig.hexdigest()[:12]}"
    )
    os.makedirs(out, exist_ok=True)
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        if t != "documents":
            duck.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)"
            )
            continue
        import pandas as pd
        import pyarrow as pa

        tbl = pq.read_table(src)
        pdf = tbl.to_pandas()
        texts = list(pdf["text"])
        for i in range(0, len(texts), 2):
            texts[i] = ADVERSARIAL_TEXTS[(i // 2) % len(ADVERSARIAL_TEXTS)]
        pdf["text"] = pd.Series(texts, dtype="object")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=tbl.schema, preserve_index=False),
            dst,
        )
    return out


def main() -> int:
    registry._ensure_loaded()
    argv = sys.argv[1:]
    limit = 0
    nulls = False
    if argv and argv[0] == "--limit":
        limit = int(argv[1])
        argv = argv[2:]
    if argv and argv[0] == "--nulls":
        nulls = True
        argv = argv[1:]
    textfuzz = False
    if argv and argv[0] == "--textfuzz":
        textfuzz = True
        argv = argv[1:]
    names = argv or list(registry.REGISTRY)
    if textfuzz:
        sf_dir = make_textfuzz_dir()
    elif nulls:
        sf_dir = make_nulls_dir()
    else:
        sf_dir = make_slice_dir(limit)

    import duckdb

    from reddit_can_bigdata_spark.session import get_spark
    from reddit_can_bigdata_spark.tables import TABLE_NAMES

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("empty-check", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )

    failures = []
    for name in names:
        spec = registry.REGISTRY[name]
        s_err = d_err = None
        srows = drows = None
        scols = dcols = None
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            s_err = f"{type(e).__name__}: {e}"
        if spec.oracle is not None:
            try:
                res = duck.execute(spec.oracle)
                dcols = [c[0] for c in res.description]
                drows = res.fetchall()
            except Exception as e:  # noqa: BLE001
                d_err = f"{type(e).__name__}: {e}"

        if s_err is not None:
            # A Spark-side crash on empty input is a finding even when
            # the oracle also errors: the engine should degrade to
            # empty/NULL results, not stack traces.
            failures.append((name, f"spark raised: {s_err[:200]}"))
            print(f"ERR  {name}: spark {s_err[:160]}")
            continue
        if spec.oracle is None:
            print(f"rows {name}: {len(srows)} (no oracle)")
            continue
        if d_err is not None:
            failures.append((name, f"oracle raised (spark fine): {d_err[:200]}"))
            print(f"ERR  {name}: duck {d_err[:160]}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rows {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: row count {len(srows)} vs {len(drows)}")
            continue
        ns, nd = norm(srows, scols), norm(drows, dcols)
        bad = [(a, b) for a, b in zip(ns, nd) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} mismatched rows; first: {bad[0]}"))
            print(f"FAIL {name}: {len(bad)} mismatches; first: {str(bad[0])[:200]}")
        else:
            print(f"OK   {name}: {len(srows)} rows")

    print(f"\n{len(failures)} failures / {len(names)} checked")
    for n, msg in failures:
        print(f"  {n}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
