"""Generate an sf1 fixture tree — a real 10x scale point above the
bench's sf0.1 — matching the driver testdata's schema and measured
marginals (round-10 verdict item #5).

The driver's generator itself is not in the repo (TESTDATA.md:
"Read-only — do NOT regenerate"), so this reimplements its recipe
from the measured facts of the sf0.001/0.01/0.1 trees:

- region/nation are fixed (5/25 rows, copied verbatim);
- customer/supplier/part/orders/lineitem/events scale 10x per 10x sf
  with contiguous zero-based keys (sf1: 150k/10k/200k/1.5M/~6M/1M);
- documents = max(500, 50_000*sf) -> 50k; embeddings =
  max(500, 20_000*sf) -> 20k (both ceilings verified against the
  three driver trees);
- measured marginals: o_orderdate uniform over [1995-01-01,
  2001-08-01] at day grain; l_extendedprice ~ U(900, 105_000);
  l_discount ~ U(0, .1); l_tax ~ U(0, .08); lineitem multiplicity
  Poisson(4) clipped to >=1 with l_linenumber cycling 1..7; events
  ts sorted over a fixed 30-day window (the window does NOT grow
  with sf — verified), value ~ Exp(50), user_id over customers/10;
  documents draw 10..100 words from the driver's 30-word vocab with
  lang weights (.41 en, ~.15 each de/es/fr/zh), source =
  f"src{doc_id%20}", ~5%% near-dup twins (earlier text + " dup",
  the LSH workload's signal) and ~0.16%% exact-dup twins;
  embeddings are L2-normalized 64-dim float32, label ~ U{0..9};
  p_retailprice = 900 + (p_partkey %% 1000)/10 (deterministic,
  exact in the driver data).

This is NOT the driver's byte stream (different RNG), but it is the
same schema, same cardinality model, and same distribution family —
what exponent fitting needs. Output is regenerable, so it lives in
/tmp, not the repo.

Usage: python tools/make_sf1.py [out_dir=/tmp/sf1] [sf=1.0]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
DAY_US = 86_400_000_000

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _ts_day(rng, n: int, lo: str, hi: str) -> pa.Array:
    lo_us = np.datetime64(lo, "us").astype("int64")
    hi_us = np.datetime64(hi, "us").astype("int64")
    days = rng.integers(0, (hi_us - lo_us) // DAY_US + 1, n)
    return pa.array(lo_us + days * DAY_US, type=pa.timestamp("us"))


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    rng = np.random.default_rng(42)

    for dim in ("region", "nation"):
        shutil.copy(SRC / f"{dim}.parquet", out / f"{dim}.parquet")
        print(f"  {dim}: copied")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{k:09d}" for k in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1_000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))

    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{k:09d}" for k in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1_000, 10_000, n_supp), 2),
    }))

    pk = np.arange(n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": pa.array(
            np.char.add(
                np.char.add(np.array(ADJ)[rng.integers(0, 8, n_part)], " "),
                np.array(NOUN)[rng.integers(0, 8, n_part)],
            )
        ),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]
        ),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1_000, 500_000, n_ord), 2),
        "o_orderdate": _ts_day(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    mult = np.clip(rng.poisson(4.0, n_ord), 1, None)
    okey = np.repeat(np.arange(n_ord), mult)
    n_li = okey.size
    within = np.arange(n_li) - np.repeat(
        np.concatenate(([0], np.cumsum(mult)[:-1])), mult
    )
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array((within % 7 + 1).astype("int32")),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 4),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 4),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_day(rng, n_li, "1995-01-02", "2001-11-04"),
    }))

    ev_lo = np.datetime64("2024-01-01", "us").astype("int64")
    ts = np.sort(
        ev_lo + rng.integers(0, 30 * DAY_US, n_ev)
    )
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, max(1, n_cust // 10), n_ev), pa.int64()
        ),
        "event_type": pa.array(
            np.array(["click", "error", "purchase", "signup", "view"])[
                rng.integers(0, 5, n_ev)
            ]
        ),
        "value": np.round(
            np.minimum(rng.exponential(50.0, n_ev), 999.0), 2
        ),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
        ),
    }))

    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 0 and r < 0.05:
            texts.append(texts[rng.integers(0, i)] + " dup")
        elif i > 0 and r < 0.0516:
            texts.append(texts[rng.integers(0, i)])
        else:
            n_words = rng.integers(10, 101)
            texts.append(
                " ".join(np.array(VOCAB)[rng.integers(0, 30, n_words)])
            )
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=LANG_P)
        ]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    vecs = rng.standard_normal((n_emb, 64)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    print(f"wrote sf{sf} tree to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
