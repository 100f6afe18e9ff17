"""Train and persist the product-quantization codebook fixture.

PQ (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
Search"): split the 64-dim embedding into PQ_M=8 subvectors of 8 dims;
per subspace, k-means with PQ_K=16 centroids. Training is plain seeded
NumPy Lloyd iterations (deterministic: fixed seed per subspace, fixed
iteration count, ties broken by lowest centroid id), run offline ONCE
on the sf0.01 embeddings — the search path and its DuckDB oracle read
the committed parquet, mirroring the trained-IVF fixture
(`tools/make_ivf_fixture.py`).

Usage: python tools/make_pq_fixture.py [sf_dir] [out_path]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace
PQ_ITERS = 20
PQ_SEED = 42


def train(sf_dir: str) -> list[tuple[int, int, list[float]]]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    X = np.array([np.array(e, dtype=np.float64) for (e,) in rows])
    d = X.shape[1]
    assert d % PQ_M == 0, (d, PQ_M)
    sub_d = d // PQ_M
    out = []
    for m in range(PQ_M):
        S = X[:, m * sub_d : (m + 1) * sub_d]
        rng = np.random.RandomState(PQ_SEED + m)
        cents = S[rng.choice(len(S), PQ_K, replace=False)].copy()
        for _ in range(PQ_ITERS):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest cid (argmin rule)
            for k in range(PQ_K):
                members = S[assign == k]
                if len(members):
                    cents[k] = members.mean(axis=0)
        for k in range(PQ_K):
            out.append((m, k, [float(v) for v in cents[k]]))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else str(ROOT / "fixtures" / "pq_codebook_m8k16.parquet")
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = train(sf_dir)
    table = pa.table(
        {
            "sub": pa.array([r[0] for r in rows], pa.int32()),
            "cid": pa.array([r[1] for r in rows], pa.int32()),
            "cv": pa.array([r[2] for r in rows], pa.list_(pa.float64())),
        }
    )
    pq.write_table(table, out_path)
    print(f"wrote {out_path}: {len(rows)} rows ({PQ_M} subspaces x {PQ_K} centroids)")


if __name__ == "__main__":
    main()
