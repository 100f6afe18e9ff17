"""Fit and persist the PCA basis fixture (train-once / project-many).

Mirrors make_pq_fixture.py: the "training" (a numpy SVD of the
mean-centered sf0.01 embeddings — deterministic, no iterative seed
sensitivity) runs offline ONCE; the registered projection query and
its DuckDB oracle both read the committed parquet. Sign convention:
each axis is flipped so its largest-|coordinate| entry is positive
(SVD only defines axes up to sign).

Rows: (pc INT, axis LIST<DOUBLE>[64], offset DOUBLE) where
offset = dot(mean, axis), so a projection is dot(x, axis) - offset —
one fused dot product per (vector, axis), no mean array needed at
query time.

Usage: python tools/make_pca_fixture.py [sf_dir] [out_path]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
PCA_K = 4


def main() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / "fixtures" / "pca_basis_k4.parquet"
    )
    x = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
        ).fetchall(),
        dtype=object,
    )
    x = np.array([np.asarray(r[0], dtype=np.float64) for r in x])
    mean = x.mean(axis=0)
    _, _, vt = np.linalg.svd(x - mean, full_matrices=False)
    rows = []
    for i in range(PCA_K):
        axis = vt[i]
        if axis[int(np.argmax(np.abs(axis)))] < 0:
            axis = -axis
        rows.append((i, [float(v) for v in axis], float(mean @ axis)))
    table = pa.table(
        {
            "pc": pa.array([r[0] for r in rows], pa.int32()),
            "axis": pa.array([r[1] for r in rows], pa.list_(pa.float64())),
            "offset": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {out}: k={PCA_K}, d={x.shape[1]}, n_train={x.shape[0]}")


if __name__ == "__main__":
    main()
