"""Train and persist the IVF-PQ residual codebook fixture.

FAISS-style IVFPQ (Jegou et al. 2011 §IV): vectors are coarse-assigned
to the existing IVF codebook (`fixtures/ivf_codebook_k8.parquet`,
cosine assignment — same rule as `ivf_assign`), and product
quantization is trained on the RESIDUALS (x - coarse_centroid), which
have far less variance than raw vectors, so the same 8x16 code budget
quantizes much finer. Seeded NumPy Lloyd, deterministic; committed as
parquet so the search path and its DuckDB oracle read identical
centroids.

Usage: python tools/make_ivfpq_fixture.py [sf_dir] [out_path]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
PQ_M = 8
PQ_K = 16
PQ_ITERS = 20
PQ_SEED = 137  # distinct from the raw-vector PQ fixture's seed


def train(sf_dir: str) -> list[tuple[int, int, list[float]]]:
    import duckdb

    X = np.array(
        [
            np.array(e, dtype=np.float64)
            for (e,) in duckdb.sql(
                f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
            ).fetchall()
        ]
    )
    crows = duckdb.sql(
        f"SELECT cid, cv FROM '{ROOT}/fixtures/ivf_codebook_k8.parquet' ORDER BY cid"
    ).fetchall()
    cents = np.array([np.array(cv, dtype=np.float64) for _, cv in crows])
    # cosine assignment, tie -> lowest cid (argmax returns first max)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = (Xn @ Cn.T).argmax(axis=1)
    R = X - cents[assign]  # residuals, raw scale
    d = R.shape[1]
    sub_d = d // PQ_M
    out = []
    for m in range(PQ_M):
        S = R[:, m * sub_d : (m + 1) * sub_d]
        rng = np.random.RandomState(PQ_SEED + m)
        cb = S[rng.choice(len(S), PQ_K, replace=False)].copy()
        for _ in range(PQ_ITERS):
            d2 = ((S[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for k in range(PQ_K):
                members = S[a == k]
                if len(members):
                    cb[k] = members.mean(axis=0)
        for k in range(PQ_K):
            out.append((m, k, [float(v) for v in cb[k]]))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else str(ROOT / "fixtures" / "ivfpq_residual_m8k16.parquet")
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = train(sf_dir)
    pq.write_table(
        pa.table(
            {
                "sub": pa.array([r[0] for r in rows], pa.int32()),
                "cid": pa.array([r[1] for r in rows], pa.int32()),
                "cv": pa.array([r[2] for r in rows], pa.list_(pa.float64())),
            }
        ),
        out_path,
    )
    print(f"wrote {out_path}: {len(rows)} residual centroids")


if __name__ == "__main__":
    main()
