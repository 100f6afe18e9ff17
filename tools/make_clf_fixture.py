"""Generate the hashed-linear-classifier weight fixture.

A fastText-style quality classifier's serving artifact is just a
weight vector over hashed n-gram features. This writes a seeded,
reproducible stand-in (the sandbox has no trained model): 1024
feature weights ~ N(0, 0.1), plus a bias row at feature_id = -1,
every weight rounded to 6dp so both engines can sum them EXACTLY in
DECIMAL (float-sum order-independence across Spark partitionings and
the DuckDB oracle).

Run once; the output parquet is committed like the IVF/PQ codebooks:

    python tools/make_clf_fixture.py
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CLF_DIM = 1024
SEED = 42

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "quality_clf_d1024.parquet"


def main() -> None:
    rng = np.random.RandomState(SEED)
    w = np.round(rng.normal(0.0, 0.1, size=CLF_DIM), 6)
    bias = round(float(rng.normal(0.0, 0.1)), 6)
    fids = list(range(CLF_DIM)) + [-1]
    weights = [float(x) for x in w] + [bias]
    table = pa.table(
        {
            "feature_id": pa.array(fids, type=pa.int32()),
            "weight": pa.array(weights, type=pa.float64()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT}: {CLF_DIM} weights + bias={bias}")


if __name__ == "__main__":
    main()
