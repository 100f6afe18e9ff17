"""Generate the persisted trained-IVF codebook fixture.

Trains the seeded spherical k-means codebook
(``similarity.ivf_centroids_trained``: k=8, seed=42, maxIter=20, over
L2-normalized vectors) on the sf0.01 ``embeddings`` table and writes the
8-row (cid, cv) codebook as a SINGLE parquet file at
``fixtures/ivf_codebook_k8.parquet``.

This is the train-once / search-many split every production IVF index
uses: the fit is an offline job, the search path reads the persisted
codebook. Committing the codebook lets ``sim_ivf_trained_search`` carry
an exact DuckDB oracle (assignment + probe + top-k over the same
fixture); reproducibility of the fit itself is pinned by
tests/test_ivf_trained.py::test_committed_codebook_reproducible.

Usage: python tools/make_ivf_fixture.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from reddit_can_bigdata_spark.session import get_spark  # noqa: E402
from reddit_can_bigdata_spark.operators.common import tables  # noqa: E402
from reddit_can_bigdata_spark.operators.similarity import (  # noqa: E402
    CODEBOOK_FIXTURE,
    ivf_centroids_trained,
)


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("make-ivf-fixture", shuffle_partitions=8)
    emb = tables(spark, sf_dir)["embeddings"]
    rows = ivf_centroids_trained(emb).orderBy("cid").collect()
    table = pa.table(
        {
            "cid": pa.array([r["cid"] for r in rows], pa.int32()),
            "cv": pa.array([r["cv"] for r in rows], pa.list_(pa.float64())),
        }
    )
    out = Path(CODEBOOK_FIXTURE)
    out.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {len(rows)} centroids -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
