"""PCA projection pinned against numpy SVD (the non-oracle pattern:
eigendecompositions aren't SQL-expressible, so the external reference
is numpy on the collected small fixture)."""

from __future__ import annotations

import numpy as np
import pytest


K = 4


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    from reddit_can_bigdata_spark.ml.embeddings import pca_project
    from reddit_can_bigdata_spark.operators.common import tables

    emb = tables(spark, sf_dir)["embeddings"]
    res = pca_project(emb, k=K)
    x = np.array(
        [
            r["embedding"]
            for r in emb.select("vec_id", "embedding").orderBy("vec_id").collect()
        ],
        dtype=np.float64,
    )
    return res, x


def test_components_orthonormal(fitted):
    res, _ = fitted
    c = np.array(res.components)  # k x d
    assert c.shape[0] == K
    gram = c @ c.T
    assert np.allclose(gram, np.eye(K), atol=1e-8), gram


def test_explained_variance_descending_and_positive(fitted):
    res, _ = fitted
    ev = res.explained_variance
    assert all(a >= b for a, b in zip(ev, ev[1:])), ev
    assert all(v > 0 for v in ev), ev


def test_basis_matches_numpy_svd(fitted):
    """Each Spark component must align (up to sign) with numpy's
    right-singular vector of the centered data — |cos| ~ 1. The
    fixture's spectrum is non-degenerate, so axes are identifiable."""
    res, x = fitted
    xc = x - x.mean(axis=0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    for i, comp in enumerate(np.array(res.components)):
        cos = abs(float(comp @ vt[i]))
        assert cos > 0.999, (i, cos)


def test_projection_equals_centered_matmul(fitted):
    """The projected rows must equal (x - mean) @ components.T — i.e.
    the distributed transform is the plain linear map, with centering
    actually applied (Spark ML's own PCA does not center; the wrapper
    must)."""
    res, x = fitted
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in res.projected.collect()
    }
    xc = x - x.mean(axis=0)
    c = np.array(res.components)  # k x d
    expected = xc @ c.T
    # x is vec_id-ordered (explicit orderBy above), so row i <-> vec_id i
    for i in range(len(x)):
        assert np.allclose(got[i], expected[i], atol=1e-6)


def test_empty_input_raises_clear_error(spark):
    """center=True on an empty DataFrame must raise ValueError with a
    message, not TypeError from first() returning None (round-4 advice:
    ml/embeddings.py dimension probe)."""
    import pytest
    from reddit_can_bigdata_spark.ml.embeddings import pca_project

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no rows"):
        pca_project(empty, k=2)
