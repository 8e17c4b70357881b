"""Distributed PCA: bit-determinism at any parallelism + spectral sanity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_tbl():
    return pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def _rows(ds):
    return sorted(
        (r["vec_id"], r["pc0"], r["pc1"], r["pc2"], r["pc3"])
        for r in ds.take_all()
    )


def test_pca_bit_identical_across_parallelism(ray_session, emb_tbl):
    import ray.data

    from urlmap_ray.functions.decomposition import pca_project, pca_reference

    ref = pca_reference(emb_tbl, k=4)
    expected = sorted(
        zip(*(ref.column(c).to_pylist() for c in ["vec_id", "pc0", "pc1", "pc2", "pc3"]))
    )
    for parts in (1, 3, 11):
        ds = ray.data.from_arrow(emb_tbl).repartition(parts)
        assert _rows(pca_project(ds, k=4)) == expected, f"parts={parts}"


def test_pca_matches_numpy_spectrum(emb_tbl):
    """The quantized pipeline agrees with plain float64 PCA to within the
    quantization error, and components capture descending variance."""
    from urlmap_ray.functions.decomposition import pca_reference
    from urlmap_ray.functions.similarity import _to_matrix

    x = _to_matrix(emb_tbl, "embedding")
    xc = x - x.mean(axis=0)
    w, v = np.linalg.eigh(np.cov(x, rowvar=False))
    top = v[:, ::-1][:, :4]
    scores = xc @ top
    got = pca_reference(emb_tbl, k=4)
    g = np.stack([got.column(f"pc{j}").to_numpy() for j in range(4)], axis=1) / 1e9
    # sign conventions may differ per component — compare up to sign
    for j in range(4):
        a, b = g[:, j], scores[:, j]
        err = min(np.abs(a - b).max(), np.abs(a + b).max())
        assert err < 1e-4, f"component {j} err {err}"
    var = g.var(axis=0)
    assert all(var[j] >= var[j + 1] - 1e-12 for j in range(3))


def test_pca_guards(ray_session, emb_tbl):
    import ray.data

    from urlmap_ray.functions.decomposition import pca_project

    ds = ray.data.from_arrow(emb_tbl.slice(0, 5))
    with pytest.raises(ValueError, match="k must be"):
        pca_project(ds, k=0)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_project(ray.data.from_arrow(emb_tbl.slice(0, 1)), k=2)
