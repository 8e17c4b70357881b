"""Distributed PCA over an embedding column (``list<float>``).

The dimensionality-reduction primitive a training-data pipeline uses for
whitening, embedding compression, and cluster pre-processing. The
distributed shape is the textbook mergeable-moments one — and it is made
BIT-DETERMINISTIC at any parallelism the same way the k-means operator is
(clustering.py): embeddings are quantized once to int64 fixed-point
(``scale`` = a power of two, so the later unscaling divide is exact in
float64), per-batch second-moment partials (``XᵀX``, column sums, row
count) are INTEGER matrices summed associatively (driver folds them as
arbitrary-precision Python ints — no overflow, no float summation order),
and the d×d eigendecomposition runs once on the driver on the exact
covariance. The projection pass then streams with the broadcast (mean,
components) pair; outputs are quantized to integer parts-per-billion so
the driver's value-hash gate never compares floats.

What crosses the wire: one (d² + d + 1)-integer partial row per batch in
pass 1, nothing but the broadcast in pass 2. The d×d driver fold is the
documented small-side assumption (d ≤ a few thousand); beyond that PCA
becomes randomized sketching, out of scope.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from urlmap_ray.functions.similarity import _to_matrix

_SCALE = 1 << 20  # fixed-point quantization; power of two ⇒ exact unscale


def _quantize(m: np.ndarray) -> np.ndarray:
    return np.rint(m * _SCALE).astype(np.int64)


def _pca_from_moments(
    xtx: list[list[int]], colsum: list[int], n: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(mean, components) from EXACT integer moments — both the
    distributed fold and the single-process reference call this, so any
    summation path that produces the same exact integers produces
    bit-identical floats here."""
    d = len(colsum)
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n}")
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    mean = np.array([c / (n * _SCALE) for c in colsum], dtype=np.float64)
    xtx_f = np.array(
        [[v / (_SCALE * _SCALE) for v in row] for row in xtx], dtype=np.float64
    )
    cov = (xtx_f - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k]  # top-k columns, descending
    # sign convention: the largest-|component| entry (lowest index on ties)
    # of each eigenvector is positive — removes the eigh sign ambiguity
    for j in range(k):
        col = comps[:, j]
        i = int(np.argmax(np.abs(col)))
        if col[i] < 0:
            comps[:, j] = -col
    return mean, comps


def pca_project(
    ds,
    *,
    k: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    out_scale: int = 10**9,
):
    """Project each row onto the corpus's top-k principal components.

    Returns a Dataset (id_col, pc0..pc{k-1} as int64 parts-per-1e9).
    Two streaming passes: integer moment partials → driver eigh →
    broadcast (mean, components) → row-local projection.
    """
    import ray

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty blocks: _to_matrix returns (0,), not (0, d)
            return pa.table(
                {
                    "xtx": pa.array([], pa.list_(pa.int64())),
                    "colsum": pa.array([], pa.list_(pa.int64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        q = _quantize(_to_matrix(t, emb_col))
        xtx = q.T @ q  # int64: |q| <= 2^20 ⇒ safe to ~2^22 rows per batch
        return pa.table(
            {
                "xtx": pa.array([xtx.reshape(-1).tolist()], pa.list_(pa.int64())),
                "colsum": pa.array([q.sum(axis=0).tolist()], pa.list_(pa.int64())),
                "n": pa.array([q.shape[0]], pa.int64()),
            }
        )

    parts = ds.map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    parts = [p for p in parts if p["n"]]
    if not parts:
        raise ValueError("pca_project: empty input")
    d = len(parts[0]["colsum"])
    # fold as Python ints: exact at any batch count, no int64 overflow
    xtx_flat = [0] * (d * d)
    colsum = [0] * d
    n = 0
    for p in parts:
        n += int(p["n"])
        for i, v in enumerate(p["colsum"]):
            colsum[i] += int(v)
        for i, v in enumerate(p["xtx"]):
            xtx_flat[i] += int(v)
    xtx = [xtx_flat[i * d : (i + 1) * d] for i in range(d)]
    mean, comps = _pca_from_moments(xtx, colsum, n, k)
    mc_ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        m, c = ray.get(mc_ref)
        if t.num_rows == 0:
            out = {id_col: t.column(id_col)}
            for j in range(c.shape[1]):
                out[f"pc{j}"] = pa.array([], pa.int64())
            return pa.table(out)
        # the SAME quantized values pass 1 measured; /_SCALE is exact
        x = _quantize(_to_matrix(t, emb_col)).astype(np.float64) / _SCALE
        scores = (x - m) @ c
        out = {id_col: t.column(id_col)}
        qs = np.rint(scores * out_scale).astype(np.int64)
        for j in range(c.shape[1]):
            out[f"pc{j}"] = pa.array(qs[:, j], pa.int64())
        return pa.table(out)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def pca_reference(emb_tbl: pa.Table, *, k: int = 4,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  out_scale: int = 10**9) -> pa.Table:
    """Single-process ground truth: same quantization, same exact integer
    moments (one numpy matmul — any exact summation path matches), same
    shared eigen step, same projection. Bit-equal to the distributed path."""
    x = _to_matrix(emb_tbl, emb_col)
    q = _quantize(x)
    n, d = q.shape
    xtx = (q.T @ q).tolist()
    colsum = q.sum(axis=0).tolist()
    mean, comps = _pca_from_moments(xtx, colsum, n, k)
    xf = q.astype(np.float64) / _SCALE
    qs = np.rint(((xf - mean) @ comps) * out_scale).astype(np.int64)
    cols = {id_col: emb_tbl.column(id_col)}
    for j in range(k):
        cols[f"pc{j}"] = pa.array(qs[:, j], pa.int64())
    return pa.table(cols)
