"""Fixed-point distributed k-means: bit-equality with the single-process
reference at any partitioning, plus the pinned edge-case semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from urlmap_ray.functions.clustering import (
    _assign,
    _partials,
    _update,
    _quantize,
    kmeans_assign,
    kmeans_reference,
)


def _emb_table(n=120, d=16, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), d
            ),
        }
    )


def test_reference_labels_partition_invariant(ray_session):
    tbl = _emb_table()
    expected = kmeans_reference(tbl, k=4, iters=3)
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = pa.concat_tables(
            kmeans_assign(ds, k=4, iters=3).iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        assert got.equals(expected), f"mismatch at {blocks} blocks"


def test_reference_shuffled_input_same_labels(ray_session):
    # row order / block assignment must not matter (integer partials)
    tbl = _emb_table(n=80, d=8, seed=3)
    expected = kmeans_reference(tbl, k=3, iters=4)
    perm = np.random.default_rng(0).permutation(tbl.num_rows)
    ds = ray.data.from_arrow(tbl.take(perm)).repartition(5)
    got = pa.concat_tables(
        kmeans_assign(ds, k=3, iters=4).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    assert got.equals(expected)


def test_assign_tie_breaks_to_lowest_cluster():
    # two identical centroids: every row ties → cluster 0
    cents = np.array([[2, 0], [2, 0]], dtype=np.int64)
    xq = np.array([[1, 1], [3, -1]], dtype=np.int64)
    assert _assign(xq, cents).tolist() == [0, 0]


def test_update_empty_cluster_keeps_centroid():
    cents = np.array([[0, 0], [100, 100]], dtype=np.int64)
    xq = np.array([[1, 1], [3, 3]], dtype=np.int64)  # both nearest cluster 0
    counts, sums = _partials(xq, cents, 2)
    assert counts.tolist() == [2, 0]
    new = _update(cents, counts, sums)
    assert new[0].tolist() == [2, 2]  # floor((1+3)/2)
    assert new[1].tolist() == [100, 100]  # empty cluster unchanged


def test_quantize_is_round_half_even():
    q = _quantize(np.array([[0.5 / (1 << 20), 1.5 / (1 << 20)]]), 1 << 20)
    assert q.tolist() == [[0, 2]]
