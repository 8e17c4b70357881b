"""Shared helpers for canonical (a, b) int64 pair sets.

Every near-dup family (MinHash bands, SimHash bands, shingle buckets,
substring windows) and the connected-components rounds end in the same
two idioms — batch-local distinct pairs before a shuffle, and a
Dataset-level distinct over the shuffled pair stream. One copy here so
a fix (empty blocks, dedup strategy) propagates everywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["distinct_pair_table", "distinct_pairs_ds", "EMPTY_PAIRS"]

EMPTY_PAIRS = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
)


def distinct_pair_table(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Batch-local distinct (a, b) rows as an Arrow table.

    Cross-batch duplicates are tolerated by every consumer (they collapse
    in the downstream groupby); this just shrinks what the shuffle moves.
    """
    if len(a) == 0:
        return EMPTY_PAIRS
    rec = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
    rec["a"], rec["b"] = a, b
    uniq = np.unique(rec)
    return pa.table(
        {"a": pa.array(uniq["a"], pa.int64()), "b": pa.array(uniq["b"], pa.int64())}
    )


def distinct_pairs_ds(pairs_ds):
    """Dataset-level distinct (a, b): one count-groupby on the two int64
    key columns, count dropped. The shuffle moves 16-byte keys only."""
    from ray.data.aggregate import Count

    return (
        pairs_ds.groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    )
