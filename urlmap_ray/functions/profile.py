"""Table profiling — the data-engine staple "describe this dataset"
pass: per column, row count, null count, and distinct count, in a form
that streams at 100 TB.

Shape: ONE ``map_batches`` pass emits two kinds of bounded partial rows
per column — a (col, n, nulls) counter row per batch, and the column's
≤k smallest distinct value hashes (the KMV bottom-k, the dedup family's
exact-below-saturation contract). One ``groupby(col, h)`` dedups hashes
across batches, one ``groupby(col)`` fold keeps each column's global
bottom-k and estimates distinct, and the counter rows fold in the same
keyed exchange. Driver state: ≤ n_cols × (k + 1) rows — a declared
bound, never the values.

Distinct counts are EXACT while a column's true cardinality is < k
(k = 2^17 by default — beyond the test corpora's largest key column),
which is what lets the registered query hash-match a pure
``COUNT(DISTINCT ...)`` SQL oracle; beyond saturation they degrade to
the ±1/sqrt(k−2) KMV estimate, which is the only honest answer at
10^10-row scale anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import _U64, hash64_column, kmv_estimate

__all__ = ["table_profile"]

DEFAULT_K = 1 << 17


def table_profile(ds, *, columns: list[str], k: int = DEFAULT_K):
    """Per-column profile of ``ds`` → Dataset of (column, n_rows,
    n_nulls, n_distinct), one row per requested column, distinct counts
    exact below the declared ``k`` saturation. See module docstring."""
    flip = _U64(1 << 63)

    def partials(t: pa.Table) -> pa.Table:
        cols, hs, ns, nulls = [], [], [], []
        for name in columns:
            c = t.column(name)
            n_null = c.null_count
            valid = c.drop_null() if n_null else c
            # counter row: h = null sentinel, n/nulls carried
            cols.append(name)
            hs.append(None)
            ns.append(len(c))
            nulls.append(n_null)
            if len(valid):
                # timestamps and other non-hashable logical types profile
                # through their physical int64 view
                if pa.types.is_timestamp(valid.type):
                    valid = valid.cast(pa.int64())
                elif pa.types.is_floating(valid.type):
                    # distinct-ness of floats via their bit pattern
                    valid = pa.array(
                        np.ascontiguousarray(
                            valid.to_numpy(zero_copy_only=False)
                        ).view(np.int64)
                    )
                uniq = np.unique(hash64_column(valid))
                keep = (uniq[:k] ^ flip).view(np.int64)
                cols.extend([name] * len(keep))
                hs.extend(keep.tolist())
                ns.extend([0] * len(keep))
                nulls.extend([0] * len(keep))
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "h": pa.array(hs, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
            }
        )

    def dedup_hashes(g: pa.Table) -> pa.Table:
        # group key = (col, h): counters (h null) pass through summed
        if g.column("h").null_count:
            return pa.table(
                {
                    "col": g.column("col").slice(0, 1),
                    "h": pa.nulls(1, pa.int64()),
                    "n": pa.array(
                        [int(pc.sum(g.column("n")).as_py() or 0)], pa.int64()
                    ),
                    "nulls": pa.array(
                        [int(pc.sum(g.column("nulls")).as_py() or 0)], pa.int64()
                    ),
                }
            )
        return pa.table(
            {
                "col": g.column("col").slice(0, 1),
                "h": g.column("h").slice(0, 1),
                "n": pa.array([0], pa.int64()),
                "nulls": pa.array([0], pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        hcol = g.column("h")
        is_ctr = pc.is_null(hcol)
        n_rows = int(pc.sum(g.filter(is_ctr).column("n")).as_py() or 0)
        n_nulls = int(pc.sum(g.filter(is_ctr).column("nulls")).as_py() or 0)
        signed = (
            g.filter(pc.invert(is_ctr))
            .column("h")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        hs = (np.sort(signed)[:k].view(_U64)) ^ flip
        return pa.table(
            {
                "column": g.column("col").slice(0, 1),
                "n_rows": pa.array([n_rows], pa.int64()),
                "n_nulls": pa.array([n_nulls], pa.int64()),
                "n_distinct": pa.array([kmv_estimate(hs, k)], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["col", "h"])
        .map_groups(dedup_hashes, batch_format="pyarrow")
        .groupby("col")
        .map_groups(fold, batch_format="pyarrow")
    )
