"""Exact distributed quantiles for bounded-cardinality columns.

Quality gates in training-data pipelines are threshold picks: "drop the
bottom decile by token count", "cap at p99 length". For integer-valued
columns whose DISTINCT-value count is bounded (token counts, quality
sub-scores, status codes, depths — the usual gate inputs), the exact
scale-right computation is a VALUE HISTOGRAM, not a sort:

1. per-batch partial value-counts (Arrow hash-agg, one row per distinct
   value per batch),
2. one single-key ``groupby(value)`` summing the partials — the shuffle
   moves O(distinct values × batches) tiny rows, never the data,
3. the histogram (≤ a few thousand rows for any real gate column) folds
   to quantiles anywhere — here on the driver, trivially.

This is exact at any data size, unlike p2/t-digest sketches, and the
exchange is independent of row count. For unbounded float columns use a
mergeable sketch instead (see ``functions/sketch.py`` for the KMV
pattern).

Quantile rule (pinned so the SQL oracle can reproduce it exactly):
``v(q) = min{ v : cum_count(v) >= ceil(q * N) }`` — the inverted
empirical CDF ("lower" interpolation), with IEEE-double ``q * N``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = [
    "value_histogram",
    "binned_histogram",
    "exact_quantiles",
    "group_quantiles",
    "float_quantiles",
]


def value_histogram(ds, col: str):
    """(value, n) histogram Dataset of an integer column — one single-key
    shuffle of per-batch partial counts."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select([col])
            .group_by([col])
            .aggregate([([], "count_all")])
            .rename_columns([col, "partial"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .aggregate(Sum("partial", alias_name="n"))
    )


def binned_histogram(ds, col: str, *, width: float):
    """Fixed-width histogram of a FLOAT column → (bin, n, lo) Dataset:
    ``bin = floor(x / width)`` (int64), ``lo = bin * width`` (the bucket's
    left edge). The distribution-dashboard primitive for unbounded float
    columns where :func:`value_histogram`'s per-distinct-value rows would
    explode. Same exchange shape: per-batch partial bin counts, one
    single-key shuffle of O(bins × batches) rows. Both ``/`` and ``*``
    are IEEE-correctly-rounded and ``floor`` is exact, so bins and edges
    are bit-identical to the SQL mirror. NaN and null values both drop —
    the SQL mirror must filter BOTH (``value IS NOT NULL AND NOT
    isnan(value)``): a bare IS NOT NULL would pass NaN into
    ``CAST(floor(NaN) AS BIGINT)`` and error where the engine drops."""
    if not width > 0:
        raise ValueError(f"width must be positive, got {width}")
    from ray.data.aggregate import Sum

    w = np.float64(width)

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        bins, counts = np.unique(np.floor(x / w).astype(np.int64), return_counts=True)
        return pa.table(
            {
                "bin": pa.array(bins, pa.int64()),
                "partial": pa.array(counts, pa.int64()),
            }
        )

    def edges(t: pa.Table) -> pa.Table:
        b = t.column("bin").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("lo", pa.array(b * w, pa.float64()))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("partial", alias_name="n"))
        .map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)
    )


def exact_quantiles(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact quantiles of an integer column → pa.Table (q, <col>).

    Streams the histogram (see module docstring); only the histogram —
    whose size is the column's distinct-value count, not the row count —
    is folded on the driver.
    """
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    rows = value_histogram(ds, col).take_all()
    if not rows:
        raise ValueError(f"cannot take quantiles of an empty column {col!r}")
    vals = np.array([r[col] for r in rows], dtype=np.int64)
    cnts = np.array([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    # inverted empirical CDF with IEEE-double rank, mirrored by the oracle
    ranks = np.array([math.ceil(q * n) for q in qs], dtype=np.int64)
    picks = np.searchsorted(cum, ranks, side="left")
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            col: pa.array(vals[picks], pa.int64()),
        }
    )


def group_quantiles(ds, col: str, qs: list[float], *, key_col: str):
    """Exact per-key quantiles of an integer column → Dataset
    (key_col, q, <col>) — the pinned inverted-ECDF rule of
    :func:`exact_quantiles` applied within each key.

    Same histogram shape, keyed: per-batch partial counts on
    (key, value) rows, one ``groupby([key, value])`` sum (the shuffle
    moves distinct (key, value) pairs × batches, never rows), then a
    ``groupby(key)`` over the merged histogram folds each key's
    quantiles vectorized — nothing lands on the driver at all, so this
    scales to any key cardinality (per-key work is the key's
    distinct-value count)."""
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select([key_col, col])
            .group_by([key_col, col])
            .aggregate([([], "count_all")])
            .rename_columns([key_col, col, "partial"])
        )

    qs_arr = np.array(qs, dtype=np.float64)

    def fold(g: pa.Table) -> pa.Table:
        vals = g.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        ranks = np.array([math.ceil(q * n) for q in qs_arr], dtype=np.int64)
        picks = np.searchsorted(cum, ranks, side="left")
        key_out = g.column(key_col).slice(0, 1).combine_chunks().take(
            pa.array(np.zeros(len(qs_arr), dtype=np.int64))
        )
        return pa.table(
            {
                key_col: key_out,
                "q": pa.array(qs_arr, pa.float64()),
                col: pa.array(vals[picks], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, col])
        .aggregate(Sum("partial", alias_name="n"))
        .groupby(key_col)
        .map_groups(fold, batch_format="pyarrow")
    )


def float_quantiles(ds, col: str, qs: list[float], *, scale: int = 100):
    """Exact quantiles of a float column at a declared quantization:
    values are floored to ``1/scale`` units (int64) and the histogram
    machinery of :func:`exact_quantiles` runs on those units. The result
    is the EXACT quantile of floor(x·scale)/scale — a contract with a
    known ±1/scale bound, rather than a sketch with a rank-error bound.
    This is the honest scale-path for unbounded float columns: the
    histogram size is bounded by the value range × scale, independent of
    row count, and the floor(x·scale) rule is exactly reproducible in
    SQL (CAST(floor(col * scale) AS BIGINT)) so results hash-match.

    Returns pa.Table (q, <col>_units) where units are int64 multiples
    of 1/scale (kept integer so the correctness gate compares exactly;
    divide by ``scale`` for display).
    """

    def to_units(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        units = pc.cast(
            pc.floor(pc.multiply(t.column(col), float(scale))), pa.int64()
        )
        return pa.table({f"{col}_units": units})

    units_ds = ds.map_batches(to_units, batch_format="pyarrow", zero_copy_batch=True)
    out = exact_quantiles(units_ds, f"{col}_units", qs)
    return out
