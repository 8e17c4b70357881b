"""Pivot (long → wide) over a declared category set.

The reference engine has no relational pivot; a training-data pipeline
reaches for it constantly (per-user event-type counts, per-source language
histograms — feature tables for sampling/weighting decisions). The
categories must be DECLARED up front: a distributed table's schema cannot
depend on the data without a blocking distinct-scan, so the engine makes
the contract explicit instead of hiding a materialization (pass the output
of a cheap ``groupby().count()`` if you genuinely don't know them).

Scale shape (the tumbling-window partial pattern): each batch pre-combines
to ONE wide partial row per key in the batch via an Arrow hash-aggregate +
vectorized scatter, so the single key shuffle moves ``keys-per-batch``
rows of Q+1 integers — never events. Unknown categories are counted into
``n_other`` (loud, not dropped), keeping row totals reconcilable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(
    ds,
    *,
    key_col: str,
    cat_col: str,
    categories: list[str],
    other_col: str | None = "n_other",
):
    """Count rows per (key, category) pivoted to one row per key with a
    column ``n_<category>`` per declared category (plus ``other_col`` for
    undeclared values, if not None). All counts int64; column order is the
    declared order, so results are schema-stable at any parallelism.
    """
    cats = list(categories)
    if not cats or len(set(cats)) != len(cats):
        raise ValueError("categories must be a non-empty list of distinct values")
    cat_cols = [f"n_{c}" for c in cats]
    out_cols = cat_cols + ([other_col] if other_col else [])
    cat_index = {c: j for j, c in enumerate(cats)}

    def partial(t: pa.Table) -> pa.Table:
        local = (
            t.select([key_col, cat_col])
            .group_by([key_col, cat_col])
            .aggregate([([], "count_all")])
        )
        keys = local.column(key_col).combine_chunks()
        n = local.column("count_all").to_numpy(zero_copy_only=False)
        # one wide row per distinct key in the batch: dictionary-encode the
        # key for row indices, scatter counts into the (keys × Q+1) matrix
        kenc = keys.dictionary_encode()
        rows = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        col_of = np.fromiter(
            (cat_index.get(c, len(cats)) for c in local.column(cat_col).to_pylist()),
            dtype=np.int64,
            count=local.num_rows,
        )
        width = len(cats) + 1
        mat = np.zeros((len(kenc.dictionary), width), dtype=np.int64)
        np.add.at(mat, (rows, col_of), n)
        if other_col is None and mat[:, len(cats)].any():
            bad = {
                c
                for c in local.column(cat_col).to_pylist()
                if c not in cat_index
            }
            raise ValueError(
                f"pivot_counts saw undeclared categories {sorted(bad)} and "
                "other_col=None — declare them or keep an overflow column"
            )
        cols = {key_col: kenc.dictionary}
        for j, name in enumerate(cat_cols):
            cols[name] = pa.array(mat[:, j], pa.int64())
        if other_col:
            cols[other_col] = pa.array(mat[:, len(cats)], pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in out_cols])
    )


def _grouping_sets_counts(
    ds,
    keys: list[str],
    masks: list[int],
    all_label: str,
    tag_col: str,
    tag_of_mask,
):
    """Shared engine for ROLLUP/CUBE/arbitrary GROUPING SETS: row counts at
    every grouping set in ``masks`` (bit j set ⇒ keys[j] concrete) in one
    pass. Rolled-up positions carry ``all_label`` (not NULL: a distributed
    value-hash gate and many sinks treat NULL ambiguously; callers with
    genuine NULL key values must clean them first).

    Scale shape: each batch hash-aggregates at the FINEST level only, then
    derives every coarser set locally from that already-small partial
    (the hopping-window trick — expansion happens batch-locally,
    pre-combined). The global combine is ONE single-key groupby on a
    composite string key (multi-key Dataset aggregates are pathologically
    slow — see BASELINE.md), folded by a per-group integer sum.
    """
    if not keys or len(set(keys)) != len(keys):
        raise ValueError("keys must be a non-empty list of distinct columns")
    sep = "\x1f"  # unit separator: cannot appear in sane key text

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for c in keys:
            if not (
                pa.types.is_string(t.column(c).type)
                or pa.types.is_large_string(t.column(c).type)
            ):
                raise TypeError(f"grouping-set key {c!r} must be a string column")
            if t.num_rows and pc.any(
                pc.match_substring(t.column(c), sep)
            ).as_py():
                raise ValueError(
                    f"grouping-set key {c!r} contains the composite-key "
                    "separator \\x1f — clean the column first"
                )
        fine = t.select(keys).group_by(keys).aggregate([([], "count_all")])
        n = fine.column("count_all").to_numpy(zero_copy_only=False)
        vals = [fine.column(c).to_pylist() for c in keys]
        gks: list[str] = []
        counts: list[int] = []
        for mask in masks:
            agg: dict[str, int] = {}
            for i in range(fine.num_rows):
                gk = sep.join(
                    [str(mask)]
                    + [
                        vals[j][i] if mask & (1 << j) else all_label
                        for j in range(len(keys))
                    ]
                )
                agg[gk] = agg.get(gk, 0) + int(n[i])
            gks.extend(agg)
            counts.extend(agg.values())
        return pa.table(
            {
                "gk": pa.array(gks, pa.string()),
                "n_partial": pa.array(counts, pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        parts = g.column("gk").to_pylist()[0].split(sep)
        total = int(
            pa.compute.sum(g.column("n_partial")).as_py()  # ints: order-free
        )
        cols = {c: pa.array([parts[1 + j]], pa.string()) for j, c in enumerate(keys)}
        cols[tag_col] = pa.array([tag_of_mask(int(parts[0]))], pa.int64())
        cols["n_rows"] = pa.array([total], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gk")
        .map_groups(fold, batch_format="pyarrow")
    )


def rollup_counts(ds, *, keys: list[str], all_label: str = "(all)"):
    """GROUP BY ROLLUP(*keys): row counts at every prefix level of ``keys``
    — (k1, k2), (k1,), () for two keys. Output: (*keys, lvl, n_rows) with
    lvl = number of concrete key columns in the row. See
    :func:`_grouping_sets_counts` for the shape and NULL contract.
    """
    if not keys or len(set(keys)) != len(keys):
        raise ValueError("keys must be a non-empty list of distinct columns")
    masks = [(1 << lvl) - 1 for lvl in range(len(keys), -1, -1)]  # prefixes
    return _grouping_sets_counts(
        ds, keys, masks, all_label, "lvl", lambda m: bin(m).count("1")
    )


def cube_counts(ds, *, keys: list[str], all_label: str = "(all)"):
    """GROUP BY CUBE(*keys): row counts at every subset of ``keys`` (2^K
    grouping sets). Output: (*keys, grp, n_rows) with ``grp`` the DuckDB
    GROUPING bitmask (``grouping(k1)*2^(K-1) + ... + grouping(kK)``: bit
    set ⇒ that key is rolled up — the inverse of the internal concrete
    mask, matching the SQL convention). See :func:`_grouping_sets_counts`
    for the shape and NULL contract; the 2^K local expansion is over the
    batch's already-aggregated finest partial, never its rows.
    """
    if not keys or len(set(keys)) != len(keys):
        raise ValueError("keys must be a non-empty list of distinct columns")
    kk = len(keys)
    masks = list(range((1 << kk) - 1, -1, -1))  # all subsets, finest first

    def grp(mask: int) -> int:
        # SQL GROUPING bitmask: leftmost key = most-significant bit
        return sum(
            (0 if mask & (1 << j) else 1) << (kk - 1 - j) for j in range(kk)
        )

    return _grouping_sets_counts(ds, keys, masks, all_label, "grp", grp)
