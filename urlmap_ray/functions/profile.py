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

__all__ = ["cross_moments", "table_profile"]

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


def cross_moments(ds, *, cols: list[str], n_buckets: int = 32):
    """Exact pairwise cross-moments → Pearson correlation (ppb) between
    integer feature columns — the profiling step that answers "are these
    two quality signals redundant?" before a feature is paid for at
    100 TB (feature selection / collinearity triage).

    Scale shape: ONE ``map_batches`` pass emits per (pair, batch) a
    single 9-scalar partial row (n, Σx, Σy, Σx², Σy², Σxy — all int64;
    contract: |x| < 2^21 and batch ≤ 2^16 rows keep every per-batch sum
    exact). A bucketed ``groupby((col_a, col_b, sub))`` compacts the
    n_batches partials with arbitrary-precision Python ints carried as
    DECIMAL STRINGS (the lrtrain/decomposition exactness trick, made
    shippable), then one ``groupby(pair)`` fold sees ≤ n_buckets rows
    per pair. Integer sums are associative, so the result is
    bit-identical at any parallelism; nothing O(rows) ever reaches the
    driver.

    Pinned correlation rule (mirrored op-for-op by the SQL oracle)::

        num = n·Σxy − Σx·Σy         d1 = n·Σx² − (Σx)²
        d2  = n·Σy² − (Σy)²          (exact integers)
        corr_ppb = floor( float(num) / (sqrt(float(d1)) · sqrt(float(d2)))
                          · 1e9 + 0.5 )          — NULL when d1·d2 == 0

    Each float step is one correctly-rounded IEEE op. The int→double
    conversions are bit-equal between CPython and DuckDB only while the
    moments fit in 53 bits (DuckDB's HUGEINT→DOUBLE cast truncates, not
    rounds — measured); the gate corpora stay ~2^10 below that line,
    and the engine side is exact at ANY scale (Python ints → one
    correctly-rounded float conversion at the very end).
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    if not pairs:
        raise ValueError("cross_moments needs >= 2 columns")

    def partials(t: pa.Table) -> pa.Table:
        arrs = {
            c: t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in cols
        }
        # The documented exactness contract (|x| < 2^21, batch <= 2^16
        # rows) keeps every int64 per-batch sum overflow-free. Violations
        # must fail loudly — a silent wraparound would produce a wrong
        # correlation with no error.
        for c, arr in arrs.items():
            if len(arr) and int(np.abs(arr).max()) >= 1 << 21:
                raise ValueError(
                    f"cross_moments: |{c}| >= 2^21 violates the int64 "
                    "partial-sum contract (per-batch (x*x).sum() could "
                    "overflow silently); rescale or bucket the feature"
                )
            if len(arr) > 1 << 16:
                raise ValueError(
                    f"cross_moments: batch of {len(arr)} rows > 2^16 "
                    "violates the int64 partial-sum contract; lower "
                    "batch_size upstream"
                )
        ca, cb, sub, n, sx, sy, sxx, syy, sxy = [], [], [], [], [], [], [], [], []
        for a, b in pairs:
            x, y = arrs[a], arrs[b]
            xx = int((x * x).sum())
            ca.append(a)
            cb.append(b)
            sub.append(xx % n_buckets)
            n.append(len(x))
            sx.append(int(x.sum()))
            sy.append(int(y.sum()))
            sxx.append(xx)
            syy.append(int((y * y).sum()))
            sxy.append(int((x * y).sum()))
        return pa.table(
            {
                "col_a": pa.array(ca, pa.string()),
                "col_b": pa.array(cb, pa.string()),
                "sub": pa.array(sub, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sx": pa.array([str(v) for v in sx], pa.string()),
                "sy": pa.array([str(v) for v in sy], pa.string()),
                "sxx": pa.array([str(v) for v in sxx], pa.string()),
                "syy": pa.array([str(v) for v in syy], pa.string()),
                "sxy": pa.array([str(v) for v in sxy], pa.string()),
            }
        )

    def _fold_sums(g: pa.Table):
        n = int(pc.sum(g.column("n")).as_py() or 0)
        out = [n]
        for name in ("sx", "sy", "sxx", "syy", "sxy"):
            out.append(sum(int(s) for s in g.column(name).to_pylist()))
        return out

    def compact(g: pa.Table) -> pa.Table:
        n, sx, sy, sxx, syy, sxy = _fold_sums(g)
        return pa.table(
            {
                "col_a": g.column("col_a").slice(0, 1),
                "col_b": g.column("col_b").slice(0, 1),
                "sub": g.column("sub").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "sx": pa.array([str(sx)], pa.string()),
                "sy": pa.array([str(sy)], pa.string()),
                "sxx": pa.array([str(sxx)], pa.string()),
                "syy": pa.array([str(syy)], pa.string()),
                "sxy": pa.array([str(sxy)], pa.string()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        import math

        n, sx, sy, sxx, syy, sxy = _fold_sums(g)
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        if d1 > 0 and d2 > 0:
            corr = float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
            ppb = pa.array([math.floor(corr * 1e9 + 0.5)], pa.int64())
        else:
            ppb = pa.nulls(1, pa.int64())
        return pa.table(
            {
                "col_a": g.column("col_a").slice(0, 1),
                "col_b": g.column("col_b").slice(0, 1),
                "n_rows": pa.array([n], pa.int64()),
                "corr_ppb": ppb,
            }
        )

    return (
        ds.map_batches(
            partials,
            batch_format="pyarrow",
            zero_copy_batch=True,
            # the exactness contract is per-batch: cap rows so the int64
            # partial sums provably can't overflow (enforced in partials)
            batch_size=1 << 16,
        )
        .groupby(["col_a", "col_b", "sub"])
        .map_groups(compact, batch_format="pyarrow")
        .groupby(["col_a", "col_b"])
        .map_groups(finish, batch_format="pyarrow")
    )
