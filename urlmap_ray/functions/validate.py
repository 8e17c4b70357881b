"""Declarative data-quality validation — the Deequ/TFDV-style "unit
tests for data" stage (Schelter et al. 2018, VLDB): a pipeline declares
constraints over a table and gets back one verdict row per constraint
with exact violation counts, cheap enough to run on every ingest.

At 100 TB this is the gate between "the crawler wrote parquet" and
"training reads it": schema drift, null floods, duplicate keys and
broken foreign references are caught in ONE streaming pass instead of
poisoning a downstream join.

Scale shape:

- **Row-local constraints** (``not_null`` / ``range`` / ``regex`` /
  ``in_set``) cost one vectorized Arrow kernel per batch and ship ONE
  partial row per (constraint, batch) — no key ever leaves the batch.
- **uniqueness** is the one value exchange: each batch ships its
  distinct (hash64(value), count) pairs — the dedup-family bound, O(batch
  distinct) 16-byte rows, never strings — and a bucketed
  ``groupby((constraint, bucket))`` folds counts so a value's total is
  assembled exactly once; rows with total > 1 are the violations.
- **ref** (referential containment) probes a broadcast sorted hash
  array with ``np.searchsorted`` — the decontam shape. The key set is
  built distributedly and pulled under a DECLARED ``max_keys`` bound
  (the tfidf ``max_vocab`` pattern; a dimension table above the bound
  should gate through ``joins.semi_join`` instead).

All counts are exact int64; sums are associative, so every verdict is
bit-identical at any parallelism. Hash-collision caveat (uniqueness and
ref compare 64-bit value hashes, not values): P(any collision) ≈
n²/2⁶⁵ — negligible below ~10⁹ distinct values, switch to 128-bit
hashes beyond (the dedup family's documented tradeoff).

Null semantics (pinned, Deequ-compatible): only ``not_null`` counts
nulls as violations; ``range``/``regex``/``in_set``/``unique``/``ref``
evaluate non-null values only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import hash64_column

__all__ = ["check_constraints", "distinct_key_hashes"]

_ROWLOCAL = -1  # bucket sentinel for per-batch counter rows


def distinct_key_hashes(ds, *, col: str, max_keys: int = 5_000_000) -> np.ndarray:
    """Distinct hash64 values of ``ds[col]`` as a sorted uint64 array for
    searchsorted probing — the broadcast side of a ``ref`` constraint.
    Dedup happens distributedly (per-batch ``np.unique`` → one bucketed
    groupby); only the <= max_keys survivors reach the driver. Raises
    loudly above the declared bound instead of silently materializing a
    huge dimension."""

    def batch_keys(t: pa.Table) -> pa.Table:
        c = t.column(col)
        if c.null_count:
            c = c.drop_null()
        h = np.unique(hash64_column(c)) if len(c) else np.zeros(0, np.uint64)
        return pa.table({"vh": pa.array(h.view(np.int64), pa.int64())})

    rows = (
        ds.map_batches(batch_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vh")
        .count()
        .take_all()
    )
    if len(rows) > max_keys:
        raise ValueError(
            f"ref key set for {col!r} has {len(rows)} distinct values, above "
            f"the declared max_keys={max_keys}; use joins.semi_join for a "
            "dimension this large"
        )
    return np.sort(np.array([r["vh"] for r in rows], np.int64).view(np.uint64))


def _rowlocal_violations(t: pa.Table, c: dict) -> int:
    col = t.column(c["col"])
    kind = c["kind"]
    if kind == "not_null":
        return col.null_count
    valid = col.drop_null() if col.null_count else col
    if not len(valid):
        return 0
    if kind == "range":
        ok = pc.and_(
            pc.greater_equal(valid, c["lo"]), pc.less_equal(valid, c["hi"])
        )
    elif kind == "regex":
        ok = pc.match_substring_regex(valid, c["pattern"])
    elif kind == "in_set":
        ok = pc.is_in(valid, value_set=pa.array(c["values"], valid.type))
    else:
        raise ValueError(f"unknown row-local constraint kind {kind!r}")
    return len(valid) - int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)


def check_constraints(ds, constraints: list[dict], *, n_buckets: int = 64):
    """Validate ``ds`` against declared constraints → Dataset of
    ``(constraint, n_rows, n_violations, ok)``, one row per constraint,
    sorted by name. Each constraint is a dict:

    - ``{"name", "kind": "not_null", "col"}``
    - ``{"name", "kind": "range", "col", "lo", "hi"}`` (inclusive)
    - ``{"name", "kind": "regex", "col", "pattern"}`` (RE2 search — anchor
      with ^...$ for full-match)
    - ``{"name", "kind": "in_set", "col", "values": [...]}``
    - ``{"name", "kind": "unique", "col"}``
    - ``{"name", "kind": "ref", "col", "keys": sorted uint64 ndarray}``
      (from :func:`distinct_key_hashes`; shipped once via ``ray.put``)

    One streaming pass over the data; see module docstring for the
    exchange shape of each family.
    """
    import ray

    by_name = {}
    for c in constraints:
        if c["name"] in by_name:
            raise ValueError(f"duplicate constraint name {c['name']!r}")
        by_name[c["name"]] = c
    ref_refs = {
        c["name"]: ray.put(np.ascontiguousarray(c["keys"], np.uint64))
        for c in constraints
        if c["kind"] == "ref"
    }

    def partials(t: pa.Table) -> pa.Table:
        names, bks, vhs, ns, viols = [], [], [], [], []
        n = t.num_rows
        for c in constraints:
            if c["kind"] == "unique":
                # counter row (carries n) + per-distinct-value count rows
                names.append(c["name"])
                bks.append(_ROWLOCAL)
                vhs.append(0)
                ns.append(n)
                viols.append(0)
                col = t.column(c["col"])
                if col.null_count:
                    col = col.drop_null()
                if len(col):
                    h, cnt = np.unique(hash64_column(col), return_counts=True)
                    hs = h.view(np.int64)
                    bk = (h % np.uint64(n_buckets)).astype(np.int64)
                    names.extend([c["name"]] * len(h))
                    bks.extend(bk.tolist())
                    vhs.extend(hs.tolist())
                    ns.extend([0] * len(h))
                    viols.extend(cnt.astype(np.int64).tolist())
                continue
            if c["kind"] == "ref":
                keys = ray.get(ref_refs[c["name"]])
                col = t.column(c["col"])
                if col.null_count:
                    col = col.drop_null()
                viol = 0
                if len(col):
                    h = hash64_column(col)
                    if len(keys):
                        pos = np.searchsorted(keys, h)
                        pos[pos == len(keys)] = 0
                        viol = int(np.count_nonzero(keys[pos] != h))
                    else:
                        viol = len(col)
            else:
                viol = _rowlocal_violations(t, c)
            names.append(c["name"])
            bks.append(_ROWLOCAL)
            vhs.append(0)
            ns.append(n)
            viols.append(viol)
        return pa.table(
            {
                "constraint": pa.array(names, pa.string()),
                "bk": pa.array(bks, pa.int64()),
                "vh": pa.array(vhs, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "viol": pa.array(viols, pa.int64()),
            }
        )

    def bucket_fold(g: pa.Table) -> pa.Table:
        name = g.column("constraint")[0].as_py()
        bk = g.column("bk")[0].as_py()
        if bk == _ROWLOCAL:
            return pa.table(
                {
                    "constraint": pa.array([name], pa.string()),
                    "n": pa.array(
                        [int(pc.sum(g.column("n")).as_py() or 0)], pa.int64()
                    ),
                    "viol": pa.array(
                        [int(pc.sum(g.column("viol")).as_py() or 0)], pa.int64()
                    ),
                }
            )
        # uniqueness bucket: this bucket owns every count of its values
        vh = np.array(g.column("vh").to_pylist(), np.int64)
        cnt = np.array(g.column("viol").to_pylist(), np.int64)
        order = np.argsort(vh, kind="stable")
        vh, cnt = vh[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
        totals = np.add.reduceat(cnt, starts)
        viol = int(totals[totals > 1].sum())
        return pa.table(
            {
                "constraint": pa.array([name], pa.string()),
                "n": pa.array([0], pa.int64()),
                "viol": pa.array([viol], pa.int64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        name = g.column("constraint")[0].as_py()
        n = int(pc.sum(g.column("n")).as_py() or 0)
        viol = int(pc.sum(g.column("viol")).as_py() or 0)
        return pa.table(
            {
                "constraint": pa.array([name], pa.string()),
                "n_rows": pa.array([n], pa.int64()),
                "n_violations": pa.array([viol], pa.int64()),
                "ok": pa.array([viol == 0], pa.bool_()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["constraint", "bk"])
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("constraint")
        .map_groups(finish, batch_format="pyarrow")
        .sort("constraint")
    )
