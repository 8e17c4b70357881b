"""Adaptive re-crawl scheduling — the step a production crawler runs
after a snapshot diff (``crawl_diff``): compare two crawl snapshots per
URL and assign each URL its next revisit period with the classic
multiplicative rule (Cho & Garcia-Molina's adaptive revisit policy:
changed pages are polled more often, stable pages back off).

Decision rule (pinned; mirrored by the SQL FULL OUTER JOIN oracle)::

    in both, content equal   → 'unchanged', min(2·base, max_period)
    in both, content differs → 'changed',   max(base // 2, min_period)
    only in new snapshot     → 'new',       min_period
    only in old snapshot     → 'gone',      0

All periods are int64 seconds — integer arithmetic only, so the result
is bit-stable across engines and partitionings.

Scale shape: ONE bucketed exchange. Each side is padded to a shared
(id, content, side) schema row-locally, the union is grouped by
``hash(id) % n_buckets`` (never one group per URL — a bucket holds
~rows/B of both sides), and inside a bucket the verdict is one Arrow
sort + run-boundary numpy arithmetic: URLs present on both sides form
runs of length 2, singletons are new/gone by side. Content here is the
page text for oracle-exactness at test scale; at 100 TB the same
pipeline carries a 128-bit content fingerprint computed at extraction
time instead (the composition is unchanged, only the exchanged payload
narrows — the line_dedup contract).

Inputs must be DISTINCT on ``id_col`` (crawl snapshots are keyed by
canonical URL); a duplicate raises loudly rather than guessing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lines import _bucket_col, _col, _run_starts

__all__ = ["recrawl_schedule"]


def recrawl_schedule(
    old_ds,
    new_ds,
    *,
    id_col: str = "url",
    content_col: str = "text",
    base_period_s: int = 86_400,
    min_period_s: int = 3_600,
    max_period_s: int = 30 * 86_400,
    n_buckets: int = 64,
):
    """(old snapshot, new snapshot) → (id, status, next_period_s) Dataset."""
    p_unchanged = min(2 * base_period_s, max_period_s)
    p_changed = max(base_period_s // 2, min_period_s)

    def pad(side: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column(id_col)
            return pa.table(
                {
                    id_col: ids,
                    "content": t.column(content_col),
                    "side": pa.array(
                        np.full(t.num_rows, side, dtype=np.int8), pa.int8()
                    ),
                    "rbk": _bucket_col(ids, n_buckets),
                }
            )

        return f

    def decide(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.string()),
                    "status": pa.array([], pa.string()),
                    "next_period_s": pa.array([], pa.int64()),
                }
            )
        order = pc.sort_indices(
            g, sort_keys=[(id_col, "ascending"), ("side", "ascending")]
        )
        ids_s = _col(g, id_col).take(order)
        content_s = _col(g, "content").take(order)
        side_s = _col(g, "side").take(order).to_numpy(zero_copy_only=False)
        starts = _run_starts(ids_s)
        run_starts = np.flatnonzero(starts)
        run_lens = np.diff(np.append(run_starts, n))
        if run_lens.max(initial=0) > 2:
            bad = ids_s[int(run_starts[int(np.argmax(run_lens))])].as_py()
            raise ValueError(
                f"recrawl_schedule: snapshot not distinct on {id_col!r} "
                f"(key {bad!r} has {int(run_lens.max())} rows across sides)"
            )
        singles = run_starts[run_lens == 1]
        pairs = run_starts[run_lens == 2]
        # pairs: sorted (side 0, side 1) — equality of adjacent contents
        if len(pairs):
            pair_idx = pa.array(pairs, pa.int64())
            eq = pc.equal(
                content_s.take(pair_idx),
                content_s.take(pa.array(pairs + 1, pa.int64())),
            ).to_numpy(zero_copy_only=False)
        else:
            eq = np.zeros(0, dtype=bool)
        single_is_new = side_s[singles] == 1
        statuses = np.concatenate(
            [
                np.where(eq, "unchanged", "changed"),
                np.where(single_is_new, "new", "gone"),
            ]
        )
        periods = np.concatenate(
            [
                np.where(eq, np.int64(p_unchanged), np.int64(p_changed)),
                np.where(single_is_new, np.int64(min_period_s), np.int64(0)),
            ]
        ).astype(np.int64)
        out_idx = pa.array(np.concatenate([pairs, singles]), pa.int64())
        return pa.table(
            {
                id_col: ids_s.take(out_idx),
                "status": pa.array(statuses, pa.string()),
                "next_period_s": pa.array(periods, pa.int64()),
            }
        )

    unioned = old_ds.map_batches(
        pad(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(new_ds.map_batches(pad(1), batch_format="pyarrow", zero_copy_batch=True))
    return unioned.groupby("rbk").map_groups(decide, batch_format="pyarrow")
