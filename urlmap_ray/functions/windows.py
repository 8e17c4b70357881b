"""Windowed / sessionized aggregates over an event stream table.

The reference engine has no windowing (SURVEY.md §2.9); this is a
training-data-pipeline extension: gap-based sessionization expressed as
``groupby(key).map_groups`` — the key shuffle co-locates each user's events,
then the window logic is a vectorized per-group numpy pass (sort, diff,
cumsum). No driver-side loop; group sizes are per-user event counts, which
are small and naturally bounded (hot users would be the skew to salt).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize(
    ds,
    *,
    gap_s: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Split each key's events into sessions at > gap_s idle gaps.

    Returns a Dataset (user_id, session_id, session_start, n_events) with
    session_id numbered 1..n per user in time order.
    """
    gap_us = int(gap_s * 1_000_000)

    def per_key(group: pa.Table) -> pa.Table:
        key_arr = group.column(key_col)
        # normalize any timestamp unit to µs so gap_us compares correctly
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        new_session = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new_session[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        starts = np.flatnonzero(new_session)
        counts = np.diff(np.append(starts, len(ts)))
        # key column keeps its input type (int, string, ...)
        key_out = key_arr.slice(0, 1).combine_chunks().take(
            pa.array(np.zeros(len(starts), dtype=np.int64))
        )
        return pa.table(
            {
                key_col: key_out,
                "session_id": pa.array(sid[starts], pa.int64()),
                "session_start": pa.array(ts[starts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")
