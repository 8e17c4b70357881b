"""Snapshot compaction (upsert) — the step AFTER ``recrawl_plan``: fold a
re-crawl's fetched pages into the standing corpus, keeping exactly one row
per URL, the freshest version. This is the classic multi-version table
compaction (Delta/Iceberg "merge latest", or a crawler's "apply the new
WARC batch to the page store"): the re-crawl delta and the old corpus are
unioned and the winner per key is the row with the greatest
``(ts, seq)`` — both int64, so the verdict is pure integer comparison and
bit-stable across engines and partitionings.

Pinned rule (mirrored by the SQL ROW_NUMBER oracle)::

    winner(url) = argmax over rows of (ts_col, seq_col)   — later wins,
    seq breaks exact-ts ties (new snapshot carries the higher seq).
    A full (id, ts, seq) tie is ambiguous and raises loudly.

Scale shape: ONE bucketed exchange. Rows are grouped by
``hash(id) % n_buckets`` (a bucket holds ~rows/B keys, never one group
per URL); inside a bucket one Arrow multi-key sort puts each key's rows
in (ts desc, seq desc) order and a vectorized run-boundary mask takes
the head of every run — no row loop, no driver state. The payload
(page text / html fingerprint at 100 TB) rides the same rows; only the
two int64 version columns are inspected.

Reference tie-in: urlmap re-crawls overwrite the visited map entry for a
URL (crawler.go LoadOrStore semantics make first-writer-wins *within* a
crawl; *across* crawls the newer run replaces the output wholesale).
``compact_latest`` is that replacement expressed per-URL so unchanged
pages keep their old rows (resumable, delta-sized re-crawls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lines import _bucket_col, _col, _run_starts

__all__ = ["compact_latest", "apply_recrawl"]

_RBK = "__rbk"


def compact_latest(
    ds,
    *,
    id_col: str = "url",
    ts_col: str = "ts_us",
    seq_col: str = "crawl_seq",
    n_buckets: int = 64,
):
    """Multi-version Dataset → one (latest) row per ``id_col``.

    ``ts_col`` and ``seq_col`` must be integer columns (epoch micros /
    crawl sequence number); all other columns are payload and pass
    through unchanged. Output column order = input order.
    """
    names: list[str] | None = None

    def key(t: pa.Table) -> pa.Table:
        nonlocal names
        return t.append_column(_RBK, _bucket_col(t.column(id_col), n_buckets))

    def latest(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_RBK])
        if g.num_rows == 0:
            return g
        order = pc.sort_indices(
            g,
            sort_keys=[
                (id_col, "ascending"),
                (ts_col, "descending"),
                (seq_col, "descending"),
            ],
        )
        s = g.take(order)
        ids_s = _col(s, id_col)
        starts = _run_starts(ids_s)
        # ambiguous full ties: adjacent rows of one key equal on (ts, seq)
        if s.num_rows > 1:
            ts_s = _col(s, ts_col).to_numpy(zero_copy_only=False)
            sq_s = _col(s, seq_col).to_numpy(zero_copy_only=False)
            dup = (
                (~starts[1:])
                & (ts_s[1:] == ts_s[:-1])
                & (sq_s[1:] == sq_s[:-1])
            )
            if dup.any():
                bad = ids_s[int(np.flatnonzero(dup)[0]) + 1].as_py()
                raise ValueError(
                    f"compact_latest: key {bad!r} has duplicate "
                    f"({ts_col}, {seq_col}) versions — ambiguous winner"
                )
        return s.filter(pa.array(starts))

    return ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True).groupby(
        _RBK
    ).map_groups(latest, batch_format="pyarrow")


def apply_recrawl(
    old_ds,
    new_ds,
    *,
    id_col: str = "url",
    ts_col: str = "ts_us",
    n_buckets: int = 64,
):
    """Upsert a re-crawl snapshot into the standing corpus.

    Both sides must share a schema containing ``id_col`` + int64
    ``ts_col`` + payload. A ``crawl_seq`` column is attached (old=0,
    new=1) so an exact-ts re-fetch still resolves to the new row, then
    the union is compacted. Pages present only in the old corpus are
    KEPT (a compaction retains unvisited pages; deletion is
    ``recrawl_plan``'s 'gone' verdict, a separate policy decision).
    """

    def seq(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "crawl_seq",
                pa.array(np.full(t.num_rows, v, dtype=np.int64), pa.int64()),
            )

        return f

    unioned = old_ds.map_batches(
        seq(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(new_ds.map_batches(seq(1), batch_format="pyarrow", zero_copy_batch=True))
    return compact_latest(
        unioned, id_col=id_col, ts_col=ts_col, seq_col="crawl_seq", n_buckets=n_buckets
    )
