"""General relational joins, Ray-Data-first.

Two shapes, picked by side size (SURVEY.md §2.5):

- ``broadcast_join``: the small side is built into one Arrow table on the
  driver, ``ray.put`` ONCE into the object store, and every ``map_batches``
  task does a zero-copy ``ray.get`` + vectorized index_in probe. No shuffle;
  the big side streams. This is the frontier⋈robots shape.
- ``shuffle_join``: both sides hash-partitioned on the key via Ray Data's
  native ``Dataset.join`` (Ray 2.46+). This is the frontier⋈pages shape
  when neither side fits in one object — an explicit all-to-all exchange,
  so ``num_partitions`` must be sized to the cluster (2-4× cores).

Reference has no relational joins (live HTTP replaces them,
crawler.go:677-748); these are the engine-level primitives our corpus
"fetch" (stages/fetch.py) and training-data pipelines build on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(
    ds,
    small: pa.Table,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    columns: list[str] | None = None,
):
    """Join a (big, streaming) Dataset against a small in-memory Arrow table.

    The small side is put in the object store once; each batch task probes it
    with ``pc.index_in`` (vectorized hash lookup) and ``take``s the matching
    right-side rows — never re-shipped per batch, never shuffled.

    how: "inner" drops unmatched left rows; "left" keeps them with nulls.

    The right side must be UNIQUE on ``right_on``: the probe is an
    ``index_in`` lookup (first match), so duplicate right keys would
    silently drop the 1:N expansion — use ``shuffle_join`` for those.
    Right-side column names must not collide with left columns.
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports how='inner'|'left', got {how!r}")
    if columns is not None:
        small = small.select([right_on, *columns])
    n_keys = pc.count_distinct(small.column(right_on)).as_py()
    if n_keys != small.num_rows:
        raise ValueError(
            f"broadcast_join right side has duplicate {right_on!r} keys "
            f"({small.num_rows} rows, {n_keys} distinct) — a 1:N join would "
            "silently keep only the first match; use shuffle_join instead"
        )
    # Pre-sort not needed: index_in builds a hash table per task once per
    # actor-process (the table object is cached by the object store).
    small_ref = ray.put(small.combine_chunks())
    right_cols = [c for c in small.column_names if c != right_on]

    def probe(batch: pa.Table) -> pa.Table:
        rt = ray.get(small_ref)
        clash = set(right_cols) & set(batch.column_names)
        if clash:
            raise ValueError(
                f"broadcast_join column name collision: {sorted(clash)} exist "
                "on both sides — project or rename before joining"
            )
        idx = pc.index_in(batch.column(left_on), value_set=rt.column(right_on))
        if how == "inner":
            keep = pc.is_valid(idx)
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        taken = rt.take(idx)  # null idx -> null row (left join)
        out = batch
        for c in right_cols:
            out = out.append_column(c, taken.column(c))
        return out

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_join(
    left,
    right,
    *,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = 16,
):
    """Hash-shuffle join of two Datasets via Ray Data's native ``join``.

    Both sides are hash-partitioned on the key — an explicit all-to-all
    exchange. Use only when neither side is broadcastable; size
    ``num_partitions`` to ~2-4× cluster cores so no aggregator starves.
    """
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on_t,
        right_on=r_t,
    )
