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


def asof_join(
    left,
    right,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
    direction: str = "backward",
    tie_col: str | None = None,
):
    """Distributed as-of join: for each left row, the single right row with
    the greatest ``right_ts`` <= ``left_ts`` (direction="backward") or the
    smallest ``right_ts`` >= ``left_ts`` ("forward") within the same ``on``
    key.

    Ray Data has no native as-of join; this is the composition the engine
    uses instead of a raw-actor design: both sides are padded to one common
    schema, ``union``ed, and hash-shuffled ONCE by ``groupby(on)`` so each
    key's rows from both sides land in the same group. The per-group merge
    is a vectorized sort + ``np.searchsorted`` — no Python loop over rows,
    no driver-side state, and the only exchange is the single key shuffle.

    Partitioning assumption (documented per the engine's custom-operator
    rule): one key's rows must fit in a worker's heap. Keys here are
    user/customer-grained (10^2-10^5 rows each at 100TB scale); a hot key
    would be salted by time-bucket with boundary replication — not needed
    for the registered workloads.

    how: "left" keeps unmatched left rows with nulls; "inner" drops them.
    Ties on ``right_ts`` are broken by the largest ``tie_col`` value when
    given; otherwise tied winners are unspecified (matches pandas
    ``merge_asof``'s last-row behavior only under a deterministic input
    order, so pass ``tie_col`` whenever ties are possible).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction must be 'backward'|'forward', got {direction!r}")

    def _pa_schema(ds):
        s = ds.schema()
        return pa.schema(list(zip(s.names, s.types)))

    lsch, rsch = _pa_schema(left), _pa_schema(right)
    left_payload = [c for c in lsch.names if c != on]
    clash = set(right_cols) & set(lsch.names)
    if clash:
        raise ValueError(
            f"asof_join column name collision: {sorted(clash)} exist on both "
            "sides — project or rename the right side before joining"
        )
    missing = [c for c in right_cols if c not in rsch.names]
    if missing:
        raise ValueError(f"asof_join right_cols not in right schema: {missing}")
    tie_cols = [tie_col] if tie_col else []

    def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        t = col.type
        if pa.types.is_timestamp(t):
            col = col.cast(pa.timestamp("us"))
        return col.cast(pa.int64())

    def pad_left(t: pa.Table) -> pa.Table:
        cols = {on: t.column(on), "__ts": _ts_us(t.column(left_ts)),
                "__side": pa.nulls(t.num_rows, pa.int8()).fill_null(1)}
        for c in left_payload:
            cols[c] = t.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, rsch.field(c).type)
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {on: t.column(on), "__ts": _ts_us(t.column(right_ts)),
                "__side": pa.nulls(t.num_rows, pa.int8()).fill_null(0)}
        for c in left_payload:
            cols[c] = pa.nulls(t.num_rows, lsch.field(c).type)
        for c in right_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    unioned = left.map_batches(
        pad_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True))

    out_names = [on, *left_payload, *right_cols]

    def merge(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 1))
        rt = g.filter(pa.array(side == 0))
        if lt.num_rows == 0:
            return pa.table({c: pa.nulls(0, g.schema.field(c).type) for c in out_names})
        lts = lt.column("__ts").to_numpy(zero_copy_only=False)
        if rt.num_rows == 0:
            idx = np.full(len(lts), -1, dtype=np.int64)
        else:
            keys = [rt.column("__ts").to_numpy(zero_copy_only=False)]
            for c in reversed(tie_cols):
                keys.insert(0, rt.column(c).to_numpy(zero_copy_only=False))
            order = np.lexsort(keys)
            rt = rt.take(pa.array(order))
            rts = keys[-1][order]
            if direction == "backward":
                idx = np.searchsorted(rts, lts, side="right") - 1
            else:
                # forward wants the SMALLEST qualifying ts; within equal ts
                # the sort put the largest tie_col last, so step to the last
                # row of the first qualifying ts run.
                lo = np.searchsorted(rts, lts, side="left")
                hi = np.searchsorted(rts, rts, side="right")  # end of each run
                idx = np.where(lo < len(rts), hi[np.minimum(lo, len(rts) - 1)] - 1, -1)
        valid = idx >= 0
        cols = {c: lt.column(c) for c in [on, *left_payload]}
        vmask = pa.array(valid)
        take_idx = pa.array(np.where(valid, idx, 0), pa.int64())
        for c in right_cols:
            if rt.num_rows == 0:
                cols[c] = pa.nulls(lt.num_rows, g.schema.field(c).type)
            else:
                taken = rt.column(c).combine_chunks().take(take_idx)
                cols[c] = pc.if_else(vmask, taken, pa.scalar(None, type=taken.type))
        out = pa.table(cols)
        if how == "inner":
            out = out.filter(vmask)
        return out

    return unioned.groupby(on).map_groups(merge, batch_format="pyarrow")


def range_join(
    left,
    right,
    *,
    on: str,
    left_point: str,
    right_lo: str,
    right_hi: str,
    right_cols: list[str],
    how: str = "inner",
    closed: str = "both",
    pair_block: int = 4096,
):
    """Distributed range (interval-containment) join: each left row matches
    EVERY right row of the same ``on`` key whose ``[right_lo, right_hi]``
    interval contains ``left_point`` (1:N output).

    Same composition as :func:`asof_join` — pad to one schema, ``union``,
    one ``groupby(on)`` shuffle, vectorized per-group match — because Ray
    Data has no native interval join either. Intervals per key MAY overlap:
    the per-group match is a blockwise boolean containment matrix
    (``pair_block`` left rows at a time), O(n_left × n_intervals) per key
    but fully vectorized; per-key interval counts are small for the
    registered workloads (sessions per user). For keys with many
    non-overlapping intervals an ``asof_join`` on ``right_lo`` + an end
    check is the cheaper plan.

    closed: "both" matches lo <= p <= hi (SQL BETWEEN); "left" matches
    lo <= p < hi. how: "inner" drops unmatched left rows, "left" keeps them
    with nulls (a left row inside k intervals still yields k rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    if closed not in ("both", "left"):
        raise ValueError(f"range_join closed must be 'both'|'left', got {closed!r}")

    def _pa_schema(ds):
        s = ds.schema()
        return pa.schema(list(zip(s.names, s.types)))

    lsch, rsch = _pa_schema(left), _pa_schema(right)
    left_payload = [c for c in lsch.names if c != on]
    clash = set(right_cols) & set(lsch.names)
    if clash:
        raise ValueError(
            f"range_join column name collision: {sorted(clash)} exist on both "
            "sides — project or rename the right side before joining"
        )

    def _as_i64(col):
        t = col.type
        if pa.types.is_timestamp(t):
            col = col.cast(pa.timestamp("us"))
        return col.cast(pa.int64())

    def pad_left(t: pa.Table) -> pa.Table:
        cols = {on: t.column(on), "__p": _as_i64(t.column(left_point)),
                "__lo": pa.nulls(t.num_rows, pa.int64()),
                "__hi": pa.nulls(t.num_rows, pa.int64()),
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int8))}
        for c in left_payload:
            cols[c] = t.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, rsch.field(c).type)
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {on: t.column(on), "__p": pa.nulls(t.num_rows, pa.int64()),
                "__lo": _as_i64(t.column(right_lo)),
                "__hi": _as_i64(t.column(right_hi)),
                "__side": pa.array(np.zeros(t.num_rows, dtype=np.int8))}
        for c in left_payload:
            cols[c] = pa.nulls(t.num_rows, lsch.field(c).type)
        for c in right_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    unioned = left.map_batches(
        pad_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True))

    out_names = [on, *left_payload, *right_cols]

    def merge(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 1))
        rt = g.filter(pa.array(side == 0))
        if lt.num_rows == 0:
            return pa.table({c: pa.nulls(0, g.schema.field(c).type) for c in out_names})
        pts = lt.column("__p").to_numpy(zero_copy_only=False)
        lo = rt.column("__lo").to_numpy(zero_copy_only=False)
        hi = rt.column("__hi").to_numpy(zero_copy_only=False)
        li_parts, ri_parts = [], []
        for s in range(0, len(pts), pair_block):
            p = pts[s : s + pair_block, None]
            ok = (lo[None, :] <= p) & ((p <= hi[None, :]) if closed == "both" else (p < hi[None, :]))
            bi, bj = np.nonzero(ok)
            li_parts.append(bi + s)
            ri_parts.append(bj)
        li = np.concatenate(li_parts) if li_parts else np.zeros(0, np.int64)
        ri = np.concatenate(ri_parts) if ri_parts else np.zeros(0, np.int64)
        if how == "left":
            matched = np.zeros(len(pts), dtype=bool)
            matched[li] = True
            miss = np.flatnonzero(~matched)
            cols = {}
            for c in [on, *left_payload]:
                arr = lt.column(c).combine_chunks()
                cols[c] = pa.concat_arrays(
                    [arr.take(pa.array(li, pa.int64())), arr.take(pa.array(miss, pa.int64()))]
                )
            for c in right_cols:
                taken = rt.column(c).combine_chunks().take(pa.array(ri, pa.int64()))
                cols[c] = pa.concat_arrays(
                    [taken, pa.nulls(len(miss), g.schema.field(c).type)]
                )
            return pa.table(cols)
        cols = {c: lt.column(c).combine_chunks().take(pa.array(li, pa.int64()))
                for c in [on, *left_payload]}
        for c in right_cols:
            cols[c] = rt.column(c).combine_chunks().take(pa.array(ri, pa.int64()))
        return pa.table(cols)

    return unioned.groupby(on).map_groups(merge, batch_format="pyarrow")


def semi_join(
    left,
    right_keys,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    mode: str = "broadcast",
):
    """Semi/anti join: keep (``anti=False``) or drop (``anti=True``) the
    left rows whose ``on`` key appears in ``right_keys``. Output is left
    rows unchanged — no right columns, no 1:N expansion (what IN / NOT
    IN subqueries compile to).

    ``right_keys`` may be a Dataset, an Arrow table, or an Arrow array.

    mode="broadcast" (default): the DISTINCT right key set is reduced to
    one array — per-batch dedup streams, only distinct keys reach the
    driver — and shipped once via ``ray.put``; every left batch probes
    with ``pc.is_in`` (vectorized hash lookup). Zero shuffle, the left
    side streams. Right for key sets up to ~10^8 (the seen-set scale is
    handled by the sharded actor pool in state/seen.py instead).

    mode="shuffle": neither side moves to the driver — the repo's
    pad→union→one-``groupby(on)`` shape: left rows and (locally
    deduped) right key markers land in the same group; each group keeps
    or drops its left rows by whether a marker is present. Use when the
    right key set is too large to broadcast.

    Null semantics are NOT EXISTS, not SQL's NOT IN footgun: a null key
    never matches anything, and null-key left rows appear in NEITHER the
    semi nor the anti output.
    """
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"semi_join mode must be 'broadcast'|'shuffle', got {mode!r}")
    rkey = right_on or on

    def _key_batches(rk):
        """Iterate right-side key batches as Arrow arrays (local distinct)."""
        if isinstance(rk, pa.Table):
            yield rk.column(rkey).combine_chunks().unique()
            return
        if isinstance(rk, (pa.Array, pa.ChunkedArray)):
            yield pa.chunked_array([rk]).combine_chunks().unique()
            return
        for t in rk.map_batches(
            lambda b: pa.table({rkey: b.column(rkey).combine_chunks().unique()}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            yield t.column(rkey).combine_chunks()

    if mode == "broadcast":
        import ray

        parts = [a for a in _key_batches(right_keys) if len(a)]
        keys = (
            pa.concat_arrays([a.cast(a.type) for a in parts]).unique().drop_null()
            if parts
            else pa.array([], pa.int64())
        )
        keys_ref = ray.put(keys)

        def probe(batch: pa.Table) -> pa.Table:
            key = batch.column(on)
            vals = ray.get(keys_ref)
            if len(vals):
                mask = pc.fill_null(pc.is_in(key, value_set=vals), False)
            else:
                # empty right side matches nothing — the placeholder empty
                # array is int64-typed, so a typed is_in would raise on
                # non-integer keys
                mask = pa.array(np.zeros(batch.num_rows, dtype=bool))
            if anti:
                mask = pc.and_(pc.invert(mask), pc.is_valid(key))
            return batch.filter(mask)

        return left.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    # shuffle mode: one key shuffle, no driver state
    def _pa_schema(ds):
        s = ds.schema()
        return pa.schema(list(zip(s.names, s.types)))

    lsch = _pa_schema(left)
    left_payload = [c for c in lsch.names if c != on]

    def pad_left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(on)))  # null keys never match
        cols = {on: t.column(on),
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int8))}
        for c in left_payload:
            cols[c] = t.column(c)
        return pa.table(cols)

    def pad_right(t: pa.Table) -> pa.Table:
        keys = t.column(rkey).combine_chunks().unique().drop_null()
        cols = {on: keys.cast(lsch.field(on).type),
                "__side": pa.array(np.zeros(len(keys), dtype=np.int8))}
        for c in left_payload:
            cols[c] = pa.nulls(len(keys), lsch.field(c).type)
        return pa.table(cols)

    if isinstance(right_keys, (pa.Table, pa.Array, pa.ChunkedArray)):
        raise ValueError("mode='shuffle' needs a Dataset right side; "
                         "in-memory right sides should broadcast")

    unioned = left.map_batches(
        pad_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(right_keys.map_batches(pad_right, batch_format="pyarrow",
                                   zero_copy_batch=True))

    def pick(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        has_right = bool((side == 0).any())
        lt = g.filter(pa.array(side == 1)).select([on, *left_payload])
        if has_right != anti:
            return lt
        return lt.slice(0, 0)

    return unioned.groupby(on).map_groups(pick, batch_format="pyarrow")


def anti_join(left, right_keys, *, on: str, right_on: str | None = None,
              mode: str = "broadcast"):
    """Left rows whose key does NOT appear in ``right_keys`` (NOT IN) —
    :func:`semi_join` with ``anti=True``."""
    return semi_join(left, right_keys, on=on, right_on=right_on, anti=True,
                     mode=mode)


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
