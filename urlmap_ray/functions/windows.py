"""Windowed / sessionized aggregates over an event stream table.

The reference engine has no windowing (SURVEY.md §2.9); this is a
training-data-pipeline extension: gap-based sessionization expressed as
``groupby(key).map_groups`` — the key shuffle co-locates each user's events,
then the window logic is a vectorized per-group numpy pass (sort, diff,
cumsum). No driver-side loop; group sizes are per-user event counts, which
are small and naturally bounded (hot users would be the skew to salt).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(
    ds,
    *,
    gap_s: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    with_end: bool = False,
):
    """Split each key's events into sessions at > gap_s idle gaps.

    Returns a Dataset (user_id, session_id, session_start, n_events) with
    session_id numbered 1..n per user in time order. ``with_end=True``
    appends ``session_end`` (the session's max event ts) so sessions can be
    used as intervals, e.g. for :func:`urlmap_ray.functions.joins.range_join`.
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
        cols = {
            key_col: key_out,
            "session_id": pa.array(sid[starts], pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "n_events": pa.array(counts, pa.int64()),
        }
        if with_end:
            ends = np.append(starts[1:], len(ts)) - 1
            cols["session_end"] = pa.array(ts[ends], pa.int64()).cast(
                pa.timestamp("us")
            )
        return pa.table(cols)

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def tumbling_window(
    ds,
    *,
    width_s: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    sum_col: str | None = None,
):
    """Fixed-width (tumbling) window aggregate per key: event count and an
    optional integer sum per ``[window_start, window_start + width_s)``.

    Scale shape (same as the events_daily pipeline): the window id is pure
    integer arithmetic on the timestamp (Arrow kernels, no Python rows), a
    per-batch Arrow hash-aggregate pre-combines to one row per (key, window)
    per batch, and only those partials cross the wire into the global
    ``groupby`` — at 100TB the shuffle moves partial rows, not events.

    ``sum_col`` must be an integer column (pre-quantize floats upstream —
    float summation order is nondeterministic across a shuffle, so the
    engine refuses to make it look exact).
    """
    width_us = int(width_s * 1_000_000)
    if width_us <= 0:
        raise ValueError(f"width_s must be positive, got {width_s}")

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        if sum_col is not None and not pa.types.is_integer(t.column(sum_col).type):
            raise TypeError(
                f"tumbling_window sum_col {sum_col!r} must be integer "
                "(quantize floats upstream for order-independent sums)"
            )
        win = pc.multiply(pc.divide(ts, width_us), width_us)
        cols = {key_col: t.column(key_col), "window_start": win}
        aggs = [([], "count_all")]
        if sum_col is not None:
            cols[sum_col] = t.column(sum_col)
            aggs.append((sum_col, "sum"))
        local = pa.table(cols).group_by([key_col, "window_start"]).aggregate(aggs)
        names = [key_col, "window_start", "n_partial"]
        if sum_col is not None:
            names.append("sum_partial")
        return local.rename_columns(names)

    from ray.data.aggregate import Sum

    aggs = [Sum("n_partial", alias_name="n_events")]
    if sum_col is not None:
        aggs.append(Sum("sum_partial", alias_name=f"sum_{sum_col}"))

    def finish(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("window_start"),
            "window_start",
            t.column("window_start").cast(pa.timestamp("us")),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .aggregate(*aggs)
        .map_batches(finish, batch_format="pyarrow")
    )


def hopping_window(
    ds,
    *,
    width_s: float,
    hop_s: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    sum_col: str | None = None,
):
    """Hopping (sliding) window aggregate per key: windows of ``width_s``
    starting every ``hop_s`` (``hop_s == width_s`` degenerates to
    :func:`tumbling_window`). An event with timestamp t lands in every
    window ``[w, w + width)`` with ``w = k·hop`` and ``w <= t < w+width``
    — i.e. up to ``ceil(width/hop)`` windows; only windows that contain
    at least one event are emitted.

    Scale shape: the ≤``ceil(width/hop)``× row expansion happens
    BATCH-LOCALLY and is immediately pre-combined by an Arrow hash-agg
    to one row per (key, window) per batch, so the global shuffle moves
    partials — the same events_daily/tumbling pattern, paying expansion
    only inside the task. ``sum_col`` must be integer (order-free sums),
    like :func:`tumbling_window`.
    """
    width_us = int(width_s * 1_000_000)
    hop_us = int(hop_s * 1_000_000)
    if width_us <= 0 or hop_us <= 0:
        raise ValueError(f"width_s and hop_s must be positive, got {width_s}, {hop_s}")
    fan = -(-width_us // hop_us)  # ceil

    def partial(t: pa.Table) -> pa.Table:
        if sum_col is not None and not pa.types.is_integer(t.column(sum_col).type):
            raise TypeError(
                f"hopping_window sum_col {sum_col!r} must be integer "
                "(quantize floats upstream for order-independent sums)"
            )
        ts = (
            t.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        base_k = ts // hop_us  # numpy floor division: negative-ts safe
        off = ts - base_k * hop_us  # ts mod hop, in [0, hop)
        idx_parts, win_parts = [], []
        row_idx = np.arange(len(ts), dtype=np.int64)
        for j in range(fan):
            ok = off + j * hop_us < width_us
            idx_parts.append(row_idx[ok])
            win_parts.append((base_k[ok] - j) * hop_us)
        idx = np.concatenate(idx_parts)
        wins = np.concatenate(win_parts)
        take = pa.array(idx, pa.int64())
        cols = {
            key_col: t.column(key_col).combine_chunks().take(take),
            "window_start": pa.array(wins, pa.int64()),
        }
        aggs = [([], "count_all")]
        if sum_col is not None:
            cols[sum_col] = t.column(sum_col).combine_chunks().take(take)
            aggs.append((sum_col, "sum"))
        local = pa.table(cols).group_by([key_col, "window_start"]).aggregate(aggs)
        names = [key_col, "window_start", "n_partial"]
        if sum_col is not None:
            names.append("sum_partial")
        return local.rename_columns(names)

    from ray.data.aggregate import Sum

    aggs = [Sum("n_partial", alias_name="n_events")]
    if sum_col is not None:
        aggs.append(Sum("sum_partial", alias_name=f"sum_{sum_col}"))

    def finish(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("window_start"),
            "window_start",
            t.column("window_start").cast(pa.timestamp("us")),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .aggregate(*aggs)
        .map_batches(finish, batch_format="pyarrow")
    )


def top_n_per_key(
    ds,
    *,
    key_col: str,
    order_col: str,
    n: int,
    tiebreak_col: str,
    descending: bool = True,
):
    """Window-rank operator: the top ``n`` rows per key ordered by a numeric
    ``order_col``, with a 1-based ``rn`` rank column — SQL's
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY v DESC, tb)`` + filter.

    One key shuffle co-locates each key's rows; the per-group rank is a
    vectorized ``np.lexsort`` + head — group sizes are per-key row counts
    (bounded for the registered workloads; a pre-reduce per batch would cap
    hot keys: a batch only ever contributes its own local top-n).
    ``tiebreak_col`` is required so equal ``order_col`` values rank
    deterministically (ascending) on any partitioning.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")

    def per_key(g: pa.Table) -> pa.Table:
        v = g.column(order_col).to_numpy(zero_copy_only=False)
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, -v if descending else v))
        head = order[:n]
        out = g.take(pa.array(head))
        return out.append_column("rn", pa.array(np.arange(1, len(head) + 1), pa.int64()))

    # Per-batch pre-reduce: a batch's rows beyond its own local top-n can
    # never make the key's global top-n, so drop them before the shuffle.
    def local_prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(order_col).to_numpy(zero_copy_only=False)
        tb = t.column(tiebreak_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, -v if descending else v, k))
        ks = k[order]
        run_start = np.empty(len(ks), dtype=bool)
        run_start[0] = True
        run_start[1:] = ks[1:] != ks[:-1]
        # rank within each key run = position - start of run
        pos = np.arange(len(ks))
        start_idx = pos[run_start][np.cumsum(run_start) - 1]
        keep = order[(pos - start_idx) < n]
        return t.take(pa.array(np.sort(keep)))

    return (
        ds.map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(per_key, batch_format="pyarrow")
    )


def running_total(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    sum_col: str,
    tiebreak_col: str = "event_id",
):
    """Per-key cumulative sum in event-time order — the windowed SCAN
    (``SUM(x) OVER (PARTITION BY key ORDER BY ts, tiebreak ROWS UNBOUNDED
    PRECEDING)``), the one window shape the aggregate family can't express
    because every output row depends on an ordered prefix.

    One key shuffle co-locates each key's events; the per-group pass is a
    vectorized lexsort + ``np.cumsum``. ``sum_col`` must be integer
    (quantize floats upstream) — integer prefix sums are exact at any
    parallelism, float ones are not. ``tiebreak_col`` must be a unique
    integer column (event id) so equal timestamps order deterministically.
    Returns (key, tiebreak, sum_col, ``run_<sum_col>``).
    """

    def per_key(g: pa.Table) -> pa.Table:
        if not pa.types.is_integer(g.column(sum_col).type):
            raise TypeError(
                f"running_total sum_col {sum_col!r} must be integer "
                "(quantize floats upstream for exact prefix sums)"
            )
        ts = (
            g.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
        v = g.column(sum_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts))
        run = np.cumsum(v[order])
        out = g.select([key_col, tiebreak_col, sum_col]).take(pa.array(order))
        return out.append_column(f"run_{sum_col}", pa.array(run, pa.int64()))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def lag_lead(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str,
    tiebreak_col: str = "event_id",
    default: int = -1,
):
    """Per-key LAG/LEAD in event-time order: for each row, the previous
    and next value of ``val_col`` within its key (``LAG/LEAD(val, 1,
    default) OVER (PARTITION BY key ORDER BY ts, tiebreak)``). The scan
    family's second shape — same one-key-shuffle + vectorized per-group
    pass as :func:`running_total`. ``val_col`` must be integer and the
    boundary default is an integer sentinel (not NULL: the value-hash
    gate and Arrow integer columns stay null-free).
    Returns (key, tiebreak, val, ``prev_<val>``, ``next_<val>``).
    """

    def per_key(g: pa.Table) -> pa.Table:
        if not pa.types.is_integer(g.column(val_col).type):
            raise TypeError(f"lag_lead val_col {val_col!r} must be integer")
        ts = (
            g.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
        v = g.column(val_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts))
        sv = v[order]
        prev = np.concatenate(([default], sv[:-1])) if len(sv) else sv
        nxt = np.concatenate((sv[1:], [default])) if len(sv) else sv
        out = g.select([key_col, tiebreak_col, val_col]).take(pa.array(order))
        out = out.append_column(f"prev_{val_col}", pa.array(prev, pa.int64()))
        return out.append_column(f"next_{val_col}", pa.array(nxt, pa.int64()))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def collect_sorted(
    ds,
    *,
    key_col: str,
    val_col: str,
    sep: str = ",",
    distinct: bool = False,
):
    """Per-key ordered collect: concatenate each key's values into one
    string in lexicographic value order (optionally distinct) — the
    sequence-building shape (per-user event histories, per-document token
    streams for sequence datasets), pinned to a deterministic order so the
    output is identical at any parallelism (an UNORDERED collect_list is
    not reproducible across shuffles and the engine refuses to offer it).

    One key shuffle; the per-group pass is an Arrow sort + join. Values
    must be strings and must not contain ``sep`` (checked loudly — a
    silent ambiguity would corrupt downstream parsing).
    Returns (key, ``vals``: string, ``n_vals``: int64).
    """

    def per_key(g: pa.Table) -> pa.Table:
        vc = g.column(val_col)
        if not (
            pa.types.is_string(vc.type) or pa.types.is_large_string(vc.type)
        ):
            raise TypeError(f"collect_sorted val_col {val_col!r} must be string")
        if pc.any(pc.match_substring(vc, sep)).as_py():
            raise ValueError(
                f"collect_sorted: a {val_col!r} value contains the separator "
                f"{sep!r} — pick a separator outside the value alphabet"
            )
        vals = sorted(vc.to_pylist())
        if distinct:
            vals = sorted(set(vals))
        return pa.table(
            {
                key_col: g.column(key_col).slice(0, 1).combine_chunks(),
                "vals": pa.array([sep.join(vals)], pa.string()),
                "n_vals": pa.array([len(vals)], pa.int64()),
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def rolling_sum(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    sum_col: str,
    window_rows: int = 5,
    tiebreak_col: str = "event_id",
):
    """Per-key moving sum over the last ``window_rows`` rows in event-time
    order (``SUM(x) OVER (PARTITION BY key ORDER BY ts, tiebreak ROWS
    BETWEEN window_rows-1 PRECEDING AND CURRENT ROW)``) — the rolling
    frame of the scan family (running_total is the unbounded frame,
    lag_lead the single-offset one). Same one-key-shuffle +
    vectorized-per-group shape: prefix sums, then a shifted difference.
    Integer ``sum_col`` only (exact at any parallelism).
    Returns (key, tiebreak, sum_col, ``roll_<sum_col>``).
    """
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")

    def per_key(g: pa.Table) -> pa.Table:
        if not pa.types.is_integer(g.column(sum_col).type):
            raise TypeError(
                f"rolling_sum sum_col {sum_col!r} must be integer "
                "(quantize floats upstream for exact sums)"
            )
        ts = (
            g.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
        v = g.column(sum_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts))
        sv = v[order]
        csum = np.cumsum(sv)
        roll = csum.copy()
        if len(sv) > window_rows:
            roll[window_rows:] = csum[window_rows:] - csum[:-window_rows]
        out = g.select([key_col, tiebreak_col, sum_col]).take(pa.array(order))
        return out.append_column(f"roll_{sum_col}", pa.array(roll, pa.int64()))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def ntile(
    ds,
    *,
    key_col: str = "user_id",
    order_col: str,
    n: int = 4,
    tiebreak_col: str = "event_id",
):
    """Per-key NTILE(n): bucket each key's rows 1..n in ``order_col``
    order (SQL semantics: the first ``count mod n`` buckets get the extra
    row). The rank-family sibling of top_n_per_key (ROW_NUMBER) — same
    one-key-shuffle + vectorized per-group pass. ``tiebreak_col`` must be
    a unique integer column so equal order values bucket deterministically.
    Returns (key, tiebreak, order_col, bucket).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def per_key(g: pa.Table) -> pa.Table:
        v = g.column(order_col).to_numpy(zero_copy_only=False)
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, v))
        rows = len(order)
        base, extra = divmod(rows, n)
        sizes = np.full(min(n, rows), base, dtype=np.int64)
        sizes[:extra] += 1
        sizes = sizes[sizes > 0]
        bucket = np.repeat(np.arange(1, len(sizes) + 1), sizes)
        out = g.select([key_col, tiebreak_col, order_col]).take(pa.array(order))
        return out.append_column("bucket", pa.array(bucket, pa.int64()))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def group_zscore(
    ds,
    *,
    key_col: str = "user_id",
    val_col: str,
    id_col: str = "event_id",
):
    """Per-key standardization (z-score) — the feature-normalization step
    of a training pipeline: ``(x - mean_key) / std_key`` with the SAMPLE
    standard deviation.

    One key shuffle co-locates each key's rows; per group the moments come
    from INTEGER sums (``val_col`` must be integer — quantize floats
    upstream), and the float chain is pinned to exactly
    ``mean = s1/n; num = s2 - s1*mean; std = sqrt(num/(n-1))`` — single
    IEEE-754 ops a SQL oracle reproduces bit-for-bit from the same integer
    sums. Output z is ppb-quantized int64; keys with n == 1 or zero
    variance emit z = 0 (the SQL CASE mirrors this). Returns
    (key, id, val, ``z_ppb``)."""

    def per_key(g: pa.Table) -> pa.Table:
        if not pa.types.is_integer(g.column(val_col).type):
            raise TypeError(
                f"group_zscore val_col {val_col!r} must be integer "
                "(quantize floats upstream for exact moments)"
            )
        v = g.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(v)
        out = g.select([key_col, id_col, val_col])
        if n < 2:
            return out.append_column("z_ppb", pa.array(np.zeros(n, np.int64)))
        s1 = int(v.sum())
        s2 = int((v * v).sum())
        mean = float(s1) / n
        num = float(s2) - float(s1) * mean
        if num <= 0.0:  # zero variance (all values equal)
            return out.append_column("z_ppb", pa.array(np.zeros(n, np.int64)))
        std = math.sqrt(num / (n - 1))
        # PINNED quantization rule: floor(x*1e9 + 0.5) — the identical
        # expression runs in the SQL oracle, so even an exact half-ppb tie
        # (or a +0.5 that rounds in the double add) lands the same on both
        # sides. np.round (half-to-even) vs SQL round (half-away) would
        # leave the tie rule engine-defined.
        z = np.floor((v - mean) / std * 1e9 + 0.5).astype(np.int64)
        return out.append_column("z_ppb", pa.array(z, pa.int64()))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def funnel(
    ds,
    *,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Ordered-funnel conversion counts — the product-analytics primitive:
    how many keys performed step₀, then step₁ STRICTLY after their first
    step₀, then step₂ strictly after that matched step₁, … (the greedy
    earliest-match rule, pinned: each step matches its MINIMUM timestamp
    among events later than the previous match; ties at the same µs do
    not advance the funnel).

    → (step_idx, step, n_keys) with n_keys = keys completing the prefix
    through that step. One key shuffle of the projected (key, ts, type)
    rows; per-group work is a len(steps)-pass vectorized scan; the fold
    is a ≤len(steps)+1-row histogram — driver state is O(steps), never
    O(keys).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    step_list = list(steps)

    def per_key(g: pa.Table) -> pa.Table:
        ts = (
            g.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        types = np.asarray(g.column(type_col).to_pylist())
        done = 0
        t_prev = np.iinfo(np.int64).min
        for s in step_list:
            m = (types == s) & (ts > t_prev)
            if not m.any():
                break
            t_prev = ts[m].min()
            done += 1
        return pa.table({"completed": pa.array([done], pa.int64())})

    hist = {
        r["completed"]: r["count()"]
        for r in ds.map_batches(
            lambda t: t.select([key_col, ts_col, type_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(key_col)
        .map_groups(per_key, batch_format="pyarrow")
        .groupby("completed")
        .count()
        .take_all()
    }
    # n_keys completing ≥ i+1 steps, assembled from the ≤steps+1-row fold
    n = len(step_list)
    suffix = 0
    at_least = [0] * (n + 1)
    for depth in range(n, -1, -1):
        suffix += hist.get(depth, 0)
        at_least[depth] = suffix
    return pa.table(
        {
            "step_idx": pa.array(range(n), pa.int64()),
            "step": pa.array(step_list, pa.string()),
            "n_keys": pa.array([at_least[i + 1] for i in range(n)], pa.int64()),
        }
    )


def group_ranks(
    ds,
    *,
    key_col: str,
    order_col: str,
    id_col: str,
    descending: bool = True,
):
    """Per-key rank family in one pass — RANK (ties share, gaps),
    DENSE_RANK (ties share, no gaps), ROW_NUMBER (ties broken by
    ``id_col`` ascending) and PERCENT_RANK ((rank-1)/(n-1), the SQL
    definition — one int-operand IEEE division, so the double is
    bit-equal to the oracle's explicit mirror).

    ``order_col`` must be integer (the repo's exact-tie contract —
    quantize floats upstream); one key shuffle, vectorized per-group
    lexsort + run-length scan.
    """

    def per_key(g: pa.Table) -> pa.Table:
        v = g.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v if descending else v))
        sv = v[order]
        n = len(sv)
        row_num = np.arange(1, n + 1, dtype=np.int64)
        new_run = np.ones(n, dtype=bool)
        if n > 1:
            new_run[1:] = sv[1:] != sv[:-1]
        # RANK: the row_number at each run's start, carried across the run
        rnk = np.maximum.accumulate(np.where(new_run, row_num, 0))
        dense = np.cumsum(new_run).astype(np.int64)
        if n > 1:
            pct = (rnk - 1).astype(np.float64) / np.float64(n - 1)
        else:
            pct = np.zeros(1, dtype=np.float64)
        out = g.take(pa.array(order)).select([key_col, id_col, order_col])
        return (
            out.append_column("row_num", pa.array(row_num, pa.int64()))
            .append_column("rnk", pa.array(rnk, pa.int64()))
            .append_column("dense_rnk", pa.array(dense, pa.int64()))
            .append_column("pct_rank", pa.array(pct, pa.float64()))
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def cohort_retention(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_s: float = 7 * 86400.0,
):
    """Cohort retention matrix — (cohort, offset, n_keys): keys whose FIRST
    activity fell in period ``cohort`` (epoch-period index, floor-divided
    µs) and who were also active ``offset`` periods later. offset 0 is the
    cohort size itself.

    Scale shape: a per-batch Arrow hash-agg collapses events to distinct
    (key, period) rows BEFORE the one key shuffle; per key the cohort is
    ``min(period)`` and each distinct active period emits one (cohort,
    offset) row; a final small ``groupby(cohort, offset)`` count folds the
    matrix (periods² rows at most — dashboard-sized). Events never cross
    the wire, only the deduped key-period pairs.
    """
    period_us = int(period_s * 1_000_000)
    if period_us <= 0:
        raise ValueError(f"period_s must be positive, got {period_s}")

    def dedup_partial(t: pa.Table) -> pa.Table:
        ts = (
            t.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # numpy // FLOORS (Arrow divide truncates toward zero) — matching
        # SQL's // so pre-epoch timestamps land in the right period
        period = pa.array(ts // period_us, pa.int64())
        return (
            pa.table({key_col: t.column(key_col), "period": period})
            .group_by([key_col, "period"])
            .aggregate([])
        )

    def per_key(g: pa.Table) -> pa.Table:
        periods = np.unique(g.column("period").to_numpy(zero_copy_only=False))
        cohort = periods[0]  # np.unique sorts ascending
        return pa.table(
            {
                "cohort": pa.array(
                    np.full(len(periods), cohort, dtype=np.int64), pa.int64()
                ),
                "offset": pa.array(periods - cohort, pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    return (
        ds.map_batches(dedup_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(per_key, batch_format="pyarrow")
        .groupby(["cohort", "offset"])
        .aggregate(Count(alias_name="n_keys"))
    )
