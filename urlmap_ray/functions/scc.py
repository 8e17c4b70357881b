"""Strongly connected components of the DIRECTED link graph, via the
forward-backward coloring algorithm (Orzan 2004; Fleischer, Hendrickson
& Pınar 2000) — the decomposition behind the classic bow-tie structure
of the web (Broder et al. 2000).

Weakly connected components (functions/components.py) answer "same
site cluster?"; SCCs answer "mutually reachable?" — the core/IN/OUT
split that drives crawl-frontier analysis (pages in the giant core keep
feeding the frontier; OUT-tendril pages are sinks) and link-spam audits
(artificial cores). Edges are the same distinct in-corpus extraction
the whole graph family shares (reference parser.go:120-208 — "what the
crawler saw").

Algorithm (deterministic, synchronous — every operator contract in this
repo's graph family):

    active ← all nodes
    while active:
      1. FORWARD COLORING to fixpoint: color(v) ← own id, then each
         round color(v) ← min(color(v), min over active edges u→v of
         color(u)).  At fixpoint color(v) = the smallest active id that
         reaches v.
      2. ROOTS: r with color(r) = r.  BACKWARD SWEEP to fixpoint: flag
         f(r) ← 1; each round f(v) ← 1 if any active edge v→u has
         f(u) = 1 and color(u) = color(v).  (Paths from a color-r node
         back to r provably stay inside color r, so the color equality
         is pruning, not an approximation.)
      3. Every flagged v belongs to SCC(color(v)); its representative
         color(v) is the LEXICOGRAPHICALLY SMALLEST member (color(v) ≤ v
         and the root is flagged), so reps are stable human-readable
         URLs.  Retire flagged nodes; repeat on the rest.

Phase count is the classic FW-BW bound (expected O(log n) phases on
web-like graphs; the giant core falls out of phase 1 because the global
min id lands in or upstream of it). Production accelerators (trim-1
peeling of in/out-degree-0 tendril nodes between phases) compose
trivially with this loop and are documented, not implemented — the
phase loop alone is already fixpoint-correct.

Scale shapes (the graph family's standard split, identical output,
test-pinned):

- **broadcast** (n ≤ graph.SHUFFLE_MODE_NODES): colors / flags / active
  are O(n) driver vectors (8B + 2×1B per node — pagerank's documented
  bound) and the id edge list is pinned ONCE into an actor pool. MIN
  and OR are idempotent + associative, so actors may hold ARBITRARY
  edge subsets and return per-key partials the driver folds again — no
  whole-bucket integrity requirement (unlike rank sums). One RPC round
  per propagation step, no per-round Dataset jobs.
- **shuffle** (above it): no O(n) object anywhere. State is a Dataset
  of (node_id, color, flag, active) rows; each propagation round is the
  labelprop shuffle shape — (A) ``groupby(src_bucket)`` scatters state
  onto out-edges, (B) ``groupby(dst_bucket)`` (forward) or the src-side
  fold (backward) rebuilds the bucket's dense state slice with MIN/OR.
  Fixpoint detection is a per-round count of changed rows (a small
  aggregate). Rounds cost what BFS rounds cost — O(diameter) exchanges
  per phase, the algorithm's native price.

:func:`scc_reference` is a single-process iterative Tarjan with the
same min-url representative — the expected-parquet trust model of the
pagerank/kmeans family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .graph import (
    SHUFFLE_MODE_NODES,
    _bucketed_edge_ids,
    _graph_buckets,
    _resolve_membership,
    _sorted_urls_ref,
    build_edges,
    node_index,
)

__all__ = ["scc", "scc_reference", "bowtie", "bowtie_reference"]


class _SccShard:
    """Broadcast-regime actor: pins an arbitrary subset of the id edge
    list (MIN/OR folds are idempotent-associative, so partial per-key
    results are safe) and answers one vectorized propagation query per
    round against the shipped state vectors."""

    def __init__(self, block_refs):
        import ray

        tables = [t for t in map(ray.get, block_refs) if "dst_id" in t.column_names]
        t = (
            pa.concat_tables(tables)
            if tables
            else pa.table(
                {"src_id": pa.array([], pa.int64()), "dst_id": pa.array([], pa.int64())}
            )
        )
        self.src = t.column("src_id").to_numpy(zero_copy_only=False)
        self.dst = t.column("dst_id").to_numpy(zero_copy_only=False)

    def fwd_min(self, colors, active) -> tuple[np.ndarray, np.ndarray]:
        """Per-dst min of colors[src] over edges with both ends active."""
        keep = active[self.src] & active[self.dst]
        s, d = self.src[keep], self.dst[keep]
        if len(d) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        c = colors[s]
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        starts = np.flatnonzero(np.r_[True, np.diff(d) != 0])
        return d[starts], np.minimum.reduceat(c, starts)

    def bwd_or(self, colors, flags, active) -> np.ndarray:
        """Unique srcs newly reachable backward: edges v→u with f(u) and
        color(u) == color(v), both ends active."""
        keep = (
            active[self.src]
            & active[self.dst]
            & flags[self.dst]
            & (colors[self.src] == colors[self.dst])
        )
        return np.unique(self.src[keep])


def _broadcast_scc_vector(edges_b, n) -> np.ndarray:
    """Driver-folded FW-BW coloring → per-node representative id."""
    import ray

    block_refs = edges_b.to_arrow_refs()
    shard_cls = ray.remote(num_cpus=1)(_SccShard)
    n_actors = max(1, min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))))
    actors = [shard_cls.remote(block_refs[i::n_actors]) for i in range(n_actors)]
    rep = np.full(n, -1, dtype=np.int64)
    active = np.ones(n, dtype=bool)
    ids = np.arange(n, dtype=np.int64)
    try:
        while active.any():
            colors = ids.copy()
            colors[~active] = -1  # inert; never read through active masks
            while True:  # forward min-coloring to fixpoint
                colors_ref = ray.put(colors)
                active_ref = ray.put(active)
                new = colors.copy()
                for d, m in ray.get(
                    [a.fwd_min.remote(colors_ref, active_ref) for a in actors]
                ):
                    np.minimum.at(new, d, m)
                if np.array_equal(new, colors):
                    break
                colors = new
            flags = active & (colors == ids)  # roots
            while True:  # backward OR sweep to fixpoint
                refs = (ray.put(colors), ray.put(flags), ray.put(active))
                new_flags = flags.copy()
                for s in ray.get([a.bwd_or.remote(*refs) for a in actors]):
                    new_flags[s] = True
                if np.array_equal(new_flags, flags):
                    break
                flags = new_flags
            rep[flags] = colors[flags]
            active &= ~flags
    finally:
        for a in actors:
            ray.kill(a)
    return rep


def scc(pages_ds, nodes, *, mode: str = "auto", n_buckets: int | None = None):
    """SCCs of the corpus link graph → Dataset (url, scc_rep) where
    ``scc_rep`` is the lexicographically smallest member url (singleton
    components are their own representative — build_edges drops
    self-loops, so a node with no cycle through it is a singleton)."""
    import ray
    import ray.data

    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"url": pa.array([], pa.string()), "scc_rep": pa.array([], pa.string())}
            )
        )
    membership = _resolve_membership(mode, n)
    per_bucket = (
        _graph_buckets(n) if n_buckets is None else max(1, -(-n // n_buckets))
    )
    if membership == "shuffle":
        return _scc_shuffle(pages_ds, nodes, n, per_bucket)

    urls_ref = _sorted_urls_ref(nodes)
    edges_b = _bucketed_edge_ids(
        build_edges(pages_ds, nodes, membership="broadcast"), urls_ref, per_bucket
    )
    rep = _broadcast_scc_vector(edges_b, n)

    @ray.remote(num_cpus=1)
    def finish(urls_arr: pa.Array, rep_vec: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "url": urls_arr,
                "scc_rep": pc.take(urls_arr, pa.array(rep_vec, pa.int64())),
            }
        )

    return ray.data.from_arrow_refs([finish.remote(urls_ref, rep)])


# ---------------------------------------------------------------------------
# shuffle regime


def _scc_shuffle(pages_ds, nodes, n: int, per_bucket: int):
    """Fully-distributed FW-BW coloring: state is a Dataset of
    (node_id, color, flag, rep) rows (rep = -1 while unassigned ≡
    active); each propagation round is two bucketed exchanges in the
    labelprop shape; fixpoint detection is a per-round changed-row
    count. No O(n) object anywhere."""
    import ray.data
    from ray.data.aggregate import Sum

    nb = -(-n // per_bucket)
    index_ds = node_index(nodes)[0].repartition(nb, shuffle=False).materialize()
    from .graph import _edge_ids_shuffle, _extracted, _candidate_pairs_batch

    pairs = _extracted(pages_ds).map_batches(
        _candidate_pairs_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    edges_b = (
        _edge_ids_shuffle(pairs, index_ds, per_bucket=per_bucket)
        .repartition(nb, shuffle=False)
        .materialize()
    )

    def init_state(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node_id": t.column("node_id"),
                "color": t.column("node_id"),
                "flag": pa.array(np.zeros(len(nid), np.int8), pa.int8()),
                "rep": pa.array(np.full(len(nid), -1, np.int64), pa.int64()),
            }
        )

    state = (
        index_ds.map_batches(init_state, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(nb, shuffle=False)
        .materialize()
    )

    def _round(state, *, backward: bool):
        """One synchronous propagation round → (new state, n_changed).

        Forward: color(v) ← min(color(v), colors of active in-neighbors).
        Backward: flag(v) ← flag(v) OR any active out-edge v→u with
        flag(u) and color(u) == color(v)."""
        key_self = "node_id"

        def state_pad(t: pa.Table) -> pa.Table:
            nid = t.column("node_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    # stage-1 key: edges need the state of their
                    # forward:src / backward:dst endpoint
                    "gb": pa.array(
                        (nid // per_bucket).astype(np.int64), pa.int64()
                    ),
                    "src_id": pa.array(np.full(len(nid), -1, np.int64), pa.int64()),
                    "dst_id": t.column("node_id"),
                    "color": t.column("color"),
                    "flag": t.column("flag"),
                    "rep": t.column("rep"),
                }
            )

        def edge_pad(t: pa.Table) -> pa.Table:
            s = t.column("src_id").to_numpy(zero_copy_only=False)
            d = t.column("dst_id").to_numpy(zero_copy_only=False)
            key = d if backward else s
            z8 = pa.array(np.zeros(len(s), np.int8), pa.int8())
            return pa.table(
                {
                    "gb": pa.array((key // per_bucket).astype(np.int64), pa.int64()),
                    "src_id": t.column("src_id"),
                    "dst_id": t.column("dst_id"),
                    "color": pa.array(np.full(len(s), -1, np.int64), pa.int64()),
                    "flag": z8,
                    "rep": pa.array(np.zeros(len(s), np.int64), pa.int64()),
                }
            )

        def scatter(g: pa.Table) -> pa.Table:
            src = g.column("src_id").to_numpy(zero_copy_only=False)
            dst = g.column("dst_id").to_numpy(zero_copy_only=False)
            col = g.column("color").to_numpy(zero_copy_only=False)
            flg = g.column("flag").to_numpy(zero_copy_only=False)
            rp = g.column("rep").to_numpy(zero_copy_only=False)
            is_state = src < 0
            b = int(g.column("gb")[0].as_py())
            lo = b * per_bucket
            sn = dst[is_state]
            dense_c = np.full(per_bucket, -1, np.int64)
            dense_f = np.zeros(per_bucket, np.int8)
            dense_r = np.full(per_bucket, -2, np.int64)
            dense_c[sn - lo] = col[is_state]
            dense_f[sn - lo] = flg[is_state]
            dense_r[sn - lo] = rp[is_state]
            e_src = src[~is_state]
            e_dst = dst[~is_state]
            ekey = e_dst if backward else e_src
            # only edges whose keyed endpoint is ACTIVE (rep == -1) emit
            act = dense_r[ekey - lo] == -1
            e_src, e_dst, ekey = e_src[act], e_dst[act], ekey[act]
            other = e_src if backward else e_dst
            return pa.table(
                {
                    "db": pa.array(
                        (other // per_bucket).astype(np.int64), pa.int64()
                    ),
                    "node_id": pa.array(other, pa.int64()),
                    "color": pa.array(dense_c[ekey - lo], pa.int64()),
                    "flag": pa.array(dense_f[ekey - lo], pa.int8()),
                    "rep": pa.array(np.full(len(other), -2, np.int64), pa.int64()),
                }
            )

        def state_pad2(t: pa.Table) -> pa.Table:
            nid = t.column("node_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "db": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                    "node_id": t.column("node_id"),
                    "color": t.column("color"),
                    "flag": t.column("flag"),
                    "rep": t.column("rep"),
                }
            )

        def fold(g: pa.Table) -> pa.Table:
            nid = g.column("node_id").to_numpy(zero_copy_only=False)
            col = g.column("color").to_numpy(zero_copy_only=False)
            flg = g.column("flag").to_numpy(zero_copy_only=False)
            rp = g.column("rep").to_numpy(zero_copy_only=False)
            is_state = rp != -2
            b = int(g.column("db")[0].as_py())
            lo = b * per_bucket
            hi = min(lo + per_bucket, n)
            sn = nid[is_state]
            cur_c = np.full(hi - lo, -1, np.int64)
            cur_f = np.zeros(hi - lo, np.int8)
            cur_r = np.full(hi - lo, -1, np.int64)
            cur_c[sn - lo] = col[is_state]
            cur_f[sn - lo] = flg[is_state]
            cur_r[sn - lo] = rp[is_state]
            p_nid = nid[~is_state]
            p_col = col[~is_state]
            p_flg = flg[~is_state]
            changed = 0
            act = cur_r == -1
            if backward:
                # f(v) |= prop.flag where prop.color == color(v)
                if len(p_nid):
                    ok = (p_flg > 0) & (p_col == cur_c[p_nid - lo]) & act[p_nid - lo]
                    new_f = cur_f.copy()
                    tgt = p_nid[ok] - lo
                    new_f[tgt] = 1
                    changed = int(np.sum((new_f > cur_f)))
                    cur_f = new_f
            else:
                if len(p_nid):
                    new_c = cur_c.copy()
                    keep = act[p_nid - lo]
                    np.minimum.at(new_c, p_nid[keep] - lo, p_col[keep])
                    changed = int(np.sum(new_c != cur_c))
                    cur_c = new_c
            return pa.table(
                {
                    "node_id": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64()),
                    "color": pa.array(cur_c, pa.int64()),
                    "flag": pa.array(cur_f, pa.int8()),
                    "rep": pa.array(cur_r, pa.int64()),
                    "n_changed": pa.array(
                        np.r_[np.int64(changed), np.zeros(hi - lo - 1, np.int64)]
                        if hi > lo
                        else np.empty(0, np.int64),
                        pa.int64(),
                    ),
                }
            )

        contribs = (
            state.map_batches(state_pad, batch_format="pyarrow", zero_copy_batch=True)
            .union(
                edges_b.map_batches(
                    edge_pad, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("gb")
            .map_groups(scatter, batch_format="pyarrow")
        )
        new_state = (
            contribs.union(
                state.map_batches(
                    state_pad2, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("db")
            .map_groups(fold, batch_format="pyarrow")
            .repartition(nb, shuffle=False)
            .materialize()
        )
        n_changed = new_state.sum("n_changed")
        return (
            new_state.drop_columns(["n_changed"]).materialize(),
            int(n_changed or 0),
        )

    def _transform(state, fn):
        return (
            state.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(nb, shuffle=False)
            .materialize()
        )

    def remaining(state) -> int:
        def cnt(t: pa.Table) -> pa.Table:
            rp = t.column("rep").to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([int(np.sum(rp == -1))], pa.int64())})

        return int(
            state.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True).sum(
                "n"
            )
            or 0
        )

    while remaining(state) > 0:

        def reset(t: pa.Table) -> pa.Table:
            rp = t.column("rep").to_numpy(zero_copy_only=False)
            nid = t.column("node_id").to_numpy(zero_copy_only=False)
            col = np.where(rp == -1, nid, np.int64(-1))
            return pa.table(
                {
                    "node_id": t.column("node_id"),
                    "color": pa.array(col, pa.int64()),
                    "flag": pa.array(np.zeros(len(nid), np.int8), pa.int8()),
                    "rep": t.column("rep"),
                }
            )

        state = _transform(state, reset)
        while True:  # forward coloring to fixpoint
            state, changed = _round(state, backward=False)
            if changed == 0:
                break

        def mark_roots(t: pa.Table) -> pa.Table:
            nid = t.column("node_id").to_numpy(zero_copy_only=False)
            col = t.column("color").to_numpy(zero_copy_only=False)
            rp = t.column("rep").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node_id": t.column("node_id"),
                    "color": t.column("color"),
                    "flag": pa.array(
                        ((rp == -1) & (col == nid)).astype(np.int8), pa.int8()
                    ),
                    "rep": t.column("rep"),
                }
            )

        state = _transform(state, mark_roots)
        while True:  # backward sweep to fixpoint
            state, changed = _round(state, backward=True)
            if changed == 0:
                break

        def retire(t: pa.Table) -> pa.Table:
            col = t.column("color").to_numpy(zero_copy_only=False)
            flg = t.column("flag").to_numpy(zero_copy_only=False)
            rp = t.column("rep").to_numpy(zero_copy_only=False)
            new_rep = np.where((rp == -1) & (flg > 0), col, rp)
            return pa.table(
                {
                    "node_id": t.column("node_id"),
                    "color": t.column("color"),
                    "flag": pa.array(np.zeros(len(col), np.int8), pa.int8()),
                    "rep": pa.array(new_rep, pa.int64()),
                }
            )

        state = _transform(state, retire)

    # attach urls: rep ids → urls via two bucketed exchanges against the
    # index (the graph family's standard id→url attach)
    def rep_pad(t: pa.Table) -> pa.Table:
        rp = t.column("rep").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "jb": pa.array((rp // per_bucket).astype(np.int64), pa.int64()),
                "node_id": t.column("node_id"),
                "rep": t.column("rep"),
                "url": pa.array([None] * t.num_rows, pa.string()),
            }
        )

    def idx_pad(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "jb": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "node_id": pa.array(np.full(len(nid), -1, np.int64), pa.int64()),
                "rep": t.column("node_id"),
                "url": t.column("url"),
            }
        )

    def join_rep(g: pa.Table) -> pa.Table:
        nid = g.column("node_id").to_numpy(zero_copy_only=False)
        is_idx = nid < 0
        idx_rows = g.filter(pa.array(is_idx))
        rows = g.filter(pa.array(~is_idx))
        pos = pc.index_in(rows.column("rep"), value_set=idx_rows.column("rep").combine_chunks())
        return pa.table(
            {
                "node_id": rows.column("node_id"),
                "rep_url": pc.take(idx_rows.column("url").combine_chunks(), pos),
            }
        )

    with_rep = (
        state.map_batches(rep_pad, batch_format="pyarrow", zero_copy_batch=True)
        .union(index_ds.map_batches(idx_pad, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("jb")
        .map_groups(join_rep, batch_format="pyarrow")
    )

    def node_pad(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "jb": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "node_id": t.column("node_id"),
                "url": pa.array([None] * t.num_rows, pa.string()),
                "rep_url": t.column("rep_url"),
            }
        )

    def idx_pad2(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "jb": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "node_id": t.column("node_id"),
                "url": t.column("url"),
                "rep_url": pa.array([None] * t.num_rows, pa.string()),
            }
        )

    def join_url(g: pa.Table) -> pa.Table:
        is_idx = pc.is_valid(g.column("url"))
        idx_rows = g.filter(is_idx)
        rows = g.filter(pc.invert(is_idx))
        pos = pc.index_in(
            rows.column("node_id"), value_set=idx_rows.column("node_id").combine_chunks()
        )
        return pa.table(
            {
                "url": pc.take(idx_rows.column("url").combine_chunks(), pos),
                "scc_rep": rows.column("rep_url"),
            }
        )

    return (
        with_rep.map_batches(node_pad, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            index_ds.map_batches(idx_pad2, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("jb")
        .map_groups(join_url, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# single-process reference (iterative Tarjan)


def scc_reference(urls: list[str], links_per_url: dict[str, list[str]]) -> dict[str, str]:
    """Iterative Tarjan over the same distinct in-corpus non-self edge
    set build_edges extracts; representative = lexicographically
    smallest member url."""
    urls_sorted = sorted(urls)
    n = len(urls_sorted)
    idx = {u: i for i, u in enumerate(urls_sorted)}
    node_set = set(urls_sorted)
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, links in links_per_url.items():
        ui = idx[u]
        for l in sorted(set(links)):
            if l in node_set and l != u:
                adj[ui].append(idx[l])
    index = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    on_stack = np.zeros(n, bool)
    stack: list[int] = []
    comp = np.full(n, -1, np.int64)
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            for j in range(pi, len(adj[v])):
                w = adj[v][j]
                if index[w] == -1:
                    work[-1] = (v, j + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                rep = min(members)
                for w in members:
                    comp[w] = rep
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return {u: urls_sorted[comp[i]] for i, u in enumerate(urls_sorted)}


# ---------------------------------------------------------------------------
# bow-tie decomposition


def bowtie(pages_ds, nodes, *, mode: str = "auto", n_buckets: int | None = None):
    """Broder et al. (2000) bow-tie classification relative to the
    LARGEST SCC → Dataset (url, region) with region ∈ {'core', 'in',
    'out', 'other'}: core = the largest SCC (ties → lexicographically
    smallest representative), in = reaches the core but not in it,
    out = reachable from the core but not in it, other = tendrils,
    tubes and disconnected pages.

    Broadcast-regime composition over the SCC vector: the two
    reachability sweeps are the :class:`_SccShard` OR-propagation run
    with color equality disabled (flags seeded with the core, once along
    edges, once against them). The documented bound is pagerank's O(n)
    driver vector; the shuffle-regime path composes :func:`scc` with two
    backward/forward BFS sweeps (graph.bfs_distances machinery) and is
    intentionally not duplicated here."""
    import ray
    import ray.data

    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"url": pa.array([], pa.string()), "region": pa.array([], pa.string())}
            )
        )
    if _resolve_membership(mode, n) != "broadcast":
        raise NotImplementedError(
            "bowtie is registered in the broadcast regime (n ≤ "
            "SHUFFLE_MODE_NODES); above it compose scc() with two "
            "bfs_distances sweeps"
        )
    per_bucket = (
        _graph_buckets(n) if n_buckets is None else max(1, -(-n // n_buckets))
    )
    urls_ref = _sorted_urls_ref(nodes)
    edges_b = _bucketed_edge_ids(
        build_edges(pages_ds, nodes, membership="broadcast"), urls_ref, per_bucket
    )
    rep = _broadcast_scc_vector(edges_b, n)
    # largest SCC; ties broken by smallest representative id (np.argmax
    # returns the first maximum over the sorted unique reps)
    reps, counts = np.unique(rep, return_counts=True)
    core_rep = int(reps[int(np.argmax(counts))])
    core = rep == core_rep

    block_refs = edges_b.to_arrow_refs()
    shard_cls = ray.remote(num_cpus=1)(_SccShard)
    n_actors = max(1, min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))))
    actors = [shard_cls.remote(block_refs[i::n_actors]) for i in range(n_actors)]
    try:
        colors = np.zeros(n, dtype=np.int64)  # equality always holds
        active = np.ones(n, dtype=bool)

        def sweep(seed: np.ndarray, *, backward: bool) -> np.ndarray:
            flags = seed.copy()
            while True:
                refs = (ray.put(colors), ray.put(flags), ray.put(active))
                new = flags.copy()
                if backward:
                    # nodes with an edge INTO a flagged node
                    for s in ray.get([a.bwd_or.remote(*refs) for a in actors]):
                        new[s] = True
                else:
                    # nodes with an edge FROM a flagged node: reuse
                    # fwd_min by treating flags as colors (min over
                    # flagged sources of 0 < 1)
                    fcol = np.where(flags, np.int64(0), np.int64(1))
                    fref = ray.put(fcol)
                    for d, m in ray.get(
                        [a.fwd_min.remote(fref, refs[2]) for a in actors]
                    ):
                        new[d[m == 0]] = True
                if np.array_equal(new, flags):
                    return flags
                flags = new

        reaches_core = sweep(core, backward=True)
        reached_from_core = sweep(core, backward=False)
    finally:
        for a in actors:
            ray.kill(a)

    region = np.full(n, "other", dtype=object)
    region[reaches_core & ~core] = "in"
    region[reached_from_core & ~core] = "out"
    region[core] = "core"

    @ray.remote(num_cpus=1)
    def finish(urls_arr: pa.Array, reg: np.ndarray) -> pa.Table:
        return pa.table({"url": urls_arr, "region": pa.array(list(reg), pa.string())})

    return ray.data.from_arrow_refs([finish.remote(urls_ref, region)])


def bowtie_reference(
    urls: list[str], links_per_url: dict[str, list[str]]
) -> dict[str, str]:
    """Single-process bow-tie: Tarjan SCC + two BFS sweeps."""
    comp = scc_reference(urls, links_per_url)
    from collections import Counter, deque

    sizes = Counter(comp.values())
    top = max(sizes.values())
    core_rep = min(r for r, c in sizes.items() if c == top)
    node_set = set(urls)
    fwd: dict[str, set[str]] = {u: set() for u in urls}
    bwd: dict[str, set[str]] = {u: set() for u in urls}
    for u, links in links_per_url.items():
        for l in links:
            if l in node_set and l != u:
                fwd[u].add(l)
                bwd[l].add(u)

    def reach(seeds: set[str], adj) -> set[str]:
        seen = set(seeds)
        q = deque(seeds)
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        return seen

    core = {u for u in urls if comp[u] == core_rep}
    reached = reach(core, fwd)
    reaches = reach(core, bwd)
    out = {}
    for u in urls:
        if u in core:
            out[u] = "core"
        elif u in reaches:
            out[u] = "in"
        elif u in reached:
            out[u] = "out"
        else:
            out[u] = "other"
    return out
