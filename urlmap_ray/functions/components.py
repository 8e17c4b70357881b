"""Distributed connected components over a pair Dataset, and cluster
labeling for near-duplicate document sets.

The near-dup operators (``functions/dedup.py``) emit verified PAIRS;
the operation a training-data pipeline actually needs is the CLUSTER —
"group all transitively-connected duplicates, keep one canonical doc
per group". That closure is connected components over the pair graph.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
standard shuffle-based CC that converges in O(log n) rounds regardless
of component diameter (plain min-label propagation needs O(diameter)
rounds, which a chain of duplicates makes unbounded):

- large-star, grouped at EVERY endpoint u: with m = min(neighbors ∪ u),
  rewire each strictly-larger neighbor v > u to (v, m);
- small-star, grouped at the LARGER endpoint u of each edge: with
  m = min(smaller-neighbors), rewire those neighbors and u itself
  to (·, m).

Scale shapes:

- Each round is ONE single-key shuffle: emitted rows carry an int32
  ``ub`` node bucket and the star rewire runs vectorized inside
  ``groupby("ub").map_groups`` (lexsort + run reduction — the repo's
  bucketed-combine pattern; no per-node groups, no Python loop over
  edges). The shuffle moves (u, v) int64 pairs — never documents.
- The pair set is materialized per round (it is consumed twice: the
  convergence checksum and the next round) — pairs are O(duplicate
  docs), a sliver of the corpus.
- Convergence is detected with an order-free streamed checksum
  (count + sum + xor of mixed 64-bit pair hashes, reduced from
  per-batch partials); no round ships the pair set to the driver.
- Cluster labels attach to the full document set via the repo's
  pad→union→single-key-groupby shape (``attach_components``) — no
  broadcast of the label table, which is O(duplicate docs) and can
  rival the corpus at high dup rates.

Everything is int64 arithmetic — no float-determinism caveats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pairs import EMPTY_PAIRS, distinct_pair_table

__all__ = ["connected_components", "attach_components", "url_components"]

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _star_round(pairs_ds, *, large: bool, buckets: int):
    """One star rewrite: emit direction-keyed rows, bucket by node, and
    run the vectorized star reduction per bucket. Input/output are
    canonical (a < b) distinct-ish pair Datasets."""

    def emit(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        if large:  # group every edge at BOTH endpoints
            u = np.concatenate([a, b])
            v = np.concatenate([b, a])
        else:  # group each edge at its LARGER endpoint only (b > a)
            u, v = b, a
        ub = ((u.astype(np.uint64) * _MIX_A) >> np.uint64(40)).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "ub": pa.array((ub % buckets).astype(np.int32), pa.int32()),
            }
        )

    def star(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return EMPTY_PAIRS
        u = g.column("u").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.append(starts, len(u)))
        # v is sorted within each u-run, so the run min is v[start]
        m_run = np.minimum(v[starts], u[starts])
        m = np.repeat(m_run, lens)
        if large:
            keep = v > u  # rewire strictly-larger neighbors to the min
            lo, hi = m[keep], v[keep]
        else:
            # neighbors here are all < u: rewire them and u itself to the
            # min; the (u, m) edge is one row per run
            keep = v != m
            lo = np.concatenate([m[keep], m_run])
            hi = np.concatenate([v[keep], u[starts]])
            sane = lo != hi  # u == m happens only for self-ish degenerates
            lo, hi = lo[sane], hi[sane]
        return distinct_pair_table(lo, hi)

    return (
        pairs_ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ub")
        .map_groups(star, batch_format="pyarrow")
    )


def _checksum(pairs_ds) -> tuple[int, int, int]:
    """Order-free multiset checksum (count, wrapped sum, xor) of mixed
    pair hashes, reduced from tiny per-batch partials — the convergence
    test never moves the pair set itself."""

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "s": pa.array([0], pa.uint64()),
                             "x": pa.array([0], pa.uint64())})
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = a * _MIX_A ^ (b * _MIX_B >> np.uint64(7))
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([int(np.sum(h, dtype=np.uint64))], pa.uint64()),
                "x": pa.array([int(np.bitwise_xor.reduce(h))], pa.uint64()),
            }
        )

    n = s = x = 0
    for t in pairs_ds.map_batches(
        part, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        n += int(np.sum(t.column("n").to_numpy(zero_copy_only=False), dtype=np.int64))
        s = (s + int(np.sum(t.column("s").to_numpy(zero_copy_only=False),
                            dtype=np.uint64))) & 0xFFFFFFFFFFFFFFFF
        x ^= int(np.bitwise_xor.reduce(
            t.column("x").to_numpy(zero_copy_only=False), initial=np.uint64(0)))
    return n, s, x


def _union_find_labels(pairs: pa.Table) -> pa.Table:
    """Single-process union-find for the bounded small-pair-set fast path."""
    a = pairs.column("a").to_numpy(zero_copy_only=False)
    b = pairs.column("b").to_numpy(zero_copy_only=False)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, w in zip(a.tolist(), b.tolist()):
        ru, rw = find(u), find(w)
        if ru != rw:
            parent[max(ru, rw)] = min(ru, rw)
    nodes = np.fromiter(parent, dtype=np.int64, count=len(parent))
    comps = np.fromiter((find(int(x)) for x in nodes), dtype=np.int64, count=len(nodes))
    order = np.argsort(nodes)
    return pa.table(
        {
            "node": pa.array(nodes[order], pa.int64()),
            "comp": pa.array(comps[order], pa.int64()),
        }
    )


def connected_components(
    pairs_ds, *, buckets: int = 256, max_rounds: int = 64,
    driver_threshold: int = 1_048_576,
):
    """(a, b) int64 pair Dataset → (node, comp) label Dataset.

    ``comp`` is the minimum node id of the node's component. Only nodes
    that appear in at least one pair get a row (component roots label
    themselves); use :func:`attach_components` to extend labels to a
    full id column with singletons mapping to themselves.

    Alternates large-star / small-star rounds (one single-key shuffle
    each) until the pair multiset checksum is stable — O(log n) rounds.

    Hybrid knob (same shape as the crawl budget gate): when the distinct
    pair count — known after the first materialize — is at most
    ``driver_threshold`` (≤16MB of int64 pairs / a few driver seconds of
    union-find at the default 2^20), a local union-find beats launching
    ~2·log(n) shuffle jobs whose per-job overhead dwarfs the work. Above
    it, or with ``driver_threshold=0``, the fully-distributed star rounds
    run (the 100-TB path; pair sets at high dup rates are O(corpus) and
    must never land on one machine). Labels are path-independent (min id
    of the component), so the two regimes are value-identical —
    test-asserted for both this function and url_components.
    """
    def canon_contract(t: pa.Table) -> pa.Table:
        # canonicalize, then LOCAL CONTRACTION (Kiveris et al. §6 "local
        # aggregation"): union-find within the batch and emit each local
        # component as a star to its local min. Connectivity (hence final
        # min-labels) is preserved, while pair count and graph diameter
        # drop before anything is shuffled — batches that already hold a
        # whole component collapse it to its final star here, often
        # cutting the global star rounds to the convergence check alone.
        tbl = distinct_pair_table(
            np.minimum(t.column("a").to_numpy(zero_copy_only=False),
                       t.column("b").to_numpy(zero_copy_only=False)),
            np.maximum(t.column("a").to_numpy(zero_copy_only=False),
                       t.column("b").to_numpy(zero_copy_only=False)),
        )
        if tbl.num_rows == 0:
            return tbl
        lbl = _union_find_labels(tbl)
        node = lbl.column("node").to_numpy(zero_copy_only=False)
        comp = lbl.column("comp").to_numpy(zero_copy_only=False)
        keep = node != comp
        return distinct_pair_table(comp[keep], node[keep])

    pairs = pairs_ds.map_batches(
        canon_contract, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    prev = _checksum(pairs)
    if prev[0] == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "comp": pa.array([], pa.int64())})
        )
    if prev[0] <= driver_threshold:
        import ray.data

        local = pa.concat_tables(
            pairs.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        return ray.data.from_arrow(_union_find_labels(local))
    for _ in range(max_rounds):
        pairs = _star_round(pairs, large=True, buckets=buckets)
        pairs = _star_round(pairs, large=False, buckets=buckets).materialize()
        cur = _checksum(pairs)
        if cur == prev:
            break
        prev = cur
    else:
        # The algorithm provably converges in O(log n) rounds, so running
        # out means a bug or a pathological max_rounds. Labels derived from
        # a non-star pair set would be silently WRONG (callers drop docs
        # based on them) — fail loudly instead.
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds; "
            "raise max_rounds (expected O(log n) rounds) or check the input"
        )

    from ray.data.aggregate import Min

    # converged star forest: every pair is (comp_min, node); roots get a
    # self row. Min-groupby collapses cross-bucket duplicate edges.
    def labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "comp": pa.array([], pa.int64())})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([b, a]), pa.int64()),
                "comp": pa.array(np.concatenate([a, a]), pa.int64()),
            }
        )

    return (
        pairs.map_batches(labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("comp", alias_name="comp"))
    )


def attach_components(ds, cc_ds, *, id_col: str = "doc_id", out_col: str = "comp"):
    """Label EVERY row of ``ds`` with its component: rows absent from the
    label Dataset are singletons labeled with their own id.

    Union of padded (id, own-id) rows with the (node, comp) labels, then
    one single-key min-groupby — the repo's standard shape for joining a
    potentially-large side without a broadcast (labels are O(duplicate
    docs): at a 50% dup rate the label table rivals the corpus)."""
    from ray.data.aggregate import Min

    def own(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        return pa.table({"node": ids.cast(pa.int64()), "comp": ids.cast(pa.int64())})

    def lbl(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "comp": pa.array([], pa.int64())})
        return t.select(["node", "comp"])

    unioned = ds.map_batches(own, batch_format="pyarrow").union(
        cc_ds.map_batches(lbl, batch_format="pyarrow")
    )
    out = unioned.groupby("node").aggregate(Min("comp", alias_name=out_col))
    if id_col != "node":
        out = out.map_batches(
            lambda t: t.rename_columns([id_col, out_col]), batch_format="pyarrow"
        )
    return out


def url_components(edges_ds, nodes_ds, *, src_col: str = "src",
                   dst_col: str = "dst", url_col: str = "url", **cc_kwargs):
    """Weakly-connected components of a string-keyed (url) edge Dataset —
    the web-graph segmentation step (site clusters, dead-archipelago
    detection, per-component sampling): → (url, comp) for EVERY node in
    ``nodes_ds``, where ``comp`` is the component's minimum 63-bit url
    hash and singletons label themselves.

    Shape: one row-local hash pass per side (urls → int64 via the pandas
    siphash, top bit cleared — both the distributed path and the expected
    single-process reference hash identically; below ~10^9 nodes a 63-bit
    collision is negligible, beyond it move to 128-bit ids, the dedup
    line), then :func:`connected_components` (hybrid driver union-find /
    star rounds), then ONE union + min-groupby attaches labels to the
    full node table — the ``attach_components`` shape carrying the url
    string through native Min aggregates (strings: min skips the padded
    nulls), no per-node Python groups, no broadcast.
    """
    import pandas as pd

    def _h(col) -> np.ndarray:
        vals = np.asarray(col.to_pylist(), dtype=object)
        if not len(vals):
            return np.empty(0, dtype=np.int64)
        return (pd.util.hash_array(vals) >> np.uint64(1)).astype(np.int64)

    def hash_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(_h(t.column(src_col)), pa.int64()),
                "b": pa.array(_h(t.column(dst_col)), pa.int64()),
            }
        )

    cc = connected_components(
        edges_ds.map_batches(hash_pairs, batch_format="pyarrow",
                             zero_copy_batch=True),
        **cc_kwargs,
    )

    def own(t: pa.Table) -> pa.Table:
        h = _h(t.column(url_col))
        return pa.table(
            {
                "key": pa.array(h, pa.int64()),
                "url": t.column(url_col),
                "comp": pa.array(h, pa.int64()),
            }
        )

    def lbl(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string()),
                             "comp": pa.array([], pa.int64())})
        return pa.table(
            {
                "key": t.column("node"),
                "url": pa.nulls(t.num_rows, pa.string()),
                "comp": t.column("comp"),
            }
        )

    from ray.data.aggregate import Min

    merged = (
        nodes_ds.map_batches(own, batch_format="pyarrow", zero_copy_batch=True)
        .union(cc.map_batches(lbl, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("key")
        .aggregate(Min("comp", alias_name="comp"), Min("url", alias_name="url"))
    )
    return merged.map_batches(
        lambda t: t.select(["url", "comp"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
