"""Web-graph analytics over the corpus link graph: edge extraction,
degree distributions, PageRank, HITS.

The reference stops at the visited-URL set; the natural next consumer of
a 100TB crawl is the link GRAPH — in/out-degree statistics and a
centrality score (PageRank/HITS) per page. Graph nodes are the corpus
pages; edges are the DISTINCT in-corpus, non-self hyperlinks extracted
by the same pure extractor the crawler uses (extract.py M1, reference
parser.go:120-208), so the graph is exactly "what the crawler saw".

**The node set enters as a Dataset**, never a Python list: at 10^10
URLs (~60B average) a driver-side url list is ~600GB of heap. Every
entry point takes ``nodes`` = a ``ray.data.Dataset`` with a distinct
``url`` column (for the registered queries that is the corpus url
column, read column-pruned), and the engine picks one of two
membership/identity regimes by ``nodes.count()``:

- **Broadcast regime** (≤ ``SHUFFLE_MODE_NODES``): the sorted url array
  is folded in ONE remote task from the node Dataset's blocks and lives
  only in the object store — the driver holds an ``ObjectRef``, never
  the strings. Membership is a per-batch ``pc.is_in`` probe; node ids
  are ``pc.index_in`` ranks against the same shared array.
- **Shuffle regime** (above it): no O(nodes) object exists anywhere.
  Membership is a bucketed pad→union→``groupby(hash(url) % B)``
  semi-join (the joins.py shape); node ids come from
  :func:`node_index` — a distributed zipWithIndex (one range-
  partitioned sort, then per-block offsets computed from block
  METADATA row counts, so driver state is O(blocks) integers); edge
  endpoints are mapped url→id by two more bucketed exchanges against
  that index.

Scale shapes:

- **Edge build is shuffle-free** in the broadcast regime (every
  (src, dst) edge originates from exactly one page row, so "globally
  distinct edges" = per-row dedup — vectorized Arrow kernels, no
  exchange) and ONE bucketed semi-join in the shuffle regime.
- **Degrees are ONE single-key shuffle.** Out-degree is row-local;
  only in-degree crosses blocks. Per-batch partial counts pre-aggregate
  before the ``groupby(url)``.
- **PageRank iterates over a once-materialized, dst-bucketed edge
  dataset.** ``mode="broadcast"``: bucketed edge blocks are pinned once
  into ``_EdgeShard`` actors and each iteration is one RPC round
  against the O(nodes) rank vector shipped via ``ray.put`` (the
  Spark/GraphX broadcast formulation). ``mode="shuffle"`` (the
  ≥``SHUFFLE_MODE_NODES`` path): ranks live in a Dataset as
  (node_id, rank, inv) rows; each iteration is (1) a pad→union→
  ``groupby(src_bucket)`` exchange scattering each node's row-local
  ``rank·inv`` contribution onto its bucket's out-edges, then (2) a
  ``groupby(dst_bucket)`` reduce folding per-dst sums AND carrying the
  inv column forward — per-task state is one bucket slice, the driver
  holds two scalars. Both modes produce BIT-IDENTICAL ranks
  (test-asserted): every per-dst sum is ``np.add.reduceat`` over the
  (dst, src)-sorted contribution run, so float summation order is
  fixed by the data, not by partitioning, and the per-edge
  contribution is the same single ``rank*inv`` product either way.
- **HITS has the same two modes.** Broadcast pins ``_HitsShard``
  actors; shuffle runs four bucketed exchanges per iteration (two per
  direction). The L1 normalization total is pinned to a two-level
  tree — per-bucket ``np.sum`` partials folded by ``np.sum`` in bucket
  order (:func:`_l1_total`) — computed identically by the reference,
  the actor mode and the shuffle mode, so all three are bit-identical.

Dangling-node mass (pages with no outlinks) is dropped, not
redistributed — ranks sum to < 1 but the relative ordering follows the
standard "simplified PageRank" (Page et al. 1999, the formulation
without the dangling patch). Documented so the single-process oracle
(:func:`pagerank_reference`, used by expected.py) matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "build_edges",
    "degrees",
    "node_index",
    "pagerank",
    "pagerank_reference",
    "hits",
    "hits_reference",
    "triangle_counts",
    "bfs_distances",
    "kcore",
    "SHUFFLE_MODE_NODES",
]

# Above this node count the broadcast rank vector (8B/node — 40MB at 5M)
# stops being "small state" and mode="auto" switches to the fully-
# distributed shuffle formulation.
SHUFFLE_MODE_NODES = 5_000_000

_DAMPING = 0.85
_N_ITERS = 10

# Hash-bucket count for the shuffle regime's membership / id-mapping
# exchanges (a performance knob only — results are bucketing-independent).
_MAP_BUCKETS = 256


# ---------------------------------------------------------------------------
# node-set handshake


def _sorted_urls_ref(nodes_ds):
    """ObjectRef to the sorted distinct url array of a node Dataset.

    Folded in ONE remote task from the Dataset's blocks — the url column
    never lands on the driver (the driver keeps only the ref). Broadcast-
    regime helper: callers must already know ``nodes.count()`` is within
    ``SHUFFLE_MODE_NODES``.
    """
    import ray

    refs = nodes_ds.to_arrow_refs()

    @ray.remote(num_cpus=1)
    def fold(*tables) -> pa.Array:
        tabs = [t.select(["url"]) for t in tables if t.num_rows]
        if not tabs:
            return pa.array([], pa.string())
        arr = pa.concat_tables(tabs).column("url").combine_chunks()
        uniq = pc.unique(arr)
        return pc.take(uniq, pc.array_sort_indices(uniq))

    return fold.remote(*refs)


def node_index(nodes_ds):
    """Distributed zipWithIndex over the node table → ((node_id, url)
    Dataset, n) with ``node_id`` = the url's rank in global sorted order.

    One range-partitioned sort; ids are assigned per block from block
    METADATA row counts, so the driver holds O(blocks) integers and never
    the url column. The node Dataset must be distinct on ``url`` (the
    corpus url column is — it is the pages table's key).
    """
    import ray
    import ray.data

    sorted_ds = nodes_ds.sort("url").materialize()
    refs: list = []
    counts: list[int] = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            assert meta.num_rows is not None  # known after materialize()
            if meta.num_rows == 0:
                continue  # zero-row blocks may carry an empty schema
            refs.append(ref)
            counts.append(int(meta.num_rows))
    n = int(sum(counts))
    if n == 0:
        empty = pa.table(
            {"node_id": pa.array([], pa.int64()), "url": pa.array([], pa.string())}
        )
        return ray.data.from_arrow(empty), 0
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)

    @ray.remote(num_cpus=1)
    def assign(t: pa.Table, off: int) -> pa.Table:
        return pa.table(
            {
                "node_id": pa.array(
                    np.arange(off, off + t.num_rows, dtype=np.int64), pa.int64()
                ),
                "url": t.column("url"),
            }
        )

    index_ds = ray.data.from_arrow_refs(
        [assign.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )
    return index_ds, n


def _resolve_membership(membership: str, n: int) -> str:
    if membership == "auto":
        return "shuffle" if n > SHUFFLE_MODE_NODES else "broadcast"
    if membership not in ("broadcast", "shuffle"):
        raise ValueError(
            f"membership must be 'auto', 'broadcast' or 'shuffle', got {membership!r}"
        )
    return membership


# ---------------------------------------------------------------------------
# edge build


def _edges_batch(t: pa.Table, keep: pa.Array) -> pa.Table:
    """links list column → distinct in-corpus non-self (src, dst) rows.
    Row-local and fully vectorized; see module docstring."""
    links = t.column("links")
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    src = pc.take(t.column("url"), pc.list_parent_indices(links))
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    mask = pc.and_(pc.is_in(flat, value_set=keep), pc.not_equal(flat, src))
    pairs = pa.table({"src": pc.filter(src, mask), "dst": pc.filter(flat, mask)})
    # batch-local distinct = global distinct (each src lives in one row)
    return pairs.group_by(["src", "dst"]).aggregate([])


def _candidate_pairs_batch(t: pa.Table) -> pa.Table:
    """links list column → batch-local distinct non-self (src, dst)
    candidate rows (membership NOT yet applied — the shuffle regime's
    semi-join does that)."""
    links = t.column("links")
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    src = pc.take(t.column("url"), pc.list_parent_indices(links))
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    mask = pc.not_equal(flat, src)
    pairs = pa.table({"src": pc.filter(src, mask), "dst": pc.filter(flat, mask)})
    return pairs.group_by(["src", "dst"]).aggregate([])


def _extracted(pages_ds):
    from ..extract import extract_links_batch

    return pages_ds.map_batches(
        extract_links_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _edges_broadcast(pages_ds, keep_ref):
    import ray

    def to_edges(t: pa.Table) -> pa.Table:
        return _edges_batch(t, ray.get(keep_ref))

    return _extracted(pages_ds).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    )


def _member_semijoin(pairs_ds, nodes_ds, *, n_buckets: int = _MAP_BUCKETS):
    """Keep (src, dst) rows whose ``dst`` is in the node set — ONE bucketed
    pad→union→groupby exchange (no O(nodes) object anywhere). Node rows
    are marked by a null ``src``; in-group membership is a vectorized
    ``pc.is_in`` against the bucket's node slice."""
    from .sketch import hash64_column

    def pad_pairs(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("dst")) % n_buckets).astype(np.int64)
        return pa.table(
            {"bk": pa.array(bk, pa.int64()), "src": t.column("src"), "dst": t.column("dst")}
        )

    def pad_nodes(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "src": pa.array([None] * t.num_rows, pa.string()),
                "dst": t.column("url"),
            }
        )

    unioned = pairs_ds.map_batches(
        pad_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).union(nodes_ds.map_batches(pad_nodes, batch_format="pyarrow", zero_copy_batch=True))

    def group(g: pa.Table) -> pa.Table:
        is_node = pc.is_null(g.column("src"))
        node_urls = pc.filter(g.column("dst"), is_node)
        if isinstance(node_urls, pa.ChunkedArray):
            node_urls = node_urls.combine_chunks()
        e = g.filter(pc.invert(is_node))
        keep = pc.is_in(e.column("dst"), value_set=node_urls)
        return pa.table(
            {
                "src": pc.filter(e.column("src"), keep),
                "dst": pc.filter(e.column("dst"), keep),
            }
        )

    return unioned.groupby("bk").map_groups(group, batch_format="pyarrow")


def build_edges(pages_ds, nodes, *, membership: str = "auto", n_buckets: int = _MAP_BUCKETS):
    """Distinct in-corpus (src, dst) edge Dataset from a pages Dataset.

    ``nodes`` is the graph's node set as a Dataset with a distinct ``url``
    column (for the registered queries, the corpus url column — a
    column-pruned ``read_parquet``). Membership of extracted targets is a
    broadcast ``pc.is_in`` probe (array built in a remote task, driver
    holds only the ref) below ``SHUFFLE_MODE_NODES`` and the bucketed
    semi-join above it. Edge sources are assumed ⊆ nodes (pages ARE
    nodes for the corpus graph), matching the reference's extraction
    seam (parser.go:120-208: links come only from fetched pages).
    """
    membership = _resolve_membership(membership, nodes.count())
    if membership == "broadcast":
        return _edges_broadcast(pages_ds, _sorted_urls_ref(nodes))
    pairs = _extracted(pages_ds).map_batches(
        _candidate_pairs_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return _member_semijoin(pairs, nodes, n_buckets=n_buckets)


def degrees(pages_ds, nodes, *, membership: str = "auto", n_buckets: int = _MAP_BUCKETS):
    """Per-node (url, out_deg, in_deg) in one single-key shuffle.

    Every edge contributes per-batch pre-aggregated partial rows; node
    rows contribute (url, 0, 0) so isolated pages keep their zero row; a
    single ``groupby(url)`` sums. In the broadcast regime the out-degree
    partials stay fused with extraction (zero extra passes); the shuffle
    regime feeds the semi-joined edge stream through the same partials.
    """
    import ray
    from ray.data.aggregate import Sum

    membership = _resolve_membership(membership, nodes.count())

    if membership == "broadcast":
        keep_ref = _sorted_urls_ref(nodes)

        def partials(t: pa.Table) -> pa.Table:
            edges = _edges_batch(t, ray.get(keep_ref))
            out_counts = edges.group_by(["src"]).aggregate([([], "count_all")])
            pos = pc.index_in(t.column("url"), value_set=out_counts.column("src"))
            out_partial = pc.fill_null(
                pc.take(out_counts.column("count_all"), pos), 0
            ).cast(pa.int64())
            if isinstance(out_partial, pa.ChunkedArray):
                out_partial = out_partial.combine_chunks()
            page_rows = pa.table(
                {
                    "url": t.column("url"),
                    "out_partial": out_partial,
                    "in_partial": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                }
            )
            in_counts = edges.group_by(["dst"]).aggregate([([], "count_all")])
            in_rows = pa.table(
                {
                    "url": in_counts.column("dst"),
                    "out_partial": pa.array(
                        np.zeros(in_counts.num_rows, np.int64), pa.int64()
                    ),
                    "in_partial": in_counts.column("count_all").cast(pa.int64()),
                }
            )
            return pa.concat_tables([page_rows, in_rows])

        partial_ds = _extracted(pages_ds).map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        edges_ds = build_edges(
            pages_ds, nodes, membership="shuffle", n_buckets=n_buckets
        )

        def edge_partials(t: pa.Table) -> pa.Table:
            out_counts = t.group_by(["src"]).aggregate([([], "count_all")])
            in_counts = t.group_by(["dst"]).aggregate([([], "count_all")])
            return pa.concat_tables(
                [
                    pa.table(
                        {
                            "url": out_counts.column("src"),
                            "out_partial": out_counts.column("count_all").cast(pa.int64()),
                            "in_partial": pa.array(
                                np.zeros(out_counts.num_rows, np.int64), pa.int64()
                            ),
                        }
                    ),
                    pa.table(
                        {
                            "url": in_counts.column("dst"),
                            "out_partial": pa.array(
                                np.zeros(in_counts.num_rows, np.int64), pa.int64()
                            ),
                            "in_partial": in_counts.column("count_all").cast(pa.int64()),
                        }
                    ),
                ]
            )

        def node_zeros(t: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            return pa.table({"url": t.column("url"), "out_partial": z, "in_partial": z})

        partial_ds = edges_ds.map_batches(
            edge_partials, batch_format="pyarrow", zero_copy_batch=True
        ).union(nodes.map_batches(node_zeros, batch_format="pyarrow", zero_copy_batch=True))

    return partial_ds.groupby("url").aggregate(
        Sum("out_partial", alias_name="out_deg"),
        Sum("in_partial", alias_name="in_deg"),
    )


# ---------------------------------------------------------------------------
# shared deterministic primitives


def _contrib_sums(
    dst: np.ndarray,
    src: np.ndarray,
    ranks: np.ndarray,
    inv_out: np.ndarray,
    w: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dst contribution sums over a (dst, src)-sorted run — the ONE
    float-summation primitive both pagerank modes and the single-process
    oracle share, so rank floats are bit-identical on any partitioning.
    ``ranks``/``inv_out`` may be full vectors or bucket slices, as long
    as ``src`` is pre-offset to index them. ``w`` (weighted graphs, e.g.
    the host graph) multiplies each edge's contribution AFTER the
    rank·inv product — ``(ranks[src]*inv_out[src])*w`` — the pinned
    ordering every mode and reference shares."""
    if len(dst) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    c = ranks[src] * inv_out[src]
    if w is not None:
        c = c * w
    starts = np.flatnonzero(np.r_[True, np.diff(dst) != 0])
    return dst[starts], np.add.reduceat(c, starts)


def _l1_total(v: np.ndarray, per_bucket: int) -> float:
    """Pinned L1 total of a dense non-negative score vector: per-bucket
    ``np.sum`` partials folded by ``np.sum`` in bucket order — the same
    two-level tree the shuffle mode computes distributedly (each reduce
    group sums its bucket's dense slice, the driver folds the B-vector),
    so normalization is bit-identical across modes and cluster sizes."""
    n = len(v)
    if n == 0:
        return 0.0
    nb = -(-n // per_bucket)
    parts = np.empty(nb, dtype=np.float64)
    for i in range(nb):
        parts[i] = np.sum(v[i * per_bucket : (i + 1) * per_bucket])
    return float(np.sum(parts))


def _graph_buckets(n: int) -> int:
    """Shared bucket-SIZE rule (~100k nodes of rank state per bucket:
    small graphs get few fat buckets — shuffle rounds are fixed-overhead-
    bound — huge graphs cap at 4096 buckets ≈ cluster-core scale) — ONE
    definition so both modes and both references partition identically."""
    return max(1, -(-n // max(16, min(4096, -(-n // 100_000)))))


def _bucketed_edge_ids(edges_ds, urls_ref, per_bucket: int):
    """Edges as (src_id, dst_id) int64 rows, RANGE-bucketed by dst
    (``dst_id // per_bucket`` — dst-contiguous buckets) and sorted by
    (dst_id, src_id) within each bucket; materialized once and reused by
    every iteration. Broadcast regime: ids are ``pc.index_in`` ranks
    against the shared sorted url array (object store only)."""
    import ray

    def to_ids(t: pa.Table) -> pa.Table:
        ua = ray.get(urls_ref)
        src_id = pc.index_in(t.column("src"), value_set=ua).cast(pa.int64())
        dst_id = pc.index_in(t.column("dst"), value_set=ua).cast(pa.int64())
        bucket = pc.divide(dst_id, per_bucket).cast(pa.int32())
        cols = {"src_id": src_id, "dst_id": dst_id, "bucket": bucket}
        if "w" in t.column_names:  # weighted graphs (host graph) carry w
            cols["w"] = t.column("w").cast(pa.int64())
        return pa.table(cols)

    def sort_group(g: pa.Table) -> pa.Table:
        return g.sort_by(
            [("dst_id", "ascending"), ("src_id", "ascending")]
        ).drop_columns(["bucket"])

    return (
        edges_ds.map_batches(to_ids, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sort_group, batch_format="pyarrow")
        .materialize()
    )


def _edge_ids_shuffle(
    pairs_ds,
    index_ds,
    *,
    per_bucket: int,
    n_buckets: int = _MAP_BUCKETS,
    weighted: bool = False,
):
    """Shuffle-regime edge identity: (src, dst) string candidates →
    (src_id, dst_id) int64 rows via TWO bucketed pad→union exchanges
    against the node index (endpoints absent from the index are dropped —
    this doubles as the membership semi-join), then one dst-bucket
    grouping that sorts each bucket by (dst_id, src_id). Materialized
    once; no O(nodes) object anywhere. ``weighted=True`` (host graph)
    carries the pairs' int64 ``w`` column through both exchanges into
    the output."""
    from .sketch import hash64_column

    # --- exchange 1: dst → dst_id (and membership filter) ---------------
    def pad_pairs_dst(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("dst")) % n_buckets).astype(np.int64)
        cols = {
            "bk": pa.array(bk, pa.int64()),
            "k": t.column("dst"),
            "other": t.column("src"),
            "nid": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
        }
        if weighted:
            cols["w"] = t.column("w").cast(pa.int64())
        return pa.table(cols)

    def pad_index(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        cols = {
            "bk": pa.array(bk, pa.int64()),
            "k": t.column("url"),
            "other": pa.array([None] * t.num_rows, pa.string()),
            "nid": t.column("node_id"),
        }
        if weighted:
            cols["w"] = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table(cols)

    def map_dst(g: pa.Table) -> pa.Table:
        nid = g.column("nid")
        is_idx = pc.greater_equal(nid, 0)
        idx_rows = g.filter(is_idx)
        e = g.filter(pc.invert(is_idx))
        keys = idx_rows.column("k").combine_chunks()
        pos = pc.index_in(e.column("k"), value_set=keys)
        keep = pc.is_valid(pos)
        e = e.filter(keep)
        pos = pos.filter(keep)
        dst_id = pc.take(idx_rows.column("nid"), pos)
        if isinstance(dst_id, pa.ChunkedArray):
            dst_id = dst_id.combine_chunks()
        cols = {"src": e.column("other"), "dst_id": dst_id}
        if weighted:
            cols["w"] = e.column("w")
        return pa.table(cols)

    stage1 = (
        pairs_ds.map_batches(pad_pairs_dst, batch_format="pyarrow", zero_copy_batch=True)
        .union(index_ds.map_batches(pad_index, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("bk")
        .map_groups(map_dst, batch_format="pyarrow")
    )

    # --- exchange 2: src → src_id ---------------------------------------
    def pad_pairs_src(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("src")) % n_buckets).astype(np.int64)
        cols = {
            "bk": pa.array(bk, pa.int64()),
            "k": t.column("src"),
            "carry": t.column("dst_id"),
            "nid": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
        }
        if weighted:
            cols["w"] = t.column("w")
        return pa.table(cols)

    def pad_index2(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        cols = {
            "bk": pa.array(bk, pa.int64()),
            "k": t.column("url"),
            "carry": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "nid": t.column("node_id"),
        }
        if weighted:
            cols["w"] = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table(cols)

    def map_src(g: pa.Table) -> pa.Table:
        nid = g.column("nid")
        is_idx = pc.greater_equal(nid, 0)
        idx_rows = g.filter(is_idx)
        e = g.filter(pc.invert(is_idx))
        keys = idx_rows.column("k").combine_chunks()
        pos = pc.index_in(e.column("k"), value_set=keys)
        keep = pc.is_valid(pos)
        e = e.filter(keep)
        pos = pos.filter(keep)
        src_id = pc.take(idx_rows.column("nid"), pos)
        if isinstance(src_id, pa.ChunkedArray):
            src_id = src_id.combine_chunks()
        cols = {"src_id": src_id, "dst_id": e.column("carry")}
        if weighted:
            cols["w"] = e.column("w")
        return pa.table(cols)

    stage2 = (
        stage1.map_batches(pad_pairs_src, batch_format="pyarrow", zero_copy_batch=True)
        .union(index_ds.map_batches(pad_index2, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("bk")
        .map_groups(map_src, batch_format="pyarrow")
    )

    # --- dst-bucket grouping + in-bucket (dst, src) sort ------------------
    def with_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.divide(t.column("dst_id"), per_bucket).cast(pa.int32())
        )

    def sort_group(g: pa.Table) -> pa.Table:
        return g.sort_by(
            [("dst_id", "ascending"), ("src_id", "ascending")]
        ).drop_columns(["bucket"])

    return (
        stage2.map_batches(with_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sort_group, batch_format="pyarrow")
        .materialize()
    )


# ---------------------------------------------------------------------------
# PageRank


class _EdgeShard:
    """Iteration-state actor for broadcast-mode PageRank: pins a set of
    WHOLE dst-buckets (materialized edge blocks travel object-store →
    actor, never through the driver) sorted by (dst_id, src_id), so
    every per-dst contribution run stays intact and ``_contrib_sums``
    keeps float summation bit-deterministic. One actor round per
    iteration replaces a fresh Dataset job (~1s launch overhead each on
    a busy driver; pure RPC here)."""

    def __init__(self, block_refs):
        import ray

        # drop empty-schema blocks (an edgeless graph materializes one)
        tables = [t for t in map(ray.get, block_refs) if "dst_id" in t.column_names]
        t = pa.concat_tables(tables) if tables else pa.table(
            {"src_id": pa.array([], pa.int64()), "dst_id": pa.array([], pa.int64())}
        )
        t = t.sort_by([("dst_id", "ascending"), ("src_id", "ascending")])
        self.dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        self.src = t.column("src_id").to_numpy(zero_copy_only=False)
        # optional integer edge weight (host graph); None = unweighted
        self.w = (
            t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
            if "w" in t.column_names
            else None
        )

    def out_partial(self) -> tuple[np.ndarray, np.ndarray]:
        """(unique src ids, counts or weight sums) — integer partials,
        summation-order-free."""
        if self.w is None:
            return np.unique(self.src, return_counts=True)
        uniq, inv_idx = np.unique(self.src, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv_idx, self.w)
        return uniq, sums

    def contribs(self, ranks, inv_out) -> tuple[np.ndarray, np.ndarray]:
        # called with ObjectRefs — Ray auto-derefs zero-copy from plasma
        return _contrib_sums(self.dst, self.src, ranks, inv_out, self.w)


def _out_degree_vector(edges_b, n: int) -> np.ndarray:
    """Exact out-degree per node id from the bucketed edge Dataset: one
    streaming pass of per-batch partial counts + a single-key groupby
    (integer sums are summation-order-free). Broadcast-regime helper
    (O(n) driver vector, documented ≤ SHUFFLE_MODE_NODES)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(src, return_counts=True)
        return pa.table(
            {"src_id": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    out = np.zeros(n, dtype=np.int64)
    agg = (
        edges_b.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("src_id")
        .aggregate(Sum("n", alias_name="out"))
    )
    for t in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        if "src_id" in t.column_names and t.num_rows:
            out[t.column("src_id").to_numpy(zero_copy_only=False)] = (
                t.column("out").to_numpy(zero_copy_only=False)
            )
    return out


def pagerank(
    pages_ds,
    nodes,
    *,
    n_iters: int = _N_ITERS,
    damping: float = _DAMPING,
    mode: str = "auto",
    n_buckets: int | None = None,
    seed_urls: list[str] | None = None,
):
    """PageRank over the corpus link graph → Dataset of (url, rank_ppb).

    ``nodes`` is the node set as a Dataset with a distinct ``url`` column.
    ``rank_ppb`` is the rank quantized to parts-per-billion (int64) so
    the correctness gate compares integers; the underlying floats are
    already bit-deterministic (see ``_contrib_sums``). ``mode``:
    "broadcast" (O(nodes) rank vector on the driver + one RPC round per
    iteration — the ≤``SHUFFLE_MODE_NODES`` regime), "shuffle" (ranks
    stay a Dataset, two single-key exchanges per iteration, no O(nodes)
    state on the driver or in any single object), or "auto".

    ``seed_urls`` personalizes the teleport (TrustRank, Gyöngyi et al.
    2004): restart mass lands only on the seed set (p = 1/|S| on seeds,
    0 elsewhere) instead of uniformly — the spam-demotion / crawl-
    prioritization form. Seed lists are config-sized (a trusted-site
    list), so holding one as a Python list is the same contract as
    crawl seeds; every seed must be in the node set.
    """
    import ray
    import ray.data

    if seed_urls is not None and not seed_urls:
        raise ValueError("seed_urls must be non-empty when given")
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"url": pa.array([], pa.string()), "rank_ppb": pa.array([], pa.int64())}
            )
        )
    if mode == "auto":
        mode = "shuffle" if n > SHUFFLE_MODE_NODES else "broadcast"
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"mode must be 'auto', 'broadcast' or 'shuffle', got {mode!r}")
    if n_buckets is None:
        per_bucket = _graph_buckets(n)
    else:
        per_bucket = max(1, -(-n // n_buckets))  # ceil(n / n_buckets)

    if mode == "shuffle":
        nb = -(-n // per_bucket)
        # materialize ONCE and pin block counts: the iteration loop reuses
        # these blocks every round, and each Sort's output-partition count
        # (and the driver's shuffle metadata) tracks its INPUT block count
        # — without the coalescing repartition the per-iteration block
        # count compounds geometrically and the driver melts down on sort
        # metadata (observed: 2GB→8GB driver estimates by iteration 2)
        index_ds = node_index(nodes)[0].repartition(nb, shuffle=False).materialize()
        pairs = _extracted(pages_ds).map_batches(
            _candidate_pairs_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        edges_b = (
            _edge_ids_shuffle(pairs, index_ds, per_bucket=per_bucket)
            .repartition(nb, shuffle=False)
            .materialize()
        )
        teleport = None
        if seed_urls is not None:
            ss = sorted(set(seed_urls))
            seeds_arr = pa.array(ss, pa.string())
            id_rows = index_ds.map_batches(
                lambda t, _sa=seeds_arr: t.filter(
                    pc.is_in(t.column("url"), value_set=_sa)
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).take_all()  # ≤ |seed_urls| rows — seed lists are config-sized
            ids = np.sort(
                np.array([r["node_id"] for r in id_rows], dtype=np.int64)
            )
            if len(ids) != len(ss):
                raise ValueError("seed_urls not all present in the node set")
            teleport = (ray.put(ids), len(ids))
        return _pagerank_shuffle(
            edges_b,
            index_ds,
            n=n,
            n_iters=n_iters,
            damping=damping,
            per_bucket=per_bucket,
            teleport=teleport,
        )

    # ---- broadcast mode --------------------------------------------------
    # Pin whole-bucket edge blocks into a round-robin actor pool ONCE;
    # each iteration is a round of actor calls (no per-iteration Dataset
    # job). Blocks hold whole dst-buckets (a map_groups group table only
    # splits above the 128MB block target), so per-dst runs stay intact
    # per actor and ranks remain bit-identical to pagerank_reference.
    urls_ref = _sorted_urls_ref(nodes)
    edges_b = _bucketed_edge_ids(_edges_broadcast(pages_ds, urls_ref), urls_ref, per_bucket)
    base = (1.0 - damping) / n
    if seed_urls is None:
        base_vec = np.full(n, base, dtype=np.float64)
        rank0_vec = np.full(n, 1.0 / n, dtype=np.float64)
    else:

        @ray.remote(num_cpus=1)
        def _seed_positions(urls_arr: pa.Array, seeds: list[str]) -> np.ndarray:
            pos = pc.index_in(pa.array(seeds, pa.string()), value_set=urls_arr)
            if pos.null_count:
                missing = [
                    s for s, p in zip(seeds, pos.to_pylist()) if p is None
                ]
                raise ValueError(f"seed_urls not in node set: {missing[:3]}")
            return pos.to_numpy(zero_copy_only=False).astype(np.int64)

        pos = ray.get(_seed_positions.remote(urls_ref, sorted(set(seed_urls))))
        rank0_vec = np.zeros(n, dtype=np.float64)
        rank0_vec[pos] = 1.0 / len(pos)
        base_vec = np.zeros(n, dtype=np.float64)
        base_vec[pos] = (1.0 - damping) / len(pos)
    return _broadcast_rank_loop(
        edges_b,
        urls_ref,
        n,
        n_iters=n_iters,
        damping=damping,
        base_vec=base_vec,
        rank0_vec=rank0_vec,
    )


def _broadcast_rank_vectors(
    edges_b, n, *, n_iters, damping, variants
) -> list[np.ndarray]:
    """Broadcast-regime power iteration core: whole-dst-bucket edge
    blocks pinned into ONE round-robin :class:`_EdgeShard` actor pool
    (weight-aware when the blocks carry ``w``), one RPC round per
    iteration. ``variants`` is a list of (base_vec, rank0_vec) teleport
    personalizations iterated over the SAME pinned shards — running
    uniform and seeded ranks together (spam mass, TrustRank seed-set
    sweeps) pays the edge build and out-degree pass once."""
    import ray

    block_refs = edges_b.to_arrow_refs()
    shard_cls = ray.remote(num_cpus=1)(_EdgeShard)
    n_actors = max(1, min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))))
    actors = [shard_cls.remote(block_refs[i::n_actors]) for i in range(n_actors)]
    results = []
    try:
        out_vec = np.zeros(n, dtype=np.int64)
        for uniq, cnt in ray.get([a.out_partial.remote() for a in actors]):
            out_vec[uniq] += cnt
        inv_out = np.zeros(n, dtype=np.float64)
        nz = out_vec > 0
        inv_out[nz] = 1.0 / out_vec[nz]
        inv_ref = ray.put(inv_out)
        for base_vec, rank0_vec in variants:
            ranks = rank0_vec.copy()
            for _ in range(n_iters):
                ranks_ref = ray.put(ranks)
                parts = ray.get(
                    [a.contribs.remote(ranks_ref, inv_ref) for a in actors]
                )
                new = base_vec.copy()
                dsts = np.concatenate([p[0] for p in parts])
                if len(dsts):
                    sums = np.concatenate([p[1] for p in parts])
                    order = np.argsort(dsts, kind="stable")
                    np.add.at(new, dsts[order], damping * sums[order])
                ranks = new
            results.append(ranks)
    finally:
        for a in actors:
            ray.kill(a)
    return results


def _broadcast_rank_loop(
    edges_b, urls_ref, n, *, n_iters, damping, base_vec, rank0_vec
):
    """Broadcast-regime power iteration shared by :func:`pagerank` and
    :func:`weighted_pagerank`: one teleport variant through
    :func:`_broadcast_rank_vectors`, ranks quantized to ppb in a remote
    finish task."""
    import ray
    import ray.data

    (ranks,) = _broadcast_rank_vectors(
        edges_b,
        n,
        n_iters=n_iters,
        damping=damping,
        variants=[(base_vec, rank0_vec)],
    )

    @ray.remote(num_cpus=1)
    def finish(urls_arr: pa.Array, rank_vec: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "url": urls_arr,
                "rank_ppb": pa.array(
                    np.round(rank_vec * 1e9).astype(np.int64), pa.int64()
                ),
            }
        )

    return ray.data.from_arrow_refs([finish.remote(urls_ref, ranks)])


def _pagerank_shuffle(
    edges_b,
    index_ds,
    *,
    n,
    n_iters,
    damping,
    per_bucket,
    teleport=None,
    weighted=False,
):
    """Fully-distributed PageRank: no O(nodes) state on the driver OR in
    any single broadcast object. Rank state is a Dataset of
    (node_id, rank, inv) rows — ``inv`` (1/out-degree) rides along so the
    reduce stage can emit complete next-iteration rows without a separate
    lookup side. Each iteration is exactly two bucketed exchanges:

    1. ``groupby(src_bucket)`` over rank rows ∪ edge rows: each node's
       row-local contribution ``rank·inv`` is scattered onto its
       bucket's out-edges (vectorized slice lookup).
    2. ``groupby(dst_bucket)`` over contribution rows ∪ rank rows: per-
       dst ``np.add.reduceat`` over the (dst, src)-sorted run (the shared
       deterministic primitive), then the bucket's dense next-rank slice
       is rebuilt with the carried ``inv``.

    Every bucket is covered in stage 2 because every node's rank row is
    routed there — no separate uncovered-bucket bookkeeping."""
    import ray.data
    from ray.data.aggregate import Sum  # noqa: F401  (documents the family)

    base = (1.0 - damping) / n
    r0 = 1.0 / n
    seed_ref, n_seeds = teleport if teleport is not None else (None, 0)

    def _teleport_slices(lo: int, hi: int):
        """(base, rank0) dense slices for node ids [lo, hi): uniform
        without teleport (the pinned one-division floats), else mass only
        on the broadcast seed-id set (TrustRank personalization)."""
        if seed_ref is None:
            return (
                np.full(hi - lo, base, dtype=np.float64),
                np.full(hi - lo, r0, dtype=np.float64),
            )
        import ray

        ids = ray.get(seed_ref)
        sel = ids[(ids >= lo) & (ids < hi)]
        b = np.zeros(hi - lo, dtype=np.float64)
        r = np.zeros(hi - lo, dtype=np.float64)
        b[sel - lo] = (1.0 - damping) / n_seeds
        r[sel - lo] = 1.0 / n_seeds
        return b, r

    # --- initial (node_id, rank, inv) rows: out-degree partials + the
    # dense node range from the index, ONE groupby(db) ---------------------
    def out_partials(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        if weighted:
            # out-WEIGHT per src: integer sums, summation-order-free
            w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, inv_idx = np.unique(src, return_inverse=True)
            cnt = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(cnt, inv_idx, w)
        else:
            uniq, cnt = np.unique(src, return_counts=True)
        return pa.table(
            {
                "db": pa.array((uniq // per_bucket).astype(np.int64), pa.int64()),
                "node_id": pa.array(uniq, pa.int64()),
                "out_partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def index_zeros(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "node_id": t.column("node_id"),
                "out_partial": pa.array(np.full(len(nid), -1, np.int64), pa.int64()),
            }
        )

    def rank0_group(g: pa.Table) -> pa.Table:
        nid = g.column("node_id").to_numpy(zero_copy_only=False)
        outp = g.column("out_partial").to_numpy(zero_copy_only=False)
        b = int(g.column("db")[0].as_py())
        lo = b * per_bucket
        hi = min(lo + per_bucket, n)
        out = np.zeros(hi - lo, np.int64)
        is_partial = outp >= 0
        np.add.at(out, nid[is_partial] - lo, outp[is_partial])
        inv = np.zeros(hi - lo, np.float64)
        nz = out > 0
        inv[nz] = 1.0 / out[nz]
        return pa.table(
            {
                "node_id": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64()),
                "rank": pa.array(_teleport_slices(lo, hi)[1], pa.float64()),
                "inv": pa.array(inv, pa.float64()),
            }
        )

    nb = -(-n // per_bucket)
    ranks_ds = (
        edges_b.map_batches(out_partials, batch_format="pyarrow", zero_copy_batch=True)
        .union(index_ds.map_batches(index_zeros, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("db")
        .map_groups(rank0_group, batch_format="pyarrow")
        .repartition(nb, shuffle=False)
        .materialize()
    )

    # --- iterate -----------------------------------------------------------
    def rank_pad(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        c = t.column("rank").to_numpy(zero_copy_only=False) * t.column("inv").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "gb": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "src_id": pa.array(np.full(len(nid), -1, np.int64), pa.int64()),
                "dst_id": pa.array(nid, pa.int64()),
                "c": pa.array(c, pa.float64()),
            }
        )

    def edge_pad(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        if weighted:
            # the edge's weight rides in the c slot (nan filler otherwise)
            cvals = pa.array(
                t.column("w").to_numpy(zero_copy_only=False).astype(np.float64),
                pa.float64(),
            )
        else:
            cvals = pa.array(np.full(len(src), np.nan), pa.float64())
        return pa.table(
            {
                "gb": pa.array((src // per_bucket).astype(np.int64), pa.int64()),
                "src_id": t.column("src_id"),
                "dst_id": t.column("dst_id"),
                "c": cvals,
            }
        )

    def join_group(g: pa.Table) -> pa.Table:
        src = g.column("src_id").to_numpy(zero_copy_only=False)
        dst = g.column("dst_id").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        is_rank = src < 0
        b = int(g.column("gb")[0].as_py())
        lo = b * per_bucket
        hi = min(lo + per_bucket, n)
        lookup = np.zeros(hi - lo, dtype=np.float64)
        lookup[dst[is_rank] - lo] = c[is_rank]
        e_src = src[~is_rank]
        e_dst = dst[~is_rank]
        contrib = lookup[e_src - lo]
        if weighted:
            # (rank·inv)·w — same pinned ordering as _contrib_sums
            contrib = contrib * c[~is_rank]
        return pa.table(
            {
                "db": pa.array((e_dst // per_bucket).astype(np.int64), pa.int64()),
                "dst_id": pa.array(e_dst, pa.int64()),
                "src_id": pa.array(e_src, pa.int64()),
                "c": pa.array(contrib, pa.float64()),
            }
        )

    def inv_pad(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "dst_id": pa.array(nid, pa.int64()),
                "src_id": pa.array(np.full(len(nid), -1, np.int64), pa.int64()),
                "c": t.column("inv"),
            }
        )

    def reduce_group(g: pa.Table) -> pa.Table:
        src = g.column("src_id").to_numpy(zero_copy_only=False)
        dst = g.column("dst_id").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        is_inv = src < 0
        b = int(g.column("db")[0].as_py())
        lo = b * per_bucket
        hi = min(lo + per_bucket, n)
        inv_dense = np.zeros(hi - lo, dtype=np.float64)
        inv_dense[dst[is_inv] - lo] = c[is_inv]
        e_src = src[~is_inv]
        e_dst = dst[~is_inv]
        ranks = _teleport_slices(lo, hi)[0]
        if len(e_dst):
            order = np.lexsort((e_src, e_dst))
            e_dst = e_dst[order]
            e_c = c[~is_inv][order]
            starts = np.flatnonzero(np.r_[True, np.diff(e_dst) != 0])
            sums = np.add.reduceat(e_c, starts)
            np.add.at(ranks, e_dst[starts] - lo, damping * sums)
        return pa.table(
            {
                "node_id": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64()),
                "rank": pa.array(ranks, pa.float64()),
                "inv": pa.array(inv_dense, pa.float64()),
            }
        )

    for _ in range(n_iters):
        contribs = (
            ranks_ds.map_batches(rank_pad, batch_format="pyarrow", zero_copy_batch=True)
            .union(edges_b.map_batches(edge_pad, batch_format="pyarrow", zero_copy_batch=True))
            .groupby("gb")
            .map_groups(join_group, batch_format="pyarrow")
        )
        ranks_ds = (
            contribs.union(
                ranks_ds.map_batches(inv_pad, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("db")
            .map_groups(reduce_group, batch_format="pyarrow")
            # coalesce back to O(buckets) blocks: the next iteration's Sort
            # sizes its output (and driver metadata) from input block count
            .repartition(nb, shuffle=False)
            .materialize()
        )

    # --- attach urls: ONE bucketed exchange against the index -------------
    def rank_fin_pad(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "node_id": t.column("node_id"),
                "rank": t.column("rank"),
                "url": pa.array([None] * len(nid), pa.string()),
            }
        )

    def idx_fin_pad(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "node_id": t.column("node_id"),
                "rank": pa.array(np.full(len(nid), np.nan), pa.float64()),
                "url": t.column("url"),
            }
        )

    def fin_group(g: pa.Table) -> pa.Table:
        nid = g.column("node_id").to_numpy(zero_copy_only=False)
        is_idx = pc.is_valid(g.column("url")).to_numpy(zero_copy_only=False)
        b = int(g.column("db")[0].as_py())
        lo = b * per_bucket
        hi = min(lo + per_bucket, n)
        urls = np.empty(hi - lo, dtype=object)
        urls[nid[is_idx] - lo] = np.asarray(
            g.filter(pa.array(is_idx)).column("url").to_pylist(), dtype=object
        )
        ranks = np.zeros(hi - lo, dtype=np.float64)
        ranks[nid[~is_idx] - lo] = g.column("rank").to_numpy(zero_copy_only=False)[
            ~is_idx
        ]
        return pa.table(
            {
                "url": pa.array(urls.tolist(), pa.string()),
                "rank_ppb": pa.array(np.round(ranks * 1e9).astype(np.int64), pa.int64()),
            }
        )

    return (
        ranks_ds.map_batches(rank_fin_pad, batch_format="pyarrow", zero_copy_batch=True)
        .union(index_ds.map_batches(idx_fin_pad, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("db")
        .map_groups(fin_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# HITS


class _HitsShard:
    """Iteration-state actor for HITS: pins whole dst-buckets in TWO sort
    orders — (dst, src) for the authority update (per-dst runs, same as
    PageRank) and (bucket, src, dst) for the hub update. A src's edges
    span buckets, so hub sums are returned as PER-BUCKET partials keyed
    (bucket, src); the driver folds them in (src, bucket) order. Both
    stages are therefore independent of actor count and bucket→actor
    placement — bit-identical on any cluster size (cf. module
    docstring's _contrib_sums argument)."""

    def __init__(self, block_refs, per_bucket: int):
        import ray

        tables = [t for t in map(ray.get, block_refs) if "dst_id" in t.column_names]
        t = pa.concat_tables(tables) if tables else pa.table(
            {"src_id": pa.array([], pa.int64()), "dst_id": pa.array([], pa.int64())}
        )
        td = t.sort_by([("dst_id", "ascending"), ("src_id", "ascending")])
        self.dst = td.column("dst_id").to_numpy(zero_copy_only=False)
        self.src = td.column("src_id").to_numpy(zero_copy_only=False)
        bucket = self.dst // per_bucket
        order = np.lexsort((self.dst, self.src, bucket))
        self.h_dst = self.dst[order]
        self.h_src = self.src[order]
        self.h_bucket = bucket[order]

    def auth_partial(self, hub) -> tuple[np.ndarray, np.ndarray]:
        """Per-dst sums of hub[src] — dsts are unique to this actor."""
        if len(self.dst) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        c = hub[self.src]
        starts = np.flatnonzero(np.r_[True, np.diff(self.dst) != 0])
        return self.dst[starts], np.add.reduceat(c, starts)

    def hub_partial(self, auth) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-(bucket, src) sums of auth[dst] — partials, not totals."""
        if len(self.h_src) == 0:
            return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.float64),)
        c = auth[self.h_dst]
        run = np.r_[True, (np.diff(self.h_src) != 0) | (np.diff(self.h_bucket) != 0)]
        starts = np.flatnonzero(run)
        return (
            self.h_bucket[starts],
            self.h_src[starts],
            np.add.reduceat(c, starts),
        )


def _fold_hub_partials(
    n: int, buckets: np.ndarray, srcs: np.ndarray, sums: np.ndarray
) -> np.ndarray:
    """Fold per-(bucket, src) partials into a dense per-src vector,
    adding each src's partials in ascending BUCKET order — the pinned
    deterministic fold shared with :func:`hits_reference`."""
    hub = np.zeros(n, dtype=np.float64)
    if len(srcs) == 0:
        return hub
    order = np.lexsort((buckets, srcs))
    s_sorted = srcs[order]
    c_sorted = sums[order]
    starts = np.flatnonzero(np.r_[True, np.diff(s_sorted) != 0])
    hub[s_sorted[starts]] = np.add.reduceat(c_sorted, starts)
    return hub


def _hits_iterate(
    n: int,
    n_iters: int,
    auth_sums,  # callable(hub) -> (dst_ids, sums) with unique dst ids
    hub_parts,  # callable(auth) -> (buckets, srcs, partial_sums)
    per_bucket: int,
) -> tuple[np.ndarray, np.ndarray]:
    """The pinned HITS iteration the broadcast mode and the reference
    share: auth' = Σ hub over in-edges, L1-normalize; hub' = Σ auth'
    over out-edges, L1-normalize. Normalization totals come from the
    two-level :func:`_l1_total` tree so the shuffle mode (which computes
    bucket partials distributedly) is bit-identical too."""
    hub = np.full(n, 1.0 / n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(n_iters):
        d, s = auth_sums(hub)
        auth = np.zeros(n, dtype=np.float64)
        auth[d] = s
        tot = _l1_total(auth, per_bucket)
        if tot > 0:
            auth = auth / tot
        b, sr, ps = hub_parts(auth)
        hub = _fold_hub_partials(n, b, sr, ps)
        tot = _l1_total(hub, per_bucket)
        if tot > 0:
            hub = hub / tot
    return auth, hub


def hits(
    pages_ds,
    nodes,
    *,
    n_iters: int = _N_ITERS,
    mode: str = "auto",
    n_actors: int | None = None,
    n_buckets: int | None = None,
):
    """HITS hubs/authorities over the corpus link graph → Dataset of
    (url, auth_ppb, hub_ppb) (Kleinberg 1999; L1 normalization, pinned
    update order in :func:`_hits_iterate`).

    ``nodes`` is the node set as a Dataset with a distinct ``url``
    column. ``mode="broadcast"`` is the ≤``SHUFFLE_MODE_NODES`` regime
    (dst-bucketed edges pinned once into an actor pool; each iteration
    is one RPC round per direction with the O(nodes) score vector via
    ``ray.put``). ``mode="shuffle"`` keeps scores as Datasets — four
    bucketed exchanges per iteration (two per direction), per-task
    state one bucket slice, driver state two floats + O(buckets)
    partials. Determinism: per-bucket hub partials folded in bucket
    order and the two-level ``_l1_total`` normalization make the result
    bit-identical to :func:`hits_reference` at any actor count, any
    bucketing, either mode (test-asserted).
    """
    import ray
    import ray.data

    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"url": pa.array([], pa.string()),
                 "auth_ppb": pa.array([], pa.int64()),
                 "hub_ppb": pa.array([], pa.int64())}
            )
        )
    if mode == "auto":
        mode = "shuffle" if n > SHUFFLE_MODE_NODES else "broadcast"
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"mode must be 'auto', 'broadcast' or 'shuffle', got {mode!r}")
    per_bucket = (
        _graph_buckets(n) if n_buckets is None else max(1, -(-n // n_buckets))
    )

    if mode == "shuffle":
        nb = -(-n // per_bucket)
        # materialized ONCE with pinned block counts — reused by all four
        # exchanges of every iteration (see the same note in pagerank())
        index_ds = node_index(nodes)[0].repartition(nb, shuffle=False).materialize()
        pairs = _extracted(pages_ds).map_batches(
            _candidate_pairs_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        edges_b = (
            _edge_ids_shuffle(pairs, index_ds, per_bucket=per_bucket)
            .repartition(nb, shuffle=False)
            .materialize()
        )
        return _hits_shuffle(
            edges_b, index_ds, n=n, n_iters=n_iters, per_bucket=per_bucket
        )

    urls_ref = _sorted_urls_ref(nodes)
    edges_b = _bucketed_edge_ids(_edges_broadcast(pages_ds, urls_ref), urls_ref, per_bucket)
    block_refs = edges_b.to_arrow_refs()
    shard_cls = ray.remote(num_cpus=1)(_HitsShard)
    if n_actors is None:
        n_actors = max(1, min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))))
    actors = [
        shard_cls.remote(block_refs[i::n_actors], per_bucket) for i in range(n_actors)
    ]
    try:
        def auth_sums(hub):
            ref = ray.put(hub)
            parts = ray.get([a.auth_partial.remote(ref) for a in actors])
            d = np.concatenate([p[0] for p in parts])
            s = np.concatenate([p[1] for p in parts])
            return d, s  # dsts unique across actors (whole buckets)

        def hub_parts(auth):
            ref = ray.put(auth)
            parts = ray.get([a.hub_partial.remote(ref) for a in actors])
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )

        auth, hub = _hits_iterate(n, n_iters, auth_sums, hub_parts, per_bucket)
    finally:
        for a in actors:
            ray.kill(a)

    @ray.remote(num_cpus=1)
    def finish(urls_arr: pa.Array, a_vec: np.ndarray, h_vec: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "url": urls_arr,
                "auth_ppb": pa.array(np.round(a_vec * 1e9).astype(np.int64), pa.int64()),
                "hub_ppb": pa.array(np.round(h_vec * 1e9).astype(np.int64), pa.int64()),
            }
        )

    return ray.data.from_arrow_refs([finish.remote(urls_ref, auth, hub)])


def _hits_shuffle(edges_b, index_ds, *, n, n_iters, per_bucket):
    """Fully-distributed HITS: score state is sparse (node_id, val) row
    Datasets (absent rows = 0, matching the reference's zero-init) plus
    two driver scalars (the L1 totals). Four bucketed exchanges per
    iteration:

    - auth: (A) ``groupby(src_bucket)`` scatters normalized hub onto
      out-edges; (B) ``groupby(dst_bucket)`` does the per-dst
      ``reduceat`` AND emits its bucket's dense-slice ``np.sum`` as a
      marker row (node_id = -1-bucket) — the driver folds ≤O(buckets)
      markers with ``np.sum`` in bucket order, reproducing
      :func:`_l1_total` exactly.
    - hub: (C) ``groupby(dst_bucket)`` scatters normalized auth and
      emits per-(src, dst_bucket) partials; (D) ``groupby(src_bucket)``
      folds each src's partials in ascending dst-bucket order (the
      :func:`_fold_hub_partials` contract) + bucket-sum markers.

    Normalization is applied lazily (raw rows ÷ the driver scalar when
    a lookup or the final output is built) — the same single IEEE
    division the reference applies eagerly, so floats are bit-equal."""
    import ray.data

    nb = -(-n // per_bucket)

    def _score_pad(key_div: str):
        # score rows → (gb = node_id // per_bucket, src_id=-1, dst_id=node_id, c=val)
        def f(t: pa.Table) -> pa.Table:
            nid = t.column("node_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "gb": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                    "src_id": pa.array(np.full(len(nid), -1, np.int64), pa.int64()),
                    "dst_id": pa.array(nid, pa.int64()),
                    "c": t.column("val"),
                }
            )

        return f

    def _edge_pad(by: str):
        def f(t: pa.Table) -> pa.Table:
            key = t.column(by).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "gb": pa.array((key // per_bucket).astype(np.int64), pa.int64()),
                    "src_id": t.column("src_id"),
                    "dst_id": t.column("dst_id"),
                    "c": pa.array(np.full(len(key), np.nan), pa.float64()),
                }
            )

        return f

    def _bucket_totals(score_ds) -> float:
        """Fold the marker rows (node_id = -1-bucket, val = bucket sum)
        into the pinned two-level L1 total."""
        rows = score_ds.map_batches(
            lambda t: t.filter(pc.less(t.column("node_id"), 0)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
        parts = np.zeros(nb, dtype=np.float64)
        for r in rows:
            parts[-(int(r["node_id"]) + 1)] = r["val"]
        return float(np.sum(parts))

    def _drop_markers(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("node_id"), 0))

    # initial hub: 1/n for every node, tot=1.0 (x/1.0 is bit-exact x)
    h0 = 1.0 / n
    hub_ds = index_ds.map_batches(
        lambda t: pa.table(
            {
                "node_id": t.column("node_id"),
                "val": pa.array(np.full(t.num_rows, h0), pa.float64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).repartition(nb, shuffle=False).materialize()
    tot_h = 1.0
    auth_ds = None
    tot_a = 1.0

    for _ in range(n_iters):
        # ---- auth update -------------------------------------------------
        div_h = tot_h if tot_h > 0 else 1.0

        def scatter_hub(g: pa.Table, _div=div_h) -> pa.Table:
            src = g.column("src_id").to_numpy(zero_copy_only=False)
            dst = g.column("dst_id").to_numpy(zero_copy_only=False)
            c = g.column("c").to_numpy(zero_copy_only=False)
            is_score = src < 0
            b = int(g.column("gb")[0].as_py())
            lo = b * per_bucket
            hi = min(lo + per_bucket, n)
            lookup = np.zeros(hi - lo, dtype=np.float64)
            lookup[dst[is_score] - lo] = c[is_score] / _div
            e_src = src[~is_score]
            e_dst = dst[~is_score]
            return pa.table(
                {
                    "gb": pa.array((e_dst // per_bucket).astype(np.int64), pa.int64()),
                    "dst_id": pa.array(e_dst, pa.int64()),
                    "src_id": pa.array(e_src, pa.int64()),
                    "c": pa.array(lookup[e_src - lo], pa.float64()),
                }
            )

        def reduce_auth(g: pa.Table) -> pa.Table:
            dst = g.column("dst_id").to_numpy(zero_copy_only=False)
            src = g.column("src_id").to_numpy(zero_copy_only=False)
            c = g.column("c").to_numpy(zero_copy_only=False)
            b = int(g.column("gb")[0].as_py())
            lo = b * per_bucket
            hi = min(lo + per_bucket, n)
            order = np.lexsort((src, dst))
            dst = dst[order]
            c = c[order]
            starts = np.flatnonzero(np.r_[True, np.diff(dst) != 0])
            sums = np.add.reduceat(c, starts)
            dense = np.zeros(hi - lo, dtype=np.float64)
            dense[dst[starts] - lo] = sums
            bsum = np.sum(dense)
            return pa.table(
                {
                    "node_id": pa.array(
                        np.r_[dst[starts], np.int64(-1 - b)], pa.int64()
                    ),
                    "val": pa.array(np.r_[sums, bsum], pa.float64()),
                }
            )

        auth_ds = (
            hub_ds.map_batches(
                _score_pad("src"), batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                edges_b.map_batches(
                    _edge_pad("src_id"), batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("gb")
            .map_groups(scatter_hub, batch_format="pyarrow")
            .groupby("gb")
            .map_groups(reduce_auth, batch_format="pyarrow")
            # pin to O(buckets) blocks so the next exchange's Sort (whose
            # output-partition count and driver metadata track input block
            # count) cannot compound across iterations
            .repartition(nb, shuffle=False)
            .materialize()
        )
        tot_a = _bucket_totals(auth_ds)
        auth_ds = auth_ds.map_batches(
            _drop_markers, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        # ---- hub update ----------------------------------------------------
        div_a = tot_a if tot_a > 0 else 1.0

        def scatter_auth(g: pa.Table, _div=div_a) -> pa.Table:
            src = g.column("src_id").to_numpy(zero_copy_only=False)
            dst = g.column("dst_id").to_numpy(zero_copy_only=False)
            c = g.column("c").to_numpy(zero_copy_only=False)
            is_score = src < 0
            b = int(g.column("gb")[0].as_py())
            lo = b * per_bucket
            hi = min(lo + per_bucket, n)
            lookup = np.zeros(hi - lo, dtype=np.float64)
            lookup[dst[is_score] - lo] = c[is_score] / _div
            e_src = src[~is_score]
            e_dst = dst[~is_score]
            # per-(src, THIS dst bucket) partials: (src, dst)-sorted reduceat
            if len(e_src) == 0:
                return pa.table(
                    {
                        "gb": pa.array([], pa.int64()),
                        "src_id": pa.array([], pa.int64()),
                        "db": pa.array([], pa.int64()),
                        "part": pa.array([], pa.float64()),
                    }
                )
            order = np.lexsort((e_dst, e_src))
            e_src = e_src[order]
            e_dst = e_dst[order]
            vals = lookup[e_dst - lo]
            starts = np.flatnonzero(np.r_[True, np.diff(e_src) != 0])
            parts = np.add.reduceat(vals, starts)
            srcs = e_src[starts]
            return pa.table(
                {
                    "gb": pa.array((srcs // per_bucket).astype(np.int64), pa.int64()),
                    "src_id": pa.array(srcs, pa.int64()),
                    "db": pa.array(np.full(len(srcs), b, np.int64), pa.int64()),
                    "part": pa.array(parts, pa.float64()),
                }
            )

        def fold_hub(g: pa.Table) -> pa.Table:
            srcs = g.column("src_id").to_numpy(zero_copy_only=False)
            dbs = g.column("db").to_numpy(zero_copy_only=False)
            parts = g.column("part").to_numpy(zero_copy_only=False)
            b = int(g.column("gb")[0].as_py())
            lo = b * per_bucket
            hi = min(lo + per_bucket, n)
            order = np.lexsort((dbs, srcs))
            s_sorted = srcs[order]
            p_sorted = parts[order]
            starts = np.flatnonzero(np.r_[True, np.diff(s_sorted) != 0])
            sums = np.add.reduceat(p_sorted, starts)
            dense = np.zeros(hi - lo, dtype=np.float64)
            dense[s_sorted[starts] - lo] = sums
            bsum = np.sum(dense)
            return pa.table(
                {
                    "node_id": pa.array(
                        np.r_[s_sorted[starts], np.int64(-1 - b)], pa.int64()
                    ),
                    "val": pa.array(np.r_[sums, bsum], pa.float64()),
                }
            )

        hub_ds = (
            auth_ds.map_batches(
                _score_pad("dst"), batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                edges_b.map_batches(
                    _edge_pad("dst_id"), batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("gb")
            .map_groups(scatter_auth, batch_format="pyarrow")
            .groupby("gb")
            .map_groups(fold_hub, batch_format="pyarrow")
            .repartition(nb, shuffle=False)
            .materialize()
        )
        tot_h = _bucket_totals(hub_ds)
        hub_ds = hub_ds.map_batches(
            _drop_markers, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    # ---- finish: dense (url, auth_ppb, hub_ppb) per bucket ----------------
    div_a = tot_a if tot_a > 0 else 1.0
    div_h = tot_h if tot_h > 0 else 1.0

    def pad_score(which: str):
        def f(t: pa.Table) -> pa.Table:
            nid = t.column("node_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "db": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                    "node_id": t.column("node_id"),
                    "val": t.column("val"),
                    "which": pa.array([which] * len(nid), pa.string()),
                    "url": pa.array([None] * len(nid), pa.string()),
                }
            )

        return f

    def pad_idx(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array((nid // per_bucket).astype(np.int64), pa.int64()),
                "node_id": t.column("node_id"),
                "val": pa.array(np.full(len(nid), np.nan), pa.float64()),
                "which": pa.array(["u"] * len(nid), pa.string()),
                "url": t.column("url"),
            }
        )

    def fin_group(g: pa.Table) -> pa.Table:
        nid = g.column("node_id").to_numpy(zero_copy_only=False)
        which = g.column("which").to_pylist()
        val = g.column("val").to_numpy(zero_copy_only=False)
        b = int(g.column("db")[0].as_py())
        lo = b * per_bucket
        hi = min(lo + per_bucket, n)
        urls = np.empty(hi - lo, dtype=object)
        a_dense = np.zeros(hi - lo, dtype=np.float64)
        h_dense = np.zeros(hi - lo, dtype=np.float64)
        w = np.asarray(which, dtype=object)
        is_u = w == "u"
        is_a = w == "a"
        is_h = w == "h"
        urls[nid[is_u] - lo] = np.asarray(
            g.filter(pa.array(is_u)).column("url").to_pylist(), dtype=object
        )
        a_dense[nid[is_a] - lo] = val[is_a]
        h_dense[nid[is_h] - lo] = val[is_h]
        a_norm = a_dense / div_a
        h_norm = h_dense / div_h
        return pa.table(
            {
                "url": pa.array(urls.tolist(), pa.string()),
                "auth_ppb": pa.array(
                    np.round(a_norm * 1e9).astype(np.int64), pa.int64()
                ),
                "hub_ppb": pa.array(
                    np.round(h_norm * 1e9).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        auth_ds.map_batches(pad_score("a"), batch_format="pyarrow", zero_copy_batch=True)
        .union(
            hub_ds.map_batches(pad_score("h"), batch_format="pyarrow", zero_copy_batch=True)
        )
        .union(index_ds.map_batches(pad_idx, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("db")
        .map_groups(fin_group, batch_format="pyarrow")
    )


def hits_reference(
    urls: list[str],
    links_per_url: dict[str, list[str]],
    *,
    n_iters: int = _N_ITERS,
) -> pa.Table:
    """Single-process HITS oracle — same edges, same per-bucket partial
    fold, same two-level L1 totals, no Ray. Returns
    (url, auth_ppb, hub_ppb) sorted by url."""
    urls_sorted = sorted(urls)
    n = len(urls_sorted)
    if n == 0:
        return pa.table(
            {"url": pa.array([], pa.string()),
             "auth_ppb": pa.array([], pa.int64()),
             "hub_ppb": pa.array([], pa.int64())}
        )
    idx = {u: i for i, u in enumerate(urls_sorted)}
    node_set = set(urls_sorted)
    pairs = {
        (idx[u], idx[l])
        for u, links in links_per_url.items()
        for l in links
        if l in node_set and l != u
    }
    if pairs:
        e = np.array(sorted(pairs, key=lambda p: (p[1], p[0])), dtype=np.int64)
        src, dst = e[:, 0], e[:, 1]
    else:
        src = dst = np.empty(0, np.int64)
    per_bucket = _graph_buckets(n)
    bucket = dst // per_bucket
    h_order = np.lexsort((dst, src, bucket))
    h_src, h_dst, h_bucket = src[h_order], dst[h_order], bucket[h_order]

    def auth_sums(hub):
        if len(dst) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        starts = np.flatnonzero(np.r_[True, np.diff(dst) != 0])
        return dst[starts], np.add.reduceat(hub[src], starts)

    def hub_parts(auth):
        if len(h_src) == 0:
            return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.float64),)
        run = np.r_[True, (np.diff(h_src) != 0) | (np.diff(h_bucket) != 0)]
        starts = np.flatnonzero(run)
        return h_bucket[starts], h_src[starts], np.add.reduceat(auth[h_dst], starts)

    auth, hub = _hits_iterate(n, n_iters, auth_sums, hub_parts, per_bucket)
    return pa.table(
        {
            "url": pa.array(urls_sorted, pa.string()),
            "auth_ppb": pa.array(np.round(auth * 1e9).astype(np.int64), pa.int64()),
            "hub_ppb": pa.array(np.round(hub * 1e9).astype(np.int64), pa.int64()),
        }
    )


def pagerank_reference(
    urls: list[str],
    links_per_url: dict[str, list[str]],
    *,
    n_iters: int = _N_ITERS,
    damping: float = _DAMPING,
    seed_urls: list[str] | None = None,
) -> dict[str, int]:
    """Single-process oracle: same graph semantics, same deterministic
    summation primitive, no Ray. Used by expected.py to materialize the
    pagerank ground truth the DuckDB oracle reads. With ``seed_urls``
    this is the TrustRank personalization (Gyöngyi et al. 2004):
    teleport mass lands only on the seed set — p_v = 1/|S| on seeds,
    0 elsewhere — instead of uniformly."""
    urls_sorted = sorted(urls)
    n = len(urls_sorted)
    if n == 0:
        return {}
    idx = {u: i for i, u in enumerate(urls_sorted)}
    node_set = set(urls_sorted)
    pairs = set()
    for u, links in links_per_url.items():
        for link in links:
            if link in node_set and link != u:
                pairs.add((idx[u], idx[link]))
    if pairs:
        edges = np.array(sorted(pairs, key=lambda p: (p[1], p[0])), dtype=np.int64)
        src, dst = edges[:, 0], edges[:, 1]
    else:
        src = dst = np.empty(0, np.int64)
    out = np.bincount(src, minlength=n).astype(np.int64)
    inv_out = np.zeros(n, dtype=np.float64)
    inv_out[out > 0] = 1.0 / out[out > 0]
    if seed_urls is None:
        # pinned float path of the uniform ground truth: ONE division
        base_vec = np.full(n, (1.0 - damping) / n, dtype=np.float64)
        ranks = np.full(n, 1.0 / n, dtype=np.float64)
    else:
        ss = sorted(set(seed_urls))
        missing = [s for s in ss if s not in idx]
        if missing or not ss:
            raise ValueError(f"seed_urls not in node set: {missing[:3]}")
        p = np.zeros(n, dtype=np.float64)
        p[[idx[s] for s in ss]] = 1.0 / len(ss)
        # pinned: teleport entries are the ONE division (1-d)/|S|
        base_vec = np.zeros(n, dtype=np.float64)
        base_vec[p > 0] = (1.0 - damping) / len(ss)
        ranks = p.copy()
    for _ in range(n_iters):
        d, s = _contrib_sums(dst, src, ranks, inv_out)
        new = base_vec.copy()
        np.add.at(new, d, damping * s)
        ranks = new
    q = np.round(ranks * 1e9).astype(np.int64)
    return {u: int(q[i]) for i, u in enumerate(urls_sorted)}


def anchor_text_index(pairs_ds, *, dst_col: str = "dst", anchor_col: str = "anchor"):
    """Aggregated anchor-text signal per target URL — the classic web-corpus
    "anchor index" (inbound link text is a relevance/label signal): for each
    ``dst``, total references, distinct anchor strings, and the most frequent
    anchor (ties broken lexicographically, so the result is deterministic at
    any parallelism).

    Shape: per-batch Arrow hash-agg collapses each batch to its distinct
    (dst, anchor) pairs with partial counts — a hot target referenced by the
    same text everywhere ships one row per batch, never one per link — then
    ONE ``groupby(dst)`` folds each target's little histogram vectorized.
    Nothing lands on the driver; per-key work is the target's distinct
    anchor count. Beyond-reference operator (the reference stores raw hrefs
    only, parser.go:120-208)."""

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select([dst_col, anchor_col])
            .group_by([dst_col, anchor_col])
            .aggregate([([], "count_all")])
            .rename_columns([dst_col, anchor_col, "partial"])
        )

    def fold(g: pa.Table) -> pa.Table:
        merged = (
            g.select([anchor_col, "partial"])
            .group_by(anchor_col)
            .aggregate([("partial", "sum")])
        )
        anchors = np.asarray(merged.column(anchor_col).to_pylist(), dtype=object)
        cnts = merged.column("partial_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        top = np.lexsort((anchors, -cnts))[0]
        return pa.table(
            {
                dst_col: g.column(dst_col).slice(0, 1),
                "n_refs": pa.array([int(cnts.sum())], pa.int64()),
                "n_unique_anchors": pa.array([len(cnts)], pa.int64()),
                "top_anchor": pa.array([str(anchors[top])], pa.string()),
                "top_anchor_count": pa.array([int(cnts[top])], pa.int64()),
            }
        )

    return (
        pairs_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(dst_col)
        .map_groups(fold, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# triangle counting / clustering coefficient

_TRI_SEP = "\x01"


def _tri_bucket(col, n_buckets: int) -> pa.Array:
    from .sketch import hash64_column

    return pa.array(
        (hash64_column(col) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
    )


def _tri_run_pairs(run_starts: np.ndarray, run_lens: np.ndarray):
    """All within-run unordered index pairs (i < j), vectorized per
    DISTINCT run length: one ``np.triu_indices`` per distinct degree,
    broadcast over every run of that length — the Python loop is over
    O(√m) distinct degrees, never over runs or pairs."""
    out_i, out_j = [], []
    for d in np.unique(run_lens):
        if d < 2:
            continue
        sel = run_starts[run_lens == d]
        ti, tj = np.triu_indices(int(d), k=1)
        out_i.append((sel[:, None] + ti[None, :]).ravel())
        out_j.append((sel[:, None] + tj[None, :]).ravel())
    if not out_i:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(out_i), np.concatenate(out_j)


def _tri_base(edges, nodes, n_buckets: int):
    """Shared stages of the degree-ordered triangle machinery, reused by
    :func:`triangle_counts` (per-node counts) and :func:`edge_jaccard`
    (per-edge common-neighbor counts): undirected distinct edges, degree
    fold, fused degree attach, (deg, url)-orientation, wedge generation
    and the wedge∪edge closing union. Returns ``(und, deg, oriented,
    closing)`` — ``und``/``deg``/``oriented`` materialized (each is
    consumed by more than one downstream stage), ``closing`` lazy.

    ``oriented`` carries BOTH endpoint degrees (u, v, deg_u, deg_v, ubk)
    so consumers needing per-edge degrees never re-run the attach
    exchange.
    """

    # -- stage A: undirected distinct edges (one exchange) ------------------
    def undirect(t: pa.Table) -> pa.Table:
        src, dst = t.column("src"), t.column("dst")
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        lt = pc.less(src, dst)
        a = pc.if_else(lt, src, dst)
        b = pc.if_else(lt, dst, src)
        key = pc.binary_join_element_wise(a, b, _TRI_SEP)
        return pa.table(
            {"a": a, "b": b, "ebk": _tri_bucket(key, n_buckets)}
        )

    def dedup_ab(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
        d = g.select(["a", "b"]).group_by(["a", "b"]).aggregate([])
        return d

    und = (
        edges.map_batches(undirect, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ebk")
        .map_groups(dedup_ab, batch_format="pyarrow")
        .materialize()  # reused by degree, attach and closing stages
    )

    # -- stage B: undirected degrees (one exchange, partial-agg'd) ---------
    def deg_partials(t: pa.Table) -> pa.Table:
        both = pa.table(
            {"url": pa.concat_arrays([_ca(t.column("a")), _ca(t.column("b"))])}
        )
        p = both.group_by(["url"]).aggregate([([], "count_all")])
        return p.rename_columns(["url", "dpart"])

    def node_zeros(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "dpart": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            }
        )

    deg = (
        und.map_batches(deg_partials, batch_format="pyarrow", zero_copy_batch=True)
        .union(nodes.map_batches(node_zeros, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("url")
        .sum("dpart")
        .map_batches(
            lambda t: t.rename_columns(["url", "deg"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    # -- stage C: fused degree attach + orientation (two exchanges) --------
    def edge_halves(t: pa.Table) -> pa.Table:
        # each edge enters twice: keyed by a (side 1) and by b (side 2)
        a, b = _ca(t.column("a")), _ca(t.column("b"))
        return pa.table(
            {
                "key": pa.concat_arrays([a, b]),
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([b, b]),
                "side": pa.array(
                    np.concatenate(
                        [np.ones(len(a), np.int8), np.full(len(b), 2, np.int8)]
                    ),
                    pa.int8(),
                ),
                "kbk": _tri_bucket(pa.concat_arrays([a, b]), n_buckets),
            }
        )

    def deg_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("url"),
                "a": t.column("url"),
                "b": pa.nulls(t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "kbk": _tri_bucket(t.column("url"), n_buckets),
                "deg": t.column("deg"),
            }
        )

    halves = und.map_batches(
        edge_halves, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: t.append_column("deg", pa.nulls(t.num_rows, pa.int64())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    unioned = halves.union(
        deg.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        dmask = side == 0
        dkeys = _ca(g.column("key").filter(pa.array(dmask)))
        dvals = (
            g.column("deg")
            .filter(pa.array(dmask))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        e = g.filter(pa.array(~dmask))
        pos = pc.index_in(e.column("key"), value_set=dkeys)
        got = dvals[pos.to_numpy(zero_copy_only=False).astype(np.int64)]
        es = e.column("side").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": e.column("a"),
                "b": e.column("b"),
                "deg_a_p": pa.array(np.where(es == 1, got, 0), pa.int64()),
                "deg_b_p": pa.array(np.where(es == 2, got, 0), pa.int64()),
            }
        )

    attached = (
        unioned.groupby("kbk")
        .map_groups(attach, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum(["deg_a_p", "deg_b_p"])
        .map_batches(
            lambda t: t.rename_columns(["a", "b", "deg_a", "deg_b"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    # -- orient: u → v from lower (deg, url) to higher ----------------------
    def orient(t: pa.Table) -> pa.Table:
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_lt = pc.less(t.column("a"), t.column("b")).to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & a_lt)
        af = pa.array(a_first)
        u = pc.if_else(af, t.column("a"), t.column("b"))
        v = pc.if_else(af, t.column("b"), t.column("a"))
        du = np.where(a_first, da, db).astype(np.int64)
        dv = np.where(a_first, db, da).astype(np.int64)
        return pa.table(
            {
                "u": u,
                "v": v,
                "deg_u": pa.array(du, pa.int64()),
                "deg_v": pa.array(dv, pa.int64()),
                "ubk": _tri_bucket(u, n_buckets),
            }
        )

    oriented = attached.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # -- stage D: adjacency grouping → wedge generation (one exchange) -----
    def wedges(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table(
            {
                "key": pa.array([], pa.string()),
                "apex": pa.array([], pa.string()),
            }
        )
        if not n:
            return empty
        order = pc.sort_indices(
            g, sort_keys=[("u", "ascending"), ("deg_v", "ascending"), ("v", "ascending")]
        )
        u_s = _ca(g.column("u")).take(order)
        v_s = _ca(g.column("v")).take(order)
        starts = np.flatnonzero(_tri_run_starts(u_s))
        lens = np.diff(np.append(starts, n))
        i_idx, j_idx = _tri_run_pairs(starts, lens)
        if not len(i_idx):
            return empty
        x = v_s.take(pa.array(i_idx, pa.int64()))
        y = v_s.take(pa.array(j_idx, pa.int64()))
        apex = u_s.take(pa.array(i_idx, pa.int64()))
        # (x, y) is already canonical: neighbors sorted by (deg, url) is
        # exactly the edge-orientation order, so the closing edge is x→y.
        # Only (key, apex) cross the exchange — x/y are recovered from the
        # key after the close, keeping the widest exchange ~40% narrower.
        key = pc.binary_join_element_wise(x, y, _TRI_SEP)
        return pa.table({"key": key, "apex": apex})

    wedge_rows = (
        oriented.groupby("ubk")
        .map_groups(wedges, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("wbk", _tri_bucket(t.column("key"), n_buckets)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t.column("u"), t.column("v"), _TRI_SEP)
        return pa.table(
            {
                "key": key,
                "apex": pa.nulls(t.num_rows, pa.string()),
                "wbk": _tri_bucket(key, n_buckets),
            }
        )

    closing = wedge_rows.union(
        oriented.map_batches(edge_keys, batch_format="pyarrow", zero_copy_batch=True)
    )
    return und, deg, oriented, closing


def triangle_counts(
    pages_ds,
    nodes,
    *,
    membership: str = "auto",
    n_buckets: int = _MAP_BUCKETS,
):
    """Per-node triangle participation + local clustering coefficient over
    the undirected corpus link graph → (url, n_tri, deg, clustering_ppb).

    The classic degree-ordered formulation (node-iterator++ / the GraphX
    triangleCount shape): orient every undirected edge from its lower
    (degree, url) endpoint to the higher, enumerate wedges only at each
    node's ORIENTED out-neighborhood — whose size is O(√m) by the
    degree-ordering bound, so hub nodes cannot explode the wedge set —
    and close each wedge against the oriented edge set. Each triangle is
    found exactly once (at its unique (deg, url)-minimal apex).

    Every stage is a bucketed exchange (groupby(hash % B), never one
    group per key): undirected dedup, degree sum, one FUSED degree
    attach (each edge enters twice, recombined by an exact int64
    hash-agg — the collocations pattern), adjacency grouping + wedge
    generation, wedge⋈edge closing, and the final per-node fold. Inside
    buckets everything is Arrow sorts + run-boundary numpy; the wedge
    pair generation vectorizes per distinct degree (``_tri_run_pairs``).

    ``clustering_ppb = (2·n_tri·10^9) // (deg·(deg−1))`` — integer floor
    division, mirrored exactly by SQL ``//`` (documented int64 bound:
    per-node n_tri < 4.6·10^9; beyond that carry the division in Python
    ints). Dangling nodes keep (0, 0, 0) rows.
    """
    edges = build_edges(pages_ds, nodes, membership=membership, n_buckets=n_buckets)
    _und, deg, _oriented, closing = _tri_base(edges, nodes, n_buckets)

    # -- stage E: close wedges against edges (one exchange) ----------------
    def close(g: pa.Table) -> pa.Table:
        is_edge = pc.is_null(g.column("apex"))
        ekeys = _ca(g.column("key").filter(is_edge))
        w = g.filter(pc.invert(is_edge))
        if not w.num_rows or not len(ekeys):
            return pa.table({"url": pa.array([], pa.string()), "tpart": pa.array([], pa.int64())})
        hit = pc.is_in(w.column("key"), value_set=ekeys)
        tri = w.filter(hit)
        parts = pc.split_pattern(_ca(tri.column("key")), _TRI_SEP)
        xy = pc.list_flatten(parts)
        urls = pa.concat_arrays([_ca(tri.column("apex")), _ca(xy)])
        p = pa.table({"url": urls}).group_by(["url"]).aggregate([([], "count_all")])
        return p.rename_columns(["url", "tpart"])

    tri_parts = closing.groupby("wbk").map_groups(close, batch_format="pyarrow")

    # -- stage F: per-node fold + clustering coefficient (one exchange) ----
    def tri_pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "tpart": t.column("tpart").cast(pa.int64()),
                "dpart": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            }
        )

    def deg_pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "tpart": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "dpart": t.column("deg"),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        tri = t.column("sum(tpart)").to_numpy(zero_copy_only=False).astype(np.int64)
        dg = t.column("sum(dpart)").to_numpy(zero_copy_only=False).astype(np.int64)
        denom = dg * (dg - 1)
        ppb = np.where(denom >= 2, (2 * tri * 1_000_000_000) // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "url": t.column("url"),
                "n_tri": pa.array(tri, pa.int64()),
                "deg": pa.array(dg, pa.int64()),
                "clustering_ppb": pa.array(ppb.astype(np.int64), pa.int64()),
            }
        )

    return (
        tri_parts.map_batches(tri_pad, batch_format="pyarrow", zero_copy_batch=True)
        .union(deg.map_batches(deg_pad, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("url")
        .sum(["tpart", "dpart"])
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def edge_jaccard(
    pages_ds,
    nodes,
    *,
    membership: str = "auto",
    n_buckets: int = _MAP_BUCKETS,
):
    """Per-edge common-neighbor counts + neighbor-set Jaccard over the
    undirected corpus link graph → (a, b, common, deg_a, deg_b,
    jaccard_ppb), one row per distinct undirected edge (a < b) — the
    classic link-prediction / related-page similarity signal.

    ``common = |N(a) ∩ N(b)|`` is exactly the number of triangles through
    the edge, so it reuses the degree-ordered wedge machinery of
    :func:`triangle_counts` (:func:`_tri_base`): each closed wedge
    (apex u, closing edge x→y) is one triangle {u, x, y}, and the close
    stage credits all THREE of its edges (lexicographically canonicalized)
    instead of its three nodes. ``|N(a) ∪ N(b)| = deg_a + deg_b − common``
    (a and b are in each other's neighbor sets but never in the loop-free
    intersection), giving ``jaccard_ppb = common·10⁹ // (deg_a + deg_b −
    common)`` — integer floor division mirrored exactly by the SQL oracle.

    Scale shape: identical to triangle_counts (every stage a bucketed
    exchange, wedge sets O(√m) per node by degree ordering); per-edge
    degrees ride along on the materialized oriented edge set, so the
    final fold is one union + one (a, b) hash-agg with no extra attach
    exchange. Zero-triangle edges keep common = 0 rows via the oriented
    pad.
    """
    edges = build_edges(pages_ds, nodes, membership=membership, n_buckets=n_buckets)
    _und, _deg, oriented, closing = _tri_base(edges, nodes, n_buckets)

    # -- close wedges against edges, crediting edges not nodes -------------
    def close_edges(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "cpart": pa.array([], pa.int64()),
            }
        )
        is_edge = pc.is_null(g.column("apex"))
        ekeys = _ca(g.column("key").filter(is_edge))
        w = g.filter(pc.invert(is_edge))
        if not w.num_rows or not len(ekeys):
            return empty
        tri = w.filter(pc.is_in(w.column("key"), value_set=ekeys))
        if not tri.num_rows:
            return empty
        parts = pc.split_pattern(_ca(tri.column("key")), _TRI_SEP)
        x = _ca(pc.list_element(parts, 0))
        y = _ca(pc.list_element(parts, 1))
        apex = _ca(tri.column("apex"))
        lo, hi = [], []
        for p, q in ((apex, x), (apex, y), (x, y)):
            lt = pc.less(p, q)
            lo.append(_ca(pc.if_else(lt, p, q)))
            hi.append(_ca(pc.if_else(lt, q, p)))
        per_edge = (
            pa.table({"a": pa.concat_arrays(lo), "b": pa.concat_arrays(hi)})
            .group_by(["a", "b"])
            .aggregate([([], "count_all")])
        )
        return per_edge.rename_columns(["a", "b", "cpart"])

    tri_edges = closing.groupby("wbk").map_groups(close_edges, batch_format="pyarrow")

    # -- final fold: triangle credits ∪ per-edge degree pad → one hash-agg --
    def tri_pad(t: pa.Table) -> pa.Table:
        zeros = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "cpart": t.column("cpart").cast(pa.int64()),
                "dap": zeros,
                "dbp": zeros,
            }
        )

    def deg_pad(t: pa.Table) -> pa.Table:
        # oriented (u, v, deg_u, deg_v) → lexicographic (a, b) with degrees
        # swapped alongside; one row per undirected edge already
        lt = pc.less(t.column("u"), t.column("v"))
        ltn = lt.to_numpy(zero_copy_only=False)
        du = t.column("deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("deg_v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pc.if_else(lt, t.column("u"), t.column("v")),
                "b": pc.if_else(lt, t.column("v"), t.column("u")),
                "cpart": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "dap": pa.array(np.where(ltn, du, dv).astype(np.int64), pa.int64()),
                "dbp": pa.array(np.where(ltn, dv, du).astype(np.int64), pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        c = t.column("sum(cpart)").to_numpy(zero_copy_only=False).astype(np.int64)
        da = t.column("sum(dap)").to_numpy(zero_copy_only=False).astype(np.int64)
        db = t.column("sum(dbp)").to_numpy(zero_copy_only=False).astype(np.int64)
        denom = da + db - c
        ppb = np.where(denom > 0, (c * 1_000_000_000) // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "common": pa.array(c, pa.int64()),
                "deg_a": pa.array(da, pa.int64()),
                "deg_b": pa.array(db, pa.int64()),
                "jaccard_ppb": pa.array(ppb.astype(np.int64), pa.int64()),
            }
        )

    return (
        tri_edges.map_batches(tri_pad, batch_format="pyarrow", zero_copy_batch=True)
        .union(oriented.map_batches(deg_pad, batch_format="pyarrow", zero_copy_batch=True))
        .groupby(["a", "b"])
        .sum(["cpart", "dap", "dbp"])
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def _ca(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _tri_run_starts(sorted_arr: pa.Array) -> np.ndarray:
    n = len(sorted_arr)
    starts = np.ones(n, dtype=bool)
    if n > 1:
        starts[1:] = pc.not_equal(
            sorted_arr.slice(1), sorted_arr.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    return starts


# ---------------------------------------------------------------------------
# multi-source BFS distances


def bfs_distances(pages_ds, nodes, seeds, *, radius=None, mode="auto", n_buckets=64):
    """Minimum link-hop distance from any seed, as (url, dist) rows.

    The graph-analytics analog of the crawler's depth-limited wave loop
    (reference crawler.go depth semantics, M4): dist d = the BFS wave a
    page would be reached in if every in-corpus link were followed (no
    same-domain / robots gating — that is the crawl engine's job).
    ``radius`` bounds exploration like ``--max-depth`` bounds the crawl;
    ``None`` runs to fixpoint. Seeds are settled at dist 0 as given,
    exactly as the crawl engine takes its seed list.

    Two regimes, the graph family's standard split (both produce the
    identical (url, dist) set — test-pinned):

    - **broadcast** (``n ≤ SHUFFLE_MODE_NODES``): frontier and settled
      sets live as sorted Arrow arrays in the object store (the driver
      holds ObjectRefs and one int per round). Each round is ONE
      map_batches pass over the materialized edge Dataset (vectorized
      ``pc.is_in`` probes against frontier + settled) plus ONE remote
      fold task that dedups candidates and advances the settled array —
      the same O(nodes) single-object bound as pagerank's rank vector.
      Per-round frontier tables stay in the object store;
      ``from_arrow_refs`` assembles the result without driver
      materialization.
    - **shuffle** (above it): no O(nodes) object anywhere. Each round is
      two bucketed exchanges, the crawl engine's admit→claim split over
      a pre-built edge Dataset: (1) scatter — frontier ∪ edge rows
      keyed ``hash(src) % B``, in-group ``is_in`` emits the frontier's
      out-neighborhood; (2) claim — candidate ∪ settled rows keyed
      ``hash(url) % B``, in-group anti-join keeps first discoveries.
      Settled state stays a Dataset (union of materialized per-round
      frontiers); the claim exchange re-ships it each round — O(settled)
      rows, the stateless tradeoff vs the crawl engine's actor-sharded
      seen set (state/seen.py), which is the high-churn alternative.

    With a bounded radius both regimes and the recursive-CTE oracle do
    the same O(radius · reach) edge-probing work.
    """
    n = nodes.count()
    edges_b = build_edges(pages_ds, nodes).materialize()
    seed_urls = sorted(set(seeds))
    if _resolve_membership(mode, n) == "broadcast":
        return _bfs_broadcast(edges_b, seed_urls, radius)
    return _bfs_shuffle(edges_b, seed_urls, radius, n_buckets)


def _bfs_broadcast(edges_b, seed_urls, radius):
    import ray
    import ray.data

    @ray.remote(num_cpus=1)
    def fold(settled, d, *cand_tables):
        """Dedup candidate dsts across blocks, drop settled, advance both
        arrays. Returns (frontier_table, frontier_array, new_settled, n_new)."""
        parts = [_ca(t.column("url")) for t in cand_tables if t.num_rows]
        if parts:
            cand = pc.unique(pa.concat_arrays(parts))
            new = pc.filter(cand, pc.invert(pc.is_in(cand, value_set=settled)))
            new = new.take(pc.array_sort_indices(new))
        else:
            new = pa.array([], pa.string())
        tbl = pa.table(
            {
                "url": new,
                "dist": pa.array(np.full(len(new), d, np.int64), pa.int64()),
            }
        )
        merged = pa.concat_arrays([_ca(settled), new])
        merged = merged.take(pc.array_sort_indices(merged))
        return tbl, new, merged, len(new)

    seed_arr = pa.array(seed_urls, pa.string())
    settled_ref = ray.put(seed_arr)
    f0 = pa.table(
        {
            "url": seed_arr,
            "dist": pa.array(np.zeros(len(seed_urls), np.int64), pa.int64()),
        }
    )
    frontier_ref = ray.put(seed_arr)
    table_refs = [ray.put(f0)]

    d = 0
    while radius is None or d < radius:
        d += 1
        fr, sr = frontier_ref, settled_ref

        def probe(t: pa.Table, _fr=fr, _sr=sr) -> pa.Table:
            import ray as _ray

            front = _ray.get(_fr)
            keep = pc.is_in(t.column("src"), value_set=front)
            dst = pc.unique(_ca(pc.filter(t.column("dst"), keep)))
            dst = pc.filter(dst, pc.invert(pc.is_in(dst, value_set=_ray.get(_sr))))
            return pa.table({"url": dst})

        cand = edges_b.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        tbl_ref, frontier_ref, settled_ref, n_new_ref = fold.options(
            num_returns=4
        ).remote(settled_ref, d, *cand.to_arrow_refs())
        if ray.get(n_new_ref) == 0:
            break
        table_refs.append(tbl_ref)

    return ray.data.from_arrow_refs(table_refs)


def _bfs_shuffle(edges_b, seed_urls, radius, n_buckets):
    import functools

    import ray.data

    from .sketch import hash64_column

    f0 = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(seed_urls, pa.string()),
                "dist": pa.array([0] * len(seed_urls), pa.int64()),
            }
        )
    ).materialize()
    frontiers = [f0]

    def edge_pad(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("src")) % n_buckets).astype(np.int64)
        return pa.table(
            {"bk": pa.array(bk, pa.int64()), "src": t.column("src"), "dst": t.column("dst")}
        )

    def frontier_pad(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "src": t.column("url"),
                "dst": pa.array([None] * t.num_rows, pa.string()),
            }
        )

    def scatter_group(g: pa.Table) -> pa.Table:
        is_f = pc.is_null(g.column("dst"))
        front = _ca(pc.filter(g.column("src"), is_f))
        e = g.filter(pc.invert(is_f))
        keep = pc.is_in(e.column("src"), value_set=front)
        return pa.table({"url": pc.unique(_ca(pc.filter(e.column("dst"), keep)))})

    def cand_pad(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "url": t.column("url"),
                "is_cand": pa.array(np.ones(t.num_rows, bool)),
            }
        )

    def settled_pad(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "url": t.column("url"),
                "is_cand": pa.array(np.zeros(t.num_rows, bool)),
            }
        )

    d = 0
    while radius is None or d < radius:
        d += 1
        cand = (
            frontiers[-1]
            .map_batches(frontier_pad, batch_format="pyarrow", zero_copy_batch=True)
            .union(edges_b.map_batches(edge_pad, batch_format="pyarrow", zero_copy_batch=True))
            .groupby("bk")
            .map_groups(scatter_group, batch_format="pyarrow")
        )
        settled = functools.reduce(lambda a, b: a.union(b), frontiers)

        def claim_group(g: pa.Table, _d=d) -> pa.Table:
            is_c = g.column("is_cand")
            seen = _ca(pc.filter(g.column("url"), pc.invert(is_c)))
            cand_urls = pc.unique(_ca(pc.filter(g.column("url"), is_c)))
            new = pc.filter(cand_urls, pc.invert(pc.is_in(cand_urls, value_set=seen)))
            return pa.table(
                {
                    "url": new,
                    "dist": pa.array(np.full(len(new), _d, np.int64), pa.int64()),
                }
            )

        newf = (
            cand.map_batches(cand_pad, batch_format="pyarrow", zero_copy_batch=True)
            .union(
                settled.map_batches(settled_pad, batch_format="pyarrow", zero_copy_batch=True)
            )
            .groupby("bk")
            .map_groups(claim_group, batch_format="pyarrow")
            .materialize()
        )
        if newf.count() == 0:
            break
        frontiers.append(newf)

    import functools as _ft

    return _ft.reduce(lambda a, b: a.union(b), frontiers)


# ---------------------------------------------------------------------------
# k-core decomposition (fixed k)


def kcore(pages_ds, nodes, *, k=3, mode="auto", max_rounds=64, n_buckets=_MAP_BUCKETS):
    """k-core membership of the undirected link graph: (url, in_core).

    The k-core is the maximal subgraph where every node has undirected
    degree ≥ k (Seidman 1983) — the standard dense-center vs fringe
    split of a web graph. Synchronous peeling: drop all nodes with
    degree < k, remove their edges, repeat to fixpoint (``max_rounds``
    bounds the peel depth; the registered toy-scale query converges in
    ≤4 rounds).

    The symmetric distinct edge closure is built ONCE with a single
    ``groupby(u, v)`` exchange (string pairs move once). Then the graph
    family's standard two regimes (identical output, test-pinned):

    - **broadcast** (``n ≤ SHUFFLE_MODE_NODES``): the survivor set is a
      sorted Arrow array in the object store. Each round is ONE
      map_batches pass over the closure (``pc.is_in`` on both endpoints
      + per-batch dictionary-encoded partial degree counts) and ONE
      remote fold task summing partials into the next survivor array —
      O(nodes) single-object state, pagerank's broadcast bound. The
      driver holds an ObjectRef and one int per round.
    - **shuffle** (above it): survivors stay a Dataset. Each round is
      TWO :func:`_member_semijoin` exchanges (endpoint ∈ survivors, one
      per direction with a row-local swap between) plus ONE degree
      exchange (per-batch partials → ``groupby(url).sum``). No O(nodes)
      object anywhere.

    Output: every node flagged — broadcast probes the final survivor
    array row-locally; shuffle unions node and survivor rows through one
    keyed exchange.
    """
    from ray.data.aggregate import Count

    n = nodes.count()
    edges_b = build_edges(pages_ds, nodes)

    def sym_pad(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t.column("src"), t.column("dst")))
        e = t.filter(keep)
        return pa.table(
            {
                "u": pa.chunked_array([_ca(e.column("src")), _ca(e.column("dst"))]),
                "v": pa.chunked_array([_ca(e.column("dst")), _ca(e.column("src"))]),
            }
        )

    sym = (
        edges_b.map_batches(sym_pad, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["u", "v"]), batch_format="pyarrow")
        .materialize()
    )
    if _resolve_membership(mode, n) == "broadcast":
        return _kcore_broadcast(sym, nodes, k, max_rounds)
    return _kcore_shuffle(sym, nodes, k, max_rounds, n_buckets)


def _kcore_broadcast(sym, nodes, k, max_rounds):
    import ray

    @ray.remote(num_cpus=1)
    def fold(k_, *deg_tables):
        """Sum per-batch (url, dpart) partials; survivors = deg ≥ k."""
        tabs = [t for t in deg_tables if t.num_rows]
        if not tabs:
            return pa.array([], pa.string()), 0
        merged = pa.concat_tables(tabs)
        agg = merged.group_by("url").aggregate([("dpart", "sum")])
        keep = pc.greater_equal(agg.column("dpart_sum"), pa.scalar(k_, pa.int64()))
        surv = _ca(pc.filter(agg.column("url"), keep))
        surv = surv.take(pc.array_sort_indices(surv))
        return surv, len(surv)

    def partials(t: pa.Table, _sref=None) -> pa.Table:
        import ray as _ray

        if _sref is not None:
            s = _ray.get(_sref)
            keep = pc.and_(
                pc.is_in(t.column("u"), value_set=s), pc.is_in(t.column("v"), value_set=s)
            )
            t = t.filter(keep)
        enc = pc.dictionary_encode(_ca(t.column("u")))
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table(
            {
                "url": enc.dictionary,
                "dpart": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def survivors_of(surv_ref):
        import functools

        fn = functools.partial(partials, _sref=surv_ref)
        parts = sym.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        return fold.options(num_returns=2).remote(k, *parts.to_arrow_refs())

    surv_ref, n_ref = survivors_of(None)
    n_surv = ray.get(n_ref)
    for _ in range(max_rounds):
        surv2_ref, n2_ref = survivors_of(surv_ref)
        n2 = ray.get(n2_ref)
        surv_ref = surv2_ref
        if n2 == n_surv:
            break
        n_surv = n2

    def flag(t: pa.Table, _sref=surv_ref) -> pa.Table:
        import ray as _ray

        s = _ray.get(_sref)
        return pa.table(
            {"url": t.column("url"), "in_core": pc.is_in(t.column("url"), value_set=s)}
        )

    return nodes.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def _kcore_shuffle(sym, nodes, k, max_rounds, n_buckets):
    from ray.data.aggregate import Sum

    from .sketch import hash64_column

    def deg_partials(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(_ca(t.column("u")))
        idx = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table(
            {
                "url": enc.dictionary,
                "dpart": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def survivors_of(sym_ds):
        return (
            sym_ds.map_batches(deg_partials, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("url")
            .aggregate(Sum("dpart", alias_name="deg"))
            .map_batches(
                lambda t: t.filter(
                    pc.greater_equal(t.column("deg"), pa.scalar(k, pa.int64()))
                ).select(["url"]),
                batch_format="pyarrow",
            )
            .materialize()
        )

    surv = survivors_of(sym)
    n_surv = surv.count()
    for _ in range(max_rounds):
        # keep edges with BOTH endpoints surviving: semi-join on v, swap,
        # semi-join on the other endpoint (row-local rename between)
        half = _member_semijoin(
            sym.map_batches(
                lambda t: pa.table({"src": t.column("u"), "dst": t.column("v")}),
                batch_format="pyarrow",
            ),
            surv,
            n_buckets=n_buckets,
        )
        sym2 = _member_semijoin(
            half.map_batches(
                lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}),
                batch_format="pyarrow",
            ),
            surv,
            n_buckets=n_buckets,
        ).map_batches(
            lambda t: pa.table({"u": t.column("src"), "v": t.column("dst")}),
            batch_format="pyarrow",
        )
        surv2 = survivors_of(sym2)
        n2 = surv2.count()
        sym, surv = sym2.materialize(), surv2
        if n2 == n_surv:
            break
        n_surv = n2

    def node_pad(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "url": t.column("url"),
                "is_surv": pa.array(np.zeros(t.num_rows, bool)),
            }
        )

    def surv_pad(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("url")) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "url": t.column("url"),
                "is_surv": pa.array(np.ones(t.num_rows, bool)),
            }
        )

    def flag_group(g: pa.Table) -> pa.Table:
        is_s = g.column("is_surv")
        survs = _ca(pc.filter(g.column("url"), is_s))
        node_urls = _ca(pc.filter(g.column("url"), pc.invert(is_s)))
        return pa.table(
            {
                "url": node_urls,
                "in_core": pc.is_in(node_urls, value_set=survs),
            }
        )

    return (
        nodes.map_batches(node_pad, batch_format="pyarrow", zero_copy_batch=True)
        .union(surv.map_batches(surv_pad, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("bk")
        .map_groups(flag_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# HyperANF neighborhood-size estimation


def neighborhood_sizes(
    pages_ds,
    nodes,
    *,
    radius: int = 3,
    membership: str = "auto",
    n_buckets: int = _MAP_BUCKETS,
):
    """HyperANF (Boldi, Rosa & Vigna 2011): per-node estimated count of
    distinct nodes reachable within ``radius`` directed hops (the node
    itself included) → (url, n_reach_est). The neighborhood function
    without per-source BFS: every node carries a sparse HyperLogLog
    register set seeded with its own url hash, and each round folds each
    node's successors' registers into its own — register max is
    associative, so after r synchronous rounds node u's registers hold
    exactly the hash set of its ≤ r-hop out-neighborhood.

    Ray shape: state is a Dataset of (url, ridx, rho) sparse register
    rows (≤ min(|N≤t(u)|, 4096) per node — the HLL cap bounds even hub
    neighborhoods at 4096 rows). Each round is TWO bucketed exchanges:
    (1) scatter — edges keyed by dst union state keyed by url; inside a
    bucket each edge (src→dst) re-keys dst's state rows to src via one
    Arrow sort + searchsorted run-gather; (2) fold — propagated rows
    union current state, per-(url, register) max by lexsort + run scan.
    The per-round exchange is Σ_edges |state(dst)| rows — HyperANF's
    native cost, register-capped, never the neighborhood VALUES. The
    final estimate reuses the pinned vectorized run estimator
    (``sketch.hll_estimate_runs``), so the sequential reference is
    bit-identical.
    """
    from .sketch import hash64_column, hll_estimate_runs, _HLL_P, _HLL_M

    edges = build_edges(
        pages_ds, nodes, membership=membership, n_buckets=n_buckets
    ).materialize()

    def _idx_rho(h: np.ndarray):
        idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
        w = h & np.uint64((1 << (64 - _HLL_P)) - 1)
        _, exp = np.frexp(w.astype(np.float64))
        rho = np.where(w > 0, (64 - _HLL_P) + 1 - exp, (64 - _HLL_P) + 1)
        return idx, rho.astype(np.int64)

    def init_state(t: pa.Table) -> pa.Table:
        idx, rho = _idx_rho(hash64_column(t.column("url")))
        return pa.table(
            {
                "url": t.column("url"),
                "ridx": pa.array(idx.astype(np.int32), pa.int32()),
                "rho": pa.array(rho.astype(np.int32), pa.int32()),
            }
        )

    state = nodes.map_batches(
        init_state, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def edge_pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("dst"),
                "tgt": t.column("src"),
                "ridx": pa.nulls(t.num_rows, pa.int32()),
                "rho": pa.nulls(t.num_rows, pa.int32()),
                "bk": _tri_bucket(t.column("dst"), n_buckets),
            }
        )

    def state_pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("url"),
                "tgt": pa.nulls(t.num_rows, pa.string()),
                "ridx": t.column("ridx"),
                "rho": t.column("rho"),
                "bk": _tri_bucket(t.column("url"), n_buckets),
            }
        )

    def scatter(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "ridx": pa.array([], pa.int32()),
                "rho": pa.array([], pa.int32()),
            }
        )
        is_edge = pc.is_valid(g.column("tgt"))
        e = g.filter(is_edge)
        s = g.filter(pc.invert(is_edge))
        if not e.num_rows or not s.num_rows:
            return empty
        order = pc.sort_indices(s, sort_keys=[("key", "ascending")])
        skey = _ca(s.column("key")).take(order)
        sridx = _ca(s.column("ridx")).take(order).to_numpy(zero_copy_only=False)
        srho = _ca(s.column("rho")).take(order).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(_tri_run_starts(skey))
        uniq = skey.take(pa.array(starts, pa.int64()))
        lens = np.diff(np.append(starts, len(skey)))
        pos = (
            pc.index_in(e.column("key"), value_set=uniq)
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        valid = pos >= 0
        if not valid.any():
            return empty
        vpos = pos[valid]
        counts = lens[vpos]
        total = int(counts.sum())
        g0 = np.repeat(starts[vpos], counts)
        within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        gather = g0 + within
        tgt_rows = np.repeat(np.flatnonzero(valid), counts)
        return pa.table(
            {
                "url": _ca(e.column("tgt")).take(pa.array(tgt_rows, pa.int64())),
                "ridx": pa.array(sridx[gather], pa.int32()),
                "rho": pa.array(srho[gather], pa.int32()),
            }
        )

    def add_nbk(t: pa.Table) -> pa.Table:
        return t.append_column("nbk", _tri_bucket(t.column("url"), n_buckets))

    def dedup_max(g: pa.Table) -> pa.Table:
        urlc = _ca(g.column("url"))
        codes = (
            pc.dictionary_encode(urlc)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ridx = g.column("ridx").to_numpy(zero_copy_only=False).astype(np.int64)
        rho = g.column("rho").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((-rho, ridx, codes))
        kc, ic = codes[order], ridx[order]
        first = np.ones(len(kc), dtype=bool)
        first[1:] = (kc[1:] != kc[:-1]) | (ic[1:] != ic[:-1])
        sel = order[first]
        return pa.table(
            {
                "url": urlc.take(pa.array(sel, pa.int64())),
                "ridx": pa.array(ridx[sel].astype(np.int32), pa.int32()),
                "rho": pa.array(rho[sel].astype(np.int32), pa.int32()),
            }
        )

    for _ in range(radius):
        prop = (
            edges.map_batches(edge_pad, batch_format="pyarrow", zero_copy_batch=True)
            .union(
                state.map_batches(
                    state_pad, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("bk")
            .map_groups(scatter, batch_format="pyarrow")
        )
        state = (
            prop.union(state)
            .map_batches(add_nbk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("nbk")
            .map_groups(dedup_max, batch_format="pyarrow")
            .materialize()
        )

    def estimate(g: pa.Table) -> pa.Table:
        urlc = _ca(g.column("url"))
        codes = (
            pc.dictionary_encode(urlc)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ridx = g.column("ridx").to_numpy(zero_copy_only=False).astype(np.int64)
        rho = g.column("rho").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ridx, codes))
        kc = codes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], kc[1:] != kc[:-1]]) if len(kc) else []
        )
        ests = hll_estimate_runs(rho[order], starts)
        return pa.table(
            {
                "url": urlc.take(pa.array(order[starts], pa.int64())),
                "n_reach_est": pa.array(ests, pa.int64()),
            }
        )

    return (
        state.map_batches(add_nbk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nbk")
        .map_groups(estimate, batch_format="pyarrow")
    )


def host_graph(pages_ds, nodes, *, membership: str = "auto", n_buckets: int = _MAP_BUCKETS):
    """Weighted host-level link graph: ``(src_host, dst_host, weight)``.

    Collapses the distinct page-level edges (:func:`build_edges`, i.e.
    "what the crawler saw", reference parser.go:120-208) to host→host
    rows, dropping intra-host edges — the standard substrate for
    host-level ranking (host PageRank / TrustRank seeds / spam-mass) in
    web-scale pipelines, where page-level centrality is too easy to
    manipulate with on-site link farms. ``weight`` counts the distinct
    page-level edges between the two hosts.

    Host extraction is the repo's pinned cross-engine seam (urlmine.py
    ``_HOST_RE`` ≡ the oracle's ``regexp_extract(url,
    '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)``): one Arrow RE2 kernel per
    endpoint column, no Python loop.

    Scale shape: host pairs are counted per block FIRST (an Arrow
    ``group_by`` inside ``map_batches``), so the one ``groupby``
    exchange moves pre-aggregated (host, host, partial) rows — at web
    scale hosts are ~10^4× fewer than pages, so the exchange is tiny
    relative to the edge stream it summarizes.
    """
    from ray.data.aggregate import Sum

    from .urlmine import _HOST_RE

    edges = build_edges(pages_ds, nodes, membership=membership, n_buckets=n_buckets)

    def partials(t: pa.Table) -> pa.Table:
        src_host = pc.struct_field(
            pc.extract_regex(t.column("src"), pattern=_HOST_RE), "host"
        )
        dst_host = pc.struct_field(
            pc.extract_regex(t.column("dst"), pattern=_HOST_RE), "host"
        )
        pairs = pa.table({"src_host": src_host, "dst_host": dst_host})
        keep = pc.and_(
            pc.and_(pc.is_valid(src_host), pc.is_valid(dst_host)),
            pc.not_equal(src_host, dst_host),
        )
        agg = pairs.filter(keep).group_by(["src_host", "dst_host"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "src_host": agg.column("src_host"),
                "dst_host": agg.column("dst_host"),
                "weight": agg.column("count_all").cast(pa.int64()),
            }
        )

    return (
        edges.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("weight", alias_name="weight"))
    )


def host_degrees(host_edges_ds):
    """Per-host fan-out/fan-in over the host graph: ``(host, out_hosts,
    in_hosts, out_weight, in_weight)``.

    ``out_hosts``/``in_hosts`` count distinct neighbor hosts;
    ``out_weight``/``in_weight`` sum page-level edge multiplicity. ONE
    single-key shuffle over rows that are already host-pair aggregates
    (each input row contributes two partial rows, then a
    ``groupby(host)`` sums) — the host graph is small enough at any
    scale that this exchange is negligible.
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        w = t.column("weight").cast(pa.int64())
        zero = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        one = pa.array(np.ones(t.num_rows, np.int64), pa.int64())
        out_rows = pa.table(
            {
                "host": t.column("src_host"),
                "out_hosts": one,
                "in_hosts": zero,
                "out_weight": w,
                "in_weight": zero,
            }
        )
        in_rows = pa.table(
            {
                "host": t.column("dst_host"),
                "out_hosts": zero,
                "in_hosts": one,
                "out_weight": zero,
                "in_weight": w,
            }
        )
        return pa.concat_tables([out_rows, in_rows])

    return (
        host_edges_ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("host")
        .aggregate(
            Sum("out_hosts", alias_name="out_hosts"),
            Sum("in_hosts", alias_name="in_hosts"),
            Sum("out_weight", alias_name="out_weight"),
            Sum("in_weight", alias_name="in_weight"),
        )
    )


def _endpoint_nodes(pairs_ds):
    """Distinct endpoint Dataset (column ``url``) of a (src, dst[, w])
    edge Dataset: per-block unique of both endpoint columns, then ONE
    ``groupby(url)`` for the global distinct — the node table a weighted
    graph is born with when it arrives as a bare edge list."""
    from ray.data.aggregate import Count

    def per_block(t: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [
                t.column("src").combine_chunks().cast(pa.string()),
                t.column("dst").combine_chunks().cast(pa.string()),
            ]
        )
        return pa.table({"url": pc.unique(arr)})

    return (
        pairs_ds.map_batches(per_block, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("url")
        .aggregate(Count())
        .select_columns(["url"])
    )


def weighted_pagerank(
    edges_ds,
    *,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "weight",
    n_iters: int = _N_ITERS,
    damping: float = _DAMPING,
    mode: str = "auto",
    n_buckets: int | None = None,
    seed_urls: list[str] | None = None,
):
    """PageRank over an arbitrary WEIGHTED edge list → (url, rank_ppb).

    The host-graph centrality step (:func:`host_graph` feeds this): an
    edge of weight ``w`` carries ``w``× the contribution mass —
    ``rank[src] · w / out_weight[src]`` — i.e. PageRank on the multigraph
    the weights summarize. Node set = the distinct endpoints (derived
    distributedly, never a driver list); dangling nodes lose their mass
    exactly as in :func:`pagerank`.

    Both regimes of the unweighted engine apply, picked by node count:
    broadcast (≤ ``SHUFFLE_MODE_NODES``: sorted node array folded into
    the object store, edge shards pinned in an actor pool, weights ride
    the blocks) and shuffle (the two-exchange-per-iteration Dataset
    formulation with the weight folded into the contribution slot).
    Ranks are bit-identical across regimes and to
    :func:`weighted_pagerank_reference` — the shared ``_contrib_sums``
    primitive computes ``(rank·inv)·w`` in pinned order.

    ``seed_urls`` personalizes the teleport exactly as in
    :func:`pagerank` (TrustRank at the host level — the seed list is a
    config-sized trusted-host list): restart mass 1/|S| on seeds, 0
    elsewhere; every seed must be an edge endpoint.
    """
    import ray
    import ray.data

    if seed_urls is not None and not seed_urls:
        raise ValueError("seed_urls must be non-empty when given")
    prep = _weighted_prepared(
        edges_ds,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=weight_col,
        mode=mode,
        n_buckets=n_buckets,
    )
    if prep is None:
        return ray.data.from_arrow(
            pa.table(
                {"url": pa.array([], pa.string()), "rank_ppb": pa.array([], pa.int64())}
            )
        )

    if prep["mode"] == "shuffle":
        teleport = (
            None
            if seed_urls is None
            else _shuffle_teleport(prep["index_ds"], seed_urls)
        )
        return _pagerank_shuffle(
            prep["edges_b"],
            prep["index_ds"],
            n=prep["n"],
            n_iters=n_iters,
            damping=damping,
            per_bucket=prep["per_bucket"],
            teleport=teleport,
            weighted=True,
        )

    n = prep["n"]
    return _broadcast_rank_loop(
        prep["edges_b"],
        prep["urls_ref"],
        n,
        n_iters=n_iters,
        damping=damping,
        **_teleport_vectors(n, damping, prep["urls_ref"], seed_urls),
    )


def _weighted_prepared(
    edges_ds,
    *,
    src_col: str,
    dst_col: str,
    weight_col: str,
    mode: str,
    n_buckets: int | None,
):
    """Shared graph preparation for the weighted rank family: normalize
    the edge columns, derive the node set distributedly, resolve the
    regime, and build the iteration-ready edge blocks ONCE — so callers
    that run several teleports over the same graph (spam mass, seed-set
    sweeps) pay the identity/bucketing exchanges a single time. Returns
    None for an empty graph."""

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column(src_col).cast(pa.string()),
                "dst": t.column(dst_col).cast(pa.string()),
                "w": t.column(weight_col).cast(pa.int64()),
            }
        )

    pairs = edges_ds.map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    nodes = _endpoint_nodes(pairs)
    n = nodes.count()
    if n == 0:
        return None
    if mode == "auto":
        mode = "shuffle" if n > SHUFFLE_MODE_NODES else "broadcast"
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"mode must be 'auto', 'broadcast' or 'shuffle', got {mode!r}")
    if n_buckets is None:
        per_bucket = _graph_buckets(n)
    else:
        per_bucket = max(1, -(-n // n_buckets))

    if mode == "shuffle":
        nb = -(-n // per_bucket)
        index_ds = node_index(nodes)[0].repartition(nb, shuffle=False).materialize()
        edges_b = (
            _edge_ids_shuffle(pairs, index_ds, per_bucket=per_bucket, weighted=True)
            .repartition(nb, shuffle=False)
            .materialize()
        )
        return {
            "mode": mode,
            "n": n,
            "per_bucket": per_bucket,
            "index_ds": index_ds,
            "edges_b": edges_b,
        }

    urls_ref = _sorted_urls_ref(nodes)
    edges_b = _bucketed_edge_ids(pairs, urls_ref, per_bucket)
    return {
        "mode": mode,
        "n": n,
        "per_bucket": per_bucket,
        "urls_ref": urls_ref,
        "edges_b": edges_b,
    }


def _shuffle_teleport(index_ds, seed_urls: list[str]):
    """(seed-id ObjectRef, |seeds|) for the shuffle regime: seed ids come
    from a filtered pass over the node index — ≤ |seed_urls| rows reach
    the driver (seed lists are config-sized)."""
    import ray

    ss = sorted(set(seed_urls))
    seeds_arr = pa.array(ss, pa.string())
    id_rows = index_ds.map_batches(
        lambda t, _sa=seeds_arr: t.filter(pc.is_in(t.column("url"), value_set=_sa)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    ids = np.sort(np.array([r["node_id"] for r in id_rows], dtype=np.int64))
    if len(ids) != len(ss):
        raise ValueError("seed_urls not all present in the node set")
    return (ray.put(ids), len(ids))


def _teleport_vectors(n: int, damping: float, urls_ref, seed_urls):
    """(base_vec, rank0_vec) kwargs for the broadcast regime — uniform
    (pinned one-division floats) or personalized to the seed positions
    resolved against the shared sorted node array in a remote task."""
    import ray

    if seed_urls is None:
        return {
            "base_vec": np.full(n, (1.0 - damping) / n, dtype=np.float64),
            "rank0_vec": np.full(n, 1.0 / n, dtype=np.float64),
        }

    @ray.remote(num_cpus=1)
    def _seed_pos(urls_arr: pa.Array, seeds: list[str]) -> np.ndarray:
        pos = pc.index_in(pa.array(seeds, pa.string()), value_set=urls_arr)
        if pos.null_count:
            missing = [s for s, p in zip(seeds, pos.to_pylist()) if p is None]
            raise ValueError(f"seed_urls not in node set: {missing[:3]}")
        return pos.to_numpy(zero_copy_only=False).astype(np.int64)

    pos = ray.get(_seed_pos.remote(urls_ref, sorted(set(seed_urls))))
    rank0_vec = np.zeros(n, dtype=np.float64)
    rank0_vec[pos] = 1.0 / len(pos)
    base_vec = np.zeros(n, dtype=np.float64)
    base_vec[pos] = (1.0 - damping) / len(pos)
    return {"base_vec": base_vec, "rank0_vec": rank0_vec}


def weighted_spam_mass(
    edges_ds,
    *,
    seed_urls: list[str],
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "weight",
    n_iters: int = _N_ITERS,
    damping: float = _DAMPING,
    mode: str = "auto",
    n_buckets: int | None = None,
):
    """Spam mass over a weighted edge list in ONE prepared pass →
    (url, spam_mass_ppb): the uniform and seed-personalized ranks share
    the graph preparation (node derivation, identity/bucketing
    exchanges) and — in the broadcast regime — the same pinned edge-shard
    actor pool, so the capstone costs one graph build plus two cheap
    iteration sweeps instead of two full rank jobs. Ranks and the
    integer mass rule are bit-identical to composing
    :func:`weighted_pagerank` × 2 + :func:`spam_mass` (the broadcast
    fast path computes the mass driver-side on the two O(n≤
    SHUFFLE_MODE_NODES) vectors instead of a join; the shuffle regime
    keeps the node-sized hash join)."""
    import ray
    import ray.data

    if not seed_urls:
        raise ValueError("seed_urls must be non-empty")
    prep = _weighted_prepared(
        edges_ds,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=weight_col,
        mode=mode,
        n_buckets=n_buckets,
    )
    if prep is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "spam_mass_ppb": pa.array([], pa.int64()),
                }
            )
        )

    if prep["mode"] == "shuffle":
        teleport = _shuffle_teleport(prep["index_ds"], seed_urls)
        common = dict(
            n=prep["n"],
            n_iters=n_iters,
            damping=damping,
            per_bucket=prep["per_bucket"],
            weighted=True,
        )
        pr = _pagerank_shuffle(prep["edges_b"], prep["index_ds"], **common)
        tr = _pagerank_shuffle(
            prep["edges_b"], prep["index_ds"], teleport=teleport, **common
        )
        return spam_mass(pr, tr)

    n = prep["n"]
    uniform = _teleport_vectors(n, damping, prep["urls_ref"], None)
    seeded = _teleport_vectors(n, damping, prep["urls_ref"], seed_urls)
    pr_vec, tr_vec = _broadcast_rank_vectors(
        prep["edges_b"],
        n,
        n_iters=n_iters,
        damping=damping,
        variants=[
            (uniform["base_vec"], uniform["rank0_vec"]),
            (seeded["base_vec"], seeded["rank0_vec"]),
        ],
    )
    # ppb quantization first (the rank contract), then the integer rule —
    # identical to spam_mass() over the two finished rank tables
    pr_ppb = np.round(pr_vec * 1e9).astype(np.int64)
    tr_ppb = np.round(tr_vec * 1e9).astype(np.int64)
    num = np.maximum(pr_ppb - tr_ppb, 0) * np.int64(1_000_000_000)
    out = np.zeros(n, dtype=np.int64)
    nz = pr_ppb > 0
    out[nz] = num[nz] // pr_ppb[nz]

    @ray.remote(num_cpus=1)
    def finish(urls_arr: pa.Array, mass_vec: np.ndarray) -> pa.Table:
        return pa.table(
            {"url": urls_arr, "spam_mass_ppb": pa.array(mass_vec, pa.int64())}
        )

    return ray.data.from_arrow_refs([finish.remote(prep["urls_ref"], out)])


def weighted_pagerank_reference(
    edges: list[tuple[str, str, int]],
    *,
    n_iters: int = _N_ITERS,
    damping: float = _DAMPING,
    seed_urls: list[str] | None = None,
) -> dict[str, int]:
    """Single-process oracle for :func:`weighted_pagerank`: same node
    ordering (sorted endpoints), same pinned float path (uniform base =
    ONE division, ``(rank·inv)·w`` per edge, per-dst ``np.add.reduceat``
    over the (dst, src)-sorted run), no Ray. Duplicate (src, dst) pairs
    have their weights summed. ``seed_urls`` = the TrustRank teleport
    personalization (mass 1/|S| on seeds, 0 elsewhere)."""
    hosts = sorted({h for e in edges for h in (e[0], e[1])})
    n = len(hosts)
    if n == 0:
        return {}
    idx = {h: i for i, h in enumerate(hosts)}
    agg: dict[tuple[int, int], int] = {}
    for s, d, w in edges:
        key = (idx[d], idx[s])  # (dst_id, src_id) sort key
        agg[key] = agg.get(key, 0) + int(w)
    if agg:
        keys = sorted(agg)
        dst = np.array([k[0] for k in keys], dtype=np.int64)
        src = np.array([k[1] for k in keys], dtype=np.int64)
        w = np.array([agg[k] for k in keys], dtype=np.int64)
    else:
        dst = src = w = np.empty(0, np.int64)
    out_w = np.zeros(n, dtype=np.int64)
    np.add.at(out_w, src, w)
    inv_out = np.zeros(n, dtype=np.float64)
    inv_out[out_w > 0] = 1.0 / out_w[out_w > 0]
    if seed_urls is None:
        base_vec = np.full(n, (1.0 - damping) / n, dtype=np.float64)
        ranks = np.full(n, 1.0 / n, dtype=np.float64)
    else:
        ss = sorted(set(seed_urls))
        missing = [s for s in ss if s not in idx]
        if missing or not ss:
            raise ValueError(f"seed_urls not in node set: {missing[:3]}")
        pos = [idx[s] for s in ss]
        base_vec = np.zeros(n, dtype=np.float64)
        base_vec[pos] = (1.0 - damping) / len(ss)
        ranks = np.zeros(n, dtype=np.float64)
        ranks[pos] = 1.0 / len(ss)
    for _ in range(n_iters):
        d_, s_ = _contrib_sums(dst, src, ranks, inv_out, w)
        new = base_vec.copy()
        np.add.at(new, d_, damping * s_)
        ranks = new
    ppb = np.round(ranks * 1e9).astype(np.int64)
    return {h: int(ppb[i]) for i, h in enumerate(hosts)}


def spam_mass(pr_ds, tr_ds, *, num_partitions: int = 16):
    """Relative spam mass per node (Gyöngyi et al. 2005, "Link spam
    detection based on mass estimation"): the fraction of a node's
    PageRank NOT backed by trusted sources —
    ``max(pr − tr, 0)·10⁹ // pr`` in parts-per-billion, where ``pr`` is
    the uniform-teleport rank and ``tr`` the seed-personalized TrustRank
    (both ppb-quantized probability vectors, so directly comparable).
    High spam mass ⇒ rank earned from link structures no trusted seed
    reaches — the classic link-farm demotion signal.

    Inputs are the two rank Datasets (columns ``url, rank_ppb``) over
    the SAME node set — both ranks cover every node, so the combine is
    the repo's pad→union→``groupby(hash(url) % B)`` exchange with a
    per-bucket Arrow hash-agg sum standing in for the equi-join (exact
    because each url appears once per side; both sides are node-sized,
    neither broadcasts). The mass rule is integer-only row-local
    arithmetic, so the result is exact and parallelism-independent given
    its inputs.
    """
    from .sketch import hash64_column

    n_buckets = num_partitions

    def pad(col: str):
        def fn(t: pa.Table) -> pa.Table:
            if "url" not in t.column_names:  # zero-row empty-schema blocks
                return pa.table(
                    {
                        "bk": pa.array([], pa.int64()),
                        "url": pa.array([], pa.string()),
                        "pr_ppb": pa.array([], pa.int64()),
                        "tr_ppb": pa.array([], pa.int64()),
                    }
                )
            zeros = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            rank = t.column("rank_ppb").cast(pa.int64())
            return pa.table(
                {
                    "bk": pa.array(
                        (hash64_column(t.column("url")) % n_buckets).astype(np.int64),
                        pa.int64(),
                    ),
                    "url": t.column("url"),
                    "pr_ppb": rank if col == "pr_ppb" else zeros,
                    "tr_ppb": rank if col == "tr_ppb" else zeros,
                }
            )

        return fn

    def mass(g: pa.Table) -> pa.Table:
        agg = g.group_by(["url"]).aggregate([("pr_ppb", "sum"), ("tr_ppb", "sum")])
        pr = agg.column("pr_ppb_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        tr = agg.column("tr_ppb_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        # floor division on non-negatives only: the GREATEST clamp keeps
        # the // rule identical in numpy and DuckDB
        num = np.maximum(pr - tr, 0) * np.int64(1_000_000_000)
        out = np.zeros(len(pr), dtype=np.int64)
        nz = pr > 0
        out[nz] = num[nz] // pr[nz]
        return pa.table(
            {"url": agg.column("url"), "spam_mass_ppb": pa.array(out, pa.int64())}
        )

    return (
        pr_ds.map_batches(pad("pr_ppb"), batch_format="pyarrow", zero_copy_batch=True)
        .union(
            tr_ds.map_batches(
                pad("tr_ppb"), batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("bk")
        .map_groups(mass, batch_format="pyarrow")
    )


def random_walks(edges_ds, starts_ds, *, length: int = 3, n_buckets: int = 64,
                 start_col: str = "url", mode: str = "auto"):
    """DeepWalk-style walk-corpus generation (Perozzi et al. 2014): one
    deterministic random walk per start node over the directed link
    graph → ``(start, path)`` rows, the training sequences graph-
    embedding models consume.

    Pinned step rule (mirrored op-for-op by the SQL oracle): from node
    ``u`` at step ``t`` in the walk started at ``w``, the next node is
    out-neighbor number ``H mod m`` (0-based) of ``u``'s DISTINCT
    out-neighbors in ascending byte-lexicographic order, where ``m`` is
    the out-degree and ``H = int(md5(f"{w}|{t}|{u}").hexdigest()[:15],
    16)`` — the sampling family's 60-bit md5 rule, so the choice is
    reproducible in any engine and independent of partitioning. Dead
    ends TERMINATE the walk (shorter path, never a repeat-stay). The
    md5 is a per-walker Python call — the sampling family's documented
    cross-engine-determinism cost, paid on n_walks rows per step, never
    on edges.

    Two regimes, the graph family's standard split (``mode="auto"``
    picks by edge count vs ``SHUFFLE_MODE_NODES``; both produce the
    IDENTICAL (start, path) set — the step rule depends only on (walk,
    step, node) — test-pinned):

    - **broadcast** (edges below the bound): the src-sorted edge arrays
      live ONCE in the object store; each round is one ``map_batches``
      pass over the walker Dataset (two searchsorteds + the md5 rule),
      no exchange at all — pagerank's O(edges) single-object bound.
    - **shuffle** (above it): ``length`` rounds of ONE bucketed exchange
      each —
    walker rows and edge rows pad to a shared (key, walk, path, dst,
    kind) schema, union, ``groupby(hash(key) % B)``; per bucket the
    edges sort once (vectorized) and every walker picks its successor
    via two searchsorteds + the md5 rule. The padded+bucketed edge
    table is materialized ONCE and reused every round (the stateless
    re-exchange tradeoff bfs_distances documents; walk state is O(walks)
    rows, never O(nodes) driver memory). Paths ride the walker rows as
    strings — at 10^10 nodes emit (walk, step, node) triples instead if
    paths outgrow block budgets."""
    import ray.data

    from .sketch import hash64_column

    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        mode = (
            "broadcast"
            if edges_ds.count() <= SHUFFLE_MODE_NODES
            else "shuffle"
        )
    if mode == "broadcast":
        return _random_walks_broadcast(
            edges_ds, starts_ds, length=length, start_col=start_col
        )

    def bucket(t: pa.Table) -> pa.Table:
        bk = (hash64_column(t.column("key")) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return t.append_column("bk", pa.array(bk, pa.int64()))

    def pad_e(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("src").cast(pa.string()),
                "walk": pa.nulls(t.num_rows, pa.string()),
                "path": pa.nulls(t.num_rows, pa.string()),
                "dst": t.column("dst").cast(pa.string()),
                "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            }
        )

    def pad_w(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("key"),
                "walk": t.column("walk"),
                "path": t.column("path"),
                "dst": pa.nulls(t.num_rows, pa.string()),
                "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            }
        )

    def init(t: pa.Table) -> pa.Table:
        u = t.column(start_col).cast(pa.string())
        return pa.table({"key": u, "walk": u, "path": u})

    def make_fold(step: int):
        import hashlib

        def fold(g: pa.Table) -> pa.Table:
            kind = np.asarray(g.column("kind").to_pylist(), np.int8)
            keys = np.asarray(g.column("key").to_pylist(), dtype=object)
            is_e = kind == 1
            src = keys[is_e].astype(str)
            dst = np.asarray(g.column("dst").to_pylist(), dtype=object)[
                is_e
            ].astype(str)
            if len(src):
                order = np.lexsort((dst, src))
                src, dst = src[order], dst[order]
                keep = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
                src, dst = src[keep], dst[keep]
            is_w = ~is_e
            if not is_w.any():
                return pa.table(
                    {
                        "key": pa.array([], pa.string()),
                        "walk": pa.array([], pa.string()),
                        "path": pa.array([], pa.string()),
                        "alive": pa.array([], pa.bool_()),
                    }
                )
            cur = keys[is_w].astype(str)
            walk = np.asarray(g.column("walk").to_pylist(), dtype=object)[is_w]
            path = np.asarray(g.column("path").to_pylist(), dtype=object)[is_w]
            lo = np.searchsorted(src, cur, "left")
            hi = np.searchsorted(src, cur, "right")
            out_key, out_walk, out_path, out_alive = [], [], [], []
            for i in range(len(cur)):
                m = hi[i] - lo[i]
                if m == 0:
                    out_key.append(cur[i])
                    out_walk.append(walk[i])
                    out_path.append(path[i])
                    out_alive.append(False)
                    continue
                h = int(
                    hashlib.md5(
                        f"{walk[i]}|{step}|{cur[i]}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                nxt = dst[lo[i] + h % m]
                out_key.append(nxt)
                out_walk.append(walk[i])
                out_path.append(path[i] + " " + nxt)
                out_alive.append(True)
            return pa.table(
                {
                    "key": pa.array(out_key, pa.string()),
                    "walk": pa.array(out_walk, pa.string()),
                    "path": pa.array(out_path, pa.string()),
                    "alive": pa.array(out_alive, pa.bool_()),
                }
            )

        return fold

    edges_padded = edges_ds.map_batches(
        pad_e, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True).materialize()

    alive = starts_ds.map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    )
    finished = []
    for step in range(length):
        folded = (
            alive.map_batches(pad_w, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
            .union(edges_padded)
            .groupby("bk")
            .map_groups(make_fold(step), batch_format="pyarrow")
            .materialize()
        )
        finished.append(
            folded.filter(expr="alive == False").drop_columns(["alive"])
        )
        alive = folded.filter(expr="alive == True").drop_columns(["alive"])

    out = alive
    for f in finished:
        out = out.union(f)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"start": t.column("walk"), "path": t.column("path")})

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def _random_walks_broadcast(edges_ds, starts_ds, *, length: int, start_col: str):
    """Broadcast regime of :func:`random_walks`: the distinct src-sorted
    edge arrays sit once in the object store (declared O(edges) bound —
    the pagerank-broadcast contract); each round is one row-local
    ``map_batches`` pass over the walker Dataset, zero exchanges."""
    import hashlib

    import ray
    import ray.data

    tables = [ray.get(r) for r in edges_ds.to_arrow_refs()]
    live = [t for t in tables if t.num_rows]
    if live:
        et = pa.concat_tables(live)
        src_a = np.asarray(et.column("src").to_pylist(), dtype=object).astype(str)
        dst_a = np.asarray(et.column("dst").to_pylist(), dtype=object).astype(str)
        order = np.lexsort((dst_a, src_a))
        src_a, dst_a = src_a[order], dst_a[order]
        keep = np.r_[True, (src_a[1:] != src_a[:-1]) | (dst_a[1:] != dst_a[:-1])]
        src_a, dst_a = src_a[keep], dst_a[keep]
    else:
        src_a = np.zeros(0, dtype=str)
        dst_a = src_a
    eref = ray.put((src_a, dst_a))

    def advance_all(t: pa.Table) -> pa.Table:
        srcs, dsts = ray.get(eref)
        # object arrays throughout: fixed-width numpy U-dtypes would
        # silently truncate the growing path strings
        walk = np.asarray(t.column(start_col).to_pylist(), dtype=object)
        cur = walk.copy()
        path = walk.copy()
        alive = np.ones(len(walk), dtype=bool)
        for step in range(length):
            idx = np.flatnonzero(alive)
            if not len(idx):
                break
            cur_u = cur[idx].astype(str)
            lo = np.searchsorted(srcs, cur_u, "left")
            hi = np.searchsorted(srcs, cur_u, "right")
            for j, i in enumerate(idx):
                m = hi[j] - lo[j]
                if m == 0:
                    alive[i] = False
                    continue
                h = int(
                    hashlib.md5(
                        f"{walk[i]}|{step}|{cur[i]}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                nxt = dsts[lo[j] + h % m]
                cur[i] = nxt
                path[i] = path[i] + " " + nxt
        return pa.table(
            {
                "start": pa.array(walk.tolist(), pa.string()),
                "path": pa.array(path.tolist(), pa.string()),
            }
        )

    return starts_ds.map_batches(
        advance_all, batch_format="pyarrow", zero_copy_batch=True
    )


def host_cocitation(
    pages_ds,
    nodes,
    *,
    min_count: int = 2,
    max_out: int = 256,
    membership: str = "auto",
    n_buckets: int = _MAP_BUCKETS,
):
    """Host co-citation: pairs of DISTINCT hosts linked from the same
    page → ``(host_a, host_b, n_src)`` with ``host_a < host_b`` and
    ``n_src`` = number of distinct source pages citing both — the
    classic related-domain / co-citation similarity signal (Small 1973
    co-citation, applied to the web graph), and the link-graph analogue
    of the collocation operator's "appear together" rule.

    Scale shape: TWO bucketed exchanges. (1) ``groupby(hash(src) % B)``
    brings each page's out-hosts together; per bucket the distinct
    (src, host) rows sort once and pair generation vectorizes per
    DISTINCT out-degree (the triangle_counts trick — a Python loop over
    O(#distinct degrees) lengths, never over pairs), with each page's
    host list capped at a DECLARED ``max_out`` (a mega-hub page citing
    10^4 hosts would contribute 10^8 pairs; the cap keeps the
    lexicographically-first hosts, documented like dedup's ``max_df``
    knob — unsaturated at the gate corpora, where the SQL oracle is
    therefore exact). Pairs pre-aggregate in-bucket before (2) ONE
    int32-key pair exchange (the dedup pair-combine shape) sums
    per-pair counts and applies ``min_count``. Host extraction is the
    pinned ``_HOST_RE`` cross-engine seam."""
    from .sketch import hash64_column
    from .urlmine import _HOST_RE

    edges = build_edges(pages_ds, nodes, membership=membership, n_buckets=n_buckets)

    def keyed(t: pa.Table) -> pa.Table:
        dst_host = pc.struct_field(
            pc.extract_regex(t.column("dst"), pattern=_HOST_RE), "host"
        )
        tt = pa.table({"src": t.column("src"), "h": dst_host}).filter(
            pc.is_valid(dst_host)
        )
        bk = (hash64_column(tt.column("src")) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return tt.append_column("bk", pa.array(bk, pa.int64()))

    PB = 1024

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "pb": pa.array([], pa.int32()),
            }
        )
        if not g.num_rows:
            return empty
        src = np.asarray(g.column("src").to_pylist(), dtype=object).astype(str)
        hh = np.asarray(g.column("h").to_pylist(), dtype=object).astype(str)
        order = np.lexsort((hh, src))
        s, hh = src[order], hh[order]
        keep = np.r_[True, (s[1:] != s[:-1]) | (hh[1:] != hh[:-1])]
        s, hh = s[keep], hh[keep]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        runlen = np.diff(np.append(starts, len(s)))
        rank = np.arange(len(s)) - np.repeat(starts, runlen)
        capped = rank < max_out
        s, hh = s[capped], hh[capped]
        if not len(s):
            return empty
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        runlen = np.diff(np.append(starts, len(s)))
        a_parts, b_parts = [], []
        for L in np.unique(runlen):
            if L < 2:
                continue
            iu, ju = np.triu_indices(int(L), k=1)
            sel = starts[runlen == L]
            a_parts.append(hh[(sel[:, None] + iu[None, :]).ravel()])
            b_parts.append(hh[(sel[:, None] + ju[None, :]).ravel()])
        if not a_parts:
            return empty
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        key = np.char.add(np.char.add(a.astype(str), "\x01"), b.astype(str))
        o2 = np.argsort(key, kind="stable")
        a, b, key = a[o2], b[o2], key[o2]
        st2 = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        cnt = np.diff(np.append(st2, len(key)))
        arr_a = pa.array(a[st2], pa.string())
        pbk = (
            hash64_column(pa.array(key[st2], pa.string())) % np.uint64(PB)
        ).astype(np.int32)
        return pa.table(
            {
                "a": arr_a,
                "b": pa.array(b[st2], pa.string()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "pb": pa.array(pbk, pa.int32()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        a = np.asarray(g.column("a").to_pylist(), dtype=object).astype(str)
        b = np.asarray(g.column("b").to_pylist(), dtype=object).astype(str)
        c = g.column("cnt").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(a, "\x01"), b)
        order = np.argsort(key, kind="stable")
        a, b, c, key = a[order], b[order], c[order], key[order]
        st = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tot = np.add.reduceat(c, st)
        ok = tot >= min_count
        return pa.table(
            {
                "host_a": pa.array(a[st][ok], pa.string()),
                "host_b": pa.array(b[st][ok], pa.string()),
                "n_src": pa.array(tot[ok].astype(np.int64), pa.int64()),
            }
        )

    return (
        edges.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bk")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(combine, batch_format="pyarrow")
    )
