"""Web-graph analytics over the corpus link graph: edge extraction,
degree distributions, PageRank.

The reference stops at the visited-URL set; the natural next consumer of
a 100TB crawl is the link GRAPH — in/out-degree statistics and a
centrality score (PageRank) per page. Graph nodes are the corpus pages;
edges are the DISTINCT in-corpus, non-self hyperlinks extracted by the
same pure extractor the crawler uses (extract.py M1, reference
parser.go:120-208), so the graph is exactly "what the crawler saw".

Scale shapes:

- **Edge build is shuffle-free.** Every (src, dst) edge originates from
  exactly one page row, so "globally distinct edges" = per-row dedup —
  vectorized Arrow kernels (list_flatten / list_parent_indices / is_in /
  batch-local group_by), no exchange. The in-corpus membership test is a
  broadcast keep-set (``ray.put`` once) at test scale; at 10^10 nodes the
  url set outgrows a broadcast and membership becomes a hash semi-join
  against the node table (the same bucketed union shape as
  ``functions/dedup.py``) — the edge emit stays row-local either way.
- **Degrees are ONE single-key shuffle.** Out-degree is row-local
  (count of the page's own distinct in-corpus links); only in-degree
  crosses blocks. Per-batch partial counts pre-aggregate before the
  ``groupby(url)`` so the exchange moves one row per (batch, url).
- **PageRank iterates over a once-materialized, dst-bucketed edge
  dataset.** In ``mode="broadcast"`` the bucketed edge blocks are
  pinned once into a pool of ``_EdgeShard`` actors (whole buckets per
  actor — block refs move through the object store, never the driver)
  and each iteration is one round of actor calls against the O(nodes)
  rank vector shipped via ``ray.put`` (the Spark/GraphX broadcast
  formulation) — broadcast state is O(nodes), never O(edges), and the
  per-iteration cost is actor-RPC, not a fresh Dataset job. Above
  ``SHUFFLE_MODE_NODES`` the vector outgrows the driver and
  ``mode="shuffle"`` keeps ranks as a Dataset: each iteration is a
  pad→union→one-key-shuffle join (the repo's asof/range-join shape)
  from rank rows to their bucket's edges, then a dst-bucket reduce back
  to rank rows — per-task state is one bucket slice, never the full
  vector. Both modes produce BIT-IDENTICAL ranks (test-asserted):
  every per-dst sum is ``np.add.reduceat`` over the (dst, src)-sorted
  contribution run, so float summation order is fixed by the data, not
  by partitioning.

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
    "pagerank",
    "pagerank_reference",
    "hits",
    "hits_reference",
    "SHUFFLE_MODE_NODES",
]

# Above this node count the broadcast rank vector (8B/node — 40MB at 5M)
# stops being "small state" and pagerank(mode="auto") switches to the
# fully-distributed shuffle formulation.
SHUFFLE_MODE_NODES = 5_000_000

_DAMPING = 0.85
_N_ITERS = 10


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


def build_edges(pages_ds, node_urls: list[str]):
    """Distinct in-corpus (src, dst) edge Dataset from a pages Dataset.

    ``node_urls`` is the graph's node set (the corpus url column); it is
    broadcast once via ``ray.put`` and probed with ``pc.is_in`` per batch.
    """
    import ray

    from ..extract import extract_links_batch

    keep_ref = ray.put(pa.array(sorted(node_urls), pa.string()))

    def to_edges(t: pa.Table) -> pa.Table:
        return _edges_batch(t, ray.get(keep_ref))

    return pages_ds.map_batches(
        extract_links_batch, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)


def degrees(pages_ds, node_urls: list[str]):
    """Per-node (url, out_deg, in_deg) in one single-key shuffle.

    Every page contributes a row-local ``(url, out_deg, 0)`` row (its own
    distinct in-corpus link count — out-degree needs no exchange) plus
    per-batch pre-aggregated ``(dst, 0, in_partial)`` rows; a single
    ``groupby(url)`` sums both. Isolated pages keep (0, 0) rows.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..extract import extract_links_batch

    keep_ref = ray.put(pa.array(sorted(node_urls), pa.string()))

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
                "out_partial": pa.array(np.zeros(in_counts.num_rows, np.int64), pa.int64()),
                "in_partial": in_counts.column("count_all").cast(pa.int64()),
            }
        )
        return pa.concat_tables([page_rows, in_rows])

    return (
        pages_ds.map_batches(
            extract_links_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("url")
        .aggregate(
            Sum("out_partial", alias_name="out_deg"),
            Sum("in_partial", alias_name="in_deg"),
        )
    )


def _contrib_sums(
    dst: np.ndarray, src: np.ndarray, ranks: np.ndarray, inv_out: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dst contribution sums over a (dst, src)-sorted run — the ONE
    float-summation primitive both pagerank modes and the single-process
    oracle share, so rank floats are bit-identical on any partitioning.
    ``ranks``/``inv_out`` may be full vectors or bucket slices, as long
    as ``src`` is pre-offset to index them."""
    if len(dst) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    c = ranks[src] * inv_out[src]
    starts = np.flatnonzero(np.r_[True, np.diff(dst) != 0])
    return dst[starts], np.add.reduceat(c, starts)


def _bucketed_edge_ids(edges_ds, urls_arr: pa.Array, per_bucket: int):
    """Edges as (src_id, dst_id) int64 rows, RANGE-bucketed by dst
    (``dst_id // per_bucket`` — dst-contiguous buckets) and sorted by
    (dst_id, src_id) within each bucket; materialized once and reused by
    every PageRank iteration."""
    import ray

    urls_ref = ray.put(urls_arr)

    def to_ids(t: pa.Table) -> pa.Table:
        ua = ray.get(urls_ref)
        src_id = pc.index_in(t.column("src"), value_set=ua).cast(pa.int64())
        dst_id = pc.index_in(t.column("dst"), value_set=ua).cast(pa.int64())
        bucket = pc.divide(dst_id, per_bucket).cast(pa.int32())
        return pa.table({"src_id": src_id, "dst_id": dst_id, "bucket": bucket})

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

    def out_partial(self) -> tuple[np.ndarray, np.ndarray]:
        """(unique src ids, counts) — integer partials, summation-order-free."""
        return np.unique(self.src, return_counts=True)

    def contribs(self, ranks, inv_out) -> tuple[np.ndarray, np.ndarray]:
        # called with ObjectRefs — Ray auto-derefs zero-copy from plasma
        return _contrib_sums(self.dst, self.src, ranks, inv_out)


def _out_degree_vector(edges_b, n: int) -> np.ndarray:
    """Exact out-degree per node id from the bucketed edge Dataset: one
    streaming pass of per-batch partial counts + a single-key groupby
    (integer sums are summation-order-free)."""
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
    node_urls: list[str],
    *,
    n_iters: int = _N_ITERS,
    damping: float = _DAMPING,
    mode: str = "auto",
    n_buckets: int | None = None,
):
    """PageRank over the corpus link graph → (url, rank_ppb).

    ``rank_ppb`` is the rank quantized to parts-per-billion (int64) so
    the correctness gate compares integers; the underlying floats are
    already bit-deterministic (see ``_contrib_sums``). ``mode``:
    "broadcast" (O(nodes) driver/broadcast rank vector, one map pass per
    iteration; returns pa.Table), "shuffle" (ranks stay a Dataset, two
    single-key exchanges per iteration, no O(nodes) driver state;
    returns a Dataset — the ≥``SHUFFLE_MODE_NODES`` path), or "auto".
    """
    import ray

    urls_sorted = sorted(node_urls)
    n = len(urls_sorted)
    if n == 0:
        return pa.table(
            {"url": pa.array([], pa.string()), "rank_ppb": pa.array([], pa.int64())}
        )
    if mode == "auto":
        mode = "shuffle" if n > SHUFFLE_MODE_NODES else "broadcast"
    if mode not in ("broadcast", "shuffle"):
        raise ValueError(f"mode must be 'auto', 'broadcast' or 'shuffle', got {mode!r}")
    if n_buckets is None:
        # ~100k nodes of rank state per bucket: small graphs get few fat
        # buckets (shuffle rounds are fixed-overhead-bound — measured 26s
        # vs 41s at 16 vs 64 buckets on a 6k-node graph), huge graphs cap
        # at 4096 buckets ≈ cluster-core scale. Ranks are bit-identical
        # under ANY bucketing (per-dst runs never split), so this is purely
        # a performance knob.
        n_buckets = max(16, min(4096, -(-n // 100_000)))
    per_bucket = max(1, -(-n // n_buckets))  # ceil(n / n_buckets)
    urls_arr = pa.array(urls_sorted, pa.string())
    edges_ds = build_edges(pages_ds, urls_sorted)
    edges_b = _bucketed_edge_ids(edges_ds, urls_arr, per_bucket)

    if mode == "shuffle":
        out_vec = _out_degree_vector(edges_b, n)
        inv_out = np.zeros(n, dtype=np.float64)
        nz = out_vec > 0
        inv_out[nz] = 1.0 / out_vec[nz]
        return _pagerank_shuffle(
            edges_b,
            urls_arr,
            inv_out,
            n_iters=n_iters,
            damping=damping,
            per_bucket=per_bucket,
        )

    # Pin whole-bucket edge blocks into a round-robin actor pool ONCE;
    # each iteration is a round of actor calls (no per-iteration Dataset
    # job). Blocks hold whole dst-buckets (a map_groups group table only
    # splits above the 128MB block target), so per-dst runs stay intact
    # per actor and ranks remain bit-identical to pagerank_reference.
    base = (1.0 - damping) / n
    block_refs = edges_b.to_arrow_refs()
    shard_cls = ray.remote(num_cpus=1)(_EdgeShard)
    n_actors = max(1, min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))))
    actors = [shard_cls.remote(block_refs[i::n_actors]) for i in range(n_actors)]
    try:
        out_vec = np.zeros(n, dtype=np.int64)
        for uniq, cnt in ray.get([a.out_partial.remote() for a in actors]):
            out_vec[uniq] += cnt
        inv_out = np.zeros(n, dtype=np.float64)
        nz = out_vec > 0
        inv_out[nz] = 1.0 / out_vec[nz]
        inv_ref = ray.put(inv_out)
        ranks = np.full(n, 1.0 / n, dtype=np.float64)
        for _ in range(n_iters):
            ranks_ref = ray.put(ranks)
            parts = ray.get(
                [a.contribs.remote(ranks_ref, inv_ref) for a in actors]
            )
            new = np.full(n, base, dtype=np.float64)
            dsts = np.concatenate([p[0] for p in parts])
            if len(dsts):
                sums = np.concatenate([p[1] for p in parts])
                order = np.argsort(dsts, kind="stable")
                np.add.at(new, dsts[order], damping * sums[order])
            ranks = new
    finally:
        for a in actors:
            ray.kill(a)
    return pa.table(
        {
            "url": urls_arr,
            "rank_ppb": pa.array(np.round(ranks * 1e9).astype(np.int64), pa.int64()),
        }
    )


def _pagerank_shuffle(edges_b, urls_arr, inv_out, *, n_iters, damping, per_bucket):
    """Fully-distributed PageRank (no O(nodes) driver state): ranks live
    in a Dataset; each iteration is (1) a union + single-key shuffle
    joining rank rows to their src-bucket's edges, (2) a dst-bucket
    shuffle reducing contributions with the shared deterministic
    ``_contrib_sums``. Per-task state is a bucket slice of ``inv_out``
    (one ``ray.put`` per bucket, once), never the full vector."""
    import ray
    import ray.data

    n = len(urls_arr)
    base = (1.0 - damping) / n
    inv_refs = [
        ray.put(inv_out[lo : min(lo + per_bucket, n)])
        for lo in range(0, n, per_bucket)
    ]

    def with_src_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "gb", pc.divide(t.column("src_id"), per_bucket).cast(pa.int32())
        )

    edges_src_bucketed = edges_b.map_batches(
        with_src_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # dst-buckets that receive at least one edge, computed ONCE: nodes in
    # uncovered buckets always settle at the base rank after the reduce
    covered = set()
    for row in (
        edges_b.map_batches(
            lambda t: pa.table(
                {
                    "db": pa.array(
                        np.unique(
                            t.column("dst_id").to_numpy(zero_copy_only=False)
                            // per_bucket
                        ).astype(np.int32),
                        pa.int32(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("db")
        .count()
        .iter_rows()
    ):
        covered.add(int(row["db"]))
    covered_arr = np.array(sorted(covered), dtype=np.int64)

    ranks_ds = ray.data.from_arrow(
        pa.table(
            {
                "node_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "rank": pa.array(np.full(n, 1.0 / n), pa.float64()),
            }
        )
    )

    # nodes in buckets with no in-edges always settle at the base rank —
    # that row set is CONSTANT across iterations, so build it ONCE.
    # (Recomputing it from the previous ranks_ds each round also made the
    # rank Dataset's block count grow by the shuffle width per iteration:
    # sort-shuffle output partitions track input block count, so shuffle
    # task counts and driver sort state grew linearly with iterations —
    # ~2000 tasks by iteration 10 at a 6000-node graph.)
    def missing_rows(t: pa.Table) -> pa.Table:
        node = t.column("node_id").to_numpy(zero_copy_only=False)
        keep = ~np.isin(node // per_bucket, covered_arr)
        return pa.table(
            {
                "node_id": pa.array(node[keep], pa.int64()),
                "rank": pa.array(np.full(int(keep.sum()), base), pa.float64()),
            }
        )

    uncovered_ds = ranks_ds.map_batches(
        missing_rows, batch_format="pyarrow"
    ).materialize()

    # bound the rank Dataset's block count per round: coalesce (no shuffle)
    # back to ~one block per bucket before feeding the next iteration
    n_rank_blocks = max(1, min(len(inv_refs), 64))

    for _ in range(n_iters):
        # (1) pad rank rows and edge rows to one schema keyed by the SRC
        # bucket; a single groupby(gb) co-locates each bucket's ranks with
        # the edges that read them; in-group lookup is a vectorized slice
        def rank_rows(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "gb": pc.divide(t.column("node_id"), per_bucket).cast(pa.int32()),
                    "src_id": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                    "dst_id": t.column("node_id").cast(pa.int64()),
                    "rank": t.column("rank"),
                }
            )

        def edge_rows(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "gb": t.column("gb"),
                    "src_id": t.column("src_id"),
                    "dst_id": t.column("dst_id"),
                    "rank": pa.array(np.full(t.num_rows, np.nan), pa.float64()),
                }
            )

        unioned = ranks_ds.map_batches(rank_rows, batch_format="pyarrow").union(
            edges_src_bucketed.map_batches(edge_rows, batch_format="pyarrow")
        )

        def join_group(g: pa.Table) -> pa.Table:
            src = g.column("src_id").to_numpy(zero_copy_only=False)
            dst = g.column("dst_id").to_numpy(zero_copy_only=False)
            is_rank = src < 0
            b = int(g.column("gb")[0].as_py())
            lo = b * per_bucket
            io = ray.get(inv_refs[b])
            # contribution factor per node of THIS bucket (slice-sized)
            lookup = np.zeros(len(io), dtype=np.float64)
            node_local = dst[is_rank] - lo
            lookup[node_local] = (
                g.column("rank").to_numpy(zero_copy_only=False)[is_rank]
                * io[node_local]
            )
            e_src = src[~is_rank]
            e_dst = dst[~is_rank]
            return pa.table(
                {
                    "dst_id": pa.array(e_dst, pa.int64()),
                    "src_id": pa.array(e_src, pa.int64()),
                    "c": pa.array(lookup[e_src - lo], pa.float64()),
                    "db": pa.array((e_dst // per_bucket).astype(np.int32), pa.int32()),
                }
            )

        contribs = unioned.groupby("gb").map_groups(join_group, batch_format="pyarrow")

        # (2) reduce per dst with the shared deterministic primitive and
        # rebuild the bucket's full node-id range of rank rows
        def reduce_group(g: pa.Table) -> pa.Table:
            order = pc.sort_indices(
                g, sort_keys=[("dst_id", "ascending"), ("src_id", "ascending")]
            )
            g = g.take(order)
            dst = g.column("dst_id").to_numpy(zero_copy_only=False)
            c = g.column("c").to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(np.r_[True, np.diff(dst) != 0])
            sums = np.add.reduceat(c, starts)
            b = int(dst[0] // per_bucket)
            lo, hi = b * per_bucket, min((b + 1) * per_bucket, n)
            ranks = np.full(hi - lo, base, dtype=np.float64)
            np.add.at(ranks, dst[starts] - lo, damping * sums)
            return pa.table(
                {
                    "node_id": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64()),
                    "rank": pa.array(ranks, pa.float64()),
                }
            )

        reduced = contribs.groupby("db").map_groups(reduce_group, batch_format="pyarrow")

        ranks_ds = (
            reduced.union(uncovered_ds)
            .repartition(n_rank_blocks, shuffle=False)
            .materialize()
        )

    urls_ref = ray.put(urls_arr)

    def finish(t: pa.Table) -> pa.Table:
        ua = ray.get(urls_ref)
        node = t.column("node_id").to_numpy(zero_copy_only=False)
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "url": pc.take(ua, pa.array(node, pa.int64())),
                "rank_ppb": pa.array(np.round(rank * 1e9).astype(np.int64), pa.int64()),
            }
        )

    return ranks_ds.map_batches(finish, batch_format="pyarrow")


def _graph_buckets(n: int) -> int:
    """Shared bucket-count rule (see pagerank's n_buckets comment) — ONE
    definition so hits/hits_reference partition identically."""
    return max(1, -(-n // max(16, min(4096, -(-n // 100_000)))))


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
) -> tuple[np.ndarray, np.ndarray]:
    """The pinned HITS iteration both the distributed and the reference
    paths share: auth' = Σ hub over in-edges, L1-normalize; hub' = Σ
    auth' over out-edges, L1-normalize."""
    hub = np.full(n, 1.0 / n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(n_iters):
        d, s = auth_sums(hub)
        auth = np.zeros(n, dtype=np.float64)
        auth[d] = s
        tot = np.sum(auth)
        if tot > 0:
            auth = auth / tot
        b, sr, ps = hub_parts(auth)
        hub = _fold_hub_partials(n, b, sr, ps)
        tot = np.sum(hub)
        if tot > 0:
            hub = hub / tot
    return auth, hub


def hits(
    pages_ds,
    node_urls: list[str],
    *,
    n_iters: int = _N_ITERS,
    n_actors: int | None = None,
) -> pa.Table:
    """HITS hubs/authorities over the corpus link graph →
    (url, auth_ppb, hub_ppb) (Kleinberg 1999; L1 normalization, pinned
    update order in :func:`_hits_iterate`).

    Same shape as broadcast-mode PageRank: the dst-bucketed edge dataset
    is pinned once into an actor pool, each iteration is one RPC round
    per direction with the O(nodes) score vector shipped via ``ray.put``.
    Determinism across cluster sizes comes from per-bucket hub partials
    folded in bucket order (see :class:`_HitsShard`), so the result is
    bit-identical to :func:`hits_reference` at any actor count.
    """
    import ray

    urls_sorted = sorted(node_urls)
    n = len(urls_sorted)
    if n == 0:
        return pa.table(
            {"url": pa.array([], pa.string()),
             "auth_ppb": pa.array([], pa.int64()),
             "hub_ppb": pa.array([], pa.int64())}
        )
    per_bucket = _graph_buckets(n)
    urls_arr = pa.array(urls_sorted, pa.string())
    edges_b = _bucketed_edge_ids(build_edges(pages_ds, urls_sorted), urls_arr, per_bucket)
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

        auth, hub = _hits_iterate(n, n_iters, auth_sums, hub_parts)
    finally:
        for a in actors:
            ray.kill(a)
    return pa.table(
        {
            "url": urls_arr,
            "auth_ppb": pa.array(np.round(auth * 1e9).astype(np.int64), pa.int64()),
            "hub_ppb": pa.array(np.round(hub * 1e9).astype(np.int64), pa.int64()),
        }
    )


def hits_reference(
    urls: list[str],
    links_per_url: dict[str, list[str]],
    *,
    n_iters: int = _N_ITERS,
) -> pa.Table:
    """Single-process HITS oracle — same edges, same per-bucket partial
    fold, no Ray. Returns (url, auth_ppb, hub_ppb) sorted by url."""
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

    auth, hub = _hits_iterate(n, n_iters, auth_sums, hub_parts)
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
) -> dict[str, int]:
    """Single-process oracle: same graph semantics, same deterministic
    summation primitive, no Ray. Used by expected.py to materialize the
    pagerank ground truth the DuckDB oracle reads."""
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
    base = (1.0 - damping) / n
    ranks = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iters):
        d, s = _contrib_sums(dst, src, ranks, inv_out)
        new = np.full(n, base, dtype=np.float64)
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
