"""Candidate-edge stages: flatten extracted links, admission-filter against
the seed (M5: domain / path-prefix, crawler.go:751-791), local pre-dedup
(combiner before the wave groupby), and the seen-set claim stage.

All operate on pyarrow batches inside map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.seen import SeenSet, url_hash
from ..urlnorm import URLError, extract_domain, is_same_domain, is_same_path_prefix

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("host", pa.string()),
        ("bucket", pa.int32()),
    ]
)


def empty_candidates() -> pa.Table:
    return CANDIDATE_SCHEMA.empty_table()


def frontier_columns(urls: list[str], depths, partitions: int) -> pa.Table:
    """Attach host + bucket columns to (url, depth) rows."""
    hosts = []
    for u in urls:
        try:
            hosts.append(extract_domain(u))
        except URLError:
            hosts.append("")
    buckets = (url_hash(urls) % partitions).astype(np.int32) if urls else np.zeros(0, np.int32)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "host": pa.array(hosts, pa.string()),
            "bucket": pa.array(buckets, pa.int32()),
        }
    )


def admit_link(link: str, seeds: list[str], same_path_prefix: bool) -> bool:
    """Queue-admission filter (crawler.go:758-775) generalized to a seed
    list: a link is admitted if it matches ANY seed's domain/prefix."""
    for seed in seeds:
        try:
            if same_path_prefix:
                if is_same_path_prefix(seed, link):
                    return True
            elif is_same_domain(seed, link):
                return True
        except URLError:
            continue
    return False


def flatten_candidates(
    batch: pa.Table,
    *,
    seed_urls: list[str],
    same_domain: bool,
    same_path_prefix: bool,
    partitions: int,
) -> pa.Table:
    """results(url, depth, links) → admitted candidate rows (link, depth+1).

    Applies the reference's queue-admission filter (crawler.go:758-775)
    vectorized over the flattened edge list, then pre-dedups within the
    batch keeping min depth (combiner for the global wave groupby).
    """
    links_col = batch.column("links")
    flat = pc.list_flatten(links_col)
    if len(flat) == 0:
        return empty_candidates()
    parents = pc.list_parent_indices(links_col)
    depths = pc.add(pc.cast(batch.column("depth").take(parents), pa.int32()), 1)

    urls = flat.to_pylist()
    keep = np.ones(len(urls), dtype=bool)
    if same_domain:
        cache: dict[str, bool] = {}
        for i, link in enumerate(urls):
            v = cache.get(link)
            if v is None:
                v = cache[link] = admit_link(link, seed_urls, same_path_prefix)
            keep[i] = v
    tbl = pa.table({"url": flat, "depth": depths}).filter(pa.array(keep))
    # local combiner: min depth per url within this batch
    tbl = tbl.group_by("url").aggregate([("depth", "min")]).rename_columns(["url", "depth"])
    urls2 = tbl.column("url").to_pylist()
    out = frontier_columns(urls2, tbl.column("depth").to_pylist(), partitions)
    return out


def claim_batch(batch: pa.Table, *, shard_handles, num_shards: int) -> pa.Table:
    """Seen-set claim (distributed LoadOrStore): keeps only first-time URLs.

    A plain task function — the mutable state lives in the SeenShard actors,
    whose handles ride along in fn_kwargs; nothing to warm up per wave."""
    urls = batch.column("url").to_pylist()
    if not urls:
        return batch
    seen = SeenSet.__new__(SeenSet)
    seen.num_shards = num_shards
    seen.shards = shard_handles
    mask = seen.contains_and_add(urls)
    return batch.filter(pa.array(mask))
