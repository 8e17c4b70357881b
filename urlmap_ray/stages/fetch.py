"""Corpus fetch stage — the engine's replacement for live HTTP GET (S1).

"Fetching" a frontier URL means looking its body up in the url-hash-bucketed
``pages`` Parquet corpus. Rather than a relational join (which would shuffle
the 100TB pages side), each fetch task does a *selective read*: it groups its
batch's URLs by bucket and scans only those bucket files with an
``url ∈ batch`` predicate — bucket files are written sorted by url with
small row groups, so parquet statistics prune most of the file. The pages
table itself never moves; only the (small) frontier shuffles.

Misses come back with ``status=0`` (the reference's network-error case,
crawler.go:323-326: a dangling link deterministically never exists, so it is
recorded failed and never retried); hits carry the corpus row's captured
HTTP status — 200 pages flow on with their body, 4xx/5xx pages surface as
error results with html nulled (crawler.go:331-334: an error body is never
parsed for links).

The reference's HTTP retry policy (client.go:63-83: 5xx/network errors
retried, bounded attempts) IS represented, as data: a corpus page with
``flaky_fails = k > 0`` returns a transient 503 (``transient=true``, no
body) on fetch attempts 1..k and its captured row from attempt k+1 on. The
frontier's ``attempt`` column (default 1) selects the behavior; the crawl
engine re-enqueues transient rows for the next wave until
``CrawlConfig.max_attempts`` is spent, then records the final 503. Worker
failures are covered by Ray task retries instead.

Used as ``map_batches(CorpusFetcher, fn_constructor_kwargs=...,
concurrency=N, batch_format="pyarrow")`` — an actor pool so the per-bucket
``pyarrow.dataset`` handles (file metadata) are opened once per actor, not
per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


# Per-bucket pyarrow dataset handles, cached per worker process. Ray Data
# reuses worker processes across tasks and dataset executions, so the cache
# survives the whole crawl (waves re-launch stages every iteration; an actor
# pool would be re-created per wave, costing seconds of spin-up each time —
# worker-cached task state gives the same amortization without the respawns).
_BUCKET_CACHE: dict[str, pads.Dataset] = {}


def _bucket_ds(pages_dir: str, b: int) -> pads.Dataset:
    key = f"{pages_dir}/bucket-{b:05d}.parquet"
    ds = _BUCKET_CACHE.get(key)
    if ds is None:
        ds = pads.dataset(key, format="parquet")
        _BUCKET_CACHE[key] = ds
    return ds


def fetch_batch(batch: pa.Table, *, pages_dir: str, partitions: int) -> pa.Table:
    """Look up each frontier URL's body in its corpus bucket (selective read).

    Fully vectorized: per bucket a range-pruned read + ``pc.is_in``
    membership filter, then one ``pc.index_in``/``take`` aligns hit bodies
    to the batch's row order (misses → null html, status 0)."""
    url_col = batch.column("url")
    buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
    hit_parts: list[pa.Table] = []
    for b in np.unique(buckets):
        wanted = url_col.filter(pa.array(buckets == b))
        # Range predicate on the url-sorted bucket file: row-group min/max
        # stats prune everything outside [lo, hi]. The engine range-sorts
        # the frontier by (bucket, url), so a task's wanted set is a tight
        # range and only its contiguous slice is read/decompressed. Exact
        # membership is applied in memory after the pruned read.
        mm = pc.min_max(wanted)
        bds = _bucket_ds(pages_dir, int(b))
        cols = ["url", "html", "status"]
        # pre-flaky_fails corpora (hand-built test fixtures) → all-stable
        if "flaky_fails" in bds.schema.names:
            cols.append("flaky_fails")
        loaded = bds.to_table(
            columns=cols,
            filter=(pc.field("url") >= mm["min"].as_py())
            & (pc.field("url") <= mm["max"].as_py()),
        )
        if "flaky_fails" not in loaded.column_names:
            loaded = loaded.append_column(
                "flaky_fails", pa.array([0] * loaded.num_rows, pa.int32())
            )
        hit_parts.append(
            loaded.filter(pc.is_in(loaded.column("url"), value_set=wanted.combine_chunks()))
        )
    hits = pa.concat_tables(hit_parts) if hit_parts else pa.table(
        {
            "url": pa.array([], pa.string()),
            "html": pa.array([], pa.binary()),
            "status": pa.array([], pa.int32()),
            "flaky_fails": pa.array([], pa.int32()),
        }
    )
    idx = pc.index_in(url_col, value_set=hits.column("url").combine_chunks())
    if hits.num_rows:
        html = pc.take(hits.column("html").combine_chunks(), idx)
        status = pc.take(hits.column("status").combine_chunks(), idx).fill_null(0)
        flaky = pc.take(hits.column("flaky_fails").combine_chunks(), idx).fill_null(0)
    else:
        html = pa.nulls(batch.num_rows, pa.binary())
        status = pa.nulls(batch.num_rows, pa.int32()).fill_null(0)
        flaky = pa.nulls(batch.num_rows, pa.int32()).fill_null(0)
    # Transient-failure window (client.go:63-83 as data): while the 1-based
    # fetch attempt is within the page's flaky_fails window, the "response"
    # is a bodiless 503 and the row is flagged transient — the engine
    # decides retry-vs-final from CrawlConfig.max_attempts.
    if "attempt" in batch.column_names:
        attempt = pc.cast(batch.column("attempt"), pa.int32())
    else:
        attempt = pa.array([1] * batch.num_rows, pa.int32())
    transient = pc.less_equal(attempt, pc.cast(flaky, pa.int32()))
    status = pc.if_else(transient, pa.scalar(503, pa.int32()), pc.cast(status, pa.int32()))
    # Reference status gate (crawler.go:331-334): a non-2xx/3xx response is
    # an error result — the URL counts as visited but its body is never
    # parsed. Nulling html here keeps the extract stage status-agnostic.
    html = pc.if_else(pc.equal(status, 200), html, pa.scalar(None, pa.binary()))
    return pa.table(
        {
            "url": url_col,
            "depth": batch.column("depth"),
            "attempt": attempt,
            "status": pc.cast(status, pa.int32()),
            "transient": transient,
            "html": html,
        }
    )


class CorpusFetcher:
    """Actor-pool form of fetch_batch (use when per-actor state must be
    pinned, e.g. remote filesystems with expensive connections)."""

    def __init__(self, pages_dir: str, partitions: int):
        self.pages_dir = pages_dir
        self.partitions = partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, pages_dir=self.pages_dir, partitions=self.partitions)
