"""Sharded URL-seen set — the distributed form of the reference's
``visited sync.Map`` claim-before-enqueue semantics (crawler.go:68, 754-756).

``LoadOrStore`` becomes ``contains_and_add`` on an actor pool sharded by
``hash(canonical_url) % num_shards``: each shard holds

- a cuckoo filter (fast approximate membership, vectorized numpy probes) for
  the hot-path negative check, and
- an exact Python set of canonical URLs — the authority; the filter alone is
  never trusted for a positive (no false-positive drops, per north_rule
  "cuckoo filter + exact per-partition hash sets").

Shards journal their additions per wave so the whole pool can be rebuilt
from Parquet checkpoints after a failure (see pipelines/crawl.py). At
cluster scale the shard count is sized so each exact set fits one worker's
heap (10^10 URLs / 4096 shards ≈ 2.4M URLs/shard ≈ 200MB).

Failure model — deliberately FAIL-STOP at wave granularity: shards are
created WITHOUT ``max_restarts``, so a dead shard raises out of the next
``ray.get`` instead of being silently replaced by an empty restart (a
fresh shard would drop its claims → re-crawled URLs → duplicate output,
the one wrongness the engine may never emit). The crash-consistent unit
is the WAVE: the journals checkpoint at each wave boundary, and resume
(``restore_from_journals``, shard-local reads) replays the crawl from the
last complete wave with the identical final output (test-pinned by
test_resume_identical).

This is the one deliberately non-Dataset piece of the engine: a shared
mutable index that map_batches tasks consult mid-stream cannot be expressed
as a Dataset op without materializing an anti-join per wave. (The bulk
*wave-level* dedup IS a Dataset groupby — the actor pool only arbitrates
claims across waves.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

_EMPTY = 0  # fingerprint sentinel (fingerprints are forced nonzero)


class CuckooFilter:
    """Minimal vectorized cuckoo filter: 4-slot buckets, uint16 fingerprints.

    ~2 bytes/key at 95% load; false-positive rate ≈ 2^-13 per probe. Used
    only as a fast negative pre-check — positives are confirmed against the
    exact set.
    """

    def __init__(self, capacity: int):
        n_buckets = max(8, int(capacity / 4 / 0.84))
        # power of two for cheap index masking
        self.n_buckets = 1 << (n_buckets - 1).bit_length()
        self.mask = self.n_buckets - 1
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.count = 0

    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = ((h >> 32) & 0xFFFF).astype(np.uint16)
        fp[fp == _EMPTY] = 1
        return fp

    def _indices(self, h: np.ndarray, fp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        i1 = (h & self.mask).astype(np.int64)
        # standard partial-key displacement: i2 = i1 xor hash(fp)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1E995)) & self.mask
        return i1, i2

    def contains(self, h: np.ndarray) -> np.ndarray:
        fp = self._fingerprint(h)
        i1, i2 = self._indices(h, fp)
        t = self.table
        fpc = fp[:, None]
        return ((t[i1] == fpc) | (t[i2] == fpc)).any(axis=1)

    def add(self, h: np.ndarray) -> None:
        fp_arr = self._fingerprint(h)
        i1_arr, i2_arr = self._indices(h, fp_arr)
        rng = np.random.default_rng(0xC0FFEE)
        for fp, i1, i2 in zip(fp_arr, i1_arr, i2_arr):
            placed = False
            for idx in (i1, i2):
                row = self.table[idx]
                empty = np.where(row == _EMPTY)[0]
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if placed:
                self.count += 1
                continue
            # evict loop
            idx = int(i1)
            cur = fp
            for _ in range(500):
                slot = int(rng.integers(0, 4))
                cur, self.table[idx, slot] = self.table[idx, slot], cur
                idx = (idx ^ (int(cur) * 0x5BD1E995)) & self.mask
                row = self.table[idx]
                empty = np.where(row == _EMPTY)[0]
                if len(empty):
                    row[empty[0]] = cur
                    placed = True
                    break
            self.count += 1
            if not placed:
                self._grow()

    def _grow(self) -> None:
        # Rebuilding from fingerprints alone is lossy; the exact set is the
        # authority, so on overflow we just double and re-probe lazily by
        # accepting a degraded filter (all lookups fall through to the exact
        # set). Simplest safe behavior: widen table, keep old entries' slots.
        old = self.table
        self.n_buckets *= 2
        self.mask = self.n_buckets - 1
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.table[: old.shape[0]] = old


def url_hash(urls) -> np.ndarray:
    """Stable 64-bit hash of canonical URLs (pandas hash_array: vectorized,
    process-independent). Used for sharding, bucketing and filter probes."""
    arr = np.asarray(urls, dtype=object)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the URL-seen set. All URLs routed here satisfy
    ``url_hash(url) % num_shards == shard_id``."""

    def __init__(self, shard_id: int, capacity_hint: int = 1 << 16):
        self.shard_id = shard_id
        self.exact: set[str] = set()
        self.filter = CuckooFilter(capacity_hint)
        self.journal: list[str] = []  # additions since last checkpoint drain

    def contains_and_add(self, urls: list[str]) -> np.ndarray:
        """Atomic LoadOrStore over a batch: returns mask of NEW urls (True =
        first claim, caller may enqueue). Duplicate urls within the batch:
        first occurrence wins."""
        h = url_hash(urls)
        maybe = self.filter.contains(h)  # False ⇒ definitely not in exact set
        new_mask = np.zeros(len(urls), dtype=bool)
        to_add_idx = []
        batch_dups: set[str] = set()
        for i, u in enumerate(urls):
            if (maybe[i] and u in self.exact) or u in batch_dups:
                continue
            batch_dups.add(u)
            self.exact.add(u)
            self.journal.append(u)
            new_mask[i] = True
            to_add_idx.append(i)
        if to_add_idx:
            self.filter.add(h[to_add_idx])
        return new_mask

    def bulk_load(self, urls: list[str]) -> int:
        """Checkpoint restore path: add without journaling."""
        h = url_hash(urls)
        fresh = [u for u in urls if u not in self.exact]
        if fresh:
            self.exact.update(fresh)
            self.filter.add(url_hash(fresh))
        return len(self.exact)

    def bulk_load_files(self, paths: list[str], filter_mod: int | None = None) -> int:
        """Restore from journal Parquet files read INSIDE the actor — the
        driver passes paths, never URL lists (at 10^10 URLs a driver-side
        relay is an OOM). ``filter_mod`` is set when the checkpoint was
        written with a different shard count: this shard then keeps only the
        urls routed to it under the CURRENT layout
        (url_hash % filter_mod == shard_id); with a matching layout each
        shard reads exactly its own files unfiltered."""
        import pyarrow.parquet as pq

        for p in paths:
            urls = pq.read_table(p, columns=["url"]).column("url").to_pylist()
            if filter_mod is not None and urls:
                mask = (url_hash(urls) % filter_mod) == self.shard_id
                urls = [u for u, m in zip(urls, mask) if m]
            self.bulk_load(urls)
        return len(self.exact)

    def drain_journal(self) -> list[str]:
        j, self.journal = self.journal, []
        return j

    def checkpoint_journal(self, path: str) -> int:
        """Write (and clear) this shard's journal as Parquet — inside the
        actor, so the driver never relays the URL lists."""
        n = len(self.journal)
        if n:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table({"url": pa.array(self.journal, pa.string())}), path
            )
            self.journal = []
        return n

    def size(self) -> int:
        return len(self.exact)


class SeenSet:
    """Driver-side handle for the shard pool."""

    def __init__(self, num_shards: int, capacity_hint: int = 1 << 16):
        self.num_shards = num_shards
        self.shards = [SeenShard.remote(i, capacity_hint) for i in range(num_shards)]

    def contains_and_add(self, urls: list[str]) -> np.ndarray:
        """Batch claim across shards; preserves input order in the mask."""
        if not urls:
            return np.zeros(0, dtype=bool)
        shard_of = (url_hash(urls) % self.num_shards).astype(np.int64)
        mask = np.zeros(len(urls), dtype=bool)
        futures, idxs = [], []
        for s in range(self.num_shards):
            idx = np.where(shard_of == s)[0]
            if len(idx):
                futures.append(self.shards[s].contains_and_add.remote([urls[i] for i in idx]))
                idxs.append(idx)
        for fut, idx in zip(ray.get(futures), idxs):
            mask[idx] = fut
        return mask

    def drain_journals(self) -> list[list[str]]:
        return ray.get([s.drain_journal.remote() for s in self.shards])

    def checkpoint_journals(self, seen_dir: str) -> int:
        """All shards write their deltas in parallel; returns total new urls."""
        import os

        futs = [
            s.checkpoint_journal.remote(os.path.join(seen_dir, f"shard-{i:04d}.parquet"))
            for i, s in enumerate(self.shards)
        ]
        return sum(ray.get(futs))

    def bulk_load(self, urls: list[str]) -> None:
        shard_of = (url_hash(urls) % self.num_shards).astype(np.int64)
        futs = []
        for s in range(self.num_shards):
            idx = np.where(shard_of == s)[0]
            if len(idx):
                futs.append(self.shards[s].bulk_load.remote([urls[i] for i in idx]))
        ray.get(futs)

    def restore_from_journals(self, seen_dirs: list[str], written_shards: int | None) -> None:
        """Rebuild the pool from checkpointed journal files, shard-locally.

        Journal files are named shard-%04d.parquet by the shard that wrote
        them. When ``written_shards`` matches this pool's layout each shard
        reads only its own files; otherwise (or when the writer count is
        unknown — old manifests) every shard scans all files filtered by the
        current hash routing. Either way URLs flow storage → shard actor
        directly; the driver only lists paths."""
        import os

        futs = []
        if written_shards == self.num_shards:
            for i, s in enumerate(self.shards):
                mine = [
                    p
                    for d in seen_dirs
                    for p in [os.path.join(d, f"shard-{i:04d}.parquet")]
                    if os.path.exists(p)
                ]
                if mine:
                    futs.append(s.bulk_load_files.remote(mine, None))
        else:
            all_files = [
                os.path.join(d, f)
                for d in seen_dirs
                if os.path.isdir(d)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
            if all_files:
                futs = [
                    s.bulk_load_files.remote(all_files, self.num_shards)
                    for s in self.shards
                ]
        ray.get(futs)

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
