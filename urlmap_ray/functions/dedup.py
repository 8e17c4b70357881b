"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard verification, and embedding-cosine near-dup.

Scale shape of every near-dup variant is the same three-step Ray Data
pattern (no pairwise all-to-all over the corpus):

    map_batches(signature)            # row-local: shingles → sketch
    flat_map to (band_key, id)        # few rows per doc
    groupby(band_key) → candidate pairs → verify (exact measure) → pairs

Only documents sharing a band bucket are ever compared, so the candidate
set is output-sized, not O(n²). Exact dedup groups by a 128-bit content
hash rather than by the full text so the shuffle moves 16-byte keys, not
documents.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"\S+")

# ---------------------------------------------------------------------------
# Exact dedup


def content_hash_batch(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "text_hash": pa.array(hashes, pa.string()),
        }
    )


def dedup_exact(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest id per exact content; report duplicate counts.

    Returns a Dataset with columns (text_hash, doc_id, dup_count). The
    shuffle key is the 128-bit content hash, never the document body."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        content_hash_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="doc_id"), Count(alias_name="dup_count")
    )
    return agg


# ---------------------------------------------------------------------------
# Shingles + MinHash


def _shingles(text: str, k: int = 3) -> set[str]:
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _hash_shingles(sh: set[str]) -> np.ndarray:
    if not sh:
        return np.zeros(0, dtype=np.uint64)
    import pandas as pd

    return pd.util.hash_array(np.asarray(sorted(sh), dtype=object))


_MINHASH_PERMS = 64
_rng = np.random.default_rng(0x5EED)
_MH_A = (_rng.integers(1, 1 << 61, size=_MINHASH_PERMS).astype(np.uint64) | np.uint64(1))
_MH_B = _rng.integers(0, 1 << 61, size=_MINHASH_PERMS).astype(np.uint64)


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    h = _hash_shingles(_shingles(text, k))
    if len(h) == 0:
        return np.zeros(_MINHASH_PERMS, dtype=np.uint64)
    # (a*x+b) over all shingle hashes, min per permutation — vectorized
    with np.errstate(over="ignore"):
        m = (h[None, :] * _MH_A[:, None] + _MH_B[:, None]).min(axis=1)
    return m


def minhash_bands_batch(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 16,
    k: int = 3,
) -> pa.Table:
    """Per doc: MinHash signature → one row per band with a bucket key."""
    rows_per_band = _MINHASH_PERMS // bands
    ids, band_keys = [], []
    for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        sig = minhash_signature(t or "", k)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            key = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:16]
            ids.append(i)
            band_keys.append(key)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "band_key": pa.array(band_keys, pa.string())}
    )


def _pairs_from_groups(group: pa.Table) -> pa.Table:
    """band bucket → unordered candidate pairs (a < b)."""
    ids = sorted(set(group.column("doc_id").to_pylist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def ngram_jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1, s2 = _shingles(t1, k), _shingles(t2, k)
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    union = len(s1 | s2)
    return inter / union if union else 0.0


def dedup_minhash_lsh(ds, *, threshold: float = 0.8, bands: int = 16, k: int = 3):
    """Near-dup pairs by MinHash banding, verified with exact n-gram Jaccard.

    Returns a Dataset of (a, b) int64 pairs with jaccard ≥ threshold.
    The verify step re-reads only the candidate docs' texts via a broadcast
    of the (small) candidate id set — at larger scale this becomes a
    hash-join of candidates against the documents table.
    """
    import ray

    banded = ds.map_batches(
        minhash_bands_batch, fn_kwargs=dict(bands=bands, k=k), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cand = (
        banded.groupby("band_key")
        .map_groups(_pairs_from_groups, batch_format="pyarrow")
    )
    # candidate pairs are few; dedup pairs then verify with exact jaccard
    pairs_tbl = cand.to_arrow_refs()
    tables = [ray.get(r) for r in pairs_tbl]
    pairs = pa.concat_tables([t for t in tables if t.num_rows] or [pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})])
    keys = set(zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()))
    if not keys:
        return ray.data.from_arrow(pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))

    need_ids = sorted({i for p in keys for i in p})
    docs = ds.map_batches(
        lambda b: b.select(["doc_id", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_arrow_refs()
    texts: dict[int, str] = {}
    for r in docs:
        t = ray.get(r)
        mask = pc.is_in(t.column("doc_id"), value_set=pa.array(need_ids, pa.int64()))
        sub = t.filter(mask)
        texts.update(zip(sub.column("doc_id").to_pylist(), sub.column("text").to_pylist()))
    out_a, out_b = [], []
    for a, b in sorted(keys):
        if ngram_jaccard(texts.get(a, ""), texts.get(b, ""), k) >= threshold:
            out_a.append(a)
            out_b.append(b)
    return ray.data.from_arrow(
        pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via shingle inverted index (no sketch, no pairwise scan)


def shingle_rows_batch(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> pa.Table:
    """Per doc: distinct k-word shingles → rows (doc_id, sh, n_sh).

    ``sh`` is a 64-bit shingle hash (the shuffle key — 8 bytes/row instead of
    the shingle string); ``n_sh`` is the doc's distinct-shingle count, carried
    on every row so the Jaccard denominator needs no second join."""
    ids, shs, ns = [], [], []
    for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        hashes = _hash_shingles(_shingles(t or "", k))
        n = len(hashes)
        for h in hashes:
            ids.append(i)
            shs.append(int(h) - (1 << 63))  # store signed
            ns.append(n)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "sh": pa.array(shs, pa.int64()),
            "n_sh": pa.array(ns, pa.int64()),
        }
    )


def _bucket_pairs(group: pa.Table, max_df: int | None = None) -> pa.Table:
    """One shingle-hash bucket (many distinct shingles) → co-occurrence
    pair rows (a,na,b,nb). Vectorized run detection on the sorted shingle
    column; the inner loop touches only runs with ≥2 docs (and ≤ max_df
    docs when a document-frequency cap is set)."""
    sh = group.column("sh").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    nsh = group.column("n_sh").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, sh))
    sh, doc, nsh = sh[order], doc[order], nsh[order]
    starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
    lens = np.diff(np.r_[starts, len(sh)])
    keep = lens > 1 if max_df is None else (lens > 1) & (lens <= max_df)
    a, na, b, nb = [], [], [], []
    for s, ln in zip(starts[keep], lens[keep]):
        d, n = doc[s : s + ln], nsh[s : s + ln]
        for i in range(ln):
            for j in range(i + 1, ln):
                a.append(d[i]); na.append(n[i]); b.append(d[j]); nb.append(n[j])
    return pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "na": pa.array(na, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "nb": pa.array(nb, pa.int64()),
        }
    )


def dedup_ngram_jaccard(
    ds,
    *,
    threshold: float = 0.8,
    k: int = 3,
    buckets: int = 4096,
    max_df: int | None = None,
):
    """EXACT n-gram Jaccard near-dup pairs, with no O(n²) pairwise scan.

    Sparse-join formulation: |A∩B| = number of shingles both docs share, so
        map_batches(shingles)                       # row-local
        groupby(sh % buckets) → co-occurrence pairs # bucketed inverted index
        groupby(a,b) count → intersection size      # tiny keys
        filter inter/(na+nb-inter) ≥ threshold      # row-local
    The inverted index groups by a BUCKET of the shingle hash, not the raw
    shingle: millions of 1-row groups make per-group dispatch the
    bottleneck (and Dataset.join's aggregator actors are worse at this
    shape), while a few thousand fat buckets keep the shuffle identical and
    the per-bucket pairing a vectorized run scan. Unlike MinHash
    (dedup_minhash_lsh) this is exact — the cost is one shuffle of
    (doc_id, shingle_hash) rows, i.e. O(total shingles). ``max_df`` is the
    web-scale knob: shingles in more than max_df docs generate no candidate
    pairs (boilerplate phrases contribute quadratic pair volume and
    near-zero Jaccard mass). Default None = exact, matching the SQL oracle;
    at 10^10 docs set e.g. max_df=1000 — the documented approximation.

    Returns Dataset of (a, b) with jaccard(a,b) ≥ threshold, a < b.
    Docs with no shingles (empty text) pair with nothing.
    """
    shingled = ds.map_batches(
        shingle_rows_batch, fn_kwargs=dict(k=k), batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda t: t.append_column(
            "shb", pc.cast(pc.bit_wise_and(t.column("sh"), buckets - 1), pa.int32())
        ),
        batch_format="pyarrow",
    )
    pairs = shingled.groupby("shb").map_groups(
        lambda g: _bucket_pairs(g, max_df=max_df), batch_format="pyarrow"
    )
    from ray.data.aggregate import Count

    inter = pairs.groupby(["a", "na", "b", "nb"]).aggregate(Count(alias_name="inter"))

    def keep(t: pa.Table) -> pa.Table:
        inter_c = t.column("inter").cast(pa.float64())
        union = pc.subtract(
            pc.add(t.column("na"), t.column("nb")), t.column("inter")
        ).cast(pa.float64())
        jac = pc.divide(inter_c, union)
        out = t.filter(pc.greater_equal(jac, threshold))
        return out.select(["a", "b"])

    return inter.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (weighted by term frequency)."""
    import pandas as pd

    words = _WORD_RE.findall((text or "").lower())
    if not words:
        return 0
    arr, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
    hashes = pd.util.hash_array(arr)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def simhash_batch(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    sims = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column(id_col),
            "simhash": pa.array([s - (1 << 63) for s in sims], pa.int64()),  # store signed
        }
    )


def simhash_bands_batch(batch: pa.Table, *, bands: int = 4) -> pa.Table:
    """Split each simhash into `bands` chunks; docs agreeing on any chunk are
    Hamming-≤(bands-1) candidates (pigeonhole)."""
    ids, keys = [], []
    width = 64 // bands
    mask = (1 << width) - 1
    for i, s in zip(batch.column("doc_id").to_pylist(), batch.column("simhash").to_pylist()):
        u = s + (1 << 63)
        for b in range(bands):
            chunk = (u >> (b * width)) & mask
            ids.append(i)
            keys.append(f"{b}:{chunk:x}")
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "band_key": pa.array(keys, pa.string())}
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def dedup_simhash(ds, *, max_hamming: int = 3, bands: int = 4):
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    bands must be > max_hamming for pigeonhole completeness."""
    import ray

    sigs = ds.map_batches(simhash_batch, batch_format="pyarrow", zero_copy_batch=True)
    sig_tables = [ray.get(r) for r in sigs.to_arrow_refs()]
    sig_tbl = pa.concat_tables([t for t in sig_tables if t.num_rows])
    sim_of = dict(
        zip(sig_tbl.column("doc_id").to_pylist(), sig_tbl.column("simhash").to_pylist())
    )
    banded = ray.data.from_arrow(sig_tbl).map_batches(
        simhash_bands_batch, fn_kwargs=dict(bands=bands), batch_format="pyarrow"
    )
    cand = banded.groupby("band_key").map_groups(_pairs_from_groups, batch_format="pyarrow")
    tables = [ray.get(r) for r in cand.to_arrow_refs()]
    keys = set()
    for t in tables:
        keys.update(zip(t.column("a").to_pylist(), t.column("b").to_pylist()))
    out_a, out_b, out_d = [], [], []
    for a, b in sorted(keys):
        d = hamming64(sim_of[a] + (1 << 63), sim_of[b] + (1 << 63))
        if d <= max_hamming:
            out_a.append(a)
            out_b.append(b)
            out_d.append(d)
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup


def embedding_neardup(ds, *, threshold: float = 0.95, id_col: str = "vec_id"):
    """All pairs with cosine ≥ threshold. Blockwise numpy matmul of
    normalized vectors; at this table's scale (≤ thousands of rows per
    block) each task compares its block against the broadcast matrix —
    the IVF/LSH variant in similarity.py is the >10^7-row path."""
    import ray

    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    tbl = pa.concat_tables([t for t in tables if t.num_rows])
    ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    order = np.argsort(ids)
    ids, unit = ids[order], unit[order]
    ref = ray.put(unit)

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_unit = ray.get(ref)
        bids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        bmat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        bn = np.linalg.norm(bmat, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        sims = (bmat / bn) @ all_unit.T
        out_a, out_b = [], []
        for r in range(sims.shape[0]):
            hit = np.where(sims[r] >= threshold)[0]
            for c in hit:
                if ids[c] > bids[r]:
                    out_a.append(bids[r])
                    out_b.append(int(ids[c]))
        return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})

    return ds.map_batches(block_pairs, batch_format="pyarrow", zero_copy_batch=True)
