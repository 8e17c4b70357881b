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

from .pairs import distinct_pair_table, distinct_pairs_ds

_WORD_RE = re.compile(r"\S+")

# Byte-level popcount LUT (numpy 1.26 has no bitwise_count).
_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8).reshape(len(x), 8)
    return _POPCNT8[b].sum(axis=1).astype(np.int64)


def _list_column_slices(tbl: pa.Table, col: str):
    """Yield each row of a list column as a numpy slice of the flattened
    values buffer — no per-row Python list materialization."""
    arr = tbl.column(col).combine_chunks()
    values = arr.values.to_numpy(zero_copy_only=False)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    for i in range(len(arr)):
        yield values[offsets[i] : offsets[i + 1]]

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
    with_shingles: bool = True,
) -> pa.Table:
    """Per doc: MinHash signature → one row per band.

    ``band_key`` is an int64 fold-hash of (band index, band's signature
    chunk): 8-byte shuffle keys instead of hex strings, and a rare key
    collision only creates a spurious candidate that the exact verify kills.
    With ``with_shingles`` each band row also carries the doc's distinct
    shingle-hash set (``sh``, list<int64>), so the downstream band groupby
    can verify exact Jaccard IN-GROUP — no second join against the
    documents table and no driver-side candidate state. The cost is
    shuffling each doc's shingle set ``bands`` times; for very large docs
    prefer a candidates⋈documents hash-join verify instead.
    """
    rows_per_band = _MINHASH_PERMS // bands
    ids, band_keys, sh_lists = [], [], []
    for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        sh = _hash_shingles(_shingles(t or "", k))
        if len(sh):
            with np.errstate(over="ignore"):
                sig = (sh[None, :] * _MH_A[:, None] + _MH_B[:, None]).min(axis=1)
        else:
            sig = np.zeros(_MINHASH_PERMS, dtype=np.uint64)
        # fold each band's chunk into one int64 key (FNV-style, band-salted)
        chunks = sig.reshape(bands, rows_per_band)
        keys = np.full(bands, 0xCBF29CE484222325, dtype=np.uint64)
        keys ^= np.arange(bands, dtype=np.uint64)
        for c in range(rows_per_band):
            with np.errstate(over="ignore"):
                keys = (keys ^ chunks[:, c]) * np.uint64(0x100000001B3)
        signed = keys.astype(np.int64)
        sh_signed = (sh.astype(np.int64) if len(sh) else np.zeros(0, np.int64)).tolist()
        for b in range(bands):
            ids.append(i)
            band_keys.append(int(signed[b]))
            sh_lists.append(sh_signed)
    cols = {
        "doc_id": pa.array(ids, pa.int64()),
        "band_key": pa.array(band_keys, pa.int64()),
    }
    if with_shingles:
        cols["sh"] = pa.array(sh_lists, pa.list_(pa.int64()))
    return pa.table(cols)


def ngram_jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1, s2 = _shingles(t1, k), _shingles(t2, k)
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    union = len(s1 | s2)
    return inter / union if union else 0.0


def _minhash_bucket_verify(group: pa.Table, threshold: float) -> pa.Table:
    """One hash bucket of band rows → exact-Jaccard-verified pairs.

    Vectorized run detection over the sorted band_key column; within each
    band run every doc pair is verified with exact Jaccard over the carried
    shingle-hash sets (sorted-array intersection). Emits (a, b) with a < b;
    the same pair may qualify in several bands — deduped by the caller's
    groupby. Two empty docs Jaccard as 1.0 (ngram_jaccard parity)."""
    if group.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    bk = group.column("band_key").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    sets = list(_list_column_slices(group, "sh"))
    order = np.lexsort((doc, bk))
    bk, doc = bk[order], doc[order]
    starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
    bounds = np.append(starts, len(bk))
    out_a, out_b = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        run_docs = doc[s:e]
        # a doc appears once per band key unless two of its bands collided
        uniq_idx = np.flatnonzero(np.r_[True, run_docs[1:] != run_docs[:-1]])
        for ii in range(len(uniq_idx)):
            for jj in range(ii + 1, len(uniq_idx)):
                pi, pj = order[s + uniq_idx[ii]], order[s + uniq_idx[jj]]
                sa, sb = sets[pi], sets[pj]
                if len(sa) == 0 and len(sb) == 0:
                    jac = 1.0
                else:
                    inter = np.intersect1d(sa, sb, assume_unique=True).size
                    union = len(sa) + len(sb) - inter
                    jac = inter / union if union else 0.0
                if jac >= threshold:
                    da, db = int(run_docs[uniq_idx[ii]]), int(run_docs[uniq_idx[jj]])
                    out_a.append(min(da, db))
                    out_b.append(max(da, db))
    return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})


def dedup_minhash_lsh(
    ds, *, threshold: float = 0.8, bands: int = 16, k: int = 3, buckets: int = 1024
):
    """Near-dup pairs by MinHash banding, verified with exact n-gram Jaccard.

    Fully distributed three-step shape (no driver-side candidate state, no
    whole-dataset ray.get):

        map_batches: shingles → signature → band rows carrying the doc's
                     shingle-hash set                       [row-local]
        groupby(hash bucket of band_key) → in-group exact-Jaccard verify
                     (only docs agreeing on a band compare) [one shuffle]
        groupby(a, b) → distinct pairs                      [tiny keys]

    The shuffle moves each doc's shingle set ``bands`` times (≈ bands × the
    dedup_ngram shuffle volume) — the price of verifying in-group instead of
    joining candidates back against documents. Returns a Dataset of (a, b)
    int64 pairs with exact jaccard ≥ threshold, a < b.
    """
    if buckets <= 0 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two; got {buckets}")
    banded = ds.map_batches(
        minhash_bands_batch, fn_kwargs=dict(bands=bands, k=k), batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda t: t.append_column(
            "gb", pc.cast(pc.bit_wise_and(t.column("band_key"), buckets - 1), pa.int32())
        ),
        batch_format="pyarrow",
    )
    pairs = banded.groupby("gb").map_groups(
        lambda g: _minhash_bucket_verify(g, threshold), batch_format="pyarrow"
    )
    return distinct_pairs_ds(pairs)


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
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "na": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
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
    if not a:
        return empty
    # LOCAL COMBINER: the same pair recurs once per shared shingle in this
    # bucket — pre-sum to (pair, cnt) before the global shuffle, so the
    # combine stage moves one row per (bucket, pair) instead of one per
    # shared shingle.
    A, B = np.asarray(a, np.int64), np.asarray(b, np.int64)
    NA, NB = np.asarray(na, np.int64), np.asarray(nb, np.int64)
    order = np.lexsort((B, A))
    A, B, NA, NB = A[order], B[order], NA[order], NB[order]
    st = np.flatnonzero(np.r_[True, (A[1:] != A[:-1]) | (B[1:] != B[:-1])])
    cnt = np.diff(np.r_[st, len(A)])
    return pa.table(
        {
            "a": pa.array(A[st], pa.int64()),
            "na": pa.array(NA[st], pa.int64()),
            "b": pa.array(B[st], pa.int64()),
            "nb": pa.array(NB[st], pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
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
    if buckets <= 0 or buckets & (buckets - 1):
        raise ValueError(
            f"buckets must be a power of two (bucket key is sh & (buckets-1)); got {buckets}"
        )
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

    # Global combine: sum each pair's per-bucket counts into |A∩B|, then the
    # Jaccard filter. NOT a multi-column groupby().aggregate() — Ray Data's
    # sort-based aggregate on a 4-column key measured ~300 CPU-seconds for
    # 1.3M pair rows (the whole operator's former bottleneck). Instead the
    # pair rows shuffle on ONE bucketed int32 key (hash-mixed so pairs
    # sharing `a` spread evenly) and each group run-sums vectorized. Ids are
    # never packed into one word, so this holds past 2^32 docs.
    PB = 1024

    def add_pb(t: pa.Table) -> pa.Table:
        av = t.column("a").to_numpy(zero_copy_only=False).view(np.uint64)
        bv = t.column("b").to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            mix = (av * np.uint64(0x9E3779B97F4A7C15)) ^ (
                bv * np.uint64(0xC2B2AE3D27D4EB4F)
            )
            mix ^= mix >> np.uint64(29)
        return t.append_column("pb", pa.array((mix & np.uint64(PB - 1)).astype(np.int32)))

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        A = group.column("a").to_numpy(zero_copy_only=False)
        B = group.column("b").to_numpy(zero_copy_only=False)
        NA = group.column("na").to_numpy(zero_copy_only=False)
        NB = group.column("nb").to_numpy(zero_copy_only=False)
        C = group.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((B, A))
        A, B, NA, NB, C = A[order], B[order], NA[order], NB[order], C[order]
        st = np.flatnonzero(np.r_[True, (A[1:] != A[:-1]) | (B[1:] != B[:-1])])
        inter = np.add.reduceat(C, st)
        union = NA[st] + NB[st] - inter
        # float division, not `inter >= t*union`: must round exactly like
        # the SQL oracle's jaccard division at threshold-boundary pairs
        ok = inter.astype(np.float64) / union.astype(np.float64) >= threshold
        return pa.table(
            {"a": pa.array(A[st][ok], pa.int64()), "b": pa.array(B[st][ok], pa.int64())}
        )

    return (
        pairs.map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(combine, batch_format="pyarrow")
    )


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
    Hamming-≤(bands-1) candidates (pigeonhole). Each band row CARRIES the
    full signature so the band groupby can verify Hamming distance in-group.
    ``band_key`` = (band index << width) | chunk — an int64, never a string.
    Vectorized: one (n × bands) shift/mask, no per-row Python loop."""
    if not 2 <= bands <= 32 or 64 % bands:
        raise ValueError(f"bands must divide 64 and be in [2, 32]; got {bands}")
    width = 64 // bands
    s = batch.column("simhash").to_numpy(zero_copy_only=False)
    u = s.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)  # back to unsigned
    shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(width))[None, :]
    chunks = (u[:, None] >> shifts) & np.uint64((1 << width) - 1)
    keys = (
        (np.arange(bands, dtype=np.uint64) << np.uint64(width))[None, :] | chunks
    ).astype(np.int64)
    n = len(s)
    return pa.table(
        {
            "doc_id": pa.array(
                np.repeat(batch.column("doc_id").to_numpy(zero_copy_only=False), bands),
                pa.int64(),
            ),
            "simhash": pa.array(np.repeat(s, bands), pa.int64()),
            "band_key": pa.array(keys.reshape(n * bands), pa.int64()),
        }
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _simhash_bucket_verify(group: pa.Table, max_hamming: int) -> pa.Table:
    """One hash bucket of signature-carrying band rows → verified pairs.

    Sorted run detection on band_key; per run the pairwise Hamming distance
    is one vectorized xor+popcount over triu indices — verification is
    row-local to the group, no driver state."""
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    bk = group.column("band_key").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    sig = group.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((doc, bk))
    bk, doc, sig = bk[order], doc[order], sig[order]
    usig = sig.view(np.uint64) ^ np.uint64(1 << 63)
    starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
    bounds = np.append(starts, len(bk))
    out_a, out_b, out_d = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        m = e - s
        if m < 2:
            continue
        ii, jj = np.triu_indices(m, 1)
        ham = _popcount64(usig[s + ii] ^ usig[s + jj])
        keep = np.flatnonzero(ham <= max_hamming)
        if len(keep) == 0:
            continue
        da, db = doc[s + ii[keep]], doc[s + jj[keep]]
        lo, hi = np.minimum(da, db), np.maximum(da, db)
        ok = lo != hi  # same doc twice in a run only via band-index collision
        out_a.append(lo[ok])
        out_b.append(hi[ok])
        out_d.append(ham[keep][ok])
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "hamming": pa.array(np.concatenate(out_d), pa.int64()),
        }
    )


def dedup_simhash(ds, *, max_hamming: int = 3, bands: int = 4, buckets: int = 1024):
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    bands must be > max_hamming for pigeonhole completeness. Fully
    distributed: band rows carry the 8-byte signature, the band groupby
    verifies Hamming in-group (xor+popcount), and a final groupby(a, b)
    dedups pairs that matched in several bands — the shuffle moves
    (doc_id, simhash, band_key) int64 triples only, and nothing is ever
    gathered to the driver."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) for recall 1.0"
        )
    if buckets <= 0 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two; got {buckets}")
    banded = (
        ds.map_batches(simhash_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            simhash_bands_batch, fn_kwargs=dict(bands=bands), batch_format="pyarrow"
        )
        .map_batches(
            lambda t: t.append_column(
                "gb",
                pc.cast(pc.bit_wise_and(t.column("band_key"), buckets - 1), pa.int32()),
            ),
            batch_format="pyarrow",
        )
    )
    pairs = banded.groupby("gb").map_groups(
        lambda g: _simhash_bucket_verify(g, max_hamming), batch_format="pyarrow"
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix without a Python-object
    round trip: flatten the values buffer and reshape (embeddings are
    fixed-dimension)."""
    arr = batch.column(col).combine_chunks()
    if batch.num_rows == 0:
        return np.zeros((0, 0), dtype=np.float64)
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return values.reshape(batch.num_rows, -1)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embedding_neardup(
    ds,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_cells: int = 16,
    sample_rows: int = 2048,
    pair_block: int = 2048,
):
    """All pairs with cosine ≥ threshold — recall 1.0, no O(n²) driver scan.

    Cell-blocked like IVF (similarity.py), with a cover radius that makes
    the blocking EXACT. Train centroids on a sample; let R be the max angle
    from any vector to its nearest ("home") centroid, θt = arccos(threshold).
    For any qualifying pair (x, y): angle(y, home(x)) ≤ angle(y, x) +
    angle(x, home(x)) ≤ θt + R, so if every vector is also assigned to every
    cell within θt + R, each qualifying pair co-occurs in BOTH members'
    home cells. Pairs are therefore emitted only from cell min(home_a,
    home_b) — exactly once, no cross-cell dedup pass.

    Pipeline: assign pass (aggregate max home-angle R) → multi-assign
    flat_map → groupby(cell).map_groups blockwise matmul. Everything
    streams; the driver holds only the centroid matrix. Replication per
    vector is |cells within θt + R|: selective for production thresholds
    (≥0.9); a LOW threshold widens θt toward full replication — the work is
    then a distributed all-pairs, which is what correctness demands.
    """
    import ray
    from ray.data.aggregate import Max

    from .similarity import _kmeans_cosine

    train = ds.limit(sample_rows).take_all()
    if not train:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
    sample = np.asarray([r[emb_col] for r in train], dtype=np.float64)
    cent = _kmeans_cosine(sample, n_cells, seed=11)  # (C, d) unit rows
    cent_ref = ray.put(cent)

    def home_angle(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        sims = np.clip(_unit_rows(_emb_matrix(batch, emb_col)) @ c.T, -1.0, 1.0)
        return pa.table({"ang": pa.array(np.arccos(sims.max(axis=1)), pa.float64())})

    r_max = ds.map_batches(home_angle, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        Max("ang", alias_name="r")
    )["r"]
    theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)) + r_max)

    def multi_assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        unit = _unit_rows(_emb_matrix(batch, emb_col))
        ang = np.arccos(np.clip(unit @ c.T, -1.0, 1.0))  # (n, C)
        home = ang.argmin(axis=1).astype(np.int64)
        rows_i, cells = np.nonzero(ang <= theta)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": pa.array(cells.astype(np.int64), pa.int64()),
                id_col: pa.array(ids[rows_i], pa.int64()),
                "home": pa.array(home[rows_i], pa.int64()),
                emb_col: pc.take(batch.column(emb_col).combine_chunks(), pa.array(rows_i)),
            }
        )

    def cell_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        m = group.num_rows
        if m < 2:
            return empty
        cell = int(group.column("cell")[0].as_py())
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        home = group.column("home").to_numpy(zero_copy_only=False)
        unit = _unit_rows(_emb_matrix(group, emb_col))
        out_a, out_b = [], []
        for lo in range(0, m, pair_block):  # bound the m×m sims matrix
            sims = unit[lo : lo + pair_block] @ unit.T
            bi, bj = np.nonzero(sims >= threshold)
            gi = bi + lo
            keep = ids[gi] < ids[bj]  # each unordered pair once, a < b
            gi, bj = gi[keep], bj[keep]
            emit = np.minimum(home[gi], home[bj]) == cell
            out_a.append(ids[gi[emit]])
            out_b.append(ids[bj[emit]])
        a = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.zeros(0, np.int64)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    return (
        ds.map_batches(multi_assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Exact passage-level (substring) duplicate detection


def substring_windows(text: str, k: int) -> list[str]:
    """All distinct k-char windows of a document, sorted (deterministic)."""
    if len(text) < k:
        return []
    return sorted({text[i : i + k] for i in range(len(text) - k + 1)})


def substring_dup_pairs(
    ds,
    *,
    k: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    sample_mod: int = 1,
):
    """Documents sharing at least one EXACT k-char passage → distinct
    (a, b) pairs, a < b. The passage-level complement of the document-level
    near-dup family (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better": repeated passages, not whole-doc similarity,
    drive memorization).

    Scale shape — the shuffle never moves text:

        map_batches: per-doc distinct k-char windows → two independent
                     64-bit hashes per window (128-bit combined; equality
                     on them stands in for string equality with
                     P(collision) ≈ pairs²/2¹²⁸ — same documented
                     tradeoff as the dedup/decontam oracles)  [row-local]
        groupby(hash bucket) → vectorized (h1, h2) run scan emits doc
                     pairs per duplicated window               [one shuffle]
        groupby(a, b) → distinct pairs                         [tiny keys]

    ``sample_mod`` is the 100-TB knob: keep only windows with
    ``h1 % sample_mod == 0`` — any shared passage of length ≥
    k + sample_mod - 1 still shares a sampled anchor in expectation
    (the CDC anchor argument), cutting the shuffle volume by the same
    factor. Default 1 (exhaustive, exact) so the SQL oracle can verify
    string-level semantics.
    """
    if buckets <= 0 or buckets & (buckets - 1):
        raise ValueError(f"buckets must be a power of two; got {buckets}")
    if sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    import pandas as pd

    def window_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out_id, out_h1, out_h2 = [], [], []
        for i, t in enumerate(texts):
            wins = substring_windows(t or "", k)
            if not wins:
                continue
            arr = np.asarray(wins, dtype=object)
            h1 = pd.util.hash_array(arr)
            h2 = pd.util.hash_array(arr, hash_key="1b8f0e5d3c2a4968")
            if sample_mod > 1:
                keep = h1 % np.uint64(sample_mod) == 0
                h1, h2 = h1[keep], h2[keep]
            out_id.append(np.full(len(h1), ids[i], dtype=np.int64))
            out_h1.append(h1)
            out_h2.append(h2)
        if not out_id:
            return pa.table(
                {
                    "gb": pa.array([], pa.int32()),
                    "h1": pa.array([], pa.uint64()),
                    "h2": pa.array([], pa.uint64()),
                    id_col: pa.array([], pa.int64()),
                }
            )
        h1 = np.concatenate(out_h1)
        return pa.table(
            {
                "gb": pa.array((h1 & np.uint64(buckets - 1)).astype(np.int32), pa.int32()),
                "h1": pa.array(h1, pa.uint64()),
                "h2": pa.array(np.concatenate(out_h2), pa.uint64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        h1 = group.column("h1").to_numpy(zero_copy_only=False)
        h2 = group.column("h2").to_numpy(zero_copy_only=False)
        doc = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h2, h1))
        h1, h2, doc = h1[order], h2[order], doc[order]
        new_run = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        starts = np.flatnonzero(new_run)
        bounds = np.append(starts, len(h1))
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            run_docs = np.unique(doc[s:e])
            if len(run_docs) < 2:
                continue
            ia, ib = np.triu_indices(len(run_docs), k=1)
            out_a.append(run_docs[ia])
            out_b.append(run_docs[ib])
        if not out_a:
            return empty
        # batch-local distinct before the tiny-key shuffle
        return distinct_pair_table(np.concatenate(out_a), np.concatenate(out_b))

    return distinct_pairs_ds(
        ds.map_batches(window_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gb")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


def semdedup(
    ds,
    *,
    k: int = 8,
    iters: int = 5,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_buckets: int = 32,
):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    clustering + within-cluster cosine pruning → (id, cluster, keep) for
    every row. A row is dropped when ANY smaller-id member of its cluster
    has cosine ≥ threshold with it — the pinned transitive-free variant
    of the paper's per-cluster representative rule (keep[i] depends only
    on pairwise cosines, never on the kept set, so it is order-free and
    expressible as a NOT EXISTS in the SQL oracle).

    Shape: clustering is the engine's own bit-deterministic fixed-point
    ``kmeans_assign``; vectors are attached to their cluster label by ONE
    bucketed id exchange (pad→union→index_in recombine — the collocations
    pattern); the prune is a ``groupby(cluster)`` whose per-group work is
    one normalized matmul + an upper-triangle any() — O(c²) on cluster
    size c ≈ n/k, the paper's own regime (at 10^9-vector scale you cap c
    by sub-clustering within cells; the matmul stays the unit of work).
    Cosines in float64; threshold must sit in a gap of the corpus cosine
    distribution (the embedding_neardup seam contract).
    """
    from .clustering import kmeans_assign

    assign = kmeans_assign(ds, k=k, iters=iters, vec_col=emb_col, id_col=id_col)

    def _bk(col):
        from .sketch import hash64_column

        return pa.array(
            (hash64_column(col) % np.uint64(n_buckets)).astype(np.int64), pa.int64()
        )

    def a_pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t.column(id_col),
                "cluster": t.column("cluster").cast(pa.int32()),
                emb_col: pa.nulls(t.num_rows, pa.list_(pa.float32())),
                "bk": _bk(t.column(id_col)),
            }
        )

    def v_pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t.column(id_col),
                "cluster": pa.nulls(t.num_rows, pa.int32()),
                emb_col: t.column(emb_col).cast(pa.list_(pa.float32())),
                "bk": _bk(t.column(id_col)),
            }
        )

    def attach(g: pa.Table) -> pa.Table:
        is_a = pc.is_valid(g.column("cluster"))
        a = g.filter(is_a)
        v = g.filter(pc.invert(is_a))
        pos = pc.index_in(a.column("id"), value_set=v.column("id").combine_chunks())
        emb = v.column(emb_col).combine_chunks().take(pos)
        return pa.table(
            {
                "id": a.column("id"),
                "cluster": a.column("cluster"),
                emb_col: emb,
            }
        )

    clustered = (
        assign.map_batches(a_pad, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            ds.map_batches(
                lambda t: v_pad(t.select([id_col, emb_col])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        .groupby("bk")
        .map_groups(attach, batch_format="pyarrow")
    )

    def prune(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("id", "ascending")])
        gt = g.take(order)
        ids = gt.column("id")
        unit = _unit_rows(_emb_matrix(gt, emb_col))
        sims = unit @ unit.T
        dup = np.zeros(len(ids), dtype=bool)
        iu = np.triu_indices(len(ids), k=1)
        hit = sims[iu] >= threshold
        if hit.any():
            dup[np.unique(iu[1][hit])] = True  # column index = larger id
        return pa.table(
            {
                "id": ids,
                "cluster": gt.column("cluster"),
                "keep": pa.array(~dup, pa.bool_()),
            }
        )

    return clustered.groupby("cluster").map_groups(prune, batch_format="pyarrow")


def containment_pairs(
    ds,
    *,
    threshold: float = 0.9,
    k: int = 3,
    buckets: int = 4096,
    max_df: int | None = None,
):
    """EXACT directed n-gram CONTAINMENT pairs — the asymmetric twin of
    :func:`dedup_ngram_jaccard` (Broder 1997 distinguishes resemblance
    from containment): ``containment(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|``,
    which catches a short doc living INSIDE a long one — syndicated
    excerpts, quoted passages, boilerplate-wrapped reprints — that
    Jaccard misses because the union is dominated by the long side.

    Identical scale shape to the Jaccard operator (one O(total shingles)
    shuffle through the bucketed inverted index, ONE-int32-key pair
    combine, ``max_df`` as the web-scale hot-shingle knob); only the
    final row-local filter differs: each undirected candidate pair
    yields up to two directed rows, (a→b) when ``inter/na ≥ t`` and
    (b→a) when ``inter/nb ≥ t`` — float division, rounding exactly like
    the SQL oracle's. Returns Dataset of ``(contained, container)``
    directed rows. Empty-shingle docs pair with nothing.
    """
    if buckets <= 0 or buckets & (buckets - 1):
        raise ValueError(
            f"buckets must be a power of two (bucket key is sh & (buckets-1)); got {buckets}"
        )
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

    PB = 1024

    def add_pb(t: pa.Table) -> pa.Table:
        av = t.column("a").to_numpy(zero_copy_only=False).view(np.uint64)
        bv = t.column("b").to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            mix = (av * np.uint64(0x9E3779B97F4A7C15)) ^ (
                bv * np.uint64(0xC2B2AE3D27D4EB4F)
            )
            mix ^= mix >> np.uint64(29)
        return t.append_column(
            "pb", pa.array((mix & np.uint64(PB - 1)).astype(np.int32))
        )

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "contained": pa.array([], pa.int64()),
                "container": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        A = group.column("a").to_numpy(zero_copy_only=False)
        B = group.column("b").to_numpy(zero_copy_only=False)
        NA = group.column("na").to_numpy(zero_copy_only=False)
        NB = group.column("nb").to_numpy(zero_copy_only=False)
        C = group.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((B, A))
        A, B, NA, NB, C = A[order], B[order], NA[order], NB[order], C[order]
        st = np.flatnonzero(np.r_[True, (A[1:] != A[:-1]) | (B[1:] != B[:-1])])
        inter = np.add.reduceat(C, st).astype(np.float64)
        a_in_b = inter / NA[st].astype(np.float64) >= threshold
        b_in_a = inter / NB[st].astype(np.float64) >= threshold
        return pa.table(
            {
                "contained": pa.array(
                    np.concatenate([A[st][a_in_b], B[st][b_in_a]]), pa.int64()
                ),
                "container": pa.array(
                    np.concatenate([B[st][a_in_b], A[st][b_in_a]]), pa.int64()
                ),
            }
        )

    return (
        pairs.map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(combine, batch_format="pyarrow")
    )
