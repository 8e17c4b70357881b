"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation set.

The standard pre-training hygiene step (public practice since GPT-2/3
appendices and The Pile): any training doc containing an n-gram that
also occurs in a benchmark/eval document is contaminated and must be
flagged or dropped. Structurally this is a SEMI-JOIN of the corpus
shingle set against a small eval shingle set — the canonical broadcast
case:

- The eval n-gram set (benchmark suites are MBs, not TBs) is hashed to
  a sorted uint64 array and shipped ONCE via ``ray.put``; every batch
  probes it with ``np.searchsorted`` — no shuffle, no join, the corpus
  streams through untouched.
- Shingling reuses the exact tokenizer/hash pair of the dedup family
  (``dedup._shingles`` / ``dedup._hash_shingles``) so one tokenization
  semantic governs dedup, decontamination and their SQL oracles.
- Overlap is counted on 64-bit shingle hashes, not strings — the same
  collision tradeoff the dedup oracles document (P(collision) ≈
  n²/2⁶⁵, negligible below ~10⁹ distinct shingles; at 100 TB move to
  128-bit hashes, the probe stays the same).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _hash_shingles, _shingles

__all__ = ["eval_ngram_hashes", "overlap_batch", "gate_batch", "decontaminate"]


def eval_ngram_hashes(texts, k: int = 3) -> np.ndarray:
    """Distinct shingle hashes of an eval-document collection, sorted
    for searchsorted probing. Runs wherever the (small) eval set lives."""
    hashes = [_hash_shingles(_shingles(t or "", k)) for t in texts]
    if not hashes:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(hashes))


def overlap_batch(
    batch: pa.Table,
    eval_sorted: np.ndarray,
    *,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Per-doc count of distinct shingles present in the eval set."""
    texts = batch.column(text_col).to_pylist()
    n_overlap = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = _hash_shingles(_shingles(t or "", k))
        if len(h) and len(eval_sorted):
            pos = np.searchsorted(eval_sorted, h)
            pos[pos == len(eval_sorted)] = 0
            n_overlap[i] = int(np.count_nonzero(eval_sorted[pos] == h))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_overlap": pa.array(n_overlap, pa.int64()),
            "contaminated": pa.array(n_overlap > 0, pa.bool_()),
        }
    )


def gate_batch(
    batch: pa.Table,
    eval_sorted: np.ndarray,
    *,
    k: int = 3,
    min_words: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """Fused row-local prep gate: ONE tokenization per document feeds
    both the Gopher repetition test (``textstats.repetition_batch``
    semantics — drop when (n_2grams - n_distinct_2grams) * 5 >
    n_2grams) and the eval-overlap probe (``overlap_batch`` semantics —
    drop on any shared shingle hash). Keeps rows with >= ``min_words``
    words that pass both. Tokenization is identical to
    ``dedup._shingles`` (``\\S+`` over lowercased text == ``.split()``),
    so the composed gate equals running the two batch functions
    separately — asserted by test_prep_gate_fused_equivalence.

    Language/metadata gates are vectorized Arrow filters and belong
    upstream in the caller.
    """
    texts = batch.column(text_col).to_pylist()
    keep = np.zeros(len(texts), dtype=bool)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        nw = len(toks)
        if nw < min_words:
            continue
        grams = list(zip(toks, toks[1:]))
        n2 = len(grams)
        if (n2 - len(set(grams))) * 5 > n2:
            continue
        if nw < k:
            sh = {" ".join(toks)} if toks else set()
        else:
            sh = {" ".join(toks[j : j + k]) for j in range(nw - k + 1)}
        h = _hash_shingles(sh)
        if len(h) and len(eval_sorted):
            pos = np.searchsorted(eval_sorted, h)
            pos[pos == len(eval_sorted)] = 0
            if np.count_nonzero(eval_sorted[pos] == h):
                continue
        keep[i] = True
    return batch.filter(pa.array(keep))


def decontaminate(ds, eval_hashes: np.ndarray, *, k: int = 3,
                  text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_overlap, contaminated) for every document: one
    streaming pass against the broadcast eval shingle-hash set."""
    import ray

    eval_ref = ray.put(np.sort(np.asarray(eval_hashes, dtype=np.uint64)))

    def probe(t: pa.Table) -> pa.Table:
        return overlap_batch(
            t, ray.get(eval_ref), k=k, text_col=text_col, id_col=id_col
        )

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
