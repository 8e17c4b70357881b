"""Model-based quality scoring: a hashed n-gram linear classifier run as an
actor-pool ``map_batches`` stage — the batched-model-inference shape.

Production pipelines gate web text on a learned quality model (a
fastText-style linear classifier over hashed unigrams+bigrams: Joulin et
al. 2016, "Bag of Tricks for Efficient Text Classification"; the same
shape CCNet and the Llama/GPT-3 data papers use for quality filtering).
This module implements that INFERENCE stage end to end on Ray Data:

- The "model" is a dense int64 weight vector over ``dim`` hash buckets,
  derived deterministically from a seed (splitmix64 over bucket indices) —
  no weight file needed, and the single-process reference recomputes the
  identical model, so the oracle is exact. A real deployment would load
  ``weights`` from disk instead; everything else is unchanged.
- Feature extraction is vectorized: Arrow lowercase+whitespace-split, one
  ``pd.util.hash_array`` over the flat token array (the deterministic
  64-bit string hash the dedup family already standardizes on), bigrams as
  a splitmix64 combine of adjacent token hashes, per-doc sums via cumsum
  differences. No Python loop over rows or tokens.
- Scores are INTEGER (weights are ints, a doc's score is a sum of ints),
  so results are bit-identical at any batch size / parallelism — the same
  exactness contract as the fixed-point k-means/PCA.

``QualityModelScorer`` is a callable CLASS: the weight vector is built once
per actor in ``__init__`` (standing in for a model load), batches stream
through ``__call__``. At 100 TB the stage is embarrassingly parallel —
no shuffle, text is read once and projected away.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import _splitmix64

DEFAULT_DIM = 1 << 18
DEFAULT_SEED = 0x5EED_1E55
# Multiplier decorrelating the bigram combine from the unigram hashes.
_BIGRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def model_weights(dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic int64 weights in [-512, 511], one per hash bucket."""
    idx = np.arange(dim, dtype=np.uint64) + np.uint64(seed)
    return (_splitmix64(idx) % np.uint64(1024)).astype(np.int64) - 512


def _token_hashes(texts: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hashes uint64, per-doc offsets int64 of len n_docs+1).

    Tokenization contract (shared with the reference): unicode lowercase,
    split on unicode whitespace — Arrow's utf8_lower/utf8_split_whitespace
    here, str.lower()/str.split() in the reference (equal on this corpus;
    both are the unicode definitions).
    """
    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_arr = toks.values
    if not len(flat_arr):
        return np.empty(0, dtype=np.uint64), offsets
    # Arrow's split emits empty tokens at string edges / whitespace runs;
    # Python's str.split() (the reference contract) never does — compact
    # them out and renumber the offsets so adjacency (bigrams) matches.
    # Length test stays an Arrow kernel; only the kept tokens cross into
    # Python objects for the pandas hash.
    keep = (
        pc.greater(pc.binary_length(flat_arr), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = np.asarray(flat_arr.to_pandas(), dtype=object)
    kcum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(keep)])
    offsets = kcum[offsets]
    flat = flat[keep.astype(bool)]
    hashes = (
        pd.util.hash_array(flat) if len(flat) else np.empty(0, dtype=np.uint64)
    )
    return hashes, offsets


def _doc_sums(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    csum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(vals)])
    return csum[ends] - csum[starts]


def score_batch(
    batch: pa.Table,
    weights: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """(doc_id, model_score:int64, model_keep:int64) for one Arrow batch."""
    dim = np.uint64(len(weights))
    uni, offsets = _token_hashes(batch.column(text_col))
    starts, ends = offsets[:-1], offsets[1:]

    uni_w = weights[(uni % dim).astype(np.int64)]
    score = _doc_sums(uni_w, starts, ends)

    if len(uni) > 1:
        # Bigram at flat position i pairs tokens (i, i+1); valid iff both
        # fall in the same doc, i.e. i+1 is not a doc boundary.
        big = _splitmix64(uni[:-1] * _BIGRAM_MULT + uni[1:])
        big_w = weights[(big % dim).astype(np.int64)]
        bstarts = np.minimum(starts, len(big))
        bends = np.maximum(np.minimum(ends - 1, len(big)), bstarts)
        score = score + _doc_sums(big_w, bstarts, bends)

    return pa.table(
        {
            id_col: batch.column(id_col),
            "model_score": pa.array(score, pa.int64()),
            "model_keep": pa.array((score > 0).astype(np.int64), pa.int64()),
        }
    )


class QualityModelScorer:
    """Actor-pool inference stage. Use as ``ds.map_batches(
    QualityModelScorer, concurrency=(1, N), batch_size=256,
    batch_format="pyarrow", zero_copy_batch=True)`` — the weight vector
    (2 MB at the default dim; a real model load in deployment) is built
    once per ACTOR here in ``__init__``, never per batch."""

    def __init__(
        self,
        dim: int = DEFAULT_DIM,
        seed: int = DEFAULT_SEED,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.weights = model_weights(dim, seed)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_batch(
            batch, self.weights, text_col=self.text_col, id_col=self.id_col
        )


def quality_model_reference(
    docs: pa.Table,
    *,
    dim: int = DEFAULT_DIM,
    seed: int = DEFAULT_SEED,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Single-process per-doc reference (independent control flow: a Python
    loop over docs, per-doc hashing) sharing the model/tokenizer/hash
    contract — the kmeans/PCA trust model. Bit-equal to the distributed
    stage at any parallelism."""
    weights = model_weights(dim, seed)
    udim = np.uint64(dim)
    ids = docs.column(id_col).to_pylist()
    scores = []
    for text in docs.column(text_col).to_pylist():
        toks = (text or "").lower().split()
        if not toks:
            scores.append(0)
            continue
        h = pd.util.hash_array(np.asarray(toks, dtype=object))
        s = int(weights[(h % udim).astype(np.int64)].sum())
        if len(h) > 1:
            big = _splitmix64(h[:-1] * _BIGRAM_MULT + h[1:])
            s += int(weights[(big % udim).astype(np.int64)].sum())
        scores.append(s)
    arr = np.asarray(scores, dtype=np.int64)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "model_score": pa.array(arr, pa.int64()),
            "model_keep": pa.array((arr > 0).astype(np.int64), pa.int64()),
        }
    )
