"""Sequence packing — the pretraining-prep step that bins documents into
fixed-token-budget training sequences (every LLM data pipeline ends with
this: examples are concatenated into ~context-length sequences so no
compute is wasted on padding).

Greedy in-order packing is inherently a sequential scan, which does not
distribute as written. The scale-right contract here makes the sequential
unit BOUNDED and DECLARED: docs are grouped into ``bucket = doc_id //
bucket_size`` buckets (deterministic, contiguous id ranges), packing runs
greedily in doc_id order WITHIN each bucket, and buckets pack in parallel
— one key shuffle, per-group work bounded by ``bucket_size`` regardless of
corpus size. The cost of the contract is that a sequence never crosses a
bucket boundary (≤1 under-full sequence per bucket — a fraction that
vanishes as bucket_size/budget grows); what it buys is a packing that is
bit-identical at any parallelism and resumable per bucket.

Rule (pinned, mirrored by the SQL oracle's recursive CTE): walk the
bucket's docs in doc_id order with a running token total; if adding the
doc would exceed ``budget``, start a new sequence. A doc larger than the
budget occupies its own sequence (the rule needs no special case: any
follower overflows). Token counts are whitespace tokens — exactly
``len(text.split())``, the doc_token_counts contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pack_sequences"]


def pack_group(
    g: pa.Table, *, budget: int, id_col: str = "doc_id", tok_col: str = "n_tokens"
) -> pa.Table:
    """Greedy in-order packing of ONE bucket (bounded rows): sorts by
    ``id_col`` and adds ``seq`` (0-based sequence index within the
    bucket); a doc's position inside its sequence is implied by id
    order."""
    order = pa.compute.sort_indices(g, sort_keys=[(id_col, "ascending")])
    g = g.take(order)
    toks = g.column(tok_col).to_numpy(zero_copy_only=False).astype(np.int64)
    seq = np.zeros(len(toks), dtype=np.int64)
    cur, acc = 0, 0
    for i, nt in enumerate(toks):
        if i > 0 and acc + nt > budget:
            cur += 1
            acc = 0
        acc += int(nt)
        seq[i] = cur
    return g.append_column("seq", pa.array(seq, pa.int64()))


def pack_sequences(
    ds,
    *,
    budget: int,
    bucket_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """documents → (doc_id, bucket, n_tokens, seq): which training sequence
    each doc lands in. One ``groupby(bucket)`` shuffle of (id, count) rows
    — text never moves; the heavy column is dropped in the first stage."""
    if budget <= 0 or bucket_size <= 0:
        raise ValueError("budget and bucket_size must be positive")

    def counts(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = [
            len((x or "").split()) for x in t.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "bucket": pa.array(ids // bucket_size, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
            }
        )

    return (
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: pack_group(g, budget=budget, id_col=id_col),
            batch_format="pyarrow",
        )
    )
