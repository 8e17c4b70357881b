"""Perplexity-style language-model quality scoring — the CCNet/Wikipedia-LM
filtering step (Wenzek et al. 2020): score each document by its mean token
log-probability under a unigram model trained on the corpus itself, then
gate/bucket on the score (boilerplate and gibberish sit in the tails).

Two phases, both Ray-Data-native:

- ``lm_train``: hashed unigram counts (the dedup family's deterministic
  64-bit token hash — a hashed vocabulary is the standard trick that bounds
  state independently of Heaps' law) → per-batch ``np.unique`` partials →
  ONE hash-keyed groupby → distributed ``sort + limit`` caps the model at a
  DECLARED ``max_vocab`` (the tfidf/pivot bounded-broadcast contract; ties
  at the boundary break by hash, pinned on both sides). The driver holds
  ≤max_vocab rows; total token count folds off the same shuffled table.
- ``lm_score``: the model broadcasts once (``ray.put``), scoring is
  row-local — token hashes ``searchsorted`` into the sorted vocab, Laplace
  log-probs gathered, per-doc means via cumsum differences. Zero shuffle.

Determinism: probabilities derive from integer counts, both sides apply the
same ``np.log`` kernel to the same float64 inputs and sum each doc's values
in document order, and the emitted score is ppb-quantized int64 — the
pagerank/PCA exactness contract, so the oracle match is bit-equality."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .quality_model import _doc_sums, _token_hashes

DEFAULT_MAX_VOCAB = 1 << 16


def _laplace_logp(counts: np.ndarray, n_total: int, vocab: int) -> np.ndarray:
    """ln((c + 1) / (N + V + 1)) — Laplace smoothing; OOV uses c = 0."""
    return np.log((counts.astype(np.float64) + 1.0) / float(n_total + vocab + 1))


def _score_arrays(
    uni: np.ndarray,
    offsets: np.ndarray,
    vocab_hashes: np.ndarray,
    vocab_logp: np.ndarray,
    oov_logp: float,
) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, logprob_ppb) per doc from flat token hashes + offsets."""
    idx = np.searchsorted(vocab_hashes, uni)
    idx_c = np.minimum(idx, max(len(vocab_hashes) - 1, 0))
    if len(vocab_hashes):
        hit = vocab_hashes[idx_c] == uni
        logp = np.where(hit, vocab_logp[idx_c], oov_logp)
    else:
        logp = np.full(len(uni), oov_logp)
    starts, ends = offsets[:-1], offsets[1:]
    n_tok = ends - starts
    # Per-doc float sums via np.add.reduceat over non-empty segments (the
    # graph family's bit-determinism contract): each doc's sum is the
    # sequential fold of ITS OWN values only, so the result is independent
    # of batch composition — a cross-doc prefix-sum would not be.
    total = np.zeros(len(n_tok), dtype=np.float64)
    nz = n_tok > 0
    if nz.any():
        total[nz] = np.add.reduceat(logp, starts[nz])
    mean = np.divide(total, n_tok, out=np.zeros(len(n_tok)), where=nz)
    return n_tok, np.round(mean * 1e9).astype(np.int64)


def lm_train(
    ds, *, max_vocab: int = DEFAULT_MAX_VOCAB, text_col: str = "text"
) -> tuple[np.ndarray, np.ndarray, int]:
    """(sorted vocab hashes, counts aligned to them, total token count).

    The exchange moves each batch's DISTINCT token hashes (8-byte keys),
    never tokens; the driver receives ≤max_vocab rows. Boundary ties break
    by (count DESC, hash ASC) — pinned, so the model is identical at any
    parallelism."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        uni, _ = _token_hashes(t.column(text_col))
        h, c = np.unique(uni, return_counts=True)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()  # consumed twice below; size = distinct hashes, never rows
    )
    n_total = counts.aggregate(Sum("cnt", alias_name="n"))["n"] or 0
    rows = (
        counts.sort(["cnt", "h"], descending=[True, False])
        .limit(max_vocab)
        .take_all()  # ≤max_vocab rows by construction — the declared cap
    )
    hashes = np.array([r["h"] for r in rows], dtype=np.int64).view(np.uint64)
    cnts = np.array([r["cnt"] for r in rows], dtype=np.int64)
    order = np.argsort(hashes)
    return hashes[order], cnts[order], int(n_total)


def lm_score(
    ds,
    vocab_hashes: np.ndarray,
    vocab_counts: np.ndarray,
    n_total: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, n_tokens, logprob_ppb) per doc — model broadcast once via
    ``ray.put``, scoring row-local (zero shuffle)."""
    import ray

    vocab = len(vocab_hashes)
    logp = _laplace_logp(vocab_counts, n_total, vocab)
    oov = float(_laplace_logp(np.zeros(1, dtype=np.int64), n_total, vocab)[0])
    model_ref = ray.put((vocab_hashes, logp, oov))

    def score(batch: pa.Table) -> pa.Table:
        vh, vl, vo = ray.get(model_ref)
        uni, offsets = _token_hashes(batch.column(text_col))
        n_tok, ppb = _score_arrays(uni, offsets, vh, vl, vo)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logprob_ppb": pa.array(ppb, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def lm_reference(
    docs: pa.Table,
    *,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Single-process reference: per-doc Python loop over the same
    tokenizer/hash/log contract (independent control flow — Counter train,
    per-doc scoring). Bit-equal to lm_train + lm_score at any parallelism."""
    import pandas as pd

    from collections import Counter

    counter: Counter = Counter()
    texts = docs.column(text_col).to_pylist()
    per_doc_hashes = []
    for t in texts:
        toks = (t or "").lower().split()
        h = (
            pd.util.hash_array(np.asarray(toks, dtype=object))
            if toks
            else np.empty(0, dtype=np.uint64)
        )
        per_doc_hashes.append(h)
        # int64 view = the type the distributed shuffle column carries, so
        # the (count DESC, hash ASC) boundary tie-break orders identically.
        counter.update(h.view(np.int64).tolist())
    n_total = int(sum(counter.values()))
    items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    vh = np.array([k for k, _ in items], dtype=np.int64).view(np.uint64)
    vc = np.array([v for _, v in items], dtype=np.int64)
    order = np.argsort(vh)
    vh, vc = vh[order], vc[order]
    logp = _laplace_logp(vc, n_total, len(vh))
    oov = float(_laplace_logp(np.zeros(1, dtype=np.int64), n_total, len(vh))[0])

    ids = docs.column(id_col).to_pylist()
    n_out, s_out = [], []
    for h in per_doc_hashes:
        if not len(h):
            n_out.append(0)
            s_out.append(0)
            continue
        idx = np.searchsorted(vh, h)
        idx_c = np.minimum(idx, max(len(vh) - 1, 0))
        hit = vh[idx_c] == h if len(vh) else np.zeros(len(h), dtype=bool)
        lp = np.where(hit, logp[idx_c], oov) if len(vh) else np.full(len(h), oov)
        n_out.append(int(len(h)))
        total = np.add.reduceat(lp, np.zeros(1, dtype=np.int64))[0]
        s_out.append(int(np.round(total / len(h) * 1e9)))
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_out, pa.int64()),
            "logprob_ppb": pa.array(s_out, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Stupid Backoff bigram scoring (Brants et al. 2007, "Large Language
# Models in Machine Translation" — the web-scale n-gram scoring rule:
# no discounting, a fixed 0.4 backoff multiplier, counts straight from
# the corpus; designed exactly for distributed count tables like ours)

_SB_ALPHA_LOG = float(np.log(0.4))
DEFAULT_MAX_BIGRAMS = 1 << 18


def _valid_bigram_mask(offsets: np.ndarray, n_flat: int) -> np.ndarray:
    """Bigram slot i pairs flat tokens (i, i+1); it is invalid when token
    i+1 starts a new document (the quality_model bigram contract)."""
    valid = np.ones(max(n_flat - 1, 0), dtype=bool)
    interior = offsets[1:-1]
    interior = interior[(interior > 0) & (interior <= len(valid))]
    valid[interior - 1] = False
    return valid


def sb_train(
    ds,
    *,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    max_bigrams: int = DEFAULT_MAX_BIGRAMS,
    text_col: str = "text",
):
    """Unigram + hashed-bigram count model for Stupid Backoff:
    ``(vocab_hashes, vocab_counts, n_total, bigram_hashes,
    bigram_counts)``. The bigram table reuses lm_train's whole shape —
    per-batch ``np.unique`` partials over 64-bit pair hashes (the
    quality_model ``splitmix64(h_prev·MULT + h_cur)`` contract), ONE
    hash-keyed groupby, distributed sort+limit at a DECLARED
    ``max_bigrams`` with the pinned (count DESC, hash ASC) boundary
    tie-break. The exchange moves distinct pair hashes, never token
    text; the driver holds ≤ max_vocab + max_bigrams rows."""
    from ray.data.aggregate import Sum

    from .quality_model import _BIGRAM_MULT, _splitmix64

    vh, vc, n_total = lm_train(ds, max_vocab=max_vocab, text_col=text_col)

    def partial(t: pa.Table) -> pa.Table:
        uni, offsets = _token_hashes(t.column(text_col))
        if len(uni) > 1:
            big = _splitmix64(uni[:-1] * _BIGRAM_MULT + uni[1:])
            big = big[_valid_bigram_mask(offsets, len(uni))]
        else:
            big = np.empty(0, dtype=np.uint64)
        h, c = np.unique(big, return_counts=True)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "h"], descending=[True, False])
        .limit(max_bigrams)
        .take_all()  # ≤max_bigrams rows by construction — the declared cap
    )
    bh = np.array([r["h"] for r in rows], dtype=np.int64).view(np.uint64)
    bc = np.array([r["cnt"] for r in rows], dtype=np.int64)
    order = np.argsort(bh)
    return vh, vc, n_total, bh[order], bc[order]


def _sb_logscores(
    uni: np.ndarray,
    offsets: np.ndarray,
    vh: np.ndarray,
    vc: np.ndarray,
    logp: np.ndarray,
    oov: float,
    bvh: np.ndarray,
    bvc: np.ndarray,
) -> np.ndarray:
    """Pinned per-position log-score (shared verbatim by the distributed
    scorer and the single-process reference — elementwise ops, so batch
    composition cannot change a value):

    - doc-start position: Laplace unigram log-prob (the lm_score path);
    - context position with the (prev, cur) pair in the bigram table AND
      prev in the vocab: ``ln(c_bigram) − ln(c_prev)`` — raw Stupid
      Backoff, no normalization;
    - otherwise: ``ln(0.4) + Laplace unigram`` — the α-discounted
      backoff. Hashed-bigram collisions are the documented hashed-LM
      tradeoff (can make the ratio exceed 1; deterministic either way).
    """
    from .quality_model import _BIGRAM_MULT, _splitmix64

    idx = np.searchsorted(vh, uni)
    idx_c = np.minimum(idx, max(len(vh) - 1, 0))
    if len(vh):
        hit = vh[idx_c] == uni
        lapl = np.where(hit, logp[idx_c], oov)
    else:
        hit = np.zeros(len(uni), dtype=bool)
        lapl = np.full(len(uni), oov)
    lg = lapl.copy()
    if len(uni) > 1:
        has_prev = np.ones(len(uni), dtype=bool)
        starts = offsets[:-1]
        has_prev[starts[starts < len(uni)]] = False
        bh = _splitmix64(uni[:-1] * _BIGRAM_MULT + uni[1:])
        bidx = np.searchsorted(bvh, bh)
        bidx_c = np.minimum(bidx, max(len(bvh) - 1, 0))
        bhit = bvh[bidx_c] == bh if len(bvh) else np.zeros(len(bh), dtype=bool)
        use = has_prev[1:] & bhit & hit[:-1]
        back = has_prev[1:] & ~use
        tail = lg[1:]
        if len(bvh):
            tail[use] = np.log(bvc[bidx_c[use]].astype(np.float64)) - np.log(
                vc[idx_c[:-1][use]].astype(np.float64)
            )
        tail[back] = _SB_ALPHA_LOG + lapl[1:][back]
        lg[1:] = tail
    return lg


def sb_score(
    ds,
    model: tuple,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, n_tokens, sb_ppb) per doc under a :func:`sb_train` model —
    broadcast once via ``ray.put``, scoring row-local (zero shuffle),
    per-doc means through the reduceat contract so the ppb-quantized
    score is BIT-equal to :func:`sb_reference` at any parallelism."""
    import ray

    vh, vc, n_total, bvh, bvc = model
    logp = _laplace_logp(vc, n_total, len(vh))
    oov = float(_laplace_logp(np.zeros(1, dtype=np.int64), n_total, len(vh))[0])
    ref = ray.put((vh, vc, logp, oov, bvh, bvc))

    def score(batch: pa.Table) -> pa.Table:
        vh_, vc_, logp_, oov_, bvh_, bvc_ = ray.get(ref)
        uni, offsets = _token_hashes(batch.column(text_col))
        lg = _sb_logscores(uni, offsets, vh_, vc_, logp_, oov_, bvh_, bvc_)
        starts, ends = offsets[:-1], offsets[1:]
        n_tok = ends - starts
        total = np.zeros(len(n_tok), dtype=np.float64)
        nz = n_tok > 0
        if nz.any():
            total[nz] = np.add.reduceat(lg, starts[nz])
        mean = np.divide(total, n_tok, out=np.zeros(len(n_tok)), where=nz)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "sb_ppb": pa.array(np.round(mean * 1e9).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def sb_reference(
    docs: pa.Table,
    *,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    max_bigrams: int = DEFAULT_MAX_BIGRAMS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Single-process Stupid Backoff reference: independent Counter-based
    training (same tokenizer/hash/cap/tie-break contract) and per-doc
    scoring through the SAME :func:`_sb_logscores` elementwise kernel —
    bit-equal to sb_train + sb_score at any parallelism."""
    import pandas as pd

    from collections import Counter

    from .quality_model import _BIGRAM_MULT, _splitmix64

    uni_counter: Counter = Counter()
    big_counter: Counter = Counter()
    texts = docs.column(text_col).to_pylist()
    per_doc = []
    for t in texts:
        toks = (t or "").lower().split()
        h = (
            pd.util.hash_array(np.asarray(toks, dtype=object))
            if toks
            else np.empty(0, dtype=np.uint64)
        )
        per_doc.append(h)
        uni_counter.update(h.view(np.int64).tolist())
        if len(h) > 1:
            big = _splitmix64(h[:-1] * _BIGRAM_MULT + h[1:])
            big_counter.update(big.view(np.int64).tolist())

    def _capped(counter: Counter, cap: int):
        items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
        hh = np.array([k for k, _ in items], dtype=np.int64).view(np.uint64)
        cc = np.array([v for _, v in items], dtype=np.int64)
        order = np.argsort(hh)
        return hh[order], cc[order]

    vh, vc = _capped(uni_counter, max_vocab)
    bvh, bvc = _capped(big_counter, max_bigrams)
    n_total = int(sum(uni_counter.values()))
    logp = _laplace_logp(vc, n_total, len(vh))
    oov = float(_laplace_logp(np.zeros(1, dtype=np.int64), n_total, len(vh))[0])

    ids = docs.column(id_col).to_pylist()
    n_out, s_out = [], []
    for h in per_doc:
        if not len(h):
            n_out.append(0)
            s_out.append(0)
            continue
        offsets = np.array([0, len(h)], dtype=np.int64)
        lg = _sb_logscores(h, offsets, vh, vc, logp, oov, bvh, bvc)
        total = np.add.reduceat(lg, np.zeros(1, dtype=np.int64))[0]
        n_out.append(int(len(h)))
        s_out.append(int(np.round(total / len(h) * 1e9)))
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_out, pa.int64()),
            "sb_ppb": pa.array(s_out, pa.int64()),
        }
    )
