"""DSIR importance weighting — data selection for language models
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): score every raw-corpus document by how much more likely its
tokens are under a TARGET distribution (the benchmark / high-quality set
you want more of) than under the RAW corpus distribution. The per-doc
weight is the mean hashed-unigram log-ratio

    dsir(x) = mean_t [ ln p_target(t) − ln p_raw(t) ]

and selection keeps the top-weighted documents (or samples proportional
to the weight). This is the distribution-matching step between "quality
gates" (row-local rules) and "model-based scoring" (a trained
classifier) — it needs no labels, only the target table.

Ray shape, reusing the CCNet-LM machinery (lm.py):

- raw distribution: ``lm_train`` — per-batch distinct-hash partials, ONE
  8-byte-key shuffle, DECLARED ``max_vocab`` cap via distributed
  sort+limit (the tfidf bounded-broadcast contract).
- target distribution: one pass over the (MB-sized, external) target
  table counting tokens AGAINST the raw vocab — per-batch (vocab_idx,
  count) partials restricted to vocab hits plus one OOV row, ONE keyed
  fold, ≤ max_vocab + 1 rows to the driver.
- scoring: the log-ratio vector broadcasts once via ``ray.put``; per-doc
  means are row-local through the shared ``_score_arrays`` reduceat
  contract, so the distributed result is BIT-equal to the single-process
  reference at any parallelism (the pagerank/PCA exactness model).

Laplace smoothing on both sides uses the raw vocab size V — pinned, so
OOV tokens contribute the constant ``ln((1/(N_t+V+1)) / (1/(N_r+V+1)))``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .lm import DEFAULT_MAX_VOCAB, _laplace_logp, _score_arrays, lm_train
from .quality_model import _token_hashes

__all__ = ["dsir_weights", "dsir_reference"]


def _target_counts(target_ds, vocab_hashes: np.ndarray, *, text_col: str):
    """(counts aligned to vocab_hashes, oov_count, total_tokens) from one
    distributed pass over the target table. The exchange is (vocab_idx,
    count) int64 rows — ≤ min(batch distinct, max_vocab) + 1 per batch."""
    import ray

    vh_ref = ray.put(vocab_hashes)

    def partial(t: pa.Table) -> pa.Table:
        uni, _ = _token_hashes(t.column(text_col))
        vh = ray.get(vh_ref)
        if len(vh):
            idx = np.searchsorted(vh, uni)
            idx_c = np.minimum(idx, len(vh) - 1)
            hit = vh[idx_c] == uni
            vidx = np.where(hit, idx_c, -1).astype(np.int64)
        else:
            vidx = np.full(len(uni), -1, np.int64)
        u, c = np.unique(vidx, return_counts=True)
        return pa.table(
            {
                "vidx": pa.array(u, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        target_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vidx")
        .sum("cnt")
        .take_all()  # ≤ max_vocab + 1 rows — the declared broadcast bound
    )
    counts = np.zeros(len(vocab_hashes), np.int64)
    oov = 0
    for r in rows:
        if r["vidx"] < 0:
            oov = int(r["sum(cnt)"])
        else:
            counts[r["vidx"]] = int(r["sum(cnt)"])
    return counts, oov, int(counts.sum()) + oov


def dsir_weights(
    ds,
    target_ds,
    *,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-doc DSIR importance weights → Dataset of (id_col, n_tokens,
    dsir_ppb). Positive = the doc looks more like the target than like
    the average raw doc. See the module docstring for shape and the
    bit-determinism contract."""
    import ray

    vh, vc_raw, n_raw = lm_train(ds, max_vocab=max_vocab, text_col=text_col)
    vc_t, _oov_t, n_t = _target_counts(target_ds, vh, text_col=text_col)
    v = len(vh)
    logr = _laplace_logp(vc_t, n_t, v) - _laplace_logp(vc_raw, n_raw, v)
    oov_logr = float(
        _laplace_logp(np.zeros(1, np.int64), n_t, v)[0]
        - _laplace_logp(np.zeros(1, np.int64), n_raw, v)[0]
    )
    model_ref = ray.put((vh, logr, oov_logr))

    def score(batch: pa.Table) -> pa.Table:
        m_vh, m_logr, m_oov = ray.get(model_ref)
        uni, offsets = _token_hashes(batch.column(text_col))
        n_tok, ppb = _score_arrays(uni, offsets, m_vh, m_logr, m_oov)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "dsir_ppb": pa.array(ppb, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_reference(
    docs: pa.Table,
    target: pa.Table,
    *,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Single-process reference: Counter-based raw vocab (the lm_reference
    train contract — (count DESC, hash ASC) boundary tie-break), sequential
    target counting, the same log/score primitives. Bit-equal to
    :func:`dsir_weights` at any parallelism."""
    from collections import Counter

    import pandas as pd

    def doc_hashes(texts):
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            out.append(
                pd.util.hash_array(np.asarray(toks, dtype=object))
                if toks
                else np.empty(0, dtype=np.uint64)
            )
        return out

    raw_hashes = doc_hashes(docs.column(text_col).to_pylist())
    counter: Counter = Counter()
    for h in raw_hashes:
        counter.update(h.view(np.int64).tolist())
    n_raw = int(sum(counter.values()))
    items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    vh = np.array([k for k, _ in items], dtype=np.int64).view(np.uint64)
    vc = np.array([v for _, v in items], dtype=np.int64)
    order = np.argsort(vh)
    vh, vc_raw = vh[order], vc[order]
    v = len(vh)

    vc_t = np.zeros(v, np.int64)
    oov_t = 0
    for h in doc_hashes(target.column(text_col).to_pylist()):
        if not len(h):
            continue
        idx = np.searchsorted(vh, h)
        idx_c = np.minimum(idx, max(v - 1, 0))
        hit = vh[idx_c] == h if v else np.zeros(len(h), bool)
        np.add.at(vc_t, idx_c[hit], 1)
        oov_t += int((~hit).sum())
    n_t = int(vc_t.sum()) + oov_t

    logr = _laplace_logp(vc_t, n_t, v) - _laplace_logp(vc_raw, n_raw, v)
    oov_logr = float(
        _laplace_logp(np.zeros(1, np.int64), n_t, v)[0]
        - _laplace_logp(np.zeros(1, np.int64), n_raw, v)[0]
    )
    ids, toks, ppbs = [], [], []
    for did, h in zip(docs.column(id_col).to_pylist(), raw_hashes):
        n_tok, ppb = _score_arrays(
            h, np.array([0, len(h)], dtype=np.int64), vh, logr, oov_logr
        )
        ids.append(did)
        toks.append(int(n_tok[0]))
        ppbs.append(int(ppb[0]))
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "dsir_ppb": pa.array(ppbs, pa.int64()),
        }
    )
