"""Distributed quality-classifier TRAINING: full-batch logistic
regression over hashed n-gram features, with bit-deterministic integer
gradients — the training half of the fastText-style quality gate whose
INFERENCE half is ``quality_model.py``.

Production corpus pipelines train their quality/language filters on the
corpus itself (CCNet trains fastText on Wikipedia-vs-crawl labels; the
GPT-3/Llama data papers train LR over hashed features the same way).
The scale shape is the kmeans/PCA one (clustering.py, decomposition.py):

- **Features are pinned once in an actor pool** — hashed unigram+bigram
  bucket ids per doc (``quality_model._token_hashes`` contract: utf8proc
  lowercase, unicode whitespace split, pandas hash, splitmix64 bigram
  combine), flattened with per-doc offsets. Text is read once and never
  re-tokenized across iterations.
- **Each GD iteration is one RPC round**, not a Dataset job: weights
  (``dim`` int64, ~128 KB at 2^14) broadcast via ``ray.put``; each shard
  returns one int64 gradient vector — exchange volume O(actors × dim),
  independent of row count.
- **Determinism across parallelism — exact-integer gradients.** The
  per-doc margin is an EXACT integer (int64 weights summed over integer
  feature multiplicities); the per-doc float chain σ(z_q / S_W) − y is
  row-local (identical IEEE ops everywhere); the residual is quantized
  to int64 (``np.round(r · S_R)``, |r| < 1 so |r_q| ≤ 2^31) BEFORE any
  summation, so gradient partials are associative integer sums — fold
  order, batch size and actor count cannot change any bit. Partials are
  folded and the weight step applied in arbitrary-precision Python ints
  (the PCA contract), so no corpus size overflows. The update rounds
  ``lr · g / n`` back to weight fixed-point with nearest-ties-to-even
  integer division (:func:`_round_div`) — pinned, no float touches the
  weights. A 1-core run, a 32-core run and the single-process
  :func:`lr_reference` produce identical weights and scores.

Overflow budget: |z_q| ≤ tokens·max|w_q|; weights stay small (gradient
steps shrink as the model fits), and int64 per-shard gradient entries
hold to ~2^25 docs/shard before the Python-int fold would need to move
into the shard (documented knob, not a cliff).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .quality_model import _BIGRAM_MULT, _doc_sums, _token_hashes
from .sketch import _splitmix64

__all__ = ["lr_train_score", "lr_reference", "DEFAULT_DIM"]

DEFAULT_DIM = 1 << 14
S_W = 1 << 20  # weight fixed-point scale
S_R = 1 << 31  # residual quantization scale
PPB = 1_000_000_000


def _doc_feats(texts) -> tuple[np.ndarray, np.ndarray]:
    """texts → (flat int64 feature-instance array, int64 doc offsets).

    Features are unigram hashes plus adjacent-bigram combines (the
    quality_model contract), interleaved per doc: doc i owns
    ``flat[offsets[i]:offsets[i+1]]`` with multiplicity."""
    uni, offsets = _token_hashes(texts)
    n = len(offsets) - 1
    starts, ends = offsets[:-1], offsets[1:]
    if len(uni) > 1:
        big = _splitmix64(uni[:-1] * _BIGRAM_MULT + uni[1:])
        bstarts = np.minimum(starts, len(big))
        bends = np.maximum(np.minimum(ends - 1, len(big)), bstarts)
    else:
        big = np.empty(0, dtype=np.uint64)
        bstarts = bends = np.zeros(n, dtype=np.int64)
    counts = (ends - starts) + (bends - bstarts)
    out_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    flat = np.empty(out_off[-1], dtype=np.uint64)
    # vectorized interleave: unigram block then bigram block per doc
    uni_pos = np.repeat(out_off[:-1], ends - starts) + (
        np.arange(len(uni), dtype=np.int64) - np.repeat(starts, ends - starts)
    )
    flat[uni_pos] = uni
    nb = bends - bstarts
    if nb.sum():
        big_idx = np.repeat(bstarts, nb) + (
            np.arange(int(nb.sum()), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(nb)[:-1])), nb)
        )
        big_pos = np.repeat(out_off[:-1] + (ends - starts), nb) + (
            np.arange(int(nb.sum()), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(nb)[:-1])), nb)
        )
        flat[big_pos] = big[big_idx]
    return flat.astype(np.int64, copy=False), out_off


def _margins(wq: np.ndarray, bucket: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Exact int64 per-doc margins Σ w_q[feature] (with multiplicity)."""
    vals = wq[bucket] if len(bucket) else np.zeros(0, np.int64)
    return _doc_sums(vals, offsets[:-1], offsets[1:])


def _residuals_q(z_q: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Row-local float chain, then ppb-style quantization: identical on
    every engine because no reduction happens in float."""
    z = z_q.astype(np.float64) / S_W
    p = 1.0 / (1.0 + np.exp(-z))
    return np.round((p - y.astype(np.float64)) * S_R).astype(np.int64)


def _grad(
    wq: np.ndarray, bucket: np.ndarray, offsets: np.ndarray, y: np.ndarray, dim: int
) -> np.ndarray:
    r_q = _residuals_q(_margins(wq, bucket, offsets), y)
    g = np.zeros(dim, dtype=np.int64)
    if len(bucket):
        np.add.at(g, bucket, np.repeat(r_q, np.diff(offsets)))
    return g


def _round_div(a: int, b: int) -> int:
    """Nearest integer of a/b with ties to even — exact, pinned (b > 0)."""
    q, rem = divmod(a, b)
    if 2 * rem > b or (2 * rem == b and q & 1):
        q += 1
    return q


def _step(wq: np.ndarray, g_total: list[int], n: int, lr_den: int) -> np.ndarray:
    """w_q ← w_q − round(g · S_W / (n · S_R · lr_den)), arbitrary-precision."""
    denom = n * S_R * lr_den
    out = wq.copy()
    for f, gf in enumerate(g_total):
        if gf:
            out[f] -= _round_div(gf * S_W, denom)
    return out


def _scores_table(
    ids: np.ndarray,
    wq: np.ndarray,
    bucket: np.ndarray,
    offsets: np.ndarray,
    id_col: str = "doc_id",
) -> pa.Table:
    z = _margins(wq, bucket, offsets).astype(np.float64) / S_W
    p = 1.0 / (1.0 + np.exp(-z))
    ppb = np.round(p * PPB).astype(np.int64)
    return pa.table(
        {
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "score_ppb": pa.array(ppb, pa.int64()),
            "lr_pred": pa.array((ppb >= PPB // 2).astype(np.int64), pa.int64()),
        }
    )


class _LrShard:
    """Pins hashed features + labels for a set of blocks; one RPC/iter."""

    def __init__(self, block_refs, text_col, id_col, label_col, dim):
        import ray

        self.id_col = id_col

        ids, ys, buckets, offs = [], [], [], []
        for t in map(ray.get, block_refs):
            if not t.num_rows:
                continue
            flat, off = _doc_feats(t.column(text_col))
            buckets.append((flat % dim).astype(np.int64))
            offs.append(off)
            ids.append(t.column(id_col).to_numpy(zero_copy_only=False))
            ys.append(t.column(label_col).to_numpy(zero_copy_only=False))
        if ids:
            self.ids = np.concatenate(ids).astype(np.int64)
            self.y = np.concatenate(ys).astype(np.int64)
            # merge per-block offsets into one flat array
            self.bucket = (
                np.concatenate(buckets) if buckets else np.zeros(0, np.int64)
            )
            merged = [np.zeros(1, dtype=np.int64)]
            base = 0
            for off in offs:
                merged.append(off[1:] + base)
                base += off[-1]
            self.offsets = np.concatenate(merged)
        else:
            self.ids = np.zeros(0, np.int64)
            self.y = np.zeros(0, np.int64)
            self.bucket = np.zeros(0, np.int64)
            self.offsets = np.zeros(1, np.int64)
        self.dim = dim

    def n_docs(self) -> int:
        return int(len(self.ids))

    def grad(self, wq: np.ndarray) -> np.ndarray:
        return _grad(wq, self.bucket, self.offsets, self.y, self.dim)

    def scores(self, wq: np.ndarray) -> pa.Table:
        return _scores_table(self.ids, wq, self.bucket, self.offsets, self.id_col)


def lr_train_score(
    ds,
    *,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    iters: int = 5,
    lr_den: int = 4,
):
    """Train full-batch LR on ``ds`` (one int64 0/1 ``label_col``), then
    score every row → (doc_id, score_ppb, lr_pred) Dataset.

    lr = 1/lr_den. See module docstring for the determinism contract."""
    import ray
    import ray.data

    slim = ds.map_batches(
        lambda t: t.select([id_col, text_col, label_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    block_refs = slim.to_arrow_refs()
    shard_cls = ray.remote(num_cpus=1)(_LrShard)
    n_actors = max(1, min(len(block_refs), int(ray.cluster_resources().get("CPU", 8))))
    actors = [
        shard_cls.remote(block_refs[i::n_actors], text_col, id_col, label_col, dim)
        for i in range(n_actors)
    ]
    try:
        n = sum(ray.get([a.n_docs.remote() for a in actors]))
        if n == 0:
            raise ValueError("lr_train_score: empty input")
        wq = np.zeros(dim, dtype=np.int64)
        for _ in range(iters):
            wq_ref = ray.put(wq)
            g_total = [0] * dim
            for g in ray.get([a.grad.remote(wq_ref) for a in actors]):
                nz = np.flatnonzero(g)
                for f in nz:
                    g_total[f] += int(g[f])  # exact Python-int fold
            wq = _step(wq, g_total, n, lr_den)
        wq_ref = ray.put(wq)
        parts = ray.get([a.scores.remote(wq_ref) for a in actors])
    finally:
        for a in actors:
            ray.kill(a)
    out = pa.concat_tables([p for p in parts if p.num_rows])
    order = np.argsort(
        out.column(id_col).to_numpy(zero_copy_only=False), kind="stable"
    )
    return ray.data.from_arrow(out.take(pa.array(order, pa.int64())))


def lr_reference(
    table: pa.Table,
    *,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    iters: int = 5,
    lr_den: int = 4,
) -> pa.Table:
    """Single-process ground truth: identical integer arithmetic in one
    numpy pass — the distributed path must match BIT-for-bit."""
    flat, offsets = _doc_feats(table.column(text_col))
    bucket = (flat % dim).astype(np.int64)
    y = table.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = table.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    wq = np.zeros(dim, dtype=np.int64)
    for _ in range(iters):
        g = _grad(wq, bucket, offsets, y, dim)
        wq = _step(wq, [int(v) for v in g], n, lr_den)
    out = _scores_table(ids, wq, bucket, offsets, id_col)
    order = np.argsort(ids, kind="stable")
    return out.take(pa.array(order, pa.int64()))
