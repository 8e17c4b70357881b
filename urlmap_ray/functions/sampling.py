"""Deterministic content-hash sampling operators.

Training-data pipelines sample and split by CONTENT HASH, not RNG state:
the same document lands in the same split on every run, on any cluster
size, under any partitioning — which is what makes 100TB re-runs and
incremental ingests reproducible. All three operators key off
``md5(salt + text)``:

- :func:`hash_sample` — Bernoulli keep-with-probability-``rate``: keep a
  row iff the first 32 bits of its salted md5 fall below ``rate * 2^32``.
- :func:`hash_split` — assign every row a split label (train/val/test …)
  by cumulative-fraction thresholds over the same 32-bit hash value.
- :func:`stratified_sample` — exactly ``n`` rows per key (e.g. per
  language), chosen in salted-hash order: SQL's
  ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY hash, id) <= n``.
  Reuses :func:`~urlmap_ray.functions.windows.top_n_per_key`, so it is
  one key shuffle with a vectorized per-group head.

Everything is row-local except the stratified shuffle; no driver state,
no RNG. The md5 is a per-row Python loop (hashlib) — the honest cost of
string hashing, same as ``textstats.fingerprint_batch``; at scale it
pipelines inside ``map_batches`` and the filter drops rows before any
shuffle. The reference has no sampling (it crawls everything); these are
the beyond-reference operators from the build brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "hash_positions",
    "hash_sample",
    "hash_shuffle",
    "hash_split",
    "mixture_sample",
    "stratified_sample",
    "weighted_priority_sample",
]

_U32_SPAN = 1 << 32


def _salted_u32(texts: list, salt: str) -> np.ndarray:
    """First 32 bits (big-endian) of md5(salt + text) per row, as uint64
    so comparisons against ``rate * 2^32`` never wrap."""
    pre = salt.encode("utf-8")
    return np.array(
        [
            int.from_bytes(hashlib.md5(pre + (t or "").encode("utf-8")).digest()[:4], "big")
            for t in texts
        ],
        dtype=np.uint64,
    )


def hash_sample(ds, *, rate: float, text_col: str = "text", salt: str = ""):
    """Deterministic Bernoulli sample: keep each row with probability
    ``rate``, decided by its content hash (stable across runs/partitions).

    Different ``salt`` values give independent samples of the same data.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = np.uint64(int(rate * _U32_SPAN))

    def keep(batch: pa.Table) -> pa.Table:
        u = _salted_u32(batch.column(text_col).to_pylist(), salt)
        return batch.filter(pa.array(u < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample(
    ds,
    *,
    rates: dict[str, float],
    default_rate: float = 1.0,
    key_col: str = "source",
    text_col: str = "text",
    salt: str = "",
):
    """Deterministic data-mixing sample: keep each row with the rate
    DECLARED for its ``key_col`` value (sources absent from ``rates`` use
    ``default_rate``) — the per-source up/down-weighting step of a training
    mix (GPT-3/Llama-style corpus weights), decided by content hash so the
    same document survives on any cluster size, any partitioning, resumed
    or not. Zero shuffle: rates broadcast in the closure (a training mix is
    a small declared table, like the pivot's category set)."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresholds = {
        k: np.uint64(int(r * _U32_SPAN)) for k, r in rates.items()
    }
    default_thr = np.uint64(int(default_rate * _U32_SPAN))

    def keep(batch: pa.Table) -> pa.Table:
        u = _salted_u32(batch.column(text_col).to_pylist(), salt)
        thr = np.array(
            [
                thresholds.get(k, default_thr)
                for k in batch.column(key_col).to_pylist()
            ],
            dtype=np.uint64,
        )
        return batch.filter(pa.array(u < thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(
    ds,
    *,
    fractions: dict[str, float],
    text_col: str = "text",
    salt: str = "",
    split_col: str = "split",
):
    """Assign a deterministic split label per row by content hash.

    ``fractions`` maps label -> fraction, in the order given (insertion
    order defines the threshold ranges); fractions must sum to 1. A row
    goes to the first label whose cumulative threshold exceeds its 32-bit
    hash value — so growing the corpus never moves an existing row
    between splits.
    """
    fracs = list(fractions.values())
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"fractions must be non-negative and sum to 1, got {fractions}")
    labels = list(fractions.keys())
    # cumulative upper bounds in hash space; force the last to 2^32 so
    # float rounding can never leave a row unlabeled
    bounds = np.cumsum(np.array(fracs) * _U32_SPAN).astype(np.uint64)
    bounds[-1] = np.uint64(_U32_SPAN)

    def assign(batch: pa.Table) -> pa.Table:
        u = _salted_u32(batch.column(text_col).to_pylist(), salt)
        idx = np.searchsorted(bounds, u, side="right")
        lab = pa.array(labels, pa.string()).take(pa.array(idx.astype(np.int32)))
        return batch.append_column(split_col, lab)

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds,
    *,
    key_col: str,
    n: int,
    id_col: str,
    text_col: str = "text",
    salt: str = "",
    hash_col: str = "h60",
):
    """Exactly ``n`` rows per ``key_col`` value, in deterministic salted
    content-hash order (ties broken by ``id_col``).

    Adds ``hash_col`` (the first 60 bits of the salted md5, int64 — 60 so
    it also fits a signed SQL BIGINT for oracle parity) and the 1-based
    rank column ``rn`` from the window operator. One key shuffle; the
    per-group head is vectorized (see ``top_n_per_key``).
    """
    from .windows import top_n_per_key

    pre = salt.encode("utf-8")

    def add_hash(batch: pa.Table) -> pa.Table:
        h = np.array(
            [
                int(hashlib.md5(pre + (t or "").encode("utf-8")).hexdigest()[:15], 16)
                for t in batch.column(text_col).to_pylist()
            ],
            dtype=np.int64,
        )
        return batch.append_column(hash_col, pa.array(h, pa.int64()))

    with_hash = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return top_n_per_key(
        with_hash,
        key_col=key_col,
        order_col=hash_col,
        n=n,
        tiebreak_col=id_col,
        descending=False,
    )


def hash_positions(
    ds,
    *,
    id_col: str,
    text_col: str = "text",
    salt: str = "",
    bucket_hex: int = 3,
    with_tokens: bool = False,
):
    """THE global-enumeration contract (shared by :func:`hash_shuffle` and
    the export pipeline — one implementation, one place to fix): every row
    gets its 0-based position ``pos`` in the order ``(md5(salt+text), id)``.

    A global row_number is inherently a total order, but it distributes
    cleanly because md5 buckets are uniform by construction: rows land in
    ``16^bucket_hex`` hash-PREFIX buckets (the prefix of the sort key, so
    bucket order IS global order), a tiny ``groupby(bucket).count()``
    yields per-bucket offsets (≤ 4096 rows on the driver — declared,
    bounded, skew-free), and each bucket then sorts locally and numbers
    itself from its offset inside ``groupby(bucket).map_groups``. One key
    shuffle of (id, hash) rows — text never moves; the slim projection is
    materialized once so the count pass and the enumerate pass don't both
    recompute the md5s (id+hash rows are ~50 B each, spillable).

    Returns ``(positions, total)``: a Dataset of (id, pos[, n_tokens])
    and the global row count. ``with_tokens=True`` carries whitespace
    token counts (the doc_token_counts contract) through the shuffle so
    downstream packing never touches text again.
    """
    if not 1 <= bucket_hex <= 8:
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")
    import pyarrow.compute as pc
    import ray

    pre = salt.encode("utf-8")

    def hashed(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        hx = [
            hashlib.md5(pre + (x or "").encode("utf-8")).hexdigest()
            for x in texts
        ]
        cols = {
            id_col: t.column(id_col),
            "h": pa.array(hx, pa.string()),
            "bucket": pa.array([int(x[:bucket_hex], 16) for x in hx], pa.int64()),
        }
        if with_tokens:
            cols["n_tokens"] = pa.array(
                [len((x or "").split()) for x in texts], pa.int64()
            )
        return pa.table(cols)

    slim = ds.map_batches(
        hashed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    counts = slim.groupby("bucket").count().take_all()  # ≤ 16^bucket_hex rows
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["bucket"]):
        offsets[row["bucket"]] = acc
        acc += row["count()"]
    total = acc
    off_ref = ray.put(offsets)

    def enum_group(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[("h", "ascending"), (id_col, "ascending")]
            )
        )
        pos = off[g.column("bucket")[0].as_py()] + np.arange(
            len(g), dtype=np.int64
        )
        cols = {
            id_col: g.column(id_col),
            "pos": pa.array(pos, pa.int64()),
        }
        if with_tokens:
            cols["n_tokens"] = g.column("n_tokens")
        return pa.table(cols)

    positions = slim.groupby("bucket").map_groups(
        enum_group, batch_format="pyarrow"
    )
    return positions, total


def hash_shuffle(
    ds,
    *,
    n_shards: int,
    id_col: str,
    text_col: str = "text",
    salt: str = "",
    bucket_hex: int = 3,
):
    """Deterministic global training-order shuffle: every row gets its
    0-based position ``pos`` in the order ``(md5(salt+text), id)`` and the
    contiguous output shard ``shard = pos * n_shards // total`` — the
    "shuffle once, shard contiguously" step that fixes an LLM run's data
    order up front (same order on any cluster size, any partitioning,
    resumed or not). Enumeration contract: :func:`hash_positions`.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    positions, total = hash_positions(
        ds, id_col=id_col, text_col=text_col, salt=salt, bucket_hex=bucket_hex
    )
    total = max(total, 1)  # guard the empty-dataset division

    def shard(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array(pos * n_shards // total, pa.int64())
        )

    return positions.map_batches(
        shard, batch_format="pyarrow", zero_copy_batch=True
    )


def _salted_u52(texts: list, salt: str) -> np.ndarray:
    """First 52 bits (13 hex chars, big-endian) of md5(salt + text) per
    row — chosen because 52-bit integers are exactly representable as
    IEEE doubles, so ``u / w`` is a single correctly-rounded division
    that numpy and any SQL engine compute bit-identically."""
    pre = salt.encode("utf-8")
    return np.array(
        [
            int(hashlib.md5(pre + (t or "").encode("utf-8")).hexdigest()[:13], 16)
            for t in texts
        ],
        dtype=np.uint64,
    )


def weighted_priority_sample(
    ds,
    *,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
):
    """Deterministic weighted sample of ``k`` rows without replacement.

    Training mixtures oversample by weight (here: the row's UTF-8 byte
    length + 1, i.e. token-budget-proportional); reproducibility demands
    the choice be content-keyed, not RNG-keyed. Every row gets

        ``priority = u / w``,  u = first 52 bits of md5(salt + text)

    and the ``k`` smallest priorities win — the Efraimidis–Spirakis
    weighted-reservoir scheme with the uniform key kept in place of
    ``-ln(u)``. The substitution is deliberate: IEEE division is
    correctly rounded, so numpy and the DuckDB oracle produce
    bit-identical priorities, while ``ln`` is libm-dependent and is not.
    Selection probability is strictly increasing in weight and converges
    to the exponential-clock scheme's weight-proportional inclusion as
    ``k/n → 0``; the deviation is documented, not hidden.

    Scale shape: priorities are row-local; each batch pre-prunes to its
    own ``k`` smallest rows, so at most ``k × n_blocks`` rows reach the
    final distributed ``sort(priority).limit(k)``. No driver state.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def prio(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        u = _salted_u52(texts, salt)
        w = np.array(
            [len((t or "").encode("utf-8")) + 1 for t in texts], dtype=np.int64
        )
        p = u.astype(np.float64) / w.astype(np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, p))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "weight": pa.array(w[order], pa.int64()),
                "priority": pa.array(p[order], pa.float64()),
            }
        )

    return (
        ds.map_batches(prio, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["priority", id_col])
        .limit(k)
    )
