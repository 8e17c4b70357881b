"""Training-data export — the last mile of the prep pipeline: fix a
deterministic global shuffle order, pack documents into fixed-token-budget
sequences along that order, and emit one atomic, resumable output unit
(bucket) per contiguous range of it, with a manifest row per bucket.

Composition of pinned contracts that already exist in this repo:

- global order: ``(md5(salt+text), doc_id)`` — the ``hash_shuffle`` rule
  (sampling.py), distributed via md5-PREFIX buckets whose order IS the
  global order (uniform by construction, ≤4096 offset rows of driver
  state);
- packing: the greedy in-order rule of ``packing.pack_group`` run inside
  DECLARED buckets — here ``bucket = pos // bucket_size``, i.e. contiguous
  ranges of the SHUFFLED order (the training-file layout), so the
  sequential unit is bounded and buckets pack in parallel;
- sharding: ``shard = bucket * n_shards // n_buckets`` — contiguous
  bucket ranges, the unit a resumable multi-node writer owns.

Two key shuffles total (hash-prefix bucket, then pos-bucket), both moving
(id, hash/pos, n_tokens) rows — text never moves after the first pass.
With ``out_dir`` set, each pos-bucket group also writes its parquet file
``bucket=K.parquet`` ATOMICALLY (tmp + rename) and SKIPS buckets whose
file already exists — a re-run after a mid-export failure redoes only
missing buckets (the resumable-sink contract, sinks.py).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["export_manifest"]


def export_manifest(
    ds,
    *,
    n_shards: int = 16,
    bucket_size: int = 100,
    budget: int = 512,
    salt: str = "ord1",
    id_col: str = "doc_id",
    text_col: str = "text",
    out_dir: str | None = None,
    bucket_hex: int = 3,
):
    """documents → manifest Dataset (bucket, shard, n_docs, n_seqs,
    n_tokens); with ``out_dir``, also writes one parquet per bucket
    holding (pos, doc_id, seq) — the packed training order."""
    if min(n_shards, bucket_size, budget) <= 0:
        raise ValueError("n_shards, bucket_size and budget must be positive")
    import ray

    from ..functions.packing import pack_group

    pre = salt.encode("utf-8")

    def hashed(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        hx, n_tok = [], []
        for x in texts:
            hx.append(hashlib.md5(pre + (x or "").encode("utf-8")).hexdigest())
            n_tok.append(len((x or "").split()))
        return pa.table(
            {
                id_col: t.column(id_col),
                "h": pa.array(hx, pa.string()),
                "hb": pa.array([int(x[:bucket_hex], 16) for x in hx], pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
            }
        )

    slim = ds.map_batches(
        hashed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    counts = slim.groupby("hb").count().take_all()  # ≤ 16^bucket_hex rows
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["hb"]):
        offsets[row["hb"]] = acc
        acc += row["count()"]
    total = acc
    n_buckets = max(-(-total // bucket_size), 1)
    off_ref = ray.put(offsets)

    def enum_group(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[("h", "ascending"), (id_col, "ascending")]
            )
        )
        pos = off[g.column("hb")[0].as_py()] + np.arange(len(g), dtype=np.int64)
        return pa.table(
            {
                id_col: g.column(id_col),
                "pos": pa.array(pos, pa.int64()),
                "bucket": pa.array(pos // bucket_size, pa.int64()),
                "n_tokens": g.column("n_tokens"),
            }
        )

    positioned = slim.groupby("hb").map_groups(enum_group, batch_format="pyarrow")

    def pack_bucket(g: pa.Table) -> pa.Table:
        packed = pack_group(g, budget=budget, id_col="pos")
        bucket = int(packed.column("bucket")[0].as_py())
        seq = packed.column("seq").to_numpy(zero_copy_only=False)
        if out_dir is not None:
            path = os.path.join(out_dir, f"bucket={bucket:06d}.parquet")
            if not os.path.exists(path):  # resumable: redo only missing
                import pyarrow.parquet as pq

                os.makedirs(out_dir, exist_ok=True)
                tmp = f"{path}.tmp-{os.getpid()}"
                pq.write_table(packed.select(["pos", id_col, "seq"]), tmp)
                os.replace(tmp, path)
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int64()),
                "shard": pa.array(
                    [bucket * n_shards // n_buckets], pa.int64()
                ),
                "n_docs": pa.array([len(packed)], pa.int64()),
                "n_seqs": pa.array([int(seq.max()) + 1 if len(seq) else 0], pa.int64()),
                "n_tokens": pa.array(
                    [int(packed.column("n_tokens").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    return positioned.groupby("bucket").map_groups(
        pack_bucket, batch_format="pyarrow"
    )
