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

import os

import pyarrow as pa

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
    from ..functions.packing import pack_group
    from ..functions.sampling import hash_positions

    # ONE implementation of the global-order contract, shared with
    # hash_shuffle — the export order IS the docs_shuffle order by
    # construction, not by parallel maintenance of two copies.
    positions, total = hash_positions(
        ds,
        id_col=id_col,
        text_col=text_col,
        salt=salt,
        bucket_hex=bucket_hex,
        with_tokens=True,
    )
    n_buckets = max(-(-total // bucket_size), 1)

    if out_dir is not None:
        # Resume guard: a bucket file is only skippable if it was produced
        # by the SAME run parameters over the SAME input — otherwise stale
        # parquet silently disagrees with the fresh manifest. Params (and a
        # cheap input fingerprint: the row total) live in a sidecar; any
        # mismatch refuses to resume instead of mixing runs.
        import json

        params = {
            "salt": salt,
            "budget": budget,
            "bucket_size": bucket_size,
            "n_shards": n_shards,
            "bucket_hex": bucket_hex,
            "total_rows": total,
        }
        sidecar = os.path.join(out_dir, "_params.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                prev = json.load(f)
            if prev != params:
                raise ValueError(
                    f"export out_dir {out_dir!r} holds buckets from a run "
                    f"with different parameters/input ({prev} != {params}); "
                    "refusing to resume — use a fresh out_dir"
                )
        else:
            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{sidecar}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(params, f, sort_keys=True)
            os.replace(tmp, sidecar)

    def bucketize(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(pos // bucket_size, pa.int64())
        )

    positioned = positions.map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    )

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
