"""Snapshot compaction (functions/snapshot.py): latest-wins upsert."""

import pyarrow as pa
import pytest
import ray.data

from urlmap_ray.functions.snapshot import apply_recrawl, compact_latest


def _tbl(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "ts_us": pa.array([r[2] for r in rows], pa.int64()),
            "crawl_seq": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _out(ds):
    return sorted(
        (r["url"], r["text"], r["ts_us"], r["crawl_seq"]) for r in ds.take_all()
    )


def test_latest_ts_wins():
    ds = ray.data.from_arrow(
        _tbl(
            [
                ("a", "old", 100, 0),
                ("a", "new", 200, 0),
                ("b", "only", 50, 0),
            ]
        )
    )
    out = _out(compact_latest(ds, n_buckets=4))
    assert out == [("a", "new", 200, 0), ("b", "only", 50, 0)]


def test_seq_breaks_ts_tie():
    ds = ray.data.from_arrow(
        _tbl([("a", "v0", 100, 0), ("a", "v1", 100, 1)])
    )
    out = _out(compact_latest(ds, n_buckets=4))
    assert out == [("a", "v1", 100, 1)]


def test_full_tie_raises():
    ds = ray.data.from_arrow(
        _tbl([("a", "x", 100, 0), ("a", "y", 100, 0)])
    )
    with pytest.raises(Exception, match="ambiguous|RayTaskError|duplicate"):
        _out(compact_latest(ds, n_buckets=4))


def test_apply_recrawl_retains_gone_and_prefers_new():
    old = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c"], pa.string()),
                "text": pa.array(["a0", "b0", "c0"], pa.string()),
                "ts_us": pa.array([10, 10, 10], pa.int64()),
            }
        )
    )
    new = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["b", "d"], pa.string()),
                "text": pa.array(["b1", "d1"], pa.string()),
                # b re-fetched at the SAME ts: crawl_seq must decide
                "ts_us": pa.array([10, 20], pa.int64()),
            }
        )
    )
    out = _out(apply_recrawl(old, new, n_buckets=4))
    assert out == [
        ("a", "a0", 10, 0),
        ("b", "b1", 10, 1),
        ("c", "c0", 10, 0),
        ("d", "d1", 20, 1),
    ]


def test_bucket_count_invariance():
    rows = [(f"u{i % 7}", f"t{i}", i, i % 3) for i in range(60)]
    ds = ray.data.from_arrow(_tbl(rows))
    a = _out(compact_latest(ds, n_buckets=1))
    b = _out(compact_latest(ds, n_buckets=16))
    assert a == b and len(a) == 7
