"""Global ordering (functions/order.py): distributed ROW_NUMBER."""

import pyarrow as pa
import pytest
import ray.data

from urlmap_ray.functions.order import rank_by


def _ds(n=100, blocks=1):
    ids = list(range(n))
    t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            # ties everywhere: score has only 5 distinct values
            "score": pa.array([i % 5 for i in ids], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_rank_matches_sorted_order():
    out = rank_by(_ds(50), [("score", "descending"), ("id", "ascending")])
    rows = sorted(out.take_all(), key=lambda r: r["rank"])
    expect = sorted(range(50), key=lambda i: (-(i % 5), i))
    assert [r["id"] for r in rows] == expect
    assert [r["rank"] for r in rows] == list(range(50))


def test_shard_assignment():
    out = rank_by(
        _ds(100), [("id", "ascending")], shard_size=16
    )
    rows = sorted(out.take_all(), key=lambda r: r["rank"])
    assert all(r["shard"] == r["rank"] // 16 for r in rows)
    assert rows[-1]["shard"] == 99 // 16


def test_block_count_invariance():
    a = sorted(
        (r["id"], r["rank"])
        for r in rank_by(
            _ds(120, blocks=1), [("score", "ascending"), ("id", "descending")]
        ).take_all()
    )
    b = sorted(
        (r["id"], r["rank"])
        for r in rank_by(
            _ds(120, blocks=13), [("score", "ascending"), ("id", "descending")]
        ).take_all()
    )
    assert a == b


def test_empty_input():
    empty = ray.data.from_arrow(
        pa.table({"id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())})
    )
    out = rank_by(empty, [("id", "ascending")], shard_size=8)
    assert out.count() == 0
    assert set(out.schema().names) == {"id", "score", "rank", "shard"}


def test_bad_direction_raises():
    with pytest.raises(ValueError, match="bad direction"):
        rank_by(_ds(10), [("id", "desc")])
