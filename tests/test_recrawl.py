"""Adaptive re-crawl scheduling (recrawl.py): the four verdicts, the
pinned integer period rule, bucket invariance, and the distinct-key
guard."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from urlmap_ray.functions.recrawl import recrawl_schedule


def _ds(rows: list[tuple[str, str]]):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _plan(old, new, **kw) -> dict[str, tuple[str, int]]:
    out = recrawl_schedule(_ds(old), _ds(new), **kw).take_all()
    return {r["url"]: (r["status"], r["next_period_s"]) for r in out}


OLD = [("u/a", "same"), ("u/b", "before"), ("u/c", "gone page")]
NEW = [("u/a", "same"), ("u/b", "after"), ("u/d", "fresh page")]


@pytest.mark.parametrize("buckets", [1, 4, 16])
def test_four_verdicts_and_periods(ray_session, buckets):
    got = _plan(OLD, NEW, n_buckets=buckets)
    assert got == {
        "u/a": ("unchanged", 172_800),  # min(2*86400, cap)
        "u/b": ("changed", 43_200),  # max(86400//2, floor)
        "u/c": ("gone", 0),
        "u/d": ("new", 3_600),
    }


def test_period_clamps(ray_session):
    # cap binds the unchanged double; floor binds the changed halving
    got = _plan(
        [("u/a", "x"), ("u/b", "y")],
        [("u/a", "x"), ("u/b", "z")],
        base_period_s=100_000,
        min_period_s=60_000,
        max_period_s=150_000,
    )
    assert got["u/a"] == ("unchanged", 150_000)
    assert got["u/b"] == ("changed", 60_000)


def test_duplicate_key_raises(ray_session):
    with pytest.raises(Exception, match="not distinct"):
        recrawl_schedule(
            _ds([("u/a", "1"), ("u/a", "2")]), _ds([("u/a", "3")]), n_buckets=1
        ).take_all()


def test_empty_sides(ray_session):
    assert _plan([], [("u/a", "x")]) == {"u/a": ("new", 3_600)}
    assert _plan([("u/a", "x")], []) == {"u/a": ("gone", 0)}
