"""Domain/source-level filtering (domains.py): rollup + integer avg keep
rule vs a single-process reference, identical across membership modes."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from urlmap_ray.functions.domains import source_filter, source_stats

ROWS = [
    # src_long: avg 10 chars  → kept at min_avg 8, dropped at 11
    (1, "src_long", "aaaaaaaaaa"),
    (2, "src_long", "bbbbbbbbbb"),
    # src_short: avg 2 chars  → dropped at both bars
    (3, "src_short", "cc"),
    (4, "src_short", "dd"),
    # src_exact: avg exactly 8 → kept at 8 (>= rule), dropped at 9
    (5, "src_exact", "eeeeeeee"),
    # src_mixed: 3 + 13 → avg 8 exactly via integer cross-multiply
    (6, "src_mixed", "fff"),
    (7, "src_mixed", "ggggggggggggg"),
]


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
                "source": pa.array([r[1] for r in ROWS], pa.string()),
                "text": pa.array([r[2] for r in ROWS], pa.string()),
            }
        )
    )


def _ids(ds) -> set[int]:
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return set()
    return set(pa.concat_tables(batches).column("doc_id").to_pylist())


def _ref_kept(min_avg: int) -> set[int]:
    by_src: dict[str, list[str]] = {}
    for _, s, t in ROWS:
        by_src.setdefault(s, []).append(t)
    kept_src = {
        s for s, ts in by_src.items() if sum(map(len, ts)) >= min_avg * len(ts)
    }
    return {i for i, s, _ in ROWS if s in kept_src}


@pytest.mark.parametrize("min_avg", [8, 9, 11])
@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_source_filter_matches_reference(ray_session, min_avg, mode):
    got = _ids(source_filter(_ds(), min_avg_chars=min_avg, mode=mode))
    assert got == _ref_kept(min_avg)


def test_source_filter_exact_boundary(ray_session):
    # >= at the exact integer boundary: avg 8 survives min_avg 8
    kept = _ref_kept(8)
    assert 5 in kept and 6 in kept and 7 in kept
    assert _ids(source_filter(_ds(), min_avg_chars=8)) == kept


def test_source_stats_rollup(ray_session):
    t = pa.concat_tables(
        source_stats(_ds()).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    stats = {
        s: (n, c)
        for s, n, c in zip(
            t.column("source").to_pylist(),
            t.column("n_docs").to_pylist(),
            t.column("total_chars").to_pylist(),
        )
    }
    assert stats == {
        "src_long": (2, 20),
        "src_short": (2, 4),
        "src_exact": (1, 8),
        "src_mixed": (2, 16),
    }


def test_source_filter_output_schema(ray_session):
    t = pa.concat_tables(
        source_filter(_ds(), min_avg_chars=8)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert t.schema.names == ["doc_id", "source", "n_chars"]
    assert t.schema.field("n_chars").type == pa.int64()
