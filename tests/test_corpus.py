"""Corpus generator invariants (pure numpy/pyarrow — no Ray)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from urlmap_ray.corpus import (
    gen_pages_batch,
    host_layout,
    host_name,
    page_url,
    robots_table,
    sf_to_pages,
)


def test_host_layout_skew_and_total():
    starts = host_layout(1000, 10)
    sizes = np.diff(starts)
    assert sizes.sum() == 1000
    assert sizes[0] == 300  # hot host ≈ 30%
    assert (sizes > 0).all()


def test_batch_boundary_determinism():
    starts = host_layout(1000, 8)
    whole = gen_pages_batch(np.arange(1000), starts, 42)
    # arbitrary uneven splits must produce identical bytes
    parts = [
        gen_pages_batch(np.arange(0, 137), starts, 42),
        gen_pages_batch(np.arange(137, 700), starts, 42),
        gen_pages_batch(np.arange(700, 1000), starts, 42),
    ]
    assert whole.equals(pa.concat_tables(parts))


def test_seed_and_scale_change_content():
    starts = host_layout(300, 4)
    a = gen_pages_batch(np.arange(300), starts, 42)
    b = gen_pages_batch(np.arange(300), starts, 43)
    assert not a.equals(b)
    c = gen_pages_batch(np.arange(300), starts, 42, scale=2)
    import pyarrow.compute as pc

    assert pc.mean(pc.binary_length(c.column("html"))).as_py() > pc.mean(
        pc.binary_length(a.column("html"))
    ).as_py()


def test_urls_are_canonical():
    from urlmap_ray.urlnorm import normalize_url

    starts = host_layout(200, 4)
    t = gen_pages_batch(np.arange(200), starts, 42)
    for u in t.column("url").to_pylist():
        assert normalize_url(u) == u


def test_robots_table_shape():
    t = robots_table(16, 42)
    origins = t.column("origin").to_pylist()
    assert origins == [f"https://{host_name(h)}" for h in range(0, 16, 4)]
    assert all("Disallow: /sec3/" in c for c in t.column("content").to_pylist())


def test_sf_mapping():
    assert sf_to_pages(0.001) == 600
    assert sf_to_pages(0.01) == 6000
    assert sf_to_pages(0.1) == 60000


def test_page_url_roundtrip():
    assert page_url(3, 0) == "https://h00003.example.org/"
    assert page_url(3, 7) == "https://h00003.example.org/sec1/p7"


def test_ensure_eval_set_external_fixture(tmp_path):
    """The decontam eval set is a real external parquet table: generated
    once from the pinned doc_id % 20 == 7 slice, then read directly —
    regeneration must not rescan the source (idempotent by existence)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from urlmap_ray.corpus import ensure_eval_set

    sf_dir = tmp_path / "sf-test"
    sf_dir.mkdir()
    docs = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"doc {i} body words" for i in range(100)]),
        }
    )
    pq.write_table(docs, str(sf_dir / "documents.parquet"))
    cache = str(tmp_path / "cache")
    path = ensure_eval_set(str(sf_dir), cache_root=cache)
    t = pq.read_table(path)
    assert t.column("doc_id").to_pylist() == [i for i in range(100) if i % 20 == 7]
    # idempotent: second call returns the cached file without rewriting
    mtime = os.path.getmtime(path)
    assert ensure_eval_set(str(sf_dir), cache_root=cache) == path
    assert os.path.getmtime(path) == mtime
