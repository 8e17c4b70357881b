"""Sitemap source: parse/roundtrip, index expansion, seed extraction."""

from __future__ import annotations

import gzip

import pyarrow as pa

from urlmap_ray.sources.sitemap import (
    parse_sitemap_bytes,
    read_sitemaps,
    sitemap_seeds,
    write_sitemap,
    write_sitemap_index,
)


def test_parse_urlset_with_lastmod_and_gzip(tmp_path):
    p = write_sitemap(
        ["https://a.example.org/", "https://a.example.org/docs/x"],
        str(tmp_path / "sm.xml.gz"),
        lastmods={"https://a.example.org/": "2024-01-02"},
        compress=True,
    )
    with open(p, "rb") as f:
        t = parse_sitemap_bytes(f.read(), source="sm.xml.gz")
    assert t.column("url").to_pylist() == [
        "https://a.example.org/",
        "https://a.example.org/docs/x",
    ]
    assert t.column("lastmod").to_pylist() == ["2024-01-02", None]
    assert t.column("kind").to_pylist() == ["url", "url"]


def test_parse_tolerates_garbage_and_foreign_ns():
    assert parse_sitemap_bytes(b"not xml at all").num_rows == 0
    assert parse_sitemap_bytes(b"<html><body>nope</body></html>").num_rows == 0
    # namespace omitted entirely — still parsed
    raw = b"<urlset><url><loc> https://x.org/a </loc></url></urlset>"
    t = parse_sitemap_bytes(raw)
    assert t.column("url").to_pylist() == ["https://x.org/a"]  # loc trimmed


def test_read_sitemaps_expands_local_index(ray_session, tmp_path):
    sm1 = write_sitemap(["https://a.org/1", "https://a.org/2"], str(tmp_path / "a.xml"))
    sm2 = write_sitemap(["https://b.org/1"], str(tmp_path / "b.xml"))
    idx = write_sitemap_index([sm1, sm2], str(tmp_path / "index.xml"))
    rows = read_sitemaps(idx).take_all()
    assert sorted(r["url"] for r in rows) == [
        "https://a.org/1",
        "https://a.org/2",
        "https://b.org/1",
    ]
    assert all(r["kind"] == "url" for r in rows)
    # unexpandable children stay as sitemap rows
    idx2 = write_sitemap_index(
        ["https://cdn.example.com/remote-sitemap.xml"], str(tmp_path / "index2.xml")
    )
    rows2 = read_sitemaps(idx2).take_all()
    assert [r["kind"] for r in rows2] == ["sitemap"]
    rows3 = read_sitemaps(idx2, expand_indexes=False).take_all()
    assert [r["kind"] for r in rows3] == ["sitemap"]


def test_sitemap_seeds_validates_normalizes_dedups(ray_session, tmp_path):
    p = write_sitemap(
        [
            "https://a.org/page/",        # trailing slash → normalized off
            "https://a.org/page",         # duplicate after normalization
            "ftp://bad.scheme/x",         # invalid scheme → dropped
            "https://a.org/other#frag",   # fragment stripped
        ],
        str(tmp_path / "s.xml"),
    )
    seeds = sitemap_seeds(read_sitemaps(p)).take_all()
    assert sorted(r["url"] for r in seeds) == [
        "https://a.org/other",
        "https://a.org/page",
    ]


def test_sitemap_fixture_rules_and_idempotence(ray_session):
    # the driver-gated seam (sitemap_seeds query): entry rule k%3!=1,
    # '#frag' doubles merge under normalize, junk schemes dropped, and a
    # second ensure() returns the cached index without rewriting
    import os

    from urlmap_ray.corpus import corpus_for_sf_dir, ensure_sitemap_fixture
    from urlmap_ray.sources.sitemap import read_sitemaps, sitemap_seeds

    info = corpus_for_sf_dir("/root/testdata/sf0.001")
    index = ensure_sitemap_fixture(info)
    mtime = os.path.getmtime(index)
    assert ensure_sitemap_fixture(info) == index
    assert os.path.getmtime(index) == mtime  # cached, not rewritten

    got = sorted(
        r["url"] for r in sitemap_seeds(read_sitemaps(index)).take_all()
    )
    import re

    import pyarrow.parquet as pq

    urls = []
    for f in sorted(os.listdir(info.pages_path)):
        if f.endswith(".parquet"):
            urls += pq.read_table(
                os.path.join(info.pages_path, f), columns=["url"]
            ).column("url").to_pylist()

    def k(u):
        m = re.search(r"/p([0-9]+)$", u)
        return int(m.group(1)) if m else 0

    want = sorted({u for u in urls if k(u) % 3 != 1})
    assert got == want
    assert not any(u.startswith(("javascript:", "mailto:", "ftp:")) for u in got)
    assert not any("#" in u for u in got)
