"""WARC source: writer→parser roundtrip, gzip members, HTTP envelope
parsing, non-response record skipping, and feeding the link extractor."""

from __future__ import annotations

import gzip

import pyarrow as pa
import pytest

from urlmap_ray.sources.warc import parse_warc_bytes, read_warc, write_warc

RECORDS = [
    {"url": "https://a.example.org/", "html": "<a href='/x'>x</a>", "status": 200},
    {"url": "https://a.example.org/x", "html": "<p>leaf</p>", "status": 404},
    {"url": "https://b.example.org/", "html": "<a href='https://a.example.org/'>a</a>"},
]


@pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
def test_roundtrip(tmp_path, suffix):
    p = write_warc(str(tmp_path / f"t{suffix}"), RECORDS)
    raw = open(p, "rb").read()
    if suffix.endswith(".gz"):
        raw = gzip.decompress(raw)  # multi-member
    t = parse_warc_bytes(raw)
    assert t.column("url").to_pylist() == [r["url"] for r in RECORDS]
    assert t.column("status").to_pylist() == [200, 404, 200]
    assert t.column("payload").to_pylist() == [r["html"].encode() for r in RECORDS]
    assert t.column("content_type").to_pylist() == ["text/html"] * 3


def test_skips_non_response_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 7\r\n\r\npayload\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x/\r\n"
        b"Content-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/\r\n"
        b"Content-Length: 51\r\n\r\n"
        b"HTTP/1.1 301 Moved\r\nContent-Type: text/html\r\n\r\nbody"
        b"\r\n\r\n"
    )
    t = parse_warc_bytes(info + req + resp)
    assert t.num_rows == 1
    assert t.column("status").to_pylist() == [301]
    assert t.column("payload").to_pylist() == [b"body"]


def test_resource_record_and_garbage_tolerance():
    res = (
        b"junk leading bytes"
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: file:///a.txt\r\n"
        b"Content-Type: text/plain\r\nContent-Length: 5\r\n\r\nhello\r\n\r\ntrailing"
    )
    t = parse_warc_bytes(res)
    assert t.num_rows == 1
    assert t.column("payload").to_pylist() == [b"hello"]
    assert t.column("content_type").to_pylist() == ["text/plain"]


def test_read_warc_feeds_extractor(ray_session, tmp_path):
    from urlmap_ray.extract import extract_links_batch

    write_warc(str(tmp_path / "a.warc.gz"), RECORDS[:2])
    write_warc(str(tmp_path / "b.warc"), RECORDS[2:])
    ds = read_warc(str(tmp_path))
    pages = pa.concat_tables(
        ds.map_batches(
            lambda t: extract_links_batch(t.select(["url", "html"])),
            batch_format="pyarrow",
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    got = dict(zip(pages.column("url").to_pylist(), pages.column("links").to_pylist()))
    assert got["https://a.example.org/"] == ["https://a.example.org/x"]
    assert got["https://b.example.org/"] == ["https://a.example.org/"]


def test_wet_roundtrip_feeds_prep(ray_session, tmp_path):
    from urlmap_ray.prep_cli import wet_documents
    from urlmap_ray.sources.warc import read_wet, write_wet

    recs = [
        {"url": "https://a.example.org/1", "text": "the quick brown fox " * 5},
        {"url": "https://a.example.org/2", "text": "und der schnelle ich " * 5},
        {"url": "https://a.example.org/3", "text": ""},
    ]
    write_wet(str(tmp_path / "a.wet.gz"), recs[:2])
    write_wet(str(tmp_path / "b.wet"), recs[2:])
    rows = sorted(read_wet(str(tmp_path)).take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [r["url"] for r in recs]
    assert rows[0]["text"] == recs[0]["text"]
    assert rows[0]["n_chars"] == len(recs[0]["text"])
    # documents-schema ingest: empty-text record dropped, lang identified
    docs = sorted(wet_documents(str(tmp_path)).take_all(), key=lambda r: r["text"])
    assert len(docs) == 2
    langs = {d["text"][:7]: d["lang"] for d in docs}
    assert langs["the qui"] == "en" and langs["und der"] == "de"
    assert all(d["doc_id"] > 0 for d in docs)


def test_ensure_wet_fixture_idempotent(tmp_path):
    """WET fixture generation: pinned url/shard rules, atomic writes, and
    an existence-marker that makes re-calls free (no source rescan)."""
    import gzip
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from urlmap_ray.corpus import ensure_wet_fixture
    from urlmap_ray.sources.warc import parse_warc_bytes

    sf_dir = tmp_path / "sf-test"
    sf_dir.mkdir()
    docs = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array([f"body {i}" if i != 3 else None for i in range(10)]),
        }
    )
    pq.write_table(docs, str(sf_dir / "documents.parquet"))
    cache = str(tmp_path / "cache")
    paths = ensure_wet_fixture(str(sf_dir), cache_root=cache, n_shards=2)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    # shard rule doc_id % n_shards, ascending ids, null text → ''
    got = {}
    for s, p in enumerate(paths):
        t = parse_warc_bytes(gzip.decompress(open(p, "rb").read()),
                             types=("conversion",))
        urls = t.column("url").to_pylist()
        assert urls == [f"https://docs.example/{i}" for i in range(10)
                        if i % 2 == s]
        for u, payload in zip(urls, t.column("payload").to_pylist()):
            got[u] = payload.decode()
    assert got["https://docs.example/3"] == ""
    assert got["https://docs.example/4"] == "body 4"
    # marker makes the second call a pure path return
    mtimes = [os.path.getmtime(p) for p in paths]
    assert ensure_wet_fixture(str(sf_dir), cache_root=cache, n_shards=2) == paths
    assert [os.path.getmtime(p) for p in paths] == mtimes
