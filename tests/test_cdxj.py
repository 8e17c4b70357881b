"""CDXJ (Common Crawl capture-index) source tests: writer/parser roundtrip,
distributed read, seed funnel, untrusted-input tolerance."""

from __future__ import annotations

import gzip

from urlmap_ray.sources.cdxj import (
    cdxj_seeds,
    parse_cdxj_bytes,
    read_cdxj,
    surt_key,
    write_cdxj,
)

ROWS = [
    {
        "url": "https://h00001.example.org/sec1/p5",
        "ts": "20240301120000",
        "status": 200,
        "mime": "text/html",
        "digest": "sha1:AAAA",
        "length": 1234,
        "offset": 0,
        "filename": "crawl-00000.warc.gz",
    },
    {"url": "https://h00001.example.org/", "status": 200},
    {"url": "https://h00002.example.org/gone", "status": 404},
    {"url": "https://h00001.example.org/", "status": 200, "ts": "20240401000000"},
]


def test_surt_key_convention():
    assert surt_key("https://sub.example.org/A/B?X=1") == "org,example,sub)/a/b?x=1"
    assert surt_key("http://www.Example.com:80/") == "com,example)/"
    assert surt_key("https://example.org") == "org,example)/"


def test_cdxj_roundtrip_sorted_and_gzip(tmp_path):
    p = write_cdxj(ROWS, str(tmp_path / "idx.cdxj.gz"))
    raw = open(p, "rb").read()
    assert raw[:2] == b"\x1f\x8b"
    t = parse_cdxj_bytes(raw, source=p)
    assert t.num_rows == len(ROWS)
    keys = t.column("urlkey").to_pylist()
    assert keys == sorted(keys)  # index order is (urlkey, ts)
    by_url = dict(zip(t.column("url").to_pylist(), t.column("status").to_pylist()))
    assert by_url["https://h00002.example.org/gone"] == 404
    full = t.filter(
        __import__("pyarrow").compute.equal(t.column("urlkey"), "org,example,h00001)/sec1/p5")
    )
    assert full.column("length").to_pylist() == [1234]
    assert full.column("filename").to_pylist() == ["crawl-00000.warc.gz"]


def test_cdxj_malformed_lines_skipped():
    data = b"\n".join(
        [
            b"org,x)/ 20240101000000 {\"url\": \"https://x.org/\", \"status\": \"200\"}",
            b"not a cdxj line",
            b"org,y)/ 20240101000000 not-json",
            b"org,z)/ 20240101000000 {\"no_url\": true}",
            b"org,w)/ 20240101000000 {\"url\": \"https://w.org/\", \"status\": \"abc\"}",
        ]
    )
    t = parse_cdxj_bytes(data)
    assert t.column("url").to_pylist() == ["https://x.org/", "https://w.org/"]
    assert t.column("status").to_pylist() == [200, None]
    assert parse_cdxj_bytes(b"\x1f\x8bgarbage").num_rows == 0


def test_read_cdxj_distributed_and_seeds(ray_session, tmp_path):
    p1 = write_cdxj(ROWS, str(tmp_path / "a.cdxj"))
    p2 = write_cdxj(
        [
            {"url": "https://h00003.example.org/x/", "status": 200},
            {"url": "javascript:void(0)", "status": 200},
            {"url": "https://h00004.example.org/err", "status": 500},
        ],
        str(tmp_path / "b.cdxj.gz"),
    )
    ds = read_cdxj([p1, p2])
    rows = ds.take_all()
    assert len(rows) == len(ROWS) + 3
    assert {r["source"].endswith(("a.cdxj", "b.cdxj.gz")) for r in rows} == {True}

    seeds = sorted(r["url"] for r in cdxj_seeds([p1, p2]).take_all())
    # 200s only, normalized (trailing slash stripped), deduped, invalid
    # schemes dropped by the crawler's own validate/normalize algebra
    assert seeds == [
        "https://h00001.example.org/",
        "https://h00001.example.org/sec1/p5",
        "https://h00003.example.org/x",
    ]


def test_seed_list_accepts_cdxj(tmp_path):
    from urlmap_ray.sources.seeds import read_seed_list

    p = write_cdxj(ROWS, str(tmp_path / "seeds.cdxj"))
    seeds = read_seed_list(p)
    # 2xx captures only, normalized, order-preserving dedup
    assert seeds == [
        "https://h00001.example.org/",
        "https://h00001.example.org/sec1/p5",
    ]


def test_cdxj_fixture_rules_and_idempotence(ray_session):
    # the driver-gated seam (cdxj_plan query): one capture per page at the
    # real corpus status, later 500 re-captures for k%9==4 filtered by the
    # 200-only plan; ensure() is cached-idempotent
    import os
    import re

    import pyarrow.parquet as pq

    from urlmap_ray.corpus import corpus_for_sf_dir, ensure_cdxj_fixture
    from urlmap_ray.sources.cdxj import cdxj_seeds, read_cdxj

    info = corpus_for_sf_dir("/root/testdata/sf0.001")
    paths = ensure_cdxj_fixture(info)
    assert ensure_cdxj_fixture(info) == paths

    rows = []
    for f in sorted(os.listdir(info.pages_path)):
        if f.endswith(".parquet"):
            t = pq.read_table(
                os.path.join(info.pages_path, f), columns=["url", "status"]
            )
            rows += list(
                zip(t.column("url").to_pylist(), t.column("status").to_pylist())
            )

    def k(u):
        m = re.search(r"/p([0-9]+)$", u)
        return int(m.group(1)) if m else 0

    n_recaps = sum(1 for u, _ in rows if k(u) % 9 == 4)
    total = read_cdxj(paths).count()
    assert total == len(rows) + n_recaps  # every page + the 500 re-captures

    got = sorted(r["url"] for r in cdxj_seeds(paths).take_all())
    want = sorted({u for u, st in rows if st == 200})
    assert got == want
