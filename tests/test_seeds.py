"""Seed-list sources (urlmap_ray/sources/seeds.py).

The reference takes exactly one seed on the CLI (main.go:115-123); bulk
seed files are our 100TB-scale extension. Validation/normalization must
match the reference's start-URL rules (url.go:17-39, url.go:94-118).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from urlmap_ray.sources import read_seed_list
from urlmap_ray.urlnorm import URLError

VALID = ["https://a.example.org/x", "http://b.example.org/"]


def test_txt_comments_blanks_dedup(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text(
        "# comment\n\nhttps://a.example.org/x\nhttps://a.example.org/x/\n"
        "http://b.example.org\n"
    )
    # trailing slash strips (NormalizeURL) -> dedup; bare host gains '/'
    assert read_seed_list(str(p)) == [
        "https://a.example.org/x",
        "http://b.example.org/",
    ]


def test_csv_requires_url_column(tmp_path):
    p = tmp_path / "seeds.csv"
    p.write_text("url,rank\nhttps://a.example.org/x,1\nhttp://b.example.org/,2\n")
    assert read_seed_list(str(p)) == VALID

    bad = tmp_path / "bad.csv"
    bad.write_text("link\nhttps://a.example.org/\n")
    with pytest.raises(URLError):
        read_seed_list(str(bad))


def test_jsonl(tmp_path):
    p = tmp_path / "seeds.jsonl"
    p.write_text(
        "\n".join(json.dumps({"url": u, "n": i}) for i, u in enumerate(VALID)) + "\n"
    )
    assert read_seed_list(str(p)) == VALID


def test_parquet(tmp_path):
    p = tmp_path / "seeds.parquet"
    pq.write_table(pa.table({"url": VALID, "rank": [1, 2]}), p)
    assert read_seed_list(str(p)) == VALID


def test_strict_vs_lenient(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("ftp://bad.example.org/\nhttps://a.example.org/x\n")
    with pytest.raises(URLError):
        read_seed_list(str(p))
    assert read_seed_list(str(p), strict=False) == ["https://a.example.org/x"]


def test_empty_and_unknown_ext(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("# nothing\n")
    with pytest.raises(URLError):
        read_seed_list(str(p))
    q = tmp_path / "seeds.yaml"
    q.write_text("url: x\n")
    with pytest.raises(URLError):
        read_seed_list(str(q))


def test_cli_seeds_file_flag():
    from urlmap_ray.cli import build_parser

    p = build_parser()
    args = p.parse_args(["--seeds-file", "/tmp/s.txt", "--corpus", "/tmp/c"])
    assert args.seeds_file == "/tmp/s.txt" and args.url is None


def test_cli_requires_exactly_one_seed_source(tmp_path):
    from urlmap_ray.cli import main

    with pytest.raises(SystemExit):
        main(["--corpus", "/tmp/c"])
    with pytest.raises(SystemExit):
        main(["https://x.com/", "--seeds-file", "/tmp/s.txt", "--corpus", "/tmp/c"])


def test_cli_seeds_file_e2e(tmp_path):
    """CLI crawl from a seed file = multi-seed sequential oracle output.

    Subprocess because the CLI owns its own Ray session (would shut down the
    pytest session fixture's otherwise).
    """
    import os
    import subprocess
    import sys

    from urlmap_ray.corpus import generate_corpus
    from urlmap_ray.oracle import crawl_sequential, load_corpus_dict

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    info = generate_corpus(str(tmp_path / "corpus"), 120)
    seeds = info.seeds[:2]
    sf = tmp_path / "seeds.txt"
    sf.write_text("# two hosts\n" + "\n".join(seeds) + "\n")

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "urlmap_ray.cli",
            "--seeds-file",
            str(sf),
            "--corpus",
            info.dir,
            "-q",
        ],
        capture_output=True,
        text=True,
        env=dict(os.environ, PYTHONPATH=repo),
        cwd=repo,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    oracle = crawl_sequential(load_corpus_dict(info.pages_path), seeds)
    assert proc.stdout.splitlines() == oracle.output_urls


def test_read_frontier_streams_pruned(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from urlmap_ray.sources import read_frontier

    d = tmp_path / "frontier-0"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "url": ["https://a.example.org/", "https://b.example.org/"],
                "depth": pa.array([0, 1], pa.int32()),
                "host": ["a.example.org", "b.example.org"],  # pruned away
            }
        ),
        d / "part-0.parquet",
    )
    ds = read_frontier(str(d))
    rows = ds.take_all()
    assert sorted(r["url"] for r in rows) == [
        "https://a.example.org/",
        "https://b.example.org/",
    ]
    assert set(rows[0]) == {"url", "depth"}  # column-pruned read
