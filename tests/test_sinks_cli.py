"""Sink renderings (output.go parity) and CLI argument surface."""

from __future__ import annotations

import csv
import io
import json
from datetime import datetime, timezone

import pytest

from urlmap_ray.cli import build_parser
from urlmap_ray.sinks import render, render_csv, render_json, render_text, render_xml, unique_sorted

URLS = [
    "https://example.com/b",
    "https://example.com/a",
    "https://example.com/b",  # dup
    "https://example.com/c",
]
TS = datetime(2025, 6, 1, tzinfo=timezone.utc)


def test_unique_sorted():
    # output_test.go:10-62: dedup keeps one copy; output sorted
    assert unique_sorted(URLS) == [
        "https://example.com/a",
        "https://example.com/b",
        "https://example.com/c",
    ]
    assert unique_sorted([]) == []


def test_render_text():
    assert render_text(URLS) == (
        "https://example.com/a\nhttps://example.com/b\nhttps://example.com/c\n"
    )


def test_render_json_structure():
    out = json.loads(render_json(URLS, TS))
    assert out["total"] == 3
    assert [u["url"] for u in out["urls"]] == unique_sorted(URLS)
    assert all("timestamp" in u for u in out["urls"])


def test_render_csv():
    rows = list(csv.reader(io.StringIO(render_csv(URLS, TS))))
    assert rows[0] == ["url", "timestamp"]
    assert [r[0] for r in rows[1:]] == unique_sorted(URLS)


def test_render_xml():
    x = render_xml(URLS, TS)
    assert x.startswith('<?xml version="1.0" encoding="UTF-8"?>')
    assert x.count("<url>") == 6  # 3 entries × (outer <url> wraps inner <url>)
    assert "<total>3</total>" in x


def test_render_unknown_format():
    with pytest.raises(ValueError):
        render(URLS, "yaml")


def test_cli_parser_flags():
    p = build_parser()
    args = p.parse_args(
        ["https://x.com/", "--corpus", "/tmp/c", "-d", "3", "-o", "json", "--respect-robots", "-r", "50"]
    )
    assert args.depth == 3
    assert args.output == "json"
    assert args.respect_robots
    assert args.rate_limit == 50
    with pytest.raises(SystemExit):
        p.parse_args(["https://x.com/", "--corpus", "/tmp/c", "-o", "yaml"])


def test_write_resumable_parquet_skips_finished_partitions(ray_session, tmp_path):
    """First run writes every partition with _SUCCESS markers; after
    deleting one partition's marker+data, a re-run rewrites ONLY that
    partition (other files untouched) and reports the full manifest."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from urlmap_ray.sinks import write_resumable_parquet

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 4, size=400)
    tbl = pa.table(
        {
            "day": pa.array([f"d{k}" for k in keys], pa.string()),
            "v": pa.array(np.arange(400, dtype=np.int64), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = str(tmp_path / "sink")

    m1 = write_resumable_parquet(ds, out, partition_col="day")
    assert m1.column("partition").to_pylist() == ["d0", "d1", "d2", "d3"]
    assert sum(m1.column("n_rows").to_pylist()) == 400
    paths = dict(zip(m1.column("partition").to_pylist(), m1.column("path").to_pylist()))
    mtimes_before = {p: os.stat(paths[p]).st_mtime_ns for p in ("d1", "d2", "d3")}

    # simulate a failed run: partition d0 never committed
    os.remove(os.path.join(out, "day=d0", "_SUCCESS"))
    os.remove(paths["d0"])

    m2 = write_resumable_parquet(ds, out, partition_col="day")
    assert m2.column("partition").to_pylist() == ["d0", "d1", "d2", "d3"]
    assert sum(m2.column("n_rows").to_pylist()) == 400
    for p in ("d1", "d2", "d3"):  # untouched on resume
        assert os.stat(paths[p]).st_mtime_ns == mtimes_before[p]

    # read-back equals input, and a third run writes nothing new
    # per-file reads: passing the list at once triggers hive-partition
    # inference from the day=<v> dir names, clashing with the real column
    back = pa.concat_tables(
        pq.read_table(os.path.join(out, d, "data.parquet"))
        for d in sorted(os.listdir(out))
    )
    assert back.num_rows == 400
    assert sorted(back.column("v").to_pylist()) == list(range(400))
    mtime_d0 = os.stat(paths["d0"]).st_mtime_ns
    m3 = write_resumable_parquet(ds, out, partition_col="day")
    assert sum(m3.column("n_rows").to_pylist()) == 400
    assert os.stat(paths["d0"]).st_mtime_ns == mtime_d0
