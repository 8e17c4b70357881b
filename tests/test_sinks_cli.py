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
