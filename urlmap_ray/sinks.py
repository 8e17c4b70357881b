"""Output sinks (S4-S8) — CLI-parity renderings of the visited URL set.

Mirrors /root/reference/internal/output/output.go: dedup (first occurrence)
→ sort lexicographically → render as text / JSON / CSV / XML / file. The
scale path is ``write_visited_parquet`` (partitioned Parquet straight from
the Dataset); the text renderings are driver-side and meant for CLI-sized
results, exactly like the reference which holds the full URL list in memory.

JSON structure matches CrawlOutput (output.go:36-40): urls[{url,timestamp}],
timestamp, total. CSV: header ``url,timestamp``, RFC3339 timestamps
(output.go:158-180). XML: indented CrawlOutput with standard header
(output.go:183-211).
"""

from __future__ import annotations

import csv
import io
import json
from datetime import datetime, timezone
from xml.sax.saxutils import escape


def unique_sorted(urls: list[str]) -> list[str]:
    # removeDuplicates keeps first occurrence, then sort.Strings
    seen = set()
    out = []
    for u in urls:
        if u not in seen:
            seen.add(u)
            out.append(u)
    out.sort()
    return out


def render_text(urls: list[str]) -> str:
    return "".join(u + "\n" for u in unique_sorted(urls))


def render_json(urls: list[str], timestamp: datetime | None = None) -> str:
    ts = (timestamp or datetime.now(timezone.utc)).isoformat()
    uniq = unique_sorted(urls)
    out = {
        "urls": [{"url": u, "timestamp": ts} for u in uniq],
        "timestamp": ts,
        "total": len(uniq),
    }
    return json.dumps(out, indent=2) + "\n"


def render_csv(urls: list[str], timestamp: datetime | None = None) -> str:
    ts = (timestamp or datetime.now(timezone.utc)).strftime("%Y-%m-%dT%H:%M:%S%z")
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(["url", "timestamp"])
    for u in unique_sorted(urls):
        w.writerow([u, ts])
    return buf.getvalue()


def render_xml(urls: list[str], timestamp: datetime | None = None) -> str:
    ts = (timestamp or datetime.now(timezone.utc)).isoformat()
    uniq = unique_sorted(urls)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>', "<CrawlOutput>", "  <urls>"]
    for u in uniq:
        lines.append("    <url>")
        lines.append(f"      <url>{escape(u)}</url>")
        lines.append(f"      <timestamp>{ts}</timestamp>")
        lines.append("    </url>")
    lines.append("  </urls>")
    lines.append(f"  <timestamp>{ts}</timestamp>")
    lines.append(f"  <total>{len(uniq)}</total>")
    lines.append("</CrawlOutput>")
    return "\n".join(lines) + "\n"


RENDERERS = {
    "text": render_text,
    "json": render_json,
    "csv": render_csv,
    "xml": render_xml,
}


def render(urls: list[str], fmt: str = "text") -> str:
    if fmt not in RENDERERS:
        raise ValueError(f"unsupported output format: {fmt} (use {sorted(RENDERERS)})")
    return RENDERERS[fmt](urls)


def write_file(urls: list[str], filename: str) -> None:
    """S8: dedup+sort, one URL per line (output.go:82-101)."""
    with open(filename, "w") as f:
        f.write(render_text(urls))


def write_visited_parquet(visited_ds, path: str) -> None:
    """Scale sink: the sorted visited Dataset straight to partitioned
    Parquet (one file per block — resumable, never one giant file)."""
    visited_ds.write_parquet(path)
