"""Sitemap source: read sitemaps.org XML sitemaps into a seed table.

The reference parses robots.txt ``Sitemap:`` lines and stores them
(robots.go:155-158 via robotstxt.py:78-79 here); the natural next step —
what a crawl engine actually does with them — is reading the sitemap
files into a seed/frontier list. This is a dependency-free
(xml.etree, stdlib) reader for the sitemaps.org 0.9 protocol:

- ``<urlset>`` documents yield (url, lastmod) entries;
- ``<sitemapindex>`` documents yield child-sitemap entries, surfaced as
  rows with ``kind="sitemap"`` so the caller can schedule a follow-up
  read (the engine has no network; index expansion over local paths is
  supported directly).

Scale shape: identical to the WARC source — ``read_binary_files``
distributes whole files to tasks (real sitemap files cap at 50k URLs /
50MB by spec, so file-level parallelism is the right granularity), the
per-file parse is one ElementTree pass, and the output streams into
:func:`urlmap_ray.sources.seeds.read_seed_list`-style validation or a
crawl frontier. Gzip (.xml.gz) handled by magic bytes, like WARC.
"""

from __future__ import annotations

import gzip
import os
import xml.etree.ElementTree as ET

import pyarrow as pa

__all__ = [
    "parse_sitemap_bytes",
    "read_sitemaps",
    "sitemap_seeds",
    "write_sitemap",
    "write_sitemap_index",
]

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _local(tag: str) -> str:
    """Namespace-insensitive tag name (spec files carry the 0.9 ns, but
    real-world sitemaps frequently omit or typo it)."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_bytes(data: bytes, *, source: str = "") -> pa.Table:
    """One sitemap document → (url, lastmod, kind, source) rows.

    kind is "url" for ``<urlset>`` entries and "sitemap" for
    ``<sitemapindex>`` entries. lastmod is the raw W3C-datetime string
    (nullable) — parsing it to a timestamp is the caller's choice since
    real-world values are wildly inconsistent. Malformed XML yields an
    empty table rather than poisoning the batch (crawl inputs are
    untrusted)."""
    urls: list[str] = []
    lastmods: list[str | None] = []
    kinds: list[str] = []
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        root = None
    if root is not None and _local(root.tag) in ("urlset", "sitemapindex"):
        kind = "url" if _local(root.tag) == "urlset" else "sitemap"
        for entry in root:
            if _local(entry.tag) not in ("url", "sitemap"):
                continue
            loc, lastmod = None, None
            for child in entry:
                t = _local(child.tag)
                if t == "loc":
                    loc = (child.text or "").strip()
                elif t == "lastmod":
                    lastmod = (child.text or "").strip() or None
            if loc:
                urls.append(loc)
                lastmods.append(lastmod)
                kinds.append(kind)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "lastmod": pa.array(lastmods, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "source": pa.array([source] * len(urls), pa.string()),
        }
    )


def read_sitemaps(paths, *, expand_indexes: bool = True):
    """Sitemap file(s)/dir → streaming Dataset of (url, lastmod, kind,
    source) rows.

    With ``expand_indexes``, locally-resolvable ``<sitemapindex>``
    children (entries whose loc is an existing file path, or a file in
    the index's own directory — the corpus-mode layout) are read in the
    same task; unresolvable children stay as ``kind="sitemap"`` rows for
    the caller to fetch."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for path, raw in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            t = parse_sitemap_bytes(raw, source=os.path.basename(path))
            if expand_indexes:
                kinds = t.column("kind").to_pylist()
                if "sitemap" in kinds:
                    keep_rows, child_tables = [], []
                    for i, (loc, kind) in enumerate(
                        zip(t.column("url").to_pylist(), kinds)
                    ):
                        if kind != "sitemap":
                            keep_rows.append(i)
                            continue
                        cand = loc if os.path.exists(loc) else os.path.join(
                            os.path.dirname(path), os.path.basename(loc)
                        )
                        if os.path.exists(cand):
                            with open(cand, "rb") as f:
                                child_tables.append(
                                    parse_sitemap_bytes(
                                        f.read(), source=os.path.basename(cand)
                                    )
                                )
                        else:
                            keep_rows.append(i)
                    t = pa.concat_tables(
                        [t.take(pa.array(keep_rows, pa.int64())), *child_tables]
                    )
            tables.append(t)
        return pa.concat_tables(tables) if tables else parse_sitemap_bytes(b"")

    return files.map_batches(parse, batch_format="pyarrow")


def sitemap_seeds(ds):
    """Sitemap rows → validated, normalized, distinct seed URLs (one
    ``url`` column), ready for CrawlEngine seeds or a frontier table.
    Validation/normalization is the crawler's own F1/F4 algebra."""
    from ..urlnorm import is_valid_url, normalize_url

    def norm(t: pa.Table) -> pa.Table:
        out = []
        for u, kind in zip(t.column("url").to_pylist(), t.column("kind").to_pylist()):
            if kind != "url" or not is_valid_url(u):
                continue
            n = normalize_url(u)
            if n:
                out.append(n)
        return pa.table({"url": pa.array(sorted(set(out)), pa.string())})

    from ray.data.aggregate import Count

    return (
        ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("url")
        .aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["url"]), batch_format="pyarrow")
    )


def write_sitemap(urls, path: str, *, lastmods=None, compress: bool = False) -> str:
    """Write a ``<urlset>`` sitemap (test fixture / export sink)."""
    lastmods = lastmods or {}
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<urlset xmlns="{_NS}">',
    ]
    for u in urls:
        parts.append("  <url>")
        parts.append(f"    <loc>{u}</loc>")
        lm = lastmods.get(u)
        if lm:
            parts.append(f"    <lastmod>{lm}</lastmod>")
        parts.append("  </url>")
    parts.append("</urlset>")
    data = "\n".join(parts).encode("utf-8")
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return path


def write_sitemap_index(sitemap_paths, path: str) -> str:
    """Write a ``<sitemapindex>`` document referencing sitemap files."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<sitemapindex xmlns="{_NS}">',
    ]
    for p in sitemap_paths:
        parts.append(f"  <sitemap><loc>{p}</loc></sitemap>")
    parts.append("</sitemapindex>")
    with open(path, "wb") as f:
        f.write("\n".join(parts).encode("utf-8"))
    return path
