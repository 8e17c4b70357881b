"""Link extraction — the engine's core per-page transform (operator M1-M3).

Semantics mirror /root/reference/internal/parser/parser.go:

- ``extract_links``             ← ExtractLinks            (parser.go:120-208)
- ``extract_same_domain_links`` ← ExtractSameDomainLinks  (parser.go:211-245)
- ``extract_links_with_stats``  ← ExtractLinksWithStats   (parser.go:248-333)

Per anchor (document order, duplicates preserved): trim href; drop empty;
drop skip-scheme (javascript:/mailto:/…); absolute http(s) hrefs pass
verbatim, others resolve against the base URL; validate; normalize
(canonical URL). Invalid base URL is an error; empty HTML yields no links.

``extract_links_batch`` is the zero-copy Arrow batch form used by the Ray
Data fetch→parse stage: pages arrive as a pyarrow RecordBatch with ``url``
(base) and ``html`` (binary) columns; out comes a ``links: list<string>``
column. HTML bytes are decoded as UTF-8 (lossy) exactly once per row.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from .htmlparse import iter_hrefs
from .urlnorm import (
    URLError,
    extract_domain,
    is_valid_url,
    should_skip_url,
)


@dataclass
class ExtractionStats:
    """Counter set matching the reference's ExtractionStats (parser.go:323-333)."""

    total_found: int = 0
    valid: int = 0
    empty_hrefs: int = 0
    filtered_out: int = 0
    relative_urls: int = 0
    resolution_errors: int = 0
    invalid_urls: int = 0
    normalization_errors: int = 0


def _extract_core(
    base_url: str,
    html_content: str,
    stats: ExtractionStats,
    *,
    with_text: bool = False,
) -> tuple[list[str], list[str], list[str]]:
    """Shared hot loop: normalized links + their hostnames (and, with
    ``with_text``, each anchor's raw descendant text), in document order.

    Semantics are EXACTLY the reference's per-href chain
    (skip → resolve → IsValidURL → NormalizeURL, parser.go:148-204), but
    each derived URL string is parsed ONCE and the base URL once per page —
    the naive chain parses the same strings 4-5×, and this loop is ~80% of
    crawl CPU. The validity check and normalization below operate on the
    single shared parse of the same string the scalar functions would each
    re-parse, so behavior is identical (both are pure functions of that
    string); normalization_errors is structurally unreachable once the
    validity parse succeeded — same as in the scalar chain.
    """
    links: list[str] = []
    hosts: list[str] = []
    texts: list[str] = []
    base_parsed: object = None  # lazily parsed once; False = parse error
    from .gourl import parse as _parse, resolve_reference

    if with_text:
        from .htmlparse import iter_anchors

        pairs = iter_anchors(html_content)
    else:
        from itertools import repeat

        pairs = zip(iter_hrefs(html_content), repeat(""))
    for href, anchor_text in pairs:
        stats.total_found += 1
        href = href.strip()
        if not href:
            stats.empty_hrefs += 1
            continue
        if should_skip_url(href):
            stats.filtered_out += 1
            continue
        if href.startswith(("http://", "https://")):
            try:
                u = _parse(href)
            except URLError:
                stats.invalid_urls += 1
                continue
        else:
            stats.relative_urls += 1
            if base_parsed is None:
                try:
                    base_parsed = _parse(base_url)
                except URLError:
                    base_parsed = False
            if base_parsed is False:
                stats.resolution_errors += 1
                continue
            try:
                ref = _parse(href)
            except URLError:
                stats.resolution_errors += 1
                continue
            absolute = str(resolve_reference(base_parsed, ref))
            try:
                u = _parse(absolute)
            except URLError:
                stats.invalid_urls += 1
                continue
        # IsValidURL on the shared parse (url.go:17-39)
        if u.scheme not in ("http", "https") or u.host == "":
            stats.invalid_urls += 1
            continue
        # NormalizeURL on the shared parse (url.go:94-118); `u` is owned here
        u.fragment = ""
        u.has_fragment = False
        if u.path != "/" and u.path.endswith("/"):
            u.path = u.path[:-1]
        if u.path == "":
            u.path = "/"
        links.append(str(u))
        hosts.append(u.hostname())
        if with_text:
            texts.append(anchor_text)
        stats.valid += 1
    return links, hosts, texts


def extract_links_with_stats(
    base_url: str, html_content: str | bytes
) -> tuple[list[str], ExtractionStats]:
    """Extract normalized links plus counters; does not validate the base URL
    (matching the reference's WithStats variant)."""
    stats = ExtractionStats()
    base_url = base_url.strip()
    if not base_url:
        raise URLError("base URL cannot be empty")
    if isinstance(html_content, bytes):
        html_content = html_content.decode("utf-8", errors="replace")
    html_content = html_content.strip()
    if not html_content:
        return [], stats
    links, _, _ = _extract_core(base_url, html_content, stats)
    return links, stats


def extract_links(base_url: str, html_content: str | bytes) -> list[str]:
    """ExtractLinks parity: validates the base URL, returns normalized links
    in document order with duplicates preserved."""
    base_url = base_url.strip()
    if not base_url:
        raise URLError("base URL cannot be empty")
    if isinstance(html_content, bytes):
        html_content = html_content.decode("utf-8", errors="replace")
    if not html_content.strip():
        return []
    if not is_valid_url(base_url):
        raise URLError(f"invalid base URL: {base_url}")
    links, _ = extract_links_with_stats(base_url, html_content)
    return links


def extract_same_domain_links(base_url: str, html_content: str | bytes) -> list[str]:
    """ExtractLinks then keep links whose hostname equals the base's
    (case-insensitive, ports ignored; link errors are skipped). Hostnames
    come from the extraction loop's own parses — no per-link re-parse."""
    base_url = base_url.strip()
    if not base_url:
        raise URLError("base URL cannot be empty")
    if isinstance(html_content, bytes):
        html_content = html_content.decode("utf-8", errors="replace")
    if not html_content.strip():
        return []
    if not is_valid_url(base_url):
        raise URLError(f"invalid base URL: {base_url}")
    links, hosts, _ = _extract_core(base_url, html_content.strip(), ExtractionStats())
    if not links:
        return []
    try:
        base_domain = extract_domain(base_url).casefold()
    except URLError:
        return []
    return [l for l, h in zip(links, hosts) if h.casefold() == base_domain]


def extract_anchors(base_url: str, html_content: str | bytes) -> list[tuple[str, str]]:
    """(normalized link, anchor text) pairs in document order — the
    link-text corpus form (anchor text is a standard relevance/label signal
    for web-scale training data). The href chain is EXACTLY
    ``extract_links``' (skip → resolve → validate → normalize, so the first
    elements equal ``extract_links`` output); text is the anchor's
    descendant text (goquery ``.Text()``) with whitespace normalized
    (split/join) for a stable product. Beyond-reference operator: the
    reference stores only hrefs (parser.go:120-208)."""
    base_url = base_url.strip()
    if not base_url:
        raise URLError("base URL cannot be empty")
    if isinstance(html_content, bytes):
        html_content = html_content.decode("utf-8", errors="replace")
    if not html_content.strip():
        return []
    if not is_valid_url(base_url):
        raise URLError(f"invalid base URL: {base_url}")
    links, _, texts = _extract_core(
        base_url, html_content, ExtractionStats(), with_text=True
    )
    return [(l, " ".join(t.split())) for l, t in zip(links, texts)]


class _ParagraphCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._depth = 0
        self._cur: list[str] = []
        self.paragraphs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "p":
            if self._depth:
                self._flush()
            self._depth += 1

    def handle_endtag(self, tag):
        if tag == "p" and self._depth:
            self._depth -= 1
            if self._depth == 0:
                self._flush()

    def handle_data(self, data):
        if self._depth:
            self._cur.append(data)

    def _flush(self):
        self.paragraphs.append("".join(self._cur))
        self._cur = []


def extract_text(html_content: str | bytes) -> str:
    """Paragraph text of a page: text content of each <p> element (nested
    inline markup included), joined with newlines. This is the engine's
    text-extraction operator; the corpus ``text`` column is defined as its
    output, giving the per-row byte-identical invariant a testable form."""
    if isinstance(html_content, bytes):
        html_content = html_content.decode("utf-8", errors="replace")
    p = _ParagraphCollector()
    p.feed(html_content)
    p.close()
    return "\n".join(p.paragraphs)


# ---------------------------------------------------------------------------
# Arrow batch forms for Ray Data map_batches (zero-copy in, Arrow out).

STATS_FIELDS = (
    "total_found",
    "valid",
    "empty_hrefs",
    "filtered_out",
    "relative_urls",
    "resolution_errors",
    "invalid_urls",
    "normalization_errors",
)


def extract_links_batch(
    batch: pa.Table,
    *,
    url_col: str = "url",
    html_col: str = "html",
    same_domain: bool = False,
    with_stats: bool = False,
    drop_html: bool = True,
) -> pa.Table:
    """Per-batch link extraction: adds ``links: list<string>`` (and optional
    per-page stats columns) to the batch; drops the heavy ``html`` column by
    default so downstream blocks stay small.

    Pure function over one Arrow batch — safe for stateless ``map_batches``.
    """
    urls = batch.column(url_col).to_pylist()
    htmls = batch.column(html_col).to_pylist()
    links_out: list[list[str]] = []
    stats_out: list[ExtractionStats] = []
    for base, html in zip(urls, htmls):
        if html is None:
            links_out.append([])
            stats_out.append(ExtractionStats())
            continue
        try:
            if same_domain:
                links = extract_same_domain_links(base, html)
                stats = None
            else:
                links, stats = extract_links_with_stats(base, html)
        except URLError:
            links, stats = [], None
        links_out.append(links)
        stats_out.append(stats or ExtractionStats())

    if drop_html and html_col in batch.column_names:
        batch = batch.drop_columns([html_col])
    batch = batch.append_column("links", pa.array(links_out, type=pa.list_(pa.string())))
    if with_stats:
        for f in STATS_FIELDS:
            batch = batch.append_column(
                f, pa.array([getattr(s, f) for s in stats_out], type=pa.int64())
            )
    return batch


def extract_anchors_batch(
    batch: pa.Table, *, url_col: str = "url", html_col: str = "html"
) -> pa.Table:
    """Exploded (src, dst, anchor) rows for one Arrow batch of pages — one
    row per extracted anchor, duplicates preserved in document order. Pure
    per-row transform (stateless ``map_batches``); the heavy html column
    never leaves this stage."""
    urls = batch.column(url_col).to_pylist()
    htmls = batch.column(html_col).to_pylist()
    srcs: list[str] = []
    dsts: list[str] = []
    anchors: list[str] = []
    for base, html in zip(urls, htmls):
        if html is None:
            continue
        try:
            pairs = extract_anchors(base, html)
        except URLError:
            continue
        srcs.extend([base] * len(pairs))
        dsts.extend(p[0] for p in pairs)
        anchors.extend(p[1] for p in pairs)
    return pa.table(
        {
            "src": pa.array(srcs, pa.string()),
            "dst": pa.array(dsts, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        }
    )
