"""SPA (single-page-app) detection — parity with the reference's static
heuristics (/root/reference/internal/detector/spa_detector.go:39-227).

Four weighted signals, summed into a confidence score:

- framework markers (0.4): case-insensitive substring match of React/Vue/
  Angular/Next.js/Svelte indicator strings (spa_detector.go:90-152);
- SPA DOM structure (0.3): #root/#app/#__next/#main ids, framework data-
  attributes, or a near-empty body with no headings/paragraphs (:155-188);
- low link count (0.2): fewer than 10 ``a[href]`` anchors (:191-207);
- dynamic content (0.1): script/JS API markers, case-sensitive (:209-227).

``is_spa = confidence >= 0.5 or (structure and confidence >= 0.3)`` (:81).

The JS-verification path (VerifyWithJS) needs a live browser and is out of
scope in corpus mode (pages are pre-rendered; SURVEY §2.1 S2).

Used as a pure map_batches stage producing a per-page (or per-host cached)
``is_spa``/``confidence`` column.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

from .htmlparse import iter_hrefs

_FRAMEWORK_INDICATORS = [
    s.lower()
    for s in (
        "__REACT_DEVTOOLS_GLOBAL_HOOK__",
        "data-reactroot",
        "_reactInternalInstance",
        '<div id="root"></div>',
        '<div id="app"></div>',
        "react",
        "ReactDOM",
        "createElement",
        "Vue.js",
        "__VUE__",
        "v-if",
        "v-for",
        "v-model",
        "vue",
        "Vue.component",
        "ng-app",
        "ng-controller",
        "[ng-",
        "(ng-",
        "__ng_",
        "angular.module",
        "angular",
        "ng-",
        "__NEXT_DATA__",
        "_next/static",
        '<div id="__next"></div>',
        "next",
        "Next.js",
        "svelte",
        "__svelte__",
        "data-svelte",
    )
]

_DYNAMIC_PATTERNS = (
    "<script",
    "window.",
    "document.",
    "addEventListener",
    "fetch(",
    "XMLHttpRequest",
)

_SPA_IDS = {"root", "app", "__next", "main"}
_SPA_ATTRS = {"data-reactroot", "data-vue", "data-svelte"}


class _StructureScan(HTMLParser):
    """Mirrors goquery's view: fragments get an implied body, so body text
    is all text outside head/script/style (html5 tree building puts it
    there)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spa_marker = False
        self.has_heading_or_p = False
        self._skip_depth = 0
        self.body_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in ("head", "script", "style", "title"):
            self._skip_depth += 1
        if tag in ("h1", "h2", "h3", "p"):
            self.has_heading_or_p = True
        for k, v in attrs:
            if k == "id" and v in _SPA_IDS:
                self.spa_marker = True
            if k in _SPA_ATTRS:
                self.spa_marker = True

    def handle_endtag(self, tag):
        if tag in ("head", "script", "style", "title") and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth:
            self.body_text.append(data)


def detect_framework(html: str) -> bool:
    low = html.lower()
    return any(ind in low for ind in _FRAMEWORK_INDICATORS)


def detect_spa_structure(html: str) -> bool:
    scan = _StructureScan()
    try:
        scan.feed(html)
        scan.close()
    except Exception:
        return False
    if scan.spa_marker:
        return True
    body_text = "".join(scan.body_text).strip()
    return len(body_text) < 50 and not scan.has_heading_or_p


def detect_low_link_count(html: str) -> bool:
    return len(iter_hrefs(html)) < 10


def detect_dynamic_content(html: str) -> bool:
    return any(p in html for p in _DYNAMIC_PATTERNS)


def detect_spa(html: str | bytes) -> tuple[bool, float, list[str]]:
    """(is_spa, confidence, indicators) — DetectSPA parity."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    confidence = 0.0
    indicators: list[str] = []
    if detect_framework(html):
        confidence += 0.4
        indicators.append("framework_detected")
    structure = detect_spa_structure(html)
    if structure:
        confidence += 0.3
        indicators.append("spa_structure")
    if detect_low_link_count(html):
        confidence += 0.2
        indicators.append("low_link_count")
    if detect_dynamic_content(html):
        confidence += 0.1
        indicators.append("dynamic_content")
    is_spa = confidence >= 0.5 or (structure and confidence >= 0.3)
    return is_spa, round(confidence, 10), indicators


def detect_spa_batch(batch: pa.Table, *, html_col: str = "html") -> pa.Table:
    results = [detect_spa(h or b"") for h in batch.column(html_col).to_pylist()]
    out = batch.drop_columns([html_col])
    out = out.append_column("is_spa", pa.array([r[0] for r in results], pa.bool_()))
    out = out.append_column("confidence", pa.array([r[1] for r in results], pa.float64()))
    out = out.append_column(
        "indicators", pa.array([r[2] for r in results], pa.list_(pa.string()))
    )
    return out
