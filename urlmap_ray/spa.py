"""SPA (single-page-app) detection — parity with the reference's static
heuristics (/root/reference/internal/detector/spa_detector.go:39-227).

Four weighted signals, summed into a confidence score:

- framework markers (0.4): case-insensitive substring match of React/Vue/
  Angular/Next.js/Svelte indicator strings (spa_detector.go:90-152);
- SPA DOM structure (0.3): #root/#app/#__next/#main ids, framework data-
  attributes, or a near-empty body with no headings/paragraphs (:155-188);
- low link count (0.2): fewer than 10 ``a[href]`` anchors — scored only
  when a framework was detected (:70-72);
- dynamic content (0.1): script/JS API markers, case-sensitive — scored
  only when a framework was detected (:76-78).

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
    framework = detect_framework(html)
    if framework:
        confidence += 0.4
        indicators.append("framework_detected")
    structure = detect_spa_structure(html)
    if structure:
        confidence += 0.3
        indicators.append("spa_structure")
    # Signals 3 & 4 score only on framework pages (spa_detector.go:70-78):
    # a plain static site with few links / a script tag is not SPA evidence.
    if framework and detect_low_link_count(html):
        confidence += 0.2
        indicators.append("low_link_count")
    if framework and detect_dynamic_content(html):
        confidence += 0.1
        indicators.append("dynamic_content")
    is_spa = confidence >= 0.5 or (structure and confidence >= 0.3)
    return is_spa, round(confidence, 10), indicators


class DetectionCache:
    """Per-domain SPA-verdict memo with TTL (cache.go:9-64 semantics).

    No lock needed: one cache lives inside one worker/actor (Ray gives each
    its own process); the reference's RWMutex guarded goroutines sharing one
    map. ``clock`` is injectable for TTL tests."""

    def __init__(self, ttl_seconds: float = 3600.0, clock=None):
        import time as _time

        self.ttl = ttl_seconds
        self.clock = clock or _time.monotonic
        self._data: dict[str, tuple[float, tuple]] = {}

    def get(self, domain: str):
        hit = self._data.get(domain)
        if hit is None:
            return None
        ts, result = hit
        if self.clock() - ts > self.ttl:
            del self._data[domain]  # cache.go:33-37: expired entries evict on read
            return None
        return result

    def set(self, domain: str, result) -> None:
        self._data[domain] = (self.clock(), result)

    def clear(self) -> None:
        self._data.clear()

    def size(self) -> int:
        return len(self._data)


class DomainSpaDetector:
    """Stateful map_batches stage: the reference's per-domain detection memo
    (spa_detector.go:39-43 — the first page seen of a domain decides the
    domain's verdict for the TTL window; later pages reuse it).

    Use as ``map_batches(DomainSpaDetector, concurrency=N,
    batch_format="pyarrow")``: the cache is built once per actor and lives
    across batches. Partitioning assumption: hit rate (not correctness)
    depends on a domain's pages landing on the same actor — route by host
    (the crawl's frontier is already host-sorted) to match the reference's
    single-process hit rate. Adds a ``spa_cached`` column so redundant-
    detection savings are observable (the stats hook the reference logs)."""

    def __init__(self, ttl_seconds: float = 3600.0, clock=None):
        self.cache = DetectionCache(ttl_seconds, clock)
        self.hits = 0
        self.misses = 0

    def __call__(
        self, batch: pa.Table, url_col: str = "url", html_col: str = "html"
    ) -> pa.Table:
        from .urlnorm import URLError, extract_domain

        verdicts, cached_flags = [], []
        for url, html in zip(
            batch.column(url_col).to_pylist(), batch.column(html_col).to_pylist()
        ):
            try:
                domain = extract_domain(url)
            except URLError:
                domain = ""
            result = self.cache.get(domain)
            if result is None:
                self.misses += 1
                result = detect_spa(html or b"")
                self.cache.set(domain, result)
                cached_flags.append(False)
            else:
                self.hits += 1
                cached_flags.append(True)
            verdicts.append(result)
        out = batch.drop_columns([html_col])
        out = out.append_column("is_spa", pa.array([v[0] for v in verdicts], pa.bool_()))
        out = out.append_column(
            "confidence", pa.array([v[1] for v in verdicts], pa.float64())
        )
        out = out.append_column(
            "indicators", pa.array([v[2] for v in verdicts], pa.list_(pa.string()))
        )
        return out.append_column("spa_cached", pa.array(cached_flags, pa.bool_()))


def detect_spa_batch(batch: pa.Table, *, html_col: str = "html") -> pa.Table:
    results = [detect_spa(h or b"") for h in batch.column(html_col).to_pylist()]
    out = batch.drop_columns([html_col])
    out = out.append_column("is_spa", pa.array([r[0] for r in results], pa.bool_()))
    out = out.append_column("confidence", pa.array([r[1] for r in results], pa.float64()))
    out = out.append_column(
        "indicators", pa.array([r[2] for r in results], pa.list_(pa.string()))
    )
    return out
