"""Pure-Python crawl oracles — the semantics ground truth for the Ray engine.

``crawl_sequential`` re-implements the reference's deterministic sequential
BFS (crawler.go CrawlRecursive :168-276 + crawlSingle :279-351) over an
in-memory url→(status, html) corpus dict, with the concurrent crawler's robots
ordering (processJob, crawler.go:574-656) available via config. 100%
deterministic; used to assert the Ray wave engine produces the identical
visited set and per-URL min depth.

``crawl_waves`` is the same computation expressed as explicit BFS waves with
optional deterministic per-host budget deferral — the single-process model
of the distributed engine, used for budget/determinism tests.

Never used in the hot path; corpora here are test-scale.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .config import CrawlConfig
from .extract import extract_links, extract_same_domain_links
from .robotstxt import RobotsIndex
from .urlnorm import URLError, extract_domain, is_same_domain, is_same_path_prefix, is_valid_url, normalize_url


@dataclass
class OracleResult:
    url: str
    depth: int
    status: int  # 200 ok, 4xx/5xx error page, 0 corpus miss ("network error")
    links: list[str] = field(default_factory=list)
    error: str | None = None
    #: 1-based fetch attempt that produced this FINAL result (client.go:63-83
    #: retry parity: >1 means the page was transiently failing before)
    attempt: int = 1


@dataclass
class OracleCrawl:
    results: list[OracleResult] = field(default_factory=list)
    visited: dict[str, int] = field(default_factory=dict)  # url -> claim depth
    skipped: int = 0
    max_depth_reached: int = 0

    @property
    def output_urls(self) -> list[str]:
        """What the CLI prints: sorted unique URLs of all results
        (output.go:44-78 — includes fetch failures)."""
        return sorted({r.url for r in self.results})


def _norm_entry(entry) -> tuple[int, bytes | None, int]:
    """Corpus values may be html, (status, html) or (status, html, flaky)."""
    if not isinstance(entry, tuple):
        return 200, entry, 0
    if len(entry) == 2:
        return entry[0], entry[1], 0
    return entry


def _attempt_fetch(
    url: str, depth: int, corpus: dict, cfg: CrawlConfig, attempt: int
) -> OracleResult | None:
    """One fetch attempt. None = transient failure with attempts left (the
    caller re-enqueues at attempt+1); otherwise the FINAL result."""
    entry = corpus.get(url)
    if entry is None:
        # corpus miss = dangling link: deterministically absent, never
        # retried (crawler.go:323-326 network-error record)
        return OracleResult(url, depth, 0, error="failed to fetch URL", attempt=attempt)
    status, html, flaky = _norm_entry(entry)
    if attempt <= flaky:
        # transient 503 window (client.go:63-83 as data)
        if attempt < cfg.max_attempts:
            return None
        return OracleResult(
            url, depth, 503, error="HTTP error: 503", attempt=attempt
        )
    if status != 200:
        # crawler.go:331-334: non-2xx/3xx → error result, URL stays visited,
        # body never parsed for links.
        return OracleResult(url, depth, status, error=f"HTTP error: {status}", attempt=attempt)
    try:
        if cfg.same_domain:
            links = extract_same_domain_links(url, html)
        else:
            links = extract_links(url, html)
    except URLError as e:
        return OracleResult(url, depth, 200, error=f"failed to extract links: {e}", attempt=attempt)
    return OracleResult(url, depth, 200, links=links, attempt=attempt)


def _fetch_and_extract(url: str, depth: int, corpus: dict, cfg: CrawlConfig) -> OracleResult:
    """Fetch with IMMEDIATE retries (the reference's client-level loop) —
    used by the sequential oracle; wave-level re-enqueueing in crawl_waves
    yields the same final result per URL by construction."""
    for attempt in range(1, max(1, cfg.max_attempts) + 1):
        res = _attempt_fetch(url, depth, corpus, cfg, attempt)
        if res is not None:
            return res
    raise AssertionError("unreachable: _attempt_fetch finalizes at max_attempts")


def _admit(link: str, bases: list[str], cfg: CrawlConfig) -> bool:
    if not cfg.same_domain:
        return True
    for base in bases:
        try:
            if cfg.same_path_prefix:
                if is_same_path_prefix(base, link):
                    return True
            elif is_same_domain(base, link):
                return True
        except URLError:
            continue
    return False


def crawl_sequential(
    corpus: dict[str, tuple[int, bytes]],
    start_url: str | list[str],
    cfg: CrawlConfig = CrawlConfig(),
    robots: RobotsIndex | None = None,
) -> OracleCrawl:
    """FIFO BFS exactly as CrawlRecursive; robots handling as processJob."""
    out = OracleCrawl()
    starts = [start_url] if isinstance(start_url, str) else list(start_url)
    for s in starts:
        if not is_valid_url(s):
            raise URLError(f"invalid start URL: {s}")
    seeds = [normalize_url(s) for s in starts]
    bases = seeds  # full normalized seed URLs (crawler.go:183-185)

    queue: deque[tuple[str, int]] = deque((s, 0) for s in seeds)
    for s in seeds:
        out.visited[s] = 0
    while queue:
        url, depth = queue.popleft()
        if robots is not None and cfg.respect_robots and not robots.is_allowed(url):
            out.skipped += 1
            continue
        if cfg.max_depth >= 0 and depth > cfg.max_depth:
            out.skipped += 1
            continue
        result = _fetch_and_extract(url, depth, corpus, cfg)
        out.results.append(result)
        if result.error is None:
            for link in result.links:
                if link in out.visited:
                    continue
                if not _admit(link, bases, cfg):
                    continue
                queue.append((link, depth + 1))
                out.visited[link] = depth + 1
        out.max_depth_reached = max(out.max_depth_reached, depth)
    return out


def crawl_waves(
    corpus: dict[str, tuple[int, bytes]],
    start_url: str | list[str],
    cfg: CrawlConfig = CrawlConfig(),
    robots: RobotsIndex | None = None,
) -> OracleCrawl:
    """Explicit-wave BFS with deterministic per-host budget deferral —
    the single-process semantic model of the Ray engine."""
    out = OracleCrawl()
    starts = [start_url] if isinstance(start_url, str) else list(start_url)
    for s in starts:
        if not is_valid_url(s):
            raise URLError(f"invalid start URL: {s}")
    seeds = [normalize_url(s) for s in starts]
    bases = seeds
    for s in seeds:
        out.visited[s] = 0
    frontier: list[tuple[str, int, int]] = [(s, 0, 1) for s in seeds]
    while frontier:
        # Deterministic per-host admission: iterate the frontier in priority
        # order and take each host's first B ("url" = lexicographic;
        # "shallow" = lowest depth first, url tiebreak — the engine's
        # per-host priority-queue admission, politeness.py sort_keys).
        if cfg.per_host_budget is not None:
            prio_key = (
                None if cfg.priority == "url" else (lambda t: (t[1], t[0], t[2]))
            )
            by_host: dict[str, int] = {}
            admitted, deferred = [], []
            for url, depth, attempt in sorted(frontier, key=prio_key):
                host = extract_domain(url)
                if by_host.get(host, 0) < cfg.per_host_budget:
                    by_host[host] = by_host.get(host, 0) + 1
                    admitted.append((url, depth, attempt))
                else:
                    deferred.append((url, depth, attempt))
        else:
            admitted, deferred = sorted(frontier), []

        # Two-phase wave: process all admitted URLs, then claim candidates
        # with wave-level min depth (matching the engine's groupby-min before
        # the seen-set claim; when no budget defers rows, all candidates in a
        # wave share one depth and this equals FIFO claim order). Transient
        # fetch failures with attempts left re-enter the next wave's frontier
        # at attempt+1, unchanged depth (the engine's "retry" verdict).
        candidates: dict[str, int] = {}
        retries: list[tuple[str, int, int]] = []
        for url, depth, attempt in admitted:
            if robots is not None and cfg.respect_robots and not robots.is_allowed(url):
                out.skipped += 1
                continue
            if cfg.max_depth >= 0 and depth > cfg.max_depth:
                out.skipped += 1
                continue
            result = _attempt_fetch(url, depth, corpus, cfg, attempt)
            if result is None:
                retries.append((url, depth, attempt + 1))
                continue
            out.results.append(result)
            out.max_depth_reached = max(out.max_depth_reached, depth)
            if result.error is None:
                for link in result.links:
                    if not _admit(link, bases, cfg):
                        continue
                    if link not in candidates or depth + 1 < candidates[link]:
                        candidates[link] = depth + 1
        next_frontier: list[tuple[str, int, int]] = list(deferred) + retries
        for link in sorted(candidates):
            if link in out.visited:
                continue
            out.visited[link] = candidates[link]
            next_frontier.append((link, candidates[link], 1))
        frontier = next_frontier
    return out


def load_corpus_dict(pages_dir: str) -> dict[str, tuple[int, bytes, int]]:
    """url→(status, html, flaky_fails) for test-scale corpora (oracle side
    only). Pre-flaky corpora load with flaky_fails=0 (all pages stable)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(pages_dir, format="parquet")
    cols = ["url", "status", "html"]
    has_flaky = "flaky_fails" in ds.schema.names
    if has_flaky:
        cols.append("flaky_fails")
    tbl = ds.to_table(columns=cols)
    flaky = (
        tbl.column("flaky_fails").to_pylist()
        if has_flaky
        else [0] * tbl.num_rows
    )
    return {
        u: (s, h, f or 0)
        for u, s, h, f in zip(
            tbl.column("url").to_pylist(),
            tbl.column("status").to_pylist(),
            tbl.column("html").to_pylist(),
            flaky,
        )
    }
