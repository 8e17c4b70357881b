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


def _fetch_and_extract(url: str, depth: int, corpus: dict, cfg: CrawlConfig) -> OracleResult:
    entry = corpus.get(url)
    if entry is None:
        return OracleResult(url, depth, 0, error="failed to fetch URL")
    status, html = entry if isinstance(entry, tuple) else (200, entry)
    if status != 200:
        # crawler.go:331-334: non-2xx/3xx → error result, URL stays visited,
        # body never parsed for links.
        return OracleResult(url, depth, status, error=f"HTTP error: {status}")
    try:
        if cfg.same_domain:
            links = extract_same_domain_links(url, html)
        else:
            links = extract_links(url, html)
    except URLError as e:
        return OracleResult(url, depth, 200, error=f"failed to extract links: {e}")
    return OracleResult(url, depth, 200, links=links)


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
    frontier: list[tuple[str, int]] = [(s, 0) for s in seeds]
    while frontier:
        # Deterministic per-host admission: sort by (host, url), take first B.
        if cfg.per_host_budget is not None:
            by_host: dict[str, int] = {}
            admitted, deferred = [], []
            for url, depth in sorted(frontier):
                host = extract_domain(url)
                if by_host.get(host, 0) < cfg.per_host_budget:
                    by_host[host] = by_host.get(host, 0) + 1
                    admitted.append((url, depth))
                else:
                    deferred.append((url, depth))
        else:
            admitted, deferred = sorted(frontier), []

        # Two-phase wave: process all admitted URLs, then claim candidates
        # with wave-level min depth (matching the engine's groupby-min before
        # the seen-set claim; when no budget defers rows, all candidates in a
        # wave share one depth and this equals FIFO claim order).
        candidates: dict[str, int] = {}
        for url, depth in admitted:
            if robots is not None and cfg.respect_robots and not robots.is_allowed(url):
                out.skipped += 1
                continue
            if cfg.max_depth >= 0 and depth > cfg.max_depth:
                out.skipped += 1
                continue
            result = _fetch_and_extract(url, depth, corpus, cfg)
            out.results.append(result)
            out.max_depth_reached = max(out.max_depth_reached, depth)
            if result.error is None:
                for link in result.links:
                    if not _admit(link, bases, cfg):
                        continue
                    if link not in candidates or depth + 1 < candidates[link]:
                        candidates[link] = depth + 1
        next_frontier: list[tuple[str, int]] = list(deferred)
        for link in sorted(candidates):
            if link in out.visited:
                continue
            out.visited[link] = candidates[link]
            next_frontier.append((link, candidates[link]))
        frontier = next_frontier
    return out


def load_corpus_dict(pages_dir: str) -> dict[str, tuple[int, bytes]]:
    """url→(status, html) for test-scale corpora (oracle side only)."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(pages_dir, format="parquet").to_table(
        columns=["url", "status", "html"]
    )
    return {
        u: (s, h)
        for u, s, h in zip(
            tbl.column("url").to_pylist(),
            tbl.column("status").to_pylist(),
            tbl.column("html").to_pylist(),
        )
    }
