"""robots.txt parsing and rule matching (operator family F9-F12 / A2).

Mirrors /root/reference/internal/robots/robots.go bug-for-bug:

- line parse of User-agent / Allow / Disallow / Crawl-delay / Sitemap groups,
  keeping only groups whose user-agent pattern matches ours (robots.go:106-186);
- UA matching: lowercase; ``*`` matches; else substring containment
  (robots.go:189-205);
- rule evaluation: allow by default; longest matching path wins; on equal
  length the FIRST such rule wins (strict ``>`` comparison, robots.go:208-225);
- path matching: empty pattern never matches; ``pat*`` → prefix of stripped
  pattern; otherwise plain prefix (robots.go:228-252);
- Crawl-delay parsed as Go ``time.ParseDuration(value+"s")`` → plain numeric
  seconds only (``"10"`` ok, ``"10s"`` becomes invalid and is ignored);
- fail-open: a host with no robots.txt is fully allowed with no delay
  (robots.go:69-72).

In the corpus-backed engine there is no live fetch: robots.txt bodies live in
a ``robots`` Parquet table keyed by ``scheme://host``; a politeness actor
parses each body once (RobotsIndex) and answers per-batch admission masks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .gourl import URLError, parse as parse_url

_NUMERIC_DURATION = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")


@dataclass
class Rule:
    user_agent: str
    directive: str  # "Allow" or "Disallow"
    path: str


@dataclass
class RobotsData:
    rules: list[Rule] = field(default_factory=list)
    crawl_delay_s: float = 0.0
    sitemaps: list[str] = field(default_factory=list)


def matches_user_agent(pattern: str, user_agent: str) -> bool:
    pattern = pattern.lower()
    if pattern == "":
        return False
    if pattern == "*":
        return True
    return pattern in user_agent.lower()


def parse_robots(content: str, user_agent: str) -> RobotsData:
    """Parse a robots.txt body, keeping only rules for our user agent."""
    data = RobotsData()
    current_ua = ""
    for raw_line in content.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(":", 1)
        if len(parts) != 2:
            continue
        directive = parts[0].strip().lower()
        value = parts[1].strip()
        if directive == "user-agent":
            current_ua = value
        elif directive in ("disallow", "allow"):
            if current_ua and matches_user_agent(current_ua, user_agent):
                data.rules.append(Rule(current_ua, directive.title(), value))
        elif directive == "crawl-delay":
            if current_ua and matches_user_agent(current_ua, user_agent):
                if _NUMERIC_DURATION.match(value):
                    data.crawl_delay_s = float(value)
        elif directive == "sitemap":
            data.sitemaps.append(value)
    return data


def path_matches(pattern: str, url_path: str) -> bool:
    if pattern == "":
        return False
    if pattern == url_path:
        return True
    if pattern.endswith("*"):
        return url_path.startswith(pattern[:-1])
    return url_path.startswith(pattern)


def check_rules(rules: list[Rule], url_path: str) -> bool:
    """Default allow; longest matching path wins; first wins on ties."""
    allowed = True
    best_len = 0
    for rule in rules:
        if path_matches(rule.path, url_path):
            if len(rule.path) > best_len:
                best_len = len(rule.path)
                allowed = rule.directive == "Allow"
    return allowed


class RobotsIndex:
    """Parsed robots.txt rules for a set of hosts (politeness-actor state).

    Built once per actor from the corpus ``robots`` table slice for its host
    shard; answers allow/deny + crawl delay per URL. Hosts absent from the
    table fail open (allowed, zero delay), matching the reference.
    """

    def __init__(self, user_agent: str):
        self.user_agent = user_agent
        self._by_origin: dict[str, RobotsData] = {}

    def add(self, origin: str, content: str) -> None:
        """origin is ``scheme://host`` (the reference's cache key)."""
        self._by_origin[origin] = parse_robots(content, self.user_agent)

    def is_allowed(self, target_url: str) -> bool:
        try:
            u = parse_url(target_url)
        except URLError:
            return False
        if not u.scheme or not u.host:
            return False
        data = self._by_origin.get(f"{u.scheme}://{u.host}")
        if data is None:
            return True  # fail-open
        return check_rules(data.rules, u.path)

    def crawl_delay(self, target_url: str) -> float:
        try:
            u = parse_url(target_url)
        except URLError:
            return 0.0
        data = self._by_origin.get(f"{u.scheme}://{u.host}")
        return data.crawl_delay_s if data else 0.0
