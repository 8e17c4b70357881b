"""robots.txt goldens ported from /root/reference/internal/robots/robots_test.go."""

from __future__ import annotations

import pytest

from urlmap_ray.robotstxt import (
    RobotsIndex,
    Rule,
    check_rules,
    matches_user_agent,
    parse_robots,
    path_matches,
)

# robots_test.go:28-49
@pytest.mark.parametrize(
    "pattern,expected",
    [("*", True), ("MyBot", True), ("mybot", True), ("OtherBot", False), ("Bot", True), ("", False)],
)
def test_matches_user_agent(pattern, expected):
    assert matches_user_agent(pattern, "MyBot/1.0 (http://example.com)") is expected


# robots_test.go:51-78
@pytest.mark.parametrize(
    "pattern,path,expected",
    [
        ("/admin", "/admin", True),
        ("/admin", "/admin/", True),
        ("/admin", "/admin/page", True),
        ("/admin/", "/admin/page", True),
        ("/admin/*", "/admin/page", True),
        ("/admin/*", "/admin/", True),
        ("/admin/*", "/other", False),
        ("", "/any", False),
        ("/", "/", True),
        ("/", "/any", True),
    ],
)
def test_path_matches(pattern, path, expected):
    assert path_matches(pattern, path) is expected


# robots_test.go:80-108
RULES = [
    Rule("TestBot", "Disallow", "/admin"),
    Rule("TestBot", "Allow", "/admin/public"),
    Rule("TestBot", "Disallow", "/private/*"),
]


@pytest.mark.parametrize(
    "path,expected",
    [
        ("/", True),
        ("/admin", False),
        ("/admin/public", True),
        ("/admin/secret", False),
        ("/private/data", False),
        ("/public", True),
    ],
)
def test_check_rules(path, expected):
    assert check_rules(RULES, path) is expected


def test_parse_robots_full():
    # robots_test.go:110-155 (TestFetchRobots content)
    content = """User-agent: *
Disallow: /admin/
Disallow: /private/
Allow: /admin/public/

User-agent: TestBot
Disallow: /special/
Crawl-delay: 2

Sitemap: https://example.com/sitemap.xml
"""
    data = parse_robots(content, "TestBot/1.0")
    assert len(data.rules) == 4  # 3 from '*', 1 from TestBot
    assert data.crawl_delay_s == 2.0
    assert data.sitemaps == ["https://example.com/sitemap.xml"]


def test_is_allowed_via_index():
    # robots_test.go:158-198
    content = """User-agent: TestBot
Disallow: /admin/
Allow: /admin/public/
Disallow: /private/*
"""
    idx = RobotsIndex("TestBot/1.0")
    idx.add("https://example.com", content)
    for url, expected in [
        ("https://example.com/", True),
        ("https://example.com/admin/", False),
        ("https://example.com/admin/public/", True),
        ("https://example.com/private/data", False),
        ("https://example.com/allowed", True),
    ]:
        assert idx.is_allowed(url) is expected, url


def test_fail_open_missing_robots():
    # robots_test.go:200-218: host absent from table → allow, no delay
    idx = RobotsIndex("TestBot/1.0")
    assert idx.is_allowed("https://nothing.example.com/any-path") is True
    assert idx.crawl_delay("https://nothing.example.com/x") == 0.0


def test_crawl_delay():
    # robots_test.go:220-245
    idx = RobotsIndex("TestBot/1.0")
    idx.add("https://example.com", "User-agent: TestBot\nCrawl-delay: 5\n")
    assert idx.crawl_delay("https://example.com/") == 5.0
    # Go time.ParseDuration("10ss") errors → delay ignored
    idx.add("https://bad.example.com", "User-agent: *\nCrawl-delay: 10s\n")
    assert idx.crawl_delay("https://bad.example.com/") == 0.0


def test_parsing_edge_cases():
    # robots_test.go:285-330: comments, empty disallow, lines without colon,
    # non-matching UA groups ignored.
    content = """# This is a comment
User-agent: TestBot
Disallow:

User-agent: *
Disallow: /admin

# Another comment
Invalid-line-without-colon

User-agent: OtherBot
Allow: /special
"""
    data = parse_robots(content, "TestBot/1.0")
    paths = [(r.directive, r.path) for r in data.rules]
    assert ("Disallow", "") in paths  # empty disallow recorded (matches nothing)
    assert ("Disallow", "/admin") in paths
    assert ("Allow", "/special") not in paths  # OtherBot group dropped
    # empty Disallow pattern matches no path → unrelated paths stay allowed
    assert check_rules(data.rules, "/anything") is True
    assert check_rules(data.rules, "/admin/x") is False


def test_invalid_url_denied_by_index():
    idx = RobotsIndex("TestBot/1.0")
    assert idx.is_allowed("not-a-valid-url") is False
