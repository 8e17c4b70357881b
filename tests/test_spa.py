"""SPA-detection goldens ported from the reference's detector tests
(/root/reference/internal/detector/detector_test.go)."""

from __future__ import annotations

import pytest

from urlmap_ray.spa import (
    detect_dynamic_content,
    detect_framework,
    detect_low_link_count,
    detect_spa,
    detect_spa_structure,
)

# detector_test.go:9-94
DETECT_CASES = [
    ("React SPA", '<div id="root"><div data-reactroot>Hello React</div></div>', True),
    ("Vue SPA", '<div id="app"><div v-if="show">Hello Vue</div></div>', True),
    ("Angular SPA", '<div ng-app="myApp"><div ng-controller="myCtrl">Hello Angular</div></div>', True),
    ("Next.js SPA", '<div id="__next"><script>window.__NEXT_DATA__={}</script></div>', True),
    (
        "Static HTML",
        '<html><body><h1>Hello World</h1><a href="/about">About</a><a href="/contact">Contact</a></body></html>',
        False,
    ),
    ("Empty body SPA", '<html><body><div id="app"></div></body></html>', True),
    (
        "Low link count",
        '<html><body><h1>Welcome</h1><p>This is a static site</p><a href="/1">Link 1</a><a href="/2">Link 2</a></body></html>',
        False,
    ),
]


@pytest.mark.parametrize("name,html,expected", DETECT_CASES, ids=[c[0] for c in DETECT_CASES])
def test_detect_spa(name, html, expected):
    is_spa, confidence, indicators = detect_spa(html)
    assert is_spa is expected, (confidence, indicators)
    assert 0.0 <= confidence <= 1.0


# detector_test.go:96-146
@pytest.mark.parametrize(
    "html,expected",
    [
        ("<div data-reactroot>React App</div>", True),
        ('<div v-if="show">Vue App</div>', True),
        ('<div ng-app="app">Angular App</div>', True),
        ("<script>window.__NEXT_DATA__={}</script>", True),
        ("<div>Plain HTML</div>", False),
    ],
)
def test_detect_framework(html, expected):
    assert detect_framework(html) is expected


# detector_test.go:148-198
@pytest.mark.parametrize(
    "html,expected",
    [
        ('<div id="root"></div>', True),
        ('<div id="app"></div>', True),
        ('<div id="__next"></div>', True),
        ("<html><body></body></html>", True),
        ("<html><body><h1>Title</h1><p>Content</p></body></html>", False),
    ],
)
def test_detect_spa_structure(html, expected):
    assert detect_spa_structure(html) is expected


# detector_test.go:200-238
def test_detect_low_link_count():
    assert detect_low_link_count('<a href="/1">1</a><a href="/2">2</a>') is True
    many = "".join(f'<a href="/{i}">L</a>' for i in range(11))
    assert detect_low_link_count(many) is False
    assert detect_low_link_count("<div>No links here</div>") is True


# detector_test.go:240+
def test_detect_dynamic_content():
    assert detect_dynamic_content("<script>window.addEventListener('load', function() {})</script>") is True
    assert detect_dynamic_content("<script>fetch('/api/data')</script>") is True
    assert detect_dynamic_content("<div>static text only</div>") is False


# --- per-domain detection memo (cache.go:9-64, spa_detector.go:39-43) -----


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_detection_cache_ttl():
    from urlmap_ray.spa import DetectionCache

    clock = FakeClock()
    c = DetectionCache(ttl_seconds=3600.0, clock=clock)
    assert c.get("a.example.org") is None
    c.set("a.example.org", (True, 0.7, ["framework_detected"]))
    assert c.get("a.example.org") == (True, 0.7, ["framework_detected"])
    assert c.size() == 1
    clock.t = 3601.0  # past TTL → evicted on read (cache.go:33-37)
    assert c.get("a.example.org") is None
    assert c.size() == 0
    c.set("b.example.org", (False, 0.0, []))
    c.clear()
    assert c.size() == 0


def test_domain_spa_detector_memoizes_and_expires():
    import pyarrow as pa

    from urlmap_ray.spa import DomainSpaDetector

    spa_html = b'<html><body><div id="root" data-reactroot></div></body></html>'
    plain_html = (
        b"<html><body><h1>Hi</h1><p>text</p>"
        + b"".join(f'<a href="/{i}">l</a>'.encode() for i in range(12))
        + b"</body></html>"
    )

    clock = FakeClock()
    det = DomainSpaDetector(ttl_seconds=3600.0, clock=clock)
    batch = pa.table(
        {
            "url": pa.array(
                [
                    "https://spa.example.org/",
                    "https://spa.example.org/about",  # same domain → memo hit
                    "https://plain.example.org/",
                ]
            ),
            # the /about page is PLAIN html: the memoized domain verdict
            # must win (first page decides, spa_detector.go:39-43)
            "html": pa.array([spa_html, plain_html, plain_html], pa.binary()),
        }
    )
    out = det(batch)
    assert out.column("is_spa").to_pylist() == [True, True, False]
    assert out.column("spa_cached").to_pylist() == [False, True, False]
    assert (det.hits, det.misses) == (1, 2)
    assert "html" not in out.column_names

    # second batch within TTL: all cached
    out2 = det(batch.select(["url", "html"]).slice(0, 2))
    assert out2.column("spa_cached").to_pylist() == [True, True]

    # past TTL: re-detects, and the /about page now gets its own (plain)
    # verdict because it is the first page of the domain in the new window
    clock.t = 3601.0
    out3 = det(batch.slice(1, 1))
    assert out3.column("spa_cached").to_pylist() == [False]
    assert out3.column("is_spa").to_pylist() == [False]
