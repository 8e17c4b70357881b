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
