"""Property-based checks on the URL algebra (hypothesis; no Ray).

The goldens pin exact reference parity; these pin the algebraic properties
the engine depends on: canonicalization idempotence (dedup keys stable),
hash stability across processes, and total robustness (no crashes on
arbitrary input — invalid URLs must raise URLError, never anything else).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from urlmap_ray.state.seen import url_hash
from urlmap_ray.urlnorm import (
    URLError,
    extract_domain,
    is_valid_url,
    normalize_url,
    resolve_url,
    should_skip_url,
)

_host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
_query = st.one_of(st.just(""), st.from_regex(r"\?[a-z]{1,5}=[a-z0-9]{0,6}", fullmatch=True))
_frag = st.one_of(st.just(""), st.from_regex(r"#[a-z0-9]{0,6}", fullmatch=True))


@st.composite
def http_urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    return f"{scheme}://{draw(_host)}{draw(_path)}{draw(_query)}{draw(_frag)}"


@settings(max_examples=300, deadline=None)
@given(http_urls())
def test_normalize_converges(url):
    """Iterated normalization reaches a fixpoint. NOT single-step
    idempotent by design: the reference strips exactly ONE trailing slash
    per call (strings.TrimSuffix, url.go:108-110), so "/a///" needs several
    applications — we replicate that byte-for-byte. In the crawler each URL
    is normalized exactly once per appearance, consistently."""
    cur = normalize_url(url)
    for _ in range(len(url)):
        nxt = normalize_url(cur)
        if nxt == cur:
            break
        cur = nxt
    assert normalize_url(cur) == cur
    assert is_valid_url(cur)


@settings(max_examples=300, deadline=None)
@given(http_urls())
def test_normalized_url_has_domain(url):
    assert extract_domain(normalize_url(url)) != ""


@settings(max_examples=200, deadline=None)
@given(http_urls(), _path)
def test_resolve_stays_on_host(base, rel):
    if not rel or rel.startswith("//"):
        return  # "//x" is a protocol-relative reference (different host)
    out = resolve_url(base, rel)
    assert extract_domain(out) == extract_domain(base)


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=64))
def test_total_robustness(raw):
    """Arbitrary strings: predicates return bools, transforms either return
    a string or raise URLError — nothing else escapes."""
    assert should_skip_url(raw) in (True, False)
    assert is_valid_url(raw) in (True, False)
    try:
        normalize_url(raw)
    except URLError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.lists(http_urls(), min_size=1, max_size=20))
def test_url_hash_stable_and_spread(urls):
    h1 = url_hash(urls)
    h2 = url_hash(list(urls))
    assert np.array_equal(h1, h2)
    assert h1.dtype == np.uint64
