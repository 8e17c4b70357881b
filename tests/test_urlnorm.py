"""URL algebra goldens, ported verbatim from the reference's table-driven
tests (/root/reference/internal/url/url_test.go). These pin byte-identical
canonical URLs — the shuffle/dedup key of the whole engine."""

from __future__ import annotations

import pytest

from urlmap_ray.urlnorm import (
    URLError,
    extract_domain,
    is_same_domain,
    is_same_path_prefix,
    is_valid_url,
    normalize_url,
    resolve_url,
    should_skip_url,
    validate_url,
)

# url_test.go:7-43
IS_VALID_CASES = [
    ("http://example.com", True),
    ("https://example.com", True),
    ("https://example.com/path", True),
    ("https://example.com?query=value", True),
    ("https://example.com#fragment", True),
    ("https://example.com:8080", True),
    ("https://sub.example.com", True),
    ("", False),
    ("   ", False),
    ("example.com", False),
    ("ftp://example.com", False),
    ("file:///path", False),
    ("javascript:alert('test')", False),
    ("mailto:test@example.com", False),
    ("http://", False),
    ("http:///invalid", False),
]


@pytest.mark.parametrize("raw,expected", IS_VALID_CASES)
def test_is_valid_url(raw, expected):
    assert is_valid_url(raw) is expected


# url_test.go:45-87
EXTRACT_DOMAIN_CASES = [
    ("http://example.com", "example.com", False),
    ("https://example.com", "example.com", False),
    ("https://example.com/path", "example.com", False),
    ("https://example.com:8080", "example.com", False),
    ("https://sub.example.com", "sub.example.com", False),
    ("https://example.com?query=value", "example.com", False),
    ("https://example.com#fragment", "example.com", False),
    ("", "", True),
    ("   ", "", True),
    ("http://", "", True),
    ("http:///path", "", True),
    ("://invalid", "", True),
]


@pytest.mark.parametrize("raw,expected,should_error", EXTRACT_DOMAIN_CASES)
def test_extract_domain(raw, expected, should_error):
    if should_error:
        with pytest.raises(URLError):
            extract_domain(raw)
    else:
        assert extract_domain(raw) == expected


# url_test.go:89-132
RESOLVE_CASES = [
    ("https://example.com", "/path", "https://example.com/path", False),
    ("https://example.com/dir/", "file.html", "https://example.com/dir/file.html", False),
    ("https://example.com/dir/subdir/", "../file.html", "https://example.com/dir/file.html", False),
    ("https://example.com/dir/", "./file.html", "https://example.com/dir/file.html", False),
    ("https://example.com", "?query=value", "https://example.com?query=value", False),
    ("https://example.com", "#fragment", "https://example.com#fragment", False),
    ("https://example.com", "https://other.com/path", "https://other.com/path", False),
    ("", "/path", "", True),
    ("https://example.com", "", "", True),
    ("   ", "/path", "", True),
    ("https://example.com", "   ", "", True),
    ("://invalid", "/path", "", True),
]


@pytest.mark.parametrize("base,rel,expected,should_error", RESOLVE_CASES)
def test_resolve_url(base, rel, expected, should_error):
    if should_error:
        with pytest.raises(URLError):
            resolve_url(base, rel)
    else:
        assert resolve_url(base, rel) == expected


# url_test.go:134-174
NORMALIZE_CASES = [
    ("https://example.com", "https://example.com/", False),
    ("https://example.com/", "https://example.com/", False),
    ("https://example.com/path/", "https://example.com/path", False),
    ("https://example.com/path#fragment", "https://example.com/path", False),
    ("https://example.com/path?query=value#fragment", "https://example.com/path?query=value", False),
    ("", "", True),
    ("   ", "", True),
    ("://invalid", "", True),
]


@pytest.mark.parametrize("raw,expected,should_error", NORMALIZE_CASES)
def test_normalize_url(raw, expected, should_error):
    if should_error:
        with pytest.raises(URLError):
            normalize_url(raw)
    else:
        assert normalize_url(raw) == expected


# url_test.go:176-216
SAME_DOMAIN_CASES = [
    ("https://example.com", "https://example.com/path", True, False),
    ("http://example.com", "https://example.com", True, False),
    ("https://example.com:8080", "https://example.com:9090", True, False),
    ("https://example.com", "https://other.com", False, False),
    ("https://sub.example.com", "https://example.com", False, False),
    ("https://Example.COM", "https://example.com", True, False),
    ("invalid", "https://example.com", False, True),
    ("https://example.com", "invalid", False, True),
    ("invalid1", "invalid2", False, True),
]


@pytest.mark.parametrize("u1,u2,expected,should_error", SAME_DOMAIN_CASES)
def test_is_same_domain(u1, u2, expected, should_error):
    if should_error:
        with pytest.raises(URLError):
            is_same_domain(u1, u2)
    else:
        assert is_same_domain(u1, u2) is expected


# url_test.go:218-270
SAME_PREFIX_CASES = [
    ("https://example.com/docs/", "https://example.com/docs/", True, False),
    ("https://example.com/docs/", "https://example.com/docs/api/", True, False),
    ("https://example.com/docs/", "https://example.com/docs/api/v1/guide.html", True, False),
    ("https://example.com/docs", "https://example.com/docs/api/", True, False),
    ("https://example.com/docs/", "https://example.com/docs/api", True, False),
    ("https://example.com/docs", "https://example.com/docs/api", True, False),
    ("https://example.com/", "https://example.com/docs/", True, False),
    ("https://example.com/", "https://example.com/", True, False),
    ("https://example.com/docs/", "https://example.com/api/", False, False),
    ("https://example.com/docs/api/", "https://example.com/docs/", False, False),
    ("https://example.com/docs/", "https://example.com/documentation/", False, False),
    ("https://example.com/doc/", "https://example.com/docs/", False, False),
    ("https://example.com/docs/", "https://other.com/docs/", False, False),
    ("https://api.example.com/docs/", "https://example.com/docs/", False, False),
    ("invalid", "https://example.com/docs/", False, True),
    ("https://example.com/docs/", "invalid", False, True),
    ("invalid1", "invalid2", False, True),
]


@pytest.mark.parametrize("base,target,expected,should_error", SAME_PREFIX_CASES)
def test_is_same_path_prefix(base, target, expected, should_error):
    if should_error:
        with pytest.raises(URLError):
            is_same_path_prefix(base, target)
    else:
        assert is_same_path_prefix(base, target) is expected


# url_test.go:272-306
SKIP_CASES = [
    ("", True),
    ("   ", True),
    ("javascript:alert('test')", True),
    ("mailto:test@example.com", True),
    ("tel:+1234567890", True),
    ("ftp://example.com", True),
    ("file:///path", True),
    ("data:text/plain;base64,SGVsbG8=", True),
    ("#fragment", True),
    ("JAVASCRIPT:alert('test')", True),
    ("http://example.com", False),
    ("https://example.com", False),
    ("/path", False),
    ("./path", False),
    ("?query=value", False),
]


@pytest.mark.parametrize("raw,expected", SKIP_CASES)
def test_should_skip_url(raw, expected):
    assert should_skip_url(raw) is expected


def test_validate_url():
    # pkg/utils/url.go ValidateURL semantics
    assert validate_url("example.com") == "https://example.com"
    assert validate_url("http://example.com/a") == "http://example.com/a"
    with pytest.raises(URLError):
        validate_url("")


def test_canonical_url_key_rules():
    import pytest

    from urlmap_ray.urlnorm import URLError, canonical_url_key as c

    # case + default port + fragment + tracking + param sort, in one
    assert (
        c("HTTPS://Example.ORG:443/a/?b=2&a=1&utm_source=x#frag")
        == "https://example.org/a?a=1&b=2"
    )
    assert c("http://h.io:80/") == "http://h.io/"
    # non-default ports survive
    assert c("http://h.io:8080/p?fbclid=abc") == "http://h.io:8080/p"
    assert c("https://h.io/p?z=9&utm_campaign=x&gclid=1") == "https://h.io/p?z=9"
    # bare '?' drops; empty path → '/'; trailing slash trims
    assert c("https://h.io/p?") == "https://h.io/p"
    assert c("https://h.io") == "https://h.io/"
    assert c("https://h.io/a/b/") == "https://h.io/a/b"
    # sort is lexicographic over the full k=v string (case-sensitive)
    assert c("https://h.io/p?b=2&B=1") == "https://h.io/p?B=1&b=2"
    # reference normalize_url is unchanged by this feature: keeps query
    from urlmap_ray.urlnorm import normalize_url

    assert normalize_url("https://h.io/p?b=2&a=1") == "https://h.io/p?b=2&a=1"
    with pytest.raises(URLError):
        c("")
