"""URL algebra — Python equivalents of the reference's URL helpers.

Semantics mirror /root/reference/internal/url/url.go byte-for-byte:

- ``is_valid_url``        ← IsValidURL        (url.go:17-39)
- ``extract_domain``      ← ExtractDomain     (url.go:42-63)
- ``resolve_url``         ← ResolveURL        (url.go:66-91)
- ``normalize_url``       ← NormalizeURL      (url.go:94-118)
- ``is_same_domain``      ← IsSameDomain      (url.go:121-133)
- ``is_same_path_prefix`` ← IsSamePathPrefix  (url.go:138-173)
- ``should_skip_url``     ← ShouldSkipURL     (url.go:176-201)
- ``validate_url``        ← pkg/utils/url.go ValidateURL (:10-30)

Errors are signalled by raising :class:`~urlmap_ray.gourl.URLError` (the Go
versions return ``error``); boolean predicates never raise unless the Go
version returns an error for that input.

Batch (vectorized) versions used by the Ray Data stages live at the bottom;
they call the scalar functions per element over numpy object arrays — URL
parsing is branch-heavy string work with no useful Arrow kernel, so the win
comes from doing it inside ``map_batches`` across blocks, not from SIMD.
"""

from __future__ import annotations

import numpy as np

from . import gourl
from .gourl import URLError, parse

__all__ = [
    "URLError",
    "is_valid_url",
    "extract_domain",
    "resolve_url",
    "normalize_url",
    "is_same_domain",
    "is_same_path_prefix",
    "should_skip_url",
    "validate_url",
    "normalize_url_batch",
    "host_of_batch",
]

_SKIP_PREFIXES = ("javascript:", "mailto:", "tel:", "ftp:", "file:", "data:", "#")


def is_valid_url(raw: str) -> bool:
    raw = raw.strip()
    if not raw:
        return False
    try:
        u = parse(raw)
    except URLError:
        return False
    if u.scheme not in ("http", "https"):
        return False
    return u.host != ""


def extract_domain(raw: str) -> str:
    raw = raw.strip()
    if not raw:
        raise URLError("URL cannot be empty")
    u = parse(raw)
    if u.host == "":
        raise URLError("invalid URL")
    hostname = u.hostname()
    if hostname == "":
        raise URLError("invalid URL")
    return hostname


def resolve_url(base_url: str, relative_url: str) -> str:
    base_url = base_url.strip()
    if not base_url:
        raise URLError("base URL cannot be empty")
    relative_url = relative_url.strip()
    if not relative_url:
        raise URLError("relative URL cannot be empty")
    base = parse(base_url)
    relative = parse(relative_url)
    return str(gourl.resolve_reference(base, relative))


def normalize_url(raw: str) -> str:
    """Canonical-URL key function: drop fragment, trim one trailing slash
    from non-root paths, empty path → "/" (url.go:94-118)."""
    raw = raw.strip()
    if not raw:
        raise URLError("URL cannot be empty")
    u = parse(raw)
    u.fragment = ""
    u.has_fragment = False
    if u.path != "/" and u.path.endswith("/"):
        u.path = u.path[:-1]
    if u.path == "":
        u.path = "/"
    return str(u)


def is_same_domain(url1: str, url2: str) -> bool:
    """Hostname equality, case-insensitive, ports/schemes ignored.
    Raises URLError if either URL has no extractable domain."""
    d1 = extract_domain(url1)
    d2 = extract_domain(url2)
    return d1.casefold() == d2.casefold()


def is_same_path_prefix(base_url: str, target_url: str) -> bool:
    """Same domain AND dir-normalized target path under base path
    (url.go:138-173; `/doc/` does not match `/docs/`)."""
    if not is_same_domain(base_url, target_url):
        return False
    base_path = parse(base_url).path
    target_path = parse(target_url).path
    if base_path != "/" and not base_path.endswith("/"):
        base_path += "/"
    if target_path != "/" and not target_path.endswith("/"):
        target_path += "/"
    return target_path.startswith(base_path)


def should_skip_url(raw: str) -> bool:
    raw = raw.strip()
    if not raw:
        return True
    lower = raw.lower()
    return lower.startswith(_SKIP_PREFIXES)


def validate_url(raw: str) -> str:
    """pkg/utils ValidateURL: prepend https:// if schemeless, require host."""
    if not raw:
        raise URLError("URL cannot be empty")
    if not raw.startswith(("http://", "https://")):
        raw = "https://" + raw
    u = parse(raw)
    if u.host == "":
        raise URLError("URL must have a valid host")
    return str(u)


# --------------------------------------------------------------------------
# Batch helpers for map_batches stages.


def normalize_url_batch(urls: np.ndarray) -> np.ndarray:
    """Vectorized normalize; invalid URLs map to None."""
    out = np.empty(len(urls), dtype=object)
    for i, raw in enumerate(urls):
        try:
            out[i] = normalize_url(raw)
        except URLError:
            out[i] = None
    return out


def host_of_batch(urls: np.ndarray) -> np.ndarray:
    """Vectorized extract_domain; invalid URLs map to empty string."""
    out = np.empty(len(urls), dtype=object)
    for i, raw in enumerate(urls):
        try:
            out[i] = extract_domain(raw)
        except URLError:
            out[i] = ""
    return out


# Tracking parameters stripped by the aggressive canonical key (beyond-
# reference frontier-dedup feature; the reference's normalize_url above
# keeps query strings verbatim, url.go:94-118).
TRACKING_PARAMS = frozenset({"fbclid", "gclid", "msclkid", "ref"})
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonical_url_key(raw: str) -> str:
    """Aggressive canonical key for frontier/output dedup — the pinned
    rule (each step mirrors what large crawlers do before URL-seen):

    1. lowercase scheme and host (gourl already lowercases scheme);
    2. drop the default port (:80 http / :443 https);
    3. drop the fragment;
    4. query: split on '&', drop empty params and tracking params
       (``utm_*`` prefix + :data:`TRACKING_PARAMS` names), sort the
       surviving ``k=v`` strings lexicographically, re-join;
    5. path: the reference's trailing-slash rule (normalize_url).

    Distinct from :func:`normalize_url` on purpose: that is reference
    parity (byte-compatible with url.go), this is the stronger dedup key
    a 10^10-URL frontier wants. Raises URLError on unparseable input.
    """
    raw = raw.strip()
    if not raw:
        raise URLError("URL cannot be empty")
    u = parse(raw)
    u.host = u.host.lower()
    suffix = _DEFAULT_PORTS.get(u.scheme)
    if suffix and u.host.endswith(suffix):
        u.host = u.host[: -len(suffix)]
    u.fragment = ""
    u.has_fragment = False
    if u.query:
        kept = []
        for param in u.query.split("&"):
            if not param:
                continue
            name = param.split("=", 1)[0].lower()
            if name.startswith("utm_") or name in TRACKING_PARAMS:
                continue
            kept.append(param)
        u.query = "&".join(sorted(kept))
    u.force_query = False
    if u.path != "/" and u.path.endswith("/"):
        u.path = u.path[:-1]
    if u.path == "":
        u.path = "/"
    return str(u)


def canonical_key_batch(batch, *, url_col: str = "url"):
    """Arrow batch wrapper: adds ``canonical`` (row-local; parse failures
    fall back to the raw string so a bad URL dedups against itself)."""
    import pyarrow as pa

    out = []
    for x in batch.column(url_col).to_pylist():
        try:
            out.append(canonical_url_key(x) if x else "")
        except URLError:
            out.append(x)
    return batch.append_column("canonical", pa.array(out, pa.string()))
