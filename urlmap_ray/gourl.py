"""Go ``net/url``-compatible URL parsing/serialization (pure Python).

The reference engine (aoshimash/urlmap) does all URL algebra through Go's
``net/url`` package (see /root/reference/internal/url/url.go). Its parse /
resolve / re-serialize behavior differs from :mod:`urllib.parse` in ways that
change which links a crawl admits (error behavior for ``"://x"``, re-encoding
of paths, ``ForceQuery`` handling, dot-segment resolution). This module
re-implements the subset of ``net/url`` semantics the crawler depends on so
that canonical URLs are byte-identical to the reference's.

Behavior is pinned by the reference's table-driven unit tests
(internal/url/url_test.go), ported into tests/test_urlnorm.py.
"""

from __future__ import annotations

from dataclasses import dataclass


class URLError(ValueError):
    """Raised where Go's url.Parse would return an error."""


_ALPHA = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_DIGIT = set("0123456789")
_SCHEME_EXTRA = set("+-.")
_HEX = set("0123456789abcdefABCDEF")

# Characters Go leaves unescaped when re-serializing a path
# (unreserved + sub-delims + ":@/"; '?' and '#' get escaped).
_PATH_SAFE = _ALPHA | _DIGIT | set("-._~!$&'()*+,;=:@/")
# Characters allowed raw in a fragment (path set plus '?').
_FRAG_SAFE = _PATH_SAFE | set("?")


def _valid_escapes(s: str) -> bool:
    i, n = 0, len(s)
    while i < n:
        if s[i] == "%":
            if i + 2 >= n or s[i + 1] not in _HEX or s[i + 2] not in _HEX:
                return False
            i += 3
        else:
            i += 1
    return True


def _escape(s: str, safe: set) -> str:
    """Re-escape raw chars outside `safe`, preserving valid %XX sequences.

    Matches Go's behavior of keeping RawPath verbatim when it is a valid
    encoding, while escaping raw spaces etc. like EscapedPath() would.
    """
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
            out.append(s[i : i + 3])
            i += 3
            continue
        if c in safe:
            out.append(c)
        else:
            out.append("".join(f"%{b:02X}" for b in c.encode("utf-8")))
        i += 1
    return "".join(out)


@dataclass
class URL:
    """Mirror of the Go ``url.URL`` fields the crawler uses.

    ``path``/``query``/``fragment`` are stored in *raw* (still-escaped) form;
    serialization re-escapes only characters that must be escaped.
    """

    scheme: str = ""
    opaque: str = ""
    host: str = ""  # host or host:port, case preserved (Go does not lowercase)
    path: str = ""
    query: str = ""  # without '?'
    fragment: str = ""  # without '#'
    force_query: bool = False  # trailing '?' with empty query
    has_fragment: bool = False

    def hostname(self) -> str:
        """Host without port (Go ``URL.Hostname()``). IPv6 brackets stripped."""
        h = self.host
        if h.startswith("["):
            end = h.find("]")
            return h[1:end] if end >= 0 else h
        colon = h.rfind(":")
        if colon >= 0 and (h[colon + 1 :] == "" or h[colon + 1 :].isdigit()):
            return h[:colon]
        return h

    def __str__(self) -> str:  # Go URL.String()
        buf = []
        if self.scheme:
            buf.append(self.scheme)
            buf.append(":")
        if self.opaque:
            buf.append(self.opaque)
        else:
            if self.scheme or self.host:
                if self.host or self.path:
                    buf.append("//")
                buf.append(self.host)
            path = _escape(self.path, _PATH_SAFE)
            if path and not path.startswith("/") and self.host:
                buf.append("/")
            buf.append(path)
        if self.force_query or self.query:
            buf.append("?")
            buf.append(self.query)
        if self.has_fragment and self.fragment != "":
            buf.append("#")
            buf.append(_escape(self.fragment, _FRAG_SAFE))
        return "".join(buf)


def _get_scheme(raw: str) -> tuple[str, str]:
    """Go getScheme: returns (scheme, rest); raises on ':' before any scheme."""
    for i, c in enumerate(raw):
        if c in _ALPHA:
            continue
        if c in _DIGIT or c in _SCHEME_EXTRA:
            if i == 0:
                return "", raw
            continue
        if c == ":":
            if i == 0:
                raise URLError("missing protocol scheme")
            return raw[:i].lower(), raw[i + 1 :]
        return "", raw  # invalid scheme character → whole string is a path
    return "", raw


def parse(raw: str) -> URL:
    """Parse like Go ``url.Parse`` (subset).

    Raises :class:`URLError` where Go returns an error: control characters,
    leading ':', invalid percent-escapes in path/fragment, non-numeric port.
    """
    for c in raw:
        o = ord(c)
        if o < 0x20 or o == 0x7F:
            raise URLError("invalid control character in URL")

    u = URL()
    rest = raw
    frag = raw.find("#")
    if frag >= 0:
        rest, u.fragment = raw[:frag], raw[frag + 1 :]
        u.has_fragment = True
        if not _valid_escapes(u.fragment):
            raise URLError("invalid URL escape in fragment")

    u.scheme, rest = _get_scheme(rest)

    if rest.endswith("?") and "?" not in rest[:-1]:
        u.force_query = True
        rest = rest[:-1]
    else:
        q = rest.find("?")
        if q >= 0:
            rest, u.query = rest[:q], rest[q + 1 :]

    if not rest.startswith("/") and u.scheme:
        # Opaque (e.g. mailto:user@host) — no further parsing.
        u.opaque = rest
        return u

    if rest.startswith("//"):
        authority = rest[2:]
        slash = len(authority)
        for i, c in enumerate(authority):
            if c in "/?#":
                slash = i
                break
        host, rest = authority[:slash], authority[slash:]
        # Validate port (Go: must be numeric)
        hp = host
        if hp.startswith("["):
            end = hp.find("]")
            if end < 0:
                raise URLError("missing ']' in host")
            hp = hp[end + 1 :]
        colon = hp.rfind(":")
        if colon >= 0:
            port = hp[colon + 1 :]
            if port and not port.isdigit():
                raise URLError(f"invalid port {port!r} after host")
        u.host = host
    if not _valid_escapes(rest):
        raise URLError("invalid URL escape in path")
    u.path = rest
    return u


def _resolve_path(base: str, ref: str) -> str:
    """Go ``resolvePath``: RFC 3986 merge + remove_dot_segments."""
    if ref == "":
        full = base
    elif ref.startswith("/"):
        full = ref
    else:
        i = base.rfind("/")
        full = base[: i + 1] + ref
    if full == "":
        return ""

    elems = full.split("/")
    dst = []
    for elem in elems:
        if elem == ".":
            continue
        if elem == "..":
            if dst:
                dst.pop()
        else:
            dst.append(elem)
    if elems[-1] in (".", ".."):
        dst.append("")
    return "/" + "/".join(dst).lstrip("/")


def resolve_reference(base: URL, ref: URL) -> URL:
    """Go ``URL.ResolveReference`` (subset: no userinfo)."""
    out = URL(
        scheme=ref.scheme or base.scheme,
        opaque=ref.opaque,
        host=ref.host,
        path=ref.path,
        query=ref.query,
        fragment=ref.fragment,
        force_query=ref.force_query,
        has_fragment=ref.has_fragment,
    )
    if ref.scheme or ref.host:
        # absoluteURI / net_path: clean dot segments of ref's own path.
        out.path = _resolve_path(ref.path, "")
        return out
    if ref.opaque:
        out.host = ""
        out.path = ""
        return out
    if ref.path == "" and not ref.force_query and ref.query == "":
        out.query = base.query
        out.force_query = base.force_query
        if not ref.has_fragment:
            out.fragment = base.fragment
            out.has_fragment = base.has_fragment
    out.host = base.host
    out.path = _resolve_path(base.path, ref.path)
    return out
