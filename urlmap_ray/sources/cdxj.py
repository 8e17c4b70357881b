"""CDXJ source: read Common-Crawl-style capture-index files into a table.

Common Crawl publishes its per-crawl URL index in the CDXJ format (one
line per capture: ``<SURT urlkey> <14-digit timestamp> <JSON blob>``, the
blob carrying url/status/mime/digest and the WARC record's
filename/offset/length). A crawl engine at 10^10-URL scale plans
selective fetches from exactly this index — read the CDXJ, filter by
prefix/status/mime, and you have the frontier or fetch plan without
touching a single WARC byte. This is a dependency-free (stdlib json)
reader/writer pair:

- ``parse_cdxj_bytes``: one file's bytes → Arrow rows; malformed lines are
  skipped (crawl inputs are untrusted), gzip handled by magic bytes.
- ``read_cdxj``: ``read_binary_files`` distributes whole files to tasks —
  Common Crawl ships the index as ~300 gzipped shards per crawl, so
  file-level parallelism is the natural granularity (same shape as the
  WARC/sitemap sources).
- ``cdxj_seeds``: index rows → validated/normalized seed URLs through the
  crawler's own URL algebra (the same funnel as seed lists and sitemaps).
- ``surt_key`` / ``write_cdxj``: minimal SURT transform + writer, used as
  the test fixture (like the WARC writer).
"""

from __future__ import annotations

import gzip
import json
import zlib

import pyarrow as pa

__all__ = [
    "parse_cdxj_bytes",
    "read_cdxj",
    "cdxj_seeds",
    "surt_key",
    "write_cdxj",
]

_FIELDS = ("urlkey", "ts", "url", "status", "mime", "digest", "length", "offset", "filename")


def surt_key(url: str) -> str:
    """Minimal SURT (Sort-friendly URI Reordering Transform) urlkey:
    lowercase, host labels reversed and comma-joined, ``)`` separator,
    path+query appended — e.g. ``https://sub.example.org/a?b=1`` →
    ``org,example,sub)/a?b=1``. Scheme, standard ports, fragments and a
    leading ``www.`` are dropped (the common pywb convention subset)."""
    from ..gourl import parse

    u = parse(url.strip())
    host = (u.hostname() or "").lower()
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split("."))) + ")"
    path = u.path or "/"
    key += path.lower()
    if u.query:
        key += "?" + u.query.lower()
    return key


def parse_cdxj_bytes(data: bytes, *, source: str = "") -> pa.Table:
    """One CDXJ file's bytes → (urlkey, ts, url, status, mime, digest,
    length, offset, filename, source) rows. Lines that do not parse
    (wrong field count, bad JSON) are skipped, not fatal."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            return _empty(source)
    cols: dict[str, list] = {f: [] for f in _FIELDS}
    for raw in data.split(b"\n"):
        line = raw.strip()
        if not line:
            continue
        parts = line.split(b" ", 2)
        if len(parts) != 3:
            continue
        try:
            blob = json.loads(parts[2])
            if not isinstance(blob, dict):
                continue
        except (UnicodeDecodeError, json.JSONDecodeError):
            continue
        url = blob.get("url")
        if not url:
            continue
        cols["urlkey"].append(parts[0].decode("utf-8", errors="replace"))
        cols["ts"].append(parts[1].decode("ascii", errors="replace"))
        cols["url"].append(str(url))
        status = blob.get("status")
        try:
            cols["status"].append(int(status) if status is not None else None)
        except (TypeError, ValueError):
            cols["status"].append(None)
        cols["mime"].append(blob.get("mime"))
        cols["digest"].append(blob.get("digest"))
        for k in ("length", "offset"):
            v = blob.get(k)
            try:
                cols[k].append(int(v) if v is not None else None)
            except (TypeError, ValueError):
                cols[k].append(None)
        cols["filename"].append(blob.get("filename"))
    n = len(cols["url"])
    return pa.table(
        {
            "urlkey": pa.array(cols["urlkey"], pa.string()),
            "ts": pa.array(cols["ts"], pa.string()),
            "url": pa.array(cols["url"], pa.string()),
            "status": pa.array(cols["status"], pa.int32()),
            "mime": pa.array(cols["mime"], pa.string()),
            "digest": pa.array(cols["digest"], pa.string()),
            "length": pa.array(cols["length"], pa.int64()),
            "offset": pa.array(cols["offset"], pa.int64()),
            "filename": pa.array(cols["filename"], pa.string()),
            "source": pa.array([source] * n, pa.string()),
        }
    )


def _empty(source: str) -> pa.Table:
    return parse_cdxj_bytes(b"", source=source)


def read_cdxj(paths: str | list[str]):
    """Distributed CDXJ read: one task per file (Common Crawl index shards
    are the unit of parallelism), streaming into the usual Dataset flow."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        out = [
            parse_cdxj_bytes(data.as_py(), source=path.as_py())
            for path, data in zip(batch.column("path"), batch.column("bytes"))
        ]
        return pa.concat_tables(out) if out else _empty("")

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def cdxj_seeds(paths: str | list[str], *, statuses: tuple[int, ...] = (200,)):
    """Index rows → validated, normalized, deduplicated seed URLs (the
    crawler's own URL algebra — same funnel as seed lists / sitemaps).
    ``statuses`` selects which captures are fetchable plan entries."""
    import pyarrow.compute as pc

    from ..urlnorm import is_valid_url, normalize_url

    def to_seeds(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("status"), value_set=pa.array(statuses, pa.int32()))
        urls = t.filter(keep).column("url").to_pylist()
        out = []
        for u in urls:
            if u and is_valid_url(u):
                try:
                    out.append(normalize_url(u))
                except Exception:
                    continue
        return pa.table({"url": pa.array(out, pa.string())})

    ds = read_cdxj(paths).map_batches(
        to_seeds, batch_format="pyarrow", zero_copy_batch=True
    )
    # exact dedup on the canonical key — the seed list contract
    return ds.groupby("url").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def write_cdxj(
    rows: list[dict],
    path: str,
    *,
    compress: bool | None = None,
) -> str:
    """Write capture dicts (url required; ts/status/mime/digest/length/
    offset/filename optional) as a CDXJ file, sorted by (urlkey, ts) as the
    real index is. Fixture-grade writer, mirrors the WARC writer's role."""
    lines = []
    for r in rows:
        url = r["url"]
        key = surt_key(url)
        ts = str(r.get("ts", "20240101000000"))
        blob = {"url": url}
        for k in ("status", "mime", "digest", "length", "offset", "filename"):
            if r.get(k) is not None:
                blob[k] = r[k] if k not in ("status",) else str(r[k])
        lines.append((key, ts, json.dumps(blob, sort_keys=True)))
    lines.sort()
    data = "".join(f"{k} {t} {b}\n" for k, t, b in lines).encode("utf-8")
    if compress is None:
        compress = path.endswith(".gz")
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return path
