"""WARC source: read Common-Crawl-style WARC/1.0 archives into the
pages schema.

A webtext engine's real-world input is WARC, the ISO-28500 archive
format Common Crawl publishes (one gzip member per record in CC; plain
concatenated records also valid). This is a dependency-free parser for
the subset a text pipeline needs: ``response`` (and ``resource``)
records, yielding (url, status, content_type, payload) rows that drop
straight into the extract/textstats operators.

Scale shape: `ray.data.read_binary_files` distributes WHOLE files to
tasks — the Common Crawl granularity (archives are ~1GB, published in
many thousands of files, so file-level parallelism saturates any
cluster; a single giant WARC would need a record-offset index, which CC
also publishes). Parsing is a single forward pass per file driven by
Content-Length — no regex over the payload, no per-line splitting of
bodies. Decompression handles multi-member gzip (the CC layout) via
``gzip.decompress``.

Record grammar parsed here (WARC/1.0, ISO 28500):

    WARC/1.0\\r\\n
    <name>: <value>\\r\\n ...          # record headers
    \\r\\n
    <Content-Length bytes of block>   # for response records: an HTTP
    \\r\\n\\r\\n                          # response message
"""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa

__all__ = ["parse_warc_bytes", "read_warc", "read_wet", "write_warc", "write_wet"]

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers


def parse_warc_bytes(
    data: bytes,
    *,
    source: str = "",
    types: tuple[str, ...] = ("response", "resource"),
) -> pa.Table:
    """One forward pass over a (decompressed) WARC byte stream →
    (url, status, content_type, payload, warc_type) rows for records of
    the given ``types``. Tolerates trailing garbage and skips records of
    other types (warcinfo, request, metadata) by Content-Length.
    ``types=("conversion",)`` reads WET (extracted-text) archives."""
    urls: list[str] = []
    statuses: list[int] = []
    ctypes: list[str] = []
    payloads: list[bytes] = []
    wtypes: list[str] = []
    pos = 0
    n = len(data)
    while pos < n:
        # find the record header block (version line .. blank line)
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        block_start = hdr_end + 4
        block = data[block_start : block_start + length]
        pos = block_start + length
        wtype = headers.get("warc-type", "")
        if wtype not in types:
            continue
        url = headers.get("warc-target-uri", "")
        status = 200
        payload = block
        ctype = headers.get("content-type", "")
        if wtype == "response" and block.startswith(b"HTTP/"):
            # the block is an HTTP response message: status line, headers,
            # blank line, body
            http_end = block.find(_CRLF + _CRLF)
            if http_end >= 0:
                status_line = block[: block.find(_CRLF)]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                http_headers = _parse_headers(block[:http_end])
                ctype = http_headers.get("content-type", ctype)
                payload = block[http_end + 4 :]
        urls.append(url)
        statuses.append(status)
        ctypes.append(ctype)
        payloads.append(payload)
        wtypes.append(wtype)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "status": pa.array(statuses, pa.int32()),
            "content_type": pa.array(ctypes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "warc_type": pa.array(wtypes, pa.string()),
            "source_file": pa.array([source] * len(urls), pa.string()),
        }
    )


def read_warc(paths, *, decode_html: bool = True):
    """WARC file(s)/dir → streaming Dataset of page rows.

    With ``decode_html`` the payload is also surfaced as an ``html``
    string column (utf-8, errors replaced) for text/html records, so the
    result feeds ``extract_links_batch`` / textstats directly."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for path, raw in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            # detect by magic bytes only: ray.data.read_binary_files already
            # auto-decompresses by .gz extension, so trust the content
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)  # handles multi-member (CC layout)
            tables.append(parse_warc_bytes(raw, source=os.path.basename(path)))
        out = pa.concat_tables(tables) if tables else parse_warc_bytes(b"")
        if decode_html:
            is_html = [
                ct.split(";")[0].strip().lower() in ("text/html", "application/xhtml+xml", "")
                for ct in out.column("content_type").to_pylist()
            ]
            html = [
                p.decode("utf-8", errors="replace") if keep else ""
                for p, keep in zip(out.column("payload").to_pylist(), is_html)
            ]
            out = out.append_column("html", pa.array(html, pa.string()))
        return out

    return files.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def write_warc(path: str, records: list[dict], *, compress: bool | None = None) -> str:
    """Write WARC/1.0 response records (test fixture / corpus export).

    ``records``: dicts with url, html (str or utf-8 bytes — bytes pass
    through verbatim, preserving byte-identity), optional status (200) and
    date. Compresses each record as its own gzip member when the path
    ends in .gz (the Common Crawl layout) unless overridden."""
    if compress is None:
        compress = path.endswith(".gz")
    out = io.BytesIO()
    for i, rec in enumerate(records):
        body = rec["html"]
        if not isinstance(body, bytes):
            body = body.encode("utf-8")
        status = int(rec.get("status", 200))
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            f"WARC-Date: {rec.get('date', '2026-01-01T00:00:00Z')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1")
        record = hdr + http + _CRLF + _CRLF
        out.write(gzip.compress(record) if compress else record)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return path


def read_wet(paths):
    """Common Crawl WET (extracted-text) archive(s)/dir → streaming
    Dataset of (url, text, n_chars, source_file) rows — the
    documents-table shape, ready for the prep pipeline (lang-ID, quality
    gates, dedup) without an HTML-extraction stage. WET records are
    ``WARC-Type: conversion`` with a UTF-8 plain-text payload; file-level
    parallelism via ``read_binary_files``, same as :func:`read_warc`."""
    import ray.data

    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for path, raw in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            tables.append(
                parse_warc_bytes(
                    raw, source=os.path.basename(path), types=("conversion",)
                )
            )
        out = (
            pa.concat_tables(tables)
            if tables
            else parse_warc_bytes(b"", types=("conversion",))
        )
        text = [
            p.decode("utf-8", errors="replace")
            for p in out.column("payload").to_pylist()
        ]
        return pa.table(
            {
                "url": out.column("url"),
                "text": pa.array(text, pa.string()),
                "n_chars": pa.array([len(t) for t in text], pa.int64()),
                "source_file": out.column("source_file"),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def write_wet(path: str, records: list[dict], *, compress: bool | None = None) -> str:
    """Write WET conversion records (test fixture / corpus export).
    ``records``: dicts with url and text (str)."""
    if compress is None:
        compress = path.endswith(".gz")
    out = io.BytesIO()
    for i, rec in enumerate(records):
        body = rec["text"].encode("utf-8")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            f"WARC-Date: {rec.get('date', '2026-01-01T00:00:00Z')}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1")
        record = hdr + body + _CRLF + _CRLF
        out.write(gzip.compress(record) if compress else record)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return path
