"""Output sinks (S4-S8) — CLI-parity renderings of the visited URL set.

Mirrors /root/reference/internal/output/output.go: dedup (first occurrence)
→ sort lexicographically → render as text / JSON / CSV / XML / file. The
scale path is ``write_visited_parquet`` (partitioned Parquet straight from
the Dataset); the text renderings are driver-side and meant for CLI-sized
results, exactly like the reference which holds the full URL list in memory.

JSON structure matches CrawlOutput (output.go:36-40): urls[{url,timestamp}],
timestamp, total. CSV: header ``url,timestamp``, RFC3339 timestamps
(output.go:158-180). XML: indented CrawlOutput with standard header
(output.go:183-211).
"""

from __future__ import annotations

import csv
import io
import json
from datetime import datetime, timezone
from xml.sax.saxutils import escape


def unique_sorted(urls: list[str]) -> list[str]:
    # removeDuplicates keeps first occurrence, then sort.Strings
    seen = set()
    out = []
    for u in urls:
        if u not in seen:
            seen.add(u)
            out.append(u)
    out.sort()
    return out


def render_text(urls: list[str]) -> str:
    return "".join(u + "\n" for u in unique_sorted(urls))


def render_json(urls: list[str], timestamp: datetime | None = None) -> str:
    ts = (timestamp or datetime.now(timezone.utc)).isoformat()
    uniq = unique_sorted(urls)
    out = {
        "urls": [{"url": u, "timestamp": ts} for u in uniq],
        "timestamp": ts,
        "total": len(uniq),
    }
    return json.dumps(out, indent=2) + "\n"


def render_csv(urls: list[str], timestamp: datetime | None = None) -> str:
    ts = (timestamp or datetime.now(timezone.utc)).strftime("%Y-%m-%dT%H:%M:%S%z")
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(["url", "timestamp"])
    for u in unique_sorted(urls):
        w.writerow([u, ts])
    return buf.getvalue()


def render_xml(urls: list[str], timestamp: datetime | None = None) -> str:
    ts = (timestamp or datetime.now(timezone.utc)).isoformat()
    uniq = unique_sorted(urls)
    lines = ['<?xml version="1.0" encoding="UTF-8"?>', "<CrawlOutput>", "  <urls>"]
    for u in uniq:
        lines.append("    <url>")
        lines.append(f"      <url>{escape(u)}</url>")
        lines.append(f"      <timestamp>{ts}</timestamp>")
        lines.append("    </url>")
    lines.append("  </urls>")
    lines.append(f"  <timestamp>{ts}</timestamp>")
    lines.append(f"  <total>{len(uniq)}</total>")
    lines.append("</CrawlOutput>")
    return "\n".join(lines) + "\n"


RENDERERS = {
    "text": render_text,
    "json": render_json,
    "csv": render_csv,
    "xml": render_xml,
}


def render(urls: list[str], fmt: str = "text") -> str:
    if fmt not in RENDERERS:
        raise ValueError(f"unsupported output format: {fmt} (use {sorted(RENDERERS)})")
    return RENDERERS[fmt](urls)


def write_file(urls: list[str], filename: str) -> None:
    """S8: dedup+sort, one URL per line (output.go:82-101)."""
    with open(filename, "w") as f:
        f.write(render_text(urls))


def write_visited_parquet(visited_ds, path: str) -> None:
    """Scale sink: the sorted visited Dataset straight to partitioned
    Parquet (one file per block — resumable, never one giant file)."""
    visited_ds.write_parquet(path)


def write_resumable_parquet(ds, out_dir: str, *, partition_col: str):
    """Partitioned, RESUMABLE Parquet sink: one directory per partition
    value, committed atomically (tmp-file rename, then a ``_SUCCESS``
    marker). A re-run SKIPS partitions whose marker exists — rows for
    finished partitions are filtered out before any work happens — so a
    failed 100-TB job resumes by writing only what is missing instead of
    restarting, and no partition is ever observed half-written.

    Each partition is written by the ``groupby`` task that holds its
    group (one key shuffle; partition sizes must fit a task — pick the
    partition column accordingly, e.g. day / shard-id / key-range, the
    same rule the crawl checkpoints follow). Returns the manifest as a
    pa.Table (partition, n_rows, path), including skipped partitions
    with their recorded row counts.
    """
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def _part_dir(val) -> str:
        safe = "".join(
            c if c.isalnum() or c in "-_." else "_" for c in str(val)
        ) or "_empty"
        return os.path.join(out_dir, f"{partition_col}={safe}")

    done: dict[str, dict] = {}
    for name in os.listdir(out_dir):
        marker = os.path.join(out_dir, name, "_SUCCESS")
        if name.startswith(f"{partition_col}=") and os.path.exists(marker):
            with open(marker) as f:
                done[name] = json.load(f)

    done_names = frozenset(done)

    def drop_done(t: pa.Table) -> pa.Table:
        if not done_names:
            return t
        keep = [
            os.path.basename(_part_dir(v)) not in done_names
            for v in t.column(partition_col).to_pylist()
        ]
        return t.filter(pa.array(keep))

    def write_group(g: pa.Table) -> pa.Table:
        # the sort shuffle may dictionary-encode the key column in some
        # groups; decode so every partition file carries one schema
        for i, f in enumerate(g.schema):
            if pa.types.is_dictionary(f.type):
                g = g.set_column(i, f.name, g.column(f.name).cast(f.type.value_type))
        val = g.column(partition_col)[0].as_py()
        d = _part_dir(val)
        os.makedirs(d, exist_ok=True)
        data_path = os.path.join(d, "data.parquet")
        tmp = f"{data_path}.tmp-{os.getpid()}"
        pq.write_table(g, tmp)
        os.replace(tmp, data_path)  # atomic on POSIX
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            json.dump({"n_rows": g.num_rows, "path": data_path}, f)
        return pa.table(
            {
                "partition": pa.array([str(val)], pa.string()),
                "n_rows": pa.array([g.num_rows], pa.int64()),
                "path": pa.array([data_path], pa.string()),
            }
        )

    parts = [
        t
        for t in ds.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(partition_col)
        .map_groups(write_group, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if "partition" in t.column_names  # empty input materializes an empty-schema block
    ]
    empty_manifest = pa.table(
        {
            "partition": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "path": pa.array([], pa.string()),
        }
    )
    written = pa.concat_tables(parts) if parts else empty_manifest
    skipped = pa.table(
        {
            "partition": pa.array(
                [n.split("=", 1)[1] for n in sorted(done)], pa.string()
            ),
            "n_rows": pa.array(
                [done[n]["n_rows"] for n in sorted(done)], pa.int64()
            ),
            "path": pa.array([done[n]["path"] for n in sorted(done)], pa.string()),
        }
    )
    out = pa.concat_tables([written, skipped]) if skipped.num_rows else written
    return out.sort_by([("partition", "ascending")])
