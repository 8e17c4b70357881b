"""Deterministic synthetic Common-Crawl-style page corpus.

"Fetching" in this engine is a lookup into a Parquet ``pages`` table with the
schema from BASELINE.json:input_hint::

    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

This module synthesizes such a corpus with a known link graph so crawls have
a computable ground truth (the sequential oracle in oracle.py):

- hosts with a skewed size distribution (host 0 is the "hot host" — ~30% of
  all pages — to exercise politeness budgets and skew salting);
- per host, a binary-tree BFS backbone (page j links to 2j+1, 2j+2) giving
  every page a known min-depth from the host root;
- extra intra-host links, cross-host links (exercise the same-domain filter),
  dangling external links (fetch misses → failures), skip-scheme links,
  query/fragment variants, duplicate links;
- ~5% structurally malformed pages (unclosed <a> before a <div>) exercising
  the adoption-agency duplicate semantics of the extractor;
- a ``robots`` table (origin, content): a quarter of hosts disallow /sec3/
  and some declare Crawl-delay.

Generation is counter-based (np.random.default_rng([seed, page_id])): any
page can be produced independently, so the same corpus can be written by a
single process at test scale or by ``ray.data.range(n).map_batches(...)`` at
scale, with identical bytes either way.

Everything is deterministic in (seed, n_pages, n_hosts).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute  # noqa: F401  (pa.compute used below)
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        # HTTP status the fetch of this page "returned" (WARC-style capture
        # metadata): ~3% of non-root pages are 404/410/500/503 so the crawl's
        # status gate (crawler.go:331-334: non-2xx/3xx → error, URL visited,
        # links NOT followed) is exercised — error pages keep a full html
        # body with links precisely so following them would be detected.
        ("status", pa.int32()),
        # Transient-failure model (reference client.go:63-83: 5xx/network
        # errors are retried): the first ``flaky_fails`` fetch attempts of
        # this page return a transient 503 with no body; attempt
        # ``flaky_fails + 1`` serves the captured (status, html). 0 = stable
        # page (the default; corpora opt in via transient_rate>0). Drawn
        # from a SEPARATE rng stream so base content is identical across
        # rates.
        ("flaky_fails", pa.int32()),
    ]
)

#: Fraction of non-root pages given an error status (also versions the
#: corpus manifest: bumping regenerates stale cached corpora).
ERROR_RATE = 0.03
_ERROR_STATUSES = (404, 410, 500, 503)

#: Status served while a flaky page is still failing (Service Unavailable).
TRANSIENT_STATUS = 503

ROBOTS_SCHEMA = pa.schema([("origin", pa.string()), ("content", pa.string())])

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]
_WORDS = (
    "crawl frontier wave depth link anchor page host path robot polite queue "
    "shard hash batch arrow block stream spill budget seed fetch parse text "
    "graph node edge tree root leaf branch index filter exact near dup token"
).split()
_BASE_TS = np.datetime64("2025-06-01T00:00:00", "us")


def host_name(h: int) -> str:
    return f"h{h:05d}.example.org"


def host_layout(n_pages: int, n_hosts: int) -> np.ndarray:
    """Start offset of each host's page range (skewed: host 0 gets ~30%)."""
    sizes = np.full(n_hosts, 0, dtype=np.int64)
    hot = max(1, int(0.3 * n_pages))
    rest = n_pages - hot
    base = rest // max(1, n_hosts - 1) if n_hosts > 1 else 0
    sizes[0] = hot
    if n_hosts > 1:
        sizes[1:] = base
        sizes[1 : 1 + (rest - base * (n_hosts - 1))] += 1
    starts = np.zeros(n_hosts + 1, dtype=np.int64)
    np.cumsum(sizes, out=starts[1:])
    return starts


def page_url(h: int, j: int) -> str:
    if j == 0:
        return f"https://{host_name(h)}/"
    return f"https://{host_name(h)}/sec{j % 6}/p{j}"


# Pages are generated in fixed chunks of _CHUNK ids sharing one RNG stream,
# so any writer (single process or Ray blocks) produces identical bytes as
# long as it generates whole chunks in order. Per-page RNG construction was
# ~6ms/page; chunked streams are ~50x faster.
_CHUNK = 256
_WORDS_ARR = np.array(_WORDS)


def _gen_one(gid: int, starts: np.ndarray, rng: np.random.Generator, scale: int = 1) -> tuple[str, np.datetime64, bytes, str, str]:
    h = int(np.searchsorted(starts, gid, side="right") - 1)
    j = int(gid - starts[h])
    host_n = int(starts[h + 1] - starts[h])
    url = page_url(h, j)

    # --- text ---
    n_paras = int(rng.integers(2, 5)) * scale
    paras = []
    for _ in range(n_paras):
        k = int(rng.integers(20, 45))
        paras.append(" ".join(_WORDS_ARR[rng.integers(0, len(_WORDS_ARR), size=k)]))
    text = "\n".join(paras)
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]

    # --- links ---
    nav: list[str] = []
    children = [c for c in (2 * j + 1, 2 * j + 2) if c < host_n]
    for c in children:
        style = int(rng.integers(0, 3))
        target = f"/sec{c % 6}/p{c}"
        if style == 0:
            nav.append(target)  # absolute path
        elif style == 1:
            nav.append(page_url(h, c))  # full URL
        else:
            nav.append(f"sec{c % 6}/p{c}" if j == 0 else f"../sec{c % 6}/p{c}")
    # extra same-host links
    for _ in range(int(rng.integers(0, 4)) * scale):
        t = int(rng.integers(0, host_n))
        nav.append(f"/sec{t % 6}/p{t}" if t else "/")
    # occasional duplicate of the first child (duplicates preserved by parser)
    if children and rng.random() < 0.3:
        nav.append(f"/sec{children[0] % 6}/p{children[0]}")
    # query/fragment variants (query → canonical miss, fragment → same page)
    if children and rng.random() < 0.15:
        nav.append(f"/sec{children[0] % 6}/p{children[0]}#details")
    if host_n > 1 and rng.random() < 0.08:
        t = int(rng.integers(1, host_n))
        nav.append(f"/sec{t % 6}/p{t}?ref={j}")
    # cross-host + dangling external
    ext: list[str] = []
    for _ in range(int(rng.integers(0, 3))):
        oh = int(rng.integers(0, len(starts) - 1))
        ext.append(f"https://{host_name(oh)}/")
    for _ in range(int(rng.integers(0, 3))):
        ext.append(f"https://ext{int(rng.integers(0, 50)):03d}.example.net/res")
    skip = ["mailto:info@example.org", "javascript:void(0)", "#top"][: int(rng.integers(0, 3))]

    # --- html ---
    title = f"{host_name(h)} page {j}"
    parts = [
        "<!DOCTYPE html>\n<html>\n<head><title>",
        title,
        "</title></head>\n<body>\n<nav>\n",
    ]
    for href in nav:
        parts.append(f'  <a href="{href}">{href}</a>\n')
    parts.append("</nav>\n<main>\n")
    for p_text in paras:
        words = p_text.split(" ")
        if len(words) > 4 and ext:
            # inline anchor around one word; anchor text stays part of <p> text
            w = len(words) // 2
            href = ext.pop(0)
            body = " ".join(words[:w]) + f' <a href="{href}">{words[w]}</a> ' + " ".join(
                words[w + 1 :]
            )
        else:
            body = p_text
        parts.append(f"<p>{body}</p>\n")
    for href in ext:
        parts.append(f'<a href="{href}">more</a>\n')
    if rng.random() < 0.05 and children:
        # malformed block: unclosed <a> interrupted by a div → the HTML5
        # adoption agency clones it (href appears twice in the DOM)
        c0 = children[0]
        parts.append(
            f'<div class="promo"><a href="/sec{c0 % 6}/p{c0}">promo\n'
            f'<div><a href="/">home</a></div></div>\n'
        )
    parts.append("<footer>\n")
    for href in skip:
        parts.append(f'<a href="{href}">x</a>\n')
    parts.append("</footer>\n</body>\n</html>\n")
    html = "".join(parts).encode("utf-8")

    ts = _BASE_TS + np.timedelta64(gid, "s").astype("timedelta64[us]")

    # Status last, so the draw doesn't shift the content stream above. Roots
    # stay 200 (a dead seed would make whole hosts unreachable).
    status = 200
    if j != 0 and rng.random() < ERROR_RATE:
        status = _ERROR_STATUSES[int(rng.integers(0, len(_ERROR_STATUSES)))]
    return url, ts, html, text, lang, status


def gen_pages_batch(
    gids: np.ndarray,
    starts: np.ndarray,
    seed: int,
    scale: int = 1,
    transient_rate: float = 0.0,
) -> pa.Table:
    """Generate a batch of pages; usable standalone or inside map_batches.

    Deterministic in (seed, gid, scale, transient_rate) regardless of how
    gids are batched: each fixed 256-id chunk has its own RNG stream, and
    partial chunks are generated in full (cheap) with only the requested
    rows emitted. ``scale`` multiplies paragraphs and link counts (page
    weight: scale=1 ≈ 1.5KB toy pages; scale=4-8 ≈ realistic web pages).
    ``transient_rate`` marks that fraction of non-root 200-status pages
    flaky (flaky_fails ∈ {1,2,3}) via a separate rng stream — the base
    content bytes are identical at every rate.
    """
    n_total = int(starts[-1])
    gids = np.sort(np.asarray(gids, dtype=np.int64))
    wanted = set(gids.tolist())
    cols = {k: [] for k in ("url", "warc_ts", "html", "text", "lang", "status", "flaky_fails")}
    for chunk_id in np.unique(gids // _CHUNK):
        rng = np.random.default_rng([seed, int(chunk_id)])
        rng_flaky = np.random.default_rng([seed, int(chunk_id), 0x7F17])
        lo = int(chunk_id) * _CHUNK
        hi = min(lo + _CHUNK, n_total)
        for gid in range(lo, hi):
            url, ts, html, text, lang, status = _gen_one(gid, starts, rng, scale)
            # Always consume both flaky draws so the stream stays aligned
            # however batching and eligibility fall.
            r, f = rng_flaky.random(), int(rng_flaky.integers(1, 4))
            flaky = (
                f
                if (transient_rate > 0 and status == 200
                    and not url.endswith("/") and r < transient_rate)
                else 0
            )
            if gid not in wanted:
                continue
            cols["url"].append(url)
            cols["warc_ts"].append(ts)
            cols["html"].append(html)
            cols["text"].append(text)
            cols["lang"].append(lang)
            cols["status"].append(status)
            cols["flaky_fails"].append(flaky)
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "status": pa.array(cols["status"], pa.int32()),
            "flaky_fails": pa.array(cols["flaky_fails"], pa.int32()),
        }
    )


def _gen_all(
    n_pages: int, starts: np.ndarray, seed: int, scale: int = 1,
    transient_rate: float = 0.0,
) -> pa.Table:
    """Generate the full pages table — in parallel Ray tasks when a session
    is up and the corpus is big (chunk-aligned spans, so bytes are identical
    to the single-process path)."""
    try:
        import ray

        use_ray = n_pages >= 50_000 and ray.is_initialized()
    except ImportError:
        use_ray = False
    if not use_ray:
        return gen_pages_batch(np.arange(n_pages), starts, seed, scale, transient_rate)

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    span = max(_CHUNK, ((n_pages // (cpus * 4)) // _CHUNK + 1) * _CHUNK)

    @ray.remote
    def _gen_span(lo: int, hi: int) -> pa.Table:
        return gen_pages_batch(np.arange(lo, hi), starts, seed, scale, transient_rate)

    futs = [
        _gen_span.remote(lo, min(lo + span, n_pages)) for lo in range(0, n_pages, span)
    ]
    return pa.concat_tables(ray.get(futs))


def robots_table(n_hosts: int, seed: int) -> pa.Table:
    """Robots bodies for every 4th host: /sec3/ disallowed; some crawl-delay."""
    origins, contents = [], []
    for h in range(0, n_hosts, 4):
        delay = "" if h % 8 else "Crawl-delay: 1\n"
        origins.append(f"https://{host_name(h)}")
        contents.append(f"User-agent: *\nDisallow: /sec3/\n{delay}")
    return pa.table({"origin": pa.array(origins), "content": pa.array(contents)})


@dataclass
class CorpusInfo:
    dir: str
    n_pages: int
    n_hosts: int
    seed: int
    partitions: int
    seeds: list[str]

    @property
    def pages_path(self) -> str:
        return os.path.join(self.dir, "pages")

    @property
    def robots_path(self) -> str:
        return os.path.join(self.dir, "robots.parquet")


def sf_to_pages(sf: float) -> int:
    return max(200, int(600_000 * sf))


def generate_corpus(
    out_dir: str,
    n_pages: int,
    n_hosts: int | None = None,
    seed: int = 42,
    partitions: int = 8,
    page_scale: int = 1,
    transient_rate: float = 0.0,
) -> CorpusInfo:
    """Write pages (url-hash partitioned parquet dir) + robots + manifest.

    Idempotent: if a manifest with identical parameters exists, reuse it.
    """
    if n_hosts is None:
        n_hosts = max(4, n_pages // 150)
    manifest_path = os.path.join(out_dir, "corpus.json")
    params = {
        "n_pages": n_pages,
        "n_hosts": n_hosts,
        "seed": seed,
        "partitions": partitions,
        "page_scale": page_scale,
        # Participate in the idempotence key: corpora cached before error
        # statuses / the flaky_fails column existed (or with different
        # rates) regenerate.
        "error_rate": ERROR_RATE,
        "transient_rate": transient_rate,
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        defaults = {"page_scale": 1, "transient_rate": None}
        if {k: m.get(k, defaults.get(k)) for k in params} == params:
            return CorpusInfo(out_dir, n_pages, n_hosts, seed, partitions, m["seeds"])

    starts = host_layout(n_pages, n_hosts)
    # Regenerating with new params: derived artifacts (expected-oracle
    # tables, old bucket files from a different partition count) are stale.
    import shutil

    for sub in ("pages", "expected"):
        p = os.path.join(out_dir, sub)
        if os.path.isdir(p):
            shutil.rmtree(p)
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)

    # Hash-partition by URL so the fetch join can co-partition at scale.
    import pandas as pd

    table = _gen_all(n_pages, starts, seed, page_scale, transient_rate)
    buckets = (
        pd.util.hash_array(np.asarray(table.column("url").to_pylist(), dtype=object))
        % partitions
    ).astype(np.int64)
    for b in range(partitions):
        sub = table.filter(pa.array(buckets == b))
        # Sort by url with small row groups: the fetch stage's `url isin`
        # predicate then prunes on row-group statistics instead of scanning
        # the whole bucket.
        sub = sub.take(pa.compute.sort_indices(sub, sort_keys=[("url", "ascending")]))
        pq.write_table(
            sub, os.path.join(out_dir, "pages", f"bucket-{b:05d}.parquet"),
            compression="zstd", row_group_size=512,
        )
    pq.write_table(robots_table(n_hosts, seed), os.path.join(out_dir, "robots.parquet"))

    seeds = [f"https://{host_name(0)}/"]
    if n_hosts > 2:
        seeds.append(f"https://{host_name(1)}/")
    with open(manifest_path, "w") as f:
        json.dump({**params, "seeds": seeds}, f)
    return CorpusInfo(out_dir, n_pages, n_hosts, seed, partitions, seeds)


def ensure_eval_set(
    sf_dir: str, cache_root: str = "/tmp/urlmap_corpus"
) -> str:
    """Materialize the benchmark/eval-set fixture for decontamination as a
    real external parquet table (doc_id, text) and return its path.

    At production scale the eval set IS an external MB-sized table (the
    benchmark suites), not a corpus slice — pipelines must read it directly,
    never re-derive it by scanning the corpus. This generator stands in for
    that external table deterministically: the doc_id % 20 == 7 slice of the
    sf documents table (pinned — the decontam oracles encode the same rule).
    Generation streams documents.parquet row-group-wise ONCE per sf and
    caches the ~5% result; every later run reads only the small fixture."""
    import pyarrow.parquet as _pq

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(cache_root, "eval")
    path = os.path.join(out_dir, f"{name}-eval_set.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    pf = _pq.ParquetFile(os.path.join(sf_dir, "documents.parquet"))
    kept: list[pa.Table] = []
    for rb in pf.iter_batches(columns=["doc_id", "text"]):
        t = pa.Table.from_batches([rb])
        ids = t.column("doc_id").to_numpy()
        kept.append(t.filter(pa.array(ids % 20 == 7)))
    table = pa.concat_tables(kept) if kept else pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    _pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic under concurrent generators
    return path


def ensure_wet_fixture(
    sf_dir: str, cache_root: str = "/tmp/urlmap_corpus", n_shards: int = 4
) -> list[str]:
    """Materialize the documents table as Common-Crawl-style WET archives
    (one gzip'd conversion-record file per shard) and return the file list.

    This is the engine's INPUT seam made driver-checkable: a query can read
    these archives through sources.warc.read_wet and be gated against the
    same rows read from parquet. URL rule pinned: https://docs.example/<id>;
    shard rule: doc_id % n_shards; records ascend by doc_id within a shard."""
    import pyarrow.parquet as _pq

    from .sources.warc import write_wet

    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(cache_root, "wet", name)
    marker = os.path.join(out_dir, "_complete")
    paths = [
        os.path.join(out_dir, f"docs-{s:03d}.warc.wet.gz") for s in range(n_shards)
    ]
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    t = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    recs = sorted(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    for s, path in enumerate(paths):
        shard = [
            {"url": f"https://docs.example/{i}", "text": x or ""}
            for i, x in recs
            if i % n_shards == s
        ]
        tmp = f"{path}.tmp-{os.getpid()}"
        write_wet(tmp, shard, compress=True)
        os.replace(tmp, path)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    open(mtmp, "w").close()
    os.replace(mtmp, marker)  # marker last: readers only trust complete sets
    return paths


def ensure_warc_fixture(
    info: CorpusInfo, cache_root: str = "/tmp/urlmap_corpus"
) -> list[str]:
    """Materialize the page corpus as WARC response archives (one gzip'd
    file per pages bucket, preserving each bucket's url-sorted order and
    real HTTP statuses) and return the file list. The html payload bytes
    are the corpus bytes verbatim, so the byte-identical text-extraction
    invariant is testable THROUGH the WARC parse."""
    import pyarrow.parquet as _pq

    from .sources.warc import write_warc

    name = os.path.basename(os.path.normpath(info.dir))
    out_dir = os.path.join(cache_root, "warc", name)
    marker = os.path.join(out_dir, "_complete")
    buckets = sorted(
        f for f in os.listdir(info.pages_path) if f.endswith(".parquet")
    )
    paths = [
        os.path.join(out_dir, b.replace(".parquet", ".warc.gz")) for b in buckets
    ]
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    for b, path in zip(buckets, paths):
        t = _pq.read_table(
            os.path.join(info.pages_path, b), columns=["url", "html", "status"]
        )
        recs = [
            {"url": u, "html": h or b"", "status": s}
            for u, h, s in zip(
                t.column("url").to_pylist(),
                t.column("html").to_pylist(),
                t.column("status").to_pylist(),
            )
        ]
        tmp = f"{path}.tmp-{os.getpid()}"
        write_warc(tmp, recs, compress=True)
        os.replace(tmp, path)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    open(mtmp, "w").close()
    os.replace(mtmp, marker)
    return paths


def _page_keys(urls: list[str]) -> list[int]:
    """Page-number key per url: trailing /p<digits> else 0 (the
    page_clean_pipeline contract, mirrored in every fixture oracle)."""
    import re

    out = []
    for u in urls:
        m = re.search(r"/p([0-9]+)$", u)
        out.append(int(m.group(1)) if m else 0)
    return out


def ensure_sitemap_fixture(
    info: CorpusInfo, cache_root: str = "/tmp/urlmap_corpus", n_shards: int = 4
) -> str:
    """Materialize a sitemap-index fixture over the page corpus and return
    the INDEX path (reading it exercises read_sitemaps' index expansion).

    Entry rule (pinned; the sitemap_seeds oracle mirrors it in SQL):
    every page url with page-number k % 3 != 1 is listed once; urls with
    k % 7 == 0 among those are listed AGAIN with a '#frag' suffix (the
    normalize funnel must merge them); each shard also carries junk
    entries (javascript:/mailto:/relative/ftp) the validator must drop.
    Shard rule: k % n_shards. So distinct seeds == {url : k % 3 != 1}."""
    import pyarrow.parquet as _pq

    from .sources.sitemap import write_sitemap, write_sitemap_index

    name = os.path.basename(os.path.normpath(info.dir))
    out_dir = os.path.join(cache_root, "sitemap", name)
    marker = os.path.join(out_dir, "_complete")
    index = os.path.join(out_dir, "sitemap-index.xml")
    if os.path.exists(marker):
        return index
    os.makedirs(out_dir, exist_ok=True)
    buckets = sorted(
        f for f in os.listdir(info.pages_path) if f.endswith(".parquet")
    )
    urls: list[str] = []
    for b in buckets:
        urls.extend(
            _pq.read_table(os.path.join(info.pages_path, b), columns=["url"])
            .column("url")
            .to_pylist()
        )
    urls.sort()
    keys = _page_keys(urls)
    junk = ["javascript:alert(1)", "mailto:ops@example.org", "not a url", "ftp://files.example.org/a"]
    shard_paths = []
    for s in range(n_shards):
        entries = [u for u, k in zip(urls, keys) if k % 3 != 1 and k % n_shards == s]
        entries += [
            u + "#frag"
            for u, k in zip(urls, keys)
            if k % 3 != 1 and k % 7 == 0 and k % n_shards == s
        ]
        entries += junk
        p = os.path.join(out_dir, f"sitemap-{s:03d}.xml")
        tmp = f"{p}.tmp-{os.getpid()}"
        write_sitemap(entries, tmp, compress=False)
        os.replace(tmp, p)
        shard_paths.append(p)
    itmp = f"{index}.tmp-{os.getpid()}"
    write_sitemap_index(shard_paths, itmp)
    os.replace(itmp, index)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    open(mtmp, "w").close()
    os.replace(mtmp, marker)
    return index


def ensure_cdxj_fixture(
    info: CorpusInfo, cache_root: str = "/tmp/urlmap_corpus", n_shards: int = 4
) -> list[str]:
    """Materialize a CDXJ capture-index fixture over the page corpus and
    return the shard file list.

    Capture rule (pinned; the cdxj_plan oracle mirrors it in SQL): one
    capture per page at ts 20240101000000 with the page's REAL corpus
    status; pages with page-number k % 9 == 4 get a second 500-status
    capture at a later ts (multi-capture urlkeys the status filter must
    drop). Shard rule: k % n_shards. So the 200-status fetch plan ==
    {url : status == 200}."""
    import pyarrow.parquet as _pq

    from .sources.cdxj import write_cdxj

    name = os.path.basename(os.path.normpath(info.dir))
    out_dir = os.path.join(cache_root, "cdxj", name)
    marker = os.path.join(out_dir, "_complete")
    paths = [os.path.join(out_dir, f"captures-{s:03d}.cdxj.gz") for s in range(n_shards)]
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    buckets = sorted(
        f for f in os.listdir(info.pages_path) if f.endswith(".parquet")
    )
    rows: list[tuple[str, int]] = []
    for b in buckets:
        t = _pq.read_table(
            os.path.join(info.pages_path, b), columns=["url", "status"]
        )
        rows.extend(zip(t.column("url").to_pylist(), t.column("status").to_pylist()))
    rows.sort()
    keys = _page_keys([u for u, _ in rows])
    for s, path in enumerate(paths):
        caps = []
        for (u, st), k in zip(rows, keys):
            if k % n_shards != s:
                continue
            caps.append({"url": u, "ts": "20240101000000", "status": int(st)})
            if k % 9 == 4:
                caps.append({"url": u, "ts": "20240601000000", "status": 500})
        tmp = f"{path}.tmp-{os.getpid()}"
        write_cdxj(caps, tmp, compress=True)
        os.replace(tmp, path)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    open(mtmp, "w").close()
    os.replace(mtmp, marker)
    return paths


def corpus_for_sf_dir(
    sf_dir: str,
    cache_root: str = "/tmp/urlmap_corpus",
    transient_rate: float = 0.0,
) -> CorpusInfo:
    """Map a testdata sf dir (…/sf0.01) to a cached deterministic corpus of
    matching scale. The corpus is derived from (seed=42, sf) only — no
    external data. ``transient_rate > 0`` selects the flaky-page variant
    (cached separately; base page bytes identical to the stable corpus)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    n = sf_to_pages(sf)
    if transient_rate > 0:
        name = f"{name}-transient"
    out = os.path.join(cache_root, name)
    os.makedirs(out, exist_ok=True)
    return generate_corpus(out, n, transient_rate=transient_rate)
