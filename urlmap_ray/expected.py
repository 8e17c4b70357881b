"""Single-process expected tables ("local oracles") for corpus-derived queries.

The driver's correctness gate compares each ``queries()`` entry against a
DuckDB ``oracle_sql()`` statement. The crawl/page-family queries run over the
deterministic synthetic corpus (corpus.py), which has no testdata SQL view —
but every one of them has a pure single-process ground truth:

- crawl queries  → oracle.crawl_waves (the sequential wave-BFS semantic model,
  itself validated against the ported reference goldens in tests/)
- page_links / spa_detect / page_link_stats → the pure per-page functions
  (extract.py, spa.py) applied to the corpus table in one process

This module materializes those ground truths as Parquet under
``<corpus dir>/expected/`` so the oracle can be plain
``SELECT * FROM read_parquet('...')``. The point of the check is the
DISTRIBUTED path: wave scheduling, shuffles, the seen-set claim, the fused
fetch/extract chain — everything between "pure per-page function" and "Ray
pipeline output" is independently exercised.

Generation is idempotent (skipped when the file exists — the corpus is
deterministic in its manifest params) and gated to small corpora: the
single-process oracle is a test-scale tool, and bench runs at sf ≥ 0.1 must
never pay for it. Each ``queries()`` callable ensures its expected file
before running, so the file exists by the time the driver evaluates the
matching oracle SQL. The SQL strings in __ray_entry__ hardcode the sf0.01
corpus path because the driver's gate runs at sf=0.01.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .config import CrawlConfig
from .corpus import CorpusInfo

# Above this corpus size, ensure_* becomes a no-op (returns the path without
# generating): the single-process oracles exist for the sf ≤ 0.01 gate only.
MAX_ORACLE_PAGES = 10_000

# The driver's correctness gate runs at sf=0.01; oracle SQL reads this dir.
SF001_CORPUS_DIR = "/tmp/urlmap_corpus/sf0.01"


# Bump when a pure ground-truth function changes semantics (e.g. the SPA
# confidence gating fix): generation is keyed by file existence, so a
# version in the filename is what retires stale cached expected tables.
EXPECTED_VERSION = 2


def expected_file(corpus_dir: str, name: str) -> str:
    """Canonical expected-table path — ALSO the path oracle SQL must read
    (build the SQL with this helper so filenames can never drift)."""
    return os.path.join(corpus_dir, "expected", f"{name}-v{EXPECTED_VERSION}.parquet")


def expected_path(info: CorpusInfo, name: str) -> str:
    return expected_file(info.dir, name)


def _write_atomic(tbl: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def _should_generate(info: CorpusInfo, path: str) -> bool:
    return not os.path.exists(path) and info.n_pages <= MAX_ORACLE_PAGES


def _pages_table(info: CorpusInfo) -> pa.Table:
    import pyarrow.dataset as pads

    return pads.dataset(info.pages_path, format="parquet").to_table(
        columns=["url", "html"]
    )


def ensure_crawl_expected(
    info: CorpusInfo, tag: str, cfg: CrawlConfig, with_attempt: bool = False
) -> str:
    """Expected (url, depth, status[, attempt]) of a crawl from
    info.seeds[0] — the wave-BFS oracle's results, sorted by url (matching
    visited_dataset). ``with_attempt`` adds the final 1-based fetch-attempt
    column (transient-retry accounting, client.go:63-83 parity)."""
    path = expected_path(info, f"crawl-{tag}")
    if not _should_generate(info, path):
        return path
    from .oracle import crawl_waves, load_corpus_dict
    from .robotstxt import RobotsIndex

    corpus = load_corpus_dict(info.pages_path)
    robots = None
    if cfg.respect_robots and os.path.exists(info.robots_path):
        robots = RobotsIndex(cfg.user_agent)
        tbl = pq.read_table(info.robots_path)
        for o, c in zip(tbl.column("origin").to_pylist(), tbl.column("content").to_pylist()):
            robots.add(o, c)
    out = crawl_waves(corpus, info.seeds[0], cfg, robots=robots)
    rows = sorted((r.url, r.depth, r.status, r.attempt) for r in out.results)
    cols = {
        "url": pa.array([r[0] for r in rows], pa.string()),
        "depth": pa.array([r[1] for r in rows], pa.int32()),
        "status": pa.array([r[2] for r in rows], pa.int32()),
    }
    if with_attempt:
        cols["attempt"] = pa.array([r[3] for r in rows], pa.int32())
    _write_atomic(pa.table(cols), path)
    return path


def ensure_page_links_expected(info: CorpusInfo) -> str:
    """Expected (url, n_links) per corpus page via the pure extractor."""
    path = expected_path(info, "page_links")
    if not _should_generate(info, path):
        return path
    import pyarrow.compute as pc

    from .extract import extract_links_batch

    tbl = extract_links_batch(_pages_table(info))
    out = pa.table(
        {
            "url": tbl.column("url"),
            "n_links": pc.list_value_length(tbl.column("links")).cast(pa.int64()),
        }
    )
    _write_atomic(out.sort_by("url"), path)
    return path


def ensure_anchors_expected(info: CorpusInfo) -> str:
    """Expected (src, dst, anchor) link-text rows via a single-process
    per-page loop over the scalar :func:`~urlmap_ray.extract.extract_anchors`
    (the distributed query uses the batch form — same trust model as
    page_links; handwritten goldens in test_extract pin the anchor-text
    parser semantics)."""
    path = expected_path(info, "page_anchors")
    if not _should_generate(info, path):
        return path
    from .extract import extract_anchors
    from .urlnorm import URLError

    tbl = _pages_table(info)
    srcs, dsts, anchors = [], [], []
    for url, html in zip(tbl.column("url").to_pylist(), tbl.column("html").to_pylist()):
        if html is None:
            continue
        try:
            pairs = extract_anchors(url, html)
        except URLError:
            continue
        for dst, text in pairs:
            srcs.append(url)
            dsts.append(dst)
            anchors.append(text)
    _write_atomic(
        pa.table(
            {
                "src": pa.array(srcs, pa.string()),
                "dst": pa.array(dsts, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        ),
        path,
    )
    return path


def ensure_spa_expected(info: CorpusInfo) -> str:
    """Expected (url, is_spa, confidence) per corpus page via detect_spa."""
    path = expected_path(info, "spa_detect")
    if not _should_generate(info, path):
        return path
    from .spa import detect_spa_batch

    tbl = detect_spa_batch(_pages_table(info)).drop_columns(["indicators"])
    _write_atomic(tbl.sort_by("url"), path)
    return path


def ensure_spa_domains_expected(info: CorpusInfo) -> str:
    """Expected (domain, is_spa, confidence) per domain from its ROOT page —
    the deterministic form of the reference's per-domain detection memo
    (spa_detector.go:39-43: the first page crawled of a domain decides its
    verdict; in a root-seeded BFS that first page is the root)."""
    path = expected_path(info, "spa_domains")
    if not _should_generate(info, path):
        return path
    import re

    from .spa import detect_spa

    tbl = _pages_table(info)
    domains, spas, confs = [], [], []
    for url, html in zip(tbl.column("url").to_pylist(), tbl.column("html").to_pylist()):
        if re.fullmatch(r"https://[^/]+/", url):
            is_spa, conf, _ = detect_spa(html)
            domains.append(url[8:-1])
            spas.append(is_spa)
            confs.append(conf)
    out = pa.table(
        {
            "domain": pa.array(domains, pa.string()),
            "is_spa": pa.array(spas, pa.bool_()),
            "confidence": pa.array(confs, pa.float64()),
        }
    )
    _write_atomic(out.sort_by("domain"), path)
    return path


def ensure_graph_expected(info: CorpusInfo) -> tuple[str, str, str]:
    """Expected edge list, degree table and PageRank table for the corpus
    link graph, via the pure extractor + the single-process
    :func:`~urlmap_ray.functions.graph.pagerank_reference` (same graph
    semantics as functions/graph.py, no Ray)."""
    e_path = expected_path(info, "page_edges")
    d_path = expected_path(info, "page_degrees")
    p_path = expected_path(info, "pagerank")
    # 3-iteration variant: the registered pagerank_shuffle query runs the
    # >SHUFFLE_MODE_NODES formulation at 3 iterations (bit-identity vs
    # broadcast mode is separately pinned per-iteration by
    # test_pagerank_shuffle_mode_identical), so the bench stops paying
    # 10 iterations × 2 all-to-all jobs of toy-scale overhead (VERDICT r2 #4)
    p3_path = expected_path(info, "pagerank3")
    if not (
        _should_generate(info, e_path)
        or _should_generate(info, d_path)
        or _should_generate(info, p_path)
        or _should_generate(info, p3_path)
    ):
        return e_path, d_path, p_path
    from collections import Counter

    from .extract import extract_links
    from .functions.graph import pagerank_reference

    tbl = _pages_table(info)
    urls = tbl.column("url").to_pylist()
    node_set = set(urls)
    links_per_url: dict[str, list[str]] = {}
    for url, html in zip(urls, tbl.column("html").to_pylist()):
        links_per_url[url] = extract_links(url, html) if html is not None else []
    edges = sorted(
        {
            (u, l)
            for u, links in links_per_url.items()
            for l in links
            if l in node_set and l != u
        }
    )
    _write_atomic(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.string()),
                "dst": pa.array([e[1] for e in edges], pa.string()),
            }
        ),
        e_path,
    )
    out_c = Counter(e[0] for e in edges)
    in_c = Counter(e[1] for e in edges)
    su = sorted(urls)
    _write_atomic(
        pa.table(
            {
                "url": pa.array(su, pa.string()),
                "out_deg": pa.array([out_c.get(u, 0) for u in su], pa.int64()),
                "in_deg": pa.array([in_c.get(u, 0) for u in su], pa.int64()),
            }
        ),
        d_path,
    )
    pr = pagerank_reference(urls, links_per_url)
    _write_atomic(
        pa.table(
            {
                "url": pa.array(su, pa.string()),
                "rank_ppb": pa.array([pr[u] for u in su], pa.int64()),
            }
        ),
        p_path,
    )
    pr3 = pagerank_reference(urls, links_per_url, n_iters=3)
    _write_atomic(
        pa.table(
            {
                "url": pa.array(su, pa.string()),
                "rank_ppb": pa.array([pr3[u] for u in su], pa.int64()),
            }
        ),
        p3_path,
    )
    return e_path, d_path, p_path


def ensure_all_sf001_expected(testdata_root: str = "/root/testdata") -> None:
    """Materialize every expected table the sf0.01 oracle SQL reads.

    Called from ``oracle_sql()`` so the read_parquet paths exist even if the
    driver evaluates an oracle before running the matching query callable.
    Pure single-process pyarrow/python — needs no Ray session. Idempotent:
    after the first call (or after the query callables ran) every step is an
    existence check."""
    from .corpus import corpus_for_sf_dir

    sf_dir = os.path.join(testdata_root, "sf0.01")
    info = corpus_for_sf_dir(sf_dir)
    ensure_crawl_expected(info, "bfs", CrawlConfig())
    ensure_crawl_expected(info, "d3", CrawlConfig(max_depth=3))
    ensure_crawl_expected(
        info, "br", CrawlConfig(per_host_budget=200, respect_robots=True)
    )
    ensure_page_links_expected(info)
    ensure_anchors_expected(info)
    ensure_spa_expected(info)
    ensure_spa_domains_expected(info)
    ensure_link_stats_expected(info)
    ensure_graph_expected(info)
    ensure_components_expected(info)
    ensure_hits_expected(info)
    ensure_dust_expected(info)
    if os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        ensure_simhash_sigs(sf_dir)
        ensure_compression_expected(sf_dir)
        ensure_quality_model_expected(sf_dir)
        ensure_lm_expected(sf_dir)
    if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        ensure_kmeans_expected(sf_dir)
        ensure_pca_expected(sf_dir)


def ensure_simhash_sigs(sf_dir: str, max_docs: int = 1000) -> str:
    """Write (doc_id, simhash) for the documents table via the pure
    ``simhash64`` function. The dedup_simhash oracle is then an exact
    ALL-PAIRS Hamming join in SQL (bit_count(xor(..)) ≤ k) over these
    signatures — checking the distributed banding + in-group verify against
    a banding-free pairwise scan. Gated to test-scale tables (the gate runs
    at sf=0.01 = 500 docs); bench-scale calls skip generation."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "simhash_sigs.parquet")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if docs.num_rows > max_docs:
        return path
    from .functions.dedup import simhash_batch

    _write_atomic(simhash_batch(docs), path)
    return path


def ensure_compression_expected(sf_dir: str, max_docs: int = 1000) -> str:
    """Expected (doc_id, n_bytes, n_zlib, comp_flag) computed by a direct
    single-process zlib loop (not the batch function) — deterministic for
    the pinned (CPython zlib, level 6) pair, which both sides share. The
    doc_compression oracle reads this table; SQL cannot express zlib."""
    import zlib

    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "compression.parquet")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if docs.num_rows > max_docs:
        return path
    ids = docs.column("doc_id").to_pylist()
    rows = []
    for did, txt in zip(ids, docs.column("text").to_pylist()):
        raw = (txt or "").encode("utf-8")
        nz = len(zlib.compress(raw, 6))
        rows.append((did, len(raw), nz, int(nz * 4 < len(raw))))
    _write_atomic(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "n_bytes": pa.array([r[1] for r in rows], pa.int64()),
                "n_zlib": pa.array([r[2] for r in rows], pa.int64()),
                "comp_flag": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        path,
    )
    return path


def ensure_hll_expected(sf_dir: str, max_rows: int = 500_000) -> str:
    """Expected one-row (n_users_est) from a SEQUENTIAL HyperLogLog pass
    over events.user_id: same register/estimate primitives as the engine
    (the kmeans/PCA trust model — SQL cannot express HLL), independent
    fold path. What the events_users_hll gate checks is the distributed
    side's bucketed register-max exchange: register max is associative,
    so any parallelism must land on THIS exact register array."""
    import numpy as np

    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "hll_users.parquet")
    if os.path.exists(path):
        return path
    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    if pf.metadata.num_rows > max_rows:
        return path
    from .functions.sketch import (
        _HLL_M,
        hash64_column,
        hll_batch_registers,
        hll_estimate,
    )

    regs = np.zeros(_HLL_M, np.uint8)
    for b in pf.iter_batches(columns=["user_id"], batch_size=8192):
        col = b.column(0).drop_null()
        if len(col):
            regs = np.maximum(regs, hll_batch_registers(hash64_column(col)))
    _write_atomic(
        pa.table({"n_users_est": pa.array([hll_estimate(regs)], pa.int64())}),
        path,
    )
    return path


def ensure_hll_bytype_expected(sf_dir: str, max_rows: int = 500_000) -> str:
    """Expected (event_type, n_est) from a SEQUENTIAL keyed HyperLogLog
    pass over events: one dense register array per event_type, same
    register/estimate primitives as the engine. The events_type_users_hll
    gate checks the distributed sparse (key, ridx, rho) exchange + keyed
    max fold against this."""
    import numpy as np
    import pyarrow.compute as pc

    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "hll_bytype.parquet")
    if os.path.exists(path):
        return path
    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    if pf.metadata.num_rows > max_rows:
        return path
    from .functions.sketch import (
        _HLL_M,
        hash64_column,
        hll_batch_registers,
        hll_estimate,
    )

    regs: dict[str, object] = {}
    for b in pf.iter_batches(columns=["event_type", "user_id"], batch_size=8192):
        tbl = pa.Table.from_batches([b])
        for et in pc.unique(tbl.column("event_type")).to_pylist():
            sub = tbl.filter(pc.equal(tbl.column("event_type"), et))
            r = hll_batch_registers(hash64_column(sub.column("user_id")))
            regs[et] = np.maximum(regs[et], r) if et in regs else r
    keys = sorted(regs)
    _write_atomic(
        pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "n_est": pa.array(
                    [hll_estimate(regs[k]) for k in keys], pa.int64()
                ),
            }
        ),
        path,
    )
    return path


def ensure_ams_expected(sf_dir: str, max_rows: int = 500_000) -> str:
    """Expected one-row (f2_est) from a SEQUENTIAL AMS pass over
    events.user_id: same sign-hash counters, integer sums — the
    distributed bucketed fold must land on identical counters (associative
    adds) and therefore the identical pinned median-of-means estimate."""
    import numpy as np

    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "ams_f2.parquet")
    if os.path.exists(path):
        return path
    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    if pf.metadata.num_rows > max_rows:
        return path
    from .functions.sketch import (
        _AMS_K,
        ams_batch_counters,
        ams_f2_estimate,
        hash64_column,
    )

    counters = np.zeros(_AMS_K, np.int64)
    for b in pf.iter_batches(columns=["user_id"], batch_size=8192):
        col = b.column(0).drop_null()
        if len(col):
            counters += ams_batch_counters(hash64_column(col))
    _write_atomic(
        pa.table({"f2_est": pa.array([ams_f2_estimate(counters)], pa.int64())}),
        path,
    )
    return path


def ensure_dsir_expected(sf_dir: str, max_docs: int = 1000) -> str:
    """Expected (doc_id, n_tokens, dsir_ppb) from the single-process DSIR
    reference (Counter-trained raw vocab, sequential target counting, the
    shared log/score primitives) over documents + the external eval-set
    fixture. The docs_dsir gate checks the distributed two-distribution
    build + broadcast scoring lands on identical bits."""
    from .corpus import ensure_eval_set
    from .functions.dsir import dsir_reference

    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "dsir.parquet")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if docs.num_rows > max_docs:
        return path
    target = pq.read_table(ensure_eval_set(sf_dir), columns=["doc_id", "text"])
    _write_atomic(dsir_reference(docs, target), path)
    return path


def ensure_quality_model_expected(sf_dir: str, max_docs: int = 1000) -> str:
    """Expected (doc_id, model_score, model_keep) from the single-process
    per-doc reference (quality_model.quality_model_reference). Scores are
    integer sums of deterministic int64 weights, so the distributed
    actor-pool stage is BIT-equal at any parallelism — the kmeans/PCA
    trust model; SQL cannot express the feature hash."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "quality_model.parquet")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if docs.num_rows > max_docs:
        return path
    from .functions.quality_model import quality_model_reference

    _write_atomic(quality_model_reference(docs), path)
    return path


def ensure_lm_expected(sf_dir: str, max_docs: int = 1000) -> str:
    """Expected (doc_id, n_tokens, logprob_ppb) from the single-process
    unigram-LM reference (lm.lm_reference): Counter train + per-doc scoring
    over the same tokenizer/hash/np.log/reduceat contract — bit-equal to the
    distributed lm_train+lm_score at any parallelism (kmeans/PCA trust
    model; SQL cannot express the hash or the log)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "lm_score.parquet")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if docs.num_rows > max_docs:
        return path
    from .functions.lm import lm_reference

    _write_atomic(lm_reference(docs), path)
    return path


def ensure_sb_expected(sf_dir: str, max_docs: int = 1000) -> str:
    """Expected (doc_id, n_tokens, sb_ppb) from the single-process Stupid
    Backoff reference (lm.sb_reference): independent Counter training +
    per-doc scoring through the shared elementwise log-score kernel —
    bit-equal to the distributed sb_train+sb_score at any parallelism
    (the lm_score trust model; SQL cannot express the hash or the log)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, "sb_score.parquet")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if docs.num_rows > max_docs:
        return path
    from .functions.lm import sb_reference

    _write_atomic(sb_reference(docs), path)
    return path


def ensure_hits_expected(info: CorpusInfo) -> str:
    """Expected (url, auth_ppb, hub_ppb) via the single-process
    :func:`~urlmap_ray.functions.graph.hits_reference` — the distributed
    path shares its per-bucket-partial summation fold, so the match is
    bit-exact at any actor count. Also writes the 3-iteration variant the
    registered page_hits_shuffle query reads (same rationale as the
    pagerank3 table: the shuffle mode pays per-iteration all-to-all job
    overhead at toy scale, so it is registered at 3 iterations while the
    mode-identity test pins broadcast≡shuffle per iteration)."""
    path = expected_path(info, "page_hits")
    path3 = expected_path(info, "page_hits3")
    if not (_should_generate(info, path) or _should_generate(info, path3)):
        return path
    from .extract import extract_links
    from .functions.graph import hits_reference

    tbl = _pages_table(info)
    urls = tbl.column("url").to_pylist()
    links_per_url = {
        url: (extract_links(url, html) if html is not None else [])
        for url, html in zip(urls, tbl.column("html").to_pylist())
    }
    _write_atomic(hits_reference(urls, links_per_url), path)
    _write_atomic(hits_reference(urls, links_per_url, n_iters=3), path3)
    return path


def ensure_components_expected(info: CorpusInfo) -> str:
    """Expected (url, comp) for weakly-connected components of the corpus
    link graph via a single-process union-find over the page_edges ground
    truth; comp = the component's minimum 63-bit url hash (the same pandas
    siphash the distributed url_components uses), singletons label
    themselves. Sorted by url."""
    path = expected_path(info, "page_components")
    if not _should_generate(info, path):
        return path
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    e_path, _, _ = ensure_graph_expected(info)
    edges = pq.read_table(e_path)
    urls = sorted(_pages_table(info).column("url").to_pylist())
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(edges.column("src").to_pylist(), edges.column("dst").to_pylist()):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    h = (
        pd.util.hash_array(np.asarray(urls, dtype=object)) >> np.uint64(1)
    ).astype(np.int64)
    hmap = dict(zip(urls, (int(v) for v in h)))
    comp_min: dict[str, int] = {}
    for u in urls:
        r = find(u)
        comp_min[r] = min(comp_min.get(r, hmap[u]), hmap[u])
    _write_atomic(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "comp": pa.array([comp_min[find(u)] for u in urls], pa.int64()),
            }
        ),
        path,
    )
    return path


def ensure_lpa_expected(info: CorpusInfo) -> str:
    """Expected (url, community) for deterministic synchronous label
    propagation over the corpus link graph via the single-process
    :func:`~urlmap_ray.functions.labelprop.label_propagation_reference`
    (same symmetric closure, same mode/tie-break kernel, no Ray — the
    pagerank/HITS trust model). Sorted by url."""
    path = expected_path(info, "page_communities")
    if not _should_generate(info, path):
        return path
    from .extract import extract_links
    from .functions.labelprop import label_propagation_reference

    tbl = _pages_table(info)
    urls = tbl.column("url").to_pylist()
    links_per_url = {
        url: (extract_links(url, html) if html is not None else [])
        for url, html in zip(urls, tbl.column("html").to_pylist())
    }
    _write_atomic(label_propagation_reference(urls, links_per_url), path)
    return path


def ensure_trustrank_expected(info: CorpusInfo, n_iters: int = 3) -> str:
    """Expected (url, rank_ppb) for TrustRank over the corpus link graph:
    the single-process :func:`~urlmap_ray.functions.graph.pagerank_reference`
    with the personalized teleport (seeds = every host's root page — the
    corpus's trusted-homepage set), 3 iterations like the pagerank_shuffle
    registration. Sorted by url."""
    from .corpus import page_url
    from .extract import extract_links
    from .functions.graph import pagerank_reference

    path = expected_path(info, f"trustrank{n_iters}")
    if not _should_generate(info, path):
        return path
    tbl = _pages_table(info)
    urls = tbl.column("url").to_pylist()
    links_per_url = {
        u: extract_links(u, h) if h is not None else []
        for u, h in zip(urls, tbl.column("html").to_pylist())
    }
    seeds = [page_url(h, 0) for h in range(info.n_hosts)]
    tr = pagerank_reference(urls, links_per_url, n_iters=n_iters, seed_urls=seeds)
    su = sorted(urls)
    _write_atomic(
        pa.table(
            {
                "url": pa.array(su, pa.string()),
                "rank_ppb": pa.array([tr[u] for u in su], pa.int64()),
            }
        ),
        path,
    )
    return path


def ensure_neighborhood_expected(info: CorpusInfo, radius: int = 3) -> str:
    """Expected (url, n_reach_est) from a SEQUENTIAL HyperANF pass over
    the page_edges ground truth: dense uint8[4096] registers per node,
    ``radius`` synchronous rounds of successor-register max, estimates
    via the SAME pinned vectorized run estimator the distributed fold
    uses (``sketch.hll_estimate_runs``) — register max is associative
    and the estimator's float order is pinned, so the distributed result
    must be bit-identical. Sorted by url."""
    import numpy as np

    from .functions.sketch import _HLL_M, _HLL_P, hash64_column, hll_estimate_runs

    path = expected_path(info, f"page_neighborhood{radius}")
    if not _should_generate(info, path):
        return path
    e_path, _, _ = ensure_graph_expected(info)
    edges = pq.read_table(e_path)
    urls = sorted(_pages_table(info).column("url").to_pylist())
    h = hash64_column(pa.array(urls, pa.string()))
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - _HLL_P)) - 1)
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.where(w > 0, (64 - _HLL_P) + 1 - exp, (64 - _HLL_P) + 1).astype(np.uint8)
    regs = {u: None for u in urls}
    for i, u in enumerate(urls):
        r = np.zeros(_HLL_M, np.uint8)
        r[idx[i]] = rho[i]
        regs[u] = r
    succ: dict[str, list[str]] = {}
    for s, d in zip(edges.column("src").to_pylist(), edges.column("dst").to_pylist()):
        succ.setdefault(s, []).append(d)
    for _ in range(radius):
        new = {}
        for u in urls:
            r = regs[u]
            for v in succ.get(u, ()):
                r = np.maximum(r, regs[v])
            new[u] = r
        regs = new
    all_rho, starts = [], []
    off = 0
    for u in urls:
        nz = np.flatnonzero(regs[u])  # ascending register order
        starts.append(off)
        all_rho.append(regs[u][nz].astype(np.int64))
        off += len(nz)
    ests = hll_estimate_runs(
        np.concatenate(all_rho) if all_rho else np.zeros(0, np.int64),
        np.asarray(starts, np.int64),
    )
    _write_atomic(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "n_reach_est": pa.array(ests, pa.int64()),
            }
        ),
        path,
    )
    return path


def ensure_kcore_expected(info: CorpusInfo, k: int = 3) -> str:
    """Expected (url, in_core) for the k-core of the undirected link
    graph via single-process synchronous peeling over the page_edges
    ground truth (drop all deg < k nodes each round, to fixpoint — the
    same peel order the distributed rounds follow). Sorted by url."""
    path = expected_path(info, f"page_kcore{k}")
    if not _should_generate(info, path):
        return path
    from collections import defaultdict

    import pyarrow.parquet as pq

    e_path, _, _ = ensure_graph_expected(info)
    edges = pq.read_table(e_path)
    nbr: dict[str, set] = defaultdict(set)
    for s, d in zip(edges.column("src").to_pylist(), edges.column("dst").to_pylist()):
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    nbr = dict(nbr)
    while True:
        drop = [u for u, vs in nbr.items() if len(vs) < k]
        if not drop:
            break
        for u in drop:
            for v in nbr[u]:
                nbr[v].discard(u)
            del nbr[u]
    urls = sorted(_pages_table(info).column("url").to_pylist())
    _write_atomic(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "in_core": pa.array([u in nbr for u in urls], pa.bool_()),
            }
        ),
        path,
    )
    return path


def ensure_kmeans_expected(sf_dir: str, *, k: int = 8, iters: int = 5,
                           max_rows: int = 10_000) -> str:
    """Expected (vec_id, cluster) labels from the single-process fixed-
    point Lloyd reference (clustering.kmeans_reference). The distributed
    path is exact integer arithmetic, so the oracle match is BIT-equality
    at any parallelism — no tolerance, no recall caveat. Gated to
    test-scale embedding tables like the other /tmp oracles."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, f"kmeans_k{k}i{iters}.parquet")
    if os.path.exists(path):
        return path
    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    if emb.num_rows > max_rows:
        return path
    from .functions.clustering import kmeans_reference

    _write_atomic(kmeans_reference(emb, k=k, iters=iters), path)
    return path


def ensure_pca_expected(sf_dir: str, *, k: int = 4, max_rows: int = 10_000) -> str:
    """Expected (vec_id, pc0..pc{k-1} ppb) from the single-process PCA
    reference (decomposition.pca_reference). Both paths share the exact
    integer-moment contract, so the match is BIT-equality at any
    parallelism — same trust model as the kmeans/hits expected tables."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, f"pca_k{k}.parquet")
    if os.path.exists(path):
        return path
    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    if emb.num_rows > max_rows:
        return path
    from .functions.decomposition import pca_reference

    _write_atomic(pca_reference(emb, k=k), path)
    return path


def ensure_lr_expected(
    sf_dir: str, *, iters: int = 5, max_rows: int = 10_000
) -> str:
    """Expected (doc_id, score_ppb, lr_pred) from the single-process
    logistic-regression training reference (lrtrain.lr_reference) with
    label = (lang == 'en'). The distributed path's gradients are exact
    integer sums of row-local quantized residuals, so the match is
    BIT-equality at any parallelism — the kmeans/PCA trust model."""
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/urlmap_oracle", name, f"lr_i{iters}.parquet")
    if os.path.exists(path):
        return path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    if docs.num_rows > max_rows:
        return path
    import pyarrow.compute as pc

    from .functions.lrtrain import lr_reference

    docs = docs.append_column(
        "label", pc.cast(pc.equal(docs.column("lang"), "en"), pa.int64())
    )
    _write_atomic(lr_reference(docs, iters=iters), path)
    return path


def ensure_link_stats_expected(info: CorpusInfo) -> str:
    """Expected one-row extraction-stats rollup (sum of per-page counters)."""
    path = expected_path(info, "page_link_stats")
    if not _should_generate(info, path):
        return path
    import pyarrow.compute as pc

    from .extract import STATS_FIELDS, extract_links_batch

    tbl = extract_links_batch(_pages_table(info), with_stats=True)
    _write_atomic(
        pa.table(
            {f"sum_{f}": pa.array([pc.sum(tbl.column(f)).as_py() or 0], pa.int64()) for f in STATS_FIELDS}
        ),
        path,
    )
    return path


def ensure_dust_expected(info: CorpusInfo) -> str:
    """Expected DUST rewrite rules over the injected alias families the
    dust_rules_mined query builds: pages with page number k (trailing
    /p<digits>, the corpus._page_keys rule) and k%3==0 also exist as
    'https://m-' || url[8:] (the host_mirrors injection), and k%7==0 as
    url || '?s=' || (k%5) — both carrying the page's exact text. Ground
    truth = mirrors.dust_reference (the single-process same-rule
    engine) at the query's min_support=20."""
    path = expected_path(info, "dust-rules")
    if not _should_generate(info, path):
        return path
    import pyarrow.dataset as pads

    from .corpus import _page_keys
    from .functions.mirrors import dust_reference

    t = pads.dataset(info.pages_path, format="parquet").to_table(
        columns=["url", "text"]
    )
    urls = t.column("url").to_pylist()
    texts = t.column("text").to_pylist()
    rows = list(zip(urls, texts))
    for u, x, k in zip(urls, texts, _page_keys(urls)):
        if k > 0 and k % 3 == 0:
            rows.append(("https://m-" + u[8:], x))
        if k > 0 and k % 7 == 0:
            rows.append((u + f"?s={k % 5}", x))
    ref = dust_reference(rows, min_support=20)
    _write_atomic(
        pa.table(
            {
                "rule_from": pa.array([r[0] for r in ref], pa.string()),
                "rule_to": pa.array([r[1] for r in ref], pa.string()),
                "n_pairs": pa.array([r[2] for r in ref], pa.int64()),
            }
        ),
        path,
    )
    return path


def ensure_bpe_expected(
    sf_dir: str, *, n_merges: int = 80, max_words: int = 10000, max_docs: int = 1000
) -> tuple[str, str]:
    """Expected BPE merge table + per-doc subword counts from a NAIVE
    single-process reference (full pair recount every round, per-word
    re-derivation at encode time) — deliberately a different algorithm
    from the engine's incremental-index trainer and memoized actor
    encoder, same pinned contract (see functions/bpe.py docstring). SQL
    cannot express the merge recursion; the kmeans/PCA trust model.

    Like every ensure_* here, generation is GATED to small corpora and
    silently returns the (unwritten) paths above ``max_docs`` — bench
    runs at sf ≥ 0.1 call this and must not pay for a reference; only
    the sf0.01 driver gate reads the files (module docstring, top)."""
    from collections import Counter

    name = os.path.basename(os.path.normpath(sf_dir))
    vocab_path = os.path.join("/tmp/urlmap_oracle", name, "bpe_vocab.parquet")
    tok_path = os.path.join("/tmp/urlmap_oracle", name, "bpe_tokens.parquet")
    if os.path.exists(vocab_path) and os.path.exists(tok_path):
        return vocab_path, tok_path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    if docs.num_rows > max_docs:
        return vocab_path, tok_path

    texts = docs.column("text").to_pylist()
    wc: Counter = Counter()
    for txt in texts:
        wc.update((txt or "").split())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]

    def scan_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == pair[0]
                and syms[i + 1] == pair[1]
            ):
                out.append(pair[0] + pair[1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    words = [(list(w) + ["</w>"], c) for w, c in top]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                counts[p] += c
        if not counts or max(counts.values()) < 2:
            break
        best_cnt = max(counts.values())
        best = min(p for p, c in counts.items() if c == best_cnt)
        merges.append((rank, best[0], best[1], best_cnt))
        words = [(scan_merge(syms, best), c) for syms, c in words]

    _write_atomic(
        pa.table(
            {
                "rank": pa.array([m[0] for m in merges], pa.int64()),
                "left": pa.array([m[1] for m in merges], pa.string()),
                "right": pa.array([m[2] for m in merges], pa.string()),
                "pair_count": pa.array([m[3] for m in merges], pa.int64()),
            }
        ),
        vocab_path,
    )

    ranks = {(l, r): k for k, l, r, _ in merges}

    def encode_len(word: str) -> int:
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            cands = [
                (ranks[p], p)
                for p in zip(syms, syms[1:])
                if p in ranks
            ]
            if not cands:
                break
            syms = scan_merge(syms, min(cands)[1])
        return len(syms)

    n_tok, n_words = [], []
    for txt in texts:
        ws = (txt or "").split()
        n_words.append(len(ws))
        n_tok.append(sum(encode_len(w) for w in ws))
    _write_atomic(
        pa.table(
            {
                "doc_id": docs.column("doc_id"),
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
            }
        ),
        tok_path,
    )
    return vocab_path, tok_path


def _host_pair_weights(info: CorpusInfo) -> list[tuple[str, str, int]]:
    """Weighted host-edge triples collapsed from the page-edge ground
    truth (pinned host seam ≡ functions/urlmine._HOST_RE, intra-host
    dropped) — the single-process mirror of functions/graph.host_graph."""
    import re
    from collections import Counter

    import pyarrow.dataset as pads

    e_path, _, _ = ensure_graph_expected(info)
    edges_tbl = pads.dataset(e_path, format="parquet").to_table()
    host_re = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")
    pair_w: Counter = Counter()
    for s, d in zip(
        edges_tbl.column("src").to_pylist(), edges_tbl.column("dst").to_pylist()
    ):
        ms, md = host_re.match(s), host_re.match(d)
        if ms and md and ms.group(1) != md.group(1):
            pair_w[(ms.group(1), md.group(1))] += 1
    return [(s, d, w) for (s, d), w in pair_w.items()]


def ensure_host_pagerank_expected(info: CorpusInfo) -> str:
    """Weighted host-PageRank ground truth: collapse the page-edge ground
    truth to the weighted host graph (same pinned host seam as
    functions/urlmine._HOST_RE, intra-host dropped), then
    :func:`~urlmap_ray.functions.graph.weighted_pagerank_reference` —
    same float path as both distributed regimes, no Ray."""
    from .functions.graph import weighted_pagerank_reference

    hp_path = expected_path(info, "host_pagerank")
    if not _should_generate(info, hp_path):
        return hp_path
    pr = weighted_pagerank_reference(_host_pair_weights(info))
    hosts = sorted(pr)
    _write_atomic(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "rank_ppb": pa.array([pr[h] for h in hosts], pa.int64()),
            }
        ),
        hp_path,
    )
    return hp_path


def ensure_host_trustrank_expected(info: CorpusInfo) -> str:
    """Seed-personalized weighted host-rank ground truth (3 iterations,
    seeds = the first ``min(4, n_hosts)`` host names — the same trusted
    list the spam-mass capstone uses)."""
    from .corpus import host_name
    from .functions.graph import weighted_pagerank_reference

    path = expected_path(info, "host_trustrank3")
    if not _should_generate(info, path):
        return path
    triples = _host_pair_weights(info)
    seeds = [host_name(h) for h in range(min(4, info.n_hosts))]
    tr = weighted_pagerank_reference(triples, n_iters=3, seed_urls=seeds)
    hosts = sorted(tr)
    _write_atomic(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "rank_ppb": pa.array([tr[h] for h in hosts], pa.int64()),
            }
        ),
        path,
    )
    return path


def ensure_host_spam_expected(info: CorpusInfo) -> str:
    """Host-level spam-mass ground truth: 3-iteration uniform and
    seed-personalized weighted host ranks (seeds = the first
    ``min(4, n_hosts)`` host names — the config-sized trusted list),
    combined by the pinned integer mass rule
    ``max(pr−tr,0)·10⁹ // pr`` (0 when pr == 0)."""
    from .corpus import host_name
    from .functions.graph import weighted_pagerank_reference

    path = expected_path(info, "host_spam")
    if not _should_generate(info, path):
        return path
    triples = _host_pair_weights(info)
    seeds = [host_name(h) for h in range(min(4, info.n_hosts))]
    pr = weighted_pagerank_reference(triples, n_iters=3)
    tr = weighted_pagerank_reference(triples, n_iters=3, seed_urls=seeds)
    hosts = sorted(pr)
    mass = [
        ((max(pr[h] - tr[h], 0) * 1_000_000_000) // pr[h]) if pr[h] > 0 else 0
        for h in hosts
    ]
    _write_atomic(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "spam_mass_ppb": pa.array(mass, pa.int64()),
            }
        ),
        path,
    )
    return path


def _graph_links(info: CorpusInfo):
    """(urls, links_per_url) via the pure extractor — shared by the
    SCC/bow-tie ground truths."""
    from .extract import extract_links

    tbl = _pages_table(info)
    urls = tbl.column("url").to_pylist()
    links_per_url = {
        url: (extract_links(url, html) if html is not None else [])
        for url, html in zip(urls, tbl.column("html").to_pylist())
    }
    return urls, links_per_url


def ensure_scc_expected(info: CorpusInfo) -> str:
    """SCC ground truth via the single-process iterative Tarjan
    (functions/scc.scc_reference — min-url representative)."""
    path = expected_path(info, "page_scc")
    if not _should_generate(info, path):
        return path
    from .functions.scc import scc_reference

    urls, links_per_url = _graph_links(info)
    comp = scc_reference(urls, links_per_url)
    su = sorted(urls)
    _write_atomic(
        pa.table(
            {
                "url": pa.array(su, pa.string()),
                "scc_rep": pa.array([comp[u] for u in su], pa.string()),
            }
        ),
        path,
    )
    return path


def ensure_bowtie_expected(info: CorpusInfo) -> str:
    """Bow-tie ground truth: Tarjan SCC + two sequential BFS sweeps
    (functions/scc.bowtie_reference)."""
    path = expected_path(info, "page_bowtie")
    if not _should_generate(info, path):
        return path
    from .functions.scc import bowtie_reference

    urls, links_per_url = _graph_links(info)
    reg = bowtie_reference(urls, links_per_url)
    su = sorted(urls)
    _write_atomic(
        pa.table(
            {
                "url": pa.array(su, pa.string()),
                "region": pa.array([reg[u] for u in su], pa.string()),
            }
        ),
        path,
    )
    return path
