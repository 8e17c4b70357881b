"""Web-graph analytics (functions/graph.py): edges, degrees, PageRank.

Ground truth is the pure extractor applied single-process; PageRank's two
distributed modes must agree bit-for-bit with each other and with the
single-process pagerank_reference (the deterministic-summation contract
in the module docstring).
"""

from __future__ import annotations

from collections import Counter

import pyarrow.dataset as pads
import pytest

from urlmap_ray.corpus import generate_corpus
from urlmap_ray.extract import extract_links
from urlmap_ray.functions.graph import (
    build_edges,
    degrees,
    pagerank,
    pagerank_reference,
)

N_PAGES = 200


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("graphcorpus")
    return generate_corpus(str(out), N_PAGES)


@pytest.fixture(scope="module")
def pages_tbl(corpus):
    return pads.dataset(corpus.pages_path, format="parquet").to_table(
        columns=["url", "html"]
    )


@pytest.fixture(scope="module")
def truth(pages_tbl):
    urls = pages_tbl.column("url").to_pylist()
    node_set = set(urls)
    links = {
        u: (extract_links(u, h) if h is not None else [])
        for u, h in zip(urls, pages_tbl.column("html").to_pylist())
    }
    edges = sorted(
        {(u, l) for u, ls in links.items() for l in ls if l in node_set and l != u}
    )
    return urls, links, edges


def _pages_ds(corpus):
    import ray.data

    return ray.data.read_parquet(corpus.pages_path, columns=["url", "html"])


def test_build_edges_matches_pure(ray_session, corpus, truth):
    urls, _, edges = truth
    got = sorted(
        (r["src"], r["dst"]) for r in build_edges(_pages_ds(corpus), urls).take_all()
    )
    assert got == edges
    assert len(got) > N_PAGES  # corpus pages interlink


def test_degrees_match_counter(ray_session, corpus, truth):
    urls, _, edges = truth
    out_c, in_c = Counter(e[0] for e in edges), Counter(e[1] for e in edges)
    rows = degrees(_pages_ds(corpus), urls).take_all()
    assert len(rows) == len(urls)  # isolated pages keep (0, 0) rows
    for r in rows:
        assert r["out_deg"] == out_c.get(r["url"], 0), r["url"]
        assert r["in_deg"] == in_c.get(r["url"], 0), r["url"]


def test_pagerank_broadcast_matches_reference(ray_session, corpus, truth):
    urls, links, _ = truth
    expected = pagerank_reference(urls, links)
    tbl = pagerank(_pages_ds(corpus), urls, mode="broadcast")
    got = dict(zip(tbl.column("url").to_pylist(), tbl.column("rank_ppb").to_pylist()))
    assert got == expected  # bit-identical floats → equal quantized ranks
    assert all(v > 0 for v in got.values())
    assert sum(got.values()) <= 1_000_000_000  # dangling mass dropped, never added


def test_pagerank_shuffle_mode_identical(ray_session, corpus, truth):
    urls, links, _ = truth
    b = pagerank(_pages_ds(corpus), urls, mode="broadcast", n_iters=3, n_buckets=7)
    s = pagerank(_pages_ds(corpus), urls, mode="shuffle", n_iters=3, n_buckets=7)
    got_b = dict(zip(b.column("url").to_pylist(), b.column("rank_ppb").to_pylist()))
    got_s = {r["url"]: r["rank_ppb"] for r in s.take_all()}
    assert got_s == got_b
    assert got_b == pagerank_reference(urls, links, n_iters=3)


def test_hits_matches_reference_any_actor_count(ray_session, corpus, truth):
    """Distributed HITS must be bit-identical to the single-process
    reference at 1 actor AND at several actors (the per-bucket hub
    partial fold is what makes actor count irrelevant)."""
    from urlmap_ray.functions.graph import hits, hits_reference

    urls, links, _ = truth
    exp = hits_reference(urls, links)
    for n_actors in (1, 3):
        got = hits(_pages_ds(corpus), urls, n_actors=n_actors)
        assert got.equals(exp), f"mismatch at n_actors={n_actors}"
    # sanity: scores are L1-normalized (ppb sums ≈ 1e9) and non-trivial
    import numpy as np

    assert abs(sum(exp.column("auth_ppb").to_pylist()) - 1_000_000_000) < 1000
    assert abs(sum(exp.column("hub_ppb").to_pylist()) - 1_000_000_000) < 1000
    assert np.count_nonzero(exp.column("auth_ppb").to_numpy()) > N_PAGES // 2


def test_pagerank_rejects_bad_mode(ray_session, corpus, truth):
    urls, _, _ = truth
    with pytest.raises(ValueError):
        pagerank(_pages_ds(corpus), urls, mode="banana")


def test_anchor_text_index_counts_and_tiebreak(ray_session):
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.graph import anchor_text_index

    pairs = pa.table(
        {
            "src": pa.array([f"https://h.test/{i}" for i in range(7)]),
            "dst": pa.array(["t"] * 5 + ["u"] * 2),
            "anchor": pa.array(["beta", "alpha", "beta", "alpha", "gamma", "x", "x"]),
        }
    )
    out = {
        r["dst"]: r
        for r in anchor_text_index(
            ray.data.from_arrow(pairs).repartition(4)
        ).take_all()
    }
    t = out["t"]
    assert t["n_refs"] == 5 and t["n_unique_anchors"] == 3
    # alpha and beta both appear twice → lexicographic tie-break
    assert t["top_anchor"] == "alpha" and t["top_anchor_count"] == 2
    u = out["u"]
    assert u["n_refs"] == 2 and u["n_unique_anchors"] == 1
    assert u["top_anchor"] == "x" and u["top_anchor_count"] == 2
