"""Web-graph analytics (functions/graph.py): edges, degrees, PageRank, HITS.

Ground truth is the pure extractor applied single-process; PageRank's and
HITS' two distributed modes must agree bit-for-bit with each other and
with the single-process references (the deterministic-summation contract
in the module docstring).

The node set enters every entry point as a DATASET — these tests also pin
the handshake: the driver holds an ObjectRef (broadcast regime) or
O(blocks) integers (shuffle regime's node_index), never the url column.
"""

from __future__ import annotations

import inspect
from collections import Counter

import pyarrow.dataset as pads
import pytest

from urlmap_ray.corpus import generate_corpus
from urlmap_ray.extract import extract_links
from urlmap_ray.functions.graph import (
    build_edges,
    degrees,
    node_index,
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


def _nodes_ds(corpus):
    # the node-set handshake: a column-pruned Dataset, never a list
    import ray.data

    return ray.data.read_parquet(corpus.pages_path, columns=["url"])


def test_build_edges_matches_pure_both_regimes(ray_session, corpus, truth):
    _, _, edges = truth
    for membership in ("broadcast", "shuffle"):
        got = sorted(
            (r["src"], r["dst"])
            for r in build_edges(
                _pages_ds(corpus), _nodes_ds(corpus), membership=membership
            ).take_all()
        )
        assert got == edges, f"membership={membership}"
    assert len(edges) > N_PAGES  # corpus pages interlink


def test_degrees_match_counter_both_regimes(ray_session, corpus, truth):
    urls, _, edges = truth
    out_c, in_c = Counter(e[0] for e in edges), Counter(e[1] for e in edges)
    for membership in ("broadcast", "shuffle"):
        rows = degrees(
            _pages_ds(corpus), _nodes_ds(corpus), membership=membership
        ).take_all()
        assert len(rows) == len(urls)  # isolated pages keep (0, 0) rows
        for r in rows:
            assert r["out_deg"] == out_c.get(r["url"], 0), (membership, r["url"])
            assert r["in_deg"] == in_c.get(r["url"], 0), (membership, r["url"])


def test_node_index_is_sorted_rank(ray_session, corpus, truth):
    urls, _, _ = truth
    index_ds, n = node_index(_nodes_ds(corpus))
    assert n == len(urls)
    rows = index_ds.take_all()
    expect = {u: i for i, u in enumerate(sorted(urls))}
    assert {r["url"]: r["node_id"] for r in rows} == expect


def test_pagerank_broadcast_matches_reference(ray_session, corpus, truth):
    urls, links, _ = truth
    expected = pagerank_reference(urls, links)
    rows = pagerank(_pages_ds(corpus), _nodes_ds(corpus), mode="broadcast").take_all()
    got = {r["url"]: r["rank_ppb"] for r in rows}
    assert got == expected  # bit-identical floats → equal quantized ranks
    assert all(v > 0 for v in got.values())
    assert sum(got.values()) <= 1_000_000_000  # dangling mass dropped, never added


def test_pagerank_shuffle_mode_identical(ray_session, corpus, truth):
    urls, links, _ = truth
    b = pagerank(
        _pages_ds(corpus), _nodes_ds(corpus), mode="broadcast", n_iters=3, n_buckets=7
    )
    s = pagerank(
        _pages_ds(corpus), _nodes_ds(corpus), mode="shuffle", n_iters=3, n_buckets=7
    )
    got_b = {r["url"]: r["rank_ppb"] for r in b.take_all()}
    got_s = {r["url"]: r["rank_ppb"] for r in s.take_all()}
    assert got_s == got_b
    assert got_b == pagerank_reference(urls, links, n_iters=3)


def test_trustrank_modes_identical_and_match_reference(ray_session, corpus, truth):
    # personalized teleport (TrustRank): both modes bit-identical to the
    # seeded reference; non-seed-reachable nodes get zero mass
    urls, links, _ = truth
    seeds = sorted(urls)[:3]
    b = pagerank(
        _pages_ds(corpus),
        _nodes_ds(corpus),
        mode="broadcast",
        n_iters=3,
        n_buckets=7,
        seed_urls=seeds,
    )
    s = pagerank(
        _pages_ds(corpus),
        _nodes_ds(corpus),
        mode="shuffle",
        n_iters=3,
        n_buckets=7,
        seed_urls=seeds,
    )
    got_b = {r["url"]: r["rank_ppb"] for r in b.take_all()}
    got_s = {r["url"]: r["rank_ppb"] for r in s.take_all()}
    exp = pagerank_reference(urls, links, n_iters=3, seed_urls=seeds)
    assert got_s == got_b
    assert got_b == exp
    # teleport mass is concentrated: seeds hold rank, total ≤ 1e9
    assert all(exp[u] > 0 for u in seeds)
    assert sum(exp.values()) <= 1_000_000_000
    # uniform path unchanged by the refactor (pinned one-division floats)
    assert pagerank_reference(urls, links, n_iters=3) == {
        r["url"]: r["rank_ppb"]
        for r in pagerank(
            _pages_ds(corpus), _nodes_ds(corpus), mode="broadcast", n_iters=3
        ).take_all()
    }
    import pytest

    with pytest.raises(ValueError):
        pagerank_reference(urls, links, seed_urls=["https://nope.example/x"])


def test_hits_matches_reference_any_actor_count(ray_session, corpus, truth):
    """Distributed HITS must be bit-identical to the single-process
    reference at 1 actor AND at several actors (the per-bucket hub
    partial fold is what makes actor count irrelevant)."""
    from urlmap_ray.functions.graph import hits, hits_reference

    urls, links, _ = truth
    exp = hits_reference(urls, links)
    exp_rows = {
        u: (a, h)
        for u, a, h in zip(
            exp.column("url").to_pylist(),
            exp.column("auth_ppb").to_pylist(),
            exp.column("hub_ppb").to_pylist(),
        )
    }
    for n_actors in (1, 3):
        rows = hits(_pages_ds(corpus), _nodes_ds(corpus), n_actors=n_actors).take_all()
        got = {r["url"]: (r["auth_ppb"], r["hub_ppb"]) for r in rows}
        assert got == exp_rows, f"mismatch at n_actors={n_actors}"
    # sanity: scores are L1-normalized (ppb sums ≈ 1e9) and non-trivial
    import numpy as np

    assert abs(sum(exp.column("auth_ppb").to_pylist()) - 1_000_000_000) < 1000
    assert abs(sum(exp.column("hub_ppb").to_pylist()) - 1_000_000_000) < 1000
    assert np.count_nonzero(exp.column("auth_ppb").to_numpy()) > N_PAGES // 2


def test_hits_shuffle_mode_identical(ray_session, corpus, truth):
    """The fully-distributed HITS (scores stay Datasets, four bucketed
    exchanges/iteration) must be bit-identical to broadcast mode at the
    same bucketing — the marker-row L1 fold reproduces _l1_total exactly."""
    from urlmap_ray.functions.graph import hits

    b = hits(
        _pages_ds(corpus), _nodes_ds(corpus), mode="broadcast", n_iters=3, n_buckets=7
    )
    s = hits(
        _pages_ds(corpus), _nodes_ds(corpus), mode="shuffle", n_iters=3, n_buckets=7
    )
    got_b = {r["url"]: (r["auth_ppb"], r["hub_ppb"]) for r in b.take_all()}
    got_s = {r["url"]: (r["auth_ppb"], r["hub_ppb"]) for r in s.take_all()}
    assert got_s == got_b
    assert any(a > 0 for a, _ in got_b.values())


def test_driver_never_materializes_url_column(ray_session, corpus):
    """The node-set handshake contract (VERDICT r3 #1): no entry point
    takes a url list, the broadcast regime leaves the driver holding an
    ObjectRef (the strings live in the object store), and the entry
    module's _graph_inputs builds Datasets, not pylists."""
    import ray

    from urlmap_ray.functions import graph as gr

    # 1) no list[str] node argument anywhere in the public surface
    for fn in (gr.build_edges, gr.degrees, gr.pagerank, gr.hits, gr.node_index):
        params = inspect.signature(fn).parameters
        assert "node_urls" not in params, fn.__name__
    # 2) broadcast handshake: driver holds a ref, not the array
    ref = gr._sorted_urls_ref(_nodes_ds(corpus))
    assert isinstance(ref, ray.ObjectRef)
    # 3) the registered queries' input builder has no driver-side pylist
    import __ray_entry__ as entry

    src = inspect.getsource(entry)
    start = src.index("def _graph_inputs")
    graph_inputs_src = src[start : src.index("def page_edges")]
    assert "to_pylist" not in graph_inputs_src
    assert "read_parquet" in graph_inputs_src


def test_pagerank_rejects_bad_mode(ray_session, corpus, truth):
    with pytest.raises(ValueError):
        pagerank(_pages_ds(corpus), _nodes_ds(corpus), mode="banana")


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


def test_triangle_counts_known_graph(ray_session):
    # K4 on a,b,c,d (4 triangles, each node in 3, deg 3 → C=1) plus a
    # pendant e–a (deg(a)=4, C(a)=3/6) and an isolated node f
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.graph import triangle_counts

    urls = [f"https://x.org/{c}" for c in "abcdef"]
    a, b, c, d, e, f = urls
    und = [(a, b), (a, c), (a, d), (b, c), (b, d), (c, d), (e, a)]
    # feed as a fake "pages" edge set: build pages html with hrefs
    links = {u: [] for u in urls}
    for s, t in und:
        links[s].append(t)  # one direction is enough — undirect dedups
    links[b].append(a)  # and a reverse duplicate must not double-count

    def html(u):
        return "<html><body>" + "".join(
            f'<a href="{t}">x</a>' for t in links[u]
        ) + "</body></html>"

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array([html(u).encode() for u in urls], pa.binary()),
            }
        )
    )
    nodes = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    for buckets in (1, 7):
        out = {
            r["url"]: (r["n_tri"], r["deg"], r["clustering_ppb"])
            for r in triangle_counts(pages, nodes, n_buckets=buckets).take_all()
        }
        assert out[a] == (3, 4, (2 * 3 * 10**9) // (4 * 3))
        for u in (b, c, d):
            assert out[u] == (3, 3, 10**9)
        assert out[e] == (0, 1, 0)
        assert out[f] == (0, 0, 0)


def test_edge_jaccard_known_graph(ray_session):
    # same K4 + pendant graph as the triangle test: per-edge common
    # neighbors are the triangles through the edge, jaccard over
    # |N(a)∪N(b)| = deg_a + deg_b − common
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.graph import edge_jaccard

    urls = [f"https://x.org/{c}" for c in "abcdef"]
    a, b, c, d, e, f = urls
    und = [(a, b), (a, c), (a, d), (b, c), (b, d), (c, d), (e, a)]
    links = {u: [] for u in urls}
    for s, t in und:
        links[s].append(t)
    links[b].append(a)  # reverse duplicate must not double-count

    def html(u):
        return "<html><body>" + "".join(
            f'<a href="{t}">x</a>' for t in links[u]
        ) + "</body></html>"

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array([html(u).encode() for u in urls], pa.binary()),
            }
        )
    )
    nodes = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))

    # brute-force reference over undirected neighbor sets
    nbr = {u: set() for u in urls}
    for s, t in und:
        nbr[s].add(t)
        nbr[t].add(s)
    want = {}
    for s, t in und:
        lo, hi = min(s, t), max(s, t)
        common = len(nbr[lo] & nbr[hi])
        da, db = len(nbr[lo]), len(nbr[hi])
        denom = da + db - common
        want[(lo, hi)] = (common, da, db, (common * 10**9) // denom if denom else 0)

    for buckets in (1, 7):
        rows = edge_jaccard(pages, nodes, n_buckets=buckets).take_all()
        got = {
            (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"], r["jaccard_ppb"])
            for r in rows
        }
        assert got == want
    # spot-check hand values: K4 edge (a,b) shares {c,d}
    assert want[(a, b)] == (2, 4, 3, (2 * 10**9) // 5)
    assert want[(b, c)] == (2, 3, 3, (2 * 10**9) // 4)
    assert want[(a, e)] == (0, 4, 1, 0)


def test_neighborhood_sizes_hyperanf(ray_session):
    # directed path a→b→c→d plus a cycle e→f→e: radius-2 out-reach is
    # a:{a,b,c} b:{b,c,d} c:{c,d} d:{d} e:{e,f} f:{e,f}; the distributed
    # rounds must land bit-identically on the dense sequential reference
    import numpy as np
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.graph import neighborhood_sizes
    from urlmap_ray.functions.sketch import (
        _HLL_M,
        _HLL_P,
        hash64_column,
        hll_estimate_runs,
    )

    urls = [f"https://n.org/{c}" for c in "abcdef"]
    a, b, c, d, e, f = urls
    direct = [(a, b), (b, c), (c, d), (e, f), (f, e)]
    links = {u: [] for u in urls}
    for s, t in direct:
        links[s].append(t)

    def html(u):
        return "<html><body>" + "".join(
            f'<a href="{t}">x</a>' for t in links[u]
        ) + "</body></html>"

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array([html(u).encode() for u in urls], pa.binary()),
            }
        )
    )
    nodes = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))

    # dense sequential HyperANF reference (same primitives, same rounds)
    h = hash64_column(pa.array(urls, pa.string()))
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - _HLL_P)) - 1)
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.where(w > 0, (64 - _HLL_P) + 1 - exp, (64 - _HLL_P) + 1).astype(np.uint8)
    regs = {}
    for i, u in enumerate(urls):
        r = np.zeros(_HLL_M, np.uint8)
        r[idx[i]] = rho[i]
        regs[u] = r
    for _ in range(2):
        regs = {
            u: np.maximum.reduce([regs[u]] + [regs[v] for v in links[u]])
            for u in urls
        }
    want = {}
    for u in urls:
        nz = np.flatnonzero(regs[u])
        want[u] = int(
            hll_estimate_runs(regs[u][nz].astype(np.int64), np.array([0]))[0]
        )

    exact = {a: 3, b: 3, c: 2, d: 1, e: 2, f: 2}
    for buckets in (1, 7):
        got = {
            r["url"]: r["n_reach_est"]
            for r in neighborhood_sizes(
                pages, nodes, radius=2, n_buckets=buckets
            ).take_all()
        }
        assert got == want
        for u in urls:  # linear-counting regime: within ±1 of exact
            assert abs(got[u] - exact[u]) <= 1


# ---------------------------------------------------------------------------
# multi-source BFS distances / k-core


def _bfs_reference(edges, seeds, radius=None):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {u: 0 for u in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if radius is not None and dist[u] >= radius:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _kcore_reference(edges, k):
    from collections import defaultdict

    nbr = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    nbr = dict(nbr)
    while True:
        drop = [u for u, vs in nbr.items() if len(vs) < k]
        if not drop:
            return set(nbr)
        for u in drop:
            for v in nbr[u]:
                nbr[v].discard(u)
            del nbr[u]


def test_bfs_distances_matches_reference_both_modes(ray_session, corpus, truth):
    from urlmap_ray.functions.graph import bfs_distances

    urls, _, edges = truth
    seed = sorted(urls)[0]
    exp = _bfs_reference(edges, [seed], radius=3)
    for mode in ("broadcast", "shuffle"):
        got = {
            r["url"]: r["dist"]
            for r in bfs_distances(
                _pages_ds(corpus), _nodes_ds(corpus), [seed], radius=3, mode=mode
            ).take_all()
        }
        assert got == exp, f"mode={mode}"


def test_bfs_distances_fixpoint_multisource(ray_session, corpus, truth):
    from urlmap_ray.functions.graph import bfs_distances

    urls, _, edges = truth
    seeds = sorted(urls)[:2]
    exp = _bfs_reference(edges, seeds, radius=None)
    got = {
        r["url"]: r["dist"]
        for r in bfs_distances(
            _pages_ds(corpus), _nodes_ds(corpus), seeds, radius=None
        ).take_all()
    }
    assert got == exp


def test_kcore_matches_peel_both_modes(ray_session, corpus, truth):
    from urlmap_ray.functions.graph import kcore

    urls, _, edges = truth
    for k in (2, 3):
        core = _kcore_reference(edges, k)
        for mode in ("broadcast", "shuffle"):
            rows = kcore(
                _pages_ds(corpus), _nodes_ds(corpus), k=k, mode=mode
            ).take_all()
            assert len(rows) == len(urls), f"k={k} mode={mode}"
            got = {r["url"] for r in rows if r["in_core"]}
            assert got == core, f"k={k} mode={mode}"


def test_mode_per_dst_kernel():
    """Max count wins; ties break to the smallest label; unsorted and
    duplicated input rows are handled."""
    import numpy as np

    from urlmap_ray.functions.labelprop import _mode_per_dst

    dst = np.array([2, 0, 0, 0, 2, 1, 2, 2], dtype=np.int64)
    lab = np.array([9, 5, 4, 5, 9, 7, 3, 3], dtype=np.int64)
    d, m = _mode_per_dst(dst, lab)
    assert d.tolist() == [0, 1, 2]
    # dst 0: 5×2 beats 4×1 → 5; dst 1: only 7; dst 2: 9×2 ties 3×2 → 3
    assert m.tolist() == [5, 7, 3]
    d, m = _mode_per_dst(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(d) == 0 and len(m) == 0


def test_lpa_modes_identical_and_match_reference(ray_session, corpus, truth):
    """Broadcast ≡ shuffle ≡ the single-process reference — integer
    counts + pinned min-label ties make LPA partition-independent."""
    from urlmap_ray.functions.labelprop import (
        label_propagation,
        label_propagation_reference,
    )

    urls, links, _ = truth
    b = label_propagation(
        _pages_ds(corpus), _nodes_ds(corpus), mode="broadcast", n_iters=3, n_buckets=7
    )
    s = label_propagation(
        _pages_ds(corpus), _nodes_ds(corpus), mode="shuffle", n_iters=3, n_buckets=7
    )
    got_b = {r["url"]: r["community"] for r in b.take_all()}
    got_s = {r["url"]: r["community"] for r in s.take_all()}
    assert got_s == got_b
    ref = label_propagation_reference(urls, links, n_iters=3)
    assert got_b == dict(
        zip(ref.column("url").to_pylist(), ref.column("community").to_pylist())
    )
    # sanity: propagation actually groups pages (fewer labels than nodes)
    assert len(set(got_b.values())) < len(got_b)


def test_host_graph_matches_pure_both_regimes(ray_session, corpus, truth):
    """host_graph == the pure per-edge host collapse (intra-host dropped,
    weight = page-edge multiplicity), in both membership regimes."""
    import re
    from collections import Counter

    from urlmap_ray.functions.graph import host_graph

    _, _, edges = truth
    host_re = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")

    def host(u):
        m = host_re.match(u)
        return m.group(1) if m else None

    want = Counter()
    for s, d in edges:
        hs, hd = host(s), host(d)
        if hs and hd and hs != hd:
            want[(hs, hd)] += 1

    for regime in ("broadcast", "shuffle"):
        got = {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in host_graph(
                _pages_ds(corpus), _nodes_ds(corpus), membership=regime
            ).take_all()
        }
        assert got == dict(want), regime


def test_host_degrees_matches_pure(ray_session, corpus, truth):
    """host_degrees sums the host-graph rows per endpoint: distinct
    neighbor hosts + weight mass, zero-free (only hosts with edges)."""
    import re
    from collections import Counter

    from urlmap_ray.functions.graph import host_degrees, host_graph

    _, _, edges = truth
    host_re = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")
    pair_w = Counter()
    for s, d in edges:
        hs = host_re.match(s).group(1)
        hd = host_re.match(d).group(1)
        if hs != hd:
            pair_w[(hs, hd)] += 1
    want = {}
    for (hs, hd), w in pair_w.items():
        o = want.setdefault(hs, [0, 0, 0, 0])
        o[0] += 1
        o[2] += w
        i = want.setdefault(hd, [0, 0, 0, 0])
        i[1] += 1
        i[3] += w

    rows = host_degrees(host_graph(_pages_ds(corpus), _nodes_ds(corpus))).take_all()
    got = {
        r["host"]: [r["out_hosts"], r["in_hosts"], r["out_weight"], r["in_weight"]]
        for r in rows
    }
    assert got == want


def test_weighted_pagerank_modes_identical_and_match_reference(
    ray_session, corpus, truth
):
    """weighted_pagerank over the host graph: broadcast and shuffle are
    bit-identical to each other and to weighted_pagerank_reference."""
    import re
    from collections import Counter

    from urlmap_ray.functions.graph import (
        host_graph,
        weighted_pagerank,
        weighted_pagerank_reference,
    )

    _, _, edges = truth
    host_re = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")
    pair_w = Counter()
    for s, d in edges:
        hs = host_re.match(s).group(1)
        hd = host_re.match(d).group(1)
        if hs != hd:
            pair_w[(hs, hd)] += 1
    want = weighted_pagerank_reference(
        [(s, d, w) for (s, d), w in pair_w.items()], n_iters=4
    )

    hg = host_graph(_pages_ds(corpus), _nodes_ds(corpus))
    results = {}
    for mode in ("broadcast", "shuffle"):
        rows = weighted_pagerank(hg, n_iters=4, mode=mode).take_all()
        results[mode] = {r["url"]: r["rank_ppb"] for r in rows}
        assert results[mode] == want, mode
    assert results["broadcast"] == results["shuffle"]
    # centrality is a probability vector: ppb mass sums to ~1e9
    assert abs(sum(want.values()) - 1_000_000_000) < len(want) + 1000


def test_spam_mass_integer_rule(ray_session):
    """spam_mass: max(pr−tr,0)·10⁹//pr, 0 when pr=0 — clamp and floor
    pinned; join is inner on url."""
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.graph import spam_mass

    pr = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c", "d"]),
                "rank_ppb": pa.array([1000, 300, 0, 7], pa.int64()),
            }
        )
    )
    tr = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c", "d"]),
                "rank_ppb": pa.array([250, 900, 5, 3], pa.int64()),
            }
        )
    )
    got = {r["url"]: r["spam_mass_ppb"] for r in spam_mass(pr, tr).take_all()}
    assert got == {
        "a": (750 * 10**9) // 1000,
        "b": 0,  # tr > pr clamps to 0
        "c": 0,  # pr == 0 guard
        "d": (4 * 10**9) // 7,  # floor division
    }


def test_weighted_pagerank_seeded_modes_identical(ray_session, corpus, truth):
    """Seed-personalized weighted pagerank (host TrustRank): both modes
    bit-identical to the seeded reference; rejects missing seeds."""
    import re
    from collections import Counter

    from urlmap_ray.functions.graph import (
        host_graph,
        weighted_pagerank,
        weighted_pagerank_reference,
    )

    _, _, edges = truth
    host_re = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")
    pair_w = Counter()
    for s, d in edges:
        hs = host_re.match(s).group(1)
        hd = host_re.match(d).group(1)
        if hs != hd:
            pair_w[(hs, hd)] += 1
    triples = [(s, d, w) for (s, d), w in pair_w.items()]
    hosts = sorted({h for t in triples for h in t[:2]})
    seeds = hosts[:2]
    want = weighted_pagerank_reference(triples, n_iters=3, seed_urls=seeds)

    hg = host_graph(_pages_ds(corpus), _nodes_ds(corpus))
    for mode in ("broadcast", "shuffle"):
        rows = weighted_pagerank(hg, n_iters=3, mode=mode, seed_urls=seeds).take_all()
        assert {r["url"]: r["rank_ppb"] for r in rows} == want, mode

    with pytest.raises(Exception, match="seed_urls"):
        weighted_pagerank(hg, n_iters=1, seed_urls=["no-such-host"]).take_all()


def test_weighted_spam_mass_matches_composition(ray_session, corpus, truth):
    """weighted_spam_mass (shared-prep fast path) is bit-identical in
    both regimes to composing weighted_pagerank ×2 + spam_mass."""
    import re
    from collections import Counter

    from urlmap_ray.functions.graph import (
        host_graph,
        spam_mass,
        weighted_pagerank,
        weighted_spam_mass,
    )

    _, _, edges = truth
    host_re = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")
    hosts = sorted(
        {
            host_re.match(u).group(1)
            for e in edges
            for u in e
        }
    )
    seeds = hosts[:2]
    hg = host_graph(_pages_ds(corpus), _nodes_ds(corpus)).materialize()
    pr = weighted_pagerank(hg, n_iters=3)
    tr = weighted_pagerank(hg, n_iters=3, seed_urls=seeds)
    want = {r["url"]: r["spam_mass_ppb"] for r in spam_mass(pr, tr).take_all()}
    assert any(v > 0 for v in want.values())  # non-vacuous: spam exists
    for mode in ("broadcast", "shuffle"):
        rows = weighted_spam_mass(hg, seed_urls=seeds, n_iters=3, mode=mode).take_all()
        assert {r["url"]: r["spam_mass_ppb"] for r in rows} == want, mode


def test_random_walks_match_sequential_replay(ray_session):
    import hashlib

    import numpy as np
    import ray.data

    from urlmap_ray.functions.graph import random_walks

    import pyarrow as pa

    rng = np.random.default_rng(5)
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = sorted(
        {(nodes[rng.integers(40)], nodes[rng.integers(40)]) for _ in range(120)}
    )
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)

    def ref_walk(w, length=3):
        cur, path = w, w
        for t in range(length):
            nb = sorted(adj.get(cur, ()))
            if not nb:
                break  # dead end terminates (pinned)
            h = int(hashlib.md5(f"{w}|{t}|{cur}".encode()).hexdigest()[:15], 16)
            cur = nb[h % len(nb)]
            path += " " + cur
        return path

    want = sorted((w, ref_walk(w)) for w in nodes)
    e_tbl = pa.table(
        {"src": [s for s, _ in edges], "dst": [d for _, d in edges]}
    )
    n_tbl = pa.table({"url": nodes})
    for parts in (1, 4):
        out = random_walks(
            ray.data.from_arrow(e_tbl).repartition(parts),
            ray.data.from_arrow(n_tbl).repartition(parts),
            length=3,
        ).take_all()
        # bit-identical to the sequential replay at any parallelism:
        # the md5 step rule depends only on (walk, step, node)
        assert sorted((r["start"], r["path"]) for r in out) == want


def test_random_walks_dead_end_and_self_loop(ray_session):
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.graph import random_walks

    # a -> b (only edge), b is a dead end, c -> c self-loop
    e_tbl = pa.table({"src": ["a", "c"], "dst": ["b", "c"]})
    n_tbl = pa.table({"url": ["a", "b", "c"]})
    out = {
        r["start"]: r["path"]
        for r in random_walks(
            ray.data.from_arrow(e_tbl), ray.data.from_arrow(n_tbl), length=2
        ).take_all()
    }
    assert out == {"a": "a b", "b": "b", "c": "c c c"}


def test_random_walks_modes_identical(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.graph import random_walks

    rng = np.random.default_rng(13)
    nodes = [f"m{i:02d}" for i in range(25)]
    edges = sorted(
        {(nodes[rng.integers(25)], nodes[rng.integers(25)]) for _ in range(70)}
    )
    e_tbl = pa.table({"src": [s for s, _ in edges], "dst": [d for _, d in edges]})
    n_tbl = pa.table({"url": nodes})
    outs = []
    for mode in ("broadcast", "shuffle"):
        rows = random_walks(
            ray.data.from_arrow(e_tbl).repartition(3),
            ray.data.from_arrow(n_tbl).repartition(2),
            length=4,
            mode=mode,
        ).take_all()
        outs.append(sorted((r["start"], r["path"]) for r in rows))
    # the step rule depends only on (walk, step, node): regimes agree
    # bit for bit
    assert outs[0] == outs[1]


def test_host_cocitation_counts_and_cap(ray_session, monkeypatch):
    import pyarrow as pa
    import ray.data

    import urlmap_ray.functions.graph as G

    edges = pa.table(
        {
            "src": [
                "https://s1.x/a",
                "https://s1.x/a",
                "https://s1.x/a",
                "https://s2.x/b",
                "https://s2.x/b",
                "https://s3.x/c",
                "https://s3.x/c",
            ],
            "dst": [
                "https://h1.x/",
                "https://h2.x/",
                "https://h3.x/",
                "https://h1.x/p",
                "https://h2.x/q",
                "https://h1.x/",
                "https://h2.x/other",
            ],
        }
    )
    monkeypatch.setattr(G, "build_edges", lambda p, n, **kw: p)
    for parts in (1, 3):
        out = G.host_cocitation(
            ray.data.from_arrow(edges).repartition(parts), None, min_count=2
        ).take_all()
        got = sorted((r["host_a"], r["host_b"], r["n_src"]) for r in out)
        # (h1,h2) co-cited by s1, s2 AND s3; h3 pairs only appear once
        assert got == [("h1.x", "h2.x", 3)]
    # max_out=1 keeps only the lexicographically-first host per page:
    # no page contributes any pair
    out = G.host_cocitation(
        ray.data.from_arrow(edges), None, min_count=1, max_out=1
    ).take_all()
    assert out == []
