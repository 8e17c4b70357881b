"""Vectorized admission/gate paths must verdict byte-identically with the
per-link parser across tricky URL shapes (stages/links.py admission_mask,
stages/politeness.py gate_rows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from urlmap_ray.stages.links import AdmissionIndex, admission_mask
from urlmap_ray.stages.politeness import PolitenessGate, gate_rows

TRICKY_LINKS = [
    "https://h00001.example.org/",
    "https://h00001.example.org/sec1/p1",
    "https://H00001.EXAMPLE.ORG/sec1/p1",  # uppercase host → fallback path
    "https://h00001.example.org:443/sec1/p1",  # explicit port → fallback
    "https://user@h00001.example.org/x",  # userinfo → fallback
    "https://h00001.example.org/a%20b",  # escape
    "https://h00001.example.org/sec1/p1?ref=2",  # query
    "https://other.example.net/",
    "http://h00001.example.org/deep/path/x",
    "https://h00001.example.org",  # no path
    "ftp://h00001.example.org/x",  # wrong scheme
    "https://",  # degenerate
    "https://docs.example.org/guide/intro",
    "https://docs.example.org/guide",  # above the seed base
    "https://docs.example.org/guide/",
    "https://docs.example.org/guidebook/x",  # prefix but not dir-prefix
]


def _mask_matches_scalar(seeds, same_path_prefix):
    idx = AdmissionIndex(seeds, same_path_prefix)
    got = admission_mask(pa.array(TRICKY_LINKS, pa.string()), idx)
    want = np.array([idx.admits(l) for l in TRICKY_LINKS])
    assert got.tolist() == want.tolist(), list(zip(TRICKY_LINKS, got, want))


def test_admission_mask_root_seed_prefix():
    _mask_matches_scalar(["https://h00001.example.org/"], True)


def test_admission_mask_root_seed_domain_only():
    _mask_matches_scalar(["https://h00001.example.org/"], False)


def test_admission_mask_non_root_seed():
    _mask_matches_scalar(["https://docs.example.org/guide/"], True)


def test_admission_mask_multi_seed():
    _mask_matches_scalar(
        ["https://h00001.example.org/", "https://docs.example.org/guide/"], True
    )


def _gate_verdicts(gate, urls, depths):
    batch = pa.table(
        {"url": pa.array(urls, pa.string()), "depth": pa.array(depths, pa.int32())}
    )
    return gate_rows(gate, batch).column("verdict").to_pylist()


def _scalar_verdicts(gate, urls, depths):
    from urlmap_ray.gourl import URLError, parse as parse_url
    from urlmap_ray.robotstxt import check_rules
    from urlmap_ray.stages.politeness import origin_of

    out = []
    for u, d in zip(urls, depths):
        if gate.respect_robots:
            data = gate._rules_for(origin_of(u))
            if data is not None:
                try:
                    path = parse_url(u).path
                except URLError:
                    path = "/"
                if not check_rules(data.rules, path):
                    out.append("skip_robots")
                    continue
        if gate.max_depth >= 0 and d > gate.max_depth:
            out.append("skip_depth")
            continue
        out.append("admit")
    return out


def test_gate_rows_matches_scalar_reference():
    bodies = {
        "https://a.example.org": "User-agent: *\nDisallow: /sec3/\n",
        "https://b.example.org": "User-agent: *\nDisallow: /\n",
    }
    gate = PolitenessGate(
        bodies, user_agent="t/1", per_host_budget=None, respect_robots=True, max_depth=2
    )
    urls = [
        "https://a.example.org/",
        "https://a.example.org/sec3/p9",
        "https://a.example.org/sec1/p1",
        "https://a.example.org/sec3/p9?x=1",
        "https://a.example.org/a%20b/sec3",
        "https://b.example.org/anything",
        "https://c.example.org/sec3/p1",  # no robots → depth only
        "https://A.example.org/sec3/p1",  # case-sensitive origin (miss)
    ]
    depths = [0, 1, 3, 1, 1, 1, 5, 1]
    assert _gate_verdicts(gate, urls, depths) == _scalar_verdicts(gate, urls, depths)
