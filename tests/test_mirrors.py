"""Mirror-host detection, DUST rule mining, crawler-trap templates."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

from urlmap_ray.functions.mirrors import (
    _dust_rule,
    _pairs_from_runs,
    dust_reference,
    dust_rules,
    mirror_hosts,
)
from urlmap_ray.functions.urlmine import trap_templates


# ---------------------------------------------------------------------------
# pure functions


def test_dust_rule_prefix():
    # vanity prefix: strip LCP 'https://', LCS 'host/p1'
    assert _dust_rule("https://m-host/p1", "https://host/p1") == ("m-", "")


def test_dust_rule_query_param():
    f, t = _dust_rule("https://h/p12?s=3", "https://h/p12")
    assert (f, t) == ("?s={n}", "")


def test_dust_rule_mid_substitution():
    f, t = _dust_rule("https://h/story_123/x", "https://h/article_123/x")
    assert (f, t) == ("story", "article")


def test_dust_rule_digit_templating_both_sides():
    f, t = _dust_rule("https://h/id/99/v", "https://h/id/7/v")
    # LCP 'https://h/id/', LCS '/v'; wait: '99' vs '7' share no chars at
    # the seam? '9' != '7' so mids are '99' and '7' → both template to {n}
    assert (f, t) == ("{n}", "{n}")


def test_pairs_from_runs_basic():
    import numpy as np

    keys = np.asarray(["f1", "f1", "f1", "f2", "f3", "f3"], dtype=object)
    vals = np.asarray(["a", "b", "c", "x", "p", "q"], dtype=object)
    a, b = _pairs_from_runs(keys, vals, 64)
    pairs = sorted(zip(a.tolist(), b.tolist()))
    assert pairs == [("a", "b"), ("a", "c"), ("b", "c"), ("p", "q")]


def test_pairs_from_runs_df_prune():
    import numpy as np

    keys = np.asarray(["f"] * 5, dtype=object)
    vals = np.asarray(list("abcde"), dtype=object)
    a, b = _pairs_from_runs(keys, vals, 4)  # run of 5 > cap 4 → dropped
    assert len(a) == 0


def test_dust_reference_star_shape():
    rows = [("https://h/a", "T"), ("https://h/b", "T"), ("https://h/c", "T")]
    out = dust_reference(rows, min_support=1)
    # canonical = https://h/a (lexicographic min); aliases b, c each yield
    # one rule: mids after LCP 'https://h/' are 'b'/'a' and 'c'/'a'
    assert out == [("b", "a", 1), ("c", "a", 1)]


# ---------------------------------------------------------------------------
# distributed ops


def _mirror_corpus() -> pa.Table:
    """Hosts A and B each hold 10 unique docs; host M mirrors 8 of A's."""
    urls, texts = [], []
    for i in range(10):
        urls.append(f"https://a.example/p{i}")
        texts.append(f"doc-a-{i}")
        urls.append(f"https://b.example/p{i}")
        texts.append(f"doc-b-{i}")
    for i in range(8):
        urls.append(f"https://m.example/p{i}")
        texts.append(f"doc-a-{i}")
    # empty-text rows must be ignored on both engines
    urls.append("https://a.example/empty")
    texts.append("")
    return pa.table({"url": urls, "text": texts})


def test_mirror_hosts_exact(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_mirror_corpus())
    out = (
        mirror_hosts(ds, min_jaccard_ppb=100_000_000, min_common=2, n_buckets=8)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["a"], r["b"]) == ("a.example", "m.example")
    assert r["common"] == 8 and r["na"] == 10 and r["nb"] == 8
    # jaccard = 8 / (10 + 8 - 8) = 0.8
    assert r["jaccard_ppb"] == 800_000_000


def test_mirror_hosts_thresholds(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_mirror_corpus())
    # min_common above the overlap → empty
    out = mirror_hosts(ds, min_common=9, n_buckets=8).to_pandas()
    assert len(out) == 0


def test_dust_rules_matches_reference(ray_session):
    import ray.data

    urls, texts = [], []
    for i in range(40):
        u = f"https://h.example/item/{i}"
        urls += [u, u + f"?sess={i % 7}", f"https://www2.h.example/item/{i}"]
        texts += [f"content-{i}"] * 3
    t = pa.table({"url": urls, "text": texts})
    ds = ray.data.from_arrow(t)
    got = (
        dust_rules(ds, min_support=10, n_buckets=8)
        .to_pandas()
        .sort_values(["rule_from", "rule_to"])
        .reset_index(drop=True)
    )
    ref = dust_reference(
        list(zip(urls, texts)), min_support=10
    )
    assert list(map(tuple, got.itertuples(index=False))) == ref
    # and the two injected alias families are the learned rules
    fr = set(got["rule_from"])
    assert "?sess={n}" in fr and "www{n}." in fr


def test_trap_templates(ray_session):
    import ray.data

    urls = []
    # path-shaped family: many urls, digits in path only → NOT a trap
    for i in range(100):
        urls.append(f"https://t.example/page/{i}")
    # calendar trap: ≥ min_urls query-digit urls
    for i in range(60):
        urls.append(f"https://t.example/cal?d={i}")
    # small query family: below threshold
    for i in range(5):
        urls.append(f"https://t.example/s?x={i}")
    ds = ray.data.from_arrow(pa.table({"url": urls}))
    out = trap_templates(ds, min_urls=40).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["host"] == "t.example"
    assert r["template"] == "https://t.example/cal?d={n}"
    assert r["n_urls"] == 60
    assert r["example"] == "https://t.example/cal?d=0"


def test_trap_templates_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"url": ["https://x.example/a"]}))
    out = trap_templates(ds, min_urls=1).to_pandas()
    # a trap-free frontier yields zero rows (an all-empty aggregate emits
    # no batches at all, so there is no schema to assert on)
    assert len(out) == 0


def test_mirror_hosts_modes_identical(ray_session):
    # the broadcast size-attach (driver-side fold under the declared
    # bound) and the shuffle attach (union+sort+merge) must agree exactly
    import ray.data

    ds = ray.data.from_arrow(_mirror_corpus())
    kw = dict(min_jaccard_ppb=100_000_000, min_common=2, n_buckets=8)
    bcast = (
        mirror_hosts(ds, **kw)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    shuf = (
        mirror_hosts(ds, broadcast_max_size_rows=0, **kw)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        bcast[sorted(bcast.columns)], shuf[sorted(shuf.columns)]
    )
