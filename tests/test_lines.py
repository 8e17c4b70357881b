"""Line-family operators (lines.py): distributed paragraph dedup /
boilerplate strip / line filter vs single-process references, across
bucket counts and adversarial corpora."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from urlmap_ray.functions.lines import (
    boilerplate_strip,
    explode_lines,
    line_dedup,
    line_filter,
)


def _docs_ds(rows: list[tuple[str, str]]):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _by_url(ds, text_col: str) -> dict[str, tuple[str, int, int]]:
    t = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    return {
        u: (txt, nl, nk)
        for u, txt, nl, nk in zip(
            t.column("url").to_pylist(),
            t.column(text_col).to_pylist(),
            t.column("n_lines").to_pylist(),
            t.column("n_kept").to_pylist(),
        )
    }


# ---------------------------------------------------------------------------
# single-process references


def _ref_line_dedup(rows: list[tuple[str, str]]) -> dict[str, tuple[str, int, int]]:
    owner: dict[str, tuple[str, int]] = {}
    for url, text in rows:
        for i, line in enumerate(text.split("\n"), start=1):
            key = (url, i)
            if line not in owner or key < owner[line]:
                owner[line] = key
    out = {}
    for url, text in rows:
        lines = text.split("\n")
        kept = [
            ln for i, ln in enumerate(lines, start=1) if owner[ln] == (url, i)
        ]
        out[url] = ("\n".join(kept), len(lines), len(kept))
    return out


def _host(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]


def _ref_boilerplate(
    rows: list[tuple[str, str]], min_docs: int
) -> dict[str, tuple[str, int, int]]:
    docs_per: dict[tuple[str, str], set[str]] = {}
    for url, text in rows:
        for line in text.split("\n"):
            docs_per.setdefault((_host(url), line), set()).add(url)
    out = {}
    for url, text in rows:
        lines = text.split("\n")
        kept = [
            ln for ln in lines if len(docs_per[(_host(url), ln)]) < min_docs
        ]
        out[url] = ("\n".join(kept), len(lines), len(kept))
    return out


CORPORA = {
    "shared_footer": [
        ("http://a.com/1", "alpha beta\nfooter a"),
        ("http://a.com/2", "gamma delta\nfooter a"),
        ("http://a.com/3", "footer a\nepsilon"),
        ("http://b.com/1", "alpha beta\nunique b"),
    ],
    # same line twice in ONE doc: dedup keeps only the first position
    "intra_doc_repeat": [
        ("http://a.com/1", "x y\nx y\nz"),
        ("http://a.com/2", "x y"),
    ],
    # doc whose every line was seen earlier → empty text, n_kept 0
    "fully_shadowed": [
        ("http://a.com/1", "p q\nr s"),
        ("http://a.com/2", "p q\nr s"),
    ],
    "single_doc": [("http://a.com/1", "only line here")],
    # empty text = one empty line (SQL string_split('' , nl) = [''])
    "empty_text": [
        ("http://a.com/1", ""),
        ("http://a.com/2", ""),
    ],
}


@pytest.mark.parametrize("name", sorted(CORPORA))
@pytest.mark.parametrize("buckets", [1, 4])
def test_line_dedup_matches_reference(ray_session, name, buckets):
    rows = CORPORA[name]
    got = _by_url(line_dedup(_docs_ds(rows), n_buckets=buckets), "text_dedup")
    assert got == _ref_line_dedup(rows)


@pytest.mark.parametrize("name", sorted(CORPORA))
@pytest.mark.parametrize("min_docs", [2, 3])
def test_boilerplate_matches_reference(ray_session, name, min_docs):
    rows = CORPORA[name]
    got = _by_url(
        boilerplate_strip(_docs_ds(rows), min_docs=min_docs, n_buckets=4),
        "text_clean",
    )
    assert got == _ref_boilerplate(rows, min_docs)


def test_boilerplate_is_host_scoped(ray_session):
    # identical footer on two hosts, each below min_docs per host: kept
    # everywhere even though the corpus-wide count crosses the bar
    rows = [
        ("http://a.com/1", "body a\nshared footer"),
        ("http://a.com/2", "body b\nshared footer"),
        ("http://b.com/1", "body c\nshared footer"),
        ("http://b.com/2", "body d\nshared footer"),
    ]
    got = _by_url(
        boilerplate_strip(_docs_ds(rows), min_docs=3, n_buckets=4), "text_clean"
    )
    assert all(v[0].endswith("shared footer") for v in got.values())
    # but line_dedup (corpus-wide) keeps only the first copy
    ded = _by_url(line_dedup(_docs_ds(rows), n_buckets=4), "text_dedup")
    assert sum("shared footer" in v[0] for v in ded.values()) == 1


def test_line_dedup_bucket_invariance(ray_session):
    # the result is partitioning-independent: every bucket count yields
    # the same labels (the min-owner rule is global, not per-bucket)
    rng = np.random.default_rng(7)
    pool = [f"line {i} words here" for i in range(12)]
    rows = [
        (
            f"http://h{i % 5}.com/p{i}",
            "\n".join(rng.choice(pool, size=rng.integers(1, 5)).tolist()),
        )
        for i in range(30)
    ]
    base = _by_url(line_dedup(_docs_ds(rows), n_buckets=1), "text_dedup")
    for b in (3, 16):
        assert _by_url(line_dedup(_docs_ds(rows), n_buckets=b), "text_dedup") == base


def test_line_filter_word_bounds(ray_session):
    rows = [
        ("http://a.com/1", "one\ntwo words\nthree words here\nfour words right here"),
        ("http://a.com/2", ""),
    ]
    got = _by_url(
        line_filter(_docs_ds(rows), min_words=2, max_words=3), "text_filtered"
    )
    assert got["http://a.com/1"] == ("two words\nthree words here", 4, 2)
    # empty text = one empty line = word count 1 (the SQL split rule) → dropped
    assert got["http://a.com/2"] == ("", 1, 0)


def test_line_filter_no_upper_bound(ray_session):
    rows = [("http://a.com/1", "a b c d e\nf")]
    got = _by_url(line_filter(_docs_ds(rows), min_words=2), "text_filtered")
    assert got["http://a.com/1"] == ("a b c d e", 2, 1)


def test_explode_lines_ordinals(ray_session):
    t = pa.table(
        {"url": ["u1", "u2"], "text": ["a\nb\nc", "d"]}
    )
    out = explode_lines(t)
    assert out.column("url").to_pylist() == ["u1", "u1", "u1", "u2"]
    assert out.column("line_no").to_pylist() == [1, 2, 3, 1]
    assert out.column("line").to_pylist() == ["a", "b", "c", "d"]


def test_clean_pipeline_composition(ray_session):
    # boilerplate → dedup → gate chained through the rebuilt strings: the
    # per-host footer vanishes in stage 1, the cross-host syndicated line
    # collapses to its min-(url, line_no) owner in stage 2, and the 2-word
    # gate drops short leftovers in stage 3 — each stage re-explodes the
    # previous stage's joined string (the page_clean_pipeline contract)
    rows = [
        ("http://a.com/1", "alpha beta gamma\nwire story line\nfooter a"),
        ("http://a.com/2", "delta epsilon zeta\nfooter a"),
        ("http://a.com/3", "eta theta iota\nfooter a"),
        ("http://b.com/1", "kappa lambda mu\nwire story line\nshort"),
    ]
    cleaned = boilerplate_strip(_docs_ds(rows), min_docs=3, n_buckets=4)
    as_text = lambda t: pa.table(
        {"url": t.column("url"), "text": t.column("text_clean")}
    )
    deduped = line_dedup(
        cleaned.map_batches(as_text, batch_format="pyarrow"), n_buckets=4
    )
    as_text2 = lambda t: pa.table(
        {"url": t.column("url"), "text": t.column("text_dedup")}
    )
    got = _by_url(
        line_filter(
            deduped.map_batches(as_text2, batch_format="pyarrow"), min_words=2
        ),
        "text_filtered",
    )
    # footer a: ≥3 docs on host a → stripped there; absent on host b
    # wire story line: survives boilerplate (1 doc/host), dedup keeps a.com/1
    assert got["http://a.com/1"] == ("alpha beta gamma\nwire story line", 2, 2)
    assert got["http://a.com/2"] == ("delta epsilon zeta", 1, 1)
    assert got["http://a.com/3"] == ("eta theta iota", 1, 1)
    # b.com/1 loses the wire line to dedup and "short" to the word gate
    assert got["http://b.com/1"] == ("kappa lambda mu", 2, 1)
