"""Decontamination and repetition-signal operators: pure-function
semantics plus the distributed probe over a documents Dataset."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from urlmap_ray.functions.decontam import (
    decontaminate,
    eval_ngram_hashes,
    gate_batch,
    overlap_batch,
)
from urlmap_ray.functions.textstats import repetition_batch


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_overlap_counts_distinct_shared_shingles():
    eval_hashes = eval_ngram_hashes(["alpha beta gamma delta"])
    # doc 0 shares shingles "alpha beta gamma" and "beta gamma delta";
    # doc 1 shares nothing; doc 2 is an exact eval copy
    out = overlap_batch(
        _tbl(
            [
                (0, "alpha beta gamma delta epsilon"),
                (1, "zeta eta theta iota"),
                (2, "alpha beta gamma delta"),
            ]
        ),
        eval_hashes,
    )
    assert out.column("n_overlap").to_pylist() == [2, 0, 2]
    assert out.column("contaminated").to_pylist() == [True, False, True]


def test_overlap_empty_cases():
    assert len(eval_ngram_hashes([])) == 0
    out = overlap_batch(_tbl([(0, ""), (1, "a b c")]), eval_ngram_hashes([""]))
    assert out.column("n_overlap").to_pylist() == [0, 0]


def test_decontaminate_dataset(ray_session):
    docs = ray.data.from_arrow(
        _tbl([(i, f"w{i} common phrase here w{i}") for i in range(50)])
    )
    ev = eval_ngram_hashes(["w7 common phrase here w7"])
    out = pa.concat_tables(
        decontaminate(docs, ev).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    got = dict(zip(out.column("doc_id").to_pylist(), out.column("contaminated").to_pylist()))
    # every doc shares the "common phrase here" shingle; doc 7 is exact
    assert all(got.values())
    n7 = dict(zip(out.column("doc_id").to_pylist(), out.column("n_overlap").to_pylist()))[7]
    assert n7 == max(
        dict(zip(out.column("doc_id").to_pylist(), out.column("n_overlap").to_pylist())).values()
    )


def test_repetition_batch_counts():
    out = repetition_batch(
        _tbl(
            [
                (0, "a b a b a b a b"),  # heavy 2-gram repetition
                (1, "one two three four five"),  # none
                (2, ""),  # empty
                (3, "solo"),  # one word, no 2-grams
            ]
        )
    )
    assert out.column("n_words").to_pylist() == [8, 5, 0, 1]
    assert out.column("n_distinct_words").to_pylist() == [2, 5, 0, 1]
    assert out.column("n_2grams").to_pylist() == [7, 4, 0, 0]
    assert out.column("n_distinct_2grams").to_pylist() == [2, 4, 0, 0]
    # (7-2)*5=25 > 7 → flagged; others not
    assert out.column("rep_flag").to_pylist() == [True, False, False, False]


def test_prep_gate_fused_equivalence():
    """gate_batch (one tokenization) must equal the composition of
    repetition_batch + overlap_batch + the min-words filter — the fused
    form docs_pipeline runs on its hot gate stage."""
    words = " ".join(f"w{i}" for i in range(12))
    rows = [
        (0, words),  # passes everything
        (1, "a b a b a b a b a b a b"),  # repetitive (and 12 words)
        (2, "short text"),  # < 10 words
        (3, words + " alpha beta gamma tail"),  # contaminated
        (4, ""),  # empty
        (5, " ".join(f"u{i}" for i in range(30))),  # passes
    ]
    batch = _tbl(rows)
    ev = eval_ngram_hashes(["alpha beta gamma delta"])

    fused = gate_batch(batch, ev, min_words=10)

    r = repetition_batch(batch)
    o = overlap_batch(batch, ev)
    keep = pa.compute.and_(
        pa.compute.and_(
            pa.compute.greater_equal(r.column("n_words"), 10),
            pa.compute.invert(r.column("rep_flag")),
        ),
        pa.compute.invert(o.column("contaminated")),
    )
    composed = batch.filter(keep)

    assert fused.equals(composed)
    assert fused.column("doc_id").to_pylist() == [0, 5]


def test_clean_text_batch_semantics():
    from urlmap_ray.functions.textstats import clean_text_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "  a\tb\r\nc\x00d\x1f  ",  # ctrl stripped, ws collapsed, trimmed
                    None,                        # null passes through
                    "",                          # empty stays empty
                    "x y",                  # NBSP is NOT ASCII ws — pinned kept
                ],
                pa.string(),
            ),
        }
    )
    out = clean_text_batch(batch)
    assert out.column("text_clean").to_pylist() == ["a b cd", None, "", "x y"]
    assert out.column("n_chars_raw").to_pylist() == [13, None, 0, 3]
    assert out.column("n_chars_clean").to_pylist() == [6, None, 0, 3]


def test_vocab_topk_cut_and_ties(ray_session):
    from urlmap_ray.functions.textstats import vocab_topk

    # tf: z*4, m1*3, a*2, b*2, c*2, d*1 ... tie at the k=4 boundary between
    # b and c resolves by term ascending
    rows = [
        (0, "z z m1 a b"),
        (1, "z m1 a c"),
        (2, "z m1 b c d"),
    ]
    out = pa.concat_tables(
        vocab_topk(ray.data.from_arrow(_tbl(rows)), k=4).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    got = list(
        zip(
            out.column("term").to_pylist(),
            out.column("tf").to_pylist(),
            out.column("df").to_pylist(),
        )
    )
    assert sorted(got, key=lambda r: (-r[1], r[0])) == [
        ("z", 4, 3),
        ("m1", 3, 3),
        ("a", 2, 2),
        ("b", 2, 2),
    ]


def test_substring_dup_pairs(ray_session):
    from urlmap_ray.functions.dedup import substring_dup_pairs, substring_windows

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, "PREFIX " + base[:40] + " DIFFERENT TAIL ENTIRELY HERE OK"),  # shares 40-char run
        (2, "completely unrelated text with no shared passages at all in it"),
        (3, base),  # exact duplicate of 0
        (4, "x" * 10),  # shorter than k
    ]
    out = pa.concat_tables(
        substring_dup_pairs(ray.data.from_arrow(_tbl(rows)), k=32).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    got = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert got == {(0, 1), (0, 3), (1, 3)}
    assert substring_windows("abc", 32) == []
    assert substring_windows("ab", 2) == ["ab"]
