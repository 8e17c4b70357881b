"""Gopher composite gate (textstats.gopher_gate_batch) — pure-function
edge seams, no Ray: empty docs, each rule's boundary, bitmask layout."""

from __future__ import annotations

import pyarrow as pa

from urlmap_ray.functions.textstats import GOPHER_MIN_WORDS, gopher_gate_batch


def _gate(texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = gopher_gate_batch(t)
    return out.column("fail_bits").to_pylist(), out.column("keep").to_pylist()


GOOD = ("the quick brown fox jumps over a lazy dog and it runs on by " * 3).strip()


def test_good_doc_keeps():
    bits, keep = _gate([GOOD])
    assert bits == [0] and keep == [True]


def test_empty_doc_is_one_empty_word():
    # '' splits to [''] on both engines: fails word-count AND mean-length
    bits, _ = _gate(["", "   "])
    for b in bits:
        assert b & 1 and b & 2


def test_word_count_bounds():
    words = GOOD.split()
    short = " ".join(words[: GOPHER_MIN_WORDS - 1])
    exact = " ".join((words * 3)[:GOPHER_MIN_WORDS])
    bits, _ = _gate([short, exact])
    assert bits[0] & 1
    assert not (bits[1] & 1)


def test_hash_and_ellipsis_ratios():
    bits, _ = _gate([GOOD + " " + "# " * 40, GOOD + " " + "... " * 40])
    assert bits[0] & 4 and not (bits[0] & 8)
    assert bits[1] & 8 and not (bits[1] & 4)
    # non-overlapping ellipsis count: '....' is ONE occurrence
    bits2, _ = _gate([GOOD + " ...."])
    assert not (bits2[0] & 8)  # 1 ellipsis over 37 words passes


def test_alpha_and_stopword_rules():
    bits, _ = _gate(["1234 " * 40, "zzzz " * 40])
    assert bits[0] & 16  # digit runs: no alphabetic words
    assert bits[1] & 128 and not (bits[1] & 16)


def test_line_rules():
    bullets = "- item\n" * 30 + "end with the a"
    ells = "waiting for more...\n" * 9 + "end of the story"
    bits, _ = _gate([bullets, ells])
    assert bits[0] & 32
    assert bits[1] & 64 and not (bits[1] & 32)
    # leading spaces before the bullet still count (space-ltrim seam)
    bits2, _ = _gate(["   - x\n" * 30 + "end with the a"])
    assert bits2[0] & 32


def test_mean_word_length_bounds():
    bits, _ = _gate(["aa " * 40 + "the a", ("x" * 20 + " ") * 40 + "the a"])
    assert bits[0] & 2  # mean < 3
    assert bits[1] & 2  # mean > 10
