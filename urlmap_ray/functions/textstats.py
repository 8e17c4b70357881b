"""Text-analysis operators over a documents table (training-data pipeline
building blocks): token counting, quality scoring, language ID, document
fingerprinting. All are pure Arrow-batch functions for ``map_batches``;
each has a ``*_dataset`` wrapper taking a ``ray.data.Dataset``.

Design notes for 100TB scale: every function is row-local (no shuffle), and
projects only the columns it needs. Regexes are compiled at module import
(once per worker process).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword split: letter-runs, digit-runs, single punctuation — a
# rough proxy for tokenizer load without a vocab file.
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_PUNCT_RE = re.compile(r"[.!?,;:]")

STOPWORDS = frozenset(
    "the a an and or of to in is are was be for on with as at by it this that".split()
)

# Tiny character-frequency profiles for the n-gram language heuristic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", " th"),
    "de": ("der", "sch", "ein", "und", "ich"),
    "fr": ("les", "ent", "que", "ais", "eur"),
    "es": ("los", "que", "ión", "ado", "nte"),
    "zh": (),  # detected by script, not n-grams
}


# Text cleaning is pure Arrow RE2 kernels (replace_substring_regex) —
# fully vectorized, zero Python strings, and the SAME regex engine DuckDB
# uses, so the SQL oracle matches byte-for-byte by construction. Patterns
# are ASCII-pinned on purpose: RE2's \s is ASCII while Python re's is
# Unicode, so the class is spelled out instead of using shorthands.
_CTRL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"  # C0 minus \t \n \r
_WS_RUN_PATTERN = r"[ \t\n\r]+"


def clean_text_batch(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Canonical webtext cleanup: strip control characters, collapse
    ASCII whitespace runs to single spaces, trim. → (doc_id, text_clean,
    n_chars_raw, n_chars_clean); nulls pass through as nulls."""
    raw = batch.column(text_col)
    no_ctrl = pc.replace_substring_regex(raw, pattern=_CTRL_PATTERN, replacement="")
    collapsed = pc.replace_substring_regex(
        no_ctrl, pattern=_WS_RUN_PATTERN, replacement=" "
    )
    clean = pc.utf8_trim(collapsed, characters=" ")
    return pa.table(
        {
            id_col: batch.column(id_col),
            "text_clean": clean,
            "n_chars_raw": pc.utf8_length(raw).cast(pa.int64()),
            "n_chars_clean": pc.utf8_length(clean).cast(pa.int64()),
        }
    )


def token_count_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    n_tok = [len(_TOKEN_RE.findall(t or "")) for t in texts]
    n_bpe = [len(_BPE_RE.findall(t or "")) for t in texts]
    out = batch.drop_columns([text_col])
    out = out.append_column("n_tokens", pa.array(n_tok, pa.int64()))
    out = out.append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64()))
    return out


def quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword heuristics (the classic cheap quality
    filters used before expensive model scoring)."""
    texts = batch.column(text_col).to_pylist()
    n_chars, n_tokens, punct, stop = [], [], [], []
    for t in texts:
        t = t or ""
        toks = _TOKEN_RE.findall(t)
        n_chars.append(len(t))
        n_tokens.append(len(toks))
        punct.append(len(_PUNCT_RE.findall(t)))
        stop.append(sum(1 for w in toks if w.lower() in STOPWORDS))
    out = batch.drop_columns([text_col])
    out = out.append_column("n_chars", pa.array(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
    out = out.append_column("n_punct", pa.array(punct, pa.int64()))
    out = out.append_column("n_stopwords", pa.array(stop, pa.int64()))
    return out


def lang_id(text: str) -> str:
    """N-gram/script heuristic language ID (no model deps)."""
    if not text:
        return "und"
    cjk = sum(1 for c in text[:400] if "一" <= c <= "鿿")
    if cjk > len(text[:400]) * 0.2:
        return "zh"
    low = text[:2000].lower()
    best, best_score = "en", 0
    for lang, grams in _LANG_MARKERS.items():
        if not grams:
            continue
        score = sum(low.count(g) for g in grams)
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    preds = [lang_id(t or "") for t in batch.column(text_col).to_pylist()]
    out = batch.drop_columns([text_col])
    return out.append_column("lang_pred", pa.array(preds, pa.string()))


def vocab_topk(ds, *, k: int = 100, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus vocabulary: top-k terms by total frequency with document
    frequency — (term, tf, df), ties broken by term ascending.

    The canonical word-count shape, kept scale-safe end to end: per-batch
    Counter partials pre-aggregate before the ONE term-keyed shuffle (the
    exchange moves each batch's distinct terms, not tokens); after the
    groupby every term is a single row, so a per-block local top-k prune
    cuts the global sort input to blocks×k rows before the tiny
    sort+limit. All counts integer."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        tf: Counter = Counter()
        df: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            toks = (txt or "").lower().split()
            tf.update(toks)
            df.update(set(toks))
        terms = sorted(tf)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "tf": pa.array([tf[w] for w in terms], pa.int64()),
                "df": pa.array([df[w] for w in terms], pa.int64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        order = pc.sort_indices(
            t, sort_keys=[("tf", "descending"), ("term", "ascending")]
        )
        return t.take(order[:k])

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))
        .map_batches(local_topk, batch_size=None, batch_format="pyarrow")
        .sort(["tf", "term"], descending=[True, False])
        .limit(k)
    )


def repetition_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): duplicate
    word-2-gram mass per document. Counts stay INTEGER (no fraction
    columns) so the driver's value-hash gate compares exactly; the
    Gopher "dup-2-gram fraction > 0.2" rejection is the integer
    inequality (n_2grams - n_distinct_2grams) * 5 > n_2grams."""
    texts = batch.column(text_col).to_pylist()
    n_words, n_dwords, n_2g, n_d2g, flag = [], [], [], [], []
    for t in texts:
        toks = (t or "").lower().split()
        grams = list(zip(toks, toks[1:]))
        nw, n2 = len(toks), len(grams)
        nd2 = len(set(grams))
        n_words.append(nw)
        n_dwords.append(len(set(toks)))
        n_2g.append(n2)
        n_d2g.append(nd2)
        flag.append((n2 - nd2) * 5 > n2)
    out = batch.drop_columns([text_col])
    out = out.append_column("n_words", pa.array(n_words, pa.int64()))
    out = out.append_column("n_distinct_words", pa.array(n_dwords, pa.int64()))
    out = out.append_column("n_2grams", pa.array(n_2g, pa.int64()))
    out = out.append_column("n_distinct_2grams", pa.array(n_d2g, pa.int64()))
    out = out.append_column("rep_flag", pa.array(flag, pa.bool_()))
    return out


_FNV_PRIME = 1099511628211
_FNV_OFFSET = 14695981039346656037
_MASK64 = (1 << 64) - 1


def rolling_fingerprint(text: str) -> int:
    """FNV-1a rolling hash over bytes — a stable 64-bit content fingerprint."""
    h = _FNV_OFFSET
    for b in text.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h & 0x7FFFFFFFFFFFFFFF


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    rolls = [rolling_fingerprint(t or "") for t in texts]
    out = batch.drop_columns([text_col])
    out = out.append_column("fp_md5", pa.array(md5s, pa.string()))
    out = out.append_column("fp_rolling", pa.array(rolls, pa.int64()))
    return out


def compression_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Compression-ratio quality signal (the CCNet/Gopher-family
    "too-compressible ⇒ boilerplate/repetition" filter): per document,
    utf-8 byte count, zlib-level-6 compressed byte count, and the pinned
    integer rejection rule ``comp_flag = n_zlib * 4 < n_bytes`` (ratio
    below 0.25). Counts stay integer so the value-hash gate compares
    exactly; zlib level is pinned because compressed size is only
    deterministic for a fixed (library, level) pair — both sides of the
    oracle run the same CPython zlib."""
    import zlib

    n_bytes: list[int] = []
    n_zlib: list[int] = []
    for txt in batch.column(text_col).to_pylist():
        raw = (txt or "").encode("utf-8")
        n_bytes.append(len(raw))
        n_zlib.append(len(zlib.compress(raw, 6)))
    out = batch.drop_columns([text_col])
    out = out.append_column("n_bytes", pa.array(n_bytes, pa.int64()))
    out = out.append_column("n_zlib", pa.array(n_zlib, pa.int64()))
    flags = [int(z * 4 < b) for z, b in zip(n_zlib, n_bytes)]
    return out.append_column("comp_flag", pa.array(flags, pa.int64()))


# Gopher quality-gate thresholds (Rae et al. 2021, Table A1 — adapted to
# integer-only cross-multiplied forms so numpy and SQL agree exactly;
# word-count floor lowered to 30 for the synthetic corpus' doc sizes).
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_BITS = {
    "word_count": 1,
    "mean_word_len": 2,
    "hash_ratio": 4,
    "ellipsis_ratio": 8,
    "alpha_words": 16,
    "bullet_lines": 32,
    "ellipsis_lines": 64,
    "stopwords": 128,
}


def _row_sums(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flattened list column — cumsum-difference, safe
    for empty rows (unlike bare reduceat)."""
    csum = np.concatenate([[0], np.cumsum(vals, dtype=np.int64)])
    return csum[offsets[1:]] - csum[offsets[:-1]]


def _list_offsets(arr: pa.ListArray) -> tuple[pa.Array, np.ndarray]:
    """(flattened values, zero-based row offsets) of a list array."""
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return arr.flatten(), off - off[0]


def gopher_gate_batch(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-rules composite quality gate (Rae et al. 2021 Table A1) →
    (doc_id, n_words, fail_bits, keep) — the named rule-based filter
    between the cheap per-signal stats (quality_batch) and model scoring.

    Every rule is integer-only and cross-multiplied (no division), with
    each text seam pinned to a DuckDB-expressible twin:

    - words = ``regexp_split_to_array(trim(text), '\\s+')`` (spaces-only
      trim; an empty doc yields ONE empty word on both engines — it
      fails the mean-word-length rule, no special case);
    - word count in [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS] (bit 1);
    - mean word length in [3, 10]: ``3n ≤ Σlen ≤ 10n`` (bit 2);
    - '#' ratio ≤ 0.1: ``10·n_hash ≤ n`` (bit 4);
    - '…'-as-'...' ratio ≤ 0.1: ``10·n_ellipsis ≤ n``, non-overlapping
      substring count on both engines (bit 8);
    - ≥ 80% of words contain a letter: ``5·n_alpha ≥ 4·n`` (bit 16);
    - ≤ 90% of lines bullet-led ('-'/'*' after space-ltrim):
      ``10·n_bullet ≤ 9·n_lines`` (bit 32);
    - ≤ 30% of lines ellipsis-ended (after space-rtrim):
      ``10·n_ell_end ≤ 3·n_lines`` (bit 64);
    - ≥ 2 stopword occurrences (the module's pinned STOPWORDS) (bit 128).

    All Arrow RE2 / numpy kernels, zero Python loops; ``fail_bits`` ORs
    the failed rules so the gate's verdict is observable per rule, and
    ``keep`` is ``fail_bits == 0``.
    """
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    trimmed = pc.utf8_trim(txt, characters=" ")

    toks = pc.split_pattern_regex(trimmed, pattern="\\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    tvals, toff = _list_offsets(toks)
    n = np.diff(toff).astype(np.int64)
    tlen = pc.utf8_length(tvals).to_numpy(zero_copy_only=False).astype(np.int64)
    sumlen = _row_sums(tlen, toff)
    alpha = (
        pc.match_substring_regex(tvals, "[A-Za-z]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_alpha = _row_sums(alpha, toff)
    stop = (
        pc.is_in(
            pc.utf8_lower(tvals), value_set=pa.array(sorted(STOPWORDS), pa.string())
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_stop = _row_sums(stop, toff)

    n_hash = pc.count_substring(txt, "#").to_numpy(zero_copy_only=False).astype(np.int64)
    n_ell = (
        pc.count_substring(txt, "...").to_numpy(zero_copy_only=False).astype(np.int64)
    )

    lines = pc.split_pattern(txt, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lvals, loff = _list_offsets(lines)
    n_lines = np.diff(loff).astype(np.int64)
    ltrim = pc.utf8_ltrim(lvals, characters=" ")
    bullet = (
        pc.or_(
            pc.starts_with(ltrim, pattern="-"), pc.starts_with(ltrim, pattern="*")
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_bullet = _row_sums(bullet, loff)
    rtrim = pc.utf8_rtrim(lvals, characters=" ")
    ellend = (
        pc.ends_with(rtrim, pattern="...")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_ellend = _row_sums(ellend, loff)

    bits = np.zeros(len(n), dtype=np.int64)
    bits |= np.where((n < GOPHER_MIN_WORDS) | (n > GOPHER_MAX_WORDS), 1, 0)
    bits |= np.where((3 * n > sumlen) | (sumlen > 10 * n), 2, 0)
    bits |= np.where(10 * n_hash > n, 4, 0)
    bits |= np.where(10 * n_ell > n, 8, 0)
    bits |= np.where(5 * n_alpha < 4 * n, 16, 0)
    bits |= np.where(10 * n_bullet > 9 * n_lines, 32, 0)
    bits |= np.where(10 * n_ellend > 3 * n_lines, 64, 0)
    bits |= np.where(n_stop < 2, 128, 0)

    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n, pa.int64()),
            "fail_bits": pa.array(bits, pa.int64()),
            "keep": pa.array(bits == 0, pa.bool_()),
        }
    )
