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
