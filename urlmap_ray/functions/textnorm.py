"""Unicode text normalization — the first row-local step of every
web-corpus cleaning recipe (CCNet, C4, Gopher all lowercase/normalize
before hashing or n-gram statistics).

Pinned cross-engine rule (one expression, mirrored term-for-term in the
DuckDB oracle)::

    text_norm = trim(regexp_replace(nfc_normalize(lower(text)),
                                    '[ \\t\\r\\n]+', ' ', 'g'), ' ')

Engine-parity notes (each seam empirically pinned by
tests/test_textnorm.py):

- ``lower`` is Arrow ``pc.utf8_lower`` — utf8proc simple lowercasing,
  byte-identical to DuckDB ``lower`` (NOT Python ``str.lower``, which
  applies final-sigma and Turkish-İ special cases DuckDB does not).
  Caveat found by the generative fuzz: the two utf8proc BUILDS embed
  different Unicode versions, so codepoints whose case mappings were
  added recently (e.g. U+10570 VITHKUQI, Unicode 14) lower in Arrow
  but not in DuckDB. The parity contract covers the shared repertoire
  (everything in real web text); the fuzz filters the skew cases and
  documents them (tests/test_textnorm.py::_engines_share_repertoire).
- ``nfc_normalize`` is Unicode NFC — Python ``unicodedata.normalize``
  and DuckDB agree (both implement the standard algorithm). NFC is the
  identity on pure-ASCII strings, so the kernel takes a VECTORIZED
  fast path: rows whose utf8 byte length equals their codepoint length
  are ASCII and skip Python entirely; only non-ASCII rows pay a
  per-row normalize (the same per-document cost CCNet pays).
- whitespace collapse is RE2 ``[ \\t\\r\\n]+`` on both sides (never
  ``\\s`` — its Unicode coverage differs between engines), and the
  final trim strips the single character ``' '`` only.

Scale shape: zero shuffle — one ``map_batches`` pass, column-pruned
read, output streamed. At 100 TB this stage is embarrassingly parallel
and IO-bound.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["normalize_batch", "normalize_text"]

_WS_RE = r"[ \t\r\n]+"


def _nfc(arr: pa.Array) -> pa.Array:
    """NFC-normalize a string array; ASCII rows (utf8 bytes == codepoints)
    pass through untouched, non-ASCII rows go through unicodedata."""
    ascii_mask = pc.fill_null(
        pc.equal(pc.binary_length(arr), pc.utf8_length(arr)), True
    )
    if pc.all(ascii_mask).as_py() is not False:
        return arr
    idx = np.flatnonzero(np.invert(ascii_mask.to_numpy(zero_copy_only=False)))
    py = arr.to_pylist()
    for i in idx:
        s = py[i]
        if s is not None:
            py[i] = unicodedata.normalize("NFC", s)
    return pa.array(py, pa.string())


def normalize_batch(
    t: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """One Arrow batch → (id, text_norm, n_chars, n_chars_norm)."""
    arr = t.column(text_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    low = pc.utf8_lower(arr)
    norm = _nfc(low)
    collapsed = pc.replace_substring_regex(norm, pattern=_WS_RE, replacement=" ")
    out = pc.utf8_trim(collapsed, characters=" ")
    return pa.table(
        {
            id_col: t.column(id_col),
            "text_norm": out,
            "n_chars": pc.cast(pc.utf8_length(arr), pa.int64()),
            "n_chars_norm": pc.cast(pc.utf8_length(out), pa.int64()),
        }
    )


def normalize_text(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset form: lazy, zero-shuffle normalization pass."""
    return ds.map_batches(
        normalize_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
