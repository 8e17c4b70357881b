"""PII redaction — the scrubbing pass every webtext training pipeline runs
before packing: replace emails, phone numbers, IP addresses and national-ID
patterns with typed placeholder tokens, and count what was removed (the
counts feed corpus-quality dashboards and per-source audits).

Everything is pure Arrow RE2 kernels (``count_substring_regex`` +
``replace_substring_regex``) — fully vectorized, zero Python string
handling, row-local (no shuffle), and the SAME regex engine DuckDB uses,
so a SQL ``regexp_replace(..., 'g')`` oracle matches byte-for-byte by
construction (the ``clean_text_batch`` contract, textstats.py:44-49).

The rule is PINNED as an ordered chain — each pattern counts matches in,
then rewrites, the text produced by the previous stage:

    1. email  → ``<EMAIL>``
    2. ipv4   → ``<IP>``
    3. ssn    → ``<ID>``     (###-##-####, word-bounded)
    4. phone  → ``<PHONE>``  (NANP-ish: optional paren area code)

Order matters and is part of the contract: ipv4 and ssn run before the
looser phone pattern so digit runs they own are already tokenized away
(placeholder tokens contain no digits, so later stages can never re-match
earlier redactions). Patterns are ASCII-pinned for the same reason as
clean_text_batch: RE2 character classes are ASCII where Python's are
Unicode, so nothing relies on engine-specific shorthand semantics.

At 100 TB this is a ``map_batches`` stage like any other row-local
transform: compiled-at-import patterns, no state, no exchange; the four
sequential RE2 passes stream through each batch and the text column is
rewritten in place of shipping anywhere.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["PII_RULES", "redact_pii_batch", "redact_pii"]

# (name, RE2 pattern, replacement token) — applied strictly in this order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    # Anchored so the rule never fires inside a longer digit run (serials,
    # '1234-567-89012'): the area code is either a matched paren group or a
    # word-bounded 3-digit run, and the line number ends at a word boundary.
    # RE2 has no lookaround, so boundaries + a paren alternation do the job.
    ("phone", r"(\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """One Arrow batch → (id, n_email, n_ipv4, n_ssn, n_phone,
    text_redacted). Counts are taken on the text as it stands when that
    rule runs (the chained contract above); nulls pass through as nulls
    with null counts."""
    txt = batch.column(text_col)
    cols: dict[str, pa.ChunkedArray | pa.Array] = {id_col: batch.column(id_col)}
    for name, pattern, token in PII_RULES:
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(txt, pattern=pattern), pa.int64()
        )
        txt = pc.replace_substring_regex(txt, pattern=pattern, replacement=token)
    cols["text_redacted"] = txt
    return pa.table(cols)


def redact_pii(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset wrapper: documents → redacted text + per-type counts.
    Row-local; projects nothing away so callers can select downstream."""
    return ds.map_batches(
        lambda t: redact_pii_batch(t, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
