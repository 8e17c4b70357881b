"""Domain/source-level corpus filtering — the "drop spam domains" step.

Web-scale training pipelines filter at TWO granularities: per-document
(textstats/lm/quality_model) and per-SOURCE — a domain whose documents
are on average too short / too low-quality is dropped wholesale
(blocklist construction). This module is the docs-side counterpart of
the crawl-side ``urlmine.host_stats`` rollup.

Scale shape: per-batch Arrow hash-agg partials (source → Σchars, n) →
one ``groupby(source)`` fold whose exchange is SOURCE-cardinality rows,
never documents → the kept-source set stays a Dataset and gates the
corpus through :func:`joins.semi_join` (broadcast ``pc.is_in`` probe for
key sets that fit the object store, the pad→union shuffle form beyond —
zero driver materialization in either mode).

The keep rule is integer-exact cross-engine: a source survives iff
``Σchars ≥ min_avg_chars · n_docs`` (the avg comparison cross-multiplied
so no float division exists on either side).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .joins import semi_join


def source_stats(ds, *, key_col: str = "source", text_col: str = "text"):
    """Per-source rollup: (source, n_docs, total_chars). The shuffle
    carries one pre-aggregated row per (batch, source)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(t.column(text_col)).cast(pa.int64())
        tt = pa.table({key_col: t.column(key_col), "c": n_chars})
        g = tt.group_by(key_col).aggregate([("c", "sum"), ("c", "count")])
        return pa.table(
            {
                key_col: g.column(key_col),
                "total_chars": g.column("c_sum").cast(pa.int64()),
                "n_docs": g.column("c_count").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )


def source_filter(
    ds,
    *,
    key_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_avg_chars: int = 300,
    mode: str = "broadcast",
):
    """Keep only documents whose source's MEAN length clears the bar:
    source kept iff ``Σchars ≥ min_avg_chars · n_docs`` (int64-exact,
    no float anywhere). Returns (id, source, n_chars) rows.

    ``mode`` is the semi_join membership strategy: ``"broadcast"``
    (distinct kept sources → one ``ray.put``, per-batch ``is_in``) or
    ``"shuffle"`` (pad→union→groupby — no driver/object-store bound);
    results are identical by construction."""
    stats = source_stats(ds, key_col=key_col, text_col=text_col)

    def kept_keys(t: pa.Table) -> pa.Table:
        ok = pc.greater_equal(
            t.column("total_chars"),
            pc.multiply_checked(
                t.column("n_docs"), pa.scalar(min_avg_chars, pa.int64())
            ),
        )
        return t.filter(ok).select([key_col])

    kept = stats.map_batches(kept_keys, batch_format="pyarrow", zero_copy_batch=True)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                key_col: t.column(key_col),
                "n_chars": pc.utf8_length(t.column(text_col)).cast(pa.int64()),
            }
        )

    projected = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return semi_join(projected, kept, on=key_col, mode=mode)
