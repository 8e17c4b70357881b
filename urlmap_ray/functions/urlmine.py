"""URL template mining — collapse a URL corpus to its structural
templates (the ``/product/{n}/review/{n}`` shapes). The site-map analysis
step of a crawl engine: templates expose crawler traps, parameter spaces
and section sizes without reading a single page body.

Rule (pinned, mirrored by the SQL oracle): every maximal ASCII digit run
anywhere in the URL is replaced by the literal token ``{n}``. One Arrow
RE2 kernel (``replace_substring_regex`` — the same engine DuckDB's
``regexp_replace`` uses, the clean_text/pii contract), so templates are
byte-identical cross-engine by construction.

Scale shape: row-local templating, per-batch Arrow hash-agg partials
(one row per template per batch, carrying count + lexicographic-min
example URL), ONE groupby(template) fold — the exchange is template
rows, never URLs. Template cardinality is the site's structural
complexity, orders of magnitude below URL count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["url_templates"]

_DIGIT_RUN = r"[0-9]+"


def url_templates(ds, *, url_col: str = "url"):
    """urls → (template, n_urls, example) with ``example`` = the
    lexicographically smallest URL matching the template (a stable,
    partitioning-independent representative)."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        tmpl = pc.replace_substring_regex(
            t.column(url_col), pattern=_DIGIT_RUN, replacement="{n}"
        )
        return (
            pa.table({"template": tmpl, url_col: t.column(url_col)})
            .group_by(["template"])
            .aggregate([([], "count_all"), (url_col, "min")])
            .rename_columns(["template", "n_partial", "example_partial"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("template")
        .aggregate(
            Sum("n_partial", alias_name="n_urls"),
            Min("example_partial", alias_name="example"),
        )
    )
