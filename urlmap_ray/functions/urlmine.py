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

__all__ = ["url_templates", "host_stats", "trap_templates"]

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


_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"

# query part of a TEMPLATE: everything after the first '?' (RE2 leftmost
# match ≡ DuckDB regexp_extract(template, '\?(.*)$', 1))
_QUERY_PART = r"\?(?P<q>.*)$"


def trap_templates(ds, *, url_col: str = "url", min_urls: int = 40):
    """Crawler-trap detection — the frontier-health gate a crawl operator
    runs before committing budget to a site (reference context: the
    depth-limit M4 and per-host budget A3 gates exist precisely because
    of these; this operator finds WHERE they will be needed).

    A trap is a URL template whose variability lives in the QUERY STRING
    (calendar pages, session ids, faceted-search parameter spaces): the
    same path shape spawns unbounded parameter values. Pinned rule,
    mirrored by the SQL oracle:

    - template = every maximal ASCII digit run → ``{n}`` (url_templates);
    - trap candidate iff the template's query part — everything after the
      FIRST ``?`` — still contains ``{n}``;
    - flagged iff the (host, template) group has ≥ ``min_urls`` rows.

    Scale shape: row-local templating + trap test, per-batch Arrow
    hash-agg partials carrying (count, min example), ONE
    groupby(host, template) fold over CANDIDATE templates only (the
    query-part filter runs before the exchange, so path-shaped templates
    — the overwhelming bulk of a real frontier — never move). The
    threshold filter is row-local on the folded template rows."""
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        tmpl = pc.replace_substring_regex(
            urls, pattern=_DIGIT_RUN, replacement="{n}"
        )
        host = pc.struct_field(pc.extract_regex(urls, pattern=_HOST_RE), "host")
        q = pc.struct_field(pc.extract_regex(tmpl, pattern=_QUERY_PART), "q")
        is_trap = pc.fill_null(pc.match_substring(q, "{n}"), False)
        sub = pa.table(
            {"host": host, "template": tmpl, "u": urls}
        ).filter(is_trap)
        return (
            sub.group_by(["host", "template"])
            .aggregate([([], "count_all"), ("u", "min")])
            .rename_columns(["host", "template", "n_partial", "example_partial"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["host", "template"])
        .aggregate(
            Sum("n_partial", alias_name="n_urls"),
            Min("example_partial", alias_name="example"),
        )
    )

    def threshold(t: pa.Table) -> pa.Table:
        if "n_urls" not in t.column_names:  # empty-fold schema guard
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "template": pa.array([], pa.string()),
                    "n_urls": pa.array([], pa.int64()),
                    "example": pa.array([], pa.string()),
                }
            )
        return t.filter(pc.greater_equal(t.column("n_urls"), min_urls))

    return agg.map_batches(threshold, batch_format="pyarrow", zero_copy_batch=True)


def host_stats(ds, *, url_col: str = "url", status_col: str = "status",
               html_col: str = "html"):
    """Per-host crawl-operations rollup — the fleet-health view a crawl
    operator reads after every run: (host, n_pages, n_ok, n_err,
    total_bytes) with n_ok = 2xx, n_err = status ≥ 400, total_bytes =
    Σ octet length of the stored body (nulls count 0).

    Host extraction is ONE Arrow RE2 kernel (``extract_regex`` — the same
    engine as DuckDB's ``regexp_extract``, the url_templates contract, so
    hosts are byte-identical cross-engine). Per-batch Arrow hash-agg
    partials pre-aggregate before the single groupby(host) fold — the
    exchange is host rows (fleet cardinality), never pages."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column(url_col), pattern=_HOST_RE)
        host = pc.struct_field(m, "host")
        status = t.column(status_col)
        ok = pc.and_(
            pc.greater_equal(status, 200), pc.less_equal(status, 299)
        ).cast(pa.int64())
        err = pc.greater_equal(status, 400).cast(pa.int64())
        nbytes = pc.coalesce(
            pc.binary_length(t.column(html_col)).cast(pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        return (
            pa.table(
                {
                    "host": host,
                    "ok": ok,
                    "err": err,
                    "nb": nbytes,
                }
            )
            .group_by(["host"])
            .aggregate([([], "count_all"), ("ok", "sum"), ("err", "sum"), ("nb", "sum")])
            .rename_columns(["host", "n_part", "ok_part", "err_part", "nb_part"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(
            Sum("n_part", alias_name="n_pages"),
            Sum("ok_part", alias_name="n_ok"),
            Sum("err_part", alias_name="n_err"),
            Sum("nb_part", alias_name="total_bytes"),
        )
    )
