"""Collocation mining — corpus bigram association statistics (the
"find multi-word expressions" analysis step: which adjacent word pairs
co-occur far more than chance). Score = association LIFT,

    lift(w1,w2) = p(w1,w2) / (p(w1)·p(w2))
               = (c_pair · N_uni²) / (c_w1 · c_w2 · N_bigram)

i.e. exactly the PMI argument — ranking by lift IS ranking by PMI (ln is
monotone) without ever evaluating a transcendental. That is deliberate:
``*`` and ``/`` are IEEE-754 correctly-rounded, so the double is
bit-identical in numpy and the SQL oracle with the op order pinned
(left-assoc numerator, left-assoc denominator, one divide), while ``ln``
differs in the last ulp between libm builds — measured, not assumed.

Scale shape:
- one pass over the corpus emits per-batch Counter partials of unigrams
  AND bigrams in a single unified (w1, w2, cnt) schema — unigrams as
  (w, ""), corpus totals as sentinel rows keyed by w1="" (a word can
  never be empty or contain whitespace, so the keyspace is disjoint);
  ONE groupby folds all of it, and the totals come back as two rows, not
  a driver-side recount.
- bigrams below ``min_count`` are dropped BEFORE any further exchange;
  unigrams below it drop too (safe: every word of a surviving bigram
  occurs at least as often as that bigram).
- unigram counts attach to bigram rows via two pad→union→groupby passes
  (the as-of-join shape, joins.py) — key = w1 then key = w2; the
  exchange is pre-aggregated count rows, never tokens.
- final exact top-k: the lift sort runs distributed (sort + limit).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

__all__ = ["collocations"]

# sentinel keys for corpus totals (real words are never empty)
_TOT_UNI = "NU"
_TOT_BI = "NB"


def _count_partials(t: pa.Table, text_col: str) -> pa.Table:
    uni: Counter = Counter()
    bi: Counter = Counter()
    for txt in t.column(text_col).to_pylist():
        toks = (txt or "").split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    w1 = [w for w in uni] + [p[0] for p in bi] + ["", ""]
    w2 = [""] * len(uni) + [p[1] for p in bi] + [_TOT_UNI, _TOT_BI]
    cnt = (
        list(uni.values())
        + list(bi.values())
        + [sum(uni.values()), sum(bi.values())]
    )
    return pa.table(
        {
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
        }
    )


def _attach(
    counts_ds, bigram_ds, *, key_from: str, out_col: str, carry: tuple[str, ...] = ()
):
    """Union unigram count rows with bigram rows keyed by ``key_from``
    (one of the bigram's words), then attach that word's unigram count to
    every bigram row in the group. ``carry`` = extra int64 columns already
    present on bigram rows to preserve (null-padded on the unigram side so
    the union schemas line up)."""

    def key_uni(t: pa.Table) -> pa.Table:
        base = {
            "key": t.column("w1"),
            "w1": t.column("w1"),
            "w2": t.column("w2"),
            "cnt": t.column("cnt"),
        }
        for extra in carry:
            base[extra] = pa.nulls(t.num_rows, pa.int64())
        base["kind"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(base)

    def key_bi(t: pa.Table) -> pa.Table:
        cols = {
            "key": t.column(key_from),
            "w1": t.column("w1"),
            "w2": t.column("w2"),
            "cnt": t.column("cnt"),
        }
        for extra in carry:
            cols[extra] = t.column(extra)
        cols["kind"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    unioned = counts_ds.map_batches(
        key_uni, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        bigram_ds.map_batches(key_bi, batch_format="pyarrow", zero_copy_batch=True)
    )

    def merge(g: pa.Table) -> pa.Table:
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        cnts = g.column("cnt").to_numpy(zero_copy_only=False)
        uni_idx = np.nonzero(kind == 0)[0]
        n_key = int(cnts[uni_idx[0]]) if len(uni_idx) else 0
        bi = g.filter(pa.array(kind == 1))
        out = {
            "w1": bi.column("w1"),
            "w2": bi.column("w2"),
            "cnt": bi.column("cnt"),
        }
        for extra in carry:
            out[extra] = bi.column(extra)
        out[out_col] = pa.array(
            np.full(bi.num_rows, n_key, dtype=np.int64), pa.int64()
        )
        return pa.table(out)

    return unioned.groupby("key").map_groups(merge, batch_format="pyarrow")


def collocations(
    ds, *, min_count: int = 5, k: int = 100, text_col: str = "text"
):
    """documents → top-``k`` adjacent word pairs by lift, as an Arrow
    table (rank, w1, w2, n_pair, n_w1, n_w2, lift). Ties break by
    (w1, w2). The sort runs distributed with a per-block top-k prune;
    only the ≤k-row result lands on the driver for rank numbering."""
    if min_count < 1 or k < 1:
        raise ValueError("min_count and k must be ≥ 1")

    counts = (
        ds.map_batches(
            lambda t: _count_partials(t, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["w1", "w2"])
        .sum("cnt")
    )
    counts = counts.map_batches(
        lambda t: t.rename_columns(["w1", "w2", "cnt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # one corpus pass feeds totals + unigrams + bigrams

    import pyarrow.compute as pc

    totals = {
        r["w2"]: r["cnt"]
        for r in counts.map_batches(
            lambda t: t.filter(pc.equal(t.column("w1"), "")),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take_all()
    }
    n_uni, n_bi = totals.get(_TOT_UNI, 0), totals.get(_TOT_BI, 0)

    def split_uni(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.not_equal(t.column("w1"), ""), pc.equal(t.column("w2"), "")
        )
        out = t.filter(m)
        return out.filter(pc.greater_equal(out.column("cnt"), min_count))

    def split_bi(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.not_equal(t.column("w1"), ""), pc.not_equal(t.column("w2"), "")
        )
        out = t.filter(m)
        return out.filter(pc.greater_equal(out.column("cnt"), min_count))

    uni = counts.map_batches(split_uni, batch_format="pyarrow", zero_copy_batch=True)
    bi = counts.map_batches(split_bi, batch_format="pyarrow", zero_copy_batch=True)

    with_n1 = _attach(uni, bi, key_from="w1", out_col="n_w1")
    with_n2 = _attach(
        uni, with_n1, key_from="w2", out_col="n_w2", carry=("n_w1",)
    )

    nu_f, nb_f = np.float64(n_uni), np.float64(max(n_bi, 1))

    def score(t: pa.Table) -> pa.Table:
        cb = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column("n_w1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t.column("n_w2").to_numpy(zero_copy_only=False).astype(np.float64)
        # pinned left-assoc chains — the SQL oracle mirrors op for op
        lift = (cb * nu_f * nu_f) / (c1 * c2 * nb_f)
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "n_pair": t.column("cnt"),
                "n_w1": t.column("n_w1"),
                "n_w2": t.column("n_w2"),
                "lift": pa.array(lift, pa.float64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        # per-block prune (the vocab_topk pattern): the global sort sees
        # ≤ blocks×k rows instead of every surviving bigram
        if t.num_rows <= k:
            return t
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("lift", "descending"),
                ("w1", "ascending"),
                ("w2", "ascending"),
            ],
        )
        return t.take(order[:k])

    topk = (
        with_n2.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(local_topk, batch_size=None, batch_format="pyarrow")
        .sort(["lift", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .take_all()  # ≤ k rows — bounded, declared
    )
    schema = {
        "w1": pa.string(),
        "w2": pa.string(),
        "n_pair": pa.int64(),
        "n_w1": pa.int64(),
        "n_w2": pa.int64(),
        "lift": pa.float64(),
    }
    out = pa.table(
        {name: pa.array([r[name] for r in topk], typ) for name, typ in schema.items()}
    )
    return out.add_column(
        0, "rank", pa.array(np.arange(out.num_rows, dtype=np.int64))
    )
