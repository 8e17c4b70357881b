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
- unigram counts attach to bigram rows in ONE fused pad→union→groupby
  pass (the as-of-join shape, joins.py): each bigram enters the union
  TWICE — once keyed by w1, once by w2 — so both word counts resolve in
  a single exchange; a vectorized groupby(w1,w2).sum() then recombines
  the two halves (exact int64 partials, so the recombine is a pure hash
  aggregation, no map_groups). The exchange is pre-aggregated count
  rows, never tokens.
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


def _attach_both(counts_ds, bigram_ds):
    """ONE pad→union→groupby pass resolving BOTH word counts: every bigram
    row enters the union twice — side 1 keyed by w1, side 2 keyed by w2 —
    alongside the unigram count rows (side 0, key = the word). Per key
    group, each bigram copy picks up that word's unigram count as an int64
    partial (n_w1p or n_w2p, the other zero; cnt carried only on side 1 so
    a plain Sum recombines without doubling). Returns rows
    (w1, w2, cnt_part, n_w1p, n_w2p) ready for groupby(w1, w2).sum()."""

    def key_uni(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("w1"),
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "cnt": t.column("cnt"),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def key_bi_both(t: pa.Table) -> pa.Table:
        halves = []
        for side, key_col in ((1, "w1"), (2, "w2")):
            halves.append(
                pa.table(
                    {
                        "key": t.column(key_col),
                        "w1": t.column("w1"),
                        "w2": t.column("w2"),
                        "cnt": t.column("cnt"),
                        "side": pa.array(
                            np.full(t.num_rows, side, dtype=np.int8)
                        ),
                    }
                )
            )
        return pa.concat_tables(halves)

    unioned = counts_ds.map_batches(
        key_uni, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        bigram_ds.map_batches(
            key_bi_both, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def merge(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        cnts = g.column("cnt").to_numpy(zero_copy_only=False)
        uni_idx = np.nonzero(side == 0)[0]
        n_key = np.int64(cnts[uni_idx[0]]) if len(uni_idx) else np.int64(0)
        bi = g.filter(pa.array(side != 0))
        bside = bi.column("side").to_numpy(zero_copy_only=False)
        bcnt = bi.column("cnt").to_numpy(zero_copy_only=False)
        is1 = bside == 1
        return pa.table(
            {
                "w1": bi.column("w1"),
                "w2": bi.column("w2"),
                "cnt_part": pa.array(np.where(is1, bcnt, 0), pa.int64()),
                "n_w1p": pa.array(np.where(is1, n_key, 0), pa.int64()),
                "n_w2p": pa.array(np.where(is1, 0, n_key), pa.int64()),
            }
        )

    return unioned.groupby("key").map_groups(merge, batch_format="pyarrow")


# Declared driver bound for the broadcast fast path: up to this many
# min_count-pruned unigram rows may land on the driver and broadcast as one
# sorted lookup (~tens of MB at the bound). Above it, the fused distributed
# attach runs instead — same results bit-for-bit (exact int counts, pinned
# float chain), asserted by test_collocations_modes_identical.
BROADCAST_MAX_UNIGRAMS = 2_000_000


def collocations(
    ds,
    *,
    min_count: int = 5,
    k: int = 100,
    text_col: str = "text",
    broadcast_max_unigrams: int = BROADCAST_MAX_UNIGRAMS,
):
    """documents → top-``k`` adjacent word pairs by lift, as an Arrow
    table (rank, w1, w2, n_pair, n_w1, n_w2, lift). Ties break by
    (w1, w2). The sort runs distributed with a per-block top-k prune;
    only the ≤k-row result lands on the driver for rank numbering.

    Hybrid attach (the repo's crawl-gate / pagerank-mode pattern): when
    the pruned unigram table fits the declared ``broadcast_max_unigrams``
    bound it broadcasts once and bigram scoring is a single streaming
    probe (no attach exchange); above the bound the one fused
    pad→union→groupby attach plus an int64 hash-agg recombine runs —
    zero driver state, the 100-TB path."""
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

    def head_rows(t: pa.Table) -> pa.Table:
        # corpus-total sentinels (w1 == "") + min_count-pruned unigram rows
        is_tot = pc.equal(t.column("w1"), "")
        is_uni = pc.and_(
            pc.and_(
                pc.not_equal(t.column("w1"), ""), pc.equal(t.column("w2"), "")
            ),
            pc.greater_equal(t.column("cnt"), min_count),
        )
        return t.filter(pc.or_(is_tot, is_uni))

    head = (
        counts.map_batches(head_rows, batch_format="pyarrow", zero_copy_batch=True)
        .limit(broadcast_max_unigrams + 3)
        .take_all()  # ≤ broadcast_max_unigrams+3 rows — bounded, declared
    )
    truncated = len(head) >= broadcast_max_unigrams + 3
    totals = {r["w2"]: r["cnt"] for r in head if r["w1"] == ""}

    def split_bi(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.not_equal(t.column("w1"), ""), pc.not_equal(t.column("w2"), "")
        )
        out = t.filter(m)
        return out.filter(pc.greater_equal(out.column("cnt"), min_count))

    bi = counts.map_batches(split_bi, batch_format="pyarrow", zero_copy_batch=True)

    if truncated or _TOT_UNI not in totals:
        # ---- distributed attach: the 100-TB path, zero driver state ----
        totals = {
            r["w2"]: r["cnt"]
            for r in counts.map_batches(
                lambda t: t.filter(pc.equal(t.column("w1"), "")),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).take_all()
        }
        n_uni, n_bi = totals.get(_TOT_UNI, 0), totals.get(_TOT_BI, 0)
        nu_f, nb_f = np.float64(n_uni), np.float64(max(n_bi, 1))

        def split_uni(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.not_equal(t.column("w1"), ""), pc.equal(t.column("w2"), "")
            )
            out = t.filter(m)
            return out.filter(pc.greater_equal(out.column("cnt"), min_count))

        uni = counts.map_batches(
            split_uni, batch_format="pyarrow", zero_copy_batch=True
        )

        # one fused attach exchange, then an exact-int64 hash-agg recombine
        # — the two halves of each bigram (its w1 count and its w2 count)
        # meet again under the (w1, w2) key with plain sums
        with_n2 = (
            _attach_both(uni, bi)
            .groupby(["w1", "w2"])
            .sum(["cnt_part", "n_w1p", "n_w2p"])
        )

        def score(t: pa.Table) -> pa.Table:
            t = t.rename_columns(["w1", "w2", "cnt", "n_w1", "n_w2"])
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

        scored = with_n2.map_batches(
            score, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        # ---- broadcast fast path: LUT fits the declared bound ----
        import ray

        n_uni, n_bi = totals.get(_TOT_UNI, 0), totals.get(_TOT_BI, 0)
        nu_f, nb_f = np.float64(n_uni), np.float64(max(n_bi, 1))
        words = np.array(
            [r["w1"] for r in head if r["w1"] != ""], dtype=object
        )
        wcnts = np.array(
            [r["cnt"] for r in head if r["w1"] != ""], dtype=np.int64
        )
        lut_ref = ray.put((words, wcnts))  # ships ONCE, read per task

        def score_direct(t: pa.Table) -> pa.Table:
            import pandas as pd

            ws, cs = ray.get(lut_ref)
            idx = pd.Index(ws)
            # every surviving bigram's words are in the LUT by construction
            # (each occurs ≥ its bigram's count ≥ min_count)
            i1 = idx.get_indexer(t.column("w1").to_numpy(zero_copy_only=False))
            i2 = idx.get_indexer(t.column("w2").to_numpy(zero_copy_only=False))
            c1i = cs[np.maximum(i1, 0)]
            c2i = cs[np.maximum(i2, 0)]
            cb = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
            # the SAME pinned left-assoc chain as the distributed branch
            lift = (cb * nu_f * nu_f) / (
                c1i.astype(np.float64) * c2i.astype(np.float64) * nb_f
            )
            return pa.table(
                {
                    "w1": t.column("w1"),
                    "w2": t.column("w2"),
                    "n_pair": t.column("cnt"),
                    "n_w1": pa.array(c1i, pa.int64()),
                    "n_w2": pa.array(c2i, pa.int64()),
                    "lift": pa.array(lift, pa.float64()),
                }
            )

        scored = bi.map_batches(
            score_direct, batch_format="pyarrow", zero_copy_batch=True
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
        scored
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
