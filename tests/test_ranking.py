"""TF-IDF keyword extraction, BM25 retrieval, and the keyed KMV sketch.

The float-free-oracle trick these operators rely on — recomputing the
float score identically on both sides from integer inputs — is only sound
if CPython's math.log and DuckDB's ln() agree bit-for-bit on this
toolchain, so that parity is itself a test here.
"""

from __future__ import annotations

import math
import struct
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )


def test_ln_bit_parity_python_vs_duckdb():
    """Load-bearing for the doc_tfidf/docs_bm25 oracles."""
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(7)
    vals = list(rng.random(500) * 1000.0 + 1e-6) + [1.5, 2.0, (500 - 3 + 0.5) / 3.5 + 1]
    for v in vals:
        d = con.execute("SELECT ln(?::DOUBLE)", [float(v)]).fetchone()[0]
        assert struct.pack("d", d) == struct.pack("d", math.log(v))


def _pure_tfidf(rows, k=5, min_df=1):
    """Single-process reference: same tokenizer, same rank rule."""
    df: Counter = Counter()
    toks = {}
    for did, txt in rows:
        toks[did] = (txt or "").lower().split()
        df.update(set(toks[did]))
    n = len(rows)
    out = []
    for did, _ in rows:
        c = Counter(toks[did])
        scored = sorted(
            (-(tf * math.log(n / df[t])), t, tf, df[t])
            for t, tf in c.items()
            if df[t] >= min_df
        )
        for rnk, (_, t, tf, dfv) in enumerate(scored[:k], 1):
            out.append((did, t, tf, dfv, rnk))
    return sorted(out)


def test_tfidf_topk_matches_pure(ray_session, docs_ds):
    import pyarrow.parquet as pq

    from urlmap_ray.functions.ranking import tfidf_topk

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    expected = _pure_tfidf(rows, k=5)
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["df"], r["rnk"])
        for r in tfidf_topk(docs_ds, k=5).take_all()
    )
    assert got == expected


def test_tfidf_min_df_prunes_candidates(ray_session, docs_ds):
    from urlmap_ray.functions.ranking import tfidf_topk

    got = tfidf_topk(docs_ds, k=3, min_df=50).take_all()
    assert got, "pruned run must still produce keywords"
    assert all(r["df"] >= 50 for r in got)
    per_doc: Counter = Counter(r["doc_id"] for r in got)
    assert max(per_doc.values()) <= 3


def _pure_bm25(rows, qt, k=10, k1=1.2, b=0.75):
    toks = {did: (txt or "").lower().split() for did, txt in rows}
    n = len(rows)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfs = [sum(1 for w in toks.values() if t in set(w)) for t in qt]
    scored = []
    for did, _ in rows:
        c = Counter(toks[did])
        s, hit = 0.0, False
        for j, term in enumerate(qt):
            tf = c.get(term, 0)
            if tf == 0:
                continue
            hit = True
            idf = math.log((n - dfs[j] + 0.5) / (dfs[j] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(toks[did]) / avgdl))
        if hit:
            scored.append((-s, did, len(toks[did])))
    scored.sort()
    return [(did, dl, rnk) for rnk, (_, did, dl) in enumerate(scored[:k], 1)]


def test_bm25_topk_matches_pure(ray_session, docs_ds):
    import pyarrow.parquet as pq

    from urlmap_ray.functions.ranking import bm25_topk

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    qt = ["spark", "window", "vector"]
    expected = _pure_bm25(rows, qt, k=10)
    out = bm25_topk(docs_ds, qt, k=10)
    got = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("dl").to_pylist(),
            out.column("rnk").to_pylist(),
        )
    )
    assert got == expected


def test_bm25_rejects_bad_query(ray_session, docs_ds):
    from urlmap_ray.functions.ranking import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(docs_ds, [], k=3)
    with pytest.raises(ValueError):
        bm25_topk(docs_ds, ["a", "a"], k=3)


def test_bm25_no_match_returns_empty(ray_session, docs_ds):
    from urlmap_ray.functions.ranking import bm25_topk

    out = bm25_topk(docs_ds, ["zzznotaterm"], k=5)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "dl", "rnk"]


def test_kmv_per_key_exact_below_saturation(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import kmv_distinct_per_key

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 7, size=20_000)
    vals = rng.integers(0, 400, size=20_000)  # ≤400 distinct per key < k
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(8)
    got = {
        r["k"]: r["n_distinct"]
        for r in kmv_distinct_per_key(ds, key_col="k", col="v", k=1024).take_all()
    }
    expected = {
        int(kk): len({int(v) for v, key in zip(vals, keys) if key == kk})
        for kk in set(keys.tolist())
    }
    assert got == expected


def test_kmv_per_key_string_keys_and_nulls(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import kmv_distinct_per_key

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "b", "b", "a"], pa.string()),
            "v": pa.array(["x", "y", "x", None, "x", "x"], pa.string()),
        }
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in kmv_distinct_per_key(
            ray.data.from_arrow(t), key_col="k", col="v", k=16
        ).take_all()
    }
    assert got == {"a": 2, "b": 1}  # nulls don't count as a distinct value


def test_kmv_per_key_saturated_error_bound(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import kmv_distinct_per_key

    rng = np.random.default_rng(11)
    n_true = 30_000
    vals = rng.permutation(n_true).repeat(2)
    keys = np.zeros(len(vals), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(6)
    k = 1024
    est = kmv_distinct_per_key(ds, key_col="k", col="v", k=k).take_all()[0][
        "n_distinct"
    ]
    rel = abs(est - n_true) / n_true
    assert rel < 5.0 / math.sqrt(k - 2)  # 5σ of the KMV error bound


def test_compression_batch_signal(ray_session):
    from urlmap_ray.functions.textstats import compression_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["abc " * 500, "the quick brown fox", ""], pa.string()),
        }
    )
    out = compression_batch(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # highly repetitive text compresses below 1/4 → flagged
    assert rows[1]["comp_flag"] == 1 and rows[1]["n_zlib"] * 4 < rows[1]["n_bytes"]
    assert rows[2]["comp_flag"] == 0
    assert rows[3]["n_bytes"] == 0 and rows[3]["comp_flag"] == 0
    # deterministic: same input → same compressed size
    again = compression_batch(t)
    assert out.equals(again)


def test_mg_topk_exact_below_capacity(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import mg_topk

    rng = np.random.default_rng(5)
    vals = [f"v{i:03d}" for i in rng.zipf(1.5, size=20_000) % 200]
    t = pa.table({"x": pa.array(vals, pa.string())})
    got = mg_topk(
        ray.data.from_arrow(t).repartition(9), col="x", k=10, capacity=512
    )
    exp = Counter(vals).most_common()
    exp.sort(key=lambda it: (-it[1], it[0]))
    assert list(
        zip(got.column("value").to_pylist(), got.column("n").to_pylist())
    ) == exp[:10]
    assert got.column("rnk").to_pylist() == list(range(1, 11))


def test_mg_topk_error_bound_when_saturated(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import mg_topk

    rng = np.random.default_rng(9)
    n = 30_000
    # one true heavy hitter (20%) over a long uniform tail of 5000 values
    vals = ["HH" if rng.random() < 0.2 else f"t{rng.integers(0, 5000)}"
            for _ in range(n)]
    capacity = 256
    got = mg_topk(
        ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.string())}))
        .repartition(7),
        col="x",
        k=5,
        capacity=capacity,
    )
    true_hh = sum(1 for v in vals if v == "HH")
    row = {v: c for v, c in zip(got.column("value").to_pylist(),
                                got.column("n").to_pylist())}
    assert "HH" in row and got.column("value")[0].as_py() == "HH"
    # MG undercounts by at most n/(capacity+1) per merge level; the
    # summary merges twice (batch → fold), so allow 2× the bound
    assert true_hh - row["HH"] <= 2 * n // (capacity + 1) + 2
    assert row["HH"] <= true_hh


def test_mg_topk_guards(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import mg_topk

    t = pa.table({"x": pa.array(["a"], pa.string())})
    with pytest.raises(ValueError):
        mg_topk(ray.data.from_arrow(t), col="x", k=0)
    with pytest.raises(ValueError):
        mg_topk(ray.data.from_arrow(t), col="x", k=10, capacity=5)


def test_quantile_sketch_exact_below_saturation(ray_session):
    import ray.data

    from urlmap_ray.functions.quantiles import exact_quantiles
    from urlmap_ray.functions.sketch import quantile_sketch

    rng = np.random.default_rng(13)
    vals = rng.integers(0, 10_000, size=5_000)
    t = pa.table({"x": pa.array(vals, pa.int64())})
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    ds = ray.data.from_arrow(t).repartition(6)
    got = quantile_sketch(ds, col="x", qs=qs, capacity=32768)
    exact = exact_quantiles(ray.data.from_arrow(t), "x", qs)
    assert got.equals(exact)


def test_quantile_sketch_rank_error_when_saturated(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import quantile_sketch

    rng = np.random.default_rng(17)
    n, capacity = 50_000, 512
    vals = np.sort(rng.integers(0, 10**9, size=n))
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(rng.permutation(vals), pa.int64())})
    ).repartition(8)
    qs = [0.1, 0.5, 0.9]
    got = quantile_sketch(ds, col="x", qs=qs, capacity=capacity)
    for q, v in zip(qs, got.column("x").to_pylist()):
        true_rank = np.searchsorted(vals, v, side="right") / n
        # two compaction levels → rank error ≲ 2 · 1/(2·capacity) per
        # level; allow a generous 4/capacity plus discreteness slack
        assert abs(true_rank - q) < 4.0 / capacity + 0.01, (q, true_rank)


def test_quantile_sketch_guards(ray_session):
    import ray.data

    from urlmap_ray.functions.sketch import quantile_sketch

    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError):
        quantile_sketch(ray.data.from_arrow(t), col="x", qs=[])
    with pytest.raises(ValueError):
        quantile_sketch(ray.data.from_arrow(t), col="x", qs=[0.5], capacity=1)
    with pytest.raises(ValueError):
        quantile_sketch(ray.data.from_arrow(t), col="x", qs=[1.5])


def test_mg_folded_driver_input_bounded_many_batches(ray_session):
    """VERDICT r2 #2: the driver fold's input must be bounded by
    n_buckets × capacity regardless of batch count — force ≥100 batches
    with far more distinct values than capacity and count the folded rows."""
    import ray.data

    from urlmap_ray.functions.sketch import mg_folded, mg_topk

    rng = np.random.default_rng(23)
    n, capacity, n_buckets = 30_000, 64, 8
    vals = ["HH" if rng.random() < 0.25 else f"t{rng.integers(0, 5000)}"
            for _ in range(n)]
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.string())})
    ).repartition(100)
    folded = mg_folded(ds, col="x", capacity=capacity, n_buckets=n_buckets)
    assert folded.count() <= n_buckets * capacity
    got = mg_topk(ds, col="x", k=3, capacity=capacity, n_buckets=n_buckets)
    # the 25% heavy hitter must survive a 100-way merge tree at rank 1
    assert got.column("value")[0].as_py() == "HH"
    true_hh = sum(1 for v in vals if v == "HH")
    assert got.column("n")[0].as_py() <= true_hh
    assert true_hh - got.column("n")[0].as_py() <= 2 * n // (capacity + 1) + 2


def test_quantile_summaries_driver_input_bounded_many_batches(ray_session):
    """Same bound for the quantile sketch: ≥100 batches, driver-fold input
    ≤ n_buckets × capacity rows, rank error within the two-level bound."""
    import ray.data

    from urlmap_ray.functions.sketch import quantile_sketch, quantile_summaries

    rng = np.random.default_rng(29)
    n, capacity, n_buckets = 40_000, 128, 16
    vals = np.sort(rng.integers(0, 10**9, size=n))
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(rng.permutation(vals), pa.int64())})
    ).repartition(100)
    parts = quantile_summaries(ds, col="x", capacity=capacity,
                               n_buckets=n_buckets)
    assert parts.count() <= n_buckets * capacity
    qs = [0.1, 0.5, 0.9]
    got = quantile_sketch(ds, col="x", qs=qs, capacity=capacity,
                          n_buckets=n_buckets)
    for q, v in zip(qs, got.column("x").to_pylist()):
        true_rank = np.searchsorted(vals, v, side="right") / n
        assert abs(true_rank - q) < 4.0 / capacity + 0.01, (q, true_rank)


def test_tfidf_max_vocab_bounds_broadcast(ray_session):
    """VERDICT r2 #3: the broadcast vocabulary is hard-capped at max_vocab.
    Overflow keeps the lowest-df terms, warns loudly, and matches the
    uncapped run restricted to the kept vocabulary."""
    import warnings

    import ray.data

    from urlmap_ray.functions.ranking import tfidf_topk

    docs = [
        # "common" appears everywhere (highest df → first to be cut);
        # raretag_i are per-doc hapaxes (df=1 → always kept)
        {"doc_id": i, "text": f"common shared{i % 3} raretag{i} raretag{i}"}
        for i in range(12)
    ]
    ds = ray.data.from_items(docs).repartition(4)
    full = tfidf_topk(ds, k=3).take_all()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        capped = tfidf_topk(ds, k=3, max_vocab=15).take_all()
    assert any("max_vocab" in str(x.message) for x in w)
    kept_vocab = {r["term"] for r in capped}
    assert "common" not in kept_vocab  # highest-df term was the one cut
    assert len(kept_vocab) <= 15
    # capped result == uncapped result with the cut term removed, re-ranked
    expect = {}
    for r in full:
        if r["term"] == "common":
            continue
        expect.setdefault(r["doc_id"], []).append((r["rnk"], r["term"], r["tf"], r["df"]))
    got = {}
    for r in capped:
        got.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["df"]))
    for did, rows in expect.items():
        rows.sort()
        assert got[did] == [(t, tf, df) for _, t, tf, df in rows[:3]]


def test_tfidf_max_vocab_guard(ray_session):
    import ray.data

    from urlmap_ray.functions.ranking import tfidf_topk

    ds = ray.data.from_items([{"doc_id": 1, "text": "a"}])
    with pytest.raises(ValueError):
        tfidf_topk(ds, max_vocab=0)


def test_build_postings_exact_and_capped(ray_session):
    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.ranking import build_postings

    # 40 docs: "common" in all, "rare" in 3, "mid" in docs 10..19,
    # "solo" in 1 (falls to min_df)
    texts = []
    for i in range(40):
        words = ["common"]
        if i in (7, 21, 33):
            words.append("rare")
        if 10 <= i < 20:
            words.append("mid")
        if i == 5:
            words.append("solo")
        texts.append(" ".join(words))
    docs = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = {
        r["term"]: (r["df"], r["postings"])
        for r in build_postings(
            ray.data.from_arrow(docs).repartition(6), min_df=2, max_postings=5
        ).take_all()
    }
    assert "solo" not in out  # min_df prune AFTER exact df
    assert out["rare"] == (3, "7,21,33")
    # df is exact beyond the cap; postings = the 5 SMALLEST doc ids
    assert out["common"] == (40, "0,1,2,3,4")
    assert out["mid"] == (10, "10,11,12,13,14")
    # partitioning independence (bounded partials merge to the same cap set)
    out1 = build_postings(
        ray.data.from_arrow(docs), min_df=2, max_postings=5
    ).take_all()
    assert {r["term"]: (r["df"], r["postings"]) for r in out1} == out
    with pytest.raises(ValueError):
        build_postings(ray.data.from_arrow(docs), max_postings=0)
