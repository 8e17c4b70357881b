"""Property-based invariants for the aggregate/scan operator families.

Each property is checked on randomized small tables AND across different
partitionings — the load-bearing claim for every operator here is that
results are independent of how Ray splits the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

SETTINGS = dict(max_examples=8, deadline=None)


def _events(rng_seed: int, n: int) -> pa.Table:
    rng = np.random.default_rng(rng_seed)
    return pa.table(
        {
            "user_id": pa.array(rng.integers(0, 6, n), pa.int64()),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(rng.integers(0, 10**9, n), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "cents": pa.array(rng.integers(-500, 500, n), pa.int64()),
            "cat": pa.array(
                [["a", "b", "c"][i] for i in rng.integers(0, 3, n)], pa.string()
            ),
        }
    )


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(2, 300), parts=st.integers(1, 7))
def test_pivot_reconciles_and_partition_independent(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.pivot import pivot_counts

    t = _events(seed, n)
    ds = ray.data.from_arrow(t).repartition(parts)
    rows = pivot_counts(
        ds, key_col="user_id", cat_col="cat", categories=["a", "b"]
    ).take_all()
    # every input row lands in exactly one output cell
    assert sum(r["n_a"] + r["n_b"] + r["n_other"] for r in rows) == n
    base = pivot_counts(
        ray.data.from_arrow(t), key_col="user_id", cat_col="cat",
        categories=["a", "b"],
    ).take_all()
    assert sorted(map(str, rows)) == sorted(map(str, base))


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(1, 300), parts=st.integers(1, 7))
def test_rollup_cube_level_sums_equal_total(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.pivot import cube_counts, rollup_counts

    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "x": pa.array([["p", "q"][i] for i in rng.integers(0, 2, n)]),
            "y": pa.array([["u", "v", "w"][i] for i in rng.integers(0, 3, n)]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(parts)
    roll = rollup_counts(ds, keys=["x", "y"]).take_all()
    for lvl in (0, 1, 2):
        assert sum(r["n_rows"] for r in roll if r["lvl"] == lvl) == n
    cube = cube_counts(ds, keys=["x", "y"]).take_all()
    for grp in (0, 1, 2, 3):
        assert sum(r["n_rows"] for r in cube if r["grp"] == grp) == n
    # ROLLUP ⊂ CUBE: the shared grouping sets agree cell-by-cell
    cube_cells = {(r["x"], r["y"], r["n_rows"]) for r in cube if r["grp"] in (0, 1, 3)}
    roll_cells = {(r["x"], r["y"], r["n_rows"]) for r in roll}
    assert roll_cells == cube_cells


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(1, 300), parts=st.integers(1, 7))
def test_scan_family_invariants(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.windows import lag_lead, rolling_sum, running_total

    t = _events(seed, n)
    ds = ray.data.from_arrow(t).repartition(parts)
    import collections

    run = running_total(ds, sum_col="cents").take_all()
    # each key's full-prefix sum (its exact total) appears in its scan
    sums: collections.Counter = collections.Counter()
    for uid, c in zip(
        t.column("user_id").to_pylist(), t.column("cents").to_pylist()
    ):
        sums[uid] += c
    run_vals = collections.defaultdict(set)
    for r in run:
        run_vals[r["user_id"]].add(r["run_cents"])
    assert set(run_vals) == set(sums)
    for uid in sums:
        assert sums[uid] in run_vals[uid]

    # rolling with a frame >= key size degenerates to running_total
    roll = rolling_sum(ds, sum_col="cents", window_rows=n + 1).take_all()
    assert sorted(
        (r["user_id"], r["event_id"], r["cents"], r["roll_cents"]) for r in roll
    ) == sorted(
        (r["user_id"], r["event_id"], r["cents"], r["run_cents"]) for r in run
    )

    # lag/lead: every key has at least one start (prev=default) and one
    # end (next=default) boundary row
    ll = lag_lead(ds, val_col="cents", default=10**9).take_all()
    by_key = collections.defaultdict(list)
    for r in ll:
        by_key[r["user_id"]].append(r)
    for rows in by_key.values():
        assert sum(1 for r in rows if r["prev_cents"] == 10**9) == 1
        assert sum(1 for r in rows if r["next_cents"] == 10**9) == 1


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(1, 400), parts=st.integers(1, 7))
def test_kmv_per_key_exact_when_unsaturated(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.sketch import kmv_distinct_per_key

    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 4, n)
    vals = rng.integers(0, 200, n)
    t = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    got = {
        r["k"]: r["n_distinct"]
        for r in kmv_distinct_per_key(
            ray.data.from_arrow(t).repartition(parts), key_col="k", col="v", k=512
        ).take_all()
    }
    exp: dict = {}
    for kk, vv in zip(keys.tolist(), vals.tolist()):
        exp.setdefault(kk, set()).add(vv)
    assert got == {kk: len(s) for kk, s in exp.items()}


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(1, 200), parts=st.integers(1, 7))
def test_collect_sorted_counts(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.windows import collect_sorted

    t = _events(seed, n)
    out = collect_sorted(
        ray.data.from_arrow(t).repartition(parts),
        key_col="user_id",
        val_col="cat",
        distinct=True,
    ).take_all()
    for r in out:
        vals = r["vals"].split(",")
        assert vals == sorted(set(vals)) and r["n_vals"] == len(vals)


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(1, 300), parts=st.integers(1, 7))
def test_ntile_partition_independent_and_balanced(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.windows import ntile

    t = _events(seed, n)
    base = ntile(
        ray.data.from_arrow(t), order_col="cents", n=4
    ).take_all()
    split = ntile(
        ray.data.from_arrow(t).repartition(parts), order_col="cents", n=4
    ).take_all()
    assert sorted(map(str, base)) == sorted(map(str, split))
    import collections

    per = collections.Counter((r["user_id"], r["bucket"]) for r in base)
    for uid in {r["user_id"] for r in base}:
        sizes = [per[(uid, b)] for b in (1, 2, 3, 4) if (uid, b) in per]
        assert max(sizes) - min(sizes) <= 1


def test_task_failure_retry_is_bit_deterministic(ray_session, tmp_path):
    """A map_batches task whose WORKER DIES on its first attempt (per
    block) must, after Ray's default task retry, produce output
    bit-identical to a crash-free run — the property that makes every
    operator here safe on a cluster where workers die. SIGKILL (not an
    exception: Ray only auto-retries system failures) is injected via a
    marker file per block so exactly the first attempt of each task
    dies."""
    import os
    import signal

    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.sampling import hash_shuffle

    marker_dir = str(tmp_path / "attempts")
    os.makedirs(marker_dir, exist_ok=True)

    def flaky_identity(t: pa.Table) -> pa.Table:
        key = int(t.column("doc_id")[0].as_py())
        marker = os.path.join(marker_dir, f"block-{key}")
        if not os.path.exists(marker):
            fd = os.open(marker, os.O_CREAT | os.O_WRONLY)
            os.fsync(fd)
            os.close(fd)
            os.kill(os.getpid(), signal.SIGKILL)  # simulated node loss
        return t

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(400)), pa.int64()),
            "text": pa.array([f"body {i % 37} tok" for i in range(400)], pa.string()),
        }
    )
    flaky = ray.data.from_arrow(docs).repartition(8).map_batches(
        flaky_identity, batch_format="pyarrow", zero_copy_batch=True
    )
    got = {
        r["doc_id"]: (r["pos"], r["shard"])
        for r in hash_shuffle(flaky, n_shards=4, id_col="doc_id", salt="ft").take_all()
    }
    clean = {
        r["doc_id"]: (r["pos"], r["shard"])
        for r in hash_shuffle(
            ray.data.from_arrow(docs), n_shards=4, id_col="doc_id", salt="ft"
        ).take_all()
    }
    assert got == clean and len(got) == 400
    assert len(os.listdir(marker_dir)) == 8  # every block really failed once


def test_pii_chain_matches_duckdb_on_fuzzed_text():
    """Cross-engine property: the Arrow RE2 redaction chain and the same
    chain in DuckDB's regexp_replace produce byte-identical output and
    counts on adversarial generated text — the contract the docs_pii
    oracle relies on, checked beyond the synthetic corpus."""
    import random

    import duckdb
    import pyarrow as pa

    from urlmap_ray.functions.pii import PII_RULES, redact_pii_batch

    rng = random.Random(20260818)
    frags = [
        "a@b.co", "x.y+z@mail.example.org", "@", "a@b", "1.2.3.4",
        "255.255.255.255", "999.999.999.999", "1.2.3.4.5", "123-45-6789",
        "12-345-6789", "(555) 123-4567", "555.123.4567", "555 123 4567",
        "5551234567", "word", "{n}", "<EMAIL>", "a@b.cd e@f.gh",
        "ip:10.0.0.1,ssn:078-05-1120.", "tel (020) 795-0000x",
    ]
    texts = [
        " ".join(rng.choices(frags, k=rng.randint(0, 12))) for _ in range(300)
    ] + [None, ""]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    engine = redact_pii_batch(t).to_pylist()

    con = duckdb.connect()
    con.register("docs", t)
    sql_t = "text"
    selects = []
    for name, pat, tok in PII_RULES:
        esc = pat.replace("'", "''")
        selects.append(
            f"CAST(len(regexp_extract_all({sql_t}, '{esc}')) AS BIGINT) AS n_{name}"
        )
        sql_t = f"regexp_replace({sql_t}, '{esc}', '{tok}', 'g')"
    q = f"SELECT doc_id, {', '.join(selects)}, {sql_t} AS text_redacted FROM docs"
    oracle = con.execute(q).df().to_dict("records")
    import math

    for e, o in zip(engine, oracle):
        assert e["text_redacted"] == (
            None if (isinstance(o["text_redacted"], float) and math.isnan(o["text_redacted"])) else o["text_redacted"]
        ), (e, o)
        for name, _, _ in PII_RULES:
            ec, oc = e[f"n_{name}"], o[f"n_{name}"]
            if ec is None:
                assert oc is None or (isinstance(oc, float) and math.isnan(oc))
            else:
                assert ec == int(oc), (name, e, o)


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(2, 400), parts=st.integers(1, 7))
def test_cross_moments_matches_fraction_exact_reference(ray_session, seed, n, parts):
    import math
    from fractions import Fraction

    import ray.data

    from urlmap_ray.functions.profile import cross_moments

    rng = np.random.default_rng(seed)
    x = rng.integers(-(1 << 20), 1 << 20, n)
    y = rng.integers(-(1 << 20), 1 << 20, n)
    t = pa.table({"x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())})
    (row,) = cross_moments(
        ray.data.from_arrow(t).repartition(parts), cols=["x", "y"]
    ).take_all()
    # exact-integer reference through Fractions, then the pinned chain
    xs, ys = [int(v) for v in x], [int(v) for v in y]
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    d1 = n * sum(a * a for a in xs) - sum(xs) ** 2
    d2 = n * sum(b * b for b in ys) - sum(ys) ** 2
    if d1 > 0 and d2 > 0:
        want = math.floor(
            float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2))) * 1e9 + 0.5
        )
        assert row["corr_ppb"] == want
        # |corr| <= 1 up to the half-ppb rounding
        assert abs(row["corr_ppb"]) <= 1_000_000_001
        assert Fraction(num) ** 2 <= Fraction(d1) * Fraction(d2)
    else:
        assert row["corr_ppb"] is None
    assert row["n_rows"] == n


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(1, 500), parts=st.integers(1, 7))
def test_bloom_no_false_negatives_and_merge_identity(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.sketch import (
        bloom_build,
        bloom_contains,
        hash64_column,
    )

    rng = np.random.default_rng(seed)
    vals = rng.integers(-(1 << 40), 1 << 40, n)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    bm = bloom_build(ray.data.from_arrow(t).repartition(parts), col="v", m_bits=1 << 16)
    one = bloom_build(ray.data.from_arrow(t), col="v", m_bits=1 << 16)
    # bit-OR fold: identical bitmap at any partitioning
    assert bm.tobytes() == one.tobytes()
    # no false negatives, for any data and any split
    assert bloom_contains(bm, hash64_column(pa.array(vals, pa.int64()))).all()


@settings(**SETTINGS)
@given(seed=st.integers(0, 10**6), n=st.integers(1, 400), parts=st.integers(1, 7))
def test_rolling_kmv_below_saturation_equals_exact(ray_session, seed, n, parts):
    import ray.data

    from urlmap_ray.functions.sketch import kmv_rolling_distinct

    rng = np.random.default_rng(seed)
    days = rng.integers(0, 12, n)
    vals = rng.integers(0, 50, n)
    t = pa.table(
        {"d": pa.array(days, pa.int64()), "v": pa.array(vals, pa.int64())}
    )
    rows = kmv_rolling_distinct(
        ray.data.from_arrow(t).repartition(parts),
        day_col="d",
        col="v",
        window=3,
        k=512,
    ).take_all()
    got = {r["day"]: r["n_distinct"] for r in rows}
    want = {
        d: len(set(vals[(days >= d - 2) & (days <= d)].tolist()))
        for d in sorted(set(days.tolist()))
    }
    assert got == want  # exact below saturation, any partitioning
