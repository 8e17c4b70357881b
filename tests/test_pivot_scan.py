"""Pivot (long→wide counts) and running-total (per-key ordered scan)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_pivot_counts_matches_pandas(ray_session, events_pd):
    import ray.data

    from urlmap_ray.functions.pivot import pivot_counts

    cats = ["click", "view", "purchase", "signup", "error"]
    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    )
    got = (
        pivot_counts(ds, key_col="user_id", cat_col="event_type", categories=cats)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pv = (
        events_pd.pivot_table(
            index="user_id",
            columns="event_type",
            values="event_id",
            aggfunc="count",
            fill_value=0,
        )
        .reindex(columns=cats, fill_value=0)
        .reset_index()
    )
    pv.columns = ["user_id"] + [f"n_{c}" for c in cats]
    pv["n_other"] = 0
    got = got[pv.columns.tolist()]
    assert got.astype("int64").equals(pv.astype("int64"))
    # totals reconcile: every event landed somewhere
    assert int(got.drop(columns="user_id").to_numpy().sum()) == len(events_pd)


def test_pivot_counts_other_and_strict(ray_session):
    import ray.data

    from urlmap_ray.functions.pivot import pivot_counts

    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "c": pa.array(["a", "b", "a", "zzz", "zzz"], pa.string()),
        }
    )
    got = {
        r["k"]: (r["n_a"], r["n_other"])
        for r in pivot_counts(
            ray.data.from_arrow(t), key_col="k", cat_col="c", categories=["a"]
        ).take_all()
    }
    assert got == {1: (1, 1), 2: (1, 2)}
    with pytest.raises((ValueError, Exception)):
        pivot_counts(
            ray.data.from_arrow(t),
            key_col="k",
            cat_col="c",
            categories=["a"],
            other_col=None,
        ).take_all()
    with pytest.raises(ValueError):
        pivot_counts(ray.data.from_arrow(t), key_col="k", cat_col="c", categories=[])


def test_running_total_matches_pandas(ray_session, events_pd):
    import ray.data

    from urlmap_ray.functions.windows import running_total

    def cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.floor(pc.multiply(t.column("value"), 100.0))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts": t.column("ts"),
                "cents": c.cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    got = (
        running_total(
            ds, key_col="user_id", ts_col="ts", sum_col="cents",
            tiebreak_col="event_id",
        )
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = events_pd.copy()
    exp["cents"] = np.floor(exp["value"] * 100.0).astype("int64")
    exp = exp.sort_values(["user_id", "ts", "event_id"])
    exp["run_cents"] = exp.groupby("user_id")["cents"].cumsum()
    exp = (
        exp[["user_id", "event_id", "cents", "run_cents"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(exp.astype("int64"))


def test_running_total_rejects_float_sum(ray_session):
    import ray.data

    from urlmap_ray.functions.windows import running_total

    t = pa.table(
        {
            "user_id": pa.array([1, 1], pa.int64()),
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
            "v": pa.array([1.5, 2.5], pa.float64()),
        }
    )
    with pytest.raises(Exception, match="must be integer"):
        running_total(
            ray.data.from_arrow(t), key_col="user_id", ts_col="ts",
            sum_col="v", tiebreak_col="event_id",
        ).take_all()


def test_rollup_counts_matches_pandas(ray_session):
    import ray.data

    from urlmap_ray.functions.pivot import rollup_counts

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source", "lang"])
    df = docs.to_pandas()
    ds = ray.data.from_arrow(docs).repartition(5)
    got = {
        (r["source"], r["lang"], r["lvl"]): r["n_rows"]
        for r in rollup_counts(ds, keys=["source", "lang"]).take_all()
    }
    exp: dict = {}
    for (s, l), n in df.groupby(["source", "lang"]).size().items():
        exp[(s, l, 2)] = int(n)
    for s, n in df.groupby("source").size().items():
        exp[(s, "(all)", 1)] = int(n)
    exp[("(all)", "(all)", 0)] = len(df)
    assert got == exp


def test_rollup_counts_guards(ray_session):
    import ray.data

    from urlmap_ray.functions.pivot import rollup_counts

    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError):
        rollup_counts(ray.data.from_arrow(t), keys=[])
    with pytest.raises(Exception, match="string column"):
        rollup_counts(ray.data.from_arrow(t), keys=["a"]).take_all()


def test_lag_lead_matches_pandas(ray_session, events_pd):
    import ray.data

    from urlmap_ray.functions.windows import lag_lead

    def cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.floor(pc.multiply(t.column("value"), 100.0))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts": t.column("ts"),
                "cents": c.cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    got = (
        lag_lead(
            ds, key_col="user_id", ts_col="ts", val_col="cents",
            tiebreak_col="event_id", default=-1,
        )
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = events_pd.copy()
    exp["cents"] = np.floor(exp["value"] * 100.0).astype("int64")
    exp = exp.sort_values(["user_id", "ts", "event_id"])
    g = exp.groupby("user_id")["cents"]
    exp["prev_cents"] = g.shift(1, fill_value=-1).astype("int64")
    exp["next_cents"] = g.shift(-1, fill_value=-1).astype("int64")
    exp = (
        exp[["user_id", "event_id", "cents", "prev_cents", "next_cents"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(exp.astype("int64"))


def test_collect_sorted_matches_pandas(ray_session, events_pd):
    import ray.data

    from urlmap_ray.functions.windows import collect_sorted

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type"]
    ).repartition(7)
    got = {
        r["user_id"]: (r["vals"], r["n_vals"])
        for r in collect_sorted(
            ds, key_col="user_id", val_col="event_type", distinct=True
        ).take_all()
    }
    exp = {
        int(u): (",".join(sorted(set(g))), len(set(g)))
        for u, g in events_pd.groupby("user_id")["event_type"]
    }
    assert got == exp


def test_collect_sorted_guards(ray_session):
    import ray.data

    from urlmap_ray.functions.windows import collect_sorted

    t = pa.table(
        {"k": pa.array([1, 1], pa.int64()), "v": pa.array(["a,b", "c"], pa.string())}
    )
    with pytest.raises(Exception, match="separator"):
        collect_sorted(
            ray.data.from_arrow(t), key_col="k", val_col="v"
        ).take_all()
    t2 = pa.table(
        {"k": pa.array([1], pa.int64()), "v": pa.array([3], pa.int64())}
    )
    with pytest.raises(Exception, match="must be string"):
        collect_sorted(
            ray.data.from_arrow(t2), key_col="k", val_col="v"
        ).take_all()


def test_cube_counts_matches_pandas(ray_session):
    import ray.data

    from urlmap_ray.functions.pivot import cube_counts

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source", "lang"])
    df = docs.to_pandas()
    ds = ray.data.from_arrow(docs).repartition(4)
    got = {
        (r["source"], r["lang"], r["grp"]): r["n_rows"]
        for r in cube_counts(ds, keys=["source", "lang"]).take_all()
    }
    exp: dict = {}
    for (s, l), n in df.groupby(["source", "lang"]).size().items():
        exp[(s, l, 0)] = int(n)
    for s, n in df.groupby("source").size().items():
        exp[(s, "(all)", 1)] = int(n)  # lang rolled up → low bit
    for l, n in df.groupby("lang").size().items():
        exp[("(all)", l, 2)] = int(n)  # source rolled up → high bit
    exp[("(all)", "(all)", 3)] = len(df)
    assert got == exp


def test_rolling_sum_matches_pandas(ray_session, events_pd):
    import ray.data

    from urlmap_ray.functions.windows import rolling_sum

    def cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.floor(pc.multiply(t.column("value"), 100.0))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts": t.column("ts"),
                "cents": c.cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    got = (
        rolling_sum(
            ds, key_col="user_id", ts_col="ts", sum_col="cents",
            window_rows=5, tiebreak_col="event_id",
        )
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = events_pd.copy()
    exp["cents"] = np.floor(exp["value"] * 100.0).astype("int64")
    exp = exp.sort_values(["user_id", "ts", "event_id"])
    exp["roll_cents"] = (
        exp.groupby("user_id")["cents"]
        .rolling(5, min_periods=1).sum().reset_index(level=0, drop=True)
        .astype("int64")
    )
    exp = (
        exp[["user_id", "event_id", "cents", "roll_cents"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(exp.astype("int64"))
    with pytest.raises(ValueError, match="window_rows"):
        rolling_sum(ds, key_col="user_id", ts_col="ts", sum_col="cents",
                    window_rows=0)


def test_ntile_matches_pandas(ray_session, events_pd):
    import ray.data

    from urlmap_ray.functions.windows import ntile

    def cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.floor(pc.multiply(t.column("value"), 100.0))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "cents": c.cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "value"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    got = (
        ntile(ds, key_col="user_id", order_col="cents", n=4,
              tiebreak_col="event_id")
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = events_pd.copy()
    exp["cents"] = np.floor(exp["value"] * 100.0).astype("int64")
    exp = exp.sort_values(["user_id", "cents", "event_id"])

    def buckets(g):
        rows = len(g)
        base, extra = divmod(rows, 4)
        sizes = [base + 1] * extra + [base] * (4 - extra)
        out = []
        for b, s in enumerate(sizes, 1):
            out.extend([b] * s)
        return out[:rows]

    exp["bucket"] = [b for _, g in exp.groupby("user_id") for b in buckets(g)]
    exp = (
        exp[["user_id", "event_id", "cents", "bucket"]]
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(exp.astype("int64"))
    # every per-key bucket histogram is balanced within 1
    sizes = got.groupby(["user_id", "bucket"]).size()
    for uid, g in got.groupby("user_id"):
        per = g.groupby("bucket").size()
        assert per.max() - per.min() <= 1
    with pytest.raises(ValueError):
        from urlmap_ray.functions.windows import ntile as nt

        nt(ds, key_col="user_id", order_col="cents", n=0)


def test_group_zscore_exact_and_edge_cases(ray_session):
    import math

    import pyarrow as pa
    import ray.data

    from urlmap_ray.functions.windows import group_zscore

    t = pa.table(
        {
            "event_id": pa.array(list(range(7)), pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 3, 3, 3], pa.int64()),
            "cents": pa.array([100, 200, 300, 50, 7, 7, 7], pa.int64()),
        }
    )
    out = {
        r["event_id"]: r["z_ppb"]
        for r in group_zscore(
            ray.data.from_arrow(t).repartition(3), val_col="cents"
        ).take_all()
    }
    # user 1: mean 200, std 100 → z = -1, 0, 1 exactly
    assert (out[0], out[1], out[2]) == (-1_000_000_000, 0, 1_000_000_000)
    assert out[3] == 0  # singleton key
    assert out[4] == out[5] == out[6] == 0  # zero variance
    # pinned float chain reproduces the hand formula
    s1, s2, n = 600, 140000, 3
    mean = s1 / n
    std = math.sqrt((s2 - s1 * mean) / (n - 1))
    assert out[2] == round((300 - mean) / std * 1e9)
    with __import__("pytest").raises(Exception):
        group_zscore(
            ray.data.from_arrow(
                pa.table({"event_id": [1], "user_id": [1], "cents": [1.5]})
            ),
            val_col="cents",
        ).take_all()
