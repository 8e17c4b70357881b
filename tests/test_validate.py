"""Deequ-style constraint validation (functions/validate.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from urlmap_ray.functions.validate import check_constraints, distinct_key_hashes


def _tbl():
    return pa.table(
        {
            "k": pa.array([1, 2, 3, 3, 4, None, 7, 8], pa.int64()),
            "s": pa.array(["O", "F", "X", "P", None, "O", "F", "F"], pa.string()),
            "p": pa.array([5.0, -1.0, 2.0, 3.0, 4.0, 2000.0, 1.0, 0.0], pa.float64()),
        }
    )


def _cons(keys):
    return [
        {"name": "u_k", "kind": "unique", "col": "k"},
        {"name": "nn_s", "kind": "not_null", "col": "s"},
        {"name": "set_s", "kind": "in_set", "col": "s", "values": ["O", "F", "P"]},
        {"name": "rng_p", "kind": "range", "col": "p", "lo": 0.0, "hi": 100.0},
        {"name": "re_s", "kind": "regex", "col": "s", "pattern": "^[OF]$"},
        {"name": "ref_k", "kind": "ref", "col": "k", "keys": keys},
    ]


def test_check_constraints_counts_and_parallelism_identity(ray_session):
    dim = pa.table({"ck": pa.array([1, 2, 3, 7], pa.int64())})
    keys = distinct_key_hashes(ray.data.from_arrow(dim), col="ck")
    want = {
        "u_k": (8, 2, False),  # value 3 twice; nulls don't count
        "nn_s": (8, 1, False),
        "set_s": (8, 1, False),  # 'X'; null skipped
        "rng_p": (8, 2, False),  # -1, 2000 (0.0 and bounds inclusive)
        "re_s": (8, 2, False),  # 'X', 'P'
        "ref_k": (8, 2, False),  # 4 and 8 missing from dim
    }
    results = []
    for parts in (1, 2, 5):
        rows = check_constraints(
            ray.data.from_arrow(_tbl()).repartition(parts), _cons(keys)
        ).take_all()
        got = {r["constraint"]: (r["n_rows"], r["n_violations"], r["ok"]) for r in rows}
        assert got == want
        results.append(rows)
    # exact integer counts: bit-identical at any parallelism
    assert results[0] == results[1] == results[2]


def test_check_constraints_all_green_and_empty_ref(ray_session):
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    rows = check_constraints(
        ray.data.from_arrow(t),
        [
            {"name": "u", "kind": "unique", "col": "k"},
            {"name": "nn", "kind": "not_null", "col": "k"},
            {
                "name": "ref_empty",
                "kind": "ref",
                "col": "k",
                "keys": np.zeros(0, np.uint64),
            },
        ],
    ).take_all()
    got = {r["constraint"]: (r["n_violations"], r["ok"]) for r in rows}
    assert got == {
        "u": (0, True),
        "nn": (0, True),
        "ref_empty": (3, False),  # empty reference: every non-null violates
    }


def test_check_constraints_rejects_duplicate_names(ray_session):
    t = pa.table({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(
            ray.data.from_arrow(t),
            [
                {"name": "x", "kind": "not_null", "col": "k"},
                {"name": "x", "kind": "unique", "col": "k"},
            ],
        )


def test_distinct_key_hashes_bound_is_loud(ray_session):
    t = pa.table({"k": pa.array(np.arange(100, dtype=np.int64), pa.int64())})
    with pytest.raises(ValueError, match="max_keys"):
        distinct_key_hashes(ray.data.from_arrow(t), col="k", max_keys=10)
    keys = distinct_key_hashes(ray.data.from_arrow(t).repartition(4), col="k")
    assert len(keys) == 100 and (np.diff(keys.view(np.uint64)) > 0).all()
