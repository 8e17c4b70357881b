"""Local simulation of the driver's correctness gate: run every queries()
entry at a given sf, compare row count + schema + sorted values against
oracle_sql() via DuckDB. Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:22} ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:22} rows-only rows={len(res)} cols={list(res.columns)} {dt:.1f}s")
            continue
        ora = con.execute(oracles[name]).df()
        a, b = canon(res), canon(ora)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                detail = str(e).splitlines()[0]
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        if status != "OK":
            failures += 1
        print(f"{name:22} {status} rows={len(a)}/{len(b)} cols_ok={ok_cols} {dt:.1f}s")
        if status != "OK" and ok_rows and ok_cols:
            print("   ", detail)
        elif not ok_cols:
            print("    ray:", list(a.columns), "ora:", list(b.columns))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
