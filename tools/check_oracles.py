"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side on one sf dir; compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # pyarrow.Table


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value — NO dtype coercion.

    The driver hashes typed values, so an int64/float64 mismatch between the
    Ray result and the DuckDB oracle is a real failure; coercing here (as an
    earlier version did) hid the DuckDB SUM(BIGINT)->HUGEINT->float64 class
    of bug (round-1 verdict, 'What's wrong' #1)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import importlib.util

    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    qs = mod.queries()
    oracles = mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:22s} query raised: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name:22s} {len(got):7d} rows  {dt:5.1f}s (rows-only)")
            continue
        exp = canon(con.sql(oracles[name]).df())
        status = "ok"
        if list(got.columns) != list(exp.columns):
            status = f"COLUMNS {list(got.columns)} != {list(exp.columns)}"
        elif len(got) != len(exp):
            status = f"ROWS {len(got)} != {len(exp)}"
        else:
            try:
                # dtype-aware + exact: strictly at-least-as-strong as the
                # driver's typed value hash, so a local 'ok' implies green.
                pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
            except AssertionError as e:
                lines = [l for l in str(e).splitlines() if l.strip()]
                status = "VALUES/DTYPE differ: " + (lines[-1][:120] if lines else "")
        if status == "ok":
            print(f"ok    {name:22s} {len(got):7d} rows  {dt:5.1f}s")
        else:
            failures.append(name)
            print(f"FAIL  {name:22s} {status}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
