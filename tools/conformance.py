"""Local pre-check of the driver contract: run every ``queries()`` entry and
its ``oracle_sql()`` twin side by side, compare row count, column names and
order-insensitive values (floats rounded to 9 dp before hashing).

Usage: python tools/conformance.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name, ray_df, sql_df):
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: {len(a)} vs {len(b)}"
    # The driver's value hash is dtype-sensitive (int64 5 vs float64 5.0
    # hash differently even though assert_frame_equal(check_dtype=False)
    # passes) — round-2 postmortem: all 5 driver-red rows were exactly
    # this.  Fail on numeric-kind mismatch so it can't slip through again.
    kinds = [(c, a[c].dtype.kind, b[c].dtype.kind) for c in a.columns
             if a[c].dtype.kind != b[c].dtype.kind]
    if kinds:
        return ("DTYPE-KIND mismatch (driver hash would differ): "
                + ", ".join(f"{c}: ray={ka} sql={kb}"
                            for c, ka, kb in kinds))
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, rtol=0, atol=1e-9)
    except AssertionError as e:
        return "VALUES mismatch: " + str(e).splitlines()[-1][:160]
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"ERROR {name}: ray side raised {type(e).__name__}: "
                  f"{str(e)[:140]}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(ray_df)} rows ({dt:.1f}s)")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERROR {name}: SQL raised {str(e)[:140]}")
            failures += 1
            continue
        problem = compare(name, ray_df, sql_df)
        if problem:
            print(f"FAIL {name}: {problem}")
            failures += 1
        else:
            print(f"ok   {name}: {len(ray_df)} rows ({dt:.1f}s)")
    print("FAILURES:", failures)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
