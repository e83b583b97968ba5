"""Driver-style correctness harness: run each queries() entry and its
oracle_sql() side-by-side at a given sf, compare row count + schema +
order-insensitive value hash.  Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def dtype_kinds(df: pd.DataFrame) -> dict:
    """Column -> coarse dtype kind, BEFORE canon() erases differences.

    The driver's value-hash is dtype-sensitive (an int64 column that
    leaked to float64 hash-mismatches even with identical values), so
    the sweep must gate on this too.  Kinds: i/u -> 'int', f -> 'float',
    b -> 'bool', M -> 'datetime', else 'obj'.
    """
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        out[c] = {"i": "int", "u": "int", "f": "float", "b": "bool",
                  "M": "datetime"}.get(k, "obj")
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    # normalize ints to int64, floats rounded for hashing
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine_raw = to_pandas(fn(sf_dir))
            mine_kinds = dtype_kinds(mine_raw)
            mine = canon(mine_raw)
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(mine)} (no oracle; rows-only check)")
            continue
        try:
            ref_raw = con.execute(oracles[name]).fetchdf()
            ref_kinds = dtype_kinds(ref_raw)
            ref = canon(ref_raw)
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(ref)
        ok_cols = list(mine.columns) == list(ref.columns)
        if ok_cols and mine_kinds != ref_kinds:
            bad = {c: (mine_kinds[c], ref_kinds.get(c))
                   for c in mine_kinds if mine_kinds[c] != ref_kinds.get(c)}
            # DuckDB emits all-NULL / empty columns as object; a typed
            # engine column vs an all-null oracle column is not a leak.
            real = {c: v for c, v in bad.items()
                    if not (len(ref_raw) == 0 or ref_raw[c].isna().all()
                            or mine_raw[c].isna().all())}
            if real:
                failures += 1
                print(f"FAIL {name}: DTYPE mismatch {real}")
                continue
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(mine, ref, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                detail = str(e).split("\n")[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"PASS {name}: rows={len(mine)}")
        else:
            failures += 1
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}, cols {list(mine.columns)} vs {list(ref.columns)}")
            if ok_rows and ok_cols:
                print("   value mismatch:", detail)
                print(mine.head(3))
                print(ref.head(3))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
