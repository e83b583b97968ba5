"""Single-pass table profiling (the data-QA op every large pipeline
runs before training): per column, row count, null count, exact
distinct count, and min/max — computed for ALL requested columns in
ONE shuffle.

Scale shape: each batch pre-aggregates per (column, value) counts —
the exchange carries the distinct-value domain, not rows — then one
hash shuffle by (column, value) merges partials and a per-column fold
(tiny: one row per distinct value) emits the stats row.  Exact
distinct is therefore safe for bounded-cardinality columns (status
codes, enums, keys up to ~10^8 distinct); for unbounded columns use a
sketch (textops HLL) instead.

Numeric columns are compared numerically (a sidecar ``vnum`` rides the
shuffle); strings compare bytewise — both min/max are emitted as
strings so one schema covers mixed column types.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["profile_table"]


def profile_table(ds, num_cols: list[str], str_cols: list[str],
                  num_partitions: int | None = None):
    """-> one row per column: (column, n, n_null, n_distinct, min_s,
    max_s); numeric columns must be integer-valued (quantize floats
    upstream).  n_distinct excludes nulls; min_s/max_s are NULL for
    all-null columns."""
    from rayspatial.util import hash_partitioned_agg

    def partial(batch: pa.Table) -> pa.Table:
        frames = []
        for c in num_cols:
            v = batch.column(c).to_pandas()
            g = v.groupby(v, dropna=True).size()
            nn = int(v.isna().sum())
            vals = g.index.to_numpy().astype(np.int64)
            frames.append(pd.DataFrame({
                "column": c,
                "vstr": vals.astype("U"),
                "vnum": pd.array(vals, dtype="Int64"),
                "cnt": g.to_numpy().astype(np.int64),
                "nulls": np.int64(0)}))
            if nn:
                frames.append(pd.DataFrame({
                    "column": [c], "vstr": [None],
                    "vnum": pd.array([None], dtype="Int64"),
                    "cnt": [np.int64(0)], "nulls": [np.int64(nn)]}))
        for c in str_cols:
            v = batch.column(c).to_pandas()
            g = v.groupby(v, dropna=True).size()
            nn = int(v.isna().sum())
            frames.append(pd.DataFrame({
                "column": c, "vstr": g.index.to_numpy(),
                "vnum": pd.array([None] * len(g), dtype="Int64"),
                "cnt": g.to_numpy().astype(np.int64),
                "nulls": np.int64(0)}))
            if nn:
                frames.append(pd.DataFrame({
                    "column": [c], "vstr": [None],
                    "vnum": pd.array([None], dtype="Int64"),
                    "cnt": [np.int64(0)], "nulls": [np.int64(nn)]}))
        out = pd.concat(frames, ignore_index=True)
        merged = (out.groupby(["column", "vstr"], sort=False,
                              dropna=False)
                  .agg(vnum=("vnum", "first"), cnt=("cnt", "sum"),
                       nulls=("nulls", "sum")).reset_index())
        return pa.Table.from_pandas(merged, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # all partials of a (column, value) are co-partitioned; a column
        # may span partitions — emit per-partition column stats and let
        # the final combine merge them.
        m = (df.groupby(["column", "vstr"], sort=False, dropna=False)
             .agg(vnum=("vnum", "first"), cnt=("cnt", "sum"),
                  nulls=("nulls", "sum")).reset_index())
        rows = []
        for c, sub in m.groupby("column", sort=False):
            vals = sub[sub["vstr"].notna()]
            if len(vals):
                if vals["vnum"].notna().all():
                    lo = vals.loc[vals["vnum"].idxmin(), "vstr"]
                    hi = vals.loc[vals["vnum"].idxmax(), "vstr"]
                else:
                    lo, hi = vals["vstr"].min(), vals["vstr"].max()
                lo_n = vals["vnum"].min()
                hi_n = vals["vnum"].max()
            else:
                lo = hi = None
                lo_n = hi_n = None
            rows.append((c, int(vals["cnt"].sum()),
                         int(sub["nulls"].sum()), len(vals), lo, hi,
                         lo_n, hi_n))
        return pd.DataFrame(rows, columns=[
            "column", "n", "n_null", "n_distinct", "min_s", "max_s",
            "_lo_n", "_hi_n"]).astype({"n": "int64", "n_null": "int64",
                                       "n_distinct": "int64",
                                       "_lo_n": "Int64",
                                       "_hi_n": "Int64"})

    per_part = hash_partitioned_agg(partials, ["column", "vstr"], fold,
                                    num_partitions=num_partitions)

    def combine(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        if not len(df):
            return pa.table({
                "column": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_null": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "min_s": pa.array([], pa.string()),
                "max_s": pa.array([], pa.string())})
        rows = []
        for c, sub in df.groupby("column", sort=False):
            present = sub[sub["n_distinct"] > 0]
            if len(present):
                if present["_lo_n"].notna().all():
                    lo = present.loc[present["_lo_n"].idxmin(), "min_s"]
                    hi = present.loc[present["_hi_n"].idxmax(), "max_s"]
                else:
                    lo = present["min_s"].min()
                    hi = present["max_s"].max()
            else:
                lo = hi = None
            rows.append((c, int(sub["n"].sum()), int(sub["n_null"].sum()),
                         int(sub["n_distinct"].sum()), lo, hi))
        out = pd.DataFrame(rows, columns=[
            "column", "n", "n_null", "n_distinct", "min_s", "max_s"]
        ).sort_values("column", ignore_index=True)
        for c in ("n", "n_null", "n_distinct"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (per_part.repartition(1)
            .map_batches(combine, batch_size=None, batch_format="pyarrow"))
