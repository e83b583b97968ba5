"""Distributed hash equi-join (inner) — plain relational join as a Ray
Data operator, with the two scale modes every 100-TB plan needs:

- ``mode="broadcast"``: the small side is ``ray.put`` ONCE and probed
  inside a streaming ``map_batches`` over the big side (per-worker
  build-table cache keyed by the object ref, same pattern as the
  broadcast spatial join ops/join.py).  No shuffle at all; right side
  must fit a worker heap.
- ``mode="shuffle"``: both sides are column-pruned, tagged,
  schema-aligned, unioned and hash-partitioned by the key (ONE
  all-to-all), then each partition runs a vectorized ``pandas.merge``.
  Works for any side sizes; skewed keys can reuse ops/skew.py salting
  upstream.

Column naming: output carries ``left_cols + right_cols`` (the caller
prunes; overlapping names must be pre-renamed — explicit beats silent
suffixing in a distributed plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_join(left_ds, right_ds, on: str,
              left_cols: list[str], right_cols: list[str],
              mode: str = "broadcast",
              num_partitions: int | None = None):
    """Inner equi-join LEFT x RIGHT on ``on``.  ``left_cols`` /
    ``right_cols``: output columns from each side (key listed once, in
    ``left_cols``)."""
    if mode == "broadcast":
        return _broadcast_join(left_ds, right_ds, on, left_cols, right_cols)
    if mode == "shuffle":
        return _shuffle_join(left_ds, right_ds, on, left_cols, right_cols,
                             num_partitions)
    raise ValueError(f"unknown join mode: {mode!r}")


def _broadcast_join(left_ds, right_ds, on, left_cols, right_cols):
    import ray

    pruned = right_ds.map_batches(
        lambda b: b.select([on] + right_cols), batch_format="pyarrow"
    )
    rtab = pa.concat_tables(ray.get(pruned.to_arrow_refs()))
    ref = ray.put(rtab)  # ONE object-store copy, read by every probe task
    _cache: dict = {}

    def probe(batch: pa.Table) -> pa.Table:
        key = ref.hex()
        built = _cache.get(key)
        if built is None:
            _cache.clear()
            import ray as _ray

            rt = _ray.get(ref).to_pandas()
            built = rt.sort_values(on, kind="stable").reset_index(drop=True)
            _cache[key] = built
        lf = batch.select(left_cols + ([on] if on not in left_cols else []))
        out = lf.to_pandas().merge(built, on=on, how="inner", sort=False)
        return pa.Table.from_pandas(out[left_cols + right_cols],
                                    preserve_index=False)

    return left_ds.map_batches(probe, batch_format="pyarrow")


def _shuffle_join(left_ds, right_ds, on, left_cols, right_cols,
                  num_partitions):
    from rayspatial.util import hash_partitioned_agg

    lsch = left_ds.schema()
    rsch = right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    lonly = [c for c in left_cols if c != on]
    ronly = [c for c in right_cols if c != on]

    def tag(side: int, own: list[str], other: list[str], other_t):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {"_side": pa.array(np.full(n, side, dtype=np.int8)),
                    on: batch.column(on)}
            for c in own:
                cols[c] = batch.column(c)
            for c in other:
                cols[c] = pa.nulls(n, other_t[c])
            return pa.table(cols)

        return fn

    lt = left_ds.map_batches(tag(1, lonly, ronly, rtypes),
                             batch_format="pyarrow")
    rt = right_ds.map_batches(tag(0, ronly, lonly, ltypes),
                              batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        lmask = df["_side"].to_numpy() == 1
        left = df.loc[lmask, [on] + lonly]
        right = df.loc[~lmask, [on] + ronly]
        out = left.merge(right, on=on, how="inner", sort=False)
        return out[left_cols + ronly]

    return hash_partitioned_agg(lt.union(rt), [on], per_partition,
                                num_partitions=num_partitions)
