"""Time-series gap-fill: resample each key's event stream onto a fixed
time grid with as-of forward fill — the feature-store / monitoring
"latest value at every tick" shape.

Scale design: ONE hash exchange by key.  The grid is never shuffled —
each partition synthesizes the tick rows for exactly the keys it owns
(n_keys_in_partition x n_steps, vectorized repeat/tile) and runs one
``pandas.merge_asof`` (backward, allow-exact) against its own events.
At 10^12 events the all-to-all moves only (key, ts, id, value) rows;
grid synthesis is O(output) local work, and skewed keys can reuse the
ops/skew.py salting upstream because ffill only needs per-key time
order, which salting by time bucket preserves per bucket + boundary
replica (same argument as asof_join_salted, ops/asof.py:143).

Exactness contract: timestamps are compared as int64 epoch
MICROSECONDS (sub-second events order exactly); the fill value rides
as int64 (callers pre-scale money to cents); unmatched ticks emit the
int64 sentinel (default -1) instead of a null so the output schema is
all-int64 and a SQL oracle (DuckDB ASOF JOIN / window max) reproduces
it bit-for-bit.  Among equal-timestamp events the greatest ``id_col``
wins (merge_asof keeps the last right row; right side is sorted by
(on, id) — same tie rule as ops/asof.asof_join).

Output: (by, grid_us, id_col, value_col) — one row per key per tick,
sorted (by, grid_us) within each partition for deterministic hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["resample_ffill"]


def resample_ffill(events_ds, by: str, ts_col: str, id_col: str,
                   value_col: str, start_us: int, end_us: int,
                   step_us: int, sentinel: int = -1,
                   num_partitions: int | None = None):
    """Events (by, ts_col timestamp, id_col int, value_col int64) ->
    per-key ticks at start_us, start_us+step_us, ... < end_us with the
    latest event at-or-before each tick forward-filled.  Keys = the
    distinct ``by`` values observed in the stream (a key with no event
    before a tick gets the sentinel row, so every key emits exactly
    ``n_steps`` rows)."""
    if step_us <= 0 or end_us <= start_us:
        raise ValueError("resample_ffill: need step_us > 0 and "
                         "end_us > start_us")
    from rayspatial.util import hash_partitioned_agg

    steps = np.arange(start_us, end_us, step_us, dtype=np.int64)

    def prune(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            by: batch.column(by),
            "_us": ts,
            id_col: batch.column(id_col),
            value_col: batch.column(value_col),
        })

    ev = events_ds.map_batches(prune, batch_format="pyarrow")

    def per_partition(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        users = np.unique(df[by].to_numpy())
        grid = pd.DataFrame({
            by: np.repeat(users, len(steps)),
            "grid_us": np.tile(steps, len(users)),
        }).sort_values("grid_us", kind="stable")
        ev_sorted = df.sort_values(["_us", id_col], kind="stable")
        out = pd.merge_asof(
            grid, ev_sorted, left_on="grid_us", right_on="_us",
            by=by, allow_exact_matches=True, direction="backward",
        )
        for c in (id_col, value_col):
            out[c] = out[c].astype("Int64").fillna(sentinel).astype(np.int64)
        out = out.drop(columns=["_us"]).sort_values(
            [by, "grid_us"], kind="stable")
        return pa.Table.from_pandas(out, preserve_index=False)

    return hash_partitioned_agg(ev, [by], per_partition,
                                num_partitions=num_partitions, arrow=True)
