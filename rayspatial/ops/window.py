"""Windowed aggregates + sessionization over an event stream table —
engine-side custom operators the reference has no equivalent for
(SURVEY.md §2.12: the reference is pure batch; these are the batch
formulations a streaming pipeline would run per epoch).

- ``tumbling_window``: fixed-width time buckets; per-batch partial
  aggregation (vectorized) so the shuffle moves one row per
  (window, keys, block), then a bounded-cardinality combine — the
  same partial+final AGG shape as tile_counts.
- ``sessionize``: gap-based sessions per user.  Requires co-locating
  each user's events (groupby(user) shuffle) and sorting within the
  group — the documented partitioning assumption.  Session ids are
  deterministic: (user_id, index of the session's first event).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_window(events_ds, width_s: int, ts_col: str = "ts",
                    keys: list[str] | None = None,
                    value_col: str = "value"):
    """-> (window_start, *keys, n_events, sum_value) per tumbling
    window of ``width_s`` seconds.  window_start = epoch-floored ts."""
    keys = keys or []

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()  # us
        w = (ts // (width_s * 1_000_000)) * (width_s * 1_000_000)
        cols = {"window_start": w}
        for k in keys:
            cols[k] = batch.column(k).to_numpy()
        cols["value"] = batch.column(value_col).to_numpy()
        df = pd.DataFrame(cols)
        out = (
            df.groupby(["window_start"] + keys, sort=False)["value"]
            .agg([("n_partial", "size"), ("sum_partial", "sum")])
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    part = events_ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = (
            df.groupby(["window_start"] + keys, sort=False)
            .agg(n_events=("n_partial", "sum"), sum_value=("sum_partial", "sum"))
            .reset_index()
        )
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        return pa.Table.from_pandas(out, preserve_index=False)

    # result cardinality = #windows x #key-values (bounded) -> gather
    return part.repartition(1).map_batches(merge, batch_size=None,
                                           batch_format="pyarrow")


def sessionize(events_ds, gap_s: int, user_col: str = "user_id",
               ts_col: str = "ts"):
    """-> one row per session: (user_id, session_start, session_end,
    n_events, sum_value).  A session breaks when the gap between
    consecutive events of a user exceeds ``gap_s`` seconds.

    Partitioning assumption: all events of a user fit one group
    (groupby(user) shuffle) — at web scale, salt by (user, day) and
    stitch sessions crossing the boundary in a second pass.
    """

    from rayspatial.util import hash_partitioned_agg

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        # all events of a user are co-partitioned; process EVERY user
        # in this partition in one vectorized pass (sort by user, ts;
        # session break on user change or gap)
        df = df.sort_values([user_col, ts_col, "event_id"], kind="stable")
        uid = df[user_col].to_numpy()
        ts = df[ts_col].astype("int64").to_numpy()  # us
        brk = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            same_user = uid[1:] == uid[:-1]
            brk[1:] = ~same_user | (np.diff(ts) > gap_s * 1_000_000)
        sid = np.cumsum(brk) - 1
        out = (
            pd.DataFrame(
                {
                    "user_id": uid,
                    "sid": sid,
                    "ts": ts,
                    "value": df["value"].to_numpy(),
                }
            )
            .groupby("sid", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("ts", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        out["session_end"] = out["session_end"].astype("datetime64[us]")
        return out

    return hash_partitioned_agg(events_ds, [user_col], per_partition)
