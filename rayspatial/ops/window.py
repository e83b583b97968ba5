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
    return _combine_window_partials(part, keys)


def _combine_window_partials(part, keys: list[str]):
    """Final combine of per-batch (window, keys) partial rows.

    Keyless (or few-key) windows have result cardinality #windows —
    a single gather task is correct and cheapest.  KEYED windows can
    have #windows x #keys results (e.g. per-user windows), so the
    partials go through ``hash_partitioned_agg`` — every (window, key)
    lands in exactly one partition and no single task ever sees the
    whole result (round-2 verdict item 5; same bounded-combine shape
    as top_k_by_group)."""

    def merge_df(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["window_start"] + keys, sort=False)
            .agg(n_events=("n_partial", "sum"), sum_value=("sum_partial", "sum"))
            .reset_index()
        )
        # deterministic row order within a block + exact timestamp[us]
        out = out.sort_values(["window_start"] + keys, kind="stable")
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        return out

    def canon(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("window_start")
        return batch.set_column(
            i, "window_start", batch.column(i).cast(pa.timestamp("us"))
        )

    if keys:
        from rayspatial.util import hash_partitioned_agg

        out = hash_partitioned_agg(part, ["window_start"] + keys, merge_df)
        return out.map_batches(canon, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        return canon(pa.Table.from_pandas(merge_df(batch.to_pandas()),
                                          preserve_index=False))

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


def sessionize_salted(events_ds, gap_s: int, bucket_s: int = 86_400,
                      user_col: str = "user_id", ts_col: str = "ts"):
    """Hot-user-safe sessionization (SURVEY 8.6 item 3): the plain
    operator co-locates ALL of a user's events in one partition, so one
    hot user (bot traffic) overloads a single task.  Here the shuffle
    key is SALTED with a time bucket — ``(user, ts // bucket_s)`` — so
    a hot user's events spread over #buckets partitions:

    1. sessionize each (user, bucket) locally (vectorized, same kernel
       as :func:`sessionize`);
    2. stitch sessions that cross bucket boundaries with a second
       hash-partition BY USER over the *session rows* — bounded by the
       number of sessions, never the number of events.  Two adjacent
       sessions merge iff ``next.start - prev.end <= gap_s``
       (aggregates are decomposable: min/max/sum), which reproduces the
       un-salted result exactly.

    Output equals :func:`sessionize` row-for-row (asserted in tests and
    by sharing the ``sessions`` SQL oracle)."""

    from rayspatial.util import hash_partitioned_agg

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        bucket = ts // (bucket_s * 1_000_000)
        return batch.append_column("_bucket", pa.array(bucket))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, "event_id"], kind="stable")
        uid = df[user_col].to_numpy()
        bkt = df["_bucket"].to_numpy()
        ts = df[ts_col].astype("int64").to_numpy()
        brk = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            same = (uid[1:] == uid[:-1]) & (bkt[1:] == bkt[:-1])
            brk[1:] = ~same | (np.diff(ts) > gap_s * 1_000_000)
        sid = np.cumsum(brk) - 1
        return (
            pd.DataFrame({
                "user_id": uid,
                "sid": sid,
                "ts": ts,
                "value": df["value"].to_numpy(),
            })
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

    partial_sessions = hash_partitioned_agg(
        events_ds.map_batches(add_bucket, batch_format="pyarrow"),
        [user_col, "_bucket"],
        per_bucket,
    )

    def stitch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "session_start", "session_end"],
                            kind="stable")
        uid = df["user_id"].to_numpy()
        start = df["session_start"].to_numpy().astype(np.int64)
        end = df["session_end"].to_numpy().astype(np.int64)
        brk = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            same_user = uid[1:] == uid[:-1]
            brk[1:] = ~same_user | (start[1:] - end[:-1] > gap_s * 1_000_000)
        gid = np.cumsum(brk) - 1
        out = (
            pd.DataFrame({
                "gid": gid,
                "user_id": uid,
                "session_start": start,
                "session_end": end,
                "n_events": df["n_events"].to_numpy(),
                "sum_value": df["sum_value"].to_numpy(),
            })
            .groupby("gid", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_start=("session_start", "min"),
                session_end=("session_end", "max"),
                n_events=("n_events", "sum"),
                sum_value=("sum_value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        out["session_end"] = out["session_end"].astype("datetime64[us]")
        return out

    return hash_partitioned_agg(partial_sessions, ["user_id"], stitch)


def sliding_window(events_ds, width_s: int, slide_s: int,
                   ts_col: str = "ts", keys: list[str] | None = None,
                   value_col: str = "value"):
    """Sliding windows: each event belongs to ``width_s // slide_s``
    overlapping windows; the map side REPLICATES the partial rows per
    window start (vectorized), then the same bounded combine as
    tumbling.  width must be a multiple of slide."""
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    keys = keys or []
    k = width_s // slide_s

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        slide_us = slide_s * 1_000_000
        last = (ts // slide_us) * slide_us  # last window start covering ts
        offs = np.arange(k, dtype=np.int64) * slide_us
        w = (last[:, None] - offs[None, :]).ravel()
        rep = np.repeat(np.arange(len(ts)), k)
        cols = {"window_start": w}
        for c in keys:
            cols[c] = batch.column(c).to_numpy()[rep]
        cols["value"] = batch.column(value_col).to_numpy()[rep]
        df = pd.DataFrame(cols)
        out = (
            df.groupby(["window_start"] + keys, sort=False)["value"]
            .agg([("n_partial", "size"), ("sum_partial", "sum")])
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    part = events_ds.map_batches(partial, batch_format="pyarrow")
    return _combine_window_partials(part, keys)


#: aggregations whose per-batch partials combine exactly (partial op ->
#: reduce op).  'mean' is deliberately excluded: a mean of per-batch
#: means is wrong whenever a group's rows split unevenly across blocks.
_DECOMPOSABLE = {"sum": "sum", "size": "sum", "count": "sum",
                 "min": "min", "max": "max"}


def top_k_by_group(ds, group_cols: list[str], value_col: str, k: int,
                   agg: str = "sum"):
    """Global top-k groups by aggregated value, with a BOUNDED combine
    at every stage (unlike a naive partial->repartition(1) plan whose
    single merge task would materialize every distinct key):

    1. per-batch partials (vectorized groupby; rows out = distinct keys
       in the block),
    2. hash-partition the partials by key — each key lands in exactly
       one partition, so per-partition reduction gives EXACT totals,
    3. per-partition top-k (<= k rows per partition survive),
    4. gather only k x P rows for the final head.

    ``agg`` must be decomposable (sum/size/count/min/max); for 'mean',
    carry (sum, count) partials yourself and divide in a map stage.
    """
    if agg not in _DECOMPOSABLE:
        raise ValueError(
            f"top_k_by_group: agg must be one of {sorted(_DECOMPOSABLE)} "
            "(decomposable); 'mean' of per-batch partials would be wrong"
        )
    red = _DECOMPOSABLE[agg]
    asc = [False] + [True] * len(group_cols)

    from rayspatial.util import hash_partitioned_agg

    def partial(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).to_numpy(zero_copy_only=False)
                for c in group_cols}
        cols["v"] = batch.column(value_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(cols)
        out = df.groupby(group_cols, sort=False)["v"].agg(agg).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow")

    def per_partition_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(group_cols, sort=False)["v"].agg(red).reset_index()
        out = out.sort_values(["v"] + group_cols, ascending=asc,
                              kind="stable")
        return out.head(k)

    survivors = hash_partitioned_agg(part, group_cols, per_partition_topk)

    def final_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # keys are disjoint across partitions -> no re-reduction needed
        df = df.sort_values(["v"] + group_cols, ascending=asc,
                            kind="stable")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    return survivors.repartition(1).map_batches(
        final_head, batch_size=None, batch_format="pyarrow"
    )


def extreme_row_by_group(ds, group_cols: list[str], order_cols: list[str],
                         ascending: list[bool],
                         num_partitions: int | None = None):
    """Greatest-row-per-group: the FULL first row of each group under
    ``order_cols``/``ascending`` (SQL ``ROW_NUMBER() OVER (PARTITION BY
    g ORDER BY ...) = 1``) — unlike top_k_by_group this retrieves the
    row, not an aggregate.

    Decomposable two-stage plan: a per-batch head(1)-per-group partial
    (taking the extreme row commutes with blocking), so at most one
    row per (group, block) enters the ONE hash exchange; the
    per-partition head finishes every key exactly (keys co-located).

    Determinism contract: ``order_cols`` must be a total order within
    each group (include a unique id as the last column) — otherwise
    which tied row survives depends on block boundaries.
    """
    from rayspatial.util import hash_partitioned_agg

    def head1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending, kind="stable")
        return df.groupby(group_cols, sort=False).head(1)

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(head1(batch.to_pandas()),
                                    preserve_index=False)

    surv = ds.map_batches(partial, batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic output order inside the partition (driver
        # hashes are row-order-sensitive)
        return head1(df).sort_values(group_cols, kind="stable")

    return hash_partitioned_agg(surv, group_cols, per_partition,
                                num_partitions=num_partitions)


def pivot_counts(ds, row_cols: list[str], col_col: str,
                 domain: list[str], prefix: str = "n_",
                 num_partitions: int | None = None):
    """Pivot a categorical column into per-value count columns: one
    output row per ``row_cols`` key with ``prefix+value`` int64 counts
    for every value in ``domain`` (a fixed, caller-known list — the
    schema of a distributed pipeline must not depend on discovering
    categories at run time; values outside the domain are IGNORED).

    Scale shape: the pivot happens per batch (vectorized crosstab-style
    groupby), so the exchange moves one wide partial row per
    (key, block) and the combine is a plain column-wise sum.
    """
    from rayspatial.util import hash_partitioned_agg

    cols = [f"{prefix}{v}" for v in domain]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = {c: df[c] for c in row_cols}
        cat = df[col_col]
        for v, c in zip(domain, cols):
            out[c] = (cat == v).astype(np.int64)
        wide = pd.DataFrame(out).groupby(row_cols, sort=False).sum(
        ).reset_index()
        return pa.Table.from_pandas(wide, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(row_cols, sort=False).sum().reset_index()
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out.sort_values(row_cols, kind="stable")

    return hash_partitioned_agg(part, row_cols, per_partition,
                                num_partitions=num_partitions)
