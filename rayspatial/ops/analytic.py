"""Partitioned analytic ("window") functions: lag / lead / row_number /
rank / dense_rank / running sum over ``PARTITION BY keys ORDER BY cols``.

Scale shape (100-TB): ONE hash-partition shuffle by the partition keys
(every key lives in exactly one partition — the same guarantee
``util.hash_partitioned_agg`` relies on), then each partition is sorted
ONCE and every requested function is computed with group-boundary numpy
kernels — no per-row Python, no second shuffle, no global sort.  The
output is bounded per partition (same row count as the input), so no
stage gathers more than one hash partition.

Skewed partition keys (one user with billions of rows) are the caller's
concern: pick ``num_partitions`` high enough that a hot key's rows fit
one worker's heap; functions here are all O(rows-in-partition) single
pass after the sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["analytic_window", "rolling_time_window", "rolling_time_window_salted", "funnel", "retention_cohorts", "rolling_rows_median", "longest_streak"]

_SUPPORTED = ("lag", "lead", "row_number", "rank", "dense_rank", "cumsum")


def _group_starts(keys: list[np.ndarray]) -> np.ndarray:
    """Boolean mask: True where a new partition-key group starts (input
    already sorted by those keys)."""
    n = len(keys[0])
    new = np.zeros(n, dtype=bool)
    if n:
        new[0] = True
        for k in keys:
            new[1:] |= k[1:] != k[:-1]
    return new


def _apply_specs(df: pd.DataFrame, part_cols: list[str],
                 order_cols: list[str], specs: list[dict],
                 out_cols: list[str]) -> pa.Table:
    df = df.sort_values(part_cols + order_cols, kind="stable",
                        ignore_index=True)
    n = len(df)
    keys = [df[c].to_numpy() for c in part_cols]
    new_grp = _group_starts(keys)
    starts = np.flatnonzero(new_grp)
    counts = np.diff(np.append(starts, n))
    # index of each row's group start, aligned per row
    grp_start_idx = np.repeat(starts, counts)
    idx = np.arange(n, dtype=np.int64)

    cols: dict[str, pa.Array] = {}
    for c in out_cols:
        cols[c] = pa.array(df[c])
    for spec in specs:
        fn = spec["fn"]
        name = spec["as"]
        if fn not in _SUPPORTED:
            raise ValueError(f"unsupported analytic fn {fn!r}")
        if fn in ("lag", "lead", "cumsum"):
            v = df[spec["col"]].to_numpy()
        if fn == "lag":
            off = int(spec.get("offset", 1))
            src = idx - off
            valid = src >= grp_start_idx
            out = np.empty(n, dtype=v.dtype)
            out[valid] = v[src[valid]]
            cols[name] = pa.array(out, mask=~valid)
        elif fn == "lead":
            off = int(spec.get("offset", 1))
            grp_end_idx = grp_start_idx + np.repeat(counts, counts)  # excl
            src = idx + off
            valid = src < grp_end_idx
            out = np.empty(n, dtype=v.dtype)
            out[valid] = v[src[valid]]
            cols[name] = pa.array(out, mask=~valid)
        elif fn == "row_number":
            cols[name] = pa.array(idx - grp_start_idx + 1, type=pa.int64())
        elif fn in ("rank", "dense_rank"):
            # ties share a rank; spec may rank by a PREFIX of order_cols
            # (must be a prefix — the partition sort must be consistent
            # with the rank ordering)
            rank_cols = spec.get("order_cols", order_cols)
            if list(order_cols[: len(rank_cols)]) != list(rank_cols):
                raise ValueError("rank order_cols must be a prefix of "
                                 "the window order_cols")
            ov = [df[c].to_numpy() for c in rank_cols]
            new_val = new_grp.copy()
            for k in ov:
                new_val[1:] |= k[1:] != k[:-1]
            if fn == "rank":
                # index of the first row of this row's tie-run, minus
                # the group start, +1
                run_start = np.repeat(
                    np.flatnonzero(new_val),
                    np.diff(np.append(np.flatnonzero(new_val), n)),
                )
                cols[name] = pa.array(run_start - grp_start_idx + 1,
                                      type=pa.int64())
            else:
                # count of distinct value-runs so far within the group
                runs = np.cumsum(new_val)
                cols[name] = pa.array(
                    runs - runs[grp_start_idx] + 1, type=pa.int64())
        elif fn == "cumsum":
            c = np.cumsum(v)
            base = c[starts] - v[starts]
            cols[name] = pa.array(c - np.repeat(base, counts))
    return pa.table(cols)


def analytic_window(ds, part_cols: list[str], order_cols: list[str],
                    specs: list[dict], out_cols: list[str] | None = None,
                    num_partitions: int | None = None):
    """Compute analytic window functions over a Dataset.

    ``specs``: list of ``{"fn": ..., "col": ..., "as": ..., "offset":}``
    with fn in lag/lead/row_number/rank/dense_rank/cumsum.  ``out_cols``
    (default: all input columns) are carried through alongside the new
    columns.  Ordering ties must be broken by ``order_cols`` for
    deterministic lag/lead (include a unique id column).

    Equivalent SQL: ``fn(col) OVER (PARTITION BY part_cols ORDER BY
    order_cols)`` with RANGE/ROWS UNBOUNDED PRECEDING for cumsum.
    """
    from rayspatial.util import hash_partitioned_agg

    out_cols = list(out_cols) if out_cols is not None else None

    def per_partition(df: pd.DataFrame) -> pa.Table:
        oc = out_cols if out_cols is not None else list(df.columns)
        return _apply_specs(df, part_cols, order_cols, specs, oc)

    return hash_partitioned_agg(ds, part_cols, per_partition,
                                num_partitions=num_partitions)


def rolling_time_window(ds, part_col: str, ts_col: str, value_col: str,
                        window_us: int,
                        id_cols: list[str] | None = None,
                        num_partitions: int | None = None):
    """Trailing time-RANGE window aggregate: per row, SUM(value) and
    COUNT(*) over the same partition key's rows with
    ``ts in [row.ts - window, row.ts]`` — SQL's
    ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW`` (equal-ts
    peers included, like RANGE frames).

    ONE hash shuffle by ``part_col``; per partition: one sort, prefix
    sums, and two vectorized ``searchsorted`` calls on a per-key
    OFFSET-SHIFTED timestamp axis (each key's time span is relocated to
    a disjoint numeric interval, so a single global searchsorted can
    never cross key boundaries — no per-key Python loop).

    ``value_col`` must be integer (quantize floats upstream, e.g.
    cents) so partial sums are exact.  Output: id_cols + part_col +
    ``sum_w`` + ``n_w``.
    """
    from rayspatial.util import hash_partitioned_agg

    id_cols = id_cols or []
    W = np.int64(window_us)

    def per_partition(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {c: pa.array([], type=pa.int64())
                 for c in [*id_cols, part_col, "sum_w", "n_w"]}
            )
        df = df.sort_values([part_col, ts_col] + id_cols,
                            kind="mergesort").reset_index(drop=True)
        ts = df[ts_col].to_numpy()
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").astype(np.int64)
        else:
            ts = ts.astype(np.int64)
        keys = df[part_col].to_numpy()
        new = np.r_[True, keys[1:] != keys[:-1]]
        seg = np.cumsum(new) - 1  # dense key rank within partition
        tmin, tmax = ts.min(), ts.max()
        span = np.int64(tmax - tmin)
        stride = span + W + np.int64(2)
        if int(seg[-1] + 1) * int(stride) > 2**62:
            raise OverflowError(
                "rolling_time_window: key-count x time-span exceeds the "
                "shift axis; raise num_partitions or bucket timestamps"
            )
        shifted = (ts - tmin) + seg * stride
        v = df[value_col].to_numpy().astype(np.int64)
        cum = np.zeros(len(v) + 1, dtype=np.int64)
        np.cumsum(v, out=cum[1:])
        lo = np.searchsorted(shifted, shifted - W, side="left")
        hi = np.searchsorted(shifted, shifted, side="right")
        out = {c: df[c].to_numpy() for c in id_cols}
        out[part_col] = keys
        out["sum_w"] = cum[hi] - cum[lo]
        out["n_w"] = (hi - lo).astype(np.int64)
        return pa.table({k: pa.array(val) for k, val in out.items()})

    return hash_partitioned_agg(ds, [part_col], per_partition,
                                 num_partitions=num_partitions)


def rolling_rows_median(ds, part_col: str, order_cols: list[str],
                        value_col: str, k: int,
                        id_cols: list[str] | None = None,
                        num_partitions: int | None = None):
    """ROWS-frame rolling MEDIAN: per row, the median of the last
    up-to-``k`` values of the same partition key ordered by
    ``order_cols`` — SQL's ``median(v) OVER (PARTITION BY key ORDER BY
    ... ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``.  Emitted as
    ``med2 = 2 x median`` (sum of the two middle order statistics for
    even windows) so the result stays integer-exact; ``n_w`` is the
    actual frame size (short at each key's head).

    ONE hash shuffle by ``part_col``; per partition: one sort, then a
    fully vectorized (rows x k) window gather — invalid slots (before
    the key's first row) are filled with an int64 sentinel that sorts
    last, a single axis-1 sort yields every row's order statistics.
    O(rows x k log k) work, rows x k int64 transient — meant for small
    frames (k <= ~64); a monotonic-heap pass would be the big-k path.
    ``value_col`` must be integer (quantize floats upstream)."""
    from rayspatial.util import hash_partitioned_agg

    id_cols = id_cols or []
    if k < 1:
        raise ValueError("rolling_rows_median: k must be >= 1")
    SENT = np.iinfo(np.int64).max

    def per_partition(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {c: pa.array([], type=pa.int64())
                 for c in [*id_cols, part_col, "med2", "n_w"]})
        df = df.sort_values([part_col, *order_cols],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        keys = df[part_col].to_numpy()
        new = np.r_[True, keys[1:] != keys[:-1]]
        seg = np.cumsum(new) - 1
        gstart = np.flatnonzero(new)[seg]          # group start per row
        v = df[value_col].to_numpy().astype(np.int64)
        # med2 is the SUM of two window order statistics: both operands
        # must satisfy |v| < 2^62 so the int64 addition cannot wrap
        # (also keeps every value strictly below the SENT padding).
        if (np.abs(v) >= 2 ** 62).any():
            raise OverflowError("rolling_rows_median: |value| >= 2^62 "
                                "would overflow the two-statistic sum")
        idx = np.arange(n)[:, None] - np.arange(k - 1, -1, -1)[None, :]
        valid = idx >= gstart[:, None]
        w = v[np.clip(idx, 0, n - 1)]
        w[~valid] = SENT
        w.sort(axis=1)
        cnt = np.minimum(np.arange(n) - gstart + 1, k)
        rows = np.arange(n)
        med2 = w[rows, (cnt - 1) // 2] + w[rows, cnt // 2]
        out = {c: df[c].to_numpy() for c in id_cols}
        out[part_col] = keys
        out["med2"] = med2
        out["n_w"] = cnt.astype(np.int64)
        return pa.table({kk: pa.array(val) for kk, val in out.items()})

    return hash_partitioned_agg(ds, [part_col], per_partition,
                                num_partitions=num_partitions)


def longest_streak(ds, user_col: str, day_col: str,
                   num_partitions: int | None = None):
    """Longest run of CONSECUTIVE active days per user (the
    gaps-and-islands shape).  ``day_col`` must be an integer day
    ordinal (epoch days); dedup to distinct (user, day) happens
    map-side, so the ONE hash shuffle carries at most one row per
    user-day.  Per partition: sort, then the classic day-minus-rank
    island id and two segmented reductions — no per-user Python loop.
    Output (user, streak_days:int64)."""
    from rayspatial.util import hash_partitioned_agg

    def dedup(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": batch.column(user_col).to_numpy(zero_copy_only=False),
            "d": batch.column(day_col).to_numpy().astype(np.int64),
        }).drop_duplicates(ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(dedup, batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({user_col: pd.Series([], dtype=object),
                                 "streak_days": pd.Series([],
                                                          dtype="int64")})
        d = (df.drop_duplicates()
             .sort_values(["u", "d"], kind="mergesort",
                          ignore_index=True))
        u = d["u"].to_numpy()
        day = d["d"].to_numpy()
        new_u = np.r_[True, u[1:] != u[:-1]]
        rank = np.arange(len(d)) - np.flatnonzero(new_u)[
            np.cumsum(new_u) - 1]
        island = day - rank                       # constant within a run
        new_run = new_u | np.r_[True, island[1:] != island[:-1]]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        # max run length per user: runs are contiguous per user
        starts = np.flatnonzero(new_u)
        run_of_start = run_id[starts]
        bounds = np.r_[run_of_start, run_id[-1] + 1]
        best = np.maximum.reduceat(run_len, bounds[:-1])
        return pd.DataFrame({user_col: u[starts],
                             "streak_days": pd.Series(best,
                                                      dtype="int64")})

    return hash_partitioned_agg(pairs, ["u"], per_partition,
                                num_partitions=num_partitions)


def funnel(ds, steps: list[str], user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           num_partitions: int | None = None):
    """Conversion-funnel analysis: per user, the earliest strictly
    ordered completion chain through ``steps`` — ``t_k`` is the MIN
    timestamp of step k occurring strictly AFTER ``t_{k-1}``.

    ONE hash shuffle by user; per partition each step is one masked
    vectorized groupby-min (loop count = len(steps), never rows).
    Output: (user, steps_completed, t_0..t_{k-1} as epoch micros,
    -1 where the funnel stalled).
    """
    from rayspatial.util import hash_partitioned_agg

    tcols = [f"t{i}" for i in range(len(steps))]

    def per_partition(df: pd.DataFrame) -> pa.Table:
        out_cols = [user_col, "steps_completed", *tcols]
        if not len(df):
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in out_cols})
        ts = df[ts_col].to_numpy()
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "u": df[user_col].to_numpy(),
            "t": ts,
            "k": df[type_col].to_numpy(),
        })
        users = pd.unique(df["u"])
        prev = pd.Series(np.int64(-(2 ** 62)), index=users)  # -inf
        reached = pd.Series(np.zeros(len(users), np.int64), index=users)
        tvals = []
        for i, step in enumerate(steps):
            sub = df[df["k"] == step]
            cand = sub[sub["t"].to_numpy()
                       > prev.reindex(sub["u"]).to_numpy()]
            tk = cand.groupby("u")["t"].min()
            tk = tk.reindex(users)  # NaN where stalled
            done = tk.notna()
            reached[done & (reached == i)] += 1
            # once stalled, later steps must stall too: prev -> +inf
            prev = tk.fillna(np.int64(2 ** 62)).astype(np.int64)
            tvals.append(tk.fillna(-1).astype(np.int64))
        out = {user_col: pa.array(users),
               "steps_completed": pa.array(reached.to_numpy())}
        for c, tv in zip(tcols, tvals):
            out[c] = pa.array(tv.to_numpy())
        return pa.table(out)

    return hash_partitioned_agg(ds, [user_col], per_partition,
                                 num_partitions=num_partitions)


def rolling_time_window_salted(ds, part_col: str, ts_col: str,
                               value_col: str, window_us: int,
                               bucket_us: int | None = None,
                               id_cols: list[str] | None = None,
                               num_partitions: int | None = None):
    """Hot-key-safe ``rolling_time_window``: the shuffle key is
    ``(key, ts // bucket)`` so one user with billions of rows spreads
    over many tasks.  Exactness across bucket edges comes from
    BOUNDARY REPLICATION (the rangejoin.py trick): every row within
    ``window`` of its bucket's end is also shipped to the NEXT bucket
    as a sum-only replica (contributes to windows, emits no output
    row).  ``bucket_us`` must be >= ``window_us`` (default 4x) so one
    replica hop suffices.

    Output is identical to ``rolling_time_window`` (asserted in
    pytest); cost is one extra copy of the boundary band
    (<= window/bucket of the rows).
    """
    from rayspatial.util import hash_partitioned_agg

    id_cols = id_cols or []
    W = np.int64(window_us)
    B = np.int64(bucket_us if bucket_us is not None else 4 * window_us)
    if B < W:
        raise ValueError("bucket_us must be >= window_us")

    def to_buckets(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy()
        tsi = (ts.astype("datetime64[us]").astype(np.int64)
               if ts.dtype.kind == "M" else ts.astype(np.int64))
        bk = tsi // B
        cols = {c: batch.column(c) for c in (*id_cols, part_col, value_col)}
        base = pa.table({**cols,
                         "_tsi": pa.array(tsi),
                         "_bk": pa.array(bk),
                         "_replica": pa.array(np.zeros(len(bk), np.int8))})
        near_end = tsi >= (bk + 1) * B - W
        if near_end.any():
            keep = pa.array(near_end)
            rep = pa.table({
                **{c: cols[c].filter(keep) for c in cols},
                "_tsi": pa.array(tsi[near_end]),
                "_bk": pa.array(bk[near_end] + 1),
                "_replica": pa.array(np.ones(int(near_end.sum()), np.int8)),
            })
            return pa.concat_tables([base, rep])
        return base

    bucketed = ds.map_batches(to_buckets, batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pa.Table:
        out_cols = [*id_cols, part_col, "sum_w", "n_w"]
        if not len(df):
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in out_cols})
        df = df.sort_values([part_col, "_bk", "_tsi"] + id_cols,
                            kind="mergesort").reset_index(drop=True)
        ts = df["_tsi"].to_numpy()
        keys = df[part_col].to_numpy()
        bks = df["_bk"].to_numpy()
        new = np.r_[True, (keys[1:] != keys[:-1]) | (bks[1:] != bks[:-1])]
        seg = np.cumsum(new) - 1
        tmin = ts.min()
        span = np.int64(ts.max() - tmin)
        stride = span + W + np.int64(2)
        if int(seg[-1] + 1) * int(stride) > 2**62:
            raise OverflowError("rolling_time_window_salted: shift overflow")
        shifted = (ts - tmin) + seg * stride
        v = df[value_col].to_numpy().astype(np.int64)
        cum = np.zeros(len(v) + 1, dtype=np.int64)
        np.cumsum(v, out=cum[1:])
        lo = np.searchsorted(shifted, shifted - W, side="left")
        hi = np.searchsorted(shifted, shifted, side="right")
        own = df["_replica"].to_numpy() == 0
        out = {c: df[c].to_numpy()[own] for c in id_cols}
        out[part_col] = keys[own]
        out["sum_w"] = (cum[hi] - cum[lo])[own]
        out["n_w"] = (hi - lo).astype(np.int64)[own]
        return pa.table({k2: pa.array(val) for k2, val in out.items()})

    return hash_partitioned_agg(bucketed, [part_col, "_bk"], per_partition,
                                 num_partitions=num_partitions)


def retention_cohorts(ds, user_col: str = "user_id", ts_col: str = "ts",
                      week_us: int = 7 * 86_400_000_000,
                      num_partitions: int | None = None):
    """Cohort retention matrix: users grouped by FIRST-SEEN week
    (cohort), counted in every later week they were active —
    -> (cohort_week, week_offset, n_users).

    One hash shuffle by user computes, per partition, each user's
    first week AND their distinct active weeks in the same pass
    (co-partitioned, so no second join); the (cohort, offset) partial
    counts are result-bounded (weeks^2), so the final combine gathers
    almost nothing.  Weeks are epoch-microsecond floors (ts // week).
    """
    from rayspatial.util import hash_partitioned_agg

    def to_weeks(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy()
        tsi = (ts.astype("datetime64[us]").astype(np.int64)
               if ts.dtype.kind == "M" else ts.astype(np.int64))
        return pa.table({
            user_col: batch.column(user_col),
            "week": pa.array(tsi // np.int64(week_us)),
        })

    weeks = ds.map_batches(to_weeks, batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "cohort_week": pd.Series(dtype="int64"),
                "week_offset": pd.Series(dtype="int64"),
                "n_users": pd.Series(dtype="int64")})
        d = df.drop_duplicates([user_col, "week"])
        first = d.groupby(user_col, sort=False)["week"].transform("min")
        out = pd.DataFrame({
            "cohort_week": first.to_numpy(),
            "week_offset": d["week"].to_numpy() - first.to_numpy(),
        })
        res = (out.groupby(["cohort_week", "week_offset"], sort=False)
               .size().reset_index(name="n_users"))
        res["n_users"] = res["n_users"].astype(np.int64)
        return res

    partials = hash_partitioned_agg(weeks, [user_col], per_partition,
                                    num_partitions=num_partitions)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["cohort_week", "week_offset"], sort=False)
                ["n_users"].sum().reset_index())

    return hash_partitioned_agg(partials, ["cohort_week", "week_offset"],
                                combine)


def rolling_distinct(ds, user_col: str, ts_col: str, window: int = 7,
                     unit_us: int = 86_400_000_000,
                     num_partitions: int | None = None):
    """EXACT sliding-window distinct-user counts: for every observed
    time unit ``d`` (default: day), the number of distinct users active
    in ``[d - window + 1, d]`` — the DAU/WAU curve, computed without
    per-window distinct sets.

    Exact sliding COUNT(DISTINCT) does not decompose into mergeable
    per-window partials, so the usual plan re-counts each window (w
    scans) or ships per-window user sets.  This plan is linear instead:

    1. map_batches: (user, unit) with per-batch dedupe — the exchange
       moves at most one 16-byte row per (user, unit, block).
    2. ONE hash shuffle by user.  Per partition, each user's sorted
       unique units expand to the units their activity covers (every
       active unit d makes the user count toward d..d+window-1): an
       interval-union merge (numpy, no per-user loop) emits each
       covered unit ONCE per user — bounded by the observed time span,
       NOT by the user's event count.
    3. per-batch (unit, partial-count) sums -> a tiny final combine
       keyed by the unit.

    Only units that actually occur in the stream are reported (the
    grid-completion variant is ops/resample.resample_ffill's job).
    Returns (unit, n_users) with unit = epoch-``unit_us`` int64.
    """
    from rayspatial.util import hash_partitioned_agg

    if window < 1:
        raise ValueError("rolling_distinct: window must be >= 1")

    def prune(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        df = pd.DataFrame({
            user_col: batch.column(user_col).to_numpy(),
            "unit": us.to_numpy() // unit_us,
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # materialize the REDUCED pairs once: consumed twice (observed-unit
    # gather + the user shuffle); per-block-deduped 16-byte rows are
    # safe to pin/spill, re-tokenizing the raw stream twice is not
    pairs = ds.map_batches(prune, batch_format="pyarrow").materialize()
    # bounded gather: the distinct observed units (a time range — days
    # over years, not data-sized); broadcast to filter covered units
    obs_df = pairs.map_batches(
        lambda b: pa.table({"unit": pa.array(
            np.unique(b.column("unit").to_numpy()))}),
        batch_format="pyarrow",
    ).to_pandas()
    if obs_df.empty:        # zero input blocks: schema-typed empty out
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "unit": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64())}))
    observed = np.unique(obs_df["unit"].to_numpy())

    def cover(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"unit": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        df = df.drop_duplicates().sort_values([user_col, "unit"],
                                              kind="stable")
        u = df[user_col].to_numpy()
        d = df["unit"].to_numpy()
        # merged coverage intervals [d, d+window-1] per user: a new
        # interval starts at a user change or a gap > window
        new = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            new[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > window)
        starts = d[new]
        # interval end = last unit of its run + window - 1.  Rows are
        # sorted by (user, unit), so each run's last element is the row
        # just before the next run start (or the final row) — indexing
        # directly is correct for negative units too (pre-1970
        # timestamps), where a zero-init maximum.at accumulator isn't.
        ends_idx = np.r_[np.flatnonzero(new)[1:] - 1, len(d) - 1]
        ends = d[ends_idx] + window - 1
        lens = (ends - starts + 1).astype(np.int64)
        # expand each merged interval to its units (vectorized ragged
        # arange), then keep only OBSERVED units
        total = int(lens.sum())
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        units = np.repeat(starts, lens) + (np.arange(total) - offs)
        units = units[np.isin(units, observed)]
        out = pd.DataFrame({"unit": units})
        return (out.groupby("unit", sort=True).size()
                .reset_index(name="n"))

    partials = hash_partitioned_agg(pairs, [user_col], cover,
                                    num_partitions=num_partitions)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("unit", sort=True)["n"].sum().reset_index(
            name="n_users")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return hash_partitioned_agg(partials, ["unit"], combine,
                                num_partitions=num_partitions)
