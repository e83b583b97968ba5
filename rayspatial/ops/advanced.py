"""Advanced relational / analytic operators: Pareto skyline, interval
max-concurrency sweep, per-group mode, Markov transition counts, CUBE
aggregation, and mergeable covariance moments.

All operators follow the engine's scale rules: partial aggregation
inside ``map_batches`` before any exchange, bounded gathers (one small
tuple per partition, never the data), and integer-exact arithmetic so
driver oracles hash-match bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["skyline", "max_concurrency", "mode_by_group",
           "transition_counts", "cube_agg", "grouping_sets_agg",
           "grouped_moments", "cooccurrence_pairs", "histogram_fixed",
           "grouped_concat", "ohlc_agg"]


# ---------------------------------------------------------------- skyline

def _local_skyline(vals: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """Row indices of the Pareto frontier of ``vals`` (n x d, float64,
    ALL objectives minimized).  Dominance: a dominates b iff a <= b on
    every column and a < b on at least one.

    d == 2 runs the O(n log n) closed form: after a lexicographic sort,
    a row survives iff its y equals its x-group's minimum AND beats the
    strict prefix-minimum of earlier x-groups.  General d processes the
    lex order in chunks — each chunk is pruned against the accumulated
    frontier with one broadcast compare FIRST (which kills almost
    everything on typical data), and only the survivors pay the
    quadratic within-chunk resolution.  No per-row Python loop.
    """
    n, d = vals.shape
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort(vals.T[::-1])  # sort by col0, then col1, ...
    sv = vals[order]

    if d == 2:
        x, y = sv[:, 0], sv[:, 1]
        new_x = np.empty(n, dtype=bool)
        new_x[0] = True
        new_x[1:] = x[1:] != x[:-1]
        starts = np.flatnonzero(new_x)
        gidx = np.cumsum(new_x) - 1
        gmin = y[starts]                 # y sorted asc within a group
        pm = np.empty(len(starts))
        pm[0] = np.inf                   # strict prefix-min of gmin
        if len(starts) > 1:
            np.minimum.accumulate(gmin[:-1], out=pm[1:])
        keep = (y == gmin[gidx]) & (y < pm[gidx])
        return order[np.flatnonzero(keep)]

    frontier = np.empty((0, d), dtype=np.float64)
    keep_sorted: list[np.ndarray] = []
    for lo in range(0, n, chunk):
        c = sv[lo:lo + chunk]                      # (m, d)
        alive = np.ones(len(c), dtype=bool)
        if len(frontier):
            # f dominates c: all(f <= c) and any(f < c)
            le = (frontier[:, None, :] <= c[None, :, :]).all(axis=2)
            lt = (frontier[:, None, :] < c[None, :, :]).any(axis=2)
            alive &= ~(le & lt).any(axis=0)
        # within-chunk, on frontier-survivors only: row i can dominate
        # row j only if i < j (lex order); dominance is transitive, so
        # a dominator that later dies is still a valid witness
        sub_idx = np.flatnonzero(alive)
        if len(sub_idx) > 1:
            s = c[sub_idx]
            m = len(s)
            le = (s[:, None, :] <= s[None, :, :]).all(axis=2)
            lt = (s[:, None, :] < s[None, :, :]).any(axis=2)
            dom = le & lt & np.tri(m, m, -1, dtype=bool).T  # i<j
            alive[sub_idx[dom.any(axis=0)]] = False
        keep_sorted.append(np.flatnonzero(alive) + lo)
        frontier = np.concatenate([frontier, c[alive]])
    return order[np.concatenate(keep_sorted)]


def skyline(ds, cols: list[str], maximize: list[bool] | None = None,
            out_cols: list[str] | None = None,
            tie_cols: list[str] | None = None):
    """Distributed Pareto frontier (skyline) over objective columns.

    ``maximize[i]`` flips objective i (default: all minimized).  Exact:
    skyline(S) == skyline(union of per-block skylines), so each block is
    pruned locally (map_batches, vectorized frontier scan) and only the
    survivors — typically O(polylog n) rows for independent objectives —
    move to ONE final task for the exact global pass.  Worst case
    (fully anti-correlated objectives) the frontier IS the dataset and
    no algorithm can shrink it; the local prune is still never wrong.
    Output rows are sorted by the objective columns then ``tie_cols``
    (deterministic), IN the final task — the frontier is one small
    block, so no Dataset.sort all-to-all is ever scheduled.
    """
    maximize = maximize or [False] * len(cols)
    signs = np.array([-1.0 if m else 1.0 for m in maximize])
    out_cols = out_cols or None

    def _prune(batch: pa.Table) -> pa.Table:
        if out_cols:
            batch = batch.select(out_cols)
        if not len(batch):
            return batch
        vals = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols]) * signs
        return batch.take(pa.array(_local_skyline(vals)))

    sort_keys = [(c, "ascending") for c in cols + (tie_cols or [])]

    def _final(batch: pa.Table) -> pa.Table:
        return _prune(batch).sort_by(sort_keys)

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    # survivors are tiny; finish exactly in one task (not on the driver)
    return pruned.repartition(1).map_batches(
        _final, batch_size=None, batch_format="pyarrow")


# ------------------------------------------------------- max_concurrency

def max_concurrency(ds, start_col: str, end_col: str,
                    num_parts: int | None = None) -> dict:
    """Peak number of simultaneously-open ``[start, end)`` intervals
    (both int64, e.g. epoch micros) and the FIRST instant it is
    reached.  Exact distributed sweep, TeraSort shape:

    1. flatten to a +-1 delta stream (one map),
    2. range-partition by (t, delta) on exact quantile splits — equal
       keys co-locate, and delta=-1 sorts before +1 at equal t so an
       interval ending at t frees its slot before one starting at t,
    3. per-partition sort + cumsum; the bounded gather is ONE
       (sum, max, argmax_t) triple per partition — never the events,
    4. exclusive prefix of the sums gives each partition's entering
       offset; global peak = max(offset + local max), earliest t wins.

    Returns ``{"max_concurrent": int, "at_ts": int}``.
    """
    import ray

    from rayspatial.ops.quantile import exact_quantiles
    from rayspatial.util import cluster_cpus

    def _deltas(batch: pa.Table) -> pa.Table:
        s = batch.column(start_col).to_numpy().astype(np.int64)
        e = batch.column(end_col).to_numpy().astype(np.int64)
        return pa.table({
            "t": pa.array(np.concatenate([s, e])),
            "d": pa.array(np.concatenate([
                np.ones(len(s), np.int64), -np.ones(len(e), np.int64)])),
        })

    dl = ds.map_batches(_deltas, batch_format="pyarrow")

    P = num_parts or 2 * cluster_cpus()
    pcts = sorted({round(i * 100 / P) for i in range(1, P)} - {0, 100})
    qt = exact_quantiles(dl, "t", pcts) if pcts else None
    qvals = ([v for v in qt.column("value").to_pylist() if v is not None]
             if qt is not None else [])
    splits = np.sort(np.asarray(qvals, np.float64))
    sref = ray.put(splits)

    def _assign(batch: pa.Table) -> pa.Table:
        sp = ray.get(sref)
        part = np.searchsorted(sp, batch.column("t").to_numpy(),
                               side="left").astype(np.int64)
        return batch.append_column("_part", pa.array(part))

    def _scan(df: pd.DataFrame) -> pa.Table:
        t = df["t"].to_numpy()
        d = df["d"].to_numpy()
        o = np.lexsort((d, t))  # (t asc, d asc): -1 before +1 at equal t
        run = np.cumsum(d[o])
        i = int(np.argmax(run))
        return pa.table({
            "_part": pa.array([np.int64(df["_part"].iloc[0])]),
            "s": pa.array([np.int64(run[-1])]),
            "m": pa.array([np.int64(run[i])]),
            "at": pa.array([np.int64(t[o][i])]),
        })

    rows = (dl.map_batches(_assign, batch_format="pyarrow")
            .groupby("_part").map_groups(_scan, batch_format="pandas")
            .take_all())
    if not rows:
        return {"max_concurrent": 0, "at_ts": None}
    rows.sort(key=lambda r: r["_part"])
    best, at, off = -np.inf, None, 0
    for r in rows:
        peak = off + r["m"]
        if peak > best:
            best, at = peak, r["at"]
        off += r["s"]
    return {"max_concurrent": int(best), "at_ts": int(at)}


# --------------------------------------------------------- mode_by_group

def mode_by_group(ds, group_cols: list[str], value_col: str,
                  num_partitions: int | None = None):
    """Per-group MODE (most frequent value; ties -> smallest value).

    Map side pre-counts (group, value) pairs inside each block — the
    exchange carries counts, not rows, so a low-cardinality value
    domain shrinks the shuffle by ~rows/|domain|.  One hash shuffle by
    group key finishes the argmax.  Output: group_cols + (mode_value,
    mode_count), SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY n
    DESC, v ASC) = 1``.
    """
    from rayspatial.util import hash_partitioned_agg

    keys = group_cols + [value_col]

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        out = (df.groupby(keys, sort=False).size()
               .rename("_n").reset_index())
        out["_n"] = out["_n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = (df.groupby(keys, sort=False)["_n"].sum().reset_index())
        tot = tot.sort_values(group_cols + ["_n", value_col],
                              ascending=[True] * len(group_cols)
                              + [False, True], kind="stable")
        top = tot.groupby(group_cols, sort=False).head(1)
        top = top.rename(columns={value_col: "mode_value",
                                  "_n": "mode_count"})
        top["mode_count"] = top["mode_count"].astype(np.int64)
        return top.reset_index(drop=True)

    return hash_partitioned_agg(partials, group_cols, _finish,
                                num_partitions=num_partitions)


# ----------------------------------------------------- transition_counts

def transition_counts(ds, part_col: str, order_cols: list[str],
                      state_col: str, num_partitions: int | None = None):
    """First-order Markov transition counts: for each entity (ordered by
    ``order_cols``), count (previous state -> state) pairs, summed over
    all entities.  One hash shuffle co-locates each entity, the lag and
    pair-count are vectorized per partition, and the (state x state)
    partials — a tiny fixed domain — fold in one final task.
    Output: (prev, next, n) sorted, == SQL ``LAG(state) OVER (PARTITION
    BY entity ORDER BY ...)`` then GROUP BY.
    """
    from rayspatial.util import hash_partitioned_agg

    def _pairs(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([part_col] + order_cols, kind="stable",
                            ignore_index=True)
        ent = df[part_col].to_numpy()
        st = df[state_col].to_numpy()
        same = np.empty(len(df), dtype=bool)
        if len(df):
            same[0] = False
            same[1:] = ent[1:] == ent[:-1]
        sel = np.flatnonzero(same)
        out = (pd.DataFrame({"prev": st[sel - 1], "next": st[sel]})
               .groupby(["prev", "next"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = hash_partitioned_agg(ds, [part_col], _pairs,
                                    num_partitions=num_partitions)

    def _fold(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        df = batch.to_pandas()
        out = (df.groupby(["prev", "next"], sort=False)["n"].sum()
               .reset_index().sort_values(["prev", "next"],
                                          ignore_index=True))
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (partials.map_batches(_fold, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_fold, batch_size=None, batch_format="pyarrow"))


# --------------------------------------------------------------- cube_agg

def cube_agg(ds, group_cols: list[str], value_col: str,
             total_marker: str = "ALL",
             num_partitions: int | None = None):
    """GROUP BY CUBE(group_cols): SUM(value) + COUNT(*) at every SUBSET
    of the grouping columns (2^k levels) in one pass — the map side
    emits each row's partials once per subset with the rolled-up
    columns relabeled ``total_marker``, one hash shuffle finishes all
    levels together.  Same level-tag discipline as ``rollup_agg``
    (mapops.py): an explicit ``_lv`` bitmask rides the shuffle so a
    genuine group value equal to the marker never merges with totals.
    ``value_col`` must be integer; group columns must be strings.
    2^k map amplification — meant for k <= 4.
    """
    k = len(group_cols)
    if k > 4:
        raise ValueError("cube_agg: 2^k map fan-out — use k <= 4")
    return _subset_levels_agg(ds, group_cols, value_col,
                              list(range(1 << k)), total_marker,
                              num_partitions)


def grouping_sets_agg(ds, group_cols: list[str], value_col: str,
                      sets: list, total_marker: str = "ALL",
                      num_partitions: int | None = None):
    """GROUP BY GROUPING SETS(sets): SUM(value) + COUNT(*) at each
    REQUESTED subset of the grouping columns in one pass — the general
    form of ``cube_agg`` (all subsets) and ``rollup_agg`` (prefix
    subsets).  Each element of ``sets`` is an iterable of column names
    drawn from ``group_cols``; map amplification is len(sets) per row,
    one level-tagged hash shuffle finishes every set together.  The
    same ``_lv`` bitmask discipline keeps a genuine group value equal
    to ``total_marker`` from merging with rolled-up totals.
    """
    pos = {c: i for i, c in enumerate(group_cols)}
    if len(group_cols) > 7:
        raise ValueError("grouping_sets_agg: _lv bitmask is int8 — "
                         "use <= 7 grouping columns")
    masks = []
    for s in sets:
        cols = list(s)
        bad = [c for c in cols if c not in pos]
        if bad:
            raise ValueError(f"grouping_sets_agg: set columns {bad!r} "
                             f"not in group_cols {group_cols!r}")
        mask = 0
        for c in group_cols:
            if c not in cols:          # column NOT in the set → rolled up
                mask |= 1 << pos[c]
        masks.append(mask)
    if len(set(masks)) != len(masks):
        raise ValueError("grouping_sets_agg: duplicate grouping set")
    return _subset_levels_agg(ds, group_cols, value_col, masks,
                              total_marker, num_partitions)


def _subset_levels_agg(ds, group_cols, value_col, masks, total_marker,
                       num_partitions):
    """Shared CUBE / GROUPING SETS machinery: emit one partial per row
    per level mask (bit i set = group_cols[i] relabeled total_marker),
    then one hash shuffle over (group_cols, _lv) folds everything.
    Same level-tag discipline as ``rollup_agg`` (mapops.py)."""
    from rayspatial.util import hash_partitioned_agg

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    for c in group_cols:
        t = types[c]
        ok = (pa.types.is_string(t) or pa.types.is_large_string(t)
              ) if isinstance(t, pa.DataType) else np.dtype(t).kind in "OUS"
        if not ok:
            raise ValueError(f"group column {c!r} must be string")

    def _partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            **{c: batch.column(c).to_numpy(zero_copy_only=False)
               for c in group_cols},
            "_v": batch.column(value_col).to_numpy().astype(np.int64),
        })
        outs = []
        for mask in masks:
            g = df.copy()
            for i, c in enumerate(group_cols):
                if mask & (1 << i):
                    g[c] = total_marker
            g["_lv"] = np.int8(mask)
            agg = (g.groupby(group_cols + ["_lv"], sort=False)["_v"]
                   .agg([("sum_v", "sum"), ("n_rows", "size")])
                   .reset_index())
            outs.append(agg)
        out = pd.concat(outs, ignore_index=True)
        out["sum_v"] = out["sum_v"].astype(np.int64)
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(group_cols + ["_lv"], sort=False)
               [["sum_v", "n_rows"]].sum().reset_index())
        return out.drop(columns=["_lv"])

    return hash_partitioned_agg(partials, group_cols + ["_lv"], _combine,
                                num_partitions=num_partitions)


# ----------------------------------------------------- cooccurrence_pairs

def cooccurrence_pairs(ds, entity_col: str, item_col: str,
                       num_partitions: int | None = None):
    """Market-basket co-occurrence: for each unordered item pair
    (a < b), the number of entities holding BOTH.  One hash shuffle
    co-locates each entity; per partition the distinct (entity, item)
    set self-merges into pairs (fan-out C(t,2) per entity — meant for
    small per-entity item sets, e.g. categorical event types), and the
    tiny pair-domain partials fold in one final task.  Output:
    (item_a, item_b, n_entities) sorted."""
    from rayspatial.util import hash_partitioned_agg

    def _pairs(df: pd.DataFrame) -> pa.Table:
        d = df[[entity_col, item_col]].drop_duplicates()
        m = d.merge(d, on=entity_col, suffixes=("_a", "_b"))
        a, b = item_col + "_a", item_col + "_b"
        m = m[m[a] < m[b]]
        out = (m.groupby([a, b], sort=False).size()
               .rename("n_entities").reset_index()
               .rename(columns={a: "item_a", b: "item_b"}))
        out["n_entities"] = out["n_entities"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = hash_partitioned_agg(ds, [entity_col], _pairs,
                                    num_partitions=num_partitions)

    def _fold(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return batch
        df = batch.to_pandas()
        out = (df.groupby(["item_a", "item_b"], sort=False)["n_entities"]
               .sum().reset_index()
               .sort_values(["item_a", "item_b"], ignore_index=True))
        out["n_entities"] = out["n_entities"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (partials.map_batches(_fold, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_fold, batch_size=None, batch_format="pyarrow"))


# --------------------------------------------------------- histogram_fixed

def histogram_fixed(ds, col: str, width: int):
    """Fixed-width integer histogram: bin = floor(col / width) with
    per-bin count + exact sum.  Map-side partials (one row per occupied
    bin per block), folded in one final task — the exchange never
    carries rows, only the occupied-bin summaries.  Output:
    (bin, bin_lo, n, sum_v) sorted by bin."""
    w = int(width)

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy().astype(np.int64)
        b = np.floor_divide(v, w)
        df = pd.DataFrame({"bin": b, "n": np.ones(len(v), np.int64),
                           "sum_v": v})
        out = df.groupby("bin", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def _fold(batch: pa.Table) -> pa.Table:
        if not len(batch):
            # typed empty block in the OUTPUT schema (bin_lo included)
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("bin", "bin_lo", "n", "sum_v")})
        df = batch.to_pandas()
        out = (df.groupby("bin", sort=False)[["n", "sum_v"]].sum()
               .reset_index().sort_values("bin", ignore_index=True))
        out["bin_lo"] = out["bin"] * w
        for c in ("bin", "bin_lo", "n", "sum_v"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out[["bin", "bin_lo", "n", "sum_v"]],
                                    preserve_index=False)

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .map_batches(_fold, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_fold, batch_size=None, batch_format="pyarrow"))


# -------------------------------------------------------- grouped_moments

def grouped_moments(ds, group_cols: list[str], x_col: str, y_col: str,
                    num_partitions: int | None = None):
    """Mergeable bivariate sufficient statistics per group: n, sum(x),
    sum(y), sum(x*y), and the integer-exact covariance numerator
    ``cov_num = n*sum_xy - sum_x*sum_y`` (= n^2 * covar_pop).  x, y
    must be int64, quantized upstream; the caller guarantees
    ``n * |x*y|_max < 2^63`` (documented bound — e.g. cents x hour over
    10^9 rows is safe).  Map-side partial moments, one tiny shuffle.
    """
    from rayspatial.util import hash_partitioned_agg

    def _partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy().astype(np.int64)
        y = batch.column(y_col).to_numpy().astype(np.int64)
        df = pd.DataFrame({
            **{c: batch.column(c).to_numpy(zero_copy_only=False)
               for c in group_cols},
            "n": np.ones(len(batch), np.int64),
            "sum_x": x, "sum_y": y, "sum_xy": x * y,
        })
        out = df.groupby(group_cols, sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(group_cols, sort=False)
               [["n", "sum_x", "sum_y", "sum_xy"]].sum().reset_index())
        for c in ("n", "sum_x", "sum_y", "sum_xy"):
            out[c] = out[c].astype(np.int64)
        out["cov_num"] = out["n"] * out["sum_xy"] - out["sum_x"] * out["sum_y"]
        return out

    return hash_partitioned_agg(partials, group_cols, _finish,
                                num_partitions=num_partitions)


# ------------------------------------------------------------ grouped_concat

def grouped_concat(ds, group_col: str, value_col: str,
                   order_cols: list[str], sep: str = ",",
                   out_col: str = "concat_v",
                   num_partitions: int | None = None):
    """Ordered per-group string aggregation — SQL's
    ``string_agg(value, sep ORDER BY order_cols)`` — the
    training-sequence building aggregate.  ONE hash shuffle co-locates
    each group; per partition a single sort then one pandas
    groupby-join assembles every group's string (string assembly is
    inherently per-group, but runs over grouped array slices, never a
    row-at-a-time loop).  Output (group, concat_v, n:int64).

    Scale note: a group's concatenated string must fit a worker's heap
    — cap upstream (e.g. top-N events per user) for unbounded keys."""
    from rayspatial.util import hash_partitioned_agg

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 out_col: pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        d = df.sort_values([group_col, *order_cols], kind="mergesort")
        g = d.groupby(group_col, sort=False)[value_col]
        out = g.agg(lambda s: sep.join(s.astype(str))).rename(out_col)
        n = g.size().rename("n").astype(np.int64)
        return pd.concat([out, n], axis=1).reset_index()

    return hash_partitioned_agg(ds, [group_col], per_partition,
                                num_partitions=num_partitions)


# ------------------------------------------------------------------ ohlc_agg

def ohlc_agg(ds, group_cols: list[str], order_cols: list[str],
             value_col: str, num_partitions: int | None = None):
    """OHLC candle aggregate: per group, the FIRST and LAST value in
    ``order_cols`` order plus min / max / count — the canonical
    mergeable argmin/argmax aggregate (time-series bars, session
    first-touch / last-touch attribution).

    Map-side partials carry (open, its order key) and (close, its
    order key) per group, so merging two partials is again an
    argmin/argmax — one hash shuffle finishes exactly.  All values
    int64 (quantize floats upstream).  Output: group_cols + open_v /
    high_v / low_v / close_v / n.
    """
    from rayspatial.util import hash_partitioned_agg

    oc = list(order_cols)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(group_cols + oc, kind="mergesort",
                           ignore_index=True)
        g = d.groupby(group_cols, sort=False)
        first = g.head(1).set_index(pd.Index(range(g.ngroups)))
        last = g.tail(1).set_index(pd.Index(range(g.ngroups)))
        agg = g.agg(high_v=("high_v", "max"), low_v=("low_v", "min"),
                    n=("n", "sum")).reset_index()
        agg["open_v"] = first["open_v"].to_numpy()
        agg["close_v"] = last["close_v"].to_numpy()
        for c in oc:
            agg["_o_" + c] = first[c].to_numpy()
            agg["_c_" + c] = last[c].to_numpy()
        cols = (group_cols + ["open_v", "high_v", "low_v", "close_v", "n"]
                + ["_o_" + c for c in oc] + ["_c_" + c for c in oc])
        return agg[cols]

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            **{c: batch.column(c).to_numpy(zero_copy_only=False)
               for c in group_cols + oc},
            "v": batch.column(value_col).to_numpy().astype(np.int64),
        })
        df["open_v"] = df["v"]
        df["close_v"] = df["v"]
        df["high_v"] = df["v"]
        df["low_v"] = df["v"]
        df["n"] = np.int64(1)
        return pa.Table.from_pandas(_reduce(df), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # a partial's open/close ride with their order keys: rename the
        # carried keys back to the order columns and reduce again —
        # open merges by argmin(order), close by argmax(order)
        lo = df[group_cols + ["open_v", "high_v", "low_v", "n"]
                + ["_o_" + c for c in oc]].rename(
            columns={("_o_" + c): c for c in oc})
        hi = df[group_cols + ["close_v"] + ["_c_" + c for c in oc]].rename(
            columns={("_c_" + c): c for c in oc})
        lo = lo.sort_values(group_cols + oc, kind="mergesort")
        hi = hi.sort_values(group_cols + oc, kind="mergesort")
        gl = lo.groupby(group_cols, sort=False)
        gh = hi.groupby(group_cols, sort=False)
        out = gl.agg(high_v=("high_v", "max"), low_v=("low_v", "min"),
                     n=("n", "sum")).reset_index()
        out["open_v"] = gl.head(1)["open_v"].to_numpy()
        out["close_v"] = gh.tail(1)["close_v"].to_numpy()
        for c in ("open_v", "high_v", "low_v", "close_v", "n"):
            out[c] = out[c].astype(np.int64)
        return out[group_cols
                   + ["open_v", "high_v", "low_v", "close_v", "n"]]

    return hash_partitioned_agg(partials, group_cols, merge,
                                num_partitions=num_partitions)
