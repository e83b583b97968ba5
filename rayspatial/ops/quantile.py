"""Exact distributed order statistics (quantiles) by iterative
histogram refinement — an EXACT p-quantile over a column too big to
sort globally, without a global shuffle.

Definition: quantile(p) = the ceil(p*n/100)-th smallest value (the
smallest x whose CDF >= p) — pure selection, no interpolation, so no
float arithmetic enters the result and a SQL ``ORDER BY .. OFFSET``
oracle matches bit-for-bit.

Scale shape: a full ``ds.sort`` would move every row through an
all-to-all; instead
1. one streaming aggregate pass for (min, max, count),
2. per level: one map_batches pass emitting a 4096-bin partial
   histogram per block (fixed 32 KB per block regardless of rows),
   gathered bin-wise (bins travel, not rows),
3. the target bin is re-scanned with the SAME bin mapping as a
   predicate (so rank bookkeeping is exact even at float-boundary
   bins); a bin still holding > ``leaf_limit`` rows is recursively
   re-histogrammed (each level divides candidates by ~4096 — 10^12
   rows reach a leaf in <= 3 levels), else its few rows are pulled
   and selected exactly.

The input is materialized once (object-store blocks) because every
level re-scans it; histogram levels are shared across quantiles of
the same call only when they land in the same bin chain, and the
cheap (min,max,count) pass is shared always.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["exact_quantiles", "grouped_quantiles", "grouped_weighted_median",
           "range_partitioned_rank", "QuantileSketch", "approx_quantiles",
           "ntile", "mad_outliers"]

BINS = 4096


def _bin_index(v: np.ndarray, lo: float, hi: float,
               bins: int = BINS) -> np.ndarray:
    """Monotone value -> bin mapping used identically by histogram and
    refinement passes; -1 below lo, ``bins`` above hi."""
    idx = np.full(len(v), -1, dtype=np.int64)
    above = v > hi
    inside = (v >= lo) & ~above
    span = hi - lo
    idx[inside] = np.minimum(
        ((v[inside] - lo) / span * bins).astype(np.int64), bins - 1)
    idx[above] = bins
    return idx


def _hist_pass(ds, col, lo, hi):
    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        idx = _bin_index(v, lo, hi)
        h = np.bincount(idx + 1, minlength=BINS + 2).astype(np.int64)
        return pa.table({
            "bin": pa.array(np.arange(-1, BINS + 1, dtype=np.int64)),
            "n": pa.array(h),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").to_numpy()
        n = batch.column("n").to_numpy()
        out = np.zeros(BINS + 2, dtype=np.int64)
        np.add.at(out, b + 1, n)
        return pa.table({
            "bin": pa.array(np.arange(-1, BINS + 1, dtype=np.int64)),
            "n": pa.array(out),
        })

    rows = parts.repartition(1).map_batches(
        merge, batch_size=None, batch_format="pyarrow").take_all()
    arr = np.zeros(BINS + 2, dtype=np.int64)
    for row in rows:
        arr[row["bin"] + 1] = row["n"]
    return arr[0], arr[1:BINS + 1]        # (count below lo, per-bin)


def _kth_smallest(ds, col, k, lo, hi, leaf_limit=200_000, depth=0):
    """Exact k-th smallest (1-based) value of ds[col]."""
    if lo == hi:
        return lo
    below, hist = _hist_pass(ds, col, lo, hi)
    cum = below + np.cumsum(hist)
    b = int(np.searchsorted(cum, k))
    rank_before = int(cum[b - 1]) if b else int(below)
    span = hi - lo
    blo = lo + span * b / BINS
    bhi = hi if b == BINS - 1 else lo + span * (b + 1) / BINS
    in_bin = int(hist[b])

    def bin_filter(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_bin_index(v, lo, hi) == b))

    sub = ds.map_batches(bin_filter, batch_format="pyarrow")
    if in_bin > leaf_limit and depth < 6 and bhi > blo:
        # widen one ulp each side: bin rows can straddle the float
        # boundary of blo/bhi while _bin_index stays authoritative
        return _kth_smallest(
            sub, col, k - rank_before,
            float(np.nextafter(blo, -np.inf)),
            float(np.nextafter(bhi, np.inf)),
            leaf_limit, depth + 1)
    vals = np.concatenate(
        [t.column(col).to_numpy(zero_copy_only=False)
         for t in sub.iter_batches(batch_format="pyarrow")]
        or [np.empty(0)])
    j = k - rank_before - 1
    return float(np.partition(vals, j)[j])


def _validate_pcts(pcts) -> None:
    """ceil(p*n/100)-th-smallest selection needs 0 < p <= 100 — p=0
    computes k=0 and would silently index the bin/group MAXIMUM via
    the -1 wraparound (ADVICE r3)."""
    for p in pcts:
        if not 0 < p <= 100:
            raise ValueError(
                f"percentile {p!r} out of range: selection contract is "
                "the ceil(p*n/100)-th smallest, defined for 0 < p <= 100")


def exact_quantiles(ds, col: str, pcts: list[int],
                    leaf_limit: int = 200_000):
    """Dataset + numeric column -> pyarrow Table (pct, value); value
    is the exact ceil(p*n/100)-th smallest of the column.

    All requested quantiles SHARE the (min,max,count) pass and the
    level-1 histogram pass; leaf bins of every quantile are pulled in
    ONE combined filtered scan (tagged by bin), so the common case is
    3 streaming passes total regardless of len(pcts).  Only an
    oversized bin (> leaf_limit rows) recurses, and quantiles landing
    in the same bin share that recursion too."""
    from ray.data.aggregate import Count, Max, Min

    _validate_pcts(pcts)
    agg = ds.aggregate(Min(col, alias_name="lo"),
                       Max(col, alias_name="hi"),
                       Count(alias_name="n"))
    if agg is None or agg["n"] is None or int(agg["n"]) == 0:
        # empty input: no k-th smallest exists — typed-null values
        return pa.table({"pct": pa.array(sorted(pcts), pa.int64()),
                         "value": pa.nulls(len(pcts), pa.float64())})
    lo, hi, n = float(agg["lo"]), float(agg["hi"]), int(agg["n"])
    ds = ds.materialize()      # every level re-scans the same blocks
    ks = {p: -(-p * n // 100) for p in pcts}
    result: dict[int, float] = {}
    if lo == hi:
        result = {p: lo for p in pcts}
    else:
        below, hist = _hist_pass(ds, col, lo, hi)
        cum = below + np.cumsum(hist)
        span = hi - lo
        by_bin: dict[int, list[int]] = {}
        for p, k in ks.items():
            by_bin.setdefault(int(np.searchsorted(cum, k)), []).append(p)
        leaf_bins = [b for b in by_bin if hist[b] <= leaf_limit]

        if leaf_bins:
            bset = np.array(sorted(leaf_bins), dtype=np.int64)

            def leaf_filter(batch: pa.Table) -> pa.Table:
                v = batch.column(col).to_numpy(zero_copy_only=False)
                bi = _bin_index(v, lo, hi)
                return batch.filter(pa.array(np.isin(bi, bset)))

            vals = np.concatenate(
                [t.column(col).to_numpy(zero_copy_only=False)
                 for t in ds.map_batches(leaf_filter,
                                         batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")]
                or [np.empty(0)])
            vbin = _bin_index(vals, lo, hi)
            for b in leaf_bins:
                bv = np.sort(vals[vbin == b])
                rank_before = int(cum[b - 1]) if b else int(below)
                for p in by_bin[b]:
                    result[p] = float(bv[ks[p] - rank_before - 1])

        for b in by_bin:
            if hist[b] <= leaf_limit:
                continue
            rank_before = int(cum[b - 1]) if b else int(below)
            blo = lo + span * b / BINS
            bhi = hi if b == BINS - 1 else lo + span * (b + 1) / BINS

            def bin_filter(batch: pa.Table, _b=b) -> pa.Table:
                v = batch.column(col).to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(_bin_index(v, lo, hi) == _b))

            sub = ds.map_batches(bin_filter, batch_format="pyarrow") \
                .materialize()
            for p in by_bin[b]:
                result[p] = _kth_smallest(
                    sub, col, ks[p] - rank_before,
                    float(np.nextafter(blo, -np.inf)),
                    float(np.nextafter(bhi, np.inf)), leaf_limit, 1)

    return pa.table({
        "pct": pa.array([int(p) for p in pcts], type=pa.int64()),
        "value": pa.array([result[p] for p in pcts], type=pa.float64()),
    })


def grouped_quantiles(ds, group_col: str, col: str, pcts: list[int],
                      num_partitions: int | None = None):
    """Per-group exact quantiles: one hash shuffle co-locates each
    group, then a vectorized selection per group — right when groups
    are numerous and individually partition-sized (the complement of
    ``exact_quantiles``, which handles ONE giant distribution).  A
    single group bigger than a partition should use
    ``exact_quantiles`` on a filtered dataset instead.

    Output (group, pct, value); value = ceil(p*n_g/100)-th smallest
    within the group (same selection contract as exact_quantiles).
    """
    import pandas as pd

    from rayspatial.util import hash_partitioned_agg

    _validate_pcts(pcts)

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        rows_g, rows_p, rows_v = [], [], []
        for g, sub in pdf.groupby(group_col, sort=False):
            v = np.sort(sub[col].to_numpy())
            n = len(v)
            for p in pcts:
                rows_g.append(g)
                rows_p.append(int(p))
                rows_v.append(float(v[-(-p * n // 100) - 1]))
        return pd.DataFrame({group_col: rows_g,
                             "pct": pd.Series(rows_p, dtype="int64"),
                             "value": rows_v})

    return hash_partitioned_agg(ds, [group_col], per_partition,
                                num_partitions=num_partitions)


def grouped_weighted_median(ds, group_col: str, value_col: str,
                            weight_col: str,
                            num_partitions: int | None = None):
    """Per-group WEIGHTED median (lower): the smallest value v with
    ``2 * cumweight(<= v) >= total_weight`` — SQL's
    ``MIN(v) FILTER (2*SUM(w) OVER (ORDER BY v) >= SUM(w) OVER ())``
    per group.  Weights must be positive integers (quantize upstream).

    Scale shape: map-side partial weight sums per (group, value) shrink
    the ONE hash shuffle to the distinct-value domain; per partition a
    single sort + segmented cumsum picks every group's median with no
    per-group Python loop.  Output (group, wmedian:int64)."""
    import pandas as pd

    from rayspatial.util import hash_partitioned_agg

    def partial(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col).to_numpy().astype(np.int64)
        if (w <= 0).any():
            raise ValueError("grouped_weighted_median: weights must be "
                             "positive integers")
        df = pd.DataFrame({
            "g": batch.column(group_col).to_numpy(zero_copy_only=False),
            "v": batch.column(value_col).to_numpy().astype(np.int64),
            "w": w,
        })
        out = df.groupby(["g", "v"], sort=False)["w"].sum().reset_index()
        out["w"] = out["w"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "wmedian": pd.Series([], dtype="int64")})
        d = (pdf.groupby(["g", "v"], sort=False)["w"].sum().reset_index()
             .sort_values(["g", "v"], kind="mergesort",
                          ignore_index=True))
        gk = d["g"].to_numpy()
        w = d["w"].to_numpy().astype(np.int64)
        v = d["v"].to_numpy().astype(np.int64)
        new = np.r_[True, gk[1:] != gk[:-1]]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        cw = np.cumsum(w)
        base = np.r_[np.int64(0), cw[starts[1:] - 1]]
        cwg = cw - base[seg]
        ends = np.r_[starts[1:], len(d)] - 1
        tot = cwg[ends][seg]
        nbad = np.add.reduceat((2 * cwg < tot).astype(np.int64), starts)
        pick = starts + nbad
        return pd.DataFrame({group_col: gk[pick],
                             "wmedian": pd.Series(v[pick], dtype="int64")})

    return hash_partitioned_agg(partials, ["g"], per_partition,
                                num_partitions=num_partitions)


def quantile_band_filter(ds, col: str, lo_pct: int, hi_pct: int,
                         leaf_limit: int = 200_000):
    """Keep rows whose ``col`` lies in the exact [p_lo, p_hi] percentile
    band — the percentile-threshold curation shape (drop the length /
    quality-score tails before training).

    Composition, no extra machinery: ``exact_quantiles`` resolves both
    thresholds in the same shared histogram passes (driver receives
    two scalars), then ONE streaming filter applies them — the corpus
    is never materialized beyond exact_quantiles' own block reuse."""
    qt = exact_quantiles(ds, col, [lo_pct, hi_pct], leaf_limit=leaf_limit)
    vals = dict(zip(qt.column("pct").to_pylist(),
                    qt.column("value").to_pylist()))
    lo, hi = vals[lo_pct], vals[hi_pct]

    def band(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((v >= lo) & (v <= hi)))

    return ds.map_batches(band, batch_format="pyarrow")


def range_partitioned_rank(ds, key_col: str, tie_col: str,
                           num_parts: int | None = None):
    """EXACT global dense rank (0-based ROW_NUMBER by
    ``(key, tie)``) without a global sort or driver gather — the
    distributed-sort primitive (TeraSort shape) built from this
    module's exact quantiles:

    1. exact key quantiles at the part boundaries (3 shared streaming
       passes) -> deterministic split values,
    2. per-batch part assignment (``searchsorted`` side='left': equal
       keys can NEVER straddle a boundary, so ties stay co-located;
       heavy single-key skew makes parts uneven — the documented
       trade, salt upstream if one key dominates),
    3. per-part row counts (bounded gather: one int per part) ->
       exclusive prefix offsets,
    4. one hash-free range shuffle (groupby part), per-part vectorized
       sort, ``rank = part_offset + arange``.

    Output: (tie_col, key_col, rank) — equal to SQL
    ``ROW_NUMBER() OVER (ORDER BY key, tie) - 1``.
    """
    import ray

    from rayspatial.util import cluster_cpus

    P = num_parts or 2 * cluster_cpus()
    pcts = [round(i * 100 / P) for i in range(1, P)]
    pcts = sorted({p for p in pcts if 0 < p < 100})
    qt = exact_quantiles(ds, key_col, pcts) if pcts else None
    if qt is not None:
        splits = np.sort(np.asarray(qt.column("value").to_pylist(),
                                    dtype=np.float64))
    else:
        splits = np.empty(0, dtype=np.float64)
    sref = ray.put(splits)

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        sp = _ray.get(sref)
        k = batch.column(key_col).to_numpy().astype(np.float64)
        part = np.searchsorted(sp, k, side="left").astype(np.int64)
        return pa.table({
            tie_col: batch.column(tie_col),
            key_col: batch.column(key_col),
            "_part": pa.array(part),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    # bounded gather: per-part counts -> exclusive offsets
    def count_parts(batch: pa.Table) -> pa.Table:
        p, c = np.unique(batch.column("_part").to_numpy(),
                         return_counts=True)
        return pa.table({"p": pa.array(p), "c": pa.array(c.astype(np.int64))})

    def count_combine(batch: pa.Table) -> pa.Table:
        # second-level combine: gather is task-bounded, not block-bounded
        if not len(batch):
            return batch
        acc = np.zeros(len(splits) + 1, dtype=np.int64)
        np.add.at(acc, batch.column("p").to_numpy(),
                  batch.column("c").to_numpy())
        nz = np.flatnonzero(acc)
        return pa.table({"p": pa.array(nz), "c": pa.array(acc[nz])})

    crows = (
        assigned.map_batches(count_parts, batch_format="pyarrow")
        .repartition(8)
        .map_batches(count_combine, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    counts = np.zeros(len(splits) + 1, dtype=np.int64)
    for r in crows:
        counts[r["p"]] += r["c"]
    offsets = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=offsets[1:])
    oref = ray.put(offsets)

    def rank_part(df) -> pa.Table:
        import pandas as pd
        import ray as _ray

        if not len(df):
            return pa.table({tie_col: pa.array([], type=pa.int64()),
                             key_col: pa.array([], type=pa.int64()),
                             "rank": pa.array([], type=pa.int64())})
        offs = _ray.get(oref)
        part = int(df["_part"].iloc[0])
        df = df.sort_values([key_col, tie_col], kind="mergesort")
        out = df[[tie_col, key_col]].copy()
        out["rank"] = offs[part] + np.arange(len(df), dtype=np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return assigned.groupby("_part").map_groups(
        rank_part, batch_format="pandas")


def ntile(ds, key_col: str, tie_col: str, k: int,
          num_parts: int | None = None):
    """EXACT global NTILE(k) by (key, tie): the ``range_partitioned_rank``
    machinery (quantile splits -> range shuffle -> per-part offset
    arange) plus the standard bucket formula — with n rows, q = n//k
    and m = n%k, the first m buckets take q+1 rows.  Output:
    (tie, key, rank, bucket); bucket is SQL ``NTILE(k) OVER (ORDER BY
    key, tie)``.  The total row count rides the same bounded per-part
    count gather that rank already does (re-derived from the ranked
    stream's own partial counts — no extra full pass)."""
    from ray.data.aggregate import Max

    ranked = range_partitioned_rank(ds, key_col, tie_col,
                                    num_parts=num_parts)

    # n = max(rank)+1, a tiny aggregate over the already-shuffled stream
    ranked = ranked.materialize()
    agg = ranked.aggregate(Max("rank"))
    n = int(agg["max(rank)"]) + 1 if agg and agg.get(
        "max(rank)") is not None else 0
    if n == 0:
        return ranked.map_batches(
            lambda b: b.append_column("bucket",
                                      pa.array([], pa.int64())),
            batch_format="pyarrow")
    q, m = divmod(n, k)
    cut = m * (q + 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy()
        if q == 0:
            b = r + 1  # fewer rows than buckets: one row per bucket
        else:
            b = np.where(r < cut, r // (q + 1) + 1,
                         m + (r - cut) // q + 1)
        return batch.append_column("bucket",
                                   pa.array(b.astype(np.int64)))

    return ranked.map_batches(bucketize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# mergeable approximate quantiles (MRL / deterministic-KLL shape)


class QuantileSketch:
    """Deterministic mergeable quantile summary: levelled buffers of
    capacity ``k``; a full level sorts and keeps every other element
    (compaction parity flips per level per compaction, removing
    systematic bias), promoting survivors with doubled weight.  The
    Manku-Rajagopalan-Lindsay shape with deterministic compaction —
    rank error grows O(log^2(n/k)/k), regression-tested below 1% at
    k=256 on 1M rows.

    Why it exists next to ``exact_quantiles``: the exact operator costs
    3+ full passes; the sketch is ONE streaming pass whose partials are
    a few KB per block and merge associatively — at 10^12 rows the
    driver sees fixed-size summaries, never data."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0)]
        self.parity: list[int] = [0]
        self.n = 0

    def _compact(self):
        lv = 0
        while lv < len(self.levels):
            if len(self.levels[lv]) > self.k:
                buf = np.sort(self.levels[lv])
                keep = buf[self.parity[lv]::2]
                self.parity[lv] ^= 1
                self.levels[lv] = np.empty(0)
                if lv + 1 == len(self.levels):
                    self.levels.append(np.empty(0))
                    self.parity.append(0)
                self.levels[lv + 1] = np.concatenate(
                    [self.levels[lv + 1], keep])
            lv += 1

    def update_batch(self, vals: np.ndarray):
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        self.n += len(vals)
        # feed in k-sized slices so level 0 never overshoots wildly
        for s in range(0, len(vals), self.k):
            self.levels[0] = np.concatenate(
                [self.levels[0], vals[s:s + self.k]])
            self._compact()

    def merge(self, other: "QuantileSketch"):
        if other.k != self.k:
            raise ValueError("sketch k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0))
            self.parity.append(0)
        for lv, buf in enumerate(other.levels):
            if len(buf):
                self.levels[lv] = np.concatenate([self.levels[lv], buf])
        self.n += other.n
        self._compact()
        return self

    def quantile(self, p: float) -> float:
        """value whose weighted rank is ceil(p/100 * n) (same selection
        contract as exact_quantiles, approximately)."""
        vals = np.concatenate([b for b in self.levels if len(b)])
        wts = np.concatenate(
            [np.full(len(b), 1 << lv, dtype=np.int64)
             for lv, b in enumerate(self.levels) if len(b)])
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        target = max(-(-p * wts.sum() // 100), 1)
        idx = int(np.searchsorted(np.cumsum(wts), target))
        return float(vals[min(idx, len(vals) - 1)])

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            (self.k, self.n, self.parity,
             [b.tolist() for b in self.levels]))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "QuantileSketch":
        import pickle

        k, n, parity, levels = pickle.loads(blob)
        s = cls(k)
        s.n = n
        s.parity = list(parity)
        s.levels = [np.asarray(b, dtype=np.float64) for b in levels]
        return s


def approx_quantiles(ds, col: str, pcts: list[int], k: int = 256):
    """ONE-pass approximate quantiles -> pyarrow Table (pct, value).

    Shape: per-block sketches (map_batches partial, a few KB each) ->
    one bounded combine to ``P`` partial merges (hash shuffle of blobs,
    NOT data) -> driver merges P blobs.  Driver memory is O(P * k *
    log(n/k)) floats regardless of corpus size.  Merge order is fixed
    by sorting blobs (deterministic for deterministic input blocks)."""
    from rayspatial.util import hash_partitioned_agg

    _validate_pcts(pcts)

    def partial(batch: pa.Table) -> pa.Table:
        s = QuantileSketch(k)
        s.update_batch(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([s.to_bytes()],
                                          type=pa.binary()),
                         "tag": pa.array([s.n], type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge_partition(df) -> "pd.DataFrame":
        import pandas as pd

        blobs = sorted(df["blob"], key=lambda b: (len(b), b))
        acc = QuantileSketch.from_bytes(blobs[0])
        for b in blobs[1:]:
            acc = acc.merge(QuantileSketch.from_bytes(b))
        return pd.DataFrame({"blob": [acc.to_bytes()],
                             "tag": [np.int64(acc.n)]})

    merged = hash_partitioned_agg(parts, ["tag"], merge_partition,
                                  num_partitions=8)
    rows = merged.take_all()
    blobs = sorted((r["blob"] for r in rows), key=lambda b: (len(b), b))
    acc = QuantileSketch.from_bytes(blobs[0])
    for b in blobs[1:]:
        acc = acc.merge(QuantileSketch.from_bytes(b))
    return pa.table({
        "pct": pa.array([int(p) for p in pcts], type=pa.int64()),
        "value": pa.array([acc.quantile(p) for p in pcts],
                          type=pa.float64()),
    })


def mad_outliers(ds, group_col: str, id_col: str, col: str,
                 k_mad: int = 3, num_partitions: int | None = None):
    """Robust per-group anomaly detection: rows where
    ``|x - median_g| > k_mad * MAD_g`` (MAD = median of absolute
    deviations, both medians the exact ceil(n/2)-th order statistic —
    the grouped_quantiles selection contract, so a SQL oracle
    reproduces every threshold bit-for-bit on integer inputs).

    ONE hash exchange: the group's rows co-locate, so median, MAD and
    the filter all happen in a single per-partition pass — no stats
    join, nothing but the surviving outlier rows leaves the partition.
    A constant-valued group has MAD 0: any deviation flags (the
    textbook degenerate case; pre-filter if unwanted).
    Output (group, id, value, med, mad), sorted by (group, id).
    """
    import pandas as pd

    from rayspatial.util import hash_partitioned_agg

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, sub in pdf.groupby(group_col, sort=False):
            v = sub[col].to_numpy()
            n = len(v)
            kth = (50 * n + 99) // 100          # ceil(n/2), 1-based
            med = int(np.partition(v, kth - 1)[kth - 1])
            dev = np.abs(v - med)
            mad = int(np.partition(dev, kth - 1)[kth - 1])
            keep = dev > k_mad * mad
            if keep.any():
                o = sub[keep].copy()
                o["med"] = np.int64(med)
                o["mad"] = np.int64(mad)
                outs.append(o)
        if not outs:
            return pd.DataFrame(columns=[group_col, id_col, col,
                                         "med", "mad"])
        out = pd.concat(outs)[[group_col, id_col, col, "med", "mad"]]
        return out.sort_values([group_col, id_col], kind="stable")

    return hash_partitioned_agg(ds, [group_col], per_partition,
                                num_partitions=num_partitions)
