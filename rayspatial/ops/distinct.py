"""Grouped COUNT(DISTINCT value): exact and HyperLogLog paths.

Exact (``count_distinct``): per-block local (group, value) dedup acts
as a combiner — the only all-to-all then moves DISTINCT pairs per
block, not raw rows — followed by one hash-partition shuffle by the
group keys and a vectorized per-partition ``nunique`` (every group's
surviving pairs are co-partitioned, so the count is exact).

Approximate (``approx_count_distinct``): classic HyperLogLog
(Flajolet et al. 2007) with 2^p uint8 registers per group.  Per-block
partials emit one (group, registers) row; register arrays merge by
elementwise max under the same single shuffle, so the exchange volume
is #groups x 2^p bytes regardless of row count — the 100-TB shape for
high-cardinality distinct counts where the exact path's pair volume
would itself be the bottleneck.

Both paths stream: no stage materializes the dataset and the driver
never pulls rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayspatial.textops.hashing import hash_int64, hash_strings

__all__ = ["count_distinct", "approx_count_distinct", "hll_estimate"]


def _col_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return hash_strings(col)
    v = col.to_numpy(zero_copy_only=False)
    return hash_int64(v.astype(np.int64).view(np.uint64))


def count_distinct(ds, group_cols: list[str], value_col: str,
                   out_name: str = "n_distinct",
                   num_partitions: int | None = None):
    """Exact per-group distinct count of ``value_col``."""
    from rayspatial.util import hash_partitioned_agg

    keep = list(group_cols) + [value_col]

    def local_dedup(batch: pa.Table) -> pa.Table:
        # Arrow group_by with no aggregates = distinct rows, zero-copy
        return batch.select(keep).group_by(keep).aggregate([])

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(group_cols, sort=False)[value_col]
               .nunique().reset_index(name=out_name))
        return g

    deduped = ds.map_batches(local_dedup, batch_format="pyarrow")
    return hash_partitioned_agg(deduped, list(group_cols), per_partition,
                                num_partitions=num_partitions)


# --- HyperLogLog ----------------------------------------------------------

_HLL_P = 12  # 4096 registers, ~1.6% standard error


def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_partial(group_vals: list[np.ndarray], hashes: np.ndarray,
                 p: int) -> tuple[np.ndarray, np.ndarray]:
    """(unique group row index per input row, registers[n_groups, m])."""
    m = 1 << p
    if len(hashes) == 0:
        return (np.empty(0, dtype=np.int64),
                np.zeros((0, m), dtype=np.uint8))
    # group id per row (lexicographic over the key arrays)
    if group_vals:
        order = np.lexsort(group_vals[::-1])
        new = np.zeros(len(hashes), dtype=bool)
        new[0] = True
        for g in group_vals:
            gs = g[order]
            new[1:] |= gs[1:] != gs[:-1]
        gid_sorted = np.cumsum(new) - 1
        gid = np.empty(len(hashes), dtype=np.int64)
        gid[order] = gid_sorted
        n_groups = int(gid_sorted[-1]) + 1 if len(hashes) else 0
        first_row = np.empty(n_groups, dtype=np.int64)
        first_row[gid_sorted[new]] = order[new]
    else:
        gid = np.zeros(len(hashes), dtype=np.int64)
        n_groups = 1 if len(hashes) else 0
        first_row = np.zeros(max(n_groups, 0), dtype=np.int64)

    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rho = leading zeros of the remaining 64-p bits + 1 (capped)
    nz = rest != 0
    lz = np.full(len(hashes), 64 - p, dtype=np.int64)
    # count leading zeros via float64 exponent trick is lossy; use
    # bit-length: lz = 63 - floor(log2(rest)) computed exactly with
    # 64-bit integer shifts
    r = rest[nz]
    bl = np.zeros(len(r), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        r = np.where(big, r >> np.uint64(shift), r)
    lz[nz] = 63 - bl
    rho = np.minimum(lz + 1, 64 - p).astype(np.uint8)

    regs = np.zeros((n_groups, m), dtype=np.uint8)
    np.maximum.at(regs, (gid, idx), rho)
    return first_row, regs


def hll_estimate(regs: np.ndarray, p: int = _HLL_P) -> float:
    """Bias-corrected HLL cardinality estimate from one register row."""
    m = 1 << p
    regs = regs.astype(np.float64)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_count_distinct(ds, group_cols: list[str], value_col: str,
                          out_name: str = "n_distinct_approx",
                          p: int = _HLL_P,
                          num_partitions: int | None = None):
    """Per-group approximate distinct count via mergeable HLL sketches."""
    from rayspatial.util import hash_partitioned_agg

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        h = _col_u64(batch.column(value_col))
        gv = [batch.column(c).to_numpy(zero_copy_only=False)
              for c in group_cols]
        first_row, regs = _hll_partial(gv, h, p)
        cols = {c: batch.column(c).take(pa.array(first_row))
                for c in group_cols}
        cols["_hll"] = pa.array(list(regs.tobytes()[i * m:(i + 1) * m]
                                     for i in range(len(regs))),
                                type=pa.binary(m))
        return pa.table(cols)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        out_keys: dict[str, list] = {c: [] for c in group_cols}
        est: list[int] = []
        for key, grp in df.groupby(group_cols, sort=False):
            buf = np.frombuffer(b"".join(grp["_hll"]), dtype=np.uint8)
            merged = buf.reshape(len(grp), m).max(axis=0)
            if not isinstance(key, tuple):
                key = (key,)
            for c, kv in zip(group_cols, key):
                out_keys[c].append(kv)
            est.append(int(round(hll_estimate(merged, p))))
        out = pd.DataFrame(out_keys)
        out[out_name] = pd.Series(est, dtype="int64")
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partitioned_agg(partials, list(group_cols), per_partition,
                                num_partitions=num_partitions)
