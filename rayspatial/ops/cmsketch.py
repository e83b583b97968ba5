"""Count-Min sketch: mergeable frequency estimation over a key stream
(Cormode & Muthukrishnan 2005) — the point-query complement of the
engine's other mergeable summaries (MRL quantiles ops/quantile.py,
HyperLogLog ops/distinct.py, Misra-Gries textops/analysis.py).

Contract: ``estimate(k) >= true_count(k)`` always (one-sided), and
``estimate(k) <= true_count(k) + eps * N`` with probability
``1 - delta`` for ``width = ceil(e / eps)``, ``depth =
ceil(ln(1/delta))``.  Sketches ADD cell-wise, so per-block partials
merge associatively — the distributed plan is one streaming
``map_batches`` pass emitting a fixed ``depth x width`` int64 grid per
block and a tree/linear reduce of tiny dense arrays; NO shuffle of the
keys themselves, which is the whole point at 10^12 rows.

Hashing: the d row hashes are splitmix64 finalizations of
``hash ^ row_seed`` — deterministic across processes (no PYTHONHASHSEED
dependence), vectorized over the whole batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["CountMinSketch", "cm_sketch"]

_SEEDS = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _SEEDS).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9))
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB))
    return x ^ (x >> np.uint64(31))


class CountMinSketch:
    """Dense (depth, width) int64 grid with vectorized batch updates."""

    def __init__(self, width: int = 2048, depth: int = 5,
                 table: np.ndarray | None = None):
        self.width = width
        self.depth = depth
        self.table = (np.zeros((depth, width), dtype=np.int64)
                      if table is None else table)

    def add(self, hashes: np.ndarray, counts: np.ndarray | None = None):
        """``hashes``: uint64 key hashes (pre-hash strings with
        textops/hashing.hash_strings); ``counts``: int64 increments
        (default 1 each)."""
        h = hashes.astype(np.uint64)
        c = (np.ones(len(h), dtype=np.int64)
             if counts is None else counts.astype(np.int64))
        for r in range(self.depth):
            seed = np.uint64((r * 0x5851F42D4C957F2D) & 0xFFFFFFFFFFFFFFFF)
            idx = (_splitmix64(h ^ seed)
                   % np.uint64(self.width)).astype(np.int64)
            np.add.at(self.table[r], idx, c)

    def estimate(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.depth):
            seed = np.uint64((r * 0x5851F42D4C957F2D) & 0xFFFFFFFFFFFFFFFF)
            idx = (_splitmix64(h ^ seed)
                   % np.uint64(self.width)).astype(np.int64)
            est = np.minimum(est, self.table[r][idx])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        return CountMinSketch(self.width, self.depth,
                              self.table + other.table)


def cm_sketch(ds, col: str, width: int = 2048, depth: int = 5):
    """One streaming pass -> a merged CountMinSketch of ``col``
    (string or integer).  Per-block partials are (depth*width)-cell
    grids flattened into single-row blocks; the reduce sums tiny dense
    arrays — the keys never shuffle."""
    from rayspatial.textops.hashing import hash_strings

    def partial(batch: pa.Table) -> pa.Table:
        col_a = batch.column(col)
        if pa.types.is_string(col_a.type) or \
                pa.types.is_large_string(col_a.type):
            h = hash_strings(col_a)
        else:
            h = col_a.to_numpy().astype(np.int64).view(np.uint64)
        sk = CountMinSketch(width, depth)
        sk.add(h)
        return pa.table({"_cm": pa.array([sk.table.tobytes()],
                                         type=pa.binary())})

    def merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(depth * width, dtype=np.int64)
        for row in batch.column("_cm"):
            acc += np.frombuffer(row.as_py(), dtype=np.int64)
        return pa.table({"_cm": pa.array([acc.tobytes()],
                                         type=pa.binary())})

    # In-task merge (same shape as the Bloom-filter reduce in
    # ops/equijoin.py): per-block grids are summed inside a single task
    # after repartition(1); the driver pulls exactly ONE row, never the
    # stream of per-block grids.
    final = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    total = (np.frombuffer(final[0]["_cm"], dtype=np.int64)
             .reshape(depth, width).copy())
    return CountMinSketch(width, depth, total)
