"""Z-order (Morton) data layout: interleave the bits of two quantized
dimensions into one sort key so a single range partitioning gives
multidimensional locality — the standard lakehouse layout trick for
pruning 100-TB scans on BOTH columns (queries on either dimension touch
O(sqrt(P)) of P partitions instead of all of them).

Scale shape: the key is a pure per-batch numpy kernel (five mask-shift
rounds per dimension, no Python loop); the layout itself is ONE
``Dataset.sort`` — Ray's sort is already the sample + range-exchange +
in-partition sort we want, so the operator adds zero extra shuffles.
Write the result with ``write_parquet`` (one file per sorted block) and
each file's zkey min/max footer becomes the prune index.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["morton2d", "zorder_layout"]

_M = [np.uint64(m) for m in
      (0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F,
       0x3333333333333333, 0x5555555555555555)]
_S = [np.uint64(s) for s in (16, 8, 4, 2, 1)]


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """uint64 with values < 2^32 -> bits moved to even positions."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    for m, s in zip(_M, _S):
        v = (v | (v << s)) & m
    return v


def morton2d(qx: np.ndarray, qy: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleaved Morton key: bit i of qx lands at position 2i, bit i
    of qy at 2i+1.  ``bits`` <= 31 per dimension (key stays in int64).
    Inputs must already be quantized non-negative ints < 2^bits."""
    if not 1 <= bits <= 31:
        raise ValueError("morton2d: bits must be in [1, 31]")
    qx = np.asarray(qx).astype(np.uint64)
    qy = np.asarray(qy).astype(np.uint64)
    hi = np.uint64(1) << np.uint64(bits)
    if (qx >= hi).any() or (qy >= hi).any():
        raise ValueError(f"morton2d: inputs must be < 2^{bits}")
    return (_spread_bits(qx) | (_spread_bits(qy) << np.uint64(1))
            ).astype(np.int64)


def zorder_layout(ds, qx_col: str, qy_col: str, bits: int = 16,
                  key_col: str = "zkey",
                  tie_cols: list[str] | None = None):
    """Add the Morton key of two pre-quantized integer columns and
    range-sort the dataset by it (``tie_cols`` make the order total
    when several rows share a cell).  Returns the sorted Dataset;
    write it with ``write_parquet`` to materialize the layout."""

    def add_key(batch: pa.Table) -> pa.Table:
        z = morton2d(batch.column(qx_col).to_numpy(),
                     batch.column(qy_col).to_numpy(), bits=bits)
        return batch.append_column(key_col, pa.array(z))

    return (ds.map_batches(add_key, batch_format="pyarrow")
            .sort([key_col, qx_col, qy_col, *(tie_cols or [])]))
