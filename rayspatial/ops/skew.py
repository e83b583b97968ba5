"""Skew handling for cell-keyed shuffles (north_rule: "Skewed hot
cells are detected from per-partition histograms and salted/split
before the shuffle").

1. ``cell_histogram``: per-block partial cell counts (map_batches
   combiner) -> tiny global histogram (gather-combine; bounded by
   4^res rows regardless of input size).
2. ``plan_salts``: cells whose count exceeds ``target_rows`` get a
   salt factor ``ceil(n / target_rows)`` — the cell is split into
   that many shuffle keys.
3. ``salted_cell_key``: key = cell * SALT_SPACE + (row_id % salt).
   The salt is derived from a ROW ID, not randomness, so retried
   tasks produce identical keys (idempotent shuffle).

The polygon side of a salted join replicates its per-cell entry into
every salt bucket of that cell (the classic skew-join: split the big
side, replicate the small side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial import cell as cellmod

SALT_SPACE = 1 << 12  # max salt factor per cell


def cell_histogram(points_ds, res: int, lon_col: str = "lon",
                   lat_col: str = "lat"):
    """-> pyarrow Table (cell, n): global cell counts via per-block
    partials + gather-combine (histogram cardinality <= 4^res)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        c = cellmod.cell_encode(lon, lat, res)
        cells, counts = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(cells), "n": pa.array(counts)})

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("cell", sort=True)["n"].sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        points_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pyarrow")
    )


def plan_salts(hist: pa.Table, target_rows: int) -> dict[int, int]:
    """cell -> salt factor (only cells needing a split are listed)."""
    cells = hist.column("cell").to_numpy()
    n = hist.column("n").to_numpy()
    hot = n > target_rows
    salts = np.minimum(np.ceil(n[hot] / target_rows).astype(np.int64), SALT_SPACE - 1)
    return {int(c): int(s) for c, s in zip(cells[hot], salts)}


def salt_values(cell: np.ndarray, row_id: np.ndarray,
                salt_map: dict[int, int]) -> np.ndarray:
    """Deterministic per-row salt (0..salt-1) for the row's cell; 0 for
    cold cells.  Used as the SECOND shuffle key column next to the cell
    id (cell ids carry a resolution prefix in their high bits, so salt
    cannot be packed arithmetically into the same int64)."""
    s_out = np.zeros(len(cell), dtype=np.int64)
    if salt_map:
        salt_cells = np.fromiter(salt_map.keys(), dtype=np.int64)
        salt_vals = np.fromiter(salt_map.values(), dtype=np.int64)
        order = np.argsort(salt_cells)
        salt_cells, salt_vals = salt_cells[order], salt_vals[order]
        pos = np.searchsorted(salt_cells, cell)
        pos_c = np.clip(pos, 0, len(salt_cells) - 1)
        is_hot = salt_cells[pos_c] == cell
        s = np.where(is_hot, salt_vals[pos_c], 1)
        s_out = np.where(s > 1, row_id % s, 0).astype(np.int64)
    return s_out
