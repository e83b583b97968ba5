"""Tiling: cell encoding + per-cell aggregation with per-batch partial
combine (pre-aggregate inside map_batches so the groupby shuffle moves
one row per (cell, batch) instead of one per point)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial import cell as cellmod


def add_cell_columns(batch: pa.Table, res: int, lon_col="lon", lat_col="lat") -> pa.Table:
    """Append cell (int64 Morton id), cell_x, cell_y at ``res``."""
    lon = batch.column(lon_col).to_numpy()
    lat = batch.column(lat_col).to_numpy()
    cx, cy = cellmod.cell_xy(lon, lat, res)
    cid = cellmod.encode_xy(cx, cy, res)
    return (
        batch.append_column("cell", pa.array(cid))
        .append_column("cell_x", pa.array(cx))
        .append_column("cell_y", pa.array(cy))
    )


def _partial_counts(batch: pa.Table, res: int, keys: list[str], lon_col, lat_col) -> pa.Table:
    lon = batch.column(lon_col).to_numpy()
    lat = batch.column(lat_col).to_numpy()
    cx, cy = cellmod.cell_xy(lon, lat, res)
    cols = {"cell_x": cx, "cell_y": cy}
    for k in keys:
        cols[k] = batch.column(k).to_numpy()
    import pandas as pd

    df = pd.DataFrame(cols)
    out = df.groupby(list(cols.keys()), sort=False).size().reset_index(name="n_partial")
    return pa.Table.from_pandas(out, preserve_index=False)


def tile_counts(points_ds, res: int, extra_keys: list[str] | None = None,
                lon_col: str = "lon", lat_col: str = "lat",
                combine: str = "gather"):
    """points -> per-(cell_x, cell_y[, extra_keys]) counts.

    Two-phase AGG (SURVEY.md §2 legend): vectorized per-batch partial
    counts (map_batches) shrink each block to at most (cells x keys)
    rows, then the partials are combined.

    ``combine='gather'`` (default): coalesce the tiny partials into one
    block and merge with a single vectorized groupby — per-block
    partials are bounded by result cardinality (#tiles x #polygons),
    independent of input rows, so the gather moves KBs even at 10^12
    input rows.  ``combine='groupby'``: hash/sort shuffle instead, for
    result cardinalities too big for one block (e.g. very fine
    resolutions) — same semantics, all-to-all cost.
    """
    keys = extra_keys or []
    group_keys = ["cell_x", "cell_y"] + keys
    partial = points_ds.map_batches(
        lambda b: _partial_counts(b, res, keys, lon_col, lat_col),
        batch_format="pyarrow",
    )
    if combine == "groupby":
        from ray.data.aggregate import Sum

        return partial.groupby(group_keys).aggregate(
            Sum("n_partial", alias_name="n_points")
        )

    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        out = (
            df.groupby(group_keys, sort=False)["n_partial"]
            .sum()
            .reset_index(name="n_points")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return partial.repartition(1).map_batches(merge, batch_size=None, batch_format="pyarrow")


def rasterize_tiles(points_ds, res: int, tile_res: int,
                    lon_col: str = "lon", lat_col: str = "lat"):
    """Raster tiles: group points by coarse cell at ``res``; inside each
    tile rasterize to a (2^(tile_res-res))^2 count grid.  Returns rows
    (cell_x, cell_y, res, grid: list<int64>) — the raster side of the
    raster<->vector materialization (north_star)."""
    sub = tile_res - res
    if sub <= 0:
        raise ValueError("tile_res must exceed res")
    nsub = 1 << sub

    def per_batch(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        fx, fy = cellmod.cell_xy(lon, lat, tile_res)
        cx, cy = fx >> sub, fy >> sub
        sx, sy = fx & (nsub - 1), fy & (nsub - 1)
        import pandas as pd

        df = pd.DataFrame({"cx": cx, "cy": cy, "pix": sy * nsub + sx})
        out = df.groupby(["cx", "cy", "pix"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = points_ds.map_batches(per_batch, batch_format="pyarrow")

    def grids_for_partition(df):
        """ALL tiles of one hash partition in one vectorized pass (a
        per-tile map_groups here would pay one pandas call per tile —
        the millions-of-tiny-groups overhead pairs_from_buckets
        documents)."""
        import pandas as pd

        agg = (
            df.groupby(["cx", "cy", "pix"], sort=True)["n"].sum().reset_index()
        )
        cx = agg["cx"].to_numpy()
        cy = agg["cy"].to_numpy()
        key = (cx.astype(np.int64) << 32) | cy.astype(np.int64)
        new_tile = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_tile)
        tile_of = np.cumsum(new_tile) - 1
        grids = np.zeros((len(starts), nsub * nsub), dtype=np.int64)
        grids[tile_of, agg["pix"].to_numpy()] = agg["n"].to_numpy()
        return pd.DataFrame(
            {
                "cell_x": cx[starts],
                "cell_y": cy[starts],
                "res": np.full(len(starts), res, dtype=np.int64),
                "grid": list(grids),
            }
        )

    from rayspatial.util import hash_partitioned_agg

    return hash_partitioned_agg(partial, ["cx", "cy"], grids_for_partition)


def vectorize_tiles(raster_ds, res: int, tile_res: int, threshold: int = 1):
    """Vector side: grid cells with count >= threshold become boxes,
    merged per tile with coverage union (adjacent boxes merged row-wise
    — disjoint-mosaic fast path of coverage_union_all, reference
    set_operations.py:401-465).  Rows: (cell_x, cell_y, res, wkb)."""
    sub = tile_res - res
    nsub = 1 << sub

    def per_tile(batch: pa.Table) -> pa.Table:
        from rayspatial.geom.constructive import box as mkbox
        from rayspatial.geom.setops import grid_to_boxes
        from rayspatial.geom.wkb import to_wkb

        empty = pa.table(
            {
                "cell_x": pa.array([], type=pa.int64()),
                "cell_y": pa.array([], type=pa.int64()),
                "res": pa.array([], type=pa.int64()),
                "wkb": pa.array([], type=pa.binary()),
            }
        )
        T = len(batch)
        if not T:
            return empty
        # batched decode: ALL grids of the batch into one (T, nsub^2)
        # int64 array, all tile bounds in one vectorized pass — the only
        # remaining per-tile work is the maximal-rectangle cover itself
        cell_x = batch.column("cell_x").to_numpy()
        cell_y = batch.column("cell_y").to_numpy()
        gcol = batch.column("grid")
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        grids = (
            gcol.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .reshape(T, nsub * nsub)
        )
        cid = cellmod.encode_xy(cell_x, cell_y, res)
        xmin, ymin, xmax, ymax = cellmod.cell_bounds(cid)
        w = (xmax - xmin) / nsub
        h = (ymax - ymin) / nsub
        mask = grids >= threshold
        boxes_parts: list[np.ndarray] = []
        tile_of: list[np.ndarray] = []
        for t in np.flatnonzero(mask.any(axis=1)):
            arr = grid_to_boxes(
                mask[t].reshape(nsub, nsub), xmin[t], ymin[t], w[t], h[t]
            )
            if len(arr):
                boxes_parts.append(arr)
                tile_of.append(np.full(len(arr), t, dtype=np.int64))
        if not boxes_parts:
            return empty
        allb = np.vstack(boxes_parts)
        ti = np.concatenate(tile_of)
        ga = mkbox(allb[:, 0], allb[:, 1], allb[:, 2], allb[:, 3])
        return pa.table(
            {
                "cell_x": pa.array(cell_x[ti]),
                "cell_y": pa.array(cell_y[ti]),
                "res": pa.array(np.full(len(ti), res, dtype=np.int64)),
                "wkb": pa.array(list(to_wkb(ga)), type=pa.binary()),
            }
        )

    return raster_ds.map_batches(per_tile, batch_format="pyarrow")


def tile_pyramid(points_ds, res_hi: int, res_lo: int,
                 lon_col: str = "lon", lat_col: str = "lat",
                 combine: str = "gather"):
    """Multi-resolution tile counts (the map-rendering / heat-map
    pyramid): per-cell point counts at EVERY resolution in
    ``[res_lo, res_hi]`` from ONE pass over the raw points.

    Only the finest level touches the input; each coarser level rolls
    up the PREVIOUS LEVEL'S aggregate (already bounded by tile
    cardinality, KBs) by the quad-parent halving ``coord >> 1`` —
    exact because floor(u * 2^(r-1)) == floor(u * 2^r) >> 1 on the
    clamped unit grid, so level r-1 equals a direct aggregation at
    r-1 without rescanning 10^12 rows.  Levels materialize (tiny) so
    the lazy plan doesn't recompute the chain per consumer.

    -> (res, cell_x, cell_y, n_points), each level sorted by
    (cell_x, cell_y) for deterministic output order.
    """
    if not (0 <= res_lo <= res_hi):
        raise ValueError("tile_pyramid: need 0 <= res_lo <= res_hi")

    def tag(ds, r):
        def add_res(batch: pa.Table) -> pa.Table:
            t = batch.sort_by([("cell_x", "ascending"),
                               ("cell_y", "ascending")])
            return pa.table({
                "res": pa.array(np.full(len(t), r, dtype=np.int64)),
                "cell_x": t.column("cell_x"),
                "cell_y": t.column("cell_y"),
                "n_points": t.column("n_points"),
            })
        return ds.map_batches(add_res, batch_size=None,
                              batch_format="pyarrow")

    cur = tile_counts(points_ds, res_hi, lon_col=lon_col,
                      lat_col=lat_col, combine=combine).materialize()
    levels = [tag(cur, res_hi)]
    for r in range(res_hi - 1, res_lo - 1, -1):
        def merge(batch: pa.Table, shift: int) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame({
                "cell_x": batch.column("cell_x").to_numpy() >> shift,
                "cell_y": batch.column("cell_y").to_numpy() >> shift,
                "n_points": batch.column("n_points").to_numpy(),
            })
            out = (df.groupby(["cell_x", "cell_y"], sort=False)
                   ["n_points"].sum().reset_index())
            out["n_points"] = out["n_points"].astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)

        # halve once in the per-block partial; the post-gather merge
        # only re-sums (shift=0)
        cur = (cur.map_batches(lambda b: merge(b, 1),
                               batch_format="pyarrow")
               .repartition(1)
               .map_batches(lambda b: merge(b, 0), batch_size=None,
                            batch_format="pyarrow")
               .materialize())
        levels.append(tag(cur, r))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out
