"""Distributed geometry reductions (reference set_operations.py
``union_all``/``total_bounds`` as partial-per-block + final combine —
the reorderable-identity license is src/ufuncs.c:3328-3334).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def union_all_distributed(ds, wkb_col: str = "wkb"):
    """Union every geometry in a Dataset's WKB column into ONE geometry
    (returned as a 1-row pyarrow Table with a wkb column).

    Classic AGG: each block unions its own geometries (map_batches
    partial), the small per-block results are gathered and unioned once
    (final).  Union is associative+commutative, so the two-phase split
    is exact."""
    from rayspatial.geom.setops import union_all
    from rayspatial.geom.wkb import parse_wkb, to_wkb

    def partial(batch: pa.Table) -> pa.Table:
        ga = parse_wkb(batch.column(wkb_col))
        u = union_all(ga)
        return pa.table({"wkb": pa.array(to_wkb(u), type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        ga = parse_wkb(batch.column("wkb"))
        u = union_all(ga)
        return pa.table({"wkb": pa.array(to_wkb(u), type=pa.binary())})

    return parts.repartition(1).map_batches(
        final, batch_size=None, batch_format="pyarrow"
    )


def total_bounds_distributed(ds, wkb_col: str = "wkb"):
    """Global bounds of a WKB column -> 1-row (xmin, ymin, xmax, ymax)."""
    from rayspatial.geom.measures import total_bounds
    from rayspatial.geom.wkb import parse_wkb

    def partial(batch: pa.Table) -> pa.Table:
        ga = parse_wkb(batch.column(wkb_col))
        tb = total_bounds(ga)
        return pa.table(
            {
                "xmin": [tb[0]],
                "ymin": [tb[1]],
                "xmax": [tb[2]],
                "ymax": [tb[3]],
            }
        )

    from ray.data.aggregate import Max, Min

    part = ds.map_batches(partial, batch_format="pyarrow")
    row = part.aggregate(
        Min("xmin", alias_name="xmin"),
        Min("ymin", alias_name="ymin"),
        Max("xmax", alias_name="xmax"),
        Max("ymax", alias_name="ymax"),
    )
    return pa.table({k: [v] for k, v in row.items()})


def count_coordinates_distributed(ds, wkb_col: str = "wkb") -> int:
    """Global coordinate count (reference coordinates.py:71-89 as an
    AGG sum)."""
    from rayspatial.geom.coordinates import count_coordinates
    from rayspatial.geom.wkb import parse_wkb

    def partial(batch: pa.Table) -> pa.Table:
        ga = parse_wkb(batch.column(wkb_col))
        return pa.table({"n": pa.array([count_coordinates(ga)])})

    return int(
        ds.map_batches(partial, batch_format="pyarrow").sum("n")
    )


def zonal_stats(pairs_ds, key: str = "poly_id", id_col: str = "doc_id",
                lon_col: str = "lon", lat_col: str = "lat"):
    """Per-zone statistics over joined (point x polygon) rows ->
    (key, n_points, sum_lon_micro, sum_lat_micro, min_id, max_id).

    The raster-analysis "zonal statistics" primitive composed on top of
    a spatial join.  Sums are integer micro-degrees so the reduction is
    exact and order-independent (a distributed float sum would depend
    on block combine order and could never hash-match a serial oracle).

    Two-phase AGG like ``tile_counts``: vectorized per-batch pandas
    partials shrink every block to <= #zones rows, then one gather
    merge (result-bounded, KBs at any input scale).
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: batch.column(key).to_numpy(),
            "_lonu": np.round(
                batch.column(lon_col).to_numpy() * 1e6).astype(np.int64),
            "_latu": np.round(
                batch.column(lat_col).to_numpy() * 1e6).astype(np.int64),
            id_col: batch.column(id_col).to_numpy(),
        })
        g = df.groupby(key, sort=False)
        out = g.agg(
            n_points=(id_col, "size"),
            sum_lon_micro=("_lonu", "sum"),
            sum_lat_micro=("_latu", "sum"),
            min_id=(id_col, "min"),
            max_id=(id_col, "max"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = pairs_ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby(key, sort=False).agg(
            n_points=("n_points", "sum"),
            sum_lon_micro=("sum_lon_micro", "sum"),
            sum_lat_micro=("sum_lat_micro", "sum"),
            min_id=("min_id", "min"),
            max_id=("max_id", "max"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return parts.repartition(1).map_batches(
        merge, batch_size=None, batch_format="pyarrow"
    )
