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
        ga = parse_wkb(batch.column(wkb_col).to_pylist())
        u = union_all(ga)
        return pa.table({"wkb": pa.array(to_wkb(u), type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        ga = parse_wkb(batch.column("wkb").to_pylist())
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
        ga = parse_wkb(batch.column(wkb_col).to_pylist())
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
        ga = parse_wkb(batch.column(wkb_col).to_pylist())
        return pa.table({"n": pa.array([count_coordinates(ga)])})

    return int(
        ds.map_batches(partial, batch_format="pyarrow").sum("n")
    )
