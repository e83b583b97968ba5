"""Coordinate transforms (reference pygeos/coordinates.py, C walker
src/coords.c:26-330).

GeomArray already IS the flattened coordinate buffer + offsets the
reference materializes on demand, so these are near-zero-cost views —
``apply`` is the engine's coordinate-UDF hook (reprojection,
tile-local transforms) and runs the user fn on the batch's whole
buffer at once.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from rayspatial.geom.array import GeomArray

__all__ = [
    "apply",
    "count_coordinates",
    "get_coordinates",
    "set_coordinates",
]


def count_coordinates(ga: GeomArray) -> int:
    """Total coordinate count (coordinates.py:71-89)."""
    return int(ga.coords.shape[0])


def get_coordinates(ga: GeomArray, include_z: bool = False,
                    return_index: bool = False):
    """Flatten to (N, 2|3) float64 (+ optional geometry row index per
    coordinate) — coordinates.py:92-138."""
    if include_z:
        z = ga.z if ga.z is not None else np.full(len(ga.coords), np.nan)
        out = np.column_stack([ga.coords, z])
    else:
        out = ga.coords.copy()
    if return_index:
        sizes = np.diff(ga.part_off)
        idx = np.repeat(ga.part_geom, sizes)
        return out, idx
    return out


def set_coordinates(ga: GeomArray, coords: np.ndarray) -> GeomArray:
    """Write a transformed coordinate buffer back, shape-preserving
    (coordinates.py:139-169).  Returns a NEW GeomArray (the engine is
    immutable-columnar; the reference mutates in place)."""
    coords = np.asarray(coords, dtype=np.float64)
    if coords.shape[0] != ga.coords.shape[0]:
        raise ValueError(
            f"coordinate count changed: {ga.coords.shape[0]} -> {coords.shape[0]}"
        )
    if coords.ndim != 2 or coords.shape[1] not in (2, 3):
        raise ValueError("coords must be (N, 2) or (N, 3)")
    z = ga.z
    if coords.shape[1] == 3:
        z = coords[:, 2].copy()
        coords = coords[:, :2]
    return replace(ga, coords=np.ascontiguousarray(coords), z=z)


def apply(ga: GeomArray, transformation, include_z: bool = False) -> GeomArray:
    """Run a user fn on the flattened (N, 2|3) buffer and rebuild —
    the reference's UDF hook (coordinates.py:9-68)."""
    buf = get_coordinates(ga, include_z=include_z)
    out = np.asarray(transformation(buf), dtype=np.float64)
    if out.shape != buf.shape:
        raise ValueError(
            f"transformation changed coordinate shape {buf.shape} -> {out.shape}"
        )
    return set_coordinates(ga, out)
