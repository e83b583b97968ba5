"""Creation constructors (reference pygeos/creation.py).

Vectorized coordinate-array -> GeomArray builders.  NaN coordinate
rows become missing geometries (pygeos: NaN point -> empty in GEOS
>= 3.10, creation.py:34-78 — we follow the missing convention used by
our ``box``, NaN -> missing, which the tests pin down).

``indices`` grouping (reference _geometry.pyx collections_1d) is
expressed tabularly: ``multipoints(coords, indices=...)`` groups
coordinate runs by the indices vector, exactly like the reference's
group-assignment form.
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    GEOMETRYCOLLECTION,
    LINEARRING,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    PK_HOLE,
    PK_LINE,
    PK_POINT,
    PK_SHELL,
    POINT,
    POLYGON,
    GeomArray,
    _Builder,
)
from rayspatial.geom.constructive import _append_empty, _append_missing

__all__ = [
    "points",
    "linestrings",
    "linearrings",
    "polygons",
    "multipoints",
    "multilinestrings",
    "multipolygons",
    "geometrycollections",
    "collect",
]


def _coerce_coords(coords, y=None, z=None) -> tuple[np.ndarray, np.ndarray | None]:
    if y is not None:
        x = np.atleast_1d(np.asarray(coords, dtype=np.float64))
        yv = np.atleast_1d(np.asarray(y, dtype=np.float64))
        xy = np.column_stack(np.broadcast_arrays(x, yv))
    else:
        xy = np.atleast_2d(np.asarray(coords, dtype=np.float64))
    zv = None
    if z is not None:
        zv = np.broadcast_to(
            np.atleast_1d(np.asarray(z, dtype=np.float64)), len(xy)
        ).astype(np.float64)
    elif xy.shape[1] == 3:
        zv = xy[:, 2].copy()
        xy = xy[:, :2]
    return np.ascontiguousarray(xy), zv


def points(coords, y=None, z=None) -> GeomArray:
    """(n,2|3) coords (or x,y[,z] arrays) -> POINT array
    (creation.py:34-78)."""
    xy, zv = _coerce_coords(coords, y, z)
    if zv is None:
        # vectorized 2-D construction — the layout of an all-point
        # array is arithmetic (one part per valid row), and this is
        # the hot constructor of every WKB/extract pipeline
        n = len(xy)
        missing = np.isnan(xy).any(axis=1)
        valid = ~missing
        nv = int(valid.sum())
        types = np.where(missing, MISSING, POINT).astype(np.int8)
        return GeomArray(
            types=types,
            part_geom=np.flatnonzero(valid).astype(np.int64),
            part_kind=np.zeros(nv, dtype=np.int8),
            part_sub=np.arange(nv, dtype=np.int64),
            part_off=np.arange(nv + 1, dtype=np.int64),
            coords=np.ascontiguousarray(xy[valid], dtype=np.float64),
            z=None,
            has_z=np.zeros(n, dtype=bool),
            num_children=valid.astype(np.int64),
        )
    b = _Builder()
    for i in range(len(xy)):
        if np.isnan(xy[i]).any():
            _append_missing(b)
            continue
        b.types.append(POINT)
        zz = None if zv is None or np.isnan(zv[i]) else np.array([zv[i]])
        b.add_part(i, PK_POINT, b.sub_counter, xy[i : i + 1].copy(),
                   zz)
        b.sub_counter += 1
        b.has_z.append(zz is not None)
        b.num_children.append(1)
    return b.finish()


def _line_like(coord_list, typ: int, min_pts: int, close: bool) -> GeomArray:
    b = _Builder()
    for i, c in enumerate(coord_list):
        if c is None:
            _append_missing(b)
            continue
        xy = np.asarray(c, dtype=np.float64)
        if xy.size == 0:
            _append_empty(b, typ)
            continue
        xy = np.atleast_2d(xy)[:, :2]
        if close and not np.array_equal(xy[0], xy[-1]):
            xy = np.vstack([xy, xy[:1]])  # auto-close (creation.py:125-177)
        if len(xy) < min_pts:
            raise ValueError(
                f"geometry {i}: need >= {min_pts} points, got {len(xy)}"
            )
        b.types.append(typ)
        b.add_part(i, PK_LINE, b.sub_counter, xy)
        b.sub_counter += 1
        b.has_z.append(False)
        b.num_children.append(1)
    return b.finish()


def linestrings(coord_list) -> GeomArray:
    """list of (k,2) arrays -> LINESTRING array (creation.py:79-124);
    >= 2 points each."""
    return _line_like(coord_list, LINESTRING, 2, close=False)


def linearrings(coord_list) -> GeomArray:
    """list of (k,2) arrays -> LINEARRING array; auto-closed, >= 4
    closed points (creation.py:125-177)."""
    return _line_like(coord_list, LINEARRING, 4, close=True)


def polygons(shells, holes=None) -> GeomArray:
    """shells: list of (k,2) ring arrays; holes: optional list of
    hole-ring lists per shell (creation.py:178-270)."""
    b = _Builder()
    for i, sh in enumerate(shells):
        if sh is None:
            _append_missing(b)
            continue
        xy = np.atleast_2d(np.asarray(sh, dtype=np.float64))[:, :2]
        if len(xy) == 0:
            _append_empty(b, POLYGON)
            continue
        if not np.array_equal(xy[0], xy[-1]):
            xy = np.vstack([xy, xy[:1]])
        pid = b.poly_counter
        b.types.append(POLYGON)
        b.add_part(i, PK_SHELL, pid, xy)
        hs = holes[i] if holes is not None else None
        for h in hs or []:
            if h is None:
                continue
            hxy = np.atleast_2d(np.asarray(h, dtype=np.float64))[:, :2]
            if len(hxy) == 0:
                continue
            if not np.array_equal(hxy[0], hxy[-1]):
                hxy = np.vstack([hxy, hxy[:1]])
            b.add_part(i, PK_HOLE, pid, hxy)
        b.poly_counter += 1
        b.has_z.append(False)
        b.num_children.append(1)
    return b.finish()


def _grouped(parts: GeomArray, indices, n_out: int | None, out_type_of) -> GeomArray:
    """Group geometries of ``parts`` into collections by ``indices``
    (the reference's collections_1d group-assignment vector,
    _geometry.pyx:247)."""
    idx = np.asarray(indices, dtype=np.int64)
    if len(idx) != len(parts):
        raise ValueError("indices length must match geometries length")
    n = n_out if n_out is not None else (int(idx.max()) + 1 if len(idx) else 0)
    b = _Builder()
    order = np.argsort(idx, kind="stable")
    bounds = np.searchsorted(idx[order], np.arange(n + 1))
    for g in range(n):
        members = order[bounds[g] : bounds[g + 1]]
        member_types = parts.types[members]
        live = members[member_types != -1]
        typ = out_type_of(parts.types[live] if len(live) else np.array([]))
        if not len(live):
            _append_empty(b, typ)
            continue
        b.types.append(typ)
        nch = 0
        for m in live:
            pmask = np.flatnonzero(parts.part_geom == m)
            poly_map: dict[int, int] = {}
            for p in pmask:
                kind = int(parts.part_kind[p])
                sub = int(parts.part_sub[p])
                xy = parts.part_coords(p).copy()
                if kind in (PK_SHELL, PK_HOLE):
                    if sub not in poly_map:
                        poly_map[sub] = b.poly_counter
                        b.poly_counter += 1
                    b.add_part(g, kind, poly_map[sub], xy)
                else:
                    b.add_part(g, kind, b.sub_counter, xy)
                    b.sub_counter += 1
            nch += 1
        b.has_z.append(False)
        b.num_children.append(nch)
    return b.finish()


def multipoints(parts: GeomArray, indices=None, n_out: int | None = None) -> GeomArray:
    if indices is None:
        indices = np.zeros(len(parts), dtype=np.int64)
    return _grouped(parts, indices, n_out, lambda t: MULTIPOINT)


def multilinestrings(parts: GeomArray, indices=None, n_out: int | None = None) -> GeomArray:
    if indices is None:
        indices = np.zeros(len(parts), dtype=np.int64)
    return _grouped(parts, indices, n_out, lambda t: MULTILINESTRING)


def multipolygons(parts: GeomArray, indices=None, n_out: int | None = None) -> GeomArray:
    if indices is None:
        indices = np.zeros(len(parts), dtype=np.int64)
    return _grouped(parts, indices, n_out, lambda t: MULTIPOLYGON)


def geometrycollections(parts: GeomArray, indices=None, n_out: int | None = None) -> GeomArray:
    if indices is None:
        indices = np.zeros(len(parts), dtype=np.int64)
    return _grouped(parts, indices, n_out, lambda t: GEOMETRYCOLLECTION)


def collect(parts: GeomArray, indices=None, n_out: int | None = None) -> GeomArray:
    """Type-sniffing collection: MULTI* when members share a simple
    type, GEOMETRYCOLLECTION otherwise."""
    promote = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING, POLYGON: MULTIPOLYGON}

    def out_type(types: np.ndarray) -> int:
        u = np.unique(types)
        if len(u) == 1 and int(u[0]) in promote:
            return promote[int(u[0])]
        return GEOMETRYCOLLECTION

    if indices is None:
        indices = np.zeros(len(parts), dtype=np.int64)
    return _grouped(parts, indices, n_out, out_type)
