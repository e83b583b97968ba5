"""Geometry accessors / introspection (reference pygeos/geometry.py)
and the explode operators ``get_parts`` / ``get_rings`` — the
reference's only 1-row -> N-rows operators (geometry.py:524-621,
_geometry.pyx:166-232); in the engine they back ``flat_map``-style
stages that emit (part, source_index) tables.

Missing-value conventions copied from the reference: accessors on
missing return -1 / NaN / None per the C ufunc tables
(src/ufuncs.c:148-151; geometry.py docstrings).
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

__all__ = [
    "get_type_id",
    "get_dimensions",
    "get_coordinate_dimension",
    "get_num_coordinates",
    "get_x",
    "get_y",
    "get_z",
    "get_point",
    "get_num_points",
    "get_exterior_ring",
    "get_interior_ring",
    "get_num_interior_rings",
    "get_geometry",
    "get_num_geometries",
    "get_parts",
    "get_rings",
    "force_2d",
    "force_3d",
    "get_srid",
    "set_srid",
    "get_precision",
    "set_precision",
    "empty",
]

_DIMS = {
    MISSING: -1,
    POINT: 0,
    MULTIPOINT: 0,
    LINESTRING: 1,
    LINEARRING: 1,
    MULTILINESTRING: 1,
    POLYGON: 2,
    MULTIPOLYGON: 2,
    GEOMETRYCOLLECTION: 1,  # overridden by max of children below
}


def get_type_id(ga: GeomArray) -> np.ndarray:
    """pygeos GeometryType id per row; -1 missing (geometry.py:56-90)."""
    return ga.types.astype(np.int64)


def get_dimensions(ga: GeomArray) -> np.ndarray:
    """Inherent dimension (0/1/2); -1 for missing; collections take the
    max of their parts (geometry.py:91-121)."""
    out = np.array([_DIMS[int(t)] for t in ga.types], dtype=np.int64)
    gc = np.flatnonzero(ga.types == GEOMETRYCOLLECTION)
    kind_dim = {PK_POINT: 0, PK_LINE: 1, PK_SHELL: 2, PK_HOLE: 2}
    for g in gc:
        kinds = ga.part_kind[ga.part_geom == g]
        out[g] = max((kind_dim[int(k)] for k in kinds), default=0)
    return out


def get_coordinate_dimension(ga: GeomArray) -> np.ndarray:
    """3 when Z present else 2; -1 missing (geometry.py:122-149)."""
    out = np.where(ga.has_z, 3, 2).astype(np.int64)
    out[ga.types == MISSING] = -1
    return out


def get_num_coordinates(ga: GeomArray) -> np.ndarray:
    """Total coordinate count; 0 for missing (geometry.py:150-176)."""
    return ga.coord_counts()


def _point_xy(ga: GeomArray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    x = np.full(len(ga), np.nan)
    y = np.full(len(ga), np.nan)
    z = np.full(len(ga), np.nan)
    pts = np.flatnonzero(ga.types == POINT)
    for g in pts:
        parts = np.flatnonzero(ga.part_geom == g)
        if len(parts):
            c = ga.part_coords(parts[0])
            x[g], y[g] = c[0]
            if ga.z is not None:
                z[g] = ga.z[ga.part_off[parts[0]]]
    return x, y, z


def get_x(ga: GeomArray) -> np.ndarray:
    """x of POINT rows, NaN otherwise (geometry.py:237-262)."""
    return _point_xy(ga)[0]


def get_y(ga: GeomArray) -> np.ndarray:
    return _point_xy(ga)[1]


def get_z(ga: GeomArray) -> np.ndarray:
    return _point_xy(ga)[2]


def get_num_points(ga: GeomArray) -> np.ndarray:
    """Points in each LINESTRING/LINEARRING; 0 otherwise
    (geometry.py:358-393)."""
    out = np.zeros(len(ga), dtype=np.int64)
    lines = (ga.types == LINESTRING) | (ga.types == LINEARRING)
    sizes = np.diff(ga.part_off)
    for p in range(ga.n_parts):
        g = ga.part_geom[p]
        if lines[g]:
            out[g] += sizes[p]
    return out


def get_point(ga: GeomArray, index) -> GeomArray:
    """index-th vertex of each linestring as POINT; missing otherwise
    (geometry.py:322-357).  Negative indices count from the end."""
    from rayspatial.geom.creation import points

    idx = np.broadcast_to(np.asarray(index, dtype=np.int64), len(ga))
    xy = np.full((len(ga), 2), np.nan)
    for p in range(ga.n_parts):
        g = int(ga.part_geom[p])
        if ga.types[g] not in (LINESTRING, LINEARRING):
            continue
        c = ga.part_coords(p)
        i = int(idx[g])
        if -len(c) <= i < len(c):
            xy[g] = c[i]
    return points(xy)


def get_num_interior_rings(ga: GeomArray) -> np.ndarray:
    """Holes per POLYGON row; 0 otherwise (geometry.py:448-485)."""
    out = np.zeros(len(ga), dtype=np.int64)
    for p in range(ga.n_parts):
        if ga.part_kind[p] == PK_HOLE and ga.types[ga.part_geom[p]] == POLYGON:
            out[ga.part_geom[p]] += 1
    return out


def _ring_to_linearring(b: _Builder, g: int, xy: np.ndarray) -> None:
    b.types.append(LINEARRING)
    b.add_part(g, PK_LINE, b.sub_counter, xy.copy())
    b.sub_counter += 1
    b.has_z.append(False)
    b.num_children.append(1)


def get_exterior_ring(ga: GeomArray) -> GeomArray:
    """Shell of each POLYGON as LINEARRING; missing otherwise
    (geometry.py:394-418)."""
    b = _Builder()
    row = 0
    for g in range(len(ga)):
        if ga.types[g] != POLYGON:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
            row += 1
            continue
        shells = [
            p
            for p in np.flatnonzero(ga.part_geom == g)
            if ga.part_kind[p] == PK_SHELL
        ]
        if not shells:
            b.types.append(POLYGON)  # POLYGON EMPTY -> LINEARRING EMPTY
            b.types[-1] = LINEARRING
            b.has_z.append(False)
            b.num_children.append(0)
        else:
            _ring_to_linearring(b, row, ga.part_coords(shells[0]))
        row += 1
    return b.finish()


def get_interior_ring(ga: GeomArray, index) -> GeomArray:
    """index-th hole of each POLYGON as LINEARRING; missing otherwise
    (geometry.py:419-447)."""
    b = _Builder()
    idx = np.broadcast_to(np.asarray(index, dtype=np.int64), len(ga))
    row = 0
    for g in range(len(ga)):
        holes = (
            [
                p
                for p in np.flatnonzero(ga.part_geom == g)
                if ga.part_kind[p] == PK_HOLE
            ]
            if ga.types[g] == POLYGON
            else []
        )
        i = int(idx[g])
        if ga.types[g] != POLYGON or not (-len(holes) <= i < len(holes)):
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
        else:
            _ring_to_linearring(b, row, ga.part_coords(holes[i]))
        row += 1
    return b.finish()


def get_num_geometries(ga: GeomArray) -> np.ndarray:
    """Immediate children of multi*/collections; 1 for simple
    non-empty, 0 for empty/missing (geometry.py:625-657)."""
    if ga.num_children is not None:
        return np.asarray(ga.num_children, dtype=np.int64)
    out = np.zeros(len(ga), dtype=np.int64)
    ne = ~(ga.is_missing() | ga.is_empty())
    out[ne] = 1
    return out


def _extract_child(ga: GeomArray, b: _Builder, out_row: int, g: int,
                   child: int) -> bool:
    """Append child #child of geometry g to the builder as row
    ``out_row``.  Children are counted in part order: each point/line
    part is one child; a shell plus its holes is one child."""
    parts = np.flatnonzero(ga.part_geom == g)
    seen: list[tuple[int, list[int]]] = []  # (kind, part rows)
    cur_poly = None
    for p in parts:
        k = int(ga.part_kind[p])
        if k in (PK_POINT, PK_LINE):
            seen.append((k, [p]))
            cur_poly = None
        elif k == PK_SHELL:
            seen.append((PK_SHELL, [p]))
            cur_poly = len(seen) - 1
        else:  # hole
            if cur_poly is not None:
                seen[cur_poly][1].append(p)
    if not (0 <= child < len(seen)):
        return False
    kind, rows = seen[child]
    if kind == PK_POINT:
        b.types.append(POINT)
        b.add_part(out_row, PK_POINT, b.sub_counter, ga.part_coords(rows[0]).copy())
        b.sub_counter += 1
    elif kind == PK_LINE:
        parent_t = int(ga.types[g])
        b.types.append(LINEARRING if parent_t == LINEARRING else LINESTRING)
        b.add_part(out_row, PK_LINE, b.sub_counter, ga.part_coords(rows[0]).copy())
        b.sub_counter += 1
    else:
        b.types.append(POLYGON)
        pid = b.poly_counter
        b.poly_counter += 1
        b.add_part(out_row, PK_SHELL, pid, ga.part_coords(rows[0]).copy())
        for hp in rows[1:]:
            b.add_part(out_row, PK_HOLE, pid, ga.part_coords(hp).copy())
    b.has_z.append(False)
    b.num_children.append(1)
    return True


def get_geometry(ga: GeomArray, index) -> GeomArray:
    """index-th child of each collection; simple geometries are their
    own 0th child (geometry.py:486-523)."""
    b = _Builder()
    idx = np.broadcast_to(np.asarray(index, dtype=np.int64), len(ga))
    n_children = get_num_geometries(ga)
    empt = ga.is_empty()
    row = 0
    for g in range(len(ga)):
        i = int(idx[g])
        if i < 0:
            i += int(n_children[g])
        simple = ga.types[g] in (POINT, LINESTRING, LINEARRING, POLYGON)
        ok = False
        if ga.types[g] != MISSING:
            if simple:
                ok = i == 0 and not empt[g] and _extract_child(ga, b, row, g, 0)
            else:
                ok = _extract_child(ga, b, row, g, i)
        if not ok:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
        row += 1
    return b.finish()


def get_parts(ga: GeomArray, return_index: bool = False):
    """Explode multi*/collections into parts — reference
    geometry.py:524-566 (``return_index=True`` adds the source row
    index, like the reference).  Simple geometries pass through as one
    part; missing/empty contribute nothing."""
    b = _Builder()
    src: list[int] = []
    row = 0
    n_children = get_num_geometries(ga)
    empt = ga.is_empty()
    for g in range(len(ga)):
        if ga.types[g] == MISSING or empt[g]:
            continue
        for c in range(int(n_children[g])):
            if _extract_child(ga, b, row, g, c):
                src.append(g)
                row += 1
    parts = b.finish()
    if return_index:
        return parts, np.asarray(src, dtype=np.int64)
    return parts


def get_rings(ga: GeomArray, return_index: bool = False):
    """Explode POLYGON rows into their rings (shell first, then holes)
    as LINEARRINGs — reference geometry.py:569-621
    (``return_index=True`` adds the source row index)."""
    b = _Builder()
    src: list[int] = []
    row = 0
    for p in range(ga.n_parts):
        g = int(ga.part_geom[p])
        if ga.part_kind[p] not in (PK_SHELL, PK_HOLE):
            continue
        _ring_to_linearring(b, row, ga.part_coords(p))
        src.append(g)
        row += 1
    rings = b.finish()
    if return_index:
        return rings, np.asarray(src, dtype=np.int64)
    return rings


_SRID_ATTR = "_srids"


def get_srid(ga: GeomArray) -> np.ndarray:
    """Spatial reference id per geometry (reference geometry.py:177-205);
    0 default, -1 missing.  The engine stores srid as a sidecar array
    (set_srid returns a new GeomArray carrying it)."""
    srids = getattr(ga, _SRID_ATTR, None)
    out = (
        np.zeros(len(ga), dtype=np.int64)
        if srids is None
        else np.asarray(srids, dtype=np.int64).copy()
    )
    out[ga.types == MISSING] = -1
    return out


def set_srid(ga: GeomArray, srid) -> GeomArray:
    """Return a copy with srid set (reference geometry.py:206-231)."""
    from dataclasses import replace

    out = replace(ga)
    setattr(out, _SRID_ATTR, np.broadcast_to(
        np.asarray(srid, dtype=np.int64), len(ga)
    ).copy())
    return out


def set_precision(ga: GeomArray, grid_size: float,
                  mode: str = "valid_output") -> GeomArray:
    """Round all coordinates to a precision grid (reference
    geometry.py:699-791), with GEOS mode semantics:

    - ``'valid_output'`` (default): duplicate vertices removed,
      collapsed elements (degenerate lines AND polygons) removed,
      self-intersections introduced by snapping repaired (make_valid
      linework semantics);
    - ``'pointwise'``: coordinates snapped independently, nothing else
      (GEOS NO_TOPO) — output may be invalid;
    - ``'keep_collapsed'``: like valid_output, but lines that collapse
      keep a degenerate 2-point representation (polygonal collapses
      are still removed).
    """
    if mode not in ("valid_output", "pointwise", "keep_collapsed"):
        raise ValueError(f"set_precision: invalid mode {mode!r}")
    if grid_size < 0:
        raise ValueError("grid_size must be >= 0")
    from dataclasses import replace

    if grid_size == 0:
        return ga
    snapped = np.round(ga.coords / grid_size) * grid_size
    pw = replace(ga, coords=snapped)
    if mode == "pointwise":
        return pw
    # valid_output / keep_collapsed: rebuild rows part-by-part
    from rayspatial.geom.array import (
        LINEARRING,
        LINESTRING,
        MULTILINESTRING,
        MULTIPOLYGON,
        PK_HOLE,
        PK_LINE,
        PK_POINT,
        PK_SHELL,
        POINT,
        POLYGON,
        _Builder,
    )
    from rayspatial.geom.constructive import _append_empty, _append_missing

    b = _Builder()
    for i in range(len(pw)):
        t = int(pw.types[i])
        if t == MISSING:
            _append_missing(b)
            continue
        parts = np.flatnonzero(pw.part_geom == i)
        kept_pts: list[np.ndarray] = []
        kept_lines: list[np.ndarray] = []
        kept_rings: list[tuple[int, int, np.ndarray]] = []  # (kind, sub, xy)
        for p in parts:
            kind = int(pw.part_kind[p])
            xy = pw.part_coords(p)
            # drop consecutive duplicate vertices
            if len(xy) > 1:
                keep = np.r_[True, (np.abs(np.diff(xy, axis=0)) > 0).any(axis=1)]
                xy = xy[keep]
            if kind == PK_POINT:
                kept_pts.append(xy)
            elif kind == PK_LINE:
                if len(xy) >= 2:
                    kept_lines.append(xy)
                elif mode == "keep_collapsed" and len(xy) == 1:
                    kept_lines.append(np.vstack([xy, xy]))  # degenerate
            else:  # ring: needs >= 3 distinct vertices after dedupe
                ring = xy if len(xy) < 2 or (xy[0] != xy[-1]).any() else xy[:-1]
                if len(ring) >= 3:
                    kept_rings.append(
                        (kind, int(pw.part_sub[p]), np.vstack([ring, ring[:1]]))
                    )
        row = len(b.types)
        if t in (POLYGON, MULTIPOLYGON):
            if not kept_rings:
                _append_empty(b, POLYGON)
                continue
            b.types.append(t)
            sub_map: dict[int, int] = {}
            nch = 0
            for kind, sub, xy in kept_rings:
                if sub not in sub_map:
                    sub_map[sub] = b.poly_counter
                    b.poly_counter += 1
                b.add_part(row, kind, sub_map[sub], xy)
                if kind == PK_SHELL:
                    nch += 1
            b.has_z.append(False)
            b.num_children.append(max(nch, 1))
        elif t in (LINESTRING, LINEARRING, MULTILINESTRING):
            if not kept_lines:
                _append_empty(b, LINESTRING)
                continue
            # a snapped ring may open up; emit as line(s)
            typ = t if t == MULTILINESTRING or len(kept_lines) == 1 else MULTILINESTRING
            if typ == LINEARRING and (
                len(kept_lines[0]) < 4
                or (kept_lines[0][0] != kept_lines[0][-1]).any()
            ):
                typ = LINESTRING
            b.types.append(typ)
            for xy in kept_lines:
                b.add_part(row, PK_LINE, b.sub_counter, xy)
                b.sub_counter += 1
            b.has_z.append(False)
            b.num_children.append(len(kept_lines))
        elif t in (POINT, 4):
            if not kept_pts:
                _append_empty(b, POINT)
                continue
            b.types.append(t)
            for xy in kept_pts:
                b.add_part(row, PK_POINT, b.sub_counter, xy)
                b.sub_counter += 1
            b.has_z.append(False)
            b.num_children.append(len(kept_pts))
        else:  # collection: keep surviving parts as-is
            total = len(kept_pts) + len(kept_lines) + len(kept_rings)
            if total == 0:
                _append_empty(b, t)
                continue
            b.types.append(t)
            sub_map = {}
            for xy in kept_pts:
                b.add_part(row, PK_POINT, b.sub_counter, xy)
                b.sub_counter += 1
            for xy in kept_lines:
                b.add_part(row, PK_LINE, b.sub_counter, xy)
                b.sub_counter += 1
            for kind, sub, xy in kept_rings:
                if sub not in sub_map:
                    sub_map[sub] = b.poly_counter
                    b.poly_counter += 1
                b.add_part(row, kind, sub_map[sub], xy)
            b.has_z.append(False)
            b.num_children.append(total)
    out = b.finish()
    # snapping can self-intersect polygons: repair (linework semantics)
    from rayspatial.geom.constructive import make_valid

    return make_valid(out)


def get_precision(ga: GeomArray) -> np.ndarray:
    """Engine geometries carry no per-geometry precision grid -> 0.0
    (reference geometry.py:658-698 default)."""
    out = np.zeros(len(ga), dtype=np.float64)
    out[ga.types == MISSING] = np.nan
    return out


def empty(n: int, geom_type: int | None = None) -> GeomArray:
    """Array of missing (or typed-empty) geometries (reference
    creation.py:524-553)."""
    b = _Builder()
    for _ in range(n):
        if geom_type is None:
            b.types.append(MISSING)
        else:
            b.types.append(int(geom_type))
        b.has_z.append(False)
        b.num_children.append(0)
    return b.finish()


def force_2d(ga: GeomArray) -> GeomArray:
    """Drop Z (geometry.py:792-818)."""
    from dataclasses import replace

    return replace(ga, z=None, has_z=np.zeros(len(ga), dtype=bool))


def force_3d(ga: GeomArray, z=0.0) -> GeomArray:
    """Add Z (constant or per-geometry) where absent
    (geometry.py:819-856)."""
    from dataclasses import replace

    zin = np.broadcast_to(np.asarray(z, dtype=np.float64), len(ga))
    nc = ga.coords.shape[0]
    zout = np.full(nc, np.nan) if ga.z is None else ga.z.copy()
    sizes = np.diff(ga.part_off)
    cgeom = np.repeat(ga.part_geom, sizes)
    fill = np.isnan(zout)
    zout[fill] = zin[cgeom[fill]]
    return replace(ga, z=zout, has_z=np.ones(len(ga), dtype=bool))
