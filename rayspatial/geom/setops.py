"""Set operations (reference pygeos/set_operations.py).

Full type matrix: fast paths handle the pairs the web-scale pipeline
hits constantly (point-vs-anything, box-vs-box, convex clip,
containment and disjoint cases), the general polygon overlay
(geom/overlay.py) handles polygon-vs-polygon, and every remaining pair
— lineal operands, multipoints, mixed collections — routes to the
dimension-decomposed engine in geom/lineal_ops.py.

Reductions (``union_all`` / ``intersection_all``) are REORDERABLE in
the reference's ufunc registry (src/ufuncs.c:3328-3334), which is the
formal license for the engine's partial-per-block + final combine
implementation in ops/ (associative + commutative).
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    GEOMETRYCOLLECTION,
    LINEARRING,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    PK_HOLE,
    PK_POINT,
    PK_SHELL,
    POINT,
    POLYGON,
    GeomArray,
    _Builder,
)
from rayspatial.geom.constructive import _append_empty, _append_missing, box

__all__ = [
    "intersection",
    "intersection_all",
    "union",
    "difference",
    "symmetric_difference",
    "symmetric_difference_all",
    "union_all",
    "coverage_union",
    "coverage_union_all",
    "grid_to_boxes",
]


def _is_box(ga: GeomArray, i: int) -> bool:
    """Axis-aligned rectangle polygon (5-pt closed ring, no holes)."""
    parts = np.flatnonzero(ga.part_geom == i)
    if ga.types[i] != POLYGON or len(parts) != 1:
        return False
    if ga.part_kind[parts[0]] != PK_SHELL:
        return False
    xy = ga.part_coords(parts[0])
    if len(xy) != 5 or not np.array_equal(xy[0], xy[-1]):
        return False
    xs, ys = np.unique(xy[:, 0]), np.unique(xy[:, 1])
    return len(xs) == 2 and len(ys) == 2


def _pairwise(ga: GeomArray, gb: GeomArray, fn) -> GeomArray:
    n = max(len(ga), len(gb))
    b = _Builder()
    for g in range(n):
        i, j = min(g, len(ga) - 1), min(g, len(gb) - 1)
        fn(b, g, i, j)
    return b.finish()


def intersection(ga: GeomArray, gb: GeomArray, grid_size: float | None = None) -> GeomArray:
    """Pairwise intersection (set_operations.py:79-132), all type
    pairs: point/box/convex fast paths, polygon overlay, lineal/mixed
    via geom/lineal_ops."""
    if grid_size:
        from rayspatial.geom.accessors import set_precision

        return set_precision(
            intersection(set_precision(ga, grid_size), set_precision(gb, grid_size)),
            grid_size,
        )
    from rayspatial.geom import predicates as P

    bnds_a, bnds_b = ga.bounds(), gb.bounds()

    def one(b: _Builder, g: int, i: int, j: int):
        if ga.types[i] == -1 or gb.types[j] == -1:
            _append_missing(b)
            return
        for (src, si, other, oj) in ((ga, i, gb, j), (gb, j, ga, i)):
            if src.types[si] == POINT:
                if P._pair_intersects(src, si, other, oj):
                    parts = np.flatnonzero(src.part_geom == si)
                    b.types.append(POINT)
                    b.add_part(g, PK_POINT, b.sub_counter, src.part_coords(parts[0]).copy())
                    b.sub_counter += 1
                    b.has_z.append(False)
                    b.num_children.append(1)
                else:
                    _append_empty(b, POINT)
                return
        if _is_box(ga, i) and _is_box(gb, j):
            x0 = max(bnds_a[i, 0], bnds_b[j, 0])
            y0 = max(bnds_a[i, 1], bnds_b[j, 1])
            x1 = min(bnds_a[i, 2], bnds_b[j, 2])
            y1 = min(bnds_a[i, 3], bnds_b[j, 3])
            if x0 > x1 or y0 > y1:
                _append_empty(b, POLYGON)
                return
            # degenerate overlaps are LOWER-DIMENSIONAL results, not
            # zero-width polygons (GEOS: edge-touching boxes intersect
            # in a LINESTRING, corner-touching in a POINT)
            if x0 == x1 and y0 == y1:
                b.types.append(POINT)
                b.add_part(g, PK_POINT, b.sub_counter,
                           np.array([[x0, y0]], dtype=np.float64))
                b.sub_counter += 1
                b.has_z.append(False)
                b.num_children.append(1)
                return
            if x0 == x1 or y0 == y1:
                from rayspatial.geom.array import PK_LINE as _PKL

                b.types.append(LINESTRING)
                b.add_part(g, _PKL, b.sub_counter,
                           np.array([[x0, y0], [x1, y1]], dtype=np.float64))
                b.sub_counter += 1
                b.has_z.append(False)
                b.num_children.append(1)
                return
            sub = box(x0, y0, x1, y1)
            _copy_geom(sub, 0, b, g)
            return
        # CONVEX x CONVEX: Sutherland-Hodgman exact clip.  Restricted to
        # convex pairs: a concave subject can intersect in DISCONNECTED
        # regions, which SH renders as one degenerate self-touching ring
        # (zero-width connector) instead of a MULTIPOLYGON — those pairs
        # route to the general overlay below.  For a convex pair the
        # intersection is convex/connected, so SH is exact AND no
        # mixed-dimension contact off the areal part can exist.
        ra = _poly_single_ring(ga, i)
        rb = _poly_single_ring(gb, j)
        if ra is not None and rb is not None:
            if _is_convex_ring(ra) and _is_convex_ring(rb):
                res = convex_clip(ra, rb)
            else:
                res = None
            if res is not None:
                if len(res) < 3:
                    # degenerate area: boundary contact still counts
                    # (GEOS: shared edge -> LINESTRING, corner -> POINT)
                    from rayspatial.geom.lineal_ops import (
                        _emit,
                        poly_boundary_contact,
                    )

                    chains, pts = poly_boundary_contact(ga, i, gb, j)
                    if chains or len(pts):
                        _emit(b, g, [], chains, pts, POLYGON)
                    else:
                        _append_empty(b, POLYGON)
                    return
                b.types.append(POLYGON)
                b.add_part(g, PK_SHELL, b.poly_counter, np.vstack([res, res[:1]]))
                b.poly_counter += 1
                b.has_z.append(False)
                b.num_children.append(1)
                return
        # LINESTRING x convex polygon: exact parametric (Cyrus-Beck)
        # clip — no arrangement snapping, so integer/rational inputs
        # stay bit-exact (the line_clip pipeline's oracle relies on it)
        for (src, si_, other, oj, flip) in ((ga, i, gb, j, False),
                                            (gb, j, ga, i, True)):
            if src.types[si_] not in _LINEAL_TYPES:
                continue
            rb = _poly_single_ring(other, oj)
            if rb is None or not _is_convex_ring(rb):
                break
            paths = [
                src.part_coords(p)
                for p in np.flatnonzero(src.part_geom == si_)
                if src.part_kind[p] == 1  # PK_LINE
            ]
            chains, pts = _clip_lines_convex(paths, rb)
            from rayspatial.geom.lineal_ops import _emit

            from rayspatial.geom.array import LINESTRING as _LS

            _emit(b, g, [], chains, pts, _LS)
            return
        # general polygon overlay (noded-face classification)
        if ga.types[i] in (POLYGON, MULTIPOLYGON) and gb.types[j] in (POLYGON, MULTIPOLYGON):
            from rayspatial.geom.lineal_ops import (
                _decompose,
                _emit,
                contact_off_closure,
                poly_boundary_contact,
            )
            from rayspatial.geom.overlay import polygon_overlay

            sub = polygon_overlay(
                _slice_rows(ga, [i]), _slice_rows(gb, [j]), "intersection"
            )
            if bool(sub.is_empty()[0]):
                # no area overlap: boundary contact is still a GEOS
                # intersection result (shared edges -> lines, corner
                # touches -> points)
                chains, pts = poly_boundary_contact(ga, i, gb, j)
                if chains or len(pts):
                    _emit(b, g, [], chains, pts, POLYGON)
                    return
            else:
                # area AND extra boundary contact off the areal part
                # coexist -> GEOMETRYCOLLECTION(polygon..., line/point)
                # (reference set_operations.py:79-131 / GEOS semantics)
                chains, pts = poly_boundary_contact(ga, i, gb, j)
                if chains or len(pts):
                    xch, xpts = contact_off_closure(sub, chains, pts)
                    if xch or len(xpts):
                        _, _, polys, _ = _decompose(sub, 0)
                        _emit(b, g, polys, xch, xpts, POLYGON)
                        return
            _copy_geom(sub, 0, b, g)
            return
        from rayspatial.geom.lineal_ops import general_pair_setop

        sub = general_pair_setop(ga, i, gb, j, "intersection")
        _copy_geom(sub, 0, b, g)

    return _pairwise(ga, gb, one)


def _copy_geom(src: GeomArray, i: int, b: _Builder, out_row: int) -> None:
    b.types.append(int(src.types[i]))
    poly_map: dict[int, int] = {}
    nch = 0
    for p in np.flatnonzero(src.part_geom == i):
        kind = int(src.part_kind[p])
        sub = int(src.part_sub[p])
        if kind in (PK_SHELL, PK_HOLE):
            if sub not in poly_map:
                poly_map[sub] = b.poly_counter
                b.poly_counter += 1
            b.add_part(out_row, kind, poly_map[sub], src.part_coords(p).copy())
            if kind == PK_SHELL:
                nch += 1
        else:
            b.add_part(out_row, kind, b.sub_counter, src.part_coords(p).copy())
            b.sub_counter += 1
            nch += 1
    b.has_z.append(False)
    b.num_children.append(max(nch, 1) if int(src.types[i]) != -1 else 0)


def union(ga: GeomArray, gb: GeomArray, grid_size: float | None = None) -> GeomArray:
    """Pairwise union (set_operations.py:258-313), all type pairs."""
    if grid_size:
        from rayspatial.geom.accessors import set_precision

        return set_precision(
            union(set_precision(ga, grid_size), set_precision(gb, grid_size)),
            grid_size,
        )
    from rayspatial.geom import predicates as P

    def one(b: _Builder, g: int, i: int, j: int):
        if ga.types[i] == -1 or gb.types[j] == -1:
            _append_missing(b)
            return
        from rayspatial.geom.strtree import _pair_predicate

        if _pair_predicate(ga, i, gb, j, "covers"):
            _copy_geom(ga, i, b, g)
            return
        if _pair_predicate(gb, j, ga, i, "covers"):
            _copy_geom(gb, j, b, g)
            return
        if not P._pair_intersects(ga, i, gb, j):
            _collect_two(ga, i, gb, j, b, g)
            return
        if ga.types[i] in (POLYGON, MULTIPOLYGON) and gb.types[j] in (POLYGON, MULTIPOLYGON):
            from rayspatial.geom.overlay import polygon_overlay

            sub = polygon_overlay(_slice_rows(ga, [i]), _slice_rows(gb, [j]), "union")
            _copy_geom(sub, 0, b, g)
            return
        from rayspatial.geom.lineal_ops import general_pair_setop

        sub = general_pair_setop(ga, i, gb, j, "union")
        _copy_geom(sub, 0, b, g)

    return _pairwise(ga, gb, one)


def _collect_two(ga: GeomArray, i: int, gb: GeomArray, j: int, b: _Builder,
                 out_row: int) -> None:
    ta, tb = int(ga.types[i]), int(gb.types[j])
    promote = {POINT: MULTIPOINT, POLYGON: MULTIPOLYGON}
    typ = promote.get(ta, GEOMETRYCOLLECTION) if ta == tb else GEOMETRYCOLLECTION
    b.types.append(typ)
    nch = 0
    for src, si in ((ga, i), (gb, j)):
        poly_map: dict[int, int] = {}
        for p in np.flatnonzero(src.part_geom == si):
            kind = int(src.part_kind[p])
            sub = int(src.part_sub[p])
            if kind in (PK_SHELL, PK_HOLE):
                if sub not in poly_map:
                    poly_map[sub] = b.poly_counter
                    b.poly_counter += 1
                b.add_part(out_row, kind, poly_map[sub], src.part_coords(p).copy())
                if kind == PK_SHELL:
                    nch += 1
            else:
                b.add_part(out_row, kind, b.sub_counter, src.part_coords(p).copy())
                b.sub_counter += 1
                nch += 1
    b.has_z.append(False)
    b.num_children.append(nch)


def difference(ga: GeomArray, gb: GeomArray, grid_size: float | None = None) -> GeomArray:
    """Pairwise difference (set_operations.py:22-78), all type pairs."""
    if grid_size:
        from rayspatial.geom.accessors import set_precision

        return set_precision(
            difference(set_precision(ga, grid_size), set_precision(gb, grid_size)),
            grid_size,
        )
    from rayspatial.geom import predicates as P

    def one(b: _Builder, g: int, i: int, j: int):
        if ga.types[i] == -1 or gb.types[j] == -1:
            _append_missing(b)
            return
        if not P._pair_intersects(ga, i, gb, j):
            _copy_geom(ga, i, b, g)
            return
        from rayspatial.geom.strtree import _pair_predicate

        if _pair_predicate(gb, j, ga, i, "covers"):
            _append_empty(b, int(ga.types[i]))
            return
        if ga.types[i] in (POLYGON, MULTIPOLYGON) and gb.types[j] in (POLYGON, MULTIPOLYGON):
            from rayspatial.geom.overlay import polygon_overlay

            sub = polygon_overlay(_slice_rows(ga, [i]), _slice_rows(gb, [j]), "difference")
            _copy_geom(sub, 0, b, g)
            return
        from rayspatial.geom.lineal_ops import general_pair_setop

        sub = general_pair_setop(ga, i, gb, j, "difference")
        _copy_geom(sub, 0, b, g)

    return _pairwise(ga, gb, one)


def symmetric_difference(ga: GeomArray, gb: GeomArray, grid_size: float | None = None) -> GeomArray:
    """Pairwise symmetric difference (set_operations.py:168-222), all
    type pairs."""
    if grid_size:
        from rayspatial.geom.accessors import set_precision

        return set_precision(
            symmetric_difference(set_precision(ga, grid_size), set_precision(gb, grid_size)),
            grid_size,
        )
    from rayspatial.geom import predicates as P

    def one(b: _Builder, g: int, i: int, j: int):
        if ga.types[i] == -1 or gb.types[j] == -1:
            _append_missing(b)
            return
        if not P._pair_intersects(ga, i, gb, j):
            _collect_two(ga, i, gb, j, b, g)
            return
        if ga.types[i] in (POLYGON, MULTIPOLYGON) and gb.types[j] in (POLYGON, MULTIPOLYGON):
            from rayspatial.geom.overlay import polygon_overlay

            sub = polygon_overlay(
                _slice_rows(ga, [i]), _slice_rows(gb, [j]), "symmetric_difference"
            )
            _copy_geom(sub, 0, b, g)
            return
        from rayspatial.geom.lineal_ops import general_pair_setop

        sub = general_pair_setop(ga, i, gb, j, "symmetric_difference")
        _copy_geom(sub, 0, b, g)

    return _pairwise(ga, gb, one)


def union_all(ga: GeomArray, grid_size: float | None = None) -> GeomArray:
    """Reduce to one geometry (set_operations.py:314-396): all-missing
    -> missing (reference lines 389-396); all points -> MULTIPOINT of
    DISTINCT points; pairwise-disjoint polygons -> MULTIPOLYGON;
    overlapping polygons -> n-ary overlay; lineal / mixed inputs ->
    geom/lineal_ops.union_all_general.  Reorderable, so ops-level
    partial+final combines are exact."""
    if grid_size:
        from rayspatial.geom.accessors import set_precision

        return set_precision(union_all(set_precision(ga, grid_size)), grid_size)
    from rayspatial.geom import predicates as P

    live = np.flatnonzero(~(ga.is_missing() | ga.is_empty()))
    b = _Builder()
    if not len(live):
        if (ga.types == -1).all():
            _append_missing(b)
        else:
            _append_empty(b, GEOMETRYCOLLECTION)
        return b.finish()
    if (ga.types[live] == POINT).all():
        pts = np.vstack([ga.part_coords(p) for p in range(ga.n_parts)
                         if ga.part_geom[p] in set(live.tolist())])
        uniq = np.unique(pts, axis=0)
        b.types.append(MULTIPOINT)
        for k in range(len(uniq)):
            b.add_part(0, PK_POINT, b.sub_counter, uniq[k : k + 1])
            b.sub_counter += 1
        b.has_z.append(False)
        b.num_children.append(len(uniq))
        return b.finish()
    if ((ga.types[live] == POLYGON) | (ga.types[live] == MULTIPOLYGON)).all():
        boxes = _collect_boxes(ga, live)
        if boxes is not None and len(boxes) > 1:
            return _rectilinear_union(boxes)
        bb = ga.bounds()
        overlapping = False
        for x, i in enumerate(live):
            for j in live[x + 1 :]:
                if (
                    bb[i, 0] <= bb[j, 2] and bb[j, 0] <= bb[i, 2]
                    and bb[i, 1] <= bb[j, 3] and bb[j, 1] <= bb[i, 3]
                    and P._pair_intersects(ga, int(i), ga, int(j))
                ):
                    overlapping = True
                    break
            if overlapping:
                break
        if not overlapping:
            return coverage_union_all(ga)
        from rayspatial.geom.overlay import nary_union

        return nary_union(ga)
    from rayspatial.geom.lineal_ops import union_all_general

    return union_all_general(ga)


def coverage_union(ga: GeomArray, gb: GeomArray) -> GeomArray:
    """Pairwise coverage union (reference set_operations.py:397-433):
    merge two non-overlapping polygonal inputs per row without noding.
    Same engine semantics as :func:`coverage_union_all` (shared
    boundaries are NOT dissolved)."""

    def one(b: _Builder, g: int, i: int, j: int):
        if ga.types[i] == -1 or gb.types[j] == -1:
            _append_missing(b)
            return
        sub = coverage_union_all(
            _concat_rows(_slice_rows(ga, [i]), _slice_rows(gb, [j]))
        )
        _copy_geom(sub, 0, b, g)

    return _pairwise(ga, gb, one)


def _concat_rows(ga: GeomArray, gb: GeomArray) -> GeomArray:
    b = _Builder()
    row = 0
    for src in (ga, gb):
        for i in range(len(src)):
            if src.types[i] == -1:
                _append_missing(b)
            else:
                _copy_geom(src, i, b, row)
            row += 1
    return b.finish()


def coverage_union_all(ga: GeomArray) -> GeomArray:
    """Merge a non-overlapping polygonal coverage into one MULTIPOLYGON
    (set_operations.py:401-466).  Parts are concatenated; shared
    boundaries are NOT dissolved (engine semantics, documented) — use
    ``grid_to_boxes`` for the dissolved rectilinear case."""
    b = _Builder()
    b.types.append(MULTIPOLYGON)
    nch = 0
    for i in range(len(ga)):
        if ga.types[i] not in (POLYGON, MULTIPOLYGON):
            if ga.types[i] == -1 or ga.is_empty()[i]:
                continue
            raise NotImplementedError("coverage_union_all: polygonal inputs only")
        poly_map: dict[int, int] = {}
        for p in np.flatnonzero(ga.part_geom == i):
            kind = int(ga.part_kind[p])
            sub = int(ga.part_sub[p])
            if sub not in poly_map:
                poly_map[sub] = b.poly_counter
                b.poly_counter += 1
            b.add_part(0, kind, poly_map[sub], ga.part_coords(p).copy())
            if kind == PK_SHELL:
                nch += 1
    b.has_z.append(False)
    b.num_children.append(nch)
    return b.finish()


def grid_to_boxes(mask: np.ndarray, x0: float, y0: float, dx: float, dy: float):
    """Vectorize a boolean raster grid into maximal axis-aligned boxes
    (row-run + vertical merge) — the raster->vector half of the tile
    materialization (north_star).  Returns (n, 4) [xmin,ymin,xmax,ymax].

    Deterministic: runs are scanned bottom-up, left-right; vertically
    adjacent identical runs merge.  The returned boxes partition the
    masked region exactly (no overlaps, no gaps)."""
    ny, nx = mask.shape
    open_runs: dict[tuple[int, int], int] = {}  # (cx0, cx1) -> row started
    out = []
    for iy in range(ny + 1):
        row_runs = []
        if iy < ny:
            row = mask[iy]
            in_run = False
            start = 0
            for ix in range(nx + 1):
                v = row[ix] if ix < nx else False
                if v and not in_run:
                    start, in_run = ix, True
                elif not v and in_run:
                    row_runs.append((start, ix))
                    in_run = False
        next_open = {}
        for r in row_runs:
            if r in open_runs:
                next_open[r] = open_runs.pop(r)
            else:
                next_open[r] = iy
        for (cx0, cx1), row0 in open_runs.items():
            out.append(
                (x0 + cx0 * dx, y0 + row0 * dy, x0 + cx1 * dx, y0 + iy * dy)
            )
        open_runs = next_open
    return np.asarray(out, dtype=np.float64).reshape(-1, 4)


def _reduce_pairwise(ga: GeomArray, fn) -> GeomArray:
    """Left fold of a pairwise op over the rows (the reference's
    ufunc.reduce with reorderable identity, src/ufuncs.c:3328-3334)."""
    live = np.flatnonzero(~ga.is_missing())
    if not len(live):
        b = _Builder()
        _append_missing(b)
        return b.finish()
    acc = _slice_rows(ga, [int(live[0])])
    for i in live[1:]:
        acc = fn(acc, _slice_rows(ga, [int(i)]))
    return acc


def _slice_rows(ga: GeomArray, rows: list[int]) -> GeomArray:
    b = _Builder()
    for out_row, r in enumerate(rows):
        if ga.types[r] == -1:
            _append_missing(b)
            continue
        _copy_geom(ga, r, b, out_row)
    return b.finish()


def intersection_all(ga: GeomArray) -> GeomArray:
    """Reduce by intersection (set_operations.py:133-167); supported
    element combinations follow :func:`intersection`."""
    return _reduce_pairwise(ga, intersection)


def symmetric_difference_all(ga: GeomArray) -> GeomArray:
    """Reduce by symmetric difference (set_operations.py:223-257);
    supported combinations follow :func:`symmetric_difference`."""
    return _reduce_pairwise(ga, symmetric_difference)


# ---------------------------------------------------------------------------
# convex clipping (Sutherland–Hodgman) — extends intersection beyond
# boxes: any polygon clipped by a CONVEX polygon is exact


def _clip_halfplane(pts: np.ndarray, point_on_line: np.ndarray,
                    normal: np.ndarray) -> np.ndarray:
    """Clip an open polygon ring (n, 2) to the half-plane
    {p : (p - point_on_line) . normal >= 0}."""
    if not len(pts):
        return pts
    d = (pts - point_on_line) @ normal
    out = []
    n = len(pts)
    for k in range(n):
        k2 = (k + 1) % n
        a, bq = pts[k], pts[k2]
        da, db = d[k], d[k2]
        if da >= 0:
            out.append(a)
        if (da > 0 and db < 0) or (da < 0 and db > 0):
            t = da / (da - db)
            out.append(a + t * (bq - a))
    if not out:
        return np.empty((0, 2))
    arr = np.asarray(out)
    # drop consecutive duplicates
    keep = np.r_[True, (np.abs(np.diff(arr, axis=0)) > 0).any(axis=1)]
    arr = arr[keep]
    if len(arr) > 1 and (arr[0] == arr[-1]).all():
        arr = arr[:-1]
    return arr


def _ring_open_ccw(xy: np.ndarray) -> np.ndarray:
    """Closed ring -> open CCW vertex list."""
    r = xy[:-1] if len(xy) > 1 and (xy[0] == xy[-1]).all() else xy
    x, y = r[:, 0], r[:, 1]
    area2 = np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
    return r if area2 >= 0 else r[::-1]


def _is_convex_ring(r: np.ndarray) -> bool:
    """Open CCW ring convexity (all cross products >= 0)."""
    n = len(r)
    if n < 3:
        return False
    a = r
    bq = np.roll(r, -1, axis=0)
    c = np.roll(r, -2, axis=0)
    cross = (bq[:, 0] - a[:, 0]) * (c[:, 1] - bq[:, 1]) - (
        bq[:, 1] - a[:, 1]
    ) * (c[:, 0] - bq[:, 0])
    return bool((cross >= -1e-12).all())


def _poly_single_ring(ga: GeomArray, i: int) -> np.ndarray | None:
    """The open CCW shell of a single-ring (no holes) polygon, else None."""
    parts = np.flatnonzero(ga.part_geom == i)
    if ga.types[i] != POLYGON or len(parts) != 1:
        return None
    if ga.part_kind[parts[0]] != PK_SHELL:
        return None
    return _ring_open_ccw(ga.part_coords(parts[0]))


def convex_clip(subject: np.ndarray, clip_ccw: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip open subject ring by open CCW CONVEX
    ring.  Returns the open result ring (possibly empty)."""
    out = subject
    n = len(clip_ccw)
    for k in range(n):
        a = clip_ccw[k]
        bq = clip_ccw[(k + 1) % n]
        edge = bq - a
        normal = np.array([-edge[1], edge[0]])  # inward for CCW
        out = _clip_halfplane(out, a, normal)
        if not len(out):
            break
    return out


_LINEAL_TYPES = (LINESTRING, LINEARRING, MULTILINESTRING)


def _clip_lines_convex(paths: list[np.ndarray], ring_ccw: np.ndarray):
    """Exact Cyrus-Beck clip of open polyline paths against an open CCW
    CONVEX ring -> (line pieces, tangent touch points).  Pure
    parametric arithmetic — rational inputs give bit-exact rational
    outputs (no arrangement snapping), which the line_clip pipeline's
    integer-length oracle depends on."""
    a = ring_ccw
    nxt = np.roll(ring_ccw, -1, axis=0)
    edge = nxt - a
    nrm = np.stack([-edge[:, 1], edge[:, 0]], axis=1)  # inward for CCW
    chains: list[np.ndarray] = []
    touch: list[np.ndarray] = []
    for path in paths:
        P, Q = path[:-1].astype(float), path[1:].astype(float)
        if not len(P):
            continue
        d = Q - P
        t0 = np.zeros(len(P))
        t1 = np.ones(len(P))
        ok = np.ones(len(P), dtype=bool)
        for k in range(len(a)):
            si = (P - a[k]) @ nrm[k]
            di = d @ nrm[k]
            with np.errstate(divide="ignore", invalid="ignore"):
                tc = -si / np.where(di == 0, 1.0, di)
            ok &= ~((di == 0) & (si < 0))
            t0 = np.where(di > 0, np.maximum(t0, tc), t0)
            t1 = np.where(di < 0, np.minimum(t1, tc), t1)
        cur: np.ndarray | None = None
        for s in range(len(P)):
            if not ok[s] or t0[s] > t1[s]:
                if cur is not None:
                    chains.append(cur)
                    cur = None
                continue
            p0 = P[s] + t0[s] * d[s]
            p1 = P[s] + t1[s] * d[s]
            if t0[s] == t1[s]:
                touch.append(p0)
                if cur is not None:
                    chains.append(cur)
                    cur = None
                continue
            if cur is not None and t0[s] == 0 and np.array_equal(cur[-1], p0):
                cur = np.vstack([cur, p1[None, :]])
            else:
                if cur is not None:
                    chains.append(cur)
                cur = np.vstack([p0[None, :], p1[None, :]])
            if t1[s] < 1:
                chains.append(cur)
                cur = None
        if cur is not None:
            chains.append(cur)
    from rayspatial.geom.lineal_ops import (
        _dedupe_points,
        _lines_to_segs,
        _on_segs,
        _segs_np,
    )

    A, B = _segs_np(_lines_to_segs(chains))
    pts_arr = _dedupe_points(
        [q for q in touch if not _on_segs(np.asarray(q, float), A, B)]
    )
    return chains, pts_arr


def _collect_boxes(ga: GeomArray, live: np.ndarray) -> np.ndarray | None:
    """(n, 4) [xmin, ymin, xmax, ymax] when EVERY polygon part of the
    live rows is an axis-aligned rectangle (5-pt shell, no holes), else
    None.  Unlocks the rectilinear n-ary union fast path."""
    out = []
    live_set = set(int(i) for i in live)
    sub_seen: dict[int, int] = {}
    for p in range(ga.n_parts):
        g = int(ga.part_geom[p])
        if g not in live_set:
            continue
        if ga.part_kind[p] == PK_HOLE:
            return None
        if ga.part_kind[p] != PK_SHELL:
            return None
        xy = ga.part_coords(p)
        if len(xy) != 5 or not np.array_equal(xy[0], xy[-1]):
            return None
        xs, ys = np.unique(xy[:, 0]), np.unique(xy[:, 1])
        if len(xs) != 2 or len(ys) != 2:
            return None
        out.append((xs[0], ys[0], xs[1], ys[1]))
        sub_seen[g] = sub_seen.get(g, 0) + 1
    if not out:
        return None
    return np.asarray(out, dtype=np.float64)


def _rectilinear_union(boxes: np.ndarray) -> GeomArray:
    """Exact n-ary union of axis-aligned rectangles via coordinate
    compression (the same decomposition the SQL oracle uses): unique
    xs/ys -> coverage grid marked with a 2-D difference array -> maximal
    merged boxes (grid_to_boxes run-merge in index space).  O(n log n +
    cells) instead of the general O(segs^2) noded overlay — the 10x
    fast path for union_all over box layers.  Output is coverage-form
    MULTIPOLYGON (disjoint boxes tiling the union region; dissolve is
    representation-level, area/predicates exact — same convention as
    polygon_overlay)."""
    xs = np.unique(np.r_[boxes[:, 0], boxes[:, 2]])
    ys = np.unique(np.r_[boxes[:, 1], boxes[:, 3]])
    ix0 = np.searchsorted(xs, boxes[:, 0])
    ix1 = np.searchsorted(xs, boxes[:, 2])
    iy0 = np.searchsorted(ys, boxes[:, 1])
    iy1 = np.searchsorted(ys, boxes[:, 3])
    nx, ny = len(xs), len(ys)
    diff = np.zeros((ny, nx), dtype=np.int32)
    np.add.at(diff, (iy0, ix0), 1)
    np.add.at(diff, (iy0, ix1), -1)
    np.add.at(diff, (iy1, ix0), -1)
    np.add.at(diff, (iy1, ix1), 1)
    cover = diff.cumsum(axis=0).cumsum(axis=1)
    mask = cover[: ny - 1, : nx - 1] > 0
    # run-merge in INDEX space, then map back through the coordinate
    # arrays (grid_to_boxes assumes a uniform grid, so inline the same
    # bottom-up run-merge here over compressed cells)
    open_runs: dict[tuple[int, int], int] = {}
    rects = []
    for iy in range(mask.shape[0] + 1):
        row_runs = []
        if iy < mask.shape[0]:
            row = mask[iy]
            in_run = False
            start = 0
            for ix in range(mask.shape[1] + 1):
                v = row[ix] if ix < mask.shape[1] else False
                if v and not in_run:
                    start, in_run = ix, True
                elif not v and in_run:
                    row_runs.append((start, ix))
                    in_run = False
        next_open = {}
        for r in row_runs:
            if r in open_runs:
                next_open[r] = open_runs.pop(r)
            else:
                next_open[r] = iy
        for (cx0, cx1), row0 in open_runs.items():
            rects.append((xs[cx0], ys[row0], xs[cx1], ys[iy]))
        open_runs = next_open
    b = _Builder()
    b.types.append(POLYGON if len(rects) == 1 else MULTIPOLYGON)
    for (x0, y0, x1, y1) in rects:
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
            dtype=np.float64,
        )
        b.add_part(0, PK_SHELL, b.poly_counter, ring)
        b.poly_counter += 1
    b.has_z.append(False)
    b.num_children.append(len(rects))
    return b.finish()
