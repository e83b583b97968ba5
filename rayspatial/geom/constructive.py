"""Constructive kernels (reference pygeos/constructive.py).

Output conventions copied from reference docstring examples:

- ``box(0,0,1,1)`` -> ``POLYGON ((1 0, 1 1, 0 1, 0 0, 1 0))`` (ccw,
  creation.py:271-300);
- point ``buffer`` is a clockwise regular 4*quadsegs-gon starting at
  angle 0 (constructive.py:131-136: buffer(POINT(10 10), 2, quadsegs=1)
  -> POLYGON ((12 10, 10 8, 8 10, 10 12, 12 10))); negative radius ->
  POLYGON EMPTY;
- ``convex_hull(MULTIPOINT (0 0, 10 0, 10 10))`` ->
  ``POLYGON ((0 0, 10 10, 10 0, 0 0))`` (cw from lexicographic min);
- ``envelope`` -> ccw box / POINT for points / POINT EMPTY for empty;
- ``centroid(POLYGON EMPTY)`` -> POINT EMPTY;
- ``reverse`` reverses each part's coordinate order;
- missing -> missing for all constructive ops (Y_Y loops,
  src/ufuncs.c:414-458).

Line/polygon buffering (Minkowski) is implemented for the common cases
used by the reference docs/benchmarks: round point buffers, flat /
square / round caps on single-segment paths via the generic offset
builder; general curved joins on winding paths fall back to
quadseg-round joins.  Cited limitations are marked inline.
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
    "box", "buffer", "boundary", "centroid", "envelope", "convex_hull",
    "extract_unique_points", "reverse", "normalize", "point_on_surface",
    "simplify", "segmentize", "snap", "clip_by_rect", "force_2d",
    "oriented_envelope", "minimum_bounding_circle",
]


def _append_missing(b: _Builder) -> None:
    b.types.append(MISSING)
    b.has_z.append(False)
    b.num_children.append(0)


def _append_empty(b: _Builder, typ: int) -> None:
    b.types.append(typ)
    b.has_z.append(False)
    b.num_children.append(0)


def _append_point(b: _Builder, i_out: int, x: float, y: float) -> None:
    b.types.append(POINT)
    b.has_z.append(False)
    b.num_children.append(1)
    b.add_part(i_out, PK_POINT, b.sub_counter, np.asarray([[x, y]]))
    b.sub_counter += 1


def _append_ring_polygon(b: _Builder, i_out: int, ring: np.ndarray) -> None:
    b.types.append(POLYGON)
    b.has_z.append(False)
    b.num_children.append(1)
    b.add_part(i_out, PK_SHELL, b.poly_counter, ring)
    b.poly_counter += 1


# ---------------------------------------------------------------------------


def box(xmin, ymin, xmax, ymax, ccw: bool = True) -> GeomArray:
    """Rectangle polygons from 4 coordinate arrays (creation.py:271-300)."""
    xmin = np.atleast_1d(np.asarray(xmin, dtype=np.float64))
    ymin = np.atleast_1d(np.asarray(ymin, dtype=np.float64))
    xmax = np.atleast_1d(np.asarray(xmax, dtype=np.float64))
    ymax = np.atleast_1d(np.asarray(ymax, dtype=np.float64))
    n = max(len(xmin), len(ymin), len(xmax), len(ymax))
    xmin, ymin, xmax, ymax = (np.broadcast_to(a, n) for a in (xmin, ymin, xmax, ymax))
    b = _Builder()
    for i in range(n):
        if np.isnan([xmin[i], ymin[i], xmax[i], ymax[i]]).any():
            _append_missing(b)
            continue
        if ccw:
            ring = np.asarray(
                [
                    [xmax[i], ymin[i]],
                    [xmax[i], ymax[i]],
                    [xmin[i], ymax[i]],
                    [xmin[i], ymin[i]],
                    [xmax[i], ymin[i]],
                ]
            )
        else:
            ring = np.asarray(
                [
                    [xmin[i], ymin[i]],
                    [xmin[i], ymax[i]],
                    [xmax[i], ymax[i]],
                    [xmax[i], ymin[i]],
                    [xmin[i], ymin[i]],
                ]
            )
        _append_ring_polygon(b, i, ring)
    return b.finish()


def _circle_ring(cx: float, cy: float, r: float, quadsegs: int) -> np.ndarray:
    """Clockwise 4*quadsegs-gon on the circle, starting at angle 0 —
    matches GEOS point-buffer discretization (see module docstring)."""
    k = 4 * quadsegs
    ang = -np.arange(k + 1) * (2.0 * np.pi / k)
    ring = np.empty((k + 1, 2))
    ring[:, 0] = cx + r * np.cos(ang)
    ring[:, 1] = cy + r * np.sin(ang)
    ring[-1] = ring[0]
    return ring


def _left_normal(u: np.ndarray) -> np.ndarray:
    return np.array([-u[1], u[0]])


def _arc_wedge(v: np.ndarray, n1: np.ndarray, n2: np.ndarray,
               quadsegs: int) -> np.ndarray:
    """Closed pie-wedge ring from v+n1 to v+n2 sweeping the SHORT way
    (the outer gap of a join); used where a full disk would spill onto
    the un-buffered side (single-sided buffers)."""
    a1 = np.arctan2(n1[1], n1[0])
    a2 = np.arctan2(n2[1], n2[0])
    sweep = (a2 - a1 + np.pi) % (2 * np.pi) - np.pi  # short way
    r = np.hypot(n1[0], n1[1])
    steps = max(int(np.ceil(abs(sweep) / (np.pi / 2) * quadsegs)), 1)
    ang = a1 + sweep * np.arange(steps + 1) / steps
    pts = np.column_stack([v[0] + r * np.cos(ang), v[1] + r * np.sin(ang)])
    return np.vstack([v[None, :], pts, v[None, :]])


def _join_patch(v, u1, u2, r, join_style, mitre_limit, quadsegs,
                single_side: int = 0):
    """Ring filling the outer wedge of a turn at vertex ``v`` between
    unit directions ``u1`` (incoming) and ``u2`` (outgoing), or None.
    ``single_side``: 0 = both-side buffer (patch whichever side gaps),
    +1/-1 = only patch gaps on the left/right of travel."""
    cross = u1[0] * u2[1] - u1[1] * u2[0]
    if abs(cross) < 1e-12:
        return None
    outer = -1 if cross > 0 else 1  # gap side: right of a left turn
    if single_side and outer != single_side:
        return None
    sgn = 1.0 if outer > 0 else -1.0
    n1 = sgn * _left_normal(u1) * r
    n2 = sgn * _left_normal(u2) * r
    if join_style == "round":
        if single_side:
            return _arc_wedge(v, n1, n2, quadsegs)
        return _circle_ring(v[0], v[1], r, quadsegs)
    if join_style == "bevel":
        return np.vstack([v, v + n1, v + n2, v])
    if join_style == "mitre":
        m = n1 + n2
        mlen = np.hypot(m[0], m[1])
        if mlen < 1e-12:
            return _circle_ring(v[0], v[1], r, quadsegs)  # 180° turn
        mh = m / mlen
        proj = float(n1 @ mh)  # r * cos(half-angle)
        d = r * r / proj  # mitre-point distance from v
        L = mitre_limit * r
        if d <= L:
            return np.vstack([v, v + n1, v + d * mh, v + n2, v])
        # crop the spike at bisector-distance L (GEOS mitre_limit)
        tip = d * mh
        t1 = (L - proj) / (d - proj)
        q1 = (v + n1) + t1 * (v + tip - (v + n1))
        q2 = (v + n2) + t1 * (v + tip - (v + n2))
        return np.vstack([v, v + n1, q1, q2, v + n2, v])
    raise ValueError(f"buffer: invalid join_style {join_style!r}")


def _path_buffer_rings(xy: np.ndarray, r: float, closed: bool,
                       cap_style: str, join_style: str,
                       mitre_limit: float, quadsegs: int,
                       single_side: int = 0) -> list[np.ndarray]:
    """Closed rings whose union is the styled buffer of one path."""
    if cap_style not in ("round", "square", "flat"):
        raise ValueError(f"buffer: invalid cap_style {cap_style!r}")
    pts = xy
    if closed and len(pts) > 1 and not (pts[0] == pts[-1]).all():
        pts = np.vstack([pts, pts[:1]])
    # drop consecutive duplicates
    if len(pts) > 1:
        keep = np.r_[True, (np.abs(np.diff(pts, axis=0)) > 0).any(axis=1)]
        pts = pts[keep]
    rings: list[np.ndarray] = []
    if len(pts) == 1:
        if not single_side:
            rings.append(_circle_ring(pts[0, 0], pts[0, 1], r, quadsegs))
        return rings
    d = np.diff(pts, axis=0)
    ln = np.hypot(d[:, 0], d[:, 1])
    u = d / ln[:, None]
    # per-segment offset rectangles
    for k in range(len(pts) - 1):
        a, bb = pts[k], pts[k + 1]
        n = _left_normal(u[k]) * r
        if single_side > 0:
            rings.append(np.vstack([a, bb, bb + n, a + n, a]))
        elif single_side < 0:
            rings.append(np.vstack([a + n * 0, bb, bb - n, a - n, a]))
        else:
            rings.append(np.vstack([a + n, bb + n, bb - n, a - n, a + n]))
    # joins at interior vertices (all vertices when closed)
    nseg = len(pts) - 1
    vidx = range(0, nseg) if closed else range(1, nseg)
    for k in vidx:
        v = pts[k]
        u1 = u[k - 1] if k > 0 else u[nseg - 1]
        u2 = u[k]
        patch = _join_patch(v, u1, u2, r, join_style, mitre_limit,
                            quadsegs, single_side)
        if patch is not None:
            rings.append(patch)
    # caps at open endpoints (never for single-sided: GEOS uses flat)
    if not closed and not single_side:
        for v, uo in ((pts[0], -u[0]), (pts[-1], u[-1])):
            if cap_style == "round":
                rings.append(_circle_ring(v[0], v[1], r, quadsegs))
            elif cap_style == "square":
                n = _left_normal(uo) * r
                rings.append(
                    np.vstack([v + n, v + n + r * uo, v - n + r * uo,
                               v - n, v + n])
                )
    return rings


def buffer(ga: GeomArray, radius, quadsegs: int = 8,
           cap_style: str = "round", join_style: str = "round",
           mitre_limit: float = 5.0,
           single_sided: bool = False) -> GeomArray:
    """Styled buffer (reference constructive.py:82-184): Minkowski
    sum/difference approximated as a union of per-segment offset
    rectangles, per-vertex join patches (round disk / bevel triangle /
    mitre quad cropped at ``mitre_limit``) and endpoint caps
    (round / square / flat), dissolved by the n-ary overlay.
    ``single_sided`` buffers lines on the left (positive radius) or
    right (negative) side only, with flat ends (GEOS semantics).
    Negative radius erodes polygons (difference with the styled
    boundary band) and empties points/lines."""
    radius = np.broadcast_to(np.asarray(radius, dtype=np.float64), len(ga))
    if cap_style not in ("round", "square", "flat"):
        raise ValueError(f"buffer: invalid cap_style {cap_style!r}")
    if join_style not in ("round", "bevel", "mitre"):
        raise ValueError(f"buffer: invalid join_style {join_style!r}")
    b = _Builder()
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING or np.isnan(radius[i]):
            _append_missing(b)
            continue
        parts = np.flatnonzero(ga.part_geom == i)
        if len(parts) == 0:  # empty
            _append_empty(b, POLYGON)
            continue
        if single_sided and t in (LINESTRING, LINEARRING, MULTILINESTRING) \
                and radius[i] != 0:
            side = 1 if radius[i] > 0 else -1
            rr = abs(radius[i])
            rings = []
            for p in parts:
                rings.extend(_path_buffer_rings(
                    ga.part_coords(p), rr, False, "flat", join_style,
                    mitre_limit, quadsegs, single_side=side,
                ))
            _emit_ring_union(b, i, rings)
            continue
        if t not in (POINT, MULTIPOINT):
            if radius[i] <= 0:
                if t in (POLYGON, 6) and radius[i] < 0:
                    # erosion = polygon minus the styled boundary band
                    from rayspatial.geom.setops import _copy_geom, difference

                    band = buffer(boundary(_slice_one(ga, i)), -radius[i],
                                  quadsegs, cap_style, join_style,
                                  mitre_limit)
                    sub = difference(_slice_one(ga, i), band)
                    _copy_geom(sub, 0, b, i)
                    continue
                _append_empty(b, POLYGON)
                continue
            if (t == POLYGON and len(parts) == 1 and join_style == "mitre"
                    and mitre_limit >= 1.4143
                    and int(ga.part_kind[parts[0]]) == PK_SHELL):
                # axis-aligned rectangle + mitre join (limit >= sqrt(2),
                # so 90-degree corners stay sharp): the dilation is
                # exactly the expanded rectangle — no ring union needed
                xy = ga.part_coords(parts[0])
                if len(xy) == 5:
                    x0, y0 = xy[:, 0].min(), xy[:, 1].min()
                    x1, y1 = xy[:, 0].max(), xy[:, 1].max()
                    on_x = (xy[:, 0] == x0) | (xy[:, 0] == x1)
                    on_y = (xy[:, 1] == y0) | (xy[:, 1] == y1)
                    if on_x.all() and on_y.all() and x1 > x0 and y1 > y0:
                        r = radius[i]
                        _append_ring_polygon(b, i, np.array([
                            [x0 - r, y0 - r], [x1 + r, y0 - r],
                            [x1 + r, y1 + r], [x0 - r, y1 + r],
                            [x0 - r, y0 - r],
                        ]))
                        continue
            if any(int(ga.part_kind[p]) == PK_HOLE for p in parts):
                # Polygon with interior rings: dissolving bare shell
                # rings would fill the holes (a face inside the shell
                # ring is inside "ANY input ring").  Correct dilation is
                # union(polygon-with-holes, band(boundary, r)) — the
                # band covers everything within r of any ring while the
                # eroded hole interiors stay uncovered.
                from rayspatial.geom.setops import _copy_geom, union as _union

                sl = _slice_one(ga, i)
                band = buffer(boundary(sl), radius[i], quadsegs,
                              cap_style, join_style, mitre_limit)
                res = _union(sl, band)
                _copy_geom(res, 0, b, i)
                continue
            rings = []
            for p in parts:
                xy = ga.part_coords(p)
                kind = int(ga.part_kind[p])
                closed = kind in (PK_SHELL, PK_HOLE) or (
                    len(xy) > 1 and (xy[0] == xy[-1]).all()
                )
                rings.extend(_path_buffer_rings(
                    xy, radius[i], closed, cap_style, join_style,
                    mitre_limit, quadsegs,
                ))
                if kind == PK_SHELL:
                    rings.append(
                        xy if (xy[0] == xy[-1]).all() else np.vstack([xy, xy[:1]])
                    )
            _emit_ring_union(b, i, rings)
            continue
        if radius[i] <= 0:
            _append_empty(b, POLYGON)
            continue
        rings = [
            _circle_ring(xy[0, 0], xy[0, 1], radius[i], quadsegs)
            for xy in (ga.part_coords(p) for p in parts)
        ]
        if len(rings) == 1:
            _append_ring_polygon(b, i, rings[0])
        elif _disks_disjoint(ga, parts, radius[i]):
            # multipoint buffer: disjoint disks -> plain MULTIPOLYGON
            b.types.append(MULTIPOLYGON)
            b.has_z.append(False)
            b.num_children.append(len(rings))
            for ring in rings:
                b.add_part(i, PK_SHELL, b.poly_counter, ring)
                b.poly_counter += 1
        else:
            # overlapping disks must DISSOLVE (an un-unioned
            # MULTIPOLYGON with overlapping members is invalid)
            _emit_ring_union(b, i, rings)
    return b.finish()


def _disks_disjoint(ga: GeomArray, parts: np.ndarray, r: float) -> bool:
    centers = np.vstack([ga.part_coords(p)[0] for p in parts])
    d2 = ((centers[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    return bool((d2 > (2 * r) ** 2).all())


def _emit_ring_union(b: _Builder, i: int, rings: list[np.ndarray]) -> None:
    from rayspatial.geom.creation import polygons as mk_polys
    from rayspatial.geom.overlay import nary_union
    from rayspatial.geom.setops import _copy_geom

    if not rings:
        _append_empty(b, POLYGON)
        return
    sub = nary_union(mk_polys([r[:-1] for r in rings]))
    _copy_geom(sub, 0, b, i)


def _slice_one(ga: GeomArray, i: int) -> GeomArray:
    from rayspatial.geom.setops import _slice_rows

    return _slice_rows(ga, [i])


def boundary(ga: GeomArray) -> GeomArray:
    """Topological boundary (constructive.py:50-78): point -> GC EMPTY,
    line -> MULTIPOINT of odd endpoints, polygon -> (MULTI)LINESTRING of
    rings, GC -> missing."""
    from rayspatial.geom.predicates import _Decomp

    b = _Builder()
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING or t == GEOMETRYCOLLECTION:
            _append_missing(b)
            continue
        d = _Decomp(ga, i)
        if t in (POINT, MULTIPOINT):
            _append_empty(b, GEOMETRYCOLLECTION)
            continue
        if t in (LINESTRING, LINEARRING, MULTILINESTRING):
            bp = d.line_boundary_points()
            bp = bp[np.lexsort((bp[:, 1], bp[:, 0]))] if len(bp) else bp
            b.types.append(MULTIPOINT)
            b.has_z.append(False)
            b.num_children.append(len(bp))
            for p in bp:
                b.add_part(i, PK_POINT, b.sub_counter, p[None, :])
                b.sub_counter += 1
            continue
        # polygonal: rings as LINESTRING / MULTILINESTRING
        rings = []
        for shell, holes in d.polys:
            rings.append(shell)
            rings.extend(holes)
        if len(rings) == 1:
            b.types.append(LINESTRING)
            b.has_z.append(False)
            b.num_children.append(1)
            b.add_part(i, PK_LINE, b.sub_counter, rings[0])
            b.sub_counter += 1
        else:
            b.types.append(MULTILINESTRING)
            b.has_z.append(False)
            b.num_children.append(len(rings))
            for ring in rings:
                b.add_part(i, PK_LINE, b.sub_counter, ring)
                b.sub_counter += 1
    return b.finish()


def centroid(ga: GeomArray) -> GeomArray:
    """Highest-dimension weighted centroid (constructive.py:248-274);
    empty -> POINT EMPTY; missing -> missing."""
    b = _Builder()
    from rayspatial.geom.predicates import _Decomp

    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        d = _Decomp(ga, i)
        if d.empty:
            _append_empty(b, POINT)
            continue
        if d.polys:
            A = 0.0
            cx = cy = 0.0
            for shell, holes in d.polys:
                for ring, sign in [(shell, 1.0)] + [(h, -1.0) for h in holes]:
                    x = ring[:-1, 0]; y = ring[:-1, 1]
                    x1 = ring[1:, 0]; y1 = ring[1:, 1]
                    cr = x * y1 - x1 * y
                    a2 = cr.sum()
                    # orientation-independent: use |a2| with sign for holes
                    s = sign * np.sign(a2) if a2 != 0 else 0.0
                    A += s * abs(a2)
                    cx += s * np.abs(1.0) * ((x + x1) * cr).sum() * np.sign(a2) * sign if False else 0
            # recompute cleanly (numerically standard formulas)
            A = 0.0; sx = 0.0; sy = 0.0
            for shell, holes in d.polys:
                for ring, sign in [(shell, 1.0)] + [(h, -1.0) for h in holes]:
                    x = ring[:-1, 0]; y = ring[:-1, 1]
                    x1 = ring[1:, 0]; y1 = ring[1:, 1]
                    cr = x * y1 - x1 * y
                    a2 = cr.sum()
                    w = sign * abs(a2)
                    if a2 == 0:
                        continue
                    ux = ((x + x1) * cr).sum() / (3.0 * a2)
                    uy = ((y + y1) * cr).sum() / (3.0 * a2)
                    A += w
                    sx += w * ux
                    sy += w * uy
            if A != 0:
                _append_point(b, i, sx / A, sy / A)
                continue
        if d.lines:
            L = 0.0; sx = 0.0; sy = 0.0
            for ch in d.lines:
                seg = np.diff(ch, axis=0)
                ln = np.hypot(seg[:, 0], seg[:, 1])
                mid = (ch[:-1] + ch[1:]) / 2.0
                L += ln.sum()
                sx += (mid[:, 0] * ln).sum()
                sy += (mid[:, 1] * ln).sum()
            if L > 0:
                _append_point(b, i, sx / L, sy / L)
                continue
        pts = d.all_vertices()
        _append_point(b, i, pts[:, 0].mean(), pts[:, 1].mean())
    return b.finish()


def envelope(ga: GeomArray) -> GeomArray:
    """Bounding box (constructive.py:385-406): ccw box polygon; point in
    -> point out; empty -> POINT EMPTY."""
    bo = ga.bounds()
    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        if np.isnan(bo[i, 0]):
            _append_empty(b, POINT)
            continue
        xmin, ymin, xmax, ymax = bo[i]
        if xmin == xmax and ymin == ymax:
            _append_point(b, i, xmin, ymin)
            continue
        ring = np.asarray(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
        )
        _append_ring_polygon(b, i, ring)
    return b.finish()


def _convex_hull_pts(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull; returns hull vertices CCW, no repeat."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically
    if len(pts) <= 2:
        return pts
    def half(pp):
        out = []
        for p in pp:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def convex_hull(ga: GeomArray) -> GeomArray:
    """Convex hull (constructive.py:324-341): CW ring from lexicographic
    min; < 3 distinct points degrade to point/linestring; empty -> GC
    EMPTY."""
    from rayspatial.geom.predicates import _Decomp

    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        d = _Decomp(ga, i)
        pts = d.all_vertices()
        if len(pts) == 0:
            _append_empty(b, GEOMETRYCOLLECTION)
            continue
        hull = _convex_hull_pts(pts)
        if len(hull) == 1:
            _append_point(b, i, hull[0, 0], hull[0, 1])
            continue
        if len(hull) == 2:
            b.types.append(LINESTRING)
            b.has_z.append(False)
            b.num_children.append(1)
            b.add_part(i, PK_LINE, b.sub_counter, hull)
            b.sub_counter += 1
            continue
        # CW starting at lexicographic min (GEOS convention per example)
        hull = hull[::-1]  # CCW -> CW
        start = np.lexsort((hull[:, 1], hull[:, 0]))[0]
        hull = np.roll(hull, -start, axis=0)
        ring = np.vstack([hull, hull[:1]])
        _append_ring_polygon(b, i, ring)
    return b.finish()


def extract_unique_points(ga: GeomArray) -> GeomArray:
    """MULTIPOINT of distinct vertices in first-seen order
    (constructive.py:410-436)."""
    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        chunks = [ga.part_coords(p) for p in np.flatnonzero(ga.part_geom == i)]
        pts = np.concatenate(chunks) if chunks else np.empty((0, 2))
        seen = set()
        uniq = []
        for p in pts:
            k = (p[0], p[1])
            if k not in seen:
                seen.add(k)
                uniq.append(p)
        b.types.append(MULTIPOINT)
        b.has_z.append(False)
        b.num_children.append(len(uniq))
        for p in uniq:
            b.add_part(i, PK_POINT, b.sub_counter, np.asarray(p)[None, :])
            b.sub_counter += 1
    return b.finish()


def _copy_geom_with(ga: GeomArray, transform) -> GeomArray:
    """Rebuild each geometry applying ``transform(part_kind, coords) ->
    coords`` per part (shape may change); missing passes through."""
    b = _Builder()
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING:
            _append_missing(b)
            continue
        parts = np.flatnonzero(ga.part_geom == i)
        b.types.append(t)
        b.has_z.append(bool(ga.has_z[i]) if ga.has_z is not None else False)
        b.num_children.append(int(ga.num_children[i]) if ga.num_children is not None else len(parts))
        for p in parts:
            xy = transform(int(ga.part_kind[p]), ga.part_coords(p))
            z = None
            if ga.z is not None:
                z = ga.z[ga.part_off[p] : ga.part_off[p + 1]]
                if len(z) != len(xy):
                    z = None  # transform changed the vertex count
            b.add_part(i, int(ga.part_kind[p]), int(ga.part_sub[p]), xy, z)
    return b.finish()


def reverse(ga: GeomArray) -> GeomArray:
    """Reverse coordinate order per part (constructive.py:643-672)."""
    return _copy_geom_with(ga, lambda kind, xy: xy[::-1])


def force_2d(ga: GeomArray) -> GeomArray:
    """Drop Z (geometry.py:792-817)."""
    out = _copy_geom_with(ga, lambda kind, xy: xy)
    out.z = None
    out.has_z = np.zeros(len(out), dtype=bool)
    return out


def segmentize(ga: GeomArray, tolerance: float) -> GeomArray:
    """Add vertices so no segment exceeds ``tolerance``
    (constructive.py:677-708): each segment split into equal parts."""
    if tolerance <= 0:
        raise ValueError("tolerance must be positive")

    def tf(kind, xy):
        if kind == PK_POINT or len(xy) < 2:
            return xy
        out = [xy[:1]]
        for k in range(len(xy) - 1):
            a, bb = xy[k], xy[k + 1]
            d = np.hypot(*(bb - a))
            nseg = max(1, int(np.ceil(d / tolerance)))
            ts = np.arange(1, nseg + 1) / nseg
            out.append(a + ts[:, None] * (bb - a))
        return np.vstack(out)

    return _copy_geom_with(ga, tf)


def _dp_simplify(xy: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker."""
    keep = np.zeros(len(xy), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(xy) - 1)]
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        a, bb = xy[s], xy[e]
        seg = bb - a
        ll = seg @ seg
        pts = xy[s + 1 : e]
        if ll == 0:
            d = np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
        else:
            t = ((pts - a) @ seg) / ll
            t = np.clip(t, 0, 1)
            proj = a + t[:, None] * seg
            d = np.hypot(*(pts - proj).T)
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[s + 1 + k] = True
            stack.append((s, s + 1 + k))
            stack.append((s + 1 + k, e))
    return xy[keep]


def simplify(ga: GeomArray, tolerance: float, preserve_topology: bool = False) -> GeomArray:
    """Douglas-Peucker simplification (constructive.py:712-744).
    preserve_topology keeps rings valid (>= 4 points) and drops rings
    that would collapse when False."""

    b = _Builder()
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING:
            _append_missing(b)
            continue
        parts = np.flatnonzero(ga.part_geom == i)
        kept_parts = []
        for p in parts:
            kind = int(ga.part_kind[p])
            xy = ga.part_coords(p)
            if kind == PK_POINT or len(xy) < 3:
                kept_parts.append((kind, int(ga.part_sub[p]), xy))
                continue
            out = _dp_simplify(xy, tolerance)
            if kind in (PK_SHELL, PK_HOLE):
                if len(out) < 4:
                    if preserve_topology:
                        out = xy  # keep original rather than collapse
                    elif kind == PK_HOLE:
                        continue  # drop collapsed hole
                    else:
                        continue  # drop collapsed shell
                # check ring is still closed
                if not (out[0] == out[-1]).all():
                    out = np.vstack([out, out[:1]])
            kept_parts.append((kind, int(ga.part_sub[p]), out))
        b.types.append(t)
        b.has_z.append(False)
        b.num_children.append(len(kept_parts))
        for kind, sub, xy in kept_parts:
            b.add_part(i, kind, sub, xy)
    return b.finish()


def snap(ga: GeomArray, ref: GeomArray, tolerance: float) -> GeomArray:
    """Snap vertices of ``ga`` to nearest vertex of ``ref`` within
    tolerance (constructive.py:748-778; vertex snapping — GEOS also
    snaps to segments, vertex-only covers the documented examples)."""
    outs = []
    for i in range(len(ga)):
        refs = [ref.part_coords(p) for p in np.flatnonzero(ref.part_geom == i)]
        rv = np.concatenate(refs) if refs else np.empty((0, 2))

        def tf(kind, xy, rv=rv):
            if not len(rv) or not len(xy):
                return xy
            d = np.hypot(
                xy[:, None, 0] - rv[None, :, 0], xy[:, None, 1] - rv[None, :, 1]
            )
            k = d.argmin(axis=1)
            best = d[np.arange(len(xy)), k]
            out = xy.copy()
            m = best <= tolerance
            out[m] = rv[k[m]]
            return out

        outs.append(tf)
    # per-geometry transform
    b = _Builder()
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING:
            _append_missing(b)
            continue
        parts = np.flatnonzero(ga.part_geom == i)
        b.types.append(t)
        b.has_z.append(False)
        b.num_children.append(len(parts))
        for p in parts:
            xy = outs[i](int(ga.part_kind[p]), ga.part_coords(p))
            b.add_part(i, int(ga.part_kind[p]), int(ga.part_sub[p]), xy)
    return b.finish()


def clip_by_rect(ga: GeomArray, xmin: float, ymin: float, xmax: float, ymax: float) -> GeomArray:
    """Clip to an axis-aligned rectangle (constructive.py:278-312):
    points filtered, lines Liang-Barsky clipped, polygons
    Sutherland-Hodgman clipped.  Missing/outside -> empty."""
    b = _Builder()
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING:
            _append_missing(b)
            continue
        parts = np.flatnonzero(ga.part_geom == i)
        new_parts = []
        for p in parts:
            kind = int(ga.part_kind[p])
            xy = ga.part_coords(p)
            if kind == PK_POINT:
                if len(xy) and xmin <= xy[0, 0] <= xmax and ymin <= xy[0, 1] <= ymax:
                    new_parts.append((PK_POINT, xy))
            elif kind == PK_LINE:
                for chunk in _clip_chain(xy, xmin, ymin, xmax, ymax):
                    new_parts.append((PK_LINE, chunk))
            else:
                ring = _clip_ring(xy, xmin, ymin, xmax, ymax)
                if ring is not None:
                    new_parts.append((kind, ring))
        if not new_parts:
            _append_empty(b, GEOMETRYCOLLECTION if t == GEOMETRYCOLLECTION else t)
            continue
        # recompute output type
        kinds = {k for k, _ in new_parts}
        if kinds <= {PK_POINT}:
            ot = POINT if len(new_parts) == 1 else MULTIPOINT
        elif kinds <= {PK_LINE}:
            ot = LINESTRING if len(new_parts) == 1 else MULTILINESTRING
        else:
            nshell = sum(1 for k, _ in new_parts if k == PK_SHELL)
            ot = POLYGON if nshell <= 1 else MULTIPOLYGON
        b.types.append(ot)
        b.has_z.append(False)
        b.num_children.append(len(new_parts))
        pid = b.poly_counter
        started = False
        for kind, xy in new_parts:
            if kind == PK_SHELL:
                pid = b.poly_counter
                b.poly_counter += 1
                started = True
                b.add_part(i, PK_SHELL, pid, xy)
            elif kind == PK_HOLE:
                b.add_part(i, PK_HOLE, pid if started else b.poly_counter, xy)
            else:
                b.add_part(i, kind, b.sub_counter, xy)
                b.sub_counter += 1
    return b.finish()


def _clip_chain(xy: np.ndarray, xmin, ymin, xmax, ymax):
    """Liang-Barsky clip of a polyline; yields clipped sub-chains."""
    chunks = []
    cur: list[np.ndarray] = []
    for k in range(len(xy) - 1):
        seg = _clip_seg(xy[k], xy[k + 1], xmin, ymin, xmax, ymax)
        if seg is None:
            if len(cur) >= 2:
                chunks.append(np.asarray(cur))
            cur = []
            continue
        a, bb = seg
        if cur and np.allclose(cur[-1], a):
            cur.append(bb)
        else:
            if len(cur) >= 2:
                chunks.append(np.asarray(cur))
            cur = [a, bb]
    if len(cur) >= 2:
        chunks.append(np.asarray(cur))
    return chunks


def _clip_seg(a, bb, xmin, ymin, xmax, ymax):
    t0, t1 = 0.0, 1.0
    d = bb - a
    for p, q in (
        (-d[0], a[0] - xmin),
        (d[0], xmax - a[0]),
        (-d[1], a[1] - ymin),
        (d[1], ymax - a[1]),
    ):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    if t0 > t1:
        return None
    return a + t0 * d, a + t1 * d


def _clip_ring(ring: np.ndarray, xmin, ymin, xmax, ymax):
    """Sutherland-Hodgman polygon clip against the rectangle."""
    poly = ring[:-1].tolist()
    for edge in range(4):
        if not poly:
            return None
        out = []
        n = len(poly)
        for k in range(n):
            cur = np.asarray(poly[k])
            prv = np.asarray(poly[k - 1])

            def inside(p):
                return (
                    p[0] >= xmin if edge == 0 else
                    p[0] <= xmax if edge == 1 else
                    p[1] >= ymin if edge == 2 else
                    p[1] <= ymax
                )

            def intersect(p1, p2):
                if edge in (0, 1):
                    xc = xmin if edge == 0 else xmax
                    t = (xc - p1[0]) / (p2[0] - p1[0])
                    return np.asarray([xc, p1[1] + t * (p2[1] - p1[1])])
                yc = ymin if edge == 2 else ymax
                t = (yc - p1[1]) / (p2[1] - p1[1])
                return np.asarray([p1[0] + t * (p2[0] - p1[0]), yc])

            if inside(cur):
                if not inside(prv):
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif inside(prv):
                out.append(intersect(prv, cur))
        poly = out
    if len(poly) < 3:
        return None
    arr = np.asarray(poly)
    # drop consecutive duplicates
    keep = np.r_[True, (np.diff(arr, axis=0) != 0).any(axis=1)]
    arr = arr[keep]
    if len(arr) < 3:
        return None
    return np.vstack([arr, arr[:1]])


def normalize(ga: GeomArray) -> GeomArray:
    """GEOS-style canonical form (constructive.py:482-502): ring start at
    lexicographic min vertex, shells CW / holes CCW, line direction
    smallest-endpoint-first, multi components sorted descending."""
    b = _Builder()
    for i in range(len(ga)):
        t = int(ga.types[i])
        if t == MISSING:
            _append_missing(b)
            continue
        parts = np.flatnonzero(ga.part_geom == i)
        items = []  # (sort_key, kind, sub, xy)
        for p in parts:
            kind = int(ga.part_kind[p])
            xy = ga.part_coords(p).copy()
            if kind == PK_LINE and len(xy) >= 2:
                a, bb = xy[0], xy[-1]
                if (bb[0], bb[1]) < (a[0], a[1]):
                    xy = xy[::-1]
            elif kind in (PK_SHELL, PK_HOLE) and len(xy) >= 4:
                ring = xy[:-1]
                start = np.lexsort((ring[:, 1], ring[:, 0]))[0]
                ring = np.roll(ring, -start, axis=0)
                xy = np.vstack([ring, ring[:1]])
                ccw = (
                    np.dot(xy[:-1, 0], xy[1:, 1]) - np.dot(xy[1:, 0], xy[:-1, 1])
                ) > 0
                want_ccw = kind == PK_HOLE
                if ccw != want_ccw:
                    ring = ring[::-1]
                    start = np.lexsort((ring[:, 1], ring[:, 0]))[0]
                    ring = np.roll(ring, -start, axis=0)
                    xy = np.vstack([ring, ring[:1]])
            items.append((xy.tobytes(), kind, int(ga.part_sub[p]), xy))
        if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            items.sort(key=lambda it: it[0], reverse=True)
        b.types.append(t)
        b.has_z.append(False)
        b.num_children.append(int(ga.num_children[i]) if ga.num_children is not None else len(items))
        for _, kind, sub, xy in items:
            b.add_part(i, kind, sub, xy)
    return b.finish()


def point_on_surface(ga: GeomArray) -> GeomArray:
    """A point guaranteed on the geometry (constructive.py:506-527):
    polygon -> midpoint of widest interior interval at the mid scanline;
    line -> vertex nearest the centroid; points -> first point."""
    from rayspatial.geom.predicates import _Decomp, _poly_intervals_at

    b = _Builder()
    cent = centroid(ga)
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        d = _Decomp(ga, i)
        if d.empty:
            _append_empty(b, POINT)
            continue
        if d.polys:
            ys = np.unique(d.all_vertices()[:, 1])
            if len(ys) >= 2:
                k = len(ys) // 2
                y = (ys[k - 1] + ys[k]) / 2.0
                iv = _poly_intervals_at(d, y)
                if iv:
                    widths = [bb - a for a, bb in iv]
                    a, bb = iv[int(np.argmax(widths))]
                    _append_point(b, i, (a + bb) / 2.0, y)
                    continue
            shell = d.polys[0][0]
            _append_point(b, i, shell[0, 0], shell[0, 1])
            continue
        if d.lines:
            cxy = cent.coords[cent.part_off[np.flatnonzero(cent.part_geom == i)[0]]]
            verts = np.concatenate(d.lines)
            dd = np.hypot(verts[:, 0] - cxy[0], verts[:, 1] - cxy[1])
            v = verts[int(np.argmin(dd))]
            _append_point(b, i, v[0], v[1])
            continue
        _append_point(b, i, d.points[0, 0], d.points[0, 1])
    return b.finish()


def oriented_envelope(ga: GeomArray) -> GeomArray:
    """Minimum rotated rectangle via rotating calipers over the hull
    (constructive.py:827-863)."""
    from rayspatial.geom.predicates import _Decomp

    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        d = _Decomp(ga, i)
        pts = d.all_vertices()
        if len(pts) == 0:
            _append_empty(b, POLYGON)
            continue
        hull = _convex_hull_pts(pts)
        if len(hull) == 1:
            _append_point(b, i, hull[0, 0], hull[0, 1])
            continue
        if len(hull) == 2:
            b.types.append(LINESTRING)
            b.has_z.append(False)
            b.num_children.append(1)
            b.add_part(i, PK_LINE, b.sub_counter, hull)
            b.sub_counter += 1
            continue
        best = None
        for k in range(len(hull)):
            e = hull[(k + 1) % len(hull)] - hull[k]
            ang = np.arctan2(e[1], e[0])
            c, s = np.cos(-ang), np.sin(-ang)
            R = np.asarray([[c, -s], [s, c]])
            rot = hull @ R.T
            lo = rot.min(axis=0)
            hi = rot.max(axis=0)
            area = (hi[0] - lo[0]) * (hi[1] - lo[1])
            if best is None or area < best[0]:
                corners = np.asarray(
                    [[lo[0], lo[1]], [hi[0], lo[1]], [hi[0], hi[1]], [lo[0], hi[1]]]
                )
                Rb = np.asarray([[c, s], [-s, c]])
                best = (area, corners @ Rb.T)
        ring = np.vstack([best[1], best[1][:1]])
        _append_ring_polygon(b, i, ring)
    return b.finish()


def minimum_bounding_circle(ga: GeomArray, quadsegs: int = 8) -> GeomArray:
    """Minimum bounding circle as a polygon (constructive.py:866-893)."""
    from rayspatial.geom.measures import _geom_vertices, _welzl_circle

    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        pts = _geom_vertices(ga, i)
        if len(pts) == 0:
            _append_empty(b, POLYGON)
            continue
        cx, cy, r2 = _welzl_circle(pts)
        r = float(np.sqrt(r2))
        if r == 0:
            _append_point(b, i, cx, cy)
            continue
        _append_ring_polygon(b, i, _circle_ring(cx, cy, r, quadsegs))
    return b.finish()


def make_valid(ga: GeomArray) -> GeomArray:
    """Repair invalid (self-intersecting) polygons (reference
    constructive.py:463-481; GEOS >= 3.8 MakeValid 'linework'
    semantics for bow-ties): node the boundary, polygonize, keep the
    even-odd-interior faces.  Valid geometries pass through unchanged;
    non-polygonal types pass through (they are valid by construction
    in this engine's builders)."""
    from rayspatial.geom import predicates as P
    from rayspatial.geom.overlay import make_valid_rings

    valid = P.is_valid(ga)
    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        if valid[i] or ga.types[i] not in (POLYGON, MULTIPOLYGON):
            _copy_row(ga, i, b)
            continue
        rings = [
            ga.part_coords(p)
            for p in np.flatnonzero(ga.part_geom == i)
            if ga.part_kind[p] in (PK_SHELL, PK_HOLE)
        ]
        faces = make_valid_rings(rings)
        if not faces:
            _append_empty(b, POLYGON)
            continue
        b.types.append(POLYGON if len(faces) == 1 else MULTIPOLYGON)
        for f in faces:
            b.add_part(i, PK_SHELL, b.poly_counter, f)
            b.poly_counter += 1
        b.has_z.append(False)
        b.num_children.append(len(faces))
    return b.finish()


def build_area(ga: GeomArray) -> GeomArray:
    """Areal geometry from a geometry's linework (reference
    constructive.py:441-462): polygonize the edges and keep faces by
    the even-odd rule, nested odd faces becoming holes — equivalent to
    make_valid over the closed linework."""
    from rayspatial.geom.overlay import _node_all, _rings_to_segs
    from rayspatial.geom.polygonize import _trace_faces

    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        chains = [
            ga.part_coords(p)
            for p in np.flatnonzero(ga.part_geom == i)
            if ga.part_kind[p] != 0  # all line/ring parts
        ]
        segs = _node_all(_rings_to_segs(chains))
        ccw, _, _ = _trace_faces(segs)
        from rayspatial.geom.overlay import (
            _edge_offset_point,
            _even_odd_segments,
            assemble_faces,
            build_face_forest,
        )

        seg_arrays = [(np.asarray(a), np.asarray(bq)) for a, bq in segs]
        parent, children = build_face_forest(ccw)
        keep = [
            _even_odd_segments(
                _edge_offset_point(f, [ccw[c] for c in children[k]]), seg_arrays
            )
            for k, f in enumerate(ccw)
        ]
        polys = assemble_faces(ccw, keep, parent)
        if not polys:
            _append_empty(b, POLYGON)
            continue
        b.types.append(POLYGON if len(polys) == 1 else MULTIPOLYGON)
        for shell, holes in polys:
            pid = b.poly_counter
            b.poly_counter += 1
            b.add_part(i, PK_SHELL, pid, shell)
            for h in holes:
                b.add_part(i, PK_HOLE, pid, h)
        b.has_z.append(False)
        b.num_children.append(len(polys))
    return b.finish()


def _copy_row(ga: GeomArray, i: int, b: _Builder) -> None:
    from rayspatial.geom.setops import _copy_geom

    _copy_geom(ga, i, b, len(b.types))


# API parity with the reference (constructive.py:37-47,861; the string
# kwargs above remain the engine-native spelling — these enums carry
# the same member names/values for callers porting code)
import enum as _enum


class BufferCapStyles(_enum.IntEnum):
    round = 1
    flat = 2
    square = 3


class BufferJoinStyles(_enum.IntEnum):
    round = 1
    mitre = 2
    bevel = 3


#: reference constructive.py:861 — alias of :func:`oriented_envelope`
minimum_rotated_rectangle = oriented_envelope

__all__ += ["BufferCapStyles", "BufferJoinStyles",
            "minimum_rotated_rectangle"]
