"""Triangulation operators (reference pygeos/constructive.py:345-384
``delaunay_triangles`` and 781-826 ``voronoi_polygons``).

Pure-numpy Bowyer-Watson Delaunay over each geometry's unique vertices;
Voronoi cells are the clipped dual (circumcenters joined per site,
bounded by the extended envelope, like GEOS's ``extend_to`` default).

Determinism: input vertices are deduplicated and lexicographically
sorted before insertion, so triangulations are reproducible across
runs/workers (the reference's output order is GEOS-internal; we define
ours, consistent with the engine-wide rule of pinning unspecified
orders — SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    GEOMETRYCOLLECTION,
    MISSING,
    PK_LINE,
    PK_SHELL,
    POLYGON,
    GeomArray,
    _Builder,
)
from rayspatial.geom.constructive import _append_empty, _append_missing

__all__ = ["delaunay_triangles", "voronoi_polygons", "triangulate_points"]


def _circumcircle(a, b, c):
    """(center_x, center_y, r2) of the triangle circumcircle."""
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0:
        return np.nan, np.nan, np.inf
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def triangulate_points(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson Delaunay of (n, 2) points -> list of CCW vertex
    index triples (sorted deterministically)."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    # super-triangle enclosing everything
    mn = pts.min(axis=0)
    mx = pts.max(axis=0)
    span = max(mx[0] - mn[0], mx[1] - mn[1], 1.0)
    cx, cy = (mn + mx) / 2.0
    sp = np.array(
        [
            [cx - 20 * span, cy - 10 * span],
            [cx + 20 * span, cy - 10 * span],
            [cx, cy + 20 * span],
        ]
    )
    allp = np.vstack([pts, sp])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    circ = {(n, n + 1, n + 2): _circumcircle(sp[0], sp[1], sp[2])}
    for i in range(n):
        p = allp[i]
        bad = []
        for t in tris:
            ux, uy, r2 = circ[t]
            if (p[0] - ux) ** 2 + (p[1] - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # boundary of the cavity = edges appearing in exactly one bad tri
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t in bad:
            tris.remove(t)
            del circ[t]
        for (a, b), cnt in edge_count.items():
            if cnt != 1:
                continue
            t = (a, b, i)
            tris.append(t)
            circ[t] = _circumcircle(allp[a], allp[b], allp[i])
    out = []
    for t in tris:
        if any(v >= n for v in t):
            continue
        a, b, c = t
        # orient CCW, canonical rotation starting at smallest index
        ax, ay = allp[a]
        bx, by = allp[b]
        cx2, cy2 = allp[c]
        if (bx - ax) * (cy2 - ay) - (by - ay) * (cx2 - ax) < 0:
            a, b, c = a, c, b
        rot = min(range(3), key=lambda k: (a, b, c)[k])
        t = tuple(np.roll((a, b, c), -rot))
        out.append((int(t[0]), int(t[1]), int(t[2])))
    out.sort()
    return out


def _unique_vertices(ga: GeomArray, i: int) -> np.ndarray:
    parts = np.flatnonzero(ga.part_geom == i)
    if not len(parts):
        return np.empty((0, 2))
    xy = np.vstack([ga.part_coords(p) for p in parts])
    uniq = np.unique(xy, axis=0)
    return uniq


def delaunay_triangles(ga: GeomArray, tolerance: float = 0.0,
                       only_edges: bool = False) -> GeomArray:
    """GEOMETRYCOLLECTION of triangles (or MULTILINESTRING of edges) of
    the Delaunay triangulation of each geometry's vertices
    (constructive.py:345-384).  ``tolerance`` merges vertices within
    that distance before triangulating (GEOS snapping tolerance).
    Missing -> missing; < 3 vertices ->
    empty collection."""
    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        pts = _unique_vertices(ga, i)
        if tolerance > 0 and len(pts):
            # merge vertices within tolerance (greedy grid snap, the
            # GEOS snapping-tolerance behavior)
            snapped = np.round(pts / tolerance) * tolerance
            pts = np.unique(snapped, axis=0)
        tris = triangulate_points(pts)
        if not tris:
            _append_empty(b, GEOMETRYCOLLECTION)
            continue
        if only_edges:
            edges = sorted(
                {
                    (min(e), max(e))
                    for t in tris
                    for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))
                }
            )
            b.types.append(5)  # MULTILINESTRING
            for a, c in edges:
                b.add_part(i, PK_LINE, b.sub_counter, np.vstack([pts[a], pts[c]]))
                b.sub_counter += 1
            b.has_z.append(False)
            b.num_children.append(len(edges))
        else:
            b.types.append(GEOMETRYCOLLECTION)
            for t in tris:
                ring = np.vstack([pts[t[0]], pts[t[1]], pts[t[2]], pts[t[0]]])
                b.add_part(i, PK_SHELL, b.poly_counter, ring)
                b.poly_counter += 1
            b.has_z.append(False)
            b.num_children.append(len(tris))
    return b.finish()


def voronoi_polygons(ga: GeomArray, tolerance: float = 0.0, extend_to=None,
                     only_edges: bool = False,
                     margin_frac: float = 1.0) -> GeomArray:
    """GEOMETRYCOLLECTION of Voronoi cells of each geometry's vertices
    (constructive.py:781-826), clipped to the input envelope expanded by
    ``margin_frac`` (GEOS default enlarges the envelope similarly).
    ``tolerance`` merges vertices within that distance first;
    ``only_edges=True`` returns the cell boundaries as a
    MULTILINESTRING instead of polygons.

    Cells are built by clipping the bounding box with the perpendicular
    half-plane of every other site (exact for the clipped region;
    O(n^2) per geometry — fine for the per-batch scale this runs at;
    sites are deduplicated + sorted for determinism).
    """
    from rayspatial.geom.setops import _clip_halfplane

    b = _Builder()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            _append_missing(b)
            continue
        pts = _unique_vertices(ga, i)
        if tolerance > 0 and len(pts):
            pts = np.unique(np.round(pts / tolerance) * tolerance, axis=0)
        if len(pts) == 0:
            _append_empty(b, GEOMETRYCOLLECTION)
            continue
        mn = pts.min(axis=0)
        mx = pts.max(axis=0)
        span = max(mx[0] - mn[0], mx[1] - mn[1], 1.0)
        m = margin_frac * span
        x0, y0, x1, y1 = mn[0] - m, mn[1] - m, mx[0] + m, mx[1] + m
        if extend_to is not None:
            x0, y0, x1, y1 = extend_to
        base = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
        cells = []
        for s in range(len(pts)):
            cell = base
            for t in range(len(pts)):
                if t == s or not len(cell):
                    continue
                # keep the half-plane closer to site s than site t
                mid = (pts[s] + pts[t]) / 2.0
                nrm = pts[s] - pts[t]  # points toward s
                cell = _clip_halfplane(cell, mid, nrm)
            if len(cell) >= 3:
                cells.append(np.vstack([cell, cell[:1]]))
        if only_edges:
            # dissolve cell boundaries into unique undirected segments
            seen = set()
            segs = []
            for ring in cells:
                for k in range(len(ring) - 1):
                    key = tuple(sorted((tuple(np.round(ring[k], 12)),
                                        tuple(np.round(ring[k + 1], 12)))))
                    if key not in seen:
                        seen.add(key)
                        segs.append((ring[k], ring[k + 1]))
            b.types.append(5)  # MULTILINESTRING
            for a2, c2 in segs:
                b.add_part(i, PK_LINE, b.sub_counter, np.vstack([a2, c2]))
                b.sub_counter += 1
            b.has_z.append(False)
            b.num_children.append(len(segs))
            continue
        b.types.append(GEOMETRYCOLLECTION)
        for ring in cells:
            b.add_part(i, PK_SHELL, b.poly_counter, ring)
            b.poly_counter += 1
        b.has_z.append(False)
        b.num_children.append(len(cells))
    return b.finish()
