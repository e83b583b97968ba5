"""Polygonize (reference pygeos/constructive.py:530-642): build
polygons from a collection of NODED linework.

Planar ring assembly: every undirected segment contributes two directed
half-edges; faces are traced by always taking the sharpest
counterclockwise turn at each vertex; CCW faces are emitted as
polygons (the single CW face is the unbounded outer face).  Input must
be noded (segments meet only at endpoints), the same precondition GEOS
documents; un-noded crossings simply produce fewer/no rings, mirroring
GEOS's polygonize behavior of ignoring dangles and cut edges.

``polygonize_full`` also reports the unused linework: dangles (edges
with a free end) and ``cuts`` (edges bordering the outer face twice —
bridges between rings), matching the reference's 4-output shape
(constructive.py:582-642).
"""

from __future__ import annotations

import math

import numpy as np

from rayspatial.geom.array import (
    GEOMETRYCOLLECTION,
    MULTILINESTRING,
    PK_LINE,
    PK_SHELL,
    GeomArray,
    _Builder,
)

__all__ = ["polygonize", "polygonize_full"]


def _collect_segments(ga: GeomArray) -> list[tuple[tuple, tuple]]:
    segs = set()
    for p in range(ga.n_parts):
        if ga.part_kind[p] != PK_LINE and ga.part_kind[p] != PK_SHELL:
            continue
        xy = ga.part_coords(p)
        for k in range(len(xy) - 1):
            a = (float(xy[k, 0]), float(xy[k, 1]))
            b = (float(xy[k + 1, 0]), float(xy[k + 1, 1]))
            if a == b:
                continue
            segs.add((a, b) if a < b else (b, a))
    return sorted(segs)


def _trace_faces(segs):
    """-> (ccw_rings, cw_rings, dangles): rings as vertex tuples."""
    # adjacency with angular ordering
    adj: dict[tuple, list[tuple]] = {}
    for a, b in segs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    # prune dangles iteratively (degree-1 chains never border a face)
    dangles = set()
    changed = True
    live = {s: True for s in segs}
    deg = {v: len(ns) for v, ns in adj.items()}
    nbrs = {v: set(ns) for v, ns in adj.items()}
    while changed:
        changed = False
        for v in list(nbrs):
            if deg.get(v, 0) == 1:
                (w,) = tuple(nbrs[v])
                e = (v, w) if v < w else (w, v)
                if live.get(e):
                    live[e] = False
                    dangles.add(e)
                    nbrs[v].discard(w)
                    nbrs[w].discard(v)
                    deg[v] -= 1
                    deg[w] -= 1
                    changed = True
    kept = [s for s in segs if live.get(s)]
    if not kept:
        return [], [], sorted(dangles)
    adj2: dict[tuple, list[tuple]] = {}
    for a, b in kept:
        adj2.setdefault(a, []).append(b)
        adj2.setdefault(b, []).append(a)
    for v in adj2:
        adj2[v].sort(key=lambda w: math.atan2(w[1] - v[1], w[0] - v[0]))
    visited = set()  # directed half-edges
    ccw, cw = [], []
    for a, b in kept:
        for he in ((a, b), (b, a)):
            if he in visited:
                continue
            ring = []
            cur = he
            while cur not in visited:
                visited.add(cur)
                ring.append(cur[0])
                u, v = cur
                # next half-edge: at v, take the neighbor that is the
                # next CLOCKWISE from the reverse direction (trace the
                # face to the left of the walk)
                ns = adj2[v]
                ang_in = math.atan2(u[1] - v[1], u[0] - v[0])
                best = None
                best_d = None
                for w in ns:
                    if w == u and len(ns) > 1:
                        pass  # allowed only as last resort (dead end)
                    ang = math.atan2(w[1] - v[1], w[0] - v[0])
                    d = (ang_in - ang) % (2 * math.pi)
                    if d == 0:
                        d = 2 * math.pi  # going straight back is last choice
                    if best_d is None or d < best_d:
                        best_d = d
                        best = w
                cur = (v, best)
            # close the ring at the start vertex
            if ring and cur == he:
                xy = np.asarray(ring + [ring[0]], dtype=np.float64)
                x, y = xy[:-1, 0], xy[:-1, 1]
                area2 = float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
                if area2 > 0:
                    ccw.append(xy)
                elif area2 < 0:
                    cw.append(xy)
    return ccw, cw, sorted(dangles)


def polygonize(ga: GeomArray) -> GeomArray:
    """GEOMETRYCOLLECTION of polygons per input row
    (constructive.py:530-581; one output per input geometry — the
    engine treats each row's linework independently; concatenate rows
    upstream to polygonize across rows)."""
    b = _Builder()
    for i in range(len(ga)):
        sub = _one_geom(ga, i)
        segs = _collect_segments(sub)
        ccw, _, _ = _trace_faces(segs)
        b.types.append(GEOMETRYCOLLECTION)
        for ring in ccw:
            b.add_part(i, PK_SHELL, b.poly_counter, ring)
            b.poly_counter += 1
        b.has_z.append(False)
        b.num_children.append(len(ccw))
    return b.finish()


def polygonize_full(ga: GeomArray):
    """(polygons, cut_edges, dangles) per row — the reference's
    polygonize_full minus 'invalid rings' (our tracer cannot produce
    them from noded input); cut edges = kept edges bordering no CCW
    face."""
    polys = _Builder()
    cuts = _Builder()
    dang = _Builder()
    for i in range(len(ga)):
        sub = _one_geom(ga, i)
        segs = _collect_segments(sub)
        ccw, cw, dangles = _trace_faces(segs)
        used = set()
        for ring in ccw:
            for k in range(len(ring) - 1):
                a = tuple(ring[k])
                b2 = tuple(ring[k + 1])
                used.add((a, b2) if a < b2 else (b2, a))
        live = [
            s
            for s in segs
            if s not in used and s not in set(dangles)
        ]
        polys.types.append(GEOMETRYCOLLECTION)
        for ring in ccw:
            polys.add_part(i, PK_SHELL, polys.poly_counter, ring)
            polys.poly_counter += 1
        polys.has_z.append(False)
        polys.num_children.append(len(ccw))
        for builder, edge_list in ((cuts, live), (dang, dangles)):
            builder.types.append(MULTILINESTRING)
            for a, b2 in edge_list:
                builder.add_part(
                    i, PK_LINE, builder.sub_counter,
                    np.asarray([a, b2], dtype=np.float64),
                )
                builder.sub_counter += 1
            builder.has_z.append(False)
            builder.num_children.append(len(edge_list))
    return polys.finish(), cuts.finish(), dang.finish()


def _one_geom(ga: GeomArray, i: int) -> GeomArray:
    from rayspatial.geom.setops import _slice_rows

    return _slice_rows(ga, [i])
