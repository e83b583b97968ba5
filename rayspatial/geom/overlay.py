"""General polygon overlay (union / intersection / difference /
symmetric difference of arbitrary polygons) — the reference's
YY_Y GEOS overlay ops (set_operations.py:22-332), built face-first:

1. NODE: every boundary segment of both inputs is split at every
   pairwise intersection (crossings, T-junctions, collinear overlaps),
   so segments meet only at endpoints.
2. TRACE: the noded planar graph is polygonized into atomic faces
   (geom/polygonize machinery — sharpest-CCW-turn walk).
3. CLASSIFY: each face gets a representative interior point
   (mid-height scanline midpoint) tested even-odd against each input;
   the boolean op keeps faces by (in_a, in_b).
4. ASSEMBLE: kept faces that are holes of kept regions stay as holes
   (a kept face containing an unkept face that contains nothing kept
   simply isn't traced — the even-odd classification handles nesting).

Robustness notes: all coordinates snap to a 1e-9 grid BEFORE noding
(sub-grid noise collapses first, or near-collinear edges would become
exactly-collinear overlaps after split decisions were made); split
points are shared float-identical between the segments they cut; all
classification probes offset a QUARTER grid step and test even-odd
against the noded tagged segment graph itself — never the original
rings, which can sit up to a full step away from the snapped segments.
Features thinner than the snap grid are collapsed by design.  Verified
against inclusion-exclusion identities, the exact box/convex paths and
hypothesis-generated float32-noise inputs.
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    MULTIPOLYGON,
    PK_HOLE,
    PK_SHELL,
    POLYGON,
    GeomArray,
    _Builder,
)

__all__ = ["overlay_rings", "polygon_overlay", "make_valid_rings"]

_SNAP = 1e-9


def _snap(v: np.ndarray) -> np.ndarray:
    return np.round(v / _SNAP) * _SNAP


def _seg_intersections(a1, a2, b1, b2) -> list[np.ndarray]:
    """All points where segment [a1,a2] meets [b1,b2] (0, 1, or the two
    overlap endpoints for collinear overlap)."""
    d1 = a2 - a1
    d2 = b2 - b1
    r = b1 - a1
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if denom != 0:
        t = (r[0] * d2[1] - r[1] * d2[0]) / denom
        u = (r[0] * d1[1] - r[1] * d1[0]) / denom
        if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
            return [a1 + np.clip(t, 0.0, 1.0) * d1]
        return []
    # parallel: collinear?
    if abs(r[0] * d1[1] - r[1] * d1[0]) > 1e-12 * max(1.0, np.abs(d1).max()):
        return []
    # collinear overlap: BOTH segments must split at the other's
    # interior endpoints, or the shared run gets different keys per
    # source and loses its multi-source membership tag
    ll = d1 @ d1
    if ll == 0:
        return []
    out = []
    for p in (b1, b2):
        t = ((p - a1) @ d1) / ll
        if -1e-12 <= t <= 1 + 1e-12:
            out.append(a1 + np.clip(t, 0.0, 1.0) * d1)
    ll2 = d2 @ d2
    if ll2 > 0:
        for p in (a1, a2):
            u = ((p - b1) @ d2) / ll2
            if -1e-12 <= u <= 1 + 1e-12:
                out.append(b1 + np.clip(u, 0.0, 1.0) * d2)
    return out


def _node_all(seg_list: list[tuple[np.ndarray, np.ndarray]]):
    """Split every segment at every intersection with every other
    segment.  O(n^2) pairs with bbox prefilter — per-batch scale."""
    n = len(seg_list)
    if n == 0:
        return []
    # snap BEFORE intersecting: sub-grid coordinate noise must collapse
    # first, or nearly-collinear edges become exactly-collinear overlaps
    # AFTER the split decisions were made (untraceable graph)
    A = _snap(np.stack([s[0] for s in seg_list]))
    B = _snap(np.stack([s[1] for s in seg_list]))
    keep = (A != B).any(axis=1)
    A, B = A[keep], B[keep]
    n = len(A)
    if n == 0:
        return []
    lo = np.minimum(A, B)
    hi = np.maximum(A, B)
    cuts: list[list[np.ndarray]] = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            if (lo[i] > hi[j] + 1e-12).any() or (lo[j] > hi[i] + 1e-12).any():
                continue
            for p in _seg_intersections(A[i], B[i], A[j], B[j]):
                cuts[i].append(p)
                cuts[j].append(p)
    out = []
    for i in range(n):
        a, b = A[i], B[i]
        d = b - a
        ll = d @ d
        if ll == 0:
            continue
        # order cut POINTS along the segment and snap the points
        # themselves — recomputing from parameters would give each of
        # the two segments sharing an intersection a slightly different
        # float, tearing the graph at that node
        pts = [a] + cuts[i] + [b]
        ts = [float(np.clip(((p - a) @ d) / ll, 0.0, 1.0)) for p in pts]
        order = np.argsort(ts, kind="stable")
        chain = [_snap(np.asarray(pts[k], dtype=float)) for k in order]
        for k in range(len(chain) - 1):
            p, q = chain[k], chain[k + 1]
            if (p != q).any():
                out.append((tuple(p), tuple(q)))
    # dedupe undirected
    ded = {tuple(sorted(e)) for e in out}
    return sorted(ded)


def _node_all_multi(seg_lists: list[list]):
    """Node the union of several inputs' segment lists and return
    (segs, members): ``members[k]`` is the set of input indices whose
    boundary contains ``segs[k]`` (shared edges carry several).

    All downstream classification runs even-odd against THESE segments
    (filtered by membership) — never against the original rings: split
    points snap off the original lines by up to one grid step, so only
    the noded graph itself is a consistent reference frame for the
    quarter-step probes."""
    tagged = []
    for src, lst in enumerate(seg_lists):
        for a, b in lst:
            tagged.append((np.asarray(a, float), np.asarray(b, float), src))
    if not tagged:
        return [], []
    A = _snap(np.stack([t[0] for t in tagged]))
    B = _snap(np.stack([t[1] for t in tagged]))
    srcs = [t[2] for t in tagged]
    keep = (A != B).any(axis=1)
    A, B = A[keep], B[keep]
    srcs = [srcs[i] for i in np.flatnonzero(keep)]
    n = len(A)
    if n == 0:
        return [], []
    lo = np.minimum(A, B)
    hi = np.maximum(A, B)
    cuts: list[list[np.ndarray]] = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            if (lo[i] > hi[j] + 1e-12).any() or (lo[j] > hi[i] + 1e-12).any():
                continue
            for pt in _seg_intersections(A[i], B[i], A[j], B[j]):
                cuts[i].append(pt)
                cuts[j].append(pt)
    merged: dict[tuple, set] = {}
    for i in range(n):
        a, b = A[i], B[i]
        d = b - a
        ll = d @ d
        if ll == 0:
            continue
        pts = [a] + cuts[i] + [b]
        ts = [float(np.clip(((pt - a) @ d) / ll, 0.0, 1.0)) for pt in pts]
        order = np.argsort(ts, kind="stable")
        chain = [_snap(np.asarray(pts[k], dtype=float)) for k in order]
        for k in range(len(chain) - 1):
            pq, qq = chain[k], chain[k + 1]
            if (pq != qq).any():
                key = tuple(sorted((tuple(pq), tuple(qq))))
                merged.setdefault(key, set()).add(srcs[i])
    segs = sorted(merged)
    return segs, [merged[k] for k in segs]


def _rings_to_segs(rings: list[np.ndarray]):
    segs = []
    for r in rings:
        xy = r if (r[0] == r[-1]).all() else np.vstack([r, r[:1]])
        for k in range(len(xy) - 1):
            if (xy[k] != xy[k + 1]).any():
                segs.append((xy[k].astype(float), xy[k + 1].astype(float)))
    return segs


def _even_odd_inside(pt: np.ndarray, rings: list[np.ndarray]) -> bool:
    """Even-odd point-in-polygon over a ring set (holes included
    naturally)."""
    x, y = pt
    inside = False
    for r in rings:
        xy = r if (r[0] == r[-1]).all() else np.vstack([r, r[:1]])
        x0, y0 = xy[:-1, 0], xy[:-1, 1]
        x1, y1 = xy[1:, 0], xy[1:, 1]
        cond = (y0 <= y) != (y1 <= y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = x0 + (y - y0) * (x1 - x0) / np.where(y1 != y0, y1 - y0, 1.0)
        inside ^= bool((cond & (xs > x)).sum() & 1)
    return inside


def _even_odd_segments(pt: np.ndarray, segs) -> bool:
    """Even-odd crossing parity of a rightward ray against a raw
    segment set (for linework that is closed only in aggregate)."""
    x, y = pt
    cnt = 0
    for a, b in segs:
        y0, y1 = a[1], b[1]
        if (y0 <= y) == (y1 <= y):
            continue
        xs = a[0] + (y - y0) * (b[0] - a[0]) / (y1 - y0)
        if xs > x:
            cnt += 1
    return bool(cnt & 1)


def _face_interior_point(face: np.ndarray) -> np.ndarray:
    """Representative interior point: midpoint of the first interior
    interval of a mid-height scanline (retries nearby heights if the
    line hits vertices)."""
    ys = np.unique(face[:, 1])
    ymin, ymax = ys[0], ys[-1]
    for frac in (0.5, 0.37, 0.61, 0.23, 0.79):
        y = ymin + (ymax - ymin) * frac
        if np.any(np.abs(ys - y) < 1e-12):
            continue
        xy = face if (face[0] == face[-1]).all() else np.vstack([face, face[:1]])
        x0, y0 = xy[:-1, 0], xy[:-1, 1]
        x1, y1 = xy[1:, 0], xy[1:, 1]
        cond = (y0 <= y) != (y1 <= y)
        if not cond.any():
            continue
        xs = np.sort(
            x0[cond] + (y - y0[cond]) * (x1[cond] - x0[cond]) / (y1[cond] - y0[cond])
        )
        if len(xs) >= 2:
            return np.array([(xs[0] + xs[1]) / 2.0, y])
    return face[:-1].mean(axis=0)  # fallback: vertex centroid


def _geom_rings(ga: GeomArray, i: int) -> list[np.ndarray]:
    return [
        ga.part_coords(p)
        for p in np.flatnonzero(ga.part_geom == i)
        if ga.part_kind[p] in (PK_SHELL, PK_HOLE)
    ]


def _ring_area(face: np.ndarray) -> float:
    x, y = face[:-1, 0], face[:-1, 1]
    return abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0


def _result_boundary_segs(segs, inside_fn):
    """Keep only segments on the BOUNDARY of the result region: probe a
    point just left and just right of each segment midpoint; a segment
    whose sides classify equally is interior (or exterior) to the
    result and is dropped — this is what dissolves shared edges of
    adjacent kept faces."""
    out = []
    for a, b in segs:
        a = np.asarray(a, dtype=float)
        b = np.asarray(b, dtype=float)
        e = b - a
        ln = np.hypot(e[0], e[1])
        if ln == 0:
            continue
        nrm = np.array([-e[1], e[0]]) / ln
        mid = (a + b) / 2.0
        # probe strictly INSIDE one snap-grid step: post-snap features
        # are >= 1 grid step (1e-9) apart, so a quarter-step offset
        # classifies every surviving sliver correctly (float64 resolves
        # 2.5e-10 for the geographic coordinate range this engine uses)
        eps = _SNAP / 4.0
        left = inside_fn(mid + nrm * eps)
        right = inside_fn(mid - nrm * eps)
        if left != right:
            out.append((tuple(a), tuple(b)))
    return out


def build_face_forest(ccw: list[np.ndarray]):
    """(parent, children) containment forest over traced faces."""
    areas = [_ring_area(f) for f in ccw]
    order = sorted(range(len(ccw)), key=lambda i: areas[i])
    parent = [-1] * len(ccw)
    inner_pt = [_face_interior_point(f) for f in ccw]
    for pos, i in enumerate(order):
        for j in order[pos + 1 :]:
            if areas[j] > areas[i] and _even_odd_inside(inner_pt[i], [ccw[j]]):
                parent[i] = j
                break
    children: dict[int, list[int]] = {i: [] for i in range(len(ccw))}
    for i, pp in enumerate(parent):
        if pp >= 0:
            children[pp].append(i)
    return parent, children


def assemble_faces(ccw: list[np.ndarray], keep: list[bool],
                   parent: list[int]):
    """keep-flags + forest -> [(shell, [holes])]: a ring enters the
    result where its keep differs from its parent's (outside = False);
    kept boundary rings are shells, unkept ones holes of the nearest
    kept ancestor."""
    def parent_keep(i: int) -> bool:
        return keep[parent[i]] if parent[i] >= 0 else False

    shells = [i for i in range(len(ccw)) if keep[i] and not parent_keep(i)]
    holes = [i for i in range(len(ccw)) if not keep[i] and parent_keep(i)]
    shells_set = set(shells)

    def nearest_shell(i: int) -> int:
        p = parent[i]
        while p >= 0:
            if p in shells_set:
                return p
            p = parent[p]
        return -1

    hole_map: dict[int, list[np.ndarray]] = {s: [] for s in shells}
    for h in holes:
        s = nearest_shell(h)
        if s >= 0:
            hole_map[s].append(ccw[h][::-1])  # holes wound CW
    return [(ccw[s], hole_map[s]) for s in shells]


def _edge_offset_point(face: np.ndarray, children: list[np.ndarray]):
    """Point inside the face's EFFECTIVE region (face minus nested
    children): offset inward from an edge midpoint.  Disconnected
    nested components never touch this face's boundary (shared
    boundaries were noded into the same component), so a small enough
    offset lands in the effective region."""
    xy = face if (face[0] == face[-1]).all() else np.vstack([face, face[:1]])
    scale = max(np.ptp(xy[:, 0]), np.ptp(xy[:, 1]), 1e-9)
    for k in range(len(xy) - 1):
        a, b = xy[k], xy[k + 1]
        e = b - a
        ln = np.hypot(e[0], e[1])
        if ln == 0:
            continue
        nrm = np.array([-e[1], e[0]]) / ln  # inward for CCW
        mid = (a + b) / 2.0
        for eps in (1e-7, 1e-9, 1e-5):
            p = mid + nrm * eps * scale
            if not _even_odd_inside(p, [face]):
                continue
            if any(_even_odd_inside(p, [c]) for c in children):
                continue
            return p
    return _face_interior_point(face)  # fallback


def overlay_rings(rings_a: list[np.ndarray], rings_b: list[np.ndarray],
                  op: str) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Core overlay: -> list of (shell_ring, hole_rings) of the result.

    op in {union, intersection, difference, symmetric_difference}.

    Faces from disconnected components NEST (a traced face covers any
    component floating inside it), so faces are organised into a
    containment forest; each face's EFFECTIVE region (face minus direct
    children) is classified via a boundary-offset interior point, and a
    ring enters the result exactly when its keep-flag differs from its
    parent's — as a shell when kept, as a hole of the nearest kept
    ancestor otherwise."""
    from rayspatial.geom.polygonize import _trace_faces

    segs, members = _node_all_multi(
        [_rings_to_segs(rings_a), _rings_to_segs(rings_b)]
    )
    keep_fn = {
        "union": lambda a, b: a or b,
        "intersection": lambda a, b: a and b,
        "difference": lambda a, b: a and not b,
        "symmetric_difference": lambda a, b: a != b,
    }[op]
    segs_np = [(np.asarray(a), np.asarray(b)) for a, b in segs]
    segs_a = [segs_np[k] for k in range(len(segs)) if 0 in members[k]]
    segs_b = [segs_np[k] for k in range(len(segs)) if 1 in members[k]]

    def inside_result(p):
        return keep_fn(
            _even_odd_segments(p, segs_a), _even_odd_segments(p, segs_b)
        )

    # drop interior/exterior segments FIRST: adjacent kept faces merge
    # (dissolved output, not coverage form)
    segs = _result_boundary_segs(segs, inside_result)
    ccw, _, _ = _trace_faces(segs)
    if not ccw:
        return []
    parent, children = build_face_forest(ccw)
    keep = []
    for i, f in enumerate(ccw):
        p = _edge_offset_point(f, [ccw[c] for c in children[i]])
        keep.append(inside_result(p))
    return assemble_faces(ccw, keep, parent)


def polygon_overlay(ga: GeomArray, gb: GeomArray, op: str) -> GeomArray:
    """Pairwise general overlay -> (MULTI)POLYGON per row (coverage
    form: result regions are tiled by atomic faces; dissolve is
    representation-level, area/predicates are exact)."""
    b = _Builder()
    n = max(len(ga), len(gb))
    for g in range(n):
        i, j = min(g, len(ga) - 1), min(g, len(gb) - 1)
        polys = overlay_rings(_geom_rings(ga, i), _geom_rings(gb, j), op)
        if not polys:
            b.types.append(POLYGON)
            b.has_z.append(False)
            b.num_children.append(0)
            continue
        b.types.append(POLYGON if len(polys) == 1 else MULTIPOLYGON)
        for shell, holes in polys:
            pid = b.poly_counter
            b.poly_counter += 1
            b.add_part(g, PK_SHELL, pid, shell)
            for h in holes:
                b.add_part(g, PK_HOLE, pid, h)
        b.num_children.append(len(polys))
        b.has_z.append(False)
    return b.finish()


def make_valid_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """make_valid for self-intersecting ring sets (reference
    constructive.py:463-481): node the boundary, polygonize, keep faces
    whose interior point is inside by the even-odd rule (the GEOS
    'structure' method semantics for bow-ties)."""
    from rayspatial.geom.polygonize import _trace_faces

    segs, _ = _node_all_multi([_rings_to_segs(rings)])
    segs_np = [(np.asarray(a), np.asarray(b)) for a, b in segs]

    def inside(p):
        return _even_odd_segments(p, segs_np)

    bsegs = _result_boundary_segs(segs, inside)
    ccw, _, _ = _trace_faces(bsegs)
    out = []
    for face in ccw:
        pt = _edge_offset_point(face, [])
        if inside(pt):
            out.append(face)
    return out


def nary_union(ga: GeomArray) -> GeomArray:
    """Union of ALL polygon rows into one geometry (the overlapping
    path of set_operations.union_all): node every boundary at once,
    keep faces inside ANY input geometry (per-geometry even-odd, so
    overlapping inputs don't cancel)."""
    from rayspatial.geom.polygonize import _trace_faces

    per_geom = [
        _geom_rings(ga, i)
        for i in range(len(ga))
        if ga.types[i] in (POLYGON, MULTIPOLYGON)
    ]
    per_geom = [r for r in per_geom if r]
    segs, members = _node_all_multi([_rings_to_segs(r) for r in per_geom])
    segs_np = [(np.asarray(a), np.asarray(b)) for a, b in segs]
    per_src = [
        [segs_np[k] for k in range(len(segs)) if src in members[k]]
        for src in range(len(per_geom))
    ]

    def inside_result(p):
        return any(_even_odd_segments(p, sl) for sl in per_src)

    segs = _result_boundary_segs(segs, inside_result)
    ccw, _, _ = _trace_faces(segs)
    b = _Builder()
    if not ccw:
        b.types.append(POLYGON)
        b.has_z.append(False)
        b.num_children.append(0)
        return b.finish()
    parent, children = build_face_forest(ccw)
    keep = []
    for i, f in enumerate(ccw):
        p = _edge_offset_point(f, [ccw[c] for c in children[i]])
        keep.append(inside_result(p))
    polys = assemble_faces(ccw, keep, parent)
    b.types.append(POLYGON if len(polys) == 1 else MULTIPOLYGON)
    for shell, holes in polys:
        pid = b.poly_counter
        b.poly_counter += 1
        b.add_part(0, PK_SHELL, pid, shell)
        for hring in holes:
            b.add_part(0, PK_HOLE, pid, hring)
    b.has_z.append(False)
    b.num_children.append(len(polys))
    return b.finish()
