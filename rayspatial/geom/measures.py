"""Measurement kernels (reference pygeos/measurement.py).

All vectorized numpy over :class:`GeomArray`.  Missing-value semantics
copied from the reference: Y_d loops write NaN for missing input
(src/ufuncs.c:981-1030); ``bounds`` writes NaN rows (ufuncs.c:2515-2607);
``total_bounds`` is nanmin/nanmax over bounds (measurement.py:106-148).
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    MISSING,
    PK_HOLE,
    PK_LINE,
    PK_POINT,
    PK_SHELL,
    GeomArray,
)

__all__ = [
    "area",
    "length",
    "bounds",
    "total_bounds",
    "distance",
    "hausdorff_distance",
    "minimum_bounding_radius",
]


def _ring_signed_area2(xy: np.ndarray) -> float:
    """Twice the signed shoelace area of one ring (CCW positive)."""
    x = xy[:, 0]
    y = xy[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _per_part_segment_sums(ga: GeomArray, values: np.ndarray) -> np.ndarray:
    """Sum ``values`` (one per coordinate-pair edge, i.e. len = nc-1,
    aligned with coords[i]..coords[i+1]) within each part; entries that
    straddle a part boundary are excluded.  Returns (n_parts,) sums.
    Fully vectorized (np.add.reduceat)."""
    n_parts = ga.n_parts
    if n_parts == 0 or len(values) == 0:
        return np.zeros(n_parts)
    starts = ga.part_off[:-1]
    ends = ga.part_off[1:]
    # cumulative sum trick: sum over [start, end-1) = cs[end-1] - cs[start]
    cs = np.concatenate([[0.0], np.cumsum(values)])
    lo = starts
    hi = np.maximum(ends - 1, starts)
    return cs[hi] - cs[lo]


def area(ga: GeomArray) -> np.ndarray:
    """Polygon area per geometry (reference measurement.py:23-46).

    Shoelace per ring (rings are closed, first==last, so the open-chain
    cross sum equals twice the signed area); shells add, holes subtract;
    points/lines -> 0; missing -> NaN.  Vectorized via reduceat."""
    out = np.zeros(len(ga), dtype=np.float64)
    if ga.n_parts:
        x = ga.coords[:, 0]
        y = ga.coords[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        part_area2 = _per_part_segment_sums(ga, cross)
        is_ring = (ga.part_kind == PK_SHELL) | (ga.part_kind == PK_HOLE)
        sign = np.where(ga.part_kind == PK_SHELL, 0.5, -0.5)
        contrib = np.where(is_ring, np.abs(part_area2) * sign, 0.0)
        np.add.at(out, ga.part_geom, contrib)
    out[ga.types == MISSING] = np.nan
    return out


def length(ga: GeomArray) -> np.ndarray:
    """Line length / polygon perimeter (reference measurement.py:152-177).
    Points -> 0; missing -> NaN.  Vectorized."""
    out = np.zeros(len(ga), dtype=np.float64)
    if ga.n_parts:
        seg = np.diff(ga.coords, axis=0)
        seglen = np.hypot(seg[:, 0], seg[:, 1])
        part_len = _per_part_segment_sums(ga, seglen)
        part_len = np.where(ga.part_kind == PK_POINT, 0.0, part_len)
        np.add.at(out, ga.part_geom, part_len)
    out[ga.types == MISSING] = np.nan
    return out


def bounds(ga: GeomArray) -> np.ndarray:
    """(n, 4) [xmin, ymin, xmax, ymax]; NaN for missing/empty."""
    return ga.bounds()


def total_bounds(ga: GeomArray) -> np.ndarray:
    """nanmin/nanmax over bounds -> (4,) (reference measurement.py:106-148).

    At engine scale this is the per-block partial of the AGG reduction —
    merge partials with elementwise min/max."""
    b = ga.bounds()
    if len(b) == 0 or np.isnan(b).all():
        return np.asarray([np.nan, np.nan, np.nan, np.nan])
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        return np.asarray(
            [
                np.nanmin(b[:, 0]),
                np.nanmin(b[:, 1]),
                np.nanmax(b[:, 2]),
                np.nanmax(b[:, 3]),
            ]
        )


# ---------------------------------------------------------------------------
# distance machinery (shared with predicates / kNN)


def _pt_seg_dist2(px, py, ax, ay, bx, by):
    """Squared distance from points (px,py) to segments (a,b); all
    broadcastable numpy arrays."""
    dx = bx - ax
    dy = by - ay
    ll = dx * dx + dy * dy
    t = np.where(ll > 0, ((px - ax) * dx + (py - ay) * dy) / np.where(ll > 0, ll, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    qx = ax + t * dx
    qy = ay + t * dy
    return (px - qx) ** 2 + (py - qy) ** 2


def _geom_segments(ga: GeomArray, i: int):
    """All segments (a, b) of geometry i's line/ring parts, plus its
    standalone points; returns (pts (k,2), seg_a (m,2), seg_b (m,2))."""
    pts = []
    seg_a = []
    seg_b = []
    for p in range(ga.n_parts):
        if ga.part_geom[p] != i:
            continue
        xy = ga.part_coords(p)
        if ga.part_kind[p] == PK_POINT:
            pts.append(xy)
        else:
            if len(xy) >= 2:
                seg_a.append(xy[:-1])
                seg_b.append(xy[1:])
            else:
                pts.append(xy)
    cat = lambda lst: (
        np.concatenate(lst, axis=0) if lst else np.empty((0, 2), dtype=np.float64)
    )
    return cat(pts), cat(seg_a), cat(seg_b)


def _geom_dist(ga: GeomArray, i: int, gb: GeomArray, j: int) -> float:
    """Min distance between geometry ga[i] and gb[j] (0 if intersecting)."""
    from rayspatial.geom import predicates as P

    pa, sa1, sa2 = _geom_segments(ga, i)
    pb, sb1, sb2 = _geom_segments(gb, j)
    if (len(pa) + len(sa1)) == 0 or (len(pb) + len(sb1)) == 0:
        return np.nan  # empty
    if P._pair_intersects(ga, i, gb, j):
        return 0.0
    best = np.inf
    if len(pa) and len(pb):
        d = (pa[:, None, 0] - pb[None, :, 0]) ** 2 + (pa[:, None, 1] - pb[None, :, 1]) ** 2
        best = min(best, float(d.min()))
    if len(pa) and len(sb1):
        d = _pt_seg_dist2(pa[:, None, 0], pa[:, None, 1], sb1[None, :, 0], sb1[None, :, 1], sb2[None, :, 0], sb2[None, :, 1])
        best = min(best, float(d.min()))
    if len(pb) and len(sa1):
        d = _pt_seg_dist2(pb[:, None, 0], pb[:, None, 1], sa1[None, :, 0], sa1[None, :, 1], sa2[None, :, 0], sa2[None, :, 1])
        best = min(best, float(d.min()))
    if len(sa1) and len(sb1):
        for p in (sa1, sa2):
            d = _pt_seg_dist2(p[:, None, 0], p[:, None, 1], sb1[None, :, 0], sb1[None, :, 1], sb2[None, :, 0], sb2[None, :, 1])
            best = min(best, float(d.min()))
        for p in (sb1, sb2):
            d = _pt_seg_dist2(p[:, None, 0], p[:, None, 1], sa1[None, :, 0], sa1[None, :, 1], sa2[None, :, 0], sa2[None, :, 1])
            best = min(best, float(d.min()))
    return float(np.sqrt(best))


def _seg_seg_intersection(a1, a2, b1, b2):
    """One intersection point of segments [a1,a2] x [b1,b2] or None."""
    d1 = a2 - a1
    d2 = b2 - b1
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if denom == 0:
        return None
    t = ((b1[0] - a1[0]) * d2[1] - (b1[1] - a1[1]) * d2[0]) / denom
    u = ((b1[0] - a1[0]) * d1[1] - (b1[1] - a1[1]) * d1[0]) / denom
    if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
        return a1 + np.clip(t, 0, 1) * d1
    return None


def _closest_points(ga: GeomArray, i: int, gb: GeomArray, j: int):
    """(pa, pb): closest point pair between the two geometries (used by
    shortest_line, reference linear.py:144-171); (None, None) when
    either side is missing/empty.  For intersecting pairs both points
    coincide at a witness of the intersection."""
    from rayspatial.geom import predicates as P

    pa, sa1, sa2 = _geom_segments(ga, i)
    pb, sb1, sb2 = _geom_segments(gb, j)
    if (len(pa) + len(sa1)) == 0 or (len(pb) + len(sb1)) == 0:
        return None, None
    if P._pair_intersects(ga, i, gb, j):
        # witness: a vertex of one inside/on the other, else a segment
        # crossing point
        va = np.vstack([pa, sa1, sa2]) if len(sa1) else pa
        for v in va:
            sub = _slice_single_point(v)
            if P._pair_intersects(sub, 0, gb, j):
                return v.copy(), v.copy()
        vb = np.vstack([pb, sb1, sb2]) if len(sb1) else pb
        for v in vb:
            sub = _slice_single_point(v)
            if P._pair_intersects(ga, i, sub, 0):
                return v.copy(), v.copy()
        for k in range(len(sa1)):
            for m in range(len(sb1)):
                w = _seg_seg_intersection(sa1[k], sa2[k], sb1[m], sb2[m])
                if w is not None:
                    return w.copy(), w.copy()
        # fallback (shouldn't happen): bbox overlap center
        c = (ga.bounds()[i, :2] + gb.bounds()[j, 2:]) / 2.0
        return c, c.copy()

    best = np.inf
    out_a = out_b = None

    def upd(d2, qa, qb):
        nonlocal best, out_a, out_b
        if d2 < best:
            best, out_a, out_b = d2, qa, qb

    if len(pa) and len(pb):
        d = (pa[:, None, 0] - pb[None, :, 0]) ** 2 + (pa[:, None, 1] - pb[None, :, 1]) ** 2
        k = np.unravel_index(np.argmin(d), d.shape)
        upd(float(d[k]), pa[k[0]].copy(), pb[k[1]].copy())
    def pt_vs_segs(pts, s1, s2, swap):
        for p in pts:
            dx = s2[:, 0] - s1[:, 0]
            dy = s2[:, 1] - s1[:, 1]
            ll = dx * dx + dy * dy
            t = np.where(ll > 0, ((p[0] - s1[:, 0]) * dx + (p[1] - s1[:, 1]) * dy) / np.where(ll > 0, ll, 1.0), 0.0)
            t = np.clip(t, 0.0, 1.0)
            qx = s1[:, 0] + t * dx
            qy = s1[:, 1] + t * dy
            d2 = (p[0] - qx) ** 2 + (p[1] - qy) ** 2
            m = int(np.argmin(d2))
            q = np.array([qx[m], qy[m]])
            if swap:
                upd(float(d2[m]), q, p.copy())
            else:
                upd(float(d2[m]), p.copy(), q)

    if len(pa) and len(sb1):
        pt_vs_segs(pa, sb1, sb2, swap=False)
    if len(pb) and len(sa1):
        pt_vs_segs(pb, sa1, sa2, swap=True)
    if len(sa1) and len(sb1):
        for p in np.vstack([sa1, sa2]):
            pt_vs_segs(p[None, :], sb1, sb2, swap=False)
        for p in np.vstack([sb1, sb2]):
            pt_vs_segs(p[None, :], sa1, sa2, swap=True)
    return out_a, out_b


def _slice_single_point(v: np.ndarray) -> GeomArray:
    from rayspatial.geom.array import PK_POINT as _PKP

    return GeomArray(
        types=np.array([0], dtype=np.int8),
        part_geom=np.array([0], dtype=np.int64),
        part_kind=np.array([_PKP], dtype=np.int8),
        part_sub=np.array([0], dtype=np.int64),
        part_off=np.array([0, 1], dtype=np.int64),
        coords=v.reshape(1, 2).astype(np.float64),
    )


def distance(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """Pairwise distance (reference measurement.py:48-74); missing or
    empty -> NaN.  Fast path when both sides are all single points."""
    n = len(ga)
    assert len(gb) == n, "distance: length mismatch (broadcast upstream)"
    # fast path: every geometry is exactly one point part
    if (
        ga.n_parts == n
        and gb.n_parts == n
        and (ga.part_kind == PK_POINT).all()
        and (gb.part_kind == PK_POINT).all()
        and (ga.part_geom == np.arange(n)).all()
        and (gb.part_geom == np.arange(n)).all()
    ):
        d = np.hypot(
            ga.coords[:, 0] - gb.coords[:, 0], ga.coords[:, 1] - gb.coords[:, 1]
        )
        return d
    out = np.empty(n, dtype=np.float64)
    ma = ga.is_missing() | ga.is_empty()
    mb = gb.is_missing() | gb.is_empty()
    for i in range(n):
        out[i] = np.nan if (ma[i] or mb[i]) else _geom_dist(ga, i, gb, i)
    return out


def _densify_chain(xy: np.ndarray, densify: float) -> np.ndarray:
    """Insert ceil(1/densify)-1 evenly spaced points per segment (the
    GEOS densifyFrac refinement; 0 < densify <= 1)."""
    k = int(np.ceil(1.0 / densify))
    if k <= 1 or len(xy) < 2:
        return xy
    a, b = xy[:-1], xy[1:]
    t = np.arange(k) / k  # [0, 1) fractions; endpoint comes from next a
    pts = a[:, None, :] + t[None, :, None] * (b - a)[:, None, :]
    return np.vstack([pts.reshape(-1, 2), xy[-1:]])


def hausdorff_distance(ga: GeomArray, gb: GeomArray,
                       densify: float | None = None) -> np.ndarray:
    """Discrete Hausdorff distance (vertex-to-geometry, the JTS/GEOS
    DiscreteHausdorffDistance algorithm; reference measurement.py:179-216).
    ``densify`` in (0, 1] refines the approximation by splitting each
    segment into ceil(1/densify) pieces before the vertex sweep."""
    if densify is not None and not (0.0 < densify <= 1.0):
        raise ValueError("densify must be in the range (0, 1]")
    n = len(ga)
    out = np.empty(n, dtype=np.float64)
    ma = ga.is_missing() | ga.is_empty()
    mb = gb.is_missing() | gb.is_empty()

    def directed(src: GeomArray, i: int, dst: GeomArray, j: int) -> float:
        pa, sa1, sa2 = _geom_segments(src, i)
        verts = np.concatenate([pa, sa1, sa2[-1:] if len(sa2) else np.empty((0, 2))])
        if densify is not None and len(sa1):
            k = int(np.ceil(1.0 / densify))
            t = np.arange(1, k) / k
            mids = sa1[:, None, :] + t[None, :, None] * (sa2 - sa1)[:, None, :]
            verts = np.vstack([verts, mids.reshape(-1, 2)])
        pb, sb1, sb2 = _geom_segments(dst, j)
        best = 0.0
        for v in verts:
            d = np.inf
            if len(pb):
                d = min(d, float((((pb - v) ** 2).sum(axis=1)).min()))
            if len(sb1):
                d = min(
                    d,
                    float(
                        _pt_seg_dist2(v[0], v[1], sb1[:, 0], sb1[:, 1], sb2[:, 0], sb2[:, 1]).min()
                    ),
                )
            best = max(best, d)
        return best

    for i in range(n):
        if ma[i] or mb[i]:
            out[i] = np.nan
        else:
            out[i] = np.sqrt(max(directed(ga, i, gb, i), directed(gb, i, ga, i)))
    return out


def frechet_distance(ga: GeomArray, gb: GeomArray,
                     densify: float | None = None) -> np.ndarray:
    """Discrete Frechet distance between vertex chains (reference
    measurement.py:218-258; GEOS >= 3.7 discrete algorithm).  NaN for
    missing/empty or non-lineal inputs without vertices.  ``densify``
    refines each chain by splitting segments into ceil(1/densify)
    pieces first."""
    if densify is not None and not (0.0 < densify <= 1.0):
        raise ValueError("densify must be in the range (0, 1]")
    n = len(ga)
    out = np.full(n, np.nan)
    ma = ga.is_missing() | ga.is_empty()
    mb = gb.is_missing() | gb.is_empty()
    for i in range(n):
        j = min(i, len(gb) - 1)
        if ma[i] or mb[j]:
            continue
        va = _geom_vertices(ga, i)
        vb = _geom_vertices(gb, j)
        if not len(va) or not len(vb):
            continue
        if densify is not None:
            va = _densify_chain(va, densify)
            vb = _densify_chain(vb, densify)
        # dynamic program over the coupling (classic discrete Frechet)
        d = np.hypot(va[:, None, 0] - vb[None, :, 0], va[:, None, 1] - vb[None, :, 1])
        ca = np.empty_like(d)
        ca[0, 0] = d[0, 0]
        for q in range(1, d.shape[1]):
            ca[0, q] = max(ca[0, q - 1], d[0, q])
        for p_ in range(1, d.shape[0]):
            ca[p_, 0] = max(ca[p_ - 1, 0], d[p_, 0])
            prev_row = ca[p_ - 1]
            row = ca[p_]
            for q in range(1, d.shape[1]):
                row[q] = max(min(prev_row[q], prev_row[q - 1], row[q - 1]), d[p_, q])
        out[i] = ca[-1, -1]
    return out


def minimum_clearance(ga: GeomArray) -> np.ndarray:
    """Minimum clearance (reference measurement.py:260-289): smallest
    distance between a vertex and a non-incident vertex/segment —
    moving any vertex less than this cannot change topology.  inf for
    point-only geometries (GEOS convention), NaN for missing/empty."""
    n = len(ga)
    out = np.full(n, np.nan)
    miss = ga.is_missing() | ga.is_empty()
    for i in range(n):
        if miss[i]:
            continue
        pts_, s1, s2 = _geom_segments(ga, i)
        verts = np.vstack([pts_, s1, s2]) if len(s1) else pts_
        verts = np.unique(verts, axis=0)
        best = np.inf
        if len(verts) > 1:
            dv = np.hypot(
                verts[:, None, 0] - verts[None, :, 0],
                verts[:, None, 1] - verts[None, :, 1],
            )
            dv[dv == 0] = np.inf
            best = float(dv.min())
        for k in range(len(s1)):
            a, bseg = s1[k], s2[k]
            mask = ~(
                ((verts == a).all(axis=1)) | ((verts == bseg).all(axis=1))
            )
            vv = verts[mask]
            if len(vv):
                d2 = _pt_seg_dist2(vv[:, 0], vv[:, 1], a[0], a[1], bseg[0], bseg[1])
                m = float(np.sqrt(d2.min()))
                if m > 0:
                    best = min(best, m)
        out[i] = best
    return out


def minimum_bounding_radius(ga: GeomArray) -> np.ndarray:
    """Radius of the minimum bounding circle (reference
    measurement.py:290-322).  Welzl's algorithm over geometry vertices."""
    out = np.empty(len(ga), dtype=np.float64)
    counts = ga.coord_counts()
    b = ga.bounds()
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            out[i] = np.nan
        elif counts[i] == 0:
            out[i] = 0.0 if ga.types[i] != MISSING else np.nan
        else:
            pts = _geom_vertices(ga, i)
            cx, cy, r2 = _welzl_circle(pts)
            out[i] = np.sqrt(r2)
    return out


def _geom_vertices(ga: GeomArray, i: int) -> np.ndarray:
    sel = ga.part_geom == i
    chunks = [ga.part_coords(p) for p in np.flatnonzero(sel)]
    return np.concatenate(chunks, axis=0) if chunks else np.empty((0, 2))


def _welzl_circle(pts: np.ndarray) -> tuple[float, float, float]:
    """Minimum enclosing circle via the deterministic two-pass heuristic +
    exact refinement (Ritter seed, then exact check over support points).
    Returns (cx, cy, r^2)."""
    # exact small-set solver over convex hull points (n usually small)
    from itertools import combinations

    uniq = np.unique(pts, axis=0)
    if len(uniq) == 1:
        return float(uniq[0, 0]), float(uniq[0, 1]), 0.0

    def circle_2(a, b):
        c = (a + b) / 2.0
        r2 = ((a - c) ** 2).sum()
        return c[0], c[1], r2

    def circle_3(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if abs(d) < 1e-30:
            return None
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        return ux, uy, r2

    def covers_all(cx, cy, r2):
        return bool((((uniq[:, 0] - cx) ** 2 + (uniq[:, 1] - cy) ** 2) <= r2 * (1 + 1e-12) + 1e-24).all())

    # reduce to hull for efficiency
    from rayspatial.geom.constructive import _convex_hull_pts

    hull = _convex_hull_pts(uniq)
    best = None
    for a, b in combinations(range(len(hull)), 2):
        cx, cy, r2 = circle_2(hull[a], hull[b])
        if covers_all(cx, cy, r2) and (best is None or r2 < best[2]):
            best = (cx, cy, r2)
    if best is not None:
        return best
    for a, b, c in combinations(range(len(hull)), 3):
        res = circle_3(hull[a], hull[b], hull[c])
        if res is None:
            continue
        cx, cy, r2 = res
        if covers_all(cx, cy, r2) and (best is None or r2 < best[2]):
            best = (cx, cy, r2)
    return best if best is not None else (float(uniq[0, 0]), float(uniq[0, 1]), 0.0)
