"""Linear referencing (reference pygeos/linear.py).

Vectorized over the GeomArray part layout; operates on LINESTRING /
LINEARRING / MULTILINESTRING rows, missing/other types follow the
reference's conventions (None result / NaN distance).
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    LINEARRING,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    PK_LINE,
    GeomArray,
    _Builder,
)

__all__ = [
    "line_interpolate_point",
    "line_locate_point",
    "line_merge",
    "offset_curve",
    "shared_paths",
    "shortest_line",
]

_LINE_TYPES = (LINESTRING, LINEARRING, MULTILINESTRING)


def _line_parts(ga: GeomArray, g: int) -> list[np.ndarray]:
    return [
        ga.part_coords(p)
        for p in np.flatnonzero(ga.part_geom == g)
        if ga.part_kind[p] == PK_LINE
    ]


def _seg_lengths(xy: np.ndarray) -> np.ndarray:
    d = np.diff(xy, axis=0)
    return np.hypot(d[:, 0], d[:, 1])


def line_interpolate_point(ga: GeomArray, distance, normalized: bool = False) -> GeomArray:
    """Point at ``distance`` along each line (linear.py:15-54);
    negative distances measure from the end; clamped to the line."""
    from rayspatial.geom.creation import points

    dist = np.broadcast_to(np.asarray(distance, dtype=np.float64), len(ga))
    xy_out = np.full((len(ga), 2), np.nan)
    for g in range(len(ga)):
        if ga.types[g] not in _LINE_TYPES:
            continue
        parts = _line_parts(ga, g)
        if not parts:
            continue
        xy = np.vstack(parts)  # multilines treated as one chain
        seg = _seg_lengths(xy)
        total = seg.sum()
        d = dist[g] * total if normalized else dist[g]
        if d < 0:
            d = total + d
        d = min(max(d, 0.0), total)
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        i = int(np.searchsorted(cum, d, side="right") - 1)
        i = min(i, len(seg) - 1)
        t = 0.0 if seg[i] == 0 else (d - cum[i]) / seg[i]
        xy_out[g] = xy[i] + t * (xy[i + 1] - xy[i])
    return points(xy_out)


def line_locate_point(ga: GeomArray, pts: GeomArray, normalized: bool = False) -> np.ndarray:
    """Distance along each line to the projection of the point
    (linear.py:55-90); NaN for non-lines/missing."""
    from rayspatial.geom.strtree import _point_coords

    px, py = _point_coords(pts)
    out = np.full(len(ga), np.nan)
    for g in range(len(ga)):
        if ga.types[g] not in _LINE_TYPES or np.isnan(px[g]):
            continue
        parts = _line_parts(ga, g)
        if not parts:
            continue
        xy = np.vstack(parts)
        a = xy[:-1]
        b = xy[1:]
        ab = b - a
        ab2 = (ab * ab).sum(axis=1)
        ap = np.column_stack([px[g] - a[:, 0], py[g] - a[:, 1]])
        t = np.where(ab2 > 0, (ap * ab).sum(axis=1) / np.where(ab2 > 0, ab2, 1), 0.0)
        t = np.clip(t, 0.0, 1.0)
        proj = a + t[:, None] * ab
        d2 = (proj[:, 0] - px[g]) ** 2 + (proj[:, 1] - py[g]) ** 2
        seg = np.sqrt(ab2)
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        best = int(np.argmin(d2))
        loc = cum[best] + t[best] * seg[best]
        total = cum[-1]
        out[g] = loc / total if (normalized and total > 0) else loc
    return out


def line_merge(ga: GeomArray) -> GeomArray:
    """Merge MULTILINESTRING parts that share endpoints into maximal
    chains (linear.py:91-114).  Single linestrings pass through."""
    b = _Builder()
    row = 0
    for g in range(len(ga)):
        t = int(ga.types[g])
        if t == MISSING:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
            row += 1
            continue
        parts = [p.copy() for p in _line_parts(ga, g)]
        if t not in _LINE_TYPES or not parts:
            b.types.append(t if t in _LINE_TYPES else ga.types[g])
            b.has_z.append(False)
            b.num_children.append(0)
            row += 1
            continue
        # greedy endpoint chaining
        chains: list[np.ndarray] = []
        rem = parts
        while rem:
            chain = rem.pop(0)
            changed = True
            while changed:
                changed = False
                for i, r in enumerate(rem):
                    if np.array_equal(chain[-1], r[0]):
                        chain = np.vstack([chain, r[1:]])
                    elif np.array_equal(chain[-1], r[-1]):
                        chain = np.vstack([chain, r[::-1][1:]])
                    elif np.array_equal(chain[0], r[-1]):
                        chain = np.vstack([r, chain[1:]])
                    elif np.array_equal(chain[0], r[0]):
                        chain = np.vstack([r[::-1], chain[1:]])
                    else:
                        continue
                    rem.pop(i)
                    changed = True
                    break
            chains.append(chain)
        if len(chains) == 1:
            b.types.append(LINESTRING)
            b.add_part(row, PK_LINE, b.sub_counter, chains[0])
            b.sub_counter += 1
            b.num_children.append(1)
        else:
            b.types.append(MULTILINESTRING)
            for c in chains:
                b.add_part(row, PK_LINE, b.sub_counter, c)
                b.sub_counter += 1
            b.num_children.append(len(chains))
        b.has_z.append(False)
        row += 1
    return b.finish()


def shortest_line(ga: GeomArray, gb: GeomArray) -> GeomArray:
    """LINESTRING between the closest points of each pair
    (linear.py:144-171); missing if either side is missing/empty."""
    from rayspatial.geom import measures as M

    b = _Builder()
    row = 0
    na, nb_ = len(ga), len(gb)
    n = max(na, nb_)
    for g in range(n):
        i, j = min(g, na - 1), min(g, nb_ - 1)
        pa_, pb_ = M._closest_points(ga, i, gb, j)
        if pa_ is None:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
        else:
            b.types.append(LINESTRING)
            b.add_part(row, PK_LINE, b.sub_counter, np.vstack([pa_, pb_]))
            b.sub_counter += 1
            b.has_z.append(False)
            b.num_children.append(1)
        row += 1
    return b.finish()


def offset_curve(ga: GeomArray, distance, quadsegs: int = 8,
                 join_style: str = "round",
                 mitre_limit: float = 5.0) -> GeomArray:
    """Parallel offset of each linestring (reference
    constructive.py:188-247): positive distance offsets to the LEFT of
    the line direction, negative to the right.

    Joins: 'round' inserts arc points at convex corners, 'mitre' joins
    the offset segment intersections directly.  Self-intersecting
    offsets (distance larger than the local feature size) are NOT
    pruned — the documented limitation vs GEOS (which runs its buffer
    curve-builder); inputs well-behaved at the chosen distance match.
    """
    dist = np.broadcast_to(np.asarray(distance, dtype=np.float64), len(ga))
    b = _Builder()
    for g in range(len(ga)):
        t = int(ga.types[g])
        if t == MISSING:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
            continue
        parts = _line_parts(ga, g)
        if t not in _LINE_TYPES or not parts:
            b.types.append(LINESTRING)
            b.has_z.append(False)
            b.num_children.append(0)
            continue
        d = float(dist[g])
        side = 1.0 if d >= 0 else -1.0
        r = abs(d)
        chains_out = []
        for xy in parts:
            if r == 0:
                chains_out.append(xy.copy())
                continue
            seg = np.diff(xy, axis=0)
            ln = np.hypot(seg[:, 0], seg[:, 1])
            ok = ln > 0
            seg, lnv = seg[ok], ln[ok]
            pts_a = xy[:-1][ok]
            nrm = np.column_stack([-seg[:, 1], seg[:, 0]]) / lnv[:, None] * side * r
            out = [pts_a[0] + nrm[0]]
            for k in range(len(seg)):
                a_off = pts_a[k] + nrm[k]
                b_off = pts_a[k] + seg[k] + nrm[k]
                if k > 0:
                    # join at vertex pts_a[k]
                    v = pts_a[k]
                    n0, n1 = nrm[k - 1], nrm[k]
                    cross = n0[0] * n1[1] - n0[1] * n1[0]
                    if join_style == "round" and cross * side < 0:
                        a0 = np.arctan2(n0[1], n0[0])
                        a1 = np.arctan2(n1[1], n1[0])
                        sweep = (a1 - a0 + np.pi) % (2 * np.pi) - np.pi
                        steps = max(int(abs(sweep) / (np.pi / 2) * quadsegs), 1)
                        for s in range(1, steps):
                            ang = a0 + sweep * s / steps
                            out.append(v + r * np.array([np.cos(ang), np.sin(ang)]))
                        out.append(a_off)
                    elif join_style == "mitre" and cross * side < 0:
                        # extend to the offset-line intersection, cropped
                        # at mitre_limit * r (GEOS semantics)
                        m = n0 + n1
                        mlen = np.hypot(m[0], m[1])
                        if mlen > 1e-12:
                            mh = m / mlen
                            proj = float(n0 @ mh)
                            dmit = r * r / proj if proj > 0 else np.inf
                            L = mitre_limit * r
                            if dmit <= L:
                                out.append(v + dmit * mh)
                            else:
                                tip = dmit * mh
                                t1 = (L - proj) / (dmit - proj)
                                out.append((v + n0) + t1 * (v + tip - (v + n0)))
                                out.append((v + n1) + t1 * (v + tip - (v + n1)))
                        out.append(a_off)
                    else:
                        out.append(a_off)
                out.append(b_off)
            chains_out.append(np.asarray(out))
        if len(chains_out) == 1:
            b.types.append(LINESTRING)
            b.add_part(g, PK_LINE, b.sub_counter, chains_out[0])
            b.sub_counter += 1
            b.num_children.append(1)
        else:
            b.types.append(MULTILINESTRING)
            for c in chains_out:
                b.add_part(g, PK_LINE, b.sub_counter, c)
                b.sub_counter += 1
            b.num_children.append(len(chains_out))
        b.has_z.append(False)
    return b.finish()


def shared_paths(ga: GeomArray, gb: GeomArray) -> GeomArray:
    """Shared linework of two lineal geometries (linear.py:115-143):
    GEOMETRYCOLLECTION of two MULTILINESTRINGs — segments shared in
    the SAME direction, then segments shared OPPOSITE.  Exact for
    noded inputs (segments compared after splitting at each other's
    vertices)."""
    from rayspatial.geom.array import GEOMETRYCOLLECTION

    b = _Builder()
    n = max(len(ga), len(gb))
    for g in range(n):
        i, j = min(g, len(ga) - 1), min(g, len(gb) - 1)
        if ga.types[i] == MISSING or gb.types[j] == MISSING:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
            continue
        segs_a = _directed_segments(ga, i)
        segs_b = _directed_segments(gb, j)
        # split every segment at the other side's vertices (collinear)
        verts = sorted({p for s in segs_a + segs_b for p in s})
        segs_a = _split_at_points(segs_a, verts)
        segs_b = _split_at_points(segs_b, verts)
        set_b = set(segs_b)
        same = sorted(s for s in segs_a if s in set_b)
        oppo = sorted(s for s in segs_a if (s[1], s[0]) in set_b)
        b.types.append(GEOMETRYCOLLECTION)
        nch = 0
        for group in (same, oppo):
            for a, c in group:
                b.add_part(g, PK_LINE, b.sub_counter,
                           np.asarray([a, c], dtype=np.float64))
                b.sub_counter += 1
                nch += 1
        b.has_z.append(False)
        b.num_children.append(nch)
    return b.finish()


def _directed_segments(ga: GeomArray, i: int):
    out = []
    for xy in _line_parts(ga, i):
        for k in range(len(xy) - 1):
            a = (float(xy[k, 0]), float(xy[k, 1]))
            c = (float(xy[k + 1, 0]), float(xy[k + 1, 1]))
            if a != c:
                out.append((a, c))
    return out


def _split_at_points(segs, points):
    out = []
    for a, c in segs:
        av = np.asarray(a)
        cv = np.asarray(c)
        d = cv - av
        ll = float(d @ d)
        cuts = [0.0, 1.0]
        for p in points:
            pv = np.asarray(p)
            t = float(((pv - av) @ d) / ll) if ll else 0.0
            if 1e-12 < t < 1 - 1e-12:
                # on the segment line?
                perp = pv - (av + t * d)
                if float(perp @ perp) < 1e-18 * max(ll, 1.0):
                    cuts.append(t)
        cuts = sorted(set(cuts))
        for k in range(len(cuts) - 1):
            p = tuple(av + cuts[k] * d)
            q = tuple(av + cuts[k + 1] * d)
            if p != q:
                out.append((p, q))
    return out
