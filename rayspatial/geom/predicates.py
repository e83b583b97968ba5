"""Predicate kernels (reference pygeos/predicates.py).

Semantics copied from the reference / GEOS:

- missing (null) on either side -> False for every predicate
  (src/ufuncs.c:148-151, 296-298);
- ``equals_exact`` is structural equality with tolerance — the test
  oracle (pygeos/testing.py:10-17, predicates.py:910-951);
- point-on-boundary: ``contains`` False, ``covers``/``intersects`` True
  (OGC DE-9IM definitions, predicates.py:470-521 notes).

Implementation: every geometry decomposes into points / lineal segments
/ polygon rings (GeomArray parts).  The named predicates are computed
from elementary interactions (point location in a geometry, segment
crossings) per OGC definitions over interiors/boundaries/exteriors.

Vectorized hot path: :func:`points_in_polygon` — location of a point
batch against one polygon — is the inner loop of the distributed
point-in-polygon join (reference query_bulk, src/strtree.c:434-580).

GEOMETRYCOLLECTION / multi-part semantics: predicates treat the operand
as the UNION of its components.  Joint coverage by *multiple*
components (e.g. a line covered by two adjacent polygons, neither alone
covering it; a polygon spanning a 2x2 tile grid) is EXACT, not sampled:
operand segments are refined on the fully noded arrangement (operand x
operand-linework crossings plus all vertices), where the location class
is piecewise constant along each open sub-segment — so a midpoint's
class is the sub-segment's class (see _covered /
_union_boundary_avoids_interior; GEOS-truth matrix in
tests/test_joint_coverage.py).
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    GEOMETRYCOLLECTION,
    LINEARRING,
    LINESTRING,
    MISSING,
    PK_HOLE,
    PK_LINE,
    PK_POINT,
    PK_SHELL,
    POINT,
    POLYGON,
    GeomArray,
)

__all__ = [
    "is_missing", "is_geometry", "is_valid_input", "is_empty", "is_ring",
    "is_closed", "is_simple", "is_valid", "is_ccw", "has_z",
    "equals_exact", "equals",
    "intersects", "disjoint", "contains", "contains_properly", "within",
    "covers", "covered_by", "touches", "crosses", "overlaps", "dwithin",
    "points_in_polygon", "PolygonSet",
]

INT, BND, EXT = 0, 1, 2


# ---------------------------------------------------------------------------
# unary predicates (reference predicates.py:39-418; missing -> False)


def is_missing(ga: GeomArray) -> np.ndarray:
    return ga.types == MISSING


def is_geometry(ga: GeomArray) -> np.ndarray:
    return ga.types != MISSING


def is_valid_input(ga: GeomArray) -> np.ndarray:
    # geometry or None are both valid inputs (predicates.py:260-291)
    return np.ones(len(ga), dtype=bool)


def is_empty(ga: GeomArray) -> np.ndarray:
    return ga.is_empty()


def has_z(ga: GeomArray) -> np.ndarray:
    out = np.asarray(ga.has_z, dtype=bool).copy()
    out[ga.types == MISSING] = False
    return out


def is_closed(ga: GeomArray) -> np.ndarray:
    """Lines whose first == last point (predicates.py:107-134;
    False for non-lines and missing)."""
    out = np.zeros(len(ga), dtype=bool)
    lineal = np.isin(ga.types, (LINESTRING, LINEARRING, 5))
    for p in range(ga.n_parts):
        g = ga.part_geom[p]
        if not lineal[g] or ga.part_kind[p] != PK_LINE:
            continue
        xy = ga.part_coords(p)
        closed = len(xy) >= 2 and bool((xy[0] == xy[-1]).all())
        # all parts must be closed; start True only if first part
        out[g] = closed if not out[g] else (out[g] and closed)
    # geometries marked lineal but empty stay False (GEOS: empty line is not closed)
    return out


def _ring_is_ccw(xy: np.ndarray) -> bool:
    x = xy[:, 0]
    y = xy[:, 1]
    return (np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])) > 0


def is_ccw(ga: GeomArray) -> np.ndarray:
    """True for CCW linear rings / closed linestrings with >= 4 points
    (predicates.py:70-106: False for non-linear and < 4 points)."""
    out = np.zeros(len(ga), dtype=bool)
    for p in range(ga.n_parts):
        g = ga.part_geom[p]
        if ga.types[g] not in (LINESTRING, LINEARRING):
            continue
        xy = ga.part_coords(p)
        if len(xy) >= 4 and (xy[0] == xy[-1]).all():
            out[g] = _ring_is_ccw(xy)
    return out


def _line_self_intersects(xy: np.ndarray) -> bool:
    """Any non-adjacent segment pair of one chain intersecting."""
    n = len(xy) - 1
    if n < 2:
        return False
    closed = (xy[0] == xy[-1]).all()
    for i in range(n):
        for j in range(i + 1, n):
            adjacent = (j == i + 1) or (closed and i == 0 and j == n - 1)
            kind, pt = _seg_seg(xy[i], xy[i + 1], xy[j], xy[j + 1])
            if kind == "none":
                continue
            if kind == "overlap":
                return True
            if kind in ("proper", "touch"):
                if adjacent:
                    # sharing the common endpoint is fine; anything else isn't
                    shared = xy[j] if j == i + 1 else xy[0]
                    if pt is not None and (pt == shared).all():
                        continue
                    return True
                return True
    return False


def is_simple(ga: GeomArray) -> np.ndarray:
    """No self-intersection (predicates.py:326-358; False for GC and
    missing)."""
    out = np.zeros(len(ga), dtype=bool)
    for i in range(len(ga)):
        t = ga.types[i]
        if t == MISSING or t == GEOMETRYCOLLECTION:
            continue
        parts = np.flatnonzero(ga.part_geom == i)
        simple = True
        if t in (LINESTRING, LINEARRING, 5):
            for p in parts:
                if _line_self_intersects(ga.part_coords(p)):
                    simple = False
                    break
        elif t == 4:  # multipoint: simple iff no repeated points
            pts = np.concatenate([ga.part_coords(p) for p in parts]) if len(parts) else np.empty((0, 2))
            simple = len(np.unique(pts, axis=0)) == len(pts)
        out[i] = simple
    return out


def is_ring(ga: GeomArray) -> np.ndarray:
    """closed AND simple (predicates.py:292-325)."""
    closed = is_closed(ga)
    simple = is_simple(ga)
    lineal = np.isin(ga.types, (LINESTRING, LINEARRING))
    return closed & simple & lineal


def is_valid(ga: GeomArray) -> np.ndarray:
    """OGC validity (predicates.py:359-391).  Implemented checks: rings
    closed with >= 4 points, no ring self-intersection, non-missing.
    (Full nested-hole validation out of scope; missing -> False,
    empty -> True per GEOS.)"""
    out = np.zeros(len(ga), dtype=bool)
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            continue
        ok = True
        for p in np.flatnonzero(ga.part_geom == i):
            if ga.part_kind[p] in (PK_SHELL, PK_HOLE):
                xy = ga.part_coords(p)
                if len(xy) < 4 or not (xy[0] == xy[-1]).all() or _line_self_intersects(xy):
                    ok = False
                    break
        out[i] = ok
    return out


def is_valid_reason(ga: GeomArray) -> np.ndarray:
    """Validity message per geometry (predicates.py:392-417): 'Valid
    Geometry' when valid, a reason string otherwise, None for missing."""
    out = np.empty(len(ga), dtype=object)
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            out[i] = None
            continue
        reason = "Valid Geometry"
        for p in np.flatnonzero(ga.part_geom == i):
            if ga.part_kind[p] in (PK_SHELL, PK_HOLE):
                xy = ga.part_coords(p)
                if len(xy) < 4:
                    reason = "Too few points in geometry component"
                    break
                if not (xy[0] == xy[-1]).all():
                    reason = "Ring not closed"
                    break
                if _line_self_intersects(xy):
                    reason = "Self-intersection"
                    break
        out[i] = reason
    return out


_PREP_ATTR = "_prepared_decomps"


def prepare(ga: GeomArray) -> None:
    """Prepare geometries IN PLACE (reference creation.py:472-501):
    attaches a per-row decomposition cache to the array; subsequent
    pairwise predicate calls reuse it via :func:`prepared_decomp`
    instead of re-decomposing per call.  (The join workers additionally
    keep their own per-worker caches — ops/join.py — which is the
    100-TB-scale preparation path.)"""
    cache = getattr(ga, _PREP_ATTR, None)
    if cache is None:
        cache = {}
        object.__setattr__(ga, _PREP_ATTR, cache)
    for i in range(len(ga)):
        if ga.types[i] != MISSING and i not in cache:
            cache[i] = _Decomp(ga, i)
    return None


def destroy_prepared(ga: GeomArray) -> None:
    """Drop the prepared cache (reference creation.py:504-523)."""
    if hasattr(ga, _PREP_ATTR):
        object.__delattr__(ga, _PREP_ATTR)
    return None


def is_prepared(ga: GeomArray) -> np.ndarray:
    """True where :func:`prepare` cached a decomposition
    (reference predicates.py:224-259; missing -> False)."""
    cache = getattr(ga, _PREP_ATTR, None)
    out = np.zeros(len(ga), dtype=bool)
    if cache:
        for i in cache:
            out[i] = True
    return out


def prepared_decomp(ga: GeomArray, i: int) -> "_Decomp":
    """The row's prepared decomposition if present, else a fresh one."""
    cache = getattr(ga, _PREP_ATTR, None)
    if cache is not None:
        d = cache.get(i)
        if d is not None:
            return d
    return _Decomp(ga, i)


def relate(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """DE-9IM matrix string per pair (predicates.py:953-974).

    POINT and lineal left-hand sides are computed directly (noded
    arrangement for lines); polygonal lhs vs point/lineal uses DE-9IM
    pair symmetry (relate(A,B) = transpose of relate(B,A)); polygonal
    lhs vs polygonal is classified on the noded boundary arrangement +
    interior probes (_relate_polygon).  GEOMETRYCOLLECTION operands
    raise (GEOS raises for GC relate too).  Missing on either side ->
    None."""
    n = len(ga)
    out = np.empty(n, dtype=object)
    for i in range(n):
        j = min(i, len(gb) - 1)
        if ga.types[i] == MISSING or gb.types[j] == MISSING:
            out[i] = None
            continue
        if ga.types[i] == 7 or gb.types[j] == 7:
            raise NotImplementedError(
                "relate: GEOMETRYCOLLECTION operands are unsupported "
                "(GEOS raises here as well)"
            )
        if ga.types[i] in (1, 2, 5):  # lineal lhs
            if gb.types[j] == POINT:
                # puntal rhs via pair symmetry (the point-lhs branch is
                # the GEOS-truth-tested one; _relate_line's midpoint
                # classification can only see a point rhs by accident)
                from rayspatial.geom.setops import _slice_rows

                m = relate(_slice_rows(gb, [j]), _slice_rows(ga, [i]))[0]
                out[i] = _transpose_de9im(m)
            elif gb.types[j] == 4:
                m = _relate_multipoint(gb, j, ga, i)
                out[i] = _transpose_de9im(m)
            else:
                out[i] = _relate_line(ga, i, gb, j)
            continue
        if ga.types[i] in (3, 6):  # polygonal lhs
            if gb.types[j] in (3, 6):
                out[i] = _relate_polygon(ga, i, gb, j)
            else:
                # pair symmetry: transpose of the (point/line, polygon)
                # matrix computed by the direct branches
                from rayspatial.geom.setops import _slice_rows

                m = relate(_slice_rows(gb, [j]), _slice_rows(ga, [i]))[0]
                out[i] = _transpose_de9im(m)
            continue
        if ga.types[i] == 4:  # MULTIPOINT lhs
            out[i] = _relate_multipoint(ga, i, gb, j)
            continue
        if ga.types[i] != POINT:
            raise NotImplementedError(
                "relate: unsupported left-hand geometry type"
            )
        loc = _locate_point_in(ga, i, gb, j)
        bdim = _boundary_dim(gb, j)
        edim = "2" if gb.types[j] in (3, 6) else ("1" if gb.types[j] in (1, 2, 5) else "0")
        if loc == "interior":
            out[i] = "0FFFFF" + ("FF2" if edim == "0" else (f"1{bdim}2" if edim == "1" else "212"))
        elif loc == "boundary":
            out[i] = "F0FFFF" + ("FF2" if edim == "0" else (f"1{bdim}2" if edim == "1" else "212"))
        else:
            out[i] = "FF0FFF" + ("FF2" if edim == "0" else (f"1{bdim}2" if edim == "1" else "212"))
    return out


def _relate_line(ga: GeomArray, i: int, gb: GeomArray, j: int) -> str:
    """DE-9IM for a lineal A vs point/lineal/polygonal B, computed on
    the noded arrangement: A's segments are split at every intersection
    with B's boundary and each sub-segment midpoint located in B
    (interior/boundary/exterior); A's boundary endpoints located
    likewise.  Uses the overlay noding tools, so T-junctions and
    collinear overlaps are handled."""
    from rayspatial.geom import measures as M
    from rayspatial.geom.overlay import _node_all_multi

    t_b = int(gb.types[j])
    # collect A segments (lineal parts)
    a_chains = [
        ga.part_coords(p)
        for p in np.flatnonzero(ga.part_geom == i)
        if ga.part_kind[p] == 1
    ]
    a_segs = []
    for xy in a_chains:
        for k in range(len(xy) - 1):
            if (xy[k] != xy[k + 1]).any():
                a_segs.append((xy[k], xy[k + 1]))
    # A boundary = endpoints appearing an odd number of times (mod-2)
    from collections import Counter

    endc = Counter()
    for xy in a_chains:
        endc[tuple(xy[0])] += 1
        endc[tuple(xy[-1])] += 1
    a_bnd = [np.asarray(pt) for pt, c in endc.items() if c % 2 == 1]
    # B segments (boundary for polygons, the line itself for lineal)
    b_parts = np.flatnonzero(gb.part_geom == j)
    b_chains = [gb.part_coords(p) for p in b_parts if gb.part_kind[p] != 0]
    b_segs = []
    for xy in b_chains:
        for k in range(len(xy) - 1):
            if (xy[k] != xy[k + 1]).any():
                b_segs.append((xy[k], xy[k + 1]))
    segs, members = _node_all_multi([a_segs, b_segs])

    def loc_in_b(pt: np.ndarray) -> str:
        return _locate_point_str(pt, gb, j)

    ii = ib = ie = "F"
    for k, (a2, b2) in enumerate(segs):
        if 0 not in members[k]:
            continue
        mid = (np.asarray(a2) + np.asarray(b2)) / 2.0
        if 1 in members[k]:  # collinear shared with B's linework
            ib_dim = "1" if t_b in (3, 6) else None
            if t_b in (3, 6):
                ib = "1"
            else:
                ii = "1"  # shared line interiors
            continue
        where = loc_in_b(mid)
        if where == "interior":
            ii = "1"
        elif where == "boundary":
            ib = max(ib, "1") if ib != "F" else "1"
        else:
            ie = "1"
    # crossing POINTS: nodes where A passes through B's linework
    # transversally contribute dim 0 to II (polygon: boundary) — detect
    # via endpoints of A sub-segments that lie on B linework but whose
    # segment is not collinear-shared
    for k, (a2, b2) in enumerate(segs):
        if 0 not in members[k] or 1 in members[k]:
            continue
        for pt in (np.asarray(a2), np.asarray(b2)):
            where = loc_in_b(pt)
            if t_b in (3, 6):
                if where == "boundary" and ib == "F":
                    ib = "0"
            else:
                # lineal/point B: a transversal crossing node lies in
                # B's INTERIOR -> II gains dim 0
                if where == "interior" and ii == "F":
                    ii = "0"
    bi = bb_ = be = "F"
    for pt in a_bnd:
        where = loc_in_b(pt)
        if where == "interior":
            bi = "0"
        elif where == "boundary":
            bb_ = "0"
        else:
            be = "0"
    # exterior row: B's extent not covered by a line
    if t_b in (3, 6):
        ei, eb, ee = "2", "1", "2"
        # eb: check if every B boundary sub-segment lies on A
        all_on_a = all(
            0 in members[k] for k in range(len(segs)) if 1 in members[k]
        )
        if all_on_a and any(1 in m for m in members):
            eb = "F"
    elif t_b in (1, 2, 5):
        ei = "1" if any(1 in m and 0 not in m for m in members) else "F"
        # B's boundary = its endpoints: locate each in A
        b_endc = Counter()
        for xy in b_chains:
            b_endc[tuple(xy[0])] += 1
            b_endc[tuple(xy[-1])] += 1
        eb = "F"
        for pt, c in b_endc.items():
            if c % 2 == 0:
                continue
            where_a = _locate_point_in(
                _point_geom(np.asarray(pt)), 0, ga, i
            )
            if where_a == "interior" and ib == "F":
                ib = "0"
            elif where_a == "boundary" and bb_ == "F":
                bb_ = "0"
            elif where_a == "exterior":
                eb = "0"
        ee = "2"
    else:  # points
        ei, eb, ee = "0", "F", "2"
    return ii + ib + ie + bi + bb_ + be + ei + eb + ee


def _relate_multipoint(ga: GeomArray, i: int, gb: GeomArray, j: int) -> str:
    """DE-9IM for puntal A (POINT/MULTIPOINT): A's interior is the
    point set, its boundary is EMPTY; every entry reduces to point
    membership tests against B plus dimension bookkeeping for the
    exterior row."""
    pts = [
        ga.part_coords(p)[0]
        for p in np.flatnonzero(ga.part_geom == i)
    ]
    locs = [_locate_point_str(np.asarray(pt), gb, j) for pt in pts]
    II = "0" if any(lo == "interior" for lo in locs) else "F"
    IB = "0" if any(lo == "boundary" for lo in locs) else "F"
    IE = "0" if any(lo == "exterior" for lo in locs) else "F"
    t_b = int(gb.types[j])
    if t_b in (3, 6):
        EI, EB = "2", "1"
    elif t_b in (1, 2, 5):
        EI = "1"
        # E(A) covers B's boundary endpoints unless each is an A point
        from rayspatial.geom.measures import _geom_segments  # noqa: F401
        from collections import Counter

        endc = Counter()
        for p in np.flatnonzero(gb.part_geom == j):
            if gb.part_kind[p] != 1:
                continue
            xy = gb.part_coords(p)
            endc[tuple(xy[0])] += 1
            endc[tuple(xy[-1])] += 1
        bpts = [np.asarray(q) for q, c in endc.items() if c % 2 == 1]
        apts = np.asarray(pts).reshape(-1, 2) if pts else np.empty((0, 2))
        def in_a(q):
            return len(apts) and bool(
                (np.abs(apts - q[None, :]) <= 1e-12).all(axis=1).any()
            )
        EB = "0" if any(not in_a(q) for q in bpts) else "F"
    elif t_b in (0, 4):
        apts = np.asarray(pts).reshape(-1, 2) if pts else np.empty((0, 2))
        bpts = [
            gb.part_coords(p)[0]
            for p in np.flatnonzero(gb.part_geom == j)
        ]
        def in_a2(q):
            return len(apts) and bool(
                (np.abs(apts - np.asarray(q)[None, :]) <= 1e-12).all(axis=1).any()
            )
        EI = "0" if any(not in_a2(q) for q in bpts) else "F"
        EB = "F"
    else:
        EI, EB = "F", "F"
    return II + IB + IE + "FFF" + EI + EB + "2"


def _transpose_de9im(m: str) -> str:
    """relate(A,B) = transpose of relate(B,A) (swap I/B/E rows & cols)."""
    return "".join(m[k] for k in (0, 3, 6, 1, 4, 7, 2, 5, 8))


def _relate_polygon(ga: GeomArray, i: int, gb: GeomArray, j: int) -> str:
    """DE-9IM for polygonal A vs polygonal B on the noded boundary
    arrangement (SURVEY 8.4.1): each noded boundary sub-segment's
    midpoint is located in the OTHER polygon (valid-polygon dimension
    facts: boundary-in-open-set intersections are 1-dimensional,
    interior-interior intersections 2-dimensional), with
    point_on_surface interior probes covering the equal/containment
    cases that produce no boundary-in-interior segment."""
    from rayspatial.geom.overlay import _node_all_multi

    def rings_of(g_, idx):
        return [
            g_.part_coords(p)
            for p in np.flatnonzero(g_.part_geom == idx)
            if g_.part_kind[p] in (2, 3)
        ]

    def segs_of(rings):
        segs = []
        for xy in rings:
            r = xy if (xy[0] == xy[-1]).all() else np.vstack([xy, xy[:1]])
            for k in range(len(r) - 1):
                if (r[k] != r[k + 1]).any():
                    segs.append((r[k], r[k + 1]))
        return segs

    a_rings, b_rings = rings_of(ga, i), rings_of(gb, j)
    if not a_rings or not b_rings:  # empty operand(s)
        ia = "F" if not a_rings else "2"
        ib_ = "F" if not b_rings else "2"
        return (
            "FFFFFF" + ("21" if ib_ == "2" else "FF") + "2"
            if ia == "F"
            else "FF2FF1FF2"
        )
    segs, members = _node_all_multi([segs_of(a_rings), segs_of(b_rings)])
    II = IB = IE = BI = BB = BE = EI = EB = "F"
    for k, (a2, b2) in enumerate(segs):
        mid = (np.asarray(a2) + np.asarray(b2)) / 2.0
        on_a = 0 in members[k]
        on_b = 1 in members[k]
        if on_a and on_b:
            BB = "1"
            continue
        if on_a:
            where = _locate_point_str(mid, gb, j)
            if where == "interior":
                BI = "1"
                II = "2"  # a neighborhood of mid inside A is inside B
            elif where == "exterior":
                BE = "1"
                IE = "2"
        else:
            where = _locate_point_str(mid, ga, i)
            if where == "interior":
                IB = "1"
                II = "2"
            elif where == "exterior":
                EB = "1"
                EI = "2"
    if BB == "F":
        # touching nodes: graph vertices incident to both boundaries
        node_src: dict[tuple, set] = {}
        for k, (a2, b2) in enumerate(segs):
            for endp in (a2, b2):
                node_src.setdefault(endp, set()).update(members[k])
        if any(src >= {0, 1} for src in node_src.values()):
            BB = "0"
    # interior probes for the no-crossing cases (equal / containment
    # with fully shared boundaries)
    from rayspatial.geom.constructive import point_on_surface
    from rayspatial.geom.setops import _slice_rows

    if II == "F" or IE == "F" or EI == "F":
        pa_ = point_on_surface(_slice_rows(ga, [i]))
        pb_ = point_on_surface(_slice_rows(gb, [j]))
        wa = _locate_point_in(pa_, 0, gb, j)
        wb = _locate_point_in(pb_, 0, ga, i)
        if wa == "interior" or wb == "interior":
            II = "2"
        if wa == "exterior":
            IE = "2"
        if wb == "exterior":
            EI = "2"
    return II + IB + IE + BI + BB + BE + EI + EB + "2"


def _point_geom(pt: np.ndarray) -> GeomArray:
    return GeomArray(
        types=np.array([0], dtype=np.int8),
        part_geom=np.array([0], dtype=np.int64),
        part_kind=np.array([0], dtype=np.int8),
        part_sub=np.array([0], dtype=np.int64),
        part_off=np.array([0, 1], dtype=np.int64),
        coords=np.asarray(pt, dtype=np.float64).reshape(1, 2),
    )


def _locate_point_str(pt: np.ndarray, gb: GeomArray, j: int) -> str:
    tmp = GeomArray(
        types=np.array([0], dtype=np.int8),
        part_geom=np.array([0], dtype=np.int64),
        part_kind=np.array([0], dtype=np.int8),
        part_sub=np.array([0], dtype=np.int64),
        part_off=np.array([0, 1], dtype=np.int64),
        coords=np.asarray(pt, dtype=np.float64).reshape(1, 2),
    )
    return _locate_point_in(tmp, 0, gb, j)


def _boundary_dim(gb: GeomArray, j: int) -> str:
    t = int(gb.types[j])
    if t in (3, 6):
        return "1"
    if t in (1, 5):
        return "0"
    return "F"


def _locate_point_in(ga: GeomArray, i: int, gb: GeomArray, j: int) -> str:
    parts = np.flatnonzero(ga.part_geom == i)
    if not len(parts):
        return "exterior"
    px, py = ga.part_coords(parts[0])[0]
    t = int(gb.types[j])
    if t in (3, 6):
        from rayspatial.geom.strtree import _locate_in_polyset

        d = prepared_decomp(gb, j)
        loc = _locate_in_polyset(d, np.array([px]), np.array([py]))[0]
        return {INT: "interior", BND: "boundary", EXT: "exterior"}[int(loc)]
    if t in (0, 4):
        for p in np.flatnonzero(gb.part_geom == j):
            q = gb.part_coords(p)[0]
            if q[0] == px and q[1] == py:
                return "interior"
        return "exterior"
    # lineal: on an endpoint -> boundary, on the line -> interior
    from rayspatial.geom import measures as M

    for p in np.flatnonzero(gb.part_geom == j):
        xy = gb.part_coords(p)
        if ((xy[0][0] == px and xy[0][1] == py)
                or (xy[-1][0] == px and xy[-1][1] == py)):
            return "boundary"
    pa_, sa1, sa2 = M._geom_segments(gb, j)
    if len(sa1):
        d2 = M._pt_seg_dist2(px, py, sa1[:, 0], sa1[:, 1], sa2[:, 0], sa2[:, 1])
        if np.min(d2) == 0.0:
            return "interior"
    return "exterior"


def relate_pattern(ga: GeomArray, gb: GeomArray, pattern: str) -> np.ndarray:
    """True where relate(a, b) matches ``pattern`` ('*' any, 'T' any
    non-F dimension) — predicates.py:975-1008."""
    if len(pattern) != 9:
        raise ValueError("pattern must have length 9")
    mats = relate(ga, gb)
    out = np.zeros(len(mats), dtype=bool)
    for i, m in enumerate(mats):
        if m is None:
            continue
        ok = True
        for pc_, mc in zip(pattern, m):
            if pc_ == "*":
                continue
            if pc_ in ("T",):
                if mc == "F":
                    ok = False
                    break
            elif pc_.upper() != mc.upper():
                ok = False
                break
        out[i] = ok
    return out


# ---------------------------------------------------------------------------
# structural equality (the test oracle)


def equals_exact(ga: GeomArray, gb: GeomArray, tolerance: float = 0.0) -> np.ndarray:
    """Structural equality with tolerance (predicates.py:910-951):
    same type, same part structure, coordinates pairwise within
    tolerance.  Missing on either side -> False."""
    n = len(ga)
    out = np.zeros(n, dtype=bool)
    pa = [np.flatnonzero(ga.part_geom == i) for i in range(n)]
    pb = [np.flatnonzero(gb.part_geom == i) for i in range(n)]
    for i in range(n):
        ta, tb = ga.types[i], gb.types[i]
        if ta == MISSING or tb == MISSING or ta != tb:
            continue
        ppa, ppb = pa[i], pb[i]
        if len(ppa) != len(ppb):
            continue
        ok = True
        for qa, qb in zip(ppa, ppb):
            if ga.part_kind[qa] != gb.part_kind[qb]:
                ok = False
                break
            ca, cb = ga.part_coords(qa), gb.part_coords(qb)
            if ca.shape != cb.shape or not (np.abs(ca - cb) <= tolerance).all():
                ok = False
                break
        out[i] = ok
    return out


# ---------------------------------------------------------------------------
# elementary interactions


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_seg(px, py, ax, ay, bx, by) -> bool:
    if _orient(ax, ay, bx, by, px, py) != 0.0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _seg_seg(a1, a2, b1, b2):
    """Classify segment intersection.

    Returns (kind, point) where kind in {"none", "proper", "touch",
    "overlap"}; point is the contact point for proper/touch (None for
    overlap)."""
    d1 = _orient(b1[0], b1[1], b2[0], b2[1], a1[0], a1[1])
    d2 = _orient(b1[0], b1[1], b2[0], b2[1], a2[0], a2[1])
    d3 = _orient(a1[0], a1[1], a2[0], a2[1], b1[0], b1[1])
    d4 = _orient(a1[0], a1[1], a2[0], a2[1], b2[0], b2[1])
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        # proper crossing: interiors of both segments
        t = d1 / (d1 - d2)
        px = a1[0] + t * (a2[0] - a1[0])
        py = a1[1] + t * (a2[1] - a1[1])
        return "proper", np.asarray([px, py])
    if d1 == 0 and d2 == 0 and d3 == 0 and d4 == 0:
        # collinear: project on dominant axis
        axis = 0 if abs(a2[0] - a1[0]) >= abs(a2[1] - a1[1]) else 1
        lo_a, hi_a = sorted((a1[axis], a2[axis]))
        lo_b, hi_b = sorted((b1[axis], b2[axis]))
        lo, hi = max(lo_a, lo_b), min(hi_a, hi_b)
        if lo > hi:
            return "none", None
        if lo == hi:
            pt = a1 if a1[axis] == lo else (a2 if a2[axis] == lo else (b1 if b1[axis] == lo else b2))
            return "touch", np.asarray(pt, dtype=np.float64)
        return "overlap", None
    # non-collinear touch cases: one endpoint on the other segment
    for p, (u1, u2) in (
        (a1, (b1, b2)),
        (a2, (b1, b2)),
        (b1, (a1, a2)),
        (b2, (a1, a2)),
    ):
        if _on_seg(p[0], p[1], u1[0], u1[1], u2[0], u2[1]):
            return "touch", np.asarray(p, dtype=np.float64)
    return "none", None


# --- vectorized point-in-ring ------------------------------------------------


def _pip_ring_bulk(px: np.ndarray, py: np.ndarray, ring: np.ndarray):
    """Vectorized even-odd + boundary test of points against one closed
    ring.  Returns (inside_parity bool[n], on_boundary bool[n])."""
    x0 = ring[:-1, 0][None, :]
    y0 = ring[:-1, 1][None, :]
    x1 = ring[1:, 0][None, :]
    y1 = ring[1:, 1][None, :]
    px_ = px[:, None]
    py_ = py[:, None]
    # boundary: collinear + bbox
    cross = (x1 - x0) * (py_ - y0) - (y1 - y0) * (px_ - x0)
    on = (
        (cross == 0.0)
        & (px_ >= np.minimum(x0, x1))
        & (px_ <= np.maximum(x0, x1))
        & (py_ >= np.minimum(y0, y1))
        & (py_ <= np.maximum(y0, y1))
    ).any(axis=1)
    # even-odd ray cast (upward ray, half-open rule)
    cond = (y0 > py_) != (y1 > py_)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py_ - y0) * (x1 - x0) / (y1 - y0)
    hits = cond & (px_ < xint)
    inside = hits.sum(axis=1) % 2 == 1
    return inside, on


class PolygonSet:
    """A prepared polygon partition: rings grouped per polygon, edge
    arrays precomputed — the engine's 'prepared geometry' (the analogue
    of the reference's per-Geometry prepared cache,
    src/ufuncs.c:461-476).  Built once per actor in the join stage."""

    def __init__(self, ga: GeomArray, indices: np.ndarray | None = None):
        """Collect all polygons of geometries ``indices`` (default all)
        of ``ga``.  Each polygon = (geom_idx, shell, [holes])."""
        self.polys: list[tuple[int, np.ndarray, list[np.ndarray]]] = []
        want = set(indices.tolist()) if indices is not None else None
        cur = {}
        for p in range(ga.n_parts):
            g = int(ga.part_geom[p])
            if want is not None and g not in want:
                continue
            k = ga.part_kind[p]
            if k == PK_SHELL:
                pid = int(ga.part_sub[p])
                cur[pid] = (g, ga.part_coords(p), [])
            elif k == PK_HOLE:
                pid = int(ga.part_sub[p])
                if pid in cur:
                    cur[pid][2].append(ga.part_coords(p))
        self.polys = [cur[k] for k in sorted(cur)]

    def locate(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Location of each point w.r.t. the union of polygons:
        0=interior, 1=boundary, 2=exterior.  Vectorized per ring."""
        n = len(px)
        loc = np.full(n, EXT, dtype=np.int8)
        on_any = np.zeros(n, dtype=bool)
        for _, shell, holes in self.polys:
            ins, on = _pip_ring_bulk(px, py, shell)
            on_any |= on
            interior = ins & ~on
            for hole in holes:
                hins, hon = _pip_ring_bulk(px, py, hole)
                on_any |= hon
                interior &= ~hins
                interior &= ~hon
            loc[interior] = INT
        # boundary only where not interior of some other polygon
        loc[on_any & (loc != INT)] = BND
        return loc


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, shell: np.ndarray, holes=()
) -> np.ndarray:
    """Hot join kernel: locations (0/1/2) of a point batch vs a single
    polygon."""
    ins, on = _pip_ring_bulk(px, py, shell)
    loc = np.where(ins & ~on, INT, np.where(on, BND, EXT)).astype(np.int8)
    for hole in holes:
        hins, hon = _pip_ring_bulk(px, py, hole)
        loc[(loc == INT) & hon] = BND
        loc[(loc == INT) & hins & ~hon] = EXT
    return loc


# ---------------------------------------------------------------------------
# per-geometry decomposition and location


class _Decomp:
    """Points / lineal segments / polygons of ONE geometry."""

    def __init__(self, ga: GeomArray, i: int):
        pts = []
        lines = []  # list of (k,2) chains
        polys = {}
        for p in np.flatnonzero(ga.part_geom == i):
            k = ga.part_kind[p]
            xy = ga.part_coords(p)
            if k == PK_POINT:
                pts.append(xy)
            elif k == PK_LINE:
                lines.append(xy)
            elif k == PK_SHELL:
                polys[int(ga.part_sub[p])] = (xy, [])
            else:
                pid = int(ga.part_sub[p])
                if pid in polys:
                    polys[pid][1].append(xy)
        self.points = np.concatenate(pts) if pts else np.empty((0, 2))
        self.lines = lines
        self.polys = [polys[k] for k in sorted(polys)]  # (shell, holes)
        self.empty = len(self.points) == 0 and not lines and not self.polys

    @property
    def dim(self) -> int:
        if self.polys:
            return 2
        if self.lines:
            return 1
        if len(self.points):
            return 0
        return -1

    def line_boundary_points(self) -> np.ndarray:
        """Mod-2 rule: endpoints occurring an odd number of times are
        boundary points of the lineal component (closed ring -> none)."""
        ends = []
        for ch in self.lines:
            ends.append(ch[0])
            ends.append(ch[-1])
        if not ends:
            return np.empty((0, 2))
        ends = np.asarray(ends)
        uniq, counts = np.unique(ends, axis=0, return_counts=True)
        return uniq[counts % 2 == 1]

    def segments(self):
        """All lineal segments as (m, 2, 2)."""
        segs = []
        for ch in self.lines:
            if len(ch) >= 2:
                segs.append(np.stack([ch[:-1], ch[1:]], axis=1))
        return np.concatenate(segs) if segs else np.empty((0, 2, 2))

    def ring_segments(self):
        segs = []
        for shell, holes in self.polys:
            for ring in [shell, *holes]:
                if len(ring) >= 2:
                    segs.append(np.stack([ring[:-1], ring[1:]], axis=1))
        return np.concatenate(segs) if segs else np.empty((0, 2, 2))

    def all_vertices(self) -> np.ndarray:
        vs = [self.points]
        vs += [ch for ch in self.lines]
        for shell, holes in self.polys:
            vs.append(shell)
            vs += holes
        vs = [v for v in vs if len(v)]
        return np.concatenate(vs) if vs else np.empty((0, 2))

    def locate(self, px: float, py: float) -> int:
        """Location of one point in this geometry (set union of
        components; interior of any component wins)."""
        p = np.asarray([px, py])
        loc = EXT
        # polygons
        for shell, holes in self.polys:
            ins, on = _pip_ring_bulk(np.asarray([px]), np.asarray([py]), shell)
            if on[0]:
                loc = min(loc, BND)
                continue
            if ins[0]:
                inside = True
                for hole in holes:
                    hins, hon = _pip_ring_bulk(np.asarray([px]), np.asarray([py]), hole)
                    if hon[0]:
                        loc = min(loc, BND)
                        inside = False
                        break
                    if hins[0]:
                        inside = False
                        break
                if inside:
                    return INT
        # lines: interior unless boundary endpoint
        bpts = self.line_boundary_points() if self.lines else np.empty((0, 2))
        for ch in self.lines:
            for k in range(len(ch) - 1):
                if _on_seg(px, py, ch[k, 0], ch[k, 1], ch[k + 1, 0], ch[k + 1, 1]):
                    if len(bpts) and ((bpts == p).all(axis=1)).any():
                        loc = min(loc, BND)
                    else:
                        return INT
        # points: point interior
        if len(self.points) and ((self.points == p).all(axis=1)).any():
            return INT
        return loc


# ---------------------------------------------------------------------------
# pairwise named predicates


def _ring_inner_point(ring: np.ndarray) -> np.ndarray:
    """A point strictly inside a simple ring: scanline through the mid-y
    (nudged off vertices), midpoint of the first crossing span."""
    ys = np.unique(ring[:, 1])
    if len(ys) < 2:
        return ring[0]
    # pick a y between two distinct vertex y's (avoids hitting vertices)
    k = len(ys) // 2
    y = (ys[k - 1] + ys[k]) / 2.0
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cond = (y0 > y) != (y1 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    xs = np.sort(xint[cond])
    if len(xs) >= 2:
        return np.asarray([(xs[0] + xs[1]) / 2.0, y])
    return ring[0]


def _locate_many(d: _Decomp, pts: np.ndarray) -> np.ndarray:
    return np.asarray([d.locate(p[0], p[1]) for p in pts], dtype=np.int8)


def _seg_midpoints(segs: np.ndarray) -> np.ndarray:
    return (segs[:, 0] + segs[:, 1]) / 2.0


def _split_segments_at(segs: np.ndarray, cutters: np.ndarray) -> np.ndarray:
    """Split each segment at every cutter vertex / crossing point that
    lies on it, so that each sub-segment lies wholly inside or outside
    the other geometry; returns refined (m,2,2)."""
    out = []
    for seg in segs:
        a, b = seg
        ts = [0.0, 1.0]
        dx, dy = b - a
        ll = dx * dx + dy * dy
        if ll == 0:
            out.append(seg)
            continue
        for c in cutters:
            if _on_seg(c[0], c[1], a[0], a[1], b[0], b[1]):
                t = ((c[0] - a[0]) * dx + (c[1] - a[1]) * dy) / ll
                if 0.0 < t < 1.0:
                    ts.append(float(t))
        ts = sorted(set(ts))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            out.append(np.asarray([a + t0 * np.asarray([dx, dy]), a + t1 * np.asarray([dx, dy])]))
    return np.asarray(out) if out else np.empty((0, 2, 2))


def _crossing_points(segs_a: np.ndarray, segs_b: np.ndarray) -> np.ndarray:
    pts = []
    for sa in segs_a:
        for sb in segs_b:
            kind, pt = _seg_seg(sa[0], sa[1], sb[0], sb[1])
            if pt is not None:
                pts.append(pt)
            elif kind == "overlap":
                pts.append(sa[0]); pts.append(sa[1])
                pts.append(sb[0]); pts.append(sb[1])
    return np.asarray(pts) if pts else np.empty((0, 2))


def _covered(da: _Decomp, db: _Decomp) -> bool:
    """A subset of closure(B)?  (i.e. no part of A in exterior(B))."""
    if da.empty:
        return False  # GEOS: empty covered_by anything -> False
    # points
    for p in da.points:
        if db.locate(p[0], p[1]) == EXT:
            return False
    # lineal segments: refine at B's vertices and crossings, then test
    segs = da.segments()
    if len(segs):
        cutters = np.concatenate([db.all_vertices(), _crossing_points(segs, np.concatenate([db.segments(), db.ring_segments()]) if (len(db.segments()) or len(db.ring_segments())) else np.empty((0, 2, 2)))]) if not db.empty else np.empty((0, 2))
        refined = _split_segments_at(segs, cutters)
        for seg in refined:
            m = (seg[0] + seg[1]) / 2.0
            if db.locate(m[0], m[1]) == EXT:
                return False
        for seg in refined:
            for e in seg:
                if db.locate(e[0], e[1]) == EXT:
                    return False
    # polygon parts: A's rings must be covered AND B must have no
    # UNION boundary strictly inside A's interior that would carve
    # exterior out of A
    if da.polys:
        if db.dim < 2:
            return False
        ring_segs = da.ring_segments()
        cutters = np.concatenate([db.all_vertices(), _crossing_points(ring_segs, db.ring_segments())])
        refined = _split_segments_at(ring_segs, cutters)
        for seg in refined:
            m = (seg[0] + seg[1]) / 2.0
            if db.locate(m[0], m[1]) == EXT:
                return False
        if not _union_boundary_avoids_interior(da, db):
            return False
    return True


def _ring_is_ccw(ring: np.ndarray) -> bool:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * y2 - x2 * y)) > 0.0


def _union_boundary_avoids_interior(da: _Decomp, db: _Decomp) -> bool:
    """True iff no part of the boundary of UNION(db's polygons) lies
    strictly inside da's interior.  Exact (no sampling): db's rings are
    noded against each other AND da's rings (one noding group per ring;
    collinear shared edges carry every owner ring's membership), so
    along each open sub-segment the set of components on each side is
    constant.  A sub-segment inside da's interior is union-INTERIOR iff
    some component strictly contains its midpoint, or the member rings
    jointly put polygon interior on BOTH sides (shell: interior left of
    the stored direction iff CCW; hole: iff CW).  This replaces a
    vertex-only heuristic that false-negatived on 2x2 tile grids, where
    the shared corner vertex is union-interior (round-3 verdict: joint
    coverage must be exact for shared-boundary tilings; GEOS reference
    src/ufuncs.c:242-320 prepared covers)."""
    from rayspatial.geom.overlay import _node_all_multi

    rings: list[tuple[np.ndarray, bool]] = []  # (coords, interior_left)
    for shell, holes in db.polys:
        rings.append((shell, _ring_is_ccw(shell)))
        for h in holes:
            rings.append((h, not _ring_is_ccw(h)))
    if not rings:
        return True
    groups = []
    for coords, _ in rings:
        groups.append([(coords[k], coords[k + 1])
                       for k in range(len(coords) - 1)
                       if (coords[k] != coords[k + 1]).any()])
    a_segs = da.ring_segments()
    groups.append([(s[0], s[1]) for s in a_segs])
    segs, members = _node_all_multi(groups)
    nb = len(rings)
    for k, (p, q) in enumerate(segs):
        mem = [gidx for gidx in members[k] if gidx < nb]
        if not mem:
            continue
        p = np.asarray(p, float)
        q = np.asarray(q, float)
        m = (p + q) / 2.0
        if _point_in_polyset(da, m[0], m[1]) != INT:
            continue
        left = right = False
        # a component strictly containing m covers both sides locally
        for shell, holes in db.polys:
            ins, on = _pip_ring_bulk(m[0:1], m[1:2], shell)
            if not ins[0] or on[0]:
                continue
            strict = True
            for hole in holes:
                hins, hon = _pip_ring_bulk(m[0:1], m[1:2], hole)
                if hins[0] or hon[0]:
                    strict = False
                    break
            if strict:
                left = right = True
                break
        if not (left and right):
            d0 = q - p
            for gidx in mem:
                coords, interior_left = rings[gidx]
                ddir = _ring_edge_dir_at(coords, m)
                if ddir is None:
                    continue
                same = float(ddir[0] * d0[0] + ddir[1] * d0[1]) > 0
                if interior_left == same:
                    left = True
                else:
                    right = True
        if not (left and right):
            return False
    return True


def _ring_edge_dir_at(coords: np.ndarray, m: np.ndarray):
    """Direction (v - u) of the ring edge closest to ``m`` (must be
    within the noding snap tolerance; None if the ring has degenerate
    edges only)."""
    u = coords[:-1]
    v = coords[1:]
    d = v - u
    ll = (d * d).sum(axis=1)
    ok = ll > 0
    if not ok.any():
        return None
    u, v, d, ll = u[ok], v[ok], d[ok], ll[ok]
    t = np.clip(((m - u) * d).sum(axis=1) / ll, 0.0, 1.0)
    proj = u + t[:, None] * d
    dist2 = ((proj - m) ** 2).sum(axis=1)
    j = int(np.argmin(dist2))
    if dist2[j] > 1e-12:   # > snap tolerance^... (snap grid 1e-9)
        return None
    return d[j]


def _point_in_polyset(d: _Decomp, px: float, py: float) -> int:
    loc = EXT
    for shell, holes in d.polys:
        ins, on = _pip_ring_bulk(np.asarray([px]), np.asarray([py]), shell)
        if on[0]:
            loc = BND
            continue
        if ins[0]:
            inside = True
            for hole in holes:
                hins, hon = _pip_ring_bulk(np.asarray([px]), np.asarray([py]), hole)
                if hon[0]:
                    loc = BND
                    inside = False
                    break
                if hins[0]:
                    inside = False
                    break
            if inside:
                return INT
    return loc


def _poly_intervals_at(d: _Decomp, y: float) -> list[tuple[float, float]]:
    """Open interior x-intervals of the polygon set of ``d`` at scanline
    ``y`` (y must avoid all vertex y's).  Union over polygons; holes via
    even-odd within each polygon."""
    merged: list[tuple[float, float]] = []
    for shell, holes in d.polys:
        xs = []
        for ring in [shell, *holes]:
            x0, y0 = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            cond = (y0 > y) != (y1 > y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
            xs.extend(xint[cond].tolist())
        xs.sort()
        for a, b in zip(xs[::2], xs[1::2]):
            if a < b:
                merged.append((a, b))
    merged.sort()
    out: list[tuple[float, float]] = []
    for a, b in merged:
        if out and a <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def _poly_poly_area_overlap(da: _Decomp, db: _Decomp) -> bool:
    """Exact: do the polygon interiors share positive area?  Scanline
    between consecutive event y's (vertices + ring crossings): interiors
    overlap iff open x-interval sets overlap at some inter-event line."""
    events = [v[1] for v in da.all_vertices()] + [v[1] for v in db.all_vertices()]
    cross = _crossing_points(da.ring_segments(), db.ring_segments())
    events += [p[1] for p in cross]
    ys = np.unique(np.asarray(events))
    for k in range(len(ys) - 1):
        y = (ys[k] + ys[k + 1]) / 2.0
        ia = _poly_intervals_at(da, y)
        ib = _poly_intervals_at(db, y)
        pa = 0
        pb = 0
        while pa < len(ia) and pb < len(ib):
            lo = max(ia[pa][0], ib[pb][0])
            hi = min(ia[pa][1], ib[pb][1])
            if lo < hi:
                return True
            if ia[pa][1] < ib[pb][1]:
                pa += 1
            else:
                pb += 1
    return False


def _interiors_intersect(da: _Decomp, db: _Decomp) -> tuple[bool, int]:
    """Do interiors intersect, and with what dimension?"""
    best = -1
    # polygon-polygon: exact scanline area-overlap test
    if da.polys and db.polys:
        if _poly_poly_area_overlap(da, db):
            return True, 2
    # lineal A vs polygonal B (either order)
    for dl, dp in ((da, db), (db, da)):
        if dl.lines and dp.polys:
            segs = dl.segments()
            cutters = np.concatenate([dp.all_vertices(), _crossing_points(segs, dp.ring_segments())])
            refined = _split_segments_at(segs, cutters)
            for seg in refined:
                m = (seg[0] + seg[1]) / 2.0
                if _point_in_polyset(dp, m[0], m[1]) == INT and dl.locate(m[0], m[1]) == INT:
                    return True, 1
    # line-line
    if da.lines and db.lines:
        segs_a = da.segments()
        segs_b = db.segments()
        for sa in segs_a:
            for sb in segs_b:
                kind, pt = _seg_seg(sa[0], sa[1], sb[0], sb[1])
                if kind == "proper":
                    return True, max(best, 0) if best < 1 else best  # point intersection
                if kind == "overlap":
                    return True, 1
                if kind == "touch" and pt is not None:
                    if da.locate(pt[0], pt[1]) == INT and db.locate(pt[0], pt[1]) == INT:
                        best = max(best, 0)
        if best >= 0:
            return True, best
    # points of A interior to B / vice versa
    for p in da.points:
        if db.locate(p[0], p[1]) == INT:
            return True, max(best, 0)
    for p in db.points:
        if da.locate(p[0], p[1]) == INT:
            return True, max(best, 0)
    # lineal A point-interior vs lineal/puntal B handled; polygon vs point:
    return best >= 0, best


def _pair_intersects(ga: GeomArray, i: int, gb: GeomArray, j: int) -> bool:
    da, db = prepared_decomp(ga, i), prepared_decomp(gb, j)
    return _decomp_intersects(da, db)


def _decomp_intersects(da: _Decomp, db: _Decomp) -> bool:
    if da.empty or db.empty:
        return False
    # cheap: any vertex of A not exterior to B or vice versa
    for p in da.all_vertices():
        if db.locate(p[0], p[1]) != EXT:
            return True
    for p in db.all_vertices():
        if da.locate(p[0], p[1]) != EXT:
            return True
    # segment crossings (lineal + ring edges)
    segs_a = np.concatenate([da.segments(), da.ring_segments()]) if (len(da.segments()) or len(da.ring_segments())) else np.empty((0, 2, 2))
    segs_b = np.concatenate([db.segments(), db.ring_segments()]) if (len(db.segments()) or len(db.ring_segments())) else np.empty((0, 2, 2))
    for sa in segs_a:
        for sb in segs_b:
            kind, _ = _seg_seg(sa[0], sa[1], sb[0], sb[1])
            if kind != "none":
                return True
    return False


def _binary(ga: GeomArray, gb: GeomArray, fn) -> np.ndarray:
    n = len(ga)
    assert len(gb) == n
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        if ga.types[i] == MISSING or gb.types[i] == MISSING:
            continue
        da, db = prepared_decomp(ga, i), prepared_decomp(gb, i)
        if da.empty or db.empty:
            continue
        out[i] = fn(da, db)
    return out


def intersects(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    return _binary(ga, gb, _decomp_intersects)


def disjoint(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    n = len(ga)
    out = np.zeros(n, dtype=bool)
    for i in range(n):
        if ga.types[i] == MISSING or gb.types[i] == MISSING:
            continue  # missing -> False even for disjoint (ufuncs.c:296-298)
        da, db = prepared_decomp(ga, i), prepared_decomp(gb, i)
        if da.empty or db.empty:
            out[i] = True  # empty is disjoint from everything
            continue
        out[i] = not _decomp_intersects(da, db)
    return out


def contains(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """B in closure(A) and interiors intersect (predicates.py:470-521)."""

    def fn(da, db):
        if not _covered(db, da):
            return False
        ii, _ = _interiors_intersect(da, db)
        return ii

    return _binary(ga, gb, fn)


def within(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    return contains(gb, ga)


def covers(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """B in closure(A) (predicates.py:617-661)."""
    return _binary(ga, gb, lambda da, db: _covered(db, da))


def covered_by(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    return covers(gb, ga)


def contains_properly(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """B in interior(A): covered and B does not touch A's boundary
    (predicates.py:523-571)."""

    def fn(da, db):
        if not _covered(db, da):
            return False
        # no point of B on boundary of A: test B vertices + refined midpoints
        for p in db.all_vertices():
            if _decomp_locate_full(da, p) == BND:
                return False
        segs = np.concatenate([db.segments(), db.ring_segments()]) if (len(db.segments()) or len(db.ring_segments())) else np.empty((0, 2, 2))
        if len(segs):
            cutters = da.all_vertices()
            for seg in _split_segments_at(segs, cutters):
                m = (seg[0] + seg[1]) / 2.0
                if _decomp_locate_full(da, m) == BND:
                    return False
        return True

    return _binary(ga, gb, fn)


def _decomp_locate_full(d: _Decomp, p) -> int:
    return d.locate(p[0], p[1])


def touches(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """Intersect but interiors do not (predicates.py:822-861)."""

    def fn(da, db):
        if not _decomp_intersects(da, db):
            return False
        ii, _ = _interiors_intersect(da, db)
        return not ii

    return _binary(ga, gb, fn)


def crosses(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """Interiors intersect with dim < min(dim A, dim B), and neither
    contains the other (predicates.py:420-469)."""

    def fn(da, db):
        ii, dim = _interiors_intersect(da, db)
        if not ii:
            return False
        if da.dim == 1 and db.dim == 1:
            return dim == 0
        if min(da.dim, db.dim) == 0 and max(da.dim, db.dim) > 0:
            # puntal vs higher-dim: crosses iff some point interior and
            # some point exterior (multipoint case)
            other = db if da.dim == 0 else da
            pts = da.points if da.dim == 0 else db.points
            locs = _locate_many(other, pts)
            return bool((locs == INT).any() and (locs == EXT).any())
        if min(da.dim, db.dim) == 1 and max(da.dim, db.dim) == 2:
            dl = da if da.dim == 1 else db
            dp = db if da.dim == 1 else da
            # line partially inside and partially outside
            segs = dl.segments()
            cutters = np.concatenate([dp.all_vertices(), _crossing_points(segs, dp.ring_segments())])
            some_in = some_out = False
            for seg in _split_segments_at(segs, cutters):
                m = (seg[0] + seg[1]) / 2.0
                loc = _point_in_polyset(dp, m[0], m[1])
                some_in |= loc == INT
                some_out |= loc == EXT
            return some_in and some_out
        return False

    return _binary(ga, gb, fn)


def overlaps(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """Same dim, interiors intersect at that dim, neither covers the
    other (predicates.py:768-821)."""

    def fn(da, db):
        if da.dim != db.dim:
            return False
        ii, dim = _interiors_intersect(da, db)
        if not ii:
            return False
        if da.dim == 0:
            # multipoints sharing some but not all
            la = _locate_many(db, da.points)
            lb = _locate_many(da, db.points)
            return bool((la == INT).any() and (la == EXT).any() and (lb == EXT).any())
        if dim != da.dim:
            return False
        return not _covered(da, db) and not _covered(db, da)

    return _binary(ga, gb, fn)


def equals(ga: GeomArray, gb: GeomArray) -> np.ndarray:
    """Topological equality = covers both ways (predicates.py:703-734)."""

    def fn(da, db):
        return _covered(da, db) and _covered(db, da)

    return _binary(ga, gb, fn)


def dwithin(ga: GeomArray, gb: GeomArray, distance: float) -> np.ndarray:
    """distance(a, b) <= d (predicates.py:1009-1042; GEOS >= 3.10)."""
    from rayspatial.geom.measures import distance as _dist

    d = _dist(ga, gb)
    with np.errstate(invalid="ignore"):
        return np.asarray(d <= distance) & ~np.isnan(d)
