"""Lineal & mixed-type set operations.

Covers the operand pairs the polygon-only overlay (geom/overlay.py)
does not: any pair involving LINESTRING / LINEARRING /
MULTILINESTRING / MULTIPOINT / GEOMETRYCOLLECTION operands, and
mixed-dimension results (reference pygeos/set_operations.py:22-332
supports the full type matrix; exercised by reference
pygeos/tests/test_set_operations.py over ``all_types``).

Method — dimension decomposition over a shared noded arrangement:

1. each input decomposes into (points, lineal paths, polygon rings);
2. ALL lineal + polygon-boundary segments of both operands are noded
   together (geom/overlay._node_all_multi, sources tagged), so every
   noded segment lies entirely inside / outside / on the boundary of
   each operand, and every lineal 0-D intersection is a graph node;
3. per-dimension point-set rules pick the result:
   - faces: delegated to overlay_rings (both operands polygonal) or
     passed through (one-sided);
   - segments: midpoint classification against each operand's closure;
   - points: closure-membership of original points + graph nodes;
   and lower-dimensional pieces covered by a higher-dimensional result
   part are dropped (GEOS overlay semantics);
4. surviving segments merge into maximal chains through degree-2
   nodes; output pieces are canonically ordered (deterministic).

Scale note: this runs per geometry PAIR inside a map_batches worker —
same per-batch O(segs^2) envelope as geom/overlay; the distributed
layer never ships more than a block's geometries into one call.
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import (
    GEOMETRYCOLLECTION,
    LINESTRING,
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
from rayspatial.geom.overlay import (
    _even_odd_inside,
    _node_all_multi,
    _rings_to_segs,
    overlay_rings,
)

__all__ = ["general_pair_setop", "union_all_general"]

_EPS = 1e-9

# noding source tags: A's lineal parts, A's polygon boundary, B's
# lineal parts, B's polygon boundary
_SRC_LA, _SRC_RA, _SRC_LB, _SRC_RB = 0, 1, 2, 3


def _decompose(ga: GeomArray, i: int):
    """-> (points (n,2), lineal paths, polygons [(shell, [holes])],
    all polygon rings flat)."""
    pts: list[np.ndarray] = []
    lines: list[np.ndarray] = []
    shells: dict[int, np.ndarray] = {}
    holes: dict[int, list[np.ndarray]] = {}
    sub_order: list[int] = []
    for p in np.flatnonzero(ga.part_geom == i):
        k = int(ga.part_kind[p])
        xy = ga.part_coords(p)
        if k == PK_POINT:
            pts.append(xy)
        elif k == PK_LINE:
            lines.append(xy)
        elif k == PK_SHELL:
            sub = int(ga.part_sub[p])
            shells[sub] = xy
            sub_order.append(sub)
        elif k == PK_HOLE:
            holes.setdefault(int(ga.part_sub[p]), []).append(xy)
    P = np.vstack(pts) if pts else np.empty((0, 2))
    polys = [(shells[s], holes.get(s, [])) for s in sub_order]
    rings = [r for s in sub_order for r in [shells[s]] + holes.get(s, [])]
    return P, lines, polys, rings


def _dim(P, lines, rings) -> int:
    if rings:
        return 2
    if lines:
        return 1
    if len(P):
        return 0
    return -1  # empty


_DIM_TYPE = {0: POINT, 1: LINESTRING, 2: POLYGON, -1: GEOMETRYCOLLECTION}


def _lines_to_segs(paths):
    """Open lineal paths -> segment list (UNLIKE _rings_to_segs, never
    closes the path; linearrings arrive already closed)."""
    segs = []
    for r in paths:
        for k in range(len(r) - 1):
            if (r[k] != r[k + 1]).any():
                segs.append((r[k].astype(float), r[k + 1].astype(float)))
    return segs


def _segs_np(seg_list):
    if not seg_list:
        return np.empty((0, 2)), np.empty((0, 2))
    A = np.stack([np.asarray(s[0], float) for s in seg_list])
    B = np.stack([np.asarray(s[1], float) for s in seg_list])
    return A, B


def _on_segs(q: np.ndarray, A: np.ndarray, B: np.ndarray) -> bool:
    """q within _EPS of any segment [A[k], B[k]] (vectorized)."""
    if not len(A):
        return False
    d = B - A
    r = q[None, :] - A
    cross = d[:, 0] * r[:, 1] - d[:, 1] * r[:, 0]
    ll = (d * d).sum(axis=1)
    ln = np.sqrt(np.maximum(ll, 1e-300))
    t = (r * d).sum(axis=1) / np.where(ll == 0, 1.0, ll)
    near_line = np.abs(cross) / ln <= _EPS
    on = near_line & (t >= -_EPS) & (t <= 1 + _EPS)
    # degenerate zero-length segments: plain proximity
    on |= (ll == 0) & (np.abs(r).max(axis=1) <= _EPS)
    return bool(on.any())


def _in_closure(q, P, segA, segB, rings) -> bool:
    """q in the closure of the operand decomposed as (P, segments,
    rings): equals an own point, lies on a lineal/boundary segment, or
    is inside the polygonal region (even-odd)."""
    if len(P) and bool((np.abs(P - q[None, :]) <= _EPS).all(axis=1).any()):
        return True
    if _on_segs(q, segA, segB):
        return True
    return bool(rings) and _even_odd_inside(q, rings)


def _merge_chains(segs: list[tuple]) -> list[np.ndarray]:
    """Merge noded segments into maximal chains through degree-2 nodes
    (deterministic: nodes and neighbours visited in sorted order).
    Closed cycles with all nodes degree 2 become closed chains."""
    from collections import defaultdict

    adj: dict[tuple, list[tuple]] = defaultdict(list)
    for a, b in segs:
        adj[a].append(b)
        adj[b].append(a)
    for k in adj:
        adj[k].sort()
    used: set[tuple] = set()

    def seg_key(a, b):
        return (a, b) if a <= b else (b, a)

    chains: list[np.ndarray] = []

    def walk(start, nxt):
        chain = [start, nxt]
        used.add(seg_key(start, nxt))
        while len(adj[chain[-1]]) == 2:
            a, b = adj[chain[-1]]
            nn = a if b == chain[-2] else b
            if seg_key(chain[-1], nn) in used:
                break
            used.add(seg_key(chain[-1], nn))
            chain.append(nn)
        return np.asarray(chain, dtype=float)

    ends = sorted(n for n, nb in adj.items() if len(nb) != 2)
    for n in ends:
        for nb in adj[n]:
            if seg_key(n, nb) not in used:
                chains.append(walk(n, nb))
    # remaining segments form pure cycles
    for a, b in sorted(seg_key(*s) for s in segs):
        if (a, b) not in used:
            chains.append(walk(a, b))
    # canonical orientation: smaller endpoint first (open chains)
    out = []
    for c in chains:
        if tuple(c[0]) > tuple(c[-1]):
            c = c[::-1]
        out.append(c)
    out.sort(key=lambda c: (tuple(c[0]), tuple(c[-1]), len(c)))
    return out


def _emit(b: _Builder, out_row: int, polys, chains, pts: np.ndarray,
          empty_type: int) -> None:
    """Assemble pieces into one geometry row of ``b``."""
    npolys, nlines, npts = len(polys), len(chains), len(pts)
    total = npolys + nlines + npts
    if total == 0:
        b.types.append(empty_type)
        b.has_z.append(False)
        b.num_children.append(0)
        return
    cats = (npolys > 0) + (nlines > 0) + (npts > 0)
    if cats > 1:
        typ = GEOMETRYCOLLECTION
    elif npolys:
        typ = POLYGON if npolys == 1 else MULTIPOLYGON
    elif nlines:
        typ = LINESTRING if nlines == 1 else MULTILINESTRING
    else:
        typ = POINT if npts == 1 else MULTIPOINT
    b.types.append(typ)
    for shell, hole_list in polys:
        pid = b.poly_counter
        b.poly_counter += 1
        sh = shell if (shell[0] == shell[-1]).all() else np.vstack([shell, shell[:1]])
        b.add_part(out_row, PK_SHELL, pid, np.asarray(sh, float))
        for h in hole_list:
            hh = h if (h[0] == h[-1]).all() else np.vstack([h, h[:1]])
            b.add_part(out_row, PK_HOLE, pid, np.asarray(hh, float))
    for c in chains:
        b.add_part(out_row, PK_LINE, b.sub_counter, c)
        b.sub_counter += 1
    for k in range(npts):
        b.add_part(out_row, PK_POINT, b.sub_counter, pts[k : k + 1])
        b.sub_counter += 1
    b.has_z.append(False)
    b.num_children.append(total)


def _dedupe_points(pts: list[np.ndarray]) -> np.ndarray:
    if not pts:
        return np.empty((0, 2))
    arr = np.asarray(pts, dtype=float).reshape(-1, 2)
    snapped = np.round(arr / _EPS) * _EPS
    return np.unique(snapped, axis=0)


def general_pair_setop(ga: GeomArray, i: int, gb: GeomArray, j: int,
                       op: str) -> GeomArray:
    """One pairwise set operation, any operand types -> GeomArray[1].

    ``op`` in {intersection, union, difference, symmetric_difference}.
    """
    Pa, La, polysA, Ra = _decompose(ga, i)
    Pb, Lb, polysB, Rb = _decompose(gb, j)
    dima, dimb = _dim(Pa, La, Ra), _dim(Pb, Lb, Rb)
    b = _Builder()

    # ---- empty operands (GEOS: X op EMPTY keeps X except intersection)
    if dima < 0 or dimb < 0:
        if op == "intersection" or (dima < 0 and dimb < 0):
            d = dima if dimb < 0 else (dimb if dima < 0 else min(dima, dimb))
            _emit(b, 0, [], [], np.empty((0, 2)), _DIM_TYPE[d])
        elif dima < 0:  # union / symdiff with empty lhs -> rhs
            if op == "difference":
                _emit(b, 0, [], [], np.empty((0, 2)), _DIM_TYPE[dima])
            else:
                _emit(b, 0, polysB, Lb, Pb, _DIM_TYPE[dimb])
        else:  # rhs empty -> lhs
            _emit(b, 0, polysA, La, Pa, _DIM_TYPE[dima])
        return b.finish()

    # ---- node the shared arrangement
    segs, members = _node_all_multi([
        _lines_to_segs(La), _rings_to_segs(Ra),
        _lines_to_segs(Lb), _rings_to_segs(Rb),
    ])
    segAx, segAy = _segs_np(_lines_to_segs(La) + _rings_to_segs(Ra))
    segBx, segBy = _segs_np(_lines_to_segs(Lb) + _rings_to_segs(Rb))

    def in_clos_a(q):
        return _in_closure(q, Pa, segAx, segAy, Ra)

    def in_clos_b(q):
        return _in_closure(q, Pb, segBx, segBy, Rb)

    # ---- 2-D part
    if Ra and Rb:
        out_polys = overlay_rings(Ra, Rb, op)
    elif Ra:
        # lineal/puntal rhs never erodes area
        out_polys = polysA if op in ("union", "difference",
                                     "symmetric_difference") else []
    elif Rb:
        out_polys = polysB if op in ("union", "symmetric_difference") else []
    else:
        out_polys = []

    # ---- 1-D part: classify each noded segment by its midpoint
    kept_segs: list[tuple] = []
    for k, (a, bb) in enumerate(segs):
        av, bv = np.asarray(a, float), np.asarray(bb, float)
        m = (av + bv) / 2.0
        onLa = _SRC_LA in members[k]
        onBndA = _SRC_RA in members[k]
        onLb = _SRC_LB in members[k]
        onBndB = _SRC_RB in members[k]
        if not (onLa or onLb):
            continue  # pure boundary segments never emit linework here
        inRegA = bool(Ra) and (onBndA or _even_odd_inside(m, Ra))
        inRegB = bool(Rb) and (onBndB or _even_odd_inside(m, Rb))
        inClosA = inRegA or onLa
        inClosB = inRegB or onLb
        if op == "intersection":
            keep = ((onLa and inClosB) or (onLb and inClosA)) and not (
                inRegA and inRegB
            )
        elif op == "difference":
            keep = onLa and not inClosB and not inRegA
        elif op == "symmetric_difference":
            keep = (onLa and not inClosB and not inRegA) or (
                onLb and not inClosA and not inRegB
            )
        else:  # union: lines absorbed into any region's closure
            keep = not inRegA and not inRegB
        if keep:
            kept_segs.append((a, bb))
    chains = _merge_chains(kept_segs)

    # ---- 0-D part
    node_src: dict[tuple, set] = {}
    for k, (a, bb) in enumerate(segs):
        for endp in (a, bb):
            node_src.setdefault(endp, set()).update(members[k])
    cand: list[np.ndarray] = []
    if op == "intersection":
        for q in Pa:
            if in_clos_b(q):
                cand.append(q)
        for q in Pb:
            if in_clos_a(q):
                cand.append(q)
        for nd, src in node_src.items():
            if (src & {_SRC_LA, _SRC_RA}) and (src & {_SRC_LB, _SRC_RB}):
                cand.append(np.asarray(nd, float))
    elif op == "difference":
        cand = [q for q in Pa if not in_clos_b(q)]
    elif op == "symmetric_difference":
        cand = [q for q in Pa if not in_clos_b(q)] + [
            q for q in Pb if not in_clos_a(q)
        ]
    else:  # union
        cand = list(Pa) + list(Pb)
    # drop points covered by a higher-dimensional result piece
    keptAx, keptAy = _segs_np(kept_segs)
    pts_out: list[np.ndarray] = []
    for q in cand:
        q = np.asarray(q, float)
        if _on_segs(q, keptAx, keptAy):
            continue
        covered = False
        for shell, hole_list in out_polys:
            if _even_odd_inside(q, [shell] + list(hole_list)) or _on_segs(
                q, *_segs_np(_rings_to_segs([shell] + list(hole_list)))
            ):
                covered = True
                break
        if not covered:
            pts_out.append(q)
    pts_arr = _dedupe_points(pts_out)

    if op == "intersection":
        empty_t = _DIM_TYPE[min(dima, dimb)]
    elif op == "difference":
        empty_t = _DIM_TYPE[dima]
    else:
        empty_t = _DIM_TYPE[max(dima, dimb)]
    _emit(b, 0, out_polys, chains, pts_arr, empty_t)
    return b.finish()


def union_all_general(ga: GeomArray) -> GeomArray:
    """n-ary union over ANY mix of types -> GeomArray[1]
    (set_operations.py:314-396 union_all semantics): polygons union via
    the n-ary overlay, lines node + dissolve and are absorbed into
    polygon closures, points dedupe and are absorbed into lines or
    polygons."""
    all_pts: list[np.ndarray] = []
    all_lines: list[np.ndarray] = []
    poly_rows: list[list[np.ndarray]] = []  # per-source rings (even-odd)
    for i in range(len(ga)):
        if ga.types[i] == -1:
            continue
        P, L, polys, rings = _decompose(ga, i)
        all_pts.extend(P)
        all_lines.extend(L)
        if rings:
            poly_rows.append(rings)
    b = _Builder()

    # region: n-ary union of every polygonal source
    out_polys: list[tuple] = []
    if poly_rows:
        if len(poly_rows) == 1:
            # single polygonal source passes through structurally
            out_polys = _polys_of_rows(ga)
        else:
            from rayspatial.geom.overlay import nary_union

            sub = nary_union(_polygonal_subset(ga))
            _, _, out_polys, _ = _decompose(sub, 0)

    # lineal: node lines together with all polygon boundaries, keep
    # segments not absorbed by any region's closure
    segs, members = _node_all_multi(
        [_lines_to_segs(all_lines)]
        + [_rings_to_segs(r) for r in poly_rows]
    )
    kept: list[tuple] = []
    for k, (a, bb) in enumerate(segs):
        if 0 not in members[k]:
            continue
        on_bnd = any(s > 0 for s in members[k])
        m = (np.asarray(a, float) + np.asarray(bb, float)) / 2.0
        in_reg = on_bnd or any(
            _even_odd_inside(m, rings) for rings in poly_rows
        )
        if not in_reg:
            kept.append((a, bb))
    chains = _merge_chains(kept)

    # points: dedupe, drop those on kept lines or inside/on any region
    keptx, kepty = _segs_np(kept)
    linex, liney = _segs_np(_lines_to_segs(all_lines))
    bndx, bndy = _segs_np([s for r in poly_rows for s in _rings_to_segs(r)])
    pts_out = []
    for q in _dedupe_points(list(all_pts)):
        if _on_segs(q, linex, liney) or _on_segs(q, bndx, bndy):
            continue
        if any(_even_odd_inside(q, rings) for rings in poly_rows):
            continue
        pts_out.append(q)
    pts_arr = (
        np.asarray(pts_out).reshape(-1, 2) if pts_out else np.empty((0, 2))
    )
    _emit(b, 0, out_polys, chains, pts_arr, GEOMETRYCOLLECTION)
    return b.finish()


def _polygonal_subset(ga: GeomArray) -> GeomArray:
    """Rows' polygonal parts re-rowed as POLYGON/MULTIPOLYGON rows (so
    nary_union sees them even when they came from collections)."""
    b = _Builder()
    row = 0
    for i in range(len(ga)):
        _, _, polys, _ = _decompose(ga, i)
        if not polys:
            continue
        b.types.append(POLYGON if len(polys) == 1 else MULTIPOLYGON)
        for shell, holes in polys:
            pid = b.poly_counter
            b.poly_counter += 1
            b.add_part(row, PK_SHELL, pid, np.asarray(shell, float))
            for h in holes:
                b.add_part(row, PK_HOLE, pid, np.asarray(h, float))
        b.has_z.append(False)
        b.num_children.append(len(polys))
        row += 1
    return b.finish()


def _polys_of_rows(ga: GeomArray) -> list[tuple]:
    out = []
    for i in range(len(ga)):
        _, _, polys, _ = _decompose(ga, i)
        out.extend(polys)
    return out


def contact_off_closure(sub: GeomArray, chains, pts: np.ndarray):
    """Filter boundary-contact pieces down to those NOT on the closure
    of the areal result ``sub`` (GeomArray[1], polygonal).

    Supports the mixed-dimension GC output of poly x poly intersection
    (GEOS set_operations semantics): contact chains either coincide
    with ``sub``'s boundary (already part of the polygon) or lie wholly
    outside its closure — a shared-boundary segment can never cross the
    interior, since boundary(A) is disjoint from interior(A) and
    interior(sub) is contained in both interiors.  Per-segment midpoint
    membership decides; kept segments re-merge into maximal chains."""
    P, L, polys, R = _decompose(sub, 0)
    segx, segy = _segs_np(_rings_to_segs(R))

    def in_clos(q: np.ndarray) -> bool:
        return _in_closure(q, P, segx, segy, R)

    kept_segs: list[tuple] = []
    for c in chains:
        for s in range(len(c) - 1):
            mid = (np.asarray(c[s], float) + np.asarray(c[s + 1], float)) / 2.0
            if not in_clos(mid):
                kept_segs.append((tuple(c[s]), tuple(c[s + 1])))
    kept_chains = _merge_chains(kept_segs)
    A, B = _segs_np(kept_segs)
    out_pts = [
        np.asarray(p, float)
        for p in pts
        if not in_clos(np.asarray(p, float))
        and not _on_segs(np.asarray(p, float), A, B)
    ]
    return kept_chains, _dedupe_points(out_pts)


def poly_boundary_contact(ga: GeomArray, i: int, gb: GeomArray, j: int):
    """Lower-dimensional contact of two polygonal operands whose AREA
    intersection is empty (GEOS: edge-touching polygons intersect in
    linework, corner-touching in points): noded shared-boundary chains
    + touch nodes.  -> (chains, points (k,2))."""
    _, _, _, Ra = _decompose(ga, i)
    _, _, _, Rb = _decompose(gb, j)
    segs, members = _node_all_multi([_rings_to_segs(Ra), _rings_to_segs(Rb)])
    shared = [
        (a, b) for k, (a, b) in enumerate(segs) if members[k] >= {0, 1}
    ]
    chains = _merge_chains(shared)
    node_src: dict[tuple, set] = {}
    for k, (a, b) in enumerate(segs):
        for endp in (a, b):
            node_src.setdefault(endp, set()).update(members[k])
    A, B = _segs_np(shared)
    pts = [
        np.asarray(nd, float)
        for nd, src in node_src.items()
        if src >= {0, 1} and not _on_segs(np.asarray(nd, float), A, B)
    ]
    return chains, _dedupe_points(pts)
