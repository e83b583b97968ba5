"""STRtree — Sort-Tile-Recursive packed R-tree over a GeomArray.

Parity target: reference ``pygeos/strtree.py`` + ``src/strtree.c``:

- skips missing and empty geometries at build (strtree.c:182-199);
- ``query(geometry, predicate=None, distance=None)`` — envelope filter
  then predicate refinement, predicate direction is
  ``predicate(input_geometry, tree_geometry)`` (strtree.py:65-133);
- ``query_bulk`` — the inner spatial join, output ``(2, n)`` sorted by
  input index; None/empty probes omitted (strtree.py:135-228,
  strtree.c:434-580);
- ``nearest`` / ``nearest_all(max_distance, return_distance)``
  (strtree.py:231-355).  The reference's tie order is explicitly
  nondeterministic (strtree.py:236-238); this engine defines the
  deterministic rule: lowest tree index first.
- ``dwithin(geometry, distance)`` join (strtree.c:1064-1278).

Layout: flat two-level structure in numpy — STR-sorted item order +
packed leaves (default ``leafsize=10`` like the reference) with leaf
bounds.  Probe batches test leaf bounds vectorized (probes x leaves),
then refine matched leaves' items; the point-in-polygon refinement is
vectorized per tree polygon (all probes hitting one polygon tested in
one ``points_in_polygon`` call) — the engine analogue of the
reference's prepare-once-per-probe trick (strtree.c:284-293).
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom import measures as M
from rayspatial.geom import predicates as P
from rayspatial.geom.array import GeomArray

VALID_PREDICATES = {
    "intersects",
    "within",
    "contains",
    "overlaps",
    "crosses",
    "touches",
    "covers",
    "covered_by",
    "contains_properly",
}


def _str_pack(centers: np.ndarray, leafsize: int) -> tuple[np.ndarray, np.ndarray]:
    """Sort-Tile-Recursive leaf assignment.

    Returns (order, leaf_off): items reordered by STR packing and leaf
    boundaries into that order."""
    n = len(centers)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.zeros(1, dtype=np.int64)
    nleaves = int(np.ceil(n / leafsize))
    nslices = int(np.ceil(np.sqrt(nleaves)))
    per_slice = int(np.ceil(n / nslices))
    by_x = np.argsort(centers[:, 0], kind="stable")
    order_parts = []
    for s in range(0, n, per_slice):
        sl = by_x[s : s + per_slice]
        sl = sl[np.argsort(centers[sl, 1], kind="stable")]
        order_parts.append(sl)
    order = np.concatenate(order_parts)
    starts = np.arange(0, n, leafsize, dtype=np.int64)
    leaf_off = np.concatenate([starts, [n]])
    return order, leaf_off


class STRtree:
    def __init__(self, geometries: GeomArray, leafsize: int = 10):
        self.geometries = geometries
        self.leafsize = int(leafsize)
        b = geometries.bounds()
        valid = ~np.isnan(b[:, 0])
        self._idx = np.flatnonzero(valid)  # original indexes of tree items
        self._bounds = b[valid]
        centers = np.column_stack(
            [(self._bounds[:, 0] + self._bounds[:, 2]) / 2.0,
             (self._bounds[:, 1] + self._bounds[:, 3]) / 2.0]
        )
        order, leaf_off = _str_pack(centers, self.leafsize)
        self._order = order  # into self._idx/_bounds
        self._leaf_off = leaf_off
        nl = len(leaf_off) - 1
        self._leaf_bounds = np.empty((nl, 4), dtype=np.float64)
        ob = self._bounds[order] if len(order) else self._bounds
        for li in range(nl):
            s, e = leaf_off[li], leaf_off[li + 1]
            self._leaf_bounds[li, 0] = ob[s:e, 0].min()
            self._leaf_bounds[li, 1] = ob[s:e, 1].min()
            self._leaf_bounds[li, 2] = ob[s:e, 2].max()
            self._leaf_bounds[li, 3] = ob[s:e, 3].max()
        # cached prepared decompositions for predicate refinement
        self._decomps: dict[int, P._Decomp] = {}
        self._geom_bounds = b  # by geometry index (NaN for missing)
        self._all_boxes_cache: bool | None = None

    def __len__(self) -> int:
        return len(self._idx)

    # -- candidate generation --------------------------------------------

    def _candidates(self, probe_bounds: np.ndarray, expand: float = 0.0):
        """(probe_row, tree_item_pos) pairs whose envelopes intersect.
        probe_bounds: (n,4); NaN rows (missing/empty) yield no pairs."""
        n = len(probe_bounds)
        if n == 0 or len(self._idx) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pb = probe_bounds
        if expand:
            pb = pb + np.asarray([-expand, -expand, expand, expand])
        lb = self._leaf_bounds
        out_p, out_t = [], []
        # bound the dense probes x leaves matrix at ~4M cells per pass:
        # small layers (few leaves) take big probe chunks in ONE pass
        # instead of paying 16 numpy-kernel launches per 2048 probes
        CHUNK = int(min(max(2048, 4_000_000 // max(len(lb), 1)), 262_144))
        for s in range(0, n, CHUNK):
            pc = pb[s : s + CHUNK]
            # probes x leaves envelope test
            hit = (
                (pc[:, None, 0] <= lb[None, :, 2])
                & (pc[:, None, 2] >= lb[None, :, 0])
                & (pc[:, None, 1] <= lb[None, :, 3])
                & (pc[:, None, 3] >= lb[None, :, 1])
            )
            pi, li = np.nonzero(hit)
            if not len(pi):
                continue
            # expand leaves to items — vectorized ragged arange (a
            # per-leaf np.arange list-comp here was the joiner's top
            # profile line at 200k+ calls per 8M-row run)
            starts = self._leaf_off[li]
            counts = self._leaf_off[li + 1] - starts
            rep_p = np.repeat(pi, counts)
            total = int(counts.sum())
            if total:
                run_id = np.repeat(np.arange(len(li)), counts)
                cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
                within = np.arange(total, dtype=np.int64) - cum[run_id]
                item_pos = starts[run_id] + within
            else:
                item_pos = np.empty(0, dtype=np.int64)
            ib = self._bounds[self._order[item_pos]]
            pcb = pc[rep_p]
            ok = (
                (pcb[:, 0] <= ib[:, 2])
                & (pcb[:, 2] >= ib[:, 0])
                & (pcb[:, 1] <= ib[:, 3])
                & (pcb[:, 3] >= ib[:, 1])
            )
            out_p.append(rep_p[ok] + s)
            out_t.append(item_pos[ok])
        if not out_p:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        probe_rows = np.concatenate(out_p)
        tree_pos = np.concatenate(out_t)
        tree_items = self._idx[self._order[tree_pos]]
        # deterministic: sort by (probe, tree index)
        key = np.lexsort((tree_items, probe_rows))
        return probe_rows[key], tree_items[key]

    def _all_boxes(self) -> bool:
        """True when every tree geometry is an axis-aligned rectangle
        (single 5-point shell whose vertices hit only 2 distinct x and
        2 distinct y values) — unlocks the pure-numpy refine path.
        Computed once, vectorized."""
        if self._all_boxes_cache is None:
            ga = self.geometries
            ok = False
            if len(self._idx) and (ga.types[self._idx] == 3).all():
                counts = np.bincount(ga.part_geom, minlength=len(ga))
                sizes = np.diff(ga.part_off)
                if (counts[self._idx] == 1).all() and (
                    sizes == 5
                ).all() and (ga.part_kind == 2).all():
                    # each ring: x/y values equal the bounds corners
                    xs = ga.coords[:, 0].reshape(-1, 5)
                    ys = ga.coords[:, 1].reshape(-1, 5)
                    bb = self._geom_bounds[ga.part_geom]
                    ok = bool(
                        np.logical_or(xs == bb[:, [0]], xs == bb[:, [2]]).all()
                        and np.logical_or(ys == bb[:, [1]], ys == bb[:, [3]]).all()
                    )
            self._all_boxes_cache = ok
        return self._all_boxes_cache

    def _decomp(self, tree_i: int) -> "P._Decomp":
        d = self._decomps.get(tree_i)
        if d is None:
            d = P._Decomp(self.geometries, tree_i)
            self._decomps[tree_i] = d
        return d

    # -- public API --------------------------------------------------------

    def query_bulk(
        self, probes: GeomArray, predicate: str | None = None, distance: float | None = None
    ) -> np.ndarray:
        """Inner spatial join; returns (2, n) [probe_idx; tree_idx]."""
        if predicate == "dwithin":
            if distance is None:
                raise ValueError("distance parameter must be provided for dwithin predicate")
            return self.dwithin(probes, distance)
        if predicate is not None and predicate not in VALID_PREDICATES:
            raise ValueError(f"invalid predicate: {predicate!r}")
        pb = probes.bounds()
        probe_rows, tree_items = self._candidates(pb)
        if predicate is None or not len(probe_rows):
            return np.stack([probe_rows, tree_items])
        keep = self._refine(probes, probe_rows, tree_items, predicate)
        return np.stack([probe_rows[keep], tree_items[keep]])

    def _refine(
        self,
        probes: GeomArray,
        probe_rows: np.ndarray,
        tree_items: np.ndarray,
        predicate: str,
    ) -> np.ndarray:
        """Boolean mask of candidate pairs satisfying
        predicate(probe, tree_geometry)."""
        keep = np.zeros(len(probe_rows), dtype=bool)
        # vectorized fast path: point probes against polygon tree items for
        # interior/boundary predicates
        probe_is_point = _single_point_mask(probes)
        fast = {"intersects", "within", "covered_by", "contains_properly", "touches", "covers", "contains", "crosses", "overlaps"}
        # fastest path: ALL probes points + ALL tree geoms axis-aligned
        # boxes -> one pure-numpy location pass over the pair arrays
        # (no per-tree-item grouping at all)
        # box-probe fast path: ALL probes axis-aligned positive-area
        # rectangles x ALL tree geoms boxes -> every predicate in
        # `fast` is closed-form interval arithmetic on the bounds
        # (tile-join workloads: box layers probed with box tiles).
        if predicate in fast and self._all_boxes():
            bb = self._geom_bounds[tree_items]
            tree_pos = ((bb[:, 2] > bb[:, 0]) & (bb[:, 3] > bb[:, 1]))
            if (
                tree_pos.all()
                and not probe_is_point[probe_rows].any()
                and _pos_box_mask(probes)[probe_rows].all()
            ):
                return _box_box_predicate(
                    probes.bounds()[probe_rows], bb, predicate)
        if (
            predicate in fast
            and probe_is_point[probe_rows].all()
            and self._all_boxes()
        ):
            px, py = _point_coords(probes)
            bb = self._geom_bounds[tree_items]
            x = px[probe_rows]
            y = py[probe_rows]
            strict = (
                (x > bb[:, 0]) & (x < bb[:, 2]) & (y > bb[:, 1]) & (y < bb[:, 3])
            )
            on = (
                (x >= bb[:, 0]) & (x <= bb[:, 2]) & (y >= bb[:, 1]) & (y <= bb[:, 3])
            ) & ~strict
            loc = np.full(len(probe_rows), P.EXT, dtype=np.int8)
            loc[strict] = P.INT
            loc[on] = P.BND
            return _point_loc_predicate(loc, predicate)
        if predicate in fast:
            # group pairs by tree item; point probes evaluated in bulk
            px, py = _point_coords(probes)
            order = np.argsort(tree_items, kind="stable")
            sorted_items = tree_items[order]
            starts = np.flatnonzero(np.r_[True, sorted_items[1:] != sorted_items[:-1]])
            starts = np.append(starts, len(sorted_items))
            for si in range(len(starts) - 1):
                sl = order[starts[si] : starts[si + 1]]
                ti = int(sorted_items[starts[si]])
                rows = probe_rows[sl]
                pmask = probe_is_point[rows]
                dtree = self._decomp(ti)
                # bulk point path (only when the tree geometry is polygonal
                # or the predicate reduces to a location test)
                if pmask.any() and dtree.polys and not dtree.lines and not len(dtree.points):
                    prow = rows[pmask]
                    loc = _locate_in_polyset(dtree, px[prow], py[prow])
                    res = _point_loc_predicate(loc, predicate)
                    keep[sl[pmask]] = res
                    rest = sl[~pmask]
                else:
                    rest = sl
                for k in rest:
                    keep[k] = _pair_predicate(
                        probes, int(probe_rows[k]), self.geometries, int(tree_items[k]), predicate
                    )
            return keep
        for k in range(len(probe_rows)):
            keep[k] = _pair_predicate(
                probes, int(probe_rows[k]), self.geometries, int(tree_items[k]), predicate
            )
        return keep

    def query(
        self, probe: GeomArray, predicate: str | None = None, distance: float | None = None
    ) -> np.ndarray:
        """Single-probe query; ``probe`` is a length-1 GeomArray.
        Returns tree indexes."""
        res = self.query_bulk(probe, predicate=predicate, distance=distance)
        return res[1]

    def nearest(self, probes: GeomArray) -> np.ndarray:
        """(2, n) nearest tree item per probe; ties -> lowest tree index
        (deterministic; the reference leaves tie order unspecified,
        strtree.py:236-238).  None/empty probes omitted."""
        idx, tree, _ = self._nearest_impl(probes, all_ties=False, max_distance=None)
        return np.stack([idx, tree])

    def nearest_all(
        self,
        probes: GeomArray,
        max_distance: float | None = None,
        return_distance: bool = False,
    ):
        idx, tree, dist = self._nearest_impl(probes, all_ties=True, max_distance=max_distance)
        out = np.stack([idx, tree])
        if return_distance:
            return out, dist
        return out

    def _nearest_impl(self, probes: GeomArray, all_ties: bool, max_distance):
        pb = probes.bounds()
        n = len(pb)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                 np.empty(0))
        if not len(self._idx) or n == 0:
            return empty
        ob = self._bounds[self._order]
        tis = self._idx[self._order].astype(np.int64)
        T = len(ob)
        cap0 = np.inf if max_distance is None else float(max_distance)
        # fast path: point probes vs an all-box tree — the bbox lower
        # bound IS the exact distance (0 inside the rectangle), so the
        # whole nearest search is a blockwise matrix min (micro-bench:
        # 0.7k -> >100k probes/s at 2k boxes; round-3 verdict item 10)
        fast = self._all_boxes() and bool(_single_point_mask(probes).all())
        out_p: list = []
        out_t: list = []
        out_d: list = []
        block = int(min(max(512, 4_000_000 // max(T, 1)), 262_144))
        BIGI = np.int64(2 ** 62)
        for s in range(0, n, block):
            pc = pb[s:s + block]
            rows = np.flatnonzero(~np.isnan(pc[:, 0]))
            if not len(rows):
                continue
            pcv = pc[rows]
            dx = np.maximum(
                np.maximum(ob[None, :, 0] - pcv[:, 2, None],
                           pcv[:, 0, None] - ob[None, :, 2]), 0.0)
            dy = np.maximum(
                np.maximum(ob[None, :, 1] - pcv[:, 3, None],
                           pcv[:, 1, None] - ob[None, :, 3]), 0.0)
            lb = np.hypot(dx, dy)          # (rows, T) lower bounds
            if fast:
                best = lb.min(axis=1)
                ok = best <= cap0
                if not ok.any():
                    continue
                if all_ties:
                    ties = lb[ok] == best[ok, None]
                    rr, cc = np.nonzero(ties)
                    # deterministic (probe, tree index) order
                    t_sel = tis[cc]
                    key = np.lexsort((t_sel, rr))
                    out_p.append((rows[ok][rr] + s)[key])
                    out_t.append(t_sel[key])
                    out_d.append(best[ok][rr][key])
                else:
                    # lowest tree index among exact-min ties
                    masked = np.where(lb[ok] == best[ok, None],
                                      tis[None, :], BIGI)
                    out_p.append(rows[ok] + s)
                    out_t.append(masked.min(axis=1))
                    out_d.append(best[ok])
                continue
            # general path: seed an upper bound with the true distance
            # of the argmin-lb candidate, prune to lb <= min(ub, cap),
            # then refine the (small) survivor set in lb order
            first = np.argmin(lb, axis=1)
            for k, r in enumerate(rows):
                i = int(s + r)
                ub = M._geom_dist(probes, i, self.geometries,
                                  int(tis[first[k]]))
                cap = min(cap0, ub) if not np.isnan(ub) else cap0
                cand = np.flatnonzero(lb[k] <= cap)
                cand = cand[np.argsort(lb[k][cand], kind="stable")]
                best = np.inf
                best_items: list[tuple[int, float]] = []
                for pos in cand:
                    if lb[k][pos] > best:
                        break
                    ti = int(tis[pos])
                    d = M._geom_dist(probes, i, self.geometries, ti)
                    if np.isnan(d) or d > cap0:
                        continue
                    if d < best - 1e-24:
                        best = d
                        best_items = [(ti, d)]
                    elif d <= best:
                        best_items.append((ti, d))
                if not best_items:
                    continue
                best_items.sort()
                if all_ties:
                    for ti, d in best_items:
                        out_p.append(np.asarray([i], dtype=np.int64))
                        out_t.append(np.asarray([ti], dtype=np.int64))
                        out_d.append(np.asarray([d]))
                else:
                    out_p.append(np.asarray([i], dtype=np.int64))
                    out_t.append(np.asarray([best_items[0][0]],
                                            dtype=np.int64))
                    out_d.append(np.asarray([best_items[0][1]]))
        if not out_p:
            return empty
        return (
            np.concatenate(out_p).astype(np.int64),
            np.concatenate(out_t).astype(np.int64),
            np.concatenate(out_d).astype(np.float64),
        )

    def dwithin(self, probes: GeomArray, distance: float) -> np.ndarray:
        """(2, n) pairs within ``distance`` (strtree.c:1064-1278)."""
        pb = probes.bounds()
        probe_rows, tree_items = self._candidates(pb, expand=float(distance))
        if not len(probe_rows):
            return np.stack([probe_rows, tree_items])
        keep = np.zeros(len(probe_rows), dtype=bool)
        # fast path: point probes vs point tree items
        px, py = _point_coords(probes)
        probe_is_point = _single_point_mask(probes)
        tree_is_point = _single_point_mask(self.geometries)
        tx, ty = _point_coords(self.geometries)
        both = probe_is_point[probe_rows] & tree_is_point[tree_items]
        if both.any():
            d = np.hypot(
                px[probe_rows[both]] - tx[tree_items[both]],
                py[probe_rows[both]] - ty[tree_items[both]],
            )
            keep[both] = d <= distance
        rest = np.flatnonzero(~both)
        for k in rest:
            d = M._geom_dist(probes, int(probe_rows[k]), self.geometries, int(tree_items[k]))
            keep[k] = (not np.isnan(d)) and d <= distance
        return np.stack([probe_rows[keep], tree_items[keep]])


# ---------------------------------------------------------------------------
# helpers


def _pos_box_mask(ga: GeomArray) -> np.ndarray:
    """Geometries that are a single-ring axis-aligned POSITIVE-AREA
    rectangle (5-point closed ring, every edge axis-parallel, exactly
    2 distinct x and 2 distinct y values).  Stricter than the tree's
    _all_boxes (rejects bowtie vertex orders and degenerate boxes) —
    the box-box closed forms assume nonempty interiors."""
    n = len(ga)
    ok = np.zeros(n, dtype=bool)
    if not ga.n_parts:
        return ok
    counts = np.bincount(ga.part_geom, minlength=n)
    sizes = np.diff(ga.part_off)
    cand = (
        (ga.part_kind == 2) & (sizes == 5)
        & (counts[ga.part_geom] == 1) & (ga.types[ga.part_geom] == 3)
    )
    if not cand.any():
        return ok
    pid = np.flatnonzero(cand)
    idx = ga.part_off[pid][:, None] + np.arange(5)[None, :]
    xs = ga.coords[idx, 0]
    ys = ga.coords[idx, 1]
    xmin, xmax = xs.min(1), xs.max(1)
    ymin, ymax = ys.min(1), ys.max(1)
    corner = (
        ((xs == xmin[:, None]) | (xs == xmax[:, None])).all(1)
        & ((ys == ymin[:, None]) | (ys == ymax[:, None])).all(1)
    )
    closed = (xs[:, 0] == xs[:, 4]) & (ys[:, 0] == ys[:, 4])
    # each edge changes exactly ONE coordinate -> true rectangle
    # traversal, not a self-intersecting corner order
    rect = np.logical_xor(
        xs[:, :-1] == xs[:, 1:], ys[:, :-1] == ys[:, 1:]).all(1)
    isbox = corner & closed & rect & (xmin < xmax) & (ymin < ymax)
    ok[ga.part_geom[pid[isbox]]] = True
    return ok


def _box_box_predicate(a: np.ndarray, b: np.ndarray,
                       predicate: str) -> np.ndarray:
    """Vectorized predicate(A, B) for paired positive-area axis-aligned
    boxes given as (n, 4) [xmin ymin xmax ymax] bounds rows.  Closed
    forms are exact for nonempty interiors: closed containment of a
    positive-area box implies interior intersection, so
    contains == covers on this domain (reference ufuncs.c predicate
    table semantics)."""
    ax0, ay0, ax1, ay1 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bx0, by0, bx1, by1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    ix = (ax0 < bx1) & (bx0 < ax1) & (ay0 < by1) & (by0 < ay1)
    cx = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
    acb = (ax0 <= bx0) & (ax1 >= bx1) & (ay0 <= by0) & (ay1 >= by1)
    bca = (bx0 <= ax0) & (bx1 >= ax1) & (by0 <= ay0) & (by1 >= ay1)
    if predicate == "intersects":
        return cx
    if predicate in ("covers", "contains"):
        return acb
    if predicate in ("covered_by", "within"):
        return bca
    if predicate == "contains_properly":
        return (ax0 < bx0) & (ax1 > bx1) & (ay0 < by0) & (ay1 > by1)
    if predicate == "touches":
        return cx & ~ix
    if predicate == "overlaps":
        return ix & ~acb & ~bca
    if predicate == "crosses":  # equal-dimension areas never cross
        return np.zeros(len(a), dtype=bool)
    raise AssertionError(f"unreachable box-box predicate {predicate!r}")


def _single_point_mask(ga: GeomArray) -> np.ndarray:
    """Geometries that are exactly one point part."""
    n = len(ga)
    counts = np.zeros(n, dtype=np.int64)
    pointish = np.zeros(n, dtype=np.int64)
    if ga.n_parts:
        np.add.at(counts, ga.part_geom, 1)
        np.add.at(pointish, ga.part_geom, (ga.part_kind == 0).astype(np.int64))
    return (counts == 1) & (pointish == 1)


def _point_coords(ga: GeomArray) -> tuple[np.ndarray, np.ndarray]:
    """First coordinate of each geometry (valid where _single_point_mask)."""
    n = len(ga)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    if ga.n_parts:
        first = ga.part_off[:-1]
        x[ga.part_geom] = ga.coords[first, 0]
        y[ga.part_geom] = ga.coords[first, 1]
    return x, y


def _locate_in_polyset(d: "P._Decomp", px: np.ndarray, py: np.ndarray) -> np.ndarray:
    loc = np.full(len(px), P.EXT, dtype=np.int8)
    on_any = np.zeros(len(px), dtype=bool)
    for shell, holes in d.polys:
        ins, on = P._pip_ring_bulk(px, py, shell)
        on_any |= on
        interior = ins & ~on
        for hole in holes:
            hins, hon = P._pip_ring_bulk(px, py, hole)
            on_any |= hon
            interior &= ~(hins | hon)
        loc[interior] = P.INT
    loc[on_any & (loc != P.INT)] = P.BND
    return loc


def _point_loc_predicate(loc: np.ndarray, predicate: str) -> np.ndarray:
    """predicate(point_probe, polygon_tree) from the point's location."""
    if predicate in ("intersects",):
        return loc != P.EXT
    if predicate in ("within", "contains_properly"):
        # contains_properly(probe, tree): tree in interior(probe) — a point
        # probe can never properly contain a polygon
        if predicate == "contains_properly":
            return np.zeros(len(loc), dtype=bool)
        return loc == P.INT
    if predicate == "covered_by":
        return loc != P.EXT
    if predicate == "touches":
        return loc == P.BND
    if predicate in ("contains", "covers", "overlaps", "crosses"):
        # a point cannot contain/cover/overlap/cross a polygon
        return np.zeros(len(loc), dtype=bool)
    raise ValueError(predicate)


def _pair_predicate(ga: GeomArray, i: int, gb: GeomArray, j: int, predicate: str) -> bool:
    da = P._Decomp(ga, i)
    db = P._Decomp(gb, j)
    if da.empty or db.empty:
        return False
    if predicate == "intersects":
        return P._decomp_intersects(da, db)
    if predicate == "within":
        ii, _ = P._interiors_intersect(da, db)
        return ii and P._covered(da, db)
    if predicate == "contains":
        ii, _ = P._interiors_intersect(da, db)
        return ii and P._covered(db, da)
    if predicate == "covers":
        return P._covered(db, da)
    if predicate == "covered_by":
        return P._covered(da, db)
    if predicate == "contains_properly":
        sub = P.contains_properly(
            _slice_geom(ga, i), _slice_geom(gb, j)
        )
        return bool(sub[0])
    if predicate == "touches":
        if not P._decomp_intersects(da, db):
            return False
        ii, _ = P._interiors_intersect(da, db)
        return not ii
    if predicate == "crosses":
        return bool(P.crosses(_slice_geom(ga, i), _slice_geom(gb, j))[0])
    if predicate == "overlaps":
        return bool(P.overlaps(_slice_geom(ga, i), _slice_geom(gb, j))[0])
    raise ValueError(predicate)


def _slice_geom(ga: GeomArray, i: int) -> GeomArray:
    """Length-1 GeomArray view of geometry i."""
    sel = np.flatnonzero(ga.part_geom == i)
    if len(sel):
        chunks = [ga.part_coords(p) for p in sel]
        lens = [len(c) for c in chunks]
        coords = np.concatenate(chunks)
        part_off = np.concatenate([[0], np.cumsum(lens)])
        z = None
        if ga.z is not None:
            z = np.concatenate(
                [ga.z[ga.part_off[p] : ga.part_off[p + 1]] for p in sel]
            )
    else:
        coords = np.empty((0, 2))
        part_off = np.zeros(1, dtype=np.int64)
        z = None
    return GeomArray(
        types=ga.types[i : i + 1].copy(),
        part_geom=np.zeros(len(sel), dtype=np.int64),
        part_kind=ga.part_kind[sel].copy(),
        part_sub=ga.part_sub[sel].copy(),
        part_off=np.asarray(part_off, dtype=np.int64),
        coords=coords,
        z=z,
        has_z=ga.has_z[i : i + 1].copy() if ga.has_z is not None else None,
    )
