"""Distributed k-nearest-neighbor join: points vs a broadcast polygon
layer, via cell-ring expansion (BASELINE.json north_star: "kNN via
cell-ring expansion" in batched numpy).

Per worker (built once, from the ``ray.put`` polygon payload): a
cell -> polygon-ids index at resolution ``res`` (each polygon is
registered in every cell its envelope touches).  Per point batch:

1. points are bucketed by their cell (vectorized);
2. for each bucket, candidate polygons are gathered from expanding
   cell rings r = 0, 1, 2, ... around the bucket's cell;
3. exact distances (point -> geometry; exact for boxes) are computed
   vectorized (m_points x n_candidates) and the running top-k kept;
4. expansion stops when the ring's guaranteed minimum distance (the
   distance from the bucket cell's bbox to the nearest unexplored
   ring) exceeds the current k-th best distance for every point in
   the bucket — the certification the reference's 1e-6 bbox-inflation
   trick approximates (src/strtree.c:654-695); ours is exact.

Ties broken deterministically by (distance, poly_id) — the reference
leaves nearest-tie order unspecified (strtree.py:236-238), so we
define ours (SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial import cell as cellmod


def _bbox_dist2(lon: np.ndarray, lat: np.ndarray, boxes: np.ndarray):
    """(m, n) squared distance from each point to each box envelope
    (exact distance when the geometry IS the box)."""
    dx = np.maximum(
        np.maximum(boxes[None, :, 0] - lon[:, None], lon[:, None] - boxes[None, :, 2]),
        0.0,
    )
    dy = np.maximum(
        np.maximum(boxes[None, :, 1] - lat[:, None], lat[:, None] - boxes[None, :, 3]),
        0.0,
    )
    return dx * dx + dy * dy


class CellPolyIndex:
    """cell(res) -> polygon ids whose envelope touches the cell."""

    def __init__(self, boxes: np.ndarray, poly_ids: np.ndarray, res: int):
        self.res = res
        self.boxes = boxes
        self.poly_ids = np.asarray(poly_ids, dtype=np.int64)
        buckets: dict[tuple[int, int], list[int]] = {}
        n_side = 1 << res
        for i in range(len(boxes)):
            x0, y0, x1, y1 = boxes[i]
            cx0, cy0 = cellmod.cell_xy(np.array([x0]), np.array([y0]), res)
            cx1, cy1 = cellmod.cell_xy(np.array([x1]), np.array([y1]), res)
            for cx in range(int(cx0[0]), int(cx1[0]) + 1):
                for cy in range(int(cy0[0]), int(cy1[0]) + 1):
                    buckets.setdefault((cx, cy), []).append(i)
        self.buckets = {k: np.asarray(v, dtype=np.int64) for k, v in buckets.items()}
        self.n_side = n_side
        self.cell_w = 360.0 / n_side
        self.cell_h = 180.0 / n_side

    def ring_members(self, cx: int, cy: int, r: int) -> np.ndarray:
        """Polygon row indices registered in ring r around (cx, cy)."""
        found: list[np.ndarray] = []
        if r == 0:
            hit = self.buckets.get((cx, cy))
            return hit if hit is not None else np.empty(0, dtype=np.int64)
        xs = range(max(cx - r, 0), min(cx + r, self.n_side - 1) + 1)
        ys = range(max(cy - r, 0), min(cy + r, self.n_side - 1) + 1)
        for x in xs:
            for y in ys:
                if max(abs(x - cx), abs(y - cy)) != r:
                    continue
                hit = self.buckets.get((x, y))
                if hit is not None:
                    found.append(hit)
        if not found:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(found))

    def ring_min_dist(self, cx: int, cy: int, r: int) -> float:
        """Lower bound on the distance from anywhere in cell (cx,cy) to
        geometry only reachable at ring > r: (r) full cells away in the
        cheaper axis."""
        return float(r) * min(self.cell_w, self.cell_h)


class KnnJoiner:
    """map_batches stage: point batch -> (input cols, poly_id, rank)
    k-nearest rows per point (fewer if max_distance prunes)."""

    def __init__(self, polygons_ref, k: int = 1, res: int = 5,
                 max_distance: float | None = None, max_ring: int | None = None,
                 lon_col: str = "lon", lat_col: str = "lat"):
        import ray

        payload = polygons_ref
        if not isinstance(payload, dict):
            payload = ray.get(polygons_ref)
        from rayspatial.geom.wkb import parse_wkb

        ga = parse_wkb(payload["wkb"])
        self.boxes = ga.bounds()
        self.poly_ids = np.asarray(payload["ids"], dtype=np.int64)
        self.index = CellPolyIndex(self.boxes, self.poly_ids, res)
        # envelope distance is EXACT only for axis-aligned boxes; for
        # any other geometry the bbox distance is kept as the ring
        # pruning LOWER BOUND and candidates are refined with the true
        # point-to-geometry distance (per-geometry segment tables +
        # point-in-polygon decompositions, built once per worker)
        from rayspatial.geom.setops import _is_box

        self.ga = ga
        self.is_box = np.fromiter(
            (_is_box(ga, i) for i in range(len(ga))), dtype=bool,
            count=len(ga),
        )
        self.all_boxes = bool(self.is_box.all())
        self._seg_cache: dict[int, tuple] = {}
        self._decomp_cache: dict[int, object] = {}
        self.k = k
        self.max_distance = max_distance
        self.max_ring = max_ring if max_ring is not None else (1 << res)
        self.lon_col = lon_col
        self.lat_col = lat_col

    def _exact_pt_dist2(self, gi: int, lon: np.ndarray,
                        lat: np.ndarray) -> np.ndarray:
        """True squared point-to-geometry distance (vectorized over the
        point bucket): min over the geometry's segments/points, and 0
        for points covered by a polygonal geometry."""
        from rayspatial.geom import predicates as P
        from rayspatial.geom.array import MULTIPOLYGON, POLYGON
        from rayspatial.geom.measures import _geom_segments, _pt_seg_dist2

        seg = self._seg_cache.get(gi)
        if seg is None:
            seg = _geom_segments(self.ga, gi)
            self._seg_cache[gi] = seg
        pts, s1, s2 = seg
        out = np.full(len(lon), np.inf)
        if len(s1):
            out = np.minimum(
                out,
                _pt_seg_dist2(
                    lon[:, None], lat[:, None],
                    s1[None, :, 0], s1[None, :, 1],
                    s2[None, :, 0], s2[None, :, 1],
                ).min(axis=1),
            )
        if len(pts):
            dd = (lon[:, None] - pts[None, :, 0]) ** 2 + (
                lat[:, None] - pts[None, :, 1]
            ) ** 2
            out = np.minimum(out, dd.min(axis=1))
        if self.ga.types[gi] in (POLYGON, MULTIPOLYGON):
            dec = self._decomp_cache.get(gi)
            if dec is None:
                dec = P._Decomp(self.ga, gi)
                self._decomp_cache[gi] = dec
            from rayspatial.geom.strtree import _locate_in_polyset

            loc = _locate_in_polyset(dec, lon, lat)
            out[loc != P.EXT] = 0.0
        return out

    def _bucket_knn(self, lon: np.ndarray, lat: np.ndarray, cx: int, cy: int):
        """k-NN for all points of one cell bucket.  Returns
        (row_idx, poly_id, rank) arrays (local row indices)."""
        idx = self.index
        m = len(lon)
        cand: np.ndarray = np.empty(0, dtype=np.int64)
        # kth-best running distance per point (inf until k found)
        kth = np.full(m, np.inf)
        best_d = None
        best_i = None
        for r in range(0, self.max_ring + 1):
            ring = idx.ring_members(cx, cy, r)
            if len(ring):
                new = np.setdiff1d(ring, cand, assume_unique=False)
                if len(new):
                    d2 = _bbox_dist2(lon, lat, self.boxes[new])
                    if not self.all_boxes:
                        for col, gi in enumerate(new):
                            if not self.is_box[gi]:
                                d2[:, col] = self._exact_pt_dist2(
                                    int(gi), lon, lat
                                )
                    ids = np.broadcast_to(self.poly_ids[new], d2.shape)
                    if best_d is None:
                        best_d, best_i = d2, np.broadcast_to(
                            self.poly_ids[new], d2.shape
                        ).copy()
                    else:
                        best_d = np.concatenate([best_d, d2], axis=1)
                        best_i = np.concatenate([best_i, ids], axis=1)
                    # keep only top-(k) columns per row to bound memory
                    # — TIE-AWARE: order by (distance, poly_id) like the
                    # final ranking, or a tie at the kth distance can
                    # evict the id that deterministically wins
                    if best_d.shape[1] > 4 * self.k:
                        part = np.lexsort((best_i, best_d), axis=1)[:, : self.k]
                        rows = np.arange(m)[:, None]
                        best_d = best_d[rows, part]
                        best_i = best_i[rows, part]
                    cand = np.union1d(cand, new)
            if best_d is not None and best_d.shape[1] >= self.k:
                kth = np.partition(best_d, self.k - 1, axis=1)[:, self.k - 1]
            # certification: nothing beyond ring r can beat current kth
            nxt = idx.ring_min_dist(cx, cy, r)  # min dist to ring r+1 area
            bound = self.max_distance if self.max_distance is not None else np.inf
            # STRICT <: an unexplored polygon at exactly kth distance
            # could win the (dist, poly_id) tie-break
            if best_d is not None and np.all(np.sqrt(kth) < nxt):
                break
            if nxt > bound:
                break
        if best_d is None:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )
        # final exact top-k with deterministic (dist, poly_id) order
        kk = min(self.k, best_d.shape[1])
        order = np.lexsort((best_i, best_d), axis=1)[:, :kk]
        rows = np.repeat(np.arange(m), kk)
        cols = order.ravel()
        d = best_d[np.arange(m)[:, None], order].ravel()
        pid = best_i[np.arange(m)[:, None], order].ravel()
        rank = np.tile(np.arange(1, kk + 1), m)
        if self.max_distance is not None:
            keep = d <= self.max_distance * self.max_distance
            rows, pid, rank = rows[keep], pid[keep], rank[keep]
        return rows, pid, rank

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy()
        lat = batch.column(self.lat_col).to_numpy()
        cx, cy = cellmod.cell_xy(lon, lat, self.index.res)
        key = (cx.astype(np.int64) << 32) | cy.astype(np.int64)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        bounds = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        bounds = np.append(bounds, len(key_s))
        out_rows, out_pid, out_rank = [], [], []
        for s in range(len(bounds) - 1):
            sel = order[bounds[s] : bounds[s + 1]]
            rows, pid, rank = self._bucket_knn(
                lon[sel], lat[sel], int(cx[sel[0]]), int(cy[sel[0]])
            )
            out_rows.append(sel[rows])
            out_pid.append(pid)
            out_rank.append(rank)
        rows = np.concatenate(out_rows) if out_rows else np.empty(0, dtype=np.int64)
        if not len(rows):
            empty = batch.slice(0, 0)
            empty = empty.append_column("poly_id", pa.array([], type=pa.int64()))
            return empty.append_column("rank", pa.array([], type=pa.int64()))
        out = batch.take(pa.array(rows))
        out = out.append_column("poly_id", pa.array(np.concatenate(out_pid)))
        return out.append_column("rank", pa.array(np.concatenate(out_rank)))


_KNN_CACHE: dict = {}


def knn_join(points_ds, polygons, poly_ids=None, k: int = 1, res: int = 5,
             max_distance: float | None = None):
    """Broadcast kNN join (task mode, per-worker joiner cache — same
    pattern as ops.join.join_points_polygons)."""
    from rayspatial.ops.join import broadcast_polygons

    ref = broadcast_polygons(polygons, poly_ids)
    ck = (ref.hex(), k, res, max_distance)

    def join_batch(batch: pa.Table) -> pa.Table:
        j = _KNN_CACHE.get(ck)
        if j is None:
            if len(_KNN_CACHE) > 8:
                _KNN_CACHE.clear()
            j = KnnJoiner(ref, k=k, res=res, max_distance=max_distance)
            _KNN_CACHE[ck] = j
        return j(batch)

    return points_ds.map_batches(join_batch, batch_format="pyarrow")


def dwithin_join(points_ds, polygons, distance: float, poly_ids=None,
                 res: int = 5):
    """All (point, polygon) pairs within ``distance`` (broadcast layer,
    cell-ring expansion bounded by the distance): the kNN joiner with
    k = |layer| and max_distance=d — ring expansion stops as soon as
    the ring lower bound exceeds d, so the effective work is local."""
    out = knn_join(points_ds, polygons, poly_ids=poly_ids,
                   k=len(polygons), res=res, max_distance=distance)
    import pyarrow as pa

    return out.map_batches(
        lambda b: b.drop_columns(["rank"]), batch_format="pyarrow"
    )
