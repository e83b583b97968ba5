"""Distributed point-in-polygon spatial join.

Engine translation of the reference's ``STRtree.query_bulk`` spatial
join (strtree.py:135-228, src/strtree.c:434-580; SURVEY.md §3.2):

**Broadcast mode** (default; the 100-TB hot path): the polygon layer is
small relative to worker memory, so it is ``ray.put`` ONCE and every
join actor builds its STRtree ONCE in ``__init__`` — point batches then
stream through the actor pool with no shuffle at all.  This is the
idiomatic Ray translation of "one shared tree, N probe threads" (the
reference releases the GIL around the whole probe loop,
strtree.c:496-546).

**Shuffle mode** (``join_points_polygons_shuffled``): for polygon layers
too large to broadcast — points are hash-partitioned by cell
(groupby shuffle), polygons replicated into every cell partition their
envelope touches (cells_covering_box), and each group joins locally.
A point lives in exactly one cell, so no output dedup is needed.

Predicates: 'covers' (boundary inclusive), 'contains' (interior only),
'intersects' (same as covers for point probes) — semantics per
reference predicates.py:470-661.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial import cell as cellmod
from rayspatial.geom import predicates as P
from rayspatial.geom.array import GeomArray
from rayspatial.geom.strtree import STRtree, _locate_in_polyset


def _loc_keep(loc: np.ndarray, predicate: str) -> np.ndarray:
    if predicate in ("covers", "intersects", "covered_by"):
        return loc != P.EXT
    if predicate in ("contains", "within", "contains_properly"):
        return loc == P.INT
    if predicate == "touches":
        return loc == P.BND
    raise ValueError(f"unsupported point-join predicate: {predicate}")


class _BoxSlabIndex:
    """Exact point-in-boxes stabbing for an ALL-BOX layer: doubled
    coordinate slabs on x and y with a per-slab membership bitset.  A
    point's hit set is ``xbits[dslab_x(p)] & ybits[dslab_y(p)]`` — two
    searchsorteds and one word-AND per point, NO candidate expansion,
    NO refinement.  Doubled slabs (even = exactly at breakpoint j,
    odd = strictly between j and j+1) make boundary inclusion exact:
    box [lo, hi] occupies doubled rows 2*idx(lo) .. 2*idx(hi)
    inclusive, so ``p == hi`` hits while ``p`` just past ``hi`` in the
    same undoubled slab does not (the ``covers`` predicate on boxes).
    Memory is O(n_boxes^2 / 2) bytes, so callers gate on small layers
    (broadcast layers are small by contract)."""

    MAX_ITEMS = 4096

    def __init__(self, bounds: np.ndarray):
        n = len(bounds)
        self.n = n
        self.words = (n + 63) // 64
        bit = np.uint64(1) << (np.arange(n, dtype=np.uint64) % np.uint64(64))
        word = np.arange(n) // 64

        def axis(lo, hi):
            brk = np.unique(np.concatenate([lo, hi]))
            s0 = np.searchsorted(brk, lo)   # lo/hi ARE breakpoints
            s1 = np.searchsorted(brk, hi)
            bits = np.zeros((2 * len(brk) - 1, self.words), dtype=np.uint64)
            counts = 2 * (s1 - s0) + 1
            rows = np.repeat(2 * s0, counts) + _ragged_arange_1(counts)
            boxes = np.repeat(np.arange(n), counts)
            np.bitwise_or.at(bits, (rows, word[boxes]), bit[boxes])
            return brk, bits

        self.xbrk, self.xbits = axis(bounds[:, 0], bounds[:, 2])
        self.ybrk, self.ybits = axis(bounds[:, 1], bounds[:, 3])

    @staticmethod
    def _dslab(brk: np.ndarray, v: np.ndarray):
        """Doubled slab index per value + in-range mask."""
        ok = (v >= brk[0]) & (v <= brk[-1])     # NaN -> False
        i = np.clip(np.searchsorted(brk, v, side="right") - 1,
                    0, len(brk) - 1)
        # out-of-range values are masked by ``ok`` but must still index
        # in-bounds (v > brk[-1] would double to one past the last row)
        return np.minimum(2 * i + (v > brk[i]), 2 * len(brk) - 2), ok

    def query_points(self, x: np.ndarray, y: np.ndarray):
        """-> (probe_rows, item_pos) sorted by (probe, item)."""
        dx, okx = self._dslab(self.xbrk, x)
        dy, oky = self._dslab(self.ybrk, y)
        band = self.xbits[dx] & self.ybits[dy]
        ok = okx & oky
        if not ok.all():
            band[~ok] = 0
        # sparse set-bit extraction: hits per point are ~0-2, so a
        # lowest-set-bit loop over the ACTIVE points (a handful of
        # vectorized rounds) beats a dense n x n_boxes unpack+nonzero
        prs, its = [], []
        for w in range(self.words):
            v = band[:, w]
            idx = np.flatnonzero(v)
            v = v[idx]
            base = np.int64(w * 64)
            while len(idx):
                low = v & (np.uint64(0) - v)          # lowest set bit
                b = np.log2(low.astype(np.float64)).astype(np.int64)
                prs.append(idx)
                its.append(base + b)
                v = v & (v - np.uint64(1))            # clear it
                keep = v != 0
                idx = idx[keep]
                v = v[keep]
        if not prs:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pr = np.concatenate(prs)
        it = np.concatenate(its)
        order = np.lexsort((it, pr))
        return pr[order].astype(np.int64), it[order]


def _ragged_arange_1(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    run = np.repeat(np.arange(len(counts)), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - cum[run]


class PointInPolygonJoiner:
    """map_batches actor: point batches (lon/lat cols) x broadcast
    polygon layer -> pair rows (input cols + poly_id).

    ``polygons_ref``: ray.ObjectRef of a dict
    ``{"wkb": list[bytes], "ids": np.ndarray}`` — or the dict itself in
    unit tests.  Tree + per-polygon decompositions built once per actor.
    """

    def __init__(self, polygons_ref, predicate: str = "covers",
                 lon_col: str = "lon", lat_col: str = "lat"):
        import ray

        payload = polygons_ref
        if not isinstance(payload, dict):
            payload = ray.get(polygons_ref)
        from rayspatial.geom.wkb import parse_wkb

        ga: GeomArray = parse_wkb(payload["wkb"])
        self.poly_ids = np.asarray(payload["ids"], dtype=np.int64)
        self.tree = STRtree(ga)
        self.predicate = predicate
        self.lon_col = lon_col
        self.lat_col = lat_col
        # pre-decompose every polygon once (prepared geometry analogue)
        self.decomps = [P._Decomp(ga, i) for i in range(len(ga))]
        # all-box broadcast layers get the exact slab-bitset stab
        # (~3x the STRtree candidate walk for point probes)
        self.slab = None
        if (0 < len(ga) <= _BoxSlabIndex.MAX_ITEMS
                and self.tree._all_boxes()):
            self.slab = _BoxSlabIndex(self.tree._geom_bounds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy()
        lat = batch.column(self.lat_col).to_numpy()
        if self.slab is not None and self.predicate in (
            "covers", "intersects", "covered_by", "contains", "within",
            "contains_properly",
        ):
            probe_rows, tree_items = self.slab.query_points(lon, lat)
            if self.predicate not in ("covers", "intersects", "covered_by"):
                bbs = self.tree._geom_bounds[tree_items]
                px, py = lon[probe_rows], lat[probe_rows]
                strict = ((px > bbs[:, 0]) & (px < bbs[:, 2])
                          & (py > bbs[:, 1]) & (py < bbs[:, 3]))
                probe_rows = probe_rows[strict]
                tree_items = tree_items[strict]
            out = batch.take(pa.array(probe_rows))
            return out.append_column(
                "poly_id", pa.array(self.poly_ids[tree_items])
            )
        pb = np.column_stack([lon, lat, lon, lat])
        probe_rows, tree_items = self.tree._candidates(pb)
        if not len(probe_rows):
            empty = batch.slice(0, 0)
            return empty.append_column("poly_id", pa.array([], type=pa.int64()))
        # all-box layer: a point-envelope hit IS boundary-inclusive
        # containment, so covers/intersects skip the refine loop
        # entirely; contains (interior-only) just re-tests with strict
        # inequalities against the bounds — no per-polygon dispatch
        if self.tree._all_boxes() and self.predicate in (
            "covers", "intersects", "covered_by", "contains", "within",
            "contains_properly",
        ):
            if self.predicate in ("covers", "intersects", "covered_by"):
                keep_all = slice(None)
            else:
                bbs = self.tree._geom_bounds[tree_items]
                px, py = lon[probe_rows], lat[probe_rows]
                keep_all = (
                    (px > bbs[:, 0]) & (px < bbs[:, 2])
                    & (py > bbs[:, 1]) & (py < bbs[:, 3])
                )
            probe_rows = probe_rows[keep_all]
            tree_items = tree_items[keep_all]
            out = batch.take(pa.array(probe_rows))
            return out.append_column(
                "poly_id", pa.array(self.poly_ids[tree_items])
            )
        keep = np.zeros(len(probe_rows), dtype=bool)
        # vectorized per tree polygon: all probes hitting it in one call
        order = np.argsort(tree_items, kind="stable")
        ti_sorted = tree_items[order]
        starts = np.flatnonzero(np.r_[True, ti_sorted[1:] != ti_sorted[:-1]])
        starts = np.append(starts, len(ti_sorted))
        for s in range(len(starts) - 1):
            sl = order[starts[s] : starts[s + 1]]
            ti = int(ti_sorted[starts[s]])
            rows = probe_rows[sl]
            loc = _locate_in_polyset(self.decomps[ti], lon[rows], lat[rows])
            keep[sl] = _loc_keep(loc, self.predicate)
        probe_rows = probe_rows[keep]
        tree_items = tree_items[keep]
        out = batch.take(pa.array(probe_rows))
        return out.append_column("poly_id", pa.array(self.poly_ids[tree_items]))


def broadcast_polygons(ga: GeomArray, ids: np.ndarray | None = None):
    """ray.put the polygon layer once; returns the ObjectRef."""
    import ray

    from rayspatial.geom.wkb import to_wkb

    if ids is None:
        ids = np.arange(len(ga), dtype=np.int64)
    return ray.put({"wkb": to_wkb(ga), "ids": np.asarray(ids, dtype=np.int64)})


# per-worker-process joiner cache for task-mode joins: Ray reuses
# worker processes across tasks, so the tree is built once per worker
# (the prepare-once pattern without actor-pool startup latency).  Keyed
# by ObjectRef hex so a new broadcast invalidates naturally.
_JOINER_CACHE: dict = {}


def _cached_joiner(ref, predicate, lon_col, lat_col) -> PointInPolygonJoiner:
    key = (ref.hex() if hasattr(ref, "hex") else id(ref), predicate, lon_col, lat_col)
    j = _JOINER_CACHE.get(key)
    if j is None:
        if len(_JOINER_CACHE) > 8:
            _JOINER_CACHE.clear()
        j = PointInPolygonJoiner(ref, predicate, lon_col, lat_col)
        _JOINER_CACHE[key] = j
    return j


def join_points_polygons(
    points_ds,
    polygons: GeomArray,
    poly_ids: np.ndarray | None = None,
    predicate: str = "covers",
    concurrency=None,
    batch_size: int | None = None,
    num_cpus: float = 1,
    mode: str = "task",
):
    """Broadcast STRtree join: points Dataset (lon/lat) -> pairs Dataset.

    ``mode='task'`` (default): stateless map tasks + per-worker-process
    tree cache — scales instantly with the task pool, right when the
    polygon layer is broadcast-small.  ``mode='actor'``: explicit actor
    pool (``concurrency=(min,max)``) — right when tree build is
    expensive enough to pin (huge polygon partitions)."""
    ref = broadcast_polygons(polygons, poly_ids)
    if mode == "task":
        def join_batch(batch: pa.Table) -> pa.Table:
            return _cached_joiner(ref, predicate, "lon", "lat")(batch)

        return points_ds.map_batches(
            join_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
    if concurrency is None:
        concurrency = (2, 8)
    return points_ds.map_batches(
        PointInPolygonJoiner,
        fn_constructor_args=(ref, predicate),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def join_points_polygons_shuffled(
    points_ds,
    polygons: GeomArray,
    poly_ids: np.ndarray | None = None,
    predicate: str = "covers",
    partition_res: int = 4,
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt_target: int | None = None,
    salt_map: dict[int, int] | None = None,
):
    """Shuffle-mode join for very large polygon layers: points
    hash-partitioned by cell (groupby shuffle), polygons replicated into
    overlapping cell partitions, local join per group.

    Skew (north_rule): pass ``salt_target`` (max point rows per shuffle
    partition) to detect hot cells from a histogram pre-pass and SPLIT
    them into ``ceil(n/target)`` salted keys before the shuffle — the
    polygon side is replicated into every salt bucket via base-cell
    lookup, so results are identical.  Pass a precomputed ``salt_map``
    (cell -> salt factor) to skip the extra histogram pass.
    """
    import ray

    from rayspatial.geom.wkb import to_wkb
    from rayspatial.ops import skew

    if poly_ids is None:
        poly_ids = np.arange(len(polygons), dtype=np.int64)
    if salt_map is None and salt_target is not None:
        hist = pa.concat_tables(
            [
                b
                for b in skew.cell_histogram(
                    points_ds, partition_res, lon_col, lat_col
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        salt_map = skew.plan_salts(hist, salt_target)
    salt_map = salt_map or {}
    # replicate polygons into every cell their envelope touches
    bounds = polygons.bounds()
    cell_to_polys: dict[int, list[int]] = {}
    for i in range(len(polygons)):
        if np.isnan(bounds[i, 0]):
            continue
        for c in cellmod.cells_covering_box(*bounds[i], partition_res):
            cell_to_polys.setdefault(int(c), []).append(i)
    payload_ref = ray.put(
        {"wkb": to_wkb(polygons), "ids": np.asarray(poly_ids), "cells": cell_to_polys}
    )

    def add_cell(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        pcell = cellmod.cell_encode(lon, lat, partition_res)
        # deterministic per-row salt (row position hash would not be
        # stable across block splits; use a content-derived id column if
        # present, else the lon/lat bit pattern)
        if "doc_id" in batch.column_names:
            rid = batch.column("doc_id").to_numpy()
        else:
            rid = lon.view(np.int64) ^ lat.view(np.int64)
        salt = skew.salt_values(pcell, rid, salt_map)
        return batch.append_column("_pcell", pa.array(pcell)).append_column(
            "_salt", pa.array(salt)
        )

    def join_group(batch: pa.Table) -> pa.Table:
        import ray as _ray

        empty = batch.drop_columns(["_pcell", "_salt"]).slice(0, 0).append_column(
            "poly_id", pa.array([], type=pa.int64())
        )
        if batch.num_rows == 0:
            return empty
        c = int(batch.column("_pcell")[0].as_py())
        # per-worker joiner cache keyed by (payload ref, cell): Ray
        # reuses worker processes across groups, so each worker parses
        # WKB + builds the tree ONCE per cell it sees instead of once
        # per group invocation (salted groups of one hot cell share it)
        ckey = (payload_ref.hex() if hasattr(payload_ref, "hex")
                else id(payload_ref), c, predicate)
        joiner = _JOINER_CACHE.get(ckey)
        if joiner is None:
            payload = _ray.get(payload_ref)
            plist = payload["cells"].get(c, [])
            if not plist:
                _JOINER_CACHE[ckey] = False  # negative cache
                return empty
            if len(_JOINER_CACHE) > 256:
                _JOINER_CACHE.clear()
            joiner = PointInPolygonJoiner(
                {"wkb": [payload["wkb"][k] for k in plist],
                 "ids": payload["ids"][plist]},
                predicate,
                lon_col,
                lat_col,
            )
            _JOINER_CACHE[ckey] = joiner
        elif joiner is False:
            return empty
        return joiner(batch.drop_columns(["_pcell", "_salt"]))

    ds = points_ds.map_batches(add_cell, batch_format="pyarrow")
    return ds.groupby(["_pcell", "_salt"]).map_groups(join_group, batch_format="pyarrow")


def subdivide_polygons(polygons: GeomArray, poly_ids: np.ndarray,
                       res: int) -> dict[int, dict]:
    """ST_Subdivide-style cell decomposition of a polygon layer:
    each polygon is CLIPPED to every res-cell rectangle its envelope
    touches; empty clips (envelope-only overlap) are dropped.

    -> {cell: {"wkb": [piece...], "ids": int64[...]}} — the shuffle
    payload where a task holding cell c receives only the GEOMETRY
    INSIDE c, never a continent-sized polygon.  Loop count =
    #cells-touched (layer-extent bounded); each cell's clip is one
    vectorized ``clip_by_rect`` call over its polygons.
    """
    from rayspatial.geom.constructive import clip_by_rect
    from rayspatial.geom.predicates import is_empty
    from rayspatial.geom.setops import _slice_rows
    from rayspatial.geom.wkb import to_wkb

    bounds = polygons.bounds()
    cell_to_polys: dict[int, list[int]] = {}
    for i in range(len(polygons)):
        if np.isnan(bounds[i, 0]):
            continue
        for c in cellmod.cells_covering_box(*bounds[i], res):
            cell_to_polys.setdefault(int(c), []).append(i)
    out: dict[int, dict] = {}
    for c, plist in cell_to_polys.items():
        xmin, ymin, xmax, ymax = (
            float(v[0]) for v in cellmod.cell_bounds(np.asarray([c]))
        )
        sub = _slice_rows(polygons, plist)
        pieces = clip_by_rect(sub, xmin, ymin, xmax, ymax)
        keep = ~is_empty(pieces)
        if not keep.any():
            continue
        kept = np.flatnonzero(keep)
        pw = to_wkb(_slice_rows(pieces, list(kept)))
        out[int(c)] = {
            "wkb": list(pw),
            "ids": np.asarray(poly_ids)[np.asarray(plist)[kept]],
        }
    return out


def join_points_polygons_subdivided(
    points_ds,
    polygons: GeomArray,
    poly_ids: np.ndarray | None = None,
    predicate: str = "covers",
    partition_res: int = 4,
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt_target: int | None = None,
    salt_map: dict[int, int] | None = None,
):
    """Shuffle-mode PIP join over a SUBDIVIDED polygon layer: the task
    for cell c joins against clip(polygon, cell_rect(c)) pieces only.

    vs ``join_points_polygons_shuffled`` (full-polygon replication):
    per-task geometry is cell-bounded no matter how large an input
    polygon is, and envelope-only replication disappears (empty clips
    are dropped at subdivision).  A point lives in exactly one cell, so
    pairs stay unique with no dedup.

    Hot POINT cells still skew the exchange: ``salt_target`` /
    ``salt_map`` split them into salted keys exactly like
    ``join_points_polygons_shuffled`` (the cell's piece set is shared
    by every salt bucket via the per-worker joiner cache, so salting
    adds no geometry replication at all here).

    Boundary-inclusive predicates only ('covers' / 'intersects'): a
    point on an INTERNAL clip edge lies on the piece's boundary, so the
    boundary-exclusive 'contains' would miss interior points there —
    callers needing 'contains' must verify matches against the full
    polygon (use the replicated join instead).
    """
    import ray

    from rayspatial.ops import skew

    if predicate not in ("covers", "intersects"):
        raise ValueError(
            "subdivided join supports boundary-inclusive predicates "
            "('covers'/'intersects') only; internal clip edges break "
            "'contains' semantics"
        )
    if poly_ids is None:
        poly_ids = np.arange(len(polygons), dtype=np.int64)
    if salt_map is None and salt_target is not None:
        hist = pa.concat_tables(list(
            skew.cell_histogram(points_ds, partition_res, lon_col, lat_col)
            .iter_batches(batch_format="pyarrow")))
        salt_map = skew.plan_salts(hist, salt_target)
    salt_map = salt_map or {}
    payload_ref = ray.put(subdivide_polygons(polygons, poly_ids, partition_res))

    def add_cell(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        pcell = cellmod.cell_encode(lon, lat, partition_res)
        if "doc_id" in batch.column_names:
            rid = batch.column("doc_id").to_numpy()
        else:
            rid = lon.view(np.int64) ^ lat.view(np.int64)
        salt = skew.salt_values(pcell, rid, salt_map)
        return batch.append_column("_pcell", pa.array(pcell)).append_column(
            "_salt", pa.array(salt))

    def join_group(batch: pa.Table) -> pa.Table:
        import ray as _ray

        empty = batch.drop_columns(["_pcell", "_salt"]).slice(0, 0).append_column(
            "poly_id", pa.array([], type=pa.int64())
        )
        if batch.num_rows == 0:
            return empty
        c = int(batch.column("_pcell")[0].as_py())
        ckey = (payload_ref.hex() if hasattr(payload_ref, "hex")
                else id(payload_ref), c, predicate, "sub")
        joiner = _JOINER_CACHE.get(ckey)
        if joiner is None:
            cellmap = _ray.get(payload_ref)
            entry = cellmap.get(c)
            if entry is None:
                _JOINER_CACHE[ckey] = False
                return empty
            if len(_JOINER_CACHE) > 256:
                _JOINER_CACHE.clear()
            joiner = PointInPolygonJoiner(
                {"wkb": entry["wkb"], "ids": entry["ids"]},
                predicate, lon_col, lat_col,
            )
            _JOINER_CACHE[ckey] = joiner
        elif joiner is False:
            return empty
        return joiner(batch.drop_columns(["_pcell", "_salt"]))

    ds = points_ds.map_batches(add_cell, batch_format="pyarrow")
    return ds.groupby(["_pcell", "_salt"]).map_groups(
        join_group, batch_format="pyarrow")
