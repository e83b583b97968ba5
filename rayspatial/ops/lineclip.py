"""Distributed line x polygon clip (the "clip roads to admin areas"
pipeline — the most common spatial op after point-in-polygon).

Shape: broadcast the polygon layer once (``ray.put``), stream line
batches through stateless map tasks with a per-worker parsed-layer
cache (same pattern as ops/join.py's task mode), candidate-filter by
vectorized bbox overlap, then run the EXACT lineal intersection kernel
(geom/setops.py Cyrus-Beck fast path for convex polygons,
geom/lineal_ops otherwise) per surviving pair.

Output metric ``len2``: for clipped pieces whose coordinates are
half-integers (integer input coordinates, slope-1/2 segments), the
integer ``sum((2*dx)^2 + (2*dy)^2)`` over piece segments is exact in
float64 — so a DuckDB parametric-clip oracle matches hash-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial.geom.array import (
    LINESTRING,
    PK_LINE,
    PK_SHELL,
    POLYGON,
    GeomArray,
)

_LAYER_CACHE: dict = {}


def _detect_boxes(ga: GeomArray, bnds: np.ndarray) -> np.ndarray:
    """Per-row True iff the geometry is a single-shell axis-aligned
    rectangle (every ring vertex is one of its 4 bbox corners).  Runs
    ONCE per cached layer — licenses the vectorized Liang-Barsky clip
    for those rows."""
    n = len(ga)
    out = np.zeros(n, dtype=bool)
    nparts = np.bincount(ga.part_geom, minlength=n) if ga.n_parts else \
        np.zeros(n, dtype=np.int64)
    for p in range(ga.n_parts):
        i = int(ga.part_geom[p])
        if (ga.types[i] != POLYGON or ga.part_kind[p] != PK_SHELL
                or nparts[i] != 1):
            continue
        xy = ga.part_coords(p)
        if len(xy) != 5:
            continue
        x0, y0, x1, y1 = bnds[i]
        on_x = (xy[:, 0] == x0) | (xy[:, 0] == x1)
        on_y = (xy[:, 1] == y0) | (xy[:, 1] == y1)
        out[i] = bool(on_x.all() and on_y.all() and x1 > x0 and y1 > y0)
    return out


def _cached_layer(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _LAYER_CACHE.get(key)
    if hit is None:
        payload = ref if isinstance(ref, dict) else ray.get(ref)
        from rayspatial.geom.wkb import parse_wkb

        ga = parse_wkb(payload["wkb"])
        bnds = ga.bounds()
        hit = (ga, np.asarray(payload["ids"], dtype=np.int64), bnds,
               _detect_boxes(ga, bnds))
        if len(_LAYER_CACHE) > 8:
            _LAYER_CACHE.clear()
        _LAYER_CACHE[key] = hit
    return hit


def _segments_geomarray(x1, y1, x2, y2) -> GeomArray:
    """2-point LINESTRING array from endpoint columns — one interleaved
    (2n, 2) coordinate buffer, no per-row Python (the round-2 verdict's
    line_clip hot-path fix)."""
    n = len(x1)
    coords = np.empty((2 * n, 2), dtype=np.float64)
    coords[0::2, 0] = x1
    coords[0::2, 1] = y1
    coords[1::2, 0] = x2
    coords[1::2, 1] = y2
    return GeomArray(
        types=np.full(n, LINESTRING, dtype=np.int8),
        part_geom=np.arange(n, dtype=np.int64),
        part_kind=np.full(n, PK_LINE, dtype=np.int8),
        part_sub=np.arange(n, dtype=np.int64),
        part_off=np.arange(0, 2 * n + 1, 2, dtype=np.int64),
        coords=coords,
        num_children=np.ones(n, dtype=np.int64),
    )


def _liang_barsky_len2(x1, y1, x2, y2, boxes: np.ndarray):
    """Vectorized segment x closed-box clip over all candidate pairs at
    once.  Returns (keep mask, int64 len2) where len2 is the same
    ``(2*dx')^2 + (2*dy')^2`` metric as the exact kernel — for
    half-integer clip parameters the arithmetic is exact in float64,
    so the DuckDB oracle still matches hash-exactly."""
    dx = x2 - x1
    dy = y2 - y1
    t0 = np.zeros(len(x1))
    t1 = np.ones(len(x1))
    ok = np.ones(len(x1), dtype=bool)
    for p, q in (
        (-dx, x1 - boxes[:, 0]),
        (dx, boxes[:, 2] - x1),
        (-dy, y1 - boxes[:, 1]),
        (dy, boxes[:, 3] - y1),
    ):
        zero = p == 0
        ok &= ~(zero & (q < 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            r = q / p
        t0 = np.where(p < 0, np.maximum(t0, r), t0)
        t1 = np.where(p > 0, np.minimum(t1, r), t1)
    dt = t1 - t0
    keep = ok & (dt > 0)
    cdx = 2.0 * dt * dx
    cdy = 2.0 * dt * dy
    len2 = np.round(cdx * cdx + cdy * cdy).astype(np.int64)
    keep &= len2 > 0
    return keep, len2


def _len2_per_row(inter: GeomArray) -> np.ndarray:
    """sum((2*dx)^2 + (2*dy)^2) over the lineal parts of each row
    (exact integer for half-integer coordinates), rounded to int64."""
    out = np.zeros(len(inter), dtype=np.float64)
    for p in range(inter.n_parts):
        if inter.part_kind[p] != PK_LINE:
            continue
        xy = inter.part_coords(p)
        d = 2.0 * np.diff(xy, axis=0)
        out[inter.part_geom[p]] += float((d * d).sum())
    return np.round(out).astype(np.int64)


def clip_lines_to_polygons(lines_ds, polygons: GeomArray,
                           poly_ids: np.ndarray | None = None,
                           num_cpus: float = 1):
    """lines Dataset (id_col + x1,y1,x2,y2 segment columns) x broadcast
    polygon layer -> (doc_id, poly_id, len2) rows for every pair whose
    clipped intersection has positive length."""
    import ray

    from rayspatial.geom.wkb import to_wkb

    if poly_ids is None:
        poly_ids = np.arange(len(polygons), dtype=np.int64)
    ref = ray.put({"wkb": to_wkb(polygons),
                   "ids": np.asarray(poly_ids, dtype=np.int64)})

    def clip_batch(batch: pa.Table) -> pa.Table:
        from rayspatial.geom.setops import _slice_rows, intersection

        ga_polys, ids, bnds, isbox = _cached_layer(ref)
        doc_id = batch.column("doc_id").to_numpy()
        x1 = batch.column("x1").to_numpy()
        y1 = batch.column("y1").to_numpy()
        x2 = batch.column("x2").to_numpy()
        y2 = batch.column("y2").to_numpy()
        lo_x, hi_x = np.minimum(x1, x2), np.maximum(x1, x2)
        lo_y, hi_y = np.minimum(y1, y2), np.maximum(y1, y2)
        # vectorized bbox candidate filter (n_rows x n_polys)
        ov = (
            (hi_x[:, None] >= bnds[None, :, 0])
            & (lo_x[:, None] <= bnds[None, :, 2])
            & (hi_y[:, None] >= bnds[None, :, 1])
            & (lo_y[:, None] <= bnds[None, :, 3])
        )
        ri, pj = np.nonzero(ov)
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "poly_id": pa.array([], type=pa.int64()),
            "len2": pa.array([], type=pa.int64()),
        })
        if not len(ri):
            return empty
        out_doc: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        out_len2: list[np.ndarray] = []
        # fast path: axis-aligned rectangles clip via vectorized
        # Liang-Barsky — no geometry objects, no per-pair Python
        bmask = isbox[pj]
        if bmask.any():
            rb, pb = ri[bmask], pj[bmask]
            keep, len2 = _liang_barsky_len2(
                x1[rb], y1[rb], x2[rb], y2[rb], bnds[pb]
            )
            out_doc.append(doc_id[rb[keep]])
            out_poly.append(ids[pb[keep]])
            out_len2.append(len2[keep])
        # general polygons: exact lineal kernel; segment array built
        # from one interleaved coord buffer (no per-pair ndarrays)
        if not bmask.all():
            rg, pg = ri[~bmask], pj[~bmask]
            segs = _segments_geomarray(x1[rg], y1[rg], x2[rg], y2[rg])
            inter = intersection(segs, _slice_rows(ga_polys, list(pg)))
            len2 = _len2_per_row(inter)
            keep = len2 > 0
            out_doc.append(doc_id[rg[keep]])
            out_poly.append(ids[pg[keep]])
            out_len2.append(len2[keep])
        if not out_doc:
            return empty
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc)),
            "poly_id": pa.array(np.concatenate(out_poly)),
            "len2": pa.array(np.concatenate(out_len2)),
        })

    return lines_ds.map_batches(clip_batch, batch_format="pyarrow",
                                num_cpus=num_cpus)
