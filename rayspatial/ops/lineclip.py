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

from rayspatial.geom.array import PK_LINE, GeomArray

_LAYER_CACHE: dict = {}


def _cached_layer(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _LAYER_CACHE.get(key)
    if hit is None:
        payload = ref if isinstance(ref, dict) else ray.get(ref)
        from rayspatial.geom.wkb import parse_wkb

        ga = parse_wkb(payload["wkb"])
        hit = (ga, np.asarray(payload["ids"], dtype=np.int64), ga.bounds())
        if len(_LAYER_CACHE) > 8:
            _LAYER_CACHE.clear()
        _LAYER_CACHE[key] = hit
    return hit


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
        from rayspatial.geom.creation import linestrings
        from rayspatial.geom.setops import _slice_rows, intersection

        ga_polys, ids, bnds = _cached_layer(ref)
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
        if not len(ri):
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "poly_id": pa.array([], type=pa.int64()),
                "len2": pa.array([], type=pa.int64()),
            })
        segs = [
            np.array([[x1[r], y1[r]], [x2[r], y2[r]]], dtype=np.float64)
            for r in ri
        ]
        inter = intersection(linestrings(segs),
                             _slice_rows(ga_polys, list(pj)))
        len2 = _len2_per_row(inter)
        keep = len2 > 0
        return pa.table({
            "doc_id": pa.array(doc_id[ri[keep]]),
            "poly_id": pa.array(ids[pj[keep]]),
            "len2": pa.array(len2[keep]),
        })

    return lines_ds.map_batches(clip_batch, batch_format="pyarrow",
                                num_cpus=num_cpus)
