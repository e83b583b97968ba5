"""Areal interpolation (dasymetric-free / area-weighted transfer): move
an attribute from a SOURCE polygon layer onto a TARGET polygon layer,
weighting each source zone's value by the fraction of the source zone
that intersects the target:

    est(T) = sum_S  value(S) * area(S intersect T) / area(S)

The classic GIS re-aggregation primitive (census tracts -> grid cells,
admin zones -> watersheds).  pygeos users compose it from
``intersection`` + ``area`` (reference set_operations.py /
measurement.py); here it is one distributed join stage.

Scale shape: the source layer is broadcast ONCE (``ray.put`` of WKB +
values; per-worker parsed-layer cache), targets STREAM through
map_batches; per batch a vectorized bbox matrix prunes candidate pairs
and the engine's general polygon-overlay kernel computes the exact
intersection geometry per surviving pair.  No shuffle at all — output
rows == target rows.

Exactness contract: with integer-coordinate zones and integer values
the per-pair term is computed in scaled INTEGER arithmetic
(``value * scale * inter_area // src_area``), so the per-target sum is
order-independent and hash-matches a serial SQL oracle — a float sum
over distributed blocks would not.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LAYER_CACHE: dict = {}


def _cached_src(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _LAYER_CACHE.get(key)
    if hit is None:
        import ray

        from rayspatial.geom.wkb import parse_wkb

        payload = ray.get(ref)
        ga = parse_wkb(payload["wkb"])
        if len(_LAYER_CACHE) > 64:
            _LAYER_CACHE.clear()
        hit = (ga, payload["values"], payload["areas"], ga.bounds())
        _LAYER_CACHE[key] = hit
    return hit


def areal_interpolate(targets_ds, src_ga, src_values,
                      tgt_id_col: str = "tgt_id",
                      bounds_cols=("xmin", "ymin", "xmax", "ymax"),
                      scale: int = 1_000_000, out_col: str = "est_scaled"):
    """targets (id + bounds columns) -> (id, est_scaled) with
    est_scaled = sum over sources of value*scale*interArea//srcArea
    (integer micro-units)."""
    import ray

    from rayspatial.geom.measures import area as geom_area
    from rayspatial.geom.wkb import to_wkb

    src_areas = np.round(geom_area(src_ga)).astype(np.int64)
    ref = ray.put({
        "wkb": to_wkb(src_ga),
        "values": np.asarray(src_values, dtype=np.int64),
        "areas": src_areas,
    })

    def interp_batch(batch: pa.Table) -> pa.Table:
        from rayspatial.geom.constructive import box
        from rayspatial.geom.setops import _slice_rows, intersection

        ga, vals, areas, bnds = _cached_src(ref)
        tid = batch.column(tgt_id_col).to_numpy()
        bx = [batch.column(c).to_numpy().astype(np.float64)
              for c in bounds_cols]
        est = np.zeros(len(tid), dtype=np.int64)
        ov = (
            (bx[2][:, None] >= bnds[None, :, 0])
            & (bx[0][:, None] <= bnds[None, :, 2])
            & (bx[3][:, None] >= bnds[None, :, 1])
            & (bx[1][:, None] <= bnds[None, :, 3])
        )
        ti, sj = np.nonzero(ov)
        if len(ti):
            tgt_geoms = box(bx[0][ti], bx[1][ti], bx[2][ti], bx[3][ti])
            inter = intersection(tgt_geoms, _slice_rows(ga, list(sj)))
            ia = np.round(geom_area(inter)).astype(np.int64)
            terms = vals[sj] * np.int64(scale) * ia // areas[sj]
            np.add.at(est, ti, terms)
        return pa.table({
            tgt_id_col: pa.array(tid),
            out_col: pa.array(est),
        })

    return targets_ds.map_batches(interp_batch, batch_format="pyarrow")
