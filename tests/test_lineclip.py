"""ops/lineclip.py — box fast path (vectorized Liang-Barsky) must agree
pair-for-pair with the exact lineal intersection kernel, and mixed
box/non-box layers must route each polygon down the right path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayspatial import geom as g
from rayspatial.ops.lineclip import (
    _detect_boxes,
    _len2_per_row,
    _liang_barsky_len2,
    _segments_geomarray,
)


def _exact_len2(x1, y1, x2, y2, polys, pj):
    from rayspatial.geom.setops import _slice_rows, intersection

    segs = _segments_geomarray(x1, y1, x2, y2)
    inter = intersection(segs, _slice_rows(polys, list(pj)))
    return _len2_per_row(inter)


def test_liang_barsky_matches_exact_kernel():
    rng = np.random.default_rng(7)
    n = 300
    # half-integer segment endpoints, integer boxes -> exact arithmetic
    x1 = np.floor(rng.uniform(-20, 20, n))
    y1 = np.floor(rng.uniform(-20, 20, n))
    x2 = x1 + rng.integers(-4, 5, n)
    y2 = y1 + rng.integers(-4, 5, n)
    bx0 = np.floor(rng.uniform(-20, 10, n))
    by0 = np.floor(rng.uniform(-20, 10, n))
    boxes = np.column_stack([bx0, by0,
                             bx0 + rng.integers(1, 10, n),
                             by0 + rng.integers(1, 10, n)])
    polys = g.box(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    keep, len2 = _liang_barsky_len2(x1, y1, x2, y2, boxes)
    exact = _exact_len2(x1, y1, x2, y2, polys, np.arange(n))
    got = np.where(keep, len2, 0)
    np.testing.assert_array_equal(got, exact)


def test_detect_boxes_and_mixed_layer():
    import ray.data as rd

    from rayspatial.ops.lineclip import clip_lines_to_polygons

    layer = g.from_wkt([
        "POLYGON((0 0,4 0,4 4,0 4,0 0))",
        "POLYGON((10 0,14 0,14 4,10 4,10 0))",
        "POLYGON((20 0,24 0,20 4,20 0))",
    ])
    isbox = _detect_boxes(layer, layer.bounds())
    assert list(isbox) == [True, True, False]

    # one horizontal segment through each polygon at y=2
    tab = pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "x1": pa.array([-1.0, 9.0, 19.0]),
        "y1": pa.array([2.0, 2.0, 2.0]),
        "x2": pa.array([5.0, 15.0, 25.0]),
        "y2": pa.array([2.0, 2.0, 2.0]),
    })
    out = (
        clip_lines_to_polygons(rd.from_arrow(tab), layer)
        .to_pandas()
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    # box rows: clip [0,4] -> dx=4 -> (2*4)^2 = 64
    assert out.loc[0].tolist() == [0, 0, 64]
    assert out.loc[1].tolist() == [1, 1, 64]
    # triangle at y=2: x in [20, 22] -> dx=2 -> (2*2)^2 = 16
    assert out.loc[2].tolist() == [2, 2, 16]
    assert len(out) == 3


def test_liang_barsky_degenerate_and_touching():
    # point-touch (zero length) dropped; degenerate zero-length segment
    # dropped; segment along the box edge kept (collinear boundary)
    boxes = np.array([[0.0, 0.0, 4.0, 4.0]] * 3)
    x1 = np.array([-2.0, 1.0, 0.0])
    y1 = np.array([4.0, 1.0, 0.0])
    x2 = np.array([0.0, 1.0, 4.0])   # first touches corner (0,4) only
    y2 = np.array([6.0, 1.0, 0.0])   # third runs along bottom edge
    keep, len2 = _liang_barsky_len2(x1, y1, x2, y2, boxes)
    assert list(keep) == [False, False, True]
    assert len2[2] == 64
