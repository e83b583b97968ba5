"""Property-based tests (hypothesis) — invariants the reference's own
semantics imply, checked over generated geometries:

- WKB roundtrip identity (the engine's canonical serialization)
- predicate algebra: intersects symmetric, within == transpose of
  contains, contains implies covers, disjoint == !intersects
- overlay algebra: inclusion-exclusion, idempotence, commutativity
- distance: symmetric, zero iff intersecting (for these shapes)
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rayspatial import geom as g

coord = st.floats(min_value=-90, max_value=90, allow_nan=False,
                  allow_infinity=False, width=32)


@st.composite
def boxes(draw, n=1):
    xs = [sorted((draw(coord), draw(coord))) for _ in range(n)]
    ys = [sorted((draw(coord), draw(coord))) for _ in range(n)]
    xmin = np.array([a for a, _ in xs])
    xmax = np.array([b for _, b in xs]) + 1.0
    ymin = np.array([a for a, _ in ys])
    ymax = np.array([b for _, b in ys]) + 1.0
    return g.box(xmin, ymin, xmax, ymax)


@st.composite
def point_sets(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    pts = [[draw(coord), draw(coord)] for _ in range(n)]
    return g.points(pts)


@settings(max_examples=40, deadline=None)
@given(point_sets())
def test_wkb_roundtrip_points(pts):
    back = g.from_wkb(g.to_wkb(pts))
    assert g.equals_exact(pts, back).all()


@settings(max_examples=40, deadline=None)
@given(boxes(n=2))
def test_wkb_roundtrip_boxes(bx):
    back = g.from_wkb(g.to_wkb(bx))
    assert g.equals_exact(bx, back).all()


@settings(max_examples=40, deadline=None)
@given(boxes(n=1), boxes(n=1))
def test_predicate_algebra(a, b):
    assert g.intersects(a, b)[0] == g.intersects(b, a)[0]
    assert g.disjoint(a, b)[0] == (not g.intersects(a, b)[0])
    assert g.within(a, b)[0] == g.contains(b, a)[0]
    if g.contains(a, b)[0]:
        assert g.covers(a, b)[0]
    if g.contains_properly(a, b)[0]:
        assert g.contains(a, b)[0]
    assert g.covered_by(a, b)[0] == g.covers(b, a)[0]


@settings(max_examples=30, deadline=None)
@given(boxes(n=1), boxes(n=1))
def test_overlay_algebra(a, b):
    aa, ab = g.area(a)[0], g.area(b)[0]
    ai = g.area(g.intersection(a, b))[0]
    au = g.area(g.union(a, b))[0]
    ad = g.area(g.difference(a, b))[0]
    asym = g.area(g.symmetric_difference(a, b))[0]
    tol = 1e-6 * max(aa, ab, 1.0)
    assert au == pytest.approx(aa + ab - ai, abs=tol)
    assert ad == pytest.approx(aa - ai, abs=tol)
    assert asym == pytest.approx(au - ai, abs=tol)
    # idempotence / commutativity (by area)
    assert g.area(g.union(a, a))[0] == pytest.approx(aa, abs=tol)
    assert g.area(g.intersection(b, a))[0] == pytest.approx(ai, abs=tol)


@settings(max_examples=40, deadline=None)
@given(boxes(n=1), boxes(n=1))
def test_distance_properties(a, b):
    dab = g.distance(a, b)[0]
    dba = g.distance(b, a)[0]
    assert dab == dba
    assert (dab == 0.0) == bool(g.intersects(a, b)[0])


@settings(max_examples=30, deadline=None)
@given(point_sets())
def test_knn_certification_random(pts):
    """KnnJoiner's ring-expansion result == brute force for random
    point probes against the standard polygon layer."""
    import pyarrow as pa

    from rayspatial.geom.wkb import to_wkb
    from rayspatial.ops.knn import KnnJoiner, _bbox_dist2
    from rayspatial.pipeline.polygons import polygon_boxes, polygon_geoms

    x = g.get_x(pts)
    y = g.get_y(pts)
    ok = ~np.isnan(x)
    x, y = x[ok], y[ok]
    if not len(x):
        return
    j = KnnJoiner(
        {"wkb": to_wkb(polygon_geoms()), "ids": np.arange(240)}, k=2, res=5
    )
    batch = pa.table({"lon": x, "lat": y, "rid": np.arange(len(x))})
    out = j(batch).to_pandas().sort_values(["rid", "rank"])
    d2 = _bbox_dist2(x, y, polygon_boxes())
    for rid in range(len(x)):
        order = sorted(range(240), key=lambda q: (d2[rid, q], q))[:2]
        got = out[out["rid"] == rid]["poly_id"].tolist()
        assert got == order


@given(
    st.integers(-15, 15), st.integers(-15, 15),
    st.integers(-6, 6), st.integers(-6, 6),
    st.integers(-15, 10), st.integers(-15, 10),
    st.integers(1, 12), st.integers(1, 12),
)
@settings(max_examples=200, deadline=None)
def test_liang_barsky_matches_exact_lineal_kernel(
    x1, y1, dx, dy, bx, by_, bw, bh
):
    """Property: the vectorized segment x box clip agrees with the
    exact lineal intersection kernel on integer inputs (len2 metric)."""
    import numpy as np

    from rayspatial import geom as g
    from rayspatial.ops.lineclip import (
        _len2_per_row,
        _liang_barsky_len2,
        _segments_geomarray,
    )

    X1 = np.array([float(x1)]); Y1 = np.array([float(y1)])
    X2 = np.array([float(x1 + dx)]); Y2 = np.array([float(y1 + dy)])
    boxes = np.array([[float(bx), float(by_),
                       float(bx + bw), float(by_ + bh)]])
    keep, len2 = _liang_barsky_len2(X1, Y1, X2, Y2, boxes)
    from rayspatial.geom.setops import _slice_rows, intersection

    polys = g.box(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    inter = intersection(
        _segments_geomarray(X1, Y1, X2, Y2), _slice_rows(polys, [0])
    )
    exact = _len2_per_row(inter)
    assert (len2[0] if keep[0] else 0) == exact[0]


@given(
    st.integers(0, 6), st.integers(0, 6),
    st.integers(2, 8), st.integers(2, 8),
    st.integers(-4, 12), st.integers(-4, 12),
    st.integers(2, 8), st.integers(2, 8),
)
@settings(max_examples=120, deadline=None)
def test_poly_intersection_area_never_exceeds_operands(
    ax, ay, aw, ah, bx, by_, bw, bh
):
    """Property: for L-shape x box pairs (any mix of GC / polygon /
    multipolygon outputs), intersection area <= min operand area and
    the intersection is covered by both operands' bboxes."""
    from rayspatial import geom as g
    from rayspatial.geom.setops import intersection

    a = g.from_wkt([
        f"POLYGON(({ax} {ay},{ax+aw} {ay},{ax+aw} {ay+ah//2},"
        f"{ax+aw//2} {ay+ah//2},{ax+aw//2} {ay+ah},{ax} {ay+ah},{ax} {ay}))"
    ])
    b = g.box(float(bx), float(by_), float(bx + bw), float(by_ + bh))
    out = intersection(a, b)
    ia = float(g.area(out)[0])
    assert ia <= min(float(g.area(a)[0]), float(g.area(b)[0])) + 1e-9
    bounds = g.bounds(out)
    if ia > 0:
        import numpy as np

        ob = bounds[0]
        if not np.isnan(ob).any():
            assert ob[0] >= max(ax, bx) - 1e-9
            assert ob[1] >= max(ay, by_) - 1e-9
            assert ob[2] <= min(ax + aw, bx + bw) + 1e-9
            assert ob[3] <= min(ay + ah, by_ + bh) + 1e-9


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=120, deadline=None)
def test_greedy_bins_matches_sequential(tokens, budget, n_units):
    """_greedy_bins (rounds-vectorized) == per-unit sequential greedy."""
    import numpy as np

    from rayspatial.textops.packing import _greedy_bins

    nt = np.asarray(tokens, dtype=np.int64)
    cuts = sorted({0, len(nt)} | set(
        int(x) % (len(nt) + 1) for x in range(0, n_units)))
    unit_starts = np.asarray(cuts, dtype=np.int64)
    got = _greedy_bins(nt, unit_starts, budget)

    expect = np.zeros(len(nt), dtype=np.int64)
    for a, b in zip(unit_starts[:-1], unit_starts[1:]):
        run, binno = None, 0
        for i in range(a, b):
            if run is None:
                run = nt[i]
            elif run + nt[i] > budget:
                binno += 1
                run = nt[i]
            else:
                run += nt[i]
            expect[i] = binno
    assert np.array_equal(got, expect)
