"""Predicate semantics vs the reference's GEOS behavior
(reference pygeos/tests/test_predicates.py and OGC DE-9IM definitions;
point-on-boundary rules per predicates.py:470-521)."""

import numpy as np
import pytest

from rayspatial.geom import io as gio
from rayspatial.geom import measures as M
from rayspatial.geom import predicates as P


def g(*wkts):
    return gio.from_wkt(list(wkts))


ALL_TYPES = [
    "POINT (2 3)",
    "LINESTRING (0 0, 1 0, 1 1)",
    "LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)",
    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    "MULTIPOINT (0 0, 1 2)",
    "MULTILINESTRING ((0 0, 1 2))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2.1 2.1, 2.2 2.1, 2.2 2.2, 2.1 2.2, 2.1 2.1)))",
    "GEOMETRYCOLLECTION (POINT (51 -1), LINESTRING (52 -1, 49 2))",
    "GEOMETRYCOLLECTION EMPTY",
]

BINARY = [
    P.disjoint,
    P.touches,
    P.intersects,
    P.crosses,
    P.within,
    P.contains,
    P.contains_properly,
    P.overlaps,
    P.covers,
    P.covered_by,
    P.equals,
    P.equals_exact,
]


@pytest.mark.parametrize("wkt", ALL_TYPES)
@pytest.mark.parametrize("func", BINARY)
def test_binary_no_error_bool(wkt, func):
    # reference test_predicates.py:84-92: runs over all types x point
    a = g(wkt, wkt)
    b = g("POINT (2 3)", "POINT (2 3)")
    actual = func(a, b)
    assert actual.shape == (2,)
    assert actual.dtype == np.bool_


@pytest.mark.parametrize("func", BINARY)
def test_binary_missing(func):
    # reference test_predicates.py:103-106: missing -> all False
    a = g("POINT (2 3)", None, None)
    b = g(None, "POINT (2 3)", None)
    assert (~func(a, b)).all()


def test_point_boundary_semantics():
    """GEOS: point on boundary -> contains F, covers T, intersects T,
    touches T, disjoint F (SURVEY.md §7.4 item 1)."""
    box = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    pts = g("POINT (3 3)", "POINT (2 3)", "POINT (0 0)", "POINT (2 2)")
    boxes = g(*[box] * 4)
    assert P.contains(boxes, pts).tolist() == [True, False, False, False]
    assert P.contains_properly(boxes, pts).tolist() == [True, False, False, False]
    assert P.covers(boxes, pts).tolist() == [True, True, False, True]
    assert P.intersects(boxes, pts).tolist() == [True, True, False, True]
    assert P.touches(boxes, pts).tolist() == [False, True, False, True]
    assert P.within(pts, boxes).tolist() == [True, False, False, False]
    assert P.covered_by(pts, boxes).tolist() == [True, True, False, True]
    assert P.disjoint(boxes, pts).tolist() == [False, False, True, False]


def test_contains_subset_of_covers():
    """Property: contains implies covers; within == transpose(contains)."""
    rng = np.random.default_rng(3)
    pts = [f"POINT ({x:.3f} {y:.3f})" for x, y in rng.uniform(0, 5, (50, 2))]
    box = ["POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))"] * 50
    a, b = g(*box), g(*pts)
    c = P.contains(a, b)
    v = P.covers(a, b)
    assert (v | ~c).all()
    assert (P.within(b, a) == c).all()


def test_hole_semantics():
    pwh = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
    pts = g("POINT (3 3)", "POINT (1 1)", "POINT (2 3)")
    ph = g(*[pwh] * 3)
    assert P.contains(ph, pts).tolist() == [False, True, False]
    assert P.covers(ph, pts).tolist() == [False, True, True]
    assert P.intersects(ph, pts).tolist() == [False, True, True]
    # box covering the hole is not covered
    hb = g("POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")
    assert not P.covers(g(pwh), hb)[0]
    assert P.intersects(g(pwh), hb)[0]


def test_line_line():
    l1 = g("LINESTRING (0 0, 2 2)", "LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 0)", "LINESTRING (0 1, 1 0)")
    l2 = g("LINESTRING (0 2, 2 0)", "LINESTRING (1 1, 2 2)", "LINESTRING (2 0, 3 0)", "LINESTRING (0 0, 1 1)")
    assert P.crosses(l1, l2).tolist() == [True, False, False, True]
    assert P.touches(l1, l2).tolist() == [False, True, False, False]
    assert P.intersects(l1, l2).tolist() == [True, True, False, True]
    a = g("LINESTRING (0 0, 2 0)")
    b = g("LINESTRING (1 0, 3 0)")
    assert P.overlaps(a, b)[0] and not P.crosses(a, b)[0]
    # equal lines
    assert P.equals(g("LINESTRING (0 0, 2 0)"), g("LINESTRING (2 0, 0 0)"))[0]


def test_line_polygon():
    pol = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert P.within(g("LINESTRING (3 3, 5 5)"), pol)[0]
    assert P.crosses(g("LINESTRING (-1 5, 11 5)"), pol)[0]
    # line along the boundary: covered but does not intersect interior
    edge = g("LINESTRING (0 0, 10 0)")
    assert P.covers(pol, edge)[0]
    assert not P.contains(pol, edge)[0]
    assert P.touches(pol, edge)[0]


def test_polygon_polygon():
    p1 = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    p2 = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    p3 = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    p4 = g("POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")
    assert P.overlaps(p1, p2)[0]
    assert P.contains(p1, p3)[0] and P.contains_properly(p1, p3)[0]
    assert P.touches(p1, p4)[0] and not P.overlaps(p1, p4)[0]
    # shared-edge neighbor: covers False, intersects True
    assert not P.covers(p1, p4)[0]
    assert P.intersects(p1, p4)[0]
    # equality with different start vertex
    e2 = g("POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))")
    assert P.equals(p1, e2)[0]
    assert not P.equals_exact(p1, e2)[0]  # structural differs


def test_multipoint_predicates():
    mp = g("MULTIPOINT (1 1, 5 5)")
    pol = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    # some in, some out -> crosses (0-dim vs 2-dim)
    assert P.crosses(mp, pol)[0]
    assert not P.within(mp, pol)[0]
    assert P.intersects(mp, pol)[0]
    mp2 = g("MULTIPOINT (1 1, 1.5 1.5)")
    assert P.within(mp2, pol)[0]


def test_equals_exact_tolerance():
    # reference test_predicates.py:109-121
    p1 = g("POINT (50 4)", "POINT (50.1 4.1)", None)
    p2 = g("POINT (50 4)", "POINT (50 4)", "POINT (50 4)")
    assert P.equals_exact(p1, p2, tolerance=0.05).tolist() == [True, False, False]
    assert P.equals_exact(p1, p2, tolerance=0.2).tolist() == [True, True, False]


def test_unary():
    u = g(
        "POINT (2 3)",
        "LINESTRING (0 0, 1 1)",
        "LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)",
        "POLYGON EMPTY",
        None,
        "LINESTRING (0 0, 1 1, 0 1, 1 0)",  # self-crossing, not simple
    )
    assert P.is_empty(u).tolist() == [False, False, False, True, False, False]
    assert P.is_missing(u).tolist() == [False, False, False, False, True, False]
    assert P.is_geometry(u).tolist() == [True, True, True, True, False, True]
    assert P.is_closed(u).tolist() == [False, False, True, False, False, False]
    assert P.is_ring(u).tolist() == [False, False, True, False, False, False]
    assert P.is_simple(u).tolist() == [True, True, True, True, False, False]
    assert P.is_valid_input(u).all()


def test_is_ccw():
    u = g(
        "LINEARRING (0 0, 1 0, 1 1, 0 0)",       # ccw
        "LINEARRING (0 0, 0 1, 1 1, 0 0)",       # cw
        "POINT (2 3)",
        "LINESTRING (0 0, 1 1)",                  # not closed
    )
    assert P.is_ccw(u).tolist() == [True, False, False, False]


def test_dwithin():
    a = g("POINT (0 0)", "POINT (0 0)", None)
    b = g("POINT (0 3)", "POINT (0 3)", "POINT (0 0)")
    assert P.dwithin(a, b, 3.0).tolist() == [True, True, False]
    assert P.dwithin(a, b, 2.9).tolist() == [False, False, False]


def test_distance_measures():
    box = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    # reference test_measurement.py: distance vs hand-computed sqrt(2)
    d = M.distance(g("POINT (5 5)", "POINT (3 3)"), g(box, box))
    assert abs(d[0] - np.sqrt(2)) < 1e-12
    assert d[1] == 0.0
    # empty/missing -> NaN
    d2 = M.distance(g("POINT EMPTY", None), g("POINT (0 0)", "POINT (0 0)"))
    assert np.isnan(d2).all()


def test_area_length_bounds():
    pwh = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
    mm = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", pwh, "LINESTRING (0 0, 1 0, 1 1)", "POINT (2 3)", None)
    assert M.area(mm).tolist()[:4] == [4.0, 96.0, 0.0, 0.0]
    assert np.isnan(M.area(mm)[4])
    assert M.length(mm).tolist()[:4] == [8.0, 48.0, 2.0, 0.0]
    b = M.bounds(mm)
    assert b[0].tolist() == [0, 0, 2, 2]
    assert b[3].tolist() == [2, 3, 2, 3]
    assert np.isnan(b[4]).all()
    tb = M.total_bounds(mm)
    assert tb.tolist() == [0, 0, 10, 10]


def test_hausdorff():
    # reference test_measurement.py hausdorff examples
    a = g("LINESTRING (130 0, 0 0, 0 150)")
    b = g("LINESTRING (10 10, 10 150, 130 10)")
    h = M.hausdorff_distance(a, b)
    assert abs(h[0] - 14.142135623730951) < 1e-9


def test_prepare_cycle():
    """reference creation.py:472-523 / predicates.py:224-259: prepare
    caches per-row state in place, is_prepared reflects it, predicates
    are unchanged, destroy_prepared drops it."""
    from rayspatial import geom as g

    polys = g.from_wkt([
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))",
    ])
    pts = g.from_wkt(["POINT (1 1)", "POINT (0 0)"])
    before = list(g.contains(polys, pts))
    assert not g.is_prepared(polys).any()
    g.prepare(polys)
    assert g.is_prepared(polys).all()
    assert list(g.contains(polys, pts)) == before
    g.destroy_prepared(polys)
    assert not g.is_prepared(polys).any()
