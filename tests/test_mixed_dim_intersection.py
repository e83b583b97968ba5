"""Mixed-dimension poly x poly intersection outputs (round-3 item:
reference set_operations.py:79-131 / GEOS semantics): when the areal
overlap AND extra boundary contact coexist, the result is a
GEOMETRYCOLLECTION of the polygon plus the off-area lines/points.
Also covers the Sutherland-Hodgman routing fix: concave pairs whose
intersection is disconnected must come back as MULTIPOLYGON, not one
degenerate self-touching ring."""

from __future__ import annotations

import numpy as np
import pytest

from rayspatial import geom as g
from rayspatial.geom.setops import intersection


def wkt1(ga) -> str:
    return g.to_wkt(ga)[0]


def test_multipolygon_area_plus_shared_edge_gc():
    m = g.from_wkt(
        ["MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((5 0,7 0,7 2,5 2,5 0)))"]
    )
    c = g.from_wkt(["POLYGON((1 0,5 0,5 2,1 2,1 0))"])
    out = intersection(m, c)
    assert g.get_type_id(out)[0] == 7  # GEOMETRYCOLLECTION
    w = wkt1(out)
    assert "POLYGON" in w and "LINESTRING (5 0, 5 2)" in w
    assert g.area(out)[0] == pytest.approx(2.0)


def test_multipolygon_area_plus_corner_touch_gc():
    m = g.from_wkt(
        ["MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((5 5,6 5,6 6,5 6,5 5)))"]
    )
    c = g.from_wkt(["POLYGON((1 1,5 1,5 5,1 5,1 1))"])
    out = intersection(m, c)
    assert g.get_type_id(out)[0] == 7
    w = wkt1(out)
    assert "POINT (5 5)" in w
    assert g.area(out)[0] == pytest.approx(1.0)


def test_concave_pair_area_plus_collinear_edge_gc():
    a = g.from_wkt(["POLYGON((0 0,6 0,6 2,2 2,2 6,0 6,0 0))"])  # L-shape
    b = g.from_wkt(
        ["POLYGON((0 2,1 2,1 3,3 3,3 2,5 2,5 3,6 3,6 4,0 4,0 2))"]
    )
    out = intersection(a, b)
    assert g.get_type_id(out)[0] == 7
    w = wkt1(out)
    assert "LINESTRING (3 2, 5 2)" in w
    assert g.area(out)[0] == pytest.approx(3.0)


def test_contact_on_area_boundary_stays_polygon():
    """Contact coinciding with the areal result's own boundary must NOT
    produce an extra line — it is already part of the polygon."""
    a = g.from_wkt(["POLYGON((0 0,6 0,6 2,2 2,2 6,0 6,0 0))"])
    b = g.from_wkt(["POLYGON((0 2,2 2,2 4,0 4,0 2))"])
    out = intersection(a, b)
    assert g.get_type_id(out)[0] == 3  # plain POLYGON
    assert g.area(out)[0] == pytest.approx(4.0)


def test_concave_subject_disconnected_clip_is_multipolygon():
    """SH routing fix: U-shape clipped by an overlapping band intersects
    in TWO squares -> MULTIPOLYGON, no zero-width connector."""
    u = g.from_wkt(["POLYGON((0 0,1 0,1 3,3 3,3 0,4 0,4 4,0 4,0 0))"])
    s = g.from_wkt(["POLYGON((0 -1,4 -1,4 1,0 1,0 -1))"])
    out = intersection(u, s)
    assert g.get_type_id(out)[0] == 6  # MULTIPOLYGON
    assert g.get_num_geometries(out)[0] == 2
    assert g.area(out)[0] == pytest.approx(2.0)
    assert g.is_valid(out)[0]


def test_convex_pair_fast_path_unchanged():
    p1 = g.from_wkt(["POLYGON((0 0,4 0,4 4,0 4,0 0))"])
    p2 = g.from_wkt(["POLYGON((2 2,6 2,6 6,2 6,2 2))"])
    out = intersection(p1, p2)
    assert g.get_type_id(out)[0] == 3
    assert g.area(out)[0] == pytest.approx(4.0)
