"""Lineal / mixed-type set operations (geom/lineal_ops.py) vs
GEOS-truth expectations, mirroring reference
pygeos/tests/test_set_operations.py's all_types matrix
(common.py:13-64)."""

from __future__ import annotations

import numpy as np
import pytest

from rayspatial import geom as g

# the reference's all_types fixtures (reference pygeos/tests/common.py)
ALL_TYPES_WKT = [
    "POINT (2 3)",
    "LINESTRING (0 0, 1 0, 1 1)",
    "LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)",
    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    "MULTIPOINT (0 0, 1 2)",
    "MULTILINESTRING ((0 0, 1 2))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
    "((2.1 2.1, 2.2 2.1, 2.2 2.2, 2.1 2.2, 2.1 2.1)))",
    "GEOMETRYCOLLECTION (POINT (51 -1), LINESTRING (52 -1, 49 2))",
    "GEOMETRYCOLLECTION EMPTY",
]

OPS = [g.intersection, g.union, g.difference, g.symmetric_difference]


def one(wkt: str):
    return g.from_wkt([wkt])


def wkt_of(ga) -> str:
    return g.to_wkt(ga)[0]


@pytest.mark.parametrize("a_wkt", ALL_TYPES_WKT)
@pytest.mark.parametrize("op", OPS)
def test_all_types_vs_point(a_wkt, op):
    """reference test_set_operation_array: func([a, a], point) works
    for every type."""
    a = g.from_wkt([a_wkt, a_wkt])
    out = op(a, one("POINT (2 3)"))
    assert len(out) == 2
    assert out.types[0] == out.types[1]


@pytest.mark.parametrize("a_wkt", ALL_TYPES_WKT)
@pytest.mark.parametrize("b_wkt", ALL_TYPES_WKT)
def test_full_type_matrix_no_raise(a_wkt, b_wkt):
    """Every (type, type) pair supports every set op; lineal length is
    conserved: len(a) == len(a & b) + len(a - b) restricted to a's
    lineal carrier (exact for these integer-coordinate fixtures)."""
    a, b = one(a_wkt), one(b_wkt)
    res = {op.__name__: op(a, b) for op in OPS}
    for r in res.values():
        assert len(r) == 1
    la = float(g.length(a)[0])
    li = float(g.length(res["intersection"])[0])
    ld = float(g.length(res["difference"])[0])
    if "POLYGON" not in a_wkt and "EMPTY" not in a_wkt:
        # a is puntal/lineal (or GC whose lineal part dominates length)
        assert la == pytest.approx(li + ld, abs=1e-9)


def test_line_line_crossing():
    a = one("LINESTRING (0 0, 2 2)")
    b = one("LINESTRING (0 2, 2 0)")
    assert wkt_of(g.intersection(a, b)) == "POINT (1 1)"
    u = g.union(a, b)
    assert u.types[0] == 5  # MULTILINESTRING, noded at the crossing
    assert float(g.length(u)[0]) == pytest.approx(
        float(g.length(a)[0]) + float(g.length(b)[0])
    )


def test_line_line_collinear_overlap():
    a = one("LINESTRING (0 0, 3 0)")
    b = one("LINESTRING (1 0, 5 0)")
    assert wkt_of(g.intersection(a, b)) == "LINESTRING (1 0, 3 0)"
    assert wkt_of(g.difference(a, b)) == "LINESTRING (0 0, 1 0)"
    assert (
        wkt_of(g.symmetric_difference(a, b))
        == "MULTILINESTRING ((0 0, 1 0), (3 0, 5 0))"
    )
    assert float(g.length(g.union(a, b))[0]) == pytest.approx(5.0)


def test_line_polygon_clip():
    box = g.box(0, 0, 2, 2)
    ln = one("LINESTRING (-1 1, 3 1)")
    assert wkt_of(g.intersection(ln, box)) == "LINESTRING (0 1, 2 1)"
    assert (
        wkt_of(g.difference(ln, box))
        == "MULTILINESTRING ((-1 1, 0 1), (2 1, 3 1))"
    )
    # polygon minus a line is the polygon (area conserved)
    assert float(g.area(g.difference(box, ln))[0]) == pytest.approx(4.0)
    # union: line absorbed inside, outside stubs kept alongside polygon
    u = g.union(ln, box)
    assert u.types[0] == 7  # GEOMETRYCOLLECTION
    assert float(g.area(u)[0]) == pytest.approx(4.0)
    assert float(g.length(u)[0]) == pytest.approx(2.0 + 8.0)  # stubs + ring


def test_line_polygon_touch_point():
    box = g.box(0, 0, 2, 2)
    ln = one("LINESTRING (-1 -1, 0 0)")
    assert wkt_of(g.intersection(ln, box)) == "POINT (0 0)"


def test_line_on_polygon_boundary():
    box = g.box(0, 0, 2, 2)
    ln = one("LINESTRING (0 0, 2 0)")  # collinear with the bottom edge
    assert wkt_of(g.intersection(ln, box)) == "LINESTRING (0 0, 2 0)"
    assert float(g.length(g.difference(ln, box))[0]) == 0.0


def test_multipoint_line():
    mp = one("MULTIPOINT (0 0, 1 0, 5 5)")
    ln = one("LINESTRING (0 0, 2 0)")
    assert wkt_of(g.intersection(mp, ln)) == "MULTIPOINT (0 0, 1 0)"
    assert wkt_of(g.difference(mp, ln)) == "POINT (5 5)"


def test_disjoint_lines_empty_intersection():
    a = one("LINESTRING (0 0, 1 0)")
    b = one("LINESTRING (5 5, 6 5)")
    out = g.intersection(a, b)
    assert bool(g.is_empty(out)[0])


def test_union_all_lines():
    ga = g.from_wkt(["LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)"])
    u = g.union_all(ga)
    assert float(g.length(u)[0]) == pytest.approx(3.0)


def test_union_all_mixed():
    ga = g.from_wkt([
        "POINT (5 5)",
        "LINESTRING (0 0, 1 1)",  # inside the polygon -> absorbed
        "LINESTRING (2 2, 4 2)",  # sticks out
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    ])
    u = g.union_all(ga)
    assert u.types[0] == 7
    assert float(g.area(u)[0]) == pytest.approx(4.0)
    assert float(g.length(u)[0]) == pytest.approx(2.0 + 8.0)
    # POINT (5 5) survives (not covered by line or polygon)
    w = wkt_of(u)
    assert "POINT (5 5)" in w


def test_union_all_reduce_matches_pairwise():
    """reference test_set_operation_reduce_1dim over lineal data."""
    wkts = [
        "LINESTRING (0 0, 2 0)",
        "LINESTRING (1 0, 3 0)",
        "LINESTRING (0 1, 2 1)",
    ]
    ga = g.from_wkt(wkts)
    red = g.union_all(ga)
    acc = g.from_wkt([wkts[0]])
    for w in wkts[1:]:
        acc = g.union(acc, g.from_wkt([w]))
    assert float(g.length(red)[0]) == pytest.approx(float(g.length(acc)[0]))


def test_intersection_all_lineal():
    ga = g.from_wkt(["LINESTRING (0 0, 4 0)", "LINESTRING (1 0, 5 0)",
                     "LINESTRING (2 0, 6 0)"])
    out = g.intersection_all(ga)
    assert wkt_of(out) == "LINESTRING (2 0, 4 0)"


def test_coverage_union_binary():
    """reference set_operations.py:397-433 (binary form)."""
    a = g.box(0, 0, 1, 1)
    b = g.box(1, 0, 2, 1)
    u = g.coverage_union(a, b)
    assert len(u) == 1
    assert float(g.area(u)[0]) == pytest.approx(2.0)
    assert u.types[0] == 6  # MULTIPOLYGON (not dissolved, engine doc)


def test_ring_as_lineal_operand():
    ring = one("LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)")
    box = g.box(0, 0, 2, 2)
    out = g.intersection(ring, box)
    assert float(g.length(out)[0]) == pytest.approx(4.0)
    assert float(g.length(g.difference(ring, box))[0]) == 0.0


def test_polygon_intersection_lower_dim_contact():
    """GEOS: polygons with no area overlap still intersect in their
    boundary contact — shared edges as LINESTRING, corner touches as
    POINT (both the box fast path and the general/convex paths)."""
    def inter(a, b):
        return g.intersection(one(a), one(b))

    # box fast path
    assert wkt_of(inter("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                        "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")) \
        == "LINESTRING (2 0, 2 2)"
    assert wkt_of(inter("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                        "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")) == "POINT (2 2)"
    # convex (triangle) path
    assert wkt_of(inter("POLYGON ((0 0, 2 0, 1 2, 0 0))",
                        "POLYGON ((0 0, 2 0, 1 -2, 0 0))")) \
        == "LINESTRING (0 0, 2 0)"
    assert wkt_of(inter("POLYGON ((0 0, 2 0, 1 2, 0 0))",
                        "POLYGON ((1 2, 3 2, 2 4, 1 2))")) == "POINT (1 2)"
    # disjoint stays empty
    assert bool(g.is_empty(inter("POLYGON ((0 0, 2 0, 1 2, 0 0))",
                                 "POLYGON ((10 0, 12 0, 11 2, 10 0))"))[0])
