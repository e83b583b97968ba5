"""Polygon-lhs relate / relate_pattern vs GEOS-truth DE-9IM matrices
(reference predicates.py:953-1008; closes the last predicate gap).
Lineal/point-lhs truth tables live in tests/test_geom_parity2.py."""

from __future__ import annotations

import pytest

from rayspatial import geom as g

SQ = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
BIG = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"

CASES = [
    # (A, B, GEOS relate(A, B))
    (SQ, SQ, "2FFF1FFF2"),
    (BIG, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "212FF1FF2"),  # contains
    ("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", BIG, "2FF1FF212"),  # within
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))", "212101212"),        # overlaps
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
     "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", "FF2FF1212"),        # disjoint
    (SQ, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "FF2F11212"),    # edge touch
    (SQ, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "FF2F01212"),    # corner
    (BIG, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "212F11FF2"),   # shared edge
    # polygon vs point (transpose symmetry; a point's boundary is EMPTY)
    (SQ, "POINT (1 1)", "0F2FF1FF2"),
    (SQ, "POINT (2 1)", "FF20F1FF2"),
    (SQ, "POINT (5 5)", "FF2FF10F2"),
    # polygon vs line (transpose of the noded-arrangement lineal branch)
    (SQ, "LINESTRING (-1 1, 3 1)", "1F20F1102"),
    (SQ, "LINESTRING (0 0, 2 0)", "FF2101FF2"),                  # on edge
]


@pytest.mark.parametrize("a,b,expected", CASES)
def test_relate_polygon_lhs(a, b, expected):
    got = g.relate(g.from_wkt([a]), g.from_wkt([b]))[0]
    assert got == expected


def test_relate_pattern_polygon():
    a = g.from_wkt([BIG])
    b = g.from_wkt(["POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"])
    assert bool(g.relate_pattern(a, b, "T*****FF*")[0])   # contains
    assert not bool(g.relate_pattern(b, a, "T*****FF*")[0])
    assert bool(g.relate_pattern(b, a, "T*F**F***")[0])   # within


def test_relate_symmetry_transpose():
    """relate(A, B) must equal the transpose of relate(B, A)."""
    wkts = [SQ, BIG, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))",
            "LINESTRING (-1 1, 3 1)", "POINT (1 1)"]
    idx = (0, 3, 6, 1, 4, 7, 2, 5, 8)
    for a in wkts:
        for b in wkts:
            if a.startswith(("LINESTRING", "POINT")) and a == b:
                continue
            try:
                m_ab = g.relate(g.from_wkt([a]), g.from_wkt([b]))[0]
                m_ba = g.relate(g.from_wkt([b]), g.from_wkt([a]))[0]
            except NotImplementedError:
                continue
            assert m_ab == "".join(m_ba[k] for k in idx), (a, b)


def test_relate_gc_raises():
    gc = g.from_wkt(["GEOMETRYCOLLECTION (POINT (1 1))"])
    with pytest.raises(NotImplementedError):
        g.relate(g.from_wkt([SQ]), gc)


MULTIPOINT_CASES = [
    ("MULTIPOINT (1 1, 5 5)", SQ, "0F0FFF212"),
    ("MULTIPOINT (0.5 0.5, 1 1)", SQ, "0FFFFF212"),
    ("MULTIPOINT (1 0, 5 5)", "LINESTRING (0 0, 2 0)", "0F0FFF102"),
    ("MULTIPOINT (0 0, 1 1)", "MULTIPOINT (0 0, 1 1)", "0FFFFFFF2"),
    ("MULTIPOINT (0 0, 1 1)", "MULTIPOINT (1 1, 2 2)", "0F0FFF0F2"),
    ("LINESTRING (0 0, 2 0)", "MULTIPOINT (1 0, 5 5)", "0F1FF00F2"),
    (SQ, "MULTIPOINT (1 1, 5 5)", "0F2FF10F2"),
]


@pytest.mark.parametrize("a,b,expected", MULTIPOINT_CASES)
def test_relate_multipoint(a, b, expected):
    got = g.relate(g.from_wkt([a]), g.from_wkt([b]))[0]
    assert got == expected
