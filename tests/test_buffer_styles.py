"""Styled buffer (reference constructive.py:82-184: cap_style,
join_style, mitre_limit, single_sided) verified against ANALYTIC areas
— offset-rectangle + join-patch + cap construction makes flat/square
caps and bevel/mitre joins exact, while round pieces differ from
pi*r^2 only by the 4*quadsegs-gon discretization (inscribed, hence
strictly smaller)."""

from __future__ import annotations

import numpy as np
import pytest

from rayspatial import geom as g


def area(x) -> float:
    return float(g.area(x)[0])


LN = g.linestrings([[(0, 0), (10, 0)]])          # straight segment
LP = g.linestrings([[(0, 0), (10, 0), (10, 10)]])  # right-angle path
BOX = g.box(0, 0, 10, 10)


def test_cap_styles_exact():
    assert area(g.buffer(LN, 2, cap_style="flat")) == pytest.approx(40.0)
    assert area(g.buffer(LN, 2, cap_style="square")) == pytest.approx(56.0)
    round_a = area(g.buffer(LN, 2))
    # two half-disks of the inscribed 32-gon
    k = 32
    disk = 0.5 * k * 4.0 * np.sin(2 * np.pi / k)
    assert round_a == pytest.approx(40.0 + disk, rel=1e-9)
    assert round_a < 40.0 + np.pi * 4.0


def test_join_styles_exact():
    assert area(
        g.buffer(LP, 2, cap_style="flat", join_style="bevel")
    ) == pytest.approx(78.0)
    assert area(
        g.buffer(LP, 2, cap_style="flat", join_style="mitre")
    ) == pytest.approx(80.0)
    rj = area(g.buffer(LP, 2, cap_style="flat", join_style="round"))
    assert 76.0 < rj < 76.0 + np.pi + 1e-9  # quarter-disk join


def test_mitre_limit_crops_spike():
    sharp = g.linestrings([[(0, 0), (10, 0), (0, 1)]])
    a_wide = area(g.buffer(sharp, 1, cap_style="flat", join_style="mitre",
                           mitre_limit=50))
    a_crop = area(g.buffer(sharp, 1, cap_style="flat", join_style="mitre",
                           mitre_limit=2))
    a_bevel = area(g.buffer(sharp, 1, cap_style="flat", join_style="bevel"))
    assert a_bevel < a_crop < a_wide


def test_single_sided():
    left = g.buffer(LN, 2, single_sided=True)
    right = g.buffer(LN, -2, single_sided=True)
    assert area(left) == pytest.approx(20.0)
    assert area(right) == pytest.approx(20.0)
    # left buffer of a west->east line lies above it, right below
    bl = g.bounds(left)[0]
    br = g.bounds(right)[0]
    assert bl[1] == pytest.approx(0.0) and bl[3] == pytest.approx(2.0)
    assert br[1] == pytest.approx(-2.0) and br[3] == pytest.approx(0.0)


def test_polygon_join_styles():
    assert area(g.buffer(BOX, 2, join_style="mitre")) == pytest.approx(196.0)
    assert area(g.buffer(BOX, 2, join_style="bevel")) == pytest.approx(188.0)
    r = area(g.buffer(BOX, 2))
    assert 180.0 < r < 180.0 + 4 * np.pi + 1e-9


def test_negative_buffer_box_exact():
    assert area(g.buffer(BOX, -2)) == pytest.approx(36.0)
    # erode to nothing
    assert area(g.buffer(BOX, -6)) == pytest.approx(0.0)


def test_negative_buffer_reflex_corner_rounds():
    """Erosion boundary at a REFLEX vertex is an arc: area exceeds the
    square-corner (mitre) erosion by ~(1 - pi/4) r^2 (SURVEY 8.4.3)."""
    lpoly = g.from_wkt(["POLYGON ((0 0, 10 0, 10 10, 6 10, 6 4, 0 4, 0 0))"])
    er = area(g.buffer(lpoly, -1))
    square_er = 28.0  # two rects minus overlap, square corner
    assert er > square_er
    assert er == pytest.approx(square_er + (1 - np.pi / 4), abs=0.02)


def test_multipoint_overlapping_disks_dissolve():
    mp = g.from_wkt(["MULTIPOINT (0 0, 1 0)"])
    bu = g.buffer(mp, 1)
    assert bool(g.is_valid(bu)[0])
    # dissolved union is smaller than 2 disjoint disks
    k = 32
    disk = 0.5 * k * np.sin(2 * np.pi / k)
    assert area(bu) < 2 * disk
    # disjoint disks stay a plain MULTIPOLYGON of two shells
    mp2 = g.from_wkt(["MULTIPOINT (0 0, 10 0)"])
    b2 = g.buffer(mp2, 1)
    assert int(b2.types[0]) == 6
    assert area(b2) == pytest.approx(2 * disk)


def test_invalid_styles_raise():
    """reference test_constructive.py:96-103."""
    pt = g.points(2, 3)
    with pytest.raises(ValueError, match="cap_style"):
        g.buffer(pt, 1, cap_style="invalid")
    with pytest.raises(ValueError, match="join_style"):
        g.buffer(pt, 1, join_style="invalid")


def test_buffer_closed_line_ring():
    ring = g.from_wkt(["LINEARRING (0 0, 10 0, 10 10, 0 10, 0 0)"])
    bu = g.buffer(ring, 1, join_style="mitre")
    # band around the square ring: outer 12x12 minus inner 8x8
    assert area(bu) == pytest.approx(144.0 - 64.0)


def test_positive_buffer_preserves_holes():
    # ADVICE round 2: dilation must NOT fill interior rings — the hole
    # survives eroded by r (GEOS: buffer of 10x10 shell with 4x4 hole
    # at r=0.5 has area 121 - 3*3 = 112 with mitre joins).
    poly = g.from_wkt(
        ["POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,7 3,7 7,3 7,3 3))"]
    )
    assert area(g.buffer(poly, 0.5, join_style="mitre")) == pytest.approx(112.0)
    # round joins: outer corners are inscribed arcs (< quarter-disk),
    # eroded hole keeps sharp corners
    ra = area(g.buffer(poly, 0.5))
    assert 111.7 < ra < 111.786


def test_positive_buffer_fills_small_hole():
    # hole erodes to empty once r >= half its width
    poly = g.from_wkt(
        ["POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))"]
    )
    assert area(g.buffer(poly, 1.0, join_style="mitre")) == pytest.approx(144.0)


def test_positive_buffer_multipolygon_component_inside_hole():
    # a second component sitting inside the first one's hole keeps its
    # own dilation; the hole erodes around it
    mp = g.from_wkt([
        "MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0),"
        "(2 2,8 2,8 8,2 8,2 2)),"
        "((4.5 4.5,5.5 4.5,5.5 5.5,4.5 5.5,4.5 4.5)))"
    ])
    assert area(g.buffer(mp, 0.5, join_style="mitre")) == pytest.approx(100.0)
