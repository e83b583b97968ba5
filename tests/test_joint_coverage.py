"""GEOS-truth matrix for joint coverage by MULTIPLE components
(round-3 verdict item 8): covers/covered_by/contains where no single
component of the right side covers the operand — shared-boundary tiling
fixtures (the degenerate-but-reachable shapes of tiling workloads).

Expected values are OGC DE-9IM semantics (reference
pygeos/predicates.py:617-661 covers; GEOS prepared covers
src/ufuncs.c:242-320): covers(A, B) == B subset closure(A).

Exactness argument for the engine's midpoint classification
(geom/predicates.py:_covered): operand segments are refined at every
B vertex and every A x B linework crossing, and the location class
(interior/boundary/exterior of B) is piecewise constant between
consecutive linework intersections — so a refined sub-segment's
midpoint class IS the class of the whole sub-segment, not a sample.
"""

from __future__ import annotations

import numpy as np
import pytest

from rayspatial import geom as g
from rayspatial.geom import predicates as P

SQ1 = [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]          # left tile
SQ2 = [[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]          # right tile
SQ3 = [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]          # NE (corner-touch)


def _mp(rings):
    polys = g.polygons(rings)
    return g.multipolygons(polys, indices=[0] * len(rings))


def _gc(rings):
    polys = g.polygons(rings)
    return g.geometrycollections(polys, indices=[0] * len(rings))


def _line(*pts):
    return g.linestrings([list(map(list, pts))])


TWO = [SQ1, SQ2]            # edge-adjacent tiles
CORNER = [SQ1, SQ3]         # corner-touching tiles

LINE_CASES = [
    # (name, tiles, line, expected covers(tiles, line))
    ("cross_shared_edge", TWO, _line((0.5, 0.5), (1.5, 0.5)), True),
    ("along_shared_edge", TWO, _line((1, 0.2), (1, 0.8)), True),
    ("along_two_bottom_edges", TWO, _line((0.2, 0), (1.8, 0)), True),
    ("diagonal_across_tiles", TWO, _line((0.5, 0.5), (1.5, 0.7)), True),
    ("full_shared_edge", TWO, _line((1, 0), (1, 1)), True),
    ("shared_edge_then_exit_top", TWO, _line((1, 0.5), (1, 1.5)), False),
    ("exit_right", TWO, _line((1.5, 0.5), (2.5, 0.5)), False),
    ("enter_from_below_along_edge", TWO, _line((1, -0.5), (1, 0.5)), False),
    ("half_edge_half_interior", TWO, _line((1, 0.5), (0.5, 0.5)), True),
    ("through_touch_corner", CORNER, _line((0.5, 0.5), (1.5, 1.5)), True),
    ("near_corner_through_gap", CORNER, _line((0.5, 0.8), (1.5, 1.8)), False),
    ("corner_point_spike", CORNER, _line((1, 1), (0.5, 0.5)), True),
]


@pytest.mark.parametrize("name,tiles,line,exp", LINE_CASES,
                         ids=[c[0] for c in LINE_CASES])
def test_joint_cover_lines(name, tiles, line, exp):
    mp = _mp(tiles)
    gc = _gc(tiles)
    assert bool(P.covers(mp, line)[0]) is exp
    assert bool(P.covers(gc, line)[0]) is exp
    assert bool(P.covered_by(line, mp)[0]) is exp
    # sanity: no single component covers any of the True cases that
    # span both tiles (that's what makes them JOINT)
    if exp and name in ("cross_shared_edge", "along_two_bottom_edges",
                        "diagonal_across_tiles", "through_touch_corner"):
        singles = [bool(P.covers(g.polygons([t]), line)[0]) for t in tiles]
        assert not any(singles), "case is not actually joint"


def test_joint_cover_polygon_across_tiles():
    mp = _mp(TWO)
    rect = g.polygons([[[0.2, 0.2], [1.8, 0.2], [1.8, 0.8], [0.2, 0.8],
                        [0.2, 0.2]]])
    assert bool(P.covers(mp, rect)[0])
    assert bool(P.contains(mp, rect)[0])
    # grows past the right tile -> not covered
    rect2 = g.polygons([[[0.2, 0.2], [2.2, 0.2], [2.2, 0.8], [0.2, 0.8],
                         [0.2, 0.2]]])
    assert not bool(P.covers(mp, rect2)[0])


def test_joint_cover_filled_hole():
    """A holed tile + the tile that fills the hole jointly cover a line
    crossing the filled region (neither alone does)."""
    outer = [[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]]
    hole = [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]
    holed = g.polygons([outer], holes=[[hole]])
    filler = g.polygons([hole])
    comps = g.from_wkb(np.concatenate([g.to_wkb(holed), g.to_wkb(filler)]))
    both = g.geometrycollections(comps, indices=[0, 0])
    ln = _line((0.5, 1.5), (2.5, 1.5))       # crosses the filled hole
    assert bool(P.covers(both, ln)[0])
    assert not bool(P.covers(holed, ln)[0])  # hole carves exterior
    assert not bool(P.covers(g.geometrycollections(filler), ln)[0])
    # line along the hole boundary: covered by the holed polygon alone
    edge = _line((1, 1), (2, 1))
    assert bool(P.covers(holed, edge)[0])
    # a polygon spanning the filled hole is jointly covered too
    rect = g.polygons([[[0.5, 1.2], [2.5, 1.2], [2.5, 1.8], [0.5, 1.8],
                        [0.5, 1.2]]])
    assert bool(P.covers(both, rect)[0])
    assert not bool(P.covers(holed, rect)[0])


def test_joint_cover_multipoint():
    mp = _mp(TWO)
    pts = g.multipoints(
        g.points([[0.5, 0.5], [1, 0.5], [1.5, 0.5], [2, 1]]), indices=[0, 0, 0, 0])
    assert bool(P.covers(mp, pts)[0])
    pts2 = g.multipoints(g.points([[0.5, 0.5], [2.5, 0.5]]), indices=[0, 0])
    assert not bool(P.covers(mp, pts2)[0])


def test_joint_cover_multiline_operand():
    """MULTILINESTRING operand spanning both tiles + the shared edge."""
    mp = _mp(TWO)
    ml = g.multilinestrings(
        g.linestrings([[[0.2, 0.5], [0.8, 0.5]],
                       [[1, 0.1], [1, 0.9]],
                       [[1.2, 0.5], [1.9, 0.5]]]), indices=[0, 0, 0])
    assert bool(P.covers(mp, ml)[0])
    ml2 = g.multilinestrings(
        g.linestrings([[[0.2, 0.5], [0.8, 0.5]],
                       [[1.2, 0.5], [2.4, 0.5]]]), indices=[0, 0])
    assert not bool(P.covers(mp, ml2)[0])


def test_grid_2x2_center_cases():
    """2x2 tile grid: operands through the 4-corner center point."""
    tiles = [
        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]],
        [[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]],
        [[0, 1], [1, 1], [1, 2], [0, 2], [0, 1]],
        [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]],
    ]
    mp = _mp(tiles)
    assert bool(P.covers(mp, _line((0.5, 0.5), (1.5, 1.5)))[0])
    assert bool(P.covers(mp, _line((0.5, 1), (1.5, 1)))[0])
    assert bool(P.covers(mp, g.points([[1, 1]]))[0])
    big = g.polygons([[[0.3, 0.3], [1.7, 0.3], [1.7, 1.7], [0.3, 1.7],
                       [0.3, 0.3]]])
    assert bool(P.covers(mp, big)[0])
    assert bool(P.contains(mp, big)[0])
