"""General polygon overlay tests: exact cases, hole handling, and
randomized inclusion-exclusion properties (area(A∪B) = area(A) +
area(B) - area(A∩B); sym_diff = union - intersection)."""

from __future__ import annotations

import numpy as np
import pytest

from rayspatial import geom as g
from rayspatial.geom import io as gio
from rayspatial.geom.overlay import nary_union, polygon_overlay


def test_box_overlay_matches_exact_paths():
    b1, b2 = g.box(0, 0, 4, 4), g.box(2, 2, 6, 6)
    assert g.area(polygon_overlay(b1, b2, "union"))[0] == 28.0
    assert g.area(polygon_overlay(b1, b2, "intersection"))[0] == 4.0
    assert g.area(polygon_overlay(b1, b2, "difference"))[0] == 12.0
    assert g.area(polygon_overlay(b1, b2, "symmetric_difference"))[0] == 24.0


def test_overlay_with_holes():
    ph = gio.from_wkt(
        np.array(
            ["POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"],
            dtype=object,
        )
    )
    bx = g.box(1, 1, 5, 5)
    assert g.area(polygon_overlay(ph, bx, "intersection"))[0] == 12.0
    assert g.area(polygon_overlay(ph, bx, "union"))[0] == 36.0
    # difference of nested box produces a hole
    d = g.difference(g.box(0, 0, 6, 6), g.box(2, 2, 3, 3))
    assert g.area(d)[0] == 35.0
    assert g.get_num_interior_rings(d)[0] == 1


def test_inclusion_exclusion_random_boxes():
    rng = np.random.RandomState(11)
    for _ in range(25):
        x = np.sort(rng.uniform(0, 10, 4))
        y = np.sort(rng.uniform(0, 10, 4))
        a = g.box(x[0], y[0], x[2], y[2])
        bq = g.box(x[1], y[1], x[3], y[3])
        au = g.area(polygon_overlay(a, bq, "union"))[0]
        ai = g.area(polygon_overlay(a, bq, "intersection"))[0]
        ad = g.area(polygon_overlay(a, bq, "difference"))[0]
        asd = g.area(polygon_overlay(a, bq, "symmetric_difference"))[0]
        aa, ab = g.area(a)[0], g.area(bq)[0]
        assert np.isclose(au, aa + ab - ai, atol=1e-9)
        assert np.isclose(ad, aa - ai, atol=1e-9)
        assert np.isclose(asd, au - ai, atol=1e-9)


def test_inclusion_exclusion_random_convex_polys():
    rng = np.random.RandomState(7)
    from rayspatial.geom.constructive import convex_hull
    from rayspatial.geom.creation import multipoints, points

    for _ in range(15):
        pa = rng.uniform(0, 10, (8, 2))
        pb = rng.uniform(3, 13, (8, 2))
        a = convex_hull(multipoints(points(pa)))
        bq = convex_hull(multipoints(points(pb)))
        au = g.area(polygon_overlay(a, bq, "union"))[0]
        ai = g.area(polygon_overlay(a, bq, "intersection"))[0]
        aa, ab = g.area(a)[0], g.area(bq)[0]
        assert np.isclose(au, aa + ab - ai, atol=1e-7)
        # cross-check intersection against the exact convex-clip path
        ai2 = g.area(g.intersection(a, bq))[0]
        assert np.isclose(ai, ai2, atol=1e-7)


def test_nary_union_overlapping_chain():
    boxes = g.box(
        np.array([0.0, 2.0, 4.0]),
        np.array([0.0, 0.0, 0.0]),
        np.array([3.0, 5.0, 7.0]),
        np.array([2.0, 2.0, 2.0]),
    )
    u = nary_union(boxes)
    assert g.area(u)[0] == 14.0  # one 7x2 strip
    assert g.get_num_geometries(u)[0] == 1
    # via the public union_all entry point
    assert g.area(g.union_all(boxes))[0] == 14.0


def test_make_valid_and_build_area():
    bow = gio.from_wkt(np.array(["POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"], dtype=object))
    mv = g.make_valid(bow)
    assert g.is_valid(mv)[0]
    assert g.area(mv)[0] == 8.0  # two 4-area triangles
    # valid geometries pass through byte-identical
    okb = g.box(0, 0, 2, 2)
    assert gio.to_wkt(g.make_valid(okb)) == gio.to_wkt(okb)
    ml = gio.from_wkt(
        np.array(
            [
                "MULTILINESTRING ((0 0, 6 0), (6 0, 6 6), (6 6, 0 6), (0 6, 0 0), "
                "(2 2, 4 2), (4 2, 4 4), (4 4, 2 4), (2 4, 2 2))"
            ],
            dtype=object,
        )
    )
    ba = g.build_area(ml)
    assert g.area(ba)[0] == 32.0
    assert g.get_num_interior_rings(ba)[0] == 1


def test_negative_buffer_erosion():
    er = g.buffer(g.box(0, 0, 10, 10), -2.0)
    assert np.isclose(g.area(er)[0], 36.0)  # 6x6 core, exact (convex)
    # eroding away the whole polygon -> empty
    gone = g.buffer(g.box(0, 0, 1, 1), -2.0)
    assert g.area(gone)[0] == 0.0
