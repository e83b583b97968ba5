"""Parity tests for the second wave of operators: relate /
is_valid_reason / frechet / minimum_clearance / reductions / flat
namespace."""

from __future__ import annotations

import numpy as np
import pytest

from rayspatial import geom as g
from rayspatial.geom import io as gio


def _wkt(*w):
    return gio.from_wkt(np.array(w, dtype=object))


def test_flat_namespace_surface():
    # a pygeos user's call sites resolve
    for name in [
        "points", "linestrings", "polygons", "box", "contains", "covers",
        "intersects", "dwithin", "area", "distance", "bounds", "buffer",
        "centroid", "convex_hull", "union_all", "get_parts", "apply",
        "from_wkb", "to_wkb", "from_wkt", "to_wkt", "STRtree", "relate",
        "equals_exact", "prepare", "is_prepared", "frechet_distance",
        "minimum_clearance", "intersection_all", "line_merge",
    ]:
        assert hasattr(g, name), name


def test_relate_point_cases():
    poly = _wkt(*["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"] * 4)
    pts = g.points([[1, 1], [0, 0], [99, 99], [np.nan, np.nan]])
    assert list(g.relate(pts, poly)) == [
        "0FFFFF212",  # interior
        "F0FFFF212",  # boundary (GEOS: point-on-vertex)
        "FF0FFF212",  # exterior
        None,
    ]
    assert list(g.relate_pattern(pts, poly, "T********")) == [True, False, False, False]
    # within == relate T*F**F***
    assert list(g.relate_pattern(pts, poly, "T*F**F***")) == [True, False, False, False]
    # polygon lhs is supported since round 2 (tests/test_relate_polygon.py)
    assert g.relate(poly, poly)[0] == "2FFF1FFF2"


def test_is_valid_reason():
    got = g.is_valid_reason(
        _wkt(
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))",  # bow-tie
            None,
        )
    )
    assert got[0] == "Valid Geometry"
    assert got[1] == "Self-intersection"
    assert got[2] is None
    # consistency with is_valid (reference: reason iff not valid)
    v = g.is_valid(_wkt("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))"))
    assert not v[0]


def test_frechet_and_clearance():
    a = _wkt("LINESTRING (0 0, 2 0)")
    b = _wkt("LINESTRING (0 1, 2 1)")
    assert g.frechet_distance(a, b)[0] == 1.0
    # frechet >= hausdorff always
    c = _wkt("LINESTRING (0 0, 2 0)")
    d = _wkt("LINESTRING (2 1, 0 1)")  # reversed: frechet forced across
    assert g.frechet_distance(c, d)[0] >= g.hausdorff_distance(c, d)[0]
    tri = _wkt("POLYGON ((0 0, 10 0, 5 1, 0 0))")
    assert g.minimum_clearance(tri)[0] == 1.0
    assert np.isnan(g.minimum_clearance(g.points([[np.nan, np.nan]]))[0])


def test_reductions():
    boxes = g.box(np.array([0.0, 1.0]), np.array([0.0, 1.0]),
                  np.array([4.0, 5.0]), np.array([4.0, 5.0]))
    inter = g.intersection_all(boxes)
    assert g.area(inter)[0] == 9.0  # box(1,1,4,4)
    pts = g.points([[0, 0], [5, 5], [0, 0]])
    u = g.union_all(pts)
    assert gio.to_wkt(u) == ["MULTIPOINT (0 0, 5 5)"]
    disj = g.box(np.array([0.0, 10.0]), np.array([0.0, 10.0]),
                 np.array([1.0, 11.0]), np.array([1.0, 11.0]))
    sd = g.symmetric_difference_all(disj)
    assert g.area(sd)[0] == 2.0


def test_delaunay_and_voronoi():
    from rayspatial.geom.triangulate import delaunay_triangles, voronoi_polygons

    pts = g.multipoints(g.points([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]]))
    tris = delaunay_triangles(pts)
    # 4 triangles tiling the unit square exactly
    assert g.get_num_geometries(tris)[0] == 4
    assert g.area(tris)[0] == 1.0
    edges = delaunay_triangles(pts, only_edges=True)
    assert g.get_type_id(edges)[0] == 5  # MULTILINESTRING
    vor = voronoi_polygons(pts)
    # one cell per site; cells partition the extended envelope
    assert g.get_num_geometries(vor)[0] == 5
    assert np.isclose(g.area(vor)[0], 9.0)  # 3x3 envelope (margin 1.0)
    # deterministic across calls
    a = gio.to_wkt(delaunay_triangles(pts))
    b = gio.to_wkt(delaunay_triangles(pts))
    assert a == b


def test_convex_clip_intersection():
    tri = g.polygons([[[0, 0], [4, 0], [0, 4]]])
    sq = g.polygons([[[1, 1], [3, 1], [3, 3], [1, 3]]])
    inter = g.intersection(tri, sq)
    assert g.area(inter)[0] == 2.0
    # concave subject vs convex clip still exact
    concave = g.polygons([[[0, 0], [4, 0], [4, 4], [2, 1.0], [0, 4]]])
    # clip strip below the notch: full 4 x 0.5 rectangle survives
    clip = g.box(0, 0, 4, 0.5)
    assert np.isclose(g.area(g.intersection(concave, clip))[0], 2.0)
    # clip strip through the notch (y in [2,4]): two lobes remain;
    # area = full strip (8) minus notch triangle part above y=2
    # clip strip through the notch (y in [2,4]): two lobes remain
    # (S-H links them with a zero-width bridge; area is exact):
    # notch width at height y is (4/3)(y-1) -> integral over [2,4] = 16/3
    clip2 = g.box(0, 2, 4, 4)
    assert np.isclose(g.area(g.intersection(concave, clip2))[0], 8 - 16 / 3)
    # concave-vs-concave now routes through the general overlay
    assert np.isclose(
        g.area(g.intersection(concave, concave))[0], g.area(concave)[0]
    )


def test_polygonize():
    from rayspatial.geom.polygonize import polygonize, polygonize_full

    ml = gio.from_wkt(
        np.array(
            [
                "MULTILINESTRING ((0 0, 1 0), (1 0, 1 1), (1 1, 0 1), (0 1, 0 0), "
                "(1 0, 2 0), (2 0, 2 1), (2 1, 1 1), (5 5, 6 6))"
            ],
            dtype=object,
        )
    )
    p = polygonize(ml)
    assert g.get_num_geometries(p)[0] == 2
    assert g.area(p)[0] == 2.0
    polys, cuts, dang = polygonize_full(ml)
    assert g.length(dang)[0] == pytest.approx(np.sqrt(2.0))
    assert g.length(cuts)[0] == 0.0
    ring = gio.from_wkt(np.array(["LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"], dtype=object))
    assert g.area(polygonize(ring))[0] == 16.0


def test_buffer_lineal_and_areal():
    line = gio.from_wkt(np.array(["LINESTRING (0 0, 10 0)"], dtype=object))
    a = g.area(g.buffer(line, 1.0, quadsegs=8))[0]
    # capsule area with a 32-gon arc approximation (slightly < exact)
    assert 10 * 2 + np.pi * 0.98 < a <= 10 * 2 + np.pi
    pb = g.area(g.buffer(g.box(0, 0, 4, 4), 1.0, quadsegs=8))[0]
    assert 16 + 16 + np.pi * 0.98 < pb <= 16 + 16 + np.pi
    # negative buffer = erosion (implemented via boundary-band difference)
    assert np.isclose(g.area(g.buffer(g.box(0, 0, 4, 4), -0.5))[0], 9.0)


def test_union_all_distributed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rayspatial.ops.agg import (
        count_coordinates_distributed,
        total_bounds_distributed,
        union_all_distributed,
    )

    boxes = g.box(
        np.arange(10, dtype=np.float64),  # overlapping chain 0..11 x 0..1
        np.zeros(10),
        np.arange(10, dtype=np.float64) + 2.0,
        np.ones(10),
    )
    tab = pa.table({"wkb": pa.array(g.to_wkb(boxes), type=pa.binary())})
    ds = rd.from_arrow(tab).repartition(4)
    out = union_all_distributed(ds)
    import pyarrow as pa2

    res = out.take_all()
    ga = g.from_wkb([res[0]["wkb"]])
    assert np.isclose(g.area(ga)[0], 11.0)  # strip 0..11 x 0..1
    tb = total_bounds_distributed(ds).to_pylist()[0]
    assert (tb["xmin"], tb["ymin"], tb["xmax"], tb["ymax"]) == (0.0, 0.0, 11.0, 1.0)
    assert count_coordinates_distributed(ds) == 50  # 10 boxes x 5 ring pts


def test_offset_curve_and_shared_paths():
    line = gio.from_wkt(np.array(["LINESTRING (0 0, 10 0)"], dtype=object))
    assert gio.to_wkt(g.offset_curve(line, 2.0)) == ["LINESTRING (0 2, 10 2)"]
    assert gio.to_wkt(g.offset_curve(line, -2.0)) == ["LINESTRING (0 -2, 10 -2)"]
    # L-shaped line, outside corner gets a round join (longer than 10)
    bent = gio.from_wkt(np.array(["LINESTRING (0 0, 5 0, 5 5)"], dtype=object))
    ll = g.length(g.offset_curve(bent, 1.0))[0]
    assert 10.0 < ll < 12.0
    a = gio.from_wkt(np.array(["LINESTRING (0 0, 5 0, 5 5)"], dtype=object))
    bq = gio.from_wkt(np.array(["LINESTRING (2 0, 8 0)"], dtype=object))
    sp = g.shared_paths(a, bq)
    assert g.get_type_id(sp)[0] == 7  # GEOMETRYCOLLECTION
    assert g.length(sp)[0] == 3.0  # overlap [2,5] x 0
    # opposite-direction overlap also found
    br = gio.from_wkt(np.array(["LINESTRING (8 0, 2 0)"], dtype=object))
    assert g.length(g.shared_paths(a, br))[0] == 3.0


def test_relate_lineal_cases():
    """DE-9IM matrices for lineal left-hand sides, checked against
    GEOS-truth matrices for the canonical configurations."""
    poly = _wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    cases = [
        (_wkt("LINESTRING (-1 2, 5 2)"), poly, "101FF0212"),   # crosses
        (_wkt("LINESTRING (1 1, 3 3)"), poly, "1FF0FF212"),    # within
        (_wkt("LINESTRING (10 10, 12 12)"), poly, "FF1FF0212"),  # disjoint
        (_wkt("LINESTRING (0 0, 4 0)"), poly, "F1FF0F212"),    # on boundary
        (_wkt("LINESTRING (0 0, 2 2)"), _wkt("LINESTRING (0 2, 2 0)"),
         "0F1FF0102"),                                          # lines cross
        (_wkt("LINESTRING (0 0, 3 0)"), _wkt("LINESTRING (1 0, 5 0)"),
         "1010F0102"),                                          # overlap
        (_wkt("LINESTRING (0 0, 1 0)"), _wkt("LINESTRING (5 5, 6 6)"),
         "FF1FF0102"),                                          # disjoint
        (_wkt("LINESTRING (0 0, 1 1)"), _wkt("LINESTRING (1 1, 2 0)"),
         "FF1F00102"),                                          # end-touch
    ]
    for a, b, want in cases:
        assert g.relate(a, b)[0] == want
    # relate_pattern consistency: crosses(line, poly) == T pattern
    assert g.relate_pattern(
        _wkt("LINESTRING (-1 2, 5 2)"), poly, "T*T******"
    )[0]
