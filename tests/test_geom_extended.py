"""Creation / accessors / coordinates / linear / setops parity tests
(reference semantics per pygeos docstrings; fixture style follows
pygeos/tests/common.py:9-64 — one canonical geometry per type)."""

from __future__ import annotations

import numpy as np
import pytest

from rayspatial.geom import accessors as A
from rayspatial.geom import coordinates as C
from rayspatial.geom import io as gio
from rayspatial.geom import linear as L
from rayspatial.geom import setops as S
from rayspatial.geom.constructive import box
from rayspatial.geom.creation import (
    collect,
    linearrings,
    linestrings,
    multipoints,
    multipolygons,
    points,
    polygons,
)

ALL_TYPES = [
    "POINT (2 3)",
    "LINESTRING (0 0, 1 0, 1 1)",
    "LINEARRING (0 0, 1 0, 1 1, 0 1, 0 0)",
    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (1 1, 1.5 1, 1.5 1.5, 1 1.5, 1 1))",
    "MULTIPOINT (0 0, 1 2)",
    "MULTILINESTRING ((0 0, 1 2), (4 4, 5 6))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2.1 2.1, 3.1 2.1, 3.1 3.1, 2.1 2.1)))",
    "GEOMETRYCOLLECTION (POINT (51 -1), LINESTRING (52 -1, 49 2))",
    None,
]


@pytest.fixture(scope="module")
def fixture():
    return gio.from_wkt(np.array(ALL_TYPES, dtype=object))


def test_creation_roundtrip():
    assert gio.to_wkt(points([[1, 2]])) == ["POINT (1 2)"]
    assert gio.to_wkt(points([[np.nan, np.nan]])) == [None]
    assert gio.to_wkt(linestrings([[[0, 0], [1, 1]]])) == ["LINESTRING (0 0, 1 1)"]
    # ring auto-close (reference creation.py:125-177)
    assert gio.to_wkt(linearrings([[[0, 0], [1, 0], [1, 1]]])) == [
        "LINEARRING (0 0, 1 0, 1 1, 0 0)"
    ]
    got = gio.to_wkt(
        polygons([[[0, 0], [4, 0], [4, 4], [0, 4]]],
                 holes=[[[[1, 1], [2, 1], [2, 2], [1, 2]]]])
    )
    assert got == ["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"]


def test_grouped_constructors_with_indices():
    # the reference's indices= group-assignment form (_geometry.pyx:247)
    mp = multipoints(points([[0, 0], [1, 1], [2, 2]]), indices=[0, 0, 1])
    assert gio.to_wkt(mp) == ["MULTIPOINT (0 0, 1 1)", "MULTIPOINT (2 2)"]
    mpol = multipolygons(
        polygons([[[0, 0], [1, 0], [1, 1]], [[5, 5], [6, 5], [6, 6]]]),
        indices=[0, 0],
    )
    assert gio.to_wkt(mpol) == [
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
    ]
    # collect promotes same-type groups, mixes -> GC
    assert gio.to_wkt(collect(points([[0, 0], [1, 1]]), [0, 0]))[0].startswith(
        "MULTIPOINT"
    )


def test_accessors(fixture):
    g = fixture
    assert list(A.get_type_id(g)) == [0, 1, 2, 3, 3, 4, 5, 6, 7, -1]
    assert list(A.get_dimensions(g)) == [0, 1, 1, 2, 2, 0, 1, 2, 1, -1]
    assert list(A.get_coordinate_dimension(g)) == [2] * 9 + [-1]
    x = A.get_x(g)
    assert x[0] == 2 and np.isnan(x[1:]).all()
    assert list(A.get_num_points(g)) == [0, 3, 5, 0, 0, 0, 0, 0, 0, 0]
    assert list(A.get_num_interior_rings(g)) == [0, 0, 0, 0, 1, 0, 0, 0, 0, 0]
    assert list(A.get_num_geometries(g)) == [1, 1, 1, 1, 1, 2, 2, 2, 2, 0]
    ext = gio.to_wkt(A.get_exterior_ring(g))
    assert ext[3] == "LINEARRING (0 0, 2 0, 2 2, 0 2, 0 0)"
    assert ext[0] is None and ext[5] is None
    inner = gio.to_wkt(A.get_interior_ring(g, 0))
    assert inner[4] == "LINEARRING (1 1, 1.5 1, 1.5 1.5, 1 1.5, 1 1)"
    assert inner[3] is None  # polygon without holes


def test_get_geometry_and_parts(fixture):
    g = fixture
    # simple geometries: own 0th child (geometry.py:486-523)
    g0 = gio.to_wkt(A.get_geometry(g, 0))
    assert g0[0] == "POINT (2 3)"
    assert g0[5] == "POINT (0 0)"
    gm1 = gio.to_wkt(A.get_geometry(g, -1))
    assert gm1[5] == "POINT (1 2)"
    parts, idx = A.get_parts(g, return_index=True)
    # 5 simple + 2 + 2 + 2 + 2 parts
    assert len(parts) == 13
    assert list(idx) == [0, 1, 2, 3, 4, 5, 5, 6, 6, 7, 7, 8, 8]
    # non-polygons contribute no rings (geometry.py:569-621)
    rings, ridx = A.get_rings(g, return_index=True)
    assert len(rings) == 1 + 2 + 2  # poly, poly+hole, 2 multipoly
    assert list(ridx) == [3, 4, 4, 7, 7]


def test_coordinates_apply(fixture):
    g = fixture
    buf, idx = C.get_coordinates(g, return_index=True)
    assert buf.shape[1] == 2 and len(buf) == C.count_coordinates(g)
    assert idx.max() == 8
    out = C.apply(g, lambda c: c * 2.0)
    assert gio.to_wkt(out)[0] == "POINT (4 6)"
    with pytest.raises(ValueError):
        C.apply(g, lambda c: c[:-1])  # shape change rejected


def test_force_z(fixture):
    g3 = A.force_3d(points([[1, 2]]), z=5.0)
    assert list(A.get_coordinate_dimension(g3)) == [3]
    assert A.get_z(g3)[0] == 5.0
    g2 = A.force_2d(g3)
    assert list(A.get_coordinate_dimension(g2)) == [2]


def test_linear_referencing():
    line = gio.from_wkt(np.array(["LINESTRING (0 0, 10 0)"], dtype=object))
    assert gio.to_wkt(L.line_interpolate_point(line, 2.5)) == ["POINT (2.5 0)"]
    assert gio.to_wkt(L.line_interpolate_point(line, 0.5, normalized=True)) == [
        "POINT (5 0)"
    ]
    # negative distance measures from the end (linear.py:15-54)
    assert gio.to_wkt(L.line_interpolate_point(line, -2.0)) == ["POINT (8 0)"]
    assert L.line_locate_point(line, points([[3, 4]]))[0] == 3.0
    assert L.line_locate_point(line, points([[3, 4]]), normalized=True)[0] == 0.3
    ml = gio.from_wkt(
        np.array(["MULTILINESTRING ((0 0, 1 1), (1 1, 2 2), (5 5, 6 6))"], dtype=object)
    )
    assert gio.to_wkt(L.line_merge(ml)) == [
        "MULTILINESTRING ((0 0, 1 1, 2 2), (5 5, 6 6))"
    ]
    sl = gio.to_wkt(L.shortest_line(points([[0, 0]]), points([[3, 4]])))
    assert sl == ["LINESTRING (0 0, 3 4)"]
    # intersecting -> degenerate line at a witness point
    sl2 = L.shortest_line(box(0, 0, 2, 2), box(1, 1, 3, 3))
    from rayspatial.geom.measures import length

    assert length(sl2)[0] == 0.0


def test_setops_supported_cases():
    b1, b2, b3 = box(0, 0, 4, 4), box(2, 2, 6, 6), box(10, 10, 11, 11)
    assert gio.to_wkt(S.intersection(b1, b2)) == [
        "POLYGON ((4 2, 4 4, 2 4, 2 2, 4 2))"
    ]
    from rayspatial.geom.measures import area

    assert area(S.intersection(b1, b3))[0] == 0.0  # empty
    assert area(S.union(b1, b3)).sum() == 17.0  # 16 + 1 disjoint multipoly
    assert gio.to_wkt(S.union(b1, box(1, 1, 2, 2)))[0].startswith("POLYGON")
    assert gio.to_wkt(S.difference(b1, b3))[0].startswith("POLYGON")
    assert area(S.difference(box(1, 1, 2, 2), b1))[0] == 0.0  # contained
    pts_u = S.union_all(points([[0, 0], [1, 1], [0, 0]]))
    assert gio.to_wkt(pts_u) == ["MULTIPOINT (0 0, 1 1)"]
    # overlapping union via the general overlay (round-1 upgrade)
    assert area(S.union(b1, b2)).sum() == 28.0
    # intersection of point & polygon
    assert gio.to_wkt(S.intersection(points([[1, 1]]), b1)) == ["POINT (1 1)"]
    assert gio.to_wkt(S.intersection(points([[99, 99]]), b1)) == ["POINT EMPTY"]


def test_union_all_disjoint_polygons_and_missing():
    b_all = box(np.array([0.0, 10.0]), np.array([0.0, 10.0]),
                np.array([1.0, 11.0]), np.array([1.0, 11.0]))
    u = S.union_all(b_all)
    from rayspatial.geom.measures import area

    assert area(u)[0] == 2.0
    # all-missing -> missing (set_operations.py:389-396)
    m = points([[np.nan, np.nan]])
    assert gio.to_wkt(S.union_all(m)) == [None]


def test_grid_to_boxes_partition():
    mask = np.zeros((4, 6), dtype=bool)
    mask[0:2, 0:3] = True
    mask[3, 5] = True
    boxes = S.grid_to_boxes(mask, 0.0, 0.0, 1.0, 1.0)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    assert areas.sum() == mask.sum()  # exact partition
    assert len(boxes) == 2  # merged into 2 rectangles


def test_set_precision_modes():
    """reference geometry.py:699-791 mode semantics."""
    from rayspatial import geom as g

    ln = g.from_wkt(["LINESTRING (0 0, 0.1 0.1)"])
    assert bool(g.is_empty(g.set_precision(ln, 1.0))[0])  # valid_output
    kc = g.set_precision(ln, 1.0, mode="keep_collapsed")
    assert g.to_wkt(kc)[0] == "LINESTRING (0 0, 0 0)"
    pw = g.set_precision(ln, 1.0, mode="pointwise")
    assert g.to_wkt(pw)[0] == "LINESTRING (0 0, 0 0)"
    # grid_size=0 is a no-op
    assert g.to_wkt(g.set_precision(ln, 0.0))[0] == "LINESTRING (0 0, 0.1 0.1)"
    # polygon collapse removed in every topology-preserving mode
    poly = g.from_wkt(["POLYGON ((0 0, 0.4 0, 0.4 0.4, 0 0.4, 0 0))"])
    assert bool(g.is_empty(g.set_precision(poly, 1.0))[0])
    assert bool(g.is_empty(g.set_precision(poly, 1.0, mode="keep_collapsed"))[0])
    # duplicate-vertex removal
    line2 = g.from_wkt(["LINESTRING (0 0, 0.04 0, 5 0)"])
    assert g.to_wkt(g.set_precision(line2, 1.0))[0] == "LINESTRING (0 0, 5 0)"
    with pytest.raises(ValueError):
        g.set_precision(ln, 1.0, mode="nope")
    with pytest.raises(ValueError):
        g.set_precision(ln, -1.0)


def test_set_operations_grid_size():
    """reference test_set_operations.py test_set_operation_prec_array
    contract: func(a, b, grid_size=s) matches func over
    set_precision-ed inputs."""
    from rayspatial import geom as g

    a = g.box(0, 0, 2.05, 2.05)
    b = g.box(1.03, 1.03, 3.0, 3.0)
    for op in (g.intersection, g.union, g.difference, g.symmetric_difference):
        got = float(g.area(op(a, b, grid_size=0.1))[0])
        ref = float(
            g.area(op(g.set_precision(a, 0.1), g.set_precision(b, 0.1)))[0]
        )
        assert got == pytest.approx(ref, abs=1e-9), op.__name__
    u = g.union_all(
        g.from_wkt(["POLYGON ((0 0, 1.04 0, 1.04 1.04, 0 1.04, 0 0))",
                    "POLYGON ((0.96 0, 2 0, 2 1, 0.96 1, 0.96 0))"]),
        grid_size=0.1,
    )
    assert float(g.area(u)[0]) == pytest.approx(2.0)


def test_hausdorff_frechet_densify():
    """reference measurement.py:179-258 densify= parameter; the plain
    and densified values match the reference's own doctests."""
    from rayspatial import geom as g

    a = g.from_wkt(["LINESTRING (130 0, 0 0, 0 150)"])
    b = g.from_wkt(["LINESTRING (10 10, 10 150, 130 10)"])
    assert g.hausdorff_distance(a, b)[0] == pytest.approx(np.sqrt(200.0))
    assert g.hausdorff_distance(a, b, densify=0.5)[0] == pytest.approx(70.0)
    f1 = g.from_wkt(["LINESTRING (0 0, 100 0)"])
    f2 = g.from_wkt(["LINESTRING (0 0, 50 50, 100 0)"])
    assert g.frechet_distance(f1, f2)[0] == pytest.approx(np.sqrt(2) * 50)
    assert g.frechet_distance(f1, f2, densify=0.001)[0] == pytest.approx(
        50.0, abs=0.1
    )
    with pytest.raises(ValueError):
        g.hausdorff_distance(a, b, densify=0.0)
    with pytest.raises(ValueError):
        g.frechet_distance(a, b, densify=1.5)


def test_offset_curve_mitre_limit():
    from rayspatial import geom as g

    ln = g.linestrings([[(0, 0), (10, 0), (10, 10)]])
    m = g.offset_curve(ln, -1, join_style="mitre")
    # the offset lines y=-1 and x=11 meet at (11, -1)
    assert "11 -1" in g.to_wkt(m)[0]
    mc = g.offset_curve(ln, -1, join_style="mitre", mitre_limit=1.05)
    assert "11 -1" not in g.to_wkt(mc)[0]  # spike cropped
    # cropped curve still reaches both endpoints
    w = g.to_wkt(mc)[0]
    assert w.startswith("LINESTRING (0 -1") and w.endswith("11 10)")


def test_triangulate_params():
    from rayspatial import geom as g

    pts = g.from_wkt(["MULTIPOINT (0 0, 2 0, 1 2, 1.0000001 2.0000001)"])
    # tolerance merges the near-duplicate site
    assert int(g.delaunay_triangles(pts, tolerance=0.001).num_children[0]) == 1
    assert int(g.voronoi_polygons(pts, tolerance=0.001).num_children[0]) == 3
    ve = g.voronoi_polygons(pts, only_edges=True)
    assert int(ve.types[0]) == 5  # MULTILINESTRING


def test_get_parts_reference_shape():
    """reference geometry.py:524-621: parts only by default,
    (parts, index) with return_index=True."""
    from rayspatial import geom as g
    from rayspatial.geom import accessors as A

    mp = g.from_wkt(["MULTIPOINT (0 0, 1 1)"])
    parts = A.get_parts(mp)
    assert len(parts) == 2
    parts2, idx = A.get_parts(mp, return_index=True)
    assert list(idx) == [0, 0]


def test_api_parity_enums_and_alias():
    """Reference API parity (geometry.py:38-49, constructive.py:37-47,
    861): GeometryType / BufferCapStyles / BufferJoinStyles enums and
    the minimum_rotated_rectangle alias."""
    from rayspatial import geom as g

    assert g.GeometryType.MISSING == -1
    assert g.GeometryType.GEOMETRYCOLLECTION == 7
    assert [e.value for e in g.BufferCapStyles] == [1, 2, 3]
    assert [e.name for e in g.BufferJoinStyles] == ["round", "mitre", "bevel"]
    assert g.minimum_rotated_rectangle is g.oriented_envelope
