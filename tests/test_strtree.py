"""STRtree semantics transcribed from reference pygeos/tests/test_strtree.py
(points tree = POINT(i,i) i in 0..9; line tree = diagonal segments
(i,i)-(i+1,i+1); poly tree = point buffers radius sqrt(2)/2 + 1e-9,
quadsegs=32; tables at test_strtree.py:138-214, 302-500+)."""

import math

import numpy as np
import pytest

from rayspatial.geom import constructive as C
from rayspatial.geom import io as gio
from rayspatial.geom import wkb as gwkb
from rayspatial.geom.array import GeomArray
from rayspatial.geom.strtree import STRtree

HALF_UNIT_DIAG = math.sqrt(2) / 2
EPS = 1e-9


def points(xs, ys):
    return gwkb.parse_wkb(list(gwkb.point_wkb(np.asarray(xs, float), np.asarray(ys, float))))


def g(*wkts):
    return gio.from_wkt(list(wkts))


@pytest.fixture(scope="module")
def tree():
    return STRtree(points(np.arange(10), np.arange(10)))


@pytest.fixture(scope="module")
def line_tree():
    x = np.arange(10)
    wkts = [f"LINESTRING ({i} {i}, {i+1} {i+1})" for i in x]
    return STRtree(g(*wkts))


@pytest.fixture(scope="module")
def poly_tree():
    pts = points(np.arange(10), np.arange(10))
    return STRtree(C.buffer(pts, HALF_UNIT_DIAG + EPS, quadsegs=32))


def box(x0, y0, x1, y1):
    return C.box(x0, y0, x1, y1)


def test_count_skips_none_empty():
    # reference test_strtree.py:50-60
    assert len(STRtree(g("POINT (2 3)"))) == 1
    assert len(STRtree(g(None))) == 0
    assert len(STRtree(g(None, "POINT (2 3)"))) == 1
    assert len(STRtree(g("POINT EMPTY", "POINT (2 3)"))) == 1


def test_query_retains_index():
    # reference test_strtree.py:121-134
    t = STRtree(g(None, "POINT (2 3)"))
    assert t.query(box(0, 0, 10, 10)).tolist() == [1]
    t = STRtree(g(None, "GEOMETRYCOLLECTION EMPTY", "POINT (2 3)"))
    assert t.query(box(0, 0, 10, 10)).tolist() == [2]


def test_query_none_empty(tree):
    assert tree.query(g(None)).size == 0
    assert tree.query(g("POINT EMPTY")).size == 0


@pytest.mark.parametrize(
    "probe,expected",
    [
        ("POINT (0.5 0.5)", []),
        ("POINT (1 1)", [1]),
        ("BOX:0,0,1,1", [0, 1]),
        ("BOX:5,5,15,15", [5, 6, 7, 8, 9]),
        ("MULTIPOINT (5 7, 7 5)", [5, 6, 7]),
    ],
)
def test_query_points(tree, probe, expected):
    pr = box(*map(float, probe[4:].split(","))) if probe.startswith("BOX:") else g(probe)
    assert tree.query(pr).tolist() == expected


@pytest.mark.parametrize(
    "probe,expected",
    [
        ("POINT (0 0)", [0]),
        ("POINT (0.5 0.5)", [0]),
        ("POINT (0 0.5)", [0]),
        ("POINT (1 1)", [0, 1]),
        ("BOX:0,0,1,1", [0, 1]),
        ("MULTIPOINT (5 7, 7 5)", [4, 5, 6, 7]),
    ],
)
def test_query_lines(line_tree, probe, expected):
    pr = box(*map(float, probe[4:].split(","))) if probe.startswith("BOX:") else g(probe)
    assert line_tree.query(pr).tolist() == expected


@pytest.mark.parametrize(
    "probe,expected",
    [
        ("POINT (0.5 0.5)", [0, 1]),
        ("POINT (1 1)", [1]),
        ("BOX:0,0,1,1", [0, 1]),
        ("BOX:0,0,1.5,1.5", [0, 1, 2]),
        ("MULTIPOINT (5 7, 7 5)", [5, 6, 7]),
    ],
)
def test_query_polygons(poly_tree, probe, expected):
    pr = box(*map(float, probe[4:].split(","))) if probe.startswith("BOX:") else g(probe)
    assert poly_tree.query(pr).tolist() == expected


def test_query_invalid_predicate(tree):
    with pytest.raises(ValueError):
        tree.query(g("POINT (1 1)"), predicate="bad_predicate")
    with pytest.raises(ValueError):
        tree.query(g("POINT (1 1)"), predicate="disjoint")


# --- predicate tables (reference test_strtree.py:302-500) ------------------


@pytest.mark.parametrize(
    "probe,expected",
    [
        ("POINT (0.5 0.5)", []),
        ("POINT (1 1)", [1]),
        ("BOX:0,0,1,1", [0, 1]),
        ("MULTIPOINT (5 7, 7 5)", []),
        ("MULTIPOINT (5 7, 7 7)", [7]),
    ],
)
def test_query_intersects_points(tree, probe, expected):
    pr = box(*map(float, probe[4:].split(","))) if probe.startswith("BOX:") else g(probe)
    assert tree.query(pr, predicate="intersects").tolist() == expected


@pytest.mark.parametrize(
    "probe,expected",
    [
        # reference test_strtree.py:442-469
        ("POINT (0 0.5)", [0]),
        ("POINT (0.5 0)", [0]),
        ("POINT (0.5 0.5)", [0, 1]),  # midpoint inside both buffers
        ("POINT (1 1)", [1]),
        ("BOX:0,0,1,1", []),
        ("BOX:0,0,0.5,0.5", [0]),
        ("BOX:0,0,1.5,1.5", []),
        ("MULTIPOINT (5 7, 7 5)", []),
        ("MULTIPOINT (5 7, 7 7)", []),
        ("MULTIPOINT (5.25 5.5, 5.25 5)", [5]),
    ],
)
def test_query_within_polygons(poly_tree, probe, expected):
    pr = box(*map(float, probe[4:].split(","))) if probe.startswith("BOX:") else g(probe)
    assert poly_tree.query(pr, predicate="within").tolist() == expected


def test_query_within_polygons_buffer_probe(poly_tree):
    # buffer probes (reference rows with pygeos.buffer inputs)
    probe = C.buffer(points([3.0], [3.0]), HALF_UNIT_DIAG, quadsegs=32)
    assert poly_tree.query(probe, predicate="within").tolist() == [3]
    probe2 = C.buffer(points([3.0], [3.0]), 3 * HALF_UNIT_DIAG, quadsegs=32)
    assert poly_tree.query(probe2, predicate="within").tolist() == []


def test_query_contains_points(tree):
    # reference test_strtree.py:473-497
    assert tree.query(g("POINT (0.5 0.5)"), predicate="contains").tolist() == []
    assert tree.query(g("POINT (1 1)"), predicate="contains").tolist() == [1]
    # box contains points; 2 at edges not contained
    assert tree.query(box(3, 3, 6, 6), predicate="contains").tolist() == [4, 5]
    assert tree.query(g("MULTIPOINT (5 5, 7 7)"), predicate="contains").tolist() == [5, 7]
    assert tree.query(g("MULTIPOINT (5 7, 7 5)"), predicate="contains").tolist() == []
    assert tree.query(g("MULTIPOINT (5 7, 7 7)"), predicate="contains").tolist() == [7]


def test_query_covers_points(tree):
    # covers includes the boundary
    assert tree.query(box(1, 1, 2, 2), predicate="covers").tolist() == [1, 2]
    assert tree.query(box(0.5, 0.5, 1.5, 1.5), predicate="covers").tolist() == [1]


def test_query_touches(tree, line_tree):
    assert tree.query(box(1, 1, 2, 2), predicate="touches").tolist() == [1, 2]
    # point at a line vertex touches (vertex = line boundary endpoint)
    assert line_tree.query(g("POINT (0 0)"), predicate="touches").tolist() == [0]


def test_query_bulk_shape_and_order(tree):
    probes = points([1.0, 5.0], [1.0, 5.0])
    res = tree.query_bulk(probes)
    assert res.shape[0] == 2
    assert res[0].tolist() == [0, 1]
    assert res[1].tolist() == [1, 5]


def test_query_bulk_omits_missing(tree):
    probes = g(None, "POINT (1 1)")
    res = tree.query_bulk(probes)
    assert res[0].tolist() == [1]
    assert res[1].tolist() == [1]


def test_nearest(tree):
    res = tree.nearest(points([1.0, 10.0], [1.0, 10.0]))
    assert res[0].tolist() == [0, 1]
    assert res[1].tolist() == [1, 9]


def test_nearest_deterministic_tie(tree):
    # midpoint between 0 and 1: our documented rule is lowest index
    res = tree.nearest(points([0.5], [0.5]))
    assert res[1].tolist() == [0]


def test_nearest_all(tree):
    res, dist = tree.nearest_all(points([0.5], [0.5]), return_distance=True)
    assert res[1].tolist() == [0, 1]
    assert np.allclose(dist, HALF_UNIT_DIAG)
    # max_distance prunes
    res2 = tree.nearest_all(points([0.5], [0.5]), max_distance=0.1)
    assert res2.shape[1] == 0


def test_dwithin(tree):
    res = tree.query_bulk(points([0.5], [0.5]), predicate="dwithin", distance=1.0)
    assert res[1].tolist() == [0, 1]
    with pytest.raises(ValueError):
        tree.query_bulk(points([0.5], [0.5]), predicate="dwithin")


def test_poly_tree_midpoint_intersects(poly_tree):
    # the reference's buffer fixture property: midpoint between two
    # adjacent centers intersects both buffers (quadsegs=32 puts a vertex
    # at 45 degrees)
    res = poly_tree.query_bulk(points([0.5], [0.5]), predicate="intersects")
    assert res[1].tolist() == [0, 1]
