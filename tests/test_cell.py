"""Cell index tests (engine-native operator; see SURVEY.md §2.12)."""

import numpy as np
import pytest

from rayspatial import cell


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 1, 5, 10, 20, 26):
        ids = cell.cell_encode(lon, lat, res)
        cx, cy, r = cell.decode_xy(ids)
        assert (r == res).all()
        ex, ey = cell.cell_xy(lon, lat, res)
        assert (cx == ex).all() and (cy == ey).all()


def test_encode_deterministic():
    lon = np.asarray([12.5, -77.0])
    lat = np.asarray([41.9, 38.9])
    a = cell.cell_encode(lon, lat, 12)
    b = cell.cell_encode(lon, lat, 12)
    assert (a == b).all()


def test_edges_clip():
    ids = cell.cell_encode(np.asarray([180.0, -180.0]), np.asarray([90.0, -90.0]), 8)
    cx, cy, _ = cell.decode_xy(ids)
    assert cx.tolist() == [255, 0]
    assert cy.tolist() == [255, 0]


def test_parent_children():
    ids = cell.cell_encode(np.asarray([10.0]), np.asarray([20.0]), 10)
    p = cell.cell_parent(ids)
    assert int(cell.cell_res(p)[0]) == 9
    ch = cell.cell_children(int(p[0]))
    assert int(ids[0]) in set(ch.tolist())
    assert len(ch) == 4


def test_disk_ring():
    cid = int(cell.cell_encode(np.asarray([0.0]), np.asarray([0.0]), 10)[0])
    assert len(cell.cell_disk(cid, 1)) == 9
    assert len(cell.cell_ring(cid, 1)) == 8
    assert len(cell.cell_ring(cid, 2)) == 16
    disk2 = set(cell.cell_disk(cid, 2).tolist())
    ring2 = set(cell.cell_ring(cid, 2).tolist())
    assert ring2 <= disk2
    assert set(cell.cell_disk(cid, 1).tolist()) | ring2 == disk2


def test_cell_bounds_contains_point():
    lon = np.asarray([12.34])
    lat = np.asarray([-56.78])
    ids = cell.cell_encode(lon, lat, 14)
    xmin, ymin, xmax, ymax = cell.cell_bounds(ids)
    assert xmin[0] <= lon[0] < xmax[0]
    assert ymin[0] <= lat[0] < ymax[0]


def test_covering_box():
    ids = cell.cells_covering_box(-1.0, -1.0, 1.0, 1.0, 8)
    # box straddles the center: at least 2x2 cells
    assert len(ids) >= 4
    b = cell.cell_bounds(ids)
    assert b[0].min() <= -1.0 and b[2].max() >= 1.0


def test_morton_locality():
    # two adjacent cells differ in fewer high bits than two far cells
    a = cell.cell_encode(np.asarray([0.0]), np.asarray([0.0]), 16)[0]
    b = cell.cell_encode(np.asarray([0.01]), np.asarray([0.0]), 16)[0]
    c = cell.cell_encode(np.asarray([170.0]), np.asarray([80.0]), 16)[0]
    assert abs(int(a) - int(b)) < abs(int(a) - int(c))


def test_cell_compact_uncompact():
    from rayspatial.cell import cell_children, cell_compact, cell_encode

    # a full quartet collapses to its parent
    parent = int(cell_encode(np.array([10.0]), np.array([20.0]), 4)[0])
    kids = cell_children(parent)
    assert list(cell_compact(kids)) == [parent]
    # recursive: all 16 grandchildren collapse two levels
    gks = np.concatenate([cell_children(int(k)) for k in kids])
    assert list(cell_compact(gks)) == [parent]
    # an incomplete quartet stays put
    assert len(cell_compact(kids[:3])) == 3


def test_cell_compact_no_false_merge():
    from rayspatial.cell import cell_children, cell_compact, cell_encode

    # parent + 3 of its children is a REDUNDANT covering with no full
    # quartet: compact must not merge it (only dedupes), 4 ids survive
    parent = int(cell_encode(np.array([10.0]), np.array([20.0]), 4)[0])
    kids = cell_children(parent)
    mixed = np.concatenate([kids[:3], [parent], [parent]])
    comp = cell_compact(mixed)
    assert len(comp) == 4 and parent in comp


def test_cell_uncompact_roundtrip_random():
    from rayspatial.cell import cell_compact, cell_encode, cell_uncompact

    rng = np.random.default_rng(7)
    cells = np.unique(cell_encode(rng.uniform(-180, 180, 2000),
                                  rng.uniform(-90, 90, 2000), 5))
    comp = cell_compact(cells)
    assert len(comp) < len(cells)          # something promoted at res 5
    assert set(cell_uncompact(comp, 5)) == set(cells)
    assert len(cell_uncompact(np.array([], dtype=np.int64), 5)) == 0
    with pytest.raises(ValueError):
        cell_uncompact(cells, 3)           # finer than target
