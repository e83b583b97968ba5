"""Box-probe x box-tree fast path (strtree._box_box_predicate): the
closed interval forms must agree with the general per-pair predicate
engine on every `fast` predicate, including shared-edge / shared-corner
/ nested / disjoint integer layouts."""

import numpy as np
import pytest

from rayspatial.geom import constructive as C
from rayspatial.geom.strtree import (
    STRtree, _pair_predicate, _pos_box_mask,
)

PREDICATES = ["intersects", "within", "covered_by", "contains_properly",
              "touches", "covers", "contains", "crosses", "overlaps"]


def _boxes(rng, n, span=12):
    x0 = rng.integers(0, span, n).astype(float)
    y0 = rng.integers(0, span, n).astype(float)
    w = rng.integers(1, 5, n).astype(float)
    h = rng.integers(1, 5, n).astype(float)
    return C.box(x0, y0, x0 + w, y0 + h)


@pytest.mark.parametrize("predicate", PREDICATES)
def test_box_probes_match_pair_predicate(predicate):
    rng = np.random.default_rng(42)
    tree_g = _boxes(rng, 25)
    probe_g = _boxes(rng, 25)
    tree = STRtree(tree_g)
    assert tree._all_boxes()
    assert _pos_box_mask(probe_g).all()
    got = tree.query_bulk(probe_g, predicate=predicate)
    got_pairs = set(zip(got[0].tolist(), got[1].tolist()))
    exp = {
        (i, j)
        for i in range(len(probe_g))
        for j in range(len(tree_g))
        if _pair_predicate(probe_g, i, tree_g, j, predicate)
    }
    assert got_pairs == exp, predicate


@pytest.mark.parametrize("predicate", PREDICATES)
def test_box_probe_edge_layouts(predicate):
    # hand-picked contact cases: identical, nested, nested-with-shared
    # -edge, edge-touch, corner-touch, partial overlap, disjoint
    tree_g = C.box(np.array([0.0]), np.array([0.0]),
                   np.array([4.0]), np.array([4.0]))
    px0 = np.array([0.0, 1.0, 0.0, 4.0, 4.0, 2.0, 9.0, -1.0])
    py0 = np.array([0.0, 1.0, 1.0, 0.0, 4.0, 2.0, 9.0, -1.0])
    px1 = np.array([4.0, 3.0, 2.0, 6.0, 6.0, 6.0, 10.0, 5.0])
    py1 = np.array([4.0, 3.0, 2.0, 4.0, 6.0, 6.0, 10.0, 5.0])
    probe_g = C.box(px0, py0, px1, py1)
    tree = STRtree(tree_g)
    got = tree.query_bulk(probe_g, predicate=predicate)
    got_pairs = set(zip(got[0].tolist(), got[1].tolist()))
    exp = {(i, 0) for i in range(len(probe_g))
           if _pair_predicate(probe_g, i, tree_g, 0, predicate)}
    assert got_pairs == exp, predicate


def test_degenerate_probe_falls_back():
    # zero-height probe rectangle is NOT a positive-area box: the mask
    # must reject it and query_bulk must still answer via the general
    # path (here: a line-like ring touching the tree box edge)
    probe_g = C.box(np.array([0.0]), np.array([4.0]),
                    np.array([4.0]), np.array([4.0]))
    assert not _pos_box_mask(probe_g).any()
    tree = STRtree(C.box(np.array([0.0]), np.array([0.0]),
                         np.array([4.0]), np.array([4.0])))
    got = tree.query_bulk(probe_g, predicate="intersects")
    assert got.shape[1] == 1
