"""kNN join (cell-ring expansion) vs brute force on sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def points_df(ray_session):
    from rayspatial.pipeline.flagship import points_dataset

    return points_dataset(SF).to_pandas()


def _brute_knn(pdf: pd.DataFrame, boxes: np.ndarray, k: int,
               max_distance: float | None = None):
    from rayspatial.ops.knn import _bbox_dist2

    d2 = _bbox_dist2(pdf.lon.to_numpy(), pdf.lat.to_numpy(), boxes)
    rows = []
    for i in range(len(pdf)):
        order = sorted(range(boxes.shape[0]), key=lambda j: (d2[i, j], j))[:k]
        for r, j in enumerate(order, 1):
            if max_distance is not None and d2[i, j] > max_distance**2:
                continue
            rows.append((int(pdf.doc_id.iloc[i]), j, r))
    return pd.DataFrame(rows, columns=["doc_id", "poly_id", "rank"])


@pytest.mark.parametrize("k", [1, 3, 7])
def test_knn_join_matches_brute(ray_session, points_df, k):
    from rayspatial.ops.knn import knn_join
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_boxes, polygon_geoms

    got = (
        knn_join(points_dataset(SF), polygon_geoms(), k=k)
        .to_pandas()[["doc_id", "poly_id", "rank"]]
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    ref = (
        _brute_knn(points_df, polygon_boxes(), k)
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))


def test_knn_max_distance(ray_session, points_df):
    from rayspatial.ops.knn import knn_join
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_boxes, polygon_geoms

    got = (
        knn_join(points_dataset(SF), polygon_geoms(), k=1, max_distance=2.0)
        .to_pandas()[["doc_id", "poly_id"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _brute_knn(points_df, polygon_boxes(), 1, max_distance=2.0)[
        ["doc_id", "poly_id"]
    ].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))
    # nearest-within-0 == the covers join (boundary-inclusive)
    from rayspatial.ops.join import join_points_polygons

    d0 = knn_join(points_dataset(SF), polygon_geoms(), k=1, max_distance=0.0).to_pandas()
    cov = join_points_polygons(
        points_dataset(SF), polygon_geoms(), predicate="covers"
    ).to_pandas()
    assert set(d0.doc_id) == set(cov.doc_id)


def test_knn_vs_strtree_nearest(ray_session):
    """Cross-check against the library STRtree.nearest (reference
    semantics: strtree.py:231-275, ties -> lowest id in our engine)."""
    import pyarrow as pa

    from rayspatial.geom.constructive import box
    from rayspatial.geom.strtree import STRtree
    from rayspatial.ops.knn import KnnJoiner
    from rayspatial.geom.wkb import to_wkb
    from rayspatial.geom import io as gio

    rng = np.random.RandomState(7)
    bx = np.sort(rng.uniform(-50, 50, (40, 2)), axis=1)
    by = np.sort(rng.uniform(-50, 50, (40, 2)), axis=1)
    polys = box(bx[:, 0], by[:, 0], bx[:, 1] + 1, by[:, 1] + 1)
    tree = STRtree(polys)
    px = rng.uniform(-60, 60, 200)
    py = rng.uniform(-60, 60, 200)
    probes = gio.from_wkt(
        np.array([f"POINT ({x} {y})" for x, y in zip(px, py)], dtype=object)
    )
    pair = tree.nearest(probes)
    j = KnnJoiner(
        {"wkb": to_wkb(polys), "ids": np.arange(len(polys))}, k=1, res=4
    )
    batch = pa.table({"lon": px, "lat": py, "rid": np.arange(200)})
    out = j(batch).to_pandas().sort_values("rid")
    assert np.array_equal(out["rid"].to_numpy(), pair[0])
    assert np.array_equal(out["poly_id"].to_numpy(), pair[1])


def test_knn_nonbox_true_distance(ray_session):
    """For non-rectangular polygons the join must rank by TRUE geometry
    distance, not envelope distance (envelope stays the ring bound)."""
    import ray.data as rd

    from rayspatial import geom as g
    from rayspatial.ops.knn import knn_join

    # a thin right triangle and a square: a probe point near the
    # triangle's empty corner is envelope-close to the triangle but
    # geometry-close to the square
    polys = g.from_wkt([
        "POLYGON ((0 0, 10 0, 10 1, 0 0))",     # thin triangle, id 0
        "POLYGON ((1.5 2.2, 2.5 2.2, 2.5 3.2, 1.5 3.2, 1.5 2.2))",  # id 1
    ])
    pts = pd.DataFrame({"doc_id": [0], "lon": [2.0], "lat": [2.0]})
    out = (
        knn_join(rd.from_pandas(pts), polys, k=2, res=3)
        .to_pandas()
        .sort_values("rank")
    )
    # true distances: square is 0.2 away; triangle boundary (hypotenuse
    # y = x/10) is ~1.79 away even though its ENVELOPE contains the pt
    assert list(out["poly_id"]) == [1, 0]

    # brute-force check of every pair distance ordering
    d_tri = float(
        g.distance(g.from_wkt(["POINT (2 2)", "POINT (2 2)"]), polys)[0]
    )
    assert d_tri > 0.2
