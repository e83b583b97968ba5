"""Generic WKB-column kernel adapters (ops.mapops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayspatial import geom as g


@pytest.fixture(scope="module")
def wkb_ds(ray_session):
    import ray.data as rd

    from rayspatial.pipeline.polygons import polygon_geoms

    ga = polygon_geoms()
    tab = pa.table(
        {
            "poly_id": pa.array(np.arange(len(ga), dtype=np.int64)),
            "wkb": pa.array(g.to_wkb(ga), type=pa.binary()),
        }
    )
    return rd.from_arrow(tab)


def test_geom_map_scalar(ray_session, wkb_ds):
    from rayspatial.ops.mapops import geom_map
    from rayspatial.pipeline.polygons import polygon_boxes

    out = geom_map(wkb_ds, g.area, "wkb", out="area").to_pandas()
    b = polygon_boxes()
    want = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    got = out.sort_values("poly_id")["area"].to_numpy()
    assert np.allclose(got, want)


def test_geom_map_geometry(ray_session, wkb_ds):
    from rayspatial.ops.mapops import geom_map

    # centroid rewrites the wkb column in place
    out = geom_map(wkb_ds, g.centroid, "wkb").to_pandas().sort_values("poly_id")
    ga = g.from_wkb(out["wkb"].tolist())
    assert (g.get_type_id(ga) == 0).all()  # all POINTs now
    from rayspatial.pipeline.polygons import polygon_boxes

    b = polygon_boxes()
    assert np.allclose(g.get_x(ga), (b[:, 0] + b[:, 2]) / 2)


def test_geom_map_broadcast(ray_session, wkb_ds):
    from rayspatial.ops.mapops import geom_map_broadcast

    probe = g.box(-180.0, -90.0, 180.0, 90.0)  # world box covers all
    out = geom_map_broadcast(
        wkb_ds, g.intersects, probe, "wkb", out="hit"
    ).to_pandas()
    assert out["hit"].all()
    pt = g.points([[1000.0, 1000.0]])  # far away point
    out2 = geom_map_broadcast(wkb_ds, g.distance, pt, "wkb", out="d").to_pandas()
    assert (out2["d"] > 0).all()
