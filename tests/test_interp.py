"""Areal interpolation (ops/interp.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _targets_ds(bounds, ids=None):
    import ray.data as rd

    b = np.asarray(bounds, dtype=np.float64)
    n = len(b)
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    return rd.from_arrow(pa.table({
        "tgt_id": pa.array(ids),
        "xmin": pa.array(b[:, 0]), "ymin": pa.array(b[:, 1]),
        "xmax": pa.array(b[:, 2]), "ymax": pa.array(b[:, 3]),
    })).repartition(2)


@pytest.mark.usefixtures("ray_session")
def test_halves_and_disjoint():
    from rayspatial.geom.constructive import box
    from rayspatial.ops.interp import areal_interpolate

    src = box(np.array([0.0]), np.array([0.0]),
              np.array([10.0]), np.array([10.0]))
    # target 0 covers the left half, 1 the right half, 2 nothing
    out = areal_interpolate(
        _targets_ds([[0, 0, 5, 10], [5, 0, 10, 10], [50, 50, 60, 60]]),
        src, np.array([801]),
    ).to_pandas().sort_values("tgt_id")
    assert out["est_scaled"].tolist() == [400500000, 400500000, 0]


@pytest.mark.usefixtures("ray_session")
def test_identity_targets_recover_full_value():
    from rayspatial.pipeline.polygons import (
        polygon_boxes,
        polygon_geoms,
        source_values,
    )
    from rayspatial.ops.interp import areal_interpolate

    b = polygon_boxes(40)
    vals = source_values(40)
    # each target IS one source zone: est >= its own full value
    # (plus whatever other overlapping zones contribute)
    out = areal_interpolate(_targets_ds(b), polygon_geoms(40), vals) \
        .to_pandas().sort_values("tgt_id").reset_index(drop=True)
    assert (out["est_scaled"].to_numpy() >= vals * 1_000_000).all()


@pytest.mark.usefixtures("ray_session")
def test_mass_conservation_partition():
    """Targets that exactly tile the source's extent receive the whole
    mass (value * scale), split across tiles."""
    from rayspatial.geom.constructive import box
    from rayspatial.ops.interp import areal_interpolate

    src = box(np.array([0.0]), np.array([0.0]),
              np.array([12.0]), np.array([8.0]))
    tiles = [[x, y, x + 4, y + 4] for x in (0, 4, 8) for y in (0, 4)]
    out = areal_interpolate(_targets_ds(tiles), src, np.array([960]))
    tot = out.to_pandas()["est_scaled"].sum()
    assert tot == 960 * 1_000_000
