"""Generic WKB-column kernel adapters (ops.mapops)."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


@pytest.mark.usefixtures("ray_session")
def test_zonal_stats_exact_integers():
    import ray.data as rd

    from rayspatial.ops.agg import zonal_stats

    pairs = pa.table({
        "poly_id": pa.array([1, 1, 2, 1], type=pa.int64()),
        "doc_id": pa.array([10, 4, 7, 30], type=pa.int64()),
        "lon": pa.array([1.5, -2.25, 0.125, 3.0]),
        "lat": pa.array([10.0, 20.0, -5.5, 0.25]),
    })
    out = zonal_stats(rd.from_arrow(pairs).repartition(3)).to_pandas() \
        .sort_values("poly_id").reset_index(drop=True)
    assert out["poly_id"].tolist() == [1, 2]
    assert out["n_points"].tolist() == [3, 1]
    assert out["sum_lon_micro"].tolist() == [2250000, 125000]
    assert out["sum_lat_micro"].tolist() == [30250000, -5500000]
    assert out["min_id"].tolist() == [4, 7]
    assert out["max_id"].tolist() == [30, 7]


def test_rollup_agg_vs_pandas(ray_session):
    """rollup_agg == pandas multi-level reference, block-independent."""
    import ray.data as rd

    from rayspatial.ops.mapops import rollup_agg

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 400),
        "b": rng.choice(["p", "q"], 400),
        "v": rng.randint(-50, 50, 400).astype(np.int64),
    })
    got = rollup_agg(
        rd.from_pandas(df).repartition(5), ["a", "b"], "v"
    ).to_pandas().set_index(["a", "b"]).sort_index()

    detail = df.groupby(["a", "b"])["v"].agg(["sum", "size"])
    lvl1 = df.groupby("a")["v"].agg(["sum", "size"])
    total = (df["v"].sum(), len(df))
    assert len(got) == len(detail) + len(lvl1) + 1
    for (a, b), r in detail.iterrows():
        assert tuple(got.loc[(a, b)]) == (r["sum"], r["size"])
    for a, r in lvl1.iterrows():
        assert tuple(got.loc[(a, "ALL")]) == (r["sum"], r["size"])
    assert tuple(got.loc[("ALL", "ALL")]) == total


def test_rollup_agg_genuine_marker_value_stays_distinct(ray_session):
    """A real group value equal to the marker must NOT merge with
    rollup totals (ADVICE r3): the level tag keeps them as separate
    output rows with identical visible labels, same as a COALESCE'd
    SQL ROLLUP."""
    import ray.data as rd

    from rayspatial.ops.mapops import rollup_agg

    df = pd.DataFrame({
        "a": ["ALL", "ALL", "x", "x"],
        "v": np.array([1, 2, 10, 20], dtype=np.int64),
    })
    got = rollup_agg(rd.from_pandas(df).repartition(2), ["a"], "v"
                     ).to_pandas().sort_values(["a", "sum_v"])
    # leaf 'ALL'=3, leaf 'x'=30, grand total 'ALL'=33 — THREE rows
    assert len(got) == 3
    all_rows = got[got["a"] == "ALL"].sort_values("sum_v")
    assert all_rows["sum_v"].tolist() == [3, 33]
    assert all_rows["n_rows"].tolist() == [2, 4]
    assert got[got["a"] == "x"]["sum_v"].tolist() == [30]


def test_rollup_agg_rejects_numeric_group_cols(ray_session):
    import ray.data as rd

    from rayspatial.ops.mapops import rollup_agg

    df = pd.DataFrame({"a": [1, 2], "v": np.array([1, 2], dtype=np.int64)})
    with pytest.raises(ValueError, match="string"):
        rollup_agg(rd.from_pandas(df), ["a"], "v")
