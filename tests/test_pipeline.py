"""End-to-end pipeline tests on sf0.001 (Ray session-scoped fixture)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ray_ds(ray_session):
    import ray.data  # noqa: F401

    return None


def test_pages_schema_and_determinism(ray_ds):
    from rayspatial.pipeline.pages import read_pages

    # Ray Data block order is nondeterministic — key by url (the rule's
    # invariant is per-url byte identity, not row order)
    t1 = read_pages(SF).take_all()
    t2 = read_pages(SF).take_all()
    by_url1 = {r["url"]: r for r in t1}
    by_url2 = {r["url"]: r for r in t2}
    assert set(by_url1) == set(by_url2)
    for u, r in by_url1.items():
        assert r["html"] == by_url2[u]["html"]
        assert r["text"] == by_url2[u]["text"]
    r = t1[0]
    assert set(r.keys()) == {"url", "warc_ts", "html", "text", "lang", "doc_id"}
    assert isinstance(r["html"], bytes)


def test_extracted_text_byte_identical(ray_ds):
    """The rule's per-row invariant: text extracted from html is
    byte-identical to the source text, keyed by url."""
    from rayspatial.pipeline.extract import extract_text
    from rayspatial.pipeline.pages import read_pages

    pages = read_pages(SF)
    src = {r["url"]: r["text"] for r in pages.take_all()}
    ext = read_pages(SF).map_batches(extract_text, batch_format="pyarrow")
    for r in ext.take_all():
        assert r["text"] == src[r["url"]], r["url"]


def test_extract_points_exact(ray_ds):
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.pages import geo_nums, nums_to_lonlat

    pts = points_dataset(SF).to_pandas()
    lat_num, lon_num = geo_nums(pts["doc_id"].to_numpy())
    lon, lat = nums_to_lonlat(lat_num, lon_num)
    assert (pts["lon"].to_numpy() == lon).all()
    assert (pts["lat"].to_numpy() == lat).all()
    assert (pts["lat"].abs() <= 85.0).all()
    assert (pts["lon"].abs() <= 180.0).all()


def test_join_broadcast_vs_local_reference(ray_ds):
    """Distributed broadcast join == single-node STRtree composition of
    the same kernels (the rule's equality check)."""
    from rayspatial.geom.strtree import STRtree
    from rayspatial.geom.wkb import parse_wkb, point_wkb
    from rayspatial.ops.join import join_points_polygons
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pts_df = points_dataset(SF).to_pandas()
    pairs = (
        join_points_polygons(points_dataset(SF), polygon_geoms(), predicate="covers")
        .select_columns(["doc_id", "poly_id"])
        .to_pandas()
    )
    got = set(zip(pairs["doc_id"], pairs["poly_id"]))

    # single-node reference composition: STRtree query_bulk covered_by
    probes = parse_wkb(list(point_wkb(pts_df["lon"].to_numpy(), pts_df["lat"].to_numpy())))
    tree = STRtree(polygon_geoms())
    res = tree.query_bulk(probes, predicate="covered_by")
    want = {(int(pts_df["doc_id"].iloc[i]), int(t)) for i, t in zip(res[0], res[1])}
    assert got == want
    assert len(got) > 0


def test_join_shuffled_equals_broadcast(ray_ds):
    from rayspatial.ops.join import join_points_polygons, join_points_polygons_shuffled
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    a = (
        join_points_polygons(points_dataset(SF), polygon_geoms(), predicate="covers")
        .select_columns(["doc_id", "poly_id"])
        .to_pandas()
    )
    b = (
        join_points_polygons_shuffled(points_dataset(SF), polygon_geoms(), predicate="covers")
        .select_columns(["doc_id", "poly_id"])
        .to_pandas()
    )
    assert set(zip(a["doc_id"], a["poly_id"])) == set(zip(b["doc_id"], b["poly_id"]))


def test_tile_counts_sum(ray_ds):
    from rayspatial.ops.tiles import tile_counts
    from rayspatial.pipeline.flagship import points_dataset

    n_docs = points_dataset(SF).count()
    tc = tile_counts(points_dataset(SF), res=6).to_pandas()
    assert tc["n_points"].sum() == n_docs
    assert (tc["cell_x"] >= 0).all() and (tc["cell_x"] < 64).all()


def test_raster_vector_tiles(ray_ds):
    from rayspatial.geom.wkb import parse_wkb
    from rayspatial.ops.tiles import rasterize_tiles, vectorize_tiles
    from rayspatial.pipeline.flagship import points_dataset

    raster = rasterize_tiles(points_dataset(SF), res=3, tile_res=6)
    rows = raster.take_all()
    n_docs = points_dataset(SF).count()
    assert sum(int(np.sum(r["grid"])) for r in rows) == n_docs
    vec = vectorize_tiles(raster, res=3, tile_res=6).take_all()
    assert len(vec) > 0
    ga = parse_wkb([r["wkb"] for r in vec])
    assert (ga.types == 3).all()  # all polygons


def test_entry_smoke(ray_ds):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas()
    assert len(df) >= 0
    assert set(df.columns) == {"cell_x", "cell_y", "poly_id", "n_points"}


def test_slab_index_matches_tree_all_predicates(ray_ds):
    """The all-box slab-bitset stab equals the STRtree candidate walk
    exactly — random probes, probes ON box edges/corners, probes just
    outside, NaN probes — for every box-supported predicate."""
    import ray

    from rayspatial.ops.join import PointInPolygonJoiner
    from rayspatial.geom.constructive import box as mk_box
    from rayspatial.geom.wkb import to_wkb

    rng = np.random.RandomState(77)
    x0 = rng.uniform(0, 90, 60)
    y0 = rng.uniform(0, 90, 60)
    w = rng.uniform(0.5, 12, 60)
    h = rng.uniform(0.5, 12, 60)
    ga = mk_box(x0, y0, x0 + w, y0 + h)
    payload = {"wkb": to_wkb(ga), "ids": np.arange(60, dtype=np.int64)}

    px = rng.uniform(-5, 110, 4000)
    py = rng.uniform(-5, 110, 4000)
    # exact edge / corner / just-outside probes
    eps = 1e-9
    px = np.concatenate([px, x0, x0 + w, x0 + w / 2, x0 + w + eps,
                         [np.nan, 50.0]])
    py = np.concatenate([py, y0, y0 + h, y0 + h / 2, y0 + h + eps,
                         [50.0, np.nan]])
    batch = pa.table({"lon": pa.array(px), "lat": pa.array(py),
                      "row": pa.array(np.arange(len(px)))})
    for pred in ("covers", "intersects", "covered_by", "contains",
                 "within", "contains_properly"):
        j = PointInPolygonJoiner(payload, predicate=pred)
        assert j.slab is not None
        got = j(batch).to_pandas()
        j.slab = None  # force the STRtree path
        want = j(batch).to_pandas()
        assert got[["row", "poly_id"]].values.tolist() == \
            want[["row", "poly_id"]].values.tolist(), pred
        assert len(got) > 0


def test_join_subdivided_equals_broadcast(ray_ds):
    """Subdivided (clip-to-cell) shuffle join == broadcast join on the
    same layer, including a non-rectangular polygon spanning cells and
    a point sitting exactly on an internal cell edge."""
    import pandas as pd
    import ray.data as rd

    from rayspatial import geom as g
    from rayspatial.ops.join import (
        join_points_polygons,
        join_points_polygons_subdivided,
    )
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    a = (
        join_points_polygons(points_dataset(SF), polygon_geoms(), predicate="covers")
        .select_columns(["doc_id", "poly_id"])
        .to_pandas()
    )
    b = (
        join_points_polygons_subdivided(
            points_dataset(SF), polygon_geoms(), predicate="covers")
        .select_columns(["doc_id", "poly_id"])
        .to_pandas()
    )
    assert set(zip(a["doc_id"], a["poly_id"])) == set(zip(b["doc_id"], b["poly_id"]))

    # crafted: triangle spanning several res-4 cells (cell width 22.5)
    tri = g.from_wkt(["POLYGON ((-30 -10, 40 -10, 5 35, -30 -10))"])
    # res-4 internal cell edge at lon=0 (grid origin): point ON the edge
    # and inside the triangle must still match under 'covers'
    pts = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "lon": np.array([0.0, -20.0, 30.0, 5.0, -40.0, 0.0]),
        "lat": np.array([0.0, -5.0, -5.0, 20.0, 0.0, 40.0]),
    })
    pts_ds = rd.from_pandas(pts).repartition(2)
    got = join_points_polygons_subdivided(
        pts_ds, tri, predicate="covers"
    ).select_columns(["doc_id", "poly_id"]).to_pandas()
    want = join_points_polygons(
        rd.from_pandas(pts), tri, predicate="covers"
    ).select_columns(["doc_id", "poly_id"]).to_pandas()
    assert set(got.doc_id) == set(want.doc_id) == {0, 1, 2, 3}

    with pytest.raises(ValueError):
        join_points_polygons_subdivided(pts_ds, tri, predicate="contains")


def test_join_subdivided_salted_equals_plain(ray_ds):
    """Hot-cell salting on the subdivided join leaves results exactly
    unchanged (pieces shared across salt buckets via the worker cache)."""
    from rayspatial.ops.join import join_points_polygons_subdivided
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    a = join_points_polygons_subdivided(
        points_dataset(SF), polygon_geoms(), predicate="covers"
    ).select_columns(["doc_id", "poly_id"]).to_pandas()
    b = join_points_polygons_subdivided(
        points_dataset(SF), polygon_geoms(), predicate="covers",
        salt_target=50,
    ).select_columns(["doc_id", "poly_id"]).to_pandas()
    assert set(zip(a["doc_id"], a["poly_id"])) == set(zip(b["doc_id"], b["poly_id"]))


def test_tile_pyramid_levels_equal_direct(ray_ds):
    """Every pyramid level must equal a direct aggregation at that
    resolution (the quad-parent rollup is exact), and each level's
    total preserves the point count."""
    from rayspatial.ops.tiles import tile_counts, tile_pyramid
    from rayspatial.pipeline.flagship import points_dataset

    pyr = tile_pyramid(points_dataset(SF), res_hi=6, res_lo=3).to_pandas()
    n_docs = points_dataset(SF).count()
    for r in (6, 5, 4, 3):
        lv = pyr[pyr["res"] == r].reset_index(drop=True)
        direct = tile_counts(points_dataset(SF), res=r).to_pandas()
        assert lv["n_points"].sum() == n_docs, r
        key = lambda d: sorted(zip(d["cell_x"], d["cell_y"], d["n_points"]))
        assert key(lv) == key(direct), r
    import pytest as _pt

    with _pt.raises(ValueError):
        tile_pyramid(points_dataset(SF), res_hi=2, res_lo=5)


def test_csv_json_sized_sources(ray_ds, tmp_path):
    """CSV/JSONL sources read the same rows as the parquet source and
    split into >1 block under a rows_per_block override."""
    import duckdb

    from rayspatial.util import read_csv_sized, read_json_sized

    csv = tmp_path / "docs.csv"
    jl = tmp_path / "docs.jsonl"
    duckdb.sql(f"COPY (SELECT doc_id, lang, n_chars FROM "
               f"'{SF}/documents.parquet') TO '{csv}' (HEADER)")
    duckdb.sql(f"COPY (SELECT doc_id, lang, n_chars FROM "
               f"'{SF}/documents.parquet') TO '{jl}'")
    exp = duckdb.sql(
        f"SELECT COUNT(*), SUM(n_chars) FROM '{SF}/documents.parquet'"
    ).fetchone()
    for reader, p in ((read_csv_sized, csv), (read_json_sized, jl)):
        ds = reader(str(p), rows_per_block=64).materialize()
        df = ds.to_pandas()
        assert (len(df), df["n_chars"].sum()) == exp
        assert ds.num_blocks() > 1
