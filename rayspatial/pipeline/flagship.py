"""The flagship pipeline (BASELINE.json north_star):

pages (url, warc_ts, html, text, lang)
  -> extract geocoded points (actor-pool map_batches, html dropped)
  -> cell-encode (batched numpy Morton H3-style ids)
  -> point-in-polygon join vs broadcast STRtree polygon layer
  -> per-(polygon, tile-cell) counts (partial-combine + small groupby)

Every stage is a streaming map_batches over zero-copy Arrow; the only
all-to-all exchange is the final pre-aggregated groupby.
"""

from __future__ import annotations

from rayspatial.ops.join import join_points_polygons
from rayspatial.ops.tiles import tile_counts
from rayspatial.pipeline.extract import extract_points
from rayspatial.pipeline.pages import read_pages
from rayspatial.pipeline.polygons import polygon_geoms

TILE_RES = 6


def points_dataset(sf_dir: str, concurrency=None, expand: int = 1):
    pages = read_pages(sf_dir, expand=expand)
    return extract_points(pages, concurrency=concurrency)


def flagship(sf_dir: str, tile_res: int = TILE_RES, concurrency=None,
             join_concurrency=None, expand: int = 1):
    """Full chain -> Dataset of (poly_id, cell_x, cell_y, n_points)."""
    pts = points_dataset(sf_dir, concurrency=concurrency, expand=expand)
    # task-mode join (per-worker tree cache): the polygon layer is
    # broadcast-small, so stateless tasks scale instantly — an actor
    # pool would spend seconds of its wall time just starting actors
    if join_concurrency is None:
        pairs = join_points_polygons(pts, polygon_geoms(), predicate="covers")
    else:
        pairs = join_points_polygons(
            pts, polygon_geoms(), predicate="covers",
            concurrency=join_concurrency, mode="actor",
        )
    return tile_counts(pairs, tile_res, extra_keys=["poly_id"])
