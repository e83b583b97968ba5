"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tiling pipeline on
sf0.001; ``queries()`` exposes each implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL per
query (tables region nation customer supplier part orders lineitem
events documents embeddings are pre-registered views).

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"

# shared SQL fragments ------------------------------------------------------

_PTS_CTE = """
pts AS (
  SELECT doc_id,
         'https://site-' || CAST(doc_id % 97 AS VARCHAR) || '.example.com/page/'
             || CAST(doc_id AS VARCHAR) AS url,
         ((doc_id * 2654435761) % 360000000) / 1000000.0 - 180.0 AS lon,
         ((doc_id * 2246822519) % 170000000) / 1000000.0 - 85.0 AS lat
  FROM documents
)
""".strip()

_POLYS_CTE = """
polys AS (
  SELECT CAST(range AS BIGINT) AS poly_id,
         CAST((range * 7919)   % 340 - 180 AS DOUBLE) AS xmin,
         CAST((range * 104729) % 150 - 85  AS DOUBLE) AS ymin,
         CAST((range * 7919)   % 340 - 180 + 6 + (range % 19) AS DOUBLE) AS xmax,
         CAST((range * 104729) % 150 - 85  + 4 + (range % 13) AS DOUBLE) AS ymax
  FROM range(240)
)
""".strip()


def _cell_expr(col: str, lo: float, span: float, n: int) -> str:
    return (
        f"CAST(GREATEST(LEAST(FLOOR(({col} + {lo}) / {span} * {n}), {n - 1}), 0) AS BIGINT)"
    )


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from rayspatial.pipeline.flagship import flagship

    return flagship(SF0001)


# ---------------------------------------------------------------------------


def _q_extract_points(sf_dir: str):
    from rayspatial.pipeline.flagship import points_dataset

    return points_dataset(sf_dir)


def _q_tile_counts(sf_dir: str):
    from rayspatial.ops.tiles import tile_counts
    from rayspatial.pipeline.flagship import points_dataset

    return tile_counts(points_dataset(sf_dir), res=6)


def _q_pip_join(sf_dir: str):
    from rayspatial.ops.join import join_points_polygons
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pairs = join_points_polygons(points_dataset(sf_dir), polygon_geoms(), predicate="covers")
    return pairs.select_columns(["doc_id", "poly_id"])


def _q_pip_join_shuffled(sf_dir: str):
    from rayspatial.ops.join import join_points_polygons_shuffled
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pairs = join_points_polygons_shuffled(
        points_dataset(sf_dir), polygon_geoms(), predicate="covers"
    )
    return pairs.select_columns(["doc_id", "poly_id"])


def _q_flagship(sf_dir: str):
    from rayspatial.pipeline.flagship import flagship

    return flagship(sf_dir)


def _q_total_bounds(sf_dir: str):
    """Global AGG: total_bounds of the extracted points (reference
    measurement.py:106-148 as partial+final min/max)."""
    import pyarrow as pa

    from rayspatial.pipeline.flagship import points_dataset

    ds = points_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        return pa.table(
            {
                "xmin": [float(np.min(lon))],
                "ymin": [float(np.min(lat))],
                "xmax": [float(np.max(lon))],
                "ymax": [float(np.max(lat))],
            }
        )

    from ray.data.aggregate import Max, Min

    part = ds.map_batches(partial, batch_format="pyarrow")
    row = part.aggregate(
        Min("xmin", alias_name="xmin"),
        Min("ymin", alias_name="ymin"),
        Max("xmax", alias_name="xmax"),
        Max("ymax", alias_name="ymax"),
    )
    return pa.table({k: [v] for k, v in row.items()})


def _q_pages_by_lang(sf_dir: str):
    """Pages per language (smoke for the pages synthesizer)."""
    from ray.data.aggregate import Count

    from rayspatial.pipeline.pages import read_pages

    ds = read_pages(sf_dir).select_columns(["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_pages"))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_points": _q_extract_points,
        "tile_counts": _q_tile_counts,
        "pip_join": _q_pip_join,
        "pip_join_shuffled": _q_pip_join_shuffled,
        "flagship_join_tiles": _q_flagship,
        "total_bounds": _q_total_bounds,
        "pages_by_lang": _q_pages_by_lang,
    }


def oracle_sql() -> dict[str, str]:
    cx = _cell_expr("lon", 180.0, 360.0, 64)
    cy = _cell_expr("lat", 90.0, 180.0, 64)
    join_cond = "lon >= xmin AND lon <= xmax AND lat >= ymin AND lat <= ymax"
    return {
        "extract_points": f"WITH {_PTS_CTE} SELECT url, doc_id, lon, lat FROM pts",
        "tile_counts": (
            f"WITH {_PTS_CTE} SELECT {cx} AS cell_x, {cy} AS cell_y, "
            "COUNT(*) AS n_points FROM pts GROUP BY 1, 2"
        ),
        "pip_join": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            f"SELECT doc_id, poly_id FROM pts JOIN polys ON {join_cond}"
        ),
        "pip_join_shuffled": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            f"SELECT doc_id, poly_id FROM pts JOIN polys ON {join_cond}"
        ),
        "flagship_join_tiles": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            f"SELECT {cx} AS cell_x, {cy} AS cell_y, poly_id, COUNT(*) AS n_points "
            f"FROM pts JOIN polys ON {join_cond} GROUP BY 1, 2, 3"
        ),
        "total_bounds": (
            f"WITH {_PTS_CTE} SELECT MIN(lon) AS xmin, MIN(lat) AS ymin, "
            "MAX(lon) AS xmax, MAX(lat) AS ymax FROM pts"
        ),
        "pages_by_lang": "SELECT lang, COUNT(*) AS n_pages FROM documents GROUP BY lang",
    }
