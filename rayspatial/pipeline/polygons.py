"""Deterministic synthetic polygon layer (the join's small side).

240 axis-aligned boxes from pure integer arithmetic so the DuckDB
oracle reproduces them with ``range(240)``:

    p in 0..239
    x0 = (p * 7919)   % 340 - 180        # [-180, 159]
    y0 = (p * 104729) % 150 - 85         # [-85, 64]
    w  = 6 + (p % 19)                    # [6, 24]
    h  = 4 + (p % 13)                    # [4, 16]
    box p = [x0, y0, x0 + w, y0 + h]

Join predicate is ``covers`` (boundary inclusive) == SQL
``lon BETWEEN x0 AND x0+w AND lat BETWEEN y0 AND y0+h``; integer
coordinates make the boundary tests exact.
"""

from __future__ import annotations

import numpy as np

N_POLYGONS = 240


def polygon_boxes(n: int = N_POLYGONS) -> np.ndarray:
    """(n, 4) float64 [xmin, ymin, xmax, ymax]."""
    p = np.arange(n, dtype=np.int64)
    x0 = ((p * 7919) % 340 - 180).astype(np.float64)
    y0 = ((p * 104729) % 150 - 85).astype(np.float64)
    w = (6 + (p % 19)).astype(np.float64)
    h = (4 + (p % 13)).astype(np.float64)
    return np.column_stack([x0, y0, x0 + w, y0 + h])


def polygon_geoms(n: int = N_POLYGONS):
    """Boxes as a GeomArray (for the STRtree actor)."""
    from rayspatial.geom.constructive import box

    b = polygon_boxes(n)
    return box(b[:, 0], b[:, 1], b[:, 2], b[:, 3])


ORACLE_POLYGONS_SQL = """
SELECT CAST(range AS BIGINT) AS poly_id,
       CAST((range * 7919)   % 340 - 180 AS DOUBLE) AS xmin,
       CAST((range * 104729) % 150 - 85  AS DOUBLE) AS ymin,
       CAST((range * 7919)   % 340 - 180 + 6 + (range % 19) AS DOUBLE) AS xmax,
       CAST((range * 104729) % 150 - 85  + 4 + (range % 13) AS DOUBLE) AS ymax
FROM range(240)
""".strip()


N_TARGETS = 200


def target_boxes(n: int = N_TARGETS) -> np.ndarray:
    """Second deterministic integer-coordinate layer (areal-interp
    targets), disjoint constants from ``polygon_boxes``:

        q in 0..199
        x0 = (q * 6211) % 330 - 175      # [-175, 154]
        y0 = (q * 9973) % 140 - 80       # [-80, 59]
        w  = 8 + (q % 17); h = 5 + (q % 11)
    """
    q = np.arange(n, dtype=np.int64)
    x0 = ((q * 6211) % 330 - 175).astype(np.float64)
    y0 = ((q * 9973) % 140 - 80).astype(np.float64)
    w = (8 + (q % 17)).astype(np.float64)
    h = (5 + (q % 11)).astype(np.float64)
    return np.column_stack([x0, y0, x0 + w, y0 + h])


def target_boxes_dataset(n: int = N_TARGETS, num_blocks: int = 8):
    """Target layer as a streaming Dataset of (tgt_id, bounds)."""
    import pyarrow as pa
    import ray.data as rd

    b = target_boxes(n)
    t = pa.table({
        "tgt_id": pa.array(np.arange(n, dtype=np.int64)),
        "xmin": pa.array(b[:, 0]), "ymin": pa.array(b[:, 1]),
        "xmax": pa.array(b[:, 2]), "ymax": pa.array(b[:, 3]),
    })
    return rd.from_arrow(t).repartition(num_blocks)


def source_values(n: int = N_POLYGONS) -> np.ndarray:
    """Deterministic integer attribute per source polygon (the
    'population' moved by areal interpolation)."""
    p = np.arange(n, dtype=np.int64)
    return 100 + (p * 37) % 1000
