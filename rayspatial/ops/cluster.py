"""Distributed eps-connectivity spatial clustering (DBSCAN with
min_pts=2, i.e. every point is core): two points belong to the same
cluster iff they are linked by a chain of hops of euclidean length
<= ``eps``; the cluster label is the minimum member id.

Scale shape (100-TB), no all-pairs anywhere:

1. map_batches: each point is assigned to a planar grid cell of side
   ``eps`` and REPLICATED to its 3x3 cell neighborhood (8 ghost copies
   + 1 home copy, 33 B each — ids and coords only, never payload).
   Any pair within eps spans at most one cell step per axis, so both
   endpoints co-occur in the home cell of each endpoint.
2. one hash-partition shuffle by cell key; per cell, vectorized
   home x all distance tests emit each qualifying pair exactly once
   (from the home cell of its smaller id — the ghost copy of the
   smaller id in the other endpoint's cell is skipped by the id
   ordering rule, so no global dedup pass is needed).
3. pairs + per-point self-loops feed the existing distributed
   min-label component engine (textops/components.py), which keeps
   singleton points labeled as their own cluster.

Dense cells are the skew risk: a cell holding h points emits O(h^2)
candidate tests.  ``eps`` chooses the grid, so callers control h via
resolution; the per-cell kernel is a numpy block product (no Python
per-row work), and cells are spread across partitions by hash so one
hot cell occupies one task, not the whole stage.

No reference equivalent (pygeos has no clustering); semantics follow
the standard DBSCAN reachability definition restricted to min_pts=2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["eps_clusters"]

_NEIGH = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    # pack two int32 grid coords into one int64 shuffle key
    return (cx.astype(np.int64) << 32) ^ (cy.astype(np.int64) & 0xFFFFFFFF)


def eps_clusters(points_ds, eps: float, id_col: str = "doc_id",
                 lon_col: str = "lon", lat_col: str = "lat",
                 num_partitions: int | None = None):
    """(id, lon, lat) Dataset -> (id, cluster) Dataset; cluster =
    min id reachable through hops of length <= ``eps`` (planar
    euclidean)."""
    from rayspatial.textops.components import (
        connected_components_distributed,
    )
    from rayspatial.util import hash_partitioned_agg

    eps = float(eps)
    eps2 = eps * eps

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        lon = batch.column(lon_col).to_numpy().astype(np.float64)
        lat = batch.column(lat_col).to_numpy().astype(np.float64)
        cx = np.floor(lon / eps).astype(np.int64)
        cy = np.floor(lat / eps).astype(np.int64)
        n = len(ids)
        keys = np.empty(9 * n, dtype=np.int64)
        home = np.zeros(9 * n, dtype=bool)
        for k, (dx, dy) in enumerate(_NEIGH):
            keys[k * n:(k + 1) * n] = _cell_key(cx + dx, cy + dy)
            if dx == 0 and dy == 0:
                home[k * n:(k + 1) * n] = True
        return pa.table({
            "_ckey": pa.array(keys),
            id_col: pa.array(np.tile(ids, 9)),
            "x": pa.array(np.tile(lon, 9)),
            "y": pa.array(np.tile(lat, 9)),
            "_home": pa.array(home),
        })

    ghosts = points_ds.map_batches(replicate, batch_format="pyarrow")

    def pairs_of(df: pd.DataFrame) -> pd.DataFrame:
        # partition holds many whole cells; vectorized home x all block
        # product per cell slice (per-CELL loop, never per-row)
        df = df.sort_values("_ckey", kind="stable")
        keys = df["_ckey"].to_numpy()
        ids = df[id_col].to_numpy()
        xs = df["x"].to_numpy()
        ys = df["y"].to_numpy()
        home = df["_home"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            h = np.flatnonzero(home[s:e]) + s
            if len(h) == 0 or e - s < 2:
                continue
            dx = xs[h, None] - xs[None, s:e]
            dy = ys[h, None] - ys[None, s:e]
            # emit from the smaller id's home cell only: id(home) < id(other)
            hit = ((dx * dx + dy * dy <= eps2)
                   & (ids[h, None] < ids[None, s:e]))
            hi, oj = np.nonzero(hit)
            if len(hi):
                out_a.append(ids[h[hi]])
                out_b.append(ids[s + oj])
        if not out_a:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    pairs = hash_partitioned_agg(ghosts, ["_ckey"], pairs_of,
                                 num_partitions=num_partitions)

    # self-loops keep isolated points in the label table
    def self_loops(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        return pa.table({"a": pa.array(ids), "b": pa.array(ids)})

    loops = points_ds.map_batches(self_loops, batch_format="pyarrow")
    labels = connected_components_distributed(pairs.union(loops))
    return labels.map_batches(
        lambda b: pa.table({id_col: b.column("doc_id"),
                            "cluster": b.column("rep")}),
        batch_format="pyarrow",
    )
