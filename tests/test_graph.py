"""triangle_count (ops/graph.py): brute-force equality on random
graphs, chunking invariance, degenerate inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for a, b in und:
        n += len(adj[a] & adj[b] & {x for x in adj[a] if x > b})
    return n


def _count(tbl, parts, ray_session):
    import ray.data as rd

    from rayspatial.ops.graph import triangle_count

    ds = rd.from_arrow(tbl).repartition(parts)
    out = triangle_count(ds).to_pandas()
    assert list(out.columns) == ["n_triangles"] and len(out) == 1
    return int(out["n_triangles"].iloc[0])


def test_triangle_count_random_matches_brute(ray_session):
    rng = np.random.default_rng(13)
    n_nodes, n_edges = 60, 500
    s = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    d = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    exp = _brute(list(zip(s.tolist(), d.tolist())))
    assert exp > 0  # dense enough to actually have triangles
    tbl = pa.table({"src": pa.array(s), "dst": pa.array(d)})
    for parts in (1, 7):
        assert _count(tbl, parts, ray_session) == exp


def test_triangle_count_edge_cases(ray_session):
    # pure triangle, duplicated + reversed + self-loops
    tbl = pa.table({
        "src": pa.array([0, 1, 2, 2, 0, 5], type=pa.int64()),
        "dst": pa.array([1, 2, 0, 1, 0, 6], type=pa.int64()),
    })
    assert _count(tbl, 2, ray_session) == 1
    # triangle-free path graph -> a real (0,) row, not an empty result
    path = pa.table({"src": pa.array([0, 1, 2], type=pa.int64()),
                     "dst": pa.array([1, 2, 3], type=pa.int64())})
    assert _count(path, 1, ray_session) == 0
