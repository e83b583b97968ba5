"""eps-connectivity spatial clustering (ops/cluster.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_clusters(ids, xs, ys, eps):
    """Reference union-find over the full pair matrix."""
    n = len(ids)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2 <= eps * eps:
                parent[find(i)] = find(j)
    label = {}
    for i in range(n):
        r = find(i)
        label[r] = min(label.get(r, ids[i]), ids[i])
    return {ids[i]: label[find(i)] for i in range(n)}


def _run(ids, xs, ys, eps, **kw):
    import ray.data as rd

    from rayspatial.ops.cluster import eps_clusters

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, np.int64)),
        "lon": pa.array(np.asarray(xs, np.float64)),
        "lat": pa.array(np.asarray(ys, np.float64)),
    })).repartition(4)
    out = eps_clusters(ds, eps, **kw).to_pandas()
    return dict(zip(out["doc_id"], out["cluster"]))


@pytest.mark.usefixtures("ray_session")
def test_chain_across_cells_and_singletons():
    # chain 0-1-2 spans three grid cells (each hop < eps, ends far
    # apart); 3 is isolated; 4/5 coincide
    ids = [0, 1, 2, 3, 4, 5]
    xs = [0.0, 0.9, 1.8, 50.0, -30.0, -30.0]
    ys = [0.0, 0.0, 0.0, 50.0, -10.0, -10.0]
    got = _run(ids, xs, ys, eps=1.0)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


@pytest.mark.usefixtures("ray_session")
def test_exact_eps_boundary_included():
    got = _run([7, 9], [0.0, 3.0], [0.0, 4.0], eps=5.0)
    assert got == {7: 7, 9: 7}
    got = _run([7, 9], [0.0, 3.0], [0.0, 4.001], eps=5.0)
    assert got == {7: 7, 9: 9}


@pytest.mark.usefixtures("ray_session")
def test_random_matches_bruteforce():
    rng = np.random.default_rng(31)
    n = 300
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    xs = rng.uniform(-50, 50, n)
    ys = rng.uniform(-50, 50, n)
    eps = 4.0
    got = _run(ids, xs, ys, eps)
    want = _brute_clusters(list(ids), xs, ys, eps)
    assert got == want
    # negative coords + clusters of size > 2 actually occurred
    sizes = pd.Series(list(want.values())).value_counts()
    assert (sizes > 2).any()
