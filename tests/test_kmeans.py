"""Distributed Lloyd k-means (textops/kmeans.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayspatial.textops.kmeans import _Q, _normalize, kmeans_labels


def _serial(ids, mat, k, iters):
    """Same formulas, serial: seeds = k lowest ids; cosine argmax;
    micro-quantized integer M-step."""
    order = np.argsort(ids, kind="stable")[:k]
    c = _normalize(mat[np.sort(order)])
    m = _normalize(mat)
    for _ in range(iters):
        assign = np.argmax(m @ c.T, axis=1)
        q = np.round(m * _Q).astype(np.int64)
        new = c.copy()
        for j in range(k):
            sel = assign == j
            if sel.any():
                new[j] = (q[sel].sum(axis=0).astype(np.float64)
                          / (_Q * sel.sum()))
        c = _normalize(new)
    return np.argmax(m @ c.T, axis=1), c


def _make(n=400, d=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (4, d))
    mat = (centers[rng.integers(0, 4, n)]
           + rng.normal(0, 0.15, (n, d))).astype(np.float64)
    ids = rng.permutation(10 * n)[:n].astype(np.int64)
    return ids, mat


@pytest.mark.usefixtures("ray_session")
def test_matches_serial_reference_any_partitioning():
    import ray.data as rd

    ids, mat = _make()
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(mat.astype(np.float32))),
    })
    want_assign, want_c = _serial(
        ids, mat.astype(np.float32).astype(np.float64), 4, 3)
    for parts in (2, 7):
        ds = rd.from_arrow(t).repartition(parts)
        out, c = kmeans_labels(ds, k=4, iterations=3)
        got = out.to_pandas().set_index("vec_id")["cluster"]
        assert (got.loc[ids].to_numpy() == want_assign).all()
        assert np.allclose(c, want_c, atol=0, rtol=0)
    # clusters actually separate the 4 generators
    assert len(np.unique(want_assign)) == 4
