"""Integer fixed-point PageRank (ops/pagerank.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rayspatial.ops.pagerank import SCALE, pagerank


def _reference(edges, n, iters):
    """Serial numpy replica of the integer recurrence."""
    base = (15 * SCALE) // (100 * n)
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, SCALE // n, dtype=np.int64)
    for _ in range(iters):
        c = np.zeros(n, dtype=np.int64)
        for s, d in edges:
            c[d] += r[s] // deg[s]
        r = base + (85 * c) // 100
    return r


@pytest.mark.usefixtures("ray_session")
def test_matches_serial_reference_with_sinks_and_multiedges():
    import ray.data as rd

    # node 3 has no in-links; node 0 has a self-loop and a multi-edge
    edges = [(0, 1), (0, 1), (0, 0), (1, 2), (2, 0), (3, 0), (3, 2)]
    n = 4
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], type=pa.int64()),
        "dst": pa.array([e[1] for e in edges], type=pa.int64()),
    })).repartition(3)
    out = pagerank(ds, n, iterations=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    want = _reference(edges, n, 4)
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["rank_scaled"].tolist() == want.tolist()
    # in-link-free node ends at exactly base
    assert out["rank_scaled"].iloc[3] == (15 * SCALE) // (100 * n)


@pytest.mark.usefixtures("ray_session")
def test_uniform_cycle_stays_uniform():
    import ray.data as rd

    n = 6
    ds = rd.from_arrow(pa.table({
        "src": pa.array(np.arange(n, dtype=np.int64)),
        "dst": pa.array((np.arange(n, dtype=np.int64) + 1) % n),
    }))
    out = pagerank(ds, n, iterations=3).to_pandas()
    assert out["rank_scaled"].nunique() == 1


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_resume_matches_direct_run(tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 60
    src = np.repeat(np.arange(n, dtype=np.int64), 2)
    dst = rng.integers(0, n, 2 * n)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)})).repartition(3)
    direct = pagerank(ds, n, iterations=6).to_pandas() \
        .sort_values("node").reset_index(drop=True)

    ck = str(tmp_path / "pr")
    # first run stops at iteration 3 and checkpoints it
    pagerank(ds, n, iterations=3, checkpoint_dir=ck,
             checkpoint_every=3).to_pandas()
    import os
    assert any("pr-it3" in f for f in os.listdir(ck))
    # second run asks for 6: must resume from it3 and land exactly on
    # the direct 6-iteration result
    resumed = pagerank(ds, n, iterations=6, checkpoint_dir=ck,
                       checkpoint_every=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert resumed["rank_scaled"].tolist() == \
        direct["rank_scaled"].tolist()
    # changed edges -> fingerprint mismatch -> checkpoint ignored
    ds2 = rd.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array((dst + 1) % n)}))
    fresh = pagerank(ds2, n, iterations=3, checkpoint_dir=ck,
                     checkpoint_every=99).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    direct2 = pagerank(ds2, n, iterations=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert fresh["rank_scaled"].tolist() == \
        direct2["rank_scaled"].tolist()
