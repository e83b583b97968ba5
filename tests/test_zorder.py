"""morton2d vs a per-bit reference; zorder_layout sortedness + locality."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rayspatial.ops.zorder import morton2d, zorder_layout


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton2d_matches_reference():
    rng = np.random.default_rng(5)
    for bits in (1, 8, 16, 31):
        n = 500
        qx = rng.integers(0, 1 << bits, n)
        qy = rng.integers(0, 1 << bits, n)
        got = morton2d(qx, qy, bits=bits)
        want = np.array([_morton_ref(int(a), int(b), bits)
                         for a, b in zip(qx, qy)], np.int64)
        assert np.array_equal(got, want), bits


def test_morton2d_bounds():
    with pytest.raises(ValueError):
        morton2d(np.array([1 << 16]), np.array([0]), bits=16)
    with pytest.raises(ValueError):
        morton2d(np.array([0]), np.array([0]), bits=0)
    # corner values
    full = (1 << 16) - 1
    assert morton2d(np.array([full]), np.array([full]), 16)[0] == (1 << 32) - 1
    assert morton2d(np.array([0]), np.array([0]), 16)[0] == 0


def test_zorder_layout_sorted_and_local(ray_session):
    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({
        "qx": rng.integers(0, 1 << 16, n).astype(np.int64),
        "qy": rng.integers(0, 1 << 16, n).astype(np.int64),
    })
    out = zorder_layout(rd.from_pandas(df).repartition(8), "qx", "qy"
                        ).to_pandas()
    z = out["zkey"].to_numpy()
    assert len(out) == n
    assert (np.diff(z) >= 0).all()                    # globally sorted
    assert np.array_equal(np.sort(z),
                          np.sort(morton2d(df.qx, df.qy)))  # same multiset
    # locality: mean successive Chebyshev distance under z-order is far
    # below the random-order expectation (~1/3 of the 65536 range)
    cheb = np.maximum(np.abs(np.diff(out["qx"].to_numpy())),
                      np.abs(np.diff(out["qy"].to_numpy())))
    assert cheb.mean() < 65536 / 6
