"""Testing helpers (reference pygeos/testing.py:20-77).

``assert_geometries_equal`` is the reference's array-level test oracle:
equal shape, element-wise structural equality within ``tolerance``,
missing==missing allowed (``equal_none``), optional normalization
before comparing.
"""

from __future__ import annotations

import numpy as np

from rayspatial.geom.array import GeomArray

__all__ = ["assert_geometries_equal"]


def assert_geometries_equal(x: GeomArray, y: GeomArray,
                            tolerance: float = 1e-7,
                            equal_none: bool = True,
                            normalize: bool = False,
                            err_msg: str = "") -> None:
    """Raise AssertionError unless the two arrays are element-wise
    structurally equal within ``tolerance`` (reference
    testing.py:20-77; missing elements compare equal when
    ``equal_none``)."""
    from rayspatial.geom.predicates import equals_exact

    if len(x) != len(y):
        raise AssertionError(
            f"shape mismatch: {len(x)} vs {len(y)}. {err_msg}"
        )
    if normalize:
        from rayspatial.geom.constructive import normalize as _norm

        x = _norm(x)
        y = _norm(y)
    mx = x.is_missing()
    my = y.is_missing()
    both_missing = mx & my
    if not equal_none and both_missing.any():
        raise AssertionError(f"None elements present. {err_msg}")
    eq = equals_exact(x, y, tolerance=tolerance) | both_missing
    if not eq.all():
        bad = np.flatnonzero(~eq)
        raise AssertionError(
            f"geometries differ at rows {bad[:10].tolist()}"
            f"{'...' if len(bad) > 10 else ''}. {err_msg}"
        )
