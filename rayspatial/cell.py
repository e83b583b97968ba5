"""Hierarchical cell index (H3/S2-style) in batched numpy.

A deterministic, documented quad-cell scheme over the lon/lat plane:
at resolution ``r`` (0..26) the world ``lon in [-180, 180] x lat in
[-90, 90]`` is a ``2^r x 2^r`` grid; a cell id packs the resolution and
the Morton (Z-order) interleave of the integer cell coordinates into one
int64::

    id = (r << 52) | interleave_bits(cx, cy)      # cx fills even bits

Morton interleave keeps spatially-near cells numerically near, so
range-partitioning on the id approximates a space-filling-curve
partitioning (the property H3/S2 ids are used for in shuffles).

This has no pygeos equivalent — it is one of the new-engine operators
mandated by BASELINE.json (north_star): ``cell_encode``, ``cell_parent``,
``cell_children``, ``cell_ring`` / ``cell_disk`` (kNN ring expansion),
``cell_bounds`` (tile materialization).

All functions are vectorized numpy; none touch Ray.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Classic Morton bit spreading: insert a 0 bit between each bit."""
    v = v.astype(np.uint64) & np.uint64(0x00000000FFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: take every even bit and pack."""
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def cell_xy(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer cell coordinates (cx, cy) at resolution ``res``.

    cx = min(floor((lon + 180) / 360 * 2^res), 2^res - 1), same for lat —
    the identical IEEE expression order is used by the DuckDB oracle SQL,
    so assignments match bit-for-bit.
    """
    n = np.int64(1) << np.int64(res)
    cx = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(n))
    cy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * float(n))
    cx = np.clip(cx, 0, float(n - 1)).astype(np.int64)
    cy = np.clip(cy, 0, float(n - 1)).astype(np.int64)
    return cx, cy


def cell_encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """lon/lat -> int64 cell id at resolution ``res`` (vectorized)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}], got {res}")
    cx, cy = cell_xy(lon, lat, res)
    return encode_xy(cx, cy, res)


def encode_xy(cx: np.ndarray, cy: np.ndarray, res: int) -> np.ndarray:
    morton = _part1by1(np.asarray(cx)) | (_part1by1(np.asarray(cy)) << np.uint64(1))
    return (morton | (np.uint64(res) << np.uint64(52))).astype(np.int64)


def cell_res(cell: np.ndarray) -> np.ndarray:
    """Resolution of each cell id."""
    return (np.asarray(cell).astype(np.uint64) >> np.uint64(52)).astype(np.int64)


def decode_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (cx, cy, res)."""
    c = np.asarray(cell).astype(np.uint64)
    res = (c >> np.uint64(52)).astype(np.int64)
    morton = c & ((np.uint64(1) << np.uint64(52)) - np.uint64(1))
    cx = _compact1by1(morton).astype(np.int64)
    cy = _compact1by1(morton >> np.uint64(1)).astype(np.int64)
    return cx, cy, res


def cell_parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Parent cell ``steps`` resolutions up (vectorized)."""
    cx, cy, res = decode_xy(cell)
    new_res = res - steps
    if np.any(new_res < 0):
        raise ValueError("cell_parent: resolution underflow")
    # dropping 2*steps low Morton bits == halving cx,cy steps times
    return encode_xy_vecres(cx >> steps, cy >> steps, new_res)


def encode_xy_vecres(cx: np.ndarray, cy: np.ndarray, res: np.ndarray) -> np.ndarray:
    morton = _part1by1(np.asarray(cx)) | (_part1by1(np.asarray(cy)) << np.uint64(1))
    return (morton | (np.asarray(res).astype(np.uint64) << np.uint64(52))).astype(np.int64)


def cell_children(cell: int) -> np.ndarray:
    """The 4 child cells one resolution down (scalar -> 4 ids)."""
    cx, cy, res = decode_xy(np.asarray([cell]))
    cx, cy, res = int(cx[0]), int(cy[0]), int(res[0])
    if res >= MAX_RES:
        raise ValueError("cell_children: resolution overflow")
    xs = np.asarray([2 * cx, 2 * cx + 1, 2 * cx, 2 * cx + 1], dtype=np.int64)
    ys = np.asarray([2 * cy, 2 * cy, 2 * cy + 1, 2 * cy + 1], dtype=np.int64)
    return encode_xy(xs, ys, res + 1)


def cell_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell`` (the k-disk),
    clipped to the grid. Scalar in, 1-D ids out. Used for kNN expansion."""
    cx, cy, res = decode_xy(np.asarray([cell]))
    cx, cy, res = int(cx[0]), int(cy[0]), int(res[0])
    n = 1 << res
    xs = np.arange(max(0, cx - k), min(n, cx + k + 1), dtype=np.int64)
    ys = np.arange(max(0, cy - k), min(n, cy + k + 1), dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return encode_xy(gx.ravel(), gy.ravel(), res)


def cell_ring(cell: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance k (the hollow ring), clipped."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    cx, cy, res = decode_xy(np.asarray([cell]))
    cx, cy, res = int(cx[0]), int(cy[0]), int(res[0])
    n = 1 << res
    out_x, out_y = [], []
    for x in range(cx - k, cx + k + 1):
        for y in (cy - k, cy + k):
            if 0 <= x < n and 0 <= y < n:
                out_x.append(x)
                out_y.append(y)
    for y in range(cy - k + 1, cy + k):
        for x in (cx - k, cx + k):
            if 0 <= x < n and 0 <= y < n:
                out_x.append(x)
                out_y.append(y)
    return encode_xy(np.asarray(out_x, dtype=np.int64), np.asarray(out_y, dtype=np.int64), res)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(xmin, ymin, xmax, ymax) of each cell in lon/lat degrees."""
    cx, cy, res = decode_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    w = 360.0 / n
    h = 180.0 / n
    xmin = cx.astype(np.float64) * w - 180.0
    ymin = cy.astype(np.float64) * h - 90.0
    return xmin, ymin, xmin + w, ymin + h


def cells_covering_box(
    xmin: float, ymin: float, xmax: float, ymax: float, res: int
) -> np.ndarray:
    """All cells at ``res`` whose area intersects the closed box.

    Used to replicate polygons into every cell partition their envelope
    touches (join partitioning; see SURVEY.md §3.2 engine trace)."""
    n = 1 << res
    cx0 = int(min(max(np.floor((xmin + 180.0) / 360.0 * n), 0), n - 1))
    cx1 = int(min(max(np.floor((xmax + 180.0) / 360.0 * n), 0), n - 1))
    cy0 = int(min(max(np.floor((ymin + 90.0) / 180.0 * n), 0), n - 1))
    cy1 = int(min(max(np.floor((ymax + 90.0) / 180.0 * n), 0), n - 1))
    xs = np.arange(cx0, cx1 + 1, dtype=np.int64)
    ys = np.arange(cy0, cy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return encode_xy(gx.ravel(), gy.ravel(), res)


def cell_compact(cells: np.ndarray) -> np.ndarray:
    """H3-style covering compression: recursively replace every
    COMPLETE sibling quartet with its parent (mixed input resolutions
    allowed; duplicates collapse).  The result covers exactly the same
    area with the minimum number of quad cells.  Vectorized per
    resolution level — no Python loop over cells."""
    cells = np.unique(np.asarray(cells, dtype=np.int64))
    if not len(cells):
        return cells
    res = cell_res(cells)
    by_res: dict[int, np.ndarray] = {
        int(r): cells[res == r] for r in np.unique(res)}
    out: list[np.ndarray] = []
    for r in range(max(by_res), 0, -1):
        cur = np.unique(by_res.get(r, np.empty(0, np.int64)))
        if not len(cur):
            continue
        parents = cell_parent(cur)
        ps, idx, counts = np.unique(parents, return_inverse=True,
                                    return_counts=True)
        promote = counts == 4  # all four siblings present
        out.append(cur[~promote[idx]])
        if promote.any():
            lower = by_res.get(r - 1, np.empty(0, np.int64))
            by_res[r - 1] = np.concatenate([lower, ps[promote]])
    out.append(np.unique(by_res.get(0, np.empty(0, np.int64))))
    return np.sort(np.concatenate(out))


def cell_uncompact(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand every cell to ALL its descendants at resolution ``res``
    (inverse of cell_compact for a uniform target level).  Morton
    ordering makes each cell's descendants one contiguous id range —
    ``4**(res - r)`` ids generated by a vectorized ragged arange."""
    cells = np.asarray(cells, dtype=np.int64)
    if not len(cells):
        return cells.copy()
    c = cells.astype(np.uint64)
    r = (c >> np.uint64(52)).astype(np.int64)
    if np.any(r > res):
        raise ValueError("cell_uncompact: a cell is finer than res")
    morton = c & ((np.uint64(1) << np.uint64(52)) - np.uint64(1))
    d = (res - r).astype(np.uint64)
    base = (morton << (np.uint64(2) * d)).astype(np.int64)
    lens = (np.int64(1) << (2 * (res - r))).astype(np.int64)
    offs = np.repeat(np.cumsum(lens) - lens, lens)
    seq = np.arange(int(lens.sum()), dtype=np.int64) - offs
    ids = np.repeat(base, lens) + seq
    return np.unique(
        (ids.astype(np.uint64)
         | (np.uint64(res) << np.uint64(52))).astype(np.int64))
