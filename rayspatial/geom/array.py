"""GeomArray — the engine's parsed, flat columnar geometry layout.

The reference's only intermediate representation is the flattened
coordinate buffer + implicit offsets that ``get_coordinates`` /
``set_coordinates`` expose (reference pygeos/coordinates.py:92-169,
src/coords.c:26-330).  GeomArray is that layout made explicit and
columnar, in the spirit of GeoArrow:

- ``types``   : int8[n]  — pygeos GeometryType id per geometry
  (POINT=0 .. GEOMETRYCOLLECTION=7, reference pygeos/geometry.py:38-49),
  ``-1`` for missing (None / Arrow null).
- parts       : every geometry decomposes into *parts* — a part is a
  point run, a linestring run, or a polygon ring run of coordinates:
    ``part_geom`` int64[p] — owning geometry row
    ``part_kind`` int8[p]  — 0=point, 1=line, 2=shell ring, 3=hole ring
    ``part_sub``  int64[p] — polygon counter (global) for rings, so the
                             holes of a shell can be matched; for
                             point/line parts, a global part counter
    ``part_off``  int64[p+1] — coordinate offsets (part i owns
                             ``coords[part_off[i]:part_off[i+1]]``)
- ``coords``  : float64[nc, 2] — x, y
- ``z``       : float64[nc] or None (NaN where absent)
- ``has_z``   : bool[n]

Empty geometries contribute zero parts (POINT EMPTY, LINESTRING EMPTY,
POLYGON EMPTY, empty collections), mirroring how the reference skips
them at STRtree insert (src/strtree.c:182-199).  Missing geometries
also contribute zero parts; ``types`` distinguishes the two.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# pygeos GeometryType ids (reference pygeos/geometry.py:38-49)
MISSING = -1
POINT = 0
LINESTRING = 1
LINEARRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

# part kinds
PK_POINT = 0
PK_LINE = 1
PK_SHELL = 2
PK_HOLE = 3

_EMPTY_F64_2 = np.empty((0, 2), dtype=np.float64)
_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_I8 = np.empty(0, dtype=np.int8)


@dataclass
class GeomArray:
    types: np.ndarray  # int8[n]
    part_geom: np.ndarray  # int64[p]
    part_kind: np.ndarray  # int8[p]
    part_sub: np.ndarray  # int64[p]
    part_off: np.ndarray  # int64[p+1]
    coords: np.ndarray  # float64[nc, 2]
    z: np.ndarray | None = None  # float64[nc]
    has_z: np.ndarray | None = None  # bool[n]
    # number of *immediate* children for multi/collection types, used by
    # get_num_geometries; simple types count as 1 (0 when empty/missing)
    num_children: np.ndarray | None = None  # int64[n]

    def __post_init__(self) -> None:
        if self.has_z is None:
            self.has_z = np.zeros(len(self.types), dtype=bool)

    def __len__(self) -> int:
        return len(self.types)

    @property
    def n_parts(self) -> int:
        return len(self.part_geom)

    def part_coords(self, i: int) -> np.ndarray:
        return self.coords[self.part_off[i] : self.part_off[i + 1]]

    def coord_counts(self) -> np.ndarray:
        """Coordinates per geometry (pygeos get_num_coordinates;
        reference pygeos/geometry.py:150-176; missing -> 0)."""
        out = np.zeros(len(self), dtype=np.int64)
        if self.n_parts:
            sizes = np.diff(self.part_off)
            np.add.at(out, self.part_geom, sizes)
        return out

    def is_missing(self) -> np.ndarray:
        return self.types == MISSING

    def is_empty(self) -> np.ndarray:
        """True for non-missing geometries with zero coordinates
        (reference pygeos/predicates.py:135-162: missing -> False)."""
        return (self.types != MISSING) & (self.coord_counts() == 0)

    def bounds(self) -> np.ndarray:
        """(n, 4) [xmin, ymin, xmax, ymax]; NaN rows for missing/empty
        (reference lib.bounds, src/ufuncs.c:2515-2607)."""
        n = len(self)
        out = np.full((n, 4), np.nan)
        if not self.n_parts:
            return out
        counts = self.coord_counts()
        nz = counts > 0
        if not nz.any():
            return out
        # geometry id per coordinate
        sizes = np.diff(self.part_off)
        cgeom = np.repeat(self.part_geom, sizes)
        order = np.argsort(cgeom, kind="stable")
        cg = cgeom[order]
        cx = self.coords[order, 0]
        cy = self.coords[order, 1]
        # reduceat over runs of equal geometry id
        starts = np.flatnonzero(np.r_[True, cg[1:] != cg[:-1]])
        gids = cg[starts]
        out[gids, 0] = np.minimum.reduceat(cx, starts)
        out[gids, 1] = np.minimum.reduceat(cy, starts)
        out[gids, 2] = np.maximum.reduceat(cx, starts)
        out[gids, 3] = np.maximum.reduceat(cy, starts)
        return out


@dataclass
class _Builder:
    """Accumulates parts while parsing / constructing geometries."""

    types: list = field(default_factory=list)
    part_geom: list = field(default_factory=list)
    part_kind: list = field(default_factory=list)
    part_sub: list = field(default_factory=list)
    part_len: list = field(default_factory=list)
    chunks: list = field(default_factory=list)  # list of (k, 2) float64
    zchunks: list = field(default_factory=list)  # list of (k,) float64
    has_z: list = field(default_factory=list)
    num_children: list = field(default_factory=list)
    poly_counter: int = 0
    sub_counter: int = 0

    def add_part(self, geom_idx: int, kind: int, sub: int, xy: np.ndarray, z=None) -> None:
        self.part_geom.append(geom_idx)
        self.part_kind.append(kind)
        self.part_sub.append(sub)
        self.part_len.append(len(xy))
        self.chunks.append(xy)
        if z is None:
            z = np.full(len(xy), np.nan)
        self.zchunks.append(z)

    def finish(self) -> GeomArray:
        n_parts = len(self.part_geom)
        part_off = np.zeros(n_parts + 1, dtype=np.int64)
        if n_parts:
            np.cumsum(self.part_len, out=part_off[1:])
        coords = np.concatenate(self.chunks, axis=0) if self.chunks else _EMPTY_F64_2
        z = np.concatenate(self.zchunks) if self.zchunks else np.empty(0)
        if not np.isnan(z).all():
            zout = z
        else:
            zout = None
        return GeomArray(
            types=np.asarray(self.types, dtype=np.int8),
            part_geom=np.asarray(self.part_geom, dtype=np.int64),
            part_kind=np.asarray(self.part_kind, dtype=np.int8),
            part_sub=np.asarray(self.part_sub, dtype=np.int64),
            part_off=part_off,
            coords=coords,
            z=zout,
            has_z=np.asarray(self.has_z, dtype=bool),
            num_children=np.asarray(self.num_children, dtype=np.int64),
        )


# reference geometry.py:38-49 — the GEOS geometry-type enumeration
# (values match the integer type ids used throughout this engine)
import enum as _enum


class GeometryType(_enum.IntEnum):
    """The enumeration of GEOS geometry types."""

    MISSING = -1
    POINT = 0
    LINESTRING = 1
    LINEARRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7
