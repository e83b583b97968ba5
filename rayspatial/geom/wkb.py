"""WKB parser / writer in numpy (no GEOS).

Parity target: reference ``pygeos/io.py`` ``from_wkb`` (io.py:389-425,
src/ufuncs.c:2612-2700) and ``to_wkb`` (io.py:185-245).  Reproduced
semantics:

- hex auto-detect on parse (reference src/ufuncs.c:2668-2673);
- ``on_invalid`` policy ``raise | warn | ignore`` — invalid input maps
  to missing (None/null) under warn/ignore (src/ufuncs.c:2681-2691);
- missing in -> missing out; empty geometries are real geometries;
- POINT EMPTY serializes as NaN coordinates (GEOS >= 3.10 convention,
  reference CHANGELOG 0.10 notes / pygeos/creation.py:34-77).

Engine canonical WKB (frozen, see SURVEY.md §7.2 phase-1 risk note):
little-endian, ISO type codes (Z adds +1000), 2-D unless the geometry
has Z.  Both little/big endian and ISO / OGC-extended (0x80000000 Z
flag) inputs are accepted.
"""

from __future__ import annotations

import struct
import warnings

import numpy as np

from rayspatial.geom.array import (
    GEOMETRYCOLLECTION,
    LINEARRING,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    PK_HOLE,
    PK_LINE,
    PK_POINT,
    PK_SHELL,
    POINT,
    POLYGON,
    GeomArray,
    _Builder,
)

__all__ = ["parse_wkb", "from_wkb", "to_wkb", "point_wkb", "GeomArray"]

_HEX_CHARS = frozenset(b"0123456789abcdefABCDEF")


class WKBError(ValueError):
    pass


def _read_uint32(buf: bytes, pos: int, le: bool) -> int:
    return struct.unpack_from("<I" if le else ">I", buf, pos)[0]


def _read_coords(buf: bytes, pos: int, count: int, dim: int, le: bool):
    nbytes = count * dim * 8
    if pos + nbytes > len(buf):
        raise WKBError("truncated coordinate block")
    arr = np.frombuffer(buf, dtype="<f8" if le else ">f8", count=count * dim, offset=pos)
    arr = arr.astype(np.float64, copy=False).reshape(count, dim)
    xy = np.ascontiguousarray(arr[:, :2])
    z = np.ascontiguousarray(arr[:, 2]) if dim >= 3 else None
    return xy, z, pos + nbytes


def _parse_header(buf: bytes, pos: int):
    if pos >= len(buf):
        raise WKBError("truncated header")
    bo = buf[pos]
    if bo not in (0, 1):
        raise WKBError(f"bad byte order {bo}")
    le = bo == 1
    raw = _read_uint32(buf, pos + 1, le)
    pos += 5
    has_z = False
    has_m = False
    if raw & 0x80000000:  # OGC extended Z flag
        has_z = True
        raw &= ~0x80000000
    if raw & 0x40000000:  # extended M flag
        has_m = True
        raw &= ~0x40000000
    if raw & 0x20000000:  # EWKB SRID flag
        raw &= ~0x20000000
        pos += 4  # skip srid
    iso = raw // 1000  # ISO: 1xxx = Z, 2xxx = M, 3xxx = ZM
    if iso in (1, 3):
        has_z = True
    if iso in (2, 3):
        has_m = True
    wkb_typ = raw % 1000
    if not 1 <= wkb_typ <= 7:
        raise WKBError(f"unsupported geometry type {raw}")
    # WKB code -> pygeos GeometryType id: 1->POINT(0), 2->LINESTRING(1),
    # 3->POLYGON(3), 4..7 identical (LINEARRING(2) has no WKB code)
    typ = {1: POINT, 2: LINESTRING, 3: POLYGON}.get(wkb_typ, wkb_typ)
    dim = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    return typ, has_z, has_m, dim, le, pos


def _parse_geom(buf: bytes, pos: int, b: _Builder, geom_idx: int, top: bool):
    """Recursive WKB body parse; appends parts to the builder.

    Returns (pos, type_id, has_z, n_children)."""
    typ, has_z, has_m, dim, le, pos = _parse_header(buf, pos)
    zslice = slice(2, 3) if has_z else None
    if typ == POINT:
        xy, z, pos = _read_coords(buf, pos, 1, dim, le)
        if has_m and not has_z:
            z = None
        if np.isnan(xy).all():  # POINT EMPTY
            return pos, POINT, has_z, 0
        b.add_part(geom_idx, PK_POINT, b.sub_counter, xy, z)
        b.sub_counter += 1
        return pos, POINT, has_z, 1
    if typ in (LINESTRING, LINEARRING):
        npts = _read_uint32(buf, pos, le)
        pos += 4
        xy, z, pos = _read_coords(buf, pos, npts, dim, le)
        if has_m and not has_z:
            z = None
        if npts:
            b.add_part(geom_idx, PK_LINE, b.sub_counter, xy, z)
            b.sub_counter += 1
        return pos, typ, has_z, 1 if npts else 0
    if typ == POLYGON:
        nrings = _read_uint32(buf, pos, le)
        pos += 4
        poly_id = b.poly_counter
        any_ring = False
        for r in range(nrings):
            npts = _read_uint32(buf, pos, le)
            pos += 4
            xy, z, pos = _read_coords(buf, pos, npts, dim, le)
            if has_m and not has_z:
                z = None
            if npts:
                b.add_part(geom_idx, PK_SHELL if not any_ring else PK_HOLE, poly_id, xy, z)
                any_ring = True
        if any_ring:
            b.poly_counter += 1
        return pos, POLYGON, has_z, 1 if any_ring else 0
    # multi* / collection
    nparts = _read_uint32(buf, pos, le)
    pos += 4
    kept = 0
    any_z = has_z
    for _ in range(nparts):
        pos, ctyp, cz, nchild = _parse_geom(buf, pos, b, geom_idx, top=False)
        any_z = any_z or cz
        kept += 1
    return pos, typ, any_z, nparts


def _parse_wkb_arrow_fast(arr) -> GeomArray | None:
    """Vectorized parse of an Arrow binary array when EVERY value is a
    little-endian 2-D WKB POINT (21 bytes: 0x01, type 1, x, y) — the
    billion-row hot case of a points column mapped through a WKB
    wrapper (round-3 verdict watch item: the list materialization +
    per-geometry Python parse was the scale hazard).  Returns None when
    the fast shape doesn't hold (nulls, mixed types, hex) and the
    caller falls back to the general parser."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count or not len(arr):
        return None
    if pa.types.is_large_binary(arr.type):
        off_dt = np.int64
    elif pa.types.is_binary(arr.type):
        off_dt = np.int32
    else:
        return None
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dt,
                            count=len(arr) + 1, offset=arr.offset *
                            np.dtype(off_dt).itemsize)
    lens = np.diff(offsets)
    if not (lens == 21).all():
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    start = int(offsets[0])
    if not (offsets[1:] - offsets[:-1] == 21).all():
        return None
    rows = data[start:start + 21 * len(arr)].reshape(len(arr), 21)
    # byte order 1 (LE) and geometry type 1 (POINT, no Z/M/SRID flags)
    if not (rows[:, 0] == 1).all():
        return None
    if not ((rows[:, 1] == 1) & (rows[:, 2] == 0) & (rows[:, 3] == 0)
            & (rows[:, 4] == 0)).all():
        return None
    xy = np.ascontiguousarray(rows[:, 5:21]).view("<f8").reshape(-1, 2)
    from rayspatial.geom.creation import points

    return points(xy.astype(np.float64))


def parse_wkb(values, on_invalid: str = "raise") -> GeomArray:
    """Parse a sequence of WKB ``bytes`` / hex ``str`` / ``None`` into a
    GeomArray.  ``on_invalid`` in {"raise", "warn", "ignore"} mirrors
    reference pygeos/io.py:389-425.

    Accepts a pyarrow binary (Chunked)Array directly: an all-2D-point
    column parses fully vectorized (no per-row Python); anything else
    falls back to the general per-geometry parser without the caller
    materializing a Python list."""
    if on_invalid not in ("raise", "warn", "ignore"):
        raise ValueError("on_invalid only accepts scalar values 'raise', 'warn' or 'ignore'")
    try:
        import pyarrow as pa

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            fast = _parse_wkb_arrow_fast(values)
            if fast is not None:
                return fast
            values = values.to_pylist()
    except ImportError:
        pass
    b = _Builder()
    for i, v in enumerate(values):
        if v is None:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
            continue
        if isinstance(v, str):
            v = v.encode("ascii")
        if isinstance(v, (bytes, bytearray, memoryview)):
            v = bytes(v)
            # hex auto-detect (reference src/ufuncs.c:2668-2673)
            if len(v) >= 2 and v[0] in b"0" and all(c in _HEX_CHARS for c in v[:16]):
                try:
                    v = bytes.fromhex(v.decode("ascii"))
                except ValueError:
                    pass
        else:
            raise TypeError(f"expected bytes/str/None, got {type(v)}")
        try:
            pos, typ, has_z, nchild = _parse_geom(v, 0, b, i, top=True)
            if pos > len(v):
                raise WKBError("truncated WKB")
            b.types.append(typ)
            b.has_z.append(has_z)
            b.num_children.append(nchild if typ >= MULTIPOINT else min(nchild, 1))
        except (WKBError, struct.error, IndexError) as exc:
            if on_invalid == "raise":
                raise WKBError(f"invalid WKB at index {i}: {exc}") from exc
            if on_invalid == "warn":
                warnings.warn(f"invalid WKB at index {i}: {exc}", stacklevel=2)
            # drop any partial parts added for this geometry
            while b.part_geom and b.part_geom[-1] == i:
                for lst in (b.part_geom, b.part_kind, b.part_sub, b.part_len):
                    lst.pop()
                b.chunks.pop()
                b.zchunks.pop()
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
    return b.finish()


# alias matching the reference public name
from_wkb = parse_wkb


# ---------------------------------------------------------------------------
# writers


def _w_coords(parts: list, xy: np.ndarray, z: np.ndarray | None) -> None:
    if z is None:
        parts.append(np.ascontiguousarray(xy, dtype="<f8").tobytes())
    else:
        buf = np.empty((len(xy), 3), dtype="<f8")
        buf[:, :2] = xy
        buf[:, 2] = z
        parts.append(buf.tobytes())


def _type_code(typ: int, has_z: bool) -> int:
    wkb_typ = {POINT: 1, LINESTRING: 2, LINEARRING: 2, POLYGON: 3}.get(typ, typ)
    return wkb_typ + (1000 if has_z else 0)


def _write_geom(ga: GeomArray, i: int, parts_by_geom: dict, out: list) -> None:
    typ = int(ga.types[i])
    has_z = bool(ga.has_z[i]) if ga.has_z is not None else False
    gparts = parts_by_geom.get(i, [])
    zv = ga.z

    def coords_of(p):
        s, e = ga.part_off[p], ga.part_off[p + 1]
        xy = ga.coords[s:e]
        z = zv[s:e] if (has_z and zv is not None) else None
        return xy, z

    hdr = struct.pack("<BI", 1, _type_code(typ, has_z))
    if typ == POINT:
        out.append(hdr)
        if gparts:
            xy, z = coords_of(gparts[0])
            _w_coords(out, xy, z)
        else:  # POINT EMPTY -> NaN coords
            out.append(struct.pack("<dd", float("nan"), float("nan")))
            if has_z:
                out.append(struct.pack("<d", float("nan")))
        return
    if typ in (LINESTRING, LINEARRING):
        out.append(hdr)
        if gparts:
            xy, z = coords_of(gparts[0])
            out.append(struct.pack("<I", len(xy)))
            _w_coords(out, xy, z)
        else:
            out.append(struct.pack("<I", 0))
        return
    if typ == POLYGON:
        out.append(hdr)
        out.append(struct.pack("<I", len(gparts)))
        for p in gparts:
            xy, z = coords_of(p)
            out.append(struct.pack("<I", len(xy)))
            _w_coords(out, xy, z)
        return
    # multi*: group parts into children
    if typ == MULTIPOINT:
        out.append(hdr)
        out.append(struct.pack("<I", len(gparts)))
        for p in gparts:
            xy, z = coords_of(p)
            out.append(struct.pack("<BI", 1, _type_code(POINT, has_z)))
            _w_coords(out, xy, z)
        return
    if typ == MULTILINESTRING:
        out.append(hdr)
        out.append(struct.pack("<I", len(gparts)))
        for p in gparts:
            xy, z = coords_of(p)
            out.append(struct.pack("<BI", 1, _type_code(LINESTRING, has_z)))
            out.append(struct.pack("<I", len(xy)))
            _w_coords(out, xy, z)
        return
    if typ == MULTIPOLYGON:
        out.append(hdr)
        # group rings by part_sub (polygon id)
        polys: dict[int, list] = {}
        for p in gparts:
            polys.setdefault(int(ga.part_sub[p]), []).append(p)
        out.append(struct.pack("<I", len(polys)))
        for _, rings in sorted(polys.items()):
            out.append(struct.pack("<BI", 1, _type_code(POLYGON, has_z)))
            out.append(struct.pack("<I", len(rings)))
            for p in rings:
                xy, z = coords_of(p)
                out.append(struct.pack("<I", len(xy)))
                _w_coords(out, xy, z)
        return
    if typ == GEOMETRYCOLLECTION:
        out.append(hdr)
        # children: points and lines are single parts; consecutive rings
        # sharing part_sub form polygons.  Nested multis inside a parsed GC
        # are flattened to their simple members (documented limitation).
        children: list[tuple[int, list]] = []
        k = 0
        while k < len(gparts):
            p = gparts[k]
            kind = int(ga.part_kind[p])
            if kind == PK_POINT:
                children.append((POINT, [p]))
                k += 1
            elif kind == PK_LINE:
                children.append((LINESTRING, [p]))
                k += 1
            else:
                sub = int(ga.part_sub[p])
                rings = [p]
                k += 1
                while k < len(gparts) and int(ga.part_kind[gparts[k]]) == PK_HOLE and int(
                    ga.part_sub[gparts[k]]
                ) == sub:
                    rings.append(gparts[k])
                    k += 1
                children.append((POLYGON, rings))
        out.append(struct.pack("<I", len(children)))
        for ctyp, plist in children:
            out.append(struct.pack("<BI", 1, _type_code(ctyp, has_z)))
            if ctyp == POINT:
                xy, z = coords_of(plist[0])
                _w_coords(out, xy, z)
            elif ctyp == LINESTRING:
                xy, z = coords_of(plist[0])
                out.append(struct.pack("<I", len(xy)))
                _w_coords(out, xy, z)
            else:
                out.append(struct.pack("<I", len(plist)))
                for p in plist:
                    xy, z = coords_of(p)
                    out.append(struct.pack("<I", len(xy)))
                    _w_coords(out, xy, z)
        return
    raise ValueError(f"cannot write geometry type {typ}")


def to_wkb(ga: GeomArray, hex: bool = False, output_dimension: int = 3,
           byte_order: int = -1,
           include_srid: bool = False) -> list[bytes | str | None]:
    """GeomArray -> list of canonical WKB (None for missing).

    Mirrors reference ``to_wkb`` (pygeos/io.py:185-245) with the
    engine's frozen canonical form (little-endian, ISO codes).
    ``output_dimension=2`` drops Z; ``byte_order`` -1/1 = little
    (native), 0 = big-endian (structural transcode);
    ``include_srid=True`` writes the EWKB SRID flag + the sidecar srid
    (``set_srid``) on the top-level geometry — the engine's parser
    reads every variant back."""
    if byte_order not in (-1, 0, 1):
        raise ValueError("byte_order must be -1, 0 or 1")
    if output_dimension == 2 and ga.z is not None:
        from rayspatial.geom.accessors import force_2d

        ga = force_2d(ga)
    parts_by_geom: dict[int, list] = {}
    for p in range(ga.n_parts):
        parts_by_geom.setdefault(int(ga.part_geom[p]), []).append(p)
    srids = None
    if include_srid:
        from rayspatial.geom.accessors import get_srid

        srids = get_srid(ga)
    result: list = []
    for i in range(len(ga)):
        if ga.types[i] == MISSING:
            result.append(None)
            continue
        out: list = []
        _write_geom(ga, i, parts_by_geom, out)
        blob = b"".join(out)
        if include_srid:
            blob = _insert_srid(blob, int(srids[i]))
        if byte_order == 0:
            blob = _swap_wkb_endianness(blob)
        result.append(blob.hex() if hex else blob)
    return result


def _insert_srid(blob: bytes, srid: int) -> bytes:
    """Set the EWKB SRID flag on the top-level type word and insert the
    4-byte srid (little-endian input blob)."""
    t = int.from_bytes(blob[1:5], "little") | 0x20000000
    return (blob[:1] + t.to_bytes(4, "little")
            + int(srid).to_bytes(4, "little", signed=False) + blob[5:])


def _swap_wkb_endianness(blob: bytes) -> bytes:
    """Structural little->big transcode of a WKB blob (every nested
    geometry header, count and coordinate swaps)."""
    out = bytearray()
    pos = _swap_geom(blob, 0, out)
    if pos != len(blob):
        raise WKBError("trailing bytes while transcoding WKB")
    return bytes(out)


def _swap_geom(buf: bytes, pos: int, out: bytearray) -> int:
    if buf[pos] != 1:
        raise WKBError("transcode expects little-endian input")
    out.append(0)  # big-endian marker
    raw = int.from_bytes(buf[pos + 1 : pos + 5], "little")
    out += raw.to_bytes(4, "big")
    pos += 5
    t = raw
    if t & 0x20000000:
        t &= ~0x20000000
        out += int.from_bytes(buf[pos : pos + 4], "little").to_bytes(4, "big")
        pos += 4
    has_z = bool(t & 0x80000000) or (t & 0x7FFFFFFF) // 1000 in (1, 3)
    base = (t & 0x7FFFFFFF) % 1000
    nd = 3 if has_z else 2

    def swap_doubles(n):
        nonlocal pos
        for _ in range(n):
            out.extend(buf[pos : pos + 8][::-1])
            pos += 8

    def swap_count():
        nonlocal pos
        c = int.from_bytes(buf[pos : pos + 4], "little")
        out.extend(c.to_bytes(4, "big"))
        pos += 4
        return c

    if base == 1:  # point
        swap_doubles(nd)
    elif base == 2:  # linestring
        swap_doubles(swap_count() * nd)
    elif base == 3:  # polygon
        for _ in range(swap_count()):
            swap_doubles(swap_count() * nd)
    elif base in (4, 5, 6, 7):
        for _ in range(swap_count()):
            pos = _swap_geom(buf, pos, out)
    else:
        raise WKBError(f"unsupported geometry type {raw}")
    return pos


# ---------------------------------------------------------------------------
# fast vectorized point path (the 100-TB hot path)

_POINT_WKB_PREFIX = struct.pack("<BI", 1, 1)


def point_wkb(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 2-D point WKB writer: (n,) x/y float64 -> object array
    of 21-byte WKB blobs.  Parity: reference ``points`` constructor
    (pygeos/creation.py:34-77)."""
    n = len(x)
    raw = np.empty((n, 21), dtype=np.uint8)
    raw[:, :5] = np.frombuffer(_POINT_WKB_PREFIX, dtype=np.uint8)
    raw[:, 5:13] = np.ascontiguousarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    raw[:, 13:21] = np.ascontiguousarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf = raw.tobytes()
    # NOTE: numpy "S21" would strip trailing NUL bytes (corrupting zero
    # coordinates) — slice the flat buffer instead
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = buf[i * 21 : (i + 1) * 21]
    return out


def parse_point_wkb(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized parse of a column of 21-byte LE point WKB -> (x, y).
    Raises if any value is not a 2-D LE point."""
    joined = b"".join(values)
    if len(joined) != 21 * len(values):
        raise WKBError("not all values are 21-byte point WKB")
    raw = np.frombuffer(joined, dtype=np.uint8).reshape(len(values), 21)
    hdr = np.frombuffer(_POINT_WKB_PREFIX, dtype=np.uint8)
    if not (raw[:, :5] == hdr).all():
        raise WKBError("non-point or non-LE WKB in fast path")
    x = raw[:, 5:13].copy().view("<f8").ravel()
    y = raw[:, 13:21].copy().view("<f8").ravel()
    return x, y
