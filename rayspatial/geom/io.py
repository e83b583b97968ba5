"""WKT / GeoJSON codecs (reference pygeos/io.py).

``from_wkt`` (io.py:356-388) / ``to_wkt`` (io.py:100-182, defaults
rounding_precision=6, trim=True, "POINT Z (1 2 3)" new-style 3D) and
``from_geojson`` / ``to_geojson`` (io.py:248-294,429-478).

WKT grammar follows OGC SF-SQL; GEOS >= 3.9 collection style is used on
output: ``MULTIPOINT (1 1, 2 2)`` with bare coordinate lists and
``EMPTY`` members allowed.
"""

from __future__ import annotations

import json
import re
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

__all__ = ["from_wkt", "to_wkt", "from_geojson", "to_geojson", "WKTError"]


class WKTError(ValueError):
    pass


_TYPE_NAMES = {
    "POINT": POINT,
    "LINESTRING": LINESTRING,
    "LINEARRING": LINEARRING,
    "POLYGON": POLYGON,
    "MULTIPOINT": MULTIPOINT,
    "MULTILINESTRING": MULTILINESTRING,
    "MULTIPOLYGON": MULTIPOLYGON,
    "GEOMETRYCOLLECTION": GEOMETRYCOLLECTION,
}
_NAME_BY_TYPE = {v: k for k, v in _TYPE_NAMES.items()}

_TOKEN = re.compile(
    r"\s*([A-Za-z]+|\(|\)|,|[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?|\S)"
)


class _Tok:
    def __init__(self, s: str):
        self.toks = _TOKEN.findall(s)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise WKTError("unexpected end of WKT")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise WKTError(f"expected '{t}', got '{got}'")


def _parse_coord(tk: _Tok, dim_hint: int) -> tuple[float, float, float | None]:
    vals = []
    while True:
        p = tk.peek()
        if p is None or p in "(),":
            break
        vals.append(float(tk.next()))
    if len(vals) < 2:
        raise WKTError("coordinate needs at least x y")
    z = vals[2] if len(vals) >= 3 else None
    return vals[0], vals[1], z


def _parse_coordseq(tk: _Tok) -> tuple[np.ndarray, np.ndarray | None]:
    tk.expect("(")
    xs, ys, zs = [], [], []
    any_z = False
    while True:
        x, y, z = _parse_coord(tk, 2)
        xs.append(x)
        ys.append(y)
        zs.append(np.nan if z is None else z)
        any_z = any_z or z is not None
        t = tk.next()
        if t == ")":
            break
        if t != ",":
            raise WKTError(f"expected ',' or ')', got '{t}'")
    xy = np.column_stack([xs, ys]).astype(np.float64)
    return xy, (np.asarray(zs) if any_z else None)


def _parse_wkt_geom(tk: _Tok, b: _Builder, geom_idx: int):
    """Returns (type_id, has_z, n_children_immediate)."""
    name = tk.next().upper()
    if name not in _TYPE_NAMES:
        raise WKTError(f"unknown geometry type '{name}'")
    typ = _TYPE_NAMES[name]
    has_z = False
    p = tk.peek()
    if p is not None and p.upper() in ("Z", "ZM", "M"):
        mod = tk.next().upper()
        has_z = "Z" in mod
    p = tk.peek()
    if p is not None and p.upper() == "EMPTY":
        tk.next()
        return typ, has_z, 0
    if typ == POINT:
        tk.expect("(")
        x, y, z = _parse_coord(tk, 3 if has_z else 2)
        tk.expect(")")
        has_z = has_z or z is not None
        b.add_part(
            geom_idx, PK_POINT, b.sub_counter, np.asarray([[x, y]]),
            None if z is None else np.asarray([z]),
        )
        b.sub_counter += 1
        return typ, has_z, 1
    if typ in (LINESTRING, LINEARRING):
        xy, z = _parse_coordseq(tk)
        has_z = has_z or z is not None
        b.add_part(geom_idx, PK_LINE, b.sub_counter, xy, z)
        b.sub_counter += 1
        return typ, has_z, 1
    if typ == POLYGON:
        tk.expect("(")
        poly_id = b.poly_counter
        first = True
        while True:
            xy, z = _parse_coordseq(tk)
            has_z = has_z or z is not None
            b.add_part(geom_idx, PK_SHELL if first else PK_HOLE, poly_id, xy, z)
            first = False
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise WKTError("expected ',' or ')' in polygon")
        b.poly_counter += 1
        return typ, has_z, 1
    if typ == MULTIPOINT:
        tk.expect("(")
        n = 0
        while True:
            p = tk.peek()
            if p == "(":  # parenthesized member: (1 1)
                tk.next()
                x, y, z = _parse_coord(tk, 2)
                tk.expect(")")
            elif p is not None and p.upper() == "EMPTY":
                tk.next()
                x = y = z = None
            else:
                x, y, z = _parse_coord(tk, 2)
            if x is not None:
                has_z = has_z or z is not None
                b.add_part(
                    geom_idx, PK_POINT, b.sub_counter, np.asarray([[x, y]]),
                    None if z is None else np.asarray([z]),
                )
                b.sub_counter += 1
            n += 1
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise WKTError("expected ',' or ')' in multipoint")
        return typ, has_z, n
    if typ == MULTILINESTRING:
        tk.expect("(")
        n = 0
        while True:
            xy, z = _parse_coordseq(tk)
            has_z = has_z or z is not None
            b.add_part(geom_idx, PK_LINE, b.sub_counter, xy, z)
            b.sub_counter += 1
            n += 1
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise WKTError("expected ',' or ')' in multilinestring")
        return typ, has_z, n
    if typ == MULTIPOLYGON:
        tk.expect("(")
        n = 0
        while True:
            tk.expect("(")
            poly_id = b.poly_counter
            first = True
            while True:
                xy, z = _parse_coordseq(tk)
                has_z = has_z or z is not None
                b.add_part(geom_idx, PK_SHELL if first else PK_HOLE, poly_id, xy, z)
                first = False
                t = tk.next()
                if t == ")":
                    break
                if t != ",":
                    raise WKTError("bad polygon in multipolygon")
            b.poly_counter += 1
            n += 1
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise WKTError("expected ',' or ')' in multipolygon")
        return typ, has_z, n
    # GEOMETRYCOLLECTION
    tk.expect("(")
    n = 0
    any_z = has_z
    while True:
        _, cz, _ = _parse_wkt_geom(tk, b, geom_idx)
        any_z = any_z or cz
        n += 1
        t = tk.next()
        if t == ")":
            break
        if t != ",":
            raise WKTError("expected ',' or ')' in collection")
    return typ, any_z, n


def from_wkt(values, on_invalid: str = "raise") -> GeomArray:
    """Parse WKT strings (None -> missing).  Reference io.py:356-388."""
    if on_invalid not in ("raise", "warn", "ignore"):
        raise ValueError("on_invalid only accepts scalar values 'raise', 'warn' or 'ignore'")
    if isinstance(values, str):
        values = [values]
    b = _Builder()
    for i, v in enumerate(values):
        if v is None:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
            continue
        try:
            tk = _Tok(v)
            typ, has_z, nchild = _parse_wkt_geom(tk, b, i)
            if tk.peek() is not None:
                raise WKTError(f"trailing tokens: {tk.peek()!r}")
            b.types.append(typ)
            b.has_z.append(has_z)
            b.num_children.append(nchild)
        except WKTError as exc:
            if on_invalid == "raise":
                raise
            if on_invalid == "warn":
                warnings.warn(f"invalid WKT at index {i}: {exc}", stacklevel=2)
            while b.part_geom and b.part_geom[-1] == i:
                for lst in (b.part_geom, b.part_kind, b.part_sub, b.part_len):
                    lst.pop()
                b.chunks.pop()
                b.zchunks.pop()
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
    return b.finish()


def _fmt(v: float, precision: int, trim: bool) -> str:
    if precision < 0:
        s = f"{v:.16f}"
        return s
    s = f"{v:.{precision}f}"
    if trim:
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("-0", ""):
            s = "0"
    return s


def _fmt_coords(xy, z, precision, trim, dim3):
    out = []
    for k in range(len(xy)):
        c = f"{_fmt(xy[k, 0], precision, trim)} {_fmt(xy[k, 1], precision, trim)}"
        if dim3 and z is not None:
            c += f" {_fmt(z[k], precision, trim)}"
        out.append(c)
    return ", ".join(out)


def to_wkt(
    ga: GeomArray,
    rounding_precision: int = 6,
    trim: bool = True,
    output_dimension: int = 3,
    old_3d: bool = False,
) -> list[str | None]:
    """GeomArray -> WKT strings.  Reference io.py:100-182; new-style 3D
    ("POINT Z (1 2 3)") by default, ``old_3d=True`` drops the Z tag
    ("POINT (1 2 3)") like GEOS's old-style output."""
    parts_by_geom: dict[int, list] = {}
    for p in range(ga.n_parts):
        parts_by_geom.setdefault(int(ga.part_geom[p]), []).append(p)
    out: list[str | None] = []
    zv = ga.z
    for i in range(len(ga)):
        typ = int(ga.types[i])
        if typ == MISSING:
            out.append(None)
            continue
        has_z = bool(ga.has_z[i]) and output_dimension >= 3 and zv is not None
        name = _NAME_BY_TYPE[typ]
        ztag = " Z" if has_z and not old_3d else ""
        gparts = parts_by_geom.get(i, [])

        def cs(p):
            s, e = ga.part_off[p], ga.part_off[p + 1]
            return _fmt_coords(
                ga.coords[s:e], zv[s:e] if has_z else None, rounding_precision, trim, has_z
            )

        if not gparts:
            out.append(f"{name}{ztag} EMPTY")
            continue
        if typ == POINT:
            out.append(f"{name}{ztag} ({cs(gparts[0])})")
        elif typ in (LINESTRING, LINEARRING):
            out.append(f"{name}{ztag} ({cs(gparts[0])})")
        elif typ == POLYGON:
            rings = ", ".join(f"({cs(p)})" for p in gparts)
            out.append(f"{name}{ztag} ({rings})")
        elif typ == MULTIPOINT:
            out.append(f"{name}{ztag} ({', '.join(cs(p) for p in gparts)})")
        elif typ == MULTILINESTRING:
            out.append(f"{name}{ztag} ({', '.join('(' + cs(p) + ')' for p in gparts)})")
        elif typ == MULTIPOLYGON:
            polys: dict[int, list] = {}
            for p in gparts:
                polys.setdefault(int(ga.part_sub[p]), []).append(p)
            body = ", ".join(
                "(" + ", ".join(f"({cs(p)})" for p in rings) + ")"
                for _, rings in sorted(polys.items())
            )
            out.append(f"{name}{ztag} ({body})")
        else:  # GEOMETRYCOLLECTION: re-serialize via per-child GeomArray slices
            members = []
            k = 0
            while k < len(gparts):
                p = gparts[k]
                kind = int(ga.part_kind[p])
                if kind == PK_POINT:
                    members.append(f"POINT{ztag} ({cs(p)})")
                    k += 1
                elif kind == PK_LINE:
                    members.append(f"LINESTRING{ztag} ({cs(p)})")
                    k += 1
                else:
                    sub = int(ga.part_sub[p])
                    rings = [p]
                    k += 1
                    while (
                        k < len(gparts)
                        and int(ga.part_kind[gparts[k]]) == PK_HOLE
                        and int(ga.part_sub[gparts[k]]) == sub
                    ):
                        rings.append(gparts[k])
                        k += 1
                    members.append(
                        f"POLYGON{ztag} (" + ", ".join(f"({cs(p)})" for p in rings) + ")"
                    )
            out.append(f"{name}{ztag} ({', '.join(members)})")
    return out


# ---------------------------------------------------------------------------
# GeoJSON (reference io.py:248-294 to_geojson, io.py:429-478 from_geojson)


def to_geojson(ga: GeomArray, indent: int | None = None) -> list[str | None]:
    """GeomArray -> GeoJSON geometry strings (2-D only, like GEOS which
    drops Z for collections; we always emit 2-D)."""
    parts_by_geom: dict[int, list] = {}
    for p in range(ga.n_parts):
        parts_by_geom.setdefault(int(ga.part_geom[p]), []).append(p)
    out: list[str | None] = []

    def ring_coords(p):
        s, e = ga.part_off[p], ga.part_off[p + 1]
        return [[float(x), float(y)] for x, y in ga.coords[s:e]]

    for i in range(len(ga)):
        typ = int(ga.types[i])
        if typ == MISSING:
            out.append(None)
            continue
        gparts = parts_by_geom.get(i, [])
        if typ == POINT:
            coords = ring_coords(gparts[0])[0] if gparts else []
            obj = {"type": "Point", "coordinates": coords}
        elif typ in (LINESTRING, LINEARRING):
            obj = {
                "type": "LineString",
                "coordinates": ring_coords(gparts[0]) if gparts else [],
            }
        elif typ == POLYGON:
            obj = {"type": "Polygon", "coordinates": [ring_coords(p) for p in gparts]}
        elif typ == MULTIPOINT:
            obj = {
                "type": "MultiPoint",
                "coordinates": [ring_coords(p)[0] for p in gparts],
            }
        elif typ == MULTILINESTRING:
            obj = {
                "type": "MultiLineString",
                "coordinates": [ring_coords(p) for p in gparts],
            }
        elif typ == MULTIPOLYGON:
            polys: dict[int, list] = {}
            for p in gparts:
                polys.setdefault(int(ga.part_sub[p]), []).append(p)
            obj = {
                "type": "MultiPolygon",
                "coordinates": [
                    [ring_coords(p) for p in rings] for _, rings in sorted(polys.items())
                ],
            }
        else:
            # collection: serialize members like the WKT writer groups them
            geoms = []
            k = 0
            while k < len(gparts):
                p = gparts[k]
                kind = int(ga.part_kind[p])
                if kind == PK_POINT:
                    geoms.append({"type": "Point", "coordinates": ring_coords(p)[0]})
                    k += 1
                elif kind == PK_LINE:
                    geoms.append({"type": "LineString", "coordinates": ring_coords(p)})
                    k += 1
                else:
                    sub = int(ga.part_sub[p])
                    rings = [p]
                    k += 1
                    while (
                        k < len(gparts)
                        and int(ga.part_kind[gparts[k]]) == PK_HOLE
                        and int(ga.part_sub[gparts[k]]) == sub
                    ):
                        rings.append(gparts[k])
                        k += 1
                    geoms.append(
                        {"type": "Polygon", "coordinates": [ring_coords(r) for r in rings]}
                    )
            obj = {"type": "GeometryCollection", "geometries": geoms}
        out.append(json.dumps(obj, indent=indent))
    return out


def from_geojson(values, on_invalid: str = "raise") -> GeomArray:
    """GeoJSON strings -> GeomArray (geometry objects, Feature, or
    FeatureCollection-of-one not supported: geometry objects only, like
    GEOSGeoJSONReader for geometries)."""
    if isinstance(values, str):
        values = [values]
    b = _Builder()

    def add(obj, i, b):
        t = obj["type"]
        if t == "Point":
            c = obj["coordinates"]
            if not c:
                return POINT, 0
            b.add_part(i, PK_POINT, b.sub_counter, np.asarray([c[:2]], dtype=np.float64))
            b.sub_counter += 1
            return POINT, 1
        if t == "LineString":
            c = np.asarray(obj["coordinates"], dtype=np.float64)
            if len(c) == 0:
                return LINESTRING, 0
            b.add_part(i, PK_LINE, b.sub_counter, c[:, :2])
            b.sub_counter += 1
            return LINESTRING, 1
        if t == "Polygon":
            rings = obj["coordinates"]
            if not rings:
                return POLYGON, 0
            pid = b.poly_counter
            for r, ring in enumerate(rings):
                xy = np.asarray(ring, dtype=np.float64)[:, :2]
                b.add_part(i, PK_SHELL if r == 0 else PK_HOLE, pid, xy)
            b.poly_counter += 1
            return POLYGON, 1
        if t == "MultiPoint":
            for c in obj["coordinates"]:
                b.add_part(i, PK_POINT, b.sub_counter, np.asarray([c[:2]], dtype=np.float64))
                b.sub_counter += 1
            return MULTIPOINT, len(obj["coordinates"])
        if t == "MultiLineString":
            for line in obj["coordinates"]:
                b.add_part(i, PK_LINE, b.sub_counter, np.asarray(line, dtype=np.float64)[:, :2])
                b.sub_counter += 1
            return MULTILINESTRING, len(obj["coordinates"])
        if t == "MultiPolygon":
            for rings in obj["coordinates"]:
                pid = b.poly_counter
                for r, ring in enumerate(rings):
                    xy = np.asarray(ring, dtype=np.float64)[:, :2]
                    b.add_part(i, PK_SHELL if r == 0 else PK_HOLE, pid, xy)
                b.poly_counter += 1
            return MULTIPOLYGON, len(obj["coordinates"])
        if t == "GeometryCollection":
            for g in obj["geometries"]:
                add(g, i, b)
            return GEOMETRYCOLLECTION, len(obj["geometries"])
        raise WKTError(f"unsupported GeoJSON type {t}")

    for i, v in enumerate(values):
        if v is None:
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
            continue
        try:
            obj = json.loads(v) if isinstance(v, (str, bytes)) else v
            typ, nchild = add(obj, i, b)
            b.types.append(typ)
            b.has_z.append(False)
            b.num_children.append(nchild)
        except (WKTError, KeyError, ValueError, TypeError) as exc:
            if on_invalid == "raise":
                raise WKTError(f"invalid GeoJSON at index {i}: {exc}") from exc
            if on_invalid == "warn":
                warnings.warn(f"invalid GeoJSON at index {i}: {exc}", stacklevel=2)
            while b.part_geom and b.part_geom[-1] == i:
                for lst in (b.part_geom, b.part_kind, b.part_sub, b.part_len):
                    lst.pop()
                b.chunks.pop()
                b.zchunks.pop()
            b.types.append(MISSING)
            b.has_z.append(False)
            b.num_children.append(0)
    return b.finish()
