"""Minimal WKB codec (little-endian) for Point / LineString / Polygon /
MultiPolygon — the on-wire geometry representation in Arrow ``binary``
columns.  From scratch (no GEOS in this environment); parsing uses
``struct``/``numpy.frombuffer`` so ring coordinates land as zero-copy
float64 arrays.
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOLYGON = 6

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")
_PT = struct.Struct("<dd")


def encode_point(lon: float, lat: float) -> bytes:
    return _HDR.pack(1, POINT) + _PT.pack(lon, lat)


def encode_linestring(coords: np.ndarray) -> bytes:
    coords = np.ascontiguousarray(coords, dtype="<f8")
    return _HDR.pack(1, LINESTRING) + _U32.pack(len(coords)) + coords.tobytes()


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    out = [_HDR.pack(1, POLYGON), _U32.pack(len(rings))]
    for r in rings:
        r = np.ascontiguousarray(r, dtype="<f8")
        out.append(_U32.pack(len(r)))
        out.append(r.tobytes())
    return b"".join(out)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [_HDR.pack(1, MULTIPOLYGON), _U32.pack(len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def _read_rings(buf: memoryview, off: int) -> tuple[list[np.ndarray], int]:
    (nrings,) = _U32.unpack_from(buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (npts,) = _U32.unpack_from(buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off).reshape(npts, 2)
        rings.append(arr)
        off += npts * 16
    return rings, off


def decode(wkb: bytes):
    """Decode one WKB blob.

    Returns ``("point", (lon, lat))``, ``("linestring", coords)``,
    ``("polygon", [rings])`` or ``("multipolygon", [[rings], ...])``;
    ring/linestring coords are ``(n, 2)`` float64 views over the buffer.
    """
    buf = memoryview(wkb)
    byte_order, gtype = _HDR.unpack_from(buf, 0)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    off = _HDR.size
    if gtype == POINT:
        return "point", _PT.unpack_from(buf, off)
    if gtype == LINESTRING:
        (npts,) = _U32.unpack_from(buf, off)
        off += 4
        return "linestring", np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off).reshape(npts, 2)
    if gtype == POLYGON:
        rings, _ = _read_rings(buf, off)
        return "polygon", rings
    if gtype == MULTIPOLYGON:
        (npolys,) = _U32.unpack_from(buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            bo, gt = _HDR.unpack_from(buf, off)
            if bo != 1 or gt != POLYGON:
                raise ValueError("malformed multipolygon")
            off += _HDR.size
            rings, off = _read_rings(buf, off)
            polys.append(rings)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def polygon_rings(wkb: bytes) -> list[list[np.ndarray]]:
    """Normalize polygon-ish WKB to a list of polygons (each a ring list)."""
    kind, val = decode(wkb)
    if kind == "polygon":
        return [val]
    if kind == "multipolygon":
        return val
    raise ValueError(f"expected (multi)polygon, got {kind}")
