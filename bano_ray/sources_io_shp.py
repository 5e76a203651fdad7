"""K4: ESRI Shapefile point writer/reader — pure stdlib+numpy.

The reference shells out to ``ogr2ogr`` to turn the export query into a
per-dept shapefile (``bano/export.py:148-149``, ``out/banout.sh:34``).  No
GDAL exists here, so the three-file format is written directly:

- ``.shp``: 100-byte header (code 9994, length in 16-bit words, shape type
  1 = Point, bbox) + per-record header (number, content words) + Point
  content (type, x, y) — spec "ESRI Shapefile Technical Description".
- ``.shx``: same header + (offset words, content words) per record.
- ``.dbf``: dBase III — version byte 0x03, record count, header/record
  sizes, 32-byte field descriptors ('C' text fields), 0x0D terminator,
  space-deletion-flag fixed-width records, 0x1A EOF.

Writes are per-partition (one shapefile trio per zone dir) following the
repo's resumable-output rule; a minimal reader round-trips for tests.
"""

from __future__ import annotations

import hashlib
import os
import re
import struct

import numpy as np
import pandas as pd


def _dbf_bytes(df: pd.DataFrame, fields: list[tuple[str, int]]) -> bytes:
    n = len(df)
    nf = len(fields)
    header_size = 32 + 32 * nf + 1
    record_size = 1 + sum(w for _, w in fields)
    out = bytearray()
    out += struct.pack("<B3xI HH20x", 0x03, n, header_size, record_size)
    for name, width in fields:
        out += struct.pack("<11sBIBB14x", name.encode("ascii")[:11], ord("C"),
                           0, width, 0)
    out += b"\x0D"
    for _, row in df.iterrows():
        out += b" "
        for name, width in fields:
            v = str(row[name]).encode("utf-8")[:width]
            out += v.ljust(width, b" ")
    out += b"\x1A"
    return bytes(out)


def write_point_shapefile(df: pd.DataFrame, base_path: str,
                          lon_col: str = "lon", lat_col: str = "lat",
                          attr_cols: list[str] | None = None,
                          attr_width: int = 80) -> str:
    """Point rows → ``base_path``.shp/.shx/.dbf.  Returns ``base_path``."""
    lon = df[lon_col].to_numpy(dtype=np.float64)
    lat = df[lat_col].to_numpy(dtype=np.float64)
    n = len(df)
    if n:
        bbox = (float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max()))
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    def header(total_words: int) -> bytes:
        h = struct.pack(">I", 9994) + b"\x00" * 20
        h += struct.pack(">I", total_words)
        h += struct.pack("<II", 1000, 1)
        h += struct.pack("<4d", *bbox)
        h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
        return h

    rec_words = 10  # point content: int32 type + 2 doubles = 20 bytes
    shp_words = 50 + n * (4 + rec_words)
    shx_words = 50 + n * 4
    shp = bytearray(header(shp_words))
    shx = bytearray(header(shx_words))
    offset = 50
    for i in range(n):
        shp += struct.pack(">II", i + 1, rec_words)
        shp += struct.pack("<Idd", 1, lon[i], lat[i])
        shx += struct.pack(">II", offset, rec_words)
        offset += 4 + rec_words
    os.makedirs(os.path.dirname(base_path) or ".", exist_ok=True)
    with open(base_path + ".shp", "wb") as f:
        f.write(shp)
    with open(base_path + ".shx", "wb") as f:
        f.write(shx)
    cols = attr_cols if attr_cols is not None else \
        [c for c in df.columns if c not in (lon_col, lat_col)]
    fields = [(c[:10].upper(), attr_width) for c in cols]
    with open(base_path + ".dbf", "wb") as f:
        f.write(_dbf_bytes(df[cols].rename(columns=dict(zip(cols, [f[0] for f in fields]))),
                           fields))
    return base_path


def read_point_shapefile(base_path: str) -> pd.DataFrame:
    """Round-trip reader: points + text attributes."""
    raw = open(base_path + ".shp", "rb").read()
    assert struct.unpack(">I", raw[:4])[0] == 9994, "not a shapefile"
    shape_type = struct.unpack("<I", raw[32:36])[0]
    assert shape_type == 1, "point shapefiles only"
    pos = 100
    xs, ys = [], []
    while pos < len(raw):
        _, words = struct.unpack(">II", raw[pos:pos + 8])
        st, x, y = struct.unpack("<Idd", raw[pos + 8:pos + 8 + 20])
        assert st == 1
        xs.append(x)
        ys.append(y)
        pos += 8 + words * 2
    d = open(base_path + ".dbf", "rb").read()
    nrec, hsize, rsize = struct.unpack("<IHH", d[4:12])
    nf = (hsize - 33) // 32
    fields = []
    for i in range(nf):
        fd = d[32 + 32 * i: 64 + 32 * i]
        name = fd[:11].split(b"\x00")[0].decode("ascii")
        width = fd[16]
        fields.append((name, width))
    rows = []
    for r in range(nrec):
        rec = d[hsize + r * rsize: hsize + (r + 1) * rsize]
        off = 1
        vals = {}
        for name, width in fields:
            vals[name] = rec[off:off + width].decode("utf-8", "replace").rstrip()
            off += width
        rows.append(vals)
    out = pd.DataFrame(rows) if rows else pd.DataFrame({f[0]: [] for f in fields})
    out["lon"] = xs
    out["lat"] = ys
    return out


def write_shapefile_partitioned(ds, out_dir: str, partition_col: str = "ville",
                                lon_col: str = "lon", lat_col: str = "lat") -> str:
    """Distributed K4 sink: one shapefile trio per partition value, written
    from inside ``map_groups`` (each partition is one commune/dept-sized
    group — the reference's per-dept ogr2ogr output, resumable per part)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"partition": pd.Series(dtype="string"),
                                 "n": pd.Series(dtype="int64")})
        raw = str(df[partition_col].iloc[0])
        # Path-safe partition name: restrict to a safe charset (a value
        # containing '/' must not escape out_dir) and disambiguate values
        # that collide after sanitization with a short hash of the raw key.
        key = re.sub(r"[^A-Za-z0-9_.-]", "_", raw)
        if key != raw:
            key += "-" + hashlib.sha1(raw.encode()).hexdigest()[:8]
        tmp = os.path.join(out_dir, f".tmp-{key}")
        final = os.path.join(out_dir, key)
        write_point_shapefile(df, tmp, lon_col=lon_col, lat_col=lat_col)
        for ext in (".shp", ".shx", ".dbf"):  # atomic per-partition publish
            os.replace(tmp + ext, final + ext)
        return pd.DataFrame({"partition": [key], "n": [len(df)]})

    return ds.groupby(partition_col).map_groups(write_group, batch_format="pandas")
