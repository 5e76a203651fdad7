"""Raster ↔ vector bridge over the cell index (north_rule operator family).

- :func:`rasterize` — vector polygon → the set of cells (at a resolution)
  whose CENTER lies inside the polygon (GDAL-style center sampling).  Built
  on the cover + PIP kernels; per-batch vectorized.
- :func:`vectorize_cells` — cell set → boundary polygon(s) via edge
  cancellation: every cell contributes its 4 box edges, shared edges cancel,
  the survivors chain into closed rings (holes come out in reverse
  orientation), returned as WKB multipolygon.

Round-trip property (tested): PIP against ``vectorize_cells(rasterize(P))``
agrees with cell membership for every cell center.
"""

from __future__ import annotations

import numpy as np

from .cells import cell_decode, cover_bbox, lonlat_to_tile, morton, tile_bbox_lonlat
from .pip import geom_bbox, points_in_polygon
from .wkb import encode_multipolygon, polygon_rings


def cell_centers(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    z, x, y = cell_decode(cells)
    lon0, lat0, lon1, lat1 = tile_bbox_lonlat(z, x, y)
    return (lon0 + lon1) / 2.0, (lat0 + lat1) / 2.0


def rasterize(polys_wkb: bytes, res: int) -> np.ndarray:
    """WKB (multi)polygon → int64 cells at ``res`` whose center is inside."""
    polys = polygon_rings(polys_wkb)
    xmin, ymin, xmax, ymax = geom_bbox(polys)
    cand = cover_bbox(xmin, ymin, xmax, ymax, res)
    lon, lat = cell_centers(cand)
    hit = points_in_polygon(lon, lat, polys)
    return cand[hit]


def vectorize_cells(cells: np.ndarray) -> bytes:
    """Cell set (single resolution) → WKB multipolygon of its outline(s)."""
    cells = np.asarray(cells, dtype=np.int64)
    if len(cells) == 0:
        return encode_multipolygon([])
    z, x, y = cell_decode(cells)
    if len(set(z.tolist())) != 1:
        raise ValueError("vectorize_cells expects a single resolution")
    # directed edges in grid coordinates; interior edges appear twice in
    # opposite directions and cancel
    edges: dict[tuple[int, int, int, int], int] = {}

    def add(a, b):
        rev = (b[0], b[1], a[0], a[1])
        if edges.pop(rev, None) is None:
            edges[(a[0], a[1], b[0], b[1])] = 1

    for xi, yi in zip(x.tolist(), y.tolist()):
        # CCW in grid space (y grows south; orientation is consistent)
        add((xi, yi), (xi + 1, yi))
        add((xi + 1, yi), (xi + 1, yi + 1))
        add((xi + 1, yi + 1), (xi, yi + 1))
        add((xi, yi + 1), (xi, yi))

    # chain surviving edges into rings
    nxt: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for (ax, ay, bx, by) in edges:
        nxt.setdefault((ax, ay), []).append((bx, by))
    rings: list[list[tuple[int, int]]] = []
    while nxt:
        start = next(iter(nxt))
        ring = [start]
        cur = start
        while True:
            outs = nxt.get(cur)
            step = outs.pop()
            if not outs:
                del nxt[cur]
            ring.append(step)
            cur = step
            if cur == start:
                break
        rings.append(ring)

    zz = int(z[0])

    def grid_to_lonlat(ring):
        gx = np.array([p[0] for p in ring], dtype=np.float64)
        gy = np.array([p[1] for p in ring], dtype=np.float64)
        n = float(1 << zz)
        lon = gx / n * 360.0 - 180.0
        my = 20037508.34 - (40075016.68 / n) * gy
        ex = my / 20037508.34 * np.pi
        lat = np.degrees(np.arctan((np.exp(ex) - np.exp(-ex)) / 2.0))
        return np.stack([lon, lat], axis=1)

    # signed area in grid space identifies shells vs holes
    def signed_area(ring):
        xs = np.array([p[0] for p in ring], dtype=np.float64)
        ys = np.array([p[1] for p in ring], dtype=np.float64)
        return float((xs * np.roll(ys, -1) - np.roll(xs, -1) * ys).sum()) / 2.0

    shells = [r for r in rings if signed_area(r) < 0]  # y-down: CCW ⇒ negative
    holes = [r for r in rings if signed_area(r) >= 0]
    polys: list[list[np.ndarray]] = []
    for sh in shells:
        rings_out = [grid_to_lonlat(sh)]
        # attach holes contained in this shell (grid-space PIP)
        sh_ll = rings_out[0]
        for h in holes:
            h_ll = grid_to_lonlat(h)
            probe = h_ll[:-1].mean(axis=0)
            if points_in_polygon(np.array([probe[0]]), np.array([probe[1]]),
                                 [[sh_ll]])[0]:
                rings_out.append(h_ll)
        polys.append(rings_out)
    return encode_multipolygon(polys)
