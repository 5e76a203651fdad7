"""Vectorized point-in-polygon kernels.

Replaces the reference's PostGIS ``ST_Intersects(point, polygon)`` joins
(``bano/sql/hsnr_insee.sql:20-25`` and 5 sibling query files × ~35k commune
invocations) with numpy even-odd crossing tests evaluated per cell-group.

Edge semantics replicated from ST_Intersects:
- a point ON the boundary matches (crossing parity alone would be ambiguous,
  so an explicit on-segment test is OR-ed in);
- overlapping polygons both match (callers collect ALL matches; the
  reference dedups later via SQL UNION).

The bbox-relaxation second pass (``bano/sql/hsnr_bbox_insee_nocache.sql:20``)
is :func:`points_in_bbox` — intentionally over-matching, applied only to
points the exact pass left unassigned.
"""

from __future__ import annotations

import numpy as np


def _on_segment(px: np.ndarray, py: np.ndarray,
                x1: float, y1: float, x2: float, y2: float,
                eps: float = 1e-12) -> np.ndarray:
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    seg2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
    near_line = cross * cross <= eps * max(seg2, eps)
    within = (px >= min(x1, x2) - eps) & (px <= max(x1, x2) + eps) \
        & (py >= min(y1, y2) - eps) & (py <= max(y1, y2) + eps)
    return near_line & within


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing parity of points vs one ring ((n,2) float64,
    closed or open).  Fully vectorized: broadcasts points × edges."""
    x1 = ring[:-1, 0][:, None]
    y1 = ring[:-1, 1][:, None]
    x2 = ring[1:, 0][:, None]
    y2 = ring[1:, 1][:, None]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = cond & (px < xint)
    return crossings.sum(axis=0) % 2 == 1


def points_on_boundary(px: np.ndarray, py: np.ndarray,
                       rings: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(len(px), dtype=bool)
    for ring in rings:
        r = ring if (ring[0] == ring[-1]).all() else np.vstack([ring, ring[:1]])
        for i in range(len(r) - 1):
            remaining = ~out
            if not remaining.any():
                return out
            out[remaining] |= _on_segment(px[remaining], py[remaining],
                                          r[i, 0], r[i, 1], r[i + 1, 0], r[i + 1, 1])
    return out


def points_in_polygon(px: np.ndarray, py: np.ndarray,
                      polys: list[list[np.ndarray]]) -> np.ndarray:
    """ST_Intersects semantics vs a (multi)polygon given as a list of
    polygons, each a list of rings (ring 0 = shell, rest = holes)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    for rings in polys:
        parity = np.zeros(len(px), dtype=bool)
        for ring in rings:
            r = ring if (ring[0] == ring[-1]).all() else np.vstack([ring, ring[:1]])
            parity ^= points_in_ring(px, py, r)
        inside |= parity
        inside |= points_on_boundary(px, py, rings)
    return inside


def geom_bbox(polys: list[list[np.ndarray]]) -> tuple[float, float, float, float]:
    pts = np.vstack([r for rings in polys for r in rings])
    return float(pts[:, 0].min()), float(pts[:, 1].min()), float(pts[:, 0].max()), float(pts[:, 1].max())


def points_in_bbox(px: np.ndarray, py: np.ndarray,
                   bbox: tuple[float, float, float, float]) -> np.ndarray:
    xmin, ymin, xmax, ymax = bbox
    return (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)


class PolygonIndex:
    """Small in-worker spatial index: bbox prefilter then exact PIP.

    Built once per actor (``__init__`` of an actor-pool stage) from a
    broadcast list of ``(key, wkb)`` polygons; :meth:`assign_all` returns
    every (point_idx, key) match, mirroring the reference's multi-match
    UNION behavior.
    """

    def __init__(self, polygons: list[tuple[object, bytes]]):
        from . import wkb as _wkb
        self.keys: list[object] = []
        self.polys: list[list[list[np.ndarray]]] = []
        boxes = []
        for key, blob in polygons:
            polys = _wkb.polygon_rings(blob)
            self.keys.append(key)
            self.polys.append(polys)
            boxes.append(geom_bbox(polys))
        self.boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)

    def __len__(self) -> int:
        return len(self.keys)

    def assign_all(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All exact matches → (point_indices, polygon_slot_indices)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out_pt: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        for j in range(len(self.keys)):
            xmin, ymin, xmax, ymax = self.boxes[j]
            cand = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = points_in_polygon(px[idx], py[idx], self.polys[j])
            if hit.any():
                out_pt.append(idx[hit])
                out_poly.append(np.full(int(hit.sum()), j, dtype=np.int64))
        if not out_pt:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pt), np.concatenate(out_poly)

    def assign_bbox(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Relaxed bbox pass (reference G3) — all bbox matches."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out_pt: list[np.ndarray] = []
        out_poly: list[np.ndarray] = []
        for j in range(len(self.keys)):
            hit = points_in_bbox(px, py, tuple(self.boxes[j]))
            if hit.any():
                out_pt.append(np.nonzero(hit)[0])
                out_poly.append(np.full(int(hit.sum()), j, dtype=np.int64))
        if not out_pt:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pt), np.concatenate(out_poly)
