"""Per-group geometry reductions (numpy, from scratch).

Covers the reference's aggregate geometry terms:
- convex hull + longest-line geodesic length (importance score term,
  ``bano/sql/export_json_dept_voies_rapprochees.sql:64``)
- hull centroid fallback label point
  (``bano/sql/export_json_dept_voies_non_rapprochees.sql:68-69``)
- street representative point: merge line fragments, take the merged line's
  point closest to the collection centroid
  (``bano/sql/point_par_rue_insee_nocache.sql:26-46``)
- union-of-circles suffix zones (``bano/pre_process_suffixe.py:19-45``):
  membership in a buffer-union is exactly "within radius of any center"
- polygon shoelace area (postal smallest-area tie-break,
  ``bano/sql/export_json_dept_voies_rapprochees.sql:38-42``)
"""

from __future__ import annotations

import numpy as np

EARTH_R = 6371008.8


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; pts (n,2) → hull vertices (m,2) CCW."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort by (x, y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        hull: list[np.ndarray] = []
        for p in points:
            while len(hull) >= 2:
                o, a = hull[-2], hull[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    hull.pop()
                else:
                    break
            hull.append(p)
        return hull

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_R * np.arcsin(np.sqrt(h))


def hull_diameter_m(pts: np.ndarray) -> float:
    """Geodesic length of the longest line between hull vertices."""
    hull = convex_hull(pts)
    if len(hull) < 2:
        return 0.0
    d = haversine_m(hull[:, 0][:, None], hull[:, 1][:, None],
                    hull[:, 0][None, :], hull[:, 1][None, :])
    return float(d.max())


def hull_centroid(pts: np.ndarray) -> tuple[float, float]:
    """Centroid of the convex hull polygon (area-weighted; falls back to the
    vertex mean for degenerate hulls)."""
    hull = convex_hull(pts)
    if len(hull) < 3:
        return float(hull[:, 0].mean()), float(hull[:, 1].mean())
    x, y = hull[:, 0], hull[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if a == 0:
        return float(x.mean()), float(y.mean())
    cx = ((x + xn) * cross).sum() / (6.0 * a)
    cy = ((y + yn) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def shoelace_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(abs((x * np.roll(y, -1) - np.roll(x, -1) * y).sum()) / 2.0)


def closest_point_on_lines(segs_a: np.ndarray, segs_b: np.ndarray,
                           px: float, py: float) -> tuple[float, float]:
    """Point on a set of segments (a→b, (n,2) each) closest to (px,py) —
    the ST_ClosestPoint(merged line, centroid) step of the street label
    point (``bano/sql/point_par_rue_insee_nocache.sql:41-46``)."""
    d = segs_b - segs_a
    len2 = (d ** 2).sum(axis=1)
    len2 = np.where(len2 == 0, 1e-300, len2)
    t = ((np.array([px, py]) - segs_a) * d).sum(axis=1) / len2
    t = np.clip(t, 0.0, 1.0)
    proj = segs_a + t[:, None] * d
    dist2 = ((proj - np.array([px, py])) ** 2).sum(axis=1)
    j = int(np.argmin(dist2))
    return float(proj[j, 0]), float(proj[j, 1])


def street_label_point(line_coords: list[np.ndarray]) -> tuple[float, float]:
    """Representative on-street point for a set of way fragments:
    centroid of all vertices, snapped to the nearest point on the lines."""
    all_pts = np.vstack(line_coords)
    cx, cy = float(all_pts[:, 0].mean()), float(all_pts[:, 1].mean())
    segs_a = np.vstack([c[:-1] for c in line_coords if len(c) >= 2])
    segs_b = np.vstack([c[1:] for c in line_coords if len(c) >= 2])
    return closest_point_on_lines(segs_a, segs_b, cx, cy)


class CircleUnionZone:
    """Suffix zone = union of r-buffers around sample points
    (``bano/pre_process_suffixe.py:27``: r = 0.0003 deg).  Membership in the
    union of circles is exactly min-distance < r — no polygonization needed."""

    def __init__(self, centers: np.ndarray, radius: float = 0.0003):
        self.centers = np.asarray(centers, dtype=np.float64).reshape(-1, 2)
        self.radius = float(radius)

    def contains(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        px = np.asarray(px, dtype=np.float64)[:, None]
        py = np.asarray(py, dtype=np.float64)[:, None]
        d2 = (px - self.centers[None, :, 0]) ** 2 + (py - self.centers[None, :, 1]) ** 2
        return (d2 <= self.radius ** 2).any(axis=1)


def line_centroid(coords: np.ndarray) -> tuple[float, float]:
    """G4: centroid of a linestring — length-weighted average of segment
    midpoints (PostGIS ST_Centroid on lines, reference
    ``bano/sql/hsnr_insee.sql:29,60`` centroid-of-way)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) == 1:
        return float(coords[0, 0]), float(coords[0, 1])
    seg = coords[1:] - coords[:-1]
    lengths = np.sqrt((seg ** 2).sum(axis=1))
    mids = (coords[1:] + coords[:-1]) / 2.0
    total = lengths.sum()
    if total == 0:
        return float(coords[:, 0].mean()), float(coords[:, 1].mean())
    cx = float((mids[:, 0] * lengths).sum() / total)
    cy = float((mids[:, 1] * lengths).sum() / total)
    return cx, cy
