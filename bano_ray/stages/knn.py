"""Cell-local kNN point matcher — the graft's generalization of the
reference's exact-key merge (SURVEY.md §2.4 ST5: the reference has NO
spatial nearest-neighbor matching; ``north_rule`` mandates one, keyed to
reproduce the same matched pairs on exact-key fixtures).

Semantics: for each probe point (e.g. a BAN address), find the k nearest
target points (e.g. OSM addresses) **within the same zone/cell and the same
normalized street key** — i.e. kNN refines, never overrides, the exact-key
match, so outputs stay consistent with the reference's merge on fixtures
where each key has one candidate.

Implementation: per-(zone, street_key) groups via ONE groupby shuffle; each
group builds a tiny grid-bucketed index (ball-tree stand-in, numpy) in
memory — group size is bounded by cell granularity + skew splitting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.export import haversine_m


class GridIndex:
    """Minimal in-memory spatial index: uniform grid buckets over the group
    extent; query expands rings until k hits found.  O(n) build, ~O(k)
    query for uniform data — the per-cell 'ball tree' role."""

    def __init__(self, lon: np.ndarray, lat: np.ndarray, target_per_bucket: int = 8):
        self.lon = np.asarray(lon, dtype=np.float64)
        self.lat = np.asarray(lat, dtype=np.float64)
        n = max(len(self.lon), 1)
        self.nb = max(1, int(np.sqrt(n / target_per_bucket)))
        self.x0, self.x1 = float(self.lon.min()), float(self.lon.max())
        self.y0, self.y1 = float(self.lat.min()), float(self.lat.max())
        sx = (self.x1 - self.x0) or 1.0
        sy = (self.y1 - self.y0) or 1.0
        bx = np.clip(((self.lon - self.x0) / sx * self.nb).astype(int), 0, self.nb - 1)
        by = np.clip(((self.lat - self.y0) / sy * self.nb).astype(int), 0, self.nb - 1)
        self.buckets: dict[tuple[int, int], list[int]] = {}
        for i, (a, b) in enumerate(zip(bx, by)):
            self.buckets.setdefault((int(a), int(b)), []).append(i)

    def query(self, qlon: float, qlat: float, k: int) -> np.ndarray:
        sx = (self.x1 - self.x0) or 1.0
        sy = (self.y1 - self.y0) or 1.0
        cx = int(np.clip((qlon - self.x0) / sx * self.nb, 0, self.nb - 1))
        cy = int(np.clip((qlat - self.y0) / sy * self.nb, 0, self.nb - 1))
        # local metric lower bound: meters per degree at this latitude
        m_per_deg = min(111132.0, 111320.0 * float(np.cos(np.radians(abs(qlat)))))
        cell_deg = min(sx, sy) / self.nb
        cand: list[int] = []
        kth_best = np.inf
        ring = 0
        while ring <= 2 * self.nb:
            added = False
            for a in range(cx - ring, cx + ring + 1):
                for b in range(cy - ring, cy + ring + 1):
                    if max(abs(a - cx), abs(b - cy)) == ring and (a, b) in self.buckets:
                        cand.extend(self.buckets[(a, b)])
                        added = True
            if added and len(cand) >= k:
                idx = np.asarray(cand, dtype=int)
                d = haversine_m(qlon, qlat, self.lon[idx], self.lat[idx])
                kth_best = float(np.partition(d, k - 1)[k - 1]) if len(d) >= k else np.inf
            # points beyond ring r are at least (r) * cell_deg * m_per_deg away
            if len(cand) >= k and ring * cell_deg * m_per_deg > kth_best:
                break
            ring += 1
        idx = np.asarray(cand, dtype=int)
        d = haversine_m(qlon, qlat, self.lon[idx], self.lat[idx])
        order = np.argsort(d, kind="stable")[:k]
        return idx[order]


def knn_match_group(df: pd.DataFrame, probe_source: str = "BAN",
                    target_source: str = "OSM", k: int = 1) -> pd.DataFrame:
    """One (zone, street_key) group → nearest target(s) for each probe."""
    probes = df[df["source"] == probe_source]
    targets = df[df["source"] == target_source]
    if len(probes) == 0 or len(targets) == 0:
        return pd.DataFrame({"probe_id": pd.Series(dtype="object"),
                             "target_id": pd.Series(dtype="object"),
                             "dist_m": pd.Series(dtype="float64"),
                             "rank": pd.Series(dtype="int64")})
    tid = targets["image_id"].to_numpy()
    tlon = targets["lon"].to_numpy()
    tlat = targets["lat"].to_numpy()
    # dense id rank gives integer tie-break keys for vectorized lexsort
    t_rank = np.empty(len(tid), dtype=np.int64)
    t_rank[np.argsort(tid, kind="stable")] = np.arange(len(tid))
    use_index = len(targets) > 2048  # grid index pays off only on big groups
    rows = []
    if not use_index:
        plon = probes["lon"].to_numpy()
        plat = probes["lat"].to_numpy()
        pid = probes["image_id"].to_numpy()
        d = haversine_m(plon[:, None], plat[:, None], tlon[None, :], tlat[None, :])
        dr = np.round(d, 6)
        for p in range(len(pid)):
            order = np.lexsort((t_rank, dr[p]))[:k]
            for rank, i in enumerate(order, start=1):
                rows.append({"probe_id": pid[p], "target_id": tid[i],
                             "dist_m": round(float(d[p, i]), 3), "rank": rank})
        return pd.DataFrame(rows)
    idx = GridIndex(tlon, tlat)
    for r in probes.itertuples(index=False):
        nn = idx.query(float(r.lon), float(r.lat), k)
        # deterministic tie-handling: rank hits by (rounded dist, id)
        d = haversine_m(r.lon, r.lat, tlon[nn], tlat[nn])
        order = np.lexsort((t_rank[nn], np.round(d, 6)))[:k]
        for rank, i in enumerate(order, start=1):
            rows.append({"probe_id": r.image_id, "target_id": tid[nn[i]],
                         "dist_m": round(float(d[i]), 3), "rank": rank})
    return pd.DataFrame(rows)


def knn_match(points_ds, k: int = 1):
    """points (with insee, street_key, source, image_id, lon, lat) →
    per-street nearest OSM point for every BAN point."""
    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        return knn_match_group(df, k=k)

    return (points_ds
            .groupby(["insee", "street_key"])
            .map_groups(group_fn, batch_format="pandas"))
