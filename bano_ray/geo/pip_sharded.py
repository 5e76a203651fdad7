"""Cell-sharded point-in-polygon — the scale path for large polygon sets.

The broadcast :class:`~bano_ray.geo.pip.PolygonIndex` is right while the
polygon set fits a worker heap (56 synthetic zones; a few MB).  At the
reference's ~35k commune multipolygons the right shape is co-partitioning:
each polygon is fragmented into every slippy-map cell its bbox covers, the
point stream carries the same cell key, and a ``groupby(cell)`` brings each
point together with exactly the polygon fragments that can contain it — no
broadcast, shuffle volume O(points + fragments).

Correctness argument: the exact pass and the bbox-relaxation pass
(reference ``bano/sql/hsnr_bbox_insee_nocache.sql:20``) both only ever match
a point to a polygon whose BBOX contains the point — and a polygon is
registered in every cell its bbox intersects, so all of a point's candidate
polygons are present in its cell group.  Multi-match resolution (min global
slot) is preserved by carrying the global slot id on each fragment.
Property-tested equal to the broadcast index in
``tests/test_geo.py`` / ``tests/test_pipeline.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .cells import lonlat_to_tile
from .pip import PolygonIndex, geom_bbox
from .wkb import polygon_rings

SHARD_RES = 6  # ~5° cells over the synthetic extent; deeper for real data


def _pack(x: np.ndarray, y: np.ndarray, z: int) -> np.ndarray:
    return (np.asarray(x, dtype=np.int64) << np.int64(z + 1)) | np.asarray(y, dtype=np.int64)


def point_cells(lon, lat, z: int = SHARD_RES) -> np.ndarray:
    xt, yt = lonlat_to_tile(lon, lat, z)
    return _pack(xt, yt, z)


def shard_polygons(polygons: list[tuple[object, bytes]], z: int = SHARD_RES
                   ) -> list[dict]:
    """(key, wkb) list → fragment rows ``{cell, slot, key, wkb}``, one per
    covered cell (slot = global position, preserving min-slot semantics)."""
    rows = []
    for slot, (key, blob) in enumerate(polygons):
        xmin, ymin, xmax, ymax = geom_bbox(polygon_rings(blob))
        xs, ys = lonlat_to_tile(np.array([xmin, xmax]), np.array([ymin, ymax]), z)
        for cx in range(int(xs.min()), int(xs.max()) + 1):
            for cy in range(int(ys.min()), int(ys.max()) + 1):
                rows.append({"cell": int(_pack(np.int64(cx), np.int64(cy), z)),
                             "slot": slot, "key": key, "wkb": blob})
    return rows


class CellShardedIndex:
    """Same interface as :class:`PolygonIndex` (keys / assign_all /
    assign_bbox), dispatching each point to its cell's fragment sub-index.
    In-worker form of the sharded layout; the distributed form is
    :func:`assign_zones_cosharded`."""

    def __init__(self, polygons: list[tuple[object, bytes]], z: int = SHARD_RES):
        self.keys = [key for key, _ in polygons]
        self.z = z
        shards: dict[int, list] = {}
        slots: dict[int, list] = {}
        for row in shard_polygons(polygons, z):
            shards.setdefault(row["cell"], []).append((row["key"], row["wkb"]))
            slots.setdefault(row["cell"], []).append(row["slot"])
        self._sub = {c: PolygonIndex(pl) for c, pl in shards.items()}
        self._slots = {c: np.asarray(s, dtype=np.int64) for c, s in slots.items()}

    def __len__(self) -> int:
        return len(self.keys)

    def _dispatch(self, px, py, method: str):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        cells = point_cells(px, py, self.z)
        out_pt, out_poly = [], []
        for c in np.unique(cells):
            sub = self._sub.get(int(c))
            if sub is None:
                continue
            idx = np.nonzero(cells == c)[0]
            pi, gi = getattr(sub, method)(px[idx], py[idx])
            if len(pi):
                out_pt.append(idx[pi])
                out_poly.append(self._slots[int(c)][gi])
        if not out_pt:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pt), np.concatenate(out_poly)

    def assign_all(self, px, py):
        return self._dispatch(px, py, "assign_all")

    def assign_bbox(self, px, py):
        return self._dispatch(px, py, "assign_bbox")


def assign_zones_cosharded(points_ds, polygons: list[tuple[object, bytes]],
                           z: int = SHARD_RES):
    """Distributed co-partitioned PIP: polygon fragments and points meet in
    ONE ``groupby(cell)`` — no polygon broadcast.  Input rows need
    ``lon``/``lat``; output keeps every input column plus
    ``insee``/``zone_via_bbox`` (same contract as the broadcast assigner
    stage in ``stages/parse.py``)."""
    import pandas as pd
    import ray

    frag_rows = shard_polygons(polygons, z)
    nkeys = len(polygons)
    all_keys = [key for key, _ in polygons]

    def tag_points(batch: pa.Table) -> pa.Table:
        cells = point_cells(batch.column("lon").to_numpy(),
                            batch.column("lat").to_numpy(), z)
        return (batch
                .append_column("pipcell", pa.array(cells, type=pa.int64()))
                .append_column("_slot", pa.array(np.full(batch.num_rows, -1, dtype=np.int64)))
                .append_column("_wkb", pa.array([b""] * batch.num_rows, type=pa.binary())))

    pts = points_ds.map_batches(tag_points, batch_format="pyarrow")
    schema = pts.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    point_cols = [c for c in names if c not in ("_slot", "_wkb")]

    frag_t = pa.table({
        "pipcell": pa.array([r["cell"] for r in frag_rows], type=pa.int64()),
        "_slot": pa.array([r["slot"] for r in frag_rows], type=pa.int64()),
        "_wkb": pa.array([r["wkb"] for r in frag_rows], type=pa.binary()),
    })
    for c in point_cols:
        if c != "pipcell" and c not in frag_t.column_names:
            frag_t = frag_t.append_column(c, pa.nulls(frag_t.num_rows, types[c]))
    frags = ray.data.from_arrow(frag_t.select(names))

    def group_assign(df: pd.DataFrame) -> pd.DataFrame:
        is_frag = df["_slot"] >= 0
        p = df[~is_frag]
        g = df[is_frag]
        out = p[[c for c in point_cols if c != "pipcell"]].copy()
        if len(p) == 0:
            out["insee"] = pd.Series(dtype="string")
            out["zone_via_bbox"] = pd.Series(dtype=bool)
            return out.iloc[0:0]
        lon = p["lon"].to_numpy()
        lat = p["lat"].to_numpy()
        NO = np.iinfo(np.int64).max
        slot = np.full(len(p), NO, dtype=np.int64)
        via_bbox = np.zeros(len(p), dtype=bool)
        if len(g):
            sub = PolygonIndex(list(zip(g["_slot"], g["_wkb"])))
            gslots = g["_slot"].to_numpy().astype(np.int64)
            pi, gi = sub.assign_all(lon, lat)
            if len(pi):
                np.minimum.at(slot, pi, gslots[gi])
            missing = np.nonzero(slot == NO)[0]
            if len(missing):
                pi2, gi2 = sub.assign_bbox(lon[missing], lat[missing])
                if len(pi2):
                    np.minimum.at(slot, missing[pi2], gslots[gi2])
                    via_bbox[missing[pi2]] = True
        keys = np.asarray(all_keys + [""], dtype=object)
        out["insee"] = keys[np.where(slot == NO, nkeys, slot)]
        out["zone_via_bbox"] = via_bbox
        return out

    return pts.union(frags).groupby("pipcell").map_groups(
        group_assign, batch_format="pandas")
