"""Raster → vector: connected-component extraction over an occupancy grid.

The reference pipeline only ever goes vector → raster (tile expiry lists,
``bano/models.py`` tile math); a geospatial training-data engine also needs
the opposite direction — given a rasterized density grid, recover the
vector objects (blobs of occupied cells with their extents), e.g. to turn
heatmaps back into candidate regions.  This stage composes three
already-scale-shaped pieces:

1. per-batch bincount partials over the grid cell id (batch-local, the
   shuffle carries ≤ GRID cells per block),
2. ONE grid-bounded groupby sum → the occupied-cell table (dim-sized:
   ≤ ``RV_GX·RV_GY`` rows regardless of corpus size),
3. 4-connected adjacency edges + min-label connected components by
   union-find on the GRID-bounded cell graph, then the per-component
   aggregate — a dim-bounded driver finish (the same bounded-finish
   discipline as the other dim-sized reduces; the distributed CC of
   ``stages/graph.py`` is for corpus-sized node sets).

Cell arithmetic mirrors ``datagen.zone_of`` (floor-scale-clip, identical
double op order in numpy and DuckDB) so the oracle replays it closed-form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import datagen

RV_GX, RV_GY = 64, 56            # 8× the zone grid in each axis
RV_MIN_COUNT = 1                 # occupancy threshold (cells with ≥ n points)


def cell_of(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Grid cell id 0..RV_GX·RV_GY-1 — same floor/clip arithmetic as
    datagen.zone_of, at raster resolution."""
    gx = np.floor((lon - datagen.LON0) / datagen.LON_SPAN * RV_GX)
    gy = np.floor((lat - datagen.LAT0) / datagen.LAT_SPAN * RV_GY)
    gx = np.clip(gx.astype(np.int64), 0, RV_GX - 1)
    gy = np.clip(gy.astype(np.int64), 0, RV_GY - 1)
    return gx * RV_GY + gy


def occupancy_partial(batch: pa.Table) -> pa.Table:
    """doc_id batch → per-batch (cell, n) partial counts."""
    d = batch.column("doc_id").to_numpy()
    lon, lat = datagen.lon_lat(d)
    cell = cell_of(lon, lat)
    uk, cnt = np.unique(cell, return_counts=True)
    return pa.table({"cell": pa.array(uk),
                     "n": pa.array(cnt.astype(np.int64))})


def _adjacency_edges(cells: np.ndarray) -> pd.DataFrame:
    """4-connected edges among occupied cells: for each cell, its right
    (gy+1, same column-major stripe) and down (gx+1) neighbor when also
    occupied.  One vectorized membership probe — no cell loop."""
    cells = np.sort(cells)
    right = cells + 1
    right_ok = (cells % RV_GY != RV_GY - 1) & np.isin(right, cells)
    down = cells + RV_GY
    down_ok = np.isin(down, cells)
    a = np.concatenate([cells[right_ok], cells[down_ok]])
    b = np.concatenate([right[right_ok], down[down_ok]])
    return pd.DataFrame({"a": a, "b": b})


def _min_label_components(cells: np.ndarray, ea: np.ndarray,
                          eb: np.ndarray) -> np.ndarray:
    """Union-find over the (dim-bounded) occupied-cell graph; returns the
    MIN cell id of each cell's component, aligned with ``cells``."""
    idx = {int(c): i for i, c in enumerate(cells)}
    parent = np.arange(len(cells), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(ea, eb):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.fromiter((find(i) for i in range(len(cells))),
                        dtype=np.int64, count=len(cells))
    # label = min cell id in the component (cells may be unsorted)
    lab = np.full(len(cells), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(lab, roots, cells)
    return lab[roots]


def raster_components(sf_dir: str, min_count: int = RV_MIN_COUNT):
    """(label, n_cells, n_points, gx_min, gx_max, gy_min, gy_max): the
    vectorized blobs of the occupancy raster — label = min cell id in the
    component, bbox in grid coordinates.  Returns a pyarrow Table (the
    component table is dim-bounded by the grid)."""
    from ray.data.aggregate import Sum

    from .tracks import _doc_ids

    occ = (_doc_ids(sf_dir)
           .map_batches(occupancy_partial, batch_format="pyarrow")
           .groupby("cell").aggregate(Sum("n", alias_name="n")))
    occ_df = occ.to_pandas()
    occ_df = occ_df[occ_df["n"] >= min_count]
    cells = occ_df["cell"].to_numpy().astype(np.int64)

    edges = _adjacency_edges(cells)
    # the occupied-cell graph is GRID-bounded (≤ RV_GX·RV_GY nodes) no
    # matter the corpus size, so union-find here is the scale-correct
    # finish — the distributed CC of stages/graph.py is for corpus-sized
    # node sets (its fixed per-round shuffle cost dwarfs this table)
    merged = occ_df.copy()
    merged["label"] = _min_label_components(
        cells, edges["a"].to_numpy(), edges["b"].to_numpy())
    merged["gx"] = merged["cell"] // RV_GY
    merged["gy"] = merged["cell"] % RV_GY
    agg = (merged.groupby("label")
           .agg(n_cells=("cell", "size"), n_points=("n", "sum"),
                gx_min=("gx", "min"), gx_max=("gx", "max"),
                gy_min=("gy", "min"), gy_max=("gy", "max"))
           .reset_index().sort_values("label").reset_index(drop=True))
    return pa.Table.from_pandas(agg, preserve_index=False)
