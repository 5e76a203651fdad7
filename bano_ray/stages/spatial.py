"""Distance self-join: all point pairs within radius r — the spatial join
a tiling engine runs for "nearby duplicates / cluster candidates".

Shape (grid-bucket join, no all-pairs): every point lands NATIVE in its
``floor(lon/r), floor(lat/r)`` grid cell and PROBES the 3×3 neighborhood,
so any pair within r shares ≥1 cell with one side native and the other
probing; ``native_id < probe_id`` makes each unordered pair emit exactly
once (the reverse orientation fails the id test in the other cell).  The
only shuffle is the cell groupby — via :func:`dedup.bucketed_pairs`'s
coarse-shard grouping, so Ray's per-group dispatch is amortized across
near-unique cells.  The in-bucket verify is one vectorized native×probe
distance matrix.

Partitioning assumption (SURVEY §2 custom-operator rule): points per grid
cell are bounded (the radius matches the physical interaction scale, so a
cell holds O(density·r²) points); the 9× probe fan-out is the simple
exact variant — a production 100 TB run would emit the 5-cell forward
neighborhood instead to halve the fan-out.

Metric: planar Euclidean in degrees (the synthetic world's native frame;
both the engine and the DuckDB oracle evaluate the identical float64
expression, so the boundary is bit-deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import bucketed_pairs

_GY_OFF = 1 << 20          # grid coords offset to non-negative before packing
_GX_MULT = 1 << 21


def _grid_cell(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    return (gx + _GY_OFF) * _GX_MULT + (gy + _GY_OFF)


def distance_selfjoin(ds, radius: float, id_col: str = "doc_id",
                      lon_col: str = "lon", lat_col: str = "lat"):
    """Dataset (id, lon, lat) → pairs (a, b, dist) with dist ≤ radius,
    a < b, dist rounded to 6 places."""
    r2 = radius * radius

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        lon = batch.column(lon_col).to_numpy().astype(np.float64)
        lat = batch.column(lat_col).to_numpy().astype(np.float64)
        gx = np.floor(lon / radius).astype(np.int64)
        gy = np.floor(lat / radius).astype(np.int64)
        n = len(ids)
        # native row + 9 probe rows per point
        parts_cell = [_grid_cell(gx, gy)]
        parts_native = [np.ones(n, dtype=np.int8)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts_cell.append(_grid_cell(gx + dx, gy + dy))
                parts_native.append(np.zeros(n, dtype=np.int8))
        reps = len(parts_cell)
        return pa.table({
            "bucket": pa.array(np.concatenate(parts_cell)),
            "id": pa.array(np.tile(ids, reps)),
            "lon": pa.array(np.tile(lon, reps)),
            "lat": pa.array(np.tile(lat, reps)),
            "native": pa.array(np.concatenate(parts_native)),
        })

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "dist": pd.Series(dtype="float64")})

    def pair_fn(g: pd.DataFrame) -> pd.DataFrame:
        nat = g[g["native"] == 1]
        pro = g[g["native"] == 0]
        if len(nat) == 0 or len(pro) == 0:
            return empty
        ai = nat["id"].to_numpy()
        bi = pro["id"].to_numpy()
        alon, alat = nat["lon"].to_numpy(), nat["lat"].to_numpy()
        blon, blat = pro["lon"].to_numpy(), pro["lat"].to_numpy()
        # chunk the native side so the distance matrix stays ≤ ~4M cells —
        # a degenerate cell (mass co-located points) degrades to more
        # chunks, never to an OOM or a silent drop
        step = max(1, 4_000_000 // max(len(bi), 1))
        parts = []
        for s in range(0, len(ai), step):
            dx = alon[s:s + step, None] - blon[None, :]
            dy = alat[s:s + step, None] - blat[None, :]
            d2 = dx * dx + dy * dy
            keep = (ai[s:s + step, None] < bi[None, :]) & (d2 <= r2)
            ia, ib = np.nonzero(keep)
            if len(ia):
                parts.append(pd.DataFrame({
                    "a": ai[s + ia], "b": bi[ib],
                    "dist": np.round(np.sqrt(d2[ia, ib]), 6)}))
        return pd.concat(parts, ignore_index=True) if parts else empty

    pts = ds.map_batches(emit, batch_format="pyarrow")
    return bucketed_pairs(pts, pair_fn, key="bucket")


def knn_graph(ds, radius_u: int, k: int = 3, id_col: str = "doc_id",
              ix_col: str = "ix", iy_col: str = "iy"):
    """Bounded-radius exact kNN graph: for every point, its ``k`` nearest
    OTHER points within ``radius_u`` integer micro-degrees —
    ``(doc_id, rank, nbr_id, d2_u)`` with rank 1..k by ``(d2_u, nbr_id)``.

    Same grid-bucket shape as :func:`distance_selfjoin` (native row + 3×3
    probe fan-out at cell size = radius, so every in-radius candidate of a
    native shares its cell), but the per-cell verify finishes the
    PER-POINT top-k instead of emitting pairs: one native×probe int64
    distance matrix (chunked against degenerate cells), one flat lexsort
    ``(a, d2, b)``, rank cut — a point's whole candidate set is cell-local,
    so the top-k is final with no second shuffle.  The bounded radius is
    what makes the operator single-pass-exact at scale: unbounded kNN
    needs expanding-ring probes for isolated points.

    Metric: exact int64 squared micro-degree distance — tie-break by
    neighbor id is total, so the SQL oracle (oracle.q_knn_graph
    ROW_NUMBER) reproduces ranks bit-for-bit.
    """
    r2 = int(radius_u) * int(radius_u)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        ix = batch.column(ix_col).to_numpy().astype(np.int64)
        iy = batch.column(iy_col).to_numpy().astype(np.int64)
        gx = ix // radius_u
        gy = iy // radius_u
        n = len(ids)
        parts_cell = [_grid_cell(gx, gy)]
        parts_native = [np.ones(n, dtype=np.int8)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts_cell.append(_grid_cell(gx + dx, gy + dy))
                parts_native.append(np.zeros(n, dtype=np.int8))
        reps = len(parts_cell)
        return pa.table({
            "bucket": pa.array(np.concatenate(parts_cell)),
            "id": pa.array(np.tile(ids, reps)),
            "ix": pa.array(np.tile(ix, reps)),
            "iy": pa.array(np.tile(iy, reps)),
            "native": pa.array(np.concatenate(parts_native)),
        })

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "rank": pd.Series(dtype="int64"),
                          "nbr_id": pd.Series(dtype="int64"),
                          "d2_u": pd.Series(dtype="int64")})

    def topk_fn(g: pd.DataFrame) -> pd.DataFrame:
        nat = g[g["native"] == 1]
        pro = g[g["native"] == 0]
        if len(nat) == 0 or len(pro) == 0:
            return empty
        ai = nat["id"].to_numpy()
        bi = pro["id"].to_numpy()
        ax, ay = nat["ix"].to_numpy(), nat["iy"].to_numpy()
        bx, by = pro["ix"].to_numpy(), pro["iy"].to_numpy()
        step = max(1, 4_000_000 // max(len(bi), 1))
        pa_, pb, pd2 = [], [], []
        for s in range(0, len(ai), step):
            dx = ax[s:s + step, None] - bx[None, :]
            dy = ay[s:s + step, None] - by[None, :]
            d2 = dx * dx + dy * dy
            keep = (ai[s:s + step, None] != bi[None, :]) & (d2 <= r2)
            ia, ib = np.nonzero(keep)
            if len(ia):
                pa_.append(ai[s + ia]); pb.append(bi[ib]); pd2.append(d2[ia, ib])
        if not pa_:
            return empty
        a = np.concatenate(pa_); b = np.concatenate(pb)
        d2 = np.concatenate(pd2)
        order = np.lexsort((b, d2, a))
        a, b, d2 = a[order], b[order], d2[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = a[1:] != a[:-1]
        starts = np.maximum.accumulate(
            np.where(first, np.arange(len(a)), 0))
        rank = np.arange(len(a)) - starts + 1
        cut = rank <= k
        return pd.DataFrame({"doc_id": a[cut], "rank": rank[cut],
                             "nbr_id": b[cut], "d2_u": d2[cut]})

    pts = ds.map_batches(emit, batch_format="pyarrow")
    return bucketed_pairs(pts, topk_fn, key="bucket")
