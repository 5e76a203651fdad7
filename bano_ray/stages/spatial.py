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


# ---------------------------------------------------------------------------
# Inverse-distance-weighted (IDW) grid interpolation census
# ---------------------------------------------------------------------------

IDW_CELL_U = 50_000          # grid pitch in µ°
IDW_R2_U = IDW_CELL_U * IDW_CELL_U   # influence radius² = one pitch
IDW_W_SCALE = 10 ** 12       # integer weight = W_SCALE // max(d2, 1)
IDW_VAL_MOD = 256
IDW_OFF_U = 1_000_000_000     # non-negative shift (multiple of IDW_CELL_U)


def idw_partial(batch: pa.Table) -> pa.Table:
    """Per-block IDW partials: every point contributes to its own and the
    8 neighboring grid cells' CENTERS when within the influence radius;
    weights are EXACT integers (``W_SCALE // max(d2, 1)``, d2 in µ°²), so
    the per-cell weighted sums are order-independent BIGINTs — the
    float-summation nondeterminism classic IDW hits in distributed runs
    is designed out.  Point value = hash of doc_id (closed-form, SQL-
    replicable).  Emits (cx, cy, n_pts, sw, swv) combiner rows."""
    d = batch.column("doc_id").to_numpy().astype(np.int64)
    ix = np.floor(batch.column("lon").to_numpy() * 1e6 + 0.5).astype(np.int64)
    iy = np.floor(batch.column("lat").to_numpy() * 1e6 + 0.5).astype(np.int64)
    val = (d * 2654435761) % IDW_VAL_MOD
    C = np.int64(IDW_CELL_U)
    # non-negative shift before the floor-div: numpy floors toward -inf
    # while DuckDB's // truncates on negatives — the shared convention is
    # divide-on-non-negative only (IDW_OFF_U divisible by the pitch, so
    # cell ids and centers are unchanged for positive coords)
    OFF = np.int64(IDW_OFF_U)
    gx = (ix + OFF) // C - OFF // C
    gy = (iy + OFF) // C - OFF // C
    rows_cx, rows_cy, rows_n, rows_sw, rows_swv = [], [], [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            cx = gx + dx
            cy = gy + dy
            ctr_x = cx * C + C // 2
            ctr_y = cy * C + C // 2
            d2 = (ix - ctr_x) ** 2 + (iy - ctr_y) ** 2
            m = d2 <= IDW_R2_U
            if not m.any():
                continue
            w = IDW_W_SCALE // np.maximum(d2[m], 1)
            key = _grid_cell(cx[m], cy[m])
            uk, inv = np.unique(key, return_inverse=True)
            rows_cx.append(uk // _GX_MULT - _GY_OFF)
            rows_cy.append(uk % _GX_MULT - _GY_OFF)
            rows_n.append(np.bincount(inv, minlength=len(uk)).astype(np.int64))
            # int64 scatter-adds, NOT float bincount: per-point weights
            # reach 1e12, so a dense cell's float sum would pass 2^53 and
            # silently lose exactness (the whole point of integer IDW)
            sw = np.zeros(len(uk), dtype=np.int64)
            np.add.at(sw, inv, w)
            swv = np.zeros(len(uk), dtype=np.int64)
            np.add.at(swv, inv, w * val[m])
            rows_sw.append(sw)
            rows_swv.append(swv)
    if not rows_cx:
        z = pa.array(np.empty(0, np.int64))
        return pa.table({"cx": z, "cy": z, "n_pts": z, "sw": z, "swv": z})
    return pa.table({
        "cx": pa.array(np.concatenate(rows_cx)),
        "cy": pa.array(np.concatenate(rows_cy)),
        "n_pts": pa.array(np.concatenate(rows_n)),
        "sw": pa.array(np.concatenate(rows_sw)),
        "swv": pa.array(np.concatenate(rows_swv)),
    })


def idw_grid(pts_ds):
    """(cx, cy, n_pts, sw, swv): IDW interpolation partials aggregated to
    one row per grid cell — the raster-interpolation pass (heatmaps,
    coverage surfaces) over the geotagged point stream.  ONE cell-sized
    groupby; bincount combiner per block."""
    from ray.data.aggregate import Sum

    return (pts_ds.map_batches(idw_partial, batch_format="pyarrow")
            .groupby(["cx", "cy"])
            .aggregate(Sum("n_pts", alias_name="n_pts"),
                       Sum("sw", alias_name="sw"),
                       Sum("swv", alias_name="swv")))
