"""Street-crossing census: exact segment-intersection self-join.

The computational-geometry join a geospatial pipeline needs that plain
PIP / distance joins can't express: which pairs of streets CROSS (their
polyline segments properly intersect), per zone.  The reference carries
street geometry only to a label point (``bano/models.py`` point_par_rue);
this is the §2 custom-operator extension for intersection-aware exports
(turn restrictions, junction inventories).

Shape — two bounded exchanges, no all-pairs:

1. segments build exactly like ``stages/tracks.py`` (coarse track-shard +
   ONE flat lexsort, consecutive micro-degree points of each
   (zone, street) track);
2. each segment lands in every grid cell its bbox covers (``flat_map``
   fan-out, bounded by bbox size / CELL); the cell ``groupby`` runs
   through :func:`dedup.bucketed_pairs`' coarse-shard grouping;
3. in-cell candidate pairs are tested with STRICT integer orientation
   signs (int64 cross products — coords span ≤ one zone box, products
   ≤ ~6.2e12) and deduplicated locally by the CANONICAL-CELL rule: a
   pair counts only in the cell containing the lower-left corner of its
   two bboxes' overlap rectangle — both segments provably cover that
   cell, and exactly one cell satisfies it, so no distinct shuffle is
   ever needed;
4. a (zone × street-pair)-sized ``groupby`` sums the counts.

Partitioning assumption (SURVEY §2 custom-operator rule): segments per
grid cell are bounded (CELL tracks the physical street-segment scale);
the pair kernel chunks its candidate matrices, so a degenerate cell
degrades to more chunks, never an OOM or a silent drop.

Only proper crossings count (strict sign straddle both ways) — shared
endpoints / collinear overlaps of touching streets are NOT crossings, and
the strictness makes the census exactly value-replicable in DuckDB
(``oracle.q_street_crossings`` joins per zone without cells; different
plan, same result).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import bucketed_pairs
from .tracks import _ordered, _sharded, _ZID_MULT

CELL = 100_000  # grid pitch in micro-degrees (0.1°)

_SEG_COLS = ["zid", "ax", "ay", "bx", "by", "sidx"]


def _segments_group(df: pd.DataFrame) -> pd.DataFrame:
    """One track shard → its segments (endpoints ordered by doc_id)."""
    z, d, ix, iy, first, _ = _ordered(df)
    if not len(z):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in _SEG_COLS})
    keep = ~first[1:]  # consecutive rows of the same track
    return pd.DataFrame({
        "zid": z[1:][keep],
        "ax": ix[:-1][keep], "ay": iy[:-1][keep],
        "bx": ix[1:][keep], "by": iy[1:][keep],
        "sidx": (z[1:][keep] % _ZID_MULT),
    })


def _cells_emit(batch: pa.Table) -> pa.Table:
    """Segment → one row per bbox-covered grid cell."""
    df = batch.to_pandas()
    ax, ay = df["ax"].to_numpy(), df["ay"].to_numpy()
    bx, by = df["bx"].to_numpy(), df["by"].to_numpy()
    x0, x1 = np.minimum(ax, bx) // CELL, np.maximum(ax, bx) // CELL
    y0, y1 = np.minimum(ay, by) // CELL, np.maximum(ay, by) // CELL
    nx, ny = (x1 - x0 + 1), (y1 - y0 + 1)
    reps = (nx * ny).astype(np.int64)
    idx = np.repeat(np.arange(len(df)), reps)
    # per-row local cell offsets 0..reps-1 → (dx, dy) in the bbox rect
    local = np.arange(reps.sum()) - np.repeat(
        np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
    cx = x0[idx] + local % nx[idx]
    cy = y0[idx] + local // nx[idx]
    out = {c: pa.array(df[c].to_numpy()[idx]) for c in _SEG_COLS}
    out["bucket"] = pa.array(cx * (1 << 22) + cy)
    return pa.table(out)


_EMPTY_PAIRS = pd.DataFrame({
    "zid": pd.Series(dtype="int64"), "sidx_a": pd.Series(dtype="int64"),
    "sidx_b": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})


def _pair_fn(g: pd.DataFrame) -> pd.DataFrame:
    n = len(g)
    if n < 2:
        return _EMPTY_PAIRS
    cell = int(g["bucket"].iloc[0])
    ccx, ccy = cell >> 22, cell & ((1 << 22) - 1)
    ax = g["ax"].to_numpy()
    ay = g["ay"].to_numpy()
    bx = g["bx"].to_numpy()
    by = g["by"].to_numpy()
    zid = g["zid"].to_numpy()
    zone = zid // _ZID_MULT
    sx = g["sidx"].to_numpy()
    mnx, mxx = np.minimum(ax, bx), np.maximum(ax, bx)
    mny, mxy = np.minimum(ay, by), np.maximum(ay, by)
    # chunk the i-side so candidate matrices stay ≤ ~4M cells
    step = max(1, 4_000_000 // n)
    parts = []
    for s in range(0, n, step):
        i = slice(s, min(s + step, n))
        # candidate mask: same zone, street_a < street_b (each unordered
        # street pair tested once), canonical cell == this cell
        mask = ((zone[i, None] == zone[None, :])
                & (sx[i, None] < sx[None, :])
                & (np.maximum(mnx[i, None], mnx[None, :]) // CELL == ccx)
                & (np.maximum(mny[i, None], mny[None, :]) // CELL == ccy))
        ii, jj = np.nonzero(mask)
        if not len(ii):
            continue
        ii += s
        # strict orientation straddle tests, all int64
        d1x, d1y = bx[ii] - ax[ii], by[ii] - ay[ii]
        o1 = d1x * (ay[jj] - ay[ii]) - d1y * (ax[jj] - ax[ii])
        o2 = d1x * (by[jj] - ay[ii]) - d1y * (bx[jj] - ax[ii])
        d2x, d2y = bx[jj] - ax[jj], by[jj] - ay[jj]
        o3 = d2x * (ay[ii] - ay[jj]) - d2y * (ax[ii] - ax[jj])
        o4 = d2x * (by[ii] - ay[jj]) - d2y * (bx[ii] - ax[jj])
        hit = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) \
            & (((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0)))
        if hit.any():
            ii, jj = ii[hit], jj[hit]
            parts.append(pd.DataFrame({
                "zid": zid[ii],
                "sidx_a": np.minimum(sx[ii], sx[jj]),
                "sidx_b": np.maximum(sx[ii], sx[jj]),
                "n": np.ones(len(ii), dtype=np.int64)}))
    return (pd.concat(parts, ignore_index=True) if parts
            else _EMPTY_PAIRS)


def street_crossings(sf_dir: str):
    """(insee, sidx_a, sidx_b, n_crossings): proper segment intersections
    between different streets of the same zone."""
    from ray.data.aggregate import Sum

    segs = _sharded(sf_dir).map_groups(_segments_group,
                                       batch_format="pandas")
    cells = segs.map_batches(_cells_emit, batch_format="pyarrow")
    pairs = bucketed_pairs(cells, _pair_fn, key="bucket")

    def finish(batch: pa.Table) -> pa.Table:
        zone = batch.column("zid").to_numpy() // _ZID_MULT
        insee = np.char.zfill((zone + 1).astype("U"), 5).astype(object)
        return pa.table({
            "insee": pa.array(insee, pa.string()),
            "sidx_a": batch.column("sidx_a"),
            "sidx_b": batch.column("sidx_b"),
            "n": batch.column("n"),
        })

    return (pairs.map_batches(finish, batch_format="pyarrow")
            .groupby(["insee", "sidx_a", "sidx_b"])
            .aggregate(Sum("n", alias_name="n_crossings")))
