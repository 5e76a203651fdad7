"""Hierarchical spatial cell index — from-scratch, numpy-vectorized.

Cells are Web-Mercator quadtree tiles (z, x, y) packed into one int64:
``cell = (z << 58) | morton(x, y)`` with bit-interleaved x/y so that a
parent is a cheap shift+repack.  This replaces the reference's
commune/INSEE partitioning (every reference extraction is
``WHERE "ref:INSEE" = '__com__'``, e.g. ``bano/sql/hsnr_insee.sql:20-25``)
with a uniform, scale-free partition key: ONE `groupby(cell)` shuffle
instead of ~35k per-commune point queries.

Tile ↔ mercator-bbox math replicates the reference's expire-tile constants
EXACTLY (truncated ``-20037508.34`` / ``40075016.68``, ``bano/models.py:310-313``)
so tile→zone membership matches.
"""

from __future__ import annotations

import numpy as np

# Reference's truncated web-mercator constants (bano/models.py:310-313).
MERC_ORIGIN = -20037508.34
MERC_SPAN = 40075016.68

MAX_Z = 28  # 2*28 bits of morton + 5 bits of level fits int64


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits of a uint32 → uint64 (morton helper)."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact_bits64(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def morton(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return _spread_bits32(np.asarray(x)) | (_spread_bits32(np.asarray(y)) << np.uint64(1))


def lonlat_to_tile(lon, lat, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized slippy-map tile coordinates at zoom ``z``."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = float(1 << z)
    xt = np.floor((lon + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat)
    yt = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n)
    xt = np.clip(xt, 0, n - 1).astype(np.int64)
    yt = np.clip(yt, 0, n - 1).astype(np.int64)
    return xt, yt


def cell_encode(lon, lat, z: int) -> np.ndarray:
    """lon/lat arrays → int64 cell ids at resolution ``z``."""
    xt, yt = lonlat_to_tile(lon, lat, z)
    m = morton(xt, yt)
    return ((np.uint64(z) << np.uint64(58)) | m).astype(np.int64)


def cell_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cells → (z, x, y) arrays."""
    c = np.asarray(cell).astype(np.uint64)
    z = (c >> np.uint64(58)).astype(np.int64)
    m = c & np.uint64((1 << 58) - 1)
    x = _compact_bits64(m).astype(np.int64)
    y = _compact_bits64(m >> np.uint64(1)).astype(np.int64)
    return z, x, y


def cell_parent(cell, steps: int = 1) -> np.ndarray:
    z, x, y = cell_decode(cell)
    nz = z - steps
    if np.any(nz < 0):
        raise ValueError("cell_parent below resolution 0")
    m = morton(x >> steps, y >> steps)
    return ((nz.astype(np.uint64) << np.uint64(58)) | m).astype(np.int64)


def cell_children(cell: int) -> np.ndarray:
    z, x, y = cell_decode([cell])
    z, x, y = int(z[0]), int(x[0]), int(y[0])
    xs = np.repeat([2 * x, 2 * x + 1], 2)
    ys = np.tile([2 * y, 2 * y + 1], 2)
    m = morton(xs, ys)
    return ((np.uint64(z + 1) << np.uint64(58)) | m).astype(np.int64)


def tile_bbox_mercator(z, x, y) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """z/x/y → mercator-meter bbox with the reference's exact truncated
    constants (``bano/models.py:310-313``)."""
    z = np.asarray(z, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    size = MERC_SPAN / (2.0 ** z)
    xmin = MERC_ORIGIN + size * x
    xmax = MERC_ORIGIN + size * (x + 1)
    ymin = -MERC_ORIGIN - size * (y + 1)
    ymax = -MERC_ORIGIN - size * y
    return xmin, ymin, xmax, ymax


def mercator_to_lonlat(mx, my) -> tuple[np.ndarray, np.ndarray]:
    """Inverse mercator using the same truncated constants, so tile bboxes
    and lon/lat geometry live in one consistent frame."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = mx / -MERC_ORIGIN * 180.0
    # explicit (exp(x)-exp(-x))/2 instead of sinh: mirrored verbatim in the
    # DuckDB oracle (which has no sinh) so both sides round identically
    x = my / -MERC_ORIGIN * np.pi
    lat = np.degrees(np.arctan((np.exp(x) - np.exp(-x)) / 2.0))
    return lon, lat


def tile_bbox_lonlat(z, x, y) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    xmin, ymin, xmax, ymax = tile_bbox_mercator(z, x, y)
    lon0, lat0 = mercator_to_lonlat(xmin, ymin)
    lon1, lat1 = mercator_to_lonlat(xmax, ymax)
    return lon0, lat0, lon1, lat1


def cover_bbox(lon_min: float, lat_min: float, lon_max: float, lat_max: float,
               z: int) -> np.ndarray:
    """All cells at resolution ``z`` intersecting a lon/lat bbox."""
    x0, y1 = lonlat_to_tile(lon_min, lat_min, z)  # y grows southward
    x1, y0 = lonlat_to_tile(lon_max, lat_max, z)
    xs = np.arange(int(x0), int(x1) + 1, dtype=np.int64)
    ys = np.arange(int(y0), int(y1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    m = morton(gx.ravel(), gy.ravel())
    return ((np.uint64(z) << np.uint64(58)) | m).astype(np.int64)


def tiles_to_cells(z_t, x_t, y_t, cell_res: int) -> np.ndarray:
    """Expire tiles (z/x/y, typically z16) → engine cells at ``cell_res``.

    For tiles deeper than ``cell_res`` this is the ancestor cell; for coarser
    tiles it is the full set of descendant cells.  Drives incremental
    recompute (reference ``bano/models.py:330-360``).
    """
    z_t = np.asarray(z_t, dtype=np.int64)
    x_t = np.asarray(x_t, dtype=np.int64)
    y_t = np.asarray(y_t, dtype=np.int64)
    cells: list[np.ndarray] = []
    deeper = z_t >= cell_res
    if deeper.any():
        shift = (z_t[deeper] - cell_res).astype(np.int64)
        m = morton(x_t[deeper] >> shift, y_t[deeper] >> shift)
        cells.append(((np.uint64(cell_res) << np.uint64(58)) | m).astype(np.int64))
    for z, x, y in zip(z_t[~deeper], x_t[~deeper], y_t[~deeper]):
        k = cell_res - int(z)
        xs = np.arange(int(x) << k, (int(x) + 1) << k, dtype=np.int64)
        ys = np.arange(int(y) << k, (int(y) + 1) << k, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys)
        m = morton(gx.ravel(), gy.ravel())
        cells.append(((np.uint64(cell_res) << np.uint64(58)) | m).astype(np.int64))
    if not cells:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(cells))


def ring_smooth(ds, z: int):
    """Per-tile 3×3 neighborhood point counts (k-ring smoothing, the
    raster convolution primitive): every cell's value is the number of
    points in it and its 8 neighbors — (cell_x, cell_y, n_ring), cells with
    a nonzero ring included even when empty themselves.

    Shape: per-block PARTIAL cell counts first (the combiner — O(distinct
    cells), not O(points)), then each partial count SCATTERS to its 9
    neighbor cells inside the same ``map_batches`` (9× a small table — no
    self-join, no second shuffle), and ONE groupby-sum finishes.  No
    boundary clipping on the scattered coordinates, matching the oracle's
    arithmetic."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial_scatter(batch: pa.Table) -> pa.Table:
        x, y = lonlat_to_tile(batch.column("lon").to_numpy(),
                              batch.column("lat").to_numpy(), z)
        key = (x << np.int64(32)) | y            # z ≤ 31 → both halves safe
        codes, uk = pd.factorize(key)
        cnt = np.bincount(codes).astype(np.int64)
        ux, uy = uk >> np.int64(32), uk & np.int64(0xFFFFFFFF)
        dx = np.repeat(np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], np.int64),
                       len(uk))
        dy = np.repeat(np.array([-1, 0, 1] * 3, np.int64), len(uk))
        return pa.table({
            "cell_x": pa.array(np.tile(ux, 9) + dx),
            "cell_y": pa.array(np.tile(uy, 9) + dy),
            "n": pa.array(np.tile(cnt, 9)),
        })

    return (ds.map_batches(partial_scatter, batch_format="pyarrow")
            .groupby(["cell_x", "cell_y"])
            .aggregate(Sum("n", alias_name="n_ring")))


def tile_pyramid(ds, z_hi: int, z_lo: int):
    """Multi-zoom tile-count pyramid (the map-rendering aggregation): point
    counts per (z, x, y) for every zoom in [z_lo, z_hi] — parent counts are
    exact sums of their children.

    Shape: ONE pass — per-block partial counts at ``z_hi`` (the combiner),
    then each partial scatters to its ancestor tile at every coarser zoom
    (x >> k, y >> k) inside the same ``map_batches``; a single
    groupby-sum over (z, x, y) finishes.  The scatter factor is
    ``z_hi - z_lo + 1`` rows per distinct base tile — no per-level
    iteration, no repeated shuffles."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    nlev = z_hi - z_lo + 1

    def partial_scatter(batch: pa.Table) -> pa.Table:
        x, y = lonlat_to_tile(batch.column("lon").to_numpy(),
                              batch.column("lat").to_numpy(), z_hi)
        key = (x << np.int64(32)) | y
        codes, uk = pd.factorize(key)
        cnt = np.bincount(codes).astype(np.int64)
        ux, uy = uk >> np.int64(32), uk & np.int64(0xFFFFFFFF)
        shifts = np.repeat(np.arange(nlev, dtype=np.int64), len(uk))
        return pa.table({
            "z": pa.array(np.int64(z_hi) - shifts),
            "x": pa.array(np.tile(ux, nlev) >> shifts),
            "y": pa.array(np.tile(uy, nlev) >> shifts),
            "n": pa.array(np.tile(cnt, nlev)),
        })

    return (ds.map_batches(partial_scatter, batch_format="pyarrow")
            .groupby(["z", "x", "y"])
            .aggregate(Sum("n", alias_name="n_points")))


QT_THRESHOLD = 64


def quadtree_leaves(ds, z_hi: int, z_lo: int, threshold: int = QT_THRESHOLD):
    """Adaptive quadtree build over the point stream: the leaf tiles a
    density-adaptive spatial index keeps (split while a tile holds more
    than ``threshold`` points, to at most ``z_hi``).

    The leaf rule is LOCAL — no recursion and no iteration: tile counts
    are monotone up the tree (a parent's count ≥ any child's), so "every
    proper ancestor is internal (n > T)" collapses to "the parent is
    internal", and a tile is a leaf iff
    ``(z == z_lo OR parent_n > T) AND (n <= T OR z == z_hi)``.

    Shape: one :func:`tile_pyramid` pass (combiner + ancestor scatter +
    ONE groupby-sum), then the parent join runs as a tagged co-group on a
    coarse shard of the PARENT key (each pyramid cell emits itself once
    as a potential parent and once keyed to its parent as a child; a
    cell's parent always exists in the pyramid, so the lookup is a shard-
    local searchsorted — no second all-to-all beyond the small pyramid
    re-key).  Output: (z, x, y, n_points) of the leaf tiles.
    """
    import pandas as pd
    import pyarrow as pa

    pyr = tile_pyramid(ds, z_hi, z_lo)
    C = 1024

    def tag(batch: pa.Table) -> pa.Table:
        z = batch.column("z").to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        n = batch.column("n_points").to_numpy()
        selfkey = (z << np.int64(32)) | (x << np.int64(16)) | y
        child = z > z_lo
        pkey = (((z - 1) << np.int64(32))
                | ((x >> np.int64(1)) << np.int64(16)) | (y >> np.int64(1)))
        key = np.concatenate([selfkey, pkey[child]])
        kind = np.concatenate([np.zeros(len(z), np.int64),
                               np.ones(int(child.sum()), np.int64)])
        return pa.table({
            "key": pa.array(key),
            "kind": pa.array(kind),
            "z": pa.array(np.concatenate([z, z[child]])),
            "x": pa.array(np.concatenate([x, x[child]])),
            "y": pa.array(np.concatenate([y, y[child]])),
            "n": pa.array(np.concatenate([n, n[child]])),
            "_shard": pa.array((key % np.int64(C)).astype(np.int64)),
        })

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        par = df[df["kind"] == 0].sort_values("key")
        pk = par["key"].to_numpy()
        pn = par["n"].to_numpy()
        ch = df[df["kind"] == 1]
        pos = np.searchsorted(pk, ch["key"].to_numpy())
        # every child's parent exists in the pyramid and shares the shard
        parent_n = pn[pos]
        cn = ch["n"].to_numpy()
        cz = ch["z"].to_numpy()
        leaf_c = (parent_n > threshold) & ((cn <= threshold) | (cz == z_hi))
        root = par[par["z"].to_numpy() == z_lo]
        rn = root["n"].to_numpy()
        leaf_r = (rn <= threshold) | (z_lo == z_hi)
        out = pd.concat([ch[leaf_c], root[leaf_r]], ignore_index=True)
        return (out[["z", "x", "y", "n"]]
                .rename(columns={"n": "n_points"}))

    return (pyr.map_batches(tag, batch_format="pyarrow")
            .groupby("_shard").map_groups(resolve, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Geohash encoding
# ---------------------------------------------------------------------------

GEOHASH_CHARS = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_BITS = 15        # per axis → 6 base32 chars (30 bits)


def geohash6(lon, lat) -> np.ndarray:
    """Vectorized 6-char geohash: 15 quantized bits per axis interleaved
    lon-first (standard geohash bit order), 5-bit groups → base32.  The
    quantization ``floor((lon+180)/360 · 2^15)`` is a chain of
    correctly-rounded double ops, so the SQL oracle reproduces the codes
    bit-for-bit."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = float(1 << GEOHASH_BITS)
    ix = np.minimum(np.floor((lon + 180.0) / 360.0 * n),
                    n - 1).astype(np.int64)
    iy = np.minimum(np.floor((lat + 90.0) / 180.0 * n),
                    n - 1).astype(np.int64)
    g = np.zeros(len(ix), dtype=np.int64)
    for k in range(2 * GEOHASH_BITS):
        src, b = (ix, GEOHASH_BITS - 1 - k // 2) if k % 2 == 0 \
            else (iy, GEOHASH_BITS - 1 - (k - 1) // 2)
        g |= ((src >> b) & 1) << (2 * GEOHASH_BITS - 1 - k)
    chars = np.frombuffer(GEOHASH_CHARS.encode(), dtype=np.uint8)
    out = np.empty((len(g), 6), dtype=np.uint8)
    for i in range(6):
        out[:, i] = chars[(g >> (25 - 5 * i)) & 31]
    return out.view(dtype="S6").ravel().astype("U6").astype(object)


# --- axial hexagon binning (H3-style hex cells, flat math) -----------------

HEX_SIZE = 0.25   # hex circumradius in degrees
# pointy-top axial basis constants, pinned as the exact doubles used on
# both sides (the SQL oracle embeds their repr)
HEX_A = 0.5773502691896257   # sqrt(3)/3
HEX_B = 0.3333333333333333   # 1/3
HEX_C = 0.6666666666666666   # 2/3


def hex_qr(lon, lat, size: float = HEX_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """Axial hex-cell coordinates (q, r) for pointy-top hexagons of
    circumradius ``size`` degrees — the H3-style hex binning primitive
    (the north-star's hex-cell replacement for square tiles; hexes have
    uniform neighbor distance, so k-ring smoothing is isotropic).

    Fractional axial coords use the standard basis, cube rounding uses
    the tie-free floor(v+0.5) convention, and the largest-residual fixup
    runs as strict-> comparisons — every op is an IEEE double op in a
    pinned order, so the SQL oracle (oracle.q_hex_cells) reproduces the
    integer cells bit-for-bit."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    q = ((x * HEX_A) - (y * HEX_B)) / size
    r = (y * HEX_C) / size
    s = (0.0 - q) - r
    rq = np.floor(q + 0.5)
    rr = np.floor(r + 0.5)
    rs = np.floor(s + 0.5)
    dq = np.abs(rq - q)
    dr = np.abs(rr - r)
    ds = np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    hq = np.where(fix_q, (0.0 - rr) - rs, rq)
    hr = np.where(fix_r, (0.0 - rq) - rs, rr)
    return hq.astype(np.int64), hr.astype(np.int64)
