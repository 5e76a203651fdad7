"""HMM (Viterbi) map-matching over per-zone street candidates.

The reference's merge assigns points to streets by NORMALIZED NAME KEY
(``bano/models.py`` — there is no geometric matcher); a geospatial engine
over raw traces needs the geometric form: each track (the per-(zone,
street) point sequence) is matched against the candidate streets of its
zone with the classic HMM decomposition — per-point EMISSION cost
(squared distance to the candidate's centroid) plus a uniform SWITCH
penalty for changing candidate between consecutive points — and Viterbi
gives the min-cost assignment.

Exactness (the oracle replays this in SQL): all costs are int64 —
emission = (ux−cx)² + (uy−cy)² on OFFSET-shifted micro-degree ints
(shifting keeps sums non-negative so the centroid's floor division
``sum // n`` agrees between numpy and DuckDB ``//``), transitions add the
integer ``MM_SWITCH_P``.  With a UNIFORM switch penalty the Viterbi inner
min collapses to ``min(stay_cost, global_min + P)`` — no S×S transition
matrix — so one DP step is two vectorized element-wise ops.

Scale shape: zones co-located per shard (``_sharded_zone`` discipline);
the DP loop runs over TRACK ORDINALS (max track length), each iteration
vectorized over every (active track × candidate state) in the shard —
never a per-row or per-track Python loop.  Cost sums stay exact below
~1.4e6 points per track (L · max-emission < 2⁶³); beyond that the track
would chunk on a carry, as gap-sessionization does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .tracks import _ordered, _insee_sidx, _sharded_zone, _ZID_MULT

MM_SWITCH_P = 100_000_000_000    # switch penalty, ~((3e5 µ°)²)·1.1
MM_OFF = 10_000_000              # coordinate shift: ix ≥ −5e6 → ux ≥ 0


def mapmatch_group(df: pd.DataFrame) -> pd.DataFrame:
    """Per-shard kernel → (insee, sidx, n_pts, best_cost, match_sidx):
    per track the Viterbi min total cost over the zone's candidate
    streets and the end-state street at that cost (first-min tiebreak =
    lowest candidate sidx; states are sorted by sidx on both sides)."""
    cols = ["insee", "sidx", "n_pts", "best_cost", "match_sidx"]
    z, d, ix, iy, first, _ = _ordered(df)
    if not len(z):
        return pd.DataFrame({c: pd.Series(dtype="int64" if c != "insee"
                                          else "object") for c in cols})
    ux, uy = ix + MM_OFF, iy + MM_OFF
    zone = z // _ZID_MULT
    gidx = np.cumsum(first) - 1
    ntr = int(gidx[-1]) + 1

    # candidate table: per track (=per (zone, street)) the integer centroid
    sx = np.bincount(gidx, weights=ux.astype(np.float64), minlength=ntr)
    sy = np.bincount(gidx, weights=uy.astype(np.float64), minlength=ntr)
    cnt = np.bincount(gidx, minlength=ntr)
    cx = (sx.astype(np.int64) // cnt).astype(np.int64)
    cy = (sy.astype(np.int64) // cnt).astype(np.int64)

    # zone segmentation of the track table (tracks sorted by (zone, sidx))
    tzone = zone[first]
    tsidx = (z % _ZID_MULT)[first]
    zfirst = np.r_[True, tzone[1:] != tzone[:-1]]
    zof = np.cumsum(zfirst) - 1                  # zone index per track
    zstart = np.flatnonzero(zfirst)
    zlen = np.diff(np.r_[zstart, ntr])
    smax = int(zlen.max())
    nz = len(zstart)
    # padded per-zone state matrices (S < smax ⇒ +inf emission)
    scx = np.full((nz, smax), 0, dtype=np.int64)
    scy = np.full((nz, smax), 0, dtype=np.int64)
    pad = np.ones((nz, smax), dtype=bool)
    col = np.arange(ntr) - zstart[zof]
    scx[zof, col], scy[zof, col] = cx, cy
    pad[zof, col] = False
    ssidx = np.zeros((nz, smax), dtype=np.int64)
    ssidx[zof, col] = tsidx

    # DP over track ordinals, vectorized over (track × state)
    starts = np.flatnonzero(first)
    tlen = np.diff(np.r_[starts, len(z)])
    rn = np.arange(len(z)) - starts[gidx]
    L = int(tlen.max())
    INF = np.int64(2**62)
    dp = np.full((ntr, smax), INF, dtype=np.int64)
    for k in range(L):
        rows = np.flatnonzero(rn == k)           # ordinal-k point per track
        t = gidx[rows]
        ex = ux[rows, None] - scx[zof[t]]
        ey = uy[rows, None] - scy[zof[t]]
        emis = ex * ex + ey * ey
        emis[pad[zof[t]]] = INF
        if k == 0:
            dp[t] = emis
        else:
            minall = dp[t].min(axis=1)
            stay = dp[t]
            step = np.minimum(stay, minall[:, None] + MM_SWITCH_P)
            cand = emis + np.minimum(step, INF - emis)   # clamp pad lanes
            dp[t] = np.where(pad[zof[t]], INF, cand)

    best_s = dp.argmin(axis=1)                   # first min = lowest sidx
    best_cost = dp[np.arange(ntr), best_s]
    match_sidx = ssidx[zof, best_s]
    insee, sidx = _insee_sidx(z[first])
    return pd.DataFrame({"insee": insee, "sidx": sidx,
                         "n_pts": tlen.astype(np.int64),
                         "best_cost": best_cost,
                         "match_sidx": match_sidx})


def map_match(sf_dir: str):
    """Viterbi map-matching per track (see mapmatch_group)."""
    return _sharded_zone(sf_dir).map_groups(mapmatch_group,
                                            batch_format="pandas")
