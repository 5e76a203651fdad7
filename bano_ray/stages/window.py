"""Per-key ordered window functions (ROW_NUMBER / LAG / running SUM) as a
sharded sort-within-group operator.

The reference engine has no window machinery at all (bano's SQL uses plain
aggregates; see reference ``bano/sql/*``) — this is the §2 "custom operator"
extension a training-data pipeline needs for per-user event feature
engineering (position-in-session indices, previous-action deltas, running
spend).

Shape (the same coarse-shard discipline as ``stages/dedup.bucketed_pairs``):
``groupby(user)`` with one Ray group per user would pay the executor's
~0.3 ms per-group dispatch once per user; instead we group on a coarse
shard of the key (a pure function of it, so every user's rows land whole
in exactly one group) and resolve per-user windows inside the shard with
ONE vectorized lexsort + flat ``cumsum``-with-offset pass — no per-user
Python loop, no global sort of the event stream.

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
one USER's events fit in a worker group (a shard holds ~rows/(256·CPUs));
a single hot key beyond worker memory would need a two-pass carry
(per-block partial windows + prefix offsets), which gap-sessionization
(``stages/sessions.py``) demonstrates for the segment case.

Determinism: ties order by (ts, event_id) — event_id is unique, so
ROW_NUMBER / LAG are total-order stable and match the SQL ``OVER
(PARTITION BY user_id ORDER BY ts, event_id)`` exactly.  Sums accumulate
integer cents so distribution order cannot perturb float totals
(oracle side casts identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _coarse_groups


def window_user_events(ds):
    """events Dataset → (event_id, user_id, rn, lag_cents, run_cents).

    rn = ROW_NUMBER() OVER w, lag_cents = LAG(cents) OVER w (null for the
    first event), run_cents = SUM(cents) OVER w ROWS UNBOUNDED PRECEDING,
    with w = PARTITION BY user_id ORDER BY ts, event_id.
    """
    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts").cast(pa.int64()),
            "cents": pa.array(cents),
            "_shard": pa.array((u.astype(np.uint64) % np.uint64(C)).astype(np.int64)),
        })

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        ev = df["event_id"].to_numpy()
        cents = df["cents"].to_numpy()
        order = np.lexsort((ev, ts, u))
        u, ts, ev, cents = u[order], ts[order], ev[order], cents[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        # flat per-group cumulatives: global cumsum minus the running value
        # at each group start, broadcast per row via repeat
        idx = np.arange(len(u), dtype=np.int64)
        rn = idx - np.repeat(starts, np.diff(np.append(starts, len(u)))) + 1
        csum = np.cumsum(cents)
        base = np.repeat(np.where(starts > 0, csum[starts - 1], 0),
                         np.diff(np.append(starts, len(u))))
        run = csum - base
        lag = np.empty(len(u), dtype=np.float64)
        lag[0] = np.nan
        lag[1:] = cents[:-1]
        lag[first] = np.nan
        return pd.DataFrame({
            "event_id": ev, "user_id": u,
            "rn": rn.astype(np.int64),
            # float64 with NaN at partition heads: matches the pandas
            # rendering of a nullable LAG(BIGINT) (DuckDB oracle) exactly,
            # so value hashes agree without a sentinel on either side.
            "lag_cents": lag,
            "run_cents": run.astype(np.int64),
        })

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(windows, batch_format="pandas"))


def window_ranks(ds, n_tiles: int = 4):
    """events Dataset → (event_id, user_id, cents, rnk, dense_rnk,
    pct_rank, ntile4): RANK / DENSE_RANK / PERCENT_RANK over
    ``PARTITION BY user_id ORDER BY cents`` (ties share rank — deterministic
    without a tiebreak) and NTILE(n) over the tie-broken total order
    ``(cents, event_id)`` (NTILE over ties is otherwise nondeterministic).

    Same coarse-shard + ONE-flat-lexsort discipline and the same
    partitioning assumption as ``window_user_events``: a user's rows fit a
    shard.  Rank windows over a HANDFUL of huge partitions are a different
    operator (they need a distributed sort per partition); per-entity ranks
    are the 100 TB-sane shape.
    """
    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "cents": pa.array(cents),
            "_shard": pa.array((u.astype(np.uint64) % np.uint64(C)).astype(np.int64)),
        })

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        ev = df["event_id"].to_numpy()
        cents = df["cents"].to_numpy()
        order = np.lexsort((ev, cents, u))
        u, ev, cents = u[order], ev[order], cents[order]
        n = len(u)
        idx = np.arange(n, dtype=np.int64)
        first = np.ones(n, dtype=bool)
        first[1:] = u[1:] != u[:-1]
        sizes = np.diff(np.append(np.flatnonzero(first), n))
        start = np.repeat(idx[first], sizes)          # user start index per row
        grp_n = np.repeat(sizes, sizes)               # user size per row
        rn0 = idx - start                             # 0-based row number
        new_val = first.copy()
        new_val[1:] |= cents[1:] != cents[:-1]
        run_start = np.maximum.accumulate(np.where(new_val, idx, -1))
        rnk = run_start - start + 1                   # RANK (ties share)
        dcum = np.cumsum(new_val)
        dense = dcum - np.repeat(dcum[first] - 1, sizes)
        pct = np.where(grp_n > 1, (rnk - 1) / np.maximum(grp_n - 1, 1), 0.0)
        k = n_tiles
        nbig = grp_n % k
        big = grp_n // k + 1
        small = np.maximum(grp_n // k, 1)
        in_big = rn0 < nbig * big
        tile = np.where(in_big, rn0 // big,
                        nbig + (rn0 - nbig * big) // small) + 1
        return pd.DataFrame({
            "event_id": ev, "user_id": u, "cents": cents,
            "rnk": rnk, "dense_rnk": dense,
            "pct_rank": np.round(pct, 6), "ntile4": tile,
        })

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(ranks, batch_format="pandas"))


ROLL_FRAME = 3   # ROWS BETWEEN 2 PRECEDING AND CURRENT ROW


def rolling_frame(ds, frame: int = ROLL_FRAME):
    """events Dataset → (event_id, user_id, roll_c, n_frame): bounded
    window FRAME aggregation — SUM(cents) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)
    plus the frame's actual row count.

    The bounded frame is the window family member running sums can't
    express: the kernel is the same coarse-shard + ONE flat lexsort as
    :func:`window_user_events`, the frame sum a cumsum difference
    ``cs[i] − cs[i−frame]`` clamped at each user's start — still no
    per-user loop and integer cents throughout.
    """
    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        val = batch.column("value").to_numpy()
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts").cast(pa.int64()),
            "cents": pa.array(cents),
            "_shard": pa.array((u.astype(np.uint64)
                                % np.uint64(C)).astype(np.int64)),
        })

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        ev = df["event_id"].to_numpy()
        cents = df["cents"].to_numpy()
        order = np.lexsort((ev, ts, u))
        u, ts, ev, cents = u[order], ts[order], ev[order], cents[order]
        n = len(u)
        first = np.ones(n, dtype=bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, n))
        row_start = np.repeat(starts, sizes)          # user start per row
        rn0 = np.arange(n, dtype=np.int64) - row_start
        lo = np.maximum(np.arange(n) - (frame - 1), row_start)
        cs = np.concatenate([[0], np.cumsum(cents)])  # cs[i] = sum(< i)
        roll_c = cs[np.arange(n) + 1] - cs[lo]
        return pd.DataFrame({
            "event_id": ev, "user_id": u,
            "roll_c": roll_c.astype(np.int64),
            "n_frame": (np.minimum(rn0, frame - 1) + 1).astype(np.int64),
        })

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(roll, batch_format="pandas"))


RANGE_FRAME_US = 3_600_000_000   # RANGE frame width: 1 hour in µs


def range_frame(ds, width_us: int = RANGE_FRAME_US):
    """events Dataset → (event_id, n_1h): COUNT(*) OVER (PARTITION BY
    user_id ORDER BY ts RANGE BETWEEN width PRECEDING AND CURRENT ROW)
    — the RANGE (value-window) member of the window family; ROWS frames
    (:func:`rolling_frame`) bound by row count, RANGE frames by the
    order-key VALUE, and SQL peer semantics include every row sharing
    the current ts.

    Kernel: one flat lexsort (u, ts, event_id), then both frame
    boundaries come from TWO global searchsorteds over a composite
    monotone key ``u_idx·K + (ts − min_ts)`` (K > max span + width, so
    user segments can't alias) — lo = first row with ts ≥ ts−width in
    the user, hi = last peer of ts.  No per-user loop, no per-row scan.
    """
    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts").cast(pa.int64()),
            "_shard": pa.array((u.astype(np.uint64)
                                % np.uint64(C)).astype(np.int64)),
        })

    def frame(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        ev = df["event_id"].to_numpy()
        order = np.lexsort((ev, ts, u))
        u, ts, ev = u[order], ts[order], ev[order]
        n = len(u)
        first = np.ones(n, dtype=bool)
        first[1:] = u[1:] != u[:-1]
        # dense user index so the composite key can't overflow int64
        uidx = np.cumsum(first) - 1
        t0 = ts - ts.min()
        K = np.int64(int(t0.max()) + int(width_us) + 2)
        key = uidx * K + t0
        lo = np.searchsorted(key, key - width_us, side="left")
        hi = np.searchsorted(key, key, side="right")
        return pd.DataFrame({"event_id": ev, "user_id": u,
                             "n_1h": (hi - lo).astype(np.int64)})

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(frame, batch_format="pandas"))
