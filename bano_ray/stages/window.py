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
            "lag_cents": pd.array(lag, dtype="Int64"),
            "run_cents": run.astype(np.int64),
        })

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(windows, batch_format="pandas"))
