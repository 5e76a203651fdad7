"""Gap-based sessionization — a streaming-window operator done as a
map-side combiner, with NO global event sort.

Two stages (the same partial-aggregation discipline as
``stages/merge_partial.py``):

1. ``_segments_batch`` (vectorized ``map_batches``): each block lexsorts its
   own rows by (user, ts) and pre-sessionizes them into PARTIAL SEGMENTS —
   maximal event chains whose consecutive gaps are <= the session gap.  The
   shuffle that follows moves O(segments), not O(events).
2. ``_merge_user`` (``groupby(user).map_groups``): per user, segments sort
   by start and chain with the running-max-end rule (``start_i -
   max(end_<i) <= gap`` joins), then per-chain aggregates reduce via
   ``np.*.reduceat``.

Correctness argument (why block-local segments compose exactly): a
full-stream gap > T between consecutive events contains no events at all,
so no block's segment can straddle it (its own internal gap there would
exceed T); hence final sessions are disjoint unions of segments.  Within a
session, each segment's first event has a full-stream predecessor within T
that some earlier-starting segment covers, so running-max-end chaining
reconnects exactly the segments of one session and nothing else.  Sums are
carried as integer cents so merge order cannot perturb float totals.

Partitioning assumptions (documented per SURVEY §2 custom-operator rule):
one user's SEGMENT LIST (not their events) fits in a single group — at most
2×(blocks touching that user) rows after per-block combining — and equal
timestamps within a user may collapse in any order (gap 0 joins them
regardless).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, in timestamp[us] ticks

_EMPTY_SEGMENTS = pa.table({
    "user_id": pa.array([], pa.int64()),
    "start": pa.array([], pa.int64()),
    "end": pa.array([], pa.int64()),
    "n_events": pa.array([], pa.int64()),
    "sum_cents": pa.array([], pa.int64()),
})


def _segments_batch(batch: pa.Table, gap_us: int = SESSION_GAP_US) -> pa.Table:
    """events block → partial segments (user, start, end, n, cents)."""
    u = batch.column("user_id").to_numpy().astype(np.int64)
    if len(u) == 0:
        return _EMPTY_SEGMENTS
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
    order = np.lexsort((ts, u))
    u, ts, cents = u[order], ts[order], cents[order]
    new = np.ones(len(u), dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
    first = np.flatnonzero(new)
    last = np.append(first[1:], len(u)) - 1
    return pa.table({
        "user_id": pa.array(u[first]),
        "start": pa.array(ts[first]),
        "end": pa.array(ts[last]),
        "n_events": pa.array(np.diff(np.append(first, len(u)))),
        "sum_cents": pa.array(np.add.reduceat(cents, first)),
    })


def _merge_user(df: pd.DataFrame, gap_us: int = SESSION_GAP_US) -> pd.DataFrame:
    """One user's partial segments → final sessions (running-max-end chain)."""
    df = df.sort_values("start", kind="mergesort")
    start = df["start"].to_numpy(np.int64)
    end = df["end"].to_numpy(np.int64)
    run_end = np.maximum.accumulate(end)
    new = np.ones(len(df), dtype=bool)
    new[1:] = (start[1:] - run_end[:-1]) > gap_us
    first = np.flatnonzero(new)
    return pd.DataFrame({
        "user_id": df["user_id"].to_numpy(np.int64)[first],
        "session_start": start[first].astype("datetime64[us]"),
        "session_end": np.maximum.reduceat(end, first).astype("datetime64[us]"),
        "n_events": np.add.reduceat(df["n_events"].to_numpy(np.int64), first),
        "sum_cents": np.add.reduceat(df["sum_cents"].to_numpy(np.int64), first),
    })


def sessionize(ds, gap_us: int = SESSION_GAP_US):
    """events Dataset (user_id, ts, value) → one row per session
    (user_id, session_start, session_end, n_events, sum_cents)."""

    def segments(batch: pa.Table) -> pa.Table:
        return _segments_batch(batch, gap_us)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return _merge_user(df, gap_us)

    return (ds.map_batches(segments, batch_format="pyarrow")
            .groupby("user_id").map_groups(merge, batch_format="pandas"))
