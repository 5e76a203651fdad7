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


# ---------------------------------------------------------------------------
# Event-transition counts (first-order Markov matrix over event_type)
# ---------------------------------------------------------------------------

N_ORDER_SHARDS = 256


def _add_shard(batch: pa.Table, n_shards: int) -> pa.Table:
    u = batch.column("user_id").to_numpy()
    return batch.append_column(
        "shard", pa.array((u % n_shards).astype(np.int64)))


def _shard_transitions(df: pd.DataFrame) -> pd.DataFrame:
    """One user-hash shard → partial (from_type, to_type, cnt).

    Sorts the shard by (user, ts, event_id) — event_id breaks equal-ts
    ties so the pair sequence is deterministic and identical to the
    oracle's ``ORDER BY ts, event_id`` window — then factorizes the
    consecutive same-user (from, to) pairs and bincounts."""
    u = df["user_id"].to_numpy(np.int64)
    ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
    eid = df["event_id"].to_numpy(np.int64)
    et = df["event_type"].to_numpy()
    order = np.lexsort((eid, ts, u))
    u, et = u[order], et[order]
    same = u[1:] == u[:-1]
    if not same.any():
        return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                             "to_type": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype=np.int64)})
    codes, types = pd.factorize(et)
    pair = codes[:-1][same] * len(types) + codes[1:][same]
    cnt = np.bincount(pair, minlength=len(types) * len(types))
    nz = np.flatnonzero(cnt)
    return pd.DataFrame({"from_type": types[nz // len(types)],
                         "to_type": types[nz % len(types)],
                         "cnt": cnt[nz].astype(np.int64)})


def transitions(ds, n_shards: int = N_ORDER_SHARDS):
    """events Dataset (event_id, ts, user_id, event_type) → global
    first-order transition counts (from_type, to_type, cnt): for each user,
    consecutive events ordered by (ts, event_id) contribute one pair.

    Shape: consecutive-pair semantics need the TRUE per-user order, which
    no block-local combiner can recover (a block's events interleave
    arbitrarily with other blocks'), so this is the honest ONE-shuffle
    form: hash users into ``n_shards`` coarse shards (0.3 ms/group
    dispatch paid 256×, not once per user), sort + pair inside each shard
    vectorized, then a tiny groupby-sum over the ≤ |types|² partials.
    Partitioning assumption: one shard's events (≈ rows/n_shards) fit in a
    worker's heap."""
    from ray.data.aggregate import Sum

    return (ds.map_batches(lambda b: _add_shard(b, n_shards),
                           batch_format="pyarrow")
            .groupby("shard")
            .map_groups(_shard_transitions, batch_format="pandas")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("cnt", alias_name="cnt")))


# ---------------------------------------------------------------------------
# Interval union coverage (gaps-and-islands merge)
# ---------------------------------------------------------------------------

_EMPTY_ISLANDS = pa.table({
    "user_id": pa.array([], pa.int64()),
    "start": pa.array([], pa.int64()),
    "end": pa.array([], pa.int64()),
})


def _merge_islands(u: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Sorted-by-(user, start, end) interval arrays → (new_island mask,
    per-row exclusive running-max end WITHIN user).  Grouped cummax runs in
    pandas' C kernel; the shifted value for each user's first row is
    int64-min so the first interval always opens an island."""
    run = pd.Series(e).groupby(pd.Series(u), sort=False).cummax().to_numpy()
    pmax = np.empty(len(u), np.int64)
    pmax[0] = np.iinfo(np.int64).min
    pmax[1:] = np.where(u[1:] == u[:-1], run[:-1], np.iinfo(np.int64).min)
    return s > pmax, pmax


def _islands_batch(batch: pa.Table) -> pa.Table:
    """events block → block-local MERGED intervals per user.

    The union of a set of intervals equals the union of any partition's
    block-local merges, so partial islands compose exactly — the shuffle
    that follows moves O(islands), not O(events)."""
    u = batch.column("user_id").to_numpy().astype(np.int64)
    if len(u) == 0:
        return _EMPTY_ISLANDS
    s = batch.column("s").to_numpy()
    e = batch.column("e").to_numpy()
    order = np.lexsort((e, s, u))
    u, s, e = u[order], s[order], e[order]
    new, _ = _merge_islands(u, s, e)
    first = np.flatnonzero(new)
    return pa.table({
        "user_id": pa.array(u[first]),
        "start": pa.array(s[first]),
        "end": pa.array(np.maximum.reduceat(e, first)),
    })


def _shard_cover(df: pd.DataFrame) -> pd.DataFrame:
    """One shard of partial islands → (user_id, n_islands, covered_us)."""
    u = df["user_id"].to_numpy(np.int64)
    s = df["start"].to_numpy(np.int64)
    e = df["end"].to_numpy(np.int64)
    order = np.lexsort((e, s, u))
    u, s, e = u[order], s[order], e[order]
    new, pmax = _merge_islands(u, s, e)
    cov = np.maximum(0, e - np.maximum(s, pmax))
    cov[new] = e[new] - s[new]
    ufirst = np.ones(len(u), dtype=bool)
    ufirst[1:] = u[1:] != u[:-1]
    uf = np.flatnonzero(ufirst)
    return pd.DataFrame({
        "user_id": u[uf],
        "n_islands": np.add.reduceat(new.astype(np.int64), uf),
        "covered_us": np.add.reduceat(cov, uf),
    })


def interval_cover(ds, n_shards: int = N_ORDER_SHARDS):
    """Dataset of intervals (user_id, s, e  —  int64 µs) → per user the
    merged-union stats (user_id, n_islands, covered_us).

    Shape: block-local merge (``_islands_batch``, the exact-composition
    combiner) → ONE user-hash-shard shuffle of O(partial islands) →
    vectorized grouped-cummax sweep per shard.  Partitioning assumption:
    one shard's partial islands fit in a worker."""
    return (ds.map_batches(_islands_batch, batch_format="pyarrow")
            .map_batches(lambda b: _add_shard(b, n_shards),
                         batch_format="pyarrow")
            .groupby("shard")
            .map_groups(_shard_cover, batch_format="pandas"))


# ---------------------------------------------------------------------------
# SCD2 validity intervals (change-data-capture snapshot)
# ---------------------------------------------------------------------------

SCD2_OPEN_END = np.iinfo(np.int64).max   # open-ended current row sentinel


def _shard_scd2(df: pd.DataFrame) -> pd.DataFrame:
    """One user-hash shard → SCD2 rows (user_id, state, valid_from,
    valid_to): sort by (user, ts, event_id), collapse consecutive equal
    states, valid_to = next change's ts (open rows get the int64-max
    sentinel, the oracle's COALESCE)."""
    u = df["user_id"].to_numpy(np.int64)
    ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
    eid = df["event_id"].to_numpy(np.int64)
    et = df["event_type"].to_numpy()
    order = np.lexsort((eid, ts, u))
    u, ts, et = u[order], ts[order], et[order]
    change = np.ones(len(u), dtype=bool)
    change[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
    ci = np.flatnonzero(change)
    cu, cts = u[ci], ts[ci]
    vto = np.full(len(ci), SCD2_OPEN_END, np.int64)
    same_next = cu[1:] == cu[:-1]
    vto[:-1][same_next] = cts[1:][same_next]
    return pd.DataFrame({"user_id": cu, "state": et[ci],
                         "valid_from": cts, "valid_to": vto})


def scd2(ds, n_shards: int = N_ORDER_SHARDS):
    """events Dataset (event_id, ts, user_id, event_type) → type-2
    slowly-changing-dimension rows: one row per STATE CHANGE per user with
    [valid_from, valid_to) µs validity (valid_to of the current state =
    int64 max).  Same honest one-shuffle shape as :func:`transitions`
    (change detection needs the true per-user order); the in-shard sweep is
    fully vectorized.  Partitioning assumption: one user-hash shard's
    events fit in a worker."""
    return (ds.map_batches(lambda b: _add_shard(b, n_shards),
                           batch_format="pyarrow")
            .groupby("shard")
            .map_groups(_shard_scd2, batch_format="pandas"))


def window_selfjoin_group(df, gap_us: int, left_type: str, right_type: str):
    """Per-shard kernel of :func:`window_selfjoin`: for every RIGHT event,
    count LEFT events of the same user with ts in ``[right.ts - gap_us,
    right.ts)`` — two searchsorted probes over a composite (user, rel_ts)
    key, no per-user loop, no pair materialization.

    The composite key uses shard-local DENSE user codes and a rel-ts width
    sized to the shard's actual span, so arbitrary user ids and stream
    spans fit int64 (asserted, not assumed)."""
    import pandas as pd

    u = df["user_id"].to_numpy()
    ts = df["ts"].to_numpy().astype(np.int64)
    ev = df["event_id"].to_numpy()
    et = df["event_type"].to_numpy()
    codes = np.unique(u, return_inverse=True)[1].astype(np.int64)
    # +gap offset keeps the lower probe key non-negative in the rel field,
    # so it can never underflow into the previous user's key range
    rel = (ts - (ts.min() if len(ts) else 0)) + gap_us
    nbits = int(rel.max()).bit_length() + 1 if len(rel) else 1
    assert (int(codes.max()) if len(codes) else 0).bit_length() + nbits < 63
    key = (codes << nbits) + rel
    lm = et == left_type
    rm = et == right_type
    lkeys = np.sort(key[lm])
    rkey = key[rm]
    lo = np.searchsorted(lkeys, rkey - gap_us, side="left")
    hi = np.searchsorted(lkeys, rkey, side="left")
    return pd.DataFrame({"event_id": ev[rm], "user_id": u[rm],
                         "n_prior": (hi - lo).astype(np.int64)})


def window_selfjoin(ds, gap_us: int = 30 * 60 * 1000000,
                    left_type: str = "view", right_type: str = "purchase"):
    """Stream-stream interval self-join: per RIGHT event, the count of
    same-user LEFT events in the preceding ``gap_us`` window (exclusive of
    the right event's own instant) — the attribution join of a streaming
    pipeline, done WITHOUT materializing pairs.

    Shape: one user-hash coarse-shard shuffle (consecutive-window
    semantics can't compose block-locally), then two vectorized
    ``searchsorted`` probes per shard over a composite (user, rel-ts)
    int64 key.  The output is one row per right event (never |L|x|R|
    pairs), so a hot user costs O(L log L) sort + O(R log L) probes.
    Partitioning assumption: one user's events fit in a shard (same as
    stages/window.py)."""
    from .dedup import _coarse_groups

    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts").cast(pa.int64()),
            "event_type": batch.column("event_type"),
            "_shard": pa.array((u.astype(np.uint64) % np.uint64(C))
                               .astype(np.int64)),
        })

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(lambda df: window_selfjoin_group(
                df, gap_us, left_type, right_type),
                batch_format="pandas"))
