"""Distributed range (interval) join: aggregate points falling inside
per-row time intervals.

Shape: intervals of width W are replicated to the ≤2 time bins of width W
they can overlap, points map to their single bin, and the tagged union is
hash-partitioned ONCE by bin.  Inside each bin group the points sort once
and every interval resolves with two vectorized ``searchsorted`` probes
against a prefix-sum (count = idx_hi−idx_lo, sum = csum[idx_hi]−csum[idx_lo])
— no per-pair work, no O(|points|×|intervals|) blowup.  Per-interval
partials from the ≤2 bins reduce in a final small groupby.

Partitioning assumptions: interval width is the bin width (fixed W), and
one bin's rows fit in a group — W is the operator's skew knob.  Point sums
are integer cents, so partial-merge order is immaterial.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EMPTY_PARTIAL = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                               "n_purchases": pd.Series(dtype="int64"),
                               "sum_cents": pd.Series(dtype="int64")})


def interval_count_join(points_ds, intervals_ds, width_us: int,
                        id_col: str = "event_id"):
    """points (ts, cents) × intervals (id, ts) → per-interval
    (id, n_purchases, sum_cents) over points with
    ``interval.ts < point.ts <= interval.ts + width_us`` (inner semantics:
    intervals containing no point produce no row)."""
    W = int(width_us)

    def tag_points(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        cents = np.round(batch.column("value").to_numpy() * 100.0).astype(np.int64)
        n = len(ts)
        return pa.table({
            "bin": pa.array(ts // W),
            "ts_us": pa.array(ts),
            "cents": pa.array(cents),
            "iid": pa.nulls(n, pa.int64()),
            "lo": pa.nulls(n, pa.int64()),
            "is_interval": pa.array(np.zeros(n, dtype=bool)),
        })

    def tag_intervals(batch: pa.Table) -> pa.Table:
        lo = batch.column("ts").cast(pa.int64()).to_numpy()
        iid = batch.column(id_col).to_numpy().astype(np.int64)
        hi = lo + W
        b0, b1 = lo // W, hi // W
        # ≤2 covering bins; emit each interval once per DISTINCT bin
        bins = np.concatenate([b0, b1[b1 != b0]])
        ids2 = np.concatenate([iid, iid[b1 != b0]])
        lo2 = np.concatenate([lo, lo[b1 != b0]])
        n = len(bins)
        return pa.table({
            "bin": pa.array(bins),
            "ts_us": pa.nulls(n, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
            "iid": pa.array(ids2),
            "lo": pa.array(lo2),
            "is_interval": pa.array(np.ones(n, dtype=bool)),
        })

    both = (points_ds.map_batches(tag_points, batch_format="pyarrow")
            .union(intervals_ds.map_batches(tag_intervals,
                                            batch_format="pyarrow")))

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        iv = df[df["is_interval"]]
        pts = df[~df["is_interval"]]
        if len(iv) == 0 or len(pts) == 0:
            return _EMPTY_PARTIAL
        order = np.argsort(pts["ts_us"].to_numpy(np.int64), kind="mergesort")
        ts = pts["ts_us"].to_numpy(np.int64)[order]
        csum = np.zeros(len(ts) + 1, dtype=np.int64)
        np.cumsum(pts["cents"].to_numpy(np.int64)[order], out=csum[1:])
        lo = iv["lo"].to_numpy(np.int64)
        ilo = np.searchsorted(ts, lo, side="right")
        ihi = np.searchsorted(ts, lo + W, side="right")
        n = (ihi - ilo).astype(np.int64)
        keep = n > 0
        return pd.DataFrame({
            "event_id": iv["iid"].to_numpy(np.int64)[keep],
            "n_purchases": n[keep],
            "sum_cents": csum[ihi[keep]] - csum[ilo[keep]],
        })

    from ray.data.aggregate import Sum

    return (both.groupby("bin").map_groups(group_fn, batch_format="pandas")
            .groupby("event_id")
            .aggregate(Sum("n_purchases", alias_name="n_purchases"),
                       Sum("sum_cents", alias_name="sum_cents")))
