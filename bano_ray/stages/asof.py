"""Distributed AS-OF join (latest right row with ``ts <= left.ts`` per key).

Shape: both sides are tagged and unioned into one stream, hash-partitioned
ONCE by the join key (the single shuffle), and each per-key group resolves
matches with a vectorized ``searchsorted`` over the right side's sorted
timestamps — no per-row loops, no global sort, no driver materialization.

Partitioning assumption (SURVEY §2 custom-operator rule): one key's rows
(both sides) fit in a group.  Ties on the right side are made deterministic
by reducing to one row per (key, ts) keeping the MAX payload before the
binary search — mirrored in the SQL oracle so exact value parity holds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left_ds, right_ds, key: str, ts_col: str,
              left_payload: str, right_payload: str,
              out_ts: str = "asof_ts", out_val: str = "asof_value"):
    """left rows (key, ts, left_payload) × right rows (key, ts,
    right_payload) → (left_payload, out_ts, out_val) for every left row
    whose key has at least one right row at or before its timestamp
    (inner as-of semantics)."""

    def tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            key: batch.column(key),
            "ts_us": batch.column(ts_col).cast(pa.int64()),
            "lpay": batch.column(left_payload).cast(pa.int64()),
            "rpay": pa.nulls(n, pa.float64()),
            "is_right": pa.array(np.zeros(n, dtype=bool)),
        })

    def tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            key: batch.column(key),
            "ts_us": batch.column(ts_col).cast(pa.int64()),
            "lpay": pa.nulls(n, pa.int64()),
            "rpay": batch.column(right_payload).cast(pa.float64()),
            "is_right": pa.array(np.ones(n, dtype=bool)),
        })

    both = (left_ds.map_batches(tag_left, batch_format="pyarrow")
            .union(right_ds.map_batches(tag_right, batch_format="pyarrow")))

    empty = pd.DataFrame({
        left_payload: pd.Series(dtype="int64"),
        out_ts: pd.Series(dtype="datetime64[us]"),
        out_val: pd.Series(dtype="float64"),
    })

    def group_asof(df: pd.DataFrame) -> pd.DataFrame:
        right = df[df["is_right"]]
        left = df[~df["is_right"]]
        if len(right) == 0 or len(left) == 0:
            return empty
        # deterministic right side: one row per ts, max payload wins
        r = right.sort_values(["ts_us", "rpay"], kind="mergesort") \
                 .drop_duplicates("ts_us", keep="last")
        rts = r["ts_us"].to_numpy(np.int64)
        rval = r["rpay"].to_numpy(np.float64)
        lts = left["ts_us"].to_numpy(np.int64)
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        return pd.DataFrame({
            left_payload: left["lpay"].to_numpy(np.int64)[ok],
            out_ts: rts[idx[ok]].astype("datetime64[us]"),
            out_val: rval[idx[ok]],
        })

    return both.groupby(key).map_groups(group_asof, batch_format="pandas")
