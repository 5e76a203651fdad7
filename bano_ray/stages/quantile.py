"""Exact distributed quantiles by iterative histogram selection — the
scale path for "give me p50/p95/p99 of a column" that a global ``sort``
would otherwise turn into an all-to-all shuffle of every block.

Shape (classic distributed selection):

1. one ``Min/Max/Count`` aggregate pins the value range and turns each
   quantile fraction into an exact 1-based rank (``max(1, ceil(q*n))`` —
   DuckDB ``quantile_disc`` semantics, so the oracle gate applies);
2. per round, ONE histogram pass: every block bins its values per active
   target and emits ≤ targets×bins partial rows; a
   ``groupby((target, bin)).sum()`` merges them cluster-wide; the driver
   walks the ≤ bins cumulative counts to pick the bin holding each
   target's rank, shrinking its candidate set ~bins× per round;
3. when every candidate set holds ≤ ``final_cap`` rows, one filter pass
   collects just those rows and an ``np.partition`` finishes on the
   driver.

Float discipline: a target's candidate set is defined by the CHAIN of
(bounds, chosen-bin) constraints, and membership is always re-evaluated
with the exact same ``floor((x-lo)/(hi-lo)*bins)`` arithmetic that
counted the rows — never by reconstructed interval endpoints, which can
disagree with the binning at boundary ulps and silently corrupt the rank
bookkeeping.  If a round cannot shrink (a single bin holds everything —
a value spike), the driver switches that target to a distinct-value
resolve: one pass of per-block (value, count) partials merged by a
``groupby(value)``, exact by construction (a bin that refuses to split
after log_bins(range) rounds spans few ulps, hence few distincts).

Every shuffle moves histogram-sized data (targets × bins rows) and the
driver never holds more than ``final_cap`` values per target, independent
of input size: 10^12 rows with bins=8192 needs ~2 rounds → 4
column-pruned scans total vs. a full-dataset sort exchange.  The repeated
scans are the streaming trade-off — each pass reads one column and
retains nothing.

Assumes a non-null numeric column (pre-filter nulls; they would desync
the count-based ranks).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _ranks(qs: list[float], n: int) -> list[int]:
    """DuckDB quantile_disc rank (1-based): max(1, ceil(q*n)) — same
    double arithmetic as the oracle so boundary cases agree."""
    return [max(1, int(math.ceil(q * n))) for q in qs]


def _member(x: np.ndarray, chain: list[tuple[float, float, int]],
            lo0: float, hi0: float, bins: int) -> np.ndarray:
    """Candidate-set membership: the initial [min, max] range AND the
    chosen bin of every past round, recomputed with identical arithmetic."""
    m = (x >= lo0) & (x <= hi0)
    for lo, hi, bsel in chain:
        b = np.floor((x - lo) / (hi - lo) * bins)
        np.clip(b, 0, bins - 1, out=b)
        m &= b == bsel
    return m


def exact_quantiles(ds, col: str, qs: list[float], bins: int = 4096,
                    final_cap: int = 65536, max_rounds: int = 10) -> pd.DataFrame:
    """Dataset → DataFrame (q, value): exact ``quantile_disc`` values."""
    st = column_stats(ds, col)
    if st is None:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs))})
    lo0, hi0, n = st
    vals = select_ranks(ds, col, _ranks(qs, n), lo0, hi0, n,
                        bins=bins, final_cap=final_cap, max_rounds=max_rounds)
    return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                         "value": pd.Series(vals, dtype="float64")})


def column_stats(ds, col: str) -> tuple[float, float, int] | None:
    """One Min/Max/Count aggregate → (lo, hi, n); None on an empty column."""
    from ray.data.aggregate import Count, Max, Min

    st = ds.aggregate(Min(col), Max(col), Count(col))
    n = int(st[f"count({col})"])
    if n == 0:
        return None
    return float(st[f"min({col})"]), float(st[f"max({col})"]), n


def select_ranks(ds, col: str, ranks: list[int], lo0: float, hi0: float,
                 n: int, bins: int = 4096, final_cap: int = 65536,
                 max_rounds: int = 10) -> list[float]:
    """Exact order statistics at the given 1-based ``ranks`` (the selection
    core shared by discrete and continuous quantiles — see module doc)."""
    from ray.data.aggregate import Sum

    if lo0 == hi0:        # single-point range: every rank is that value
        return [lo0] * len(ranks)

    # per-target: constraint chain, current scaling bounds, rank within
    # the candidate set, candidate-set size, resolve mode
    tgt = [{"chain": [], "lo": lo0, "hi": hi0, "rank": r, "n": n,
            "mode": "hist"} for r in ranks]

    def col_vals(batch: pa.Table) -> np.ndarray:
        return batch.column(col).to_numpy().astype(np.float64)

    for _ in range(max_rounds):
        for t in tgt:   # ulp-wide interval: binning would divide by ~0
            if t["mode"] == "hist" and t["n"] > final_cap and \
                    not (t["hi"] - t["lo"]) > 0:
                t["mode"] = "distinct"
        active = [i for i, t in enumerate(tgt)
                  if t["mode"] == "hist" and t["n"] > final_cap]
        if not active:
            break
        plan = [(i, list(tgt[i]["chain"]), tgt[i]["lo"], tgt[i]["hi"])
                for i in active]

        def hist(batch: pa.Table, plan=plan) -> pa.Table:
            x = col_vals(batch)
            ts, bs, ns = [], [], []
            for i, chain, lo, hi in plan:
                m = _member(x, chain, lo0, hi0, bins) if chain else \
                    (x >= lo0) & (x <= hi0)
                if not m.any():
                    continue
                b = np.floor((x[m] - lo) / (hi - lo) * bins)
                np.clip(b, 0, bins - 1, out=b)
                cnt = np.bincount(b.astype(np.int64), minlength=bins)
                nz = np.flatnonzero(cnt)
                ts.append(np.full(len(nz), i, dtype=np.int64))
                bs.append(nz.astype(np.int64))
                ns.append(cnt[nz].astype(np.int64))
            if not ts:
                return pa.table({"t": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"t": pa.array(np.concatenate(ts)),
                             "b": pa.array(np.concatenate(bs)),
                             "n": pa.array(np.concatenate(ns))})

        h = (ds.map_batches(hist, batch_format="pyarrow")
             .groupby(["t", "b"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
        for i in active:
            sub = h[h["t"] == i].sort_values("b")
            cum = sub["n"].cumsum().to_numpy()
            j = int(np.searchsorted(cum, tgt[i]["rank"]))
            bsel = int(sub["b"].iloc[j])
            before = int(cum[j - 1]) if j else 0
            nn = int(sub["n"].iloc[j])
            if nn >= tgt[i]["n"]:
                tgt[i]["mode"] = "distinct"   # spike: binning can't split
                continue
            lo, hi = tgt[i]["lo"], tgt[i]["hi"]
            w = (hi - lo) / bins
            tgt[i]["chain"].append((lo, hi, bsel))
            tgt[i].update(lo=lo + bsel * w, hi=lo + (bsel + 1) * w,
                          rank=tgt[i]["rank"] - before, n=nn)

    vals: list[float | None] = [None] * len(tgt)

    # distinct-value resolve for spike targets (exact, bounded by the few
    # distincts a non-splittable bin can hold)
    dist = [i for i, t in enumerate(tgt) if t["mode"] == "distinct"]
    if dist:
        plan = [(i, list(tgt[i]["chain"])) for i in dist]

        def uniq(batch: pa.Table, plan=plan) -> pa.Table:
            x = col_vals(batch)
            ts, vs, ns = [], [], []
            for i, chain in plan:
                m = _member(x, chain, lo0, hi0, bins)
                if not m.any():
                    continue
                u, c = np.unique(x[m], return_counts=True)
                ts.append(np.full(len(u), i, dtype=np.int64))
                vs.append(u)
                ns.append(c.astype(np.int64))
            if not ts:
                return pa.table({"t": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"t": pa.array(np.concatenate(ts)),
                             "v": pa.array(np.concatenate(vs)),
                             "n": pa.array(np.concatenate(ns))})

        u = (ds.map_batches(uniq, batch_format="pyarrow")
             .groupby(["t", "v"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
        for i in dist:
            sub = u[u["t"] == i].sort_values("v")
            cum = sub["n"].cumsum().to_numpy()
            j = int(np.searchsorted(cum, tgt[i]["rank"]))
            vals[i] = float(sub["v"].iloc[j])

    # final collect for the (small) histogram-resolved candidate sets
    rest = [i for i in range(len(tgt)) if vals[i] is None]
    if rest:
        plan = [(i, list(tgt[i]["chain"])) for i in rest]

        def collect(batch: pa.Table, plan=plan) -> pa.Table:
            x = col_vals(batch)
            ts, vs = [], []
            for i, chain in plan:
                m = _member(x, chain, lo0, hi0, bins)
                if m.any():
                    v = x[m]
                    ts.append(np.full(len(v), i, dtype=np.int64))
                    vs.append(v)
            if not ts:
                return pa.table({"t": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64())})
            return pa.table({"t": pa.array(np.concatenate(ts)),
                             "v": pa.array(np.concatenate(vs))})

        got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        for i in rest:
            v = got.loc[got["t"] == i, "v"].to_numpy()
            k = tgt[i]["rank"] - 1
            vals[i] = float(np.partition(v, k)[k])
    return vals
