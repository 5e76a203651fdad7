"""Blocked edit-distance fuzzy matching (record-linkage primitive).

The reference merges OSM street names against FANTOIR/BAN registries through
NORMALIZED keys (exact match after ``normalize()``); real-world linkage also
needs the fuzzy tier — pairs of distinct keys within a small edit distance
(typos, truncations) that exact normalization cannot unify.  This stage
implements the standard *blocking* form of that operator: candidate pairs are
generated only WITHIN a block (here the first ``prefix`` characters), then an
exact Levenshtein filter keeps pairs with distance ≤ k.

Scale shape: the input is the DISTINCT key table (corpus-sized text never
enters; distinct street names are orders of magnitude below row count), the
block key hashes onto the coarse-shard discipline of
:func:`bano_ray.stages.dedup.bucketed_pairs` (every block lands whole in one
shard, ~256 shards/CPU), and within a shard the pair distances are computed
by ONE vectorized Wagner–Fischer pass over the pair axis — O(Lmax²) numpy
ops per shard regardless of pair count, never a per-pair Python loop.
Blocking recall is the standard trade (a pair split across blocks is not
considered); the oracle replicates the same block rule so parity is exact.
The length filter |len(a)−len(b)| ≤ k is a true necessary condition of
edit distance ≤ k, not an extra heuristic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def levenshtein_pairs(a_strs, b_strs) -> np.ndarray:
    """Exact unit-cost Levenshtein distance for P string pairs, vectorized
    over the PAIR axis: the classic DP runs row by row, but each row is
    numpy over all P pairs, with the insertion recurrence closed by the
    prefix-min trick (min-accumulate of ``cur − j`` plus ``j``)."""
    P = len(a_strs)
    if P == 0:
        return np.empty(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a_strs), np.int64, P)
    lb = np.fromiter((len(s) for s in b_strs), np.int64, P)
    La, Lb = int(la.max()), int(lb.max())
    # pad with disjoint sentinels so padding never matches anything
    A = np.full((P, max(La, 1)), -1, np.int32)
    B = np.full((P, max(Lb, 1)), -2, np.int32)
    for i, s in enumerate(a_strs):
        if s:
            A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    for i, s in enumerate(b_strs):
        if s:
            B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)

    jr = np.arange(Lb + 1, dtype=np.int32)
    prev = np.broadcast_to(jr, (P, Lb + 1)).copy()
    out = np.where(la == 0, lb, 0).astype(np.int64)
    rows = np.arange(P)
    for i in range(1, La + 1):
        cost = (A[:, i - 1 : i] != B).astype(np.int32)          # (P, Lb)
        cand = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)  # del / sub
        cur = np.concatenate(
            [np.full((P, 1), i, np.int32), cand], axis=1)
        # insertions: cur[j] = min_{t<=j} cur_noins[t] + (j - t)
        cur = np.minimum.accumulate(cur - jr, axis=1) + jr
        hit = la == i
        if hit.any():
            out[hit] = cur[rows[hit], lb[hit]]
        prev = cur
    return out


def fuzzy_key_pairs(keys_ds, k: int = 2, prefix: int = 4):
    """distinct-key Dataset (column ``key``) → (a, b, dist) pairs with
    same ``prefix``-char block and Levenshtein distance ≤ ``k``.

    ``keys_ds`` must already be distinct (the caller owns the distinct
    groupby so it can fuse it with whatever produced the keys).
    """
    import zlib

    from .dedup import bucketed_pairs

    def add_bucket(batch: pa.Table) -> pa.Table:
        ks = batch.column("key").to_numpy(zero_copy_only=False)
        b = np.fromiter(
            (zlib.crc32(s[:prefix].encode()) for s in ks), np.uint64, len(ks))
        return pa.table({"key": batch.column("key"),
                         "bucket": pa.array(b.astype(np.int64))})

    def pair_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=str),
                              "b": pd.Series(dtype=str),
                              "dist": pd.Series(dtype=np.int64)})
        ks_all = np.sort(df["key"].to_numpy())
        if len(ks_all) < 2:
            return empty
        # a crc32 bucket can (rarely) hold two distinct prefixes — pair
        # only within the TRUE prefix so a hash collision never cross-pairs
        pfx = np.array([s[:prefix] for s in ks_all])
        a_parts, b_parts = [], []
        for _, idx in pd.Series(np.arange(len(ks_all))).groupby(pfx):
            n = len(idx)
            if n < 2:
                continue
            ks = ks_all[idx.to_numpy()]
            iu, ju = np.triu_indices(n, 1)
            lens = np.fromiter((len(s) for s in ks), np.int64, n)
            keep = np.abs(lens[iu] - lens[ju]) <= k  # necessary for dist<=k
            a_parts.append(ks[iu[keep]])
            b_parts.append(ks[ju[keep]])
        if not a_parts:
            return empty
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        d = levenshtein_pairs(a, b)
        hit = d <= k
        return pd.DataFrame({"a": a[hit], "b": b[hit], "dist": d[hit]})

    ds = keys_ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed_pairs(ds, pair_fn)
