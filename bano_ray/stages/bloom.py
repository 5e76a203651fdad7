"""Bloom-filtered exact semi-join — the 100 TB pattern for "keep big-side
rows whose key appears on a medium-sized build side".

Why not a broadcast set or a plain shuffle join:

- a broadcast hash SET of the build keys stops fitting worker heaps long
  before the build side stops fitting a BITMAP (a 4M-bit Bloom is 512 KiB
  regardless of key count);
- a shuffle semi-join moves the ENTIRE probe side through the object
  store; the Bloom pre-filter cuts that to (true matches + ε false
  positives), so the only all-to-all is survivor-sized.

Exactness: Bloom false positives are removed by a verification semi-join
(shard-hash co-partition of survivors + build keys), so the output equals
ANSI ``WHERE key IN (SELECT ...)`` row-for-row and the driver's value
oracle applies.  The Bloom layer is pure bandwidth optimisation — its hash
function never influences results, only the survivor count.

Distributed bitmap build: every block emits its DISTINCT bit positions,
one ``groupby(pos)`` dedups them cluster-wide, and the driver materialises
only the ≤ m distinct set bits (bounded by the bitmap size, NOT the build
cardinality).  The filter stage reads the bitmap via ``ray.put`` once —
zero-copy from local plasma per task, never re-shipped per batch.

Partitioning assumption (SURVEY §2 custom-operator rule): one shard of
survivors + build keys fits in a group; shards are ``mix64(key) % C`` with
C ≈ 256×CPUs, so only pathological key skew (one key ≫ shard budget)
would violate it — and a semi-join output for one key is that key's own
rows, which any downstream consumer must hold anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _coarse_groups

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer — a cheap, well-mixed stand-in for md5 where
    nothing needs to be oracle-replicable (the Bloom layer is internal)."""
    v = x.astype(np.uint64, copy=True)
    v += np.uint64(seed)
    v ^= v >> np.uint64(30)
    v *= _M1
    v ^= v >> np.uint64(27)
    v *= _M2
    v ^= v >> np.uint64(31)
    return v


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (mod m)."""
    h1 = _mix64(keys, 0x9E3779B97F4A7C15)
    h2 = _mix64(keys, 0xC2B2AE3D27D4EB4F) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits))


def build_bloom(keys_ds, key: str, m_bits: int = 1 << 22,
                k: int = 4) -> np.ndarray:
    """Build-side Dataset → bitmap words (uint64[m_bits/64]).

    Per-block distinct positions → one groupby dedup → driver sets ≤m bits.
    """

    def block_positions(batch: pa.Table) -> pa.Table:
        kv = batch.column(key).to_numpy().astype(np.int64)
        pos = np.unique(_positions(kv, m_bits, k))
        return pa.table({"pos": pa.array(pos.astype(np.int64))})

    agg = (keys_ds.map_batches(block_positions, batch_format="pyarrow")
           .groupby("pos").count())
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    for batch in agg.iter_batches(batch_format="pyarrow"):
        pos = batch.column("pos").to_numpy().astype(np.uint64)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def _bloom_may_contain(keys: np.ndarray, words: np.ndarray,
                       m_bits: int, k: int) -> np.ndarray:
    pos = _positions(keys.astype(np.int64), m_bits, k)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(pos.shape[1]):
        p = pos[:, i]
        w = words[(p >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (p & np.uint64(63))) & np.uint64(1) != 0
    return hit


def bloom_semijoin(big_ds, build_ds, key: str,
                   m_bits: int = 1 << 22, k: int = 4):
    """Exact distributed semi-join: big rows whose ``key`` (int64) appears
    in ``build_ds``'s ``key`` column.  Output schema == ``big_ds`` schema.
    """
    import ray

    words = build_bloom(build_ds, key, m_bits=m_bits, k=k)
    wref = ray.put(words)

    def prefilter(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)           # local plasma, zero-copy per task
        kv = batch.column(key).to_numpy().astype(np.int64)
        return batch.filter(pa.array(_bloom_may_contain(kv, w, m_bits, k)))

    survivors = big_ds.map_batches(prefilter, batch_format="pyarrow")

    # verification semi-join: survivors + build keys, co-partitioned by a
    # coarse shard of the key (bucketed_pairs-style — per-group dispatch
    # cost amortized over the shard, not paid per key)
    C = _coarse_groups()
    sch = big_ds.schema()   # resolved once on the driver, not per task
    payload = {c: t for c, t in zip(sch.names, sch.types) if c != key}

    def tag_big(batch: pa.Table) -> pa.Table:
        kv = batch.column(key).to_numpy().astype(np.uint64)
        shard = (_mix64(kv, 0x2545F4914F6CDD1D) % np.uint64(C)).astype(np.int64)
        return (batch.append_column("_shard", pa.array(shard))
                .append_column("_side", pa.array(np.zeros(len(batch), np.int8))))

    def tag_build(batch: pa.Table) -> pa.Table:
        kv = batch.column(key).to_numpy().astype(np.int64)
        kv = np.unique(kv)
        shard = (_mix64(kv.astype(np.uint64), 0x2545F4914F6CDD1D)
                 % np.uint64(C)).astype(np.int64)
        cols = {key: pa.array(kv)}
        for c, t in payload.items():
            cols[c] = pa.nulls(len(kv), t)
        cols["_shard"] = pa.array(shard)
        cols["_side"] = pa.array(np.ones(len(kv), np.int8))
        return pa.table(cols)

    both = (survivors.map_batches(tag_big, batch_format="pyarrow")
            .union(build_ds.map_batches(tag_build, batch_format="pyarrow")))

    # the union's null padding widens int payload columns to float64 in
    # pandas groups; the kept rows (big side) are null-free, so casting
    # back to the big-side dtypes is lossless
    pd_dtypes = {c: t.to_pandas_dtype() for c, t in payload.items()}

    def verify(df):
        have = df.loc[df["_side"] == 1, key].to_numpy()
        out = df[(df["_side"] == 0) & df[key].isin(have)]
        return out.drop(columns=["_shard", "_side"]).astype(pd_dtypes)

    return both.groupby("_shard").map_groups(verify, batch_format="pandas")
