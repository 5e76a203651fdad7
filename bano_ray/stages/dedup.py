"""Deduplication operators over the ``documents`` table.

- exact: content-hash groupby (hash-partition + per-group first) — the
  scalable exact-dedup shape (same as the graft's phash dedup,
  SURVEY.md §2.8).
- MinHash + LSH: shingle → minhash signature → banded bucket groupby →
  candidate pairs verified by exact Jaccard.  The band-bucket groupby is the
  ONLY shuffle; signatures are computed vectorized per batch.
- SimHash: 64-bit simhash over token hashes; near-dup = Hamming ≤ k via
  pigeonhole block banding (exact recall for k < SIMHASH_BLOCKS).
- n-gram Jaccard: exact pairwise verification kernel (used on candidates,
  never all-pairs).
- embedding cosine near-dup: bucket by coarse LSH sign-pattern then exact
  cosine within bucket.

All heavy per-batch math is numpy; Python only touches per-unique strings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MINHASH_PERMS = 64
MINHASH_BANDS = 16  # 16 bands × 4 rows
_MERS = (1 << 61) - 1


def _token_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (stable across processes).

    Uses the upper md5 half little-endian — exactly DuckDB's
    ``md5_number_lower(s)`` — so the whole minhash/simhash family is
    SQL-replicable and the driver can value-gate it (oracle.py
    q_minhash_pairs / q_simhash / q_simhash_neardup)."""
    toks = text.split()
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
    return out


_A = np.random.default_rng(1234).integers(1, _MERS, MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_B = np.random.default_rng(5678).integers(0, _MERS, MINHASH_PERMS, dtype=np.int64).astype(np.uint64)


def minhash_signature(text: str) -> np.ndarray:
    h = _token_hashes(text)
    if len(h) == 0:
        return np.zeros(MINHASH_PERMS, dtype=np.uint64)
    # (a*h + b) mod mersenne, vectorized over perms × shingles
    v = (h[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERS)
    return v.min(axis=1)


def minhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    sigs = np.stack([minhash_signature(t) for t in texts]) if texts else \
        np.zeros((0, MINHASH_PERMS), dtype=np.uint64)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    out = {"doc_id": batch.column("doc_id")}
    bands = []
    for b in range(MINHASH_BANDS):
        seg = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
        bh = np.array([hash((b,) + tuple(r)) & 0x7FFFFFFFFFFFFFFF for r in seg], dtype=np.int64)
        bands.append(bh)
    out["band_hashes"] = pa.array([list(map(int, r)) for r in np.stack(bands, axis=1)] if len(sigs) else [],
                                  type=pa.list_(pa.int64()))
    return pa.table(out)


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(_token_hashes(a, n).tolist()), set(_token_hashes(b, n).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_candidate_pairs(ds, threshold: float = 0.7):
    """documents Dataset → verified near-dup pairs (doc_a, doc_b, jaccard).

    flat_map band hashes → groupby(band bucket) → per-bucket pairs →
    distinct → exact-Jaccard verify (re-reading text via a broadcast of the
    candidate ids only — candidates are tiny relative to the corpus).
    """
    import ray

    sig = ds.map_batches(minhash_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        bands = batch.column("band_hashes").to_pylist()
        d, h = [], []
        for i, bl in enumerate(bands):
            for bh in bl:
                d.append(doc[i])
                h.append(bh)
        return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                         "bucket": pa.array(h, type=pa.int64())})

    _EMPTY_PAIRS = pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df["doc_id"].unique())
        if len(ids) < 2 or len(ids) > 200:  # skew guard: giant buckets are
            return _EMPTY_PAIRS               # degenerate hashes
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a].astype(np.int64),
                             "b": ids[b].astype(np.int64)})

    pairs = (sig.map_batches(explode, batch_format="pyarrow")
             .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
             .groupby(["a", "b"]).count())

    def verify_batch(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        js = np.asarray([jaccard(x, y) for x, y in zip(ta, tb)], dtype=np.float64)
        keep = js >= threshold
        return pa.table({"doc_a": pa.array(a[keep]),
                         "doc_b": pa.array(b[keep]),
                         "jaccard": pa.array(np.round(js[keep], 6))})

    texts = ds.select_columns(["doc_id", "text"])
    cpus = 8
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    if cpus >= 8:
        # Fully distributed verification: two hash joins attach each side's
        # text to the candidate pairs (the candidate set never touches the
        # driver), then the exact-Jaccard check runs rowwise per batch — no
        # per-pair pandas groups.  The joins shuffle only (pair ids + the
        # matched texts); the corpus side is hash-partitioned once per join.
        nparts = max(2, min(32, cpus // 2))
        # The sort-based groupby upstream emits ZERO-COLUMN empty pandas
        # blocks for empty partitions; map_batches passes empty blocks
        # through without calling the UDF, and ray 2.49's hash-join
        # aggregator then fails with "No match ... FieldRef.Name(a)" when a
        # partition holds only such blocks.  Repartition coalesces the tiny
        # pair stream to O(cluster) schema-bearing blocks (the same
        # partial-coalesce discipline as pipelines/cumul.py) and scrubs the
        # degenerate empties before the join.
        pairs = pairs.repartition(nparts)
        ta = pairs.select_columns(["a", "b"]).join(
            texts, join_type="inner", num_partitions=nparts,
            on=("a",), right_on=("doc_id",), right_suffix="_a")
        ta = ta.map_batches(
            lambda t: t.rename_columns(
                ["text_a" if c == "text" else c for c in t.column_names]),
            batch_format="pyarrow")
        tb = ta.join(texts, join_type="inner", num_partitions=nparts,
                     on=("b",), right_on=("doc_id",), right_suffix="_b")
        tb = tb.map_batches(
            lambda t: t.rename_columns(
                ["text_b" if c == "text" else c for c in t.column_names]),
            batch_format="pyarrow")
        return tb.map_batches(verify_batch, batch_format="pyarrow")

    # Below ~8 CPU slots ray 2.49's hash-join aggregator actors starve the
    # streaming executor (same gate as pipelines/flagship.flagship_with_bytes)
    # — fall back to a broadcast semi-join: the candidate ID list (ints only)
    # drives an is_in filter and the matched texts merge driver-side.  This
    # path is for small fixtures; the join path above is the scale shape.
    import ray
    import pyarrow.compute as _pc

    EMPTY = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    pdf = pairs.select_columns(["a", "b"]).to_pandas()
    if len(pdf) == 0:
        return ray.data.from_arrow(EMPTY)
    ids = np.unique(np.concatenate([pdf["a"].to_numpy(), pdf["b"].to_numpy()]))
    keys_ref = ray.put(pa.array(ids.astype(np.int64)))

    def text_rows(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "text"]).filter(
            _pc.is_in(batch.column("doc_id"), value_set=ray.get(keys_ref)))

    tdf = ds.map_batches(text_rows, batch_format="pyarrow").to_pandas()
    tmap = dict(zip(tdf["doc_id"].astype(np.int64), tdf["text"]))
    out = verify_batch(pa.table({
        "a": pa.array(pdf["a"].astype(np.int64)),
        "b": pa.array(pdf["b"].astype(np.int64)),
        "text_a": pa.array([tmap.get(int(x), "") for x in pdf["a"]], pa.string()),
        "text_b": pa.array([tmap.get(int(x), "") for x in pdf["b"]], pa.string()),
    }))
    return ray.data.from_arrow(out)


def simhash64(text: str) -> int:
    h = _token_hashes(text, n=1)
    if len(h) == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    sh = np.array([simhash64(t) for t in texts], dtype=np.uint64).astype(np.int64)
    return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(sh)})


SIMHASH_BLOCKS = 4  # 4 × 16-bit blocks → exact recall for Hamming ≤ 3


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy < 2.0 has no bitwise_count)."""
    v = x.view(np.uint8) if x.dtype == np.uint64 else x.astype(np.uint64).view(np.uint8)
    return np.unpackbits(v.reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_neardup(ds, k: int = 3, max_bucket: int = 200):
    """documents Dataset → pairs with simhash Hamming distance ≤ k.

    Pigeonhole banding: split the 64-bit simhash into ``SIMHASH_BLOCKS``
    16-bit blocks; any pair within Hamming ≤ SIMHASH_BLOCKS-1 shares at
    least one intact block, so bucketing by (block index, block value) has
    exact recall for k ≤ 3.  Verification (popcount) runs inside the bucket
    groups; pairs found in several bands dedup through one tiny groupby.
    """
    from ray.data.aggregate import Min

    sig = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def explode_blocks(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy().astype(np.int64)
        doc = batch.column("doc_id").to_numpy()
        parts = []
        for blk in range(SIMHASH_BLOCKS):
            val = (sh.view(np.uint64) >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            parts.append(pa.table({
                "doc_id": pa.array(doc),
                "simhash": pa.array(sh),
                "bucket": pa.array((np.int64(blk) << 16) | val.astype(np.int64)),
            }))
        return pa.concat_tables(parts)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "hamming": pd.Series(dtype="int64")})
        u = df.drop_duplicates("doc_id").sort_values("doc_id")
        if len(u) < 2 or len(u) > max_bucket:  # skew guard (degenerate blocks)
            return empty
        ids = u["doc_id"].to_numpy()
        sh = u["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = _popcount64(sh[ii] ^ sh[jj])
        keep = ham <= k
        if not keep.any():
            return empty
        return pd.DataFrame({"a": ids[ii][keep], "b": ids[jj][keep],
                             "hamming": ham[keep].astype(np.int64)})

    return (sig.map_batches(explode_blocks, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
            .groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming")))


def embedding_neardup(ds, sim_threshold: float = 0.98, nbits: int = 12,
                      nbands: int = 2):
    """embeddings Dataset → near-dup pairs by cosine ≥ threshold.

    Banded LSH sign-pattern buckets (``nbands`` independent hyperplane sets,
    seed-fixed) → per-bucket exact cosine → pair dedup across bands — the
    scale path; brute-force all-pairs never happens.  Multiple bands keep
    recall high: a near-dup pair is missed only if a hyperplane splits it in
    EVERY band (~(nbits·θ/π)^nbands).
    """
    from ray.data.aggregate import Max

    def project(batch: pa.Table) -> pa.Table:
        from .ann import lsh_planes

        vec = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        signs = (vec @ lsh_planes(vec.shape[1], nbits * nbands, seed=42)) > 0
        parts = []
        for band in range(nbands):
            seg = signs[:, band * nbits:(band + 1) * nbits]
            b = (seg.astype(np.uint64) << np.arange(nbits, dtype=np.uint64)).sum(axis=1)
            parts.append(pa.table({
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(b.astype(np.int64) + (band << (nbits + 1))),
                "embedding": batch.column("embedding"),
            }))
        return pa.concat_tables(parts)

    def bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        v = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        n = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = n @ n.T
        ids = df["vec_id"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= sim_threshold
        lo = np.minimum(ids[ii][keep], ids[jj][keep])
        hi = np.maximum(ids[ii][keep], ids[jj][keep])
        return pd.DataFrame({"a": lo, "b": hi,
                             "cos": np.round(sims[ii, jj][keep], 6)})

    return (ds.map_batches(project, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_dups, batch_format="pandas")
            .groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos")))
