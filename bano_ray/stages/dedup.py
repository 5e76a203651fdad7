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

Hot-path kernel discipline: tokenization happens once per batch, shingles
are factorized to integer codes, and md5 runs only over the UNIQUE shingles
of a batch (shingle reuse across near-duplicate docs is high), so Python
only ever touches per-unique strings.  The permutation math, banding, and
per-doc min-reductions are pure numpy over the unique-hash table.

Skew guards never drop silently: every oversized bucket is counted in
:data:`DROP_STATS` and logged (the "no silent caps" rule) — at 100 TB a
dropped bucket is the most-duplicated content, so the drop must be visible.
"""

from __future__ import annotations

import hashlib
import itertools
import logging
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger("bano_ray.dedup")

MINHASH_PERMS = 64
MINHASH_BANDS = 16  # 16 bands × 4 rows
_MERS = (1 << 61) - 1

# Per-process dropped-bucket accounting (populated inside map_groups workers;
# read it in-process — unit tests call the group fns directly — and watch the
# WARNING log lines for distributed runs).
DROP_STATS: dict[str, int] = {}


def _record_drop(kind: str, size: int, cap: int) -> None:
    DROP_STATS[kind] = DROP_STATS.get(kind, 0) + 1
    DROP_STATS[kind + "_rows"] = DROP_STATS.get(kind + "_rows", 0) + size
    logger.warning("dedup skew guard: dropped %s bucket of %d members (cap %d); "
                   "total dropped so far in this worker: %d",
                   kind, size, cap, DROP_STATS[kind])


def drop_stats() -> dict[str, int]:
    """Snapshot of this process's dropped-bucket counters."""
    return dict(DROP_STATS)


def _md5_u64(data: bytes) -> int:
    """Upper md5 half little-endian — exactly DuckDB's ``md5_number_lower``,
    so the whole minhash/simhash family is SQL-replicable and the driver can
    value-gate it (oracle.py q_minhash_pairs / q_simhash / q_simhash_neardup)."""
    return int.from_bytes(hashlib.md5(data).digest()[8:], "little")


class _DuckMd5:
    """Per-process holder for the vectorized-md5 DuckDB connection.

    The live connection object is NOT picklable; ``__reduce__`` drops it so
    any cloudpickle capture (Ray UDF serialization) ships an empty holder
    and the destination process rebuilds its own connection lazily.
    """

    def __init__(self):
        self.con = None   # None = untried, False = unavailable

    def __reduce__(self):
        return (_DuckMd5, ())

    def get(self):
        if self.con is None:
            try:
                import duckdb

                con = duckdb.connect()
                probe = con.execute(
                    "SELECT md5_number_lower('bano-ray probe') AS h"
                ).fetchone()[0]
                assert int(probe) == _md5_u64(b"bano-ray probe")
                self.con = con
            except Exception:
                self.con = False
        return self.con


_DUCK_MD5 = _DuckMd5()


def md5_hex_many(strings) -> list[str]:
    """Vectorized md5 hex digests (DuckDB ``md5()`` fast path, hashlib
    fallback — identical values either way)."""
    if len(strings) == 0:
        return []
    con = _DUCK_MD5.get()
    if con:
        tbl = pa.table({"s": pa.array(strings, pa.string())})  # noqa: F841
        return con.execute("SELECT md5(s) AS h FROM tbl") \
            .fetch_arrow_table().column("h").to_pylist()
    return [hashlib.md5(s.encode()).hexdigest() for s in strings]


def _md5_u64_many(strings: np.ndarray) -> np.ndarray:
    """Vectorized md5-upper-half over an array of strings.

    Fast path: an in-process DuckDB connection runs ``md5_number_lower``
    over the whole column at once (~3.5× hashlib; DuckDB preserves insertion
    order for projections by default, and the equivalence with
    ``hashlib.md5(s).digest()[8:]`` little-endian is asserted at first use).
    Fallback: the hashlib loop.  Both produce identical uint64 values, so
    oracle parity is unaffected by which path runs.
    """
    if len(strings) == 0:
        return np.empty(0, np.uint64)
    con = _DUCK_MD5.get()
    is_arrow = isinstance(strings, (pa.Array, pa.ChunkedArray))
    if con:
        tbl = pa.table({"s": strings if is_arrow  # noqa: F841
                        else pa.array(strings, pa.string())})
        out = con.execute(
            "SELECT md5_number_lower(s) AS h FROM tbl").fetch_arrow_table()
        return out.column("h").to_numpy().astype(np.uint64)
    seq = strings.to_pylist() if is_arrow else strings
    return np.fromiter((_md5_u64(s.encode()) for s in seq),
                       dtype=np.uint64, count=len(seq))


def _md5_u64_ints(vals: np.ndarray) -> np.ndarray:
    """md5-upper-half of the DECIMAL STRING of each int64 — the int→varchar
    cast runs inside DuckDB's C kernel instead of materializing millions of
    Python strings (same values as ``_md5_u64_many(vals.astype(str))``;
    asserted by the sketch tests)."""
    if len(vals) == 0:
        return np.empty(0, np.uint64)
    con = _DUCK_MD5.get()
    if con:
        tbl = pa.table({"s": pa.array(np.asarray(vals, dtype=np.int64))})  # noqa: F841
        out = con.execute("SELECT md5_number_lower(CAST(s AS VARCHAR)) AS h "
                          "FROM tbl").fetch_arrow_table()
        return out.column("h").to_numpy().astype(np.uint64)
    return _md5_u64_many(np.asarray(np.asarray(vals).astype(str), dtype=object))


def _token_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles for ONE text (verification-path kernel;
    the signature hot path uses :func:`_batch_shingle_hashes`)."""
    toks = text.split()
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = _md5_u64(s.encode())
    return out


def _batch_shingle_hashes(texts: list[str], n: int = 3):
    """md5 shingle hashes for a whole batch at once, md5 only on uniques.

    Tokenizes every text, factorizes tokens to integer codes, builds the
    shingle windows as code n-tuples with pure array ops, uniquifies the
    tuples, and runs md5 over just the unique shingle strings.  Semantics
    are identical to per-doc :func:`_token_hashes` (same windows, same md5).

    Returns ``(uniq_h, codes, offsets)``: ``uniq_h`` uint64[U] hashes of the
    unique shingles, ``codes`` int64[S] indices into ``uniq_h`` laid out in
    doc order, ``offsets`` int64[D+1] per-doc segments of ``codes``.
    """
    D = len(texts)
    tok_lists = [t.split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=D)
    nwin = np.where(lens >= n, lens - n + 1, 0)
    nshort = ((lens > 0) & (lens < n)).astype(np.int64)
    cnt = nwin + nshort
    offsets = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(cnt, out=offsets[1:])

    flat = list(itertools.chain.from_iterable(tok_lists))
    if not flat:
        return np.empty(0, np.uint64), np.empty(0, np.int64), offsets
    tok_codes, uniq_toks = pd.factorize(np.asarray(flat, dtype=object),
                                        use_na_sentinel=False)
    tok_codes = tok_codes.astype(np.int64)

    doc_off = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_off[1:])
    # window start positions in the flat token array, in doc order
    total_win = int(nwin.sum())
    within = np.arange(total_win) - np.repeat(np.cumsum(nwin) - nwin, nwin)
    starts = np.repeat(doc_off[:-1], nwin) + within
    tri = np.empty((total_win, n), dtype=np.int64)
    for j in range(n):
        tri[:, j] = tok_codes[starts + j]
    # unique shingles as code n-tuples (no strings built for repeats).
    # Fast path: pack the n codes into ONE int64 key (21 bits per code holds
    # up to 2M distinct tokens per batch) so np.unique sorts plain ints, not
    # structured voids (~10× faster); fall back to the void view otherwise.
    if len(uniq_toks) < (1 << 21) and n <= 3:
        key = tri[:, 0]
        for j in range(1, n):
            key = (key << 21) | tri[:, j]
        uniq_k, first, inv = np.unique(key, return_index=True,
                                       return_inverse=True)
        uniq_tri = tri[first]
    else:
        view = np.ascontiguousarray(tri).view([("", np.int64)] * n).ravel()
        uniq_v, inv = np.unique(view, return_inverse=True)
        uniq_tri = uniq_v.view(np.int64).reshape(-1, n)
    tok_arr = np.asarray(uniq_toks, dtype=object)
    if n == 1:
        uniq_strs = tok_arr.take(uniq_tri[:, 0])
    else:
        s = pd.Series(tok_arr.take(uniq_tri[:, 0]))
        uniq_strs = s.str.cat([pd.Series(tok_arr.take(uniq_tri[:, j]))
                               for j in range(1, n)], sep=" ").to_numpy()
    uniq_h = _md5_u64_many(uniq_strs)
    n_win_uniq = len(uniq_h)
    short_idx = np.flatnonzero(nshort)
    if len(short_idx):
        short_h = _md5_u64_many(
            np.asarray([" ".join(tok_lists[i]) for i in short_idx], dtype=object))
        uniq_h = np.concatenate([uniq_h, short_h])

    # scatter shingle codes into doc order (windows first, short docs' single
    # whole-text shingle in its own slot)
    codes = np.empty(int(cnt.sum()), dtype=np.int64)
    win_targets = np.repeat(offsets[:-1], nwin) + within
    codes[win_targets] = inv
    if len(short_idx):
        codes[offsets[:-1][short_idx]] = n_win_uniq + np.arange(len(short_idx))
    return uniq_h, codes, offsets


_A = np.random.default_rng(1234).integers(1, _MERS, MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_B = np.random.default_rng(5678).integers(0, _MERS, MINHASH_PERMS, dtype=np.int64).astype(np.uint64)


def minhash_sigs(texts: list[str]) -> np.ndarray:
    """(len(texts), MINHASH_PERMS) uint64 signatures, fully vectorized:
    permutation values are computed once per UNIQUE shingle, then reduced
    per doc with ``np.minimum.reduceat``.  Empty texts get all-zero rows
    (same contract as the old per-doc kernel)."""
    sigs = np.zeros((len(texts), MINHASH_PERMS), dtype=np.uint64)
    uniq_h, codes, offsets = _batch_shingle_hashes(texts)
    if len(codes) == 0:
        return sigs
    # (a*h + b) wraps mod 2^64 (numpy uint64) before the Mersenne mod — the
    # oracle replicates both mods explicitly (oracle.q_minhash_pairs).
    # Adaptive: when shingle reuse is high (dup-heavy batches) compute the
    # perm values once per UNIQUE and gather; when reuse is low, compute
    # directly on the flat hash stream (one less (P, S) materialization).
    if len(uniq_h) * 2 < len(codes):
        pv = (uniq_h[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERS)
        flat = pv[:, codes]                                              # (P, S)
    else:
        hf = uniq_h[codes]
        flat = (hf[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERS)
    cnt = np.diff(offsets)
    nz = np.flatnonzero(cnt)
    red = np.minimum.reduceat(flat, offsets[:-1][nz], axis=1)
    sigs[nz] = red.T
    return sigs


def minhash_signature(text: str) -> np.ndarray:
    return minhash_sigs([text])[0]


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (deterministic, process-independent)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def band_hashes(sigs: np.ndarray) -> np.ndarray:
    """(D, MINHASH_BANDS) int64 bucket ids: a splitmix64 chain over each
    band's signature rows, seeded by the band index.  Bucket values are pure
    group keys — equal segments collide by construction, distinct segments
    collide with ~2^-63 probability — so the oracle (which groups by the
    segment VALUES, oracle.q_minhash_pairs mh_seg) is insensitive to them."""
    D = sigs.shape[0]
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    out = np.empty((D, MINHASH_BANDS), dtype=np.int64)
    for b in range(MINHASH_BANDS):
        seed = np.uint64((0x9E3779B97F4A7C15 * (b + 1)) & 0xFFFFFFFFFFFFFFFF)
        h = np.full(D, seed, dtype=np.uint64)
        for j in range(rows_per_band):
            h = _mix64(h ^ sigs[:, b * rows_per_band + j])
        out[:, b] = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    return out


def minhash_batch(batch: pa.Table) -> pa.Table:
    """doc_id/text batch → (doc_id, band_hashes list<int64>).  Signatures are
    computed once per UNIQUE text (pd.factorize), then gathered."""
    texts = batch.column("text").to_pylist()
    if not texts:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "band_hashes": pa.array([], type=pa.list_(pa.int64()))})
    t_codes, t_uniq = pd.factorize(np.asarray(texts, dtype=object),
                                   use_na_sentinel=False)
    bh = band_hashes(minhash_sigs(list(t_uniq)))[t_codes]        # (D, B)
    D = len(texts)
    lists = pa.ListArray.from_arrays(
        pa.array(np.arange(D + 1, dtype=np.int64) * MINHASH_BANDS, pa.int32()),
        pa.array(bh.ravel()))
    return pa.table({"doc_id": batch.column("doc_id"), "band_hashes": lists})


@lru_cache(maxsize=1 << 16)
def _hash_set(text: str, n: int = 3) -> frozenset:
    """Per-worker memo of a text's shingle-hash set — candidate verification
    touches each text once per process no matter how many pairs it joins."""
    return frozenset(_token_hashes(text, n).tolist())


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = _hash_set(a, n), _hash_set(b, n)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


_EMPTY_PAIRS = pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})


def minhash_bucket_pairs(df: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """Per-bucket candidate pairs with the skew guard (module-level so the
    guard behavior is directly unit-testable)."""
    ids = np.sort(df["doc_id"].unique())
    if len(ids) < 2:
        return _EMPTY_PAIRS
    if len(ids) > max_bucket:   # skew guard: giant buckets are degenerate
        _record_drop("minhash", len(ids), max_bucket)
        return _EMPTY_PAIRS
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[a].astype(np.int64),
                         "b": ids[b].astype(np.int64)})


def _coarse_groups(default_cpus: int = 32) -> int:
    """Coarse-shard count for :func:`bucketed_pairs`: 256 shards per cluster
    CPU, so one shard holds ~(rows per CPU)/256 — per-group memory shrinks
    as the cluster grows with the data."""
    cpus = default_cpus
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", default_cpus))
    except Exception:
        pass
    return max(1024, 256 * cpus)


def bucketed_pairs(ds, pair_fn, key: str = "bucket"):
    """``ds.groupby(key).map_groups(pair_fn)`` without Ray's per-group
    dispatch cost.

    The LSH-family bucket keys are near-unique (one group per band value /
    shingle hash), so a true per-bucket ``map_groups`` pays the executor's
    per-group overhead ~once per ROW — measured ~20 s for 70k buckets at
    sf0.1.  Instead, group on a coarse shard of the key (a pure function of
    it, so every true bucket still lands whole in exactly one group), then
    inside the UDF drop singleton buckets with one vectorized
    ``duplicated`` pass (the vast majority — no per-bucket frame is ever
    built for them) and run ``pair_fn`` per surviving true bucket via
    pandas groupby (~50 µs/group vs Ray's ~0.3 ms)."""
    C = _coarse_groups()

    def shard(batch: pa.Table) -> pa.Table:
        arr = batch.column(key).to_numpy()
        coarse = (arr.astype(np.uint64, copy=False)
                  % np.uint64(C)).astype(np.int64)
        return batch.append_column("_shard", pa.array(coarse))

    def grouped(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df[key].duplicated(keep=False)]
        if len(sub) == 0:
            return pair_fn(df.iloc[0:0])
        parts = [pair_fn(g) for _, g in sub.groupby(key, sort=False)]
        out = pd.concat(parts, ignore_index=True)
        return out if len(out) else pair_fn(df.iloc[0:0])

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard").map_groups(grouped, batch_format="pandas"))


def minhash_candidate_pairs(ds, threshold: float = 0.7, max_bucket: int = 200):
    """documents Dataset → verified near-dup pairs (doc_a, doc_b, jaccard).

    flat_map band hashes → groupby(band bucket) → per-bucket pairs →
    distinct → exact-Jaccard verify (re-reading text via a broadcast of the
    candidate ids only — candidates are tiny relative to the corpus).
    """
    import ray

    sig = ds.map_batches(minhash_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = batch.column("doc_id").to_numpy()
        flat = pc.list_flatten(batch.column("band_hashes")).to_numpy()
        return pa.table({"doc_id": pa.array(np.repeat(doc, MINHASH_BANDS)),
                         "bucket": pa.array(flat)})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return minhash_bucket_pairs(df, max_bucket=max_bucket)

    pairs = bucketed_pairs(sig.map_batches(explode, batch_format="pyarrow"),
                           bucket_pairs)
    return verified_pairs(ds, pairs, threshold)


DELTA_MOD = 5   # doc_id % DELTA_MOD == 0 plays the incoming delta shard


def incremental_dedup(ds, threshold: float = 0.5, max_bucket: int = 200):
    """Incremental-ingest dedup: the DELTA shard (doc_id % DELTA_MOD == 0,
    standing in for a new crawl batch) matched against the BASE corpus —
    banded MinHash candidates restricted to CROSS (delta, base) pairs,
    exact-Jaccard verified, then per delta doc the best base match
    (max jaccard, tie min base id).  The production shape: signatures for
    base docs would come from the persisted signature index; only the
    delta side is computed fresh, and no delta-delta or base-base pair is
    ever formed."""
    from ray.data.aggregate import Min

    sig = ds.map_batches(minhash_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = batch.column("doc_id").to_numpy()
        flat = pc.list_flatten(batch.column("band_hashes")).to_numpy()
        return pa.table({"doc_id": pa.array(np.repeat(doc, MINHASH_BANDS)),
                         "bucket": pa.array(flat)})

    def cross_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df["doc_id"].unique())
        if len(ids) < 2:
            return _EMPTY_PAIRS
        if len(ids) > max_bucket:
            _record_drop("minhash_incr", len(ids), max_bucket)
            return _EMPTY_PAIRS
        delta = ids[ids % DELTA_MOD == 0]
        base = ids[ids % DELTA_MOD != 0]
        if len(delta) == 0 or len(base) == 0:
            return _EMPTY_PAIRS
        return pd.DataFrame({
            "a": np.repeat(delta, len(base)).astype(np.int64),
            "b": np.tile(base, len(delta)).astype(np.int64)})

    pairs = bucketed_pairs(sig.map_batches(explode, batch_format="pyarrow"),
                           cross_pairs)
    ver = verified_pairs(ds, pairs, threshold)   # (doc_a=delta, doc_b=base)

    def best(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["jaccard", "doc_b"],
                           ascending=[False, True], kind="stable")
        top = d.groupby("doc_a", sort=False).head(1)
        return pd.DataFrame({
            "delta_id": top["doc_a"].to_numpy().astype(np.int64),
            "dup_of": top["doc_b"].to_numpy().astype(np.int64),
            "jaccard": top["jaccard"].to_numpy()})

    return ver.groupby("doc_a").map_groups(best, batch_format="pandas")


def _pair_text_rows(ds, pairs):
    """Attach each candidate side's text → rows (a, b, text_a, text_b).

    ≥8 CPU slots: two distributed hash joins (the candidate set never
    touches the driver; the corpus side is hash-partitioned once per
    join).  Below ~8 slots ray 2.49's hash-join aggregator actors starve
    the streaming executor (same gate as flagship_with_bytes), so a
    broadcast semi-join collects the matched texts driver-side — the
    small-fixture path; the join path is the scale shape.  Join-path rows
    may repeat a pair (one row per surfacing band/bucket — duplicates are
    verified redundantly and deduped AFTER the per-pair compute, where
    rows number O(true candidates); deduping the raw candidate stream
    instead costs a sort-based aggregate that measured ~90 s at 430k
    candidates vs ~7% wasted re-verification); the broadcast path
    pre-dedups."""
    import ray
    import pyarrow.compute as _pc

    texts = ds.select_columns(["doc_id", "text"])
    cpus = 8
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    if cpus >= 8:
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
        return tb.map_batches(
            lambda t: t.rename_columns(
                ["text_b" if c == "text" else c for c in t.column_names]),
            batch_format="pyarrow")

    EMPTY = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "text_a": pa.array([], pa.string()),
                      "text_b": pa.array([], pa.string())})
    pdf = pairs.select_columns(["a", "b"]).to_pandas().drop_duplicates(["a", "b"])
    if len(pdf) == 0:
        return ray.data.from_arrow(EMPTY)
    ids = np.unique(np.concatenate([pdf["a"].to_numpy(), pdf["b"].to_numpy()]))
    keys_ref = ray.put(pa.array(ids.astype(np.int64)))

    def text_rows(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "text"]).filter(
            _pc.is_in(batch.column("doc_id"), value_set=ray.get(keys_ref)))

    tdf = ds.map_batches(text_rows, batch_format="pyarrow").to_pandas()
    tmap = dict(zip(tdf["doc_id"].astype(np.int64), tdf["text"]))
    return ray.data.from_arrow(pa.table({
        "a": pa.array(pdf["a"].astype(np.int64)),
        "b": pa.array(pdf["b"].astype(np.int64)),
        "text_a": pa.array([tmap.get(int(x), "") for x in pdf["a"]], pa.string()),
        "text_b": pa.array([tmap.get(int(x), "") for x in pdf["b"]], pa.string()),
    }))


def _gather_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate ``[starts[i], starts[i]+counts[i])`` ranges, vectorized."""
    total = int(counts.sum())
    within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return np.repeat(starts, counts) + within


def _pair_jaccard_counts(ta: list[str], tb: list[str], n: int = 3):
    """Exact distinct-shingle ``(|A∩B|, |A∪B|, |A|, |B|)`` int64 counts
    for P text pairs, fully vectorized over the PAIR AXIS: texts factorize to
    uniques, shingle-hash ONCE per unique text
    (:func:`_batch_shingle_hashes` — md5 only on unique shingles), then
    every pair's intersection resolves in one sort over packed
    (pair, shingle) keys.  Replaces the per-pair Python set loop whose
    tail cost was re-tokenizing texts past the lru memo — at adversarial
    candidate volume (10⁵ planted pairs, 2·10⁵ unique 60-token texts,
    cold memo) the loop measured 27.4 µs/pair; this kernel 3.9 µs/pair
    (see BASELINE.md)."""
    P = len(ta)
    if P == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    codes, uniq = pd.factorize(np.asarray(ta + tb, dtype=object),
                               use_na_sentinel=False)
    codes = codes.astype(np.int64)
    uniq_h, sh_codes, offsets = _batch_shingle_hashes(list(uniq), n)
    U = np.int64(len(uniq_h) + 1)
    # distinct shingles per unique text: dedupe packed (owner, code)
    cnt = np.diff(offsets)
    owner = np.repeat(np.arange(len(uniq), dtype=np.int64), cnt)
    dk = np.unique(owner * U + sh_codes)
    d_owner = dk // U
    d_code = dk % U
    sizes = np.bincount(d_owner, minlength=len(uniq)).astype(np.int64)
    d_off = np.zeros(len(uniq) + 1, dtype=np.int64)
    np.cumsum(sizes, out=d_off[1:])
    ia, ib = codes[:P], codes[P:]
    na, nb = sizes[ia], sizes[ib]
    # both sides' distinct codes, tagged with the pair index; a code
    # seen twice under one pair is in the intersection (each side is
    # distinct on its own)
    pk = np.concatenate([
        np.repeat(np.arange(P, dtype=np.int64), na) * U
        + d_code[_gather_ranges(d_off[ia], na)],
        np.repeat(np.arange(P, dtype=np.int64), nb) * U
        + d_code[_gather_ranges(d_off[ib], nb)]])
    pk.sort(kind="stable")
    dup = pk[1:] == pk[:-1]
    num = np.bincount((pk[1:][dup] // U), minlength=P).astype(np.int64)
    den = na + nb - num
    return num, den, na, nb


def verified_pairs(ds, pairs, threshold: float):
    """Shared exact-Jaccard verification tail for the candidate-pair family
    (minhash banding, jaccard prefix filtering): ``pairs`` is a Dataset with
    int64 ``a``/``b`` doc ids — duplicates allowed (see _pair_text_rows).
    Each side's text attaches via _pair_text_rows, then the exact
    word-3-gram Jaccard check runs rowwise per batch."""
    from ray.data.aggregate import Min

    def verify_batch(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        num, den, _, _ = _pair_jaccard_counts(ta, tb)
        js = np.where(den > 0, num / np.maximum(den, 1), 1.0)
        keep = js >= threshold
        return pa.table({"doc_a": pa.array(a[keep]),
                         "doc_b": pa.array(b[keep]),
                         "jaccard": pa.array(np.round(js[keep], 6))})

    verified = _pair_text_rows(ds, pairs).map_batches(
        verify_batch, batch_format="pyarrow")
    # post-verify dedup: few groups (O(true near-dups)), identical
    # jaccard values for duplicates, so Min is just a picker
    return verified.groupby(["doc_a", "doc_b"]).aggregate(
        Min("jaccard", alias_name="jaccard"))


def minhash_est_err(ds, max_bucket: int = 200):
    """Sketch-quality census (q_ann_recall's sibling for the dedup
    family): for EVERY banded candidate pair — same banding and skew
    guard as :func:`minhash_candidate_pairs`, no threshold cut — the
    MinHash estimator's evidence vs ground truth: ``sig_match`` equal
    components out of MINHASH_PERMS, and the exact distinct-shingle-set
    ``jac_num``/``jac_den`` as integers (the estimate is sig_match/64,
    the truth num/den — both exact, so the census is hash-gated)."""
    from ray.data.aggregate import Min

    sig = ds.map_batches(minhash_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = batch.column("doc_id").to_numpy()
        flat = pc.list_flatten(batch.column("band_hashes")).to_numpy()
        return pa.table({"doc_id": pa.array(np.repeat(doc, MINHASH_BANDS)),
                         "bucket": pa.array(flat)})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return minhash_bucket_pairs(df, max_bucket=max_bucket)

    pairs = bucketed_pairs(sig.map_batches(explode, batch_format="pyarrow"),
                           bucket_pairs)

    def est_batch(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        sm = (minhash_sigs(ta) == minhash_sigs(tb)).sum(axis=1)
        num, den, _, _ = _pair_jaccard_counts(ta, tb)
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b),
                         "sig_match": pa.array(sm.astype(np.int64)),
                         "jac_num": pa.array(num),
                         "jac_den": pa.array(den)})

    est = _pair_text_rows(ds, pairs).map_batches(
        est_batch, batch_format="pyarrow")
    return est.groupby(["doc_a", "doc_b"]).aggregate(
        Min("sig_match", alias_name="sig_match"),
        Min("jac_num", alias_name="jac_num"),
        Min("jac_den", alias_name="jac_den"))


def containment_pairs(ds, max_bucket: int = 200):
    """Asymmetric CONTAINMENT census over the banded MinHash candidates:
    for every candidate pair the exact distinct-shingle counts and both
    directional containments ``|A∩B|/|A|`` and ``|A∩B|/|B|`` — the
    quote/subset-detection signal resemblance (Jaccard) misses when a
    small document is wholly embedded in a large one (Broder's
    containment).  Same banding, same skew guard, same pair-text join and
    the same vectorized pair kernel as :func:`minhash_est_err`."""
    from ray.data.aggregate import Min

    sig = ds.map_batches(minhash_batch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc = batch.column("doc_id").to_numpy()
        flat = pc.list_flatten(batch.column("band_hashes")).to_numpy()
        return pa.table({"doc_id": pa.array(np.repeat(doc, MINHASH_BANDS)),
                         "bucket": pa.array(flat)})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return minhash_bucket_pairs(df, max_bucket=max_bucket)

    pairs = bucketed_pairs(sig.map_batches(explode, batch_format="pyarrow"),
                           bucket_pairs)

    def cont_batch(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        num, _den, na, nb = _pair_jaccard_counts(ta, tb)
        return pa.table({
            "doc_a": pa.array(a), "doc_b": pa.array(b),
            "n_inter": pa.array(num), "n_a": pa.array(na),
            "n_b": pa.array(nb),
            "cont_ab": pa.array(np.round(
                num / np.maximum(na, 1), 6)),
            "cont_ba": pa.array(np.round(
                num / np.maximum(nb, 1), 6)),
        })

    est = _pair_text_rows(ds, pairs).map_batches(
        cont_batch, batch_format="pyarrow")
    return est.groupby(["doc_a", "doc_b"]).aggregate(
        Min("n_inter", alias_name="n_inter"),
        Min("n_a", alias_name="n_a"),
        Min("n_b", alias_name="n_b"),
        Min("cont_ab", alias_name="cont_ab"),
        Min("cont_ba", alias_name="cont_ba"))


def boilerplate_census(ds):
    """(doc_id, n_shingles, n_shared, shared_frac): per document the
    count of its DISTINCT word-3-gram shingles that also occur in at
    least one OTHER document — the boilerplate/template signal (headers,
    footers, navigation chrome score high).  Shape: one (shingle, doc)
    distinct explode → a shingle-keyed groupby computing per-shingle doc
    counts AND distributing them back as (doc, shared?) partials in the
    SAME group pass → one doc-keyed sum.  Shuffle volume is distinct
    (shingle, doc) pairs — the minhash family's exchange, never raw
    text."""
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        uniq_h, codes, offsets = _batch_shingle_hashes(texts)
        cnt = np.diff(offsets)
        owner = np.repeat(ids, cnt)
        h = uniq_h[codes]
        # distinct (doc, h) within the block (a document is atomic in its
        # block, so block-local dedup IS global dedup for the pair)
        df = pd.DataFrame({"doc_id": owner, "h": h.astype(np.int64)})
        df = df.drop_duplicates()
        return pa.table({"h": pa.array(df["h"].to_numpy()),
                         "doc_id": pa.array(df["doc_id"].to_numpy())})

    C = np.int64(_coarse_groups())

    def shard(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy()
        return batch.append_column(
            "_shard", pa.array((h.astype(np.uint64) % np.uint64(C))
                               .astype(np.int64)))

    def per_shingle(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["h", "doc_id"])
        sizes = d.groupby("h", sort=False)["doc_id"].transform("size")
        return pd.DataFrame({
            "doc_id": d["doc_id"].to_numpy().astype(np.int64),
            "n_shingles": np.ones(len(d), dtype=np.int64),
            "n_shared": (sizes.to_numpy() > 1).astype(np.int64)})

    agg = (ds.map_batches(explode, batch_format="pyarrow")
           .map_batches(shard, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shingle, batch_format="pandas")
           .groupby("doc_id")
           .aggregate(Sum("n_shingles", alias_name="n_shingles"),
                      Sum("n_shared", alias_name="n_shared")))

    def finish(batch: pa.Table) -> pa.Table:
        ns = batch.column("n_shingles").to_numpy().astype(np.float64)
        sh = batch.column("n_shared").to_numpy().astype(np.float64)
        return batch.append_column(
            "shared_frac", pa.array(np.round(sh / np.maximum(ns, 1.0), 6)))

    return agg.map_batches(finish, batch_format="pyarrow")


def jaccard_prefix_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """Prefix-filter candidate generation for EXACT-recall n-gram Jaccard
    near-dup (the all-pairs-similarity prefix principle, hash-value order):
    two docs with ``J >= t`` must share a shingle within each side's first
    ``floor((1-t)*n)+1`` distinct shingles under any fixed global shingle
    order — here ascending md5 hash, so no global-frequency pass is needed
    and the whole step stays one vectorized map.  Emits
    ``(h, doc_id, n_sh)`` rows for prefix shingles only."""
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    uniq_h, codes, offsets = _batch_shingle_hashes(texts)
    cnt = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(texts)), cnt)
    h = uniq_h[codes]
    # distinct (doc, h), hash-ascending within doc
    order = np.lexsort((h, doc_idx))
    d2, h2 = doc_idx[order], h[order]
    first = np.ones(len(d2), dtype=bool)
    first[1:] = (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])
    d2, h2 = d2[first], h2[first]
    # per-doc distinct count + within-doc rank
    n_distinct = np.bincount(d2, minlength=len(texts)).astype(np.int64)
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(n_distinct[:-1], out=starts[1:])
    rank = np.arange(len(d2)) - starts[d2]
    p = np.floor((1.0 - threshold) * n_distinct).astype(np.int64) + 1
    keep = rank < p[d2]
    return pa.table({
        "h": pa.array(h2[keep]),
        "doc_id": pa.array(ids[d2[keep]]),
        "n_sh": pa.array(n_distinct[d2[keep]]),
    })


def jaccard_bucket_pairs(df: pd.DataFrame, threshold: float,
                         max_bucket: int = 200) -> pd.DataFrame:
    """Per-prefix-shingle candidate pairs with the standard Jaccard size
    filter (``min(n) >= t * max(n)``: J <= min/max, so smaller ratios cannot
    reach t) and the same counted skew guard as the minhash path."""
    sub = df.drop_duplicates("doc_id").sort_values("doc_id")
    if len(sub) < 2:
        return _EMPTY_PAIRS
    if len(sub) > max_bucket:
        _record_drop("jaccard", len(sub), max_bucket)
        return _EMPTY_PAIRS
    ids = sub["doc_id"].to_numpy().astype(np.int64)
    ns = sub["n_sh"].to_numpy().astype(np.int64)
    ai, bi = np.triu_indices(len(ids), k=1)
    lo = np.minimum(ns[ai], ns[bi]).astype(np.float64)
    hi = np.maximum(ns[ai], ns[bi]).astype(np.float64)
    ok = lo >= threshold * hi
    return pd.DataFrame({"a": ids[ai[ok]], "b": ids[bi[ok]]})


def jaccard_neardup(ds, threshold: float = 0.5, max_bucket: int = 200):
    """documents Dataset → EXACT-recall near-dup pairs (doc_a, doc_b,
    jaccard >= threshold).

    Unlike the probabilistic minhash banding, prefix filtering guarantees
    every qualifying pair surfaces as a candidate; the shuffle is the one
    prefix-shingle groupby (volume ~(1-t)·distinct-shingles) and
    verification reuses the distributed join tail (:func:`verified_pairs`).
    """

    def prefix(batch: pa.Table) -> pa.Table:
        return jaccard_prefix_batch(batch, threshold)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return jaccard_bucket_pairs(df, threshold, max_bucket=max_bucket)

    pairs = bucketed_pairs(ds.map_batches(prefix, batch_format="pyarrow"),
                           bucket_pairs, key="h")
    return verified_pairs(ds, pairs, threshold)


def simhash_sigs(texts: list[str]) -> np.ndarray:
    """(len(texts),) int64 simhashes, vectorized over the batch: the bit
    matrix is built once per UNIQUE token hash and per-doc sums run through
    ``np.add.reduceat`` (token REPEATS within a doc count, same as the
    per-doc kernel and the oracle's per-occurrence sum)."""
    out = np.zeros(len(texts), dtype=np.int64)
    uniq_h, codes, offsets = _batch_shingle_hashes(texts, n=1)
    if len(codes) == 0:
        return out
    ubits = ((uniq_h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
             & np.uint64(1)).astype(np.int8)
    contrib = (2 * ubits - 1).astype(np.int32)[codes]        # (S, 64)
    cnt = np.diff(offsets)
    nz = np.flatnonzero(cnt)
    v = np.add.reduceat(contrib, offsets[:-1][nz], axis=0)   # (docs, 64)
    sh = ((v > 0).astype(np.uint64)
          << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    out[nz] = sh.astype(np.int64)
    return out


def simhash64(text: str) -> int:
    return int(simhash_sigs([text])[0])


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    if not texts:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array([], pa.int64())})
    t_codes, t_uniq = pd.factorize(np.asarray(texts, dtype=object),
                                   use_na_sentinel=False)
    sh = simhash_sigs(list(t_uniq))[t_codes]
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
        return simhash_bucket_pairs(df, k=k, max_bucket=max_bucket)

    return (bucketed_pairs(sig.map_batches(explode_blocks,
                                           batch_format="pyarrow"),
                           bucket_pairs)
            .groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming")))


def simhash_bucket_pairs(df: pd.DataFrame, k: int = 3,
                         max_bucket: int = 200) -> pd.DataFrame:
    """Per-bucket Hamming-verify with the skew guard (module-level for
    direct unit testing of the guard)."""
    return _hamming_bucket_pairs(df, "simhash", k=k, max_bucket=max_bucket,
                                 family="simhash")


def _hamming_bucket_pairs(df: pd.DataFrame, sig_col: str, k: int,
                          max_bucket: int, family: str) -> pd.DataFrame:
    """Shared per-bucket Hamming verification for the 64-bit-signature
    banding families (simhash over text, phash over images)."""
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "hamming": pd.Series(dtype="int64")})
    u = df.drop_duplicates("doc_id").sort_values("doc_id")
    if len(u) < 2:
        return empty
    if len(u) > max_bucket:     # skew guard (degenerate blocks)
        _record_drop(family, len(u), max_bucket)
        return empty
    ids = u["doc_id"].to_numpy()
    sh = u[sig_col].to_numpy().astype(np.int64).view(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    ham = _popcount64(sh[ii] ^ sh[jj])
    keep = ham <= k
    if not keep.any():
        return empty
    return pd.DataFrame({"a": ids[ii][keep], "b": ids[jj][keep],
                         "hamming": ham[keep].astype(np.int64)})


PHASH_BLOCKS = 4   # 4 × 12-bit blocks over the 48-bit phash space
PHASH_BLOCK_BITS = 12


def phash_neardup(ds, k: int = 3, max_bucket: int = 200):
    """images Dataset (doc_id, phash) → pairs with phash Hamming ≤ k.

    The image-payload twin of :func:`simhash_neardup` (reference parity:
    bano's dedup merges exact keys only — Hamming-tolerant perceptual-hash
    matching is the §2.8 multimodal extension).  The synthesized phash
    lives in [0, 2^48) (datagen.PHASH_MOD < 2^48), so the pigeonhole split
    is 4 × 12-bit blocks over the low 48 bits — a 4 × 16-bit split of a
    48-bit value would make the top block identically zero, i.e. one
    degenerate bucket holding the whole corpus that the skew guard would
    then drop.  Exact recall for k ≤ PHASH_BLOCKS - 1; verification
    (popcount) runs inside bucket groups; duplicates found via several
    blocks dedup through one tiny groupby.
    """
    from ray.data.aggregate import Min

    def explode_blocks(batch: pa.Table) -> pa.Table:
        ph = batch.column("phash").to_numpy().astype(np.int64)
        doc = batch.column("doc_id").to_numpy()
        parts = []
        for blk in range(PHASH_BLOCKS):
            val = ((ph.view(np.uint64) >> np.uint64(PHASH_BLOCK_BITS * blk))
                   & np.uint64((1 << PHASH_BLOCK_BITS) - 1))
            parts.append(pa.table({
                "doc_id": pa.array(doc),
                "phash": pa.array(ph),
                "bucket": pa.array((np.int64(blk) << PHASH_BLOCK_BITS)
                                   | val.astype(np.int64)),
            }))
        return pa.concat_tables(parts)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _hamming_bucket_pairs(df, "phash", k=k, max_bucket=max_bucket,
                                     family="phash")

    return (bucketed_pairs(ds.map_batches(explode_blocks,
                                          batch_format="pyarrow"),
                           bucket_pairs)
            .groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming")))


def embedding_neardup(ds, sim_threshold: float = 0.98, nbits: int = 12,
                      nbands: int = 2, max_bucket: int = 4096):
    """embeddings Dataset → near-dup pairs by cosine ≥ threshold.

    Banded LSH sign-pattern buckets (``nbands`` independent hyperplane sets,
    seed-fixed) → per-bucket exact cosine → pair dedup across bands — the
    scale path; brute-force all-pairs never happens.  Multiple bands keep
    recall high: a near-dup pair is missed only if a hyperplane splits it in
    EVERY band (~(nbits·θ/π)^nbands).

    ``max_bucket`` bounds the in-bucket O(n²) cosine (a degenerate bucket —
    zero/constant vectors hashing together — would otherwise OOM a worker);
    drops are counted + logged, never silent, and the oracle applies the
    identical bound (oracle.q_embedding_neardup en_ok).
    """
    from ray.data.aggregate import Max

    def project(batch: pa.Table) -> pa.Table:
        from .ann import emb_matrix, lsh_planes

        vec = emb_matrix(batch.column("embedding"))
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
        return embedding_bucket_dups(df, sim_threshold=sim_threshold,
                                     max_bucket=max_bucket)

    return (bucketed_pairs(ds.map_batches(project, batch_format="pyarrow"),
                           bucket_dups)
            .groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos")))


def embedding_bucket_dups(df: pd.DataFrame, sim_threshold: float = 0.98,
                          max_bucket: int = 4096) -> pd.DataFrame:
    """Per-bucket exact-cosine verify with the skew guard: bounds the O(n²)
    in-bucket similarity so a degenerate bucket (zero/constant vectors all
    hashing together) can't OOM a worker; drops are counted + logged.  The
    oracle applies the identical bound (oracle.q_embedding_neardup en_ok)."""
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "cos": pd.Series(dtype="float64")})
    if len(df) < 2:
        return empty
    if len(df) > max_bucket:    # skew guard: bounds the n² in-bucket cosine
        _record_drop("embedding", len(df), max_bucket)
        return empty
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
