"""Distributed sketches: HyperLogLog registers and a deterministic min-hash
sample — the bounded-state aggregates a 100 TB pipeline uses where exact
answers would shuffle everything.

Both are MERGEABLE map-side partials: every block reduces to O(m) / O(k)
rows locally, so the only shuffle moves sketch-sized data no matter how big
the input is.  Both hash with md5 (``dedup._md5_u64_many``), so the exact
register/sample contents replicate in closed-form SQL and the driver's
value-parity gate applies — the ESTIMATE quality is asserted separately in
tests against the exact distinct count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P


def _hash_column_u64(col) -> np.ndarray:
    """md5-u64 of a pa column's values-as-strings.  Integer columns hash
    through DuckDB's CAST(.. AS VARCHAR) C kernel (no per-row Python
    strings — ``astype(str)`` of 6M int64s was most of q_hll_registers'
    wall); other types fall back to the object-string path."""
    import pyarrow.types as pt

    from .dedup import _DUCK_MD5, _md5_u64_ints, _md5_u64_many

    if pt.is_integer(col.type):
        return _md5_u64_ints(col.to_numpy().astype(np.int64))
    con = _DUCK_MD5.get()
    if con and (pt.is_string(col.type) or pt.is_large_string(col.type)):
        # feed the Arrow column straight in — zero-copy into DuckDB
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        tbl = pa.table({"s": arr})  # noqa: F841
        out = con.execute(
            "SELECT md5_number_lower(s) AS h FROM tbl").fetch_arrow_table()
        return out.column("h").to_numpy().astype(np.uint64)
    return _md5_u64_many(np.asarray(col.to_pylist(), dtype=object))


def _hll_rank(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register, rank) per hash: register = low HLL_P bits; rank =
    trailing-zero count of the remaining 64−HLL_P bits, +1; v == 0 → max
    rank.  ``v & -v`` isolates the lowest set bit (a power of two ≤ 2^55,
    exactly representable in float64), so ``frexp`` returns rank = k+1
    directly — same value as the SQL oracle's
    ``bit_count((v & -v) - 1) + 1``, ~50× cheaper than the unpackbits
    popcount (2 s → 40 ms per 1M rows)."""
    h = h.view(np.int64)
    reg = (h & (HLL_M - 1)).astype(np.int64)
    v = (h >> HLL_P) & ((1 << (64 - HLL_P)) - 1)
    tz = np.full(len(v), 64 - HLL_P + 1, dtype=np.int64)
    nz = v != 0
    vv = v[nz]
    tz[nz] = np.frexp((vv & -vv).astype(np.float64))[1]
    return reg, tz


def hll_partial(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(registers, max-ranks) for one block of string values."""
    from .dedup import _md5_u64_many

    reg, tz = _hll_rank(_md5_u64_many(values))
    # per-register max inside the block: one scatter-max reduction
    out = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(out, reg, tz)
    regs = np.flatnonzero(out)
    return regs, out[regs]


def hll_estimate(ranks_by_register: np.ndarray) -> float:
    """Raw HLL estimate with the standard small-range (linear counting)
    correction; ``ranks_by_register`` is the dense m-vector (0 = empty)."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -ranks_by_register.astype(np.float64)).sum()
    zeros = int((ranks_by_register == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_registers(ds, col: str):
    """Dataset → one row per non-empty HLL register (register, rank):
    map-side per-block register maxima, merged by one 256-group aggregate."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        reg, tz = _hll_rank(_hash_column_u64(batch.column(col)))
        out = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(out, reg, tz)
        regs = np.flatnonzero(out)
        return pa.table({"register": pa.array(regs),
                         "rank": pa.array(out[regs])})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("register").aggregate(Max("rank", alias_name="rank")))


def hash_sample(ds, col: str, id_col: str, k: int = 100):
    """Deterministic bounded sample: the k rows with the smallest
    (md5(col), id) — every block reduces to its local top-k, the merge
    sorts only blocks×k rows.  Output (id_col, h)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        h = _hash_column_u64(batch.column(col))
        order = np.lexsort((ids, h))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "h": pa.array(h[order])})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .sort(["h", id_col]).limit(k))


def hll_group_registers(ds, group_col: str, col: str):
    """Per-group HLL registers: one row per (group, non-empty register).

    The grouped twin of :func:`hll_registers` — every block reduces to at
    most ``groups_in_block × 256`` rows via one flat scatter-max over
    ``group_code * m + register``, so the shuffle moves sketch-sized data
    per group no matter how many raw rows hit each group.  Feed the merged
    rows per group to :func:`hll_estimate` for the distinct estimate."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.dictionary_encode(batch.column(group_col))
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        gcodes = g.indices.to_numpy().astype(np.int64)
        reg, tz = _hll_rank(_hash_column_u64(batch.column(col)))
        ng = len(g.dictionary)
        dense = np.zeros(ng * HLL_M, dtype=np.int64)
        np.maximum.at(dense, gcodes * HLL_M + reg, tz)
        hit = np.flatnonzero(dense)
        return pa.table({
            group_col: pc.take(g.dictionary, pa.array(hit // HLL_M)),
            "register": pa.array(hit % HLL_M),
            "rank": pa.array(dense[hit]),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "register"])
            .aggregate(Max("rank", alias_name="rank")))


CMS_D = 4                      # hash rows
CMS_W = 1024                   # counters per row


def cms_counters(ds, col: str):
    """Count-Min sketch over a column: one row per non-zero counter
    (row, bucket, n).

    Mergeable map-side partials like the HLL: every block reduces to at
    most d×w rows via one flat bincount, and the single shuffle moves
    sketch-sized data (≤ 4096 rows here) regardless of input size.  Row
    hashes are ``md5(seed || value)`` so the exact counter table
    replicates in closed-form SQL; the point-estimate (min over the d
    counters) is checked against exact counts in tests."""
    from ray.data.aggregate import Sum

    from .dedup import _md5_u64_many

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.types as pt

        c = batch.column(col)
        if pt.is_integer(c.type):
            c = pc.cast(c, pa.string())
        rows, buckets, ns = [], [], []
        for d in range(CMS_D):
            salted = pc.binary_join_element_wise(
                pa.scalar(f"cms{d}:"), c.combine_chunks()
                if isinstance(c, pa.ChunkedArray) else c, pa.scalar(""))
            h = _hash_column_u64(salted)
            b = (h % np.uint64(CMS_W)).astype(np.int64)
            cnt = np.bincount(b, minlength=CMS_W)
            nz = np.flatnonzero(cnt)
            rows.append(np.full(len(nz), d, dtype=np.int64))
            buckets.append(nz.astype(np.int64))
            ns.append(cnt[nz].astype(np.int64))
        return pa.table({"row": pa.array(np.concatenate(rows)),
                         "bucket": pa.array(np.concatenate(buckets)),
                         "n": pa.array(np.concatenate(ns))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["row", "bucket"]).aggregate(Sum("n", alias_name="n")))


def cms_estimate(counters, values) -> np.ndarray:
    """Point estimates for ``values`` from a merged counter table
    (pandas DataFrame with row/bucket/n): min over the d row counters."""
    from .dedup import _md5_u64_many

    dense = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    dense[counters["row"].to_numpy(), counters["bucket"].to_numpy()] = \
        counters["n"].to_numpy()
    vals = np.asarray(values, dtype=object)
    est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(CMS_D):
        salted = np.asarray([f"cms{d}:{v}" for v in vals], dtype=object)
        b = (_md5_u64_many(salted) % np.uint64(CMS_W)).astype(np.int64)
        est = np.minimum(est, dense[d, b])
    return est


def hash_sample_per_group(ds, group_col: str, col: str, id_col: str,
                          k: int = 20):
    """Deterministic stratified sample: the k (md5(col), id)-smallest rows
    PER GROUP.  Each block reduces to ≤ groups_in_block×k rows with one
    lexsort; the per-group merge then sees only blocks×k rows per group.
    Output (group_col, id_col, h) — ANSI-replicable as ROW_NUMBER() OVER
    (PARTITION BY group ORDER BY md5, id) <= k."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.dictionary_encode(batch.column(group_col))
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        gcodes = g.indices.to_numpy().astype(np.int64)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        h = _hash_column_u64(batch.column(col))
        order = np.lexsort((ids, h, gcodes))
        gs = gcodes[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        lens = np.diff(np.r_[starts, np.int64(len(gs))])
        pos = np.arange(len(gs), dtype=np.int64) - np.repeat(starts, lens)
        take = order[pos < k]
        return pa.table({
            group_col: pc.take(g.dictionary, pa.array(gcodes[take])),
            id_col: pa.array(ids[take]),
            "h": pa.array(h[take]),
        })

    def final(df):
        return df.sort_values(["h", id_col], kind="mergesort").head(k)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(final, batch_format="pandas"))


def kmv_minhashes(ds, col: str, k: int = 128):
    """K-minimum-values sketch: the k smallest DISTINCT md5 hashes of a
    column — per-block unique+top-k partials, a groupby(h) for the
    cluster-wide distinct, then a sort over ≤ blocks×k rows.  The sketch
    is exact-SQL-replicable (DISTINCT + ORDER BY h LIMIT k)."""

    # uint64 survives map stages but Ray's sort-based groupby round-trips
    # values through Python ints (> 2^63 falls back to pickled objects and
    # the downstream Sort aborts); carry the order-preserving signed view
    # h ^ 2^63 through the shuffle and flip back at the end
    FLIP = np.uint64(1 << 63)

    def partial(batch: pa.Table) -> pa.Table:
        h = np.unique(_hash_column_u64(batch.column(col)))[:k]
        return pa.table({"hs": pa.array((h ^ FLIP).view(np.int64))})

    def unflip(batch: pa.Table) -> pa.Table:
        hs = batch.column("hs").to_numpy().astype(np.int64)
        return pa.table({"h": pa.array(hs.view(np.uint64) ^ FLIP)})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("hs").count().select_columns(["hs"])
            .sort("hs").limit(k)
            .map_batches(unflip, batch_format="pyarrow"))


def kmv_overlap(ds_a, ds_b, col_a: str, col_b: str, k: int = 128):
    """Two datasets → tagged union of their KMV sketches (side, h).

    Set-operation estimates (distinct union / intersection / Jaccard)
    come from :func:`kmv_estimate` over these 2k driver-side rows — the
    sketch of A∪B is the k smallest of K(A) ∪ K(B), so no second pass
    over either input is needed."""

    def tag(side):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "side": pa.array([side] * len(batch), pa.string()),
                "h": batch.column("h")})
        return f

    return (kmv_minhashes(ds_a, col_a, k)
            .map_batches(tag("a"), batch_format="pyarrow")
            .union(kmv_minhashes(ds_b, col_b, k)
                   .map_batches(tag("b"), batch_format="pyarrow")))


def kmv_estimate(df, k: int = 128) -> dict:
    """(side, h) rows → {union, intersection, jaccard} estimates.

    D(S) ≈ (k-1)·2^64 / h_k (k-th smallest distinct hash); the Jaccard
    estimator is the fraction of the union-sketch's k values present in
    both sides' sketches."""
    ha = np.sort(df.loc[df["side"] == "a", "h"].to_numpy().astype(np.uint64))
    hb = np.sort(df.loc[df["side"] == "b", "h"].to_numpy().astype(np.uint64))
    hu = np.unique(np.concatenate([ha, hb]))[:k]
    if len(hu) == 0:
        return {"union": 0.0, "intersection": 0.0, "jaccard": 0.0}
    if len(hu) < k:        # saw every distinct value: estimates are exact
        union = float(len(hu))
    else:
        union = (k - 1) * (2.0 ** 64) / float(hu[-1])
    both = np.isin(hu, ha) & np.isin(hu, hb)
    jac = float(both.sum()) / float(len(hu))
    return {"union": union, "intersection": jac * union, "jaccard": jac}


def weighted_sample(ds, weight_col: str, hash_col: str, id_col: str,
                    k: int = 100):
    """Deterministic weighted sample without replacement (sequential
    Poisson sampling, Ohlsson 1998): priority q = u / w with
    u = md5(hash_col)/2^64 ∈ (0,1), keep the k smallest (q, id).

    Same scale shape as :func:`hash_sample` — every block reduces to its
    local top-k with one lexsort, the merge sorts only blocks×k rows — but
    inclusion probability is proportional to the weight.  Division of
    identical IEEE doubles is bit-deterministic, so the selected set is
    exactly SQL-replicable (oracle.q_weighted_sample)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        w = batch.column(weight_col).to_numpy().astype(np.float64)
        u = _hash_column_u64(batch.column(hash_col)).astype(np.float64) / 2.0**64
        q = u / w
        order = np.lexsort((ids, q))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         weight_col: pa.array(batch.column(weight_col)
                                              .to_numpy()[order]),
                         "priority": pa.array(np.round(q[order], 9)),
                         "_q": pa.array(q[order])})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .sort(["_q", id_col]).limit(k))
    return out.drop_columns(["_q"])
