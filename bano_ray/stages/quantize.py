"""Int8 scalar quantization of the embedding corpus (vector compression).

The storage-side twin of the ANN family (``stages/ann.py``): before
shipping a 100 TB embedding corpus to an index, pipelines quantize each
dimension to uint8 against GLOBAL per-dimension min/max — 4× smaller, and
the decode is a multiply-add.  Two streaming passes:

1. per-dimension min/max: each batch emits 64 (dim, mn, mx) partial rows,
   one dim-sized ``groupby`` reduces them (nothing wide moves);
2. encode: min/max broadcast via ``ray.put``; each batch quantizes its
   vectors and emits exact-integer summaries of the code vector
   (sum, sum of squares, and a positional weighted hash) — the compact,
   order-free signature the oracle can replicate without shipping 64
   codes per row through the compare.

Exactness: the code ``floor((v - mn)·255/(mx - mn) + 0.5)`` is a chain of
correctly-rounded double ops on identical operands, so numpy and DuckDB
agree bit-for-bit; rounding monotonicity bounds every code to [0, 255]
(the engine clamp is a provable no-op kept for robustness).  The hash
weights 257^j mod FP_MOD keep the row sum ≤ 64·255·1e9 < 2^53, exact in
both int64 and DuckDB BIGINT.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import emb_matrix
from .text import FP_MOD

DIM = 64
LEVELS = 255
HASH_W = [pow(257, j, FP_MOD) for j in range(DIM)]
_HASH_W64 = np.array(HASH_W, dtype=np.int64)


def _minmax_partial(batch: pa.Table) -> pa.Table:
    m = emb_matrix(batch.column("embedding"))
    if m.shape[0] == 0:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "mn": pa.array([], pa.float64()),
                         "mx": pa.array([], pa.float64())})
    return pa.table({
        "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
        "mn": pa.array(m.min(axis=0)),
        "mx": pa.array(m.max(axis=0)),
    })


def _encode_fn(mnmx_ref):
    def encode(batch: pa.Table) -> pa.Table:
        import ray

        mn, mx = ray.get(mnmx_ref)
        m = emb_matrix(batch.column("embedding"))
        span = mx - mn
        ok = span != 0.0
        scaled = np.where(ok, (m - mn) * float(LEVELS)
                          / np.where(ok, span, 1.0), 0.0)
        codes = np.clip(np.floor(scaled + 0.5), 0, LEVELS).astype(np.int64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "code_sum": pa.array(codes.sum(axis=1)),
            "code_sq": pa.array((codes * codes).sum(axis=1)),
            "code_hash": pa.array(codes @ _HASH_W64[:codes.shape[1]]),
        })
    return encode


def vec_quantize(sf_dir: str):
    """(vec_id, code_sum, code_sq, code_hash): global-min/max uint8
    quantization signatures of every embedding."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Min

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    mm = (ds.map_batches(_minmax_partial, batch_format="pyarrow")
          .groupby("dim")
          .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
          .to_pandas().sort_values("dim"))
    mnmx = ray.put((mm["mn"].to_numpy(), mm["mx"].to_numpy()))
    return ds.map_batches(_encode_fn(mnmx), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (fixed closed-form codebook)
# ---------------------------------------------------------------------------

PQ_SUBS = 8    # 64 dims → 8 subspaces × 8 dims
PQ_DIM = 8
PQ_CENTS = 16  # 4-bit codes


def pq_centroids() -> np.ndarray:
    """(PQ_SUBS, PQ_CENTS, PQ_DIM) float64 codebook — CLOSED-FORM (a
    Knuth-multiplier hash grid over [-1, 1)), so the oracle can embed it
    as SQL literals; a trained k-means codebook would slot into the same
    pipeline (the IVF family holds the trained-variant precedent)."""
    idx = np.arange(PQ_SUBS * PQ_CENTS * PQ_DIM, dtype=np.int64)
    vals = ((idx * 2654435761) % 1000) / 500.0 - 1.0
    return vals.reshape(PQ_SUBS, PQ_CENTS, PQ_DIM)


def _pq_pass(batch: pa.Table) -> pa.Table:
    """Stateless vectorized pass: per (vector, subspace) the argmin
    centroid code and the (rounded) residual distance².  The inner
    accumulation is an explicit left-assoc loop over the 8 dims, matching
    the SQL oracle's expression order term for term (float64 adds are
    order-sensitive; np.sum's pairwise order would NOT match)."""
    cents = pq_centroids()
    m = emb_matrix(batch.column("embedding"))
    vid = batch.column("vec_id").to_numpy()
    n = m.shape[0]
    o_v, o_s, o_c, o_e = [], [], [], []
    for s in range(PQ_SUBS):
        x = m[:, s * PQ_DIM:(s + 1) * PQ_DIM]
        d2 = np.zeros((n, PQ_CENTS), dtype=np.float64)
        for j in range(PQ_DIM):
            diff = x[:, j][:, None] - cents[s, :, j][None, :]
            d2 = d2 + diff * diff
        code = np.argmin(d2, axis=1)          # first-min = lowest code
        err = d2[np.arange(n), code]
        o_v.append(vid)
        o_s.append(np.full(n, s, dtype=np.int64))
        o_c.append(code.astype(np.int64))
        o_e.append(np.round(err, 9))
    return pa.table({
        "vec_id": pa.array(np.concatenate(o_v)),
        "sub": pa.array(np.concatenate(o_s)),
        "code": pa.array(np.concatenate(o_c)),
        "err": pa.array(np.concatenate(o_e)),
    })


def pq_codes(sf_dir: str):
    """(vec_id, sub, code, err): product-quantization code assignment —
    one stateless streaming pass, codebook baked per task (no shuffle at
    all; the 100 TB shape is embarrassingly parallel)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(_pq_pass, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Semantic dedup by coarse product-quantization bucket
# ---------------------------------------------------------------------------

SD_SUBS = 3   # coarse bucket = first 3 PQ subspaces (16^3 = 4096 buckets)


def sd_bucket_partial(batch: pa.Table) -> pa.Table:
    """(bucket, vec_id) rows: the coarse semantic bucket is the packed
    argmin-centroid code of the first SD_SUBS PQ subspaces — same
    codebook, same left-associated distance² accumulation and first-min
    tie rule as :func:`_pq_pass`, so the SQL oracle replays it exactly."""
    cents = pq_centroids()
    m = emb_matrix(batch.column("embedding"))
    vid = batch.column("vec_id").to_numpy()
    n = m.shape[0]
    bucket = np.zeros(n, dtype=np.int64)
    for s in range(SD_SUBS):
        x = m[:, s * PQ_DIM:(s + 1) * PQ_DIM]
        d2 = np.zeros((n, PQ_CENTS), dtype=np.float64)
        for j in range(PQ_DIM):
            diff = x[:, j][:, None] - cents[s, :, j][None, :]
            d2 = d2 + diff * diff
        bucket += np.argmin(d2, axis=1).astype(np.int64) << (4 * s)
    return pa.table({"bucket": pa.array(bucket),
                     "vec_id": pa.array(vid.astype(np.int64))})


def semantic_dedup(sf_dir: str):
    """(bucket, keeper, n_members): one representative (min vec_id) per
    coarse semantic bucket — SemDeDup-style clustering dedup where the
    cluster assignment is the deterministic PQ coarse code instead of a
    trained k-means (the IVF family holds the trained-variant precedent).
    ONE hash-partitioned groupby over (bucket, vec_id) pairs; at 100 TB
    the shuffle carries two int64s per vector."""
    import ray
    from ray.data.aggregate import Count, Min

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return (ds.map_batches(sd_bucket_partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Min("vec_id", alias_name="keeper"),
                       Count("vec_id", alias_name="n_members")))


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection distortion census
# ---------------------------------------------------------------------------

JL_DIM = 16     # 64 -> 16 sign projection


def jl_signs() -> np.ndarray:
    """(JL_DIM, DIM) ±1 closed-form sign matrix (Knuth-multiplier hash) —
    SQL-literal-embeddable like the PQ codebook."""
    idx = np.arange(JL_DIM * DIM, dtype=np.int64)
    return np.where((idx * 2654435761) % 2 == 0, 1.0, -1.0)         .reshape(JL_DIM, DIM)


def jl_project_batch(batch: pa.Table) -> pa.Table:
    """(vec_id, orig_sq, proj_msq): squared norm of each embedding and
    the mean squared norm of its ±1 JL projection (both as the EXPLICIT
    left-associated accumulation the SQL oracle writes term-for-term —
    np.sum's pairwise order would not match)."""
    s = jl_signs()
    m = emb_matrix(batch.column("embedding"))
    n = m.shape[0]
    orig = np.zeros(n, dtype=np.float64)
    for i in range(DIM):
        orig = orig + m[:, i] * m[:, i]
    proj_sq = np.zeros(n, dtype=np.float64)
    for j in range(JL_DIM):
        y = np.zeros(n, dtype=np.float64)
        for i in range(DIM):
            y = y + (m[:, i] if s[j, i] > 0 else -m[:, i])
        proj_sq = proj_sq + y * y
    return pa.table({
        "vec_id": batch.column("vec_id"),
        "orig_sq": pa.array(np.round(orig, 6)),
        "proj_msq": pa.array(np.round(proj_sq / JL_DIM, 6)),
    })


# ---------------------------------------------------------------------------
# Matryoshka (prefix-truncation) embedding quality census
# ---------------------------------------------------------------------------

MRL_PREFIXES = (8, 16, 32, 64)


def mrl_census_batch(batch: pa.Table) -> pa.Table:
    """(vec_id, d8, d16, d32, d64): squared norms of each embedding's
    prefix truncations — the Matryoshka-representation check (how much
    of the vector's energy lives in each prefix) run before serving
    truncated embeddings.  Explicit left-associated accumulation (the
    JL discipline) so the SQL oracle matches term-for-term."""
    m = emb_matrix(batch.column("embedding"))
    n = m.shape[0]
    acc = np.zeros(n, dtype=np.float64)
    out = {"vec_id": batch.column("vec_id")}
    nxt = 0
    for i in range(DIM):
        acc = acc + m[:, i] * m[:, i]
        if i + 1 == MRL_PREFIXES[nxt]:
            out[f"d{MRL_PREFIXES[nxt]}"] = pa.array(np.round(acc, 6))
            nxt += 1
            if nxt == len(MRL_PREFIXES):
                break
    return pa.table(out)
