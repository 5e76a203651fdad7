"""Approximate / exact nearest-neighbor search over the embedding column.

- :func:`brute_topk` — baseline: broadcast query matrix (``ray.put`` once),
  per-batch numpy matmul producing per-batch top-k candidates, then a tiny
  ``groupby(query_id)`` reduction for the global top-k.  The full corpus is
  never materialized; the shuffle carries only (n_queries × k) rows per
  batch.
- :func:`lsh_topk` — scale path: sign-pattern LSH bucket co-grouping of
  queries and corpus (multi-probe by flipping bits), exact cosine within
  bucket.  Same output contract; documented recall/partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize_rows(v: np.ndarray) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def emb_matrix(col) -> np.ndarray:
    """Zero-copy (rows, dim) float64 view of an Arrow list<float> column —
    replaces the former ``np.stack(col.to_pylist())`` which built a Python
    list per row of the widest numeric column in the system."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    dim = len(flat) // n
    if dim * n != len(flat):
        raise ValueError("ragged embedding column")
    return flat.reshape(n, dim).astype(np.float64)


_PLANES_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def lsh_planes(dim: int, nbits: int, seed: int = 4242) -> np.ndarray:
    """Deterministic LSH hyperplanes, derived once per (dim, nbits, seed)
    per process instead of per batch (same fixed seed, so bucket
    assignments are unchanged)."""
    key = (dim, nbits, seed)
    if key not in _PLANES_CACHE:
        rng = np.random.default_rng(seed)
        _PLANES_CACHE[key] = rng.standard_normal((dim, nbits))
    return _PLANES_CACHE[key]


class BatchTopK:
    """Actor-pool stage: query matrix loaded once per actor."""

    def __init__(self, queries_ref, k: int):
        import ray

        qids, qmat = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids = qids
        self.q = _normalize_rows(np.asarray(qmat, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy()
        mat = emb_matrix(batch.column("embedding"))
        sims = self.q @ _normalize_rows(mat).T          # (nq, nb)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q, rows_v, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            rows_q.extend([self.qids[qi]] * k)
            rows_v.extend(vid[idx[qi]].tolist())
            rows_s.extend(sims[qi, idx[qi]].tolist())
        return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                         "vec_id": pa.array(rows_v, pa.int64()),
                         "sim": pa.array(rows_s, pa.float64())})


def _final_topk(k: int):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["sim_r"] = d["sim"].round(6)
        d = d.sort_values(["sim_r", "vec_id"], ascending=[False, True], kind="stable").head(k)
        d["rank"] = np.arange(1, len(d) + 1)
        return d[["query_id", "vec_id", "sim_r", "rank"]].rename(columns={"sim_r": "sim"})

    return f


def brute_topk(ds, query_ids: list[int], k: int = 10, concurrency: int | None = None):
    """Exact cosine top-k of each query over the corpus (queries excluded)."""
    import ray

    if concurrency is None:
        try:
            concurrency = max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) // 2))
        except Exception:
            concurrency = 4

    qdf = ds.filter(expr=f"vec_id < {max(query_ids) + 1}").to_pandas()
    qdf = qdf[qdf["vec_id"].isin(query_ids)].sort_values("vec_id")
    qref = ray.put((qdf["vec_id"].tolist(),
                    np.stack(qdf["embedding"].to_numpy()).astype(np.float64)))
    corpus = ds.filter(expr=f"vec_id >= {max(query_ids) + 1}")
    cand = corpus.map_batches(BatchTopK, fn_constructor_args=(qref, k),
                              concurrency=concurrency, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


def lsh_topk(ds, query_ids: list[int], k: int = 10, nbits: int = 8, nprobe: int = 4):
    """LSH-bucketed ANN: co-group corpus and multi-probed queries by bucket,
    exact cosine within bucket, global reduce.  Recall < 1; intended for the
    10^12-row regime where brute force is off the table."""
    qarr = np.asarray(sorted(query_ids), dtype=np.int64)

    def project(batch: pa.Table, probe: bool) -> pa.Table:
        import pyarrow.compute as pc

        vid = batch.column("vec_id").to_numpy()
        mat = emb_matrix(batch.column("embedding"))
        proj = mat @ lsh_planes(mat.shape[1], nbits)
        base = ((proj > 0).astype(np.uint64)
                << np.arange(nbits, dtype=np.uint64)).sum(axis=1).astype(np.int64)
        is_q = np.isin(vid, qarr)
        # corpus rows: base bucket only; query rows: base + nprobe flipped
        # buckets (lowest-|projection| bits) — all as array ops, no row loop
        cidx = np.flatnonzero(~is_q)
        qidx = np.flatnonzero(is_q)
        if probe and len(qidx):
            eff = min(nprobe, nbits)
            bits = np.argsort(np.abs(proj[qidx]), axis=1, kind="stable")[:, :eff]
            flips = base[qidx][:, None] ^ (np.int64(1) << bits.astype(np.int64))
            qbuckets = np.concatenate([base[qidx][:, None], flips], axis=1)
            take_q = np.repeat(qidx, eff + 1)
            buck_q = qbuckets.ravel()
        else:
            take_q = qidx
            buck_q = base[qidx]
        take = np.concatenate([cidx, take_q])
        buckets = np.concatenate([base[cidx], buck_q])
        flags = np.concatenate([np.zeros(len(cidx), dtype=bool),
                                np.ones(len(take_q), dtype=bool)])
        emb = pc.take(batch.column("embedding"), pa.array(take, pa.int64()))
        return pa.table({"vec_id": pa.array(vid[take], pa.int64()),
                         "bucket": pa.array(buckets, pa.int64()),
                         "is_query": pa.array(flags),
                         "embedding": emb})

    def bucket_knn(df: pd.DataFrame) -> pd.DataFrame:
        qs = df[df["is_query"]]
        # candidates pre-sorted by vec_id so the stable argsort below breaks
        # exact-cosine ties deterministically (sim desc, vec_id asc) — the
        # oracle's per-bucket cut orders the same way (oracle.q_ann_lsh)
        cs = df[~df["is_query"]].sort_values("vec_id")
        if len(qs) == 0 or len(cs) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        qm = _normalize_rows(np.stack(qs["embedding"].to_numpy()).astype(np.float64))
        cm = _normalize_rows(np.stack(cs["embedding"].to_numpy()).astype(np.float64))
        sims = qm @ cm.T
        cv = cs["vec_id"].to_numpy()
        kk = min(k, sims.shape[1])
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        qv = qs["vec_id"].to_numpy()
        return pd.DataFrame({
            "query_id": np.repeat(qv, kk).astype(np.int64),
            "vec_id": cv[idx.ravel()].astype(np.int64),
            "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
        })

    tagged = ds.map_batches(lambda b: project(b, probe=True), batch_format="pyarrow")
    pairs = tagged.groupby("bucket").map_groups(bucket_knn, batch_format="pandas")
    # candidate set is tiny (queries × k × probed buckets): finish on the
    # driver — avoids two more all-to-all stages (which can also starve the
    # executor at very low CPU counts)
    cand = pairs.to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"query_id": [], "vec_id": [], "sim": [], "rank": []})
    cand = cand.astype({"query_id": "int64", "vec_id": "int64"})
    dedup = cand.groupby(["query_id", "vec_id"], as_index=False)["sim"].max()
    out = dedup.groupby("query_id", group_keys=False)[dedup.columns].apply(_final_topk(k))
    return out.reset_index(drop=True)


def _kmeans(sample: np.ndarray, ncentroids: int, iters: int = 8,
            seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (the IVF
    training step; the sample is dim-sized, the corpus never leaves the
    cluster)."""
    s = _normalize_rows(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = s[rng.choice(len(s), size=min(ncentroids, len(s)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = s[m].mean(axis=0)
        cent = _normalize_rows(cent)
    return cent


def ivf_topk(ds, query_ids: list[int], k: int = 10, ncentroids: int = 16,
             nprobe: int = 4, sample_mod: int = 7):
    """IVF ANN: train centroids on a hash-sampled subset, assign the corpus
    to inverted lists via broadcast centroids, co-group probed queries with
    their lists, exact cosine within list, global reduce — same output
    contract as :func:`brute_topk`, recall < 1 by design.

    Scale shape: ONE pass assigns (broadcast centroid matrix, per-batch
    matmul), the only shuffle is the list-id groupby; queries fan out to
    ``nprobe`` lists each.
    """
    import ray
    from ray.data.aggregate import Max

    qmax = max(query_ids) + 1

    # 1. deterministic hash-sample for training.  The driver-side sample is
    # COUNT-bounded, not rate-bounded: the modulus grows with the corpus so
    # at most ~256 vectors per centroid ever leave the cluster (at 10^12
    # rows a fixed mod would be a driver OOM).  Small corpora keep the
    # caller's sample_mod, so fixture outputs are unchanged.
    n_corpus = ds.count()
    target = max(ncentroids * 256, 1)
    mod = max(sample_mod, -(-n_corpus // target))  # ceil-div

    def _sample_filter(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy()
        return batch.filter(pa.array((vid % mod == 0) & (vid >= qmax)))

    sample = ds.map_batches(_sample_filter, batch_format="pyarrow").to_pandas()
    cent = _kmeans(np.stack(sample["embedding"].to_numpy()), ncentroids)
    cent_ref = ray.put(cent)
    qarr = np.asarray(sorted(query_ids), dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = ray.get(cent_ref)
        vec = _normalize_rows(emb_matrix(batch.column("embedding")))
        sims = vec @ c.T
        vid = batch.column("vec_id").to_numpy()
        is_q = np.isin(vid, qarr)
        parts = []
        corp = ~is_q
        if corp.any():
            parts.append(pa.table({
                "vec_id": pa.array(vid[corp]),
                "bucket": pa.array(np.argmax(sims[corp], axis=1).astype(np.int64)),
                "is_query": pa.array(np.zeros(int(corp.sum()), dtype=bool)),
                "embedding": pc.take(batch.column("embedding"),
                                    pa.array(np.flatnonzero(corp))),
            }))
        if is_q.any():
            qi = np.flatnonzero(is_q)
            # clamp the probe fan-out: sims has only ncentroids columns, so
            # nprobe > ncentroids must degrade gracefully (mirrors the LSH
            # path's eff = min(nprobe, nbits))
            eff = min(nprobe, sims.shape[1])
            probes = np.argsort(-sims[qi], axis=1, kind="stable")[:, :eff]
            take = np.repeat(qi, eff)
            parts.append(pa.table({
                "vec_id": pa.array(np.repeat(vid[qi], eff)),
                "bucket": pa.array(probes.ravel().astype(np.int64)),
                "is_query": pa.array(np.ones(len(take), dtype=bool)),
                "embedding": pc.take(batch.column("embedding"), pa.array(take)),
            }))
        return pa.concat_tables(parts) if parts else pa.table(
            {"vec_id": pa.array([], pa.int64()), "bucket": pa.array([], pa.int64()),
             "is_query": pa.array([], pa.bool_()),
             "embedding": batch.column("embedding").slice(0, 0)})

    def bucket_knn(df: pd.DataFrame) -> pd.DataFrame:
        qs = df[df["is_query"]]
        # pre-sort + stable argsort: deterministic tie-break (sim desc,
        # vec_id asc) at the per-list k boundary, same as the LSH path
        cs = df[~df["is_query"]].sort_values("vec_id")
        if len(qs) == 0 or len(cs) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        qm = _normalize_rows(np.stack(qs["embedding"].to_numpy()).astype(np.float64))
        cm = _normalize_rows(np.stack(cs["embedding"].to_numpy()).astype(np.float64))
        sims = qm @ cm.T
        cv = cs["vec_id"].to_numpy()
        kk = min(k, sims.shape[1])
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        qv = qs["vec_id"].to_numpy()
        return pd.DataFrame({
            "query_id": np.repeat(qv, kk).astype(np.int64),
            "vec_id": cv[idx.ravel()].astype(np.int64),
            "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
        })

    pairs = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby("bucket").map_groups(bucket_knn, batch_format="pandas")
             .groupby(["query_id", "vec_id"]).aggregate(Max("sim", alias_name="sim")))
    cand = pairs.to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"query_id": [], "vec_id": [], "sim": [], "rank": []})
    cand = cand.astype({"query_id": "int64", "vec_id": "int64"})
    out = cand.groupby("query_id", group_keys=False)[cand.columns].apply(_final_topk(k))
    return out.reset_index(drop=True)


def embed_drift(ds, shards: int | None = None):
    """Embedding-stream lag-similarity census: cosine between each vector
    and its PREDECESSOR in the per-label (vec_id-ordered) stream, with a
    drift flag on negative similarity — the monitoring pass an embedding
    ingest runs to catch upstream model/featurizer changes mid-stream.

    Shape: labels co-located by a coarse shard key, ONE flat lexsort per
    shard, row-shifted normalized dot products — no per-label dispatch,
    no per-row Python.  Output is map-scale (one row per consecutive
    pair), so it streams; the cosine is float64 with the same op order
    as the SQL oracle, rounded to 6 places (the q_ann family precedent).
    """
    from .dedup import _coarse_groups

    C = np.int64(shards or _coarse_groups())

    def shard(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy().astype(np.int64)
        return batch.append_column(
            "_shard", pa.array((lab % C).astype(np.int64)))

    def drift_group(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["label", "vec_prev", "vec_id", "cos", "drift"]
        if not len(df):
            return pd.DataFrame({c: [] for c in cols})
        lab = df["label"].to_numpy().astype(np.int64)
        vid = df["vec_id"].to_numpy().astype(np.int64)
        order = np.lexsort((vid, lab))
        lab, vid = lab[order], vid[order]
        mat = np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        cos = (mat[1:] * mat[:-1]).sum(axis=1) / (nrm[1:] * nrm[:-1])
        same = lab[1:] == lab[:-1]
        cos = np.round(cos[same], 6)
        return pd.DataFrame({
            "label": lab[1:][same], "vec_prev": vid[:-1][same],
            "vec_id": vid[1:][same], "cos": cos,
            "drift": cos < 0.0})

    return (ds.map_batches(shard, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(drift_group, batch_format="pandas"))
