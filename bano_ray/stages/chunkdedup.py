"""Corpus-level exact duplicated-chunk removal (ExactSubstr-style dedup).

Training-data pipelines remove boilerplate that repeats ACROSS documents
(licence headers, navigation chrome, templated paragraphs) — the
document-level exact/near dedup family keeps whole docs, this operator
cleans the insides: every run of ``CHUNK_WORDS`` consecutive words is a
chunk, and a chunk that occurs in ≥ 2 distinct documents keeps only its
first global occurrence (min ``(doc_id, position)``); every other
occurrence is cut and the document is re-assembled from its surviving
chunks.  (Deduplicating-Training-Data-style exact substring dedup,
restricted to aligned chunks so the semantics stay SQL-replicable —
oracle.q_chunk_dedup is the literal windowed-SQL twin.)

Shape (the honest 100 TB cost of content-level dedup is two corpus-sized
exchanges, and exactly two happen):

1. **Chunker** — stateless vectorized ``map_batches``: Arrow
   ``split_pattern`` tokenizes the whole batch, the chunk word-ranges are
   re-sliced ZERO-COPY over the flattened word values
   (``ListArray.from_arrays`` on computed offsets) and joined back to
   chunk strings by the C++ ``binary_join`` kernel — no Python loop, no
   per-row work.  Equality below groups on the chunk STRING itself, so no
   content hash is needed for correctness; one vectorized md5-u64 per
   chunk provides the shard key (content-stable across workers).
2. **Decide** — one coarse-shard groupby on ``shard(md5(chunk))``
   (``_coarse_groups`` discipline: ~256 shards/CPU, never per-key
   dispatch).  Inside a shard, pandas factorizes the chunk strings and a
   single lexsort yields, per distinct chunk, the distinct-doc count and
   the global first occurrence.  Dropped occurrences collapse to tiny
   per-doc counter rows (chunk = null) so the reassembly can report
   totals without a second pass over the input.
3. **Reassemble** — one coarse-shard groupby on ``shard(doc_id)``:
   surviving chunks sort by position and join back to the cleaned text;
   the counter rows contribute the dropped totals.  Docs whose every
   chunk was cut still surface (kept_chunks = 0, text_clean = '').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _coarse_groups, _md5_u64_many

CHUNK_WORDS = 16


def _chunk_rows(batch: pa.Table, n_words: int, shards: int) -> pa.Table:
    """doc batch → one row per chunk: (doc_id, c, chunk, _hshard)."""
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    doc = batch.column("doc_id").to_numpy().astype(np.int64)
    lists = pc.split_pattern(txt, " ")
    nwords = pc.list_value_length(lists).to_numpy().astype(np.int64)
    nchunks = (nwords + n_words - 1) // n_words
    # split('') == [''] so every doc has >= 1 word and >= 1 chunk
    total = int(nchunks.sum())
    doc_idx = np.repeat(np.arange(len(doc)), nchunks)
    cpos = np.arange(total) - np.repeat(np.cumsum(nchunks) - nchunks, nchunks)
    # chunk k of doc d covers words [W*k, min(W*(k+1), nwords_d)); each
    # chunk's end equals the NEXT chunk's start (next doc's first chunk
    # starts at this doc's word end), so one monotone offset vector
    # re-slices the flattened word values zero-copy.
    starts = np.repeat(np.cumsum(nwords) - nwords, nchunks) + n_words * cpos
    bounds = np.concatenate([starts, [int(nwords.sum())]])
    flat = lists.flatten()
    chunk_lists = pa.ListArray.from_arrays(
        pa.array(bounds, pa.int64() if len(flat) > 2**31 - 1 else pa.int32()),
        flat)
    chunks = pc.binary_join(chunk_lists, pa.scalar(" "))
    shard = (_md5_u64_many(chunks) % np.uint64(shards)).astype(np.int64)
    return pa.table({"doc_id": pa.array(doc[doc_idx]),
                     "c": pa.array(cpos),
                     "chunk": chunks,
                     "_shard": pa.array(shard)})


def _decide(df: pd.DataFrame) -> pd.DataFrame:
    """Per hash-shard: keep nd==1 occurrences and the global-first
    occurrence of cross-doc chunks; fold drops into counter rows."""
    codes, _ = pd.factorize(df["chunk"].to_numpy())
    d = df["doc_id"].to_numpy()
    c = df["c"].to_numpy()
    order = np.lexsort((c, d, codes))
    sc, sd = codes[order], d[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = sc[1:] != sc[:-1]
    # distinct docs per chunk: count (code, doc) boundary rows per code
    pair_first = first.copy()
    pair_first[1:] |= sd[1:] != sd[:-1]
    nd = np.add.reduceat(pair_first.astype(np.int64), np.flatnonzero(first))
    nd_per_row = np.repeat(nd, np.add.reduceat(
        np.ones(len(order), np.int64), np.flatnonzero(first)))
    kept_sorted = (nd_per_row == 1) | first
    kept = np.empty(len(order), dtype=bool)
    kept[order] = kept_sorted
    out = df.loc[kept, ["doc_id", "c", "chunk"]].copy()
    out["dropped"] = np.int64(0)
    drops = df.loc[~kept, "doc_id"].value_counts()
    if len(drops):
        out = pd.concat([out, pd.DataFrame({
            "doc_id": drops.index.to_numpy(np.int64),
            "c": np.int64(-1), "chunk": None,
            "dropped": drops.to_numpy(np.int64)})], ignore_index=True)
    return out


def _reassemble(df: pd.DataFrame) -> pd.DataFrame:
    """Per doc-shard: order surviving chunks, rebuild text, total counts."""
    ch = df[df["c"] >= 0].sort_values(["doc_id", "c"], kind="stable")
    g = ch.groupby("doc_id", sort=True)
    kept = g.size()
    txt = g["chunk"].agg(" ".join)
    drops = df[df["c"] < 0].groupby("doc_id", sort=True)["dropped"].sum()
    idx = kept.index.union(drops.index)
    kept = kept.reindex(idx, fill_value=0).astype(np.int64)
    drops = drops.reindex(idx, fill_value=0).astype(np.int64)
    return pd.DataFrame({
        "doc_id": idx.to_numpy(np.int64),
        "n_chunks": (kept + drops).to_numpy(np.int64),
        "kept_chunks": kept.to_numpy(np.int64),
        "text_clean": txt.reindex(idx, fill_value="").to_numpy(object)})


def chunk_dedup(docs_ds, n_words: int = CHUNK_WORDS):
    """documents Dataset (doc_id, text) → (doc_id, n_chunks, kept_chunks,
    text_clean) with cross-doc duplicated chunks removed (first global
    occurrence survives)."""
    C = _coarse_groups()

    def chunker(batch: pa.Table) -> pa.Table:
        return _chunk_rows(batch, n_words, C)

    decided = (docs_ds.map_batches(chunker, batch_format="pyarrow")
               .groupby("_shard").map_groups(_decide, batch_format="pandas"))

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_shard"] = (df["doc_id"].to_numpy(np.uint64)
                        % np.uint64(C)).astype(np.int64)
        return df

    return (decided.map_batches(add_shard, batch_format="pandas")
            .groupby("_shard").map_groups(
                lambda df: _reassemble(df), batch_format="pandas"))
