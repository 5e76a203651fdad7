"""Token-stream sequence chunking (LLM training "packing" front-end).

Training-data pipelines concatenate each language's documents into one
token stream (order = ``doc_id``) and cut it into fixed-size context
chunks; a document belongs to the chunk its FIRST token lands in.  That
assignment needs a GLOBAL ordered prefix sum — the one window shape the
rest of the repo's combiner tricks can't reduce away — so this stage
demonstrates the scalable two-pass carry:

1. **Bucket partials**: docs bucket by contiguous ``doc_id`` range
   (``doc_id // width``; width grows with the corpus so the bucket table
   stays small).  One ``map_batches`` pass computes per-(lang, bucket)
   token sums; a bucket-table-sized ``groupby`` reduces them.
2. **Prefix carry**: the driver sorts the tiny bucket table and computes
   each (lang, bucket)'s exclusive prefix offset — O(langs × buckets)
   work on O(buckets) rows — then broadcasts it via ``ray.put``.
3. **Assign**: rows exchange ONCE on bucket (the range repartition; the
   shuffle carries only (doc_id, lang, n_tokens) ints, never text); each
   bucket group lexsorts locally, adds its carry, and emits per-chunk
   partials that a final (lang, chunk)-sized ``groupby`` folds.

Partitioning assumption (SURVEY §2 custom-operator rule): one bucket's
rows fit in a worker group (width is chosen as ~corpus/8·CPUs rows), and
the bucket table (langs × buckets rows) fits on the driver — at 100 TB
with 1e6-row buckets that is ~1e5 rows, trivially.

Token counts are the whitespace semantics of ``stages/text.token_count_batch``
(oracle ``_NTOK``), so the chunk table is value-replicable in SQL via a
running-SUM window (``oracle.q_seq_pack``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

CAP = 128  # tokens per training chunk


def _tok_batch(batch: pa.Table, width: int) -> pa.Table:
    """documents block → (doc_id, lang, bucket, ntok)."""
    import pyarrow.compute as pc

    from .text import _trim

    text = batch.column("text")
    trimmed = _trim(text)
    parts = pc.split_pattern_regex(trimmed, r"[ \t\n\r]+")
    n = pc.if_else(pc.equal(trimmed, ""), 0, pc.list_value_length(parts))
    d = batch.column("doc_id").to_numpy()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang": batch.column("lang"),
        "bucket": pa.array(d // width),
        "ntok": n.cast(pa.int64()),
    })


def _bucket_partial(batch: pa.Table) -> pa.Table:
    df = batch.select(["lang", "bucket", "ntok"]).to_pandas()
    g = (df.groupby(["lang", "bucket"], sort=False)["ntok"].sum()
         .reset_index())
    return pa.Table.from_pandas(g, preserve_index=False)


def _assign_group(df: pd.DataFrame, offsets, cap: int) -> pd.DataFrame:
    """One bucket's rows → per-(lang, chunk) partials.  ``offsets`` is the
    broadcast {bucket: {lang: exclusive-prefix-tokens}} dict."""
    df = df.sort_values(["lang", "doc_id"], kind="stable")
    cs = df.groupby("lang", sort=False)["ntok"].cumsum() - df["ntok"]
    bucket = int(df["bucket"].iloc[0])
    carry = (df["lang"].map(offsets.get(bucket, {}))
             .fillna(0).astype(np.int64))
    start = (cs + carry).to_numpy()
    out = pd.DataFrame({
        "lang": df["lang"].to_numpy(),
        "chunk_id": start // cap,
        "ntok": df["ntok"].to_numpy(),
        "doc_id": df["doc_id"].to_numpy(),
    })
    g = out.groupby(["lang", "chunk_id"], sort=False).agg(
        n_docs=("doc_id", "size"), n_tokens=("ntok", "sum"),
        first_doc=("doc_id", "min")).reset_index()
    g["n_docs"] = g["n_docs"].astype(np.int64)
    return g


def seq_pack(sf_dir: str, cap: int = CAP):
    """(lang, chunk_id, n_docs, n_tokens, first_doc): fixed-``cap`` token
    chunks of each language's doc_id-ordered token stream."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Min, Sum

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cpus = int(ray.cluster_resources().get("CPU", 32)) \
        if ray.is_initialized() else 32
    width = max(64, n_docs // (8 * cpus))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    toks = ds.map_batches(lambda b: _tok_batch(b, width),
                          batch_format="pyarrow")
    bucket_tbl = (toks.map_batches(_bucket_partial, batch_format="pyarrow")
                  .groupby(["lang", "bucket"])
                  .aggregate(Sum("ntok", alias_name="ntok"))
                  .to_pandas())
    bucket_tbl = bucket_tbl.sort_values(["lang", "bucket"])
    excl = (bucket_tbl.groupby("lang", sort=False)["ntok"].cumsum()
            - bucket_tbl["ntok"])
    off_map: dict[int, dict[str, int]] = {}
    for r, o in zip(bucket_tbl.itertuples(), excl):
        off_map.setdefault(int(r.bucket), {})[r.lang] = int(o)
    offsets = ray.put(off_map)

    parts = toks.groupby("bucket").map_groups(
        lambda df: _assign_group(df, ray.get(offsets), cap),
        batch_format="pandas")
    return (parts.groupby(["lang", "chunk_id"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Min("first_doc", alias_name="first_doc")))
