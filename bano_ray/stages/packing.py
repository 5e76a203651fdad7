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


# --- streaming watermark lateness (the running-MAX twin of seq_pack) -------

LATE_DELAY_MOD = 600_000_000   # synthetic network delay: 0..10 min (µs)
LATE_ALLOWED_US = 300_000_000  # watermark allowed lateness: 5 min
LATE_BUCKET_US = 3_600_000_000  # carry buckets: 1 processing-hour


def _proc_ts(event_id: np.ndarray, ets: np.ndarray) -> np.ndarray:
    """Deterministic processing time: event time + hash-jitter delay."""
    delay = ((event_id * np.int64(2654435761))
             % np.int64(2147483647)) % np.int64(LATE_DELAY_MOD)
    return ets + delay


def late_events(sf_dir: str):
    """(event_type, n, n_late): watermark-lateness census.  An event is
    LATE iff its event time sits more than LATE_ALLOWED_US behind the
    watermark — the maximum event time among all events that PROCESSED
    strictly before it (order = (proc_ts, event_id)).

    The watermark is a global running MAX over processing order — the
    same two-pass carry as :func:`seq_pack` with max in place of sum:
    per-processing-hour bucket maxima reduce small, the driver takes the
    exclusive running max over the tiny bucket table, and ONE range
    exchange on the bucket key lets each group resolve its rows with a
    local ``np.maximum.accumulate`` + the bucket carry.  The shuffle
    carries three int64 columns; event payloads never move.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        ets = batch.column("ts").cast(pa.int64()).to_numpy()
        eid = batch.column("event_id").to_numpy()
        pts = _proc_ts(eid, ets)
        return pa.table({
            "event_id": batch.column("event_id"),
            "event_type": batch.column("event_type"),
            "ets": pa.array(ets),
            "pts": pa.array(pts),
            "bucket": pa.array(pts // LATE_BUCKET_US),
        })

    pre = ds.map_batches(prep, batch_format="pyarrow")
    bmax = (pre.map_batches(
                lambda b: pa.table({
                    "bucket": b.column("bucket"),
                    "mx": b.column("ets")}),
                batch_format="pyarrow")
            .groupby("bucket").aggregate(Max("mx", alias_name="mx"))
            .to_pandas().sort_values("bucket"))
    run = bmax["mx"].cummax().shift(1)
    carry = {int(b): (None if pd.isna(m) else int(m))
             for b, m in zip(bmax["bucket"], run)}
    carry_ref = ray.put(carry)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(carry_ref)
        df = df.sort_values(["pts", "event_id"], kind="stable")
        ets = df["ets"].to_numpy()
        wm = np.empty(len(ets), dtype=np.float64)
        wm[0] = -np.inf
        np.maximum.accumulate(ets[:-1].astype(np.float64), out=wm[1:])
        prior = c.get(int(df["bucket"].iloc[0]))
        if prior is not None:
            wm = np.maximum(wm, float(prior))
        late = ets < wm - LATE_ALLOWED_US
        out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                            "one": np.ones(len(ets), dtype=np.int64),
                            "late": late.astype(np.int64)})
        g = out.groupby("event_type", sort=False).sum().reset_index()
        return g.rename(columns={"one": "n", "late": "n_late"})

    from ray.data.aggregate import Sum as _Sum

    return (pre.groupby("bucket").map_groups(resolve, batch_format="pandas")
            .groupby("event_type")
            .aggregate(_Sum("n", alias_name="n"),
                       _Sum("n_late", alias_name="n_late")))
