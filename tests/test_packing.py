"""Sequence packing (stages/packing.py): the two-pass prefix carry must be
invariant to bucket width — chunks from many small buckets equal chunks
from one bucket holding everything."""
import numpy as np
import pandas as pd
import pyarrow as pa

from bano_ray.stages.packing import CAP, _assign_group, _bucket_partial, _tok_batch


def _mini_corpus():
    rng = range(0, 300, 3)
    ids = np.array(list(rng), dtype=np.int64)
    texts = [" ".join(["w"] * ((7 * i) % 23 + 1)) for i in ids]
    langs = [["fr", "en", "de"][i % 3] for i in ids]
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts),
                     "lang": pa.array(langs)})


def _pack_with_width(tbl: pa.Table, width: int, cap: int) -> pd.DataFrame:
    toks = _tok_batch(tbl, width).to_pandas()
    part = _bucket_partial(pa.Table.from_pandas(toks))
    bt = (part.to_pandas().groupby(["lang", "bucket"], as_index=False)
          ["ntok"].sum().sort_values(["lang", "bucket"]))
    excl = bt.groupby("lang", sort=False)["ntok"].cumsum() - bt["ntok"]
    off: dict[int, dict[str, int]] = {}
    for r, o in zip(bt.itertuples(), excl):
        off.setdefault(int(r.bucket), {})[r.lang] = int(o)
    outs = [_assign_group(g, off, cap)
            for _, g in toks.groupby("bucket", sort=False)]
    allp = pd.concat(outs, ignore_index=True)
    return (allp.groupby(["lang", "chunk_id"], as_index=False)
            .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
                 first_doc=("first_doc", "min"))
            .sort_values(["lang", "chunk_id"]).reset_index(drop=True))


def test_bucket_width_invariance():
    tbl = _mini_corpus()
    whole = _pack_with_width(tbl, 10_000, CAP)   # one bucket: plain cumsum
    for width in (7, 32, 100):
        got = _pack_with_width(tbl, width, CAP)
        pd.testing.assert_frame_equal(got, whole)


def test_chunk_capacity_respected():
    # a doc STARTS in its chunk; totals per chunk may overhang by less
    # than one doc, so every chunk's start offset is chunk_id*CAP exactly
    tbl = _mini_corpus()
    out = _pack_with_width(tbl, 32, CAP)
    for lang, g in out.groupby("lang"):
        g = g.sort_values("chunk_id")
        ids = g["chunk_id"].to_numpy()
        assert ids[0] == 0
        # chunk ids advance by ≥1; gaps only possible if one doc spans
        # multiple whole chunks (doc tokens ≤ 23 < CAP here → no gaps)
        assert (np.diff(ids) == 1).all()
        cum = np.concatenate([[0], np.cumsum(g["n_tokens"].to_numpy())])
        # each chunk's first doc starts inside [chunk_id*CAP, ...)
        assert (cum[:-1] // CAP == ids).all()


def test_late_events_bucket_invariance(ray_session, sf_dir):
    # carry correctness: result must not depend on the bucket width
    import bano_ray.stages.packing as pk

    base = (pk.late_events(sf_dir).to_pandas()
            .sort_values("event_type").reset_index(drop=True))
    orig = pk.LATE_BUCKET_US
    try:
        pk.LATE_BUCKET_US = 600_000_000  # 10-min buckets
        fine = (pk.late_events(sf_dir).to_pandas()
                .sort_values("event_type").reset_index(drop=True))
    finally:
        pk.LATE_BUCKET_US = orig
    pd.testing.assert_frame_equal(base, fine)
    assert base["n_late"].sum() > 0  # the jitter actually produces lateness
