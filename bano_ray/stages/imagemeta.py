"""Image metadata extraction from RAW BYTES — header parse, no decode.

A 100 TB multimodal ingest validates and catalogs image payloads long
before it can afford to decode them: dimensions, format and basic header
sanity come from the first bytes of each blob.  This stage parses real
container headers (PNG IHDR chunk, JPEG SOF0/1/2 marker scan) straight
off the Arrow binary column's buffers:

- the offsets/data buffers are viewed ZERO-COPY as numpy arrays; the PNG
  path (the corpus majority) is fully vectorized — one fancy-index gather
  of the 8 IHDR dimension bytes per blob, one vectorized signature check;
- JPEG headers need a sequential marker walk (segment lengths chain), so
  only the JPEG minority pays a short per-blob scan over ~6 markers —
  the same inherently-sequential shape as the decode actor stages
  (pipelines/flagship.py).

Unlike the decode stages (rows-only: codecs aren't SQL), the parsed
dimensions ARE value-oracle-gated — oracle.q_image_dims replays the
generative dims in closed form, so the driver verifies byte-level parsing
of real encoded files against independent SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PNG_SIG = np.frombuffer(b"\x89PNG\r\n\x1a\n", dtype=np.uint8)


def _jpeg_dims(buf: memoryview) -> tuple[int, int]:
    """JFIF marker walk → (width, height) from the first SOF0/1/2."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG (no SOI)")
    off = 2
    while off + 9 <= len(buf):
        if buf[off] != 0xFF:
            raise ValueError(f"bad marker alignment at {off}")
        marker = buf[off + 1]
        if marker in (0xC0, 0xC1, 0xC2):          # SOF0/SOF1/SOF2
            h = (buf[off + 5] << 8) | buf[off + 6]
            w = (buf[off + 7] << 8) | buf[off + 8]
            return w, h
        if marker == 0xDA:                         # SOS: past the headers
            break
        seglen = (buf[off + 2] << 8) | buf[off + 3]
        off += 2 + seglen
    raise ValueError("no SOF marker before scan data")


def _be32(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Vectorized big-endian uint32 read at each ``pos``."""
    p = pos.astype(np.int64)
    return ((data[p].astype(np.int64) << 24)
            | (data[p + 1].astype(np.int64) << 16)
            | (data[p + 2].astype(np.int64) << 8)
            | data[p + 3].astype(np.int64))


def image_dims_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, bytes) → (doc_id, fmt_parsed, width, height)."""
    col = batch.column("bytes")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    otype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    obuf = np.frombuffer(col.buffers()[1], dtype=otype)
    offs = obuf[col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    if np.any(ends - starts < 24):
        raise ValueError("blob too short for any image header")

    is_png = np.ones(len(starts), dtype=bool)
    for i, sb in enumerate(_PNG_SIG):             # 8 vectorized compares
        is_png &= data[starts + i] == sb

    w = np.empty(len(starts), np.int64)
    h = np.empty(len(starts), np.int64)
    # PNG: IHDR is the first chunk — tag at +12, width at +16, height at +20
    ppos = np.flatnonzero(is_png)
    if len(ppos):
        tag = _be32(data, starts[ppos] + 12)
        if np.any(tag != 0x49484452):             # 'IHDR'
            raise ValueError("PNG without leading IHDR chunk")
        w[ppos] = _be32(data, starts[ppos] + 16)
        h[ppos] = _be32(data, starts[ppos] + 20)
    mv = memoryview(data)
    for i in np.flatnonzero(~is_png):             # JPEG minority: marker walk
        w[i], h[i] = _jpeg_dims(mv[starts[i]:ends[i]])

    fmt = np.where(is_png, "png", "jpeg").astype(object)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fmt_parsed": pa.array(fmt, pa.string()),
                     "width": pa.array(w),
                     "height": pa.array(h)})


# ---------------------------------------------------------------------------
# Aspect-ratio bucketing (vision-training batch grouping)
# ---------------------------------------------------------------------------

# (bucket_id, bw, bh) — the canonical aspect targets a vision trainer
# groups variable-sized images into before batching (landscape → portrait;
# ratios sized to straddle the corpus's dim distribution so every bucket
# is populated — the generative (w, h) pairs cluster near 1.05–1.17 and
# 0.60–0.65, so the targets split those clusters).
ASPECT_BUCKETS = ((0, 7, 6), (1, 9, 8), (2, 16, 15), (3, 21, 20), (4, 2, 3))
_AB_ID = np.asarray([b[0] for b in ASPECT_BUCKETS], dtype=np.int64)
_AB_W = np.asarray([b[1] for b in ASPECT_BUCKETS], dtype=np.int64)
_AB_H = np.asarray([b[2] for b in ASPECT_BUCKETS], dtype=np.int64)


def aspect_partial(batch: pa.Table) -> pa.Table:
    """(doc_id, fmt_parsed, width, height) → per-batch partial
    (bucket_id, n_images, sum_pixels).  Bucket = argmin over the exact
    integer cross-multiplication distance |w·bh − bw·h| (no float ratio),
    ties to the lowest bucket_id (np.argmin picks the first minimum —
    the same rule the oracle's ORDER BY metric, bucket_id encodes).  The
    shuffle then carries ≤ len(ASPECT_BUCKETS) rows per block."""
    w = batch.column("width").to_numpy().astype(np.int64)
    h = batch.column("height").to_numpy().astype(np.int64)
    m = np.abs(w[:, None] * _AB_H[None, :] - _AB_W[None, :] * h[:, None])
    bid = _AB_ID[np.argmin(m, axis=1)]
    n = np.bincount(bid, minlength=len(_AB_ID))
    px = np.bincount(bid, weights=(w * h).astype(np.float64),
                     minlength=len(_AB_ID)).astype(np.int64)
    keep = n > 0
    return pa.table({"bucket_id": pa.array(_AB_ID[keep]),
                     "n_images": pa.array(n[keep].astype(np.int64)),
                     "sum_pixels": pa.array(px[keep])})


def aspect_buckets(ds):
    """(bucket_id, bw, bh, n_images, sum_pixels) over a parsed-dims
    dataset: batch-local bincount partials + one bucket-table-sized
    groupby sum, then the (bw, bh) columns restored from the constant
    table — zero rows shuffled beyond #buckets per block."""
    from ray.data.aggregate import Sum

    agg = (ds.map_batches(aspect_partial, batch_format="pyarrow")
             .groupby("bucket_id")
             .aggregate(Sum("n_images", alias_name="n_images"),
                        Sum("sum_pixels", alias_name="sum_pixels")))

    def attach(batch: pa.Table) -> pa.Table:
        bid = batch.column("bucket_id").to_numpy()
        return pa.table({"bucket_id": pa.array(bid),
                         "bw": pa.array(_AB_W[bid]),
                         "bh": pa.array(_AB_H[bid]),
                         "n_images": batch.column("n_images"),
                         "sum_pixels": batch.column("sum_pixels")})

    return agg.map_batches(attach, batch_format="pyarrow")
