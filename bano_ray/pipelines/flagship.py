"""Flagship end-to-end pipeline + image-payload stages.

The headline job (bench + entry): synthesized image+caption rows → caption
parse → cell encode → zone PIP → per-zone merge → street aggregation
(importance + packed housenumbers) — with the image ``bytes`` column flowing
through decode-validating actor stages OUTSIDE the shuffle (bytes never
enter a groupby; they re-join by image_id, reference SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import datagen
from ..codecs import decode_image, psnr
from ..runtime import ensure_worker_importable


class ImageRoundtrip:
    """Actor-pool stage: decode each payload, verify the per-row invariant
    (bit-exact pixels for png; PSNR ≥ 40 dB for lossy) against the
    deterministic source pixels, and emit compact features.

    Real decode work happens here (own PNG inflate/unfilter); a production
    JPEG codec would drop into ``bano_ray.codecs`` with the same signature.
    """

    def __init__(self):
        pass  # heavy codec/model init would live here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        ok = np.zeros(len(ids), dtype=bool)
        psnr_db = np.zeros(len(ids), dtype=np.float64)
        mean_lum = np.zeros(len(ids), dtype=np.float64)
        for i, (iid, fmt, blob) in enumerate(zip(ids, fmts, blobs)):
            px = decode_image(blob, fmt)
            src = datagen.pixels_of(int(iid[3:]), px.shape[1], px.shape[0])
            if fmt == "png":
                ok[i] = bool((px == src).all())
                psnr_db[i] = float("inf") if ok[i] else psnr(src, px)
            else:
                psnr_db[i] = psnr(src, px)
                ok[i] = psnr_db[i] >= 40.0
            mean_lum[i] = float(px.mean())
        return pa.table({
            "image_id": batch.column("image_id"),
            "fmt": batch.column("fmt"),
            "caption": batch.column("caption"),
            "decode_ok": pa.array(ok),
            "psnr_db": pa.array(np.where(np.isinf(psnr_db), 999.0, psnr_db)),
            "mean_lum": pa.array(np.round(mean_lum, 4)),
        })


def image_roundtrip(sf_dir: str, concurrency: int = 4):
    """Decode-validate every payload (actor pool, small batches — binary
    rows are wide; batch_size keeps batch × concurrency in worker heap)."""
    ensure_worker_importable()
    ds = datagen.images_dataset(sf_dir, with_bytes=True)
    return ds.map_batches(ImageRoundtrip, concurrency=concurrency,
                          batch_size=256, batch_format="pyarrow")


def flagship(sf_dir: str, expand: int = 1, assign_concurrency: int = 4):
    """The full spatial-join + street-aggregation pipeline (street JSON
    output).  This is the throughput-measured job; ``expand`` scales the
    synthesized corpus (bench uses ~600k rows at sf0.1)."""
    from .exports import street_json

    ensure_worker_importable()
    return street_json(sf_dir, expand=expand,
                       assign_concurrency=assign_concurrency)


def flagship_with_bytes(sf_dir: str, num_partitions: int = 16):
    """Per-image joined output demonstrating the bytes-never-shuffle layout:

    - branch A (metadata): parse + zone assign — no ``bytes`` column
    - branch B (payload): decode/validate actor stage over the bytes
    - hash-join on ``image_id`` re-attaches the payload verdict to the
      spatial assignment (``Dataset.join``; at 10^12 rows both sides are
      hash-partitioned on the same key, so the join is the only exchange
      the payload bytes' metadata ever sees)
    """
    from .cumul import points_dataset

    ensure_worker_importable()
    meta = points_dataset(sf_dir).select_columns(
        ["image_id", "insee", "street_key", "cell", "hn"])
    payload = image_roundtrip(sf_dir).select_columns(
        ["image_id", "fmt", "decode_ok", "psnr_db", "mean_lum"])
    return meta.join(payload, join_type="inner", num_partitions=num_partitions,
                     on=("image_id",))
