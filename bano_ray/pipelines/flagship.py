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


def _cluster_cpus(default: int = 32) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def _binary_column_views(col) -> list:
    """Zero-copy per-row views of an Arrow binary column.

    Slices the column's offsets+data buffers into per-row memoryviews —
    no per-row ``bytes`` copies of the widest column in the system (the
    codecs consume any buffer: slicing, indexing, struct/zlib/np.frombuffer
    all take memoryviews).  Handles binary and large_binary, chunked or not,
    sliced arrays, and nulls (null → empty view).
    """
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = []
    for arr in chunks:
        if arr.null_count:
            # nulls don't occur on the payload path; fall back to safety
            out.extend(b"" if v is None else v for v in arr.to_pylist())
            continue
        off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=off_dtype,
                             count=arr.offset + len(arr) + 1)[arr.offset:]
        # cast to unsigned-byte format: pa.Buffer views expose 'b' (signed),
        # which breaks content comparison against bytes literals in codecs
        data = memoryview(bufs[2]).cast("B")
        out.extend(data[offs[i]:offs[i + 1]] for i in range(len(arr)))
    return out


class ImageRoundtrip:
    """Actor-pool stage: decode each payload, verify the per-row invariant
    (bit-exact pixels for png; PSNR ≥ 40 dB for lossy) against the
    deterministic source pixels, and emit compact features.

    Real decode work happens here (own PNG inflate/unfilter); a production
    JPEG codec would drop into ``bano_ray.codecs`` with the same signature.
    """

    def __init__(self):
        # heavy codec/model init would live here, once per actor
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        doc_ids = batch.column("doc_id").to_numpy() if "doc_id" in batch.column_names \
            else np.asarray([int(s[3:]) for s in batch.column("image_id").to_pylist()],
                            dtype=np.int64)
        n = len(fmts)
        from ..codecs import decode_image_batch

        decoded = decode_image_batch(blobs, fmts)
        ws = np.asarray([p.shape[1] for p in decoded], dtype=np.int64)
        hs = np.asarray([p.shape[0] for p in decoded], dtype=np.int64)
        srcs = datagen.pixels_of_batch(doc_ids, ws, hs)
        # one flat pass for the per-image reductions instead of n tiny ones
        sizes = ws * hs * 3
        # int32 intermediates: the squared diffs fit (≤255²) and the sums
        # run in float64 inside bincount either way — exact, half the
        # memory traffic of the former int64 flats (the stage is
        # bandwidth-bound, not FLOP-bound)
        flat_px = np.concatenate([p.ravel() for p in decoded]).astype(np.int32)
        flat_src = np.concatenate([s.ravel() for s in srcs]).astype(np.int32)
        sq = flat_px - flat_src
        sq *= sq
        grp = np.repeat(np.arange(n, dtype=np.int32), sizes)
        sse = np.bincount(grp, weights=sq, minlength=n)
        lum_sum = np.bincount(grp, weights=flat_px, minlength=n)
        mse = sse / sizes
        with np.errstate(divide="ignore"):
            psnr_db = np.where(mse == 0, np.inf, 10.0 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-300)))
        is_png = np.asarray([f == "png" for f in fmts])
        ok = np.where(is_png, mse == 0, psnr_db >= 40.0)
        mean_lum = lum_sum / sizes
        return pa.table({
            "image_id": batch.column("image_id"),
            "fmt": batch.column("fmt"),
            "caption": batch.column("caption"),
            "decode_ok": pa.array(ok),
            "psnr_db": pa.array(np.where(np.isinf(psnr_db), 999.0, psnr_db)),
            "mean_lum": pa.array(np.round(mean_lum, 4)),
        })


FRAMES_PER_VIDEO = 6
FRAME_W, FRAME_H = 10, 8


def make_video_payload(video_id: int) -> bytes:
    """Deterministic fake video container: FRAMES_PER_VIDEO length-prefixed
    PNG frames (frame pixels = ``datagen.pixels_of(video_id * FPV + i)``).
    The sandbox has no video codec libraries — the CONTAINER is the
    deterministic stand-in, while the Ray-side plumbing (opaque binary
    column, actor pool, batch sizing, per-frame output layout) is real and
    is what a production decoder would drop into (SURVEY.md §2.8
    multimodal; the decode seam mirrors codecs/__init__.py's
    NotImplementedError guards for unknown formats)."""
    import struct

    from ..codecs import encode_png

    parts = [struct.pack(">I", FRAMES_PER_VIDEO)]
    for i in range(FRAMES_PER_VIDEO):
        blob = encode_png(datagen.pixels_of(
            video_id * FRAMES_PER_VIDEO + i, FRAME_W, FRAME_H))
        parts.append(struct.pack(">I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


class FrameSampler:
    """Actor-pool frame-sample stage over opaque video payloads: parse the
    container index, decode only every ``step``-th frame, emit one row per
    SAMPLED frame with compact features — frames that aren't sampled are
    never decoded (the point of sampling at 100 TB)."""

    def __init__(self, step: int = 2):
        from ..runtime import tune_malloc

        tune_malloc()
        self.step = step

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        from ..codecs import decode_png

        blobs = _binary_column_views(batch.column("bytes"))
        vids = batch.column("video_id").to_numpy()
        out_v, out_f, out_lum = [], [], []
        for vid, blob in zip(vids, blobs):
            (nf,) = struct.unpack(">I", blob[:4])
            pos = 4
            for fi in range(nf):
                (ln,) = struct.unpack(">I", blob[pos:pos + 4])
                pos += 4
                if fi % self.step == 0:   # sampled frame: decode
                    px = decode_png(blob[pos:pos + ln])
                    out_v.append(int(vid))
                    out_f.append(fi)
                    out_lum.append(int(px.astype(np.int64).sum()))
                pos += ln                 # skipped frame: never decoded
        # exact integer luminance sum (not a rounded float mean): the
        # frames are lossless PNG over the closed-form pixel field, so
        # lum_sum replays bit-for-bit in SQL (oracle.q_frame_sample)
        return pa.table({"video_id": pa.array(out_v, pa.int64()),
                         "frame_idx": pa.array(out_f, pa.int64()),
                         "lum_sum": pa.array(out_lum, pa.int64())})


def videos_dataset(sf_dir: str, expand: int = 1):
    """Synthesized video table (video_id:int64, n_frames:int32,
    bytes:binary) — one video per document row, payload built inside
    map_batches (bytes never pass through the driver)."""
    import struct

    ensure_worker_importable()

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        payloads = [make_video_payload(int(i)) for i in ids]
        return pa.table({
            "video_id": pa.array(ids.astype(np.int64)),
            "n_frames": pa.array(np.full(len(ids), FRAMES_PER_VIDEO,
                                         dtype=np.int32)),
            "bytes": pa.array(payloads, type=pa.binary()),
        })

    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    ds = ds.map_batches(synth, batch_format="pyarrow")
    ds.context.target_max_block_size = 2 * 1024 * 1024
    return ds


def frame_sample(sf_dir: str, step: int = 2, concurrency=None):
    """Frame-sampling pipeline: video payloads → sampled-frame feature rows
    (actor pool, same sizing discipline as the image stages)."""
    if concurrency is None:
        cpus = _cluster_cpus()
        hi = max(2, cpus - 2)
        concurrency = (min(max(2, 3 * cpus // 4 - 1), hi), hi)
    return videos_dataset(sf_dir).map_batches(
        FrameSampler, fn_constructor_args=(step,), concurrency=concurrency,
        batch_size=256, batch_format="pyarrow", memory=IMAGE_STAGE_MEMORY)


AUDIO_SR = 16000
AUDIO_SAMPLES = 2048          # samples per clip (divisible by AUDIO_WINDOW)
AUDIO_WINDOW = 512            # analysis window → 4 windows per clip


def audio_samples_of(audio_ids: np.ndarray) -> np.ndarray:
    """(len(ids), AUDIO_SAMPLES) int16 PCM matrix for the deterministic fake
    audio corpus: pure integer-hash arithmetic, so the windowed features are
    exactly replicable in SQL (oracle.q_audio_features)."""
    ids = np.asarray(audio_ids, dtype=np.int64)
    i = np.arange(AUDIO_SAMPLES, dtype=np.int64)
    v = (ids[:, None] * 1000003 + i[None, :] * 7919 + 12345) % (1 << 31)
    return (v % 65536 - 32768).astype(np.int16)


def make_audio_payloads(audio_ids: np.ndarray) -> list[bytes]:
    """Deterministic fake audio containers: ``FAKA`` magic + big-endian
    sample-rate and sample-count header + little-endian PCM16 frames.  The
    sandbox has no audio codec libraries — the container is the deterministic
    stand-in (same seam as :func:`make_video_payload`); the Ray-side plumbing
    (opaque binary column, actor pool, window layout) is the real part."""
    import struct

    hdr = b"FAKA" + struct.pack(">II", AUDIO_SR, AUDIO_SAMPLES)
    mat = audio_samples_of(audio_ids)
    return [hdr + mat[r].astype("<i2").tobytes() for r in range(len(mat))]


class AudioFeatures:
    """Actor-pool feature-extract stage over opaque audio payloads: parse
    the container header, view the PCM16 frames zero-copy, and emit one row
    per analysis window with vectorized features (RMS, zero-crossing count,
    peak) — the multimodal decode → feature-extract shape for audio
    (SURVEY.md §2.8 multimodal; same pool/batch/memory discipline as the
    image/video stages)."""

    def __init__(self, window: int = AUDIO_WINDOW):
        from ..runtime import tune_malloc

        tune_malloc()
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        blobs = _binary_column_views(batch.column("bytes"))
        ids = batch.column("audio_id").to_numpy().astype(np.int64)
        W = self.window
        rows_id, rows_w, rows_rms, rows_zc, rows_pk = [], [], [], [], []
        # group equal-length clips so the window math runs as one matrix op
        # per length class (this corpus has exactly one)
        by_len: dict[int, list[int]] = {}
        pcm: list[np.ndarray] = []
        for r, blob in enumerate(blobs):
            if bytes(blob[:4]) != b"FAKA":
                raise NotImplementedError("unknown audio container format")
            (_sr, n) = struct.unpack(">II", blob[4:12])
            pcm.append(np.frombuffer(blob, dtype="<i2", count=n, offset=12))
            by_len.setdefault(n, []).append(r)
        for n, rws in by_len.items():
            nw = n // W
            if nw == 0:
                continue
            mat = np.stack([pcm[r] for r in rws]).astype(np.int64)
            win = mat[:, :nw * W].reshape(len(rws), nw, W)
            rms = np.round(np.sqrt((win * win).sum(axis=2) / float(W)), 6)
            nonneg = win >= 0
            zc = (nonneg[:, :, 1:] != nonneg[:, :, :-1]).sum(axis=2)
            pk = np.abs(win).max(axis=2)
            rows_id.append(np.repeat(ids[rws], nw))
            rows_w.append(np.tile(np.arange(nw, dtype=np.int64), len(rws)))
            rows_rms.append(rms.ravel())
            rows_zc.append(zc.ravel().astype(np.int64))
            rows_pk.append(pk.ravel().astype(np.int64))
        cat = (lambda xs, dt: np.concatenate(xs) if xs else np.empty(0, dt))
        return pa.table({
            "audio_id": pa.array(cat(rows_id, np.int64)),
            "window_idx": pa.array(cat(rows_w, np.int64)),
            "rms": pa.array(cat(rows_rms, np.float64)),
            "zero_crossings": pa.array(cat(rows_zc, np.int64)),
            "peak": pa.array(cat(rows_pk, np.int64)),
        })


def audios_dataset(sf_dir: str):
    """Synthesized audio table (audio_id:int64, sr:int32, bytes:binary) —
    one clip per document row, payloads built inside map_batches (bytes
    never pass through the driver)."""
    ensure_worker_importable()

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "audio_id": pa.array(ids),
            "sr": pa.array(np.full(len(ids), AUDIO_SR, dtype=np.int32)),
            "bytes": pa.array(make_audio_payloads(ids), type=pa.binary()),
        })

    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    ds = ds.map_batches(synth, batch_format="pyarrow")
    ds.context.target_max_block_size = 2 * 1024 * 1024
    return ds


def audio_features(sf_dir: str, concurrency=None):
    """Audio feature pipeline: clip payloads → per-window feature rows
    (actor pool, same sizing discipline as the image stages)."""
    if concurrency is None:
        cpus = _cluster_cpus()
        hi = max(2, cpus - 2)
        concurrency = (min(max(2, 3 * cpus // 4 - 1), hi), hi)
    return audios_dataset(sf_dir).map_batches(
        AudioFeatures, concurrency=concurrency, batch_size=256,
        batch_format="pyarrow", memory=IMAGE_STAGE_MEMORY)


THUMB = 8  # thumbnail edge (px)


class ImageThumbs:
    """Actor-pool resize/feature stage: decode each payload, box-average to
    a THUMB×THUMB RGB thumbnail (deterministic integer-sum box filter), emit
    the PNG-encoded thumbnail plus per-channel means — the multimodal
    decode → resize → feature-extract shape over opaque binary columns.
    Same pool/batch/memory discipline as :class:`ImageRoundtrip`."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    @staticmethod
    def thumb_of(px: np.ndarray, t: int = THUMB) -> np.ndarray:
        """(h, w, 3) uint8 → (t, t, 3) uint8 box means (floor(x+0.5))."""
        h, w, _ = px.shape
        iy = (np.arange(h) * t) // h
        ix = (np.arange(w) * t) // w
        cell = (iy[:, None] * t + ix[None, :]).ravel()
        flat = px.reshape(-1, 3).astype(np.int64)
        sums = np.zeros((t * t, 3), dtype=np.int64)
        np.add.at(sums, cell, flat)
        cnt = np.bincount(cell, minlength=t * t).astype(np.int64)
        # floor(s/c + 0.5) in EXACT integer arithmetic: (2s + c) // (2c)
        # — same value as the float form for every reachable s/c, and
        # bit-replicable in the DuckDB oracle (no float-division seam)
        means = (2 * sums + cnt[:, None]) // (2 * cnt[:, None])
        return means.astype(np.uint8).reshape(t, t, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch, encode_png

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        thumbs = [self.thumb_of(p) for p in decoded]
        means = np.asarray([t.reshape(-1, 3).mean(axis=0) for t in thumbs])
        return pa.table({
            "image_id": batch.column("image_id"),
            "thumb_png": pa.array([encode_png(t) for t in thumbs],
                                  type=pa.binary()),
            "mean_r": pa.array(np.round(means[:, 0], 4)),
            "mean_g": pa.array(np.round(means[:, 1], 4)),
            "mean_b": pa.array(np.round(means[:, 2], 4)),
        })


class ImageThumbSums:
    """Value-gated thumbnail census over PNG payloads: decode, box-average
    to the THUMB×THUMB thumbnail with :meth:`ImageThumbs.thumb_of`'s exact
    integer formula, and emit one row per (doc, channel) with the integer
    SUM of the 64 thumbnail cell values — the quantity the DuckDB oracle
    replays from the closed-form pixel field (oracle.q_image_thumbs)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        ids = batch.column("doc_id").to_numpy()
        n = len(ids)
        tsums = np.empty((n, 3), dtype=np.int64)
        for i, p in enumerate(decoded):
            tsums[i] = (ImageThumbs.thumb_of(p)
                        .reshape(-1, 3).astype(np.int64).sum(axis=0))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 3)),
            "ch": pa.array(np.tile(np.arange(3, dtype=np.int64), n)),
            "thumb_sum": pa.array(tsums.reshape(-1)),
        })


def image_thumb_sums(sf_dir: str, concurrency=None):
    """PNG-only thumbnail-sum pipeline (value-oracled; JPEG rows are
    excluded before any bytes exist, the q_image_patches discipline)."""
    return _png_pool_pipeline(sf_dir, ImageThumbSums, concurrency)


def image_thumbs(sf_dir: str, concurrency=None, expand: int = 1):
    """Thumbnail/feature pipeline over the payload bytes (same sizing as
    :func:`image_roundtrip`)."""
    ensure_worker_importable()
    if concurrency is None:
        cpus = _cluster_cpus()
        hi = max(2, cpus - 2)
        concurrency = (min(max(2, 3 * cpus // 4 - 1), hi), hi)
    ds = datagen.images_dataset(sf_dir, with_bytes=True, expand=expand)
    ds.context.target_max_block_size = 2 * 1024 * 1024
    return ds.map_batches(ImageThumbs, concurrency=concurrency,
                          batch_size=512, batch_format="pyarrow",
                          memory=IMAGE_STAGE_MEMORY)


# Declared per-task memory for the decode-validate actor stage.  A 512-row
# batch of ~1 KB payloads peaks well under 100 MB inside __call__; 256 MiB
# leaves headroom for block-size variance while letting 32 actors fit in a
# fraction of one node's heap.  Declaring it also makes the stage's remote
# args incompatible with the upstream task ops, so ray 2.49's operator-fusion
# rule (operator_fusion._are_remote_args_compatible) keeps the synthesis
# chain OUT of the actor op — the fused-chain form intermittently deadlocked
# the streaming executor (16 actors requested, 2 created) and mis-attributed
# the whole chain's footprint to the actor task (the r2 "11.3GB per task,
# Ray requests 0.0B" warning).
IMAGE_STAGE_MEMORY = 256 * 1024 * 1024


def image_roundtrip(sf_dir: str, concurrency=None, expand: int = 1):
    """Decode-validate every payload (actor pool, small batches — binary
    rows are wide; batch_size keeps batch × concurrency in worker heap).

    The pool autoscales with the cluster: ``concurrency=(cpus//4, cpus-2)``
    leaves slots for the upstream synthesis/read tasks while letting the
    heaviest CPU stage claim the rest of the node.  Per-task ``memory`` is
    declared (see IMAGE_STAGE_MEMORY) so the executor can budget the stage
    — and so the stage never fuses with its upstream task chain.
    """
    ensure_worker_importable()
    if concurrency is None:
        cpus = _cluster_cpus()
        # floor the pool at ~3/4 of the cluster: the ray 2.49 autoscaler
        # adds actors only as the input queue builds, and the ramp never
        # reaches the pool's ceiling before the job ends.  Measured at 32
        # cpus (alternating A/B, 3 rounds): floor 8 → 51.7–55.0 s at 20.4
        # busy cores; floor 24 → 45.5–47.8 s at 23.6 (+13%); floor 30
        # (everything) → 66.9 s — the encode-side synthesis tasks starve.
        # At 8 cpus floor 5 beats floors 2 and 6 by ~15% for the same
        # reason (3 slots left for synthesis).
        hi = max(2, cpus - 2)
        concurrency = (min(max(2, 3 * cpus // 4 - 1), hi), hi)
    # Byte-payload rows are ~1.3 KB: bound OUTPUT block size so the
    # synthesis tasks emit ~1.5k-row blocks for the actor pool regardless
    # of how the executor bundles their (tiny) id-stream inputs.  Without
    # this, input-side bundling let one synthesis task emit an 84 MB /
    # 80k-row block and the whole 400k-image corpus arrived as 5 fat
    # tasks — a 2-actor pool and a 4x wall regression.  2 MiB is the
    # per-block target the r2 sizing note derived (1.5k rows x ~1.3 KB).
    ds = datagen.images_dataset(sf_dir, with_bytes=True, expand=expand)
    # per-dataset context (ray 2.49 snapshots a COPY at creation): the 2 MiB
    # target applies only to this plan — no global mutation, reentrant, and
    # datasets built concurrently elsewhere keep their fat blocks
    ds.context.target_max_block_size = 2 * 1024 * 1024
    # 512-row batches amortize the batched JPEG decode (one dequant/IDCT
    # pass per batch) while batch × concurrency stays well inside heaps
    # (~1 KB payload rows)
    return ds.map_batches(ImageRoundtrip, concurrency=concurrency,
                          batch_size=512, batch_format="pyarrow",
                          memory=IMAGE_STAGE_MEMORY)


def flagship(sf_dir: str, expand: int = 1, assign_concurrency: int = 4):
    """The full spatial-join + street-aggregation pipeline (street JSON
    output).  This is the throughput-measured job; ``expand`` scales the
    synthesized corpus (bench uses ~600k rows at sf0.1)."""
    from .exports import street_json

    ensure_worker_importable()
    return street_json(sf_dir, expand=expand,
                       assign_concurrency=assign_concurrency)


def flagship_with_bytes(sf_dir: str, num_partitions: int | None = None):
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
    cpus = _cluster_cpus()
    meta = points_dataset(sf_dir).select_columns(
        ["image_id", "insee", "street_key", "cell", "hn"])
    payload = image_roundtrip(sf_dir).select_columns(
        ["image_id", "fmt", "decode_ok", "psnr_db", "mean_lum"])
    if cpus >= 8:
        if num_partitions is None:
            num_partitions = max(2, min(16, cpus // 2))
        return meta.join(payload, join_type="inner",
                         num_partitions=num_partitions, on=("image_id",))
    # below ~8 CPU slots ray 2.49's hash-join aggregator actors starve the
    # streaming executor — fall back to a sort-based co-group join
    import pandas as pd
    import pyarrow as pa

    def tag(side):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array([side] * b.num_rows))

        return f

    both = meta.map_batches(tag("l"), batch_format="pyarrow")         .union(payload.map_batches(tag("r"), batch_format="pyarrow"))

    def join_group(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "l"].drop(columns=["_side"]).dropna(axis=1, how="all")
        r = df[df["_side"] == "r"].drop(columns=["_side"]).dropna(axis=1, how="all")
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame()
        return l.merge(r, on="image_id", how="inner")

    return both.groupby("image_id").map_groups(join_group, batch_format="pandas")


PATCH = 8  # ViT-style patch edge (px)


class ImagePatches:
    """Actor-pool ViT-style patchification: decode each PNG payload and
    emit one row per PATCH×PATCH patch with the EXACT integer sum of all
    channel values and the pixel count — the patch-embedding front of a
    vision-transformer ingest.  Unlike the codec stages this one is
    value-ORACLED: the synthetic pixel field is closed-form and PNG decode
    is bit-exact, so DuckDB replays the whole pixel formula
    (oracle.q_image_patches, int64 wraps emulated in HUGEINT) — the
    engine still exercises the real decode path on real container bytes.
    Same pool/batch/memory discipline as :class:`ImageRoundtrip`."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        ids = batch.column("doc_id").to_numpy()
        o_id, o_py, o_px, o_sum, o_n = [], [], [], [], []
        P = PATCH
        for i, img in enumerate(decoded):
            h, w, _ = img.shape
            npx = (w + P - 1) // P
            npy = (h + P - 1) // P
            cell = ((np.arange(h) // P)[:, None] * npx
                    + (np.arange(w) // P)[None, :]).ravel()
            tot = np.bincount(
                cell, weights=img.reshape(-1, 3).astype(np.int64)
                .sum(axis=1).astype(np.float64),
                minlength=npy * npx).astype(np.int64)
            cnt = np.bincount(cell, minlength=npy * npx).astype(np.int64)
            pyv, pxv = np.divmod(np.arange(npy * npx, dtype=np.int64), npx)
            o_id.append(np.full(npy * npx, ids[i], dtype=np.int64))
            o_py.append(pyv)
            o_px.append(pxv)
            o_sum.append(tot)
            o_n.append(cnt)
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.empty(0, np.int64))
        return pa.table({
            "doc_id": pa.array(cat(o_id)),
            "patch_y": pa.array(cat(o_py)),
            "patch_x": pa.array(cat(o_px)),
            "psum": pa.array(cat(o_sum)),
            "n_px": pa.array(cat(o_n)),
        })


class ImageEqualize:
    """Actor-pool histogram equalization census over PNG payloads: per
    image the classic integer remap out(v) = round(255·(cdf(v)−cdf_min)
    / (N−cdf_min)) — realized tie-free as (2·255·(cdf−m) + (N−m)) //
    (2·(N−m)) — and the exact integer summaries (Σ remapped values,
    min/max remap, value count).  Flat-image edge (N == cdf_min) remaps
    to 0 on both sides.  Value-ORACLED like :class:`ImagePatches`."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        ids = batch.column("doc_id").to_numpy()
        n = len(ids)
        eq_sum = np.empty(n, dtype=np.int64)
        eq_min = np.empty(n, dtype=np.int64)
        eq_max = np.empty(n, dtype=np.int64)
        n_vals = np.empty(n, dtype=np.int64)
        for i, img in enumerate(decoded):
            v = img.reshape(-1).astype(np.int64)
            hist = np.bincount(v, minlength=256)
            cdf = np.cumsum(hist)
            present = hist > 0
            m = int(cdf[present.argmax()]) if present.any() else 0
            N = v.size
            if N == m:
                ov = np.zeros(256, dtype=np.int64)
            else:
                ov = (2 * 255 * (cdf - m) + (N - m)) // (2 * (N - m))
            eq_sum[i] = int((hist * ov).sum())
            eq_min[i] = int(ov[present].min())
            eq_max[i] = int(ov[present].max())
            n_vals[i] = N
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "eq_sum": pa.array(eq_sum), "eq_min": pa.array(eq_min),
            "eq_max": pa.array(eq_max), "n_vals": pa.array(n_vals)})


def image_equalize(sf_dir: str, concurrency=None):
    """PNG-only equalization-census pipeline (q_image_patches
    discipline)."""
    return _png_pool_pipeline(sf_dir, ImageEqualize, concurrency)


def image_patches(sf_dir: str, concurrency=None):
    """Patch-statistics pipeline over real PNG payloads (lossless docs
    only — JPEG rows are excluded on both sides before any bytes are
    synthesized, so the lossy codec never gates the values)."""
    return _png_pool_pipeline(sf_dir, ImagePatches, concurrency)


SCENE_CUT_T = 10_000  # luminance-sum jump that counts as a scene cut


class SceneCuts:
    """Actor-pool video scene-cut detector: parse the container index,
    decode EVERY frame (cut detection needs consecutive frames), reduce
    each to its exact integer luminance sum, and count jumps above
    SCENE_CUT_T between consecutive frames.  Value-ORACLED like
    :class:`ImagePatches`: frames are lossless PNG over the closed-form
    pixel field, so DuckDB replays the per-frame sums and the LAG diffs
    (oracle.q_scene_cuts).  Same pool discipline as the other payload
    stages."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        from ..codecs import decode_png

        blobs = _binary_column_views(batch.column("bytes"))
        vids = batch.column("video_id").to_numpy()
        out_v, out_cuts, out_jump = [], [], []
        for i, blob in enumerate(blobs):
            mv = memoryview(blob)
            (nf,) = struct.unpack(">I", mv[:4])
            off = 4
            lums = np.empty(nf, dtype=np.int64)
            for fi in range(nf):
                (ln,) = struct.unpack(">I", mv[off:off + 4])
                off += 4
                lums[fi] = decode_png(bytes(mv[off:off + ln])) \
                    .astype(np.int64).sum()
                off += ln
            jumps = np.abs(np.diff(lums))
            out_v.append(int(vids[i]))
            out_cuts.append(int((jumps > SCENE_CUT_T).sum()))
            out_jump.append(int(jumps.max()) if len(jumps) else 0)
        return pa.table({
            "video_id": pa.array(out_v, pa.int64()),
            "n_cuts": pa.array(out_cuts, pa.int64()),
            "max_jump": pa.array(out_jump, pa.int64()),
        })


FRAME_DIFF_T = 12   # per-channel abs-diff threshold that counts as changed


class FrameDiff:
    """Actor-pool inter-frame change census: decode every frame, emit one
    row per CONSECUTIVE frame pair with the exact count of channel
    values whose |diff| > FRAME_DIFF_T and the exact integer sum of
    absolute diffs — the motion-estimation front of a video-curation
    pass.  Value-ORACLED like :class:`SceneCuts` (lossless frames over
    the closed-form pixel field; the oracle self-joins the replay at
    fi vs fi−1)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        from ..codecs import decode_png

        blobs = _binary_column_views(batch.column("bytes"))
        vids = batch.column("video_id").to_numpy()
        o_v, o_f, o_ch, o_sum = [], [], [], []
        for vid, blob in zip(vids, blobs):
            (nf,) = struct.unpack(">I", blob[:4])
            pos = 4
            prev = None
            for fi in range(nf):
                (ln,) = struct.unpack(">I", blob[pos:pos + 4])
                pos += 4
                px = decode_png(blob[pos:pos + ln]).astype(np.int64).ravel()
                pos += ln
                if prev is not None:
                    d = np.abs(px - prev)
                    o_v.append(int(vid))
                    o_f.append(fi)
                    o_ch.append(int((d > FRAME_DIFF_T).sum()))
                    o_sum.append(int(d.sum()))
                prev = px
        return pa.table({"video_id": pa.array(o_v, pa.int64()),
                         "frame_idx": pa.array(o_f, pa.int64()),
                         "n_changed": pa.array(o_ch, pa.int64()),
                         "sum_absdiff": pa.array(o_sum, pa.int64())})


def frame_diff(sf_dir: str, concurrency=None):
    """Inter-frame diff pipeline (same sizing as :func:`scene_cuts`)."""
    ensure_worker_importable()
    if concurrency is None:
        cpus = _cluster_cpus()
        hi = max(2, cpus - 2)
        concurrency = (min(max(2, 3 * cpus // 4 - 1), hi), hi)
    return videos_dataset(sf_dir).map_batches(
        FrameDiff, concurrency=concurrency, batch_size=256,
        batch_format="pyarrow", memory=IMAGE_STAGE_MEMORY)


def scene_cuts(sf_dir: str, concurrency=None):
    """Scene-cut pipeline over the opaque video payloads (same sizing as
    :func:`frame_sample`)."""
    ensure_worker_importable()
    if concurrency is None:
        cpus = _cluster_cpus()
        hi = max(2, cpus - 2)
        concurrency = (min(max(2, 3 * cpus // 4 - 1), hi), hi)
    return videos_dataset(sf_dir).map_batches(
        SceneCuts, concurrency=concurrency, batch_size=256,
        batch_format="pyarrow", memory=IMAGE_STAGE_MEMORY)


DHASH_COLS = 9  # dHash grid: 9 columns × 8 rows of luminance box means
DHASH_ROWS = 8


class ImageDhash:
    """Actor-pool difference-hash over REAL decoded pixels: 9×8 luminance
    box means (exact integer sums + counts — no division), bit r,c set
    iff cell (r,c+1) outweighs cell (r,c) by cross-multiplication, packed
    into a signed 64-bit hash.  Unlike the synthetic ``phash`` column
    this fingerprints the actual image content; value-ORACLED like
    :class:`ImagePatches` (oracle.q_dhash replays the box sums and the
    cross-multiplied comparisons in SQL)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    @staticmethod
    def dhash_of(px: np.ndarray) -> int:
        h, w, _ = px.shape
        iy = (np.arange(h) * DHASH_ROWS) // h
        ix = (np.arange(w) * DHASH_COLS) // w
        cell = (iy[:, None] * DHASH_COLS + ix[None, :]).ravel()
        flat = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
        sums = np.bincount(cell, weights=flat.astype(np.float64),
                           minlength=DHASH_ROWS * DHASH_COLS).astype(np.int64)
        cnts = (np.bincount(cell, minlength=DHASH_ROWS * DHASH_COLS)
                .astype(np.int64) * 3)
        s = sums.reshape(DHASH_ROWS, DHASH_COLS)
        c = cnts.reshape(DHASH_ROWS, DHASH_COLS)
        # bit = mean(r,c+1) > mean(r,c), exact by cross-multiplication
        bits = (s[:, 1:] * c[:, :-1]) > (s[:, :-1] * c[:, 1:])
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        packed = int((bits.ravel().astype(np.uint64) * weights)
                     .sum(dtype=np.uint64))
        return packed - (1 << 64) if packed >= (1 << 63) else packed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        hashes = np.fromiter((self.dhash_of(p) for p in decoded),
                             dtype=np.int64, count=len(decoded))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "dhash": pa.array(hashes),
        })


def _png_pool_pipeline(sf_dir: str, stage_cls, concurrency=None,
                       batch_size: int = 512):
    """Shared scaffold for value-gated decoded-content stages: pruned
    doc_id read → PNG-only byte synthesis (JPEG rows excluded BEFORE any
    bytes exist, so the lossy codec never gates values) → small blocks →
    actor-pool decode stage.  Same pool sizing as :func:`image_patches`."""
    import ray.data

    ensure_worker_importable()
    if concurrency is None:
        cpus = _cluster_cpus()
        hi = max(2, cpus - 2)
        concurrency = (min(max(2, 3 * cpus // 4 - 1), hi), hi)

    def synth_png(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        keep = d % datagen.FMT_JPEG_MOD != 0
        sub = pa.table({"doc_id": pa.array(d[keep])})
        out = datagen.synthesize_batch(sub, with_bytes=True)
        return out.select(["doc_id", "fmt", "bytes"])

    ds = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"])
          .map_batches(synth_png, batch_format="pyarrow"))
    ds.context.target_max_block_size = 2 * 1024 * 1024
    return ds.map_batches(stage_cls, concurrency=concurrency,
                          batch_size=batch_size, batch_format="pyarrow",
                          memory=IMAGE_STAGE_MEMORY)


def image_dhash(sf_dir: str, concurrency=None):
    """Content dHash pipeline over the lossless (PNG) payloads — same
    PNG-only discipline and pool sizing as :func:`image_patches`."""
    return _png_pool_pipeline(sf_dir, ImageDhash, concurrency)


HIST_BIN_W = 48  # luminance (r+g+b in 0..765) // 48 → 16 bins


class ImageHist:
    """Actor-pool per-image luminance histogram over REAL decoded pixels:
    per-pixel luminance = exact channel sum (no division), binned into
    765 // HIST_BIN_W + 1 = 16 integer-width bins, one output row per
    PRESENT (doc_id, bin) — the per-corpus exposure census a curation
    pipeline cuts over.  Value-ORACLED (oracle.q_image_hist replays the
    closed-form pixel field + binning in SQL)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        dids = batch.column("doc_id").to_numpy()
        o_d, o_b, o_n = [], [], []
        nbins = 765 // HIST_BIN_W + 1
        for did, px in zip(dids, decoded):
            lum = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
            cnt = np.bincount(lum // HIST_BIN_W, minlength=nbins)
            nz = np.flatnonzero(cnt)
            o_d.append(np.full(len(nz), did, dtype=np.int64))
            o_b.append(nz.astype(np.int64))
            o_n.append(cnt[nz].astype(np.int64))
        cat = np.concatenate
        return pa.table({
            "doc_id": pa.array(cat(o_d) if o_d else np.empty(0, np.int64)),
            "bin": pa.array(cat(o_b) if o_b else np.empty(0, np.int64)),
            "n": pa.array(cat(o_n) if o_n else np.empty(0, np.int64)),
        })


def image_hist(sf_dir: str, concurrency=None):
    """Luminance-histogram pipeline over the lossless (PNG) payloads."""
    return _png_pool_pipeline(sf_dir, ImageHist, concurrency)


MIP_LEVELS = (1, 2)  # 2×2 and 4×4 box-filter mip levels


class ImageMips:
    """Actor-pool mip-pyramid census over REAL decoded pixels: at each
    level L the image grid partitions into 2^L×2^L boxes (ragged edges
    keep partial boxes); per (doc, level) we emit the cell count and the
    exact integer sum of per-cell floor-averaged luminance — the
    downsample-correctness signature a thumbnail/mosaic stage is audited
    by.  Value-ORACLED (oracle.q_image_mips groups the closed-form pixel
    field by the same box indices in SQL)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        dids = batch.column("doc_id").to_numpy()
        o_d, o_l, o_n, o_s = [], [], [], []
        for did, px in zip(dids, decoded):
            h, w, _ = px.shape
            lum = px.astype(np.int64).sum(axis=2)
            for lvl in MIP_LEVELS:
                step = 1 << lvl
                ncx = (w + step - 1) >> lvl
                cell = ((np.arange(h) >> lvl)[:, None] * ncx
                        + (np.arange(w) >> lvl)[None, :]).ravel()
                sums = np.bincount(cell, weights=lum.ravel()).astype(np.int64)
                cnts = np.bincount(cell)
                o_d.append(did)
                o_l.append(lvl)
                o_n.append(len(cnts))
                o_s.append(int((sums // cnts).sum()))
        return pa.table({
            "doc_id": pa.array(np.asarray(o_d, dtype=np.int64)),
            "lvl": pa.array(np.asarray(o_l, dtype=np.int64)),
            "n_cells": pa.array(np.asarray(o_n, dtype=np.int64)),
            "s_avg": pa.array(np.asarray(o_s, dtype=np.int64)),
        })


def image_mips(sf_dir: str, concurrency=None):
    """Mip-pyramid census pipeline over the lossless (PNG) payloads."""
    return _png_pool_pipeline(sf_dir, ImageMips, concurrency)


class ImageSobel:
    """Actor-pool gradient-energy stage over REAL decoded pixels: exact
    integer sums of |Δluminance| along x and along y — the cheap
    sharpness / blur-detection signal an image-curation pipeline filters
    on.  Value-ORACLED (oracle.q_sobel_energy replays the neighbor
    differences via pixel-index self-joins in SQL)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        n = len(decoded)
        gx = np.empty(n, dtype=np.int64)
        gy = np.empty(n, dtype=np.int64)
        for i, px in enumerate(decoded):
            lum = px.astype(np.int64).sum(axis=2)
            gx[i] = np.abs(np.diff(lum, axis=1)).sum()
            gy[i] = np.abs(np.diff(lum, axis=0)).sum()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "gx_energy": pa.array(gx),
            "gy_energy": pa.array(gy),
        })


def image_sobel(sf_dir: str, concurrency=None):
    """Gradient-energy pipeline over the lossless (PNG) payloads."""
    return _png_pool_pipeline(sf_dir, ImageSobel, concurrency)


class ImageEntropy:
    """Actor-pool per-image Shannon entropy of the 16-bin luminance
    histogram over REAL decoded pixels — the flat-image / synthetic-image
    detector an image-curation pipeline thresholds on.  The bin counts
    are the exact integers of :class:`ImageHist`; the entropy is
    ``-Σ (c/n)·log2(c/n)`` accumulated in ASCENDING bin order (a
    left-fold, the same order the oracle's fixed 16-term expression
    evaluates) and rounded to 6 dp on both sides — ulp-level libm skew
    cannot move a 6-dp digit except on a rounding boundary, and the
    corpus pins none (asserted by the parity gate).  Value-ORACLED
    (oracle.q_image_entropy)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        nbins = 765 // HIST_BIN_W + 1
        nimg = len(decoded)
        counts = np.zeros((nimg, nbins), dtype=np.int64)
        for i, px in enumerate(decoded):
            lum = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
            counts[i] = np.bincount(lum // HIST_BIN_W, minlength=nbins)
        n = counts.sum(axis=1).astype(np.float64)
        ent = np.zeros(nimg, dtype=np.float64)
        for b in range(nbins):         # left-fold in bin order == oracle
            c = counts[:, b].astype(np.float64)
            p = c / n
            with np.errstate(divide="ignore", invalid="ignore"):
                term = -(p * np.log2(p))
            ent = ent + np.where(counts[:, b] > 0, term, 0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "entropy": pa.array(np.round(ent, 6)),
        })


def image_entropy(sf_dir: str, concurrency=None):
    """Histogram-entropy pipeline over the lossless (PNG) payloads."""
    return _png_pool_pipeline(sf_dir, ImageEntropy, concurrency)


POOL_G = 4  # grid pooling resolution (4×4 blocks per image)


class ImagePool:
    """Actor-pool 4×4 grid pooling over REAL decoded pixels: per block
    the exact integer luminance sum + pixel count — the downsampled
    spatial-layout feature (exposure map) a vision curation pass
    extracts before any model sees the image.  Block index is the exact
    integer ``coord · G // extent`` (every block non-empty: dims ≥ 12 ≥
    G).  Value-ORACLED (oracle.q_image_pool replays the closed-form
    pixel field + block math in SQL)."""

    def __init__(self):
        from ..runtime import tune_malloc

        tune_malloc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs import decode_image_batch

        fmts = batch.column("fmt").to_pylist()
        blobs = _binary_column_views(batch.column("bytes"))
        decoded = decode_image_batch(blobs, fmts)
        dids = batch.column("doc_id").to_numpy()
        G = POOL_G
        o_d, o_k, o_n, o_s = [], [], [], []
        for did, px in zip(dids, decoded):
            h, w = px.shape[0], px.shape[1]
            lum = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
            pix = np.arange(w * h)
            key = ((pix // w) * G // h) * G + (pix % w) * G // w
            sums = np.bincount(key, weights=lum.astype(np.float64),
                               minlength=G * G).astype(np.int64)
            cnts = np.bincount(key, minlength=G * G).astype(np.int64)
            o_d.append(np.full(G * G, did, dtype=np.int64))
            o_k.append(np.arange(G * G, dtype=np.int64))
            o_n.append(cnts)
            o_s.append(sums)
        cat = np.concatenate
        empty = np.empty(0, np.int64)
        key = cat(o_k) if o_k else empty
        return pa.table({
            "doc_id": pa.array(cat(o_d) if o_d else empty),
            "gx": pa.array(key % POOL_G),
            "gy": pa.array(key // POOL_G),
            "n_px": pa.array(cat(o_n) if o_n else empty),
            "sum_lum": pa.array(cat(o_s) if o_s else empty),
        })


def image_pool(sf_dir: str, concurrency=None):
    """Grid-pooled luminance features over the lossless (PNG) payloads."""
    return _png_pool_pipeline(sf_dir, ImagePool, concurrency)
