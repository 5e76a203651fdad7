"""Image codecs: real PNG (lossless) + real baseline JPEG (SOF0).

``fmt='jpeg'`` payloads are genuine JFIF/JPEG streams (see
``bano_ray/codecs/jpeg.py``); the earlier BQLY quantize+zlib stand-in
remains importable for old payloads but is no longer produced.
"""

from __future__ import annotations

import numpy as np

from .jpeg import decode_jpeg, decode_jpeg_batch, encode_jpeg, encode_jpeg_batch
from .lossy import decode_lossy, encode_lossy, psnr
from .png import decode_png, encode_png

JPEG_QUALITY = 98  # keeps lossy round-trip PSNR >= 40 dB on the corpus

__all__ = ["encode_png", "decode_png", "encode_jpeg", "decode_jpeg",
           "encode_jpeg_batch", "decode_jpeg_batch", "encode_lossy",
           "decode_lossy", "psnr", "encode_image", "decode_image",
           "encode_image_batch", "decode_image_batch", "JPEG_QUALITY"]


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_jpeg(pixels, JPEG_QUALITY)
    raise NotImplementedError(f"no codec for fmt={fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        if data[:4] == b"BQLY":  # legacy stub payloads
            return decode_lossy(data)
        return decode_jpeg(data)
    raise NotImplementedError(f"no codec for fmt={fmt!r}")


def encode_image_batch(pixels: list[np.ndarray], fmts: list[str]) -> list[bytes]:
    """Batch encode: JPEG rows share one vectorized DCT/entropy pass."""
    out: list[bytes | None] = [None] * len(fmts)
    jp = [i for i, f in enumerate(fmts) if f == "jpeg"]
    if jp:
        for i, data in zip(jp, encode_jpeg_batch([pixels[i] for i in jp], JPEG_QUALITY)):
            out[i] = data
    for i, f in enumerate(fmts):
        if f == "png":
            out[i] = encode_png(pixels[i])
        elif f != "jpeg":
            raise NotImplementedError(f"no codec for fmt={f!r}")
    return out  # type: ignore[return-value]


def decode_image_batch(datas: list[bytes], fmts: list[str]) -> list[np.ndarray]:
    """Batch decode: JPEG rows share one dequant/IDCT/color pass."""
    out: list[np.ndarray | None] = [None] * len(fmts)
    jp = [i for i, f in enumerate(fmts)
          if f == "jpeg" and datas[i][:4] != b"BQLY"]
    if jp:
        for i, px in zip(jp, decode_jpeg_batch([datas[i] for i in jp])):
            out[i] = px
    for i, f in enumerate(fmts):
        if out[i] is None:
            out[i] = decode_image(datas[i], f)
    return out  # type: ignore[return-value]
