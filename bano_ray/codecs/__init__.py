"""Image codecs: real PNG (lossless) + marked lossy stub (stands in for JPEG)."""

from __future__ import annotations

import numpy as np

from .lossy import decode_lossy, encode_lossy, psnr
from .png import decode_png, encode_png

__all__ = ["encode_png", "decode_png", "encode_lossy", "decode_lossy",
           "psnr", "encode_image", "decode_image"]


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":  # stub lossy codec, see bano_ray/codecs/lossy.py
        return encode_lossy(pixels)
    raise NotImplementedError(f"no codec for fmt={fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise NotImplementedError(f"no codec for fmt={fmt!r}")
