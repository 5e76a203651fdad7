"""STUB lossy image codec standing in for JPEG.

No JPEG library exists in this container, so the ``fmt='jpeg'`` payloads are
produced by this CLEARLY-MARKED deterministic stand-in: 6-bit/channel
quantization + zlib, custom ``BQLY`` container.  Quantization to step 4 keeps
PSNR ≈ 46 dB vs the source pixels — above the ≥40 dB invariant the engine
asserts for lossy formats — while still exercising the "decoded-pixel
allclose, not byte-equal" code paths end to end.

Swapping in a real JPEG codec is a drop-in: implement encode/decode with the
same signatures and register under ``fmt='jpeg'`` in
``bano_ray.codecs.decode_image``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"BQLY"
_STEP = 4  # 6-bit quantization


def encode_lossy(pixels: np.ndarray) -> bytes:
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    q = (pixels.astype(np.uint16) // _STEP).astype(np.uint8)
    return _MAGIC + struct.pack("<HHB", w, h, c) + zlib.compress(q.tobytes(), 1)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not a BQLY stream")
    w, h, c = struct.unpack_from("<HHB", data, 4)
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, c)
    # dequantize to bin centers
    return np.minimum(q.astype(np.uint16) * _STEP + _STEP // 2, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
