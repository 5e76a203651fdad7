"""Real PNG encode/decode for 8-bit RGB images — stdlib zlib only.

This is the engine's lossless image codec: payload ``bytes`` columns hold
genuine PNG streams, and the round-trip invariant (decode → pixels →
bit-exact vs source) is asserted at stage boundaries per the engine's
image-payload contract (BASELINE.md correctness invariants).

Encoder always writes filter type 0 scanlines; decoder implements all five
standard filters (None/Sub/Up/Average/Paeth), single IDAT or split.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("RGB only")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 1)  # noise-like payloads don't
    # compress; level 1 halves encode cost with ~equal output size
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    bpp = 3
    stride = w * bpp
    # fast path: every scanline filter type 0 (what our encoder writes) —
    # a single reshape+slice instead of a per-row loop
    grid = raw.reshape(h, stride + 1)
    if not grid[:, 0].any():
        return np.ascontiguousarray(grid[:, 1:]).reshape(h, w, 3)
    out = np.zeros((h, stride), dtype=np.uint8)
    for row in range(h):
        ftype = int(raw[row * (stride + 1)])
        line = raw[row * (stride + 1) + 1: (row + 1) * (stride + 1)].astype(np.int32)
        prev = out[row - 1].astype(np.int32) if row > 0 else np.zeros(stride, dtype=np.int32)
        cur = np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need the running left byte
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - cc
                    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[row] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = None
    idat = b""
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4: off + 8]
        payload = data[off + 8: off + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, *_ = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        off += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    return _unfilter(raw, h, w)
