"""Baseline sequential JPEG (SOF0) encoder/decoder — numpy + stdlib only.

Real JFIF/JPEG interchange format: SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers,
8×8 DCT-II via matrix multiply, standard Annex-K quantization tables scaled
by quality (IJG formula), 4:4:4 YCbCr, spec Annex-K Huffman tables, DC
differential coding, AC run-length coding with ZRL/EOB, 0xFF byte stuffing.

Encoding is batch-vectorized (all blocks of an image DCT'd/quantized in one
einsum; Huffman bit-packing through a (symbols × maxbits) bit matrix).
Decoding Huffman is inherently sequential — a 16-bit-prefix lookup table
keeps the per-symbol Python loop minimal; dequant + IDCT are vectorized.

This replaces the earlier clearly-marked BQLY stand-in: ``fmt='jpeg'``
payloads are genuine JPEG streams (``FFD8``-led, decodable by any baseline
decoder).
"""

from __future__ import annotations

import struct

import numpy as np

# --- DCT -------------------------------------------------------------------

_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_D *= np.sqrt(2.0 / 8.0)
_D[0, :] *= 1.0 / np.sqrt(2.0)
_DT = _D.T.copy()

# --- quantization (Annex K.1/K.2) -----------------------------------------

QL_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --- zigzag ----------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# --- Huffman tables (Annex K.3) -------------------------------------------
# (bits[1..16], values) per table

DC_L_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_L_VALS = list(range(12))
DC_C_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_VALS = list(range(12))

AC_L_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_C_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _build_codes(bits, vals):
    """Canonical Huffman: value → (code, length); and decode prefix table."""
    code = 0
    k = 0
    enc = {}
    dec = {}  # (length, code) -> value
    for length in range(1, 17):
        for _ in range(bits[length]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


_ENC_DC_L, _DEC_DC_L = _build_codes(DC_L_BITS, DC_L_VALS)
_ENC_DC_C, _DEC_DC_C = _build_codes(DC_C_BITS, DC_C_VALS)
_ENC_AC_L, _DEC_AC_L = _build_codes(AC_L_BITS, AC_L_VALS)
_ENC_AC_C, _DEC_AC_C = _build_codes(AC_C_BITS, AC_C_VALS)


def _fast_table(dec: dict) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-prefix lookup: prefix → (value, code length)."""
    val = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for (length, code), v in dec.items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        val[lo:hi] = v
        ln[lo:hi] = length
    return val, ln


_FAST = {
    "dcl": _fast_table(_DEC_DC_L), "dcc": _fast_table(_DEC_DC_C),
    "acl": _fast_table(_DEC_AC_L), "acc": _fast_table(_DEC_AC_C),
}

# encoder lookup arrays: symbol byte → (code, length)


def _enc_arrays(enc: dict) -> tuple[np.ndarray, np.ndarray]:
    code = np.zeros(256, dtype=np.uint32)
    ln = np.zeros(256, dtype=np.uint8)
    for v, (c, l) in enc.items():
        code[v] = c
        ln[v] = l
    return code, ln


_EARR = {
    "dcl": _enc_arrays(_ENC_DC_L), "dcc": _enc_arrays(_ENC_DC_C),
    "acl": _enc_arrays(_ENC_AC_L), "acc": _enc_arrays(_ENC_AC_C),
}


# --- color -----------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(yc: np.ndarray) -> np.ndarray:
    y = yc[..., 0]
    cb = yc[..., 1] - 128.0
    cr = yc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --- bit writer (vectorized) ----------------------------------------------

_MAXB = 32


def _pack_symbols(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """Variable-length codes → stuffed entropy bytes, via a bit matrix."""
    n = len(codes)
    if n == 0:
        return b""
    j = np.arange(_MAXB, dtype=np.uint32)
    shifts = lengths[:, None].astype(np.int64) - 1 - j[None, :]
    bits = np.where(shifts >= 0,
                    (codes[:, None].astype(np.uint64) >> np.maximum(shifts, 0).astype(np.uint64)) & np.uint64(1),
                    np.uint64(0)).astype(np.uint8)
    valid = shifts >= 0
    flat = bits[valid]  # row-major: symbols in order, MSB first
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, dtype=np.uint8)])  # 1-pad
    by = np.packbits(flat)
    # byte stuffing: 0xFF → 0xFF 0x00
    ff = np.nonzero(by == 0xFF)[0]
    if len(ff):
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


def _mag_cat(v: np.ndarray) -> np.ndarray:
    """JPEG magnitude category (number of bits)."""
    a = np.abs(v).astype(np.int64)
    cat = np.zeros(len(v), dtype=np.int64)
    nz = a > 0
    cat[nz] = np.floor(np.log2(a[nz])).astype(np.int64) + 1
    return cat


def _mag_bits(v: np.ndarray, cat: np.ndarray) -> np.ndarray:
    """Ones-complement magnitude bits (as unsigned ints of `cat` bits)."""
    v = v.astype(np.int64)
    return np.where(v >= 0, v, v + (1 << cat) - 1).astype(np.uint32)


# --- encoder ---------------------------------------------------------------

def _entropy_encode(zz: np.ndarray, nblocks: int) -> bytes:
    """Fully vectorized entropy stage: all (3 × nblocks) coding units' DC
    diffs, AC run-lengths (incl. ZRL expansion), magnitudes and EOBs are
    computed as flat arrays and ordered by a single lexsort — no per-block
    Python loop."""
    # MCU-interleaved unit order: u = b*3 + ci
    nu = 3 * nblocks
    units = zz.transpose(1, 0, 2).reshape(nu, 64)  # (unit, coeff)
    ci_of = np.tile(np.arange(3), nblocks)
    is_l = ci_of == 0

    # --- DC ---
    dc = units[:, 0].astype(np.int64)
    prev = np.zeros(nu, dtype=np.int64)
    prev[3:] = dc[:-3]
    diff = dc - prev
    dcat = _mag_cat(diff)
    dsym_code = np.where(is_l, _EARR["dcl"][0][dcat], _EARR["dcc"][0][dcat]).astype(np.uint32)
    dsym_len = np.where(is_l, _EARR["dcl"][1][dcat], _EARR["dcc"][1][dcat]).astype(np.int64)
    dmag_code = _mag_bits(diff, dcat)
    # entries: (unit, pos=-2, sym), (unit, pos=-1, mag[len may be 0])
    dc_codes = np.concatenate([dsym_code, dmag_code])
    dc_lens = np.concatenate([dsym_len, dcat])
    dc_unit = np.concatenate([np.arange(nu), np.arange(nu)])
    dc_pos = np.concatenate([np.full(nu, -2), np.full(nu, -1)])

    # --- AC ---
    ac = units[:, 1:]
    u_nz, p_nz = np.nonzero(ac)
    vals = ac[u_nz, p_nz].astype(np.int64)
    cats = _mag_cat(vals)
    same = np.zeros(len(u_nz), dtype=bool)
    same[1:] = u_nz[1:] == u_nz[:-1]
    prevp = np.full(len(u_nz), -1, dtype=np.int64)
    prevp[1:] = np.where(same[1:], p_nz[:-1], -1)
    runs = p_nz - prevp - 1
    nzrl = runs // 16
    rem = runs % 16
    sym = (rem << 4) | cats
    acode_l, alen_l = _EARR["acl"]
    acode_c, alen_c = _EARR["acc"]
    nz_is_l = is_l[u_nz]
    scode = np.where(nz_is_l, acode_l[sym], acode_c[sym]).astype(np.uint32)
    slen = np.where(nz_is_l, alen_l[sym], alen_c[sym]).astype(np.int64)
    mcode = _mag_bits(vals, cats)
    # per nonzero: nzrl ZRL entries + sym + mag → expand via repeat
    per = nzrl + 2
    tot = int(per.sum())
    eu = np.repeat(u_nz, per)
    # within-nonzero order index 0..per-1
    off = np.concatenate([[0], np.cumsum(per)[:-1]])
    k_in = np.arange(tot) - np.repeat(off, per)
    # position key: (p_nz * 4) + slotid keeps entries of one nonzero adjacent
    # and in order, and distinct nonzeros ordered by position
    base_pos = np.repeat(p_nz, per)
    slot = np.where(k_in == per.repeat(per) - 1, 2,
                    np.where(k_in == per.repeat(per) - 2, 1, 0))
    epos = base_pos * 4 + slot + np.where(slot == 0, k_in, 0) * 0
    zrl_code_l, zrl_len_l = int(acode_l[0xF0]), int(alen_l[0xF0])
    zrl_code_c, zrl_len_c = int(acode_c[0xF0]), int(alen_c[0xF0])
    e_is_l = is_l[eu]
    ecodes = np.where(slot == 0,
                      np.where(e_is_l, zrl_code_l, zrl_code_c),
                      np.where(slot == 1, np.repeat(scode, per), np.repeat(mcode, per))).astype(np.uint32)
    elens = np.where(slot == 0,
                     np.where(e_is_l, zrl_len_l, zrl_len_c),
                     np.where(slot == 1, np.repeat(slen, per), np.repeat(cats, per))).astype(np.int64)
    # ZRL entries of one nonzero share base_pos*4+0 — order among them is
    # irrelevant (identical symbols), lexsort is stable so k_in order holds

    # --- EOB: units whose last nonzero < 62 (or none) ---
    last = np.full(nu, -1, dtype=np.int64)
    np.maximum.at(last, u_nz, p_nz)
    need = last < 62
    eob_u = np.nonzero(need)[0]
    eob_code = np.where(is_l[eob_u], acode_l[0x00], acode_c[0x00]).astype(np.uint32)
    eob_len = np.where(is_l[eob_u], alen_l[0x00], alen_c[0x00]).astype(np.int64)

    all_codes = np.concatenate([dc_codes, ecodes, eob_code])
    all_lens = np.concatenate([dc_lens, elens, eob_len])
    all_unit = np.concatenate([dc_unit, eu, eob_u])
    all_pos = np.concatenate([dc_pos, epos, np.full(len(eob_u), 10_000)])
    order = np.lexsort((all_pos, all_unit))
    return _pack_symbols(all_codes[order], all_lens[order])


def encode_jpeg(pixels: np.ndarray, quality: int = 97) -> bytes:
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("RGB only")
    ql = _scaled_q(QL_BASE, quality)
    qc = _scaled_q(QC_BASE, quality)

    hp = (h + 7) // 8 * 8
    wp = (w + 7) // 8 * 8
    padded = np.pad(pixels, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    yc = _rgb_to_ycbcr(padded) - 128.0
    nby, nbx = hp // 8, wp // 8
    nblocks = nby * nbx
    # (comp, nblocks, 8, 8)
    comps = np.stack([
        yc[..., ci].reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(nblocks, 8, 8)
        for ci in range(3)])
    coef = np.einsum("ij,cbjk,kl->cbil", _D, comps, _DT)
    q = np.stack([ql, qc, qc]).astype(np.float64)
    quant = np.round(coef / q[:, None, :, :]).astype(np.int32)
    zz = quant.reshape(3, nblocks, 64)[:, :, ZIGZAG]
    entropy = _entropy_encode(zz, nblocks)

    # --- markers ---
    out = bytearray()
    out += b"\xFF\xD8"                               # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q8 in ((0, ql), (1, qc)):               # DQT
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q8.reshape(64)[ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">H", 17) + b"\x08"     # SOF0
    out += struct.pack(">HH", h, w) + b"\x03"
    out += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, bits, vals in ((0x00, DC_L_BITS, DC_L_VALS), (0x01, DC_C_BITS, DC_C_VALS),
                              (0x10, AC_L_BITS, AC_L_VALS), (0x11, AC_C_BITS, AC_C_VALS)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits[1:17]) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">H", 12) + b"\x03"     # SOS
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3F\x00"
    out += entropy
    out += b"\xFF\xD9"                               # EOI
    return bytes(out)


# --- batched encoder -------------------------------------------------------

def _headers(h: int, w: int, ql: np.ndarray, qc: np.ndarray) -> bytes:
    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q8 in ((0, ql), (1, qc)):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q8.reshape(64)[ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">H", 17) + b"\x08"
    out += struct.pack(">HH", h, w) + b"\x03"
    out += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    for tc_th, bits, vals in ((0x00, DC_L_BITS, DC_L_VALS), (0x01, DC_C_BITS, DC_C_VALS),
                              (0x10, AC_L_BITS, AC_L_VALS), (0x11, AC_C_BITS, AC_C_VALS)):
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) + bytes([tc_th])
        out += bytes(bits[1:17]) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">H", 12) + b"\x03"
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3F\x00"
    return bytes(out)


def encode_jpeg_batch(images: list[np.ndarray], quality: int = 97) -> list[bytes]:
    """Batch encoder: DCT/quant/entropy symbol generation run ONCE over the
    concatenated blocks of every image; only header assembly and the final
    per-image bit packing stay per image.  Byte-identical to
    :func:`encode_jpeg` per image."""
    if not images:
        return []
    ql = _scaled_q(QL_BASE, quality)
    qc = _scaled_q(QC_BASE, quality)
    qf = np.stack([ql, qc, qc]).astype(np.float64)

    # Blockify grouped by exact (h, w) so the pad / colorspace / block
    # reshuffle run once per distinct shape instead of once per image —
    # tiny-image batches are dominated by fixed numpy-call overhead
    # otherwise.  Unit order per image is unchanged (block row-major, Y/Cb/Cr
    # interleaved), so the output stays byte-identical to the scalar encoder.
    n_img = len(images)
    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, px in enumerate(images):
        by_shape.setdefault((px.shape[0], px.shape[1]), []).append(i)
    per_img_blocks: list = [None] * n_img
    per_img_nb = np.empty(n_img, dtype=np.int64)
    dims = [(px.shape[0], px.shape[1]) for px in images]
    for (h, w), idxs in by_shape.items():
        stack = np.stack([images[i] for i in idxs]).astype(np.uint8, copy=False)
        hp, wp = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        padded = np.pad(stack, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                        mode="edge")
        yc = _rgb_to_ycbcr(padded) - 128.0              # (g, hp, wp, 3)
        nby, nbx = hp // 8, wp // 8
        nb = nby * nbx
        g = len(idxs)
        inter = (yc.transpose(0, 3, 1, 2)               # (g, 3, hp, wp)
                 .reshape(g, 3, nby, 8, nbx, 8)
                 .transpose(0, 2, 4, 1, 3, 5)           # (g, nby, nbx, 3, 8, 8)
                 .reshape(g, 3 * nb, 8, 8))
        for j, i in enumerate(idxs):
            per_img_blocks[i] = inter[j]
            per_img_nb[i] = nb

    allb = np.concatenate(per_img_blocks)               # (U, 8, 8)
    img_units = (3 * per_img_nb).tolist()
    ci_of = np.tile(np.arange(3), int(per_img_nb.sum()))
    coef = np.einsum("ij,ujk,kl->uil", _D, allb, _DT)
    quant = np.round(coef / qf[ci_of]).astype(np.int32)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]

    nu = len(zz)
    ubounds = np.concatenate([[0], np.cumsum(img_units)])
    img_of = np.repeat(np.arange(len(images)), img_units)
    is_l = ci_of == 0

    # DC diffs (reset at image starts; previous same-component unit is u-3)
    dc = zz[:, 0].astype(np.int64)
    prev = np.zeros(nu, dtype=np.int64)
    prev[3:] = dc[:-3]
    first3 = np.zeros(nu, dtype=bool)
    for s in ubounds[:-1]:
        first3[s:s + 3] = True
    prev[first3] = 0
    diff = dc - prev
    dcat = _mag_cat(diff)
    dsym_code = np.where(is_l, _EARR["dcl"][0][dcat], _EARR["dcc"][0][dcat]).astype(np.uint32)
    dsym_len = np.where(is_l, _EARR["dcl"][1][dcat], _EARR["dcc"][1][dcat]).astype(np.int64)
    dmag_code = _mag_bits(diff, dcat)
    dc_codes = np.concatenate([dsym_code, dmag_code])
    dc_lens = np.concatenate([dsym_len, dcat])
    dc_unit = np.concatenate([np.arange(nu), np.arange(nu)])
    dc_pos = np.concatenate([np.full(nu, -2), np.full(nu, -1)])

    ac = zz[:, 1:]
    u_nz, p_nz = np.nonzero(ac)
    vals = ac[u_nz, p_nz].astype(np.int64)
    cats = _mag_cat(vals)
    same = np.zeros(len(u_nz), dtype=bool)
    same[1:] = u_nz[1:] == u_nz[:-1]
    prevp = np.full(len(u_nz), -1, dtype=np.int64)
    prevp[1:] = np.where(same[1:], p_nz[:-1], -1)
    runs = p_nz - prevp - 1
    nzrl = runs // 16
    rem = runs % 16
    sym = (rem << 4) | cats
    acode_l, alen_l = _EARR["acl"]
    acode_c, alen_c = _EARR["acc"]
    nz_is_l = is_l[u_nz]
    scode = np.where(nz_is_l, acode_l[sym], acode_c[sym]).astype(np.uint32)
    slen = np.where(nz_is_l, alen_l[sym], alen_c[sym]).astype(np.int64)
    mcode = _mag_bits(vals, cats)
    per = nzrl + 2
    tot = int(per.sum())
    eu = np.repeat(u_nz, per)
    off = np.concatenate([[0], np.cumsum(per)[:-1]])
    k_in = np.arange(tot) - np.repeat(off, per)
    per_rep = np.repeat(per, per)
    base_pos = np.repeat(p_nz, per)
    slot = np.where(k_in == per_rep - 1, 2, np.where(k_in == per_rep - 2, 1, 0))
    epos = base_pos * 4 + slot
    e_is_l = is_l[eu]
    ecodes = np.where(slot == 0,
                      np.where(e_is_l, int(acode_l[0xF0]), int(acode_c[0xF0])),
                      np.where(slot == 1, np.repeat(scode, per), np.repeat(mcode, per))).astype(np.uint32)
    elens = np.where(slot == 0,
                     np.where(e_is_l, int(alen_l[0xF0]), int(alen_c[0xF0])),
                     np.where(slot == 1, np.repeat(slen, per), np.repeat(cats, per))).astype(np.int64)

    last = np.full(nu, -1, dtype=np.int64)
    np.maximum.at(last, u_nz, p_nz)
    need = last < 62
    eob_u = np.nonzero(need)[0]
    eob_code = np.where(is_l[eob_u], acode_l[0x00], acode_c[0x00]).astype(np.uint32)
    eob_len = np.where(is_l[eob_u], alen_l[0x00], alen_c[0x00]).astype(np.int64)

    all_codes = np.concatenate([dc_codes, ecodes, eob_code])
    all_lens = np.concatenate([dc_lens, elens, eob_len])
    all_unit = np.concatenate([dc_unit, eu, eob_u])
    all_pos = np.concatenate([dc_pos, epos, np.full(len(eob_u), 10_000)])
    order = np.lexsort((all_pos, all_unit))
    codes = all_codes[order]
    lens = all_lens[order]
    unit_sorted = all_unit[order]

    # variable-length bit unpack: explode each symbol to exactly its own
    # ``lens`` bits (not a dense n×MAXB matrix — that form streamed ~5×
    # more memory and was bandwidth-bound).  int32 throughout: codes are
    # ≤ 26 bits and total bit counts stay far below 2^31 per batch.
    lens32 = lens.astype(np.int32)
    total_bits = int(lens32.sum())
    starts = (np.cumsum(lens32, dtype=np.int64) - lens32).astype(np.int32)
    pos_in = np.arange(total_bits, dtype=np.int32) - np.repeat(starts, lens32)
    shift = np.repeat(lens32, lens32) - 1 - pos_in
    flat = ((np.repeat(codes.astype(np.int32), lens32) >> shift) & 1).astype(np.uint8)
    sym_img = img_of[unit_sorted]
    bits_per_img = np.bincount(sym_img, weights=lens, minlength=len(images)).astype(np.int64)
    bbounds = np.concatenate([[0], np.cumsum(bits_per_img)])

    out = []
    for i, (h, w) in enumerate(dims):
        seg = flat[bbounds[i]:bbounds[i + 1]]
        pad = (-len(seg)) % 8
        if pad:
            seg = np.concatenate([seg, np.ones(pad, dtype=np.uint8)])
        by = np.packbits(seg)
        ff = np.nonzero(by == 0xFF)[0]
        if len(ff):
            by = np.insert(by, ff + 1, 0)
        out.append(_headers(h, w, ql, qc) + by.tobytes() + b"\xFF\xD9")
    return out


# --- decoder ---------------------------------------------------------------

class _BitReader:
    __slots__ = ("data", "n", "pos", "acc", "nbits")

    def __init__(self, data: np.ndarray):
        # pre-destuffed byte array
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            b = int(self.data[self.pos]) if self.pos < self.n else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int):
        self.nbits -= k

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill()
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        return v


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg_batch(datas: list[bytes]) -> list[np.ndarray]:
    """Batch decoder: the (inherently sequential) Huffman pass runs per
    image, but dequantization, IDCT and the color transform run ONCE over
    the concatenated blocks of the whole batch."""
    parsed = [_parse_and_huffman(d) for d in datas]
    if not parsed:
        return []
    blocks = np.concatenate([p[2] for p in parsed])  # (units, 64) zigzag
    qs = np.concatenate([np.tile(np.stack(p[3]).astype(np.float64),
                                 (p[2].shape[0] // 3, 1, 1)) for p in parsed])
    dez = np.zeros_like(blocks, dtype=np.float64)
    dez[:, ZIGZAG] = blocks
    dq = dez.reshape(-1, 8, 8) * qs
    spat = np.einsum("ij,ujk,kl->uil", _DT, dq, _D) + 128.0
    out = []
    u0 = 0
    for (h, w, coeffs, _q) in parsed:
        nb = coeffs.shape[0] // 3
        hp, wp = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        nby, nbx = hp // 8, wp // 8
        # units were interleaved (b, ci) — undo
        sp = spat[u0:u0 + 3 * nb].reshape(nb, 3, 8, 8).transpose(1, 0, 2, 3)
        u0 += 3 * nb
        yc = np.empty((hp, wp, 3))
        for ci in range(3):
            yc[..., ci] = sp[ci].reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(hp, wp)
        out.append(_ycbcr_to_rgb(yc)[:h, :w])
    return out


def _parse_and_huffman(data: bytes):
    """Markers + entropy decode only → (h, w, coeffs, qtabs_per_comp).
    ``coeffs`` is (units = nb*3 interleaved, 64) zigzag-order int32."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    h = w = None
    comp_q: dict[int, int] = {}
    comp_h: dict[int, tuple[int, int]] = {}
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                tid = seg[off] & 0x0F
                tab = np.frombuffer(seg[off + 1:off + 65], dtype=np.uint8).astype(np.int32)
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tab
                qtabs[tid] = q.reshape(8, 8)
                off += 65
        elif marker == 0xC0:
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i: 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 supported")
                comp_q[cid] = qid
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = [0] + list(seg[off + 1: off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17: off + 17 + nv])
                _, dec = (lambda e_d: e_d)(_build_codes(bits, vals))
                htabs[tc_th] = _fast_table(dec)
                off += 17 + nv
        elif marker == 0xDA:
            ns = seg[0]
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                comp_h[cid] = (tabs >> 4, tabs & 0x0F)
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if scan_start is None or h is None:
        raise ValueError("incomplete JPEG")

    # entropy segment runs to EOI; de-stuff.  (numpy scan instead of
    # bytes.rfind so zero-copy memoryview payloads — Arrow binary-buffer
    # slices from the actor stage — decode without a bytes() copy)
    raw_all = np.frombuffer(data, dtype=np.uint8)
    eoi = np.flatnonzero((raw_all[:-1] == 0xFF) & (raw_all[1:] == 0xD9))
    end = int(eoi[-1]) if len(eoi) else -1
    raw = raw_all[scan_start:end]
    ff = np.nonzero((raw[:-1] == 0xFF) & (raw[1:] == 0x00))[0]
    destuffed = np.delete(raw, ff + 1) if len(ff) else raw

    hp = (h + 7) // 8 * 8
    wp = (w + 7) // 8 * 8
    nby, nbx = hp // 8, wp // 8
    nblocks = nby * nbx
    coeffs = np.zeros((3, nblocks, 64), dtype=np.int32)
    dc_prev = [0, 0, 0]
    cids = [1, 2, 3]
    # inlined bit reader: python-int accumulator, lists for table lookups
    # (ndarray scalar indexing is ~3x slower per access than list indexing)
    tabs = []
    for ci in range(3):
        dcid, acid = comp_h[cids[ci]]
        dval, dlen = htabs[0x00 | dcid]
        aval, alen = htabs[0x10 | acid]
        tabs.append((dval.tolist(), dlen.tolist(), aval.tolist(), alen.tolist()))
    data_l = destuffed.tolist()
    ndata = len(data_l)
    acc = 0
    nbits = 0
    pos = 0
    cf = coeffs.reshape(3, nblocks * 64)
    for b in range(nblocks):
        b64 = b * 64
        for ci in range(3):
            dval, dlen, aval, alen = tabs[ci]
            if nbits < 16:
                while nbits <= 24:
                    acc = ((acc << 8) | (data_l[pos] if pos < ndata else 0)) & 0xFFFFFFFF
                    pos += 1
                    nbits += 8
            p = (acc >> (nbits - 16)) & 0xFFFF
            cat = dval[p]
            nbits -= dlen[p]
            if cat:
                if nbits < cat:
                    while nbits <= 24:
                        acc = ((acc << 8) | (data_l[pos] if pos < ndata else 0)) & 0xFFFFFFFF
                        pos += 1
                        nbits += 8
                v = (acc >> (nbits - cat)) & ((1 << cat) - 1)
                nbits -= cat
                diff = v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
            else:
                diff = 0
            dc_prev[ci] += diff
            row = cf[ci]
            row[b64] = dc_prev[ci]
            k = 1
            while k < 64:
                if nbits < 16:
                    while nbits <= 24:
                        acc = ((acc << 8) | (data_l[pos] if pos < ndata else 0)) & 0xFFFFFFFF
                        pos += 1
                        nbits += 8
                p = (acc >> (nbits - 16)) & 0xFFFF
                sym = aval[p]
                nbits -= alen[p]
                if sym == 0x00:   # EOB
                    break
                cat = sym & 0x0F
                if cat == 0:
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    break
                k += sym >> 4
                if k > 63:
                    raise ValueError("AC overflow")
                if nbits < cat:
                    while nbits <= 24:
                        acc = ((acc << 8) | (data_l[pos] if pos < ndata else 0)) & 0xFFFFFFFF
                        pos += 1
                        nbits += 8
                v = (acc >> (nbits - cat)) & ((1 << cat) - 1)
                nbits -= cat
                row[b64 + k] = v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
                k += 1

    # interleaved (b, ci) unit order, zigzag coefficients
    units = coeffs.transpose(1, 0, 2).reshape(3 * nblocks, 64)
    qt = tuple(qtabs[comp_q[cid]] for cid in cids)
    return h, w, units, qt


def decode_jpeg(data: bytes) -> np.ndarray:
    return decode_jpeg_batch([data])[0]
