"""Minimal pure-Python PNG codec + perceptual hash + PSNR.

The sandbox has no PIL/opencv, so the image payload path
(image_id, bytes, w, h, fmt, caption, phash) is made *real* with a
self-contained RGB8 PNG encoder/decoder built on stdlib zlib. JPEG/WebP
decode is stubbed (see operators/multimodal.py) — the Spark plumbing
(schema, batching, UDF signature) is identical for all formats.

The perceptual hash is the classic DCT pHash: downsample to 32x32 gray,
2-D DCT-II, take the 8x8 low-frequency block, threshold at its median →
64 bits packed into a signed int64.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = cur.astype(np.int32)
    n = len(cur)
    if ftype == 0:
        return cur.copy()
    if ftype == 2:  # up
        return ((out + prev) & 0xFF).astype(np.uint8)
    res = np.zeros(n, np.uint8)
    for i in range(n):
        a = int(res[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        if ftype == 1:
            v = out[i] + a
        elif ftype == 3:
            v = out[i] + ((a + b) >> 1)
        else:  # 4: Paeth
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = out[i] + pred
        res[i] = v & 0xFF
    return res


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by :func:`encode_png` (handles all five
    scanline filters for robustness) → (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    img = np.zeros((h, w * 3), np.uint8)
    prev = np.zeros(w * 3, np.uint8)
    for y in range(h):
        row = np.frombuffer(raw[y * stride : (y + 1) * stride], np.uint8)
        line = _unfilter(int(row[0]), row[1:], prev, 3)
        img[y] = line
        prev = line
    return img.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# perceptual hash + quality metric
# ---------------------------------------------------------------------------

_DCT_CACHE: dict = {}


def _dct_matrix(n: int = 32) -> np.ndarray:
    # cache keyed by n — a single global would hand an n=8 caller the
    # previously-built 32x32 matrix
    m = _DCT_CACHE.get(n)
    if m is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
        m[0] /= np.sqrt(2.0)
        _DCT_CACHE[n] = m
    return m


def _resize_gray(gray: np.ndarray, n: int = 32) -> np.ndarray:
    # simple area-style resampling via index mapping (deterministic, no deps)
    h, w = gray.shape
    ys = (np.arange(n) * h // n).clip(0, h - 1)
    xs = (np.arange(n) * w // n).clip(0, w - 1)
    return gray[np.ix_(ys, xs)]


def phash64(rgb: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) uint8 image → signed i64."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_gray(gray, 32)
    m = _dct_matrix(32)
    freq = m @ small @ m.T
    block = freq[:8, :8].flatten()
    med = np.median(block)
    bits = (block > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)
