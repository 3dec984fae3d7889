"""Minimal pure-Python baseline JPEG (JFIF) codec.

Unstubs the dominant real-corpus image format in the payload pipeline
(operators/multimodal.py — a 100-TB web image corpus is overwhelmingly
JPEG; previously only PNG decode was real).  Same philosophy as png.py:
the sandbox has no PIL/libjpeg, so the codec is self-contained
numpy/stdlib, built from the public ITU-T T.81 spec:

* **Encoder** — baseline sequential DCT, 8-bit, 4:4:4 or 4:2:0, the
  Annex K quantization tables scaled with the libjpeg quality curve and
  the Annex K "typical" Huffman tables.  Vectorized per-plane (blockize →
  orthonormal DCT-II via one einsum → quantize); only the entropy coder
  is a per-block Python loop.
* **Decoder** — baseline SOF0 with arbitrary sampling factors up to
  2×2 (covers 4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT segments,
  restart intervals (DRI/RSTn), APPn/COM skipping.  Huffman decoding is
  the sequential T.81 DECODE procedure; everything after (dequantize →
  IDCT → plane assembly → chroma upsample → YCbCr→RGB) is vectorized
  across all blocks at once.

* **Progressive (SOF2)** — full Annex G Huffman progressive: spectral
  selection + successive approximation, DC/AC first and refinement
  scans, interleaved DC scans, EOBRUN, restart markers.  The encoder
  (``encode_jpeg_progressive``) emits libjpeg's "simple progression"
  scan script with per-scan frequency-optimized Huffman tables (the
  Annex K baseline tables lack the EOBn symbols progressive AC scans
  need), so the fixtures exercise the same scan shapes real encoders
  produce.  Web JPEG corpora are roughly half progressive — without
  this the image plane could only ingest baseline streams.

Arithmetic coding, hierarchical (SOF5-7/13-15) and 12-bit streams are
rejected with a clear error — they route to the honest stub path in
multimodal.decode_rgb.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# zigzag[i] = raster index of the i-th coefficient in zigzag order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# (bits-per-length[1..16], symbol values) — Annex K.3
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: F = A @ f @ A.T."""
    n = 8
    a = np.zeros((n, n))
    for u in range(n):
        c = np.sqrt(1.0 / n) if u == 0 else np.sqrt(2.0 / n)
        for x in range(n):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / (2 * n))
    return a


_A = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality curve: scale=5000/q (q<50) else 200-2q."""
    q = min(max(int(quality), 1), 100)
    s = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (STD_LUMA_Q, STD_CHROMA_Q):
        t = np.clip((base * s + 50) // 100, 1, 255)
        out.append(t.astype(np.int64))
    return out[0], out[1]


def _build_codes(spec) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, length)."""
    bits, vals = spec
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) per T.81 F.1.2.1: value → category + appended bits."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _blockize(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (H//8 * W//8, 8, 8) in raster-block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantized_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    blocks = _blockize(_pad_to(plane, 8)) - 128.0
    coefs = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    # round-half-away like libjpeg (np.round is half-even)
    q = np.floor(np.abs(coefs) / qtab + 0.5) * np.sign(coefs)
    return q.astype(np.int64)


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 array as baseline JFIF.

    ``subsample=False`` → 4:4:4; ``True`` → 4:2:0 (2×2 chroma average).
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs (real
    encoders use these for error resilience; exercised by the decoder's
    restart path).  ``grayscale`` emits a 1-component (Y-only) stream.
    """
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    qy, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(rgb)
    yp, cbp, crp = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if grayscale:
        subsample = False
    if subsample:
        H = V = 2
        yp = _pad_to(yp, 16)
        cb2 = _pad_to(cbp, 2)
        cr2 = _pad_to(crp, 2)
        cbp = cb2.reshape(cb2.shape[0] // 2, 2, cb2.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = cr2.reshape(cr2.shape[0] // 2, 2, cr2.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        H = V = 1
    yq = _quantized_blocks(yp, qy)
    if not grayscale:
        cbq = _quantized_blocks(cbp, qc)
        crq = _quantized_blocks(crp, qc)

    yw = _pad_to(yp, 8 * H).shape[1] // 8  # luma blocks per row
    cw = _pad_to(cbp, 8).shape[1] // 8
    mcus_x = yw // H
    mcus_y = (_pad_to(yp, 8 * V).shape[0] // 8) // V

    dc_y = _build_codes(DC_LUMA_SPEC)
    ac_y = _build_codes(AC_LUMA_SPEC)
    dc_c = _build_codes(DC_CHROMA_SPEC)
    ac_c = _build_codes(AC_CHROMA_SPEC)

    bw = _BitWriter()
    pred = [0, 0, 0]

    def put_block(zz: np.ndarray, ci: int, dc_codes, ac_codes) -> None:
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s, bits = _magnitude(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(bits, s)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
                    return
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(bits, s)
            run = 0

    yzz = yq.reshape(-1, 64)[:, ZIGZAG]
    if not grayscale:
        cbzz = cbq.reshape(-1, 64)[:, ZIGZAG]
        crzz = crq.reshape(-1, 64)[:, ZIGZAG]
    rst = 0
    for mcu in range(mcus_y * mcus_x):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred[0] = pred[1] = pred[2] = 0
        my, mx = divmod(mcu, mcus_x)
        for by in range(V):
            for bx in range(H):
                put_block(yzz[(my * V + by) * yw + mx * H + bx], 0, dc_y, ac_y)
        if not grayscale:
            put_block(cbzz[my * cw + mx], 1, dc_c, ac_c)
            put_block(crzz[my * cw + mx], 2, dc_c, ac_c)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in tab.reshape(64)[ZIGZAG]))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    if grayscale:
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        sof = seg(
            0xFFC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, (H << 4) | V, 0])  # Y
            + bytes([2, 0x11, 1])          # Cb
            + bytes([3, 0x11, 1]),         # Cr
        )
        sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    chroma = b"" if grayscale else (
        dqt(1, qc) + b""
    )
    chroma_dht = b"" if grayscale else (
        dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)
    )
    return (
        b"\xff\xd8" + app0 + dqt(0, qy) + chroma + dri
        + sof
        + dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
        + chroma_dht
        + sos + bytes(bw.out) + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G, Huffman)
# ---------------------------------------------------------------------------
#
# Scan tokens are built first as ("s", symbol) / ("b", value, nbits)
# tuples, then serialized in a second pass with a Huffman table built
# from the scan's own symbol frequencies — the same two-pass shape as
# libjpeg's entropy optimizer, and required in practice: progressive AC
# scans emit EOBn symbols (0x10..0xE0) that the Annex K baseline tables
# do not define at all.


def _huff_spec_from_freqs(freqs: dict[int, int]):
    """Frequency-optimal canonical Huffman limited to 16-bit codes,
    per the T.81 K.2 / libjpeg ``jpeg_gen_optimal_table`` procedure
    (incl. the reserved dummy symbol that keeps the all-ones code
    unassigned).  Returns an Annex-K-style (bits[16], vals) spec."""
    freq = [0] * 257
    for sym, f in freqs.items():
        freq[sym] = f
    freq[256] = 1  # dummy: guarantees no real symbol gets all-1s
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if freq[i] and (v is None or freq[i] <= v):
                v, c1 = freq[i], i
        c2, v = -1, None
        for i in range(257):
            if freq[i] and i != c1 and (v is None or freq[i] <= v):
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for i in range(32, 16, -1):  # depth-limit to 16 (K.2 figure K.3)
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the dummy's (longest) code
    vals = [s for s in sorted(range(256), key=lambda s: (codesize[s], s)) if codesize[s]]
    return bits[1:17], vals


def _tok_dc_first(blocks_list: list[np.ndarray], al: int) -> list:
    """Interleaved first DC scan: diff-coded DC in the point-transformed
    domain (arithmetic shift — G.1.2.1)."""
    toks = []
    preds = [0] * len(blocks_list)
    for bi in range(blocks_list[0].shape[0]):
        for ci, blocks in enumerate(blocks_list):
            v = int(blocks[bi][0]) >> al
            diff = v - preds[ci]
            preds[ci] = v
            s, bits = _magnitude(diff)
            toks.append(("s", s))
            if s:
                toks.append(("b", bits, s))
    return toks


def _tok_dc_refine(blocks_list: list[np.ndarray], al: int) -> list:
    """DC refinement: one raw bit per block (no Huffman symbols)."""
    toks = []
    for bi in range(blocks_list[0].shape[0]):
        for blocks in blocks_list:
            toks.append(("b", (int(blocks[bi][0]) >> al) & 1, 1))
    return toks


def _tok_ac_first(blocks: np.ndarray, ss: int, se: int, al: int) -> list:
    """First AC scan for one band: run/size coding with EOBn run
    accumulation across all-zero bands (G.1.2.2)."""
    toks = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            toks.append(("s", nb << 4))
            if nb:
                toks.append(("b", eobrun & ((1 << nb) - 1), nb))
            eobrun = 0

    for bi in range(blocks.shape[0]):
        zz = blocks[bi]
        r = 0
        for k in range(ss, se + 1):
            c = int(zz[k])
            t = abs(c) >> al
            if t == 0:
                r += 1
                continue
            while r > 15:
                flush_eob()
                toks.append(("s", 0xF0))
                r -= 16
            flush_eob()
            s, bits = _magnitude(t if c > 0 else -t)
            toks.append(("s", (r << 4) | s))
            toks.append(("b", bits, s))
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return toks


def _tok_ac_refine(blocks: np.ndarray, ss: int, se: int, al: int) -> list:
    """AC refinement scan (G.1.2.3): newly-significant coefficients get
    run/1 symbols + a sign bit; already-nonzero coefficients contribute
    correction bits that ride after the next symbol (or after the EOBn
    symbol when the block joins an EOB run) — libjpeg's
    ``encode_mcu_AC_refine`` emission order exactly."""
    toks = []
    eobrun = 0
    be: list[int] = []  # correction bits buffered across the EOB run

    def emit_eobrun():
        nonlocal eobrun, be
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            toks.append(("s", nb << 4))
            if nb:
                toks.append(("b", eobrun & ((1 << nb) - 1), nb))
            eobrun = 0
            for b in be:
                toks.append(("b", b, 1))
            be = []

    for bi in range(blocks.shape[0]):
        zz = blocks[bi]
        absv = [0] * (se + 1)
        eobpos = ss - 1  # last newly-significant index in this block
        for k in range(ss, se + 1):
            t = abs(int(zz[k])) >> al
            absv[k] = t
            if t == 1:
                eobpos = k
        r = 0
        br: list[int] = []  # correction bits for the current run
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                emit_eobrun()
                toks.append(("s", 0xF0))
                r -= 16
                for b in br:
                    toks.append(("b", b, 1))
                br = []
            if t > 1:  # history-nonzero: correction bit, run unbroken
                br.append(t & 1)
                continue
            emit_eobrun()
            toks.append(("s", (r << 4) | 1))
            toks.append(("b", 1 if int(zz[k]) > 0 else 0, 1))
            for b in br:
                toks.append(("b", b, 1))
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()
    return toks


def _serialize_scan(toks: list):
    """Tokens → (huff spec or None, entropy-coded bytes)."""
    freqs: dict[int, int] = {}
    for t in toks:
        if t[0] == "s":
            freqs[t[1]] = freqs.get(t[1], 0) + 1
    spec = _huff_spec_from_freqs(freqs) if freqs else None
    codes = _build_codes(spec) if spec else None
    bw = _BitWriter()
    for t in toks:
        if t[0] == "s":
            code, ln = codes[t[1]]
            bw.write(code, ln)
        else:
            bw.write(t[1], t[2])
    bw.flush()
    return spec, bytes(bw.out)


def encode_jpeg_progressive(
    rgb: np.ndarray, quality: int = 90, grayscale: bool = False
) -> bytes:
    """Encode (h, w, 3) uint8 as progressive JFIF (SOF2), 4:4:4.

    Uses libjpeg's "simple progression" script: a point-transformed DC
    scan, banded AC first scans at successive-approximation shifts, then
    AC and DC refinement scans — so the stream exercises every Annex G
    decode path (EOBn runs, ZRL-in-refinement, correction bits, sign
    bits).  The quantized coefficients are identical to
    :func:`encode_jpeg` at the same quality, so baseline and progressive
    encodes of the same pixels decode bit-identically."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    qy, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(rgb)
    if grayscale:
        planes, qts = [ycc[..., 0]], [qy]
    else:
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [qy, qc, qc]
    blocks = [
        _quantized_blocks(p, qt).reshape(-1, 64)[:, ZIGZAG]
        for p, qt in zip(planes, qts)
    ]

    # (kind, comp indices, Ss, Se, Ah, Al) — libjpeg simple progression
    if grayscale:
        scans = [
            ("dc_first", [0], 0, 0, 0, 1),
            ("ac_first", [0], 1, 63, 0, 1),
            ("dc_refine", [0], 0, 0, 1, 0),
            ("ac_refine", [0], 1, 63, 1, 0),
        ]
    else:
        scans = [
            ("dc_first", [0, 1, 2], 0, 0, 0, 1),
            ("ac_first", [0], 1, 5, 0, 2),
            ("ac_first", [1], 1, 63, 0, 1),
            ("ac_first", [2], 1, 63, 0, 1),
            ("ac_first", [0], 6, 63, 0, 2),
            ("ac_refine", [0], 1, 63, 2, 1),
            ("dc_refine", [0, 1, 2], 0, 0, 1, 0),
            ("ac_refine", [1], 1, 63, 1, 0),
            ("ac_refine", [2], 1, 63, 1, 0),
            ("ac_refine", [0], 1, 63, 1, 0),
        ]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    nc = 1 if grayscale else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(int(x) for x in qy.reshape(64)[ZIGZAG]))
    if not grayscale:
        out += seg(0xFFDB, bytes([1]) + bytes(int(x) for x in qc.reshape(64)[ZIGZAG]))
    out += seg(0xFFC2, sof)

    for kind, cidx, ss, se, ah, al in scans:
        if kind == "dc_first":
            toks = _tok_dc_first([blocks[i] for i in cidx], al)
            tclass = 0
        elif kind == "dc_refine":
            toks = _tok_dc_refine([blocks[i] for i in cidx], al)
            tclass = 0
        elif kind == "ac_first":
            toks = _tok_ac_first(blocks[cidx[0]], ss, se, al)
            tclass = 1
        else:
            toks = _tok_ac_refine(blocks[cidx[0]], ss, se, al)
            tclass = 1
        spec, body = _serialize_scan(toks)
        if spec is not None:
            bits, vals = spec
            out += seg(0xFFC4, bytes([(tclass << 4) | 0]) + bytes(bits) + bytes(vals))
        sos = bytes([len(cidx)])
        for i in cidx:
            sos += bytes([i + 1, 0x00])  # Td=0 / Ta=0 (table 0 per class)
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos) + body
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """T.81 F.2.2.3 DECODE tables (mincode/maxcode/valptr per length)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            if length >= 16:
                raise ValueError("bad huffman code")
            code = (code << 1) | self.read_bit()
            length += 1
        return table.vals[table.valptr[length] + code - table.mincode[length]]

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start``: unstuff 0xFF00, split on RSTn,
    stop at the next real marker.  Returns (segments, marker_pos)."""
    segs, cur = [], bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _alloc_geometry(comps: list[dict], h: int, w: int):
    """Shared MCU/block-grid allocation: per-component interleaved grid
    (bw/bh, padded to MCU multiples) plus the non-interleaved grid
    (nb_w/nb_h — T.81 A.2.2, used by single-component progressive
    scans), and zeroed zigzag coefficient arrays."""
    Hmax = max(c["h"] for c in comps)
    Vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("sampling factors above 2x2 unsupported")
    mcus_x = -(-w // (8 * Hmax))
    mcus_y = -(-h // (8 * Vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        xi = -(-(w * c["h"]) // Hmax)  # component sample dims (A.1.1)
        yi = -(-(h * c["v"]) // Vmax)
        c["nb_w"] = -(-xi // 8)
        c["nb_h"] = -(-yi // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
    return Hmax, Vmax, mcus_x, mcus_y


def _decode_prog_scan(
    segs: list[bytes],
    scan_comps: list[dict],
    huff: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """Decode one progressive scan's entropy segments into the
    components' zigzag coefficient arrays (T.81 G.2 / the classic
    jdphuff control flow).  A restart unit is an MCU for interleaved
    (DC) scans and a single block for non-interleaved scans; each
    segment resets DC predictors and the EOB run."""
    interleaved = len(scan_comps) > 1
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
    elif interleaved:
        raise ValueError("progressive AC scan must be non-interleaved")

    # restart units: list of [(comp, block_index), ...] per unit
    units: list[list] = []
    if interleaved:
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            blocks = []
            for c in scan_comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blocks.append((c, (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx))
            units.append(blocks)
    else:
        c = scan_comps[0]
        for row in range(c["nb_h"]):
            for col in range(c["nb_w"]):
                units.append([(c, row * c["bw"] + col)])

    p1, m1 = 1 << al, -(1 << al)
    ui = 0
    for seg_bytes in segs:
        if ui >= len(units):
            break
        br = _BitReader(seg_bytes)
        preds = {c["id"]: 0 for c in scan_comps}
        eobrun = 0
        limit = min(ui + restart_interval, len(units)) if restart_interval else len(units)
        while ui < limit:
            for c, bi in units[ui]:
                zz = c["coef"][bi]
                if ss == 0 and ah == 0:  # DC first
                    s = br.decode(huff[(0, c["td"])])
                    preds[c["id"]] += br.receive_extend(s)
                    zz[0] = preds[c["id"]] << al
                elif ss == 0:  # DC refine: one raw bit
                    if br.read_bit():
                        zz[0] = int(zz[0]) | p1
                elif ah == 0:  # AC first
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    act = huff[(1, c["ta"])]
                    k = ss
                    while k <= se:
                        rs = br.decode(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            k += 16  # ZRL
                        else:
                            k += r
                            if k > se:
                                raise ValueError("AC index out of range")
                            zz[k] = br.receive_extend(s) << al
                            k += 1
                else:  # AC refine
                    act = huff[(1, c["ta"])]
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = br.decode(act)
                            r, s = rs >> 4, rs & 0x0F
                            newval = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += br.read_bits(r)
                                    break
                                # r == 15: ZRL — skip 16 zero-history slots
                            else:
                                if s != 1:
                                    raise ValueError("bad AC refinement symbol")
                                newval = p1 if br.read_bit() else m1
                            while k <= se:
                                if zz[k] != 0:
                                    if br.read_bit() and (int(zz[k]) & p1) == 0:
                                        zz[k] += p1 if zz[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval:
                                if k > se:
                                    raise ValueError("AC refinement out of range")
                                zz[k] = newval
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if zz[k] != 0:
                                if br.read_bit() and (int(zz[k]) & p1) == 0:
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            k += 1
                        eobrun -= 1
            ui += 1
    if ui < len(units):
        raise ValueError("truncated progressive scan")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JFIF bytes — baseline (SOF0/SOF1) or Huffman progressive
    (SOF2); 3-component color or 1-component grayscale — → (h, w, 3)
    uint8.  Every malformed-input failure mode surfaces as ValueError
    (the decode_rgb stub-gating contract)."""
    try:
        return _decode_jpeg(data)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as e:
        # truncated markers / missing tables / cut segments — normalize
        # to the single documented error type
        raise ValueError(f"corrupt JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    geom = None  # (Hmax, Vmax, mcus_x, mcus_y) once allocated
    i = 2
    scan = None
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        # optional 0xFF fill bytes before a marker (T.81 B.1.1.2)
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x00, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (length,) = struct.unpack(">H", data[i + 2 : i + 4])
        payload = data[i + 4 : i + 2 + length]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                prec = payload[p] >> 4
                tid = payload[p] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                tab = np.zeros(64, np.int64)
                tab[ZIGZAG] = zz
                qtabs[tid] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                cls = payload[p] >> 4
                tid = payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count: {nc} (CMYK?)")
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            sof_comps = list(comps)  # color-space order (Y[, Cb, Cr])
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG type (SOF{marker - 0xC0}): "
                "sequential/progressive Huffman only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_order = []
            for c in range(ns):
                cid, tables = payload[1 + 2 * c : 3 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"] = tables >> 4
                        comp["ta"] = tables & 0x0F
                        scan_order.append(comp)
            if progressive:
                ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
                if geom is None:
                    geom = _alloc_geometry(comps, h, w)
                segs, i = _split_entropy(data, i + 2 + length)
                _decode_prog_scan(
                    segs, scan_order, huff, ss, se, ahal >> 4, ahal & 0x0F,
                    restart_interval, geom[2], geom[3],
                )
                scan = segs  # mark that entropy data was seen
                continue
            # interleaved MCU layout follows the SOS component order
            # (T.81 B.2.3) — usually identical to SOF order, but not
            # guaranteed by the format.  Multi-scan non-interleaved
            # streams (ns < nc) are outside the baseline subset.
            if len(scan_order) != len(comps):
                raise ValueError("non-interleaved multi-scan JPEG unsupported")
            comps = scan_order
            scan_start = i + 2 + length
            scan, i = _split_entropy(data, scan_start)
            continue
        i += 2 + length
    if scan is None or not comps:
        raise ValueError("no scan data")

    if geom is None:
        geom = _alloc_geometry(comps, h, w)
    Hmax, Vmax, mcus_x, mcus_y = geom
    n_mcus = mcus_x * mcus_y

    # baseline entropy decode — restart segments reset DC preds + align
    # (progressive scans were decoded per-SOS above)
    mcu = 0 if not progressive else n_mcus
    for seg_bytes in scan:
        if mcu >= n_mcus:
            break
        br = _BitReader(seg_bytes)
        preds = {c["id"]: 0 for c in comps}
        seg_limit = (
            min(mcu + restart_interval, n_mcus) if restart_interval else n_mcus
        )
        while mcu < seg_limit:
            my, mx = divmod(mcu, mcus_x)
            for c in comps:
                dct = huff[(0, c["td"])]
                act = huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        s = br.decode(dct)
                        diff = br.receive_extend(s)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = br.receive_extend(s)
                            k += 1
                        bi = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                        c["coef"][bi] = zz
            mcu += 1

    # dequantize → IDCT → planes (vectorized across every block)
    planes = []
    for c in comps:
        raster = np.zeros((len(c["coef"]), 64), np.int64)
        raster[:, ZIGZAG] = c["coef"]
        blocks = raster.reshape(-1, 8, 8) * qtabs[c["tq"]]
        # f = A.T @ F @ A (orthonormal inverse)
        pix = np.einsum("xu,nuv,vy->nxy", _A.T, blocks.astype(np.float64), _A)
        pix = pix + 128.0
        bh, bw_ = c["bh"], c["bw"]
        plane = (
            pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        # upsample to full image grid and crop
        plane = np.repeat(np.repeat(plane, Vmax // c["v"], axis=0), Hmax // c["h"], axis=1)
        c["plane"] = plane[:h, :w]
        planes.append(c["plane"])
    # color conversion reads the SOF (color-space) order even when the
    # scan interleave order differed
    if len(sof_comps) == 1:  # grayscale: Y replicated to RGB
        y = sof_comps[0]["plane"]
        return np.clip(np.round(np.stack([y, y, y], axis=-1)), 0, 255).astype(np.uint8)
    y, cb, cr = (sc["plane"] for sc in sof_comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
