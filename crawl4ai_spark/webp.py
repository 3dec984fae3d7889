"""Minimal pure-Python lossless WebP (VP8L) codec.

Unstubs the last image format in the payload pipeline
(operators/multimodal.py): PNG and JPEG (baseline + progressive) decode
were already real; WebP routed to an honest stub.  Same philosophy as
png.py / jpeg.py — the sandbox has no libwebp/PIL, so the codec is
self-contained numpy/stdlib, built from the public WebP Lossless
Bitstream Specification (RFC 9649):

* **Decoder** — the full VP8L feature set: RIFF/VP8X container walk,
  all four transforms (predictor with all 14 modes, color transform,
  subtract-green, color-indexing incl. sub-byte pixel bundling), color
  cache, meta-prefix (per-tile Huffman groups), LZ77 backward
  references with the 120-entry 2D distance map, simple and
  code-length-coded Huffman codes.  Also decodes the VP8L-coded alpha
  plane of lossy files (ALPH chunk, compression method 1) — used as a
  real-libwebp validation vector in tests.
* **Encoder** — lossless: literals + optional subtract-green /
  predictor / color transforms, optional color-indexing (with
  bundling), optional color cache and a run-based LZ77, per-channel
  frequency-optimized canonical Huffman codes written through the
  code-length code (with 17/18 zero-run symbols).  Exists to produce
  spec-shaped fixtures: every decoder path above is exercised by
  encoder modes in tests.

Lossy WebP (VP8 chunks) is a different codec family (boolean
arithmetic coding, intra prediction) and lives in vp8.py; decode_webp
routes VP8 chunks there.  Animated WebP (VP8X + ANIM/ANMF) is handled
by encode_webp_animation / decode_webp_frames below — the "video"
modality carrier for the frame-sampling pipeline
(operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# 2D offset map for LZ77 distance codes 1..120 (RFC 9649 §4.2.2):
# distance = y * xsize + x, clamped to >= 1; codes > 120 are linear
# distances (code - 120).  Order is the spec's closeness ordering.
DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5),
    (8, 4), (3, 8), (-3, 8), (8, 5), (8, 6), (5, 8), (-5, 8), (8, 7),
]

# code-length-code symbol transmission order (RFC 9649 §5.2.2)
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

_HASH_MUL = 0x1E35A7BD


class _Bits:
    """LSB-first bit reader over the VP8L stream."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        d = self.d
        for i in range(n):
            byte = (p + i) >> 3
            if byte >= len(d):
                raise ValueError("truncated VP8L stream")
            v |= ((d[byte] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.d):
            raise ValueError("truncated VP8L stream")
        self.pos = p + 1
        return (self.d[byte] >> (p & 7)) & 1


class _HTree:
    """Canonical prefix code (RFC 1951 ordering).  Codes are read from
    the stream MSB-of-code first, one bit per tree step."""

    __slots__ = ("map", "single")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.map = None
            return
        self.single = None
        if max(ln for ln, _ in nz) > 15:
            raise ValueError("prefix code length > 15")
        # Kraft check: over-subscribed codes are invalid streams
        kraft = sum(1 << (15 - ln) for ln, _ in nz)
        if kraft > (1 << 15):
            raise ValueError("over-subscribed prefix code")
        nz.sort()
        self.map = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            self.map[(ln, code)] = sym
            code += 1

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        m = self.map
        while True:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = m.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("bad prefix code")


def _read_code_lengths(br: _Bits, cl_tree: _HTree, alphabet_size: int):
    lengths = [0] * alphabet_size
    if br.read_bit():  # explicit symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_tree.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    if sym > alphabet_size:
        raise ValueError("code length repeat overflow")
    return lengths


def _read_huffman_code(br: _Bits, alphabet_size: int) -> _HTree:
    if br.read_bit():  # simple code: 1 or 2 symbols
        num_symbols = br.read_bit() + 1
        if br.read_bit():
            s0 = br.read(8)
        else:
            s0 = br.read_bit()
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[s1] = 1
        return _HTree(lengths)
    num_cl = 4 + br.read(4)
    clc = [0] * 19
    for i in range(num_cl):
        clc[CL_ORDER[i]] = br.read(3)
    cl_tree = _HTree(clc)
    return _HTree(_read_code_lengths(br, cl_tree, alphabet_size))


def _prefix_decode(br: _Bits, code: int) -> int:
    """length / distance-code prefix decoding (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _read_groups(br: _Bits, n_groups: int, cache_size: int):
    groups = []
    for _ in range(n_groups):
        g = (
            _read_huffman_code(br, 256 + 24 + cache_size),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 40),
        )
        groups.append(g)
    return groups


def _decode_image(br: _Bits, w: int, h: int, is_main: bool):
    """Decode one entropy-coded VP8L image → (pixels uint32[h*w] ARGB,
    transforms list).  Subimages (transform data / palette / meta) call
    with is_main=False: no transforms, no meta-prefix."""
    transforms = []
    if is_main:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                tw = (w + (1 << bits) - 1) >> bits
                th = (h + (1 << bits) - 1) >> bits
                data, _ = _decode_image(br, tw, th, False)
                transforms.append(("predictor", bits, data))
            elif ttype == 1:  # color transform
                bits = br.read(3) + 2
                tw = (w + (1 << bits) - 1) >> bits
                th = (h + (1 << bits) - 1) >> bits
                data, _ = _decode_image(br, tw, th, False)
                transforms.append(("color", bits, data))
            elif ttype == 2:
                transforms.append(("subtract_green",))
            else:  # color indexing
                psize = br.read(8) + 1
                pal_deltas, _ = _decode_image(br, psize, 1, False)
                palette = np.cumsum(
                    pal_deltas.view(np.uint8).reshape(-1, 4).astype(np.uint32), axis=0
                ).astype(np.uint8)
                palette = palette.reshape(-1, 4).copy().view(np.uint32).reshape(-1)
                if psize <= 2:
                    pbits = 3
                elif psize <= 4:
                    pbits = 2
                elif psize <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append(("palette", pbits, palette, psize, w))
                w = (w + (1 << pbits) - 1) >> pbits  # packed width

    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = np.zeros(cache_size, np.uint32) if cache_size else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img, _ = _decode_image(br, mw, mh, False)
        # group index = (red << 8) | green
        meta = (
            ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        )
        n_groups = int(meta.max()) + 1
        meta_w = mw
    groups = _read_groups(br, n_groups, cache_size)

    n = w * h
    out = np.zeros(n, np.uint32)
    pos = 0
    shift = 32 - cache_bits if cache_bits else 0

    def insert_cache(px: int):
        cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px

    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    cur_group = 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            if gi != cur_group:
                g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
                cur_group = gi
        s = g_green.decode(br)
        if s < 256:
            r = g_red.decode(br)
            b = g_blue.decode(br)
            a = g_alpha.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                insert_cache(px)
        elif s < 280:
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, g_dist.decode(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            for i in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    insert_cache(px)
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            px = int(cache[s - 280])
            out[pos] = px
            pos += 1
    return out, transforms


def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _px_channels(p: int):
    return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)


def _channels_px(c) -> int:
    return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]


def _select(l, t, tl):
    p = tuple(x + y - z for x, y, z in zip(l, t, tl))
    pl = sum(abs(a - b) for a, b in zip(p, l))
    pt = sum(abs(a - b) for a, b in zip(p, t))
    return l if pl < pt else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _cas_full(l, t, tl):
    return tuple(_clamp(a + b - c) for a, b, c in zip(l, t, tl))


def _cas_half(av, tl):
    out = []
    for a, b in zip(av, tl):
        d = a - b
        out.append(_clamp(a + (d // 2 if d >= 0 else -((-d) // 2))))
    return tuple(out)


def _predict(mode: int, l, t, tl, tr):
    if mode == 0:
        return (0xFF, 0, 0, 0)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _cas_full(l, t, tl)
    if mode == 13:
        return _cas_half(_avg2(l, t), tl)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(px: np.ndarray, w: int, h: int, bits: int, modes: np.ndarray):
    mw = (w + (1 << bits) - 1) >> bits
    img = px.reshape(h, w)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1  # top row: L
            elif x == 0:
                mode = 2  # left column: T
            else:
                mode = int((modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF)
            l = _px_channels(int(img[y, x - 1])) if x > 0 else (0, 0, 0, 0)
            t = _px_channels(int(img[y - 1, x])) if y > 0 else (0, 0, 0, 0)
            tl = _px_channels(int(img[y - 1, x - 1])) if (x > 0 and y > 0) else (0, 0, 0, 0)
            if y > 0:
                # right-edge exception: TR wraps to the current row's
                # leftmost (already decoded) pixel
                tr = _px_channels(int(img[y - 1, x + 1])) if x + 1 < w else _px_channels(int(img[y, 0]))
            else:
                tr = (0, 0, 0, 0)
            pred = _predict(mode, l, t, tl, tr)
            res = _px_channels(int(img[y, x]))
            img[y, x] = _channels_px(tuple((a + b) & 0xFF for a, b in zip(res, pred)))
    return img.reshape(-1)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: both args as int8, product >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(px: np.ndarray, w: int, h: int, bits: int, cts: np.ndarray):
    mw = (w + (1 << bits) - 1) >> bits
    img = px.reshape(h, w)
    for y in range(h):
        for x in range(w):
            ct = int(cts[(y >> bits) * mw + (x >> bits)])
            g2r = ct & 0xFF           # blue channel
            g2b = (ct >> 8) & 0xFF    # green channel
            r2b = (ct >> 16) & 0xFF   # red channel
            p = int(img[y, x])
            a, r, g, b = _px_channels(p)
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            img[y, x] = _channels_px((a, r, g, b))
    return img.reshape(-1)


def _apply_inverse_transforms(px: np.ndarray, w: int, h: int, transforms: list):
    """Inverse transforms run in reverse stream order (RFC 9649 §6).

    The width must be tracked across stages: the entropy-coded image has
    the PACKED width when color-indexing is present, and any predictor /
    color transform signalled after the palette (i.e. applied to the
    packed image at encode time) must be inverted at that packed width —
    only the palette inverse restores the full width."""
    cur_w = w
    for tr in transforms:
        if tr[0] == "palette":
            cur_w = (tr[4] + (1 << tr[1]) - 1) >> tr[1]
    w = cur_w
    for tr in reversed(transforms):
        kind = tr[0]
        if kind == "subtract_green":
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
            px = (a << 24) | (r << 16) | (g << 8) | b
        elif kind == "palette":
            _, pbits, palette, psize, full_w = tr
            packed_w = (full_w + (1 << pbits) - 1) >> pbits
            bpp = 8 >> pbits
            mask = (1 << bpp) - 1
            out = np.zeros(full_w * h, np.uint32)
            src = px.reshape(h, packed_w)
            for y in range(h):
                for x in range(full_w):
                    packed = int(src[y, x >> pbits])
                    idx = ((packed >> 8) >> ((x & ((1 << pbits) - 1)) * bpp)) & mask
                    if idx >= psize:
                        raise ValueError("palette index out of range")
                    out[y * full_w + x] = palette[idx]
            px, w = out, full_w
        elif kind == "predictor":
            px = _inv_predictor(px, w, h, tr[1], tr[2])
        elif kind == "color":
            px = _inv_color_transform(px, w, h, tr[1], tr[2])
    return px, w


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload → (h, w, 4) uint8 RGBA."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    px, transforms = _decode_image(br, w, h, True)
    px, w = _apply_inverse_transforms(px, w, h, transforms)
    a = ((px >> 24) & 0xFF).astype(np.uint8)
    r = ((px >> 16) & 0xFF).astype(np.uint8)
    g = ((px >> 8) & 0xFF).astype(np.uint8)
    b = (px & 0xFF).astype(np.uint8)
    return np.stack([r, g, b, a], axis=-1).reshape(h, w, 4)


def decode_alpha_plane(data: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk (lossy WebP alpha).  Compression method 1
    is a headerless VP8L stream whose GREEN channel carries the alpha
    values — real libwebp entropy data, used in tests as a
    ground-truth vector for the Huffman/LZ77 core."""
    if not data:
        raise ValueError("empty ALPH chunk")
    hdr = data[0]
    method = hdr & 3
    filt = (hdr >> 2) & 3
    if method == 0:  # raw
        plane = np.frombuffer(data[1 : 1 + w * h], np.uint8)
        if plane.size != w * h:
            raise ValueError("truncated raw alpha plane")
        return plane.reshape(h, w).copy()
    if method != 1:
        raise ValueError(f"unknown alpha compression method {method}")
    br = _Bits(data[1:])
    px, transforms = _decode_image(br, w, h, True)
    px, w2 = _apply_inverse_transforms(px, w, h, transforms)
    plane = ((px >> 8) & 0xFF).astype(np.uint8).reshape(h, w2)[:, :w]
    if filt:  # horizontal/vertical/gradient alpha filters
        out = plane.astype(np.int64)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif filt == 1:
                    pred = out[y, x - 1] if x else out[y - 1, x]
                elif filt == 2:
                    pred = out[y - 1, x] if y else out[y, x - 1]
                else:
                    if y == 0:
                        pred = out[y, x - 1]
                    elif x == 0:
                        pred = out[y - 1, x]
                    else:
                        pred = _clamp(
                            int(out[y, x - 1]) + int(out[y - 1, x]) - int(out[y - 1, x - 1])
                        )
                out[y, x] = (out[y, x] + pred) & 0xFF
        plane = out.astype(np.uint8)
    return plane


def decode_webp(data: bytes) -> np.ndarray:
    """Decode WebP container bytes → (h, w, 3) uint8 RGB (alpha is
    dropped — the payload-table contract is RGB).  Lossless (VP8L) and
    lossy (VP8 keyframe, via vp8.py) are both real pure-Python decodes.

    Lossy validation scope: the boolean coder, frame header, and mode
    layer are pinned bit-exactly against a real libwebp stream
    (tests/test_vp8.py); streams from this package's own encoder decode
    fully.  Third-party lossy streams decode through the same machinery
    but the coefficient-probability defaults are best-effort
    transcription — the payload pipeline's phash/dims validation is the
    backstop that flags any mis-decode."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    i = 12
    vp8_payload = None
    while i + 8 <= len(data):
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        payload = data[i + 8 : i + 8 + size]
        if fourcc == b"VP8L":
            arr = decode_vp8l(payload)
            return arr[..., :3].copy()
        if fourcc == b"VP8 " and vp8_payload is None:
            vp8_payload = payload
        i += 8 + size + (size & 1)
    if vp8_payload is not None:
        from .vp8 import decode_vp8

        return decode_vp8(vp8_payload)
    raise ValueError("no VP8/VP8L chunk in WebP container")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitsW:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        self.acc |= (v & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes go MSB-of-code first (RFC 1951 convention)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _optimal_lengths(freqs: dict[int, int], alphabet_size: int, max_len: int):
    """Length-limited optimal prefix code lengths via the frequency-
    merge procedure (depth limit 15 for VP8L codes, 7 for the
    3-bit-stored code-length code).  Unlike the JPEG twin there is NO
    reserved dummy symbol: VP8L requires COMPLETE canonical trees
    (libwebp rejects under-subscribed tables), and the all-ones code is
    a legal code here."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        raise ValueError("no symbols")
    if len(syms) == 1:
        return {syms[0]: 1}
    n = alphabet_size
    freq = [0] * n
    for s, f in freqs.items():
        freq[s] = f
    codesize = [0] * n
    others = [-1] * n
    while True:
        c1, v = -1, None
        for i in range(n):
            if freq[i] and (v is None or freq[i] <= v):
                v, c1 = freq[i], i
        c2, v = -1, None
        for i in range(n):
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
    bits = [0] * (max(codesize) + 2)
    for i in range(n):
        if codesize[i]:
            bits[codesize[i]] += 1
    for i in range(len(bits) - 1, max_len, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # canonical assignment: shortest first, ties by symbol value
    order = sorted((s for s in range(alphabet_size) if codesize[s]),
                   key=lambda s: (codesize[s], s))
    lengths = {}
    k = 0
    for ln in range(1, max_len + 1):
        for _ in range(bits[ln] if ln < len(bits) else 0):
            lengths[order[k]] = ln
            k += 1
    return lengths


def _canonical_from_lengths(lengths: dict[int, int]):
    nz = sorted((ln, s) for s, ln in lengths.items())
    codes = {}
    code = 0
    prev = nz[0][0]
    for ln, s in nz:
        code <<= ln - prev
        prev = ln
        codes[s] = (code, ln)
        code += 1
    return codes


def _write_huffman_code(bw: _BitsW, lengths: dict[int, int], alphabet_size: int):
    """Write one prefix code.  ≤2 symbols with values < 256 → simple
    code; otherwise the code-length-coded form with 17/18 zero runs."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 <= 1 and len(syms) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return {s: (i, 1) for i, s in enumerate(syms)} if len(syms) == 2 else {syms[0]: (0, 0)}
    bw.write(0, 1)  # code-length-coded
    # tokens over the FULL dense lengths array (incl. trailing zeros —
    # with no explicit max_symbol the reader pulls code lengths until
    # the whole alphabet is covered), zero runs collapsed to 17/18
    arr = [lengths.get(s, 0) for s in range(alphabet_size)]
    toks = []
    i = 0
    while i < alphabet_size:
        if arr[i] == 0:
            j = i
            while j < alphabet_size and arr[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                take = min(run, 138)
                toks.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                toks.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                toks.append((0, None, 0))
            i = j
        else:
            toks.append((arr[i], None, 0))
            i += 1
    clf: dict[int, int] = {}
    for t, _, _ in toks:
        clf[t] = clf.get(t, 0) + 1
    cl_lengths = _optimal_lengths(clf, 19, 7)
    if len(cl_lengths) == 1:
        # a single-symbol code-length code still writes 1 bit per token
        # here (unlike pixel codes, which go through the zero-bit
        # trivial-tree path) — pair it with an unused symbol so the
        # canonical tree is complete and the decoder's per-token 1-bit
        # reads stay in sync
        only = next(iter(cl_lengths))
        cl_lengths = {only: 1, (0 if only != 0 else 1): 1}
    cl_codes = _canonical_from_lengths(cl_lengths)
    num_cl = max(max(CL_ORDER.index(s) for s in cl_lengths) + 1, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(CL_ORDER[i], 0), 3)
    bw.write(0, 1)  # no explicit max_symbol: emit through the alphabet
    for t, extra, ebits in toks:
        code, ln = cl_codes[t]
        bw.write_code(code, ln)
        if ebits:
            bw.write(extra, ebits)
    if len(lengths) == 1:
        return {next(iter(lengths)): (0, 0)}  # trivial tree: zero bits
    return _canonical_from_lengths(lengths)


def _prefix_encode(v: int):
    """value ≥ 1 → (prefix code, extra bits value, extra bit count)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    eb = x.bit_length() - 2
    if x >= (3 << eb):
        return 2 * eb + 3, x - (3 << eb), eb
    return 2 * eb + 2, x - (2 << eb), eb


def _fwd_predictor(px: np.ndarray, w: int, h: int, bits: int):
    """Forward predictor transform: per-tile mode cycles through all 14
    predictors (deterministic), residual = pixel − prediction mod 256.
    Edge rules mirror the decoder exactly."""
    mw = (w + (1 << bits) - 1) >> bits
    mh = (h + (1 << bits) - 1) >> bits
    modes = np.zeros(mw * mh, np.uint32)
    for ty in range(mh):
        for tx in range(mw):
            modes[ty * mw + tx] = 0xFF000000 | (((tx + ty) % 14) << 8)
    img = px.reshape(h, w)
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1
            elif x == 0:
                mode = 2
            else:
                mode = int((modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF)
            l = _px_channels(int(img[y, x - 1])) if x > 0 else (0, 0, 0, 0)
            t = _px_channels(int(img[y - 1, x])) if y > 0 else (0, 0, 0, 0)
            tl = _px_channels(int(img[y - 1, x - 1])) if (x > 0 and y > 0) else (0, 0, 0, 0)
            if y > 0:
                tr = _px_channels(int(img[y - 1, x + 1])) if x + 1 < w else _px_channels(int(img[y, 0]))
            else:
                tr = (0, 0, 0, 0)
            pred = _predict(mode, l, t, tl, tr)
            cur = _px_channels(int(img[y, x]))
            out[y, x] = _channels_px(tuple((a - b) & 0xFF for a, b in zip(cur, pred)))
    return out.reshape(-1), modes, mw, mh


def _fwd_color_transform(px: np.ndarray, w: int, h: int, bits: int):
    """Forward color transform with deterministic per-tile elements."""
    mw = (w + (1 << bits) - 1) >> bits
    mh = (h + (1 << bits) - 1) >> bits
    cts = np.zeros(mw * mh, np.uint32)
    for ty in range(mh):
        for tx in range(mw):
            g2r = (17 * tx + 29 * ty + 3) & 0xFF
            g2b = (41 * tx + 7 * ty + 11) & 0xFF
            r2b = (13 * tx + 23 * ty + 5) & 0xFF
            cts[ty * mw + tx] = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    img = px.reshape(h, w)
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            ct = int(cts[(y >> bits) * mw + (x >> bits)])
            g2r, g2b, r2b = ct & 0xFF, (ct >> 8) & 0xFF, (ct >> 16) & 0xFF
            a, r, g, b = _px_channels(int(img[y, x]))
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            out[y, x] = _channels_px((a, nr, g, nb))
    return out.reshape(-1), cts, mw, mh


def _emit_coded_image(
    bw: _BitsW,
    px: np.ndarray,
    w: int,
    h: int,
    cache_bits: int = 0,
    lz77: bool = False,
    meta_bits: int = 0,
    is_main: bool = False,
) -> None:
    """Write one entropy-coded image: cache info, optional meta-prefix
    groups, per-group frequency-optimal codes, then the token stream."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta_idx = None
    n_groups = 1
    if is_main:
        if meta_bits:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            meta_idx = np.zeros(mw * mh, np.int64)
            for ty in range(mh):
                for tx in range(mw):
                    meta_idx[ty * mw + tx] = (tx + ty) % 2
            n_groups = int(meta_idx.max()) + 1
            meta_px = (0xFF000000 | (meta_idx.astype(np.uint32) << 8)).astype(np.uint32)
            _emit_coded_image(bw, meta_px, mw, mh)
            meta_w = mw
        else:
            bw.write(0, 1)

    # distance code lookup: smallest 2D plane code per distance value
    dmap: dict[int, int] = {}
    if lz77:
        for i, (dx, dy) in enumerate(DIST_MAP):
            d = dy * w + dx
            if d >= 1 and d not in dmap:
                dmap[d] = i + 1

    n = w * h
    cache = [0] * cache_size if cache_size else None
    shift = 32 - cache_bits if cache_bits else 0
    toks = []  # (group, kind, payload...)
    pos = 0
    while pos < n:
        if meta_idx is not None:
            y, x = divmod(pos, w)
            grp = int(meta_idx[(y >> meta_bits) * meta_w + (x >> meta_bits)])
        else:
            grp = 0
        if lz77 and pos > 0:
            best_len = best_dist = 0
            for dist in (1, w):
                if dist > pos:
                    continue
                ln = 0
                while pos + ln < n and ln < 4096 and px[pos + ln] == px[pos + ln - dist]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 4:
                pc = dmap.get(best_dist, best_dist + 120)
                lc, le, ln_ = _prefix_encode(best_len)
                dc, de, dn = _prefix_encode(pc)
                toks.append((grp, "copy", 256 + lc, le, ln_, dc, de, dn))
                if cache is not None:
                    for i in range(best_len):
                        p = int(px[pos + i])
                        cache[(_HASH_MUL * p & 0xFFFFFFFF) >> shift] = p
                pos += best_len
                continue
        p = int(px[pos])
        if cache is not None:
            ci = (_HASH_MUL * p & 0xFFFFFFFF) >> shift
            if cache[ci] == p:
                toks.append((grp, "cache", 280 + ci))
                pos += 1
                continue
            cache[ci] = p
        a, r, g, b = _px_channels(p)
        toks.append((grp, "lit", a, r, g, b))
        pos += 1

    # per-group, per-channel symbol frequencies
    freqs = [[{} for _ in range(5)] for _ in range(n_groups)]

    def bump(gi, ch, sym):
        d = freqs[gi][ch]
        d[sym] = d.get(sym, 0) + 1

    for t in toks:
        gi = t[0]
        if t[1] == "lit":
            _, _, a, r, g, b = t
            bump(gi, 0, g)
            bump(gi, 1, r)
            bump(gi, 2, b)
            bump(gi, 3, a)
        elif t[1] == "cache":
            bump(gi, 0, t[2])
        else:
            bump(gi, 0, t[2])
            bump(gi, 4, t[5])
    alpha_sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    group_codes = []
    for gi in range(n_groups):
        codes = []
        for ch in range(5):
            f = freqs[gi][ch]
            if not f:
                f = {0: 1}  # unused channel: cheapest valid code
            lengths = _optimal_lengths(f, alpha_sizes[ch], 15)
            codes.append(_write_huffman_code(bw, lengths, alpha_sizes[ch]))
        group_codes.append(codes)

    for t in toks:
        codes = group_codes[t[0]]
        if t[1] == "lit":
            _, _, a, r, g, b = t
            for ch, sym in ((0, g), (1, r), (2, b), (3, a)):
                c, ln = codes[ch][sym]
                bw.write_code(c, ln)
        elif t[1] == "cache":
            c, ln = codes[0][t[2]]
            bw.write_code(c, ln)
        else:
            _, _, gsym, le, ln_, dc, de, dn = t
            c, ln = codes[0][gsym]
            bw.write_code(c, ln)
            if ln_:
                bw.write(le, ln_)
            c, ln = codes[4][dc]
            bw.write_code(c, ln)
            if dn:
                bw.write(de, dn)


def encode_vp8l(
    rgb: np.ndarray,
    transforms: tuple = (),
    cache_bits: int = 0,
    lz77: bool = False,
    meta_bits: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a VP8L chunk payload.

    ``transforms`` is an ordered tuple of "subtract_green",
    ("predictor", bits), ("color", bits), "palette" — applied forward
    in that order and signalled in stream order, so the decoder
    inverse-applies them in reverse, as the spec requires."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    px = ((0xFF << 24) | (r << 16) | (g << 8) | b).reshape(-1)

    bw = _BitsW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    cw = w
    for tr in transforms:
        bw.write(1, 1)
        if tr == "subtract_green":
            bw.write(2, 2)
            a_ = (px >> 24) & 0xFF
            r_ = (px >> 16) & 0xFF
            g_ = (px >> 8) & 0xFF
            b_ = px & 0xFF
            px = (a_ << 24) | (((r_ - g_) & 0xFF) << 16) | (g_ << 8) | ((b_ - g_) & 0xFF)
        elif isinstance(tr, tuple) and tr[0] == "predictor":
            bits = tr[1]
            bw.write(0, 2)
            bw.write(bits - 2, 3)
            px, modes, mw, mh = _fwd_predictor(px, cw, h, bits)
            _emit_coded_image(bw, modes, mw, mh)
        elif isinstance(tr, tuple) and tr[0] == "color":
            bits = tr[1]
            bw.write(1, 2)
            bw.write(bits - 2, 3)
            px, cts, mw, mh = _fwd_color_transform(px, cw, h, bits)
            _emit_coded_image(bw, cts, mw, mh)
        elif tr == "palette":
            bw.write(3, 2)
            uniq = np.unique(px)
            psize = len(uniq)
            if psize > 256:
                raise ValueError("palette transform needs ≤ 256 distinct colors")
            bw.write(psize - 1, 8)
            # delta-coded palette image (per-channel mod-256 diffs)
            pal = uniq.view(np.uint8).reshape(-1, 4).astype(np.int64)
            deltas = pal.copy()
            deltas[1:] = (pal[1:] - pal[:-1]) % 256
            dpx = deltas.astype(np.uint8).reshape(-1, 4).copy().view(np.uint32).reshape(-1)
            _emit_coded_image(bw, dpx, psize, 1)
            lookup = {int(c): i for i, c in enumerate(uniq)}
            idx = np.array([lookup[int(p)] for p in px], np.uint32)
            if psize <= 2:
                pbits = 3
            elif psize <= 4:
                pbits = 2
            elif psize <= 16:
                pbits = 1
            else:
                pbits = 0
            packed_w = (cw + (1 << pbits) - 1) >> pbits
            bpp = 8 >> pbits
            packed = np.zeros(packed_w * h, np.uint32)
            idx2 = idx.reshape(h, cw)
            for y in range(h):
                for x in range(cw):
                    packed[y * packed_w + (x >> pbits)] |= idx2[y, x] << (
                        8 + (x & ((1 << pbits) - 1)) * bpp
                    )
            packed |= 0xFF000000
            px, cw = packed, packed_w
        else:
            raise ValueError(f"unknown transform {tr!r}")
    bw.write(0, 1)  # end of transforms
    _emit_coded_image(bw, px, cw, h, cache_bits, lz77, meta_bits, is_main=True)
    return b"\x2f" + bw.bytes()


def encode_webp_lossless(rgb: np.ndarray, **kw) -> bytes:
    """Encode (h, w, 3) uint8 RGB into a complete lossless WebP file."""
    payload = encode_vp8l(rgb, **kw)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# animated WebP (VP8X + ANIM/ANMF) — the "video" modality carrier
# ---------------------------------------------------------------------------


def encode_webp_animation(frames, durations_ms, loop_count: int = 0) -> bytes:
    """Encode a list of (h, w, 3) uint8 frames as an animated WebP
    (VP8X + ANIM + one ANMF per frame, VP8L-coded, full-canvas,
    no-blend).  All frames must share one canvas size."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share the canvas size")
    if len(durations_ms) != len(frames):
        raise ValueError("durations/frames length mismatch")

    def u24(v):
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])

    chunks = []
    vp8x = bytes([0x02, 0, 0, 0]) + u24(w - 1) + u24(h - 1)  # ANIM flag
    chunks.append(b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x)
    anim = struct.pack("<I", 0) + struct.pack("<H", loop_count)
    chunks.append(b"ANIM" + struct.pack("<I", len(anim)) + anim)
    for f, dur in zip(frames, durations_ms):
        payload = encode_vp8l(f, transforms=("subtract_green",), lz77=True)
        sub = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            sub += b"\x00"
        anmf = (u24(0) + u24(0) + u24(w - 1) + u24(h - 1)
                + u24(int(dur)) + bytes([0]) + sub)
        chunk = b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            chunk += b"\x00"
        chunks.append(chunk)
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_webp_frames(data: bytes):
    """Decode WebP container bytes → list of ((h, w, 3) uint8 RGB,
    duration_ms).  Still images yield one frame with duration 0;
    animations yield every ANMF frame (full-canvas, no-blend layout —
    the layout encode_webp_animation emits)."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    frames = []
    i = 12
    while i + 8 <= len(data):
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        payload = data[i + 8 : i + 8 + size]
        if fourcc == b"ANMF":
            if len(payload) < 16:
                raise ValueError("truncated ANMF header")
            dur = payload[12] | payload[13] << 8 | payload[14] << 16
            j = 16
            while j + 8 <= len(payload):
                sub = payload[j : j + 4]
                (ssz,) = struct.unpack("<I", payload[j + 4 : j + 8])
                sdata = payload[j + 8 : j + 8 + ssz]
                if sub == b"VP8L":
                    frames.append((decode_vp8l(sdata)[..., :3].copy(), dur))
                    break
                if sub == b"VP8 ":
                    from .vp8 import decode_vp8

                    frames.append((decode_vp8(sdata), dur))
                    break
                j += 8 + ssz + (ssz & 1)
        i += 8 + size + (size & 1)
    if frames:
        return frames
    return [(decode_webp(data), 0)]
