"""Lossy WebP / VP8 keyframe codec (crawl4ai_spark/vp8.py).

Covers encoder→decoder round trips (16x16 and B_PRED mode families,
quality/size monotonicity, edge dims), transform inverses, and the
ground-truth validation against REAL libwebp output: the VP8 chunk of
CPython's python.webp (same asset as tests/test_webp.py).  The
bit-exact re-encode test is the load-bearing one — it pins the boolean
coder pair, the whole keyframe header layout, all 1056 entries of
COEFF_UPDATE_PROBS, the keyframe ymode tree (B_PRED at path 111), and
the exercised KF_BMODE_PROB rows against an independent encoder
implementation (libwebp).  Coefficient-probability defaults beyond
what that stream exercises are best-effort; the payload pipeline's
phash validation is the documented backstop (see vp8.py docstring).
"""

import struct

import numpy as np
import pytest

from crawl4ai_spark import vp8
from crawl4ai_spark.png import psnr
from tests.test_webp import python_webp_bytes, structured_img


def vp8_chunk() -> bytes:
    d = python_webp_bytes()
    off = 12
    while off + 8 <= len(d):
        tag = d[off : off + 4]
        (size,) = struct.unpack("<I", d[off + 4 : off + 8])
        if tag == b"VP8 ":
            return d[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def smooth_img(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 90 * np.sin(xx / (7 + seed % 5)) * np.cos(yy / (9 + seed % 3)),
            128 + 70 * np.cos(xx / 11 + seed),
            128 + 60 * np.sin((xx + yy) / (13 + seed % 7)),
        ],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(16, 16), (48, 64), (33, 47), (8, 8), (17, 9)])
@pytest.mark.parametrize("bpred", [False, True])
def test_roundtrip_psnr(hw, bpred):
    h, w = hw
    img = smooth_img(h, w, seed=h + w)
    payload = vp8.encode_vp8(img, qi=4, bpred=bpred)
    dec = vp8.decode_vp8(payload)
    assert dec.shape == img.shape
    p = psnr(dec, img)
    # VP8 is always 4:2:0 — on these saturated test chromas the
    # subsampling alone bounds PSNR ≈38 regardless of quantizer; this is
    # a decode-correctness bound, not the 4:4:4 payload contract (which
    # the JPEG corpus carries — see tests/test_jpeg.py for the analogous
    # split)
    assert p >= 36.0, (hw, bpred, p)


def test_quality_monotonic_size_and_error():
    img = smooth_img(48, 64, seed=3)
    sizes, errs = [], []
    for qi in (4, 30, 80):
        payload = vp8.encode_vp8(img, qi=qi)
        sizes.append(len(payload))
        errs.append(np.mean((vp8.decode_vp8(payload).astype(float) - img) ** 2))
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] < errs[1] <= errs[2]


def test_flat_and_tiny_images_lossless_luma():
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert np.array_equal(vp8.decode_vp8(vp8.encode_vp8(flat, qi=4)), flat)
    rng = np.random.default_rng(5)
    tiny = rng.integers(0, 256, (1, 1, 3), np.uint8)
    dec = vp8.decode_vp8(vp8.encode_vp8(tiny, qi=4))
    assert dec.shape == (1, 1, 3)
    assert abs(int(dec[0, 0, 0]) - int(tiny[0, 0, 0])) <= 6  # quant + YUV rounding


def test_bpred_exercises_all_ten_submodes():
    """Across a varied corpus the encoder's best-of-10 selection should
    hit every 4x4 predictor; each selected mode round-trips through the
    mode record (decode_modes returns the same bmodes)."""
    seen = set()
    rng = np.random.default_rng(9)
    for seed in range(12):
        img = smooth_img(32, 32, seed=seed)
        if seed % 3 == 0:
            img = rng.integers(0, 256, (32, 32, 3), np.uint8)
        payload = vp8.encode_vp8(img, qi=30, bpred=True)
        hdr, bd, parts = vp8.parse_header(payload)
        mbs = vp8.decode_modes(hdr, bd, (hdr.w + 15) >> 4, (hdr.h + 15) >> 4)
        for mb in mbs:
            assert mb["ymode"] == vp8.B_PRED
            seen.update(mb["bmodes"])
    assert seen == set(range(10)), f"modes never selected: {set(range(10)) - seen}"


def test_transform_inverses():
    rng = np.random.default_rng(2)
    for _ in range(50):
        blk = rng.integers(-255, 256, 16).tolist()
        rt = vp8.idct4x4(vp8.fdct4x4(blk))
        assert max(abs(a - b) for a, b in zip(rt, blk)) <= 2
        dcs = rng.integers(-2000, 2000, 16).tolist()
        rt2 = vp8.iwalsh4x4(vp8.fwalsh4x4(dcs))
        assert max(abs(a - b) for a, b in zip(rt2, dcs)) <= 2


def test_bool_coder_roundtrip():
    rng = np.random.default_rng(7)
    probs = rng.integers(1, 256, 4000).tolist()
    bits = rng.integers(0, 2, 4000).tolist()
    enc = vp8.BoolEncoder()
    for p, b in zip(probs, bits):
        enc.bool(p, b)
    data = enc.flush()
    dec = vp8.BoolDecoder(data)
    out = [dec.bool(p) for p in probs]
    assert out == bits


# ---------------------------------------------------------------------------
# ground truth vs real libwebp output
# ---------------------------------------------------------------------------


def test_real_stream_header_fields():
    hdr, bd, parts = vp8.parse_header(vp8_chunk())
    assert (hdr.w, hdr.h) == (16, 16)
    assert hdr.first_part_size == 20
    assert hdr.n_token_parts == 1 and len(parts[0]) == 160
    assert hdr.y_ac_qi == 26
    assert (hdr.uv_dc_delta, hdr.uv_ac_delta) == (-2, 6)
    assert hdr.filter_level == 12 and hdr.filter_type == 0
    assert not hdr.seg_enabled and not hdr.lf_delta_enabled
    # the five real coefficient-probability updates
    ups = [
        (i, j, k, t, hdr.coeff_probs[i][j][k][t])
        for i in range(4) for j in range(8) for k in range(3) for t in range(11)
        if hdr.coeff_probs[i][j][k][t] != vp8.DEFAULT_COEFF_PROBS[i][j][k][t]
    ]
    assert ups == [
        (2, 0, 0, 0, 8), (2, 0, 1, 0, 29), (2, 1, 2, 9, 136),
        (3, 0, 0, 1, 143), (3, 2, 1, 0, 71),
    ]


def test_real_stream_first_partition_bit_exact():
    """THE ground-truth test: decode the first partition of a real
    libwebp stream (header + B_PRED mode record), re-encode every
    boolean decision with our encoder, and require byte identity with
    the original 20 bytes.  A single wrong probability anywhere in the
    ~1140 reads (incl. all 1056 update-flag probs) breaks this."""
    data = vp8_chunk()
    first = data[10:30]
    trace = []
    orig_bool = vp8.BoolDecoder.bool

    def rec(self, prob):
        bit = orig_bool(self, prob)
        trace.append((prob, bit))
        return bit

    vp8.BoolDecoder.bool = rec
    try:
        hdr, bd, parts = vp8.parse_header(data)
        mbs = vp8.decode_modes(hdr, bd, 1, 1)
    finally:
        vp8.BoolDecoder.bool = orig_bool
    assert mbs[0]["ymode"] == vp8.B_PRED
    assert mbs[0]["bmodes"] == [1, 0, 1, 2, 0, 1, 1, 1, 1, 1, 3, 8, 0, 0, 0, 0]
    assert mbs[0]["uvmode"] == vp8.DC_PRED
    enc = vp8.BoolEncoder()
    for p, b in trace:
        enc.bool(p, b)
    re = enc.flush()
    assert re[:20] == first, f"re-encode diverged: {re[:20].hex()} vs {first.hex()}"


def test_real_stream_full_decode_runs():
    """Full pixel decode of the real stream exercises B_PRED prediction
    and the loop filter (level 12) without error; pixel fidelity of
    third-party token data is explicitly out of validated scope (see
    module docstring) so only shape/type/stability are asserted."""
    rgb = vp8.decode_vp8(vp8_chunk())
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
    assert np.array_equal(rgb, vp8.decode_vp8(vp8_chunk()))  # deterministic


def test_interframe_and_malformed_rejected():
    data = bytearray(vp8_chunk())
    data[0] |= 1  # interframe flag
    with pytest.raises(ValueError, match="interframe"):
        vp8.parse_header(bytes(data))
    data = bytearray(vp8_chunk())
    data[3] = 0x00  # break start code
    with pytest.raises(ValueError, match="start code"):
        vp8.parse_header(bytes(data))
    with pytest.raises(ValueError, match="truncated"):
        vp8.parse_header(vp8_chunk()[:8])
    with pytest.raises(ValueError):
        vp8.encode_vp8(np.zeros((4, 4), np.uint8))


def test_loop_filter_reduces_blockiness():
    """With a strong quantizer, decoding with the loop filter must not
    increase (and normally reduces) the mean absolute difference across
    4x4 block boundaries relative to the unfiltered reconstruction."""
    real = vp8_chunk()  # filter_level 12 in the real stream
    unf = vp8.decode_vp8(real, apply_loop_filter=False)
    fil = vp8.decode_vp8(real, apply_loop_filter=True)

    def edge_energy(a):
        g = a.astype(int)
        return sum(
            np.abs(g[:, c, :] - g[:, c - 1, :]).mean() for c in (4, 8, 12)
        ) + sum(np.abs(g[r, :, :] - g[r - 1, :, :]).mean() for r in (4, 8, 12))

    assert not np.array_equal(unf, fil)  # filter actually ran
    assert edge_energy(fil) <= edge_energy(unf) + 1e-9


def test_webp_container_roundtrip():
    img = smooth_img(32, 48, seed=4)
    from crawl4ai_spark.webp import decode_webp

    data = vp8.encode_webp_lossy(img, qi=4)
    dec = decode_webp(data)
    assert dec.shape == img.shape
    assert psnr(dec, img) >= 36.0


def test_dc_pred_availability_rule():
    """RFC 6386 DC_PRED averages only in-frame neighbours; the 127/129
    edge pads must never leak into the DC average (review fix)."""
    above = [127] * 16  # pad values
    left = [100] * 16   # real reconstructed pixels
    p = vp8.pred_16_or_8(vp8.DC_PRED, above, left, 127, 16,
                         have_above=False, have_left=True)
    assert np.all(p == 100)
    p = vp8.pred_16_or_8(vp8.DC_PRED, [60] * 16, left, 127, 16,
                         have_above=True, have_left=False)
    assert np.all(p == 60)
    p = vp8.pred_16_or_8(vp8.DC_PRED, above, [129] * 16, 127, 16,
                         have_above=False, have_left=False)
    assert np.all(p == 128)
    p = vp8.pred_16_or_8(vp8.DC_PRED, [60] * 8, [100] * 8, 127, 8,
                         have_above=True, have_left=True)
    assert np.all(p == (60 * 8 + 100 * 8 + 8) >> 4)
