import numpy as np
import pytest

from crawl4ai_spark.png import decode_png, encode_png, hamming64, phash64, psnr


def test_roundtrip_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    data = encode_png(img)
    back = decode_png(data)
    assert np.array_equal(img, back)
    assert psnr(img, back) == float("inf")


def test_phash_stability_and_sensitivity():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    h1 = phash64(img)
    # tiny noise → small hamming distance
    noisy = np.clip(img.astype(int) + rng.integers(-4, 5, img.shape), 0, 255).astype(np.uint8)
    assert hamming64(h1, phash64(noisy)) <= 10
    # different image → large distance
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert hamming64(h1, phash64(other)) > 10
    assert isinstance(h1, int)
    assert -(2**63) <= h1 < 2**63


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
