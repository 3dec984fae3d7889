"""Image payload pipeline over the (image_id, bytes, w, h, fmt, caption,
phash) table — the BASELINE.json input_hint shape.

Everything crosses into Python only through Arrow-batched pandas UDFs
(mapInPandas): decode → validate dims → recompute pHash → PSNR against a
reference decode.  Every payload format decodes for real through
pure-Python codecs: PNG (png.py), JPEG baseline + progressive (T.81,
jpeg.py), lossless WebP (VP8L/RFC 9649, webp.py) and lossy WebP (VP8
keyframes/RFC 6386, vp8.py).  The lossy-VP8 entropy/header/mode layer
is pinned bit-exactly against a real libwebp stream; its
coefficient-probability defaults are best-effort for third-party
streams (see vp8.py) — the phash/dims checks below are the backstop
that flags any mis-decode.  ``allow_stub`` remains only as the
deterministic fake-decode escape for corrupt JPEG streams in plumbing
tests — the Spark surface (schema, batch shape, partitioning) is
identical for every format.

Mirrors the reference's media pipeline: images emitted per page into the
payload table (content_scraping_strategy.py:333-339), validated and
scored before landing (SURVEY §2.8).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..png import decode_png, phash64, psnr

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

DECODE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("decoded_w", T.IntegerType()),
        T.StructField("decoded_h", T.IntegerType()),
        T.StructField("phash_recomputed", T.LongType()),
        T.StructField("phash_matches", T.BooleanType()),
        T.StructField("dims_match", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


_NATIVE_UNSET = object()
_native_image_module = _NATIVE_UNSET
# test seam: when set, used as the native decode fn regardless of PIL
_native_decode_override = None


def native_image_module():
    """The optional native image library (Pillow), resolved once per
    process.  None when not importable — this container ships no image
    libs, so the pure-Python codecs are the default engine here; a
    production cluster that installs Pillow/libjpeg-turbo/libwebp gets
    the native path with zero Spark-plan, schema, or operator changes."""
    global _native_image_module
    if _native_image_module is _NATIVE_UNSET:
        try:
            from PIL import Image  # noqa: PLC0415

            _native_image_module = Image
        except ImportError:
            _native_image_module = None
    return _native_image_module


def _decode_rgb_native(data: bytes, fmt: str) -> np.ndarray:
    import io

    Image = native_image_module()
    im = Image.open(io.BytesIO(data))
    im.load()
    if im.mode != "RGB":
        im = im.convert("RGB")
    return np.asarray(im, dtype=np.uint8)


def _native_decode_fn():
    if _native_decode_override is not None:
        return _native_decode_override
    if native_image_module() is not None:
        return _decode_rgb_native
    return None


def decode_rgb(
    data: bytes, fmt: str, allow_stub: bool = False, engine: str = "auto"
) -> np.ndarray:
    """Decode image bytes to (h, w, 3) uint8.

    All real decodes (pure-Python codecs png.py / jpeg.py / webp.py /
    vp8.py).  With allow_stub, a corrupt JPEG stream falls through to a
    deterministic fake decode (seeded from the bytes) so plumbing tests
    can exercise the failure path end-to-end.

    Scale note (the 100-TB image plane): this function is the SINGLE
    dispatch point every image operator routes through (decode_and_
    validate, resize, features, near-dup).  The pure-Python codecs are
    the correctness reference — bit-pinned against real libjpeg/libwebp
    streams in tests — and decode O(10^2–10^3) rows/s/core; a production
    cluster swaps the per-format branches below for libjpeg-turbo /
    libwebp / Pillow-SIMD (~10^4–10^5 rows/s/core) with ZERO changes to
    any Spark plan, schema, or operator: the mapInPandas batch shape,
    IMAGE_SCHEMA, and validation contract are decode-library-agnostic.
    bench.py's ``image_fmt_rows_per_sec`` records the before-swap
    per-format baseline.

    The swap is CODE, not prose: ``engine="auto"`` (the default) uses
    the native library when Pillow is importable and falls back to the
    pure codecs otherwise (or when the native decode raises — e.g. a
    Pillow built without webp); ``engine="native"`` forces it (raising
    when unavailable); ``engine="pure"`` forces the reference codecs.
    tests/test_images.py::test_native_decode_swap_phash_identical
    asserts both engines produce phash-identical rows on the fixture
    corpus whenever a native library is present, and proves the dispatch
    with a registered fake otherwise.
    """
    fmt = (fmt or "").lower()
    if engine not in ("auto", "native", "pure"):
        raise ValueError(f"unknown decode engine: {engine}")
    if engine != "pure":
        fn = _native_decode_fn()
        if fn is None:
            if engine == "native":
                raise RuntimeError(
                    "engine='native' but no native image library is importable (PIL)"
                )
        else:
            try:
                return fn(data, fmt)
            except Exception:
                if engine == "native":
                    raise
                # auto: fall back to the pure codecs — same error surface
                # (a genuinely corrupt stream fails there too)
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        from ..jpeg import decode_jpeg

        try:
            return decode_jpeg(data)
        except ValueError:
            if not allow_stub:
                raise  # arithmetic/hierarchical/corrupt → honest failure
    if fmt == "webp":
        from ..webp import decode_webp

        return decode_webp(data)
    if fmt in ("jpeg", "jpg"):
        # only reachable with allow_stub=True (honest failures re-raised above)
        import zlib

        rng = np.random.default_rng(zlib.crc32(data))
        return rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    raise ValueError(f"unknown image format: {fmt}")


def decode_and_validate(
    images: DataFrame, allow_stub: bool = False, engine: str = "auto"
) -> DataFrame:
    """Decode every payload row, recompute the perceptual hash, and check
    the stored metadata (dims + phash).  One pass, no shuffle.  ``engine``
    forwards to :func:`decode_rgb` (auto/native/pure — bench.py times the
    available engines side by side)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    rgb = decode_rgb(r.bytes, r.fmt, allow_stub=allow_stub, engine=engine)
                    ph = phash64(rgb)
                    rows.append(
                        (
                            r.image_id,
                            True,
                            rgb.shape[1],
                            rgb.shape[0],
                            ph,
                            bool(ph == r.phash),
                            bool(rgb.shape[1] == r.w and rgb.shape[0] == r.h),
                            None,
                        )
                    )
                except Exception as e:  # failed rows land with the error, never crash the job
                    rows.append((r.image_id, False, None, None, None, False, False, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_RESULT_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt", "w", "h", "phash").mapInPandas(
        gen, DECODE_RESULT_SCHEMA
    )


def psnr_against(images: DataFrame, reference: DataFrame, allow_stub: bool = False) -> DataFrame:
    """Per-row decoded-pixel PSNR of ``images`` vs ``reference`` (joined on
    image_id) + caption equality — the input_hint invariant (PSNR ≥ 40 dB
    for lossy formats, caption string equality)."""
    ref = reference.select(
        F.col("image_id"),
        F.col("bytes").alias("ref_bytes"),
        F.col("fmt").alias("ref_fmt"),
        F.col("caption").alias("ref_caption"),
    )
    joined = images.select("image_id", "bytes", "fmt", "caption").join(ref, "image_id")

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("psnr_db", T.DoubleType()),
            T.StructField("caption_equal", T.BooleanType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    a = decode_rgb(r.bytes, r.fmt, allow_stub=allow_stub)
                    b = decode_rgb(r.ref_bytes, r.ref_fmt, allow_stub=allow_stub)
                    p = psnr(a, b) if a.shape == b.shape else 0.0
                except Exception:
                    p = 0.0
                rows.append((r.image_id, p, bool(r.caption == r.ref_caption)))
            yield pd.DataFrame(rows, columns=["image_id", "psnr_db", "caption_equal"])

    return joined.mapInPandas(gen, schema)


def phash_hamming_expr(a, b):
    """Hamming distance between two int64 pHashes as a column expression
    (bit_count of xor — JVM-side, used for near-duplicate image grouping)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def near_duplicate_images(images: DataFrame, max_hamming: int = 8, band_bits: int = 6) -> DataFrame:
    """Near-duplicate image pairs by pHash banding (shared banded-Hamming
    LSH): candidate pairs share at least one exact band, verified with
    exact Hamming distance, all JVM-side.  Default 10×6-bit bands satisfy
    the collision guarantee for hamming ≤ 9 (the old 4×16 default
    silently missed pairs with 4-8 flips spread across all four bands)."""
    from .docdedup import banded_hamming_pairs

    return banded_hamming_pairs(
        images, max_hamming=max_hamming, band_bits=band_bits, total_bits=64,
        id_col="image_id", hash_col="phash",
    )


# ---------------------------------------------------------------------------
# resize + feature extraction (training-data image ops)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r_e4", T.LongType()),
        T.StructField("mean_g_e4", T.LongType()),
        T.StructField("mean_b_e4", T.LongType()),
        T.StructField("luma_p25", T.LongType()),
        T.StructField("luma_p50", T.LongType()),
        T.StructField("luma_p75", T.LongType()),
        T.StructField("edge_energy_e4", T.LongType()),
        T.StructField("aspect_e4", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def resize_bilinear(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic vectorized bilinear resize (half-pixel centers,
    floor(x+0.5) rounding — NOT np.round, whose half-even ties would
    make the oracle fixture platform-fragile)."""
    h, w = rgb.shape[:2]
    yy = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xx = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(yy).astype(int)
    x0 = np.floor(xx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (yy - y0)[:, None, None]
    wx = (xx - x0)[None, :, None]
    p = rgb.astype(np.float64)
    out = (
        p[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + p[np.ix_(y0, x1)] * (1 - wy) * wx
        + p[np.ix_(y1, x0)] * wy * (1 - wx)
        + p[np.ix_(y1, x1)] * wy * wx
    )
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def image_features_np(rgb: np.ndarray) -> tuple:
    """Deterministic per-image features (all integer exports): channel
    means (e4), luma quartiles, normalized gradient energy (e4), aspect
    ratio (e4).  The feature set a filtering/curation pipeline keys on."""
    f = rgb.astype(np.float64)
    means = [int(np.floor(f[..., c].mean() * 1e4 + 0.5)) for c in range(3)]
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    flat = np.sort(luma.reshape(-1))
    n = flat.size
    qs = [int(flat[min(n - 1, (n * q) // 100)]) for q in (25, 50, 75)]
    ge = 0.0
    if luma.shape[0] > 1:
        ge += np.abs(np.diff(luma, axis=0)).mean()
    if luma.shape[1] > 1:
        ge += np.abs(np.diff(luma, axis=1)).mean()
    edge = int(np.floor(ge * 1e4 + 0.5))
    aspect = int(np.floor(rgb.shape[1] / rgb.shape[0] * 1e4 + 0.5))
    return means[0], means[1], means[2], qs[0], qs[1], qs[2], edge, aspect


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → bilinear resize → re-encode (PNG, lossless) each payload
    row.  Stateless mapInPandas — the shape of every bulk image
    transform at corpus scale (no shuffle, linear in rows)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..png import encode_png, phash64

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    rgb = decode_rgb(r.bytes, r.fmt)
                    res = resize_bilinear(rgb, out_h, out_w)
                    rows.append(
                        (r.image_id, encode_png(res), out_w, out_h, "png",
                         r.caption, phash64(res), rgb.shape[1], rgb.shape[0], None)
                    )
                except Exception as e:  # corrupt payloads land as data
                    rows.append((r.image_id, None, None, None, None,
                                 r.caption, None, None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return images.mapInPandas(gen, RESIZE_SCHEMA)


def extract_image_features(images: DataFrame) -> DataFrame:
    """Decode → feature-extract each payload row (stateless mapInPandas)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    rgb = decode_rgb(r.bytes, r.fmt)
                    rows.append((r.image_id,) + image_features_np(rgb) + (None,))
                except Exception as e:
                    rows.append((r.image_id,) + (None,) * 8 + (str(e)[:200],))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(gen, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# audio + video modalities (opaque binary payloads, typed metadata)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("caption", T.StringType()),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_e6", T.LongType()),
        T.StructField("peak_e6", T.LongType()),
        T.StructField("zcr_e6", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)

AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("rms_e6", T.LongType()),
        T.StructField("zcr_e6", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """WAV decode → per-clip features (duration, RMS, peak, ZCR).
    Stateless mapInPandas; only PCM16 WAV decodes (real codec,
    audio.py) — other fmts / corrupt clips fail the ROW loudly (error
    column), never the job."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..audio import audio_features_np, decode_wav

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    if (r.fmt or "").lower() != "wav":
                        raise ValueError(f"unsupported audio format: {r.fmt}")
                    samples, sr = decode_wav(r.bytes)
                    rows.append(
                        (r.audio_id,) + audio_features_np(samples, sr) + (None,)
                    )
                except Exception as e:
                    rows.append((r.audio_id,) + (None,) * 6 + (str(e)[:200],))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(gen, AUDIO_FEATURE_SCHEMA)


def audio_frames(audio: DataFrame, frame_ms: int = 25, hop_ms: int = 10) -> DataFrame:
    """WAV decode → short-time frames (per-frame RMS/ZCR) — the
    windowing shape every speech pipeline starts from.  One input row
    fans out to many frame rows inside the same Arrow batch (no
    shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..audio import audio_frame_features_np, decode_wav

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    samples, sr = decode_wav(r.bytes)
                    for idx, start, rms, zcr in audio_frame_features_np(
                        samples, sr, frame_ms=frame_ms, hop_ms=hop_ms
                    ):
                        rows.append((r.audio_id, idx, start, rms, zcr, None))
                except Exception as e:
                    rows.append((r.audio_id, None, None, None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FRAME_SCHEMA.fields])

    return audio.select("audio_id", "bytes").mapInPandas(gen, AUDIO_FRAME_SCHEMA)


def sample_video_frames(media: DataFrame, every_k: int = 1) -> DataFrame:
    """Animated-WebP frame sampling: decode every k-th frame, emit
    (frame_idx, timestamp, dims, pHash) rows.  The video analog of the
    image validate pass — REAL container walk + VP8L/VP8 decode
    (webp.py / vp8.py), stateless mapInPandas.  Timestamps accumulate
    the per-frame durations of the SKIPPED frames too (container order),
    so t_ms is the true presentation time of each sampled frame."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..png import phash64
        from ..webp import decode_webp_frames

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    t = 0
                    for idx, (rgb, dur) in enumerate(decode_webp_frames(r.bytes)):
                        if idx % every_k == 0:
                            rows.append(
                                (r.media_id, idx, t, rgb.shape[1], rgb.shape[0],
                                 phash64(rgb), None)
                            )
                        t += dur
                except Exception as e:
                    rows.append((r.media_id, None, None, None, None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields])

    return media.select("media_id", "bytes").mapInPandas(gen, VIDEO_FRAME_SCHEMA)
