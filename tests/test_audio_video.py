"""Audio (WAV/PCM16, audio.py) and video (animated WebP, webp.py
ANIM/ANMF) modalities: codec round trips, deterministic feature math,
and the Spark operators over opaque-binary payload tables
(operators/multimodal.py).
"""

import struct

import numpy as np
import pytest

from crawl4ai_spark.audio import (
    audio_features_np,
    audio_frame_features_np,
    decode_wav,
    encode_wav,
)
from crawl4ai_spark.operators import multimodal
from crawl4ai_spark.png import phash64
from crawl4ai_spark.webp import (
    decode_webp_frames,
    encode_webp_animation,
    encode_webp_lossless,
)


def tone(n=2000, sr=8000, f=440.0, amp=12000, stereo=False):
    t = np.arange(n) / sr
    x = np.floor(amp * np.sin(2 * np.pi * f * t) + 0.5).astype(np.int16)
    if stereo:
        y = np.floor(amp * np.cos(2 * np.pi * f * t) + 0.5).astype(np.int16)
        return np.stack([x, y], axis=1)
    return x[:, None]


# ---------------------------------------------------------------------------
# WAV codec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stereo", [False, True])
@pytest.mark.parametrize("sr", [8000, 16000, 44100])
def test_wav_roundtrip(stereo, sr):
    s = tone(1234, sr=sr, stereo=stereo)
    out, sr2 = decode_wav(encode_wav(s, sr))
    assert sr2 == sr
    assert np.array_equal(out, s)


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + b"\x00" * 4 + b"WAVE")  # missing chunks
    s = tone(100)
    data = bytearray(encode_wav(s, 8000))
    data[20] = 3  # audio_fmt = IEEE float
    with pytest.raises(ValueError, match="PCM16"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        encode_wav(s.astype(np.float32), 8000)


def test_audio_features_math():
    # full-scale square wave: rms == peak == amplitude, zcr from period
    n, sr = 4000, 8000
    sq = np.where(np.arange(n) % 20 < 10, 16384, -16384).astype(np.int16)[:, None]
    ns, rate, dur, rms, peak, zcr = audio_features_np(sq, sr)
    assert (ns, rate, dur) == (n, sr, 500)
    assert rms == peak == 500000  # 16384/32768 = 0.5 → 500000 e6
    # one crossing every 10 samples → zcr ≈ 0.1
    assert abs(zcr - 100000) < 2000
    # silence
    z = np.zeros((100, 1), np.int16)
    assert audio_features_np(z, 8000)[3:] == (0, 0, 0)
    with pytest.raises(ValueError):
        audio_features_np(np.zeros((0, 1), np.int16), 8000)


def test_audio_frame_features_windowing():
    s = tone(8000, sr=8000, f=100.0)
    frames = audio_frame_features_np(s, 8000, frame_ms=25, hop_ms=10)
    # (8000 - 200) // 80 + 1 frames of 200 samples, hop 80
    assert len(frames) == (8000 - 200) // 80 + 1
    assert frames[0][:2] == (0, 0)
    assert frames[1][1] == 10  # hop = 10ms
    # steady tone → frame RMS stable across interior frames
    rms = [f[2] for f in frames]
    assert max(rms) - min(rms) < 30000


def test_extract_audio_features_distributed(spark):
    rows = []
    expected = {}
    for i, (n, sr, st) in enumerate([(2000, 8000, False), (1500, 16000, True), (800, 8000, False)]):
        s = tone(n, sr=sr, f=200 + 50 * i, stereo=st)
        rows.append((f"a{i}", bytearray(encode_wav(s, sr)), "wav", sr, n, "c"))
        expected[f"a{i}"] = audio_features_np(s, sr)
    df = spark.createDataFrame(rows, multimodal.AUDIO_SCHEMA)
    out = {r["audio_id"]: r for r in multimodal.extract_audio_features(df).collect()}
    for aid, exp in expected.items():
        got = tuple(out[aid][c] for c in (
            "n_samples", "sample_rate", "duration_ms", "rms_e6", "peak_e6", "zcr_e6"))
        assert got == exp, aid
    fr = multimodal.audio_frames(df).collect()
    assert len(fr) == sum(
        len(audio_frame_features_np(tone(n, sr=sr, f=200 + 50 * i, stereo=st), sr))
        for i, (n, sr, st) in enumerate([(2000, 8000, False), (1500, 16000, True), (800, 8000, False)])
    )


# ---------------------------------------------------------------------------
# animated WebP / video frame sampling
# ---------------------------------------------------------------------------


def test_animation_roundtrip_and_still_fallback():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (18, 26, 3), np.uint8) for _ in range(4)]
    durs = [33, 33, 66, 33]
    data = encode_webp_animation(frames, durs, loop_count=2)
    out = decode_webp_frames(data)
    assert [d for _, d in out] == durs
    assert all(np.array_equal(a, b) for (a, _), b in zip(out, frames))
    # still image → single frame, duration 0
    still = decode_webp_frames(encode_webp_lossless(frames[0]))
    assert len(still) == 1 and still[0][1] == 0
    assert np.array_equal(still[0][0], frames[0])


def test_animation_rejects_mismatched_frames():
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.zeros((8, 10, 3), np.uint8)
    with pytest.raises(ValueError, match="canvas"):
        encode_webp_animation([a, b], [10, 10])
    with pytest.raises(ValueError):
        encode_webp_animation([], [])
    with pytest.raises(ValueError, match="mismatch"):
        encode_webp_animation([a], [10, 20])


def test_sample_video_frames_distributed(spark):
    rng = np.random.default_rng(6)
    base = rng.integers(0, 256, (16, 24, 3), np.uint8)
    frames = [np.roll(base, i * 2, axis=1) for i in range(5)]
    durs = [40, 60, 40, 60, 40]
    rows = [("v0", bytearray(encode_webp_animation(frames, durs)))]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    out = sorted(
        multimodal.sample_video_frames(df, every_k=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    # presentation time accumulates skipped frames' durations
    assert [r["t_ms"] for r in out] == [0, 100, 200]
    for r in out:
        assert (r["w"], r["h"]) == (24, 16)
        assert r["phash"] == phash64(frames[r["frame_idx"]])


def test_corrupt_rows_isolated_not_fatal(spark):
    """One corrupt payload must land as an error ROW, never kill the job
    (review fix: the new media operators previously raised through
    mapInPandas)."""
    good = tone(800)
    rows = [
        ("ok", bytearray(encode_wav(good, 8000)), "wav", 8000, 800, "c"),
        ("bad", bytearray(b"RIFFgarbageWAVE"), "wav", 0, 0, "c"),
        ("mp3", bytearray(b"ID3\x03"), "mp3", 0, 0, "c"),
    ]
    df = spark.createDataFrame(rows, multimodal.AUDIO_SCHEMA)
    out = {r["audio_id"]: r for r in multimodal.extract_audio_features(df).collect()}
    assert out["ok"]["error"] is None and out["ok"]["rms_e6"] > 0
    assert out["bad"]["error"] and out["bad"]["rms_e6"] is None
    assert "unsupported audio format" in out["mp3"]["error"]
    fr = multimodal.audio_frames(df).collect()
    errs = [r for r in fr if r["error"]]
    assert len(errs) == 2 and all(r["frame_idx"] is None for r in errs)
    vrows = [("v_ok", bytearray(encode_webp_animation([np.zeros((8, 8, 3), np.uint8)], [10]))),
             ("v_bad", bytearray(b"RIFF????WEBPnope"))]
    vdf = spark.createDataFrame(vrows, "media_id string, bytes binary")
    vout = {r["media_id"]: r for r in multimodal.sample_video_frames(vdf).collect()}
    assert vout["v_ok"]["error"] is None
    assert vout["v_bad"]["error"] and vout["v_bad"]["frame_idx"] is None


def test_wav_channel_and_rate_validation():
    data = bytearray(encode_wav(tone(100), 8000))
    bad_ch = bytearray(data)
    bad_ch[22:24] = (0).to_bytes(2, "little")  # channels = 0
    with pytest.raises(ValueError, match="channel"):
        decode_wav(bytes(bad_ch))
    bad_sr = bytearray(data)
    bad_sr[24:28] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(bytes(bad_sr))
