"""Pure-Python WAV (RIFF/WAVE, PCM16) codec + audio feature kernels.

The audio half of the multimodal payload plane: audio rides the same
(id, bytes, fmt, metadata) opaque-binary pattern as images
(BASELINE.json input_hint), and WAV/PCM is fully decodable with stdlib
struct — so unlike heavier codecs (MP3/AAC/Opus, which would need
libraries absent from this sandbox and stay out of scope), the decode
step here is REAL, not a stub.

Feature kernels are deterministic integer exports (e6 micro-units,
floor(x+0.5) rounding) so the Spark operators built on them
(operators/multimodal.py extract_audio_features / audio_frames) can be
hash-checked against driver-side DuckDB VALUES fixtures.

Reference parity: the reference treats media as per-page payload lists
(media["audios"], content_scraping_strategy.py:333); here audio lands
in a typed payload table and is validated/feature-extracted in
Arrow-batched passes.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono (n,) or stereo (n, 2) samples → RIFF/WAVE PCM16."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    if samples.ndim == 1:
        channels = 1
        frames = samples[:, None]
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        channels = samples.shape[1]
        frames = samples
    else:
        raise ValueError("expected (n,) or (n, 1|2) samples")
    data = frames.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """RIFF/WAVE PCM16 bytes → (samples int16 (n, channels), sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    i = 12
    sample_rate = channels = bits = None
    pcm = None
    while i + 8 <= len(data):
        tag = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        payload = data[i + 8 : i + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
            if channels not in (1, 2):
                raise ValueError(f"bad channel count {channels}")
            if sample_rate == 0:
                raise ValueError("bad sample rate 0")
        elif tag == b"data":
            pcm = payload
        i += 8 + size + (size & 1)
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    n = len(pcm) // (2 * channels)
    samples = np.frombuffer(pcm[: n * 2 * channels], "<i2").reshape(n, channels)
    return samples.copy(), sample_rate


def _e6(x: float) -> int:
    return int(np.floor(x * 1e6 + 0.5))


def audio_features_np(samples: np.ndarray, sample_rate: int) -> tuple:
    """Deterministic per-clip features over the mono mixdown (mean of
    channels), normalized to [-1, 1]: duration_ms, rms_e6, peak_e6,
    zero-crossing-rate e6 (crossings per sample)."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = mono.size
    if n == 0:
        raise ValueError("empty audio clip")
    duration_ms = int(np.floor(n * 1000.0 / sample_rate + 0.5))
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.abs(mono).max())
    if n > 1:
        signs = np.signbit(mono)
        zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / (n - 1)
    else:
        zcr = 0.0
    return n, int(sample_rate), duration_ms, _e6(rms), _e6(peak), _e6(zcr)


def audio_frame_features_np(samples: np.ndarray, sample_rate: int,
                            frame_ms: int = 25, hop_ms: int = 10):
    """Framed short-time features (the speech-pipeline windowing shape):
    per frame (start_ms, rms_e6, zcr_e6) over the mono mixdown.  Frames
    are fixed-size windows; the trailing partial window is dropped (the
    standard STFT convention)."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    flen = max(1, sample_rate * frame_ms // 1000)
    hop = max(1, sample_rate * hop_ms // 1000)
    out = []
    idx = 0
    start = 0
    while start + flen <= mono.size:
        fr = mono[start : start + flen]
        signs = np.signbit(fr)
        zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / max(1, flen - 1)
        out.append(
            (idx, int(np.floor(start * 1000.0 / sample_rate + 0.5)),
             _e6(float(np.sqrt(np.mean(fr * fr)))), _e6(zcr))
        )
        idx += 1
        start += hop
    return out
