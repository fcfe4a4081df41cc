"""Pure-stdlib WAV (16-bit PCM) codec — the audio analog of
``png_codec.py`` for the multimodal pipeline's real-codec seam.

The reference engine (pixincreate/zParse) has no audio path; this is
part of the large-scale training-data extension (SURVEY §2.4b
multimodal rows). Encode/decode ride the stdlib ``wave`` module (RIFF
container parsing, fmt/data chunk layout) with numpy only for the
sample-array views, so the container needs no external audio
libraries — the same footing as the PNG codec.

API (mirrors png_codec's shape):
- ``encode_wav(samples, sample_rate)`` — int16 samples, shape
  ``(n_frames,)`` mono or ``(n_frames, n_channels)``; returns bytes.
- ``decode_wav(data)`` — returns ``(sample_rate, n_channels,
  samples)`` with samples ``(n_frames, n_channels)`` int16.
- malformed input raises ``WavError`` (the codec-level analog of the
  violation vocabulary; stage callers map it to a violation row).
"""

from __future__ import annotations

import io
import wave

import numpy as np


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode int16 PCM samples to a WAV byte string.

    ``samples``: shape (n_frames,) for mono or (n_frames, n_channels);
    must already be int16 (the encoder does not resample or dither).
    """
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise WavError(f"encode_wav requires int16 samples, got {arr.dtype}")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1:
        raise WavError(f"samples must be (n_frames,) or (n_frames, n_channels), got {arr.shape}")
    if sample_rate <= 0:
        raise WavError(f"sample_rate must be positive, got {sample_rate}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.ascontiguousarray(arr, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 16-bit PCM WAV byte string.

    Returns ``(sample_rate, n_channels, samples)`` with ``samples`` of
    shape ``(n_frames, n_channels)`` int16. Compressed or non-16-bit
    payloads raise ``WavError``.
    """
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
            if sw != 2:
                raise WavError(f"unsupported sample width {sw} (16-bit PCM only)")
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError) as e:
        raise WavError(f"bad WAV payload: {e}") from None
    if len(raw) != n_frames * n_ch * 2:
        raise WavError(
            f"truncated WAV data: header claims {n_frames} frames x {n_ch} ch, "
            f"got {len(raw)} bytes"
        )
    arr = np.frombuffer(raw, dtype="<i2")
    return int(rate), int(n_ch), arr.reshape(-1, n_ch) if n_ch else arr.reshape(-1, 1)
